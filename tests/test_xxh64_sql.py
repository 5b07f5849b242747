"""functions/xxh64_sql.py — bit-exact Spark xxhash64 in DuckDB SQL.

Ground truth is Spark's own ``F.xxhash64`` (ultimately
org.apache.spark.sql.catalyst.expressions.XXH64; the constants here were
read out of the class's bytecode with javap). The test pins three layers:

1. the pure-Python replica against ``F.xxhash64`` for strings of every
   length 0..31 (plus >=32 stripe lengths for the replica's own sake),
   ints, longs, and the multi-argument chaining rule;
2. the generated DuckDB SQL against the replica (hence, transitively,
   against Spark) for the string, hashInt-permutation, and
   hashLong-band paths used by the xx-family dedup oracles;
3. the promoted oracles' length guard: a >=32-byte string yields NULL
   in SQL (loud red) rather than a wrong hash.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.functions.xxh64_sql import (
    CteChain,
    hash_int_ctes,
    hash_long_ctes,
    string_xxh64_ctes,
    to_signed,
    to_unsigned,
)

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h):
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def py_hash_int(i, seed):
    h = (seed + P5 + 4) & M64
    h ^= ((i & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def py_hash_long(l, seed):  # noqa: E741
    h = (seed + P5 + 8) & M64
    h ^= (_rotl((l * P2) & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def py_hash_bytes(b: bytes, seed: int) -> int:
    n, off = len(b), 0
    w = lambda o, k: int.from_bytes(b[o : o + k], "little")  # noqa: E731
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while off + 32 <= n:
            v1 = (_rotl((v1 + w(off, 8) * P2) & M64, 31) * P1) & M64
            v2 = (_rotl((v2 + w(off + 8, 8) * P2) & M64, 31) * P1) & M64
            v3 = (_rotl((v3 + w(off + 16, 8) * P2) & M64, 31) * P1) & M64
            v4 = (_rotl((v4 + w(off + 24, 8) * P2) & M64, 31) * P1) & M64
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while off + 8 <= n:
        h ^= (_rotl((w(off, 8) * P2) & M64, 31) * P1) & M64
        h = (_rotl(h, 27) * P1 + P4) & M64
        off += 8
    if off + 4 <= n:
        h ^= (w(off, 4) * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        off += 4
    while off < n:
        h ^= (b[off] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        off += 1
    return _fmix(h)


def _sgn(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def _usg(s):
    return s + (1 << 64) if s < 0 else s


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(17)
    alpha = "abcdefghij KLMNO0123.:?"
    return (
        ["", "a", "ab", "abc"]
        + ["".join(rng.choice(alpha) for _ in range(n)) for n in range(3, 32)]
        + ["".join(rng.choice(alpha) for _ in range(n)) for n in (32, 33, 64, 97)]
    )


def test_python_replica_matches_spark(spark, corpus):
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in corpus:
        assert got[s] == _sgn(py_hash_bytes(s.encode(), 42)), repr(s)
    lvals = [0, 1, -1, 5, 2**62, -(2**60), 123456789012345]
    dfl = spark.createDataFrame([(v,) for v in lvals], "l long")
    gotl = {r["l"]: r["h"] for r in dfl.select("l", F.xxhash64("l").alias("h")).collect()}
    for v in lvals:
        assert gotl[v] == _sgn(py_hash_long(_usg(v), 42))
    # chaining rule: xxhash64(s, i) == hashInt(i, hash(s, 42))
    dfc = spark.createDataFrame(
        [(s, i) for s in corpus[:8] for i in range(16)], "s string, i int"
    )
    for r in dfc.select("s", "i", F.xxhash64("s", "i").alias("h")).collect():
        assert r["h"] == _sgn(py_hash_int(r["i"], py_hash_bytes(r["s"].encode(), 42)))


def test_sql_string_and_perm_paths_match_replica(corpus):
    short = [s for s in corpus if len(s) < 64]  # r6: single-stripe window
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{s}')" for i, s in enumerate(short))
        + ") v(id, s)"
    )
    chain = string_xxh64_ctes("t", "s", "hu", "q")
    chain.step(perm="unnest(range(16))")
    hash_int_ctes(chain, "hu", "perm", "pu", "qp")
    sql = (
        "WITH "
        + chain.sql()
        + f" SELECT s, perm, {to_signed('hu')} AS h, {to_signed('pu')} AS p FROM "
        + chain.last()
    )
    for s, perm, h, p in con.execute(sql).fetchall():
        base = py_hash_bytes(s.encode(), 42)
        assert h == _sgn(base), repr(s)
        assert p == _sgn(py_hash_int(perm, base)), (repr(s), perm)


def test_sql_hash_long_chain_matches_replica():
    con = duckdb.connect()
    vals = [(1, -5, 7), (2, 123456789012345, -987654321), (3, 0, 0), (4, -1, -1)]
    con.execute(
        "CREATE TABLE lt AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))" for i, a, b in vals)
        + ") v(id, lo, hi)"
    )
    c = CteChain("lt", "b")
    hash_long_ctes(c, "42", to_unsigned("lo"), "s1", "b1")
    hash_long_ctes(c, "s1", to_unsigned("hi"), "s2", "b2")
    sql = "WITH " + c.sql() + f" SELECT lo, hi, {to_signed('s2')} AS h FROM " + c.last()
    for lo, hi, h in con.execute(sql).fetchall():
        assert h == _sgn(py_hash_long(_usg(hi), py_hash_long(_usg(lo), 42)))


def test_sql_length_guard_yields_null():
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 1 AS id, repeat('x', 64) AS s")
    chain = string_xxh64_ctes("t", "s", "hu", "q")
    sql = "WITH " + chain.sql() + " SELECT hu FROM " + chain.last()
    assert con.execute(sql).fetchone()[0] is None


def test_sql_stripe_window_boundary_lengths():
    """Exhaustive boundary sweep of the r6 single-stripe path: every
    length 30..63 (stripe entry, each tail-round guard flip, 63 = max)
    must match the Python replica bit-for-bit; 64 must NULL."""
    rng = random.Random(23)
    alpha = "abcdefghij KLMNO0123.:?c"
    rows = [(n, "".join(rng.choice(alpha) for _ in range(n))) for n in range(30, 64)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({n}, '{s}')" for n, s in rows)
        + ") v(id, s)"
    )
    chain = string_xxh64_ctes("t", "s", "hu", "q")
    sql = "WITH " + chain.sql() + f" SELECT s, {to_signed('hu')} AS h FROM " + chain.last()
    got = dict(con.execute(sql).fetchall())
    for _n, s in rows:
        assert got[s] == _sgn(py_hash_bytes(s.encode(), 42)), (len(s), repr(s))
