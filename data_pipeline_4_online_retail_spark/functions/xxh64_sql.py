"""Bit-exact Spark ``xxhash64`` re-derived in pure DuckDB SQL.

DuckDB has no xxHash64 built-in, which is why every xx-family operator
(``dedup_minhash_lsh_fast``, ``dedup_incremental_fast``, ``dedup_simhash``)
was rows-only. This module generates plain-SQL CTE chains that reproduce
Spark's XXH64 (`org.apache.spark.sql.catalyst.expressions.XXH64`,
bytecode-verified constants; full-path equality pinned against
``F.xxhash64`` itself in tests/test_xxh64_sql.py) using 128-bit HUGEINT
modular arithmetic:

- every value lives in the unsigned domain ``[0, 2^64)``;
- ``a*b mod 2^64`` splits the multiplicand (``lo*b + ((hi*b_lo) mod 2^32)
  << 32``) so no intermediate exceeds HUGEINT's 2^127-1;
- rotations are ``(x*2^r mod 2^64) + x//2^(64-r)`` (disjoint bit ranges,
  so ``+`` is ``|``);
- byte access is ``ord(substr(...))`` — valid because the documents
  corpus is pure ASCII (octet == code point, re-verified each round).

Spark chains multi-argument ``xxhash64(c1, c2, …)`` as
``seed=42 → hash(c1) → hash(c2, seed=prev)``, so ``xxhash64(shingle, i)``
costs ONE string hash per shingle plus a cheap per-permutation
``hashInt`` — the generated SQL mirrors that factoring.

Strings are supported to 63 bytes: lengths below 32 skip the stripe,
lengths in [32, 64) run ONE 32-byte stripe (four lane accumulators +
merge — added in r6 after the 100x scale replica's c-prefixed tokens
pushed shingles to 35 bytes and the old <32 guard NULLed them); >= 64
still yields NULL, which poisons the signature and reds the driver row
loudly instead of silently truncating.
"""

from __future__ import annotations

M64 = 1 << 64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
_M = "18446744073709551616"  # 2^64
_M32 = "4294967296"  # 2^32


def _mul(a: str, b: str) -> str:
    """(a*b) mod 2^64 without exceeding HUGEINT: split a into 32-bit
    halves; the high half only contributes (hi*b mod 2^32) << 32."""
    return (
        f"(((({a}) % {_M32}) * ({b}) + "
        f"(((({a}) // {_M32}) * (({b}) % {_M32})) % {_M32}) * {_M32}) % {_M})"
    )


def _rotl(x: str, r: int) -> str:
    return f"((({x}) * {1 << r}) % {_M} + ({x}) // {1 << (64 - r)})"


def _xor(a: str, b: str) -> str:
    return f"xor(CAST({a} AS HUGEINT), CAST({b} AS HUGEINT))"


def to_unsigned(col: str) -> str:
    """Signed BIGINT column -> unsigned HUGEINT in [0, 2^64)."""
    return (
        f"(CASE WHEN ({col}) < 0 THEN CAST({col} AS HUGEINT) + {_M} "
        f"ELSE CAST({col} AS HUGEINT) END)"
    )


def to_signed(col: str) -> str:
    """Unsigned HUGEINT in [0, 2^64) -> signed BIGINT (Spark's long)."""
    return (
        f"(CAST(CASE WHEN ({col}) >= {1 << 63} THEN ({col}) - {_M} "
        f"ELSE ({col}) END AS BIGINT))"
    )


class CteChain:
    """Accumulates `name AS (SELECT *, <exprs> FROM prev)` steps."""

    def __init__(self, src: str, prefix: str):
        self.src = src
        self.prefix = prefix
        self.n = 0
        self.parts: list[str] = []

    def step(self, **cols: str) -> str:
        prev = self.src if self.n == 0 else f"{self.prefix}{self.n - 1}"
        name = f"{self.prefix}{self.n}"
        exprs = ",\n       ".join(f"{e} AS {c}" for c, e in cols.items())
        self.parts.append(f"{name} AS (SELECT *,\n       {exprs}\nFROM {prev})")
        self.n += 1
        return name

    def last(self) -> str:
        return self.src if self.n == 0 else f"{self.prefix}{self.n - 1}"

    def sql(self) -> str:
        return ",\n".join(self.parts)


def _fmix(chain: CteChain, g: str, out: str, tag: str) -> None:
    f1 = f"{tag}_f1"
    chain.step(**{f1: _xor(g, f"({g}) // {1 << 33}")})
    m1 = f"{tag}_m1"
    chain.step(**{m1: _mul(f1, str(P2))})
    m2 = f"{tag}_m2"
    chain.step(**{m2: _mul(_xor(m1, f"({m1}) // {1 << 29}"), str(P3))})
    chain.step(**{out: _xor(m2, f"({m2}) // {1 << 32}")})


def string_xxh64_ctes(
    src: str, s_col: str, out: str, prefix: str, seed: int = 42
) -> CteChain:
    """CTE chain computing ``out`` = unsigned XXH64 of ASCII string
    ``s_col`` (< 64 bytes: one optional 32-byte stripe + tail; >= 64 ->
    NULL — the corpus max shingle is 26 bytes and the 100x c-prefixed
    scale replicas reach 35, both inside the single-stripe window)."""
    c = CteChain(src, prefix)
    # bytes are guarded per position so short strings read 0 (never used:
    # every round is length-guarded, zeros are just placeholders)
    c.step(**{f"{prefix}L": f"CAST(strlen({s_col}) AS HUGEINT)"})
    L = f"{prefix}L"

    def byte_fixed(i: int) -> str:
        return (
            f"(CASE WHEN {L} >= {i} THEN CAST(ord(substr({s_col}, {i}, 1)) "
            f"AS HUGEINT) ELSE 0 END)"
        )

    def byte_at(pos: str) -> str:
        return (
            f"(CASE WHEN ({pos}) <= {L} THEN CAST(ord(substr({s_col}, "
            f"CAST({pos} AS INTEGER), 1)) AS HUGEINT) ELSE 0 END)"
        )

    def word8(off: int) -> str:  # little-endian 8-byte word at 1-based off+1
        return " + ".join(
            f"{byte_fixed(off + j + 1)} * {1 << (8 * j)}" for j in range(8)
        )

    # the tail starts after the consumed stripes: base = (L // 32) * 32,
    # so tail words live at expression offsets (0 when L < 32)
    B = f"(({L} // 32) * 32)"

    def word8_base(off: int) -> str:
        return " + ".join(
            f"{byte_at(f'{B} + {off + j + 1}')} * {1 << (8 * j)}"
            for j in range(8)
        )

    o4 = f"(({L} // 8) * 8)"
    t4 = " + ".join(f"{byte_at(f'{o4} + {j + 1}')} * {1 << (8 * j)}" for j in range(4))
    toff = f"({o4} + (CASE WHEN {L} % 8 >= 4 THEN 4 ELSE 0 END))"
    c.step(
        **{
            f"{prefix}w0": word8_base(0),
            f"{prefix}w8": word8_base(8),
            f"{prefix}w16": word8_base(16),
            f"{prefix}t4": f"({t4})",
            f"{prefix}nb": f"({L} - {toff})",
            f"{prefix}tb0": byte_at(f"{toff} + 1"),
            f"{prefix}tb1": byte_at(f"{toff} + 2"),
            f"{prefix}tb2": byte_at(f"{toff} + 3"),
            # stripe words (fixed offsets 0..24; only read when L >= 32,
            # which guarantees all 32 bytes exist)
            f"{prefix}sw0": word8(0),
            f"{prefix}sw8": word8(8),
            f"{prefix}sw16": word8(16),
            f"{prefix}sw24": word8(24),
        }
    )
    # one 32-byte stripe (L in [32, 64)): four lane accumulators, merged
    lane_seeds = (
        (seed + P1 + P2) % M64,
        (seed + P2) % M64,
        seed % M64,
        (seed - P1) % M64,
    )
    vnames = []
    vsteps = {}
    for lane, (a, woff) in enumerate(zip(lane_seeds, (0, 8, 16, 24))):
        vn = f"{prefix}v{lane + 1}"
        vsteps[vn] = _mul(
            _rotl(f"(({a} + {_mul(f'{prefix}sw{woff}', str(P2))}) % {_M})", 31),
            str(P1),
        )
        vnames.append(vn)
    c.step(**vsteps)
    h = f"{prefix}sh0"
    c.step(
        **{
            h: "(("
            + " + ".join(
                _rotl(vn, r) for vn, r in zip(vnames, (1, 7, 12, 18))
            )
            + f") % {_M})"
        }
    )
    for lane, vn in enumerate(vnames):
        nxt = f"{prefix}sh{lane + 1}"
        merged = _xor(h, _mul(_rotl(_mul(vn, str(P2)), 31), str(P1)))
        c.step(**{nxt: f"(({_mul(merged, str(P1))} + {P4}) % {_M})"})
        h = nxt
    # init: stripe merge for [32, 64), plain seed for < 32, NULL >= 64
    g = f"{prefix}g0"
    c.step(
        **{
            g: f"(CASE WHEN {L} >= 64 THEN NULL "
            f"WHEN {L} >= 32 THEN ({h} + {L}) % {_M} "
            f"ELSE ({seed} + {P5} + {L}) % {_M} END)"
        }
    )
    # three guarded 8-byte tail rounds (remaining after stripes = L % 32)
    for ridx, (w, need) in enumerate(
        ((f"{prefix}w0", 8), (f"{prefix}w8", 16), (f"{prefix}w16", 24))
    ):
        k = f"{prefix}k{ridx}"
        c.step(**{k: _mul(_rotl(_mul(w, str(P2)), 31), str(P1))})
        ga = _xor(g, k)
        nxt = f"{prefix}g{ridx + 1}"
        c.step(
            **{
                nxt: f"(CASE WHEN {L} % 32 >= {need} THEN "
                f"({_mul(_rotl(ga, 27), str(P1))} + {P4}) % {_M} "
                f"ELSE {g} END)"
            }
        )
        g = nxt
    # guarded 4-byte round
    ga4 = f"{prefix}ga4"
    c.step(**{ga4: _xor(g, _mul(f"{prefix}t4", str(P1)))})
    g4 = f"{prefix}g4"
    c.step(
        **{
            g4: f"(CASE WHEN {L} % 8 >= 4 THEN "
            f"({_mul(_rotl(ga4, 23), str(P2))} + {P3}) % {_M} "
            f"ELSE {g} END)"
        }
    )
    g = g4
    # up to three guarded tail-byte rounds
    for j in range(3):
        gab = f"{prefix}gab{j}"
        c.step(**{gab: _xor(g, _mul(f"{prefix}tb{j}", str(P5)))})
        nxt = f"{prefix}g{5 + j}"
        c.step(
            **{
                nxt: f"(CASE WHEN {prefix}nb > {j} THEN "
                f"{_mul(_rotl(gab, 11), str(P1))} ELSE {g} END)"
            }
        )
        g = nxt
    _fmix(c, g, out, f"{prefix}x")
    return c


def hash_int_ctes(
    chain: CteChain, seed_col: str, int_col: str, out: str, tag: str
) -> None:
    """Append hashInt(int_col, seed_col) to an existing chain.
    ``int_col`` must already be non-negative (< 2^31)."""
    ga = f"{tag}_ga"
    chain.step(
        **{
            ga: _xor(
                f"(({seed_col}) + {P5} + 4) % {_M}",
                _mul(f"CAST({int_col} AS HUGEINT)", str(P1)),
            )
        }
    )
    gb = f"{tag}_gb"
    chain.step(**{gb: f"({_mul(_rotl(ga, 23), str(P2))} + {P3}) % {_M}"})
    _fmix(chain, gb, out, tag)


def hash_long_ctes(
    chain: CteChain, seed: str, long_u_col: str, out: str, tag: str
) -> None:
    """Append hashLong(long_u_col, seed) — both unsigned-domain exprs."""
    k = f"{tag}_k"
    chain.step(**{k: _mul(_rotl(_mul(long_u_col, str(P2)), 31), str(P1))})
    gb = f"{tag}_gb"
    chain.step(
        **{
            gb: f"({_mul(_rotl(_xor(f'(({seed}) + {P5} + 8) % {_M}', k), 27), str(P1))}"
            f" + {P4}) % {_M}"
        }
    )
    _fmix(chain, gb, out, tag)
