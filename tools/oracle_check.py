"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark at the
given sf dir, runs the matching ``oracle_sql()`` in DuckDB over the same
parquet files, and compares:

- row count,
- schema (sorted column names),
- order-insensitive value hash (per-row canonical string, doubles rounded
  to 6 significant-stable decimals, rows sorted),
- driver-safe output types, three audit classes (each reproduces a real
  driver failure even when *values* match):
  1. DECIMAL (either engine) / DuckDB HUGEINT — the driver's pandas
     canonicalizer converts them asymmetrically (DuckDB DECIMAL→float64
     vs Spark DECIMAL→object Decimal; SUM(INT)→HUGEINT), so
     trailing-zero values hash-mismatch (r1 star_report_year class).
     Accumulate in DECIMAL, cast the final aggregate to DOUBLE/BIGINT on
     both sides.
  2. Per-column integer-vs-float dtype asymmetry between the engines —
     both types can be individually safe, but pandas renders int64
     ``90000`` vs float64 ``90000.0`` (r2 op_math_functions class:
     DuckDB floor/ceil→DOUBLE vs Spark→LONG, DuckDB sign→TINYINT vs
     signum→DOUBLE). Cast one side so the int/float *class* agrees.
  3. Array/map/struct output columns on either engine — the driver
     canonicalizer calls pandas hashing on column values, and Python
     lists are unhashable (r2 emb_l2_normalize class: ``TypeError:
     unhashable type: 'list'``). Explode to scalar rows or serialize.

Usage:  python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def spark_type_class(dt) -> str:
    """Bucket a Spark DataType into the driver-canonicalizer classes."""
    from pyspark.sql import types as _T

    if isinstance(dt, (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType)):
        return "int"
    if isinstance(dt, (_T.FloatType, _T.DoubleType)):
        return "float"
    if isinstance(dt, (_T.ArrayType, _T.MapType, _T.StructType)):
        return "nested"
    return "other"


def duck_type_class(t: str) -> str:
    """Bucket a DuckDB type string into the driver-canonicalizer classes."""
    t = t.upper()
    if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "ARRAY")):
        return "nested"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    return "other"


def dtype_pair_problems(
    spark_classes: dict[str, str], duck_classes: dict[str, str]
) -> list[str]:
    """The r2 op_math_functions bug class: per-column int-vs-float
    asymmetry between engines — both types individually driver-safe, but
    pandas renders int64 ``90000`` vs float64 ``90000.0``."""
    return [
        f"{c}: spark={spark_classes[c]} duck={duck_classes[c]}"
        for c in spark_classes
        if c in duck_classes
        and {spark_classes[c], duck_classes[c]} == {"int", "float"}
    ]


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    from pyspark.sql import functions as F  # noqa: F401

    import __spark_entry__ as entrymod
    from data_pipeline_4_online_retail_spark.session import get_spark

    spark = get_spark("oracle-check", shuffle_partitions=8)

    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):  # spark-written table = directory of parts
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        from pyspark.sql import types as _T

        spark_classes = {f.name: spark_type_class(f.dataType) for f in sdf.schema.fields}
        bad_spark = [
            f.name for f in sdf.schema.fields
            if isinstance(f.dataType, _T.DecimalType)
        ]
        if bad_spark:
            problems.append(f"driver-unsafe Spark DECIMAL output: {bad_spark}")
        nested_spark = [c for c, k in spark_classes.items() if k == "nested"]
        if nested_spark:
            problems.append(
                f"driver-unsafe Spark array/map/struct output: {nested_spark} "
                "(pandas canonicalizer cannot hash lists — explode or serialize)"
            )
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            duck_classes = {cname: duck_type_class(str(ctype)) for cname, ctype, *_ in desc}
            bad_duck = [
                (cname, ctype)
                for cname, ctype, *_ in desc
                if "DECIMAL" in str(ctype).upper() or "HUGEINT" in str(ctype).upper()
            ]
            if bad_duck:
                problems.append(f"driver-unsafe DuckDB output types: {bad_duck}")
            nested_duck = [c for c, k in duck_classes.items() if k == "nested"]
            if nested_duck:
                problems.append(
                    f"driver-unsafe DuckDB nested output: {nested_duck}"
                )
            asym = dtype_pair_problems(spark_classes, duck_classes)
            if asym:
                problems.append(
                    "driver-unsafe int/float dtype asymmetry "
                    + "; ".join(asym)
                    + " (cast one side so the class matches)"
                )
        except Exception:  # noqa: BLE001  (DESCRIBE unsupported → skip audit)
            pass
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            hs, hd = value_hash(s_rows, s_cols), value_hash(d_rows, d_cols)
            if hs != hd:
                problems.append("value-hash mismatch")
                so = sorted(
                    "|".join(canon(r[i]) for i in sorted(range(len(s_cols)), key=lambda i: s_cols[i]))
                    for r in s_rows
                )
                do = sorted(
                    "|".join(canon(r[i]) for i in sorted(range(len(d_cols)), key=lambda i: d_cols[i]))
                    for r in d_rows
                )
                diffs = [(a, b) for a, b in zip(so, do) if a != b][:3]
                for a, b in diffs:
                    print(f"      spark: {a[:200]}\n      duck : {b[:200]}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(s_rows)} rows  ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
