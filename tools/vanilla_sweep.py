"""Run every registered query under a VANILLA SparkSession (Spark 4
defaults: ANSI mode ON, no pinned configs) — the driver's exact
environment. Catches config-dependence bugs the pinned-session gates
can't: ANSI arithmetic/cast errors, element_at(0), implicit-coercion
differences.

Usage: python tools/vanilla_sweep.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    fails = []
    n_run = 0
    for name, fn in entry.queries().items():
        if ONLY and name not in ONLY:
            continue
        n_run += 1
        try:
            n = fn(spark, SF_DIR).count()
            print(f"ok    {name}: {n} rows")
        except Exception as ex:  # noqa: BLE001 — report and continue
            msg = str(ex).split("\n")[0][:200]
            fails.append((name, msg))
            print(f"FAIL  {name}: {msg}")
    print(f"\n{len(fails)} failures / {n_run} queries")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
