"""Measure the engine's skew story instead of asserting it.

The salted operators (`operators/skew.py`) are oracle-proven
SEMANTICS-preserving, and session.py turns on AQE skew-join splitting —
but neither had a measured skew benefit on record: the TPC-H-ish test
tables are uniform, so the salted queries only ever demonstrated
overhead. This probe manufactures real skew deterministically (a
configurable fraction of lineitem's join keys remapped to ONE hot key)
and times the same join+aggregate three ways:

  smj_no_skew_handling — AQE skew-join splitting DISABLED: the hot
                         partition serializes on one task (the straggler
                         a 1000-executor cluster pays for at 100 TB).
  aqe_skew_join        — the engine default: AQE splits the oversized
                         partition at runtime. Zero code change.
  manual_salted        — operators/skew.salted_broadcast_skew_join
                         (8 deterministic salts): the explicit fallback
                         for non-AQE clusters / streaming.

All three must return the same aggregate totals (checked) — the A/B is
pure execution strategy.

Usage:
  python tools/skew_probe.py [SF_DIR] [HOT_TENTHS]
(defaults: /tmp/scale100_sf10, 3 → 30% of rows on the hot key)

Prints one JSON line: per-variant seconds (warm min-of-2, noop sink),
the hot-key row count, and the cross-variant total check.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.operators.skew import (
    salted_broadcast_skew_join,
)
from data_pipeline_4_online_retail_spark.session import (
    apply_scale_granularity,
    get_spark,
)
from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale100_sf10"
HOT_TENTHS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
HOT_KEY = 1


def _time(df, n=2):
    runs = []
    for _ in range(n):
        t = time.time()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.time() - t)
    return round(min(runs), 3)


def main() -> None:
    spark = get_spark("skew-probe")
    apply_scale_granularity(spark, SF_DIR)
    cat = load_tables(spark, SF_DIR)

    # Skewed big side: HOT_TENTHS/10 of lineitem lands on one key. The
    # remap is deterministic (pmod of the original key), so every
    # variant sees the identical distribution.
    big = cat.table("lineitem").select(
        F.when(F.pmod("l_orderkey", F.lit(10)) < HOT_TENTHS, F.lit(HOT_KEY))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        F.col("l_extendedprice").alias("v"),
    )
    # Small-but-not-broadcastable probe side: every order key once.
    small = cat.table("orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_custkey").alias("ck")
    )

    def joined_agg(b, s):
        return b.join(s, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("sv"),
        )

    out = {
        "metric": "skew_probe",
        "sf_dir": SF_DIR,
        "hot_fraction": HOT_TENTHS / 10,
        "n_salts": 8,
    }
    out["hot_rows"] = big.where(F.col("k") == HOT_KEY).count()
    out["total_rows"] = big.count()

    # Force the SMJ path for the big join in every variant (the probe
    # compares skew treatments, not broadcast eligibility — orders at
    # sf10+ is far past the threshold anyway, this just pins it).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    checks = {}
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        df = joined_agg(big, small)
        out["smj_no_skew_handling_sec"] = _time(df)
        checks["smj_no_skew_handling"] = df.collect()[0]

        # Spark's STOCK granularity — set explicitly because session.py
        # bakes the tuned 64m/factor-2 into the SparkConf, so "unset"/
        # inherited values would measure the tuned config twice (ADVICE
        # r9). The stock values are READ from the installed SQLConf
        # entries' registered defaults rather than hardcoded (ADVICE
        # r10), so this row cannot silently drift mislabeled across a
        # Spark upgrade (4.1.2 reads 256MB / 5.0).
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        jsqlconf = spark._jvm.org.apache.spark.sql.internal.SQLConf
        stock_thr = (
            jsqlconf.SKEW_JOIN_SKEWED_PARTITION_THRESHOLD().defaultValueString()
        )
        stock_fac = (
            jsqlconf.SKEW_JOIN_SKEWED_PARTITION_FACTOR().defaultValueString()
        )
        out["stock_skew_defaults"] = {"threshold": stock_thr, "factor": stock_fac}
        for k, v in (
            ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", stock_thr),
            ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", stock_fac),
        ):
            spark.conf.set(k, v)
        df = joined_agg(big, small)
        out["aqe_skew_join_sec"] = _time(df)
        checks["aqe_skew_join"] = df.collect()[0]

        # AQE's DEFAULT split granularity (256 MB skewedPartitionThreshold,
        # factor 5) is coarse for CPU-bound joins — a ~300 MB hot
        # partition splits into barely two chunks. Tune it down and AQE
        # should approach the salted spread with zero query changes.
        for k, v in (
            ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64m"),
            ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
            ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m"),
        ):
            spark.conf.set(k, v)
        df = joined_agg(big, small)
        out["aqe_skew_join_tuned_sec"] = _time(df)
        checks["aqe_skew_join_tuned"] = df.collect()[0]

        # Control: the same 32 MB advisory size with skew splitting OFF
        # isolates how much of the tuned win is generic partition
        # granularity vs the skew split itself.
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        df = joined_agg(big, small)
        out["advisory_only_sec"] = _time(df)
        checks["advisory_only"] = df.collect()[0]
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # Restore the engine's session values explicitly — unset would
        # fall back to the SparkConf (the tuned values) for the skew
        # pair but to Spark stock for the advisory size, an inconsistent
        # mix (ADVICE r9).
        for k, v in (
            ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64m"),
            ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
        ):
            spark.conf.set(k, v)
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

        # Salt by the value column: deterministic per row (retry-safe,
        # the operators/skew contract) and uniform enough to spread the
        # hot key across all 8 salts.
        salted = salted_broadcast_skew_join(big, small, "k", salt_by=["v"])
        df = salted.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("sv"),
        )
        out["manual_salted_sec"] = _time(df)
        checks["manual_salted"] = df.collect()[0]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    vals = {k: (r["n"], str(r["sv"])) for k, r in checks.items()}
    out["totals_match"] = len(set(vals.values())) == 1
    out["totals"] = vals["aqe_skew_join"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
