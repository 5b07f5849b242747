"""ev_funnel skew/scale row (VERDICT r12 item 7 / "What's wrong" #3).

The r12 window-chain funnel trades 10 scans + 16 exchanges for ONE
exchange that carries raw event rows and four whole-partition windows
that buffer each user's full event set in one task. The open question:
what does a hot user key (bot traffic) cost that shape vs the old
join-chain, whose aggregates map-side-combined per user?

This probe manufactures both corpora deterministically at FACTOR× sf0.1
(default 100× → 10M events):

  uniform — every replica keeps its original user_id (offset per copy,
            so |users| scales with the data; ~1.5k users/copy).
  skewed  — HOT_TENTHS/10 of ALL rows are remapped (pmod of event_id —
            deterministic) to ONE user id across every copy.

and times four cells: {window-chain (the registered ev_funnel), old
join-chain replica} × {uniform, skewed}, warm min-of-2, noop sink.
The two formulations' outputs are also compared on the skewed corpus
(must be identical — the A/B is execution only).

Usage: python tools/funnel_skew_probe.py [FACTOR] [HOT_TENTHS]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.session import (
    apply_scale_granularity,
    get_spark,
)
from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 100
HOT_TENTHS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
BASE = "/root/testdata/sf0.1"
OUT = f"/tmp/funnel_skew_x{FACTOR}_h{HOT_TENTHS}"
HOT_USER = 1


def _build(spark) -> tuple[str, str]:
    ev = load_tables(spark, BASE).table("events")
    n_ev = ev.count()
    copies = None
    for i in range(FACTOR):
        c = ev.select(
            (F.col("event_id") + F.lit(i * n_ev)).alias("event_id"),
            (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
            "event_type",
            "ts",
            "value",
            "props",
        )
        copies = c if copies is None else copies.unionByName(c)
    uniform_dir = os.path.join(OUT, "uniform")
    skewed_dir = os.path.join(OUT, "skewed")
    if not os.path.exists(os.path.join(uniform_dir, "events.parquet", "_SUCCESS")):
        copies.write.mode("overwrite").parquet(
            os.path.join(uniform_dir, "events.parquet")
        )
    if not os.path.exists(os.path.join(skewed_dir, "events.parquet", "_SUCCESS")):
        skewed = copies.withColumn(
            "user_id",
            F.when(
                F.pmod(F.col("event_id"), F.lit(10)) < HOT_TENTHS,
                F.lit(HOT_USER).cast("long"),
            ).otherwise(F.col("user_id")),
        )
        skewed.write.mode("overwrite").parquet(
            os.path.join(skewed_dir, "events.parquet")
        )
    return uniform_dir, skewed_dir


def _old_join_chain(spark, sf_dir):
    """The pre-r12 funnel: 4 aggregations + 3 joins, each stage
    re-deriving upstream (map-side-combined exchanges)."""
    ev = load_tables(spark, sf_dir).table("events")
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "signup_ts"
        )
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    stage = (
        F.when(F.col("purchase_ts").isNotNull(), 4)
        .when(F.col("click_ts").isNotNull(), 3)
        .when(F.col("view_ts").isNotNull(), 2)
        .when(F.col("signup_ts").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        s.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "signup_ts",
            "view_ts",
            "click_ts",
            "purchase_ts",
            stage.alias("funnel_stage"),
        )
    )


def _time(df, n=2):
    runs = []
    for _ in range(n):
        t = time.time()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.time() - t)
    return round(min(runs), 3)


def main():
    spark = get_spark("funnel-skew-probe")
    import __spark_entry__ as entry

    qs = entry.queries()
    t0 = time.time()
    uniform_dir, skewed_dir = _build(spark)
    build_sec = round(time.time() - t0, 3)
    out = {"factor": FACTOR, "hot_tenths": HOT_TENTHS, "build_sec": build_sec}

    for tag, d in (("uniform", uniform_dir), ("skewed", skewed_dir)):
        apply_scale_granularity(spark, d)
        out[f"window_{tag}_sec"] = _time(qs["ev_funnel"](spark, d))
        out[f"joinchain_{tag}_sec"] = _time(_old_join_chain(spark, d))
        out[f"convlag_window_{tag}_sec"] = _time(
            qs["ev_conversion_lag"](spark, d)
        )

    # equality on the skewed corpus: execution-only A/B
    a = qs["ev_funnel"](spark, skewed_dir)
    b = _old_join_chain(spark, skewed_dir)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    out["skewed_outputs_equal"] = diff == 0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
