"""Price the partkey tail's storage points (VERDICT r9 items 4-5).

The r9 record (SCALING §r9) rescued the TPC-H partkey family
(q08/q09/q16/q17/q19/q20) with a SECOND fact copy bucketed on partkey —
2x fact storage. q19's three-step showed a cheaper point exists:
dim-side-only bucketing (PART bucketed, lineitem plain) bought 22.7 →
18.8 s by deleting just the dim-side exchange. This probe prices that
point for the whole family, and re-times q02 (whose r10 rewrite moved
the supplier-attribute join below the per-part min filter) at both
storage points.

Variants (same catalog-override mechanics as bucketed_layout_sweep):

  plain       — stock parquet. The r9 sweep already recorded the family
                (q08 69.4 / q09 70.1 / q16 52.9 / q17 54.1 / q19 22.7 /
                q20 49.0 at sf100); re-time plain only for queries whose
                CODE changed since (q02).
  dim_bucketed — part bucketed by p_partkey, lineitem plain: the
                zero-extra-fact-storage point. Only the dim-side
                exchange can disappear — the fact-side partkey exchange
                (the one that dominates at 100 TB) stays.
  projection  — lineitem AND part bucketed by partkey: the 2x-storage
                point that took every family member under 10x/decade.

Usage:
  python tools/partkey_tail_probe.py [SF_DIR] [N_BUCKETS] [query ...]
(defaults: /tmp/scale1000_sf100, 32, the partkey family + q02)

SPARK_GRAFT_PTP_VARIANTS=comma,list restricts which variants are timed
(bucketed copies are only WRITTEN if a selected variant needs them);
SPARK_GRAFT_PTP_RUNS sets min-of-n (default 2). Prints one JSON line
per (query, variant) as it completes, then a summary line. Bucketed
warehouse tables live under /tmp/partkey_tail_probe and are dropped at
exit unless SPARK_GRAFT_PTP_KEEP=1.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from data_pipeline_4_online_retail_spark.session import (
    apply_scale_granularity,
    get_spark,
)
from data_pipeline_4_online_retail_spark.sources.bucketing import (
    write_bucketed,
)
from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale1000_sf100"
N_BUCKETS = (
    int(sys.argv[2])
    if len(sys.argv) > 2
    # measured rule as code (VERDICT r11 item 5): partkey projection family completed at 128 (SCALING r10 addendum)
    else pick_bucket_count(
        table_file_bytes(SF_DIR, "lineitem"),
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        consumers="scan",
    )
)
NAMES = sys.argv[3:] or [
    "tpch_q02",
    "tpch_q08",
    "tpch_q09",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
]
WAREHOUSE = "/tmp/partkey_tail_probe"
VARIANTS = [
    v
    for v in os.environ.get(
        "SPARK_GRAFT_PTP_VARIANTS", "plain,dim_bucketed,projection"
    ).split(",")
    if v
]
N_RUNS = int(os.environ.get("SPARK_GRAFT_PTP_RUNS", "2"))


def _time(df):
    runs = []
    for _ in range(N_RUNS):
        t = time.time()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.time() - t)
    return round(min(runs), 3)


def _shuffles(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange hashpartitioning"
    )


def main() -> None:
    spark = get_spark(
        "partkey-tail-probe",
        extra_conf={
            "spark.sql.legacy.bucketedTableScan.outputOrdering": "true"
        },
    )
    apply_scale_granularity(spark, SF_DIR)
    cat = load_tables(spark, SF_DIR)
    orig_li, orig_part = cat.table("lineitem"), cat.table("part")
    qs = entry.queries()
    out = {
        "metric": "partkey_tail_probe",
        "sf_dir": SF_DIR,
        "n_buckets": N_BUCKETS,
        "variants": VARIANTS,
        "results": {},
    }

    part_b = li_b = None
    if {"dim_bucketed", "projection"} & set(VARIANTS):
        t0 = time.time()
        write_bucketed(
            orig_part, "ptp_part", f"{WAREHOUSE}/part",
            bucket_by="p_partkey", n_buckets=N_BUCKETS,
        )
        part_b = spark.table("ptp_part")
        out["part_write_sec"] = round(time.time() - t0, 3)
    if "projection" in VARIANTS:
        t0 = time.time()
        write_bucketed(
            orig_li, "ptp_li", f"{WAREHOUSE}/lineitem",
            bucket_by="l_partkey", n_buckets=N_BUCKETS,
        )
        li_b = spark.table("ptp_li")
        out["lineitem_write_sec"] = round(time.time() - t0, 3)

    overrides = {
        "plain": (orig_li, orig_part),
        "dim_bucketed": (orig_li, part_b),
        "projection": (li_b, part_b),
    }
    try:
        for name in NAMES:
            res = out["results"].setdefault(name, {})
            for variant in VARIANTS:
                li, part = overrides[variant]
                cat.register("lineitem", li)
                cat.register("part", part)
                df = qs[name](spark, SF_DIR)
                res[f"{variant}_shuffles"] = _shuffles(df)
                try:
                    res[f"{variant}_sec"] = _time(df)
                except Exception as exc:  # noqa: BLE001 — a variant that
                    # dies at this scale is itself a result (bench.py
                    # fault-isolation convention)
                    res[f"{variant}_error"] = str(exc).split("\n")[0][:300]
                print(json.dumps({name: {k: res[k] for k in res if k.startswith(variant)}}), flush=True)
    finally:
        cat.register("lineitem", orig_li)
        cat.register("part", orig_part)
        if os.environ.get("SPARK_GRAFT_PTP_KEEP") != "1":
            for t in ("ptp_li", "ptp_part"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(WAREHOUSE, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
