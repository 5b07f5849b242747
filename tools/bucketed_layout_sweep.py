"""How much of the TPC-H tier does ONE bucketed layout serve?

The r8/r9 probes measured the orderkey-bucketed lineitem+orders layout
on two queries (the star fact build, q05). The layout argument at
100 TB is AMORTIZATION — one write-time shuffle, many queries — so this
sweep times every registered query the caller names, plain vs
layout-overridden, in one session (warm min-of-2, noop sink, shuffle
exchanges counted statically). Queries that join orders⋈lineitem on the
order key early (q03, q04, q10, q12, q18) and q21 (three lineitem
self-probes on l_orderkey — every branch reads the SAME bucketed scan,
so all of them co-partition for free) are the expected winners; any
query where an intermediate join re-partitions before the order-key
join (the fct build's custkey semi) measures the layout's limit
instead.

Usage:
  python tools/bucketed_layout_sweep.py SF_DIR [N_BUCKETS] [query ...]
(defaults: 32 buckets; queries default to tpch_q03 q04 q10 q12 q18 q21)

Prints one JSON line per query as it completes, then a summary line.
"""

from __future__ import annotations

import json
import os
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

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale100_sf10"
N_BUCKETS = (
    int(sys.argv[2])
    if len(sys.argv) > 2
    # measured rule as code (VERDICT r11 item 5): sweep default = the aggregate winner; q03/q05 exception via CLI
    else pick_bucket_count(
        table_file_bytes(SF_DIR, "lineitem"),
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        consumers="scan",
    )
)
NAMES = sys.argv[3:] or [
    "tpch_q03",
    "tpch_q04",
    "tpch_q10",
    "tpch_q12",
    "tpch_q18",
    "tpch_q21",
]
WAREHOUSE = "/tmp/bucketed_layout_sweep"


def _time(df, n=2):
    runs = []
    for _ in range(n):
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
        "bucketed-layout-sweep",
        extra_conf={
            "spark.sql.legacy.bucketedTableScan.outputOrdering": "true"
        },
    )
    apply_scale_granularity(spark, SF_DIR)
    qs = entry.queries()
    cat = load_tables(spark, SF_DIR)
    results = {}

    for name in NAMES:
        df = qs[name](spark, SF_DIR)
        results[name] = {"plain_sec": _time(df), "plain_shuffles": _shuffles(df)}
        print(json.dumps({name: results[name]}), flush=True)

    t0 = time.time()
    write_bucketed(
        cat.table("lineitem"), "bls_li", f"{WAREHOUSE}/lineitem",
        bucket_by="l_orderkey", n_buckets=N_BUCKETS,
    )
    write_bucketed(
        cat.table("orders"), "bls_ord", f"{WAREHOUSE}/orders",
        bucket_by="o_orderkey", n_buckets=N_BUCKETS,
    )
    write_sec = round(time.time() - t0, 3)

    orig_li, orig_ord = cat.table("lineitem"), cat.table("orders")
    cat.register("lineitem", spark.table("bls_li"))
    cat.register("orders", spark.table("bls_ord"))
    try:
        for name in NAMES:
            df = qs[name](spark, SF_DIR)
            r = results[name]
            r["bucketed_sec"] = _time(df)
            r["bucketed_shuffles"] = _shuffles(df)
            r["speedup"] = round(r["plain_sec"] / max(r["bucketed_sec"], 1e-9), 2)
            print(json.dumps({name: r}), flush=True)
    finally:
        cat.register("lineitem", orig_li)
        cat.register("orders", orig_ord)
        for t in ("bls_li", "bls_ord"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    print(
        json.dumps(
            {
                "metric": "bucketed_layout_sweep",
                "sf_dir": SF_DIR,
                "n_buckets": N_BUCKETS,
                "bucketed_write_sec": write_sec,
                "results": results,
            }
        )
    )


if __name__ == "__main__":
    main()
