"""Do runtime bloom filters STACK with the partkey projection?

SCALING §r10 adopted tuned runtime bloom-filter pruning (1g/100m — q17
51->8.7 s, q19 22->5.8 at sf100 on PLAIN parquet) and separately priced
the partkey fact projection (2x storage, 2.4-7.8x). The claim that the
two "stack since they remove different costs" (bloom semi-reduces the
fact SCAN; the projection deletes the join EXCHANGE) was asserted, not
measured — VERDICT r10 item 3. This probe times the full 2x2 on the
partkey family:

          bloom off            bloom tuned (1g/100m)
  plain   r10 baseline         r10 adopted
  proj    r10 layout number    THE UNMEASURED CELL

per query: warm min-of-N seconds (noop sink), static exchange count,
and whether the optimized plan carries a might_contain predicate — if
the projection cell shows bloom_tuned ~= bloom_off, they do NOT stack
there and the layout decision rule should say so.

Usage:
  python tools/bloom_stack_probe.py [SF_DIR] [N_BUCKETS] [query ...]
(defaults: /tmp/scale1000_sf100, 128 — the measured-best bucket count —
and tpch_q17 tpch_q19 tpch_q09)

SPARK_GRAFT_BSP_RUNS sets min-of-n (default 2). Bucketed tables live
under /tmp/bloom_stack_probe, dropped at exit.
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
from data_pipeline_4_online_retail_spark.sources.bucketing import write_bucketed
from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale1000_sf100"
N_BUCKETS = (
    int(sys.argv[2])
    if len(sys.argv) > 2
    # measured rule as code (VERDICT r11 item 5): partkey family q17/q19/q09 is scan-dominated -> 128 on 32 cores
    else pick_bucket_count(
        table_file_bytes(SF_DIR, "lineitem"),
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        consumers="scan",
    )
)
NAMES = sys.argv[3:] or ["tpch_q17", "tpch_q19", "tpch_q09"]
WAREHOUSE = "/tmp/bloom_stack_probe"
N_RUNS = int(os.environ.get("SPARK_GRAFT_BSP_RUNS", "2"))

_ENABLED = "spark.sql.optimizer.runtime.bloomFilter.enabled"
_APP_THRESH = (
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
)
_CREATE_THRESH = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"

BLOOM = {
    "off": {_ENABLED: "false"},
    "tuned": {_ENABLED: "true", _APP_THRESH: "1g", _CREATE_THRESH: "100m"},
}


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
        "bloom-stack-probe",
        extra_conf={
            "spark.sql.legacy.bucketedTableScan.outputOrdering": "true"
        },
    )
    apply_scale_granularity(spark, SF_DIR)
    cat = load_tables(spark, SF_DIR)
    orig_li, orig_part = cat.table("lineitem"), cat.table("part")
    qs = entry.queries()
    out = {
        "metric": "bloom_stack_probe",
        "sf_dir": SF_DIR,
        "n_buckets": N_BUCKETS,
        "results": {},
    }

    t0 = time.time()
    write_bucketed(
        orig_part, "bsp_part", f"{WAREHOUSE}/part",
        bucket_by="p_partkey", n_buckets=N_BUCKETS,
    )
    write_bucketed(
        orig_li, "bsp_li", f"{WAREHOUSE}/lineitem",
        bucket_by="l_partkey", n_buckets=N_BUCKETS,
    )
    out["projection_write_sec"] = round(time.time() - t0, 3)
    layouts = {
        "plain": (orig_li, orig_part),
        "proj": (spark.table("bsp_li"), spark.table("bsp_part")),
    }

    try:
        for name in NAMES:
            res = out["results"].setdefault(name, {})
            for lay, (li, part) in layouts.items():
                cat.register("lineitem", li)
                cat.register("part", part)
                for bloom, confs in BLOOM.items():
                    for k, v in confs.items():
                        spark.conf.set(k, v)
                    cell = f"{lay}_{bloom}"
                    try:
                        df = qs[name](spark, SF_DIR)
                        res[f"{cell}_sec"] = _time(df)
                        res[f"{cell}_shuffles"] = _shuffles(df)
                        plan = df._jdf.queryExecution().optimizedPlan().toString()
                        res[f"{cell}_bloom"] = "might_contain" in plan.lower()
                    except Exception as exc:  # noqa: BLE001 — fault-isolated
                        res[f"{cell}_error"] = str(exc).split("\n")[0][:300]
                    print(
                        json.dumps(
                            {name: {k: res[k] for k in res if k.startswith(cell)}}
                        ),
                        flush=True,
                    )
    finally:
        cat.register("lineitem", orig_li)
        cat.register("part", orig_part)
        for k, v in BLOOM["tuned"].items():
            spark.conf.set(k, v)
        for t in ("bsp_li", "bsp_part"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(WAREHOUSE, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
