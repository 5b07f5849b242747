"""Measure Spark's runtime bloom-filter join pruning on the TPC-H
partkey family — the zero-layout lever (r10).

Spark 3.4+ can inject a bloom filter built from a shuffle join's
selective (dim) side into the fact-side scan (`InjectRuntimeFilter`),
semi-reducing the fact BEFORE the join exchange — conceptually the
runtime version of the partkey projection's pruning, at zero storage
cost. It is ON by default but gated by
`applicationSideScanSizeThreshold` = 10 GB — so at every SF this repo
benches (sf0.1 17 MB ... sf100 ~11 GB lineitem) it fires rarely or
never, and the engine's published numbers never included it. This
probe prices three settings on the same queries:

  off     — bloomFilter.enabled=false (the clean baseline)
  stock   — Spark defaults (10 GB application threshold)
  tuned   — applicationSideScanSizeThreshold=1g,
            creationSideThreshold=100m (fire on any fact-sized scan
            with a dim-sized build side)

Usage:
  python tools/runtime_filter_probe.py [SF_DIR] [query ...]
(defaults: /tmp/scale1000_sf100; tpch_q08 tpch_q17 tpch_q19)

Prints one JSON line per (query, variant) with seconds (warm min-of-2,
noop sink) and whether the executed plan contains a
bloom_filter_might_contain predicate, then a summary line.
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

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale1000_sf100"
NAMES = sys.argv[2:] or ["tpch_q08", "tpch_q17", "tpch_q19"]
N_RUNS = int(os.environ.get("SPARK_GRAFT_RFP_RUNS", "2"))

_ENABLED = "spark.sql.optimizer.runtime.bloomFilter.enabled"
_APP_THRESH = (
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
)
_CREATE_THRESH = "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"

VARIANTS = {
    "off": {_ENABLED: "false"},
    "stock": {_ENABLED: "true", _APP_THRESH: "10GB", _CREATE_THRESH: "10MB"},
    "tuned": {_ENABLED: "true", _APP_THRESH: "1g", _CREATE_THRESH: "100m"},
}


def main() -> None:
    spark = get_spark("runtime-filter-probe")
    apply_scale_granularity(spark, SF_DIR)
    qs = entry.queries()
    out = {"metric": "runtime_filter_probe", "sf_dir": SF_DIR, "results": {}}

    for name in NAMES:
        res = out["results"].setdefault(name, {})
        for variant, confs in VARIANTS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            try:
                df = qs[name](spark, SF_DIR)
                runs = []
                for _ in range(N_RUNS):
                    t = time.time()
                    df.write.mode("overwrite").format("noop").save()
                    runs.append(time.time() - t)
                res[f"{variant}_sec"] = round(min(runs), 3)
                # injection is an optimizer rewrite — visible as a
                # might_contain predicate in the OPTIMIZED logical plan
                # (the physical toString truncates the expression, which
                # hid it from this probe's first version)
                plan = df._jdf.queryExecution().optimizedPlan().toString()
                res[f"{variant}_bloom"] = "might_contain" in plan.lower()
            except Exception as exc:  # noqa: BLE001 — fault-isolated
                res[f"{variant}_error"] = str(exc).split("\n")[0][:300]
            print(
                json.dumps({name: {k: res[k] for k in res if k.startswith(variant)}}),
                flush=True,
            )
    # restore engine defaults (stock)
    for k, v in VARIANTS["stock"].items():
        spark.conf.set(k, v)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
