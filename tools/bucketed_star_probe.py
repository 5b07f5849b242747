"""Measure the bucketed-layout payoff on the star fact build.

SCALING.md §r8 narrowed the fact build's exchanges (md5 keys post-join);
this probe measures the step beyond narrowing: ELIMINATING the
lineitem⋈orders exchange by reading both sides from tables bucketed (and
bucket-sorted) on the order key — `sources/bucketing.py`'s layout, which
a 100 TB deployment would maintain anyway so every order-keyed query
(the fact build, report_year's per-order rollup, sessionization-style
per-order windows) amortizes one write-time shuffle.

Usage:
  python tools/bucketed_star_probe.py [SF_DIR] [N_BUCKETS]
(defaults: /tmp/scale100_sf10, 32)

Prints one JSON line: plain vs bucketed fact-build seconds (warm
min-of-2), the Exchange count in each physical plan, and the one-time
bucketed-write cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_4_online_retail_spark.plans.star import (
    fct_invoice_line_value,
)
from data_pipeline_4_online_retail_spark.session import (
    apply_scale_granularity,
    get_spark,
)
from data_pipeline_4_online_retail_spark.sources.bucketing import (
    write_bucketed,
)
from data_pipeline_4_online_retail_spark.sources.catalog import (
    Catalog,
    load_tables,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale100_sf10"
N_BUCKETS = (
    int(sys.argv[2])
    if len(sys.argv) > 2
    # measured rule as code (VERDICT r11 item 5): star consumers re-partition post-scan (r8 probe ran 1 wave)
    else pick_bucket_count(
        table_file_bytes(SF_DIR, "lineitem"),
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        consumers="exchange",
    )
)
WAREHOUSE = "/tmp/bucketed_star_probe"


def _time(df, n=2):
    runs = []
    for _ in range(n):
        t = time.time()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.time() - t)
    return round(min(runs), 3)


def _exchanges(df) -> int:
    # Shuffle exchanges only: counting every "Exchange" would include
    # BroadcastExchange nodes (present in BOTH plain and bucketed plans
    # from the customer semi-join and part join) and muddy the delta.
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange hashpartitioning"
    )


def main() -> None:
    # sort-order trust: Spark only propagates the bucket files' sortBy
    # order into SMJ (eliminating the per-query Sort) when this legacy
    # conf is on AND every bucket is a single file (see write_bucketed's
    # single_file_buckets). Planning lists files — fine for a persisted
    # layout, which is the only place bucketing makes sense anyway.
    spark = get_spark(
        "bucketed-star-probe",
        extra_conf={
            "spark.sql.legacy.bucketedTableScan.outputOrdering": "true"
        },
    )
    apply_scale_granularity(spark, SF_DIR)
    plain = load_tables(spark, SF_DIR)

    t0 = time.time()
    write_bucketed(
        plain.table("lineitem"),
        "li_bucketed",
        f"{WAREHOUSE}/lineitem",
        bucket_by="l_orderkey",
        n_buckets=N_BUCKETS,
    )
    write_bucketed(
        plain.table("orders"),
        "ord_bucketed",
        f"{WAREHOUSE}/orders",
        bucket_by="o_orderkey",
        n_buckets=N_BUCKETS,
    )
    write_sec = round(time.time() - t0, 3)

    bucketed = Catalog(spark)
    bucketed.register("lineitem", spark.table("li_bucketed"))
    bucketed.register("orders", spark.table("ord_bucketed"))
    for name in ("part", "customer", "nation"):
        bucketed.register(name, plain.table(name))

    plain_fct = fct_invoice_line_value(plain)
    bucketed_fct = fct_invoice_line_value(bucketed)

    out = {
        "metric": "bucketed_star_probe",
        "sf_dir": SF_DIR,
        "n_buckets": N_BUCKETS,
        "bucketed_write_sec": write_sec,
        "plain_sec": _time(plain_fct),
        "bucketed_sec": _time(bucketed_fct),
        "plain_exchanges": _exchanges(plain_fct),
        "bucketed_exchanges": _exchanges(bucketed_fct),
    }
    out["speedup"] = round(out["plain_sec"] / max(out["bucketed_sec"], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
