"""Settle the fact table's SECOND join key (VERDICT r8 item 4).

The r8 bucketed-star probe eliminated the lineitem⋈orders exchange by
bucketing both on the order key, and noted the residual cost is the
fact⋈part join — a different key, and a table can be bucketed on only
one. Two candidate treatments for that second key:

  part_bucketed  — bucket PART on p_partkey. This can only remove the
                   (dim-sized) part-side exchange: the fact side is
                   bucketed on orderkey, so its partkey exchange stays.
                   Expected ~nil; measured to bound the claim.
  part_broadcast — broadcast-hint PART (F.broadcast on the catalog
                   handle; the hint survives the builder's filters).
                   This removes BOTH partkey exchanges: the fact-side
                   shuffle — the one that matters at 100 TB — never
                   happens. An explicit hint rather than a raised
                   autoBroadcastJoinThreshold so the customer/nation
                   joins keep their default plans and the A/B isolates
                   the part join.

Usage:
  python tools/second_key_probe.py [SF_DIR] [N_BUCKETS]
(defaults: /tmp/scale100_sf10, 32)

SPARK_GRAFT_SKP_VARIANTS=comma,list restricts which variants are TIMED
(static shuffle counts are always recorded for all four — they cost one
plan, not a run). At sf100 the plain fact build spills ~35 GB; with the
bucketed copies co-resident on the 63 GB scratch box that run ENOSPCs,
and its number is already on record (SCALING.md §r8: 131.4 s) — so the
sf100 invocation times only the bucketed-fact variants.

Prints one JSON line: seconds (warm min-of-2, noop sink) and
shuffle-exchange counts for plain / fact-bucketed / fact-bucketed+
part-bucketed / fact-bucketed+part-broadcast, plus the write costs.
The decision rule the numbers back goes in sources/bucketing.py.
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
    # measured rule as code (VERDICT r11 item 5): second-key family default per the refined rule; r9 ran 32 via CLI
    else pick_bucket_count(
        table_file_bytes(SF_DIR, "lineitem"),
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        consumers="scan",
    )
)
WAREHOUSE = "/tmp/second_key_probe"


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
        "second-key-probe",
        extra_conf={
            "spark.sql.legacy.bucketedTableScan.outputOrdering": "true"
        },
    )
    apply_scale_granularity(spark, SF_DIR)
    plain = load_tables(spark, SF_DIR)
    out = {"metric": "second_key_probe", "sf_dir": SF_DIR, "n_buckets": N_BUCKETS}

    t0 = time.time()
    write_bucketed(
        plain.table("lineitem"), "skp_li", f"{WAREHOUSE}/lineitem",
        bucket_by="l_orderkey", n_buckets=N_BUCKETS,
    )
    write_bucketed(
        plain.table("orders"), "skp_ord", f"{WAREHOUSE}/orders",
        bucket_by="o_orderkey", n_buckets=N_BUCKETS,
    )
    out["fact_bucketed_write_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    write_bucketed(
        plain.table("part"), "skp_part", f"{WAREHOUSE}/part",
        bucket_by="p_partkey", n_buckets=N_BUCKETS,
    )
    out["part_bucketed_write_sec"] = round(time.time() - t0, 3)

    def make_cat(li=None, orders=None, part=None) -> Catalog:
        c = Catalog(spark)
        c.register("lineitem", li if li is not None else plain.table("lineitem"))
        c.register("orders", orders if orders is not None else plain.table("orders"))
        c.register("part", part if part is not None else plain.table("part"))
        for name in ("customer", "nation"):
            c.register(name, plain.table(name))
        return c

    li_b = spark.table("skp_li")
    ord_b = spark.table("skp_ord")
    part_b = spark.table("skp_part")

    # Build + measure one variant at a time (register() rebinds temp
    # views; the fct builder resolves through Catalog handles at build
    # time, so finished DataFrames are immune to later rebinding).
    from pyspark.sql import functions as F

    variants = {}
    variants["plain"] = fct_invoice_line_value(make_cat())
    variants["fact_bucketed"] = fct_invoice_line_value(
        make_cat(li=li_b, orders=ord_b)
    )
    variants["fact_part_bucketed"] = fct_invoice_line_value(
        make_cat(li=li_b, orders=ord_b, part=part_b)
    )
    variants["fact_bucketed_part_broadcast"] = fct_invoice_line_value(
        make_cat(li=li_b, orders=ord_b, part=F.broadcast(plain.table("part")))
    )

    all_names = (
        "plain",
        "fact_bucketed",
        "fact_part_bucketed",
        "fact_bucketed_part_broadcast",
    )
    timed = set(
        os.environ.get("SPARK_GRAFT_SKP_VARIANTS", ",".join(all_names)).split(",")
    )
    for name in all_names:
        out[f"{name}_shuffles"] = _shuffles(variants[name])
        if name in timed:
            # Fault-isolated (the bench.py convention): a variant that
            # cannot run at this scale — e.g. the part broadcast
            # exceeding the driver's build budget at sf100 — is itself
            # a result, and must not cost the completed timings.
            try:
                out[f"{name}_sec"] = _time(variants[name])
            except Exception as exc:  # noqa: BLE001
                out[f"{name}_error"] = str(exc).split("\n")[0][:300]
            # exact per-variant key list: substring match (`name in k`)
            # swept sibling variants sharing a prefix, e.g.
            # 'fact_bucketed' also printed the
            # 'fact_bucketed_part_broadcast_*' keys (ADVICE r9)
            keys = (f"{name}_shuffles", f"{name}_sec", f"{name}_error")
            print(
                json.dumps({k: out[k] for k in keys if k in out}),
                flush=True,
            )

    for t in ("skp_li", "skp_ord", "skp_part"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
