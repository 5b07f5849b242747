"""A/B probe for star_fct_invoice_line_value (VERDICT r12 item 1).

Times, in ONE session (min-of-N noop, the bench contract):
  A. the current formulation (SMJ LeftSemi for the dim_invoice membership),
  B. broadcast-hinted semi join (customers_with_nation broadcast),
  C. subtree isolation: just the orders_kept semi join,
  D. subtree isolation: everything but the semi join (li ⋈ orders_raw ⋈ part)
     — NOT result-equivalent, time-attribution only.

Usage: python tools/star_fct_probe.py [SF_DIR] [N_RUNS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.functions.keys import surrogate_key
from data_pipeline_4_online_retail_spark.plans.star import (
    fct_invoice_line_value,
    revenue_col,
)
from data_pipeline_4_online_retail_spark.session import (
    apply_scale_granularity,
    get_spark,
)
from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def fct_variant_b(cat):
    """Current formulation + explicit broadcast of the semi join's right."""
    li = cat.table("lineitem")
    o = cat.table("orders")
    p = cat.table("part")
    c = cat.table("customer")
    n = cat.table("nation")
    customers_with_nation = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner"
    ).select("c_custkey")
    orders_kept = (
        o.filter(F.col("o_orderdate").isNotNull())
        .join(
            F.broadcast(customers_with_nation),
            o.o_custkey == F.col("c_custkey"),
            "left_semi",
        )
        .select("o_orderkey", "o_orderdate")
    )
    part_kept = p.filter(
        F.col("p_partkey").isNotNull() & (F.col("p_retailprice") > 0)
    ).select(
        "p_partkey",
        surrogate_key("p_partkey", "p_brand", "p_type").alias("product_key"),
    )
    return (
        li.filter(F.col("l_quantity") > 0)
        .join(orders_kept, li.l_orderkey == orders_kept.o_orderkey, "inner")
        .join(part_kept, li.l_partkey == part_kept.p_partkey, "inner")
        .select(
            surrogate_key("l_orderkey").alias("invoice_key"),
            surrogate_key(
                F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
            ).alias("date_key"),
            "product_key",
            F.col("l_quantity").alias("quantity"),
            revenue_col().alias("total_price"),
        )
    )


def orders_kept_only(cat):
    o = cat.table("orders")
    c = cat.table("customer")
    n = cat.table("nation")
    customers_with_nation = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner"
    ).select("c_custkey")
    return (
        o.filter(F.col("o_orderdate").isNotNull())
        .join(customers_with_nation, o.o_custkey == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_orderdate")
    )


def no_semi(cat):
    li = cat.table("lineitem")
    o = cat.table("orders")
    p = cat.table("part")
    orders_kept = o.filter(F.col("o_orderdate").isNotNull()).select(
        "o_orderkey", "o_orderdate"
    )
    part_kept = p.filter(
        F.col("p_partkey").isNotNull() & (F.col("p_retailprice") > 0)
    ).select(
        "p_partkey",
        surrogate_key("p_partkey", "p_brand", "p_type").alias("product_key"),
    )
    return (
        li.filter(F.col("l_quantity") > 0)
        .join(orders_kept, li.l_orderkey == orders_kept.o_orderkey, "inner")
        .join(part_kept, li.l_partkey == part_kept.p_partkey, "inner")
        .select(
            surrogate_key("l_orderkey").alias("invoice_key"),
            surrogate_key(
                F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
            ).alias("date_key"),
            "product_key",
            F.col("l_quantity").alias("quantity"),
            revenue_col().alias("total_price"),
        )
    )


def md5_free(cat):
    """A: with every surrogate_key md5 replaced by the raw naturals —
    attributes the md5 CPU share. NOT result-equivalent."""
    li = cat.table("lineitem")
    o = cat.table("orders")
    p = cat.table("part")
    c = cat.table("customer")
    n = cat.table("nation")
    customers_with_nation = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner"
    ).select("c_custkey")
    orders_kept = (
        o.filter(F.col("o_orderdate").isNotNull())
        .join(customers_with_nation, o.o_custkey == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_orderdate")
    )
    part_kept = p.filter(
        F.col("p_partkey").isNotNull() & (F.col("p_retailprice") > 0)
    ).select("p_partkey", F.col("p_partkey").alias("product_key"))
    return (
        li.filter(F.col("l_quantity") > 0)
        .join(orders_kept, li.l_orderkey == orders_kept.o_orderkey, "inner")
        .join(part_kept, li.l_partkey == part_kept.p_partkey, "inner")
        .select(
            F.col("l_orderkey").alias("invoice_key"),
            F.col("o_orderdate").alias("date_key"),
            "product_key",
            F.col("l_quantity").alias("quantity"),
            revenue_col().alias("total_price"),
        )
    )


def bench(label, df, n=N):
    runs = []
    for _ in range(n):
        t = time.time()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.time() - t)
    print(f"{label:28s} min={min(runs):.3f} runs={[round(r,3) for r in runs]}")
    return min(runs)


def main():
    spark = get_spark("star-fct-probe")
    apply_scale_granularity(spark, SF_DIR)
    cat = load_tables(spark, SF_DIR)
    # warmup
    cat.table("lineitem").limit(1).write.mode("overwrite").format("noop").save()
    for t in ("orders", "part", "customer", "nation"):
        cat.table(t).limit(1).write.mode("overwrite").format("noop").save()
    bench("A current", fct_invoice_line_value(cat))
    bench("B bcast-semi", fct_variant_b(cat))
    bench("C orders_kept only", orders_kept_only(cat))
    bench("D no-semi (attrib only)", no_semi(cat))
    bench("E md5-free (attrib only)", md5_free(cat))
    # interleaved repeat to damp drift
    bench("A current (2)", fct_invoice_line_value(cat))
    bench("B bcast-semi (2)", fct_variant_b(cat))


if __name__ == "__main__":
    main()
