"""Retail-domain analytics extensions: RFM segmentation and
market-basket co-occurrence.

The reference pipeline's report models (report_customer_invoices.sql,
report_product_invoices.sql — /root/reference/include/model/) stop at
per-entity invoice counts and revenue sums. These operators add the two
classic next steps a retail warehouse builds on exactly those tables:
customer RFM scoring and product co-purchase affinity.

Scale notes are per-operator; both are single-shuffle shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_4_online_retail_spark.plans.registry import register
from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

MIN_PAIR_SUPPORT = 3


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_tables(spark, sf_dir).table(name)


@register(
    "op_rfm_segments",
    """
    WITH per_cust AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey)
    SELECT o_custkey, last_order, frequency, monetary,
           CAST(NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS INT)
               AS r_score,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT)
               AS f_score,
           CAST(NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS INT)
               AS m_score
    FROM per_cust
    """,
    doc="retail analytics: RFM (recency/frequency/monetary) customer "
    "segmentation over orders — one aggregate per customer, then three "
    "quartile scores (ntile with deterministic custkey tie-breaks; "
    "score 1 = best). Monetary accumulates in DECIMAL then casts out "
    "(the engine-exact discipline). Scale: one shuffle on o_custkey for "
    "the aggregate; the ntile windows are global single-partition sorts "
    "over the CUSTOMER-level frame (|customers| << |orders|) — at 100 TB "
    "replace with percentile-bound scoring (approx_percentile cutoffs "
    "broadcast back, map-side CASE), which this module's pytest "
    "cross-checks as agreeing on quartile boundaries.",
    tags=("retail", "r4b"),
)
def op_rfm_segments(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    return per_cust.select(
        "o_custkey",
        "last_order",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy(F.desc("last_order"), F.asc("o_custkey")))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey")))
        .alias("m_score"),
    )


@register(
    "op_market_basket_pairs",
    f"""
    WITH basket AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    freq AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM basket GROUP BY l_partkey),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS pair_orders
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2)
    SELECT part_a, part_b, pair_orders,
           fa.n_orders AS orders_a, fb.n_orders AS orders_b,
           CAST(pair_orders AS DOUBLE) / CAST(fa.n_orders AS DOUBLE)
               AS confidence_a_to_b
    FROM pairs
    JOIN freq fa ON part_a = fa.l_partkey
    JOIN freq fb ON part_b = fb.l_partkey
    WHERE pair_orders >= {MIN_PAIR_SUPPORT}
    """,
    doc="retail analytics: market-basket co-occurrence — part pairs "
    "bought in the same order, with support counts and "
    "confidence(a->b) = P(b in basket | a in basket). The quadratic "
    "term is per-basket (self-join on l_orderkey after DISTINCT "
    "basket rows), so cost is sum_orders(basket_size^2) — basket sizes "
    "are bounded (~7 lines), NOT corpus-sized; the orderkey equi-join "
    "hash-partitions cleanly at 100 TB. The confidence ratio divides "
    "two exact integers (IEEE-exact, engine-identical). Min-support "
    "pruning cuts the output long before the frequency joins.",
    tags=("retail", "r4b"),
)
def op_market_basket_pairs(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    freq = basket.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_orders"))
        .filter(F.col("pair_orders") >= MIN_PAIR_SUPPORT)
    )
    fa = freq.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("orders_a")
    )
    fb = freq.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("orders_b")
    )
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .select(
            "part_a",
            "part_b",
            "pair_orders",
            "orders_a",
            "orders_b",
            (
                F.col("pair_orders").cast("double")
                / F.col("orders_a").cast("double")
            ).alias("confidence_a_to_b"),
        )
    )
