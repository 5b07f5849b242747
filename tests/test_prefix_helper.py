"""functions/prefix.py — range-bucket + boundary-carry global prefix.

Semantics are pinned against the plain unpartitioned-window formulation
(fine at fixture size) and against a pure-Python replay; the plan tests
pin the point of the rewrite — no fact-sized ``Exchange SinglePartition``
window remains in the four rewritten operators (VERDICT r5 item 2).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_4_online_retail_spark.functions.prefix import (
    attach_range_buckets,
    global_lead,
    global_prefix,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def skewed_df(spark):
    # heavy ties on the bucket key (d repeats ~20x) + unique tiebreaker k.
    rng = random.Random(11)
    rows = [
        (i, rng.randint(0, 30), float(rng.randint(-50, 999)))
        for i in range(600)
    ]
    return spark.createDataFrame(rows, "k long, d long, v double"), rows


def test_prefix_sum_matches_single_partition_window(skewed_df):
    df, _rows = skewed_df
    out = global_prefix(
        df,
        ["d", "k"],
        {"run": ("sum", F.col("v"), True)},
        F.col("d"),
        n_buckets=7,
    )
    w = Window.orderBy("d", "k").rowsBetween(Window.unboundedPreceding, 0)
    ref = df.withColumn("run", F.sum("v").over(w))
    got = {r["k"]: r["run"] for r in out.collect()}
    exp = {r["k"]: r["run"] for r in ref.collect()}
    assert got == pytest.approx(exp)


def test_prefix_max_exclusive_matches_window(skewed_df):
    df, _rows = skewed_df
    out = global_prefix(
        df,
        ["d", F.desc("v"), "k"],
        {"best": ("max", F.col("v"), False)},
        F.col("d"),
        n_buckets=5,
    )
    w = Window.orderBy("d", F.desc("v"), "k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ref = df.withColumn("best", F.max("v").over(w))
    got = {r["k"]: r["best"] for r in out.collect()}
    exp = {r["k"]: r["best"] for r in ref.collect()}
    assert got == exp  # exact doubles: same values, no re-summation


def test_prefix_count_is_row_number(skewed_df):
    df, rows = skewed_df
    out = global_prefix(
        df,
        ["d", "k"],
        {"rn": ("count", F.lit(1), True)},
        F.col("d"),
        n_buckets=9,
    )
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    exp = {r[0]: i + 1 for i, r in enumerate(ordered)}
    got = {r["k"]: r["rn"] for r in out.collect()}
    assert got == exp


def test_prefix_multiple_aggs_one_call(skewed_df):
    df, rows = skewed_df
    out = global_prefix(
        df,
        ["d", "k"],
        {
            "rn": ("count", F.lit(1), True),
            "run": ("sum", F.col("v"), True),
            "best": ("max", F.col("v"), True),
        },
        F.col("d"),
        n_buckets=6,
    )
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    run = best = None
    exp = {}
    for i, (k, _d, v) in enumerate(ordered):
        run = v if run is None else run + v
        best = v if best is None else max(best, v)
        exp[k] = (i + 1, best)
    for r in out.collect():
        ern, ebest = exp[r["k"]]
        assert r["rn"] == ern
        assert r["best"] == ebest


def test_global_lead_including_empty_bucket_gaps(spark):
    # sparse keys: quantile cuts leave empty bucket ids between dense
    # clusters; the tail row of a cluster must still find the next
    # cluster's head.
    keys = [1, 2, 3, 1000, 1001, 5000]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = global_lead(df, ["k"], "k", F.col("k"), out_name="nxt", n_buckets=6)
    got = {r["k"]: r["nxt"] for r in out.collect()}
    assert got == {1: 2, 2: 3, 3: 1000, 1000: 1001, 1001: 5000, 5000: None}


def test_ties_never_straddle_buckets(skewed_df):
    df, _rows = skewed_df
    b = attach_range_buckets(df, F.col("d"), n_buckets=8)
    per_key = (
        b.groupBy("d")
        .agg(F.countDistinct("__pfx_bucket").alias("nb"))
        .agg(F.max("nb").alias("mx"))
        .collect()[0]["mx"]
    )
    assert per_key == 1


def test_empty_input_ok(spark):
    df = spark.createDataFrame([], "k long, v double")
    out = global_prefix(
        df, ["k"], {"run": ("sum", F.col("v"), True)}, F.col("k")
    )
    assert out.count() == 0
    led = global_lead(df, ["k"], "k", F.col("k"))
    assert led.count() == 0


@pytest.mark.parametrize(
    "name",
    [
        "ev_peak_concurrency",
        "op_skyline_pareto",
        "op_sequence_gaps",
        "op_quantile_normalization",
    ],
)
def test_no_fact_sized_single_partition_window(spark, name):
    """The r6 rewrite's contract: every Window over fact-derived rows is
    partitioned by __pfx_bucket (parallel hash exchange); the only
    SinglePartition exchanges feed <= n_buckets-row carry windows, 1-row
    broadcast counts, or the final 1-row aggregate."""
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" not in line or "windowspecdefinition" not in line:
            continue
        if "__pfx_bucket ASC" in line or "__tot_" in line or "__head" in line:
            continue  # the tiny carry window over bucket totals/heads
        # fact-sized window: must be partitioned (first arg of
        # windowspecdefinition is a partition column, and the exchange
        # beneath is a hashpartitioning, never SinglePartition)
        below = "\n".join(lines[i : i + 4])
        assert "SinglePartition" not in below, f"{name}: {line}"


def test_partitioned_prefix_matches_partitioned_window(skewed_df):
    """partition_cols: same values as an ordinary PARTITION BY window —
    the bounded-cardinality decomposition for fact-sized groups (r6,
    op_window_rank / op_quantile_normalization's grouped side)."""
    df, _rows = skewed_df
    g = df.withColumn("grp", (F.col("k") % 3).cast("int"))
    out = global_prefix(
        g,
        ["d", "k"],
        {"run": ("sum", F.col("v"), True), "pos": ("count", F.lit(1), True)},
        F.col("d"),
        n_buckets=7,
        partition_cols=["grp"],
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("d", "k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ref = g.withColumn("run", F.sum("v").over(w)).withColumn(
        "pos", F.count(F.lit(1)).over(w)
    )
    got = {r["k"]: (r["run"], r["pos"]) for r in out.collect()}
    exp = {r["k"]: (r["run"], r["pos"]) for r in ref.collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][1] == exp[k][1]
        assert got[k][0] == pytest.approx(exp[k][0])


def test_window_rank_decomposition_matches_rank(spark):
    """op_window_rank's count-prefix form == rank()/dense_rank() under
    the unique tie-broken ordering (the docstring's claim)."""
    from data_pipeline_4_online_retail_spark.operators.relational import (
        op_window_rank,
    )
    from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

    sf = "/root/testdata/sf0.001"
    got = {
        r["c_custkey"]: (r["bal_rank"], r["bal_dense_rank"])
        for r in op_window_rank(spark, sf).collect()
    }
    c = load_tables(spark, sf).table("customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    ref = {
        r["c_custkey"]: (r["r"], r["dr"])
        for r in c.select(
            "c_custkey",
            F.rank().over(w).alias("r"),
            F.dense_rank().over(w).alias("dr"),
        ).collect()
    }
    assert got == ref


def test_global_ntile_matches_window_ntile(spark):
    """global_ntile == WindowExec ntile for every (n, k) shape that
    exercises the closed-form tile arithmetic: n % k == 0, n % k != 0,
    n < k (each row its own tile)."""
    from data_pipeline_4_online_retail_spark.functions.prefix import (
        global_ntile,
    )

    for n, k in ((40, 4), (43, 4), (3, 10), (10, 10), (101, 7)):
        rows = [(i, (i * 37) % 19) for i in range(n)]
        df = spark.createDataFrame(rows, "k long, v long")
        got = {
            r["k"]: r["t"]
            for r in global_ntile(
                df, ["v", "k"], k, F.col("v"), out_name="t", n_buckets=5
            ).collect()
        }
        w = Window.orderBy("v", "k")
        exp = {
            r["k"]: r["t"]
            for r in df.select("k", F.ntile(k).over(w).alias("t")).collect()
        }
        assert got == exp, (n, k)
