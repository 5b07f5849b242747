"""Round-6 additions: itemCF mega-basket cap, RFM approx-percentile
production variant, and rows-only promotions' supporting invariants."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.operators.graph import (
    graph_itemcf_recs,
)


@pytest.fixture(scope="module")
def basket_dirs(spark, tmp_path_factory):
    """Two sf-dir-shaped fixtures: `full` has 40 small baskets plus ONE
    60-item mega-basket; `capped` is full with the mega-basket removed."""
    base = tmp_path_factory.mktemp("itemcf")
    rows = []
    for ok in range(40):  # small baskets: 2-4 items, overlapping item ids
        for pk in range((ok % 3) + 2):
            rows.append((ok, (ok + pk * 7) % 25))
    mega = [(999, 100 + i) for i in range(60)]  # items 100.. only here
    full = spark.createDataFrame(
        rows + mega, "l_orderkey long, l_partkey long"
    )
    small = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    full_dir, capped_dir = str(base / "full"), str(base / "capped")
    full.write.parquet(f"{full_dir}/lineitem.parquet")
    small.write.parquet(f"{capped_dir}/lineitem.parquet")
    return full_dir, capped_dir


def test_itemcf_max_basket_drops_mega_basket(spark, basket_dirs):
    full_dir, capped_dir = basket_dirs
    capped = graph_itemcf_recs(spark, full_dir, max_basket=10)
    expected = graph_itemcf_recs(spark, capped_dir)  # mega pre-removed
    got = {tuple(r) for r in capped.collect()}
    exp = {tuple(r) for r in expected.collect()}
    assert got == exp
    # mega-only items never appear once capped...
    assert not any(r[0] >= 100 for r in got)
    # ...but dominate the uncapped run (the blowup the cap exists for).
    uncapped = {tuple(r) for r in graph_itemcf_recs(spark, full_dir).collect()}
    assert any(r[0] >= 100 for r in uncapped)


def test_itemcf_max_basket_bounds_pair_count(spark, basket_dirs):
    """The contract the cap buys at 100 TB: total self-join pairs is
    bounded by |baskets| * max_basket * (max_basket - 1), independent of
    any single basket's true size."""
    full_dir, _ = basket_dirs
    cap = 10
    bp = (
        spark.read.parquet(f"{full_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    sizes = {
        r["l_orderkey"]: r["n"]
        for r in bp.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    kept = {k: n for k, n in sizes.items() if n <= cap}
    pairs_capped = sum(n * (n - 1) for n in kept.values())
    pairs_full = sum(n * (n - 1) for n in sizes.values())
    assert pairs_full - pairs_capped == 60 * 59  # the mega-basket's 3540
    assert pairs_capped <= len(kept) * cap * (cap - 1)
    # and the capped plan really emits exactly that many pair rows
    got = graph_itemcf_recs(spark, full_dir, max_basket=cap)
    n_pairs = (
        got.agg(F.sum("n_cooc").alias("s")).collect()[0]["s"]
        if got.count() > 0
        else 0
    )
    # top-N filtering can only reduce the OUTPUT rows, not n_cooc sums per
    # surviving pair; re-derive the full pair count pre-window instead.
    from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

    li = load_tables(spark, full_dir).table("lineitem")
    bp2 = li.select("l_orderkey", "l_partkey").distinct()
    szs = bp2.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    bpc = bp2.join(szs, "l_orderkey").filter(F.col("n") <= cap)
    a, b = bpc.alias("a"), bpc.alias("b")
    n_join_rows = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).count()
    assert n_join_rows == pairs_capped
    assert n_pairs <= pairs_capped


def test_holt_winters_pre_anchor_dates(spark, tmp_path):
    """ADVICE r5: a day BEFORE the 2024-01-01 anchor must land in slot
    0..6 on BOTH engines (pmod / double-mod), not error at element_at(0)
    or silently wrap — engine-agreement is checked end-to-end here."""
    import datetime

    import duckdb

    import __spark_entry__ as entry
    from data_pipeline_4_online_retail_spark.plans.registry import REGISTRY

    rows = []
    eid = 0
    for d in range(-9, 6):  # 2023-12-23 .. 2024-01-06 straddles the anchor
        day = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
        for k in range((d % 3) + 1):
            rows.append((eid, "click", day + datetime.timedelta(hours=k)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    sf_dir = str(tmp_path / "pre_anchor")
    df.write.parquet(f"{sf_dir}/events.parquet")

    sdf = entry.queries()["ev_holt_winters"](spark, sf_dir)
    s_rows = sorted(tuple(r) for r in sdf.collect())
    assert s_rows, "spark side returned nothing"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    d_rows = sorted(tuple(r) for r in con.execute(
        REGISTRY["ev_holt_winters"].oracle
    ).fetchall())
    assert s_rows == d_rows  # bit-exact recursion, incl. pre-anchor slots

    # seasonal profile shares the anchor-mod hazard; both engines agree
    sdf2 = entry.queries()["ev_seasonal_decompose"](spark, sf_dir)
    s2 = sorted(tuple(r) for r in sdf2.collect())
    d2 = sorted(tuple(r) for r in con.execute(
        REGISTRY["ev_seasonal_decompose"].oracle
    ).fetchall())
    assert s2 == d2
    assert all(0 <= r[0] <= 6 for r in s2)


def test_itemcf_default_unchanged_on_fixture(spark):
    """max_basket=None is the registered path — bit-identical to before
    (the sf0.001 fixture has no basket over the cap anyway, so capping at
    a generous size is also a no-op there)."""
    base = graph_itemcf_recs(spark, "/root/testdata/sf0.001")
    roomy = graph_itemcf_recs(spark, "/root/testdata/sf0.001", max_basket=10**6)
    assert {tuple(r) for r in base.collect()} == {
        tuple(r) for r in roomy.collect()
    }
