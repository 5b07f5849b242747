"""Custom Python Data Source (Spark 4 pyspark.sql.datasource API):
parallel partitioned reads, determinism, Arrow-batch emission, and the
opt-in filter-pushdown variant with its documented relation-reuse hazard.
"""

from __future__ import annotations

import pytest

from data_pipeline_4_online_retail_spark.sources.synthetic_source import (
    register,
)


@pytest.fixture(scope="module")
def synth(spark):
    register(spark)
    return spark


def _load(spark, fmt="synthdocs", shards=4, rows=50):
    return (
        spark.read.format(fmt)
        .option("shards", str(shards))
        .option("rows_per_shard", str(rows))
        .load()
    )


def test_source_shape_and_determinism(synth):
    df = _load(synth)
    assert df.count() == 200
    assert dict(df.dtypes) == {
        "doc_id": "bigint",
        "shard": "int",
        "text": "string",
        "n_chars": "int",
        "gen_pruned": "int",
    }
    # partition-parallel: one Spark partition per shard
    assert df.rdd.getNumPartitions() == 4
    a = sorted(map(tuple, _load(synth).collect()))
    b = sorted(map(tuple, _load(synth).collect()))
    assert a == b  # re-scan (stage retry / speculative task) sees same rows
    # doc_ids are globally unique across shards
    assert len({t[0] for t in a}) == 200


def test_source_without_pushdown_filters_spark_side(synth):
    """The default source defines no pushFilters: a shard predicate is
    applied by Spark post-scan, results correct, parent unaffected."""
    df = _load(synth)
    assert df.filter("shard = 2").count() == 50
    assert df.count() == 200  # parent intact
    flags = {r["gen_pruned"] for r in df.filter("shard = 2").collect()}
    assert flags == {0}  # the source never saw the filter


def test_pushdown_variant_prunes_generation(synth):
    """synthdocs_pushdown consumes EqualTo(shard, v): only the matching
    partition is ever generated (gen_pruned=1 proves the filter reached
    the source, not a post-scan filter)."""
    synth.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        rows = _load(synth, "synthdocs_pushdown").filter("shard = 2").collect()
        assert len(rows) == 50
        assert {r["shard"] for r in rows} == {2}
        assert {r["gen_pruned"] for r in rows} == {1}

        # unsupported predicates are returned to Spark and still applied
        mixed = (
            _load(synth, "synthdocs_pushdown")
            .filter("shard = 1 and n_chars >= 0 and doc_id % 2 = 0")
            .collect()
        )
        assert {r["shard"] for r in mixed} == {1}
        assert all(r["doc_id"] % 2 == 0 for r in mixed)
    finally:
        synth.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_pushdown_relation_reuse_hazard_is_still_present(synth):
    """KNOWN Spark 4.1 behavior we design around (see module docstring of
    synthetic_source): after a filtered child query plans against a
    shared load() relation, the relation keeps the pruned scan, so the
    parent's next full count returns the filtered subset. If this
    assertion ever FAILS, Spark fixed the leak — drop the
    one-load-per-lineage guidance and this pin together."""
    synth.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = _load(synth, "synthdocs_pushdown")
        assert df.count() == 200
        assert df.filter("shard = 2").count() == 50
        assert df.count() == 50  # the documented corruption
        # fresh relations are unaffected
        assert _load(synth, "synthdocs_pushdown").count() == 200
    finally:
        synth.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_stream_source_drains_bounded_and_replays_identically(spark):
    """The Python streaming source delivers exactly max_rows across
    micro-batches, and readBetweenOffsets regenerates any planned range
    byte-identically — the WAL replay contract."""
    from data_pipeline_4_online_retail_spark.sources.synthetic_source import (
        SynthEventsStreamReader,
        register,
    )

    register(spark)
    q = (
        spark.readStream.format("synthevents")
        .option("batch_rows", "300")
        .option("max_rows", "1100")
        .load()
        .writeStream.format("memory")
        .queryName("t_synthstream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("t_synthstream").collect()
    assert len(out) == 1100
    assert {r["event_id"] for r in out} == set(range(1100))
    # batches of 300/300/300/200: at least 4 distinct micro-batches ran
    # (drain semantics), and values are deterministic:
    reader = SynthEventsStreamReader({"batch_rows": "300", "max_rows": "1100"})
    replay = list(reader.readBetweenOffsets({"offset": 0}, {"offset": 1100}))
    got = sorted(
        (r["event_id"], r["user_id"], r["event_type"], r["value"]) for r in out
    )
    assert got == sorted(replay)
    # an arbitrary mid-range replay is a pure function of the offsets
    a = list(reader.readBetweenOffsets({"offset": 250}, {"offset": 400}))
    b = list(reader.readBetweenOffsets({"offset": 250}, {"offset": 400}))
    assert a == b and len(a) == 150
