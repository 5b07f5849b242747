"""Layout-gated scan spread (r13, VERDICT r12 item 3).

``Catalog.spread`` must insert a repartition ONLY for layouts too narrow
to feed the session's cores — and must compile to a plain scan (no
exchange node in the plan at all) for wide layouts, because at 100 TB an
unconditional ``repartition()`` is a full shuffle of the source.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from data_pipeline_4_online_retail_spark.sources.catalog import (
    Catalog,
    _layout_scan_width,
    _parse_bytes,
    load_tables,
)

SF_DIR = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_narrow_layout_spreads(spark):
    """The single-file fixture is 1 useful scan task < cores → exchange."""
    cat = load_tables(spark, SF_DIR)
    assert cat.scan_width("documents") == 1
    plan = _physical_plan(cat.spread("documents", "doc_id"))
    assert "Exchange hashpartitioning(doc_id" in plan, plan


def test_wide_layout_is_a_plain_scan(spark, tmp_path):
    """A many-file source must plan with NO repartition node."""
    docs = load_tables(spark, SF_DIR).table("documents")
    wide = str(tmp_path / "docs_wide.parquet")
    cores = spark.sparkContext.defaultParallelism
    docs.repartition(cores + 1).write.mode("overwrite").parquet(wide)

    cat = Catalog(spark)
    cat.register("docs_wide", spark.read.parquet(wide), path=wide)
    assert cat.scan_width("docs_wide") >= cores
    plan = _physical_plan(cat.spread("docs_wide", "doc_id"))
    assert "Exchange" not in plan, plan
    # and the gated result is plan-identical to the raw table
    assert plan == _physical_plan(cat.table("docs_wide"))


def test_scan_width_counts_bytes_not_just_files(tmp_path, spark):
    """One file of many row-group-sized bytes counts > 1 useful task."""
    big = tmp_path / "big.parquet"
    n = 64 * 1024
    tbl = pa.table({"x": pa.array(range(n)), "pad": pa.array([b"x" * 8192] * n)})
    pq.write_table(tbl, big, compression="none")
    width = _layout_scan_width(str(big), spark)
    import os

    expected = max(1, os.path.getsize(big) // _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    ))
    assert width == expected


def test_unknown_path_never_spreads(spark):
    cat = Catalog(spark)
    df = load_tables(spark, SF_DIR).table("documents").select("doc_id")
    cat.register("derived_view", df)  # no path → assume wide
    assert cat.scan_width("derived_view") > 1 << 20
    plan = _physical_plan(cat.spread("derived_view", "doc_id"))
    assert "Exchange hashpartitioning" not in plan


def test_parse_bytes_shapes():
    assert _parse_bytes("134217728") == 128 * 1024 * 1024
    assert _parse_bytes("128MB") == 128 * 1024 * 1024
    assert _parse_bytes("128m") == 128 * 1024 * 1024
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("64k") == 64 * 1024
    assert _parse_bytes("totally-bogus") == 128 * 1024 * 1024
