"""Sources/sinks coverage (SURVEY.md §2.1): CSV latin-1 round-trip (S2/S3),
table sink full-rebuild (S5/S11), database creation (S6), country seed
build with composed ALTER semantics (S7-S10), and the SQL-API surface
(temp-view registry, S12)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.sources.country_seed import (
    COUNTRY_ROWS,
    build_country_seed,
)
from data_pipeline_4_online_retail_spark.sources.fixtures import raw_invoices_fixture
from data_pipeline_4_online_retail_spark.sources.io import read_csv, write_csv
from data_pipeline_4_online_retail_spark.sources.schemas import RAW_INVOICES


def test_csv_roundtrip_latin1(spark, tmp_path):
    """S2/S3: header CSV write + schema-first latin-1 read preserves rows
    (the reference's iso-8859-1 loader, dags/online_retail.py:36)."""
    src = raw_invoices_fixture(spark)
    path = str(tmp_path / "raw.csv")
    write_csv(src, path, single_file=True)
    back = read_csv(spark, path, RAW_INVOICES)
    # file sources surface every column nullable; contract-check name+type
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in RAW_INVOICES.fields
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_table_sink_full_rebuild(spark, tmp_path):
    """S5/S11: overwrite saveAsTable == WRITE_TRUNCATE semantics; S6:
    database creation."""
    spark.sql("CREATE DATABASE IF NOT EXISTS retail_test")
    df1 = spark.range(5).withColumnRenamed("id", "v")
    df1.write.mode("overwrite").format("parquet").saveAsTable("retail_test.t")
    df2 = spark.range(3).withColumnRenamed("id", "v")
    df2.write.mode("overwrite").format("parquet").saveAsTable("retail_test.t")
    assert spark.table("retail_test.t").count() == 3  # truncated, not appended
    spark.sql("DROP TABLE retail_test.t")
    spark.sql("DROP DATABASE retail_test")


def test_country_seed_alter_semantics(spark):
    """S7-S10: the 239-row INSERT...VALUES LocalRelation composed with
    DROP COLUMN id/name + RENAME nicename→name
    (include/table/country.sql:252-259)."""
    seed = build_country_seed(spark)
    assert seed.columns == ["iso", "name", "iso3", "numcode", "phonecode"]
    rows = {r["iso"]: r for r in seed.collect()}
    # full literal parity with the reference's 239-row public ISO list
    assert len(rows) == len(COUNTRY_ROWS) == 239
    # rename kept the display-case name (nicename), not the uppercase one
    assert rows["GB"]["name"] == "United Kingdom"
    # NULL iso3/numcode branch (Antarctica row)
    assert rows["AQ"]["iso3"] is None and rows["AQ"]["numcode"] is None


def test_sql_api_over_catalog_views(spark, catalog):
    """S12/S13: every catalog table is a temp view; spark.sql and the
    DataFrame API give identical results over the same registry."""
    via_sql = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
        """
    ).collect()
    via_df = (
        catalog.table("customer")
        .join(
            catalog.table("nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("n_name")
        .collect()
    )
    assert [tuple(r) for r in via_sql] == [tuple(r) for r in via_df]


def test_csv_malformed_rows_null_coerce(spark, tmp_path):
    """Permissive CSV read: type-mismatched cells coerce to NULL instead of
    failing the load (the same coerce posture as the reference's pandas
    ingest); DROPMALFORMED discards the row entirely."""
    p = tmp_path / "bad.csv"
    p.write_text(
        "InvoiceNo,StockCode,Description,Quantity,InvoiceDate,UnitPrice,CustomerID,Country\n"
        '"536365","85123A","OK",6,"12/01/2010 08:26 AM",2.55,17850.0,"United Kingdom"\n'
        '"536366","85123B","BAD QTY",not_a_number,"12/01/2010 08:26 AM",2.55,17850.0,"United Kingdom"\n'
    )
    from data_pipeline_4_online_retail_spark.sources.io import read_csv
    from data_pipeline_4_online_retail_spark.sources.schemas import RAW_INVOICES

    permissive = read_csv(spark, str(p), RAW_INVOICES).collect()
    assert len(permissive) == 2
    bad = [r for r in permissive if r["InvoiceNo"] == "536366"][0]
    assert bad["Quantity"] is None  # coerced, row kept

    dropped = (
        spark.read.option("header", True)
        .option("mode", "DROPMALFORMED")
        .schema(RAW_INVOICES)
        .csv(str(p))
        .collect()
    )
    assert [r["InvoiceNo"] for r in dropped] == ["536365"]


def test_sql_registered_pandas_udf(spark, catalog):
    """The SQL-UDF surface: a vectorized pandas_udf registered into the
    SQL function registry and invoked from spark.sql."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def vec_norm(col):
        import numpy as np

        mat = np.array(col.tolist(), dtype=np.float64)
        return pd.Series(np.sqrt((mat * mat).sum(axis=1)))

    spark.udf.register("vec_norm", vec_norm)
    catalog.table("embeddings")  # ensures the temp view exists
    rows = spark.sql(
        "SELECT vec_id, vec_norm(embedding) AS n FROM embeddings ORDER BY vec_id LIMIT 5"
    ).collect()
    assert len(rows) == 5 and all(r["n"] > 0 for r in rows)
    # cross-check one value against the built-in expression path
    from data_pipeline_4_online_retail_spark.functions.vector import l2_norm

    expected = (
        catalog.table("embeddings")
        .orderBy("vec_id")
        .limit(1)
        .select(l2_norm("embedding").alias("n"))
        .head()["n"]
    )
    assert abs(rows[0]["n"] - expected) < 1e-9


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution on an append-style parquet dataset: files written
    before a column existed read back as NULL for that column under
    mergeSchema, and the union schema is stable regardless of file
    order — the contract an incrementally-evolving 100 TB table relies
    on (new columns land without rewriting old partitions)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.range(3).select(
        F.col("id").alias("k"), F.lit("v1").alias("a")
    ).write.mode("overwrite").parquet(path)
    spark.range(3, 6).select(
        F.col("id").alias("k"), F.lit("v2").alias("a"), F.lit(7).alias("b")
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert sorted(merged.columns) == ["a", "b", "k"]
    rows = {r.k: r for r in merged.collect()}
    assert len(rows) == 6
    for k, r in rows.items():
        if k < 3:
            assert r.a == "v1" and r.b is None  # pre-evolution files
        else:
            assert r.a == "v2" and r.b == 7


def test_json_and_orc_source_roundtrip(spark, catalog, tmp_path):
    """Source-format breadth: the same relation round-trips through
    JSON-lines (schema-on-read with an explicit schema — no inference
    job) and ORC, value-identical to the parquet original."""
    ev = catalog.table("events").select("event_id", "user_id", "event_type", "value")

    jpath = str(tmp_path / "events_json")
    ev.write.mode("overwrite").json(jpath)
    jback = spark.read.schema(ev.schema).json(jpath)
    assert sorted(map(tuple, jback.collect())) == sorted(map(tuple, ev.collect()))

    opath = str(tmp_path / "events_orc")
    ev.write.mode("overwrite").orc(opath)
    oback = spark.read.orc(opath)
    assert oback.schema == ev.schema
    assert sorted(map(tuple, oback.collect())) == sorted(map(tuple, ev.collect()))


def test_compact_parquet_reduces_file_count(spark, catalog, tmp_path):
    """Compaction: a 64-file dataset rewrites into the byte-budgeted file
    count (1 here), values intact, optional within-file sort applied."""
    from data_pipeline_4_online_retail_spark.sources.io import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    orders = catalog.table("orders").select("o_orderkey", "o_totalprice")
    orders.repartition(64).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*.parquet")) == 64
    n = compact_parquet(spark, src, dst, target_file_mb=512,
                        sort_within_by=["o_orderkey"])
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == n == 1
    a = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    b = sorted(tuple(r) for r in orders.collect())
    assert a == b
    # within-file sort: the single file is globally ordered
    got = [r.o_orderkey for r in spark.read.parquet(dst).collect()]
    # parquet preserves write order per file
    import pyarrow.parquet as pq

    keys = pq.read_table(files[0], columns=["o_orderkey"])["o_orderkey"].to_pylist()
    assert keys == sorted(keys)


def test_dynamic_partition_overwrite_preserves_other_partitions(
    spark, catalog, tmp_path
):
    """The idempotent daily-batch sink: re-writing one partition's batch
    replaces only that partition under dynamic mode; static mode (the
    Spark default) truncates everything else — both behaviors pinned."""
    from data_pipeline_4_online_retail_spark.sources.io import (
        write_partitioned_incremental,
    )
    from pyspark.sql import functions as F

    orders = catalog.table("orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "by_status")
    write_partitioned_incremental(
        orders, path, partition_by=["o_orderstatus"]
    )
    statuses = [r.o_orderstatus for r in spark.read.parquet(path)
                .select("o_orderstatus").distinct().collect()]
    assert len(statuses) >= 2
    target = statuses[0]
    # "corrected re-run" of one partition: half its rows, price doubled
    batch = orders.filter(
        (F.col("o_orderstatus") == target) & (F.col("o_orderkey") % 2 == 0)
    ).withColumn("o_totalprice", F.col("o_totalprice") * 2)
    write_partitioned_incremental(batch, path, partition_by=["o_orderstatus"])
    after = spark.read.parquet(path)
    # untouched partitions intact
    for s in statuses[1:]:
        assert (
            after.filter(F.col("o_orderstatus") == s).count()
            == orders.filter(F.col("o_orderstatus") == s).count()
        )
    # target partition fully replaced by the batch
    assert after.filter(F.col("o_orderstatus") == target).count() == batch.count()
    # static mode truncates the rest — the default's footgun, pinned
    write_partitioned_incremental(
        batch, path, partition_by=["o_orderstatus"], dynamic=False
    )
    assert sorted(
        r.o_orderstatus
        for r in spark.read.parquet(path).select("o_orderstatus").distinct().collect()
    ) == [target]


def test_permissive_csv_quarantines_malformed_rows(spark, tmp_path):
    """A mangled line must not kill the scan: good rows parse, bad rows
    land whole in _corrupt_record for quarantine counting."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_pipeline_4_online_retail_spark.sources.io import (
        read_csv_permissive,
    )

    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,qty,price\n"
        "1,5,9.99\n"
        "2,not_a_number,1.50\n"  # qty unparseable
        "3,7,2.25\n"
        "4,8,oops\n"  # price unparseable
    )
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("qty", T.IntegerType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    df = read_csv_permissive(spark, str(p), schema).cache()
    rows = {r.id: r for r in df.collect()}
    assert rows[1].qty == 5 and rows[1]._corrupt_record is None
    assert rows[3].qty == 7 and rows[3]._corrupt_record is None
    assert rows[2].qty is None and "not_a_number" in rows[2]._corrupt_record
    assert rows[4].price is None and "oops" in rows[4]._corrupt_record
    quarantined = df.filter(F.col("_corrupt_record").isNotNull()).count()
    assert quarantined == 2
    df.unpersist()


def test_jsonl_roundtrip_and_corrupt_quarantine(spark, catalog, tmp_path_factory):
    """JSONL write -> read round-trips values and dtypes under an
    explicit schema; a malformed line lands in _corrupt_record instead of
    failing the read (the 100 TB don't-crash contract)."""
    from data_pipeline_4_online_retail_spark.sources.io import (
        read_jsonl,
        write_jsonl,
    )

    base = tmp_path_factory.mktemp("jsonl")
    docs = catalog.table("documents").select("doc_id", "text", "lang", "source")
    p = str(base / "docs")
    write_jsonl(docs, p)
    back = read_jsonl(spark, p, "doc_id long, text string, lang string, source string")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
    assert dict(back.dtypes) == dict(docs.dtypes)

    # corrupt line quarantine
    bad = base / "bad"
    bad.mkdir()
    (bad / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok"}\n{definitely not json\n{"doc_id": 2, "text": "ok2"}\n'
    )
    got = read_jsonl(
        spark,
        str(bad),
        "doc_id long, text string, _corrupt_record string",
    )
    rows = got.collect()
    assert len(rows) == 3
    assert sum(r["_corrupt_record"] is not None for r in rows) == 1
    assert {r["doc_id"] for r in rows if r["_corrupt_record"] is None} == {1, 2}


def test_orc_roundtrip_with_pushdown(spark, catalog, tmp_path_factory):
    """ORC write -> read round-trips, and a filter over the ORC scan
    shows up as a pushed predicate in the plan (same contract we pin for
    parquet)."""
    from data_pipeline_4_online_retail_spark.sources.io import read_orc, write_orc

    base = tmp_path_factory.mktemp("orc")
    orders = catalog.table("orders")
    p = str(base / "orders")
    write_orc(orders, p)
    back = read_orc(spark, p)
    assert back.count() == orders.count()
    assert dict(back.dtypes) == dict(orders.dtypes)

    plan = (
        back.filter("o_totalprice > 100000")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:120]


def test_parquet_schema_evolution_merge(spark, tmp_path_factory):
    """Schema evolution: a v2 writer adds a column; mergeSchema reads
    the union schema with NULLs for v1 rows, while the default read
    keeps serving the footer-sampled schema — the contract batch
    pipelines rely on when producers upgrade before consumers."""
    d = str(tmp_path_factory.mktemp("evolve") / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"
    ).write.mode("append").parquet(d)
    spark.createDataFrame(
        [(3, "c", 30.0)], "id long, s string, score double"
    ).write.mode("append").parquet(d)

    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"id", "s", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[3] == 30.0 and rows[1] is None and rows[2] is None
    # filters on the evolved column still push down and behave null-safely
    assert merged.filter("score > 10").count() == 1


def test_audience_overlap_and_csv_xpath(spark, catalog):
    from data_pipeline_4_online_retail_spark.operators.events_windows import (
        ev_audience_overlap,
    )
    from data_pipeline_4_online_retail_spark.operators.semistructured import (
        ev_props_csv_and_xpath,
    )

    sf = "/root/testdata/sf0.001"
    rows = ev_audience_overlap(spark, sf).collect()
    assert len(rows) == 10  # C(5,2) ordered event-type pairs
    for r in rows:
        lo = max(0, r["n_a"] + r["n_b"] - 10**9)
        assert 0 <= r["n_common"] <= min(r["n_a"], r["n_b"])
        union = r["n_a"] + r["n_b"] - r["n_common"]
        assert r["jaccard"] == r["n_common"] / union

    px = ev_props_csv_and_xpath(spark, sf).collect()
    assert px and all(r["k_csv"] == r["k_xpath"] for r in px)
