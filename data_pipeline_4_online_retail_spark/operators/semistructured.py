"""Semi-structured (JSON) column handling over ``events.props``.

The reference keeps every attribute relational (8-column CSV →
BigQuery tables; /root/reference/include/table/online_retail.sql), but a
production event pipeline carries a JSON properties bag, and a
training-data pipeline reads JSONL metadata sidecars. These operators
cover the Spark-native path: ``from_json`` with an explicit schema (JVM
Jackson parse inside whole-stage codegen — no Python), dotted-path
extraction, and aggregation over extracted values.

Scale notes (100 TB): ``from_json`` is a per-row map-side expression —
no shuffle, no UDF; the parse cost is the same order as reading the
string column. The aggregate then shuffles only (event_type, k-bucket)
pairs. For hot paths at scale, parse ONCE into a struct column and write
back as parquet (schema evolution beats re-parsing per query); the
``props_parsed`` builder here is that materialization shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.plans.registry import register
from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

PROPS_SCHEMA = "k INT"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir).table("events")


def props_parsed(e: DataFrame) -> DataFrame:
    """events with the JSON props bag promoted to a typed column.

    ``from_json`` with an explicit DDL schema: malformed rows yield NULL
    (PERMISSIVE), never an exception — the right contract for a 100 TB
    ingest where a crashed job costs more than a quarantined row.
    """
    return e.withColumn("p", F.from_json("props", PROPS_SCHEMA)).withColumn(
        "prop_k", F.col("p.k")
    )


@register(
    "ev_props_json_stats",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n_parsed,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    """,
    doc="semi-structured: JSON property-bag extraction + aggregation — "
    "from_json('k INT') parses JVM-side inside codegen (no UDF, no "
    "shuffle for the parse); only (event_type) groups shuffle. "
    "All-integer outputs: hash-exact across engines.",
    tags=("json", "r4b"),
)
def ev_props_json_stats(spark, sf_dir):
    p = props_parsed(_events(spark, sf_dir))
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("prop_k").alias("n_parsed"),
        F.sum("prop_k").alias("sum_k"),
        F.min("prop_k").alias("min_k"),
        F.max("prop_k").alias("max_k"),
        F.sum((F.col("prop_k") >= 50).cast("int")).alias("n_high"),
    )


@register(
    "ev_props_json_filter",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 90
      AND event_type IN ('purchase', 'signup')
    """,
    doc="semi-structured: predicate on an extracted JSON path — the "
    "event_type IN filter is a plain column predicate that DOES push to "
    "the parquet scan; the JSON predicate evaluates map-side post-scan. "
    "At 100 TB: materialize hot JSON paths as typed columns so their "
    "predicates gain footer-stats pruning too.",
    tags=("json", "r4b"),
)
def ev_props_json_filter(spark, sf_dir):
    p = props_parsed(_events(spark, sf_dir))
    return (
        p.filter(
            (F.col("prop_k") >= 90)
            & F.col("event_type").isin("purchase", "signup")
        )
        .select("event_id", "event_type", "prop_k")
    )


@register(
    "ev_props_json_roundtrip",
    """
    SELECT event_id,
           '{"k": ' || CAST(CAST(json_extract_string(props, '$.k') AS INT) AS VARCHAR)
               || '}' AS props_rebuilt,
           CAST(('{"k": ' || CAST(CAST(json_extract_string(props, '$.k') AS INT) AS VARCHAR)
               || '}') = props AS INT) AS roundtrip_ok
    FROM events
    WHERE event_id < 500
    """,
    doc="semi-structured: parse -> re-serialize round-trip (to_json of "
    "the extracted struct, canonical separators) with a per-row "
    "equality audit column — the write-back shape for materializing "
    "parsed JSON, plus proof the parse lost nothing.",
    tags=("json", "r4b"),
)
def ev_props_json_roundtrip(spark, sf_dir):
    p = props_parsed(_events(spark, sf_dir)).filter(F.col("event_id") < 500)
    # Spark's to_json emits {"k":69}; the fixture (and the oracle) use
    # a space after the colon, so rebuild with explicit separators to
    # compare byte-identically.
    rebuilt = F.concat(F.lit('{"k": '), F.col("prop_k").cast("string"), F.lit("}"))
    return p.select(
        "event_id",
        rebuilt.alias("props_rebuilt"),
        (rebuilt == F.col("props")).cast("int").alias("roundtrip_ok"),
    )
