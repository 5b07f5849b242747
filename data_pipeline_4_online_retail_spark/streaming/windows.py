"""Windowed streaming aggregations over an events stream.

Plans mirror operators/events_windows.py exactly — the same groupBy
expressions compiled against a streaming source, plus ``withWatermark``
so state for closed windows is evicted (bounded memory at 100 TB/day
event rates; late rows beyond the watermark are dropped, the documented
late-data policy).

Sinks: production writes ``writeStream.format("parquet")`` with
checkpointing; tests use the memory sink via ``run_available_now``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DEFAULT_WATERMARK = "30 minutes"


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events directory (parquet).

    ``maxFilesPerTrigger`` bounds micro-batch size; the schema is declared
    (streaming file sources require it).
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame, *, window: str = "10 minutes", watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type, watermarked."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def hopping_counts(
    events: DataFrame,
    *,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Hopping (sliding) window counts, watermarked."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_counts(
    events: DataFrame, *, gap: str = "5 minutes", watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Session windows (5-minute inactivity gap) per user, watermarked —
    state for a session closes once the watermark passes its gap end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_events_stream(
    events: DataFrame, *, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Streaming ingestion dedup (batch twin: dedup_exact / DISTINCT):
    at-least-once sources replay rows, so the first pipeline stage drops
    any event whose event_id was already seen within the watermark.

    ``dropDuplicatesWithinWatermark`` keys the state store on event_id
    and evicts entries once the watermark passes — bounded memory at any
    stream rate, which plain ``dropDuplicates`` (state forever) cannot
    give. Duplicates arriving later than the watermark are the documented
    accepted-loss window, the same late-data contract as the windowed
    aggregations."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain all available input through the streaming plan into a memory
    sink and return the result as a batch DataFrame (test harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def follow_up_join(
    lead: DataFrame,
    follow: DataFrame,
    *,
    gap_seconds: int = 60,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Stream-stream inner join: follow-up events within ``gap_seconds``
    of a lead event for the same user (batch twin: ev_interval_join).

    Both sides are watermarked and the join condition time-bounds the
    buffered state, so Spark can evict rows once the watermark passes
    lead.ts + gap — without the bound, stream-stream join state grows
    forever.
    """
    a = lead.withWatermark("ts", watermark).alias("a")
    b = follow.withWatermark("ts", watermark).alias("b")
    return a.join(
        b,
        F.expr(
            f"""
            a.user_id = b.user_id AND
            b.ts > a.ts AND
            b.ts <= a.ts + interval {gap_seconds} seconds
            """
        ),
    ).select(
        F.col("a.event_id").alias("lead_event"),
        F.col("b.event_id").alias("follow_event"),
        F.col("a.event_type").alias("lead_type"),
        F.col("b.event_type").alias("follow_type"),
    )


def follow_up_join_outer(
    lead: DataFrame,
    follow: DataFrame,
    *,
    gap_seconds: int = 60,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """LEFT OUTER stream-stream join: like ``follow_up_join`` but leads
    with NO follow-up inside the gap are still emitted (null follow
    columns) — the conversion-timeout signal (did a click follow the
    impression, or not?).

    Outer emission is watermark-driven: a lead row's null-extended form
    can only be produced once the watermark passes ``lead.ts + gap``,
    because until then a matching follow event may still arrive. So the
    stream's outer rows trail the inner rows by the watermark delay —
    state is buffered (bounded by the same time-bound condition) and
    flushed as eviction happens, never held forever.
    """
    a = lead.withWatermark("ts", watermark).alias("a")
    b = follow.withWatermark("ts", watermark).alias("b")
    return a.join(
        b,
        F.expr(
            f"""
            a.user_id = b.user_id AND
            b.ts > a.ts AND
            b.ts <= a.ts + interval {gap_seconds} seconds
            """
        ),
        "leftOuter",
    ).select(
        F.col("a.event_id").alias("lead_event"),
        F.col("b.event_id").alias("follow_event"),
        F.col("a.ts").alias("lead_ts"),
    )


def enrich_events_stream(
    events_stream: DataFrame,
    dim: DataFrame,
    *,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """Stream-static enrichment join (feature lookup): each micro-batch
    joins the incoming events against a static/batch dimension table.

    Stateless — unlike stream-stream joins no watermark or join state is
    needed, so output mode is plain append. The static side is re-resolved
    every micro-batch (slowly-changing dims pick up new snapshots) and
    broadcast when it fits, which is the 100 TB-safe shape: the stream
    shard never shuffles, each executor probes a local hash map.
    """
    enriched = events_stream.join(
        F.broadcast(dim), events_stream[stream_key] == dim[dim_key], "left"
    )
    return enriched.select(
        "event_id",
        "ts",
        events_stream[stream_key].alias(stream_key),
        "event_type",
        "value",
        dim["c_mktsegment"].alias("segment"),
    )
