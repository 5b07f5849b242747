"""Streaming Type-2 SCD maintenance via ``foreachBatch``.

The batch builder (operators/warehouse.py::wh_scd2_build) derives the
full version history from the complete change log with gaps-and-islands.
A production dimension is maintained *incrementally*: each micro-batch
of change events must extend the stored version table — close the open
version when the tracked attribute changes, append new versions, grow
the open version's event count when the run continues — WITHOUT ever
re-reading the full history.

The invariant (pinned by tests/test_streaming.py): feeding the event log
through this sink in ts-ordered micro-batches converges to byte-identical
output with the one-shot batch rebuild.

Mechanism per batch (all DataFrame ops, one user_id shuffle):

1. Each updated user's OPEN version is replayed as a synthetic marker row
   (event_id = -1 sorts before any real event; weight = its accumulated
   n_events) prepended to the user's batch rows.
2. The same gaps-and-islands pass as the batch builder numbers runs over
   marker + batch; run 1 therefore *is* the open version — continued
   (same attribute: counts merge, valid_from keeps) or closed (new run 2
   opens at its first ts).
3. Version ids continue from the stored open version id, so numbering is
   stable across any batch slicing.
4. Users absent from the batch pass through untouched; closed versions
   pass through untouched. Output snapshot replaces the store atomically
   (same tmp-swap protocol as sinks.start_upsert_sink).

Ordering contract: per-user event order must not regress across batches
(the at-least-once replay of an ALREADY-APPLIED batch is NOT idempotent
here — pair with dropDuplicatesWithinWatermark upstream, as the test
does; this is the standard change-log ordering assumption, same as the
funnel tracker's documented in-order frontier).

Scale notes (100 TB dimension): the per-batch cost is
O(batch + touched-users' open rows) — the anti-join/union touches only
updated users; closed history is never rewritten logically (on a
transactional table format the same body becomes MERGE + INSERT; the
full-snapshot swap here is the plain-filesystem stand-in, as for the
upsert sink).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCD2_SCHEMA = (
    "user_id long, version_id long, event_type string, "
    "valid_from timestamp, valid_to timestamp, is_current int, n_events long"
)


def scd2_apply_batch(snapshot: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Pure batch body: current SCD2 snapshot + new change rows -> next
    snapshot. ``snapshot`` is None on the first batch."""
    spark = batch.sparkSession
    if snapshot is None:
        snapshot = spark.createDataFrame([], SCD2_SCHEMA)

    events = batch.select("user_id", "event_type", "ts", "event_id").withColumn(
        "weight", F.lit(1).cast("long")
    )
    touched = events.select("user_id").distinct()

    open_rows = snapshot.filter(F.col("is_current") == 1).join(
        touched, "user_id"
    )
    # The open version re-enters the run computation as a marker row that
    # sorts before every real event of the batch (in-order contract:
    # batch ts >= stored valid_from).
    markers = open_rows.select(
        "user_id",
        "event_type",
        F.col("valid_from").alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
        F.col("n_events").alias("weight"),
    )
    base = open_rows.select("user_id", F.col("version_id").alias("base_vid"))

    combined = events.unionByName(markers)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = F.lag("event_type").over(w)
    is_change = F.when(lagged.isNull() | (lagged != F.col("event_type")), 1).otherwise(0)
    runs = combined.withColumn(
        "run_idx",
        F.sum(is_change).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    versions = runs.groupBy("user_id", "run_idx").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.sum("weight").alias("n_events"),
    )
    rebuilt = versions.join(base, "user_id", "left").withColumn(
        "version_id", F.coalesce(F.col("base_vid"), F.lit(1)) + F.col("run_idx") - 1
    )
    wv = Window.partitionBy("user_id").orderBy("version_id")
    valid_to = F.lead("valid_from").over(wv)
    rebuilt = rebuilt.select(
        "user_id",
        "version_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().cast("int").alias("is_current"),
        "n_events",
    )
    untouched = snapshot.join(touched, "user_id", "left_anti")
    closed_of_touched = snapshot.filter(F.col("is_current") == 0).join(
        touched, "user_id"
    )
    return untouched.unionByName(closed_of_touched).unionByName(rebuilt)


def start_scd2_sink(
    events_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    query_name: str = "scd2_sink",
):
    """foreachBatch driver: maintain the SCD2 table under ``store_dir``
    with the atomic tmp-write + swap protocol (crash between write and
    checkpoint commit re-runs the batch against the PREVIOUS snapshot —
    see the ordering contract in the module docstring)."""
    spark = events_stream.sparkSession
    current = os.path.join(store_dir, "current")

    def process(batch: DataFrame, batch_id: int) -> None:
        snap = (
            spark.read.parquet(current) if os.path.exists(current) else None
        )
        nxt = scd2_apply_batch(snap, batch)
        tmp = os.path.join(store_dir, f"b{batch_id}")
        nxt.write.mode("overwrite").parquet(tmp)
        old = spark.read.parquet(tmp)  # materialized before the swap
        old.count()
        if os.path.exists(current):
            shutil.rmtree(current)
        os.rename(tmp, current)

    return (
        events_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def read_scd2_snapshot(spark: SparkSession, store_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(store_dir, "current"))
