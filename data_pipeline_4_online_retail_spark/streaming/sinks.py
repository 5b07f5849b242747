"""Streaming sinks beyond the plain parquet append: idempotent
micro-batch upsert via ``foreachBatch``.

``writeStream.format("parquet")`` gives exactly-once *appends* through
the checkpoint + file-manifest protocol (tested in
tests/test_streaming.py::test_parquet_sink_checkpoint_resume). When the
target is a keyed table that must be UPSERTED, the standard pattern is
``foreachBatch``: each micro-batch runs an ordinary batch MERGE (here the
full-outer-join formulation from operators/warehouse.py) against the
current snapshot and atomically replaces it. Re-delivered batches (crash
between write and checkpoint commit) re-run the same MERGE — upsert is
idempotent on the key, so the result converges instead of duplicating,
which is the exactly-once contract in its effective form.

Scale notes: the snapshot rewrite is the simple store (works on any file
system); on a transactional table format the same ``foreachBatch`` body
becomes the format's native MERGE, and partitioned snapshots bound the
rewrite to touched partitions.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_batch(snapshot: DataFrame | None, batch: DataFrame, key: str) -> DataFrame:
    """One MERGE step: source(batch)-wins full-outer upsert on ``key``.

    Batches may contain several versions of a key; the latest by
    ``_seq`` (a monotonically increasing per-row column supplied by the
    caller, e.g. event ts) wins inside the batch first.
    """
    latest = (
        batch.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key).orderBy(F.desc("_seq"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_seq")
    )
    if snapshot is None:
        return latest
    t = snapshot.alias("t")
    s = latest.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    # Matched keys take the SOURCE row wholesale — per-column coalesce
    # would let a legitimate NULL in the latest source row be overridden
    # by a stale non-NULL target value (not latest-wins, and re-delivery
    # of such a batch would not be idempotent). Only the key column is
    # coalesced, to cover the target-only branch of the full outer join.
    use_source = F.col(f"s.{key}").isNotNull()
    cols = [
        F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias(key)
        if c == key
        else F.when(use_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in snapshot.columns
    ]
    return joined.select(*cols)


def start_upsert_sink(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    *,
    key: str,
    query_name: str = "upsert_sink",
):
    """writeStream.foreachBatch upsert into a parquet snapshot at
    ``target_dir``.

    Swap protocol is rename-aside so a VALID snapshot exists at every
    instant: target → target.old, staging → target, delete target.old.
    (The previous rmtree-then-rename had a crash window between delete
    and rename that lost the snapshot permanently — and because the
    checkpoint already marked earlier batches committed, they would
    never be replayed.) A crash between the two renames leaves only
    ``.old``; the next batch (or restart) recovers it before reading.
    On a transactional table format the same ``foreachBatch`` body
    becomes the format's native atomic MERGE.
    """
    old_dir = target_dir + ".old"

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # crash recovery: target missing but .old present → previous run
        # died between the two renames; restore the valid snapshot.
        if not os.path.exists(target_dir) and os.path.exists(old_dir):
            os.rename(old_dir, target_dir)
        snapshot = None
        if os.path.exists(target_dir):
            snapshot = spark.read.parquet(target_dir)
        merged = upsert_batch(snapshot, batch, key)
        staging = target_dir + f".staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir)
        if os.path.exists(target_dir):
            os.rename(target_dir, old_dir)
        os.rename(staging, target_dir)
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
