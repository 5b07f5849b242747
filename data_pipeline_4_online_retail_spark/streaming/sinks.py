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
    cols = [
        F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
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
    ``target_dir``. Atomic swap via write-new-then-rename is simulated
    with overwrite of a staging dir + replace (sufficient on local/object
    stores with atomic rename; transactional formats do this natively).
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        snapshot = None
        if os.path.exists(target_dir):
            snapshot = spark.read.parquet(target_dir)
        merged = upsert_batch(snapshot, batch, key)
        staging = target_dir + f".staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(target_dir):
            shutil.rmtree(target_dir)
        os.rename(staging, target_dir)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
