"""Streaming incremental aggregate maintenance: a foreachBatch sink that
folds each micro-batch's PARTIAL aggregate into a stored rollup via
``operators/warehouse.incremental_agg_merge`` — the deployment shape of
the reference's nightly report models without the WRITE_TRUNCATE
re-scan of history (report_customer_invoices.sql et al. re-aggregate
the full table daily; this folds O(batch) into O(stored keys)).

Replay safety: additive merges are NOT naturally idempotent — a
re-delivered micro-batch would double-add its sums (the upsert sink in
streaming/sinks.py tolerates replay because key-overwrite is
idempotent; a fold is not). The snapshot therefore CARRIES the id of
the last applied batch in a metadata column; ``apply_rollup_batch``
skips any batch whose id is already applied. The id travels inside the
same parquet snapshot the rename-aside swap moves atomically, so the
"which batches are folded in" bookkeeping can never diverge from the
data it describes — the same recipe transactional formats implement as
txn ids in the table log.

Values accumulate as integer CENTS (DECIMAL-exact against the batch
twin); the swap protocol is the crash-window-free rename-aside from
streaming/sinks.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.operators.warehouse import (
    incremental_agg_merge,
)

_META_COL = "_last_batch_id"


def batch_partial(batch: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Partial aggregate of one micro-batch: counts + exact cent sums."""
    return batch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col(value_col) * 100).cast("long")).alias("value_cents"),
    )


def apply_rollup_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    target_dir: str,
    *,
    keys: list[str],
    value_col: str = "value",
) -> bool:
    """Fold one micro-batch into the stored rollup; returns False when
    the batch id is already applied (replayed delivery, skipped)."""
    old_dir = target_dir + ".old"
    if not os.path.exists(target_dir) and os.path.exists(old_dir):
        os.rename(old_dir, target_dir)  # crash between renames: recover

    snapshot = None
    if os.path.exists(target_dir):
        full = spark.read.parquet(target_dir)
        applied = full.agg(F.max(_META_COL)).collect()[0][0]
        if applied is not None and batch_id <= applied:
            return False  # replay — the fold already contains this batch
        snapshot = full.drop(_META_COL)

    delta = batch_partial(batch, keys, value_col)
    if snapshot is None:
        merged = delta
    else:
        merged = incremental_agg_merge(
            snapshot, delta, keys, sum_cols=["value_cents"], count_col="n_events"
        )
    out = merged.withColumn(_META_COL, F.lit(batch_id).cast("long"))

    staging = target_dir + f".staging-{batch_id}"
    out.write.mode("overwrite").parquet(staging)
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)
    if os.path.exists(target_dir):
        os.rename(target_dir, old_dir)
    os.rename(staging, target_dir)
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)
    return True


def start_rollup_sink(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    *,
    keys: list[str],
    value_col: str = "value",
    query_name: str = "rollup_sink",
):
    """writeStream.foreachBatch incremental rollup maintenance."""

    def process(batch: DataFrame, batch_id: int) -> None:
        apply_rollup_batch(
            batch.sparkSession,
            batch,
            batch_id,
            target_dir,
            keys=keys,
            value_col=value_col,
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
