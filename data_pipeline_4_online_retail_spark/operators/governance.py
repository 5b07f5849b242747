"""Data-governance operators: GDPR/CCPA erasure cascade with audit.

A production warehouse must honor deletion requests across every table
keyed by the subject — and prove it did. The erasure itself is a
map-side hash anti-join (no shuffle of the big table when the deletion
list broadcasts); the audit aggregate is the compliance artifact.

The deletion list here is derived deterministically (md5 bucket of
user_id — stands in for the external requests table a DSR system would
deliver); both engines derive it identically, so the audit is
hash-exact. PII masking for retained rows lives in
operators/curation.pii_mask — erasure and masking are the two halves of
the privacy surface.

Scale: broadcast the deletion list (requests are << corpus);
BroadcastHashJoin LeftAnti touches each fact row once, no exchange. At
100 TB pair with partitioned rewrite (sources/io.
write_partitioned_incremental) so only partitions containing deleted
subjects rewrite — physical deletion, not just logical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.plans.registry import register
from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

ERASURE_HEX = "1"  # first md5 hex digit in {0,1} → ~12.5% of users


def erasure_list(e: DataFrame) -> DataFrame:
    """The deletion-request stand-in: deterministic md5 bucket."""
    return (
        e.select("user_id")
        .distinct()
        .where(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) <= ERASURE_HEX)
    )


def erase_users(e: DataFrame, requests: DataFrame) -> DataFrame:
    """The cascade: anti-join the fact against the request list."""
    return e.join(F.broadcast(requests), "user_id", "left_anti")


@register(
    "gov_gdpr_erasure_audit",
    f"""
    WITH requests AS (
        SELECT DISTINCT user_id FROM events
        WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '{ERASURE_HEX}')
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS rows_before,
           CAST(SUM(CASE WHEN user_id IN (SELECT user_id FROM requests)
                         THEN 1 ELSE 0 END) AS BIGINT) AS rows_purged,
           CAST(SUM(CASE WHEN user_id IN (SELECT user_id FROM requests)
                         THEN 0 ELSE 1 END) AS BIGINT) AS rows_after
    FROM events
    GROUP BY event_type
    """,
    doc="governance: GDPR erasure cascade + compliance audit — the "
    "deletion list broadcasts into a LeftAnti hash join over the fact; "
    "the audit proves before = purged + after per event_type. The "
    "registered query emits the audit (all BIGINT, hash-exact); the "
    "purged table itself is erase_users(), pytest-pinned to contain "
    "zero requested users and exactly rows_after rows.",
    tags=("governance", "r4b"),
)
def gov_gdpr_erasure_audit(spark, sf_dir):
    e = load_tables(spark, sf_dir).table("events")
    req = erasure_list(e).withColumn("is_req", F.lit(1))
    return (
        e.join(F.broadcast(req), "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("rows_before"),
            F.sum(F.coalesce("is_req", F.lit(0))).cast("long").alias("rows_purged"),
            F.sum(1 - F.coalesce("is_req", F.lit(0)))
            .cast("long")
            .alias("rows_after"),
        )
    )
