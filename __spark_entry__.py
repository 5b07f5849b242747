"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (revenue-by-country top-10, the
report_customer_invoices.sql analogue) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the training-data-pipeline extensions; the driver hash-compares each against
DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_4_online_retail_spark.plans import registry as _registry

# Importing these modules populates the registry.
from data_pipeline_4_online_retail_spark.plans import star as _star  # noqa: E402
from data_pipeline_4_online_retail_spark.plans.registry import REGISTRY, Query  # noqa: E402

for _name, (_fn, _sql) in _star.STAR_QUERIES.items():
    REGISTRY.setdefault(_name, Query(name=_name, build=_fn, oracle=_sql))

# Operator micro-queries + extensions (each module self-registers).
import data_pipeline_4_online_retail_spark.operators.relational  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.dedup  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.similarity  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.text_analysis  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.events_windows  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.multimodal  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.scalar_functions  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.skew  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.curation  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.warehouse  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.tpch  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.semistructured  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.retail_analytics  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.graph  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.governance  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.plans.retail_oracle  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-visible ordering, round 10: the REGRESSION RING continues
# (VERDICT r9 item 3). The union is closed at 289/289 with 0 reds, so
# the 50 slots front the stalest records oldest-first: the 10 remaining
# r3-last-checked rows (this CLOSES the r3 tier — after this window
# max-staleness in the ring is r4), then the two r10-TOUCHED re-proofs —
# dedup_clusters and dedup_corpus, whose connected-components entry was
# reworked this round to surface self-pair singletons (ADVICE r9) —
# then the 38 stalest r4 rows as fill, which include tpch_q02 (its r9
# semi-join reorder gets its first in-window driver row, per VERDICT r9
# item 3). Two rows-only slots (the mm_*_fake pair — their replica
# pytests are the strong check; the driver row refreshes staleness).
# Registry growth (0) <= rotation (standing item).
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY = [
    # --- the 10 remaining r3-stale records (oldest-first) ---
    "dedup_incremental",
    "text_repetition_stats",
    "ev_resample_fill",
    "mm_image_features_fake",
    "mm_audio_window_stats",
    "mm_audio_features_fake",
    "text_quality_sample",
    "text_mixture_sample",
    "text_shard_assign",
    "wh_merge_upsert",
    # --- r10-touched re-proofs: the self-pair singleton rework's consumers ---
    "dedup_clusters",
    "dedup_corpus",
    # --- the 38 stalest r4 records (oldest-first) ---
    "star_fct_invoice_line_value",
    "op_recursive_cte_chain",
    "op_lateral_join",
    "op_checksum_table",
    "dedup_semantic_within_label",
    "dedup_containment",
    "sim_topk_batch",
    "text_ngram_novelty",
    "text_dsir_stats",
    "ev_resample_interpolate",
    "ev_markov_transitions",
    "ev_anomaly_zscore",
    "ev_sketch_rollup_uniques",
    "ev_attribution_last_touch",
    "ev_sessionize",
    "ev_journey_paths",
    "ev_cumulative_distinct_users",
    "op_agg_approx_distinct",
    "op_percentiles_approx",
    "op_winsorize",
    "op_bitmap_distinct",
    "op_try_arithmetic",
    "ev_asof_join",
    "text_temperature_sample",
    "text_dup_span_removal",
    "text_source_cap",
    "pipeline_curation_e2e",
    "wh_snapshot_diff",
    "wh_pit_snapshot",
    "tpch_q01",
    "tpch_q13",
    "tpch_q17",
    "tpch_q18",
    "tpch_q22",
    "tpch_q09",
    "tpch_q21",
    "tpch_q02",
    "tpch_q16",
]

assert len(_DRIVER_PRIORITY) == 50, len(_DRIVER_PRIORITY)
assert len(set(_DRIVER_PRIORITY)) == 50
_missing = [n for n in _DRIVER_PRIORITY if n not in REGISTRY]
assert not _missing, f"priority names not registered: {_missing}"

_ordered = {n: REGISTRY[n] for n in _DRIVER_PRIORITY}
for _n, _q in REGISTRY.items():
    _ordered.setdefault(_n, _q)
REGISTRY.clear()
REGISTRY.update(_ordered)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn = REGISTRY["star_report_customer"].build
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
