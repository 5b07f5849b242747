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
# Driver-visible ordering, round 8: the REGRESSION RING (VERDICT r7 item
# 1). The r1-r7 union is CLOSED (289/289 driver-checked, 0 reds ever),
# so the 50 driver slots are pure regression-guard capacity; per the
# rotation_audit convention this window fronts the STALEST records
# oldest-first — all 19 r1-only rows (the star dims, the early op_*
# micro-queries, sim_topk_pandas_udf) and the 24 stalest r2 rows (the
# text core, the ev window family, mm_* metadata, set ops) — plus the 7
# r8-touched re-proof slots: the five PROMOTED-to-full-oracle queries
# (sim_kmeans + the PQ family, VERDICT r7 items 2-3 — their prior
# driver rows predate the oracle, exactly the staleness class r7
# rotated on), sim_label_centroids (oracle switched to the mirrored
# nano-unit mean after the decimal(18,9) half-boundary audit — see
# functions/vector.nano_units), and op_quantile_normalization (VERDICT
# r7 item 5 fusion: the per-priority ranking now rides the global
# prefix pass as conditional counts). 43/50 slots are r1/r2-stale; the
# 17 remaining r2 rows head next round's window. Zero rows-only slots
# this round (the promotions emptied the window's no_oracle tier).
# Registry growth (0) <= rotation (standing item).
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY = [
    # --- the 19 r1-only records (stalest; oldest-first) ---
    "star_dim_product",
    "star_dim_datetime",
    "star_dim_invoice",
    "op_filter_predicates",
    "op_derived_arithmetic",
    "op_distinct_projection",
    "op_window_lead_lag",
    "op_quality_metrics",
    "op_set_union",
    "op_set_intersect",
    "op_set_except",
    "op_topk",
    "op_order_by_full",
    "op_deterministic_sample",
    "op_group_topk",
    "op_sql_api",
    "op_from_json_struct",
    "op_table_profile",
    "sim_topk_pandas_udf",
    # --- the 24 stalest r2 records ---
    "star_report_year",
    "op_window_running_sum",
    "op_agg_conditional_pivot",
    "op_json_extract",
    "op_stratified_sample",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_word_freq",
    "text_tf_df",
    "text_regex_tokens",
    "ev_tumbling_window",
    "ev_hopping_window",
    "ev_session_window",
    "ev_interval_join",
    "ev_multi_resolution_rollup",
    "mm_binary_metadata",
    "mm_frame_sample",
    "op_string_functions",
    "op_date_arithmetic",
    "op_null_handling",
    "op_agg_cube",
    "op_percentiles_exact",
    # --- r8-touched re-proofs: the five promotions + the two changed ---
    "sim_kmeans",
    "sim_pq_encode",
    "sim_ann_pq_adc",
    "sim_ann_ivf_pq",
    "sim_ann_pq_refine",
    "sim_label_centroids",
    "op_quantile_normalization",
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
