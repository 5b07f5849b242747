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
# Driver-visible ordering, round 11: the REGRESSION RING continues
# (VERDICT r10 item 2). The union is closed at 289/289 with 0 reds, so
# the 50 slots front the stalest records oldest-first: the 7 remaining
# r4-last-checked rows (this CLOSES the r4 tier), then two r10-TOUCHED
# re-proofs — tpch_q17 and tpch_q02, whose sf100 plans the late-r10
# runtime bloom-filter adoption changes most (their sf0.01 plans are
# bloom-free by construction — plan-verified no-op below sf1 — but the
# window row re-proves the adopted tree; q19, the third bloom
# beneficiary, sits in the r5 tier below) — then the round's TWO new
# registrations (dedup_clusters_fast + dedup_corpus_fast, the xxhash64
# clustering rungs from the r11 density probe — never-checked entries
# front the ring) and 39 of the 44 r5-stale rows as fill. The 5
# deferred r5 rows (wh_foreign_key_check, wh_late_arriving_dim,
# wh_scd2_asof_join, wh_scd3_prior_value, wh_scd6_hybrid — warehouse
# ops pinned by test_warehouse.py) stay at staleness r5, keeping
# max-staleness <= r5 per the VERDICT r10 done-bar; they front the r12
# window.
# Registry growth (+2) <= rotation (standing item).
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY = [
    # --- the 7 remaining r4-stale records (oldest-first; closes r4) ---
    "tpch_q20",
    "ev_props_json_stats",
    "ev_props_json_roundtrip",
    "ev_props_variant_stats",
    "text_udtf_word_positions",
    "ev_props_xml_roundtrip",
    "gov_gdpr_erasure_audit",
    # --- post-bloom-adoption re-proofs (VERDICT r10 item 2) ---
    "tpch_q17",
    "tpch_q02",
    # --- the round's new registrations (never-checked fronts the ring) ---
    "dedup_clusters_fast",
    "dedup_corpus_fast",
    # --- 39 of the 44 r5-stale records ---
    "dedup_url_canonicalize",
    "ev_ab_test_metrics",
    "ev_cm_heavy_hitters",
    "ev_cusum_alarm",
    "ev_ewma_level",
    "ev_feature_store_pit",
    "ev_holt_winters",
    "ev_props_csv_and_xpath",
    "ev_props_json_filter",
    "ev_props_variant_explode",
    "ev_seasonal_decompose",
    "ev_survival_kaplan_meier",
    "ev_time_weighted_avg",
    "gov_k_anonymity",
    "gov_pii_scan_report",
    "gov_row_level_security",
    "graph_bfs_distances",
    "mm_binaryfile_source",
    "mm_phash_dedup",
    "mm_ppm_features",
    "mm_wav_features",
    "op_cogroup_asof",
    "op_did_analysis",
    "op_revenue_bridge",
    "text_filter_attrition",
    "tpch_q03",
    "tpch_q04",
    "tpch_q05",
    "tpch_q06",
    "tpch_q07",
    "tpch_q08",
    "tpch_q10",
    "tpch_q12",
    "tpch_q14",
    "tpch_q19",
    "wh_bitemporal_asof",
    "wh_cdc_apply_with_deletes",
    "wh_data_diff_summary",
    "wh_dim_surrogate_assign",
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
