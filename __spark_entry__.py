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
# Driver-visible ordering, round 5. The driver checks the FIRST 50
# registrations; after r4 the cross-round union stood at 165/286 with
# 121 registrations never driver-checked (tools/rotation_audit.py).
# VERDICT r4 item 2 set the targets: union >= 215 and never-checked
# <= 75 after this round — arithmetic that requires ALL 50 slots to go
# to the never-checked backlog, so this window carries ZERO repeat
# controls (defensible: 0 reds anywhere, every r4 window row green, the
# former controls' code paths are untouched this round, and
# tests/test_schema_sweep.py re-analyzes every registration's plan in
# pytest so a type-signature regression still surfaces without a slot).
# Slots go to whole never-checked TIERS so each module earns driver
# rows: the 10 classic-shape TPC-H, all 10 warehouse ops, all 3
# graph-oracled + all 3 governance, the 5 retail-analytics/FP&A ops,
# 3 semistructured, 10 events/timeseries, 3 text, dedup/sim reps, and
# the cogrouped-asof mechanism. Remaining backlog after r5: ~72
# (52 oracled + the rows-only tier) — r6's window covers the oracled
# rest. All 286 remain covered every round by tools/oracle_check.py +
# tools/vanilla_sweep.py (NOTES_r5).
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY = [
    # classic-shape TPC-H (mechanisms subsumed by the r4-checked 12,
    # now earning their own driver rows)
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
    # semistructured siblings
    "ev_props_json_filter",
    "ev_props_csv_and_xpath",
    "ev_props_variant_explode",
    # warehouse tier — closes it completely
    "wh_foreign_key_check",
    "wh_scd2_asof_join",
    "wh_data_diff_summary",
    "wh_cdc_apply_with_deletes",
    "wh_late_arriving_dim",
    "wh_dim_surrogate_assign",
    "wh_scd3_prior_value",
    "wh_bitemporal_asof",
    "wh_scd6_hybrid",
    # graph (oracled members) + governance — closes both
    "graph_triangle_count",
    "graph_itemcf_recs",
    "graph_bfs_distances",
    "gov_pii_scan_report",
    "gov_row_level_security",
    "gov_k_anonymity",
    # retail analytics / FP&A — closes it
    "op_revenue_bridge",
    "op_did_analysis",
    "op_gini_revenue_concentration",
    "op_lorenz_curve",
    "op_abc_classification",
    # events / timeseries
    "ev_ab_test_metrics",
    "ev_cm_heavy_hitters",
    "ev_feature_store_pit",
    "ev_ewma_level",
    "ev_time_weighted_avg",
    "ev_cusum_alarm",
    "ev_survival_kaplan_meier",
    "ev_seasonal_decompose",
    # NEW this round (VERDICT item 3: new registrations land in-window):
    # Holt-Winters triple fold — the r4 backlog stretch item
    "ev_holt_winters",
    # text
    "text_vocab_growth",
    "text_filter_attrition",
    # dedup / similarity representative
    "dedup_url_canonicalize",
    # multimodal — promoted from rows-only to full DuckDB oracles this
    # round (integer-only outputs re-derived per character; VERDICT r4
    # item 4), so their first driver rows are hash-checked ones
    "mm_wav_features",
    "mm_ppm_features",
    "mm_binaryfile_source",
    "mm_phash_dedup",
    # cogrouped applyInPandas mechanism (merge_asof, user_id%64 buckets)
    "op_cogroup_asof",
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
