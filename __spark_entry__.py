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
# Driver-visible ordering, round 4 (window fixed mid-round at registry
# size 219; the second and third continuations grew the registry to
# 286 — every post-window addition joins the r5 rotation backlog with
# local oracle_check + vanilla-sweep + pytest evidence recorded in
# NOTES_r4 and COVERAGE.md). The driver checks the FIRST 50 registrations;
# slots go to (a) 4 controls — ev_asof_join
# (the r3 red, code changed this round) and the two approx sketches
# (upgraded to bounded within_bound oracles) plus one cross-round
# star-schema control — and (b) 46 oracled never-checked queries
# chosen for MECHANISM diversity: all of r4-early, r4b, r4c, and the
# 12 TPC-H adaptations with distinct plan mechanisms (q02/q11/q16/q20
# derived part-supplier pairs, q09 profit decomposition, q13 outer
# count distribution, q15 global-max view, q17/q18 correlated/semi
# aggregates, q21 multi-exists, q22 anti + scalar subquery, q01 agg
# disciplines). Deferred to the r5 window: 10 classic-shape TPC-H
# (q03-q08, q10, q12, q14, q19 — mechanisms subsumed by the kept set),
# 5 oracled siblings of in-window queries (json_filter, map_functions,
# dup_span_keep_first, temperature_resample, knn_classify), and the
# 10 rows-only entries (their driver row is weak; pytest replicas
# carry their evidence). ALL 286 are covered by tools/oracle_check.py
# + tools/vanilla_sweep.py this round (outputs in NOTES_r4), and
# tools/rotation_audit.py mechanically confirms the union/backlog.
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY = [
    # (a) controls / changed code paths
    "ev_asof_join",
    "op_agg_approx_distinct",
    "op_percentiles_approx",
    "star_fct_invoice_line_value",
    # (b1) r4-early oracled, never driver-checked
    "text_temperature_sample",
    "text_dup_span_removal",
    "text_source_cap",
    "dedup_semantic_within_label",
    "wh_snapshot_diff",
    "ev_resample_interpolate",
    "text_ngram_novelty",
    "ev_markov_transitions",
    "ev_anomaly_zscore",
    "dedup_containment",
    "pipeline_curation_e2e",
    "sim_topk_batch",
    "ev_sketch_rollup_uniques",
    "wh_pit_snapshot",
    "text_dsir_stats",
    "ev_attribution_last_touch",
    # (b2) r4b oracled, never driver-checked
    "op_recursive_cte_chain",
    "ev_props_json_stats",
    "ev_props_json_roundtrip",
    "ev_props_variant_stats",
    "text_udtf_word_positions",
    "op_rfm_segments",
    "op_market_basket_pairs",
    "gov_gdpr_erasure_audit",
    "op_winsorize",
    # (b3) r4c oracled, never driver-checked
    "ev_sessionize",
    "ev_journey_paths",
    "ev_cumulative_distinct_users",
    "op_bitmap_distinct",
    "op_try_arithmetic",
    "op_lateral_join",
    "ev_props_xml_roundtrip",
    "op_sequence_gaps",
    "op_checksum_table",
    # (b4) TPC-H mechanism representatives
    "tpch_q01",
    "tpch_q02",
    "tpch_q09",
    "tpch_q11",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
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
