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
# Driver-visible ordering, round 7. The driver checks the FIRST 50
# registrations; after r6 the cross-round union stood at 265/288 with 23
# never driver-checked + 5 promoted-since-r1/r3 queries whose rows-only
# driver record predates their oracle (VERDICT r6 item 1 names all 28).
# This window closes the union: all 23 never-checked (three of them —
# ev_markov_absorption, graph_pagerank_copurchase (VERDICT item 6), and
# sim_mmr_rerank (beyond the ask) — promoted to FULL oracles this
# round), the 5 stale-promoted, the round's
# one new registration (graph_itemcf_recs_capped, VERDICT item 2 — the
# scale-safe itemcf path's own green row), and 21 re-proof slots: every
# prefix-helper consumer (the r7 adaptive-bypass + tie-salt + eqNullSafe
# + exact-div changes route them through NEW code at sf0.01 — the bypass
# path — so these driver rows certify this round's plan change, while
# the forced-decomposition path is re-proven by tools/oracle_check.py
# with SPARK_GRAFT_PREFIX_SMALL_BYTES=0 and the pytest bit-identity
# pins), the r6-touched graph/tpch queries (tpch_q11/q15 consume the
# prefix module's persist_scoped), and 4 stalest-r1 controls per the
# rotation_audit convention. Registry growth (+1) <= rotation (VERDICT
# item 8); after this round every oracled registration has a hash-green
# driver row in some round (288 of 289 checked + the new capped twin).
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY = [
    # --- the 23 never-driver-checked (closes the union) ---
    "op_histogram_fixed_bins",
    "op_parameterized_sql",
    "op_sql_pipe_syntax",
    "op_stack_long_format",
    "op_transpose_summary",
    "dedup_semantic_within_label_fast",
    "dedup_minhash_estimate",
    "emb_pca_project",
    "sim_pq_encode",
    "sim_ann_pq_adc",
    "sim_ann_ivf_pq",
    "sim_knn_classify",
    "sim_mmr_rerank",
    "sim_ann_pq_refine",
    "text_bpe_apply",
    "text_dsir_weights",
    "ev_gap_fill_forward",
    "ev_markov_absorption",
    "mm_ppm_resize",
    "op_agg_approx_distinct_raw",
    "op_percentiles_approx_raw",
    "text_weighted_sample_ares",
    "graph_pagerank_copurchase",
    # --- the 5 promoted-since-r1/r3 whose driver record predates the oracle ---
    "dedup_minhash_lsh_fast",
    "dedup_simhash",
    "dedup_incremental_fast",
    "sim_ann_lsh",
    "text_lm_score",
    # --- NEW this round (lands in-window per the r4-r6 convention) ---
    "graph_itemcf_recs_capped",
    # --- r7 re-proof: every prefix-helper consumer (bypass/salt/div/NULL
    #     changes) + r6-touched graph/tpch + 4 stalest-r1 controls ---
    "op_rfm_segments",
    "op_lorenz_curve",
    "op_abc_classification",
    "op_gini_revenue_concentration",
    "text_vocab_growth",
    "op_sequence_gaps",
    "op_window_rank",
    "op_quantile_normalization",
    "op_skyline_pareto",
    "ev_peak_concurrency",
    "ev_conversion_lag",
    "op_rfm_segments_approx",
    "tpch_q11",
    "tpch_q15",
    "graph_triangle_count",
    "graph_itemcf_recs",
    "op_market_basket_pairs",
    "op_window_group_max",
    "star_dim_customer",
    "op_project_alias",
    "op_surrogate_key",
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
