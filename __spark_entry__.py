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
import data_pipeline_4_online_retail_spark.plans.retail_oracle  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-visible ordering, round 3: the driver correctness-checks the
# FIRST 50 registrations. Slots go to (a) the 15 queries with no driver
# row in r1 ∪ r2 (late round-2 additions past the 50-query window),
# (b) the 3 r2 reds re-verified after their canonicalizer-interface
# fixes (op_math_functions type casts; emb_* exploded outputs), (c) the
# dedup family, re-verified because its cache lifecycle changed this
# round, (d) cross-round controls + round-1 greens not seen since r1,
# and (e) every r3-new registration — including the rows-only ones,
# which the driver records as `no_oracle` + spark_rows evidence. After
# this round r1 ∪ r2 ∪ r3 covers ALL registrations. Everything past #50
# stays covered by tools/oracle_check.py (the driver-identical local
# replica).
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY = [
    # (a) the 15 queries with no driver row in r1 ∪ r2
    "op_window_range_frame",
    "op_window_distribution",
    "op_agg_grouping_sets",
    "op_fuzzy_match_blocked",
    "op_unpivot_melt",
    "op_pivot_native",
    "sim_kmeans",
    "text_bpe_pair_freqs",
    "ev_funnel",
    "ev_cohort_retention",
    "ev_resample_fill",
    "mm_image_features_fake",
    "op_agg_approx_distinct",
    "text_quality_sample",
    "wh_merge_upsert",
    # (b) r2 reds, fixed this round
    "op_math_functions",
    "emb_l2_normalize",
    "emb_quantize_int8",
    # (c) dedup family — cache lifecycle reworked this round
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_corpus",
    "dedup_embedding_cosine",
    # (d) cross-round controls + r1-only greens for freshness
    "star_report_customer",
    "retail_fct_invoice_line_value",
    "sim_ann_ivf",
    "sim_label_centroids",
    "sim_topk_bruteforce",
    "star_fct_invoice_line_value",
    "star_report_product",
    "op_agg_count_distinct",
    "op_agg_group_multi",
    "op_agg_rollup",
    "op_array_functions",
    "op_conditional_case",
    "op_datetime_roundtrip",
    "op_dedup_row_number",
    "op_join_anti",
    "op_join_range",
    "op_join_semi",
    # (e) r3-new operators — first driver evidence this round (the
    # r1-green star_dim_* / op_window_lead_lag fillers they displace
    # keep their r1 rows; star dims stay pytest + replica covered)
    "text_repetition_stats",
    "text_mixture_sample",
    "text_shard_assign",
    "dedup_incremental",
    "dedup_incremental_fast",
    "mm_audio_window_stats",
    "mm_audio_features_fake",
    "text_lm_score",
    "op_percentiles_approx",
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
