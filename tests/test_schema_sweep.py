"""Analysis-time regression net (VERDICT r3 items 1/3).

The r3 round lost its entire bench to a single AnalysisException raised
at plan time (`unix_micros` over a TIMESTAMP_NTZ `ts`). Both failure
classes are catchable without executing a single job:

1. the catalog must normalize every physical timestamp shape the
   testdata has ever shipped (nanos-as-long, µs-NTZ) to plain TIMESTAMP;
2. every registered query must *analyze* — building `.schema` forces
   full analysis/resolution, so any type-signature break in any
   operator surfaces here in seconds, not in the driver's bench run.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR


def test_events_ts_normalized_to_timestamp(catalog):
    """events.ts must be TIMESTAMP (not NTZ, not long) after load_tables.

    The parquet stores timestamp[us] with no UTC flag; pyspark 4.x reads
    that as TIMESTAMP_NTZ, which TIMESTAMP-only functions (unix_micros,
    to_utc_timestamp) reject at analysis time. The UTC-pinned session
    makes the normalizing cast wall-clock-exact.
    """
    dtypes = dict(catalog.table("events").dtypes)
    assert dtypes["ts"] == "timestamp", dtypes["ts"]


def test_no_ntz_columns_in_any_catalog_table(catalog):
    """No table may expose an NTZ column: any TIMESTAMP-only function
    added later over any of them would break the same way ev_asof_join
    did in r3."""
    offenders = {
        name: [c for c, t in catalog.table(name).dtypes if t == "timestamp_ntz"]
        for name in catalog.names()
    }
    offenders = {k: v for k, v in offenders.items() if v}
    assert not offenders, offenders


def test_every_registered_query_analyzes(spark):
    """Build .schema for every queries() entry — full Catalyst analysis,
    zero execution. Fails fast with the per-query exception list."""
    failures = {}
    for name, fn in entry.queries().items():
        try:
            fn(spark, SF_DIR).schema
        except Exception as exc:  # noqa: BLE001 — collect all, report once
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
    assert not failures, failures


@pytest.mark.parametrize("query", ["ev_asof_join"])
def test_asof_join_executes_on_driver_shaped_events(spark, query):
    """Direct regression pin for the r3 red: the exact query that broke,
    end-to-end on the real testdata shape (not a synthetic fixture)."""
    df = entry.queries()[query](spark, SF_DIR)
    rows = df.limit(5).collect()
    assert {"click_event", "user_id", "click_ts", "last_error_ts", "gap_us"} <= set(
        df.columns
    )
    assert len(rows) > 0


def test_no_unintended_cartesian_or_nested_loop_joins(spark):
    """Plan sweep over EVERY registered query: a CartesianProduct or a
    non-trivial BroadcastNestedLoopJoin in a physical plan is the classic
    silent scale-killer (an equi-condition that fell out of the join
    clause). Whitelist: queries that deliberately crossJoin a broadcast
    1-row frame (query vectors, centroid/codebook tables, global stats)
    — those appear as BroadcastNestedLoopJoin over a single-row side and
    are bounded by construction. The O(n^2) baselines (ngram_jaccard,
    embedding_cosine) use equi-join candidate generation, so even they
    must NOT plan a cartesian."""
    import __spark_entry__ as entry

    # deliberate broadcast-of-tiny-frame crossJoins
    allowed_bnlj = {
        "sim_topk_bruteforce",  # broadcast 1-row query vector
        "sim_topk_pandas_udf",
        "sim_ann_ivf",  # broadcast query row
        "sim_ann_lsh",
        "sim_ann_pq_adc",  # broadcast M*K distance table (1 row)
        "sim_ann_pq_refine",  # same table + broadcast 1-row query vector
        "sim_ann_ivf_pq",  # same broadcast table, cell-pruned scan
        # (sim_kmeans left the list in-round: assignment is now an Arrow
        # UDF over the cached scan — no centroid crossJoin remains)
        "sim_pq_encode",  # broadcast 1-row codebook table
        "text_mixture_sample",  # broadcast 1-row min_n frame
        "text_contamination",  # broadcast benchmark side (tiny by design)
        "text_bm25",  # broadcast corpus-stats row
        "text_pack_sequences",
        "text_quality_sample",
        "dedup_incremental",  # asymmetric probe against empty-index edge
        "dedup_incremental_fast",
        "text_lm_score",  # broadcast vocab-total row
        "text_repetition_stats",
        "sim_topk_batch",  # broadcast Q-row query batch (Q=5)
        "sim_ann_recall_report",  # same Q-row batch + 1-row corpus count
        "sim_knn_classify",  # same broadcast Q-row query batch
        "text_dsir_weights",  # broadcast 1-row target/raw token totals
        "tpch_q22",  # broadcast 1-row avg-acctbal threshold (scalar subquery)
        "tpch_q11",  # r6: broadcast 1-row value-total threshold (was a
        # global window funneling the |parts| frame through one task)
        "tpch_q15",  # r6: broadcast 1-row max-revenue threshold (same)
        "ev_ab_test_metrics",  # 1-row x 1-row variant crossJoin (A x B)
        "sim_range_search",  # broadcast Q-row query batch (Q=10), radius filter
        "ev_conversion_lag",  # broadcast 1-row global-percentile frame
        "wh_dim_surrogate_assign",  # broadcast 1-row high-water frame
        "wh_data_diff_summary",  # 1-row x 1-row profile crossJoin (old x new)
        "text_filter_attrition",  # broadcast 1-row corpus-total frame
        "op_did_analysis",  # four 1-row cell frames crossJoined (2x2 design)
        # (tpch_q11 left the list in-round: its threshold is now a global
        # window over the per-part frame, no BNLJ remains)
        # documented inequality joins
        "dedup_embedding_cosine",  # the explicit O(n^2) verification
        # baseline (vec_id < vec_id is its only condition); production
        # paths are dedup_semantic_within_label / sim_ann_*
        "op_join_range",  # broadcast 3-row literal band table — bounded
        "op_sql_udf",  # broadcast 6-row size_bands table function, range
        # predicate p_size BETWEEN lo AND hi — bounded by construction
        # range-bucket prefix carry (functions/prefix.py): the strictly-
        # lower-triangle self-join over the <= n_buckets-row per-bucket
        # totals — <= 64x64 broadcast rows by construction, the explicit
        # replacement for an unpartitioned fact-sized WindowExec
        "ev_peak_concurrency",
        "op_skyline_pareto",
        "op_sequence_gaps",
        "op_quantile_normalization",
        # same carry + a broadcast 1-row total/count frame (global_ntile
        # / cumulative share over the per-customer/part aggregates)
        "op_rfm_segments",
        "op_lorenz_curve",
        "op_abc_classification",
        "op_gini_revenue_concentration",
        "text_vocab_growth",
    }
    offenders = {}
    for name, fn in entry.queries().items():
        try:
            plan = (
                fn(spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # noqa: BLE001
            offenders[name] = f"plan build failed: {exc}"[:120]
            continue
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in allowed_bnlj:
            offenders[name] = "BroadcastNestedLoopJoin (not whitelisted)"
    assert not offenders, offenders


# The r7 window deliberately spends slots on the rows-only tier: VERDICT
# r6 item 1 rotates the never-driver-checked backlog — 11 rows-only
# members at composition time, 9 after the mid-round promotions of
# sim_mmr_rerank and dedup_semantic_within_label_fast to full oracles —
# into the window so EVERY registration has some driver record (hash
# rows for the oracled, rows-only for these).
# r8/r9: empty — those windows fronted stale records that all carry
# full DuckDB oracles. r10: the ring's stalest tier (r3) includes the
# two rows-only multimodal fakes, which VERDICT r9 item 3 explicitly
# rotates in — their byte-exact replica pytests remain the strong
# check; the driver row refreshes staleness. The other 5 rows-only
# registrations (emb_pca_project, text_bpe_apply, mm_ppm_resize,
# op_agg_approx_distinct_raw, op_percentiles_approx_raw) sit OUTSIDE
# the window; each keeps its replica/bound pytest.
# r11: empty again — the window fronts the r4/r5 stale tiers plus the
# post-bloom q17/q02 re-proofs, all of which carry full DuckDB oracles
# (the 7 rows-only registrations all sit outside the window with their
# replica/bound pytests).
_EXPECTED_ROWS_ONLY_SLOTS: set[str] = set()


def test_driver_window_integrity():
    """The first 50 registrations ARE the documented priority window, in
    order, and every rows-only slot is one the window DOCUMENTS as such
    (an undocumented rows-only slot would silently waste a hash check)."""
    import __spark_entry__ as entry
    from __spark_entry__ import _DRIVER_PRIORITY

    names = list(entry.queries())
    assert names[:50] == _DRIVER_PRIORITY
    oracles = entry.oracle_sql()
    rows_only = {n for n in _DRIVER_PRIORITY if n not in oracles}
    assert rows_only == _EXPECTED_ROWS_ONLY_SLOTS, rows_only
