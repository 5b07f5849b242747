"""Round-4 continuation (r4d) operators: semantic assertions beyond the
DuckDB hash oracle — each test pins a property the oracle compare alone
would not explain (conservation, bounds, replica agreement).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from data_pipeline_4_online_retail_spark.operators.warehouse import (
    COMPACTION_TARGET_BYTES,
    LATE_DIM_MOD,
)
from data_pipeline_4_online_retail_spark.operators.similarity import (
    RANGE_QUERY_COUNT,
    RANGE_THRESHOLD,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_late_arriving_dim_conserves_fact_lines(spark, catalog, qs):
    """LEFT-join semantics: no fact line is dropped; inferred members are
    exactly the parts the dim is missing (partkey % MOD == 0)."""
    out = qs["wh_late_arriving_dim"](spark, SF_DIR)
    rows = out.collect()
    total_lines = sum(r.n_lines for r in rows)
    assert total_lines == catalog.table("lineitem").count()
    for r in rows:
        inferred = r.part_id % LATE_DIM_MOD == 0
        assert r.is_inferred == (1 if inferred else 0), r
        if inferred:
            assert r.description == "Unknown (late arriving)"
        else:
            assert r.description != "Unknown (late arriving)"


def test_compaction_plan_next_fit_invariants(spark, qs):
    """Bins are contiguous in layout order, every bin except the last
    closes at-or-after the target, and byte totals are conserved."""
    rows = (
        qs["wh_compaction_plan"](spark, SF_DIR)
        .orderBy("layout_key", "file_day")
        .collect()
    )
    assert rows
    # replica: sequential next-fit over the same ordering
    cum = 0
    for r in rows:
        assert r.bin_id == cum // COMPACTION_TARGET_BYTES, r
        cum += r.size_bytes
    # per-bin fill: each bin except the last spans >= target bytes from
    # its first file's offset (next-fit closes a bin only by overflow)
    bins: dict[int, int] = {}
    for r in rows:
        bins[r.bin_id] = bins.get(r.bin_id, 0) + r.size_bytes
    last = max(bins)
    for b, size in bins.items():
        if b != last:
            # a closed bin plus its successor's first file crossed target;
            # the bin itself holds at most target + (max file size - 1)
            assert size <= COMPACTION_TARGET_BYTES + max(
                r.size_bytes for r in rows
            )


def test_range_search_matches_numpy_bruteforce(spark, qs):
    """Pair set == numpy cosine >= threshold over the same vectors."""
    np = pytest.importorskip("numpy")
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    ids = [r.vec_id for r in emb]
    mat = np.array([r.embedding for r in emb], dtype=np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    got = {
        (r.query_id, r.match_id)
        for r in qs["sim_range_search"](spark, SF_DIR).collect()
    }
    want = set()
    for qi, qid in enumerate(ids):
        if qid >= RANGE_QUERY_COUNT:
            continue
        cos = (mat @ mat[qi]) / (nrm * nrm[qi])
        for mi, mid in enumerate(ids):
            if mid != qid and cos[mi] >= RANGE_THRESHOLD - 1e-9:
                want.add((qid, mid))
    # float-boundary tolerance: pairs within 1e-9 of the threshold may
    # legitimately differ between fold orders; none exist in the fixture
    assert got == want


def test_group_moments_match_numpy(spark, qs):
    """Mean/variance derived from exact moments == numpy on the
    cents-exact values."""
    np = pytest.importorskip("numpy")
    out = {r.l_returnflag: r for r in qs["op_group_moments_mergeable"](
        spark, SF_DIR
    ).collect()}
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    groups: dict[str, list[float]] = {}
    for r in li:
        # same 4-dp pinning as the operator
        groups.setdefault(r.l_returnflag, []).append(
            round(r.l_extendedprice * 10000) / 10000.0
        )
    for flag, vals in groups.items():
        a = np.array(vals)
        r = out[flag]
        assert r.n == len(vals)
        assert math.isclose(r.mean_price, float(a.mean()), rel_tol=1e-9)
        assert math.isclose(
            r.var_pop_price, float(a.var()), rel_tol=1e-6
        ), (flag, r.var_pop_price, float(a.var()))


def test_conversion_lag_percentiles_and_quartiles(spark, qs):
    """percentile_disc returns actual data elements; quartile buckets are
    balanced; every lag is non-negative."""
    rows = qs["ev_conversion_lag"](spark, SF_DIR).collect()
    assert rows
    lags = sorted(r.lag_us for r in rows)
    n = len(lags)
    p50 = rows[0].p50_lag_us
    p90 = rows[0].p90_lag_us
    assert all(r.p50_lag_us == p50 and r.p90_lag_us == p90 for r in rows)
    # discrete percentile: smallest element with cume_dist >= p
    assert p50 == lags[math.ceil(0.5 * n) - 1]
    assert p90 == lags[math.ceil(0.9 * n) - 1]
    assert all(r.lag_us >= 0 for r in rows)
    sizes = {}
    for r in rows:
        sizes[r.lag_quartile] = sizes.get(r.lag_quartile, 0) + 1
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_explode_outer_preserves_empty_array_rows(spark, catalog, qs):
    """Every 4th order has an empty array and must survive with v NULL;
    total row count is sum of array lengths plus the empty-array rows."""
    out = qs["op_explode_outer"](spark, SF_DIR)
    o = catalog.table("orders")
    n_orders = o.count()
    n_empty = o.filter(F.col("o_orderkey") % 4 == 0).count()
    null_rows = out.filter(F.col("v").isNull()).count()
    assert null_rows == n_empty
    assert out.select("o_orderkey").distinct().count() == n_orders


def test_rls_auditor_sees_everything(spark, catalog, qs):
    """auditor's visible set must equal the full customer⋈nation row
    space; analyst partitions are disjoint region subsets."""
    rows = {r.role: r for r in qs["gov_row_level_security"](spark, SF_DIR).collect()}
    n_all = (
        catalog.table("customer")
        .join(
            catalog.table("nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .count()
    )
    assert rows["auditor"].n_visible_customers == n_all
    assert rows["auditor"].n_visible_nations == 25
    assert rows["analyst_emea"].n_visible_nations == 10
    assert rows["analyst_apac"].n_visible_nations == 10
    assert (
        rows["analyst_emea"].n_visible_customers
        + rows["analyst_apac"].n_visible_customers
        < n_all
    )


def test_surrogate_assign_dense_and_stable(spark, qs):
    """ids are 1..N dense with no reuse; existing members keep the ids a
    re-run of the existing slice alone would produce."""
    rows = qs["wh_dim_surrogate_assign"](spark, SF_DIR).collect()
    ids = sorted(r.surrogate_id for r in rows)
    assert ids == list(range(1, len(rows) + 1))
    existing = sorted(
        (r.p_partkey, r.surrogate_id) for r in rows if r.is_new == 0
    )
    # existing ids are exactly row_number over the existing natural keys
    keys = [k for k, _ in existing]
    assert [s for _, s in existing] == list(range(1, len(keys) + 1))
    assert keys == sorted(keys)
    # every new id is above the high-water mark
    hw = len(keys)
    assert all(r.surrogate_id > hw for r in rows if r.is_new == 1)


def test_vocab_growth_monotone_and_totals(spark, qs):
    """Both curves are nondecreasing; the final points equal the corpus
    token total and the corpus distinct-word count."""
    rows = (
        qs["text_vocab_growth"](spark, SF_DIR).orderBy("doc_id").collect()
    )
    assert rows
    toks = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("w"))
    )
    assert rows[-1].cum_tokens == toks.count()
    assert rows[-1].cum_vocab == toks.distinct().count()
    for a, b in zip(rows, rows[1:]):
        assert b.cum_tokens >= a.cum_tokens
        assert b.cum_vocab >= a.cum_vocab


def test_lsh_recall_report_measures_shipped_pipelines(spark, qs):
    """The report's truth/hit counts must equal the row counts of the
    operators it claims to measure (ngram-Jaccard truth, verified LSH
    output), and the ratios must be consistent."""
    r = qs["dedup_lsh_recall_report"](spark, SF_DIR).collect()[0]
    n_truth = qs["dedup_ngram_jaccard"](spark, SF_DIR).count()
    n_verified = qs["dedup_minhash_lsh"](spark, SF_DIR).count()
    assert r.n_true == n_truth
    # verified LSH output = candidates that pass the exact-Jaccard gate
    # = exactly the report's hits
    assert r.n_hits == n_verified
    assert r.n_missed == r.n_true - r.n_hits
    assert 0.0 < r.lsh_precision <= 1.0
    assert r.lsh_recall == r.n_hits / r.n_true
    assert r.n_candidates >= r.n_hits


def test_ann_recall_report_consistency(spark, qs):
    """One row per batch query; hits bounded by k; recall and scan
    fraction derive exactly from their integer numerators; the qid=0
    row agrees with the standalone single-query operators."""
    from data_pipeline_4_online_retail_spark.operators.similarity import (
        BATCH_QUERIES,
        TOP_K,
    )

    rows = qs["sim_ann_recall_report"](spark, SF_DIR).collect()
    assert len(rows) == BATCH_QUERIES
    for r in rows:
        assert 0 <= r.n_hits <= TOP_K
        assert r.recall_at_k == r.n_hits / TOP_K
        assert 0 < r.scan_fraction < 1
    # cross-pin against the standalone operators for query 0
    exact0 = {x.vec_id for x in qs["sim_topk_bruteforce"](spark, SF_DIR).collect()}
    ivf0 = {x.vec_id for x in qs["sim_ann_ivf"](spark, SF_DIR).collect()}
    r0 = next(r for r in rows if r.qid == 0)
    assert r0.n_hits == len(exact0 & ivf0)


def test_feature_store_pit_no_leakage(spark, qs):
    """Replay every label row from raw events: the as-of feature must be
    the latest view STRICTLY before the label, the click count must
    cover exactly [label-7d, label), and no feature may see ts >=
    label_ts (the leakage contract)."""
    import datetime as dt

    rows = qs["ev_feature_store_pit"](spark, SF_DIR).collect()
    assert rows
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user: dict[int, list] = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    for r in rows:
        views = [
            e
            for e in by_user[r.user_id]
            if e.event_type == "view" and e.ts < r.label_ts
        ]
        want_view = (
            max(views, key=lambda e: e.ts).value if views else None
        )
        assert r.last_view_value == want_view, (r.label_id, r.last_view_value)
        lo = r.label_ts - dt.timedelta(days=7)
        want_clicks = sum(
            1
            for e in by_user[r.user_id]
            if e.event_type == "click" and lo <= e.ts < r.label_ts
        )
        assert r.n_clicks_7d == want_clicks, r.label_id


def test_oov_rate_replica(spark, qs):
    """Replay the vocab construction and per-doc OOV counts in Python."""
    from collections import Counter

    rows = {r.doc_id: r for r in qs["text_oov_rate"](spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    counts = Counter()
    for d in docs:
        counts.update(d.text.split(" "))
    from data_pipeline_4_online_retail_spark.operators.text_analysis import (
        VOCAB_TOP_N,
    )

    vocab = {
        w
        for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :VOCAB_TOP_N
        ]
    }
    for d in docs:
        toks = d.text.split(" ")
        oov = sum(1 for t in toks if t not in vocab)
        r = rows[d.doc_id]
        assert (r.n_tokens, r.n_oov) == (len(toks), oov), d.doc_id
        assert r.oov_rate == oov / len(toks)


def test_set_ops_all_multiplicities(spark, catalog, qs):
    """Multiset identities per key: union = a+b, except = max(0, a-b),
    intersect = min(a, b)."""
    c = catalog.table("customer")
    a = {
        r.k: r.n
        for r in c.filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    b = {
        r.k: r.n
        for r in c.filter(F.col("c_acctbal") > 5000)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got: dict[tuple, int] = {}
    for r in qs["op_set_ops_all"](spark, SF_DIR).collect():
        got[(r.op, r.k)] = r.n
    keys = set(a) | set(b)
    for k in keys:
        na, nb = a.get(k, 0), b.get(k, 0)
        if na + nb:
            assert got.get(("union_all", k), 0) == na + nb, k
        if na - nb > 0:
            assert got.get(("except_all", k), 0) == na - nb, k
        if min(na, nb):
            assert got.get(("intersect_all", k), 0) == min(na, nb), k


def test_null_safe_join_null_bucket_matches(spark, qs):
    """The '<null>' bucket (BUILDING on both sides) must be present and
    equal the cross-product of per-side NULL-key counts; plain = would
    produce zero pairs there."""
    rows = {r.seg_key: r.n_pairs for r in qs["op_null_safe_join"](spark, SF_DIR).collect()}
    assert "<null>" in rows and rows["<null>"] > 0
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    na = c.filter(
        (F.col("c_custkey") % 2 == 0) & (F.col("c_mktsegment") == "BUILDING")
    ).count()
    nb = c.filter(
        (F.col("c_custkey") % 3 == 0) & (F.col("c_mktsegment") == "BUILDING")
    ).count()
    assert rows["<null>"] == na * nb


def test_collation_group_merges_case_variants(spark, catalog, qs):
    """UTF8_LCASE grouping must produce exactly the lower()-normalized
    groups, and the mixed-case construction really does create case
    variants (so the merge is actually exercised)."""
    rows = {r.seg_lc: r.n for r in qs["op_collation_group"](spark, SF_DIR).collect()}
    c = catalog.table("customer")
    want = {
        r.k: r.n
        for r in c.groupBy(F.lower("c_mktsegment").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows == want
    # sanity: the initcap arm fires (odd custkeys exist per segment)
    assert c.filter(F.col("c_custkey") % 2 == 1).count() > 0


def test_itemcf_recs_replica(spark, qs):
    """Cosine scores and per-item ranking match a pure-Python replay of
    basket membership; similarity is symmetric on the score level."""
    import math
    from collections import defaultdict

    rows = qs["graph_itemcf_recs"](spark, SF_DIR).collect()
    assert rows
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    pop = defaultdict(int)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    for items in baskets.values():
        for i in items:
            pop[i] += 1
    cooc = defaultdict(int)
    for items in baskets.values():
        for i in items:
            for j in items:
                if i != j:
                    cooc[(i, j)] += 1
    for r in rows:
        want = cooc[(r.item_a, r.item_b)] / math.sqrt(
            pop[r.item_a] * pop[r.item_b]
        )
        assert r.n_cooc == cooc[(r.item_a, r.item_b)]
        assert abs(r.cosine_sim - want) < 1e-12
        assert 1 <= r.rnk <= 5
    # ranks are dense per item
    per_item = defaultdict(list)
    for r in rows:
        per_item[r.item_a].append(r.rnk)
    for ranks in per_item.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ewma_level_replica(spark, qs):
    """Bit-exact sequential-halving replay per user from raw events."""
    rows = {r.user_id: r for r in qs["ev_ewma_level"](spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    seqs: dict[int, list] = {}
    for e in ev:
        seqs.setdefault(e.user_id, []).append((e.ts, e.event_id, e.value))
    for uid, seq in seqs.items():
        seq.sort()
        acc = seq[0][2]
        for _, _, v in seq[1:]:
            acc = (acc + v) / 2
        r = rows[uid]
        assert r.n_events == len(seq)
        assert r.ewma_level == acc, uid


def test_mad_is_robust_median_of_deviations(spark, qs):
    """MAD equals the discrete median of |x - median| replayed in
    Python, and both returned values are actual data(-derived)
    elements."""
    import math

    out = {r.l_returnflag: r for r in qs["op_median_absolute_deviation"](
        spark, SF_DIR
    ).collect()}
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    groups: dict[str, list[float]] = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    for flag, vals in groups.items():
        vals.sort()
        med = vals[math.ceil(0.5 * len(vals)) - 1]
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[math.ceil(0.5 * len(devs)) - 1]
        r = out[flag]
        assert r.median_price == med
        assert r.mad_price == mad


def test_minhash_estimate_properties(spark, qs):
    """est = matches/16 exactly; the estimator is unbiased enough on this
    fixture that mean |est - exact| over candidate pairs stays under
    2 stderr; verified pairs (exact >= 0.6) all have high estimates."""
    rows = qs["dedup_minhash_estimate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.jaccard_est == r.n_sig_matches / 16
        assert 0.0 <= r.jaccard_exact <= 1.0
    errs = [abs(r.jaccard_est - r.jaccard_exact) for r in rows]
    # stderr at J~0.6 with 16 hashes is ~0.12; the MEAN abs error over
    # pairs should sit well inside it
    assert sum(errs) / len(errs) < 0.15, sum(errs) / len(errs)


def test_forecast_backtest_no_leakage_replica(spark, qs):
    """Replay per user: the held-out point never enters either
    predictor; EWMA prefix fold is bit-exact."""
    rows = {r.user_id: r for r in qs["ev_forecast_backtest"](spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    seqs: dict[int, list] = {}
    for e in ev:
        seqs.setdefault(e.user_id, []).append((e.ts, e.event_id, e.value))
    for uid, seq in seqs.items():
        seq.sort()
        if len(seq) < 2:
            assert uid not in rows
            continue
        vals = [v for _, _, v in seq]
        acc = vals[0]
        for v in vals[1:-1]:
            acc = (acc + v) / 2
        r = rows[uid]
        assert r.actual == vals[-1]
        assert r.pred_naive == vals[-2]
        assert r.pred_ewma == acc
        assert r.err_naive == abs(vals[-1] - vals[-2])
        assert r.err_ewma == abs(vals[-1] - acc)


def test_scd3_prior_value_semantics(spark, qs):
    """One row per customer; prior is the second-latest status or NULL
    for single-version customers — replayed from raw orders."""
    rows = {r.cust: r for r in qs["wh_scd3_prior_value"](spark, SF_DIR).collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    hist: dict[int, list] = {}
    for r in o:
        hist.setdefault(r.o_custkey, []).append(
            (r.o_orderdate, r.o_orderkey, r.o_orderstatus)
        )
    assert len(rows) == len(hist)
    for cust, versions in hist.items():
        versions.sort(reverse=True)
        r = rows[cust]
        assert r.current_status == versions[0][2]
        assert r.version_key == versions[0][1]
        want_prior = versions[1][2] if len(versions) > 1 else None
        assert r.prior_status == want_prior, cust


def test_window_nth_value_frame_semantics(spark, qs):
    """nth_value(2) is NULL on each partition's first row and constant
    afterwards; last_value over the full frame equals the partition's
    final price on every row."""
    rows = qs["op_window_nth_value"](spark, SF_DIR).collect()
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r.o_custkey].append(r)
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    hist = defaultdict(list)
    for r in o:
        hist[r.o_custkey].append((r.o_orderdate, r.o_orderkey, r.o_totalprice))
    for cust, rs in per.items():
        seq = sorted(hist[cust])
        by_key = {r.o_orderkey: r for r in rs}
        ordered = [by_key[k] for _, k, _ in seq]
        assert ordered[0].second_price is None
        if len(seq) > 1:
            assert all(r.second_price == seq[1][2] for r in ordered[1:])
        assert all(r.first_price == seq[0][2] for r in ordered)
        assert all(r.final_price == seq[-1][2] for r in ordered)
