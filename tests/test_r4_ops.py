"""Round-4 operator tests: temperature sampling, repeated-span removal,
per-source caps, within-label semantic dedup, PCA projection."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_temperature_sample_math_replica(spark, catalog):
    """Exact replica: q_l = sqrt(n_l) / sum_m sqrt(n_m), boost = q_l/p_l."""
    from data_pipeline_4_online_retail_spark.operators.curation import (
        text_temperature_sample,
    )

    got = {r.lang: r for r in text_temperature_sample(spark, SF_DIR).collect()}
    counts = {
        r.lang: r.n
        for r in catalog.table("documents").groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    n_total = sum(counts.values())
    denom = sum(math.sqrt(n) for n in counts.values())
    assert set(got) == set(counts)
    for lang, n in counts.items():
        q = math.sqrt(n) / denom
        assert got[lang].n_docs == n
        assert abs(got[lang].sample_prob - q) < 1e-9
        assert abs(got[lang].boost - q * n_total / n) < 1e-9
    # probabilities normalize; low-resource langs get boosted above 1
    assert abs(sum(r.sample_prob for r in got.values()) - 1.0) < 1e-9
    rarest = min(counts, key=counts.get)
    commonest = max(counts, key=counts.get)
    if counts[rarest] < counts[commonest]:
        assert got[rarest].boost > 1.0 > got[commonest].boost


def test_dup_span_removal_properties(spark, catalog):
    """Kept+dropped spans = ceil(n_tokens/10) per doc; clean_text is the
    in-order concatenation of that doc's globally-unique spans; at least
    one span is dropped corpus-wide (the fixture's small vocabulary
    guarantees repeated 10-grams)."""
    from data_pipeline_4_online_retail_spark.operators.curation import (
        SPAN_WORDS,
        text_dup_span_removal,
    )

    out = {r.doc_id: r for r in text_dup_span_removal(spark, SF_DIR).collect()}
    docs = {
        r.doc_id: r.text for r in catalog.table("documents").collect()
    }
    assert set(out) == set(docs)
    assert sum(r.n_spans_dropped for r in out.values()) > 0
    # python replica of the global span count
    from collections import Counter

    span_count: Counter = Counter()
    spans_by_doc = {}
    for doc_id, text in docs.items():
        toks = text.split(" ")
        spans = [
            " ".join(toks[i : i + SPAN_WORDS])
            for i in range(0, len(toks), SPAN_WORDS)
        ]
        spans_by_doc[doc_id] = spans
        span_count.update(spans)
    for doc_id, spans in spans_by_doc.items():
        kept = [s for s in spans if span_count[s] == 1]
        r = out[doc_id]
        assert r.n_spans_kept == len(kept), doc_id
        assert r.n_spans_dropped == len(spans) - len(kept), doc_id
        assert r.clean_text == " ".join(kept), doc_id


def test_source_cap_bounds_and_determinism(spark, catalog):
    from data_pipeline_4_online_retail_spark.operators.curation import (
        SOURCE_CAP,
        text_source_cap,
    )

    out = text_source_cap(spark, SF_DIR)
    per_source = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r.source: r.n
        for r in catalog.table("documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for src, n in per_source.items():
        assert n == min(SOURCE_CAP, totals[src]), src
    # deterministic: two runs produce the identical kept set
    a = sorted((r.doc_id, r.keep_rank) for r in out.collect())
    b = sorted((r.doc_id, r.keep_rank) for r in text_source_cap(spark, SF_DIR).collect())
    assert a == b


def test_semantic_within_label_is_restricted_cosine_dedup(spark, catalog):
    """Within-label pairs == the O(n^2) baseline's pairs filtered to
    same-label — and the plan must be an equi-join on label (co-located
    hash/merge join), never a nested-loop cross product."""
    from data_pipeline_4_online_retail_spark.operators.dedup import (
        dedup_embedding_cosine,
        dedup_semantic_within_label,
    )

    got = sorted(
        (r.vec_a, r.vec_b)
        for r in dedup_semantic_within_label(spark, SF_DIR).collect()
    )
    labels = {
        r.vec_id: r.label for r in catalog.table("embeddings").collect()
    }
    baseline = sorted(
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_cosine(spark, SF_DIR).collect()
        if labels[r.vec_a] == labels[r.vec_b]
    )
    assert got == baseline
    plan = dedup_semantic_within_label(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_pca_matches_numpy_eigh(spark, catalog):
    """MLlib PCA == numpy covariance eigendecomposition, up to per-
    component sign: eigenvalue spectrum agrees, and each component's
    projection matches after sign alignment."""
    from data_pipeline_4_online_retail_spark.operators.similarity import (
        PCA_K,
        emb_pca_project,
    )

    rows = catalog.table("embeddings").select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    cov = np.cov(X, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:PCA_K]
    W = evecs[:, order]  # d x k
    expected = X @ W  # MLlib projects UNcentered rows onto components

    got = emb_pca_project(spark, SF_DIR).collect()
    proj = np.zeros((len(ids), PCA_K))
    idx = {v: i for i, v in enumerate(ids)}
    for r in got:
        proj[idx[r.vec_id], r.component] = r.value

    # eigenvalues must be distinct for a stable component order
    lam = evals[order]
    assert np.all(np.diff(lam) < -1e-9)
    for k in range(PCA_K):
        a, b = proj[:, k], expected[:, k]
        sign = 1.0 if abs(a @ b) == a @ b else -1.0
        assert np.allclose(a, sign * b, atol=1e-6), f"component {k}"


def test_resample_interpolate_linear_midpoints(spark):
    """Interpolated days lie on the line between flanking known days, and
    known days pass through untouched."""
    from data_pipeline_4_online_retail_spark.operators.events_windows import (
        ev_resample_interpolate,
    )

    rows = ev_resample_interpolate(spark, SF_DIR).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    n_interp = 0
    for series in by_user.values():
        series.sort(key=lambda r: r.day)
        known = [(i, r.value_interp) for i, r in enumerate(series) if not r.interpolated]
        # endpoints are always known
        assert not series[0].interpolated and not series[-1].interpolated
        import bisect

        kidx = [i for i, _ in known]
        for i, r in enumerate(series):
            if r.interpolated:
                n_interp += 1
                j = bisect.bisect_left(kidx, i)
                i0, v0 = known[j - 1]
                i1, v1 = known[j]
                expect = v0 + (v1 - v0) * ((i - i0) / (i1 - i0))
                assert abs(r.value_interp - expect) < 1e-9
    assert n_interp > 0  # the fixture actually has gaps


def test_snapshot_diff_classes(spark, catalog):
    """added/removed/changed classes are exactly the modular-filter
    expectation; unchanged rows never appear."""
    from data_pipeline_4_online_retail_spark.operators.warehouse import (
        wh_snapshot_diff,
    )

    out = list(wh_snapshot_diff(spark, SF_DIR).collect())
    orders = {
        r.o_orderkey: r.o_orderstatus
        for r in catalog.table("orders")
        .select("o_orderkey", "o_orderstatus")
        .collect()
    }
    expected = {}
    for k, status in orders.items():
        in_old = k % 4 != 0
        in_new = k % 5 != 0
        new_status = "X" if k % 3 == 0 else status
        if in_old and not in_new:
            expected[k] = "removed"
        elif in_new and not in_old:
            expected[k] = "added"
        elif in_old and in_new and status != new_status:
            expected[k] = "changed"
    got = {r.o_orderkey: r.change_type for r in out}
    assert got == expected
    assert {"added", "removed", "changed"} <= set(got.values())


def test_dup_span_keep_first_canonical_copy_survives(spark, catalog):
    """Keep-first: exactly one occurrence of every distinct span survives
    corpus-wide, and the survivor is the lowest (doc_id, span_id)."""
    from collections import Counter

    from data_pipeline_4_online_retail_spark.operators.curation import (
        SPAN_WORDS,
        text_dup_span_keep_first,
    )

    out = {r.doc_id: r for r in text_dup_span_keep_first(spark, SF_DIR).collect()}
    docs = {r.doc_id: r.text for r in catalog.table("documents").collect()}
    first_owner: dict = {}
    n_spans_total = 0
    for doc_id in sorted(docs):
        toks = docs[doc_id].split(" ")
        for sid in range(0, len(toks), SPAN_WORDS):
            s = " ".join(toks[sid : sid + SPAN_WORDS])
            first_owner.setdefault(s, (doc_id, sid // SPAN_WORDS))
            n_spans_total += 1
    kept_total = sum(r.n_spans_kept for r in out.values())
    assert kept_total == len(first_owner)  # one survivor per distinct span
    assert sum(r.n_spans_dropped for r in out.values()) == n_spans_total - kept_total
    # per-doc: kept spans are exactly those whose first owner is this doc
    own_count = Counter(d for d, _ in first_owner.values())
    for doc_id, r in out.items():
        assert r.n_spans_kept == own_count.get(doc_id, 0), doc_id


def test_pq_encode_matches_exact_replica(spark, catalog):
    """Bit-exact Python replay of PQ training + encoding (same float
    semantics as sim_kmeans' replica: left-to-right folds,
    engine-mirrored nano-unit update means (r8), first-min-wins
    argmin)."""
    from data_pipeline_4_online_retail_spark.functions.vector import (
        nano_units_py,
    )
    from data_pipeline_4_online_retail_spark.operators.similarity import (
        PQ_ITERS,
        PQ_K,
        PQ_M,
        sim_pq_encode,
    )

    rows = catalog.table("embeddings").select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    dim = len(next(iter(vecs.values())))
    sub = dim // PQ_M

    def sq_dist(v, c):
        acc = 0.0
        for x, y in zip(v, c):
            acc = acc + (x - y) * (x - y)
        return acc

    def assign(v, books):
        d = [sq_dist(v, c) for c in books]
        return d.index(min(d))

    seed_ids = sorted(vecs)[:PQ_K]
    cb = [
        [vecs[i][m * sub : (m + 1) * sub] for i in seed_ids]
        for m in range(PQ_M)
    ]
    for _ in range(PQ_ITERS):
        groups: dict = {}
        for vid, v in vecs.items():
            for m in range(PQ_M):
                code = assign(v[m * sub : (m + 1) * sub], cb[m])
                groups.setdefault((m, code), []).append(vid)
        new_cb = [[list(c) for c in books] for books in cb]
        for (m, code), members in groups.items():
            comp = []
            for d in range(sub):
                ssum = sum(
                    nano_units_py(vecs[vid][m * sub + d]) for vid in members
                )
                comp.append(float(ssum) / 1e9 / len(members))
            new_cb[m][code] = comp
        cb = new_cb

    expected = {
        (vid, m): assign(v[m * sub : (m + 1) * sub], cb[m])
        for vid, v in vecs.items()
        for m in range(PQ_M)
    }
    got = {
        (r.vec_id, r.m): r.code for r in sim_pq_encode(spark, SF_DIR).collect()
    }
    assert got == expected
    # codes actually spread across the codebook
    assert len(set(got.values())) > PQ_K // 2


def test_pq_adc_approximates_true_distance(spark, catalog):
    """ADC approximate distances must correlate with true L2 (the fixture
    is uniform random, where top-10 recall is expectedly poor — distances
    concentrate — so the pinned contract is rank correlation plus the
    ADC top-10 landing in the true near-neighborhood)."""
    import numpy as np

    from data_pipeline_4_online_retail_spark.operators.similarity import (
        QUERY_VEC_ID,
        sim_ann_pq_adc,
    )

    rows = catalog.table("embeddings").select("vec_id", "embedding").collect()
    X = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    q = X[QUERY_VEC_ID]
    true_d = {
        v: float(((x - q) ** 2).sum()) for v, x in X.items() if v != QUERY_VEC_ID
    }
    out = sim_ann_pq_adc(spark, SF_DIR).collect()
    assert len(out) == 10
    # ADC top-10 sits in the better half of the true-distance ranking,
    # well inside the top-50 neighborhood for most entries
    ranked = sorted(true_d, key=true_d.get)
    top50 = set(ranked[:50])
    assert sum(1 for r in out if r.vec_id in top50) >= 4
    median = true_d[ranked[len(ranked) // 2]]
    assert sum(1 for r in out if true_d[r.vec_id] < median) >= 8


def test_temperature_resample_copy_counts(spark, catalog):
    """Exact replica of the copy-count rule: floor(boost) + (md5-frac <
    frac(boost)); per-language totals match, and the direction is right
    (rare languages end up relatively upsampled)."""
    import hashlib

    from data_pipeline_4_online_retail_spark.operators.curation import (
        text_temperature_resample,
    )

    out = text_temperature_resample(spark, SF_DIR).collect()
    docs = {
        r.doc_id: r.lang for r in catalog.table("documents").collect()
    }
    counts: dict = {}
    for lang in docs.values():
        counts[lang] = counts.get(lang, 0) + 1
    n_total = sum(counts.values())
    denom = sum(math.sqrt(n) for n in counts.values())
    boost = {
        lang: (math.sqrt(n) / denom) * n_total / n for lang, n in counts.items()
    }

    def hash_frac(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) / 2**32

    expected: dict = {}
    for doc_id, lang in docs.items():
        b = boost[lang]
        n = int(math.floor(b)) + (1 if hash_frac(doc_id) < b - math.floor(b) else 0)
        if n >= 1:
            expected[doc_id] = n
    got: dict = {}
    for r in out:
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
        assert 1 <= r.copy_idx <= expected[r.doc_id]
    assert got == expected
    # direction: the rarest language's copies/doc exceeds the commonest's
    per_lang: dict = {}
    for r in out:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    rare = min(counts, key=counts.get)
    common = max(counts, key=counts.get)
    assert per_lang[rare] / counts[rare] > per_lang[common] / counts[common]


def test_markov_transitions_rows_normalize(spark, catalog):
    """Each from-state's outgoing probabilities sum to 1; counts replay
    a pure-Python walk of the per-user (ts, event_id)-ordered streams."""
    from collections import Counter

    from data_pipeline_4_online_retail_spark.operators.events_windows import (
        ev_markov_transitions,
    )

    out = list(ev_markov_transitions(spark, SF_DIR).collect())
    by_from: dict = {}
    for r in out:
        by_from.setdefault(r.from_type, []).append(r)
    for rs in by_from.values():
        assert abs(sum(r.p_transition for r in rs) - 1.0) < 1e-9
    ev = sorted(
        catalog.table("events").select("user_id", "ts", "event_id", "event_type").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    expected: Counter = Counter()
    for a, b in zip(ev, ev[1:]):
        if a.user_id == b.user_id:
            expected[(a.event_type, b.event_type)] += 1
    assert {(r.from_type, r.to_type): r.n for r in out} == dict(expected)


def test_anomaly_zscore_replica(spark, catalog):
    """z-scores replay exactly from per-user daily counts; flags match
    |z| > 2; zero-variance users are excluded."""
    import math as m
    from collections import Counter

    from data_pipeline_4_online_retail_spark.operators.events_windows import (
        ev_anomaly_zscore,
    )

    daily: Counter = Counter()
    for r in catalog.table("events").select("user_id", F.col("ts").cast("date").alias("day")).collect():
        daily[(r.user_id, r.day)] += 1
    by_user: dict = {}
    for (u, day), n in daily.items():
        by_user.setdefault(u, {})[day] = n
    out = {(r.user_id, r.day): r for r in ev_anomaly_zscore(spark, SF_DIR).collect()}
    n_checked = 0
    for u, days in by_user.items():
        ns = list(days.values())
        mean = sum(ns) / len(ns)
        var = sum(x * x for x in ns) / len(ns) - mean * mean
        if var <= 0:
            assert not any((u, d) in out for d in days)
            continue
        for d, n in days.items():
            r = out[(u, d)]
            z = (n - mean) / m.sqrt(var)
            assert abs(r.zscore - z) < 1e-9
            assert r.is_anomaly == (1 if abs(z) > 2.0 else 0)
            n_checked += 1
    assert n_checked > 0 and any(r.is_anomaly for r in out.values())


def test_ngram_novelty_bounds_and_first_doc(spark, catalog):
    """novelty_frac in (0, 1]; the lowest doc_id scores exactly 1.0 (all
    its grams are first-seen); replica agrees on n_novel."""
    from data_pipeline_4_online_retail_spark.operators.text_analysis import (
        text_ngram_novelty,
    )

    out = {r.doc_id: r for r in text_ngram_novelty(spark, SF_DIR).collect()}
    docs = {r.doc_id: r.text.split(" ") for r in catalog.table("documents").collect()}
    first_seen: dict = {}
    grams_of: dict = {}
    for doc_id in sorted(docs):
        toks = docs[doc_id]
        gs = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        grams_of[doc_id] = gs
        for g in gs:
            first_seen.setdefault(g, doc_id)
    for doc_id, gs in grams_of.items():
        if not gs:
            assert doc_id not in out
            continue
        r = out[doc_id]
        n_novel = sum(1 for g in gs if first_seen[g] == doc_id)
        assert r.n_grams == len(gs) and r.n_novel == n_novel, doc_id
        assert 0 < r.novelty_frac <= 1.0 or n_novel == 0
    assert out[min(docs)].novelty_frac == 1.0


def test_bpe_train_and_apply_algebra():
    """Pure-Python BPE kernel: merges learned on a toy vocab follow the
    max-count/lexicographic-tie rule and application reproduces the
    classic example."""
    from data_pipeline_4_online_retail_spark.operators.text_analysis import (
        apply_bpe,
        train_bpe_merges,
    )

    # Sennrich-style toy: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_merges(wc, n_merges=4)
    # 'es' (9) then 'est' (9) dominate, then 'lo' (7), then 'low' (7)
    assert merges[:4] == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    assert apply_bpe("newest", merges) == ["n", "e", "w", "est"]
    assert apply_bpe("lowest", merges) == ["low", "est"]
    assert apply_bpe("low", merges) == ["low"]


def test_bpe_apply_operator_consistency(spark, catalog):
    """Spark-side application: token counts bounded by chars and words,
    deterministic across runs, and chars_per_token >= 1."""
    from data_pipeline_4_online_retail_spark.operators.text_analysis import (
        text_bpe_apply,
    )

    out = {r.doc_id: r for r in text_bpe_apply(spark, SF_DIR).collect()}
    docs = {r.doc_id: r.text.split(" ") for r in catalog.table("documents").collect()}
    assert set(out) == set(docs)
    for doc_id, toks in docs.items():
        r = out[doc_id]
        assert r.n_words == len(toks)
        total_chars = sum(len(w) for w in toks)
        assert r.n_words <= r.n_bpe_tokens <= total_chars
        assert r.chars_per_token >= 1.0
    again = {r.doc_id: r.n_bpe_tokens for r in text_bpe_apply(spark, SF_DIR).collect()}
    assert again == {k: r.n_bpe_tokens for k, r in out.items()}
    # merges actually compress: some doc has fewer tokens than chars
    assert any(
        r.n_bpe_tokens < sum(len(w) for w in docs[d]) for d, r in out.items()
    )


def test_ivf_pq_is_pq_restricted_to_query_cell(spark, catalog):
    """IVF+PQ == the global ADC ranking restricted to the query's label
    cell (same codebooks, same distance table) — composition, verified
    by replaying ADC over the cell members in Python."""
    import numpy as np

    from data_pipeline_4_online_retail_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        QUERY_VEC_ID,
        TOP_K,
        sim_ann_ivf_pq,
        train_pq_codebooks,
    )

    rows = catalog.table("embeddings").collect()
    X = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    labels = {r.vec_id: r.label for r in rows}
    q, qlabel = X[QUERY_VEC_ID], labels[QUERY_VEC_ID]
    dim = len(q)
    sub = dim // PQ_M
    cb = train_pq_codebooks(catalog.table("embeddings"), dim)
    CB = [np.array(cb[m]) for m in range(PQ_M)]

    def adc(x):
        d = 0.0
        for m in range(PQ_M):
            sv = x[m * sub : (m + 1) * sub]
            dists = ((CB[m] - sv) ** 2).sum(axis=1)
            code = int(np.argmin(dists))
            d += float(((q[m * sub : (m + 1) * sub] - CB[m][code]) ** 2).sum())
        return d

    expected = sorted(
        ((adc(x), v) for v, x in X.items()
         if labels[v] == qlabel and v != QUERY_VEC_ID)
    )[:TOP_K]
    got = [(r.approx_l2, r.vec_id) for r in sim_ann_ivf_pq(spark, SF_DIR).collect()]
    assert [v for _, v in got] == [v for _, v in expected]
    for (ga, _), (ea, _) in zip(got, expected):
        assert abs(ga - ea) < 1e-9
    # every returned candidate is in the query's cell
    assert all(labels[v] == qlabel for _, v in got)


def test_dsir_matches_python_replica(spark, catalog):
    """Pure-Python replay of the DSIR hashed-feature model: identical
    md5-mod buckets, identical integer masses, log-weights within libm
    tolerance — and the selection signal points at the target domain."""
    import hashlib
    import math
    from collections import Counter

    from data_pipeline_4_online_retail_spark.operators.text_analysis import (
        _DSIR_B,
        text_dsir_stats,
        text_dsir_weights,
    )

    docs = [
        (r.doc_id, r.source, r.text.split(" "))
        for r in catalog.table("documents").collect()
    ]

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % _DSIR_B

    raw: Counter = Counter()
    tgt: Counter = Counter()
    for _, source, toks in docs:
        for t in toks:
            b = bucket(t)
            raw[b] += 1
            if source == "src0":
                tgt[b] += 1
    T, R = sum(tgt.values()), sum(raw.values())

    stats = {r.doc_id: r for r in text_dsir_stats(spark, SF_DIR).collect()}
    weights = {r.doc_id: r for r in text_dsir_weights(spark, SF_DIR).collect()}
    assert set(stats) == set(weights) == {d for d, _, _ in docs}

    src_mean: dict[str, list[float]] = {}
    for doc_id, source, toks in docs:
        bs = [bucket(t) for t in toks]
        s = stats[doc_id]
        assert s.n_toks == len(toks)
        assert s.target_mass == sum(tgt.get(b, 0) for b in bs)
        assert s.raw_mass == sum(raw[b] for b in bs)
        lw = sum(
            math.log(tgt.get(b, 0) + 1)
            - math.log(T + _DSIR_B)
            - math.log(raw[b] + 1)
            + math.log(R + _DSIR_B)
            for b in bs
        )
        w = weights[doc_id]
        assert w.n_toks == len(toks)
        # registered output is quantized (ROUND 4dp, oracle contract)
        assert abs(w.log_weight_q4 - lw) < 5.1e-5 + 1e-9 * abs(lw)
        src_mean.setdefault(source, []).append(lw)
    # (no semantic assert on the sf corpus: every synthetic source draws
    # from the SAME vocabulary, so there is no domain signal — the
    # controlled-corpus test below carries that claim)


def test_dsir_signal_separates_domains(spark, tmp_path_factory):
    """On a corpus with a REAL domain split, target-domain documents
    must receive the highest importance weights."""
    from data_pipeline_4_online_retail_spark.operators.text_analysis import (
        text_dsir_weights,
    )

    sf_dir = str(tmp_path_factory.mktemp("dsir_sf"))
    rows = []
    for i in range(10):
        rows.append((i, "physics quantum field theory lattice gauge", "src0"))
    for i in range(10, 30):
        rows.append((i, "cheap deals buy now limited offer sale", "srcX"))
    # one mixed doc: half target vocabulary
    rows.append((30, "physics quantum buy now sale offer", "srcX"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    w = {r.doc_id: r.log_weight_q4 for r in text_dsir_weights(spark, sf_dir).collect()}
    tgt_mean = sum(w[i] for i in range(10)) / 10
    off_mean = sum(w[i] for i in range(10, 30)) / 20
    assert tgt_mean > w[30] > off_mean, (tgt_mean, w[30], off_mean)
