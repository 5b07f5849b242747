"""Similarity-search properties: exactness of the Pandas-UDF path and
recall of the approximate (LSH) path vs the brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.functions.vector import cosine_similarity
from data_pipeline_4_online_retail_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


def test_pandas_udf_topk_equals_builtin(spark):
    builtin = [tuple(r) for r in S.sim_topk_bruteforce(spark, SF_DIR).collect()]
    arrow = [tuple(r) for r in S.sim_topk_pandas_udf(spark, SF_DIR).collect()]
    assert builtin == arrow


def test_lsh_recall_and_scan_fraction(spark, catalog):
    """Query-directed multi-probe LSH (18 tables x 12 bits, 5 flip bits)
    must beat the r1 exact-probe scheme on BOTH axes: measured at this
    fixture, recall 7/10 (was 4/10) while scoring 17.8% of the corpus
    (was 20.4%). Everything is deterministic (LCG hyperplanes, fixed
    data), so the floors are tight."""
    exact = [r["vec_id"] for r in S.sim_topk_bruteforce(spark, SF_DIR).collect()]
    lsh = {r["vec_id"] for r in S.sim_ann_lsh(spark, SF_DIR).collect()}
    assert lsh, "LSH returned no candidates"
    # recall floor raised with directed multi-probe (was >= 3 pre-r2)
    assert len(set(exact) & lsh) >= 6, (exact, lsh)
    emb = catalog.table("embeddings")
    n_scored = S.lsh_candidates(emb).count()
    n_corpus = emb.count() - 1
    # scan-fraction bound TIGHTENED vs the old ~20% exact-probe scheme
    assert n_scored / n_corpus <= 0.20, (n_scored, n_corpus)


def test_ivf_subset_of_cell(spark, catalog):
    out = S.sim_ann_ivf(spark, SF_DIR).collect()
    qlabel = (
        catalog.table("embeddings")
        .filter(F.col("vec_id") == S.QUERY_VEC_ID)
        .head()["label"]
    )
    assert out and all(r["label"] == qlabel for r in out)


def test_kmeans_matches_exact_replica(spark):
    """Replays Lloyd k-means in pure Python with the SAME float semantics
    as the Spark operator: left-to-right double folds for distances,
    engine-mirrored nano-unit means for the update (r8 — see
    functions/vector.nano_units), first-min-wins argmin — assignments
    must match exactly, not approximately."""
    from data_pipeline_4_online_retail_spark.functions.vector import (
        nano_units_py,
    )

    sf = "/root/testdata/sf0.001"
    from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

    rows = (
        load_tables(spark, sf)
        .table("embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def sq_dist(v, c):
        acc = 0.0
        for x, y in zip(v, c):
            acc = acc + (x - y) * (x - y)
        return acc

    def assign(v, centroids):
        d = [sq_dist(v, c) for c in centroids]
        m = min(d)
        return d.index(m)

    centroids = [vecs[i] for i in sorted(vecs)[: S.KMEANS_K]]
    for _ in range(S.KMEANS_ITERS):
        groups: dict[int, list] = {}
        for vid in vecs:
            groups.setdefault(assign(vecs[vid], centroids), []).append(vid)
        new_c = [list(c) for c in centroids]
        for cid, members in groups.items():
            dim = len(centroids[0])
            comp = []
            for d in range(dim):
                s = sum(nano_units_py(vecs[m][d]) for m in members)
                comp.append(float(s) / 1e9 / len(members))
            new_c[cid] = comp
        centroids = new_c

    expected = {vid: assign(v, centroids) for vid, v in vecs.items()}
    got = {r.vec_id: r.cluster_id for r in S.sim_kmeans(spark, sf).collect()}
    assert got == expected
    assert len(set(got.values())) > 1


def test_emb_vec_forms_match_exploded(spark):
    """The array-native builders (emb_*_vec) and the driver-facing
    exploded forms must carry identical values; the exploded row count is
    exactly n_vectors x dim."""
    vec = {
        (r.vec_id, i): (r.norm, u)
        for r in S.emb_l2_normalize_vec(spark, SF_DIR).collect()
        for i, u in enumerate(r.unit)
    }
    flat = {
        (r.vec_id, r.dim_idx): (r.norm, r.unit_val)
        for r in S.emb_l2_normalize(spark, SF_DIR).collect()
    }
    assert vec == flat and vec

    qvec = {
        (r.vec_id, i): (r.scale, q)
        for r in S.emb_quantize_int8_vec(spark, SF_DIR).collect()
        for i, q in enumerate(r.q)
    }
    qflat = {
        (r.vec_id, r.dim_idx): (r.scale, r.q_val)
        for r in S.emb_quantize_int8(spark, SF_DIR).collect()
    }
    assert qvec == qflat and qvec
    # unit vectors actually have norm 1 (within float tolerance)
    for r in S.emb_l2_normalize_vec(spark, SF_DIR).limit(50).collect():
        assert abs(sum(u * u for u in r.unit) - 1.0) < 1e-9
    # quantized components are clamped int8-symmetric
    assert all(-127 <= v[1] <= 127 for v in qvec.values())


def test_kmeans_assign_udf_matches_expr(spark):
    """The Arrow assignment twin must be BIT-IDENTICAL to the built-in
    HOF expression on real data (same fold order, same first-min tie
    rule) — this is what licenses the fast path inside sim_kmeans."""
    sf = "/root/testdata/sf0.001"
    from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

    e = load_tables(spark, sf).table("embeddings").select("vec_id", "embedding")
    seed = e.orderBy("vec_id").limit(S.KMEANS_K).collect()
    centroids = [[float(x) for x in r.embedding] for r in seed]
    via_expr = {
        r.vec_id: r.c
        for r in S._with_centroids(e, centroids)
        .select("vec_id", S._assign_expr().alias("c"))
        .collect()
    }
    via_udf = {
        r.vec_id: r.c
        for r in e.select(
            "vec_id", S._assign_pandas_udf(centroids)("embedding").alias("c")
        ).collect()
    }
    assert via_expr == via_udf


def test_lsh_oracle_planes_bit_exact():
    """The DuckDB recursive-CTE LCG inside _lsh_oracle must reproduce
    _hyperplanes() BIT-exactly — the whole promotion (VERDICT r5 item 5)
    rests on both engines hashing the same sign bits. Checks every one of
    the 216x64 plane weights, not a sample."""
    import duckdb

    n_planes = S.N_TABLES * S.K_BITS
    dim = 64
    planes = S._hyperplanes(dim, n_planes)
    rows = duckdb.sql(
        f"""
        WITH RECURSIVE lcg AS (
            SELECT 0 AS i, CAST(42 AS HUGEINT) AS state
            UNION ALL
            SELECT i + 1,
                   (state * 6364136223846793005 + 1442695040888963407)
                       % 18446744073709551616
            FROM lcg WHERE i < {n_planes * dim}
        )
        SELECT CAST((i - 1) // {dim} AS INT) AS p,
               CAST((i - 1) % {dim} AS INT) AS d,
               (CAST(state // 2048 AS DOUBLE) / 9007199254740992.0) * 2.0
                   - 1.0 AS w
        FROM lcg WHERE i >= 1
        """
    ).fetchall()
    assert len(rows) == n_planes * dim
    for p, d, w in rows:
        assert planes[p][d] == w  # exact float equality, no tolerance


def test_lsh_query_returns_topk_rows(spark):
    got = S.sim_ann_lsh(spark, SF_DIR).collect()
    assert len(got) == S.TOP_K
    assert len({r.vec_id for r in got}) == S.TOP_K
