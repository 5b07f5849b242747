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
