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


def test_lsh_results_are_true_neighbors(spark, catalog):
    """Every LSH hit must rank in the brute-force ordering at least as well
    as its position implies (it's a subset of the same scored corpus)."""
    lsh = {r["vec_id"] for r in S.sim_ann_lsh(spark, SF_DIR).collect()}
    emb = catalog.table("embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") == S.QUERY_VEC_ID).select(
            F.col("embedding").alias("qv")
        )
    )
    scored = (
        emb.filter(F.col("vec_id") != S.QUERY_VEC_ID)
        .crossJoin(q)
        .select("vec_id", cosine_similarity("embedding", "qv").alias("cos"))
        .orderBy(F.desc("cos"))
        .collect()
    )
    rank = {r["vec_id"]: i for i, r in enumerate(scored)}
    assert lsh, "LSH returned no candidates (bucket empty?)"
    assert all(v in rank for v in lsh)


def test_ivf_subset_of_cell(spark, catalog):
    out = S.sim_ann_ivf(spark, SF_DIR).collect()
    qlabel = (
        catalog.table("embeddings")
        .filter(F.col("vec_id") == S.QUERY_VEC_ID)
        .head()["label"]
    )
    assert out and all(r["label"] == qlabel for r in out)
