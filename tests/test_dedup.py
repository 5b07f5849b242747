"""Dedup operator properties not covered by the DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _jaccard_pairs,
    exploded_shingles,
    lsh_candidate_pairs,
    minhash_signature_md5,
    minhash_signature_xxhash64,
    simhash64,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted((r["doc_a"], r["doc_b"]) for r in df.collect())


def test_xxhash_minhash_matches_md5_minhash(spark, catalog):
    """The production (xxhash64) and oracle (md5) signatures are different
    hash families over the same geometry — after exact-Jaccard
    verification both pipelines must converge on the same pair set
    (modulo LSH recall; assert the verified outputs agree)."""
    sh = exploded_shingles(catalog.table("documents"))
    verified = _jaccard_pairs(sh, JACCARD_THRESHOLD)

    md5_pairs = lsh_candidate_pairs(minhash_signature_md5(sh)).join(
        verified, ["doc_a", "doc_b"], "left_semi"
    )
    xx_pairs = lsh_candidate_pairs(minhash_signature_xxhash64(sh)).join(
        verified, ["doc_a", "doc_b"], "left_semi"
    )
    exact = set(_pairs(verified))
    assert set(_pairs(md5_pairs)) <= exact
    assert set(_pairs(xx_pairs)) <= exact
    if exact:
        # LSH at 8 bands × 2 rows has ≥97% recall at J=0.6 per pair
        assert len(_pairs(xx_pairs)) >= 0.5 * len(exact)


def test_simhash_is_deterministic_and_near_dups_close(spark, catalog):
    sh = exploded_shingles(catalog.table("documents"))
    fp1 = {r["doc_id"]: r["simhash"] for r in simhash64(sh).collect()}
    fp2 = {r["doc_id"]: r["simhash"] for r in simhash64(sh).collect()}
    assert fp1 == fp2
    # near-dup pairs (exact jaccard) should have small hamming distance
    verified = _pairs(_jaccard_pairs(sh, JACCARD_THRESHOLD))
    for a, b in verified:
        hamming = bin((fp1[a] ^ fp1[b]) & ((1 << 64) - 1)).count("1")
        assert hamming <= 16, (a, b, hamming)
