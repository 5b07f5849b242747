"""Executable margin guards for the float-anchored oracle promotions
(ADVICE r7 items 1 and 4).

Both the pagerank and the SemDeDup-gemm promotions rest on a measured
numeric margin: cross-engine drift (~1e-13, summation order / BLAS vs
fold) can only flip the hashed output if a value sits within drift of a
decision boundary (a 5e-7 rounding boundary for ROUND(rank*N, 6); the
0.4 cosine threshold for the dedup pair set). r7 measured those margins
by hand; these tests make the measurement an executable floor so a
future fixture or threshold change that erodes the margin fails loudly
instead of flaking the driver hash.

duckdb-side replicas keep the tests fast (no Spark jobs): the margin is
a property of the TRUE values, and the replica's own ~1e-13 drift is
orders of magnitude below every asserted floor.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from data_pipeline_4_online_retail_spark.operators.dedup import COSINE_THRESHOLD
from data_pipeline_4_online_retail_spark.operators.graph import DAMPING, N_ITER

SF_DIRS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
}


def _pagerank_x_n(sf_dir: str) -> np.ndarray:
    """rank * N after N_ITER damped power iterations — same edge
    probabilities as graph_pagerank_copurchase (exact integer w/out_w),
    dense numpy replica (node counts at these SFs are hundreds..2k)."""
    edges = duckdb.sql(
        f"""
        WITH basket AS (
            SELECT DISTINCT l_orderkey, l_partkey
            FROM '{sf_dir}/lineitem.parquet'),
        pairs AS (
            SELECT a.l_partkey AS src, b.l_partkey AS dst, COUNT(*) AS w
            FROM basket a JOIN basket b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
            GROUP BY 1, 2),
        outw AS (SELECT src, SUM(w) AS ow FROM pairs GROUP BY src)
        SELECT p.src, p.dst, CAST(p.w AS DOUBLE) / CAST(o.ow AS DOUBLE)
        FROM pairs p JOIN outw o ON p.src = o.src
        """
    ).fetchall()
    nodes = sorted({r[0] for r in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    m = np.zeros((n, n))
    for s, d, p in edges:
        m[idx[d], idx[s]] += p
    rank = np.full(n, 1.0 / n)
    base = (1.0 - DAMPING) / n
    for _ in range(N_ITER):
        rank = base + DAMPING * (m @ rank)
    return rank * n


@pytest.mark.parametrize("sf", list(SF_DIRS))
def test_pagerank_rounding_boundary_margin(sf):
    """Min distance of rank*N to a 5e-7 boundary of ROUND(·, 6) must
    dominate cross-engine drift. Measured r8: 2.0e-9 (sf0.001, n=200),
    1.9e-10 (sf0.01, n=2000) vs ~1e-13 drift; floors sit ~10x below the
    measurements and ~1000x above the drift. The expected min margin of
    n uniform values is 5e-7/n, so the floor scales with the fixture."""
    v = _pagerank_x_n(SF_DIRS[sf])
    scaled = v * 1e6
    margin = float(np.abs(scaled - np.floor(scaled) - 0.5).min()) * 1e-6
    floor = {"sf0.001": 2e-10, "sf0.01": 2e-11}[sf]
    assert margin > floor, f"{sf}: boundary margin {margin:.3e} <= {floor:.0e}"


@pytest.mark.parametrize("sf", list(SF_DIRS))
def test_semantic_dedup_threshold_margin(sf):
    """Min |cosine - COSINE_THRESHOLD| over every within-label pair must
    stay above 1e-6 (ADVICE r7 item 4's suggested floor): the gemm
    twin's oracle promotion hashes pair IDS whose membership can only
    flip if a pair's cosine sits within BLAS-vs-fold drift (~1e-13) of
    the threshold. Measured r8: 1.0e-3 (sf0.001), 1.7e-3 (sf0.01);
    sf0.1's 1.2e-4 is re-measured by tools/oracle sweeps, not here."""
    margin = duckdb.sql(
        f"""
        WITH e AS (SELECT * FROM '{SF_DIRS[sf]}/embeddings.parquet')
        SELECT MIN(ABS(list_cosine_similarity(a.embedding, b.embedding)
                       - {COSINE_THRESHOLD}))
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        """
    ).fetchone()[0]
    assert margin > 1e-6, f"{sf}: threshold margin {margin:.3e} <= 1e-6"
