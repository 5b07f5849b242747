"""Vector similarity search over the ``embeddings`` table (array<float>).

Three tiers:
- brute-force cosine top-k (the exactness baseline; built-in higher-order
  functions, JVM-side),
- the same semantics through a vectorized Pandas UDF (Arrow batches +
  numpy BLAS — the faster path for high dimensions; identical results,
  same oracle),
- sub-quadratic approximate variants: IVF-style cell-pruned search and
  random-hyperplane LSH (rows-only / pytest-verified — sign bits near the
  hyperplane are float-rounding-sensitive, so no cross-engine hash).

Scale design: brute-force distributes as one broadcast of the query vector
and a per-partition scan (no shuffle until the final top-k merge, which
TakeOrderedAndProject does with per-partition heaps). IVF/LSH cut the
scanned fraction: the bucketing column becomes a partition/cluster key so
Catalyst prunes entire files at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_4_online_retail_spark.functions.vector import (
    NANO_MEAN_SQL,
    cosine_similarity,
    dot_product,
    l2_norm,
    nano_mean,
)
from data_pipeline_4_online_retail_spark.plans.registry import register
from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

QUERY_VEC_ID = 0
TOP_K = 10

_TOPK_ORACLE = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label
FROM embeddings, q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY list_cosine_similarity(embedding, qv) DESC, vec_id
LIMIT {TOP_K}
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir).table("embeddings")


def topk_bruteforce(
    emb: DataFrame, query_vec_id: int = QUERY_VEC_ID, k: int = TOP_K
) -> DataFrame:
    """Exact cosine top-k: broadcast the query row, score every vector,
    TakeOrderedAndProject keeps per-partition heaps of size k."""
    q = F.broadcast(
        emb.filter(F.col("vec_id") == query_vec_id).select(
            F.col("embedding").alias("qv")
        )
    )
    scored = (
        emb.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(q)
        .select(
            "vec_id",
            "label",
            cosine_similarity("embedding", "qv").alias("cos"),
        )
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k).select(
        "vec_id", "label"
    )


@register(
    "sim_topk_bruteforce",
    _TOPK_ORACLE,
    doc="similarity search: exact cosine top-10 for a query vector — "
    "broadcast query + distributed scan + top-k merge (no full sort, "
    "no full shuffle)",
)
def sim_topk_bruteforce(spark, sf_dir):
    return topk_bruteforce(_emb(spark, sf_dir))


@register(
    "sim_topk_pandas_udf",
    _TOPK_ORACLE,
    doc="similarity search: same exact top-10 through a vectorized Pandas "
    "UDF (Arrow batches, numpy dot) — the SIMD path for high-dim "
    "embeddings; result-identical to the built-in expression variant",
)
def sim_topk_pandas_udf(spark, sf_dir):
    import numpy as np
    import pandas as pd

    emb = _emb(spark, sf_dir)
    qv = np.array(
        emb.filter(F.col("vec_id") == QUERY_VEC_ID).head()["embedding"],
        dtype=np.float64,
    )
    qn = math.sqrt(float(qv @ qv))

    @F.pandas_udf(T.DoubleType())
    def cos_to_query(col):
        # no type annotations: postponed-annotation strings confuse the
        # pandas_udf signature inference
        mat = np.array(col.tolist(), dtype=np.float64)
        dots = mat @ qv
        norms = np.sqrt((mat * mat).sum(axis=1)) * qn
        return pd.Series(dots / norms)

    scored = emb.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", "label", cos_to_query("embedding").alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(TOP_K).select(
        "vec_id", "label"
    )


@register(
    "sim_ann_ivf",
    f"""
    WITH q AS (SELECT embedding AS qv, label AS qlabel FROM embeddings
               WHERE vec_id = {QUERY_VEC_ID})
    SELECT vec_id, label
    FROM embeddings, q
    WHERE vec_id != {QUERY_VEC_ID} AND label = qlabel
    ORDER BY list_cosine_similarity(embedding, qv) DESC, vec_id
    LIMIT {TOP_K}
    """,
    doc="similarity search: IVF-style cell-pruned top-10 — search only the "
    "query's coarse cell (the ``label`` column stands in for a k-means "
    "cell id). At 100 TB the cell id is the partition key, so the scan "
    "prunes to ~1/nlist of the data before any scoring.",
)
def sim_ann_ivf(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    qrow = F.broadcast(
        emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
            F.col("embedding").alias("qv"), F.col("label").alias("qlabel")
        )
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(qrow)
        .filter(F.col("label") == F.col("qlabel"))
        .select("vec_id", "label", cosine_similarity("embedding", "qv").alias("cos"))
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(TOP_K).select(
        "vec_id", "label"
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (rows-only: sign bits near a hyperplane are float-
# rounding-sensitive, so cross-engine hashing is not meaningful; recall vs
# brute force is asserted in tests/test_similarity.py)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy dependency
    at module import, reproducible across runs)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _sql_double(x: float) -> str:
    """Bit-exact SQL double literal: ``repr`` emits the shortest decimal
    that round-trips in IEEE754, and Spark's parser (Double.parseDouble)
    is correctly rounded — the parsed value IS ``x``."""
    return f"{float(x)!r}D"


def lsh_bucket(col, planes: list[list[float]]):
    """Sign-bit bucket id: bit j = [dot(v, plane_j) > 0].

    r13: the whole bucket is generated as ONE SQL string (a single
    ``F.expr`` py4j round-trip) instead of composing ~65 Column calls
    per plane — the old form cost 216 planes × 65 py4j round-trips
    ≈ 14k driver calls ≈ 16 s of pure DataFrame CONSTRUCTION in
    sim_ann_lsh before any job ran (measured; guide §7.3 — "nothing is
    running" time is driver-side). The parsed expression is the same
    tree the Column form built: aggregate(zip_with(v, array(...),
    (x, y) -> double(x) * double(y)), 0.0, +) per plane — the left fold
    whose bit-exactness the _lsh_oracle twin re-derives — XOR-folded
    over shifted sign bits. ``col`` must be a SQL fragment (column
    name), not a Column."""
    col_sql = col if isinstance(col, str) else "embedding"
    parts = ["CAST(0 AS BIGINT)"]
    for j, plane in enumerate(planes):
        arr = ", ".join(_sql_double(x) for x in plane)
        dot = (
            f"aggregate(zip_with({col_sql}, array({arr}), "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bit = (
            f"CASE WHEN {dot} > 0 THEN CAST(1 AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END"
        )
        parts.append(f"shiftleft({bit}, {j})")
    return F.expr(" ^ ".join(parts))


N_TABLES = 18
K_BITS = 12
N_FLIP_BITS = 5


def _query_probe_buckets(
    qv: list[float],
    planes: list[list[float]],
    n_tables: int,
    k: int,
    flips: int,
) -> list[tuple[int, int]]:
    """Query-directed multi-probe set (Lv et al., VLDB'07): per table,
    probe the query's exact bucket plus every combination of its
    ``flips`` lowest-|margin| sign bits flipped (2^flips probes/table).
    Bits whose hyperplane dot product is near zero are exactly the ones a
    true neighbor is most likely to disagree on, so directed flips buy
    far more recall per probe than blind hamming-1 probing. Driver-side:
    the query row is a single vector (already fetched for the dimension),
    so the probe list is a few hundred literal (table, bucket) pairs."""
    from itertools import combinations

    out: list[tuple[int, int]] = []
    for t in range(n_tables):
        dots = [
            sum(float(a) * float(b) for a, b in zip(qv, planes[t * k + j]))
            for j in range(k)
        ]
        bucket = sum(1 << j for j, d in enumerate(dots) if d > 0)
        low = sorted(range(k), key=lambda j: abs(dots[j]))[:flips]
        probes = {bucket}
        for r in range(1, flips + 1):
            for combo in combinations(low, r):
                probes.add(bucket ^ sum(1 << j for j in combo))
        out.extend((t, b) for b in sorted(probes))
    return out


def lsh_candidates(
    emb: DataFrame,
    query_vec_id: int = QUERY_VEC_ID,
    n_tables: int = N_TABLES,
    k: int = K_BITS,
    flips: int = N_FLIP_BITS,
) -> DataFrame:
    """(vec_id, label, embedding, qv) candidates sharing ≥1 probed bucket
    with the query in ≥1 table. The corpus index is n_tables fixed-width
    (vec_id, tbl, bucket) rows per vector — built once, reused across
    queries at scale; each query broadcast-joins its literal probe list,
    so no corpus shuffle happens per query."""
    qv = list(emb.filter(F.col("vec_id") == query_vec_id).head()["embedding"])
    planes = _hyperplanes(len(qv), n_tables * k)
    tables = [planes[t * k : (t + 1) * k] for t in range(n_tables)]
    buckets = F.array(
        *[lsh_bucket("embedding", tables[t]) for t in range(n_tables)]
    )
    entries = emb.select(
        "vec_id", "label", "embedding",
        F.posexplode(buckets).alias("tbl", "bucket"),
    )
    probes_df = F.broadcast(
        emb.sparkSession.createDataFrame(
            _query_probe_buckets(qv, planes, n_tables, k, flips),
            "tbl int, bucket long",
        )
    )
    qv_lit = F.lit([float(x) for x in qv])
    return (
        entries.filter(F.col("vec_id") != query_vec_id)
        .join(probes_df, ["tbl", "bucket"])
        .select("vec_id", "label", "embedding", qv_lit.alias("qv"))
        .dropDuplicates(["vec_id"])
    )


def _lsh_oracle() -> str:
    """Bit-exact ANSI-SQL twin of the full multi-probe LSH pipeline.

    Promotion from rows-only (VERDICT r5 item 5). Every float the Spark
    path produces is re-derived bit-identically in DuckDB, so the final
    integer (vec_id, label) top-10 hashes exactly:

    - hyperplanes: the LCG in :func:`_hyperplanes` is modular integer
      arithmetic (HUGEINT recursive CTE) and the float mapping
      ``((state >> 11) / 2^53) * 2 - 1`` is exact in IEEE754 (dyadic
      numerator < 2^53, power-of-two division, Sterbenz subtraction) —
      verified value-identical to the Python generator in
      tests/test_similarity.py::test_lsh_oracle_planes_bit_exact;
    - dot products / norms: Spark's ``F.aggregate(..., 0.0, acc + v)``
      is a left fold whose first step ``0.0 + p0 == p0``, i.e. exactly
      DuckDB's init-less left-to-right ``list_reduce``; both sides widen
      the float32 embedding to double before multiplying;
    - the query's 5 lowest-|margin| bits: Python's stable sort ties on
      bit index == ``ROW_NUMBER() OVER (ORDER BY abs(dot), j)``;
    - the 2^5 directed probes: a static 32-mask table XORed onto the
      query bucket (disjoint bits, so the Python ``bucket ^ sum(1<<j)``
      is the same value);
    - the top-10: cosine ties break on vec_id on both engines, and the
      cosines themselves are bit-identical by the fold argument above.
    """
    n_planes = N_TABLES * K_BITS  # 216
    dim = 64  # testdata embedding dimension (TESTDATA.md)
    n_states = n_planes * dim
    return f"""
    WITH RECURSIVE lcg AS (
        SELECT 0 AS i, CAST(42 AS HUGEINT) AS state
        UNION ALL
        SELECT i + 1,
               (state * 6364136223846793005 + 1442695040888963407)
                   % 18446744073709551616
        FROM lcg WHERE i < {n_states}
    ),
    vals AS (
        SELECT CAST((i - 1) // {dim} AS INT) AS p,
               CAST((i - 1) % {dim} AS INT) AS d,
               (CAST(state // 2048 AS DOUBLE) / 9007199254740992.0) * 2.0
                   - 1.0 AS w
        FROM lcg WHERE i >= 1
    ),
    planes AS (
        SELECT p, CAST(p // {K_BITS} AS INT) AS t,
               CAST(p % {K_BITS} AS INT) AS j,
               list(w ORDER BY d) AS pl
        FROM vals GROUP BY p
    ),
    dots AS (
        SELECT e.vec_id, pl.t, pl.j,
               list_reduce(
                   list_transform(range(1, {dim + 1}),
                       i -> CAST(e.embedding[i] AS DOUBLE) * pl.pl[i]),
                   (a, b) -> a + b) AS dot
        FROM embeddings e CROSS JOIN planes pl
    ),
    buckets AS (
        SELECT vec_id, t,
               CAST(SUM(CASE WHEN dot > 0
                             THEN CAST(1 AS BIGINT) << j ELSE 0 END)
                    AS BIGINT) AS bucket
        FROM dots GROUP BY vec_id, t
    ),
    qlow AS (
        SELECT t, j, rnk FROM (
            SELECT t, j,
                   ROW_NUMBER() OVER (PARTITION BY t
                                      ORDER BY abs(dot), j) AS rnk
            FROM dots WHERE vec_id = {QUERY_VEC_ID})
        WHERE rnk <= {N_FLIP_BITS}
    ),
    masks AS (SELECT CAST(range AS INT) AS m FROM range(0, {2 ** N_FLIP_BITS})),
    probes AS (
        SELECT DISTINCT qb.t,
               xor(qb.bucket,
                   (SELECT COALESCE(SUM(CASE WHEN (masks.m >> (l.rnk - 1)) % 2 = 1
                                   THEN CAST(1 AS BIGINT) << l.j
                                   ELSE 0 END), 0)
                    FROM qlow l WHERE l.t = qb.t)) AS bucket
        FROM (SELECT t, bucket FROM buckets
              WHERE vec_id = {QUERY_VEC_ID}) qb
        CROSS JOIN masks
    ),
    cands AS (
        SELECT DISTINCT b.vec_id
        FROM buckets b JOIN probes pr
          ON b.t = pr.t AND b.bucket = pr.bucket
        WHERE b.vec_id != {QUERY_VEC_ID}
    ),
    q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
               sqrt(list_reduce(
                   list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   (a, b) -> a + b)) AS qnorm
        FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
    ),
    scored AS (
        SELECT e.vec_id, e.label,
               list_reduce(
                   list_transform(range(1, {dim + 1}),
                       i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]),
                   (a, b) -> a + b)
               / (sqrt(list_reduce(
                      list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                      (a, b) -> a + b)) * q.qnorm) AS cos
        FROM embeddings e JOIN cands c ON e.vec_id = c.vec_id
        CROSS JOIN q
    )
    SELECT vec_id, label FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 10
    """


@register(
    "sim_ann_lsh",
    _lsh_oracle(),
    doc="similarity search: query-directed multi-probe LSH top-10 (Lv et "
    "al. multi-probe over random-hyperplane tables) — L=18 tables of "
    "k=12 sign bits; each query probes its bucket plus all subsets of "
    "its 5 lowest-margin bits flipped (32 probes/table). Measured at "
    "sf0.001 vs the r1 exact-probe L=12/k=6 scheme: recall 7/10 vs "
    "4/10 at a LOWER scanned fraction (17.8% vs 20.4%) — directed "
    "probes put budget on the sign bits a near neighbor most likely "
    "flips. Asserted in tests/test_similarity.py. Hash-checked "
    "end-to-end against a bit-exact SQL twin that re-derives the LCG "
    "hyperplanes, sign buckets, directed probe set, and cosine top-10 "
    "(see _lsh_oracle; promoted from rows-only per VERDICT r5 item 5).",
)
def sim_ann_lsh(spark, sf_dir):
    cand = lsh_candidates(_emb(spark, sf_dir))
    scored = cand.select(
        "vec_id", "label", cosine_similarity("embedding", "qv").alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(TOP_K).select(
        "vec_id", "label"
    )



# ---------------------------------------------------------------------------
# Embedding column ops (normalize / quantize) — the vector-preprocessing
# steps a training pipeline runs before indexing or storage.
# ---------------------------------------------------------------------------


def emb_l2_normalize_vec(spark, sf_dir):
    """Array-native L2 normalization: (vec_id, norm, unit array<double>).

    This is the production form (the unit vector stays a column); the
    registered ``emb_l2_normalize`` query explodes it to scalar rows
    because the driver's pandas canonicalizer cannot hash list-valued
    columns (r2 `TypeError: unhashable type: 'list'`). Pytest covers this
    array form directly.
    """
    e = _emb(spark, sf_dir)
    v = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    n = v.select(
        "vec_id",
        "v",
        F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("norm"),
    )
    return n.select(
        "vec_id",
        "norm",
        F.transform("v", lambda x: x / F.col("norm")).alias("unit"),
    )


@register(
    "emb_l2_normalize",
    """
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS norm
        FROM v
    ),
    u AS (
        SELECT vec_id, norm, list_transform(v, x -> x / norm) AS unit
        FROM n
    )
    SELECT vec_id, norm,
           generate_subscripts(unit, 1) - 1 AS dim_idx,
           unnest(unit) AS unit_val
    FROM u
    """,
    doc="vector op: L2 normalization — float components widen to double "
    "(exact), the squared sum reduces in LIST ORDER on both engines "
    "(order-pinned, so the double sum is bit-identical), sqrt and the "
    "per-element division are IEEE-deterministic. The norm is "
    "materialized in its own projection before the transform lambda "
    "references it (HOF lambdas get no CSE). Output is exploded to "
    "(vec_id, norm, dim_idx, unit_val) scalar rows — array-valued "
    "columns crash the driver canonicalizer; the array-native form is "
    "emb_l2_normalize_vec (pytest-covered).",
)
def emb_l2_normalize(spark, sf_dir):
    return emb_l2_normalize_vec(spark, sf_dir).select(
        "vec_id",
        "norm",
        F.posexplode("unit").alias("dim_idx", "unit_val"),
    )


def emb_quantize_int8_vec(spark, sf_dir):
    """Array-native symmetric int8 quantization: (vec_id, scale,
    q array<int>). Production form; the registered ``emb_quantize_int8``
    explodes to scalar rows for driver hashability (see
    emb_l2_normalize_vec). Pytest covers this array form directly."""
    e = _emb(spark, sf_dir)
    v = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    s = (
        v.select(
            "vec_id",
            "v",
            F.array_max(F.transform("v", lambda x: F.abs(x))).alias("amax"),
        )
        .filter(F.col("amax") > 0)
        .select("vec_id", "v", (F.lit(127.0) / F.col("amax")).alias("scale"))
    )
    q = F.transform(
        "v",
        lambda x: F.greatest(
            F.least(F.floor(x * F.col("scale") + F.lit(0.5)), F.lit(127.0)),
            F.lit(-127.0),
        ).cast("int"),
    )
    return s.select("vec_id", "scale", q.alias("q"))


@register(
    "emb_quantize_int8",
    """
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, v,
               127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
        FROM v
        WHERE list_max(list_transform(v, x -> abs(x))) > 0
    ),
    qq AS (
        SELECT vec_id, scale,
               list_transform(v, x -> CAST(greatest(least(
                   floor(x * scale + 0.5), 127), -127) AS INT)) AS q
        FROM s
    )
    SELECT vec_id, scale,
           generate_subscripts(q, 1) - 1 AS dim_idx,
           unnest(q) AS q_val
    FROM qq
    """,
    doc="vector op: symmetric int8 quantization (scale = 127/amax, "
    "q = clamp(floor(x*scale + 0.5))) — 4× storage cut before writing an "
    "embedding table. floor(x+0.5) instead of round(): both engines "
    "evaluate it identically (round()'s half-way tie-breaking differs), "
    "and the clamp makes the ±ulp edge at amax explicit. Zero vectors "
    "are excluded (no defined scale) on both sides. Output exploded to "
    "(vec_id, scale, dim_idx, q_val) scalar rows for the driver "
    "canonicalizer; array-native form is emb_quantize_int8_vec.",
)
def emb_quantize_int8(spark, sf_dir):
    return emb_quantize_int8_vec(spark, sf_dir).select(
        "vec_id",
        "scale",
        F.posexplode("q").alias("dim_idx", "q_val"),
    )


@register(
    "sim_label_centroids",
    f"""
    SELECT label, dim_idx,
           {NANO_MEAN_SQL.format(v="CAST(val AS DOUBLE)")} AS centroid_val
    FROM (
        SELECT label,
               generate_subscripts(embedding, 1) - 1 AS dim_idx,
               unnest(embedding) AS val
        FROM embeddings) q
    GROUP BY label, dim_idx
    """,
    doc="vector aggregation: per-label centroids (the k-means update step "
    "/ IVF coarse-quantizer training) — posexplode to (label, dim, val), "
    "one hash aggregate; means ride the engine-mirrored nano-unit "
    "quantization (functions/vector.nano_mean — r8: the old "
    "decimal(18,9) cast rounds HALF_UP in Spark but half-even in "
    "DuckDB, and sf0.1 contains 0.1494140625, which lands exactly on a "
    "half boundary; the mirrored floor-form is bit-identical by "
    "construction)",
)
def sim_label_centroids(spark, sf_dir):
    e = _emb(spark, sf_dir)
    exploded = e.select(
        "label", F.posexplode("embedding").alias("dim_idx", "val")
    )
    return exploded.groupBy("label", "dim_idx").agg(
        nano_mean(F.col("val")).alias("centroid_val")
    )


# ---------------------------------------------------------------------------
# Iterative k-means (Lloyd), k fixed, deterministic init
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


def _assign_expr() -> F.Column:
    """cluster_id = argmin over distances to the ``cents`` column (an
    array<array<double>> carried by a broadcast 1-row DataFrame).

    Squared L2 per centroid is zip_with + a left-to-right aggregate fold:
    the addition order is the array order, so the double result is
    reproducible bit-for-bit (the pytest replica folds in the same
    order). Keeping the centroids in a *data* column rather than literals
    means every iteration compiles the SAME generated code — the codegen
    cache hits instead of recompiling a k×dim-literal expression tree
    per iteration."""
    dists = F.transform(
        F.col("cents"),
        lambda c: F.aggregate(
            F.zip_with("embedding", c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    # array_position returns the FIRST index of the minimum (1-based),
    # which makes ties deterministic: lowest cluster id wins.
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _with_centroids(df, centroids: list[list[float]]):
    """Cross-join a broadcast single-row (k × dim) centroid table."""
    spark = df.sparkSession
    cents = spark.createDataFrame([(centroids,)], "cents: array<array<double>>")
    return df.crossJoin(F.broadcast(cents))


def _assign_pandas_udf(centroids: list[list[float]]):
    """Arrow-batched assignment with the EXACT float semantics of
    ``_assign_expr``: per centroid, the squared distance accumulates
    dim-by-dim left-to-right (``acc = acc + t*t`` — vectorized across
    rows, *sequential* across dims, so each row's fold order is
    identical to the HOF expression and to the pytest replica), and
    ``np.argmin`` returns the FIRST minimum (lowest cluster id wins,
    same tie rule as array_position-of-array_min). Bit-identical
    results at ~10x the speed: the interpreted higher-order-function
    path pays per-element lambda dispatch, this pays one numpy op per
    (centroid, dim) per batch. ``test_kmeans_assign_udf_matches_expr``
    pins UDF == expression on real data."""
    import numpy as np
    import pandas as pd

    cents = [np.asarray(c, dtype=np.float64) for c in centroids]

    @F.pandas_udf(T.IntegerType())
    def assign(col):
        if len(col) == 0:  # zero-row Arrow batch -> shape (0,) below
            return pd.Series([], dtype=np.int32)
        m = np.array(col.tolist(), dtype=np.float64)
        if m.ndim != 2:  # ragged embeddings build a 1-D object array
            raise ValueError(f"embeddings must be fixed-width: {m.shape}")
        dists = np.empty((len(m), len(cents)), dtype=np.float64)
        for i, c in enumerate(cents):
            acc = np.zeros(len(m), dtype=np.float64)
            for d in range(m.shape[1]):
                t = m[:, d] - c[d]
                acc = acc + t * t
            dists[:, i] = acc
        return pd.Series(np.argmin(dists, axis=1).astype(np.int32))

    return assign


EMB_DIM = 64  # testdata embedding dimensionality (TESTDATA.md, every SF)


def _kmeans_assign_sql(cb: str, dim: int) -> str:
    """One synchronized Lloyd assignment as SQL: argmin over the ``cb``
    codebook CTE with the EXACT float semantics of ``_assign_expr`` —
    per-centroid squared L2 as a left-to-right fold over float32→double
    widenings (DuckDB's init-less ``list_reduce`` == Spark's
    ``aggregate`` 0.0-fold: squares are non-negative, so 0.0+v1 == v1
    bitwise), first-min-wins via row_number ordered (dist ASC, cid ASC)
    — the same tie rule as array_position-of-array_min and np.argmin."""
    return f"""
        SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_reduce(list_transform(range(1, {dim + 1}),
                           i -> (e.emb[i] - c.cent[i])
                              * (e.emb[i] - c.cent[i])),
                           (x, y) -> x + y) ASC, c.cid ASC) AS rn
            FROM e CROSS JOIN {cb} c)
        WHERE rn = 1"""


def _kmeans_oracle(dim: int = EMB_DIM) -> str:
    """Full oracle for sim_kmeans (r8, promoted from rows-only —
    VERDICT r7 item 3): the 3 Lloyd iterations over pinned seeds (the
    k lowest vec_ids) unroll into three assign/update CTE rounds — the
    pagerank/MMR bounded-unroll pattern. Assignment distances are the
    same left-to-right double folds on both engines (bit-identical);
    the centroid update rides the engine-mirrored nano-unit mean
    (functions/vector.NANO_MEAN_SQL == nano_mean — same IEEE
    multiply/floor on both sides, replacing the half-boundary-unsafe
    decimal(18,9) cast), so every centroid coordinate and therefore
    every integer cluster id is exact. Empty clusters keep the previous
    centroid (COALESCE, same contract as the Spark loop). Output is
    integers only. AS MATERIALIZED on every CTE the next round
    re-references (the r7 DuckDB CTE-inlining lesson)."""
    mean_sql = NANO_MEAN_SQL.format(v="e.emb[d.i]")
    parts = [
        f"""e AS MATERIALIZED (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings),
    cb0 AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, emb AS cent
        FROM (SELECT vec_id, emb FROM e ORDER BY vec_id LIMIT {KMEANS_K}))"""
    ]
    prev = "cb0"
    for t in range(1, KMEANS_ITERS + 1):
        assign = _kmeans_assign_sql(prev, dim)
        parts.append(
            f"""a{t} AS MATERIALIZED ({assign}),
    u{t} AS (
        SELECT a.cid, d.i, {mean_sql} AS v
        FROM a{t} a JOIN e USING (vec_id)
        CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS i) d
        GROUP BY a.cid, d.i),
    cb{t} AS MATERIALIZED (
        SELECT c.cid, COALESCE(u.cent, c.cent) AS cent
        FROM {prev} c LEFT JOIN (
            SELECT cid, list(v ORDER BY i) AS cent
            FROM u{t} GROUP BY cid) u
          ON c.cid = u.cid)"""
        )
        prev = f"cb{t}"
    final = _kmeans_assign_sql(prev, dim)
    return f"""
    WITH {','.join(parts)},
    fin AS ({final})
    SELECT f.vec_id, e.label, CAST(f.cid AS INTEGER) AS cluster_id
    FROM fin f JOIN e USING (vec_id)
    """


@register(
    "sim_kmeans",
    _kmeans_oracle(),
    doc="iterative k-means (Lloyd, k=8, 3 iterations) over the embeddings "
    "table. Deterministic init (the k lowest vec_ids), assignment as an "
    "Arrow-batched pandas UDF whose per-row fold order is IDENTICAL to "
    "the built-in HOF expression (dim-sequential accumulation, first-min "
    "argmin — bit-exact twin pinned by pytest; the interpreted HOF path "
    "pays per-element lambda dispatch, the vectorized path is ~10x "
    "faster and shuffle-free), update as posexplode + one hash "
    "aggregate with engine-mirrored nano-unit means (r8: nano_mean "
    "replaced the half-boundary-unsafe decimal(18,9) cast) — only "
    "k*dim centroid values "
    "ever reach the driver, so the loop is 100 TB-safe: per iteration "
    "one scan + one bounded aggregate. The scan is persisted across "
    "iterations and unpersisted before the final assignment pass. "
    "PROMOTED from rows-only in r8 (VERDICT r7 item 3): the oracle "
    "unrolls the 3 pinned-seed Lloyd iterations as SQL CTE rounds; "
    "the exact Python replica remains in tests/test_similarity.py.",
    tags=("similarity", "iterative"),
)
def sim_kmeans(spark, sf_dir):
    e = _emb(spark, sf_dir).select("vec_id", "label", "embedding")

    # deterministic seed: the k lowest vec_ids (bounded driver fetch)
    seed_rows = e.orderBy("vec_id").limit(KMEANS_K).collect()
    centroids = [[float(x) for x in r.embedding] for r in seed_rows]

    cached = e.persist()
    try:
        for _ in range(KMEANS_ITERS):
            assigned = cached.select(
                "embedding",
                _assign_pandas_udf(centroids)("embedding").alias("cluster_id"),
            )
            # update step: k*dim rows to the driver (k, dim are constants)
            rows = (
                assigned.select(
                    "cluster_id", F.posexplode("embedding").alias("dim_idx", "val")
                )
                .groupBy("cluster_id", "dim_idx")
                .agg(nano_mean(F.col("val")).alias("centroid_val"))
                .collect()
            )
            new_centroids = [list(c) for c in centroids]  # empty clusters keep
            acc: dict[int, dict[int, float]] = {}
            for r in rows:
                acc.setdefault(r.cluster_id, {})[r.dim_idx] = r.centroid_val
            for cid, dims in acc.items():
                new_centroids[cid] = [dims[i] for i in range(len(dims))]
            centroids = new_centroids
    finally:
        cached.unpersist()

    # final assignment from the (uncached) source with converged centroids
    return e.select(
        "vec_id",
        "label",
        _assign_pandas_udf(centroids)("embedding").alias("cluster_id"),
    )


# ---------------------------------------------------------------------------
# PCA projection (round 4): decorrelate embeddings before quantization/ANN
# ---------------------------------------------------------------------------

PCA_K = 4


@register(
    "emb_pca_project",
    None,  # eigenvector sign/order is solver-defined → rows-only;
    # pytest checks subspace agreement against a numpy replica
    doc="embeddings: PCA projection to the top-4 principal components "
    "(pyspark.ml.feature.PCA over array_to_vector'd float arrays) — the "
    "decorrelation step ahead of int8 quantization (emb_quantize_int8) "
    "or IVF cell assignment (sim_ann_ivf): variance concentrates in the "
    "leading dims, so coarse quantizers spend their budget where the "
    "data varies. Scale shape: MLlib computes the d x d Gramian with a "
    "distributed treeAggregate (one pass, map-side partials; d^2 values "
    "per partition, never row data to the driver) and eigendecomposes "
    "the tiny d x d matrix driver-side — the same bounded-driver "
    "pattern as sim_kmeans' k x d centroid fetch. Rows-only: component "
    "signs and near-degenerate component order are solver-defined; the "
    "pytest replica checks |projection| agreement per component vs "
    "numpy.linalg.eigh.",
    tags=("embeddings",),
)
def emb_pca_project(spark, sf_dir):
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    e = load_tables(spark, sf_dir).table("embeddings")
    vecs = e.select(
        "vec_id",
        "label",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("v"),
    )
    model = PCA(k=PCA_K, inputCol="v", outputCol="p").fit(vecs)
    proj = model.transform(vecs).select(
        "vec_id", "label", vector_to_array("p").alias("pca")
    )
    # exploded scalar form (vec_id, component, value) — the same
    # driver-safe shape the emb_* family settled on in r3
    return proj.select(
        "vec_id",
        "label",
        F.posexplode("pca").alias("component", "value"),
    )


# ---------------------------------------------------------------------------
# Product quantization (round 4): PQ codebooks + ADC search
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces
PQ_K = 16  # codes per subspace
PQ_ITERS = 3


def _pq_sub(m: int, sub_dim: int) -> F.Column:
    return F.slice(F.col("embedding"), m * sub_dim + 1, sub_dim)


def _pq_assign_expr(m: int, sub_dim: int) -> F.Column:
    """argmin code for subspace m against the ``cb`` column (a broadcast
    array<array<array<double>>> of [M][K][sub_dim] centroids). Same
    left-to-right fold + first-min-wins determinism as sim_kmeans."""
    dists = F.transform(
        F.element_at(F.col("cb"), m + 1),
        lambda c: F.aggregate(
            F.zip_with(_pq_sub(m, sub_dim), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _with_codebooks(df: DataFrame, cb: list) -> DataFrame:
    spark = df.sparkSession
    cb_df = spark.createDataFrame([(cb,)], "cb: array<array<array<double>>>")
    return df.crossJoin(F.broadcast(cb_df))


def train_pq_codebooks(e: DataFrame, dim: int) -> list:
    """[M][K][dim/M] codebooks via per-subspace Lloyd, all M subspaces
    trained in the SAME per-iteration pass: assignment is M argmin
    expressions over one broadcast codebook table, the update explodes
    (m, code, dim_idx, val) once and aggregates with engine-mirrored
    nano-unit means (functions/vector.nano_mean, r8 — replaced the
    half-boundary-unsafe decimal(18,9) cast, which is what unlocked the
    family's full SQL oracles) — only M*K*(dim/M) values reach the
    driver per iteration.

    Deterministic: seeds are the PQ_K lowest vec_ids' subvectors; empty
    codes keep their previous centroid (same contract as sim_kmeans)."""
    sub = dim // PQ_M
    seed_rows = e.orderBy("vec_id").limit(PQ_K).collect()
    cb = [
        [
            [float(x) for x in r.embedding[m * sub : (m + 1) * sub]]
            for r in seed_rows
        ]
        for m in range(PQ_M)
    ]
    cached = e.select("vec_id", "embedding").persist()
    try:
        for _ in range(PQ_ITERS):
            assigned = _with_codebooks(cached, cb).select(
                "embedding",
                *[_pq_assign_expr(m, sub).alias(f"c{m}") for m in range(PQ_M)],
            )
            s1 = assigned.select(
                F.posexplode(
                    F.array(*[F.col(f"c{m}") for m in range(PQ_M)])
                ).alias("m", "code"),
                "embedding",
            )
            s2 = s1.select(
                "m",
                "code",
                F.posexplode(
                    F.slice("embedding", F.col("m") * sub + 1, F.lit(sub))
                ).alias("dim_idx", "val"),
            )
            rows = (
                s2.groupBy("m", "code", "dim_idx")
                .agg(nano_mean(F.col("val")).alias("v"))
                .collect()
            )
            new_cb = [[list(c) for c in books] for books in cb]
            acc: dict = {}
            for r in rows:
                acc.setdefault((r.m, r.code), {})[r.dim_idx] = r.v
            for (m, code), dims in acc.items():
                new_cb[m][code] = [dims[i] for i in range(len(dims))]
            cb = new_cb
    finally:
        cached.unpersist()
    return cb


def _pq_assign_sql(cb: str, sub: int) -> str:
    """One synchronized PQ assignment as SQL — all M subspaces at once:
    argmin code per (vector, m) over the ``cb`` codebook CTE with the
    EXACT float semantics of ``_pq_assign_expr`` (left-to-right double
    fold over the m-th subvector, first-min-wins via row_number ordered
    (dist ASC, code ASC))."""
    return f"""
        SELECT vec_id, m, code FROM (
            SELECT e.vec_id, c.m, c.code,
                   row_number() OVER (
                       PARTITION BY e.vec_id, c.m
                       ORDER BY list_reduce(list_transform(range(1, {sub + 1}),
                           i -> (e.emb[c.m*{sub} + i] - c.cent[i])
                              * (e.emb[c.m*{sub} + i] - c.cent[i])),
                           (x, y) -> x + y) ASC, c.code ASC) AS rn
            FROM e CROSS JOIN {cb} c)
        WHERE rn = 1"""


def _pq_train_ctes(dim: int = EMB_DIM) -> str:
    """Shared DuckDB CTE chain for the PQ family (r8, promoted from
    rows-only — VERDICT r7 item 2): re-derives train_pq_codebooks'
    [M][K][dim/M] codebooks by unrolling the 3 pinned-seed Lloyd
    iterations (seeds = the PQ_K lowest vec_ids' subvectors) as SQL
    rounds — the pagerank/MMR bounded-unroll pattern — then encodes the
    full corpus with the converged books into ``f(vec_id, m, code)``.
    Assignment folds and the nano-unit centroid means are bit-identical
    to the Spark path by construction (see _kmeans_oracle), so the
    integer codes are exact. Empty codes keep their previous centroid
    (COALESCE). AS MATERIALIZED everywhere a CTE is re-referenced (the
    r7 DuckDB CTE-inlining lesson)."""
    sub = dim // PQ_M
    mean_sql = NANO_MEAN_SQL.format(v=f"e.emb[a.m*{sub} + d.i]")
    parts = [
        f"""e AS MATERIALIZED (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings),
    cb0 AS MATERIALIZED (
        SELECT ms.m, s.code,
               list_slice(s.emb, ms.m*{sub} + 1, ms.m*{sub} + {sub}) AS cent
        FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, emb
              FROM (SELECT vec_id, emb FROM e ORDER BY vec_id
                    LIMIT {PQ_K})) s
        CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) ms)"""
    ]
    prev = "cb0"
    for t in range(1, PQ_ITERS + 1):
        parts.append(
            f"""a{t} AS MATERIALIZED ({_pq_assign_sql(prev, sub)}),
    u{t} AS (
        SELECT a.m, a.code, d.i, {mean_sql} AS v
        FROM a{t} a JOIN e USING (vec_id)
        CROSS JOIN (SELECT unnest(range(1, {sub + 1})) AS i) d
        GROUP BY a.m, a.code, d.i),
    cb{t} AS MATERIALIZED (
        SELECT c.m, c.code, COALESCE(u.cent, c.cent) AS cent
        FROM {prev} c LEFT JOIN (
            SELECT m, code, list(v ORDER BY i) AS cent
            FROM u{t} GROUP BY m, code) u
          ON c.m = u.m AND c.code = u.code)"""
        )
        prev = f"cb{t}"
    parts.append(f"f AS MATERIALIZED ({_pq_assign_sql(prev, sub)})")
    return ",\n    ".join(parts)


def _pq_adc_ctes(dim: int = EMB_DIM) -> str:
    """_pq_train_ctes + the ADC distance table and per-vector scores:
    ``dt(m, code, d)`` mirrors the driver-side Python fold over
    (query subvector − centroid)² — same left-to-right order — and
    ``scored`` sums each vector's M lookups in m-order via
    list(d ORDER BY m) + list_reduce, matching Spark's sequence-fold
    ((0.0+d0)+d1)+d2)+d3."""
    sub = dim // PQ_M
    cb = f"cb{PQ_ITERS}"
    return (
        _pq_train_ctes(dim)
        + f""",
    q AS (SELECT emb AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
    dt AS MATERIALIZED (
        SELECT c.m, c.code,
               list_reduce(list_transform(range(1, {sub + 1}),
                   i -> (q.qv[c.m*{sub} + i] - c.cent[i])
                      * (q.qv[c.m*{sub} + i] - c.cent[i])),
                   (x, y) -> x + y) AS d
        FROM {cb} c CROSS JOIN q),
    scored AS MATERIALIZED (
        SELECT f.vec_id,
               list_reduce(list(dt.d ORDER BY dt.m), (x, y) -> x + y)
                   AS approx_l2
        FROM f JOIN dt ON f.m = dt.m AND f.code = dt.code
        GROUP BY f.vec_id)"""
    )


@register(
    "sim_pq_encode",
    f"""
    WITH {_pq_train_ctes()}
    SELECT f.vec_id, e.label,
           CAST(f.m AS INTEGER) AS m, CAST(f.code AS INTEGER) AS code
    FROM f JOIN e USING (vec_id)
    """,
    doc="similarity: product-quantization encoding (PQ 4x16 over 64-dim "
    "embeddings) — per-subspace Lloyd codebooks (trained in one "
    "distributed pass per iteration across ALL subspaces), each vector "
    "compressed to 4 one-byte codes: a 64x memory reduction that makes "
    "billion-vector ANN indexes RAM-resident (Jegou et al., 'Product "
    "Quantization for Nearest Neighbor Search', PAMI'11). Output is the "
    "exploded (vec_id, label, m, code) form. 100 TB shape: training "
    "touches only M*K*(dim/M) driver values per iteration; encoding is "
    "one map-side pass against a broadcast codebook. PROMOTED from "
    "rows-only in r8 (VERDICT r7 item 2): the oracle unrolls the 3 "
    "pinned-seed Lloyd rounds in SQL (_pq_train_ctes) and hashes the "
    "integer codes; the bit-exact Python replica remains in "
    "tests/test_r4_ops.py.",
    tags=("similarity", "iterative"),
)
def sim_pq_encode(spark, sf_dir):
    e = _emb(spark, sf_dir)
    dim = len(e.select("embedding").head()["embedding"])
    sub = dim // PQ_M
    cb = train_pq_codebooks(e, dim)
    return _with_codebooks(e, cb).select(
        "vec_id",
        "label",
        F.posexplode(
            F.array(*[_pq_assign_expr(m, sub) for m in range(PQ_M)])
        ).alias("m", "code"),
    )


def _pq_adc_ranked(spark, sf_dir, k):
    """ADC-scored candidates: top-k corpus vectors by approximate L2."""
    e = _emb(spark, sf_dir)
    q = [float(x) for x in
         e.filter(F.col("vec_id") == QUERY_VEC_ID).head()["embedding"]]
    dim = len(q)
    sub = dim // PQ_M
    cb = train_pq_codebooks(e, dim)

    def sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    dtab = [
        [sq(q[m * sub : (m + 1) * sub], cb[m][k2]) for k2 in range(PQ_K)]
        for m in range(PQ_M)
    ]
    spark_ = e.sparkSession
    dt_df = spark_.createDataFrame([(dtab,)], "dt: array<array<double>>")
    coded = _with_codebooks(e, cb).select(
        "vec_id",
        "label",
        F.array(*[_pq_assign_expr(m, sub) for m in range(PQ_M)]).alias("codes"),
    )
    approx = F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.element_at(F.col("dt"), m + 1), F.element_at(F.col("codes"), m + 1) + 1
        ),
    )
    return (
        coded.crossJoin(F.broadcast(dt_df))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", approx.alias("approx_l2"))
        .orderBy(F.asc("approx_l2"), F.asc("vec_id"))
        .limit(k)
    )


@register(
    "sim_ann_pq_adc",
    f"""
    WITH {_pq_adc_ctes()}
    SELECT s.vec_id, e.label, s.approx_l2
    FROM scored s JOIN e USING (vec_id)
    WHERE s.vec_id != {QUERY_VEC_ID}
    ORDER BY s.approx_l2 ASC, s.vec_id ASC
    LIMIT {TOP_K}
    """,
    doc="similarity: ANN search by asymmetric distance computation over "
    "the PQ codes — the query stays UNquantized; its per-subspace "
    "distance table to every codebook centroid (M*K doubles) is "
    "computed driver-side and broadcast, and each candidate's "
    "approximate L2 is the sum of M table lookups indexed by its codes "
    "(no per-pair array math at all). Top-k by approximate distance. "
    "At 100 TB this is the scan that replaces brute force: 4 byte "
    "lookups + 3 adds per vector, with the table in L1. PROMOTED from "
    "rows-only in r8: the oracle re-derives the codebooks + codes "
    "(_pq_train_ctes) and the distance table with the same folds, so "
    "approx_l2 ships as RAW doubles (no quantization, the MMR "
    "precedent).",
    tags=("similarity",),
)
def sim_ann_pq_adc(spark, sf_dir):
    return _pq_adc_ranked(spark, sf_dir, TOP_K)


# ---------------------------------------------------------------------------
# Batched multi-query top-k (round 4)
# ---------------------------------------------------------------------------

BATCH_QUERIES = 5


@register(
    "sim_topk_batch",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id < {BATCH_QUERIES})
    SELECT qid, vec_id, label, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT q.qid, e.vec_id, e.label,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC,
                            e.vec_id) AS rnk
        FROM embeddings e JOIN q ON e.vec_id != q.qid)
    WHERE rnk <= {TOP_K}
    """,
    doc="similarity search: BATCHED exact top-10 for a set of query "
    "vectors in ONE corpus scan — the shape a production retrieval job "
    "actually runs (thousands of queries amortize the scan; per-query "
    "jobs would rescan the corpus Q times). The query batch broadcasts "
    "(Q rows), every corpus vector scores against all Q map-side, and a "
    "per-query row_number window keeps k. The window shuffle carries "
    "(qid, vec_id, cos) triples — Q*n rows but 3 narrow columns, and "
    "WindowGroupLimit pre-filters each map partition to its local "
    "top-k per query before the exchange (same two-phase pattern "
    "text_source_cap's plan shows), so the shuffle is ~Q*k*partitions "
    "rows in practice.",
    tags=("similarity",),
)
def sim_topk_batch(spark, sf_dir):
    from pyspark.sql.window import Window

    e = _emb(spark, sf_dir)
    q = F.broadcast(
        e.filter(F.col("vec_id") < BATCH_QUERIES).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
    )
    scored = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "label",
            cosine_similarity("embedding", "qv").alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "vec_id", "label", F.col("rnk").cast("long").alias("rnk"))
    )


@register(
    "sim_ann_ivf_pq",
    f"""
    WITH {_pq_adc_ctes()}
    SELECT s.vec_id, e.label, s.approx_l2
    FROM scored s JOIN e USING (vec_id)
    WHERE s.vec_id != {QUERY_VEC_ID}
      AND e.label = (SELECT label FROM e WHERE vec_id = {QUERY_VEC_ID})
    ORDER BY s.approx_l2 ASC, s.vec_id ASC
    LIMIT {TOP_K}
    """,
    doc="similarity: IVF + PQ — the full FAISS-style ANN index shape: "
    "the coarse quantizer (label = cell, as in sim_ann_ivf) prunes the "
    "scan to the query's cell, and within the cell candidates rank by "
    "PQ asymmetric distance (sim_ann_pq_adc's table lookups) instead of "
    "full-vector math. At 100 TB this composes both savings: cell "
    "pruning cuts the candidate set ~|cells|x (partition-prunable when "
    "the table is partitioned by cell), PQ cuts per-candidate cost to "
    "M lookups + adds over 1-byte codes held in RAM. Re-ranking the "
    "ADC top-k with exact distances (the production refinement step) "
    "is the brute-force operator applied to k rows — composition, not "
    "new machinery. PROMOTED from rows-only in r8: full oracle (the "
    "ADC oracle + cell filter — assignment per vector is independent, "
    "so encoding the whole corpus then filtering equals encoding the "
    "cell).",
    tags=("similarity",),
)
def sim_ann_ivf_pq(spark, sf_dir):
    e = _emb(spark, sf_dir)
    qrow = e.filter(F.col("vec_id") == QUERY_VEC_ID).head()
    q = [float(x) for x in qrow["embedding"]]
    qlabel = qrow["label"]
    dim = len(q)
    sub = dim // PQ_M
    cb = train_pq_codebooks(e, dim)

    def sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    dtab = [
        [sq(q[m * sub : (m + 1) * sub], cb[m][k]) for k in range(PQ_K)]
        for m in range(PQ_M)
    ]
    dt_df = e.sparkSession.createDataFrame([(dtab,)], "dt: array<array<double>>")
    # IVF: prune to the query's cell BEFORE encoding/ranking
    cell = e.filter(
        (F.col("label") == F.lit(qlabel)) & (F.col("vec_id") != QUERY_VEC_ID)
    )
    coded = _with_codebooks(cell, cb).select(
        "vec_id",
        "label",
        F.array(*[_pq_assign_expr(m, sub) for m in range(PQ_M)]).alias("codes"),
    )
    approx = F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.element_at(F.col("dt"), m + 1), F.element_at(F.col("codes"), m + 1) + 1
        ),
    )
    return (
        coded.crossJoin(F.broadcast(dt_df))
        .select("vec_id", "label", approx.alias("approx_l2"))
        .orderBy(F.asc("approx_l2"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@register(
    "sim_knn_classify",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id < {BATCH_QUERIES}),
    ranked AS (
        SELECT q.qid, e.label,
               ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC,
                            e.vec_id) AS rnk
        FROM embeddings e JOIN q ON e.vec_id != q.qid),
    votes AS (
        SELECT qid, label, COUNT(*) AS votes, MIN(rnk) AS best_rnk
        FROM ranked WHERE rnk <= {TOP_K}
        GROUP BY qid, label)
    SELECT qid, label AS predicted_label, CAST(votes AS BIGINT) AS votes
    FROM (SELECT qid, label, votes,
                 ROW_NUMBER() OVER (
                     PARTITION BY qid
                     ORDER BY votes DESC, best_rnk ASC, label ASC) AS rn
          FROM votes)
    WHERE rn = 1
    """,
    doc="similarity: k-NN classification — majority label among the "
    "exact cosine top-10 neighbors of each query vector, ties broken by "
    "best (nearest) neighbor rank then smallest label. Built on the "
    "sim_topk_batch shape: ONE corpus scan for all queries, broadcast "
    "query batch, WindowGroupLimit-pre-filtered per-query top-k; the "
    "vote aggregation then touches only Q*k rows. At 100 TB the corpus "
    "scan dominates and amortizes over the whole query batch.",
    tags=("similarity", "r4b"),
)
def sim_knn_classify(spark, sf_dir):
    from pyspark.sql.window import Window

    e = _emb(spark, sf_dir)
    q = F.broadcast(
        e.filter(F.col("vec_id") < BATCH_QUERIES).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
    )
    scored = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "label",
            cosine_similarity("embedding", "qv").alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    topk = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )
    votes = topk.groupBy("qid", "label").agg(
        F.count(F.lit(1)).alias("votes"), F.min("rnk").alias("best_rnk")
    )
    w2 = Window.partitionBy("qid").orderBy(
        F.desc("votes"), F.asc("best_rnk"), F.asc("label")
    )
    return (
        votes.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select("qid", F.col("label").alias("predicted_label"), "votes")
    )


MMR_POOL = 20
MMR_K = 5
MMR_LAMBDA = 0.7


def _mmr_oracle(dim: int = 64) -> str:
    """Full oracle for the MMR greedy chain (r7, promoted from
    rows-only): the selection loop is BOUNDED (k=5 picks over a 20-item
    pool), so it unrolls into five argmax CTE steps. Every float on both
    engines is the same left-to-right fold over the same float32→double
    widenings (the sim_ann_lsh idiom: Spark's ``aggregate`` 0.0-fold ==
    DuckDB's init-less ``list_reduce``; the driver-side greedy mirrors
    it with sequential Python folds — NOT numpy, whose pairwise/BLAS
    summation order differs), and MAX over a selected set is order-free,
    so the per-step scores are bit-identical and the argmax chain picks
    identical ids. The 1-λ weight is embedded as Python's exact float
    repr (0.30000000000000004): DuckDB's DECIMAL 1 - 0.7 lands half an
    ulp away."""
    lam = repr(MMR_LAMBDA)
    oml = repr(1.0 - MMR_LAMBDA)
    sq = (
        "sqrt(list_reduce(list_transform({v}, x -> CAST(x AS DOUBLE)"
        " * CAST(x AS DOUBLE)), (a, b) -> a + b))"
    )
    parts = [
        f"""q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
               {sq.format(v="embedding")} AS qn
        FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    pool AS (
        SELECT e.vec_id,
               list_reduce(
                   list_transform(range(1, {dim + 1}),
                       i -> CAST(e.embedding[i] AS DOUBLE) * q.qv[i]),
                   (a, b) -> a + b)
               / ({sq.format(v="e.embedding")} * q.qn) AS cos
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id != {QUERY_VEC_ID}
        ORDER BY cos DESC, e.vec_id ASC LIMIT {MMR_POOL}),
    nv AS (
        SELECT e.vec_id,
               list_transform(e.embedding,
                   x -> CAST(x AS DOUBLE) / {sq.format(v="e.embedding")}) AS v
        FROM embeddings e JOIN pool p ON e.vec_id = p.vec_id)"""
    ]
    for k in range(1, MMR_K + 1):
        if k == 1:
            score = f"CAST({lam} AS DOUBLE) * p.cos - CAST({oml} AS DOUBLE) * 0.0"
            filt = "TRUE"
        else:
            score = (
                f"CAST({lam} AS DOUBLE) * p.cos - CAST({oml} AS DOUBLE)"
                " * COALESCE(mx.d, 0.0)"
            )
            filt = f"p.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})"
        mx_join = (
            ""
            if k == 1
            else f"""
            LEFT JOIN (
                SELECT a.vec_id,
                       MAX(list_reduce(
                           list_transform(range(1, {dim + 1}),
                               i -> a.v[i] * b.v[i]),
                           (x, y) -> x + y)) AS d
                FROM nv a JOIN nv b
                  ON b.vec_id IN (SELECT vec_id FROM sel{k - 1})
                GROUP BY a.vec_id) mx ON mx.vec_id = p.vec_id"""
        )
        parts.append(
            f"""s{k} AS (
        SELECT vec_id, cos FROM (
            SELECT p.vec_id, p.cos, {score} AS score
            FROM pool p{mx_join}
            WHERE {filt})
        ORDER BY score DESC, vec_id ASC LIMIT 1)"""
        )
        prev_sel = f"sel{k - 1}" if k > 1 else None
        if k == 1:
            parts.append(f"sel1 AS (SELECT vec_id FROM s1)")
        else:
            parts.append(
                f"sel{k} AS (SELECT vec_id FROM {prev_sel}"
                f" UNION ALL SELECT vec_id FROM s{k})"
            )
    union = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({k} AS INT) AS mmr_rank, vec_id, cos AS cosine FROM s{k}"
        for k in range(1, MMR_K + 1)
    )
    return "\n    WITH " + ",\n    ".join(parts) + "\n    " + union + "\n    "


@register(
    "sim_mmr_rerank",
    _mmr_oracle(),
    doc="retrieval post-processing: Maximal-Marginal-Relevance "
    "re-ranking — the distributed scan produces the top-{pool} cosine "
    "candidates (same plan as sim_topk_bruteforce), then a greedy "
    "driver-side selection picks k of them maximizing "
    "lambda*sim(q,d) - (1-lambda)*max_sim(d, selected): relevance "
    "with redundancy suppression, the standard diversifier for RAG "
    "context packing and eval-set construction. Driver work is "
    "O(pool^2) on a BOUNDED pool (the sim_kmeans k*dim discipline — "
    "never the corpus); ties break by vec_id. PROMOTED from rows-only "
    "in r7: the bounded greedy unrolls into five SQL argmax steps, and "
    "the driver-side similarity math uses sequential left-to-right "
    "folds (bit-identical to both engines' list folds — numpy's "
    "pairwise/BLAS summation was the only obstacle), so pool, scores "
    "and the selected-id chain are all exact — raw-double cosines in "
    "the output, no quantization needed. Also verified by the "
    "independent pure-Python re-derivation incl. the "
    "first-pick==top-cosine and pairwise-diversity invariants.",
    tags=("similarity", "r4c"),
)
def sim_mmr_rerank(spark, sf_dir):
    import math

    emb = _emb(spark, sf_dir)
    q = F.broadcast(
        emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
            F.col("embedding").alias("qv")
        )
    )
    pool_rows = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(q)
        .select("vec_id", cosine_similarity("embedding", "qv").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(MMR_POOL)
        .collect()
    )
    ids = [r["vec_id"] for r in pool_rows]
    rel = {r["vec_id"]: float(r["cos"]) for r in pool_rows}

    def _normed(v: list) -> list:
        # sequential 0.0-init fold == Spark aggregate == DuckDB
        # list_reduce — bit-identical norms (numpy would pairwise-sum)
        s = 0.0
        for x in v:
            s += float(x) * float(x)
        n = math.sqrt(s)
        return [float(x) / n for x in v]

    vecs = {
        r["vec_id"]: _normed(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(ids)).collect()
    }

    def _dot(a: list, b: list) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    selected: list[int] = []
    remaining = sorted(ids)
    while remaining and len(selected) < MMR_K:
        best_id, best_score = None, None
        for cand in remaining:
            div = max(
                (_dot(vecs[cand], vecs[s]) for s in selected), default=0.0
            )
            score = MMR_LAMBDA * rel[cand] - (1 - MMR_LAMBDA) * div
            if best_score is None or score > best_score or (
                score == best_score and cand < best_id
            ):
                best_id, best_score = cand, score
        selected.append(best_id)
        remaining.remove(best_id)

    out = [(rank + 1, vid, rel[vid]) for rank, vid in enumerate(selected)]
    return spark.createDataFrame(out, "mmr_rank INT, vec_id LONG, cosine DOUBLE")


# ---------------------------------------------------------------------------
# Radius / range search (round 4, continuation)
# ---------------------------------------------------------------------------

RANGE_THRESHOLD = 0.3
RANGE_QUERY_COUNT = 10


@register(
    "sim_range_search",
    f"""
    WITH qs AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < {RANGE_QUERY_COUNT})
    SELECT query_id, e.vec_id AS match_id, e.label
    FROM embeddings e, qs
    WHERE e.vec_id != query_id
      AND list_cosine_similarity(e.embedding, qv) >= {RANGE_THRESHOLD}
    """,
    doc="similarity search: RANGE (radius) search — every corpus vector "
    "with cosine >= 0.3 of each query vector, the retrieval mode behind "
    "'find all near-duplicates of these N items' (top-k bounds the "
    "result count; radius bounds the similarity — recall-complete for "
    "its threshold). Plan: the query batch broadcasts (bounded: N "
    "query vectors), the corpus streams once per partition through a "
    "codegen'd cosine filter — ONE scan for the whole batch, no "
    "shuffle at all (contrast sim_topk_batch's per-query heap merge; a "
    "radius emit needs no ordering). At 100 TB the corpus scan "
    "parallelizes per-file and the scale path swaps the full scan for "
    "the IVF cell prune (sim_ann_ivf) with the same threshold filter. "
    "Output excludes the float cos (vec ids + labels only) so the "
    "hash compare is float-fold-free; boundary sensitivity is the "
    "same list_cosine_similarity threshold discipline as "
    "dedup_semantic_within_label.",
    tags=("similarity", "r4d"),
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    qs = F.broadcast(
        emb.filter(F.col("vec_id") < RANGE_QUERY_COUNT).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
    )
    return (
        emb.crossJoin(qs)
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (cosine_similarity("embedding", "qv") >= RANGE_THRESHOLD)
        )
        .select("query_id", F.col("vec_id").alias("match_id"), "label")
    )


# ---------------------------------------------------------------------------
# ANN quality evaluation (round 4, continuation)
# ---------------------------------------------------------------------------


@register(
    "sim_ann_recall_report",
    f"""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qv, label AS qlabel
        FROM embeddings WHERE vec_id < {BATCH_QUERIES}),
    exact AS (
        SELECT qid, vec_id FROM (
            SELECT q.qid, e.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.qid
                       ORDER BY list_cosine_similarity(e.embedding, q.qv)
                                DESC, e.vec_id) AS rnk
            FROM embeddings e JOIN q ON e.vec_id != q.qid)
        WHERE rnk <= {TOP_K}),
    ivf AS (
        SELECT qid, vec_id FROM (
            SELECT q.qid, e.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.qid
                       ORDER BY list_cosine_similarity(e.embedding, q.qv)
                                DESC, e.vec_id) AS rnk
            FROM embeddings e
            JOIN q ON e.vec_id != q.qid AND e.label = q.qlabel)
        WHERE rnk <= {TOP_K}),
    cells AS (
        SELECT q.qid, CAST(COUNT(*) AS BIGINT) AS cell_size
        FROM embeddings e
        JOIN q ON e.label = q.qlabel AND e.vec_id != q.qid
        GROUP BY q.qid),
    corpus AS (SELECT COUNT(*) AS n FROM embeddings),
    hits AS (
        SELECT e.qid, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM exact e JOIN ivf i ON e.qid = i.qid AND e.vec_id = i.vec_id
        GROUP BY e.qid)
    SELECT q.qid,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {TOP_K} AS recall_at_k,
           c.cell_size,
           CAST(c.cell_size AS DOUBLE) / corpus.n AS scan_fraction
    FROM q
    JOIN cells c ON q.qid = c.qid
    LEFT JOIN hits h ON q.qid = h.qid
    CROSS JOIN corpus
    """,
    doc="similarity quality evaluation: IVF recall measured IN-ENGINE — "
    "for each query in the batch, exact top-10 (full-scan truth) vs "
    "the cell-pruned top-10, reported as recall@k NEXT TO the scan "
    "fraction the pruning bought. This pair of numbers is the whole "
    "ANN trade: recall lost vs corpus fraction not scanned; rerun the "
    "report after changing the cell count (or swapping sim_kmeans "
    "labels in for the fixture's labels) and read the trade directly. "
    "One corpus scan serves both sides (broadcast Q-row batch, two "
    "WindowGroupLimit-pruned per-query top-k windows, one keyed "
    "intersection). Scale: truth is the linear-scan baseline — at "
    "100 TB the recall audit runs on a query SAMPLE (truth cost is "
    "per-query, the IVF side stays indexed), the standard ANN-bench "
    "protocol. Integer counts + identically-spelled divisions: "
    "hash-exact.",
    tags=("similarity", "evaluation", "r4d"),
)
def sim_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _emb(spark, sf_dir)
    q = F.broadcast(
        e.filter(F.col("vec_id") < BATCH_QUERIES).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            F.col("label").alias("qlabel"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    scored = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            "label",
            cosine_similarity("embedding", "qv").alias("cos"),
        )
    )
    exact = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "vec_id")
    )
    ivf = (
        scored.filter(F.col("label") == F.col("qlabel"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("qid", "vec_id")
    )
    cells = (
        scored.filter(F.col("label") == F.col("qlabel"))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("cell_size"))
    )
    corpus = e.agg(F.count(F.lit(1)).alias("n"))
    hits = (
        exact.join(ivf, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        q.select("qid")
        .join(cells, "qid")
        .join(hits, "qid", "left")
        .crossJoin(F.broadcast(corpus))
        .select(
            "qid",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)).cast("double") / TOP_K
            ).alias("recall_at_k"),
            "cell_size",
            (F.col("cell_size").cast("double") / F.col("n")).alias(
                "scan_fraction"
            ),
        )
    )


# ---------------------------------------------------------------------------
# PQ with exact refinement (round 4, third continuation)
# ---------------------------------------------------------------------------

PQ_REFINE_SHORTLIST = 50


@register(
    "sim_ann_pq_refine",
    f"""
    WITH {_pq_adc_ctes()},
    short AS (
        SELECT vec_id, approx_l2 FROM scored
        WHERE vec_id != {QUERY_VEC_ID}
        ORDER BY approx_l2 ASC, vec_id ASC
        LIMIT {PQ_REFINE_SHORTLIST})
    SELECT sh.vec_id, e.label, sh.approx_l2,
           list_reduce(list_transform(range(1, {EMB_DIM + 1}),
               i -> (e.emb[i] - q.qv[i]) * (e.emb[i] - q.qv[i])),
               (x, y) -> x + y) AS exact_l2
    FROM short sh JOIN e USING (vec_id) CROSS JOIN q
    ORDER BY exact_l2 ASC, sh.vec_id ASC
    LIMIT {TOP_K}
    """,
    doc="similarity: PQ-ADC with EXACT REFINEMENT — the standard "
    "two-stage ANN serving shape (FAISS IndexRefineFlat): the ADC "
    "scan's cheap approximate distances shortlist 50 candidates, then "
    "ONLY those 50 fetch their full vectors and re-rank by true L2 "
    "(zip_with square-difference fold, sequential and deterministic), "
    "top-10 by exact distance. Completes the PQ family: sim_pq_encode "
    "(codes), sim_ann_pq_adc (approximate scan), sim_ann_ivf_pq "
    "(cell-pruned scan) — refine is what buys back accuracy at the "
    "cost of shortlist-many exact computations instead of corpus-many. "
    "Scale: the shortlist join is a broadcast semi (50 ids), the "
    "refine cost is O(shortlist x dim) regardless of corpus size; "
    "recall is bounded by what the shortlist caught (the pytest pins "
    "the refined order bit-equal to brute-force order RESTRICTED to "
    "the shortlist — the refine stage itself is exact). PROMOTED from "
    "rows-only in r8: full oracle — shortlist from the ADC oracle, "
    "exact_l2 as the same per-index fold, raw doubles.",
    tags=("similarity", "r4e"),
)
def sim_ann_pq_refine(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q_row = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    shortlist = _pq_adc_ranked(spark, sf_dir, PQ_REFINE_SHORTLIST).select(
        "vec_id", "approx_l2"
    )
    cands = e.join(shortlist, "vec_id").crossJoin(F.broadcast(q_row))
    # float32 storage -> double BEFORE the subtraction: the widening is
    # exact, and the fold then runs entirely in float64 (replica-matched)
    exact_l2 = F.aggregate(
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.col("qv").cast("array<double>"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cands.select(
            "vec_id", "label", "approx_l2", exact_l2.alias("exact_l2")
        )
        .orderBy(F.asc("exact_l2"), F.asc("vec_id"))
        .limit(TOP_K)
    )
