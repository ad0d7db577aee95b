"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline (quantized integer dot
products so a DuckDB oracle reproduces it bit-for-bit); the scale path is
random-hyperplane LSH bucketing, which turns the O(n*q) score matrix into
per-bucket equi-joins.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import int_dot, quantized


def _quantized_with_norm(embeddings: DataFrame) -> DataFrame:
    q = embeddings.select("vec_id", quantized(F.col("embedding")).alias("q"))
    return q.withColumn("nrm", F.sqrt(int_dot(F.col("q"), F.col("q")).cast("double")))


def brute_force_topk(
    embeddings: DataFrame, k: int = 5, n_queries: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Scores are double divisions of exact integer dot products — identical
    across engines; ties broken by vec_id for full determinism.
    """
    q = _quantized_with_norm(embeddings)
    queries = q.filter(F.col("vec_id") < n_queries)
    score = (
        int_dot(F.col("a.q"), F.col("b.q")).cast("double")
        / (F.col("a.nrm") * F.col("b.nrm"))
    )
    scored = (
        F.broadcast(queries).alias("a")
        .join(q.alias("b"), F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            score.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_hyperplanes(dim: int, n_planes: int = 12, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def ivf_centroids(dim: int, n_centroids: int = 8, seed: int = 11) -> np.ndarray:
    """Deterministic coarse quantizer (unit-norm random centroids). A trained
    k-means quantizer drops in here unchanged — assignment/probe plans below
    only see literal arrays."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest coarse
    centroid (the inverted list), probe the ``n_probe`` best lists per query,
    score exactly within the probed lists only.

    All assignment math is JVM-side: per-centroid dots are aggregate
    expressions over literal arrays, and argmax/top-n_probe come from
    lexicographic array_max / array_sort over (score, idx) structs — no UDF.
    At scale the inverted lists are an equi-join key, so the probe is a
    shuffle of (query x n_probe) rows against list-partitioned data; skewed
    lists (hot centroids) split under AQE. Recall tunes with n_probe.
    """
    cents = ivf_centroids(dim, n_centroids, seed)

    def cent_scores() -> list:
        return [
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.array(*[F.lit(float(x)) for x in cents[c]]),
                    lambda e, p: e.cast("double") * p,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in range(n_centroids)
        ]

    # (score, idx) structs: lexicographic max = argmax, sort desc = top lists
    score_structs = F.array(
        *[
            F.struct(s.alias("s"), F.lit(i).alias("c"))
            for i, s in enumerate(cent_scores())
        ]
    )
    nearest = F.array_max(score_structs).getField("c")
    q = _quantized_with_norm(embeddings)
    assigned = embeddings.select("vec_id", nearest.alias("list_id")).join(q, "vec_id")

    probes = embeddings.filter(F.col("vec_id") < n_queries).select(
        "vec_id",
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(score_structs)), 1, n_probe),
                lambda st: st.getField("c"),
            )
        ).alias("list_id"),
    )
    score = (
        int_dot(F.col("a.q"), F.col("b.q")).cast("double")
        / (F.col("a.nrm") * F.col("b.nrm"))
    )
    scored = (
        F.broadcast(probes.join(q, "vec_id")).alias("a")
        .join(assigned.alias("b"), "list_id")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            score.alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_planes: int = 12,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature -> bucket equi-join ->
    exact cosine within bucket.

    At 100 TB the bucket join shuffles only (bucket, vec) pairs with matching
    signatures; skewed buckets are split by AQE. Recall is tunable via
    n_planes (fewer planes = bigger buckets = higher recall).
    """
    planes = lsh_hyperplanes(dim, n_planes)
    # signature bit b = sign(dot(embedding, plane_b)) — computed JVM-side from
    # literal plane arrays (no UDF): sum over zip_with products.
    plane_cols = [
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(float(x)) for x in planes[b]]),
                lambda e, p: e.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        for b in range(n_planes)
    ]
    sig = F.concat_ws(
        "", *[F.when(c >= 0, F.lit("1")).otherwise(F.lit("0")) for c in plane_cols]
    )
    q = _quantized_with_norm(embeddings)
    bucketed = (
        embeddings.select("vec_id", sig.alias("bucket"))
        .join(q, "vec_id")
    )
    queries = bucketed.filter(F.col("vec_id") < n_queries)
    score = (
        int_dot(F.col("a.q"), F.col("b.q")).cast("double")
        / (F.col("a.nrm") * F.col("b.nrm"))
    )
    scored = (
        F.broadcast(queries).alias("a")
        .join(bucketed.alias("b"), "bucket")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            score.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
