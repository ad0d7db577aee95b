"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline (quantized integer dot
products so a DuckDB oracle reproduces it bit-for-bit); the scale path is
random-hyperplane LSH bucketing, which turns the O(n*q) score matrix into
per-bucket equi-joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import int_dot, quantized

# Single source of truth for the coarse-quantizer seed: kmeans_fit,
# ivf_centroids and every derived-units cache key (ivfpq_topk) must agree,
# or a drifted default would silently serve stale cached codebooks
# (r5 ADVICE).
KMEANS_DEFAULT_SEED = 11


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


def ivf_centroids(
    dim: int, n_centroids: int = 8, seed: int = KMEANS_DEFAULT_SEED
) -> np.ndarray:
    """Deterministic coarse quantizer (unit-norm random centroids). A trained
    k-means quantizer drops in here unchanged — assignment/probe plans below
    only see literal arrays."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _unit_vectors(embeddings: DataFrame) -> DataFrame:
    """(vec_id, u: array<double>) with u = embedding / ||embedding|| — all
    JVM-side (transform + aggregate fold, no UDF)."""
    from ..functions.arrays import norm

    v = embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    return v.select(
        "vec_id",
        F.transform(F.col("v"), lambda x: x / norm(F.col("v"))).alias("u"),
    )


def _assign_expr(cents: np.ndarray):
    """(best_score, best_cluster) columns: argmax over the centroids in ONE
    Arrow-batched matmul per batch (ties -> lowest idx, np.argmax's rule —
    matching the lexicographic struct argmax this replaces; the literal-fold
    JVM tree cost ~2.8s/round on 2000 vectors, overhead-bound)."""
    from pyspark.sql.functions import pandas_udf

    c = cents.astype(np.float64)

    @pandas_udf("struct<score:double, cluster:int>")
    def _best(u: pd.Series) -> pd.DataFrame:
        x = np.stack(u.to_numpy()).astype(np.float64)
        s = x @ c.T
        cl = s.argmax(axis=1)
        return pd.DataFrame(
            {
                "score": np.take_along_axis(s, cl[:, None], axis=1)[:, 0],
                "cluster": cl.astype(np.int32),
            }
        )

    best = _best(F.col("u"))
    return best.getField("score").alias("score"), best.getField(
        "cluster"
    ).alias("cluster")


# FAISS ``max_points_per_centroid`` convention: Lloyd's rounds see at most
# ~256 points per centroid. Above that the extra points sharpen the
# centroids negligibly but each round pays a full corpus scan — at 10^12
# vectors, 4 training rounds would be 4 corpus passes for a k x dim result.
_TRAIN_POINTS_PER_CENTROID = 256


def _train_sample(unit: DataFrame, cap: int, n_rows: int) -> DataFrame:
    """Deterministic ~``cap``-row training subset of a (vec_id, u, ...)
    frame. A pure hash-threshold filter on vec_id: no shuffle, no count
    inside the filter, and the selected row SET is a function of vec_id
    alone (stable across partitioning, retries, and cluster sizes —
    ``df.sample`` is none of those). Expected size = cap with binomial
    jitter; a no-op when the corpus already fits the cap."""
    if n_rows <= cap:
        return unit
    denom = 1 << 20
    thresh = max(1, -(-denom * cap // n_rows))  # ceil
    return unit.filter(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(denom)) < F.lit(thresh)
    )


def kmeans_fit(
    embeddings: DataFrame,
    n_clusters: int = 8,
    n_iter: int = 4,
    dim: int = 64,
    seed: int = KMEANS_DEFAULT_SEED,
    sample_cap: int | None = None,
) -> tuple[np.ndarray, list[float]]:
    """Distributed spherical k-means (Lloyd's) — the trainer for the IVF
    coarse quantizer (``ivf_centroids`` is the untrained drop-in).

    Iterative-algorithm shape (like ``dedup.dup_clusters``): the driver
    coordinates rounds, but per round the data motion is ONE scan of the
    unit-normalized vectors + ONE partial-aggregated shuffle of at most
    ``n_clusters`` rows of (dim sums, count, score sum) per task — the
    collect is k x dim doubles (tiny, independent of corpus size), never
    vectors. Assignment is one Arrow-batched matmul per batch
    (``_assign_expr``; no broadcast join, no per-row Python), so at 100 TB
    each round is a map-only pass + a k-row reduce.

    Spherical Lloyd's on unit vectors with normalized-mean updates is
    monotone in the objective sum(max_c cos(x, c)) — asserted by pytest.

    ``sample_cap`` bounds the TRAINING set (None → the FAISS convention of
    256·n_clusters; 0 disables sampling): when the corpus exceeds the cap,
    rounds iterate over a deterministic hash-sampled ~cap-row subset
    (``_train_sample``), so training cost is corpus-INDEPENDENT — one
    metadata-cheap count() + n_iter scans of the cached sample — and only
    the single downstream assign/encode pass touches every row. The
    returned objective history is then over the sample. At the registry /
    bench scales (500-2000 vectors) the default cap never binds, so
    outputs are unchanged; at 10^12 it is the difference between 4 corpus
    passes and none.

    Trained centroids are cached by (corpus digest, params) via
    ``ann_cache`` — the reference analog is a pre-registered external
    index (SURVEY §2 S3), so repeat invocations over the same parquet
    corpus pay training once; a cache hit returns the original run's
    objective history. In-memory frames digest to None and always train.

    Returns (unit-norm centroids [n_clusters x dim], per-round objective).
    """
    from .ann_cache import get_or_train

    params = dict(
        n_clusters=n_clusters, n_iter=n_iter, dim=dim, seed=seed,
        sample_cap=sample_cap,
    )
    return get_or_train(
        "kmeans",
        embeddings,
        params,
        lambda: _kmeans_fit_impl(
            embeddings, n_clusters, n_iter, dim, seed, sample_cap
        ),
    )


def _kmeans_fit_impl(
    embeddings: DataFrame,
    n_clusters: int,
    n_iter: int,
    dim: int,
    seed: int,
    sample_cap: int | None,
) -> tuple[np.ndarray, list[float]]:
    cents = ivf_centroids(dim, n_clusters, seed)
    cap = (
        _TRAIN_POINTS_PER_CENTROID * n_clusters
        if sample_cap is None
        else sample_cap
    )
    unit = _unit_vectors(embeddings)
    if cap:
        unit = _train_sample(unit, cap, embeddings.count())
    unit = unit.cache()
    history: list[float] = []
    try:
        for _ in range(n_iter):
            score, cluster = _assign_expr(cents)
            assigned = unit.select("u", score, cluster)
            sums = [
                F.sum(F.element_at(F.col("u"), i + 1)).alias(f"s{i}")
                for i in range(dim)
            ]
            rows = (
                assigned.groupBy("cluster")
                .agg(
                    *sums,
                    F.count(F.lit(1)).alias("n"),
                    F.sum("score").alias("obj"),
                )
                .collect()
            )
            history.append(float(sum(r["obj"] for r in rows)))
            new_cents = cents.copy()  # empty clusters keep their centroid
            for r in rows:
                m = np.array([r[f"s{i}"] for i in range(dim)])
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    new_cents[r["cluster"]] = m / nrm
            cents = new_cents
    finally:
        unit.unpersist()
    return cents, history


def kmeans_assign(
    embeddings: DataFrame, cents: np.ndarray
) -> DataFrame:
    """(vec_id, cluster, score=cos(x, centroid)) for trained centroids."""
    score, cluster = _assign_expr(cents)
    return _unit_vectors(embeddings).select("vec_id", cluster, score)


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    dim: int = 64,
    seed: int = KMEANS_DEFAULT_SEED,
    cents: np.ndarray | None = None,
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

    ``cents`` takes a trained quantizer (``kmeans_fit``) in place of the
    default random one; the probe/score plan is identical either way.
    """
    from pyspark.sql.functions import pandas_udf

    if cents is None:
        cents = ivf_centroids(dim, n_centroids, seed)
    else:
        n_centroids = len(cents)

    # Assignment and probe selection are ONE Arrow matmul per batch against
    # the centroid matrix riding the closure — the same kernel pattern as
    # kmeans/_adc_shortlist. The earlier form folded 2 x n_centroids x dim
    # literal arrays into the plan: fine at 8 lists, and exactly the
    # thousand-literal codegen blowup this repo has measured at 4-10x once
    # n_centroids reaches realistic IVF sizes (10^3-10^4 lists). argmax over
    # raw embeddings equals argmax over unit vectors (positive per-row
    # scale). list_id/probes, quantized vector, and norm still come out of
    # ONE projection over the scan — a vec_id self-join to attach them would
    # shuffle the whole vector table twice (measured 2-6x slower at sf0.1).
    c_mat = cents.astype(np.float64)

    @pandas_udf("int")
    def _best_list(emb: pd.Series) -> pd.Series:
        x = np.stack(emb.to_numpy()).astype(np.float64)
        return pd.Series((x @ c_mat.T).argmax(axis=1).astype(np.int32))

    @pandas_udf("array<int>")
    def _probe_lists(emb: pd.Series) -> pd.Series:
        x = np.stack(emb.to_numpy()).astype(np.float64)
        s = x @ c_mat.T
        top = np.argsort(-s, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    assigned = embeddings.select(
        "vec_id",
        _best_list(F.col("embedding")).alias("list_id"),
        quantized(F.col("embedding")).alias("q"),
    ).withColumn("nrm", F.sqrt(int_dot(F.col("q"), F.col("q")).cast("double")))

    probes = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select(
            "vec_id",
            F.explode(_probe_lists(F.col("embedding"))).alias("list_id"),
            quantized(F.col("embedding")).alias("q"),
        )
        .withColumn("nrm", F.sqrt(int_dot(F.col("q"), F.col("q")).cast("double")))
    )
    score = (
        int_dot(F.col("a.q"), F.col("b.q")).cast("double")
        / (F.col("a.nrm") * F.col("b.nrm"))
    )
    scored = (
        F.broadcast(probes).alias("a")
        .join(assigned.alias("b"), "list_id")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            score.alias("cosine"),
        )
        # ONE exchange serves both the pair-dedup and the ranking window:
        # hashpartitioning(query_id) satisfies the dedup's clustered
        # distribution on (query_id, neighbor_id) AND the window's on
        # (query_id), so neither inserts its own shuffle (r6: 2 Exchange ->
        # 1, ~-17% on the sibling LSH path, identical rows)
        .repartition("query_id")
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
    n_tables: int = 1,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature -> bucket equi-join ->
    exact cosine within bucket.

    Multi-table OR-amplification: each of ``n_tables`` signature tables uses
    its own ``n_planes`` hyperplanes; a pair is a candidate if it collides in
    ANY table (P = 1-(1-p^b)^L vs the single-table p^b, which collapses to
    ~0 recall when true neighbors are only moderately close). Candidate rows
    are exploded as (table:signature) keys, so at 100 TB the bucket join
    shuffles n_tables copies of (bucket, quantized vec) — the standard LSH
    space/recall trade — and skewed buckets are split by AQE.

    ``multiprobe`` additionally probes, per table, every bucket at Hamming
    distance 1 from the query's signature — fanning out ONLY the broadcast
    query side (n_queries x n_tables x (n_planes+1) rows), never the corpus
    side, for a per-table hit probability of p^b + b*p^(b-1)*(1-p). Recall
    tunes with (n_planes down | n_tables up | multiprobe on).
    """
    planes = lsh_hyperplanes(dim, n_planes * n_tables).reshape(
        n_tables, n_planes, dim
    )
    # ALL n_tables*n_planes signature bits in ONE Arrow-batched matmul
    # (batch x dim) @ (dim x T*B): a 48-fold literal-array expression tree
    # here measured 11.2s at sf0.1 vs ~2s vectorized — the same
    # JVM-expression-tree-vs-numpy trade plans/shared.py documents. Buckets
    # are INTEGERS table*2^B + sig (no string assembly); multiprobe flips are
    # XORs of the packed signature.
    flat_planes = planes.reshape(n_tables * n_planes, dim)
    pows = (2 ** np.arange(n_planes)).astype(np.int64)

    def bucket_arrays(probe: bool):
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<long>")
        def _buckets(emb: pd.Series) -> pd.Series:
            x = np.stack(emb.to_numpy()).astype(np.float64)
            bits = (x @ flat_planes.T >= 0).reshape(-1, n_tables, n_planes)
            sig = bits @ pows  # (n, T) packed signatures
            base = (np.arange(n_tables, dtype=np.int64) << (n_planes + 1))
            out = sig + base  # table id in high bits
            if probe:
                flips = np.stack(
                    [out] + [out ^ (1 << b) for b in range(n_planes)], axis=2
                ).reshape(len(x), -1)
                return pd.Series(list(flips))
            return pd.Series(list(out))

        return _buckets

    def bucketize(df: DataFrame, probe: bool) -> DataFrame:
        # buckets, quantized vector, and norm in ONE projection over the scan
        # (a vec_id self-join here shuffled the vector table twice; measured
        # 6x slower at sf0.1), then one generator for the table fan-out
        return df.select(
            "vec_id",
            F.explode(bucket_arrays(probe)(F.col("embedding"))).alias("bucket"),
            quantized(F.col("embedding")).alias("q"),
        ).withColumn(
            "nrm", F.sqrt(int_dot(F.col("q"), F.col("q")).cast("double"))
        )

    bucketed = bucketize(embeddings, probe=False)
    queries = bucketize(
        embeddings.filter(F.col("vec_id") < n_queries), probe=multiprobe
    )
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
    if n_tables > 1 or multiprobe:
        # a pair colliding in several tables/probes scores identically each
        # time — collapse before ranking so duplicates can't occupy top-k.
        # repartition(query_id) first: one exchange then serves both the
        # dedup (clustered on a superset) and the ranking window (r6
        # measured: 2 Exchange -> 1, 1.29s -> 1.10s, identical rows)
        scored = scored.repartition("query_id").dropDuplicates(
            ["query_id", "neighbor_id"]
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def recall_vs_exact(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Per-query recall@k of an ANN result against the exact baseline.

    Both inputs carry (query_id, neighbor_id); output is one row per exact
    query: (query_id, n_hits, recall) with recall = |approx ∩ exact| /
    |exact| as an exact small-integer division (deterministic double). The
    denominator is the PER-QUERY exact result count, not the parameter k:
    when the exact baseline yields fewer than k neighbors (small or filtered
    corpus), dividing by k would understate recall and cap it below 1.0
    forever; ``k`` only bounds the exact list size from above. Queries the
    approx method missed entirely still appear, with recall 0.0 — silent
    drops would overstate quality.
    """
    a = approx.select("query_id", "neighbor_id")
    e = exact.select("query_id", "neighbor_id")
    hits = (
        e.join(a, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        e.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0))
                / F.least(F.col("n_exact"), F.lit(k))
            )
            .cast("double")
            .alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (FAISS-style ADC): compress unit vectors to m small
# codes, score queries against codes via per-subspace lookup tables, exact
# re-rank of the short candidate list. At 100 TB this is THE standard
# billion-vector architecture: the scored table carries m bytes per vector
# instead of dim*4, scoring costs m table lookups instead of dim multiplies,
# and the exact path only ever touches n_queries x rerank rows.
# ---------------------------------------------------------------------------

def _sub_slices(col, m: int, subdim: int) -> list:
    return [F.slice(col, s * subdim + 1, subdim) for s in range(m)]


def _pq_codes_udf(books: np.ndarray, with_dists: bool):
    """Arrow-batched assignment of every subspace's nearest code in ONE
    numpy pass per batch: (batch, m, subdim) against (m, k, subdim) via a
    broadcasted squared-distance einsum. An m*k literal-expression argmin
    tree for the same math measured ~10x slower at sf0.1 (the same
    JVM-expression-tree-vs-numpy trade plans/shared.py documents). Ties
    break to the lowest code (np.argmin takes the first minimum — same rule
    as the lexicographic struct argmin it replaces)."""
    from pyspark.sql.functions import pandas_udf

    m, _, subdim = books.shape

    def dists_all(u: pd.Series) -> np.ndarray:
        x = np.stack(u.to_numpy()).astype(np.float64).reshape(-1, m, subdim)
        # (n, m, k) squared distances without materializing the full diff:
        # ||x||^2 - 2 x.c + ||c||^2 per subspace
        xx = np.einsum("nmd,nmd->nm", x, x)[:, :, None]
        xc = np.einsum("nmd,mkd->nmk", x, books)
        cc = np.einsum("mkd,mkd->mk", books, books)[None, :, :]
        return xx - 2.0 * xc + cc

    if with_dists:

        @pandas_udf("struct<codes:array<int>, dists:array<double>>")
        def _codes_dists(u: pd.Series) -> pd.DataFrame:
            d = dists_all(u)
            codes = d.argmin(axis=2).astype(np.int32)
            dmin = np.take_along_axis(d, codes[:, :, None], axis=2)[:, :, 0]
            return pd.DataFrame({"codes": list(codes), "dists": list(dmin)})

        return _codes_dists

    @pandas_udf("array<int>")
    def _codes(u: pd.Series) -> pd.Series:
        return pd.Series(list(dists_all(u).argmin(axis=2).astype(np.int32)))

    return _codes


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 4,
    dim: int = 64,
    seed: int = 19,
    units: DataFrame | None = None,
    sample_cap: int | None = None,
    units_key: dict | None = None,
) -> tuple[np.ndarray, list[float]]:
    """Train per-subspace L2 codebooks (classic PQ Lloyd's) over the
    unit-normalized vectors. One scan per round for ALL m subspaces: codes
    are JVM-side argmins over literal codebooks, and the centroid update
    shuffles m rows of subdim floats per vector (same bytes as the vector,
    partial-aggregated map-side) — the collect is m*k*(subdim+1) doubles,
    corpus-independent. ``units`` substitutes a precomputed (vec_id, u)
    frame for the default unit-normalized vectors — IVF+PQ passes the
    per-cluster RESIDUALS here. ``sample_cap`` bounds the training set
    exactly as in ``kmeans_fit`` (None → 256·k; 0 disables; row count
    taken from ``embeddings``, which has the same cardinality as any
    ``units`` frame derived from it) — rounds then scan a deterministic
    ~cap-row cached sample instead of the corpus, and only ``pq_encode``
    touches every row. Returns (codebooks [m,k,subdim], per-round total
    quantization error over the training set — monotone non-increasing,
    asserted by pytest).

    Codebooks cache like ``kmeans_fit``'s centroids (corpus digest +
    params via ``ann_cache``). A caller passing a derived ``units`` frame
    MUST supply ``units_key`` describing its deterministic derivation
    (IVF+PQ residuals are fixed by the coarse-quantizer params), because
    the derived frame scans the same files as the raw corpus and would
    otherwise collide with raw-unit training; with ``units`` and no
    ``units_key`` the call trains uncached."""
    from .ann_cache import get_or_train

    if units is not None and units_key is None:
        return _pq_train_impl(
            embeddings, m, k, n_iter, dim, seed, units, sample_cap
        )
    params = dict(
        m=m, k=k, n_iter=n_iter, dim=dim, seed=seed, sample_cap=sample_cap,
        units_key=units_key,
    )
    return get_or_train(
        "pq",
        embeddings,
        params,
        lambda: _pq_train_impl(
            embeddings, m, k, n_iter, dim, seed, units, sample_cap
        ),
    )


def _pq_train_impl(
    embeddings: DataFrame,
    m: int,
    k: int,
    n_iter: int,
    dim: int,
    seed: int,
    units: DataFrame | None,
    sample_cap: int | None,
) -> tuple[np.ndarray, list[float]]:
    subdim = dim // m
    rng = np.random.default_rng(seed)
    books = rng.standard_normal((m, k, subdim)) * 0.1
    cap = _TRAIN_POINTS_PER_CENTROID * k if sample_cap is None else sample_cap
    unit = units if units is not None else _unit_vectors(embeddings)
    if cap:
        unit = _train_sample(unit, cap, embeddings.count())
    unit = unit.cache()
    history: list[float] = []
    try:
        for _ in range(n_iter):
            subs = _sub_slices(F.col("u"), m, subdim)
            cd = _pq_codes_udf(books, with_dists=True)(F.col("u"))
            picked = F.array(
                *[
                    F.struct(
                        F.col("cd.codes")[s].alias("code"),
                        F.col("cd.dists")[s].alias("d"),
                        subs[s].alias("sub"),
                    )
                    for s in range(m)
                ]
            )
            exploded = (
                unit.withColumn("cd", cd)
                .select(F.posexplode(picked).alias("s", "x"))
                .select(
                    "s",
                    F.col("x.code").alias("code"),
                    F.col("x.d").alias("d"),
                    F.col("x.sub").alias("sub"),
                )
            )
            rows = (
                exploded.groupBy("s", "code")
                .agg(
                    *[F.avg(F.col("sub")[i]).alias(f"a{i}") for i in range(subdim)],
                    F.count(F.lit(1)).alias("n"),
                    F.sum("d").alias("err"),
                )
                .collect()
            )
            history.append(float(sum(r["err"] for r in rows)))
            new_books = books.copy()  # empty cells keep their centroid
            for r in rows:
                new_books[r["s"]][r["code"]] = np.array(
                    [r[f"a{i}"] for i in range(subdim)]
                )
            books = new_books
    finally:
        unit.unpersist()
    return books, history


def pq_encode(
    embeddings: DataFrame,
    books: np.ndarray,
    units: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, codes array<int>[m]) — the compressed table (m bytes/vector
    at int8 storage; int codes here). ``units`` substitutes a precomputed
    (vec_id, u, ...) frame (IVF+PQ residuals); extra columns pass through."""
    src = units if units is not None else _unit_vectors(embeddings)
    codes = _pq_codes_udf(books, with_dists=False)(F.col("u"))
    passthrough = [c for c in src.columns if c not in ("vec_id", "u")]
    return src.select("vec_id", codes.alias("codes"), *passthrough)


def _residual_units(embeddings: DataFrame, cents: np.ndarray) -> DataFrame:
    """(vec_id, cluster, u = unit_vec - centroid[cluster]) — the IVF+PQ
    residual frame. One Arrow pass: assignment argmax and the subtraction
    share a batch (no join back to the assignment, no per-row Python)."""
    from pyspark.sql.functions import pandas_udf

    c = cents.astype(np.float64)

    @pandas_udf("struct<cluster:int, r:array<double>>")
    def _res(u: pd.Series) -> pd.DataFrame:
        x = np.stack(u.to_numpy()).astype(np.float64)
        cl = (x @ c.T).argmax(axis=1)
        r = x - c[cl]
        return pd.DataFrame({"cluster": cl.astype(np.int32), "r": list(r)})

    out = _unit_vectors(embeddings).select("vec_id", _res(F.col("u")).alias("cr"))
    return out.select(
        "vec_id",
        F.col("cr.cluster").alias("cluster"),
        F.col("cr.r").alias("u"),
    )


def _query_units(embeddings: DataFrame, n_queries: int) -> dict[int, np.ndarray]:
    return {
        int(r["vec_id"]): np.asarray(r["u"], dtype=np.float64)
        for r in _unit_vectors(embeddings)
        .filter(F.col("vec_id") < n_queries)
        .select("vec_id", "u")
        .collect()
    }


def _query_luts(
    qunits: dict[int, np.ndarray], books: np.ndarray
) -> dict[int, np.ndarray]:
    """lut[q][s][c] = dot(q_sub_s, books[s][c]) — ADC lookup tables, built
    driver-side from the tiny codebooks (m*k doubles per query)."""
    m, _, subdim = books.shape
    return {
        q: np.einsum("skd,sd->sk", books, u.reshape(m, subdim))
        for q, u in qunits.items()
    }


def _adc_shortlist(
    codes_df: DataFrame,
    luts: dict[int, np.ndarray],
    rerank: int,
    consts: dict[tuple[int, int], float] | None = None,
) -> DataFrame:
    """Fused ADC scoring + LOCAL top-``rerank`` per (query, input partition),
    one Arrow pass over the code table — the scale-safe shortlist stage.

    Two prior shapes this replaces were measured/judged scale-killers:
    (a) per-query literal LUT arrays / when-chains grow the codegen tree
    linearly with the query batch (the thousand-literal blowup measured at
    4-10x elsewhere in this repo); here the LUTs ride the closure as ONE
    (Q, m*k) float64 matrix, independent of plan size. (b) ranking O(corpus)
    ADC rows through a per-query Window hash-partitions corpus x Q rows into
    Q partitions — a single task sorting the corpus per query at 10^12 rows;
    here each input partition emits at most Q x rerank candidate rows, so
    the global window downstream sees <= P x Q x rerank rows total.

    ``consts`` switches on IVF+PQ residual mode: keys are (query_id,
    cluster) probe pairs, values the driver-computed dot(u_q, centroid_c)
    constant term; rows are then scored ONLY for probed (q, cluster) pairs
    (codes encode residuals, so approx = const + lut-sum). With ``consts``
    the input must carry a ``cluster`` column.

    Distributed-top-k determinism: local winners under the total order
    (approx desc, neighbor_id asc) are a superset of the global top-rerank
    regardless of partitioning, so the downstream global rank is
    partition-count-independent.
    """
    qids = np.array(sorted(luts), dtype=np.int64)
    m, k = luts[int(qids[0])].shape
    flat = np.stack([luts[int(q)].reshape(m * k) for q in qids])  # (Q, m*k)
    offs = (np.arange(m) * k).astype(np.int64)
    if consts is not None:
        probe_of = {int(q): [] for q in qids}
        for (q, c), v in consts.items():
            probe_of[int(q)].append((int(c), float(v)))
    out_schema = "query_id long, neighbor_id long, approx double"

    def run(batches):
        # running per-query top-rerank across the partition's batches
        best_n = {int(q): np.empty(0, dtype=np.int64) for q in qids}
        best_s = {int(q): np.empty(0) for q in qids}

        def fold(qi: int, nbr: np.ndarray, sc: np.ndarray) -> None:
            nbr = np.concatenate([best_n[qi], nbr])
            sc = np.concatenate([best_s[qi], sc])
            if len(nbr) > rerank:
                ordr = np.lexsort((nbr, -sc))[:rerank]
                nbr, sc = nbr[ordr], sc[ordr]
            best_n[qi], best_s[qi] = nbr, sc

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            nbrs = pdf["vec_id"].to_numpy().astype(np.int64)
            idx = codes + offs  # (n, m) flat LUT indices
            if consts is None:
                for j, q in enumerate(qids):
                    qi = int(q)
                    sc = np.zeros(len(nbrs))
                    row = flat[j]
                    for s in range(m):  # fixed order: deterministic fp sums
                        sc += row[idx[:, s]]
                    keep = nbrs != qi
                    fold(qi, nbrs[keep], sc[keep])
            else:
                clusters = pdf["cluster"].to_numpy().astype(np.int64)
                for j, q in enumerate(qids):
                    qi = int(q)
                    row = flat[j]
                    for c, const in probe_of[qi]:
                        mask = (clusters == c) & (nbrs != qi)
                        if not mask.any():
                            continue
                        sub = idx[mask]
                        sc = np.full(sub.shape[0], const)
                        for s in range(m):
                            sc += row[sub[:, s]]
                        fold(qi, nbrs[mask], sc)
        rows = [
            pd.DataFrame(
                {"query_id": qi, "neighbor_id": best_n[qi], "approx": best_s[qi]}
            )
            for qi in map(int, qids)
            if len(best_n[qi])
        ]
        if rows:
            yield pd.concat(rows, ignore_index=True)

    return codes_df.mapInPandas(run, schema=out_schema)


def _global_top(cands: DataFrame, rerank: int) -> DataFrame:
    """Global top-``rerank`` per query over the bounded local candidates
    (<= P x Q x rerank input rows — never O(corpus))."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("neighbor_id")
    )
    return (
        cands.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= rerank)
        .select("query_id", "neighbor_id")
    )


def _exact_rerank(
    embeddings: DataFrame, cands: DataFrame, n_queries: int, k: int
) -> DataFrame:
    """EXACT integer-quantized cosine over only the candidate pairs (never
    the full corpus), then final top-k."""
    q = _quantized_with_norm(embeddings)
    queries = q.filter(F.col("vec_id") < n_queries)
    score = (
        int_dot(F.col("a.q"), F.col("b.q")).cast("double")
        / (F.col("a.nrm") * F.col("b.nrm"))
    )
    exact = (
        F.broadcast(cands)
        .join(F.broadcast(queries).alias("a"),
              F.col("query_id") == F.col("a.vec_id"))
        .join(q.alias("b"), F.col("neighbor_id") == F.col("b.vec_id"))
        .select("query_id", "neighbor_id", score.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def pq_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    m: int = 8,
    n_codes: int = 16,
    rerank: int = 50,
    n_iter: int = 4,
    dim: int = 64,
    books: np.ndarray | None = None,
) -> DataFrame:
    """Two-stage PQ search: fused ADC scoring + local top-``rerank`` in ONE
    Arrow pass over the code table (the (Q, m*k) LUT matrix rides the
    closure — codegen size is query-count-independent), a global window over
    the <= P x Q x rerank local candidates, then EXACT integer-quantized
    cosine re-rank of only those candidates. No task ever sorts O(corpus)
    rows and no plan grows with the query batch. Output matches the other
    top-k operators: (query_id, neighbor_id, cosine, rank) with exact
    cosines."""
    if books is None:
        books, _ = pq_train(embeddings, m=m, k=n_codes, n_iter=n_iter, dim=dim)
    codes_df = pq_encode(embeddings, books)
    luts = _query_luts(_query_units(embeddings, n_queries), books)
    cands = _global_top(_adc_shortlist(codes_df, luts, rerank), rerank)
    return _exact_rerank(embeddings, cands, n_queries, k)


def ivfpq_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_lists: int = 8,
    n_probe: int = 3,
    m: int = 8,
    n_codes: int = 16,
    rerank: int = 50,
    n_iter: int = 3,
    dim: int = 64,
    coarse_iter: int = 4,
) -> DataFrame:
    """FAISS-style IVF+PQ with RESIDUAL encoding: a trained coarse quantizer
    partitions vectors into inverted lists; PQ codebooks are trained on the
    residuals (vector - centroid), which have far less variance than raw
    vectors so the same m/k budget quantizes much finer; each query probes
    its ``n_probe`` best lists; ONLY the probed lists' rows are ADC-scored
    (approx = dot(q, centroid_c) + lut-sum over the residual codes, the
    classic FAISS decomposition); the top-``rerank`` shortlist is re-ranked
    with exact cosines. At 10^12 vectors this is the standard architecture:
    the scoring pass touches n_probe/n_lists of the corpus as m bytes per
    row, local top-rerank bounds the shuffle at P x Q x rerank rows, and
    the exact path reads n_queries x rerank vectors.

    Recall is bounded above by the PROBED-EXACT CEILING — the recall of
    exact scoring restricted to the probed lists (measured 0.82 at
    n_probe=3/8 on the near-random sf0.001 corpus; no encoding can beat
    it). Residual encoding recovers ~97% of that ceiling (0.80) vs ~90%
    for raw-vector codes (0.74); pytest pins both the floor and the
    ceiling gap."""
    cents, _ = kmeans_fit(
        embeddings, n_clusters=n_lists, n_iter=coarse_iter, dim=dim
    )
    residuals = _residual_units(embeddings, cents).cache()
    try:
        # residuals are a deterministic function of (corpus, coarse params),
        # so the codebook cache key carries the derivation instead of the
        # frame identity
        books, _ = pq_train(
            embeddings, m=m, k=n_codes, n_iter=n_iter, dim=dim,
            units=residuals,
            units_key={
                "residuals": {"n_lists": n_lists, "coarse_iter": coarse_iter,
                              "kmeans_seed": KMEANS_DEFAULT_SEED}
            },
        )
        table = pq_encode(embeddings, books, units=residuals)
        qunits = _query_units(embeddings, n_queries)
        luts = _query_luts(qunits, books)
        # probe selection + per-(query, cluster) constant terms driver-side:
        # n_queries x n_probe dots of known tiny arrays
        consts = {
            (q, int(c)): float(cents[c] @ u)
            for q, u in sorted(qunits.items())
            for c in np.argsort(-(cents @ u))[:n_probe]
        }
        cands = _global_top(
            _adc_shortlist(table, luts, rerank, consts=consts), rerank
        )
        return _exact_rerank(embeddings, cands, n_queries, k)
    finally:
        residuals.unpersist()
