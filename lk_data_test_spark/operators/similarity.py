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


def kmeans_fit(
    embeddings: DataFrame,
    n_clusters: int = 8,
    n_iter: int = 4,
    dim: int = 64,
    seed: int = 11,
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

    Returns (unit-norm centroids [n_clusters x dim], per-round objective).
    """
    cents = ivf_centroids(dim, n_clusters, seed)
    unit = _unit_vectors(embeddings).cache()
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
    seed: int = 11,
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
    if cents is None:
        cents = ivf_centroids(dim, n_centroids, seed)
    else:
        n_centroids = len(cents)

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

    # (score, idx) structs: lexicographic max = argmax, sort desc = top lists.
    # list_id, quantized vector, and norm all come out of ONE projection over
    # the scan — a vec_id self-join to attach them would shuffle the whole
    # vector table twice for no reason (measured 2-6x slower at sf0.1).
    score_structs = F.array(
        *[
            F.struct(s.alias("s"), F.lit(i).alias("c"))
            for i, s in enumerate(cent_scores())
        ]
    )
    nearest = F.array_max(score_structs).getField("c")
    assigned = embeddings.select(
        "vec_id",
        nearest.alias("list_id"),
        quantized(F.col("embedding")).alias("q"),
    ).withColumn("nrm", F.sqrt(int_dot(F.col("q"), F.col("q")).cast("double")))

    probes = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select(
            "vec_id",
            F.explode(
                F.transform(
                    F.slice(F.reverse(F.array_sort(score_structs)), 1, n_probe),
                    lambda st: st.getField("c"),
                )
            ).alias("list_id"),
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
        # time — collapse before ranking so duplicates can't occupy top-k
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def recall_vs_exact(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """Per-query recall@k of an ANN result against the exact baseline.

    Both inputs carry (query_id, neighbor_id); output is one row per exact
    query: (query_id, n_hits, recall) with recall = |approx ∩ exact| / k as
    an exact small-integer division (deterministic double). Queries the
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
        e.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(k))
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
) -> tuple[np.ndarray, list[float]]:
    """Train per-subspace L2 codebooks (classic PQ Lloyd's) over the
    unit-normalized vectors. One scan per round for ALL m subspaces: codes
    are JVM-side argmins over literal codebooks, and the centroid update
    shuffles m rows of subdim floats per vector (same bytes as the vector,
    partial-aggregated map-side) — the collect is m*k*(subdim+1) doubles,
    corpus-independent. Returns (codebooks [m,k,subdim], per-round total
    quantization error — monotone non-increasing, asserted by pytest)."""
    subdim = dim // m
    rng = np.random.default_rng(seed)
    books = rng.standard_normal((m, k, subdim)) * 0.1
    unit = _unit_vectors(embeddings).cache()
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


def pq_encode(embeddings: DataFrame, books: np.ndarray) -> DataFrame:
    """(vec_id, codes array<int>[m]) — the compressed table (m bytes/vector
    at int8 storage; int codes here)."""
    codes = _pq_codes_udf(books, with_dists=False)(F.col("u"))
    return _unit_vectors(embeddings).select("vec_id", codes.alias("codes"))


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


def _adc_expr(lut: np.ndarray, m: int):
    """Approximate dot product of the row's codes against one query's LUT:
    m element_at lookups + adds (vs dim multiplies for the exact score)."""
    per_sub = [
        F.element_at(
            F.array(*[F.lit(float(x)) for x in lut[s]]),
            F.col("codes")[s] + 1,
        )
        for s in range(m)
    ]
    out = per_sub[0]
    for e in per_sub[1:]:
        out = out + e
    return out


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
    """Two-stage PQ search: ADC scoring over the code table (per-query
    lookup tables built driver-side from the codebooks — m element_at
    lookups per candidate instead of dim multiplies), distributed top-
    ``rerank`` per query, then EXACT integer-quantized cosine re-rank of
    only those candidates. Output matches the other top-k operators:
    (query_id, neighbor_id, cosine, rank) with exact cosines."""
    if books is None:
        books, _ = pq_train(embeddings, m=m, k=n_codes, n_iter=n_iter, dim=dim)
    codes_df = pq_encode(embeddings, books)
    luts = _query_luts(_query_units(embeddings, n_queries), books)

    # ONE scan of the code table scores every query: explode a literal-LUT
    # struct array -> (query_id, approx) rows, m lookups each
    scored = codes_df.select(
        F.col("vec_id").alias("neighbor_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("query_id"),
                        _adc_expr(lut, books.shape[0]).alias("approx"),
                    )
                    for q, lut in sorted(luts.items())
                ]
            )
        ).alias("qa"),
    ).select("neighbor_id", "qa.query_id", "qa.approx")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("neighbor_id")
    )
    cands = (
        scored.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= rerank)
        .select("query_id", "neighbor_id")
    )
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
) -> DataFrame:
    """FAISS-style IVF+PQ composition: a trained coarse quantizer partitions
    vectors into inverted lists; each query probes its ``n_probe`` best
    lists; ONLY the probed lists' rows are ADC-scored from the code table
    (m lookups each); the top-``rerank`` shortlist is re-ranked with exact
    cosines. At 10^12 vectors this is the standard architecture: the probe
    join touches n_probe/n_lists of the corpus, the scored payload is m
    bytes per row, and the exact path reads n_queries x rerank vectors.
    This variant encodes raw unit vectors (IVF for pruning, PQ for cheap
    scoring); residual encoding is the standard refinement on top."""
    cents, _ = kmeans_fit(embeddings, n_clusters=n_lists, n_iter=2, dim=dim)
    books, _ = pq_train(embeddings, m=m, k=n_codes, n_iter=n_iter, dim=dim)
    table = pq_encode(embeddings, books).join(
        kmeans_assign(embeddings, cents).select("vec_id", "cluster"), "vec_id"
    )
    qunits = _query_units(embeddings, n_queries)
    luts = _query_luts(qunits, books)
    # probe selection driver-side: the coarse-centroid scores per query are
    # n_lists dots of known tiny arrays
    probe_rows = [
        (q, int(c))
        for q, u in sorted(qunits.items())
        for c in np.argsort(-(cents @ u))[:n_probe]
    ]
    probes = F.broadcast(
        table.sparkSession.createDataFrame(
            probe_rows, "query_id long, cluster int"
        )
    )
    # per-row ADC against the row's own query: a when-chain over the
    # n_queries LUTs (each branch = m lookups; only one branch evaluates)
    approx = None
    for q, lut in sorted(luts.items()):
        e = _adc_expr(lut, books.shape[0])
        approx = (
            F.when(F.col("query_id") == q, e)
            if approx is None
            else approx.when(F.col("query_id") == q, e)
        )
    scored = (
        probes.join(table, "cluster")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            approx.alias("approx"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("neighbor_id")
    )
    cands = (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    return _exact_rerank(embeddings, cands, n_queries, k)
