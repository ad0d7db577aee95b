"""Deduplication operators for training-data pipelines over `documents`.

The reference's duplicate machinery is Counter-based exact duplicate detection
(``/root/reference/curation/check_fackel_references.py:32,55``) and
delete-before-insert dedup (``scripts/enrich_person_indices.py:46-49``). A
100 TB training corpus needs the full ladder: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine. All are pure DataFrame plans except SimHash
(vectorized pandas UDF).

Cross-engine determinism: where an oracle (DuckDB) must reproduce results,
hashes are derived from md5 hex (identical in both engines) reduced mod
2^31-1, so no 64-bit overflow semantics come into play; similarity scores are
ratios of exact integer counts.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE31 = 2147483647  # 2^31 - 1 (prime)

# deterministic MinHash permutation parameters (seeded, committed constants)
_rng = np.random.default_rng(42)
MINHASH_A = [int(x) for x in _rng.integers(1, MERSENNE31, size=64)]
MINHASH_B = [int(x) for x in _rng.integers(0, MERSENNE31, size=64)]


def words(c) -> F.Column:
    """Whitespace tokenization (the reference's split-on-space id lists,
    check_fackel_references.py:26)."""
    return F.split(F.trim(c), r"\s+")


def md5_hash31(c) -> F.Column:
    """md5-derived 31-bit integer hash — portable to DuckDB:
    CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) % 2147483647."""
    return F.pmod(
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
        F.lit(MERSENNE31),
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup on normalized text: fingerprint -> count>1.

    Scale: the shuffle key is the 32-hex md5, not the document body; partial
    aggregation collapses per-map duplicates before the shuffle.
    """
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    return (
        docs.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("dup_count") > 1)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------

def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    w = words(F.col("text"))
    sh = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
    return (
        docs.filter(F.size(w) >= n)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5, max_df: int = 20
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard.

    Candidate generation joins docs sharing a *rare* shingle (document
    frequency <= max_df) — the standard frequency cutoff that kills the
    quadratic hot-key blowup (the reference's 12,751x hot key,
    AmbiguousFackelReferences.txt:1, is exactly this pathology). Jaccard is
    then |A∩B| / (|A|+|B|-|A∩B|) on exact integer shingle counts.
    """
    sh = shingles(docs, n).cache()
    # lazy checkpoint: `sizes` feeds both the doc_a and doc_b joins below and
    # would otherwise be aggregated twice from the shingle cache
    sizes = (
        sh.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
        .localCheckpoint(eager=False)
    )
    # Posting-list pair generation: ONE shuffle of (shingle -> sorted doc-id
    # list), then the pair fan-out happens map-side as a JVM array expression.
    # The df cap bounds every list at max_df ids, so no row ever exceeds
    # max_df longs and the fan-out is <= max_df^2/2 per shingle — the earlier
    # form (df-filter semi-join + shingle self-join) shuffled the postings
    # twice more and paid a string-keyed join build for the same pair set
    # (r6: candidate stage 1.74s -> 0.6s at sf0.1).
    spark = docs.sparkSession
    posting = (
        sh.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter((F.size("ids") <= max_df) & (F.size("ids") >= 2))
        .select(F.array_sort("ids").alias("ids"))
        # fan the (tiny, df-capped) posting table across the cluster BEFORE
        # the <= max_df^2/2-per-row pair explosion: AQE rightly coalesces the
        # small posting shuffle to a few partitions, but the explode then
        # inflates ~50x on those few cores — repartitioning n rows of
        # <= max_df ids costs ~nothing and parallelizes the fan-out (guide
        # §2.5: repartition before the exploding operation)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # ids are distinct per shingle (shingles() is per-doc distinct) and
    # sorted ascending, so emitting (ids[i], ids[j]) for i<j reproduces the
    # join's a.doc_id < b.doc_id pairs exactly once each
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    candidates = (
        posting.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        candidates.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "n_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(docs: DataFrame, k: int = 16, n: int = 3) -> DataFrame:
    """k-permutation MinHash signature per doc: (doc_id, sig array<long>).

    One explode + one groupBy: sig_i = min over shingles of
    (a_i * h31(shingle) + b_i) mod (2^31-1). The group-by is a partial-agg
    min, so the shuffle carries k longs per doc, never the shingles.
    """
    h = md5_hash31(F.col("shingle"))
    sh = shingles(docs, n).select("doc_id", h.alias("h"))
    mins = [
        F.min(
            F.pmod(
                F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i]),
                F.lit(MERSENNE31),
            )
        ).alias(f"s{i}")
        for i in range(k)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"s{i}" for i in range(k)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH near-dup pairs: band the k-wide signature into `bands` buckets,
    join docs that collide in any band, then verify ONLY those candidates
    with pair-scoped exact Jaccard.

    shingle->minhash->band->bucket-join: only bucket collisions are ever
    paired, so the join is equi (no cross join), and the band key is a short
    string. Verification touches nothing but the candidate docs: their
    shingle sets are pruned out with a broadcast semi-join (candidate ids are
    tiny by construction — LSH collisions), collected per doc, and
    intersected per pair — the full corpus never re-enters after candidate
    generation. (Round-1 composition re-ran the whole rare-shingle pair
    generator as the verifier, which both cost a second corpus-wide pass and
    silently dropped true pairs that share only high-frequency shingles.)
    """
    r = k // bands
    # Lazy localCheckpoint: the banded self-join + the two cand_docs branches
    # would otherwise each re-run the whole shingle->md5->16-way-min pipeline
    # (the r6 plan audit counted FOUR evaluations of the signature aggregation
    # in one query). Materializing (doc_id, k longs) is strictly smaller than
    # one re-pass over the shingles at any scale.
    sig = minhash_signatures(docs, k, n).localCheckpoint(eager=False)
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_", *[F.col("sig")[i].cast("string") for i in range(b * r, (b + 1) * r)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "key"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        # tiny (LSH collisions only); checkpointed so the cand_docs union and
        # the two verification joins below don't re-run the band self-join
        .localCheckpoint(eager=False)
    )
    sh = shingles(docs, n)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # cand_docs is tiny by construction on a healthy corpus (only docs that
    # LSH-banded into a shared bucket), but a pathologically duplicate-heavy
    # corpus makes it O(docs) — so no explicit broadcast hint: AQE broadcasts
    # the semi-join side when it fits and shuffles when it doesn't.
    # `sets` is consumed twice (once per pair side); the lazy checkpoint keeps
    # the semi-join + collect_set pass single-evaluation — it is bounded by
    # the candidate docs' shingle sets, never the corpus.
    sets = (
        sh.join(cand_docs, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("ss"))
        .localCheckpoint(eager=False)
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"))
    shared = F.size(F.array_intersect("ss_a", "ss_b"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard",
            shared / (F.size("ss_a") + F.size("ss_b") - shared),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash (vectorized pandas UDF — bit ops are the slow path in SQL)
# ---------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace words, batch-vectorized.

    md5 runs once per *unique* word in the Arrow batch (real corpora are
    Zipfian, so uniques << occurrences); bit accumulation is one np.add.at
    over the flattened (occurrence, 64-bit-plane) matrix. Bit i of the output
    is set iff the summed ±1 contributions of that bit across words are > 0 —
    identical semantics to the textbook per-document loop.
    """
    import hashlib

    docs = [t.split() if t else [] for t in text]
    lengths = np.array([len(d) for d in docs], dtype=np.int64)
    n = len(docs)
    out = np.zeros(n, dtype=np.int64)
    if lengths.sum():
        flat = np.concatenate([np.asarray(d, dtype=object) for d in docs if d])
        # hash-based factorize: np.unique on object strings sort-compares in
        # Python (~75x slower, measured); md5 then runs once per unique word
        codes, uniq = pd.factorize(flat)
        hs_uniq = np.fromiter(
            (
                int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
                for w in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
        # per-unique-word ±1 bit contributions (U x 64 int8, tiny)
        planes = np.arange(64, dtype=np.uint64)[None, :]
        contrib = (
            ((hs_uniq[:, None] >> planes) & np.uint64(1)).astype(np.int8) * 2 - 1
        )
        pw = np.uint64(1) << np.arange(64, dtype=np.uint64)
        off = 0
        for j in np.nonzero(lengths)[0]:
            L = int(lengths[j])
            acc = contrib[codes[off: off + L]].sum(axis=0, dtype=np.int64)
            out[j] = (pw[acc > 0]).sum(dtype=np.uint64).astype(np.int64)
            off += L
    return pd.Series(out)


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming between SimHashes.

    Candidates via banding the 64-bit hash into 4 x 16-bit chunks (two hashes
    within Hamming<=3 must agree on at least one chunk) — equi-join on chunk,
    then exact popcount filter. No cross join at any scale.

    The (doc_id, simhash) projection is localCheckpointed (lazy) before the
    chunk fan-out: without it the self-join's plan evaluates the simhash64
    Arrow UDF once per join side AND once more per side for the chunk
    derivation — four full corpus passes through the Python worker for one
    logical hash pass (measured in the r6 plan audit). The materialized frame
    is 16 bytes/doc, far smaller than re-decoding `text`, so this holds at
    any scale.
    """
    sh = docs.select("doc_id", simhash64("text").alias("sh")).localCheckpoint(
        eager=False
    )
    chunks = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sh"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk_idx", "chunk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# duplicate clustering: connected components over the near-dup pair graph
# ---------------------------------------------------------------------------

def dup_clusters(
    pairs: DataFrame, max_iter: int = 25, rounds_out: list | None = None
) -> DataFrame:
    """Cluster near-dup pairs into components: (doc_id, component) where
    component = min doc_id reachable — so "keep one per duplicate cluster"
    is a filter ``doc_id == component``.

    Hash-to-min label propagation with pointer jumping: every node starts
    labeled with itself; each round (a) pushes labels across edges keeping the
    min per node, then (b) jumps each label to ITS label (path compression) —
    so chains collapse in O(log diameter) rounds instead of O(diameter), the
    large-star/small-star behavior from the connected-components-in-MapReduce
    literature. Each round is two shuffles keyed by node id, and
    ``localCheckpoint`` cuts the growing lineage so round N's plan doesn't
    replay rounds 1..N-1. The reference's analog is its running-dedup list
    (``/root/reference/scripts/make_texts.py:373-374,512-517``) — exact-key
    only; this generalizes to transitive near-dup identity.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without a fixpoint —
    a silent early exit would hand callers wrong component labels with no
    signal (round-1 ADVICE). With pointer jumping, max_iter=25 covers
    component diameters up to ~2^25.

    ``rounds_out``: pass an empty list to receive the number of propagation
    rounds actually run (appended as its single element) — soak harnesses
    record convergence depth without re-deriving it.
    """
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    changed = -1
    n_rounds = 0
    for _ in range(max_iter):
        n_rounds += 1
        prop = edges.withColumnRenamed("src", "id").join(labels, "id").select(
            F.col("dst").alias("id"), "comp"
        )
        # checkpoint BEFORE the self-join below: a self-join over the live
        # union+agg plan trips Catalyst attribute dedup (NoSuchElementException
        # on an internal attr id); the label table is tiny, so the extra eager
        # materialization is cheap
        new = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        # pointer jumping: comp := label(comp). label(comp) is reachable from
        # comp (itself reachable from id), and labels only decrease, so the
        # min-reachable invariant is preserved while chains halve each round.
        new = (
            new.join(
                new.select(
                    F.col("id").alias("comp"), F.col("comp").alias("jump")
                ),
                "comp",
                "left",
            )
            .select("id", F.coalesce("jump", "comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    if rounds_out is not None:
        rounds_out.append(n_rounds)
    if changed != 0:
        raise RuntimeError(
            f"dup_clusters did not converge within max_iter={max_iter} rounds "
            f"({changed} labels still changing); component labels would be "
            "incorrect — raise max_iter"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("component"))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95, band_dims: int = 3
) -> DataFrame:
    """Near-dup pairs by cosine over quantized embeddings (exact integer dot
    products -> engine-portable doubles), candidate-generated by an EXACT
    grid banding so the join is an equi-join, never a cartesian product.

    Exactness argument: on the unit sphere, cos(a,b) >= tau implies
    ||u_a - u_b||_2 = sqrt(2 - 2*cos) <= delta, hence every normalized
    coordinate differs by at most delta. Bucketing coordinate i into cells
    of width w >= delta means a qualifying pair's cells differ by at most 1
    per banded coordinate, so multiprobing the 3^k neighbor cells of the
    probe side against the build side's home cell finds EVERY pair with
    cosine >= threshold — recall is 1.0 by construction at any scale (this
    is the deterministic analog of SimHash chunk banding above, with a
    proof instead of a probability). Each unordered pair is emitted exactly
    once: the probe row with the smaller vec_id always covers the build
    row's unique home cell.

    Scale shape: probe side fans out 3^band_dims rows (27 for k=3), build
    side 1 row, then a CO-GROUP on the cell key scored as one Arrow
    block-matmul per cell: each cell's vectors cross the Arrow boundary
    ONCE (not once per candidate pair), the P x B integer dot-product
    matrix is exact int64 numpy (identical bits to the zip_with/aggregate
    expression it replaces — same integer sums, same IEEE double
    division), and the matmul is tiled so no task materializes more than
    ~2k x 2k SCORES at a time (the cell's input vectors are still held
    whole per task — `_cogroup_cosine_pairs.max_cell_rows` bounds that and
    fails loudly past it). Cost per cell is still |probe| x |build|
    multiplies — inherent to an EXACT scorer — but at vectorized-matmul
    speed instead of interpreted per-pair expression trees (measured 29x
    on the 10x hot-cell soak, BENCH/BASELINE.md round-5 addendum). No
    broadcast of anything corpus-sized, no inequality-only join; the
    data-adaptive corpus-scale paths remain semantic_dup_pairs (kmeans
    cells) and the LSH ladder.
    ``band_dims`` must be <= the embedding dimension (element_at past the
    array end yields a null cell and silently drops rows); exactness vs a
    numpy brute force is property-tested across thresholds in
    tests/test_ops_misc.py::test_grid_banding_is_exact_vs_numpy_brute_force,
    and tests/test_ops_misc.py::test_semantic_dedup_recall_and_exactness
    pins bit-equality of shared-pair scores against the expression-scored
    semantic path.
    """
    from itertools import product as _product

    from ..functions.arrays import int_dot, quantized

    delta = math.sqrt(max(2.0 - 2.0 * threshold, 1e-12))
    w = delta * (1.0 + 1e-9)  # guard the |diff| == delta boundary
    q = (
        embeddings.select("vec_id", quantized(F.col("embedding")).alias("q"))
        .withColumn(
            "nrm", F.sqrt(int_dot(F.col("q"), F.col("q")).cast("double"))
        )
        # zero vectors have no direction: cosine is undefined (NaN) against
        # every row, so they can never clear the threshold — dropping them
        # up front also keeps every cell component non-null, so the
        # k-component cell-key structure (and the 3^k coverage proof) holds
        # for every remaining row (r5 ADVICE: concat_ws silently drops null
        # components, collapsing distinct cells)
        .filter(F.col("nrm") > 0)
    )
    cells = [
        F.floor(F.element_at("q", i + 1).cast("double") / F.col("nrm") / F.lit(w))
        .cast("int")
        .alias(f"c{i}")
        for i in range(band_dims)
    ]

    def _comp(col):
        # a null component (band dim beyond the embedding dim) becomes a
        # pinned sentinel so the cell key always has exactly band_dims
        # components — concat_ws would otherwise DROP nulls and let
        # distinct cells collide (r5 ADVICE)
        return F.coalesce(col.cast("string"), F.lit("_"))

    g = q.select("vec_id", "q", "nrm", *cells)
    # fresh aliases on the build side: probe and build share lineage (one
    # projection of the same scan), and a self-cogroup with identical
    # attribute ids fails analysis as ambiguous
    build = g.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("q").alias("b_q"),
        F.col("nrm").alias("b_nrm"),
        F.concat_ws(
            ":", *[_comp(F.col(f"c{i}")) for i in range(band_dims)]
        ).alias("cell"),
    )
    probe_cells = F.array(
        *[
            F.concat_ws(
                ":",
                *[
                    _comp(F.col(f"c{i}") + F.lit(off[i]))
                    for i in range(band_dims)
                ],
            )
            for off in _product((-1, 0, 1), repeat=band_dims)
        ]
    )
    probe = g.select(
        "vec_id", "q", "nrm", F.explode(probe_cells).alias("cell")
    )
    return _cogroup_cosine_pairs(probe, build, "cell", threshold)


def _cogroup_cosine_pairs(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    threshold: float,
    tile: int = 2048,
    max_cell_rows: int = 500_000,
) -> DataFrame:
    """Exact-cosine pair scoring for cell-blocked candidate generation
    (grid banding above, SemDeDup kmeans cells below): cogroup the two
    sides on the blocking key and score each cell with tiled exact-int64
    numpy matmuls. Each cell's vectors cross the Arrow boundary ONCE (not
    once per candidate pair) — 29x over the interpreted zip_with/aggregate
    expression form on the 10x hot-cell soak (BENCH/BASELINE.md) — and
    `tile` bounds any task's materialized score matrix (~32 MB of doubles
    at 2048). Emits (vec_a, vec_b, cosine) with vec_a < vec_b and
    cosine >= threshold; scores are bit-identical to the expression form
    (same integer sums, same single IEEE division).

    probe columns: (vec_id, q, nrm, <key>); build columns must be
    pre-aliased (b_vec_id, b_q, b_nrm, <key>) — a self-cogroup with shared
    attribute ids fails analysis as ambiguous.

    Memory shape: `tile` bounds the SCORE matrix, but each cell's input
    vectors are materialized whole in the scoring task (np.stack of the
    group), so a cell holding most of the corpus would concentrate that
    memory on one executor. ``max_cell_rows`` turns that pathology into a
    clean, actionable error instead of a silent OOM/quadratic job: exact
    all-pairs scoring inside a cell is inherently |probe| x |build|, and a
    corpus whose cells exceed the bound should use the data-adaptive paths
    (semantic_dup_pairs kmeans cells with more clusters, or the LSH
    ladder) rather than a bigger machine."""
    tau = float(threshold)
    cap = int(max_cell_rows)

    def _score_cell(probe_pdf: pd.DataFrame, build_pdf: pd.DataFrame):
        if probe_pdf.empty or build_pdf.empty:
            return
        if len(probe_pdf) > cap or len(build_pdf) > cap:
            raise RuntimeError(
                f"exact pair-scoring cell exceeds max_cell_rows={cap} "
                f"(probe={len(probe_pdf)}, build={len(build_pdf)}): this "
                "corpus concentrates too many vectors in one cell for the "
                "EXACT scorer — raise the bound explicitly, raise the "
                "threshold/cluster count, or use the approximate ladder "
                "(semantic_dup_pairs / LSH) for candidate generation"
            )
        ida = probe_pdf["vec_id"].to_numpy()
        idb = build_pdf["b_vec_id"].to_numpy()
        qa = np.stack(probe_pdf["q"].to_numpy()).astype(np.int64)
        qb = np.stack(build_pdf["b_q"].to_numpy()).astype(np.int64)
        na = probe_pdf["nrm"].to_numpy(dtype=np.float64)
        nb = build_pdf["b_nrm"].to_numpy(dtype=np.float64)
        for i in range(0, len(ida), tile):
            for j in range(0, len(idb), tile):
                # exact int64 dots (|q|<=~5e3, d<=64 -> dot < 2^53, no
                # overflow, lossless int64->double), then the SAME single
                # IEEE division the expression form computed
                dots = qa[i : i + tile] @ qb[j : j + tile].T
                cos = dots.astype(np.float64) / np.outer(
                    na[i : i + tile], nb[j : j + tile]
                )
                mask = (cos >= tau) & (
                    ida[i : i + tile, None] < idb[None, j : j + tile]
                )
                ai, bj = np.nonzero(mask)
                if len(ai):
                    yield pd.DataFrame(
                        {
                            "vec_a": ida[i + ai],
                            "vec_b": idb[j + bj],
                            "cosine": cos[ai, bj],
                        }
                    )

    def _score(k, probe_pdf: pd.DataFrame, build_pdf: pd.DataFrame):
        out = list(_score_cell(probe_pdf, build_pdf))
        if not out:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        return pd.concat(out, ignore_index=True)

    return (
        probe.groupBy(key)
        .cogroup(build.groupBy(key))
        .applyInPandas(_score, "vec_a long, vec_b long, cosine double")
    )


def semantic_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 8,
    cents=None,
    n_probe: int = 2,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: cluster the embeddings with
    the trained spherical-kmeans quantizer, then score pairs ONLY within a
    shared cell — the standard way to run embedding dedup at corpus scale
    (Abbas et al., SemDeDup): near-identical vectors land in the same cell
    with overwhelming probability, so the O(n^2) pair space collapses to
    sum_c |cell_c|^2 and the join is a per-cluster equi-join (AQE splits hot
    cells) instead of a cross join. ``n_probe`` soft-assigns each vector to
    its best cells (a pair is a candidate if ANY cell is shared) — the
    recall knob for pairs straddling a cell boundary, at <= n_probe^2 x the
    top-1 pair space. Scores are the same exact integer-quantized cosines
    as ``embedding_dup_pairs`` (the brute-force baseline this is
    recall-tested against), so any pair both emit carries an identical
    double.

    Returns (vec_a, vec_b, cosine) with vec_a < vec_b, cosine >= threshold
    (same column/score conventions as ``embedding_dup_pairs``).
    """
    from pyspark.sql.functions import pandas_udf

    from ..functions.arrays import int_dot, quantized

    from .similarity import kmeans_fit

    if cents is None:
        cents, _ = kmeans_fit(embeddings, n_clusters=n_clusters, n_iter=3)

    # cells, quantized vector, and norm all come out of ONE projection over
    # the scan (a vec_id join back to a separate assignment frame would
    # shuffle the vector table twice — the 2-6x penalty similarity.py
    # measured); cell top-n ordering over raw embeddings equals the
    # unit-vector ordering (positive per-row scale), one Arrow matmul/batch
    c_mat = cents.astype(np.float64)

    @pandas_udf("array<int>")
    def _cells(emb: pd.Series) -> pd.Series:
        x = np.stack(emb.to_numpy()).astype(np.float64)
        s = x @ c_mat.T
        return pd.Series(list(np.argsort(-s, axis=1)[:, :n_probe].astype(np.int32)))

    q = embeddings.select(
        "vec_id",
        F.explode(_cells(F.col("embedding"))).alias("cluster"),
        quantized(F.col("embedding")).alias("q"),
    ).withColumn("nrm", F.sqrt(int_dot(F.col("q"), F.col("q")).cast("double")))
    build = q.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("q").alias("b_q"),
        F.col("nrm").alias("b_nrm"),
        "cluster",
    )
    return (
        # per-cell Arrow block-matmul scoring (shared with the grid-banded
        # baseline above — identical doubles on any pair both emit)
        _cogroup_cosine_pairs(q, build, "cluster", threshold)
        # a pair sharing several probed cells scores identically each time
        .dropDuplicates(["vec_a", "vec_b"])
    )


def dup_token_spans(docs: DataFrame, w: int = 8) -> DataFrame:
    """Cross-document duplicated token spans (exact substring dedup, the
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better" operator): for every document, the maximal word-position spans
    whose every length-``w`` window also occurs in at least one OTHER
    document — the spans a substring-level deduper would cut before
    training, catching shared boilerplate/quotes that document-level
    near-dup (Jaccard/MinHash above) never flags.

    Plan: (1) map-only stride-1 w-gram extraction per document (array
    transform, no shuffle); (2) one hash aggregation counts distinct
    documents per gram — keyed on the portable md5-derived 60-bit integer,
    so the shuffle carries 8-byte keys, never gram text; (3) grams seen in
    >=2 docs rejoin their positions (equi-join on the hash — hot boilerplate
    grams are the AQE skew-join case); (4) flagged positions merge into
    maximal spans with one gaps-and-islands window PARTITIONED BY doc_id —
    high-cardinality, scale-safe (all w-windows share length, so interval
    ends are monotone in start and the lag(pos) > w break test is exact).
    Reference analog: the containment-match counting that flags text ranges
    mentioned by more than one source
    (/root/reference/scripts/archiv/fackel_text_matches.py:26-39).

    Output: (doc_id, span_start, span_end, span_tokens), word positions
    0-based inclusive.
    """
    ws = F.split(F.trim(F.col("text")), " ")
    grams = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= w)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(ws)-{w}), i ->"
                    f" struct(i AS pos, concat_ws(' ', slice(ws, i+1, {w}))"
                    " AS gram))"
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.col("g.pos").alias("pos"),
            F.conv(F.substring(F.md5(F.col("g.gram")), 1, 15), 16, 10)
            .cast("long")
            .alias("gh"),
        )
    )
    shared = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    flagged = grams.join(shared, "gh").select("doc_id", "pos")
    win = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(win).isNull()
        | ((F.col("pos") - F.lag("pos").over(win)) > w),
        1,
    ).otherwise(0)
    isl = F.sum("brk").over(
        win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("brk", brk)
        .withColumn("isl", isl)
        .groupBy("doc_id", "isl")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + w - 1).cast("int").alias("span_end"),
            (F.max("pos") - F.min("pos") + w).cast("int").alias(
                "span_tokens"
            ),
        )
        .select("doc_id", "span_start", "span_end", "span_tokens")
    )
