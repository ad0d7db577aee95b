"""Shared token-scan intermediates — one physical pass over the `tokens`
column serving every rule that needs it.

`tokens` is ~99% of the table's bytes. Without sharing, column_stats reads it
for `size(tokens)` and drift reads it again for token frequencies: two full
decompressions of the dominant column per suite run. This module computes ONE
Arrow-native pass emitting tagged, mergeable partials that both rules consume
(the engine-level analog of a shared CTE / common-subplan reuse):

    kind 0  n_tok histogram        key = n_tok value      cnt = rows
    kind 1  token frequency        key = token id         cnt = occurrences
    kind 2  len-mismatch rows      key = 0                cnt = rows with n_tok != size(tokens)
    kind 3  null-tokens rows       key = 0                cnt = rows with tokens IS NULL
    kind 4  out-of-vocab rows      key = 0                cnt = rows with any token
                                                                outside [vocab_lo, vocab_hi)

Kind 4 is emitted only when the scan is built with explicit vocab bounds
(``vocab_lo``/``vocab_hi``): it screens the token_bounds rule against the
TOKENIZER vocabulary, which is independent of the reference-profile domain
kinds 0/1 use — in the hashed-domain fallback the profile keys are no longer
token ids at all, so the bound check always runs on the raw values BEFORE any
hashing.

Kinds 0/1 are drift's signals and are emitted only for non-null sources (a
null source has no reference profile; such rows still count in kinds 2/3).

Vectorization: `mapInArrow` hands us pyarrow RecordBatches; the token lists
are consumed as (lengths, flat values) — no per-row ndarray conversion, no
per-group Python loop. Group labels are factorized once per batch; all
counting is `np.bincount` / `np.unique` over combined integer keys.

The flat-token loop is CHUNKED (1M tokens at a time) so every numpy temporary
stays under glibc's 32MB mmap threshold: larger buffers are mmap'd fresh on
every allocation and returned to the OS on free, which on this sandbox's
first-touch page-fault path costs 10-50x the actual arithmetic (measured:
un-chunked ~15s vs chunked ~0.4s per 10M-token task, same answers). Chunk
temporaries come from the allocator's warm free lists, and reused python
workers keep them warm across tasks.

Scale: each task emits <= |groups| x (|ref tokens| + |distinct n_tok|) partial
rows per batch regardless of row width; the groupBy that merges partials is a
partial-aggregated shuffle of those tiny rows only. Token arrays cross into
Arrow unfiltered on purpose: the raw int32 buffer moves at memcpy speed and a
numpy mask beats a codegen'd per-element JVM F.filter ~3x (measured on 38M
rows); nothing is ever shuffled at token granularity either way.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KIND_NTOK = 0
KIND_TOKEN = 1
KIND_LEN_MISMATCH = 2
KIND_NULL_TOKENS = 3
KIND_OOV_ROWS = 4

# Driver-OOM guard for the reference-profile token domain: the collected
# token-id set is bounded by the reference vocabulary (~10^5-10^6 for real
# tokenizers). A pathological profile above the cap falls back to hashing
# token ids into a bounded bucket domain (Knuth multiplicative mod 2^32),
# applied identically to the corpus side (numpy, below) and the profile side
# (drift rule), so frequency comparison stays consistent — at the cost of
# hash-collision blur instead of a driver OOM.
DEFAULT_MAX_REF_TOKENS = 1_000_000
DEFAULT_HASH_BUCKETS = 1 << 16
HASH_MULT = 2654435761  # Knuth's 2^32 / phi


def hash_token_bucket(tokens: np.ndarray, mod: int) -> np.ndarray:
    """Deterministic token-id -> bucket map, identical to the SQL form
    ``pmod(pmod(t * 2654435761, 4294967296), mod)`` for non-negative t."""
    return ((tokens.astype(np.int64) * HASH_MULT) & 0xFFFFFFFF) % mod

PARTIAL_SCHEMA = "part_id int, source string, kind int, key long, cnt long"

_NTOK_BITS = np.int64(33)
_NTOK_MASK = np.int64((1 << 33) - 1)


class SharedTokenStats:
    """Lazily-built, optionally persisted partials DataFrame."""

    def __init__(self, df: DataFrame, lo: int, hi: int, contiguous: bool,
                 ref_tokens: list[int] | None = None,
                 hash_mod: int | None = None,
                 vocab_lo: int | None = None,
                 vocab_hi: int | None = None,
                 direct_files: list[tuple[int, str]] | None = None):
        self.lo = int(lo)
        self.hi = int(hi)
        self.contiguous = bool(contiguous)
        self.ref_tokens = ref_tokens
        self.hash_mod = hash_mod
        self.vocab_lo = vocab_lo
        self.vocab_hi = vocab_hi  # exclusive; None disables kind 4
        if direct_files:
            self._partials = _build_partials_direct(
                df.sparkSession, direct_files, self.lo, self.hi,
                self.contiguous, ref_tokens, hash_mod, vocab_lo, vocab_hi,
            )
        else:
            self._partials = _build_partials(
                df, self.lo, self.hi, self.contiguous, ref_tokens, hash_mod,
                vocab_lo, vocab_hi,
            )

    @classmethod
    def from_profiles(
        cls,
        df: DataFrame,
        profiles: DataFrame,
        max_ref_tokens: int = DEFAULT_MAX_REF_TOKENS,
        hash_buckets: int = DEFAULT_HASH_BUCKETS,
        vocab_lo: int | None = None,
        vocab_hi: int | None = None,
        direct_files: list[tuple[int, str]] | None = None,
    ) -> "SharedTokenStats":
        # Bound the profile-domain collect with a LIMIT pushed into the ONE
        # Spark job (no separate count() job): at most cap+1 distinct keys
        # ever reach the driver. Seeing cap+1 proves the profile is over the
        # cap — nothing unbounded is collected; the domain becomes
        # [0, hash_buckets) and corpus tokens are hashed into it (the drift
        # rule hashes the profile side identically via `self.hash_mod`).
        keys = (
            profiles.select(F.explode(F.map_keys("token_freq")).alias("t"))
            .distinct()
            .limit(max_ref_tokens + 1)
            .collect()
        )
        if len(keys) > max_ref_tokens:
            return cls(df, 0, hash_buckets - 1, True, None,
                       hash_mod=hash_buckets,
                       vocab_lo=vocab_lo, vocab_hi=vocab_hi,
                       direct_files=direct_files)
        ref_tokens = sorted(r["t"] for r in keys)
        lo, hi = ref_tokens[0], ref_tokens[-1]
        contiguous = ref_tokens == list(range(lo, hi + 1))
        return cls(df, lo, hi, contiguous, None if contiguous else ref_tokens,
                   vocab_lo=vocab_lo, vocab_hi=vocab_hi,
                   direct_files=direct_files)

    @property
    def partials(self) -> DataFrame:
        return self._partials

    def persist(self) -> "SharedTokenStats":
        from pyspark import StorageLevel

        self._partials = self._partials.persist(StorageLevel.MEMORY_AND_DISK)
        return self

    def unpersist(self) -> None:
        try:
            self._partials.unpersist()
        except Exception:
            pass


def _decode_ntok(masked: np.ndarray) -> np.ndarray:
    """Undo the 33-bit two's-complement packing of n_tok keys."""
    out = masked.astype(np.int64)
    neg = out >= np.int64(1 << 32)
    out[neg] -= np.int64(1 << 33)
    return out


def _build_partials(
    df: DataFrame,
    lo: int,
    hi: int,
    contiguous: bool,
    ref_tokens: list[int] | None,
    hash_mod: int | None = None,
    vocab_lo: int | None = None,
    vocab_hi: int | None = None,
) -> DataFrame:
    # Domain filtering happens in numpy, not the JVM: a codegen'd F.filter
    # over 4e9 array elements costs ~3x the whole vectorized numpy mask, and
    # Arrow moves the raw int32 buffer essentially at memcpy speed (measured:
    # JVM-filter path 24s vs full-transfer+numpy-mask 17s on 38M rows/16c).
    src = df.select(
        "part_id",
        "source",
        "n_tok",
        # -1 encodes NULL arrays portably (ANSI mode makes size(NULL) = NULL)
        F.coalesce(F.size("tokens"), F.lit(-1)).alias("tok_sz"),
        "tokens",
    )
    gen = _make_batch_gen(lo, hi, ref_tokens, hash_mod, vocab_lo, vocab_hi)
    return (
        src.mapInArrow(gen, PARTIAL_SCHEMA)
        .groupBy("part_id", "source", "kind", "key")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _build_partials_direct(
    spark,
    files: list[tuple[int, str]],
    lo: int,
    hi: int,
    contiguous: bool,
    ref_tokens: list[int] | None,
    hash_mod: int | None = None,
    vocab_lo: int | None = None,
    vocab_hi: int | None = None,
) -> DataFrame:
    """Same partials, but each task DECODES ITS PARQUET FILE IN THE PYTHON
    WORKER with pyarrow instead of shipping `tokens` through the JVM scan →
    row → Arrow transpose (optimization guide §4.2: hand whole batches to
    vectorized native code; the Python boundary cost is controlled by how
    the bytes cross, and here the token buffers never materialize as JVM
    rows at all). Measured at the 3.2M-row bench corpus: the Spark-scan
    feed costs ~1.5s before the kernel sees a byte, the pyarrow feed ~0.4s.

    Spark still owns distribution and retries — the input is the (part_id,
    path) file list, repartitioned so each task streams one file — and the
    partials contract (schema, counts, nulls) is bit-identical to the
    mapInArrow path (pinned by tests/test_rules.py). Used only for local
    parquet layouts (the PartitionedTable contract); any exotic source
    falls back to the mapInArrow path."""
    kernel = _make_batch_gen(lo, hi, ref_tokens, hash_mod, vocab_lo, vocab_hi)

    def read_gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for b in batches:
            pids = b.column(0).to_pylist()
            paths = b.column(1).to_pylist()
            for pid, path in zip(pids, paths):
                pf = pq.ParquetFile(path)
                outs: list = []
                # 16k-row batches, measured optimum (r6 interleaved A/B):
                # larger ~64MB batches emit 6x fewer partial rows but push
                # the flat-token temporary past glibc's 32MB mmap threshold
                # (the first-touch page-fault cost the module docstring
                # documents) and lose decode/kernel pipelining — net ~10%
                # slower.
                for rb in pf.iter_batches(
                    batch_size=16384,
                    columns=["source", "n_tok", "tokens"],
                    use_threads=False,
                ):
                    toks = rb.column(2)
                    asm = pa.RecordBatch.from_arrays(
                        [
                            pa.array(
                                np.full(rb.num_rows, pid, dtype=np.int32)
                            ),
                            rb.column(0),
                            rb.column(1),
                            pc.fill_null(pc.list_value_length(toks), -1),
                            toks,
                        ],
                        names=["part_id", "source", "n_tok", "tok_sz",
                               "tokens"],
                    )
                    outs.extend(kernel([asm]))
                if outs:
                    # merge the per-batch partials IN THE WORKER before they
                    # cross back to the JVM: one file emits its final
                    # per-(source, kind, key) counts once (~6x fewer rows
                    # through the Arrow->row boundary and the partial agg)
                    yield _reduce_partials(pa, pc, outs)

    def _reduce_partials(pa, pc, outs):
        t = pa.Table.from_batches(outs).combine_chunks()
        pid = t.column("part_id").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(t.column("source"))
        chunk = enc.chunk(0) if hasattr(enc, "chunk") else enc
        idx = chunk.indices.to_numpy(zero_copy_only=False)
        n_src = len(chunk.dictionary)
        codes = (
            np.where(np.isnan(idx), n_src, idx).astype(np.int64)
            if idx.dtype.kind == "f"
            else idx.astype(np.int64)
        )
        src_vals = np.empty(n_src + 1, dtype=object)
        src_vals[:n_src] = chunk.dictionary.to_pylist()
        src_vals[n_src] = None
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        key = t.column("key").to_numpy(zero_copy_only=False)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((key, kind, codes, pid))
        pid, codes, kind, key, cnt = (
            a[order] for a in (pid, codes, kind, key, cnt)
        )
        new_grp = np.empty(len(pid), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (
            (pid[1:] != pid[:-1])
            | (codes[1:] != codes[:-1])
            | (kind[1:] != kind[:-1])
            | (key[1:] != key[:-1])
        )
        starts = np.nonzero(new_grp)[0]
        sums = np.add.reduceat(cnt, starts)
        return pa.RecordBatch.from_arrays(
            [
                pa.array(pid[starts].astype(np.int32), type=pa.int32()),
                pa.array(src_vals[codes[starts]], type=pa.string()),
                pa.array(kind[starts].astype(np.int32), type=pa.int32()),
                pa.array(key[starts].astype(np.int64), type=pa.int64()),
                pa.array(sums.astype(np.int64), type=pa.int64()),
            ],
            names=["part_id", "source", "kind", "key", "cnt"],
        )

    file_df = spark.createDataFrame(
        [(int(p), str(f)) for p, f in files], "part_id int, path string"
    ).repartition(max(1, len(files)))
    return (
        file_df.mapInArrow(read_gen, PARTIAL_SCHEMA)
        .groupBy("part_id", "source", "kind", "key")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _make_batch_gen(
    lo: int,
    hi: int,
    ref_tokens: list[int] | None,
    hash_mod: int | None,
    vocab_lo: int | None,
    vocab_hi: int | None,
):
    """The per-batch counting kernel, shared by the mapInArrow feed and the
    pyarrow-direct feed. Input batches have columns (part_id, source, n_tok,
    tok_sz, tokens) in that order."""
    span = hi - lo + 1
    ref_np = (
        np.asarray(ref_tokens, dtype=np.int64) if ref_tokens is not None else None
    )
    vlo = np.int64(vocab_lo if vocab_lo is not None else 0)
    vhi = None if vocab_hi is None else np.int64(vocab_hi)

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            n = b.num_rows
            if not n:
                continue
            pid = b.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            src_arr = b.column(1)
            ntok = b.column(2).to_numpy(zero_copy_only=False)  # float+NaN if nulls
            tok_sz = b.column(3).to_numpy(zero_copy_only=False).astype(np.int64)
            lists = b.column(4)

            # group labels: factorize (part_id, source) — vectorized.
            # null sources get the sentinel code n_src (kinds 2/3 only).
            d = pc.dictionary_encode(src_arr)
            idx = d.indices.to_numpy(zero_copy_only=False)
            n_src = len(d.dictionary)
            src_codes = np.where(np.isnan(idx), n_src, idx).astype(np.int64) \
                if idx.dtype.kind == "f" else idx.astype(np.int64)
            src_uniq = np.empty(n_src + 1, dtype=object)
            src_uniq[:n_src] = d.dictionary.to_pylist()
            src_uniq[n_src] = None
            combo = pid * (n_src + 1) + src_codes
            uniq_combo, ginv = np.unique(combo, return_inverse=True)
            ng = len(uniq_combo)
            g_pid = (uniq_combo // (n_src + 1)).astype(np.int32)
            g_src_code = (uniq_combo % (n_src + 1)).astype(np.int64)
            g_src = src_uniq[g_src_code]
            g_src_ok = g_src_code < n_src  # groups with a real (non-null) source
            row_src_ok = src_codes < n_src

            out = {k: [] for k in ("pid", "src", "kind", "key", "cnt")}

            def emit(gidx: np.ndarray, kind: int, key: np.ndarray, cnt: np.ndarray):
                out["pid"].append(g_pid[gidx])
                out["src"].append(g_src[gidx])
                out["kind"].append(np.full(len(gidx), kind, dtype=np.int32))
                out["key"].append(np.asarray(key, dtype=np.int64))
                out["cnt"].append(np.asarray(cnt, dtype=np.int64))

            # ---- kind 0: n_tok histogram (non-null n_tok, non-null source) -
            valid = ~np.isnan(ntok) if ntok.dtype.kind == "f" else np.ones(n, bool)
            m0 = valid & row_src_ok
            nt = ntok[m0].astype(np.int64)
            if nt.size:
                comb = (ginv[m0] << _NTOK_BITS) | (nt & _NTOK_MASK)
                u, c = np.unique(comb, return_counts=True)
                emit((u >> _NTOK_BITS).astype(np.int64), KIND_NTOK,
                     _decode_ntok(u & _NTOK_MASK), c)

            # ---- kind 1: token counts via flat values + lengths ------------
            # chunked: every temporary <= ~8MB (see module docstring)
            lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
            lengths = np.nan_to_num(lengths, nan=0.0).astype(np.int64)
            flat = lists.flatten().to_numpy(zero_copy_only=False)
            span1 = span + 1  # last slot per group = out-of-domain sentinel
            offsets = np.empty(n + 1, dtype=np.int64)
            offsets[0] = 0
            np.cumsum(lengths, out=offsets[1:])
            # FAST path (the common case: contiguous [0, hi] reference domain,
            # vocab_lo 0, raw int32 token buffer): view the int32 buffer as
            # uint32 so negatives become huge, making BOTH the domain test and
            # the vocab-bound test a single unsigned compare, and keep every
            # chunk temporary 32-bit — one np.minimum + one multiply-add per
            # token instead of five int64 passes (measured 2.1x on the
            # kernel microbench, OPTIMIZATION_r06.md §2a). Null-source rows
            # go to a DISCARD group (ng) instead of a per-element mask.
            fast = (
                hash_mod is None
                and ref_np is None
                and flat.dtype == np.int32
                and lo == 0
                and hi < 2**31 - 1
                and (vhi is None or int(vlo) == 0)
            )
            if fast:
                flat_u = flat.view(np.uint32)
                grp32 = np.where(row_src_ok, ginv, ng).astype(np.int32)
                acc = np.zeros((ng + 1) * span1, dtype=np.int64)
            else:
                grp = np.where(row_src_ok, ginv, -1)  # -1 = null-source row
                acc = np.zeros(ng * span1, dtype=np.int64)
            oov_rows = np.zeros(ng, dtype=np.int64)  # kind 4 accumulator
            CHUNK = 1 << 20
            row = 0
            while row < n:
                # widest row block whose token total fits the chunk budget
                row_end = int(
                    np.searchsorted(offsets, offsets[row] + CHUNK, side="right")
                ) - 1
                row_end = max(row_end, row + 1)
                start, end = int(offsets[row]), int(offsets[row_end])
                if fast:
                    flu = flat_u[start:end]
                    if vhi is not None:
                        bad_tok = flu >= np.uint32(int(vhi))
                        if bad_tok.any():
                            nr = row_end - row
                            rows_local = np.repeat(
                                np.arange(nr), lengths[row:row_end]
                            )
                            hit = (
                                np.bincount(rows_local[bad_tok], minlength=nr)
                                > 0
                            )
                            oov_rows += np.bincount(
                                ginv[row:row_end][hit], minlength=ng
                            )
                    g = np.repeat(grp32[row:row_end], lengths[row:row_end])
                    rel = np.minimum(flu, np.uint32(span)).astype(np.int32)
                    combo = rel + g * np.int32(span1)
                    acc += np.bincount(combo, minlength=(ng + 1) * span1)
                    row = row_end
                    continue
                g = np.repeat(grp[row:row_end], lengths[row:row_end])
                fl = flat[start:end].astype(np.int64)
                # ---- kind 4: vocab-bound check on the RAW values (before
                # any profile-domain hashing); per-row any-OOV via bincount,
                # null-source rows included (they group under the sentinel)
                if vhi is not None:
                    bad_tok = (fl < vlo) | (fl >= vhi)
                    if bad_tok.any():
                        nr = row_end - row
                        rows_local = np.repeat(
                            np.arange(nr), lengths[row:row_end]
                        )
                        hit = (
                            np.bincount(rows_local[bad_tok], minlength=nr) > 0
                        )
                        oov_rows += np.bincount(
                            ginv[row:row_end][hit], minlength=ng
                        )
                row = row_end
                if hash_mod is not None:
                    fl = hash_token_bucket(fl, hash_mod)
                rel = fl - lo
                oob = (rel < 0) | (rel >= span)
                if ref_np is not None:
                    # non-contiguous reference vocab: sorted-membership test
                    idx = np.searchsorted(ref_np, fl).clip(0, len(ref_np) - 1)
                    oob |= ref_np[idx] != fl
                oob |= g < 0
                rel = rel.clip(0, span - 1)
                combo = np.where(oob, span, rel) + np.maximum(g, 0) * span1
                acc += np.bincount(combo, minlength=ng * span1)
            if fast:
                # drop the discard group (null-source rows) and the sentinel
                # column (out-of-domain tokens) — identical semantics to the
                # masked general path
                acc = acc.reshape(ng + 1, span1)[:ng, :span].ravel()
            else:
                acc = acc.reshape(ng, span1)[:, :span].ravel()
            nz = np.nonzero(acc)[0]
            if nz.size:
                emit(nz // span, KIND_TOKEN, nz % span + lo, acc[nz])

            if vhi is not None and oov_rows.any():
                nz = np.nonzero(oov_rows)[0]
                emit(nz, KIND_OOV_ROWS, np.zeros(len(nz)), oov_rows[nz])

            # ---- kind 2: len mismatch (n_tok set and != original size) ----
            m2 = valid & (tok_sz >= 0)
            m2[m2] &= ntok[m2].astype(np.int64) != tok_sz[m2]
            if m2.any():
                bc = np.bincount(ginv[m2], minlength=ng)
                nz = np.nonzero(bc)[0]
                emit(nz, KIND_LEN_MISMATCH, np.zeros(len(nz)), bc[nz])

            # ---- kind 3: null token arrays ---------------------------------
            nulls = tok_sz < 0
            if nulls.any():
                bc = np.bincount(ginv[nulls], minlength=ng)
                nz = np.nonzero(bc)[0]
                emit(nz, KIND_NULL_TOKENS, np.zeros(len(nz)), bc[nz])

            if not out["pid"]:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out["pid"]), type=pa.int32()),
                    pa.array(np.concatenate(out["src"]), type=pa.string()),
                    pa.array(np.concatenate(out["kind"]), type=pa.int32()),
                    pa.array(np.concatenate(out["key"]), type=pa.int64()),
                    pa.array(np.concatenate(out["cnt"]), type=pa.int64()),
                ],
                names=["part_id", "source", "kind", "key", "cnt"],
            )

    return gen
