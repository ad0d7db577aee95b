"""Deterministic, seeded generator for the `sequences` corpus + dimensions.

The fact table mirrors the reference's edition corpus (one document per row,
``/root/reference/scripts/make_texts.py:230-232``) re-expressed per the
engine's input hint: ``doc_id string, tokens array<int>, n_tok int,
source string`` partitioned by ``part_id``. Violations are *injected* into
designated partitions so every rule has golden-known failing partitions
(the analog of the reference's checked-in golden outputs, e.g.
``/root/reference/AmbiguousFackelReferences.txt``).

Generation is distributed (one Spark task per partition via ``mapInPandas``)
and fully deterministic: each partition's RNG is seeded by ``(seed, part_id)``,
so the same config always produces byte-identical parquet content. At
10^12-row scale the identical recipe runs with ``n_parts`` in the tens of
thousands — no driver-side materialization anywhere.

Partition roles (deterministic in ``part_id``):
  part_id % 5 == 0  clean
  part_id % 5 == 1  "dup"     ~2% duplicated doc_ids        -> R2 must fail
  part_id % 5 == 2  "badcol"  null/zero/mismatched n_tok    -> R1 must fail
  part_id % 5 == 3  "badsrc"  ~1% rows with unknown source  -> R3 must fail
  part_id % 5 == 4  "drift"   n_tok mean x1.6, permuted token ranks -> R4 fails
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The allowed-sources dimension (analog of listperson.xml as FK target,
# /root/reference/curation/check_authors_exist_in_listperson.py:15-19).
ACTIVE_SOURCES: list[str] = ["fackel", "editions", "cases"] + [
    f"web-{i:02d}" for i in range(17)
]
INACTIVE_SOURCES: list[str] = ["retired-src"]

SEQ_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, part_id int"
)

ROLES = ("clean", "dup", "badcol", "badsrc", "drift")


@dataclass(frozen=True)
class GenConfig:
    n_parts: int = 16
    rows_per_part: int = 2000
    seed: int = 42
    vocab: int = 32768
    zipf_s: float = 1.1           # token-rank exponent
    source_zipf_s: float = 1.2    # source skew (one hot source >> others)
    ntok_sigma: float = 0.6       # lognormal sigma of n_tok
    ntok_max: int = 8192
    dup_frac: float = 0.05  # must exceed ~3*rsd of the R2 HLL screen
    # CROSS-partition doc_id collisions (global-uniqueness scope): each
    # dup-role partition with part_id >= 5 re-uses this fraction of ids from
    # the PREVIOUS dup-role partition (part_id - 5). 0.0 (the default) keeps
    # the generated corpus byte-identical to the pre-global-scope generator —
    # every checked-in golden fixture is under that default.
    cross_dup_frac: float = 0.0
    badsrc_frac: float = 0.01
    drift_ntok_mult: float = 1.6
    profile_sample: int = 20000   # clean-profile sample size per source
    top_tokens: int = 256


def part_role(part_id: int) -> str:
    return ROLES[part_id % 5]


def _source_probs(cfg: GenConfig) -> np.ndarray:
    ranks = np.arange(1, len(ACTIVE_SOURCES) + 1, dtype=np.float64)
    p = 1.0 / ranks**cfg.source_zipf_s
    return p / p.sum()


def _token_probs(cfg: GenConfig) -> np.ndarray:
    ranks = np.arange(1, cfg.vocab + 1, dtype=np.float64)
    p = 1.0 / ranks**cfg.zipf_s
    return p / p.sum()


def _source_mean_ntok(source: str) -> float:
    # deterministic per-source mean in [40, 200]
    h = sum(ord(c) for c in source)
    return 40.0 + (h % 17) * 10.0


def _gen_partition(part_id: int, cfg: GenConfig) -> pd.DataFrame:
    rng = np.random.default_rng((cfg.seed, part_id))
    role = part_role(part_id)
    n = cfg.rows_per_part

    src_idx = rng.choice(len(ACTIVE_SOURCES), size=n, p=_source_probs(cfg))
    sources = np.array(ACTIVE_SOURCES, dtype=object)[src_idx]

    means = np.array([_source_mean_ntok(s) for s in sources])
    if role == "drift":
        means = means * cfg.drift_ntok_mult
    n_tok = np.exp(rng.normal(np.log(means), cfg.ntok_sigma))
    n_tok = np.clip(n_tok, 1, cfg.ntok_max).astype(np.int64)

    tok_p = _token_probs(cfg)
    token_ids = np.arange(cfg.vocab)
    if role == "drift":
        # re-ranked Zipf: hot tokens swap places with cold ones
        perm_rng = np.random.default_rng((cfg.seed, 999983))
        token_ids = perm_rng.permutation(cfg.vocab)
    flat = rng.choice(token_ids, size=int(n_tok.sum()), p=tok_p).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(n_tok)])
    tokens = [flat[offsets[i]: offsets[i + 1]] for i in range(n)]

    doc_id = np.array([f"D{part_id:04d}-{i:08d}" for i in range(n)], dtype=object)

    n_tok_out = pd.array(n_tok, dtype="Int32")

    if role == "dup":
        d = max(1, int(cfg.dup_frac * n))
        doc_id[n - d:] = doc_id[:d]  # id collisions (R2)
        if cfg.cross_dup_frac > 0 and part_id >= 5:
            # ids [d, d+c) of the previous dup-role partition appear exactly
            # once THERE (its local-dup block is ids [0, d) duplicated into
            # the tail) — re-using them here creates doc_ids that are unique
            # within every partition yet duplicated ACROSS partitions, the
            # case a partition-scoped uniqueness check cannot see. The copies
            # land in rows [d+c, d+2c) — disjoint from the local-dup
            # originals [0, d), from the tail copies [n-d, n), AND from this
            # partition's own source range [d, d+c) (which the NEXT dup
            # partition may re-use — overwriting it would break the chain
            # when a partition is both receiver and source). No RNG draws
            # are consumed, so every other column and role is byte-identical.
            c = max(1, int(cfg.cross_dup_frac * n))
            prev = part_id - 5
            doc_id[d + c: d + 2 * c] = [
                f"D{prev:04d}-{i:08d}" for i in range(d, d + c)
            ]
    elif role == "badcol":
        # a handful of rows with null / zero / mismatched n_tok (R1)
        bad = rng.choice(n, size=6, replace=False)
        n_tok_out[bad[0]] = pd.NA
        n_tok_out[bad[1]] = pd.NA
        n_tok_out[bad[2]] = 0
        n_tok_out[bad[3]] = 0
        n_tok_out[bad[4]] = int(n_tok[bad[4]]) + 7
        n_tok_out[bad[5]] = int(n_tok[bad[5]]) + 7
        # out-of-vocab token values (token_bounds): 5 rows get their first
        # token replaced by an id outside [0, vocab) — 3 above the vocab,
        # 2 negative. Drawn AFTER the rows above so the rng stream feeding
        # every earlier draw (and every other role) is unchanged.
        oov = rng.choice(n, size=5, replace=False)
        for j, i in enumerate(oov):
            tokens[i][0] = cfg.vocab + 100 + j if j < 3 else -(j - 1)
    elif role == "badsrc":
        b = max(1, int(cfg.badsrc_frac * n))
        bad = rng.choice(n, size=b, replace=False)
        for j, i in enumerate(bad):
            sources[i] = (
                INACTIVE_SOURCES[0] if j % 3 == 0 else f"unknown-{j % 7:02d}"
            )

    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": n_tok_out,
            "source": sources,
            "part_id": np.full(n, part_id, dtype=np.int32),
        }
    )


def sequences_df(
    spark: SparkSession,
    cfg: GenConfig = GenConfig(),
    part_ids: list[int] | None = None,
) -> DataFrame:
    """Distributed generation: one task per part_id.

    ``part_ids`` generates only the named partitions (identical bytes to the
    same ids in a full run — the RNG is seeded per (seed, part_id)); used to
    append deltas to an existing corpus without regenerating the rest.
    """
    if part_ids is not None:
        parts = spark.createDataFrame(
            [(int(p),) for p in part_ids], "part_id bigint"
        )
        n_tasks = max(1, len(part_ids))
    else:
        parts = spark.range(cfg.n_parts).withColumnRenamed("id", "part_id")
        n_tasks = cfg.n_parts
    # one part per task so the per-partition RNG seeding is exact
    parts = parts.repartition(n_tasks, "part_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pid in pdf["part_id"].tolist():
                yield _gen_partition(int(pid), cfg)

    return parts.mapInPandas(gen, schema=SEQ_SCHEMA)


def allowed_sources_df(spark: SparkSession) -> DataFrame:
    rows = [(s, True) for s in ACTIVE_SOURCES] + [
        (s, False) for s in INACTIVE_SOURCES
    ]
    return spark.createDataFrame(rows, "source string, active boolean")


def reference_profiles_df(
    spark: SparkSession, cfg: GenConfig = GenConfig()
) -> DataFrame:
    """Per-source clean profile: 99 n_tok quantiles + top-K token frequencies.

    Analog of the external ``fackelTexts_cascaded.xml`` profile the corpus is
    compared against (/root/reference/curation/check_fackel_references.py:13-29).
    Quantiles come from a large seeded clean sample; token frequencies are the
    *analytic* Zipf probabilities (exact, no sampling noise).
    """
    tok_p = _token_probs(cfg)
    token_freq = {int(k): float(tok_p[k]) for k in range(cfg.top_tokens)}
    rows = []
    for s in ACTIVE_SOURCES:
        rng = np.random.default_rng((cfg.seed, 777, sum(ord(c) for c in s)))
        sample = np.exp(
            rng.normal(np.log(_source_mean_ntok(s)), cfg.ntok_sigma, cfg.profile_sample)
        )
        sample = np.clip(sample, 1, cfg.ntok_max)
        qs = np.quantile(sample, np.arange(1, 100) / 100.0)
        rows.append((s, [float(q) for q in qs], token_freq))
    schema = T.StructType(
        [
            T.StructField("source", T.StringType(), False),
            T.StructField("n_tok_quantiles", T.ArrayType(T.DoubleType()), False),
            T.StructField(
                "token_freq", T.MapType(T.IntegerType(), T.DoubleType()), False
            ),
        ]
    )
    return spark.createDataFrame(rows, schema)


def generate(spark: SparkSession, out_dir: str, cfg: GenConfig = GenConfig()) -> None:
    """Write sequences (partitioned by part_id) + both dimension tables."""
    seq = sequences_df(spark, cfg)
    (
        seq.write.mode("overwrite")
        .partitionBy("part_id")
        .parquet(os.path.join(out_dir, "sequences"))
    )
    # repartition(1), NOT coalesce(1): a local-relation createDataFrame
    # parallelizes into defaultParallelism Python partitions, and coalesce
    # makes ONE task iterate them all serially through the Python-worker
    # path (~6s per 20-row dimension, measured r6); repartition evaluates
    # them in parallel and shuffles the handful of rows.
    allowed_sources_df(spark).repartition(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "allowed_sources")
    )
    reference_profiles_df(spark, cfg).repartition(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "reference_profiles"))


def expected_failing_parts(cfg: GenConfig) -> dict[str, set[int]]:
    """Analytically known golden verdicts: rule_id -> failing part_ids."""
    by_role: dict[str, set[int]] = {r: set() for r in ROLES}
    for p in range(cfg.n_parts):
        by_role[part_role(p)].add(p)
    return {
        "schema": set(),  # generated corpus always matches the contract
        "column_stats": set(by_role["badcol"]),
        "token_bounds": set(by_role["badcol"]),  # 5 OOV rows per badcol part
        "uniqueness": set(by_role["dup"]),
        "referential": set(by_role["badsrc"]),
        "drift": set(by_role["drift"]),
    }


def expected_global_dup_ids(cfg: GenConfig) -> dict[int, int]:
    """Analytic GLOBAL-scope uniqueness expectation: part_id -> number of
    distinct doc_ids in that partition that occur more than once anywhere in
    the corpus. Derived purely from the injection arithmetic (no generation):
    a dup-role partition holds ``d`` locally-duplicated ids, plus ``c`` ids
    shared with the NEXT dup-role partition (it is a cross-dup source), plus
    ``c`` ids shared with the PREVIOUS one (it is a receiver)."""
    n = cfg.rows_per_part
    d = max(1, int(cfg.dup_frac * n))
    c = max(1, int(cfg.cross_dup_frac * n)) if cfg.cross_dup_frac > 0 else 0
    out: dict[int, int] = {}
    for p in range(cfg.n_parts):
        if part_role(p) != "dup":
            out[p] = 0
            continue
        m = d
        if c and p >= 5:
            m += c  # receiver: holds ids of partition p-5
        if c and p + 5 < cfg.n_parts:
            m += c  # source: partition p+5 re-uses this partition's ids
        out[p] = m
    return out
