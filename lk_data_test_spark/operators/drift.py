"""R4 — distribution drift of n_tok and token frequencies vs reference profiles.

Reference semantics: the corpus is compared against an externally-fetched
profile index (``/root/reference/curation/check_fackel_references.py:13-29``)
and the scored-matching procedure of ``scripts/enrich_fackel_bibls.py:77-96``;
here generalized to statistical drift detection per (partition, source).

Two signals, both computed in ONE fused pass (single scan of the fact table,
single Arrow stage, two small shuffles) without ever collecting raw rows:

1. **n_tok KS statistic.** ``n_tok`` lives in a bounded integer domain
   ([1, 8192]), so an *exact* histogram per (part_id, source) is a mergeable,
   bounded-size sketch (<= 8192 entries per group — strictly better than a
   t-digest here; ``functions/tdigest.py`` provides the t-digest path for
   unbounded real-valued columns). The Kolmogorov–Smirnov sup-distance is
   taken between the observed ECDF and the reference quantile profile.

2. **Token-frequency L1 distance.** The reference profile pins the expected
   relative frequency of the top-K tokens. Token arrays cross into Arrow raw
   (memcpy-speed int32 buffers) and are domain-filtered + bin-counted by the
   chunked numpy kernel in ``plans/shared.py`` — measured ~3x faster than a
   codegen'd per-element JVM ``F.filter``. Each task emits <= |ref_tokens|
   partial rows per group instead of shuffling one row per token occurrence
   (~10^14 rows at target scale for a JVM explode).

Plan shape::

    scan (part_id, source, n_tok, tokens·filtered)
      -> mapInPandas: tagged partials  (kind 0: n_tok hist, kind 1: token cnt)
      -> groupBy(part_id, source, kind, key).sum          [shuffle 1, partial agg]
      -> applyInPandas per (part_id, source): KS + L1     [shuffle 2, tiny input]
      -> score / verdicts / violations                    [rows = parts x sources]

Skew note: partial aggregation keys include (kind, key), which fans a hot
(part, source) over thousands of reducer keys; AQE skew handling covers the
rest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.rules import RuleContext, RuleResult, part_skeleton

RULE_ID = "drift"

DEFAULTS = {
    "ks_threshold": 0.18,
    "l1_threshold": 0.20,
    "min_docs": 300,  # groups smaller than this are too noisy to judge
    # "hist": exact ECDF from the bounded-int histogram (strictly better for
    # n_tok's small-int domain). "tdigest": fold the same weighted histogram
    # into a mergeable t-digest (functions/tdigest.py) and take the KS
    # distance from its interpolated CDF — the path for unbounded real-valued
    # drift columns, where an exact histogram has no bounded size.
    "method": "hist",
    # Driver-OOM guard (plans/shared.py): profiles whose token domain
    # exceeds max_ref_tokens are folded into hash_buckets hashed buckets on
    # both the corpus and profile sides instead of being collected raw.
    "max_ref_tokens": 1_000_000,
    "hash_buckets": 1 << 16,
}

def _ks_from_tdigest(
    values: np.ndarray, counts: np.ndarray, quantiles: np.ndarray
) -> float:
    """KS sup-distance via a t-digest built from the weighted histogram: the
    sketch path (north-star wording) — identical inputs to _ks_from_hist, CDF
    interpolated from <=128 centroids instead of the exact ECDF."""
    from ..functions.tdigest import TDigest

    order = np.argsort(values)
    d = TDigest()
    d.means = values[order].astype(np.float64)
    d.weights = counts[order].astype(np.float64)
    d._compress()
    # sup distance sampled where the reference CDF steps (its 99 quantiles)
    # and where the digest holds mass (its centroid means)
    probes = np.unique(np.concatenate([quantiles, d.means]))
    f_obs = d.cdf(probes)
    f_ref = np.searchsorted(quantiles, probes, side="right") / 100.0
    return float(np.max(np.abs(f_obs - f_ref)))


def _ks_from_hist(values: np.ndarray, counts: np.ndarray, quantiles: np.ndarray) -> float:
    """KS sup-distance between a histogram ECDF and a 99-quantile profile."""
    order = np.argsort(values)
    v = values[order].astype(np.float64)
    c = counts[order].astype(np.float64)
    total = c.sum()
    if total == 0:
        return 0.0
    cum = np.cumsum(c)
    ecdf_hi = cum / total
    ecdf_lo = (cum - c) / total
    # reference CDF at v: fraction of quantiles <= v (quantiles are 1%..99%)
    f_ref = np.searchsorted(quantiles, v, side="right") / 100.0
    return float(
        max(np.max(np.abs(ecdf_hi - f_ref)), np.max(np.abs(ecdf_lo - f_ref)))
    )


def evaluate(df: DataFrame, ctx: RuleContext) -> RuleResult:
    p = {**DEFAULTS, **ctx.params.get(RULE_ID, {})}
    profiles = ctx.reference_profiles
    if profiles is None:
        raise ValueError("drift rule requires ctx.reference_profiles")

    # ---- stage 1: tagged partials — shared with column_stats when the
    # runner provides ctx.shared (ONE scan of `tokens` for the whole suite)
    from ..plans.shared import (
        HASH_MULT,
        KIND_NTOK,
        KIND_TOKEN,
        SharedTokenStats,
    )

    shared = ctx.shared
    if shared is None or not isinstance(shared, SharedTokenStats):
        shared = SharedTokenStats.from_profiles(
            df, profiles,
            max_ref_tokens=int(p["max_ref_tokens"]),
            hash_buckets=int(p["hash_buckets"]),
        )
    merged = shared.partials.filter(F.col("kind").isin(KIND_NTOK, KIND_TOKEN))

    if shared.hash_mod:
        quantiles: dict[str, np.ndarray] = {
            r["source"]: np.asarray(r["n_tok_quantiles"], dtype=np.float64)
            for r in profiles.select("source", "n_tok_quantiles").collect()
        }
        # Pathological profile (token domain over the cap): the corpus side
        # counted hashed buckets, so fold the profile into the SAME bucket
        # domain SPARK-SIDE — the driver only ever sees <= sources x
        # hash_mod aggregated rows, never the raw token map.
        mod = int(shared.hash_mod)
        bucket = F.pmod(
            F.pmod(F.col("t").cast("bigint") * F.lit(HASH_MULT),
                   F.lit(1 << 32)),
            F.lit(mod),
        )
        freq_rows = (
            profiles.select(
                "source", F.explode("token_freq").alias("t", "freq")
            )
            .groupBy("source", bucket.cast("int").alias("b"))
            .agg(F.sum("freq").alias("freq"))
            .collect()
        )
        token_freq: dict[str, dict[int, float]] = {}
        for r in freq_rows:
            token_freq.setdefault(r["source"], {})[int(r["b"])] = float(
                r["freq"]
            )
    else:
        # sane profile: ONE collect of the tiny dimension serves both the
        # quantile and frequency closures (no extra per-run driver jobs)
        prof_rows = profiles.collect()
        quantiles = {
            r["source"]: np.asarray(r["n_tok_quantiles"], dtype=np.float64)
            for r in prof_rows
        }
        token_freq = {r["source"]: dict(r["token_freq"]) for r in prof_rows}
    ref_tokens = sorted({t for m in token_freq.values() for t in m})

    # ---- fused stage 2: KS + L1 per (part_id, source) ---------------------
    ref_idx = {t: i for i, t in enumerate(ref_tokens)}
    n_ref = len(ref_tokens)

    ks_fn = _ks_from_tdigest if p["method"] == "tdigest" else _ks_from_hist

    def score_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        part_id = int(pdf["part_id"].iloc[0])
        source = str(pdf["source"].iloc[0])
        h = pdf[pdf["kind"] == 0]  # KIND_NTOK
        t = pdf[pdf["kind"] == 1]  # KIND_TOKEN
        n_docs = float(h["cnt"].sum())
        q = quantiles.get(source)
        ks = (
            ks_fn(h["key"].to_numpy(), h["cnt"].to_numpy(), q)
            if q is not None and len(h)
            else 0.0
        )
        # total token mass (incl. out-of-profile tokens) from the histogram:
        # sum(n_tok * count) — no second scan needed
        total = float((h["key"] * h["cnt"]).sum())
        obs = np.zeros(n_ref)
        for tok, c in zip(t["key"], t["cnt"]):
            i = ref_idx.get(int(tok))
            if i is not None:
                obs[i] = float(c)
        obs = obs / total if total > 0 else obs
        ref = token_freq.get(source, {})
        refv = np.array([ref.get(tk, 0.0) for tk in ref_tokens])
        l1 = float(np.abs(obs - refv).sum())
        return pd.DataFrame(
            {
                "part_id": [part_id],
                "source": [source],
                "ks": [ks],
                "l1": [l1],
                "n_docs": [n_docs],
            }
        )

    # cached: tiny (one row per part x source) but expensive to produce;
    # verdicts and violations both read it
    per_group = (
        merged.groupBy("part_id", "source")
        .applyInPandas(
            score_fn, "part_id int, source string, ks double, l1 double, n_docs double"
        )
        .filter(F.col("n_docs") >= F.lit(float(p["min_docs"])))
        .withColumn(
            "score",
            F.greatest(
                F.col("ks") / F.lit(p["ks_threshold"]),
                F.col("l1") / F.lit(p["l1_threshold"]),
            ),
        )
        .cache()
    )

    violations = per_group.filter(F.col("score") > 1.0).select(
        F.col("part_id").cast("int"),
        F.lit(RULE_ID).alias("rule_id"),
        F.lit("").alias("doc_id"),  # partition-level finding
        "source",
        F.lit(None).cast("int").alias("n_tok"),
        F.format_string(
            "drift ks=%.4f l1=%.4f n=%.0f", F.col("ks"), F.col("l1"), F.col("n_docs")
        ).alias("detail"),
    )

    scores = per_group.groupBy("part_id").agg(F.max("score").alias("metric"))
    verdicts = (
        part_skeleton(df, ctx)
        .join(scores, "part_id", "left")
        .select(
            F.col("part_id").cast("int"),
            F.lit(RULE_ID).alias("rule_id"),
            (F.coalesce(F.col("metric"), F.lit(0.0)) <= 1.0).alias("passed"),
            F.coalesce(F.col("metric"), F.lit(0.0)).alias("metric"),
            F.lit(1.0).alias("threshold"),
            F.lit(
                f"method={p['method']}"
                + (f";domain=hashed:{shared.hash_mod}" if shared.hash_mod else "")
            ).alias("detail"),
        )
    )
    return RuleResult(verdicts, violations, stats=per_group)
