"""R4 — distribution drift of n_tok and token frequencies vs reference profiles.

Reference semantics: the corpus is compared against an externally-fetched
profile index (``/root/reference/curation/check_fackel_references.py:13-29``)
and the scored-matching procedure of ``scripts/enrich_fackel_bibls.py:77-96``;
here generalized to statistical drift detection per (partition, source).

Two signals, both computed without ever collecting raw rows:

1. **n_tok KS statistic.** ``n_tok`` lives in a bounded integer domain
   ([1, 8192]), so an *exact* histogram ``groupBy(part_id, source, n_tok)``
   is a mergeable, bounded-size sketch (<= 8192 rows per group — strictly
   better than a t-digest here; ``functions/tdigest.py`` provides the t-digest
   path for unbounded real-valued columns). A vectorized ``applyInPandas``
   over each (part_id, source) histogram computes the Kolmogorov–Smirnov
   sup-distance between the observed ECDF and the reference quantile profile.

2. **Token-frequency L1 distance.** The reference profile pins the expected
   relative frequency of the top-K tokens. The plan filters each row's token
   array down to profile tokens *before* exploding (``F.filter`` runs in the
   JVM, so >99% of tokens never become rows), aggregates counts per
   (part_id, source, token), and compares against the profile inside the same
   grouped-map pass. Total token mass per group comes from the stage-1
   histogram (sum n_tok * count) — no second full scan.

Skew note: groupBy keys include n_tok/token, which fans a hot (part, source)
over thousands of reducer keys; AQE skew handling covers the rest.
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
}


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

    # dimension is tiny (one row per source): close over it driver-side
    prof_rows = profiles.collect()
    quantiles: dict[str, np.ndarray] = {
        r["source"]: np.asarray(r["n_tok_quantiles"], dtype=np.float64)
        for r in prof_rows
    }
    token_freq: dict[str, dict[int, float]] = {
        r["source"]: dict(r["token_freq"]) for r in prof_rows
    }
    ref_tokens = sorted({t for m in token_freq.values() for t in m})
    ref_token_np = np.asarray(ref_tokens, dtype=np.int64)
    lo, hi = ref_tokens[0], ref_tokens[-1]
    contiguous = ref_tokens == list(range(lo, hi + 1))

    # ---- signal 1: exact bounded-domain n_tok histogram -> KS ------------
    # cached: reused by the KS pass and the token-mass totals, and re-read
    # when verdicts and violations both materialize
    hist = (
        df.filter(F.col("n_tok").isNotNull())
        .groupBy("part_id", "source", "n_tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .cache()
    )

    def ks_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        part_id = int(pdf["part_id"].iloc[0])
        source = str(pdf["source"].iloc[0])
        n = float(pdf["cnt"].sum())
        q = quantiles.get(source)
        ks = (
            _ks_from_hist(pdf["n_tok"].to_numpy(), pdf["cnt"].to_numpy(), q)
            if q is not None
            else 0.0
        )
        return pd.DataFrame(
            {"part_id": [part_id], "source": [source], "ks": [ks], "n_docs": [n]}
        )

    ks = hist.groupBy("part_id", "source").applyInPandas(
        ks_fn, "part_id int, source string, ks double, n_docs double"
    )

    # ---- signal 2: token-frequency L1 vs profile -------------------------
    # total token mass per group from the histogram (no extra full scan)
    totals = hist.groupBy("part_id", "source").agg(
        F.sum(F.col("n_tok").cast("double") * F.col("cnt")).alias("total_tok")
    )
    # Map-side partial counts inside one Arrow batch (numpy bincount):
    # a JVM explode would shuffle one row per matching token (~10^14 rows at
    # target scale); this emits <=|ref_tokens| partial rows per (batch, group)
    # instead — measured 3x faster than explode+filter even at bench scale.
    def tok_partials(batches) -> "pd.DataFrame":
        for pdf in batches:
            if not len(pdf):
                continue
            for (pid, src), g in pdf.groupby(["part_id", "source"], sort=False):
                flat = (
                    np.concatenate([np.asarray(t) for t in g["tokens"]])
                    if len(g)
                    else np.empty(0, dtype=np.int64)
                )
                if contiguous:
                    flat = flat[(flat >= lo) & (flat <= hi)]
                    if not flat.size:
                        continue
                    bc = np.bincount(flat - lo, minlength=hi - lo + 1)
                    vals = np.nonzero(bc)[0] + lo
                    cnts = bc[vals - lo]
                else:
                    flat = flat[np.isin(flat, ref_token_np)]
                    if not flat.size:
                        continue
                    vals, cnts = np.unique(flat, return_counts=True)
                yield pd.DataFrame(
                    {
                        "part_id": np.full(len(vals), pid, dtype=np.int32),
                        "source": src,
                        "token": vals.astype(np.int32),
                        "tok_cnt": cnts.astype(np.int64),
                    }
                )

    tok_counts = (
        df.select("part_id", "source", "tokens")
        .mapInPandas(
            tok_partials, "part_id int, source string, token int, tok_cnt long"
        )
        .groupBy("part_id", "source", "token")
        .agg(F.sum("tok_cnt").alias("tok_cnt"))
        .join(F.broadcast(totals), ["part_id", "source"], "left")
    )

    ref_idx = {t: i for i, t in enumerate(ref_tokens)}

    def l1_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        part_id = int(pdf["part_id"].iloc[0])
        source = str(pdf["source"].iloc[0])
        total = float(pdf["total_tok"].iloc[0] or 0.0)
        ref = token_freq.get(source, {})
        obs = np.zeros(len(ref_tokens))
        for t, c in zip(pdf["token"], pdf["tok_cnt"]):
            i = ref_idx.get(int(t))
            if i is not None:
                obs[i] = float(c)
        obs = obs / total if total > 0 else obs
        refv = np.array([ref.get(t, 0.0) for t in ref_tokens])
        return pd.DataFrame(
            {"part_id": [part_id], "source": [source], "l1": [float(np.abs(obs - refv).sum())]}
        )

    l1 = tok_counts.groupBy("part_id", "source").applyInPandas(
        l1_fn, "part_id int, source string, l1 double"
    )

    # ---- combine: normalized drift score per (part, source) --------------
    # cached: tiny (one row per part x source) but expensive to produce;
    # verdicts and violations both read it
    per_group = (
        ks.join(l1, ["part_id", "source"], "left")
        .withColumn("l1", F.coalesce(F.col("l1"), F.lit(0.0)))
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
        )
    )
    return RuleResult(verdicts, violations, stats=per_group)
