"""Reference-profile BUILDER: derive the drift rule's per-source profile
table from a trusted (clean) corpus, instead of requiring an externally
supplied index.

Reference parity: the reference suite fetches its profile index from an
external service before checking (`check_fackel_references.py:13-29`); this
module closes that loop engine-side — point it at a vetted corpus snapshot
and it emits the exact table `operators/drift.py` consumes
(source, n_tok_quantiles array<double>[99], token_freq map<int,double>).

Scale shape (10^12 sequences):
- quantiles: ONE percentile_approx aggregation per source — a bounded
  mergeable sketch with map-side combine; no sort, no windows.
- token frequencies: explode(tokens) pipelines straight into a partial hash
  aggregate inside the same stage, so the shuffle carries only the distinct
  (source, token) partial counts (bounded by sources x vocab), never one row
  per token occurrence (~10^14). Top-K per source is a window over the
  per-source vocabulary — bounded by the tokenizer vocabulary by contract
  (the same bounded-vocab contract `plans/shared.py` documents; its hashed
  fallback guards the pathological case downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PCTS = [i / 100.0 for i in range(1, 100)]


def build_reference_profiles(
    df: DataFrame, top_k: int = 256, accuracy: int = 10000
) -> DataFrame:
    """(source, n_tok_quantiles, token_freq) from a clean sequences corpus.

    ``token_freq`` holds the top-``top_k`` tokens per source by occurrence
    count, as a fraction of the source's TOTAL token mass (matching the
    convention of ``datagen.reference_profiles_df`` — the fractions do not
    sum to 1).
    """
    quantiles = df.groupBy("source").agg(
        F.percentile_approx("n_tok", F.array(*[F.lit(p) for p in PCTS]), accuracy)
        .cast("array<double>")
        .alias("n_tok_quantiles")
    )

    counts = (
        df.select("source", F.explode("tokens").alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = counts.groupBy("source").agg(F.sum("cnt").alias("total"))
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), "t")
    top = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .join(F.broadcast(totals), "source")
        .select(
            "source",
            "t",
            (F.col("cnt").cast("double") / F.col("total")).alias("freq"),
        )
    )
    freq = top.groupBy("source").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("t", "freq")))
        ).alias("token_freq")
    )
    return quantiles.join(freq, "source").orderBy("source")
