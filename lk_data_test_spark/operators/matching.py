"""Scored best-match join — the enrichment-matcher shape.

Reference semantics: ``/root/reference/scripts/enrich_fackel_bibls.py:77-96``
matches each source entry against an index by a token-overlap score and
attaches the best match above a threshold (with its idempotent re-run
contract handled by ``sources/dimension.py``). Re-expressed Spark-first:

1. **Candidate generation by rare-shingle blocking** (``df <= max_df`` over
   the union of both sides): only discriminative shingles create candidate
   pairs — the same quadratic-hot-key guard as ``dedup.ngram_jaccard_pairs``
   (the reference's 12,751x hot key is what happens without it).
2. **Scoring**: shared-rare-shingle count per (left, right) pair — one
   partial-aggregated shuffle of candidate pairs only.
3. **Best-match selection**: deterministic argmax per left id via
   ``row_number`` over (score DESC, right id), thresholded by ``min_score``
   — the "take the best match, skip ambiguous low scores" step the
   reference does per entry, here one window pass over candidates.

At 100 TB nothing shuffles at corpus granularity: shingle exploding is
map-side, the df cutoff bounds each blocking key's fan-out, and the window
partitions by left id (cardinality = left side, not pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles


def scored_best_match(
    left: DataFrame,
    right: DataFrame,
    n: int = 3,
    max_df: int = 20,
    min_score: int = 2,
) -> DataFrame:
    """Best right-side match per left doc: (doc_id, match_id, score).

    ``left`` / ``right``: DataFrames with (doc_id, text). Document frequency
    for the blocking cutoff is counted over BOTH sides so a shingle common
    on either side never becomes a blocking key.
    """
    lw = shingles(left, n).withColumnRenamed("doc_id", "lid")
    rw = shingles(right, n).withColumnRenamed("doc_id", "rid")
    rare = (
        lw.select(F.col("shingle"))
        .unionAll(rw.select(F.col("shingle")))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle")
    )
    cand = (
        lw.join(rare, "shingle", "left_semi")
        .join(rw.join(rare, "shingle", "left_semi"), "shingle")
        .groupBy("lid", "rid")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    win = Window.partitionBy("lid").orderBy(F.col("score").desc(), "rid")
    return (
        cand.withColumn("rk", F.row_number().over(win))
        .filter((F.col("rk") == 1) & (F.col("score") >= min_score))
        .select(
            F.col("lid").alias("doc_id"),
            F.col("rid").alias("match_id"),
            F.col("score"),
        )
    )
