"""R2 — doc_id uniqueness: HyperLogLog screen + exact hashed fallback.

Reference semantics: Counter-based duplicate detection, report keys with
count > 1 (``/root/reference/curation/check_fackel_references.py:32,55``,
``scripts/archiv/fackel_text_matches.py:36-39`` — the checked-in golden
``AmbiguousFackelReferences.txt`` is exactly this "key + amount>1" report).

Scale design: an exact count-distinct over 10^12 doc_ids is a massive
shuffle, so:
1. SCREEN: per partition, ``count(*)`` vs ``approx_count_distinct(doc_id,
   rsd)`` (HLL++, map-side mergeable, no row shuffle). Partitions where the
   HLL estimate is more than 2*rsd below the row count are *flagged*.
2. EXACT (flagged partitions only, partition-pruned scan):
   a. group by ``xxhash64(doc_id)`` (8-byte shuffle key instead of the full
      string) and keep hashes with count > 1;
   b. semi-join the fact rows of those hashes (tiny set) and re-group by the
      real ``doc_id`` to eliminate hash collisions and emit exact duplicate
      keys with their counts.

The screen can miss duplicate rates below its resolution (~3*rsd); callers
needing certainty set params ``{"uniqueness": {"always_exact": True}}`` which
skips the screen. rsd defaults to 0.01 (HLL++ p=14; rsd<=0.005 switches Spark
to a 10x slower sort-based aggregation path — measured), so duplicate rates
>=3% are reliably caught; the HLL sketch is deterministic for a given dataset.
Every verdict row records which path produced it (``detail`` =
``path=screen`` | ``path=exact``), so a pass that rests on the screen alone is
auditable downstream rather than indistinguishable from an exact pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.rules import RuleContext, RuleResult, part_skeleton

RULE_ID = "uniqueness"

DEFAULTS = {"rsd": 0.01, "always_exact": False}


def duplicate_doc_ids(df: DataFrame) -> DataFrame:
    """Exact duplicates via the hash-first pattern -> (part_id, doc_id, dup_count,
    source, n_tok)."""
    hashed = df.select("part_id", F.xxhash64("doc_id").alias("h"))
    dup_hashes = (
        hashed.groupBy("part_id", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("part_id", "h")
    )
    candidates = df.withColumn("h", F.xxhash64("doc_id")).join(
        dup_hashes, ["part_id", "h"], "left_semi"
    )
    return (
        candidates.groupBy("part_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("source").alias("source"),
            F.min("n_tok").alias("n_tok"),
        )
        .filter(F.col("dup_count") > 1)
    )


def evaluate(df: DataFrame, ctx: RuleContext) -> RuleResult:
    p = {**DEFAULTS, **ctx.params.get(RULE_ID, {})}
    ids = df.select("part_id", "doc_id")

    exact_parts: set[int]  # partitions whose verdict comes from the exact path
    if p["always_exact"]:
        scoped = df  # exact path over everything
        exact_parts = set(
            ctx.part_ids
            if ctx.part_ids is not None
            else [r["part_id"] for r in ids.select("part_id").distinct().collect()]
        )
    else:
        screen = ids.groupBy("part_id").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.approx_count_distinct("doc_id", p["rsd"]).alias("approx"),
        )
        flagged = [
            r["part_id"]
            for r in screen.filter(
                F.col("approx") < F.col("cnt") * (1.0 - 3.0 * p["rsd"])
            ).collect()
        ]
        scoped = df.filter(
            F.col("part_id").isin(flagged) if flagged else F.lit(False)
        )
        exact_parts = set(flagged)

    # tiny (one row per duplicated key); cache so violations + verdicts don't
    # re-run the hash-group plan
    dups = duplicate_doc_ids(scoped).cache()

    violations = dups.select(
        F.col("part_id").cast("int"),
        F.lit(RULE_ID).alias("rule_id"),
        "doc_id",
        "source",
        F.col("n_tok").cast("int"),
        F.format_string("duplicate doc_id count=%d", F.col("dup_count")).alias(
            "detail"
        ),
    )

    dup_keys = dups.groupBy("part_id").agg(
        F.count(F.lit(1)).cast("double").alias("metric")
    )
    # provenance: which path produced this verdict — 'path=exact' means the
    # hash-group exact scan ran for the partition; 'path=screen' means the
    # pass rests on the HLL screen alone (resolution ~3*rsd — auditable
    # downstream instead of indistinguishable from an exact pass)
    path_col = F.when(
        F.col("part_id").isin([int(x) for x in exact_parts])
        if exact_parts
        else F.lit(False),
        F.lit("path=exact"),
    ).otherwise(F.lit("path=screen"))
    verdicts = (
        part_skeleton(df, ctx)
        .join(dup_keys, "part_id", "left")
        .select(
            F.col("part_id").cast("int"),
            F.lit(RULE_ID).alias("rule_id"),
            (F.coalesce(F.col("metric"), F.lit(0.0)) == 0.0).alias("passed"),
            F.coalesce(F.col("metric"), F.lit(0.0)).alias("metric"),
            F.lit(0.0).alias("threshold"),
            path_col.alias("detail"),
        )
    )
    return RuleResult(verdicts, violations)
