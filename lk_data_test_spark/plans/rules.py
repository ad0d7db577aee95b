"""Declarative rule registry.

The Spark counterpart of the reference's declarative classification rules
(``/root/reference/curation/work_type_mapping.py:1-22`` applied at
``curation/add_work_types.py:15-20``): adding a validation rule = adding one
registry entry naming a builder function. Every rule emits two DataFrames with
fixed schemas:

verdicts:    (part_id, rule_id, passed, metric, threshold, detail)  one row per
             partition; ``detail`` records evaluation provenance (e.g. which
             path produced the verdict: ``path=screen`` vs ``path=exact`` for
             uniqueness, ``method=hist|tdigest`` for drift) so a pass from a
             lower-resolution screen is auditable downstream
violations:  (part_id, rule_id, doc_id, source, n_tok, detail) zero+ rows

Violation rows are canonically ordered (orderBy part_id, rule_id, doc_id,
detail) before being persisted so fixtures compare byte-identically — the
analog of the reference's sorted globs (make_texts.py:230) and sorted counters
(check_fackel_references.py:33-35).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("rule_id", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("metric", T.DoubleType(), True),
        T.StructField("threshold", T.DoubleType(), True),
        T.StructField("detail", T.StringType(), True),
    ]
)

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("rule_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("detail", T.StringType(), True),
    ]
)


@dataclass
class RuleResult:
    verdicts: DataFrame
    violations: DataFrame
    stats: DataFrame | None = None  # optional per-partition metrics table


@dataclass
class RuleContext:
    """Everything a rule may need besides the fact DataFrame."""

    spark: SparkSession
    allowed_sources: DataFrame | None = None
    reference_profiles: DataFrame | None = None
    part_ids: list[int] | None = None  # known partitions (skips a distinct())
    params: dict = field(default_factory=dict)
    # shared token-scan partials (plans/shared.py): when the runner provides
    # this, drift and column_stats consume ONE physical pass over `tokens`
    # instead of scanning the dominant column once per rule
    shared: object | None = None


@dataclass(frozen=True)
class Rule:
    rule_id: str
    version: str
    evaluate: Callable[[DataFrame, RuleContext], RuleResult]
    params: dict = field(default_factory=dict)


def part_skeleton(df: DataFrame, ctx: RuleContext) -> DataFrame:
    """One row per partition — from ctx (free) or a distinct scan (cheap:
    part_id is a directory column, so only partition metadata is read)."""
    if ctx.part_ids is not None:
        return ctx.spark.createDataFrame(
            [(int(p),) for p in sorted(ctx.part_ids)], "part_id int"
        )
    return df.select(F.col("part_id").cast("int")).distinct()


def verdict_from_violations(
    df: DataFrame,
    violations: DataFrame,
    ctx: RuleContext,
    rule_id: str,
    threshold: float = 0.0,
) -> DataFrame:
    """passed := (#violations in partition) <= threshold."""
    counts = violations.groupBy("part_id").agg(
        F.count(F.lit(1)).cast("double").alias("metric")
    )
    return (
        part_skeleton(df, ctx)
        .join(counts, "part_id", "left")
        .select(
            F.col("part_id").cast("int"),
            F.lit(rule_id).alias("rule_id"),
            (F.coalesce(F.col("metric"), F.lit(0.0)) <= F.lit(threshold)).alias(
                "passed"
            ),
            F.coalesce(F.col("metric"), F.lit(0.0)).alias("metric"),
            F.lit(float(threshold)).alias("threshold"),
            F.lit(None).cast("string").alias("detail"),
        )
    )


def canonical_violations(v: DataFrame) -> DataFrame:
    """Canonical column order + sort for byte-identical fixture compares.
    ``source`` participates because partition-scoped rules (drift) emit one
    row per source with an empty doc_id."""
    cols = [f.name for f in VIOLATION_SCHEMA.fields]
    return v.select(*cols).orderBy(
        "part_id", "rule_id", "doc_id", "source", "detail"
    )


def default_rules() -> list[Rule]:
    """The full suite (SURVEY.md §7.2). Import here to avoid cycles."""
    from ..operators import (
        column_stats,
        drift,
        referential,
        schema_check,
        token_bounds,
        uniqueness,
    )

    return [
        Rule("schema", "1.0", schema_check.evaluate),
        Rule("column_stats", "1.0", column_stats.evaluate),
        Rule("token_bounds", "1.0", token_bounds.evaluate),
        Rule("uniqueness", "1.0", uniqueness.evaluate),
        Rule("referential", "1.0", referential.evaluate),
        Rule("drift", "1.0", drift.evaluate),
    ]


def optional_rules(names: list[str]) -> list[Rule]:
    """Opt-in rules whose contract is deployment configuration rather than
    a corpus universal (e.g. seq_structure needs the tokenizer's BOS/EOS/PAD
    ids). Kept out of default_rules() so golden fixtures, the flagship
    VALUES oracle, and resume manifests are independent of local config;
    selected via ``cli.py --extra-rules name[,name...]``. Manifest lineage
    records their versions like any other rule, so enabling one invalidates
    previously-validated partitions exactly as a rule-version bump would."""
    from ..operators import seq_structure

    registry = {
        "seq_structure": lambda: Rule("seq_structure", "1.0", seq_structure.evaluate),
    }
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise ValueError(
            f"unknown extra rules {unknown}; available: {sorted(registry)}"
        )
    return [registry[n]() for n in names]
