"""Generic constraint enforcement: the suggestion → verification loop.

`operators/suggest.py` profiles a table once and emits candidate constraints
(the public Deequ "constraint suggestion" idea). This module closes the loop:
it turns those suggestions — or hand-written constraints — into an executable
check that runs as ONE aggregation pass per table, and optionally as a
standard suite `Rule` so accepted suggestions ride the flagship runner next
to the hand-built rules.

Reference analog: the reference enforces hand-curated value domains
(``/root/reference/curation/work_type_mapping.py:1-22`` — an is_in map built
by a human from the data) and count expectations; here the domains/ranges are
machine-suggested from a profile and enforced mechanically.

Scale shape: verdicts are a single grouped aggregate (one conditional sum per
constraint — partial+final, no fact-row shuffle beyond the per-group
partials). Violation rows come from one additional filtered scan that emits
only breaching rows, exploded per breached constraint. Both plans are pure
JVM expressions (no UDFs).

Supported kinds (the suggester's vocabulary, minus ``unique`` — uniqueness
needs a groupBy-count, which `operators/uniqueness.py` already implements at
scale; `from_suggestions` skips it and callers wire the uniqueness rule
instead):

    not_null   value IS NULL violates
    is_in      non-null value outside the comma-joined domain violates
    min_ge     non-null value < bound violates (bound cast to the col type)
    max_le     non-null value > bound violates
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ENFORCEABLE_KINDS = ("not_null", "is_in", "min_ge", "max_le")

VERDICT_SCHEMA = (
    "group_key string, constraint_id string, n_violations bigint,"
    " passed boolean"
)


@dataclass(frozen=True)
class Constraint:
    col: str
    kind: str  # one of ENFORCEABLE_KINDS
    value: str | None = None  # domain (comma-joined) or bound, as string

    def __post_init__(self):
        if self.kind not in ENFORCEABLE_KINDS:
            raise ValueError(f"unsupported constraint kind {self.kind!r}")
        if self.kind != "not_null" and not self.value:
            raise ValueError(f"{self.kind} requires a value")

    @property
    def constraint_id(self) -> str:
        return f"{self.kind}:{self.col}"

    def violation_pred(self, df: DataFrame) -> Column:
        """True where the row breaches this constraint. Null-safe: range and
        domain checks never fire on NULL (that is not_null's job)."""
        c = F.col(self.col)
        if self.kind == "not_null":
            return c.isNull()
        if self.kind == "is_in":
            domain = [v for v in str(self.value).split(",")]
            return c.isNotNull() & ~c.isin(domain)
        bound = F.lit(self.value).cast(df.schema[self.col].dataType)
        if self.kind == "min_ge":
            return c.isNotNull() & (c < bound)
        return c.isNotNull() & (c > bound)  # max_le


def from_suggestions(suggestions: DataFrame | list) -> list[Constraint]:
    """Accept `suggest_constraints` output (DataFrame or collected rows) as
    enforceable constraints. ``unique`` suggestions are skipped (see module
    docstring); order is canonical (col, kind) so downstream plans are
    deterministic regardless of suggestion-row order."""
    rows = (
        suggestions.collect()
        if isinstance(suggestions, DataFrame)
        else list(suggestions)
    )
    out = [
        Constraint(r["col_name"], r["constraint_kind"], r["suggested_value"] or None)
        for r in rows
        if r["constraint_kind"] in ENFORCEABLE_KINDS
    ]
    return sorted(out, key=lambda c: (c.col, c.kind))


def constraint_verdicts(
    df: DataFrame, constraints: list[Constraint], group_col: str
) -> DataFrame:
    """Per-group pass/fail for every constraint in ONE aggregation pass.

    Returns VERDICT_SCHEMA rows: each group emits one row per constraint
    (n_violations exact, passed := n_violations == 0), including groups with
    zero violations — the verdict table is the contract, not just the bad
    news. The wide aggregate is melted with ``stack`` (no shuffle beyond the
    grouped partials)."""
    if not constraints:
        raise ValueError("no constraints to enforce")
    aggs = [
        F.sum(c.violation_pred(df).cast("long")).alias(c.constraint_id)
        for c in constraints
    ]
    wide = df.groupBy(F.col(group_col).cast("string").alias("group_key")).agg(
        *aggs
    )
    stack_args = ", ".join(
        f"'{c.constraint_id}', `{c.constraint_id}`" for c in constraints
    )
    return wide.select(
        "group_key",
        F.expr(
            f"stack({len(constraints)}, {stack_args}) AS"
            " (constraint_id, n_violations)"
        ),
    ).select(
        "group_key",
        "constraint_id",
        F.col("n_violations").cast("bigint"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def constraint_violations(
    df: DataFrame,
    constraints: list[Constraint],
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Breaching rows, one output row per (row, breached constraint):
    (group_key, constraint_id, row_id, observed). One filtered scan — the
    per-row constraint flags are built as an array of structs and exploded
    AFTER the any-breach filter, so clean rows never leave the scan."""
    flags = F.array(
        *[
            F.when(
                c.violation_pred(df),
                F.struct(
                    F.lit(c.constraint_id).alias("constraint_id"),
                    F.col(c.col).cast("string").alias("observed"),
                ),
            )
            for c in constraints
        ]
    )
    return (
        df.select(
            F.col(group_col).cast("string").alias("group_key"),
            F.col(id_col).cast("string").alias("row_id"),
            F.filter(flags, lambda x: x.isNotNull()).alias("breached"),
        )
        .filter(F.size("breached") > 0)
        .select(
            "group_key", "row_id", F.explode("breached").alias("b")
        )
        .select(
            "group_key",
            F.col("b.constraint_id").alias("constraint_id"),
            "row_id",
            F.col("b.observed").alias("observed"),
        )
    )


def constraint_rule(constraints: list[Constraint], version: str = "1.0"):
    """Wrap a constraint set as a standard suite `Rule` over the sequences
    table (violations in the canonical rule schema), so accepted suggestions
    run inside `ValidationRunner` next to the hand-built rules."""
    from ..plans.rules import Rule, RuleContext, RuleResult, part_skeleton

    def evaluate(df: DataFrame, ctx: RuleContext) -> RuleResult:
        verd = constraint_verdicts(df, constraints, "part_id")
        per_part = verd.groupBy(
            F.col("group_key").cast("int").alias("part_id")
        ).agg(
            F.sum("n_violations").cast("double").alias("metric"),
            F.min("passed").alias("passed"),
        )
        verdicts = (
            part_skeleton(df, ctx)
            .join(per_part, "part_id", "left")
            .select(
                F.col("part_id").cast("int"),
                F.lit("constraints").alias("rule_id"),
                F.coalesce(F.col("passed"), F.lit(True)).alias("passed"),
                F.coalesce(F.col("metric"), F.lit(0.0)).alias("metric"),
                F.lit(0.0).alias("threshold"),
                F.lit(None).cast("string").alias("detail"),
            )
        )
        viol = constraint_violations(
            df, constraints, "part_id", "doc_id"
        ).select(
            F.col("group_key").cast("int").alias("part_id"),
            F.lit("constraints").alias("rule_id"),
            F.col("row_id").alias("doc_id"),
            F.lit(None).cast("string").alias("source"),
            F.lit(None).cast("int").alias("n_tok"),
            F.concat_ws("=", "constraint_id", "observed").alias("detail"),
        )
        return RuleResult(verdicts, viol)

    return Rule("constraints", version, evaluate)
