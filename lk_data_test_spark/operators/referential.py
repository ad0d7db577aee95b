"""R3 — referential integrity: every `source` must exist (active) in the
allowed-sources dimension.

Reference semantics: author keys of listwork not present among listperson
xml:ids are reported as missing (``/root/reference/scripts/archiv/
check_authors.py:7-17``; the curation variant ``curation/
check_authors_exist_in_listperson.py:14-25`` has a latent bug — line 16
re-binds ``authors=set()`` — we implement the intended semantics).

Spark plan: broadcast LEFT ANTI join fact->dim. The dimension is tiny
(20 rows here; <=10^5 realistically), so the anti join is a broadcast hash
join with zero shuffle of the 10^12-row fact side; the scan reads only
(doc_id, source, n_tok, part_id) — `tokens` is column-pruned away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.rules import (
    RuleContext,
    RuleResult,
    verdict_from_violations,
)

RULE_ID = "referential"


def evaluate(df: DataFrame, ctx: RuleContext) -> RuleResult:
    allowed = ctx.allowed_sources
    if allowed is None:
        raise ValueError("referential rule requires ctx.allowed_sources")
    active = allowed.filter(F.col("active")).select("source")

    violations = (
        df.select("part_id", "doc_id", "source", "n_tok")
        .join(F.broadcast(active), "source", "left_anti")
        .select(
            F.col("part_id").cast("int"),
            F.lit(RULE_ID).alias("rule_id"),
            "doc_id",
            "source",
            F.col("n_tok").cast("int"),
            F.concat(F.lit("unknown source: "), F.col("source")).alias("detail"),
        )
    )
    verdicts = verdict_from_violations(df, violations, ctx, RULE_ID)
    return RuleResult(verdicts, violations)
