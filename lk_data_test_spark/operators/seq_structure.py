"""R7 (opt-in) — seq_structure: BOS/EOS/PAD placement inside the token array.

Reference semantics: the reference validates STRUCTURAL placement inside its
payload, not just value domains — begin/end markers must sit where the
format says they sit (``extract_begin_end``'s paired begin/end attributes,
``/root/reference/scripts/make_texts.py:101-128``) and list containers must
not carry stray members (``curation/check_fackel_references.py:24-35``).
For a tokenized training corpus the structural contract is the tokenizer's
framing: a sequence must begin with the BOS id, its last real position
(``tokens[n_tok]``) must be the EOS id, and the PAD id must never appear
inside the real token range — an interior PAD silently truncates the
sequence for most training stacks, and a missing BOS/EOS shifts every
position embedding.

The contract is TOKENIZER CONFIGURATION, not a corpus universal (many
tokenizers have no BOS at all), so this rule is opt-in and each check is
armed only by its parameter:

    --extra-rules seq_structure \\
    --params '{"seq_bos_id": 1, "seq_eos_id": 2, "seq_pad_id": 0}'

Scale design: all three checks are JVM-side expressions (``element_at``,
``slice`` + ``exists``) evaluated in ONE whole-stage-codegen pass — the
violation tags are built as an array literal filtered non-null, so a row
contributes zero bytes unless it actually violates; the verdict is the
standard per-partition count. Rows with a null/non-positive ``n_tok`` or a
``n_tok``/array-length mismatch are SKIPPED here — those defects belong to
column_stats, and double-reporting them would make partition verdicts
dependent on rule ordering. No shuffle beyond the per-partition count
partials; nothing leaves the executor at token granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.rules import RuleContext, RuleResult, verdict_from_violations

RULE_ID = "seq_structure"


def _structurally_checkable() -> Column:
    """Rows whose framing is even defined: non-null tokens, n_tok >= 1, and
    n_tok consistent with the array (inconsistent rows are column_stats
    defects; checking tokens[n_tok] on them would read garbage)."""
    return (
        F.col("tokens").isNotNull()
        & F.col("n_tok").isNotNull()
        & (F.col("n_tok") >= 1)
        & (F.size(F.col("tokens")) >= F.col("n_tok"))
    )


def violation_tags(
    bos_id: int | None, eos_id: int | None, pad_id: int | None
) -> Column:
    """array<string> of structural defects for one row; empty when clean.
    Each check contributes only if its id parameter is armed."""
    checks: list[Column] = []
    if bos_id is not None:
        checks.append(
            F.when(
                F.element_at(F.col("tokens"), 1) != F.lit(int(bos_id)),
                F.lit("missing_bos"),
            )
        )
    if eos_id is not None:
        checks.append(
            F.when(
                F.element_at(F.col("tokens"), F.col("n_tok").cast("int"))
                != F.lit(int(eos_id)),
                F.lit("missing_eos"),
            )
        )
    if pad_id is not None:
        # PAD inside the real range [1, n_tok]; trailing padding beyond
        # n_tok is the storage convention and stays legal
        interior = F.slice(F.col("tokens"), 1, F.col("n_tok").cast("int"))
        checks.append(
            F.when(
                F.exists(interior, lambda t: t == F.lit(int(pad_id))),
                F.lit("interior_pad"),
            )
        )
    if not checks:
        return F.array().cast("array<string>")
    return F.filter(F.array(*checks), lambda x: x.isNotNull())


def evaluate(df: DataFrame, ctx: RuleContext) -> RuleResult:
    p = ctx.params or {}
    bos = p.get("seq_bos_id")
    eos = p.get("seq_eos_id")
    pad = p.get("seq_pad_id")

    tags = violation_tags(bos, eos, pad)
    violations = (
        df.filter(_structurally_checkable())
        .select(
            F.col("part_id").cast("int"),
            F.col("doc_id").cast("string"),
            F.col("source").cast("string"),
            F.col("n_tok").cast("int"),
            tags.alias("tags"),
        )
        .filter(F.size("tags") > 0)
        .select(
            "part_id",
            F.lit(RULE_ID).alias("rule_id"),
            "doc_id",
            "source",
            "n_tok",
            F.explode("tags").alias("detail"),
        )
    )
    verdicts = verdict_from_violations(df, violations, ctx, RULE_ID)
    armed = ",".join(
        k for k, v in (("bos", bos), ("eos", eos), ("pad", pad)) if v is not None
    )
    verdicts = verdicts.withColumn(
        "detail", F.lit(f"armed={armed or 'none'}")
    )
    return RuleResult(verdicts=verdicts, violations=violations)
