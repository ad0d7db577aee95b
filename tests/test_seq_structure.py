"""Opt-in seq_structure rule: BOS/EOS/PAD placement checks."""

from __future__ import annotations

import pytest

from lk_data_test_spark.operators import seq_structure
from lk_data_test_spark.plans.rules import (
    RuleContext,
    default_rules,
    optional_rules,
)

BOS, EOS, PAD = 1, 2, 0


def _corpus(spark):
    rows = [
        # part 0: all structurally clean
        ("d0", [BOS, 7, 8, EOS], 4, "web", 0),
        ("d1", [BOS, 9, EOS, PAD, PAD], 3, "web", 0),  # trailing pad legal
        # part 1: one of each defect
        ("d2", [5, 7, 8, EOS], 4, "web", 1),            # missing_bos
        ("d3", [BOS, 7, 8, 9], 4, "web", 1),            # missing_eos
        ("d4", [BOS, 7, PAD, EOS], 4, "web", 1),        # interior_pad
        ("d5", [5, PAD, 8, 9], 4, "web", 1),            # all three at once
        # part 2: rows the rule must SKIP (column_stats territory)
        ("d6", None, 4, "web", 2),
        ("d7", [BOS, EOS], None, "web", 2),
        ("d8", [BOS, EOS], 0, "web", 2),
        ("d9", [BOS, 7], 5, "web", 2),                  # n_tok > len(tokens)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, part_id int"
    )


def test_seq_structure_verdicts_and_tags(spark):
    df = _corpus(spark)
    ctx = RuleContext(
        spark=spark,
        part_ids=[0, 1, 2],
        params={"seq_bos_id": BOS, "seq_eos_id": EOS, "seq_pad_id": PAD},
    )
    res = seq_structure.evaluate(df, ctx)

    v = {r["part_id"]: r for r in res.verdicts.collect()}
    assert v[0]["passed"] and v[0]["metric"] == 0.0
    assert not v[1]["passed"] and v[1]["metric"] == 6.0  # 3 singles + triple
    assert v[2]["passed"], "uncheckable rows must not fail the partition"
    assert v[0]["detail"] == "armed=bos,eos,pad"

    tags = sorted(
        (r["doc_id"], r["detail"]) for r in res.violations.collect()
    )
    assert tags == [
        ("d2", "missing_bos"),
        ("d3", "missing_eos"),
        ("d4", "interior_pad"),
        ("d5", "interior_pad"),
        ("d5", "missing_bos"),
        ("d5", "missing_eos"),
    ]


def test_seq_structure_checks_arm_individually(spark):
    df = _corpus(spark)
    # only the pad check armed: BOS/EOS defects become invisible
    ctx = RuleContext(spark=spark, part_ids=[0, 1, 2], params={"seq_pad_id": PAD})
    res = seq_structure.evaluate(df, ctx)
    details = sorted(r["detail"] for r in res.violations.collect())
    assert details == ["interior_pad", "interior_pad"]
    assert all(r["detail"] == "armed=pad" for r in res.verdicts.collect())

    # nothing armed: rule passes everywhere, zero violations
    ctx0 = RuleContext(spark=spark, part_ids=[0, 1, 2], params={})
    res0 = seq_structure.evaluate(df, ctx0)
    assert res0.violations.count() == 0
    assert all(r["passed"] for r in res0.verdicts.collect())


def test_optional_rules_registry():
    rules = optional_rules(["seq_structure"])
    assert [r.rule_id for r in rules] == ["seq_structure"]
    assert rules[0].version == "1.0"
    # stays out of the default suite (fixtures/flagship oracle independence)
    assert "seq_structure" not in [r.rule_id for r in default_rules()]
    with pytest.raises(ValueError, match="unknown extra rules"):
        optional_rules(["nope"])
