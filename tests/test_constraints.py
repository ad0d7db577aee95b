from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lk_data_test_spark.datagen import expected_failing_parts, part_role
from lk_data_test_spark.operators import constraints as C
from lk_data_test_spark.operators.suggest import suggest_constraints
from lk_data_test_spark.plans.rules import RuleContext
from tests.conftest import TEST_CFG


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        ("a", "x", 10, "g1"),
        ("b", "x", 3, "g1"),
        ("c", None, 7, "g1"),
        ("d", "y", 100, "g2"),
        ("e", "z", 5, "g2"),
    ]
    return spark.createDataFrame(
        rows, "id string, cat string, val int, grp string"
    )


CONS = [
    C.Constraint("cat", "not_null"),
    C.Constraint("cat", "is_in", "x,y"),
    C.Constraint("val", "min_ge", "5"),
    C.Constraint("val", "max_le", "50"),
]


def test_constraint_verdicts_exact_counts(tiny):
    out = {
        (r["group_key"], r["constraint_id"]): (r["n_violations"], r["passed"])
        for r in C.constraint_verdicts(tiny, CONS, "grp").collect()
    }
    assert out[("g1", "not_null:cat")] == (1, False)  # id=c
    assert out[("g1", "is_in:cat")] == (0, True)  # null is not_null's job
    assert out[("g1", "min_ge:val")] == (1, False)  # id=b val=3
    assert out[("g1", "max_le:val")] == (0, True)
    assert out[("g2", "is_in:cat")] == (1, False)  # id=e cat=z
    assert out[("g2", "max_le:val")] == (1, False)  # id=d val=100
    assert len(out) == 2 * len(CONS)  # every group x constraint reported


def test_constraint_violations_match_verdicts(tiny):
    verd = C.constraint_verdicts(tiny, CONS, "grp")
    viol = C.constraint_violations(tiny, CONS, "grp", "id")
    vc = {
        (r["group_key"], r["constraint_id"]): r["n"]
        for r in viol.groupBy("group_key", "constraint_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in verd.collect():
        assert vc.get((r["group_key"], r["constraint_id"]), 0) == r["n_violations"]
    rows = {
        (r["group_key"], r["constraint_id"], r["row_id"]): r["observed"]
        for r in viol.collect()
    }
    assert rows[("g1", "not_null:cat", "c")] is None
    assert rows[("g2", "is_in:cat", "e")] == "z"
    assert rows[("g1", "min_ge:val", "b")] == "3"


def test_from_suggestions_skips_unique_and_sorts(spark):
    sugg = spark.createDataFrame(
        [
            ("val", "min_ge", "1", 1.0),
            ("id", "unique", "", 1.0),
            ("cat", "not_null", "", 1.0),
            ("cat", "is_in", "x,y", 1.0),
        ],
        "col_name string, constraint_kind string, suggested_value string,"
        " support double",
    )
    cons = C.from_suggestions(sugg)
    assert [c.constraint_id for c in cons] == [
        "is_in:cat",
        "not_null:cat",
        "min_ge:val",
    ]


def test_bad_constraint_kinds_rejected():
    with pytest.raises(ValueError):
        C.Constraint("x", "unique")
    with pytest.raises(ValueError):
        C.Constraint("x", "is_in", None)


def test_suggested_constraints_rediscover_injected_defects(spark, corpus_dir):
    """The bootstrap loop on the engine's own corpus: profile the CLEAN
    partitions, enforce the accepted suggestions suite-wide — the injected
    badcol defects (null / zero n_tok) and badsrc defects (unknown source)
    must be rediscovered without any hand-written rule."""
    df = spark.read.parquet(f"{corpus_dir}/sequences")
    clean = [p for p in range(TEST_CFG.n_parts) if part_role(p) == "clean"]
    sugg = suggest_constraints(
        df.filter(F.col("part_id").isin(clean)),
        columns=["n_tok", "source"],
        exact=True,
    )
    cons = C.from_suggestions(sugg)
    kinds = {c.constraint_id for c in cons}
    assert {"not_null:n_tok", "min_ge:n_tok", "is_in:source"} <= kinds

    rule = C.constraint_rule(cons)
    ctx = RuleContext(spark=spark, part_ids=list(range(TEST_CFG.n_parts)))
    res = rule.evaluate(df, ctx)
    verdicts = {r["part_id"]: r for r in res.verdicts.collect()}
    assert set(verdicts) == set(range(TEST_CFG.n_parts))

    exp = expected_failing_parts(TEST_CFG)
    for p in exp["column_stats"]:  # badcol: null + zero n_tok rows
        assert not verdicts[p]["passed"]
    for p in exp["referential"]:  # badsrc: sources outside the clean domain
        assert not verdicts[p]["passed"]

    # violation rows carry the canonical rule schema + a readable detail
    viol = res.violations
    assert [f.name for f in viol.schema.fields] == [
        "part_id", "rule_id", "doc_id", "source", "n_tok", "detail",
    ]
    details = {
        r["detail"].split("=")[0]
        for r in viol.limit(500).collect()
    }
    assert details <= {
        c.constraint_id for c in cons
    }, details


def test_cli_suggest_from_parts(spark, corpus_dir, tmp_path, capsys):
    """--suggest-from-parts profiles a vetted snapshot and appends the
    generic constraints rule to the suite; the suggested rule flags the
    badcol/badsrc partitions and the JSON summary carries its timings."""
    import json as _json
    import os
    import shutil

    from lk_data_test_spark.cli import main

    d = str(tmp_path / "corpus")
    shutil.copytree(corpus_dir, d)
    # parts 0 and 5 are the clean-role partitions in TEST_CFG (role = pid%5)
    rc = main(["--data-dir", d, "--suggest-from-parts", "0,5", "--force"])
    assert rc == 0
    captured = capsys.readouterr()
    got = _json.loads(captured.out.strip().splitlines()[-1])
    assert "constraints" in got["rule_secs"]
    exp = expected_failing_parts(TEST_CFG)
    assert set(exp["column_stats"]) | set(exp["referential"]) <= set(
        got["failed_partitions"]
    )
    verdicts = spark.read.parquet(os.path.join(d, "validation_out", "verdicts"))
    cverd = {
        r["part_id"]: r["passed"]
        for r in verdicts.filter("rule_id = 'constraints'").collect()
    }
    assert set(cverd) == set(range(TEST_CFG.n_parts))
    for p in exp["column_stats"] | exp["referential"]:
        assert not cverd[p]


def test_runner_violation_cap(spark, corpus_dir):
    """max_violations_per_part caps EMITTED rows deterministically while
    verdict metrics stay exact."""
    from lk_data_test_spark.plans.runner import ValidationRunner
    from lk_data_test_spark.sources.catalog import PartitionedTable
    import tempfile, os

    def run(params):
        with tempfile.TemporaryDirectory() as td:
            return ValidationRunner(
                spark,
                PartitionedTable(os.path.join(corpus_dir, "sequences")),
                allowed_sources=spark.read.parquet(
                    f"{corpus_dir}/allowed_sources"
                ),
                reference_profiles=spark.read.parquet(
                    f"{corpus_dir}/reference_profiles"
                ),
                manifest_path=os.path.join(td, "m.json"),
                params=params,
            ).run(force=True)

    full = run({})
    capped = run({"max_violations_per_part": 3})

    # metrics identical: the cap only limits emitted rows
    fv = {(v["part_id"], v["rule_id"]): v["metric"] for v in full.verdicts}
    cv = {(v["part_id"], v["rule_id"]): v["metric"] for v in capped.verdicts}
    assert fv == cv

    counts = (
        capped.violations.groupBy("part_id", "rule_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert counts and all(r["n"] <= 3 for r in counts)

    # capped output is a sub-multiset of the full output, with per-group
    # counts of exactly min(cap, full count)
    from collections import Counter

    full_rows = Counter(tuple(r) for r in full.violations.collect())
    capped_rows = Counter(tuple(r) for r in capped.violations.collect())
    assert not (capped_rows - full_rows)
    full_per_key = Counter(
        (r["part_id"], r["rule_id"]) for r in full.violations.collect()
    )
    capped_per_key = Counter(
        (r["part_id"], r["rule_id"]) for r in capped.violations.collect()
    )
    for k, n in full_per_key.items():
        assert capped_per_key[k] == min(3, n), (k, n, capped_per_key[k])
