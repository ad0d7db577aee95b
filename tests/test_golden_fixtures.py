"""Golden-fixture compare (SURVEY.md §5 mechanism 3, north_star): the engine's
per-partition verdicts and canonical-ordered violation rows must match the
checked-in fixtures BYTE-identically; the token-array equality invariant is
checked as per-partition digests of "doc_id:xxhash64(tokens)" lines.

Fixtures are produced by scripts/make_fixtures.py from the same seeded config
as tests/conftest.TEST_CFG — the engine analog of the reference's committed
``AmbiguousFackelReferences.txt`` golden output."""

from __future__ import annotations

import hashlib
import json
import os

from lk_data_test_spark.plans.runner import ValidationRunner
from lk_data_test_spark.sources.catalog import PartitionedTable

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name: str):
    with open(os.path.join(FIXTURE_DIR, name)) as f:
        return f.read()


def test_verdicts_and_violations_match_goldens(spark, corpus_dir, tmp_path):
    runner = ValidationRunner(
        spark,
        PartitionedTable(f"{corpus_dir}/sequences"),
        allowed_sources=spark.read.parquet(f"{corpus_dir}/allowed_sources"),
        reference_profiles=spark.read.parquet(f"{corpus_dir}/reference_profiles"),
        manifest_path=str(tmp_path / "manifest.json"),
    )
    res = runner.run()

    verdicts: dict = {}
    for v in res.verdicts:
        verdicts.setdefault(str(v["part_id"]), {})[v["rule_id"]] = {
            "passed": bool(v["passed"]),
            "metric": round(float(v["metric"]), 6),
            "threshold": float(v["threshold"]),
        }
    assert verdicts == json.loads(_load("expected_verdicts.json"))

    got_lines = [
        json.dumps(r.asDict(), sort_keys=True)
        for r in res.violations.collect()
    ]
    exp_lines = _load("expected_violations.jsonl").splitlines()
    assert got_lines == exp_lines  # byte-identical, canonical order


def test_token_digest_invariant_matches_goldens(spark, corpus_dir):
    table = PartitionedTable(f"{corpus_dir}/sequences")
    rows = (
        table.read(spark)
        .selectExpr("part_id", "concat(doc_id, ':', xxhash64(tokens)) AS line")
        .collect()
    )
    by_part: dict[int, list[str]] = {}
    for r in rows:
        by_part.setdefault(int(r["part_id"]), []).append(r["line"])
    got = {
        str(pid): hashlib.md5("\n".join(sorted(lines)).encode()).hexdigest()
        for pid, lines in by_part.items()
    }
    assert got == json.loads(_load("token_digests.json"))
