"""End-to-end suite + resume semantics (SURVEY.md §5: resume tests).

Kill/rerun analog: run once, rerun — validated (passing) partitions are
skipped, failing ones replayed; touching a partition's data invalidates its
lineage and forces re-validation.
"""

from __future__ import annotations

import os

from lk_data_test_spark.datagen import expected_failing_parts
from lk_data_test_spark.plans.runner import ValidationRunner, token_digests
from lk_data_test_spark.sources.catalog import PartitionedTable
from tests.conftest import TEST_CFG

EXPECTED = expected_failing_parts(TEST_CFG)
ALL_FAILING = set().union(*EXPECTED.values())


def _runner(spark, corpus_dir, tmp_path, params=None):
    return ValidationRunner(
        spark,
        PartitionedTable(f"{corpus_dir}/sequences"),
        allowed_sources=spark.read.parquet(f"{corpus_dir}/allowed_sources"),
        reference_profiles=spark.read.parquet(f"{corpus_dir}/reference_profiles"),
        manifest_path=str(tmp_path / "manifest.json"),
        output_dir=str(tmp_path / "out"),
        params=params,
    )


def test_suite_and_resume(spark, corpus_dir, tmp_path):
    r1 = _runner(spark, corpus_dir, tmp_path)
    res1 = r1.run()
    assert sorted(res1.ran_parts) == list(range(TEST_CFG.n_parts))
    assert res1.rows_validated == TEST_CFG.n_parts * TEST_CFG.rows_per_part

    failing = {
        v["part_id"] for v in res1.verdicts if not v["passed"]
    }
    assert failing == ALL_FAILING

    # violations parquet written, canonical order columns present
    out = spark.read.parquet(os.path.join(str(tmp_path / "out"), "violations"))
    assert out.count() > 0
    assert set(out.columns) == {"part_id", "rule_id", "doc_id", "source", "n_tok", "detail"}

    # verdict table + JSON metrics manifest sinks (S5/S6 analogs)
    vt = spark.read.parquet(os.path.join(str(tmp_path / "out"), "verdicts"))
    assert vt.count() == TEST_CFG.n_parts * 6
    import json

    with open(os.path.join(str(tmp_path / "out"), "metrics.json")) as f:
        m = json.load(f)
    assert m["rows_validated"] == res1.rows_validated
    assert set(m["failed_parts"]) == ALL_FAILING
    assert set(m["rules"]) == {
        "schema", "column_stats", "token_bounds", "uniqueness",
        "referential", "drift",
    }

    # rerun: passing partitions skipped, failing replayed
    r2 = _runner(spark, corpus_dir, tmp_path)
    res2 = r2.run()
    assert set(res2.skipped_parts) == set(range(TEST_CFG.n_parts)) - ALL_FAILING
    assert set(res2.ran_parts) == ALL_FAILING
    failing2 = {v["part_id"] for v in res2.verdicts if not v["passed"]}
    assert failing2 == ALL_FAILING

    # round-1 ADVICE regression: the resume run rewrites ONLY the re-run
    # partitions' verdict rows (dynamic partition overwrite) — previously
    # recorded verdicts for skipped partitions must survive
    vt2 = spark.read.parquet(os.path.join(str(tmp_path / "out"), "verdicts"))
    assert vt2.count() == TEST_CFG.n_parts * 6
    assert {r["part_id"] for r in vt2.select("part_id").distinct().collect()} == set(
        range(TEST_CFG.n_parts)
    )
    # metrics.json merges cumulative state across runs
    with open(os.path.join(str(tmp_path / "out"), "metrics.json")) as f:
        m2 = json.load(f)
    assert set(m2["ran_parts"]) == ALL_FAILING                      # per-run
    assert set(m2["validated_parts"]) == set(range(TEST_CFG.n_parts))  # cumulative
    assert set(m2["failed_parts"]) == ALL_FAILING

    # manifest carries lineage + per-rule metrics
    e = r2.manifest.entries[str(sorted(ALL_FAILING)[0])]
    assert e["snapshot_id"] and e["files"]
    assert set(e["rule_versions"]) == {
        "schema", "column_stats", "token_bounds", "uniqueness",
        "referential", "drift",
    }
    assert set(e["metrics"]) == set(e["rule_versions"])


def test_acknowledge_stops_replay_until_data_changes(spark, corpus_dir, tmp_path):
    """Triage workflow: acknowledging a failed partition stops the rerun
    replay; the ack is snapshot-scoped provenance, so a data change still
    re-validates."""
    import pytest

    from lk_data_test_spark.plans.manifest import CheckpointManifest

    r = _runner(spark, corpus_dir, tmp_path)
    r.run()
    mpath = str(tmp_path / "manifest.json")
    m = CheckpointManifest(mpath)
    with pytest.raises(KeyError):
        m.acknowledge(9999)
    for pid in sorted(ALL_FAILING):
        m.acknowledge(pid, note="triaged: generator-injected defect")
    m.save()

    r2 = _runner(spark, corpus_dir, tmp_path)
    res2 = r2.run()
    assert res2.ran_parts == [] and len(res2.skipped_parts) == TEST_CFG.n_parts

    # provenance preserved
    e = CheckpointManifest(mpath).entries[str(sorted(ALL_FAILING)[0])]
    assert e["verdict"] == "pass"
    assert e["acknowledged"]["was_verdict"] == "fail"
    assert e["acknowledged"]["snapshot_id"] == e["snapshot_id"]

    # an acked partition whose data changes is re-validated like any other
    pid = sorted(ALL_FAILING)[0]
    pdir = f"{corpus_dir}/sequences/part_id={pid}"
    fname = next(f for f in os.listdir(pdir) if f.endswith(".parquet"))
    with open(os.path.join(pdir, fname), "ab") as f:
        f.write(b"\0")
    try:
        pending = r2.manifest.pending(r2.table, r2.rules)
        assert pending == [pid]
    finally:
        p = os.path.join(pdir, fname)
        with open(p, "rb+") as f:
            f.seek(-1, os.SEEK_END)
            f.truncate()


def test_data_change_invalidates_lineage(spark, corpus_dir, tmp_path):
    r = _runner(spark, corpus_dir, tmp_path)
    res = r.run()
    assert res.ran_parts  # first run covers everything

    # touch one passing partition's file -> size change -> new snapshot id
    clean_part = sorted(set(range(TEST_CFG.n_parts)) - ALL_FAILING)[0]
    pdir = f"{corpus_dir}/sequences/part_id={clean_part}"
    fname = next(f for f in os.listdir(pdir) if f.endswith(".parquet"))
    with open(os.path.join(pdir, fname), "ab") as f:
        f.write(b"\0")  # harmless trailing byte changes the size
    try:
        pending = r.manifest.pending(r.table, r.rules)
        assert clean_part in pending
    finally:
        # restore by truncating the extra byte
        p = os.path.join(pdir, fname)
        with open(p, "rb+") as f:
            f.seek(-1, os.SEEK_END)
            f.truncate()


def test_token_digest_invariant(spark, corpus_dir):
    df = PartitionedTable(f"{corpus_dir}/sequences").read(spark)
    d1 = token_digests(df).orderBy("doc_id", "token_digest").collect()
    d2 = token_digests(df).orderBy("doc_id", "token_digest").collect()
    assert d1 == d2 and len(d1) == TEST_CFG.n_parts * TEST_CFG.rows_per_part
