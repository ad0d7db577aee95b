from __future__ import annotations

from lk_data_test_spark.datagen import expected_failing_parts
from lk_data_test_spark.streaming.incremental import validate_stream
from tests.conftest import TEST_CFG

EXPECTED = expected_failing_parts(TEST_CFG)
ALL_FAILING = set().union(*EXPECTED.values())


def test_stream_validation_matches_batch(spark, corpus_dir, tmp_path):
    collected: dict[int, list[dict]] = {}

    def on_batch(verdicts, violations, epoch):
        collected.setdefault(epoch, []).extend(verdicts)

    q = validate_stream(
        spark,
        f"{corpus_dir}/sequences",
        str(tmp_path / "ckpt"),
        allowed_sources=spark.read.parquet(f"{corpus_dir}/allowed_sources"),
        reference_profiles=spark.read.parquet(f"{corpus_dir}/reference_profiles"),
        on_batch=on_batch,
        max_files_per_trigger=4,
    )
    q.awaitTermination(600)

    all_verdicts = [v for batch in collected.values() for v in batch]
    assert len(all_verdicts) == TEST_CFG.n_parts * 5  # every part x every rule
    failing = {v["part_id"] for v in all_verdicts if not v["passed"]}
    # drift needs >= min_docs per (part, source) group; micro-batches that
    # split a partition across files can fall under it, so drift verdicts may
    # legitimately differ per-batch — check the three row-scoped rules exactly.
    for rule in ("column_stats", "uniqueness", "referential"):
        got = {
            v["part_id"]
            for v in all_verdicts
            if v["rule_id"] == rule and not v["passed"]
        }
        assert got == EXPECTED[rule], rule
    assert failing >= ALL_FAILING - EXPECTED["drift"]
