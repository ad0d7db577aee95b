from __future__ import annotations

import datetime as dt
import os
import time

from lk_data_test_spark.datagen import expected_failing_parts
from lk_data_test_spark.streaming.incremental import (
    running_source_stats,
    validate_stream,
    windowed_violation_counts,
)
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
    assert len(all_verdicts) == TEST_CFG.n_parts * 6  # every part x every rule
    failing = {v["part_id"] for v in all_verdicts if not v["passed"]}
    # drift needs >= min_docs per (part, source) group; micro-batches that
    # split a partition across files can fall under it, so drift verdicts may
    # legitimately differ per-batch — check the three row-scoped rules exactly.
    for rule in ("column_stats", "token_bounds", "uniqueness", "referential"):
        got = {
            v["part_id"]
            for v in all_verdicts
            if v["rule_id"] == rule and not v["passed"]
        }
        assert got == EXPECTED[rule], rule
    assert failing >= ALL_FAILING - EXPECTED["drift"]


def test_windowed_violation_counts_with_watermark(spark, tmp_path):
    """Late-data tier: per-(window, source) violation counts close exactly
    once when the watermark passes the window end; a late-but-in-watermark
    row still lands in its window."""
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def seq_row(i, source, ts):
        return (f"d{i}", [1, 2, 3], 3, source, 0, ts)

    schema = (
        "doc_id string, tokens array<int>, n_tok int, source string,"
        " part_id int, ingested_at timestamp"
    )
    allowed = spark.createDataFrame(
        [("fackel", True), ("retired", False)], "source string, active boolean"
    )
    # batch 1: window [12:00, 12:01) — 2 violating rows, 1 allowed row
    b1 = [
        seq_row(0, "nope", t0),
        seq_row(1, "fackel", t0 + dt.timedelta(seconds=10)),
        seq_row(2, "retired", t0 + dt.timedelta(seconds=50)),
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        os.path.join(input_dir, "b1")
    )
    time.sleep(1.1)  # distinct mtimes -> deterministic micro-batch order
    # batch 2: a late row still inside the 2-minute watermark for window 1,
    # plus far-future rows that push the watermark past window 1's end
    b2 = [
        seq_row(3, "nope", t0 + dt.timedelta(seconds=30)),       # late, kept
        seq_row(4, "nope", t0 + dt.timedelta(minutes=10)),
        seq_row(5, "fackel", t0 + dt.timedelta(minutes=10)),
    ]
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        os.path.join(input_dir, "b2")
    )

    q = windowed_violation_counts(
        spark,
        input_dir + "/*",
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        allowed_sources=allowed,
        window="1 minute",
        watermark="2 minutes",
        max_files_per_trigger=1,
    )
    q.awaitTermination(600)

    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {
        (r["window_start"].isoformat(), r["source"]): r["n_violations"]
        for r in out.collect()
    }
    # window 1 closed by the watermark: nope=2 (incl. the late row), retired=1
    assert rows[("2026-01-01T12:00:00", "nope")] == 2
    assert rows[("2026-01-01T12:00:00", "retired")] == 1
    # the 12:10 window is NOT final yet (append mode) — must not be emitted
    assert not any(k[0].startswith("2026-01-01T12:10") for k in rows)


def test_running_source_stats_state(spark, tmp_path):
    """applyInPandasWithState: per-source cumulative counts carry across
    micro-batches (state), and each batch emits the updated totals."""
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    schema = (
        "doc_id string, tokens array<int>, n_tok int, source string, part_id int"
    )
    allowed = spark.createDataFrame(
        [("fackel", True)], "source string, active boolean"
    )
    b1 = [(f"a{i}", [1], 1, "fackel", 0) for i in range(4)] + [
        ("x0", [1], 1, "nope", 0)
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        os.path.join(input_dir, "b1")
    )
    time.sleep(1.1)
    b2 = [(f"b{i}", [1], 1, "fackel", 0) for i in range(2)] + [
        ("x1", [1], 1, "nope", 0),
        ("x2", [1], 1, "nope", 0),
    ]
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        os.path.join(input_dir, "b2")
    )

    emitted: list[dict] = []

    def on_batch(rows, epoch):
        emitted.extend(rows)

    q = running_source_stats(
        spark,
        input_dir + "/*",
        str(tmp_path / "ckpt"),
        allowed_sources=allowed,
        on_batch=on_batch,
        max_files_per_trigger=1,
        timeout_ms=None,  # availableNow run: no pending timers to drain
    )
    q.awaitTermination(600)

    # final cumulative totals per source (last emitted update wins)
    final = {r["source"]: r for r in emitted}
    assert final["fackel"]["total_rows"] == 6
    assert final["fackel"]["total_violations"] == 0
    assert final["nope"]["total_rows"] == 3
    assert final["nope"]["total_violations"] == 3
    # state carried across >=2 micro-batches for both sources
    assert final["fackel"]["n_batches"] >= 2
    assert final["nope"]["n_batches"] >= 2


def test_stream_stream_click_error_join(spark, tmp_path):
    """Stateful stream-stream join with event-time bounds: an error joins
    every same-user click within the preceding 60s — across micro-batches
    (the click arrives in batch 1, the error in batch 2, so the click must
    be held in join state); clicks outside the lag window or from other
    users never pair."""
    from lk_data_test_spark.streaming.incremental import correlated_click_errors

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    b1 = [
        (1, t0, 1, "click", 0.0, "{}"),                                # pairs
        (2, t0 - dt.timedelta(seconds=90), 1, "click", 0.0, "{}"),     # too old
        (3, t0 + dt.timedelta(seconds=10), 2, "click", 0.0, "{}"),     # user 2
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        os.path.join(input_dir, "b1")
    )
    time.sleep(1.1)  # distinct mtimes -> deterministic micro-batch order
    b2 = [
        (10, t0 + dt.timedelta(seconds=30), 1, "error", 0.0, "{}"),
        (11, t0 + dt.timedelta(seconds=35), 1, "click", 0.0, "{}"),    # after
    ]
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        os.path.join(input_dir, "b2")
    )

    q = correlated_click_errors(
        spark,
        input_dir + "/*",
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        max_lag="60 seconds",
        watermark="2 minutes",
        max_files_per_trigger=1,
    )
    q.awaitTermination(600)

    out = spark.read.parquet(str(tmp_path / "out"))
    got = {(r["click_id"], r["error_id"]) for r in out.collect()}
    assert got == {(1, 10)}


def test_deduped_ingest_drops_redelivered_docs(spark, tmp_path):
    """dropDuplicatesWithinWatermark at ingest: a doc_id re-delivered in a
    later micro-batch (within the watermark) is dropped; first arrivals and
    genuinely-new docs pass through exactly once."""
    from lk_data_test_spark.streaming.incremental import deduped_ingest

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = (
        "doc_id string, tokens array<int>, n_tok int, source string,"
        " part_id int, ingested_at timestamp"
    )
    b1 = [
        ("d0", [1, 2], 2, "fackel", 0, t0),
        ("d1", [3], 1, "fackel", 0, t0 + dt.timedelta(seconds=5)),
        ("d2", [4], 1, "fackel", 0, t0 + dt.timedelta(seconds=9)),
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        os.path.join(input_dir, "b1")
    )
    time.sleep(1.1)  # distinct mtimes -> deterministic micro-batch order
    b2 = [
        ("d1", [3], 1, "fackel", 0, t0 + dt.timedelta(seconds=20)),  # redeliv
        ("d2", [4], 1, "fackel", 0, t0 + dt.timedelta(seconds=25)),  # redeliv
        ("d3", [5], 1, "fackel", 0, t0 + dt.timedelta(seconds=30)),  # new
    ]
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        os.path.join(input_dir, "b2")
    )

    q = deduped_ingest(
        spark,
        input_dir + "/*",
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        watermark="2 hours",
        max_files_per_trigger=1,
    )
    q.awaitTermination(600)

    out = spark.read.parquet(str(tmp_path / "out"))
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == ["d0", "d1", "d2", "d3"]


def test_session_activity_stream(spark, tmp_path):
    """Event-time sessionization (built-in session_window): sessions close
    exactly once when the watermark passes session_end; open sessions are
    never emitted in append mode."""
    from lk_data_test_spark.streaming.incremental import session_activity

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    b1 = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 1, "click", 2.5, "{}"),   # merges
        (3, t0 + dt.timedelta(minutes=90), 1, "view", 4.0, "{}"),    # new sess
        (4, t0 + dt.timedelta(minutes=5), 2, "view", 1.25, "{}"),
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        os.path.join(input_dir, "b1")
    )
    time.sleep(1.1)  # distinct mtimes -> deterministic micro-batch order
    # sentinel far in the future pushes the watermark past every real
    # session's end; its own session stays open and must NOT be emitted
    b2 = [(99, t0 + dt.timedelta(days=2), 99, "view", 0.5, "{}")]
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        os.path.join(input_dir, "b2")
    )

    q = session_activity(
        spark,
        input_dir + "/*",
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
        gap="30 minutes",
        watermark="1 minute",
        max_files_per_trigger=1,
    )
    q.awaitTermination(600)

    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {
        (r["user_id"], r["session_start"].isoformat()): (
            r["n_events"], r["total_value"], r["session_end"].isoformat()
        )
        for r in out.collect()
    }
    assert rows == {
        (1, "2026-01-01T12:00:00"): (2, 3.5, "2026-01-01T12:40:00"),
        (1, "2026-01-01T13:30:00"): (1, 4.0, "2026-01-01T14:00:00"),
        (2, "2026-01-01T12:05:00"): (1, 1.25, "2026-01-01T12:35:00"),
    }


def test_sessionize_agrees_with_builtin_session_window(spark):
    """Two independent sessionization implementations agree on real data:
    the batch lag-gap operator and Spark's built-in session_window produce
    the same per-user session counts (boundary semantics differ only at
    gaps EXACTLY equal to the gap — measure-zero on microsecond data)."""
    from pyspark.sql import functions as F

    from lk_data_test_spark.operators.temporal import sessionize

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    mine = {
        r["user_id"]: r["n_sessions"]
        for r in sessionize(e, gap_sec=1800)
        .groupBy("user_id")
        .agg(F.max("session_idx").alias("n_sessions"))
        .collect()
    }
    builtin = {
        r["user_id"]: r["n_sessions"]
        for r in e.groupBy(F.session_window(F.col("ts"), "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .collect()
    }
    assert mine == builtin
