"""Metric-history anomaly detection (plans/anomaly.py).

The manifest accumulates a bounded per-run metric series per partition;
detection is a robust z-score (median/MAD) of the latest run against that
series. Cases pinned here: a clean shift is flagged, a stable series is not,
a single past outlier does NOT widen the band (robustness), a constant
baseline treats any deviation as infinite-score, and short histories are
reported unscored instead of guessed at.
"""

from __future__ import annotations

import math

from lk_data_test_spark.plans.anomaly import (
    detect,
    detect_from_history,
    history_df,
)
from lk_data_test_spark.plans.manifest import CheckpointManifest
from lk_data_test_spark.plans.rules import default_rules
from lk_data_test_spark.plans.runner import ValidationRunner
from lk_data_test_spark.sources.catalog import PartitionedTable


def _manifest_with_series(tmp_path, series: dict[int, list[dict]]):
    """Build a manifest whose per-partition history is the given metric
    series (one dict per run, {rule_id: metric})."""
    m = CheckpointManifest(str(tmp_path / "manifest.json"))
    rules = default_rules()
    for pid, runs in series.items():
        for i, metrics in enumerate(runs):
            m.record(pid, f"snap-{i}", [f"f{i}.parquet"], rules, metrics, "pass")
    return m


def test_shift_flagged_stable_not(spark, tmp_path):
    stable = [{"column_stats": 0.01, "uniqueness": 0.0} for _ in range(8)]
    shifted = [{"column_stats": 0.01, "uniqueness": 0.0} for _ in range(7)]
    # clean jump in the final run, one rule only; tiny jitter on the stable
    # rule so MAD > 0 there (a perfectly-constant series is its own case)
    for i, r in enumerate(stable):
        r["column_stats"] = 0.01 + 0.001 * (i % 3)
    for i, r in enumerate(shifted):
        r["column_stats"] = 0.01 + 0.001 * (i % 3)
    shifted.append({"column_stats": 0.25, "uniqueness": 0.0})
    m = _manifest_with_series(tmp_path, {0: stable, 1: shifted})

    rep = detect(spark, m, k=4.0, min_history=4)
    rows = {(r["part_id"], r["rule_id"]): r.asDict() for r in rep.collect()}

    assert rows[(1, "column_stats")]["anomalous"] is True
    assert rows[(1, "column_stats")]["score"] > 4.0
    assert rows[(0, "column_stats")]["anomalous"] is False
    # constant-zero uniqueness series, current still zero: not anomalous
    assert rows[(0, "uniqueness")]["anomalous"] is False
    assert rows[(1, "uniqueness")]["anomalous"] is False


def test_cli_anomaly_report(spark, corpus_dir, tmp_path, capsys):
    """--anomaly-report scores the manifest at the corpus's default location
    and prints the anomalous (part, rule) rows as one JSON line."""
    import json as _json
    import os
    import shutil

    from lk_data_test_spark.cli import main

    # private corpus copy: the synthesized manifest history must not leak
    # into the shared fixture
    d = str(tmp_path / "corpus")
    shutil.copytree(corpus_dir, d)
    seq = os.path.join(d, "sequences")
    stable = [{"column_stats": 0.01 + 0.001 * (i % 3)} for i in range(8)]
    shifted = stable[:7] + [{"column_stats": 9.0}]
    m = CheckpointManifest(os.path.join(seq, "_manifest", "manifest.json"))
    rules = default_rules()
    for pid, runs in {0: stable, 1: shifted}.items():
        for i, metrics in enumerate(runs):
            m.record(pid, f"snap-{i}", [f"f{i}.parquet"], rules, metrics, "pass")
    m.save()

    rc = main(["--data-dir", d, "--anomaly-report"])
    assert rc == 0
    got = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    flagged = {(r["part_id"], r["rule_id"]) for r in got["anomalous"]}
    assert flagged == {(1, "column_stats")}
    assert got["scored_groups"] == 2


def test_single_past_outlier_does_not_mask(spark, tmp_path):
    # mean/stddev would absorb the past spike into a huge sigma and miss the
    # recurrence; median/MAD keeps the band tight
    runs = [{"drift": 0.10 + 0.002 * (i % 4)} for i in range(10)]
    runs[3] = {"drift": 5.0}  # one historical outlier
    runs.append({"drift": 5.0})  # current run repeats the spike
    m = _manifest_with_series(tmp_path, {7: runs})
    rep = detect(spark, m, k=4.0, min_history=4)
    row = rep.collect()[0]
    assert row["rule_id"] == "drift" and row["anomalous"] is True


def test_constant_baseline_inf_score(spark, tmp_path):
    runs = [{"referential": 2.0} for _ in range(6)] + [{"referential": 2.5}]
    m = _manifest_with_series(tmp_path, {3: runs})
    row = detect(spark, m, k=4.0).collect()[0]
    assert row["baseline_mad"] == 0.0
    assert math.isinf(row["score"]) and row["anomalous"] is True


def test_short_history_reported_unscored(spark, tmp_path):
    runs = [{"schema": 0.0}, {"schema": 99.0}]
    m = _manifest_with_series(tmp_path, {2: runs})
    row = detect(spark, m, k=4.0, min_history=4).collect()[0]
    assert row["anomalous"] is False and row["score"] is None
    assert row["n_history"] == 1


def test_history_bounded(tmp_path):
    m = _manifest_with_series(
        tmp_path, {0: [{"schema": float(i)} for i in range(40)]}
    )
    hist = m.entries["0"]["history"]
    assert len(hist) == CheckpointManifest.HISTORY_MAX
    # oldest runs dropped, latest kept
    assert hist[-1]["metrics"]["schema"] == 39.0


def test_runner_accumulates_history(spark, corpus_dir, tmp_path):
    r = ValidationRunner(
        spark,
        PartitionedTable(f"{corpus_dir}/sequences"),
        allowed_sources=spark.read.parquet(f"{corpus_dir}/allowed_sources"),
        reference_profiles=spark.read.parquet(
            f"{corpus_dir}/reference_profiles"
        ),
        manifest_path=str(tmp_path / "manifest.json"),
    )
    r.run()
    r.run(force=True)
    hist = r.manifest.entries["0"]["history"]
    assert len(hist) == 2
    assert set(hist[0]["metrics"]) == set(hist[1]["metrics"])
    # deterministic corpus, identical reruns: report exists, nothing scored
    # yet (2 runs < min_history baseline) and nothing flagged
    rep = r.anomaly_report()
    assert rep.filter("anomalous").count() == 0
    n_rules = len(default_rules())
    assert rep.count() == len(r.manifest.entries) * n_rules


def test_history_df_marks_current(spark, tmp_path):
    m = _manifest_with_series(
        tmp_path, {0: [{"schema": 1.0}, {"schema": 2.0}]}
    )
    rows = history_df(spark, m).orderBy("run_idx").collect()
    assert [r["is_current"] for r in rows] == [False, True]
    # detect_from_history accepts the flattened frame directly (the scale
    # path: a parquet-backed metrics table instead of the JSON manifest)
    rep = detect_from_history(history_df(spark, m), min_history=1)
    assert rep.count() == 1
