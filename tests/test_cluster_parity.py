"""Multi-process executor parity: the full rule suite run under Spark's
local-cluster master (real standalone workers, separate
CoarseGrainedExecutorBackend JVMs, serialized netty shuffle between
processes) must produce verdicts IDENTICAL to thread-mode local[N].

This pins the property the scaling evidence (BENCH/BASELINE.md,
scripts/bench_scaling_executors.py) relies on: nothing in the engine —
Arrow pandas_udf batching, salted partial aggregation, HLL sketch merge,
broadcast dims, checkpoint manifest — depends on tasks sharing one JVM.
Cross-process shuffle exercises real serialization of every intermediate
(sketch bytes, struct partials), which intra-JVM local mode can hide.

Runs via subprocess spark-submit (two SparkContexts cannot share a
process with the session fixture), mirroring the north_rule launch shape.
"""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# verdict-relevant fields of the cli's JSON summary; timing keys excluded
_PARITY_KEYS = ("ran_parts", "rows_validated", "violations", "failed_partitions")


def _submit(master: str, data_dir: str, zip_path: str, generate: bool) -> dict:
    args = [
        "spark-submit",
        "--master",
        master,
        "--driver-memory",
        "4g",
        "--py-files",
        zip_path,
        os.path.join(REPO, "lk_data_test_spark", "cli.py"),
        "--data-dir",
        data_dir,
        "--parts",
        "6",
        "--rows-per-part",
        "1500",
        "--force",
    ] + (["--generate"] if generate else [])
    env = dict(os.environ, SPARK_MASTER=master)
    out = subprocess.run(
        args, capture_output=True, text=True, cwd=REPO, env=env, timeout=600
    )
    assert out.returncode == 0, out.stderr[-3000:]
    last = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def test_local_cluster_verdicts_match_thread_mode(tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "lk_data_test_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))

    data_dir = str(tmp_path / "corpus")
    local = _submit("local[4]", data_dir, zip_path, generate=True)
    cluster = _submit("local-cluster[2,2,2048]", data_dir, zip_path, generate=False)

    for k in _PARITY_KEYS:
        assert cluster[k] == local[k], (
            f"{k}: local-cluster {cluster[k]!r} != local {local[k]!r}"
        )
    # roles = part_id % 5: schema-clean parts 0 and 5 pass, all others fail
    assert local["failed_partitions"] == [1, 2, 3, 4]
