"""Interleaved A/B of the validation-suite wall time: r1 snapshot vs HEAD.

The host is oversubscribed (documented in BENCH/BASELINE.md: identical code
swings 2x with outside load), so absolute suite times across sessions are
not comparable. This experiment removes slow host drift from the comparison:
each PAIR runs both sides back-to-back in fresh subprocesses (alternating
which side goes first to cancel any within-pair trend), and the statistic is
the per-pair ratio HEAD/r1 — host load hits both sides of a pair roughly
equally.

Each subprocess: fresh local[32] SparkSession, 1 untimed warm-up suite run,
1 timed run (steady-state convention of bench.py). Usage:

    python scripts/bench_ab.py [n_pairs] [r1_worktree_path]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HEAD = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
repo = sys.argv[1]
n_timed = int(sys.argv[2])
sys.path.insert(0, repo)
os.chdir(repo)
import bench
from lk_data_test_spark.session import get_spark
spark = get_spark("ab-suite", cores="32", driver_memory="24g")
corpus = bench.ensure_bench_corpus(spark)
bench.run_suite(spark, corpus)            # untimed warm-up
runs = [bench.run_suite(spark, corpus)[1] for _ in range(n_timed)]
print(json.dumps({"repo": repo, "runs": runs}))
"""

# Seconds to let the previous subprocess's JVM/python-worker teardown and OS
# reclaim settle before timing the next side — without this the second side
# of every pair systematically absorbs the first side's exit work (observed
# as a ~1.8x position effect in the unsettled first experiment).
SETTLE_SEC = 30


def run_side(repo: str, n_timed: int = 2) -> list[float]:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, repo, str(n_timed)],
        capture_output=True, text=True, timeout=2400,
    )
    line = out.stdout.strip().splitlines()[-1]
    runs = json.loads(line)["runs"]
    import time
    time.sleep(SETTLE_SEC)
    return runs


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    r1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r1ab"
    head = sys.argv[3] if len(sys.argv) > 3 else HEAD
    pairs = []
    for i in range(n_pairs):
        order = [r1, head] if i % 2 == 0 else [head, r1]
        runs = {}
        for repo in order:
            runs[repo] = run_side(repo)
        stat = {repo: {"median": statistics.median(r), "min": min(r)}
                for repo, r in runs.items()}
        pairs.append({
            "r1_runs": runs[r1], "head_runs": runs[head],
            "ratio_median": round(stat[head]["median"] / stat[r1]["median"], 3),
            "ratio_min": round(stat[head]["min"] / stat[r1]["min"], 3),
            "order": "r1-first" if order[0] == r1 else "head-first",
        })
        print(json.dumps(pairs[-1]), flush=True)
    med = [p["ratio_median"] for p in pairs]
    mn = [p["ratio_min"] for p in pairs]
    summary = {
        "n_pairs": n_pairs,
        "paired_ratio_of_medians": {
            "median": round(statistics.median(med), 3),
            "spread": [min(med), max(med)],
        },
        # min-of-runs is the cleanest intrinsic-cost estimator under
        # one-sided load noise (noise only ever ADDS time)
        "paired_ratio_of_mins": {
            "median": round(statistics.median(mn), 3),
            "spread": [min(mn), max(mn)],
        },
        "pairs": pairs,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
