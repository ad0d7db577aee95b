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
sys.path.insert(0, repo)
os.chdir(repo)
import bench
from lk_data_test_spark.session import get_spark
spark = get_spark("ab-suite", cores="32", driver_memory="24g")
corpus = bench.ensure_bench_corpus(spark)
bench.run_suite(spark, corpus)            # untimed warm-up
_, sec = bench.run_suite(spark, corpus)   # timed steady-state run
print(json.dumps({"repo": repo, "sec": sec}))
"""


def run_side(repo: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, repo],
        capture_output=True, text=True, timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return float(json.loads(line)["sec"])


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    r1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r1ab"
    pairs = []
    for i in range(n_pairs):
        order = [r1, HEAD] if i % 2 == 0 else [HEAD, r1]
        times = {}
        for repo in order:
            times[repo] = run_side(repo)
        ratio = times[HEAD] / times[r1]
        pairs.append({"r1_sec": times[r1], "head_sec": times[HEAD],
                      "ratio_head_over_r1": round(ratio, 3),
                      "order": "r1-first" if order[0] == r1 else "head-first"})
        print(json.dumps(pairs[-1]), flush=True)
    ratios = [p["ratio_head_over_r1"] for p in pairs]
    summary = {
        "n_pairs": n_pairs,
        "ratio_median": round(statistics.median(ratios), 3),
        "ratio_mean": round(statistics.mean(ratios), 3),
        "ratio_min": min(ratios),
        "ratio_max": max(ratios),
        "pairs": pairs,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
