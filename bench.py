"""Benchmark harness (driver contract: prints ONE JSON line).

Times the headline operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the core validation
rule-suite over a deterministic generated sequences corpus (the engine's
actual workload), reporting validated-sequences/sec — the BASELINE.json
primary metric.

Methodology (same as BENCH/BASELINE.md): each measurement is the steady-state
run — one untimed warm-up pays JVM codegen, python-worker spawn, parquet
footer caching and this sandbox's first-touch host-memory faulting, then the
timed run follows. A long-lived cluster is always in steady state; run-1
artifacts measure the sandbox, not the engine. Cold numbers are still
reported in extras for honesty. BENCH_WARMUP=0 disables warm-ups.

Scaling evidence (N vs 4N parallelism) is produced by scripts/bench_scaling.py
and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WARMUP = os.environ.get("BENCH_WARMUP", "1") != "0"

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "brand_part_agg",
    "customers_without_orders",
    "top_line_per_order",
    "last_purchase_before",
    "word_freq_top20",
    "doc_token_counts",
    "ngram_jaccard_dups",
    "minhash_lsh_dups",
    "simhash_near_dups",
    # ANN variants ARE the 100 TB similarity path, so the bench measures them;
    # brute-force embedding_topk stays out of the headline as the recall
    # oracle only (round-1 verdict: don't headline an O(n^2) baseline)
    "embedding_ann_ivf",
    "embedding_ann_lsh",
    "inverse_property_swap",
]

BENCH_PARTS = int(os.environ.get("BENCH_PARTS", "32"))
BENCH_ROWS = int(os.environ.get("BENCH_ROWS", "100000"))


def ensure_bench_corpus(spark) -> str:
    from lk_data_test_spark.datagen import GenConfig, generate

    d = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".data",
        f"bench_corpus_p{BENCH_PARTS}_r{BENCH_ROWS}",
    )
    if not os.path.exists(os.path.join(d, "sequences")):
        cfg = GenConfig(n_parts=BENCH_PARTS, rows_per_part=BENCH_ROWS)
        generate(spark, d, cfg)
    return d


def run_suite(spark, corpus: str):
    """One full rule-suite pass over a fresh manifest; returns (result, sec)."""
    import tempfile

    from lk_data_test_spark.plans.runner import ValidationRunner
    from lk_data_test_spark.sources.catalog import PartitionedTable

    with tempfile.TemporaryDirectory() as td:
        runner = ValidationRunner(
            spark,
            PartitionedTable(os.path.join(corpus, "sequences")),
            allowed_sources=spark.read.parquet(
                os.path.join(corpus, "allowed_sources")
            ),
            reference_profiles=spark.read.parquet(
                os.path.join(corpus, "reference_profiles")
            ),
            manifest_path=os.path.join(td, "manifest.json"),
        )
        t0 = time.time()
        res = runner.run(force=True)
        return res, round(time.time() - t0, 3)


def bench_resume(spark, corpus: str) -> dict:
    """Quantify the north-star resume contract on a manifest-backed copy of
    the bench corpus, in its four states: (1) full validation; (2) rerun —
    validated partitions skipped, FAILED ones replayed (the contract);
    (3) rerun after triage-acknowledging the failures — a true no-op;
    (4) a 2-partition append delta — only the new partitions validated.
    Returns wall times + the skip/ran splits."""
    import shutil
    import tempfile

    from lk_data_test_spark.datagen import GenConfig, sequences_df
    from lk_data_test_spark.plans.manifest import CheckpointManifest
    from lk_data_test_spark.plans.runner import ValidationRunner
    from lk_data_test_spark.sources.catalog import PartitionedTable

    td = tempfile.mkdtemp(prefix="bench_resume_")
    try:
        seq_dir = os.path.join(td, "sequences")
        shutil.copytree(os.path.join(corpus, "sequences"), seq_dir)
        manifest = os.path.join(td, "manifest.json")

        def mk_runner():
            return ValidationRunner(
                spark,
                PartitionedTable(seq_dir),
                allowed_sources=spark.read.parquet(
                    os.path.join(corpus, "allowed_sources")
                ),
                reference_profiles=spark.read.parquet(
                    os.path.join(corpus, "reference_profiles")
                ),
                manifest_path=manifest,
            )

        t0 = time.time()
        r_full = mk_runner().run()
        t_full = round(time.time() - t0, 3)
        failed = sorted(
            {int(v["part_id"]) for v in r_full.verdicts if not v["passed"]}
        )

        t0 = time.time()
        r_rerun = mk_runner().run()
        t_rerun = round(time.time() - t0, 3)
        assert sorted(r_rerun.ran_parts) == failed, (r_rerun.ran_parts, failed)

        # triage: acknowledge the (role-injected) failures so the remaining
        # states isolate pure resume mechanics
        m = CheckpointManifest(manifest)
        for pid in failed:
            m.acknowledge(pid, note="bench: generator-injected defect")
        m.save()
        t0 = time.time()
        r_noop = mk_runner().run()
        t_noop = round(time.time() - t0, 3)
        assert not r_noop.ran_parts, r_noop.ran_parts

        # append delta: 2 brand-new partitions (deterministic — the same
        # per-part RNG seeding the corpus used, at the next two part ids)
        cfg = GenConfig(n_parts=BENCH_PARTS + 2, rows_per_part=BENCH_ROWS)
        (
            sequences_df(spark, cfg, part_ids=[BENCH_PARTS, BENCH_PARTS + 1])
            .write.mode("append")
            .partitionBy("part_id")
            .parquet(seq_dir)
        )
        t0 = time.time()
        r_delta = mk_runner().run()
        t_delta = round(time.time() - t0, 3)
        assert sorted(r_delta.ran_parts) == [BENCH_PARTS, BENCH_PARTS + 1], (
            r_delta.ran_parts
        )
        return {
            "full_sec": t_full,
            "full_parts": len(r_full.ran_parts),
            "rerun_replay_failed_sec": t_rerun,
            "replayed_parts": len(failed),
            "rerun_all_acked_sec": t_noop,
            "append_2parts_sec": t_delta,
            "delta_rows_validated": r_delta.rows_validated,
            "speedup_replay": round(t_full / t_rerun, 1) if t_rerun else None,
            "speedup_noop": round(t_full / t_noop, 1) if t_noop else None,
            "speedup_delta": round(t_full / t_delta, 1) if t_delta else None,
        }
    finally:
        shutil.rmtree(td, ignore_errors=True)


def main() -> int:
    from lk_data_test_spark import entry_queries
    from lk_data_test_spark.session import get_spark

    spark = get_spark("lk-validate-bench", cores=CPUS, driver_memory="24g")

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = entry_queries.Q[name]
        if WARMUP:
            t0 = time.time()
            fn(spark, SF_DIR).count()
            cold[name] = round(time.time() - t0, 3)
        t0 = time.time()
        n = fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"  {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    # core engine workload: full rule suite, fresh manifest (no skipping).
    # MEDIAN of 3 timed runs (same convention as scripts/bench_scaling.py),
    # all raw runs reported: this sandbox's vCPUs are host-oversubscribed and
    # a single run can absorb an unrelated host-load spike — the median
    # neither hides that (min would) nor is hostage to it (a lone run would).
    corpus = ensure_bench_corpus(spark)
    if WARMUP:
        _, cold_sec = run_suite(spark, corpus)
        cold["validation_suite"] = cold_sec
    suite_runs: list[float] = []
    rule_runs: dict[str, list[float]] = {}
    res = None
    n_timed = 3 if WARMUP else 1
    for _ in range(n_timed):
        r, sec = run_suite(spark, corpus)
        res = res or r
        suite_runs.append(sec)
        for rule, rsec in r.extras.get("rule_secs", {}).items():
            rule_runs.setdefault(rule, []).append(rsec)
    # per-rule MEDIANS alongside the suite number: round-over-round perf
    # deltas localize to a rule instead of wall-clock archaeology
    rule_secs_median = {
        rule: sorted(v)[len(v) // 2] for rule, v in sorted(rule_runs.items())
    }
    suite_sec = sorted(suite_runs)[len(suite_runs) // 2]
    timings["validation_suite"] = suite_sec
    seq_per_sec = round(res.rows_validated / suite_sec, 1)
    print(
        f"  validation_suite: {suite_sec}s "
        f"({res.rows_validated} seqs -> {seq_per_sec}/s)",
        file=sys.stderr,
    )

    # resume-contract evidence (north star: "reruns skip validated
    # partitions and replay only failures/deltas") — measured, not asserted
    resume = bench_resume(spark, corpus)
    print(f"  resume: {resume}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    try:
        sf = float(SF_DIR.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = SF_DIR
    print(
        json.dumps(
            {
                "metric": "total steady-state runtime: headline operator "
                "queries + full validation rule-suite (validated seq/s in "
                "extras)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extras": {
                    "validated_sequences": res.rows_validated,
                    "validated_sequences_per_sec": seq_per_sec,
                    "cpus": CPUS,
                    "bench_corpus": f"{BENCH_PARTS}x{BENCH_ROWS}",
                    "methodology": "steady-state: per query 1 untimed "
                    "warm-up then ONE timed run; suite = MEDIAN of 3 timed "
                    "runs after 1 warm-up (all raw runs in suite_runs_sec); "
                    "cold first-run times below",
                    "suite_runs_sec": suite_runs,
                    # min-of-runs: the cleanest intrinsic-cost estimator
                    # under one-sided outside load (noise only ever ADDS
                    # time); the headline stays the median per the
                    # methodology note
                    "suite_sec_min": min(suite_runs),
                    "validated_sequences_per_sec_best": round(
                        res.rows_validated / min(suite_runs), 1
                    ),
                    "resume": resume,
                    "rule_secs_median": rule_secs_median,
                    "cold_first_run_sec": cold,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
