"""Round-6 profiling harness (guide §1: measure first).

Times each headline query in isolation with a noop sink (so we measure the
computation, not the sink), records min/median over N runs, and dumps
``explain("formatted")`` for every query into plans/r06/.

Usage:
    python scripts/profile_r06.py [--plans-only] [--runs N] [--tag before]
    python scripts/profile_r06.py --suite        # decompose the rule suite
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

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
    "embedding_ann_ivf",
    "embedding_ann_lsh",
    "inverse_property_swap",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--suite", action="store_true")
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    args = ap.parse_args()

    from lk_data_test_spark import entry_queries
    from lk_data_test_spark.session import get_spark

    spark = get_spark("r06-profile", cores=CPUS, driver_memory="24g")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r06",
    )
    os.makedirs(plans_dir, exist_ok=True)

    if args.suite:
        return profile_suite(spark, args)

    names = args.queries.split(",") if args.queries else HEADLINE
    out: dict[str, dict] = {}
    for name in names:
        fn = entry_queries.Q[name]
        df = fn(spark, SF_DIR)
        with open(
            os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w"
        ) as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
        if args.plans_only:
            continue
        spark.sparkContext.setJobDescription(f"warmup {name}")
        fn(spark, SF_DIR).count()  # bench methodology: count(), 1 warmup
        samples = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"timed {name} #{i}")
            t0 = time.time()
            fn(spark, SF_DIR).count()
            samples.append(round(time.time() - t0, 3))
        out[name] = {
            "min": min(samples),
            "median": statistics.median(samples),
            "samples": samples,
        }
        print(f"{name}: min={min(samples)} med={statistics.median(samples)} {samples}",
              file=sys.stderr)
    print(json.dumps({"tag": args.tag, "load": os.getloadavg(), "q": out}))
    return 0


def profile_suite(spark, args) -> int:
    """Decompose one rule-suite pass: shared token pass alone, each rule's
    standalone latency, then the full concurrent suite."""
    from pyspark.sql import functions as F

    from lk_data_test_spark.operators.token_bounds import DEFAULTS as TBD
    from lk_data_test_spark.plans.shared import SharedTokenStats
    from lk_data_test_spark.sources.catalog import PartitionedTable

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    corpus = os.path.join(repo, ".data", "bench_corpus_p32_r100000")
    table = PartitionedTable(os.path.join(corpus, "sequences"))
    profiles = spark.read.parquet(os.path.join(corpus, "reference_profiles"))
    df = table.read_partitions(spark, table.partition_ids())

    res = {}

    def timeit(label, fn, runs=3):
        spark.sparkContext.setJobDescription(f"suite-profile {label} warmup")
        fn()
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"suite-profile {label} #{i}")
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
        res[label] = samples
        print(f"{label}: {samples}", file=sys.stderr)

    # raw scan costs
    timeit("scan_narrow_sum_ntok", lambda: df.agg(F.sum("n_tok")).collect())
    timeit(
        "scan_tokens_jvm_sum_size",
        lambda: df.agg(F.sum(F.size("tokens"))).collect(),
    )

    # arrow passthrough: tokens -> mapInArrow that just counts
    def passthrough():
        import pyarrow as pa

        def gen(batches):
            for b in batches:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([b.num_rows], type=pa.int64())], names=["n"]
                )

        (
            df.select("part_id", "source", "n_tok",
                      F.coalesce(F.size("tokens"), F.lit(-1)).alias("tok_sz"),
                      "tokens")
            .mapInArrow(gen, "n long")
            .agg(F.sum("n"))
            .collect()
        )

    timeit("arrow_passthrough_tokens", passthrough)

    def shared_pass():
        st = SharedTokenStats.from_profiles(
            df, profiles, vocab_lo=TBD["vocab_lo"], vocab_hi=TBD["vocab_size"]
        )
        st.partials.write.format("noop").mode("overwrite").save()

    timeit("shared_partials_noop", shared_pass)

    # full suite (same as bench run_suite)
    import tempfile

    from lk_data_test_spark.plans.runner import ValidationRunner

    def full():
        with tempfile.TemporaryDirectory() as td:
            runner = ValidationRunner(
                spark,
                table,
                allowed_sources=spark.read.parquet(
                    os.path.join(corpus, "allowed_sources")
                ),
                reference_profiles=profiles,
                manifest_path=os.path.join(td, "manifest.json"),
            )
            r = runner.run(force=True)
            res.setdefault("rule_secs", []).append(r.extras["rule_secs"])

    timeit("full_suite", full)
    print(json.dumps({"suite_profile": res, "load": os.getloadavg()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
