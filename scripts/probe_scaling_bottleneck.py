"""Isolate which stage limits 4->16-core scaling of the rule suite.

Runs three jobs at a given --master parallelism over the pre-generated
scaling corpus, each timed after one warm-up:
  jvm_ntok     sum/min/max over n_tok only (no tokens column, pure JVM)
  jvm_tokens   aggregate over the tokens column JVM-side (size+sum via
               higher-order functions — parquet decode of the big column,
               zero Python)
  shared_scan  the suite's actual shared Arrow token pass (partials build)

Usage: spark-submit --master local[N] scripts/probe_scaling_bottleneck.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> int:
    data = os.path.join(REPO, ".data", "scale_corpus_p64_r600000", "sequences")
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(data)

    from lk_data_test_spark.operators.token_bounds import DEFAULTS as TB
    from lk_data_test_spark.plans.shared import SharedTokenStats

    prof = spark.read.parquet(
        os.path.join(REPO, ".data", "scale_corpus_p64_r600000", "reference_profiles")
    )

    def jvm_ntok():
        df.agg(F.sum("n_tok"), F.min("n_tok"), F.max("n_tok")).collect()

    def jvm_tokens():
        df.select(
            F.size("tokens").alias("s"),
            F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x).alias(
                "t"
            ),
        ).agg(F.sum("s"), F.sum("t")).collect()

    def shared_scan():
        s = SharedTokenStats.from_profiles(
            df, prof, vocab_lo=TB["vocab_lo"], vocab_hi=TB["vocab_size"]
        )
        s.partials.count()

    out = {"cores": spark.sparkContext.defaultParallelism}
    for name, fn in [
        ("jvm_ntok", jvm_ntok),
        ("jvm_tokens", jvm_tokens),
        ("shared_scan", shared_scan),
    ]:
        fn()  # warm-up
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 2))
        out[name] = times
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
