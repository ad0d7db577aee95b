"""Soak the round-4 dedup tail at soak scale (round-5 verdict item 6).

Two operators shipped in round 4 with recorded numbers only up to sf0.01:

  1. `dedup_keep_list`'s canonical-doc selection — per-component
     max(struct) partial aggregation + join back (no window over
     low-cardinality component keys). Run here on the SAME 50x replica
     corpus the round-4 LSH soak used (replicas x sf0.1's 5,000 docs, each
     original + its replicas a true near-dup clique): pairs from the
     banded MinHash join, connected components, then the keep-list stage,
     with invariants asserted (exactly one keeper per component, the
     keeper is the max-(n_chars, -doc_id) member).

  2. `global_uniqueness_verdicts`' HLL sketch-union cross-partition
     screen — per-partition Datasketches sketches from ONE aggregation
     pass, union-merge on the driver (n_parts sketches, corpus-size
     independent), exact 8-byte-hash group pass only for flagged scopes.
     Run here at `scale` x its registry corpus (default 50x: 10 parts x
     20,000 rows) and the verdicts are ASSERTED equal to the analytic
     injection arithmetic (`expected_global_dup_ids`) — correctness at
     soak scale, not just wall time.

Usage: python scripts/bench_dedup_tail_soak.py [replicas] [scale]
Prints one JSON line; numbers are recorded in BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def soak_corpus(spark, replicas: int):
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()
    rep = spark.range(replicas).select(F.col("id").cast("int").alias("r"))
    return (
        base.crossJoin(F.broadcast(rep))
        .select(
            (F.col("doc_id") + F.col("r") * F.lit(n_base)).alias("doc_id"),
            F.when(F.col("r") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ", F.col("text"), F.concat(F.lit("replica"), F.col("r"))
                )
            )
            .alias("text"),
        )
        .withColumn("n_chars", F.length("text"))
        .repartition(32)
    )


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    from lk_data_test_spark.datagen import (
        GenConfig,
        expected_global_dup_ids,
        sequences_df,
    )
    from lk_data_test_spark.operators import dedup, uniqueness
    from lk_data_test_spark.plans.rules import RuleContext
    from lk_data_test_spark.session import get_spark

    spark = get_spark(
        "lk-validate-dedup-tail-soak",
        cores=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        driver_memory="24g",
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"soak": "dedup_keep_list + global_uniqueness", "replicas": replicas}

    # --- 1. keep-list at the 50x replica corpus ---------------------------
    docs = soak_corpus(spark, replicas)
    out["n_docs"] = docs.count()
    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(
        docs, k=16, bands=4, n=3, threshold=0.5
    ).localCheckpoint()
    out["n_pairs"] = pairs.count()
    out["minhash_lsh_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    rounds: list[int] = []
    members = dedup.dup_clusters(pairs, rounds_out=rounds).join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    best = members.groupBy("component").agg(
        F.max(
            F.struct(
                F.col("n_chars").alias("len"),
                (-F.col("doc_id")).alias("neg_id"),
                F.col("doc_id").alias("winner"),
            )
        ).alias("b")
    )
    keep = members.join(best, "component").select(
        "doc_id",
        "component",
        "n_chars",
        (F.col("doc_id") == F.col("b.winner")).alias("keep"),
    )
    agg = keep.groupBy("component").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep"),
        F.count(F.lit(1)).alias("n_members"),
        F.max(F.when(F.col("keep"), F.col("n_chars"))).alias("keeper_len"),
        F.max("n_chars").alias("max_len"),
    )
    bad = agg.filter(
        (F.col("n_keep") != 1) | (F.col("keeper_len") != F.col("max_len"))
    ).count()
    out["keep_list_sec"] = round(time.time() - t0, 1)
    out["n_components"] = agg.count()
    out["n_members"] = keep.count()
    out["convergence_rounds"] = rounds[0] if rounds else None
    out["keep_invariant_violations"] = bad
    assert bad == 0, f"{bad} components violate the one-keeper/max-len invariant"

    # --- 2. global uniqueness screen at scale x the registry corpus -------
    cfg = GenConfig(
        n_parts=10, rows_per_part=400 * scale, cross_dup_frac=0.05
    )
    seq = sequences_df(spark, cfg).cache()
    out["uniq_rows"] = seq.count()
    ctx = RuleContext(
        spark=spark,
        part_ids=list(range(cfg.n_parts)),
        params={"uniqueness": {"scope": "global"}},
    )
    t0 = time.time()
    got = {
        int(r["part_id"]): (bool(r["passed"]), float(r["metric"]))
        for r in uniqueness.evaluate(seq, ctx).verdicts.collect()
    }
    out["global_uniqueness_sec"] = round(time.time() - t0, 1)
    exp = expected_global_dup_ids(cfg)
    mism = {
        p: {"expected": float(exp[p]), "got": got[p]}
        for p in exp
        if got[p] != (exp[p] == 0, float(exp[p]))
    }
    out["uniq_verdict_mismatches"] = len(mism)
    assert not mism, f"soak-scale global uniqueness diverged: {mism}"
    out["cpus"] = os.environ.get("SPARK_GRAFT_CPUS", "32")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
