"""Dedup soak at 10x the bench corpus (round-4 verdict item 7).

Scales the near-dup ladder's two heaviest stages — MinHash+LSH banding-join
pair generation (with pair-scoped exact-Jaccard verification) and
connected-components duplicate clustering — to 10x the sf0.1 bench corpus
(50k documents, the sf1-equivalent document count) to verify that

  (a) the banding join's per-bucket memory holds when every bucket carries
      10x the colliding docs,
  (b) pointer-jumping convergence depth stays logarithmic when components
      are 10x-replica cliques instead of the sf0.1 pair structure, and
  (c) nothing OOMs / spills pathologically on the way.

The soak corpus is derived deterministically from the driver-provided
testdata (no external data): replica r of sf0.1's 5,000 documents keeps the
text but appends one replica-tagged word, so each original and its 9
replicas form a true near-dup clique (3-gram Jaccard well above the 0.5
verify threshold for typical ~50-word docs) — the hardest realistic shape
for both the banding join (every band bucket 10x hotter) and the clustering
(5k components of size ~10, plus testdata's own near-dup pairs).

Usage:  python scripts/bench_dedup_soak.py [replicas]   (default 10)
Appends nothing anywhere; prints one JSON line — numbers are recorded in
BENCH/BASELINE.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from lk_data_test_spark.operators import dedup
    from lk_data_test_spark.session import get_spark

    spark = get_spark(
        "lk-validate-dedup-soak",
        cores=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        driver_memory="24g",
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()
    rep = spark.range(replicas).select(F.col("id").cast("int").alias("r"))
    docs = (
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
        .repartition(32)
    )
    n_docs = docs.count()

    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(
        docs, k=16, bands=4, n=3, threshold=0.5
    ).localCheckpoint()
    n_pairs = pairs.count()
    lsh_sec = round(time.time() - t0, 1)

    t0 = time.time()
    rounds: list[int] = []
    clusters = dedup.dup_clusters(pairs, rounds_out=rounds)
    n_nodes = clusters.count()
    n_comps = clusters.select("component").distinct().count()
    cluster_sec = round(time.time() - t0, 1)

    print(
        json.dumps(
            {
                "soak": "minhash_lsh + dup_clusters",
                "replicas": replicas,
                "n_docs": n_docs,
                "minhash_lsh_sec": lsh_sec,
                "n_pairs": n_pairs,
                "dup_clusters_sec": cluster_sec,
                "n_clustered_nodes": n_nodes,
                "n_components": n_comps,
                "convergence_rounds": rounds[0] if rounds else None,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
