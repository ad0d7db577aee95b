"""SparkSession builders.

Local mode is a single JVM with N executor threads; the configs below are the
ones that matter there (AQE on, shuffle partitions ~ cores, Arrow on, UTC).
On a real cluster the same builder is used via ``spark-submit --py-files``;
only master/memory come from the submit command line.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lk-validate-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. Shuffle partitions
    default to 2x cores locally — at cluster scale the runner sets this to
    ~2-3x total executor cores and AQE coalesces the tail.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cores}]")
    ncores = os.cpu_count() or 8 if cores in ("*", None) else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * ncores)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r6 config audit (scripts/ab_conf_r06.py, interleaved A/B): leaving
        # the AQE coalescing defaults alone is deliberate —
        # minPartitionSize=64k bought ~2-5% on the headline queries but cost
        # the concurrent rule suite ~2s in task-count inflation across its
        # many small jobs; preferSortMergeJoin=false measured neutral
        # (every profitable join here already broadcasts). Where a small
        # post-shuffle stage feeds a fan-out, the plan repartitions
        # explicitly instead (dedup.ngram_jaccard_pairs).
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # rules run as concurrent jobs from driver threads; FAIR keeps one
        # long job (drift's Arrow pass) from starving the cheap ones
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
