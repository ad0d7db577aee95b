"""Metric-history anomaly detection over the checkpoint manifest.

Threshold rules only see the CURRENT run. A partition whose null-rate sits
"within threshold" but at 4x its own historical level is an upstream pipeline
bug no static threshold catches — the public Deequ/TFDV idea of anomaly
checks on a metric time-series. The manifest (plans/manifest.py) appends a
bounded per-run metric history per partition; this module scores the latest
run against that history with a robust z-score:

    score = 0.6745 * |x - median(history)| / MAD(history)

median/MAD instead of mean/stddev so a single past outlier cannot widen the
acceptance band (breakdown point 50% vs 0%). A constant history (MAD == 0)
means ANY deviation is suspect: score is +inf unless x equals the median.

Reference analog: the reference pins expected COUNTS of known inconsistencies
and alerts when a run deviates (``/root/reference/scripts/
check_fackel_references.py:33-37`` — persisted sorted counters compared
across runs); here the compared series is per-partition rule metrics.

Scale: the scoring is a Spark plan over (n_parts x n_rules x HISTORY_MAX)
rows — at 10^6 Iceberg partitions and 6 rules that is ~2*10^8 rows, far too
big for driver-side pandas but trivial for a grouped aggregation. The JSON
manifest itself is the small-scale carrier; at extreme partition counts the
history would live in a parquet/Iceberg metrics table and feed the SAME
``detect_from_history`` entry point (it takes a DataFrame, not the manifest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .manifest import CheckpointManifest

HISTORY_SCHEMA = (
    "part_id int, rule_id string, run_idx int, metric double, is_current boolean"
)

REPORT_COLUMNS = [
    "part_id",
    "rule_id",
    "metric",
    "baseline_median",
    "baseline_mad",
    "score",
    "n_history",
    "anomalous",
]


def history_df(spark: SparkSession, manifest: CheckpointManifest) -> DataFrame:
    """Flatten the manifest's per-partition metric history to rows.

    One row per (partition, rule, run); ``is_current`` marks each
    partition's latest run — the run being scored. Runs are indexed per
    partition (0 = oldest retained), so partitions validated different
    numbers of times coexist.
    """
    rows = []
    for key, entry in manifest.entries.items():
        hist = entry.get("history") or []
        last = len(hist) - 1
        for i, run in enumerate(hist):
            for rule_id, metric in (run.get("metrics") or {}).items():
                rows.append(
                    (
                        int(key),
                        str(rule_id),
                        i,
                        float(metric),
                        i == last,
                    )
                )
    return spark.createDataFrame(rows, HISTORY_SCHEMA)


def detect_from_history(
    hist: DataFrame, k: float = 4.0, min_history: int = 4
) -> DataFrame:
    """Score each partition's current run against its own past runs.

    hist: rows of HISTORY_SCHEMA (``history_df`` or a metrics table scan).
    k: robust-z threshold; 4.0 ~ "beyond 4 sigma under normality".
    min_history: baseline runs required before scoring — with fewer past
        runs the group is reported with ``anomalous = false`` and a null
        score (no evidence either way), never silently dropped.

    Two grouped medians (baseline median, then median absolute deviation)
    plus one join back to the current rows; every aggregation is keyed on
    (part_id, rule_id) so the plan is two hash-partitioned passes over the
    history — no windows, no driver loops.
    """
    baseline = hist.filter(~F.col("is_current"))
    med = baseline.groupBy("part_id", "rule_id").agg(
        F.median("metric").alias("baseline_median"),
        F.count(F.lit(1)).alias("n_history"),
    )
    mad = (
        baseline.join(med, ["part_id", "rule_id"])
        .groupBy("part_id", "rule_id")
        .agg(
            F.median(F.abs(F.col("metric") - F.col("baseline_median"))).alias(
                "baseline_mad"
            )
        )
    )
    current = hist.filter(F.col("is_current")).select(
        "part_id", "rule_id", "metric"
    )
    dev = F.abs(F.col("metric") - F.col("baseline_median"))
    score = F.when(
        F.col("baseline_mad") > 0, 0.6745 * dev / F.col("baseline_mad")
    ).otherwise(
        # constant baseline: exact match scores 0, any deviation +inf
        F.when(dev == 0, F.lit(0.0)).otherwise(F.lit(float("inf")))
    )
    scorable = F.col("n_history") >= F.lit(int(min_history))
    return (
        current.join(med, ["part_id", "rule_id"], "left")
        .join(mad, ["part_id", "rule_id"], "left")
        .withColumn("n_history", F.coalesce(F.col("n_history"), F.lit(0)))
        .withColumn("score", F.when(scorable, score))
        .withColumn(
            "anomalous",
            F.coalesce(F.col("score") > F.lit(float(k)), F.lit(False)),
        )
        .select(*REPORT_COLUMNS)
        .orderBy("part_id", "rule_id")
    )


def detect(
    spark: SparkSession,
    manifest: CheckpointManifest,
    k: float = 4.0,
    min_history: int = 4,
) -> DataFrame:
    """Manifest-backed convenience wrapper around ``detect_from_history``."""
    return detect_from_history(
        history_df(spark, manifest), k=k, min_history=min_history
    )
