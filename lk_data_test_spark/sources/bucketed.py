"""Bucketed co-located joins — the shuffle-free path for REPEATED equi-joins
on a stable key.

At 100 TB an equi-join between two fact tables on ``doc_id`` re-shuffles both
sides every run. Writing both sides *bucketed* on the key (hash-partitioned
files + bucket metadata in the catalog) pays that shuffle once at write time:
every later equi-join on the bucket key compiles to a zero-Exchange
SortMergeJoin — Spark pairs up matching bucket files directly, so the join is
map-side and scales linearly with executors. The engine's recurring joins
(fingerprint x membership, signature x signature across validation rounds)
are exactly this access pattern.

Reference analog: the reference keeps its per-document match lists in files
keyed by document id and re-joins them across runs
(``/root/reference/scripts/make_texts.py:373-374``); bucketing is the
Spark-native way to make that recurring key-join cheap.

The bucket count is a layout decision: pick ``n_buckets`` so one bucket of
the LARGER table fits an executor core's working memory at target scale
(e.g. 100 TB / 32768 buckets ~ 3 GB per bucket), and use the SAME count on
both sides — mismatched counts reintroduce an Exchange on one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and in-bucket sorted) by ``key``.

    Sorting inside buckets lets the later SortMergeJoin skip its sort too —
    the join becomes a pure streaming merge of pre-sorted bucket files.
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two co-bucketed catalog tables on their bucket key.

    With equal bucket counts on both sides the physical plan has NO Exchange:
    assert that in tests rather than trusting the layout silently
    (``tests/test_ops_misc.py::test_bucketed_join_is_shuffle_free``).
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)
