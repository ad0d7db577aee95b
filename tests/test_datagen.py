from __future__ import annotations

from pyspark.sql import functions as F

from lk_data_test_spark.datagen import (
    ACTIVE_SOURCES,
    GenConfig,
    expected_failing_parts,
    part_role,
    sequences_df,
)
from tests.conftest import TEST_CFG


def test_deterministic(spark):
    cfg = GenConfig(n_parts=3, rows_per_part=100)
    a = sequences_df(spark, cfg).orderBy("part_id", "doc_id").collect()
    b = sequences_df(spark, cfg).orderBy("part_id", "doc_id").collect()
    assert a == b


def test_part_ids_subset_matches_full_generation(spark):
    """Delta generation (part_ids=...) is byte-identical to the same
    partitions of a full run — the property the append-delta resume bench
    and any backfill tooling rely on."""
    cfg = GenConfig(n_parts=4, rows_per_part=50)
    full = (
        sequences_df(spark, cfg)
        .filter(F.col("part_id").isin([1, 3]))
        .orderBy("part_id", "doc_id")
        .collect()
    )
    delta = (
        sequences_df(spark, cfg, part_ids=[1, 3])
        .orderBy("part_id", "doc_id")
        .collect()
    )
    assert full == delta


def test_shapes_and_roles(spark, corpus_dir):
    df = spark.read.parquet(f"{corpus_dir}/sequences")
    assert df.count() == TEST_CFG.n_parts * TEST_CFG.rows_per_part
    assert set(df.columns) == {"doc_id", "tokens", "n_tok", "source", "part_id"}

    # clean partitions: n_tok == size(tokens) everywhere, all sources known
    clean = [p for p in range(TEST_CFG.n_parts) if part_role(p) == "clean"]
    cdf = df.filter(F.col("part_id").isin(clean))
    assert cdf.filter(F.col("n_tok") != F.size("tokens")).count() == 0
    srcs = {r["source"] for r in cdf.select("source").distinct().collect()}
    assert srcs <= set(ACTIVE_SOURCES)

    # dup partitions really contain duplicate doc_ids
    exp = expected_failing_parts(TEST_CFG)
    for p in exp["uniqueness"]:
        part = df.filter(F.col("part_id") == p)
        assert part.count() > part.select("doc_id").distinct().count()

    # badsrc partitions contain unknown sources
    bad = df.filter(F.col("part_id").isin(list(exp["referential"])))
    assert bad.filter(~F.col("source").isin(ACTIVE_SOURCES)).count() > 0
