"""Trained-artifact cache (operators/ann_cache.py): the reference analog
of the pre-registered external index (SURVEY §2 S3) — kmeans centroids and
PQ codebooks are cached by (corpus digest, params) so repeat invocations
over the same parquet corpus pay training once."""

from __future__ import annotations

import os

import numpy as np
import pytest

from lk_data_test_spark.operators import ann_cache, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("LK_ANN_CACHE_DIR", str(tmp_path))
    # per-test in-process isolation
    monkeypatch.setattr(ann_cache, "_MEM", {})
    return tmp_path


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_digest_is_metadata_only_and_stable(spark, cache_dir):
    e = _emb(spark)
    d1 = ann_cache.corpus_digest(e)
    d2 = ann_cache.corpus_digest(_emb(spark))
    assert d1 is not None and d1 == d2
    other = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    assert ann_cache.corpus_digest(other) != d1


def test_in_memory_frames_never_cache(spark, cache_dir):
    df = spark.createDataFrame(
        [(1, [0.1] * 64), (2, [0.2] * 64)], "vec_id int, embedding array<float>"
    )
    assert ann_cache.corpus_digest(df) is None
    calls = []
    out = ann_cache.get_or_train(
        "kmeans", df, {"x": 1}, lambda: (calls.append(1), (np.zeros((1, 2)), [0.0]))[1]
    )
    assert calls == [1] and not os.listdir(cache_dir)
    assert out[0].shape == (1, 2)


def test_kmeans_hit_matches_fresh_training(spark, cache_dir, monkeypatch):
    e = _emb(spark)
    c1, h1 = similarity.kmeans_fit(e, n_clusters=4, n_iter=2)  # trains, writes
    assert any(f.startswith("kmeans-") for f in os.listdir(cache_dir))
    # second call: in-memory hit; third: disk hit in a cleared process view
    c2, h2 = similarity.kmeans_fit(e, n_clusters=4, n_iter=2)
    monkeypatch.setattr(ann_cache, "_MEM", {})
    c3, h3 = similarity.kmeans_fit(e, n_clusters=4, n_iter=2)
    monkeypatch.setenv("LK_ANN_CACHE", "0")
    c4, h4 = similarity.kmeans_fit(e, n_clusters=4, n_iter=2)  # fresh train
    for c, h in ((c2, h2), (c3, h3), (c4, h4)):
        assert np.allclose(c, c1) and h == h1


def test_params_and_units_key_partition_the_cache(spark, cache_dir):
    e = _emb(spark)
    c_a, _ = similarity.kmeans_fit(e, n_clusters=4, n_iter=2)
    c_b, _ = similarity.kmeans_fit(e, n_clusters=8, n_iter=2)
    assert c_a.shape != c_b.shape  # params keyed separately, no collision
    # raw-unit codebooks vs residual-unit codebooks scan the SAME files —
    # units_key must keep them apart
    raw, _ = similarity.pq_train(e, m=4, k=4, n_iter=1)
    res_units = similarity._residual_units(e, c_a)
    res, _ = similarity.pq_train(
        e, m=4, k=4, n_iter=1, units=res_units,
        units_key={"residuals": {"n_lists": 4, "coarse_iter": 2,
                                 "kmeans_seed": 11}},
    )
    assert not np.allclose(raw, res)
    raw2, _ = similarity.pq_train(e, m=4, k=4, n_iter=1)
    assert np.allclose(raw2, raw)  # raw entry not clobbered by residual one


def test_derived_units_without_key_train_uncached(spark, cache_dir):
    e = _emb(spark)
    cents, _ = similarity.kmeans_fit(e, n_clusters=4, n_iter=1)
    before = set(os.listdir(cache_dir))
    units = similarity._residual_units(e, cents)
    similarity.pq_train(e, m=4, k=4, n_iter=1, units=units)  # no units_key
    assert set(os.listdir(cache_dir)) == before
