"""Dimension-upsert sink (S8 analog): derived rows replaced wholesale, manual
rows preserved with key precedence, snapshot lineage bumped per upsert.
Contract: ``/root/reference/scripts/enrich_fackel_bibls.py:18-25``
(delete_old_matches — never ``@resp='manual'``) re-expressed as versioned
parquet snapshots (no Iceberg jar in this sandbox)."""

from __future__ import annotations

import pytest

from lk_data_test_spark.sources.dimension import DimensionStore


@pytest.fixture()
def store(spark, tmp_path):
    s = DimensionStore(str(tmp_path / "allowed_sources"), key="source")
    s.init(
        spark.createDataFrame(
            [
                ("src0", "corpus-a", "manual"),
                ("src1", "corpus-a", "derived"),
                ("src2", "corpus-b", "derived"),
                ("src3", "corpus-b", "reviewed"),
            ],
            "source string, corpus string, origin string",
        )
    )
    return s


def test_upsert_replaces_derived_preserves_manual(spark, store):
    head0 = store.head()
    assert head0["snapshot"] == 0 and head0["parent_snapshot"] is None

    # new derivation: src2 re-derived with a changed attribute, src4 brand
    # new, src0 collides with a manual row (must lose), src3 with a reviewed
    # row (must lose); src1 absent -> its old derived row must disappear
    head1 = store.upsert_derived(
        spark,
        spark.createDataFrame(
            [
                ("src2", "corpus-c", "x"),
                ("src4", "corpus-c", "x"),
                ("src0", "corpus-c", "x"),
                ("src3", "corpus-c", "x"),
            ],
            "source string, corpus string, origin string",
        ),
    )
    rows = {
        r["source"]: (r["corpus"], r["origin"])
        for r in store.read(spark).collect()
    }
    assert rows == {
        "src0": ("corpus-a", "manual"),     # manual preserved, derived dupe dropped
        "src2": ("corpus-c", "derived"),    # re-derived: new attribute wins
        "src3": ("corpus-b", "reviewed"),   # non-derived provenance preserved
        "src4": ("corpus-c", "derived"),    # brand-new derived row inserted
    }
    assert "src1" not in rows               # stale derived row deleted

    # lineage: snapshot bumped, parent recorded, ids differ, counts honest
    assert head1["snapshot"] == 1
    assert head1["parent_snapshot"] == 0
    assert head1["parent_snapshot_id"] == head0["snapshot_id"]
    assert head1["snapshot_id"] != head0["snapshot_id"]
    assert head1["counts"] == {"total": 4, "derived": 2, "preserved": 2}


def test_upsert_is_rerunnable_and_versioned(spark, store):
    derived = spark.createDataFrame(
        [("src9", "corpus-z", "x")], "source string, corpus string, origin string"
    )
    h1 = store.upsert_derived(spark, derived)
    h2 = store.upsert_derived(spark, derived)  # idempotent re-run, new snapshot
    assert (h1["snapshot"], h2["snapshot"]) == (1, 2)
    assert h2["parent_snapshot_id"] == h1["snapshot_id"]
    rows = {r["source"] for r in store.read(spark).collect()}
    assert rows == {"src0", "src3", "src9"}  # manual+reviewed kept, one derived


def test_reads_require_head(spark, tmp_path):
    s = DimensionStore(str(tmp_path / "nope"), key="k")
    with pytest.raises(FileNotFoundError):
        s.read(spark)
