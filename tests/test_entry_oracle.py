"""Mimic the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() on DuckDB over the same parquet, compare row count,
column names, and values (column-name-sorted, row-sorted, exact)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"
            else:
                assert x == y or str(x) == str(y), f"{name}.{col}[{i}]: {x!r} != {y!r}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_types_hashable(ddb, name):
    """The driver hashes typed values; DuckDB's sum(INT) silently widens to
    HUGEINT (int128), which hashes differently from Spark's BIGINT even when
    every value matches (round-1 `doc_column_stats` red cell). Guard the whole
    registry against that class of oracle-side typing drift."""
    types = [str(t).upper() for t in ddb.sql(ORACLES[name]).types]
    assert not any("HUGEINT" in t for t in types), (
        f"{name}: oracle emits {types}; CAST the offending aggregate to BIGINT"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = ddb.sql(ORACLES[name]).df()
    _compare(sdf, ddf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 30  # 5 parts x 6 rules
    assert {r["rule_id"] for r in rows} == {
        "schema", "column_stats", "token_bounds", "uniqueness",
        "referential", "drift",
    }
