"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are backed by the registry in
``lk_data_test_spark/entry_queries.py`` — one entry per operator family from
SURVEY.md §2 plus the training-data-pipeline operators (dedup ladder,
similarity search, text analysis) and the core validation suite.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lk_data_test_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full validation rule-suite (schema, column stats,
    token bounds, uniqueness, referential, drift) over a deterministic
    5-partition sequences corpus — returns the per-(partition, rule)
    verdict table (30 rows)."""
    return entry_queries.validation_suite_verdicts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entry_queries.Q)


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.ORACLE)
