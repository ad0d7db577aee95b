"""Temporal operators: as-of join and gap sessionization.

Pipeline extensions beyond the reference (SURVEY §2 W4 "last-preceding
lookup" is the reference's closest analog — ``make_texts.py``'s
last-seen-date fallback — generalized here to the two canonical temporal
shapes a training-data pipeline needs: attach-latest-state (as-of join) and
activity segmentation (sessionization).

Scale design — both operators are ONE shuffle keyed by the entity id:

* ``asof_join`` uses the union-tag pattern instead of a range join: tag the
  right rows 0 and the left rows 1, union, and run a single
  ``last(ignorenulls)`` window over (key, time, side). Spark's native
  alternative — a non-equi join — explodes to a broadcast nested-loop or a
  cartesian per key; the union-window form is a plain sort within each
  key's partition (O(n log n) per partition, no pair blowup) and is how
  production as-of joins are built on Spark. At equal timestamps the right
  row sorts first, so the match is at-or-INCLUDING the left timestamp —
  the same tie rule as DuckDB's ``ASOF JOIN ... ON l.t >= r.t`` oracle.
* ``sessionize`` is two window expressions over one (key, time) sort: a
  lag-gap flag and its running sum. No join, no second shuffle.

Determinism: callers must dedupe the right side to one row per
(key, timestamp) — among exact timestamp ties the window's pick is
plan-dependent. The registry queries dedupe with max/max_by in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For every left row, attach ``right_cols`` from the right row with the
    greatest ``right_ts`` <= ``left_ts`` for the same ``on`` key (null if no
    such row — a LEFT as-of join). ``right_cols`` must not collide with left
    column names; right must be unique per (on, right_ts)."""
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {sorted(overlap)}")
    lt = (
        left.withColumn("_asof_t", F.col(left_ts))
        .withColumn("_side", F.lit(1))
    )
    rt = right.select(
        F.col(on), F.col(right_ts).alias("_asof_t"), *right_cols
    ).withColumn("_side", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("_asof_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *left.columns,
        F.col("_side"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 1800,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts at the first event per
    key and whenever the gap to the previous event exceeds ``gap_sec``.
    Adds ``session_idx`` (1-based per key). Gap arithmetic runs on integer
    microseconds (``unix_micros``) so it is exact and engine-portable."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    # parquet timestamps may be TIMESTAMP_NTZ; gap DIFFERENCES are
    # timezone-invariant, so the cast is safe and unix_micros stays exact
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    flag = F.when(
        F.lag(us).over(w).isNull()
        | ((us - F.lag(us).over(w)) > gap_sec * 1_000_000),
        1,
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("_new_sess", flag)
        .withColumn("session_idx", F.sum("_new_sess").over(wc))
        .drop("_new_sess")
    )
