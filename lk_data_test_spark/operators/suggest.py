"""Constraint suggestion: profile a table once, emit candidate rules.

The public Deequ idea (constraint suggestion / profiling-first validation):
before a suite exists, ONE aggregation pass over the table yields per-column
completeness, distinctness and numeric ranges, from which candidate
constraints fall out mechanically — the bootstrap step for a validation
engine pointed at an unfamiliar 10^12-row corpus. Reference analog: the
reference derives its allowed-value domains from the data it curates
(``/root/reference/curation/work_type_mapping.py:1-22`` is a hand-built
is_in domain; this module builds such domains from a profile).

Emitted constraint kinds (schema: col_name, constraint_kind,
suggested_value, support):

    not_null   null rate is exactly 0                       support 1.0
    unique     distinct/non-null >= uniqueness_min          support = ratio
    is_in      string column with <= low_card_max values;   support 1.0
               suggested_value = sorted comma-joined domain
    min_ge /   numeric column observed range                support 1.0
    max_le

Scale shape: pass 1 is a single global aggregate (partial+final, one row to
the driver — never fact rows). Pass 2 collects value domains ONLY for
columns pass 1 measured as low-cardinality, so collect_set is bounded by
low_card_max regardless of table size. With exact=False the distinct counts
use approx_count_distinct (HLL, ~2% rsd) — the 10^12-row path; exact=True
uses count(DISTINCT) for oracle parity at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SUGGESTION_SCHEMA = (
    "col_name string, constraint_kind string, suggested_value string,"
    " support double"
)

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


#: relative standard deviation for the HLL sketch on the approx path. The
#: suggestion thresholds widen by 3*rsd (see suggest_constraints) so a
#: 3-sigma sketch error cannot hide a truly-unique column.
APPROX_RSD = 0.01


def profile_columns(
    df: DataFrame, columns: list[str] | None = None, exact: bool = False
) -> dict[str, dict]:
    """One-pass per-column profile: {col: {n, non_null, distinct, min, max}}.

    The aggregate emits a single row (n_cols x ~4 scalars) — safe to collect
    at any corpus size.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else [f.name for f in df.schema.fields]
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c, APPROX_RSD))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        aggs.append(distinct(c).alias(f"{c}__d"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).alias(f"{c}__max"))
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict[str, dict] = {}
    for c in cols:
        out[c] = {
            "n": int(row["__n"]),
            "non_null": int(row[f"{c}__nn"]),
            "distinct": int(row[f"{c}__d"]),
            "numeric": isinstance(fields[c], _NUMERIC),
            "string": isinstance(fields[c], T.StringType),
            "min": row.get(f"{c}__min"),
            "max": row.get(f"{c}__max"),
        }
    return out


def suggest_constraints(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
    low_card_max: int = 32,
    uniqueness_min: float = 0.99,
) -> DataFrame:
    """Profile ``df`` and return suggested constraints (SUGGESTION_SCHEMA).

    Deterministic given the data: suggestions derive from exact predicates
    over the profile, and is_in domains are sorted before joining.
    """
    spark = df.sparkSession
    prof = profile_columns(df, columns, exact=exact)

    # pass 2: value domains, only for measured-low-cardinality string columns.
    # On the approx path the candidate filter gets 3-sigma slack (an HLL
    # overcount must not hide a genuinely-small domain); the collected
    # domain's ACTUAL size then gates emission, so the slack can only cost a
    # slightly larger bounded collect_set, never an oversized suggestion.
    card_cap = low_card_max * (1.0 if exact else 1.0 + 3.0 * APPROX_RSD)
    domain_cols = [
        c
        for c, p in prof.items()
        if p["string"] and 0 < p["distinct"] <= card_cap
    ]
    domains: dict[str, str] = {}
    if domain_cols:
        drow = (
            df.agg(
                *[
                    F.array_sort(F.collect_set(F.col(c))).alias(c)
                    for c in domain_cols
                ]
            )
            .collect()[0]
            .asDict()
        )
        domains = {
            c: ",".join(drow[c])
            for c in domain_cols
            if 0 < len(drow[c]) <= low_card_max
        }

    # On the approx path the distinct count is an HLL estimate with rsd
    # APPROX_RSD; widen the uniqueness acceptance band by 3*rsd so a 3-sigma
    # sketch undercount cannot hide a truly-unique column. Suggestion, not
    # verification: the uniqueness RULE (plans/rules.py) carries the exact
    # xxhash64 groupBy fallback that confirms any flagged candidate.
    uniq_min_eff = uniqueness_min - (0.0 if exact else 3.0 * APPROX_RSD)
    rows: list[tuple[str, str, str, float]] = []
    for c, p in prof.items():
        if p["non_null"] == p["n"] and p["n"] > 0:
            rows.append((c, "not_null", "", 1.0))
        if p["non_null"] > 0:
            ratio = min(p["distinct"] / p["non_null"], 1.0)
            if ratio >= uniq_min_eff:
                rows.append((c, "unique", "", ratio))
        if c in domains:
            rows.append((c, "is_in", domains[c], 1.0))
        if p["numeric"] and p["min"] is not None:
            rows.append((c, "min_ge", str(p["min"]), 1.0))
            rows.append((c, "max_le", str(p["max"]), 1.0))
    return spark.createDataFrame(rows, SUGGESTION_SCHEMA).orderBy(
        "col_name", "constraint_kind"
    )
