"""String normalization column expressions + vectorized UDFs.

Reference analogs: ``normalize_string`` (whitespace collapse,
``/root/reference/curation/check_fackel_references.py:49``), ``slugify``
(``scripts/make_texts.py:253``), prefix-strip ``"#pmb123" -> "pmb123"``
(``curation/check_authors_exist_in_listperson.py:6-9``), URL canonicalization
(``scripts/enrich_person_indices.py:2,38``).

Everything that regex can express stays a JVM Column expression (codegen'd);
only slugify (unicode-aware) is a pandas UDF.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_string(c: Column) -> Column:
    """Collapse whitespace runs + trim (JVM-side)."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def strip_prefix(c: Column, prefix: str = "#") -> Column:
    return F.regexp_replace(c, f"^{re.escape(prefix)}", "")


def last_path_segment(c: Column) -> Column:
    """``split("/")[-1]`` (make_texts.py:285-294)."""
    return F.element_at(F.split(c, "/"), -1)


def zero_pad(c: Column, width: int) -> Column:
    """``f"{n:0>3}"`` (make_texts.py:547)."""
    return F.lpad(c.cast("string"), width, "0")


_slug_re = re.compile(r"[^a-z0-9]+")


@F.pandas_udf(T.StringType())
def slugify(s: pd.Series) -> pd.Series:
    """ASCII-fold + lowercase + dash-join (vectorized Arrow batch)."""

    def one(x: str | None) -> str | None:
        if x is None:
            return None
        x = unicodedata.normalize("NFKD", x).encode("ascii", "ignore").decode()
        return _slug_re.sub("-", x.lower()).strip("-")

    return s.map(one)


@F.pandas_udf(T.StringType())
def normalize_uri(s: pd.Series) -> pd.Series:
    """Deterministic URL canonicalization: lowercase scheme+host, drop
    trailing slash and fragments."""

    def one(x: str | None) -> str | None:
        if x is None:
            return None
        x = x.split("#", 1)[0].rstrip("/")
        if "://" in x:
            scheme, rest = x.split("://", 1)
            host, _, path = rest.partition("/")
            x = f"{scheme.lower()}://{host.lower()}" + (f"/{path}" if path else "")
        return x

    return s.map(one)


def extract_begin_end(c: Column) -> tuple[Column, Column]:
    """ISO date-range extraction: ``"2020-05-01 – 2020-06-01"`` -> (begin,
    end); a single date -> (d, d). Each side parses independently — an
    unparseable side yields null for that side only ("2020-05-01 – garbage"
    -> (d, null); "garbage – 2020-06-01" -> (null, d)), matching the SQL
    oracle's per-side strptime semantics.
    Reference: ``extract_begin_end`` + the " – " textual range split
    (``/root/reference/scripts/make_listwork.py:833-841``,
    ``scripts/utils/utilities.py:61-70``). JVM-side split/to_date only."""
    parts = F.split(c, " – ")
    # try_to_date: null (not an ANSI-mode cast error) on a malformed side.
    # element_at(-1) == parts[0] for a single date, so (d, d) falls out with
    # no coalesce; a coalesce here would silently collapse a malformed end
    # back onto begin (round-1 ADVICE)
    begin = F.try_to_date(F.trim(parts[0]))
    end = F.try_to_date(F.trim(F.element_at(parts, -1)))
    return begin, end
