"""Skew-mitigation join: deterministic salting for known-hot keys.

AQE's skew-join splitting rescues sort-merge joins whose skew only shows up
at runtime; salting is the PLANNED variant for keys known to be hot before
the job runs — stopword-grade join keys, sentinel sources, the reference's
12,751-member hot token class (SURVEY.md §6). The fact side assigns each row
a deterministic salt from ``xxhash64`` of stable row identity; the other
side replicates each row across all salts; the join key becomes
``(key, salt)``, fanning every hot key over ``n_salts`` reducers. The result
is row-identical to the unsalted equi-join (asserted in tests), the cost is
an ``n_salts``-times replication of the smaller side — which is exactly the
broadcast trade in miniature, applied only when the smaller side is too big
to broadcast whole.

Determinism note: the salt comes from hashing stable identity columns, NOT
``rand()`` — retried tasks must re-derive the same salt or shuffle-replay
under fault recovery double-counts rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    other: DataFrame,
    key: str | list[str],
    salt_from: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``other`` on ``key`` with the hot-key fan-out.

    ``salt_from``: fact columns forming a stable row identity (e.g. the
    primary key) — hashed to pick the row's salt bucket.
    ``how``: inner/left semantics match the plain join (each fact row meets
    exactly one replica of its matching ``other`` row).
    """
    keys = [key] if isinstance(key, str) else list(key)
    f = fact.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    o = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(o, keys + [SALT_COL], how).drop(SALT_COL)
