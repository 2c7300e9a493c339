"""Skew-mitigating salted join.

When one join key carries a disproportionate share of rows (hot
entity, null-ish default key), the shuffle puts that key's entire
volume on one reducer and the stage runs at the speed of its hottest
partition. AQE's skew-join handles this for sort-merge joins it can
see; salting is the explicit, always-available form, and the one that
also works for aggregations-after-join pipelines.

Scheme (classic two-sided salting):

- fact side: add ``salt = pmod(xxhash64(<whole row id>), k)`` — the
  hot key's rows spread over k sub-partitions;
- dim side: explode each row into k copies, one per salt value;
- join on (key, salt); the result is row-identical to the unsalted
  join, so the DuckDB oracle for the plain join checks it exactly.

Cost model: the dim side is replicated k×, the fact side is not —
choose k ≈ (hot-key rows / target-partition rows), keep the dim side
small. Salt derives from xxhash64 of fact columns, not a RNG, so
plans are deterministic and re-runs identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    k: int = 8,
    how: str = "inner",
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Join ``fact`` with ``dim`` on equi-keys ``on``, salted k ways.

    ``salt_from`` names the fact columns the salt is hashed from
    (defaults to all fact columns) — any choice is correct, the only
    requirement is spread within a key group.
    """
    cols = salt_from or fact.columns
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(k))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(k - 1)).cast("array<long>"))
    )
    out = salted_fact.join(salted_dim, [*on, "__salt"], how)
    return out.drop("__salt")
