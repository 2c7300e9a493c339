"""As-of join: for each probe row, the most recent build row at or
before its timestamp, per key.

The price-series primitive the reference's warehouse implies ("price
at-or-before t" over crypto_prices; SURVEY.md §2.3/§7.4). Spark has
no built-in as-of join, so this uses the union-and-window pattern:

1. tag both sides and union them (schema-aligned);
2. one window per key ordered by (ts, side) — build rows sort before
   probe rows at equal timestamps so ``ts >= build.ts`` matches;
3. ``last(value, ignoreNulls=True)`` forward-fills the latest build
   value onto every row;
4. keep only probe rows.

Scale posture: ONE shuffle on the key (the window partition), no
join at all — this beats a range-join at 100 TB because the
union+window is linear in rows and never builds a cross-product of
candidate matches. Skewed keys degrade the window sort; salting the
key with a time bucket is the escape hatch (not needed at fixture
scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = build, 1 = probe: builds win ties


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    keys: list[str],
    value_cols: list[str],
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: ``probe`` rows gain, for each column in
    ``value_cols``, the value from the latest ``build`` row with
    ``build[on] <= probe[on]`` and equal ``keys``; NULL when no such
    row exists.

    ``tolerance`` (an interval literal like ``"1 hour"``) bounds the
    match's staleness: a build row older than ``probe[on] -
    tolerance`` yields NULL instead — the pandas ``merge_asof``
    tolerance semantic, needed whenever "the last known price" must
    not silently be a week old.

    Probe columns pass through unchanged; joined columns are named
    ``{col}{suffix}``.
    """
    probe_cols = probe.columns
    out_vals = [f"{c}{suffix}" for c in value_cols]
    fill_cols = list(value_cols)
    if tolerance is not None:
        fill_cols.append(on)  # forward-fill the matched build ts too

    p = probe.withColumn(_SIDE, F.lit(1))
    for c in value_cols:
        p = p.withColumn(f"__b_{c}", F.lit(None).cast(build.schema[c].dataType))
    if tolerance is not None:
        p = p.withColumn(f"__b_{on}", F.lit(None).cast(build.schema[on].dataType))

    b = build.select(
        *[F.col(k) for k in keys],
        F.col(on),
        *[F.col(c).alias(f"__b_{c}") for c in value_cols],
    ).withColumn(_SIDE, F.lit(0))
    if tolerance is not None:
        b = b.withColumn(f"__b_{on}", F.col(on))
    for c in probe_cols:
        if c not in keys and c != on:
            b = b.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))

    aux = [f"__b_{c}" for c in fill_cols]
    unioned = p.select(*probe_cols, _SIDE, *aux).unionByName(
        b.select(*probe_cols, _SIDE, *aux)
    )

    w = (
        W.partitionBy(*keys)
        .orderBy(
            F.col(on).asc(),
            F.col(_SIDE).asc(),
            # deterministic tiebreak: build rows sharing (keys, ts)
            # would otherwise forward-fill whichever one the shuffle
            # happened to sort last — ordering by the carried values
            # pins the winner (greatest value tuple) on every run and
            # partitioning; probe rows carry NULL aux columns, so
            # their relative order can't affect the fill
            *[F.col(f"__b_{c}").asc() for c in fill_cols],
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *probe_cols,
        F.col(_SIDE),
        *[
            F.last(f"__b_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in fill_cols
        ],
    ).filter(F.col(_SIDE) == 1)

    if tolerance is None:
        within = F.lit(True)
    else:
        within = F.col(on) <= F.col(f"__f_{on}") + F.expr(f"INTERVAL {tolerance}")
    return filled.select(
        *probe_cols,
        *[
            F.when(within, F.col(f"__f_{c}")).alias(out)
            for c, out in zip(value_cols, out_vals)
        ],
    )
