"""Table layout for scan pruning: range-partitioned, sorted writes.

Partition pruning (directory-level, via ``partitionBy``) is coarse;
the next rung at 100 TB is FILE/ROW-GROUP skipping: parquet stores
min/max statistics per column per row group, and Spark's vectorized
reader skips row groups whose [min, max] cannot satisfy a pushed
predicate. That only pays off if values are CLUSTERED — a randomly
ordered table has every file spanning the whole key range, so nothing
skips.

``write_range_partitioned`` produces that clustering declaratively:
``repartitionByRange`` (one range-shuffle; Spark samples split
points) gives files DISJOINT key ranges, ``sortWithinPartitions``
orders rows inside each file so row-group stats are tight. A
time-range query over an events table laid out this way touches
~range/total of the files instead of all of them — the same reason
time-series stores cluster on time. Composes with ``partition_by``
(directory pruning first, then stats skipping within each
partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_range_partitioned(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    n_files: int | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    drop_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as parquet clustered on ``range_cols``: rows are
    range-shuffled into ``n_files`` buckets with disjoint key ranges
    (default: the session's shuffle parallelism) and sorted within
    each, so every file's parquet min/max stats on those columns are
    tight and non-overlapping — the precondition for row-group
    skipping under pushed predicates."""
    if n_files is None:
        out = df.repartitionByRange(*range_cols)
    else:
        out = df.repartitionByRange(n_files, *range_cols)
    sorted_out = out.sortWithinPartitions(*range_cols)
    if drop_cols:
        sorted_out = sorted_out.drop(*drop_cols)  # order is preserved
    writer = sorted_out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


# ---------------------------------------------------------------------------
# Z-order (Morton-curve) clustering — MULTI-column row-group skipping
# ---------------------------------------------------------------------------

# Range clustering is one-dimensional: sorting on (a, b) gives tight
# stats on `a` but leaves every file spanning b's full range, so
# predicates on b alone skip nothing. Interleaving the BITS of both
# keys (the Morton / Z curve) and range-clustering on that single
# value keeps each file inside a small rectangle of (a, b) space:
# min/max stats are tight on BOTH columns and either predicate prunes
# — the same layout Delta's OPTIMIZE ZORDER BY produces.

INPUT_MASK = 0x7FFFFFFF  # keys participate with their low 31 bits

_SPREAD_STEPS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_bits(col: Column) -> Column:
    """Spread the low 31 bits of ``col`` so bit i lands at bit 2i —
    the standard shift-or-mask sequence, pure int64 arithmetic. The
    initial 31-bit mask makes the function TOTAL: negative or
    >= 2^31 inputs contribute their low 31 bits instead of leaking
    high bits into the interleave (which would flip z negative and
    silently destroy the clustering); every intermediate then stays
    inside signed 64-bit, so ANSI mode never overflows."""
    x = col.bitwiseAND(F.lit(INPUT_MASK))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def z_value(a: Column, b: Column) -> Column:
    """Morton interleave of two ints on their low 31 bits: bit i of
    ``a`` at bit 2i, bit i of ``b`` at bit 2i+1 (wider/negative
    values are masked — see :func:`_spread_bits`). Identical
    arithmetic runs in any engine with shifts (the DuckDB oracle
    evaluates the same expression), so z-ordered layouts are
    reproducible."""
    return _spread_bits(a.cast("long")).bitwiseOR(
        F.shiftleft(_spread_bits(b.cast("long")), 1)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered on the Z-curve over (col_a, col_b):
    range-shuffle + sort on the interleaved value, drop it before
    writing. Files end up covering small (a, b) rectangles, so
    parquet min/max stats prune row groups for predicates on EITHER
    column — the multi-dimensional upgrade of
    :func:`write_range_partitioned`."""
    with_z = df.withColumn("__z", z_value(F.col(col_a), F.col(col_b)))
    write_range_partitioned(
        with_z, path, ["__z"], n_files=n_files, mode=mode, drop_cols=["__z"]
    )
