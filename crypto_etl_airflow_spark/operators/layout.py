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

from pyspark.sql import DataFrame


def write_range_partitioned(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    n_files: int | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
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
    writer = out.sortWithinPartitions(*range_cols).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
