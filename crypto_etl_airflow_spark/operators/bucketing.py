"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders)
is the shuffle of both sides on the join key. Bucketing pays that
shuffle ONCE at write time: ``bucketBy(n, key)`` hash-partitions the
files on disk, so every later join or aggregation on that key reads
both sides already co-partitioned — the plan has no Exchange under
the join (verified in tests/test_bucketing.py by inspecting the
physical plan).

Bucketed tables must live in the catalog (`saveAsTable`) because the
bucket layout is metadata; a bare parquet path loses it. Bucket
count is a deploy-time choice: ≈ total-cores × small-multiple, and
both sides of a co-located join must agree on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int = 8,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    Sorting within buckets additionally removes the per-task Sort
    under a sort-merge join.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
