"""Incremental time-bucket rollups (continuous aggregates).

The hypertable-rollup pattern: a small, always-current aggregate
table (per entity per hour) maintained incrementally from event
batches instead of recomputed from 100 TB of raw history. Because
count/sum/min/max are decomposable, merging a batch's partial
aggregate into the stored rollup is a full-outer join + element-wise
combine — the delta costs O(batch + affected buckets), never a raw
rescan. (avg is derived from sum/count at read time; non-decomposable
aggregates need sketches.)

The rollup write uses staging + swap like compaction; it is tiny
(bucket × entity cardinality) compared to the raw table, so a full
rewrite per refresh is the right trade until bucket counts get huge,
at which point the same merge writes only affected date partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compact import swap_directory


def hourly_partial(
    batch: DataFrame,
    entity_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Decomposable per-(hour, entity) partial aggregate of a batch."""
    return batch.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
        F.col(entity_col).alias("entity"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("total_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def _merge(existing: DataFrame, delta: DataFrame) -> DataFrame:
    e = existing.select(
        "bucket",
        "entity",
        F.col("n_events").alias("e_n"),
        F.col("total_value").alias("e_t"),
        F.col("min_value").alias("e_min"),
        F.col("max_value").alias("e_max"),
    )
    d = delta.select(
        "bucket",
        "entity",
        F.col("n_events").alias("d_n"),
        F.col("total_value").alias("d_t"),
        F.col("min_value").alias("d_min"),
        F.col("max_value").alias("d_max"),
    )
    j = e.join(d, ["bucket", "entity"], "full_outer")
    zero = F.lit(0).cast("long")
    return j.select(
        "bucket",
        "entity",
        (F.coalesce("e_n", zero) + F.coalesce("d_n", zero)).alias("n_events"),
        (
            F.coalesce("e_t", F.lit(0.0)) + F.coalesce("d_t", F.lit(0.0))
        ).alias("total_value"),
        F.least(
            F.coalesce("e_min", F.col("d_min")), F.coalesce("d_min", F.col("e_min"))
        ).alias("min_value"),
        F.greatest(
            F.coalesce("e_max", F.col("d_max")), F.coalesce("d_max", F.col("e_max"))
        ).alias("max_value"),
    )


def refresh_hourly_rollup(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    entity_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Fold ``batch`` into the rollup table at ``path``; returns the
    refreshed rollup DataFrame. First call creates the table."""
    delta = hourly_partial(batch, entity_col, ts_col, value_col)
    if os.path.exists(path):
        merged = _merge(spark.read.parquet(path), delta)
    else:
        merged = delta
    staging = path.rstrip("/") + ".__rollup_tmp"
    merged.write.mode("overwrite").parquet(staging)
    swap_directory(staging, path)
    return spark.read.parquet(path)
