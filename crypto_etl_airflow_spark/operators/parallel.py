"""Input-parallelism guard shared by expression-heavy operators.

A small parquet table scans as fewer partitions than cores (one
modest file → one task), which serializes expensive per-row
expression stages (shingling, 64-dim dot products, bucket hashing)
on a single core while 31 sit idle. ``widen_small_input`` lifts such
inputs to the session's default parallelism — and is deliberately a
no-op at real scale, where input splits already exceed the core
count, so no shuffle is ever added to a big scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_small_input(df: DataFrame) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
