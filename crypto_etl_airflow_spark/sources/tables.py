"""Parquet warehouse loader.

The engine's at-rest format is Parquet (columnar, splittable,
predicate-pushdown-capable) — the scale-ready replacement for the
reference's single Postgres heap table ``crypto_prices`` (reference
dags/crypto-etl-pipeline-psql.py:157-164).

Reads are plain ``spark.read.parquet`` so Catalyst gets the native
vectorized scan with filter pushdown and column pruning; at cluster
scale the same call reads a date-partitioned directory tree and gains
partition pruning with zero code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one warehouse table from ``{sf_dir}/{name}.parquet``.

    Timestamp columns in the fixtures are parquet ``timestamp[us]``
    with no UTC adjustment, which Spark surfaces as ``TimestampNTZ``
    — the same naive-µs value DuckDB reads as its ``TIMESTAMP``, so
    both engines see identical values with no normalization step.
    """
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load several tables; returns {name: DataFrame} (all lazy)."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view so ``spark.sql`` can see it."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
