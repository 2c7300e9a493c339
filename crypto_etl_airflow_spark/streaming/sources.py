"""Streaming sources: file-watch over the warehouse directory.

The file source is the test-friendly stand-in for the production
bus (Kafka/Kinesis) — swapping `readStream.parquet(dir)` for
`readStream.format("kafka")` changes no downstream code, because
everything operates on the unbounded DataFrame.

Schema is always declared explicitly (streaming reads never infer;
mirrors SURVEY.md §2.1 S3 "keep schema explicit").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded view of the ``events`` table: watch ``sf_dir`` for
    parquet files named ``events*.parquet``.

    The schema comes from one driver-side footer read of the existing
    file — no data scan, and the stream gets the exact at-rest types
    (``ts`` is parquet ``timestamp[us]`` with no UTC adjustment →
    ``TimestampNTZ``, identical to the batch loader in
    sources/tables.py — the batch/stream parity test asserts this).
    """
    schema = (
        spark.read.option("pathGlobFilter", "events*.parquet").parquet(sf_dir).schema
    )
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )


def stream_parquet_dir(
    spark: SparkSession, path: str, schema: T.StructType, glob: str = "*.parquet"
) -> DataFrame:
    """Generic file-watch source over a directory of parquet files."""
    return (
        spark.readStream.schema(schema).option("pathGlobFilter", glob).parquet(path)
    )
