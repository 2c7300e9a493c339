"""Run-to-completion helpers for streaming queries.

``Trigger.AvailableNow`` + ``awaitTermination`` turns an unbounded
query into a deterministic "process everything currently available"
run — the Spark restatement of the reference's `@hourly,
catchup=False` cadence (reference dags/crypto-etl-pipeline-psql.py:136,138):
each invocation drains what's new and stops.

The memory sink is for tests/oracle runs only (it materializes on
the driver); production sinks are the foreachBatch upsert writer
(ingest.py) or parquet/Kafka sinks.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession


def _run(sdf: DataFrame, output_mode: str, checkpoint: str | None) -> DataFrame:
    name = f"mem_{uuid.uuid4().hex[:12]}"
    writer = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    query = writer.start()
    query.awaitTermination()
    spark = SparkSession.getActiveSession()
    return spark.table(name)


def run_complete_to_memory(sdf: DataFrame, checkpoint: str | None = None) -> DataFrame:
    """Drain the stream; return the full (complete-mode) result —
    for aggregations where every window should be visible."""
    return _run(sdf, "complete", checkpoint)


def run_append_to_memory(sdf: DataFrame, checkpoint: str | None = None) -> DataFrame:
    """Drain the stream; return rows emitted in append mode (only
    watermark-finalized results for aggregations; every emission for
    stateful operators)."""
    return _run(sdf, "append", checkpoint)
