"""Exactly-once streaming ingest: foreachBatch + idempotent upsert.

The streaming restatement of the reference's load path (SURVEY.md
§2.7): checkpointing gives at-least-once batch delivery, and the
key-based insert-if-absent writer (operators/upsert.py, the
`ON CONFLICT DO NOTHING` equivalent — reference
dags/crypto-etl-pipeline-psql.py:85-89) makes redelivery a no-op, so
the sink is effectively exactly-once-per-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.upsert import upsert_append
from .sources import stream_events


def ingest_events_stream(
    spark: SparkSession,
    source_dir: str,
    warehouse_path: str,
    checkpoint_dir: str,
    keys: tuple[str, ...] = ("event_id",),
) -> None:
    """Drain all available ``events`` files from ``source_dir`` into
    the parquet table at ``warehouse_path``, insert-if-absent on
    ``keys``. Restarting with the same checkpoint resumes; restarting
    with a fresh checkpoint re-reads everything and writes nothing
    new (idempotency test path)."""
    sdf = stream_events(spark, source_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        upsert_append(
            spark, batch_df, warehouse_path, keys=list(keys), allow_empty=True
        )

    query = (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
