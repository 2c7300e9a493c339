"""Exactly-once streaming ingest: foreachBatch + idempotent upsert.

The streaming restatement of the reference's load path (SURVEY.md
§2.7): checkpointing gives at-least-once batch delivery, and the
key-based insert-if-absent writer (operators/upsert.py, the
`ON CONFLICT DO NOTHING` equivalent — reference
dags/crypto-etl-pipeline-psql.py:85-89) makes redelivery a no-op, so
the sink is effectively exactly-once-per-key.

Scheduling (the reference's `@hourly, catchup=False` under Airflow,
dags/crypto-etl-pipeline-psql.py:136,138) maps to either trigger
mode:

- ``AvailableNow`` (default): each invocation drains what's new and
  stops — the run-per-tick form, driven by any external scheduler
  (cron, Airflow, a workflow engine). `catchup=False` falls out of
  the checkpoint: a late start simply drains everything pending as
  ONE run instead of replaying missed ticks.
- ``processing_time='1 hour'``: the self-scheduling daemon form — one
  long-lived query fires a micro-batch every tick with no external
  scheduler, Spark's own restatement of the Airflow scheduler loop.
  Returns the live ``StreamingQuery`` for lifecycle control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.upsert import upsert_append
from .sources import stream_events


def ingest_events_stream(
    spark: SparkSession,
    source_dir: str,
    warehouse_path: str,
    checkpoint_dir: str,
    keys: tuple[str, ...] = ("event_id",),
    processing_time: str | None = None,
) -> StreamingQuery | None:
    """Ingest ``events`` files from ``source_dir`` into the parquet
    table at ``warehouse_path``, insert-if-absent on ``keys``.

    Default (``processing_time=None``): drain all currently-available
    files and stop (``Trigger.AvailableNow``); returns None.
    Restarting with the same checkpoint resumes; restarting with a
    fresh checkpoint re-reads everything and writes nothing new
    (idempotency test path).

    ``processing_time`` (e.g. ``'1 hour'``): run as a DAEMON — the
    query stays up and fires one micro-batch per tick, ingesting
    whatever arrived since the last one (the reference's hourly
    scheduler loop without Airflow). Returns the live query; the
    caller owns ``stop()``/``awaitTermination``."""
    sdf = stream_events(spark, source_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        upsert_append(
            spark, batch_df, warehouse_path, keys=list(keys), allow_empty=True
        )

    writer = (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time is not None:
        query = writer.trigger(processingTime=processing_time).start()
        return query
    query = writer.trigger(availableNow=True).start()
    query.awaitTermination()
    return None


def ingest_events_stream_transactional(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint_dir: str,
    keys: tuple[str, ...] = ("event_id",),
    processing_time: str | None = None,
) -> StreamingQuery | None:
    """The MULTI-WRITER form of :func:`ingest_events_stream`: each
    micro-batch commits through the transactional table
    (operators/txlog.py ``tx_append_if_absent``) instead of the
    single-writer parquet writer, so a streaming ingest can run
    CONCURRENTLY with batch writers (or other streams) against the
    same table and still land exactly-once-per-key — redelivered
    micro-batches re-resolve the snapshot and write nothing, racing
    writers lose the version claim and re-check, precisely the
    serialization Postgres row locks gave the reference's loader
    (dags/crypto-etl-pipeline-psql.py:85-89). Trigger semantics match
    :func:`ingest_events_stream` (AvailableNow drain vs
    processing-time daemon)."""
    from ..operators.txlog import tx_append_if_absent

    sdf = stream_events(spark, source_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        tx_append_if_absent(spark, batch_df, table_path, keys=list(keys))

    writer = (
        sdf.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time is not None:
        return writer.trigger(processingTime=processing_time).start()
    query = writer.trigger(availableNow=True).start()
    query.awaitTermination()
    return None
