"""Idempotent insert-if-absent writer.

Re-expresses the reference's ``INSERT ... ON CONFLICT (crypto_id,
extracted_at) DO NOTHING`` (reference dags/crypto-etl-pipeline-psql.py:85-89;
SURVEY.md §2.1 S6): re-running an ingest batch must not grow the
table or alter existing rows — exactly-once-per-key append.

Spark realization:

1. within-batch dedup: ``dropDuplicates(keys)``;
2. against-table dedup: **left-anti join** of the new batch against
   the existing table's key projection;
3. append write.

Scale posture: the anti-join reads ONLY the key columns of the
existing table (column pruning reaches the parquet scan), and when
the table is date-partitioned and the batch spans few partitions, a
partition-pruning filter on the key range cuts the read further
(``prune_filter``). Join strategy is left to AQE: a small key slice
broadcasts, a huge one sort-merges. Like the reference (single
Airflow DAG writer), this assumes a single writer — a read-append
race under concurrent writers needs a transactional table format
(Delta/Iceberg ``MERGE INTO``), noted in SURVEY.md §7.4.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession


class EmptyBatchError(ValueError):
    """No rows to load — mirrors the reference's guard (:76-77)."""


def table_exists(spark: SparkSession, path: str) -> bool:
    # local-fs check is enough for this engine's warehouse layout;
    # on cloud storage this would go through the Hadoop FileSystem API
    return os.path.exists(path)


def upsert_append(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
    prune_filter: Column | None = None,
    allow_empty: bool = False,
    checkpoint_dir: str | None = None,
) -> int:
    """Append ``batch`` to the parquet table at ``path``, skipping
    rows whose key already exists. Returns the number of rows written.

    ``prune_filter`` optionally restricts the existing-table read
    (e.g. a date-range predicate over the partition column) so the
    anti-join scans only the partitions the batch can collide with.

    ``checkpoint_dir`` switches the read-before-write barrier to a
    RELIABLE checkpoint beneath that directory: ``localCheckpoint``
    blocks live on executor storage, so an executor lost between the
    checkpoint and the append write would fail the batch (safe but
    fragile); a reliable checkpoint survives it. Default keeps the
    single-node zero-IO path.
    """
    if batch.isEmpty():
        if allow_empty:
            return 0
        raise EmptyBatchError("No data to load: empty batch")

    fresh = batch.dropDuplicates(keys)

    if table_exists(spark, path):
        existing_keys = spark.read.parquet(path).select(*keys)
        if prune_filter is not None:
            existing_keys = existing_keys.filter(prune_filter)
        fresh = fresh.join(existing_keys, on=keys, how="left_anti")

    # checkpoint truncates lineage: the append must not lazily
    # re-read the very path it is writing into (read-before-write)
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        fresh = fresh.checkpoint(eager=True)
    else:
        fresh = fresh.localCheckpoint(eager=True)
    n = fresh.count()
    if n:
        writer = fresh.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
    return n


def merge_replace_keys(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """The UPDATE half of MERGE: rows whose key matches the batch are
    REPLACED by the batch's version; new keys are inserted — the
    reference's ``ON CONFLICT DO NOTHING`` upgraded to ``DO UPDATE``.

    Plan: keep the current table's non-matching rows (left-anti join
    against the deduped batch's keys), union the batch, write to a
    staging path, crash-safe swap into place. Returns
    (n_replaced, n_inserted).

    Scale posture: this rewrites the table — the right default for
    rollup-sized tables; for a 100 TB fact table, date partitioning
    plus a key-range prune restricts the rewrite to the partitions
    the batch touches, and a transactional format (Delta/Iceberg
    MERGE INTO) replaces the swap with a metadata commit. Single
    writer, like the reference.
    """
    from .compact import swap_directory

    if batch.isEmpty():
        return (0, 0)
    fresh = batch.dropDuplicates(keys).localCheckpoint(eager=True)

    if table_exists(spark, path):
        existing = spark.read.parquet(path)
        kept = existing.join(fresh.select(*keys), on=keys, how="left_anti")
        n_existing = existing.count()
        n_kept = kept.count()
        n_replaced = n_existing - n_kept
        merged = kept.unionByName(fresh)
    else:
        n_replaced = 0
        merged = fresh
    n_inserted = fresh.count() - n_replaced

    staging = path.rstrip("/") + ".__merge_tmp"
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    swap_directory(staging, path)
    return (n_replaced, n_inserted)


class JdbcSink:
    """Relational batch sink — the reference's load stage writes
    Postgres via psycopg2 ``execute_batch`` with ``INSERT ... ON
    CONFLICT (crypto_id, extracted_at) DO NOTHING`` (reference
    dags/crypto-etl-pipeline-psql.py:85-97). Spark form: read the
    table's key projection back through JDBC for the anti-join, then
    ``df.write.format("jdbc")`` in append mode; ``batchsize`` plays
    the role of execute_batch's page_size (rows per executemany
    round-trip per partition).

    Scale posture: the write parallelism is the DataFrame's partition
    count — each partition opens one connection; coalesce the batch
    if the database can't take hundreds of writers. The key read-back
    pushes the column projection into the database via ``query``.
    """

    def __init__(
        self,
        url: str,
        table: str,
        properties: dict[str, str] | None = None,
        batchsize: int = 10_000,
    ) -> None:
        self.url = url
        self.table = table
        self.properties = dict(properties or {})
        self.batchsize = batchsize

    def reader_options(self, keys: list[str]) -> dict[str, str]:
        return {
            "url": self.url,
            "query": f"SELECT {', '.join(keys)} FROM {self.table}",
            **self.properties,
        }

    def writer_options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "dbtable": self.table,
            "batchsize": str(self.batchsize),
            **self.properties,
        }

    def read_keys(self, spark: SparkSession, keys: list[str]) -> DataFrame:
        return (
            spark.read.format("jdbc").options(**self.reader_options(keys)).load()
        )

    def append(self, df: DataFrame) -> None:
        df.write.format("jdbc").options(**self.writer_options()).mode(
            "append"
        ).save()


def upsert_append_sink(
    spark: SparkSession,
    batch: DataFrame,
    sink: JdbcSink,
    keys: list[str],
    allow_empty: bool = False,
) -> int:
    """The idempotent-append pipeline of :func:`upsert_append`
    (within-batch dropDuplicates → anti-join vs the sink's existing
    keys → append) against a relational sink — the engine's parity
    path for the reference's transactional Postgres load. Returns
    rows written."""
    if batch.isEmpty():
        if allow_empty:
            return 0
        raise EmptyBatchError("No data to load: empty batch")

    fresh = batch.dropDuplicates(keys)
    existing_keys = sink.read_keys(spark, keys)
    if existing_keys is not None:
        fresh = fresh.join(existing_keys.select(*keys), on=keys, how="left_anti")

    fresh = fresh.localCheckpoint(eager=True)
    n = fresh.count()
    if n:
        sink.append(fresh)
    return n
