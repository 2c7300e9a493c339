"""Idempotent insert-if-absent writer — the ON CONFLICT DO NOTHING
contract (reference dags/crypto-etl-pipeline-psql.py:85-89)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.upsert import (
    EmptyBatchError,
    upsert_append,
)

KEYS = ["crypto_id", "extracted_at"]
SCHEMA = "crypto_id string, price_usd double, extracted_at timestamp"


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


T0 = dt.datetime(2024, 1, 1, 0, 0)
T1 = dt.datetime(2024, 1, 1, 1, 0)


def test_first_write_creates_table(spark, tmp_path):
    path = str(tmp_path / "t")
    n = upsert_append(spark, _batch(spark, [("btc", 1.0, T0)]), path, KEYS)
    assert n == 1
    assert spark.read.parquet(path).count() == 1


def test_rerun_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    batch = _batch(spark, [("btc", 1.0, T0), ("eth", 2.0, T0)])
    assert upsert_append(spark, batch, path, KEYS) == 2
    # identical re-run: nothing inserted, no growth (reference :88)
    assert upsert_append(spark, batch, path, KEYS) == 0
    assert spark.read.parquet(path).count() == 2


def test_overlapping_batch_inserts_only_new_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    upsert_append(spark, _batch(spark, [("btc", 1.0, T0)]), path, KEYS)
    n = upsert_append(
        spark,
        _batch(spark, [("btc", 999.0, T0), ("btc", 1.5, T1), ("eth", 2.0, T0)]),
        path,
        KEYS,
    )
    assert n == 2
    table = spark.read.parquet(path)
    assert table.count() == 3
    # existing row untouched: DO NOTHING, not DO UPDATE
    [btc_t0] = table.filter(
        "crypto_id = 'btc' and extracted_at = timestamp'2024-01-01 00:00:00'"
    ).collect()
    assert btc_t0.price_usd == 1.0


def test_within_batch_duplicates_collapse(spark, tmp_path):
    path = str(tmp_path / "t")
    n = upsert_append(
        spark,
        _batch(spark, [("btc", 1.0, T0), ("btc", 1.0, T0)]),
        path,
        KEYS,
    )
    assert n == 1


def test_empty_batch_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    with pytest.raises(EmptyBatchError):
        upsert_append(spark, _batch(spark, []), path, KEYS)
    assert upsert_append(spark, _batch(spark, []), path, KEYS, allow_empty=True) == 0


def test_partitioned_write(spark, tmp_path):
    path = str(tmp_path / "t")
    batch = _batch(spark, [("btc", 1.0, T0), ("eth", 2.0, T1)]).withColumn(
        "dt", F.to_date("extracted_at")
    )
    upsert_append(spark, batch, path, KEYS, partition_by=["dt"])
    assert spark.read.parquet(path).count() == 2
