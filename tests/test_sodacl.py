"""SodaCL-subset parser + streaming quality gate."""

import datetime as dt

import pytest

from crypto_etl_airflow_spark.quality.checks import QualityGateError, run_scan
from crypto_etl_airflow_spark.quality.sodacl import parse_checks

# the reference's exact rule set (include/soda/checks.yml:1-9 shape)
REFERENCE_CHECKS = """
checks for crypto_prices:
  - min(price_usd):
      fail: when < 0
  - freshness(extracted_at):
      warn: when > 2h
      fail: when > 6h
"""

EXTENDED_CHECKS = """
checks for crypto_prices:
  - min(price_usd):
      fail: when < 0
  - row_count > 0
  - missing_count(crypto_id) = 0
  - duplicate_count(crypto_id, extracted_at) = 0
"""


def _prices(spark, rows):
    return spark.createDataFrame(
        rows, "crypto_id string, price_usd double, extracted_at timestamp"
    )


def test_reference_checks_parse_and_pass(spark):
    table, checks = parse_checks(REFERENCE_CHECKS)
    assert table == "crypto_prices"
    assert len(checks) == 2
    now = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = _prices(spark, [("btc", 100.0, now), ("eth", 10.0, now)])
    # freshness uses wall clock by default; rebuild with injected now
    from crypto_etl_airflow_spark.quality.checks import freshness, min_value

    checks = [
        min_value("price_usd", fail_when_lt=0.0),
        freshness("extracted_at", "2 hours", "6 hours", now=now + dt.timedelta(hours=1)),
    ]
    result = run_scan(df, checks)
    assert not result.failed and not result.warned


def test_reference_checks_gate_on_negative_price(spark):
    _, checks = parse_checks(REFERENCE_CHECKS)
    now = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = _prices(spark, [("btc", -1.0, now)])
    result = run_scan(df, [checks[0]])
    assert result.failed
    with pytest.raises(QualityGateError):
        result.enforce()


def test_extended_grammar(spark):
    table, checks = parse_checks(EXTENDED_CHECKS)
    assert len(checks) == 4
    now = dt.datetime(2024, 1, 1, 12, 0, 0)
    ok = _prices(spark, [("btc", 1.0, now), ("eth", 2.0, now)])
    assert not run_scan(ok, checks).failed
    dupes = _prices(spark, [("btc", 1.0, now), ("btc", 9.0, now)])
    assert run_scan(dupes, checks).failed  # duplicate (crypto_id, ts)


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_checks("- min(price_usd):\n    fail: when < 0")  # no header
    with pytest.raises(ValueError):
        parse_checks("checks for t:\n  - frobnicate(x) = 0")
    with pytest.raises(ValueError):
        parse_checks("checks for t:\n  - freshness(ts):\n      fail: when > 6fortnights")


def test_streaming_gate_blocks_poison_batch(spark, tmp_path):
    """A micro-batch violating a fail-level check must fail the query
    and leave the sink unwritten."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from crypto_etl_airflow_spark.quality.checks import min_value
    from crypto_etl_airflow_spark.streaming.quality_gate import gated_batch_writer

    schema = T.StructType(
        [
            T.StructField("crypto_id", T.StringType()),
            T.StructField("price_usd", T.DoubleType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    with tempfile.TemporaryDirectory() as staging:
        spark.createDataFrame(
            [("btc", -5.0)], schema
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        shutil.copy(
            glob.glob(f"{staging}/part-*.parquet")[0], str(src / "b0.parquet")
        )

    sink = str(tmp_path / "sink")
    writes = []

    def write(batch_df, batch_id):
        writes.append(batch_id)
        batch_df.write.mode("append").parquet(sink)

    gated = gated_batch_writer([min_value("price_usd", fail_when_lt=0.0)], write)
    q = (
        spark.readStream.schema(schema)
        .parquet(str(src))
        .writeStream.foreachBatch(gated)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="Quality gate failed"):
        q.awaitTermination()
    assert writes == []  # the poisoned batch never reached the sink
