"""CSV / JSON-lines sources: explicit schema, corrupt-record
quarantine, clean-split semantics."""

from pyspark.sql import types as T

from crypto_etl_airflow_spark.sources.files import (
    read_csv_quarantined,
    read_jsonl_quarantined,
)

SCHEMA = T.StructType(
    [
        T.StructField("crypto_id", T.StringType()),
        T.StructField("price_usd", T.DoubleType()),
    ]
)


def test_csv_valid_and_malformed_split(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "crypto_id,price_usd\n"
        "bitcoin,65000.5\n"
        "ethereum,not_a_number\n"  # uncastable -> quarantine
        "solana,145.2\n"
    )
    valid, quarantine = read_csv_quarantined(spark, str(p), SCHEMA)
    got = {r.crypto_id: r.price_usd for r in valid.collect()}
    assert got == {"bitcoin": 65000.5, "solana": 145.2}
    bad = [r.raw_record for r in quarantine.collect()]
    assert bad == ["ethereum,not_a_number"]


def test_csv_all_valid_has_empty_quarantine(spark, tmp_path):
    p = tmp_path / "ok.csv"
    p.write_text("crypto_id,price_usd\nbitcoin,1.0\n")
    valid, quarantine = read_csv_quarantined(spark, str(p), SCHEMA)
    assert valid.count() == 1 and quarantine.count() == 0


def test_jsonl_split_on_unparseable_line(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"crypto_id": "bitcoin", "price_usd": 65000.5}\n'
        "{this is not json\n"
        '{"crypto_id": "tether", "price_usd": 1.0}\n'
    )
    valid, quarantine = read_jsonl_quarantined(spark, str(p), SCHEMA)
    got = {r.crypto_id: r.price_usd for r in valid.collect()}
    assert got == {"bitcoin": 65000.5, "tether": 1.0}
    assert quarantine.count() == 1
