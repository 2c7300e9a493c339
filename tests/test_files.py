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


def test_write_jsonl_shards_roundtrip_and_shard_bound(spark, tmp_path):
    import glob
    import json

    from crypto_etl_airflow_spark.sources.files import write_jsonl_shards

    rows = [(i, f"doc {i}", "en") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "shards")
    write_jsonl_shards(
        df.repartition(2), out, max_records_per_file=25, order_by=["doc_id"]
    )

    files = sorted(glob.glob(f"{out}/part-*"))
    # 2 partitions x 50 rows, bounded at 25 records -> at least 4 shards
    assert len(files) >= 4
    back = []
    for f in files:
        with open(f) as fh:
            lines = [json.loads(ln) for ln in fh if ln.strip()]
        assert len(lines) <= 25  # the shard bound holds per file
        # within-shard determinism: sorted by doc_id
        ids = [r["doc_id"] for r in lines]
        assert ids == sorted(ids)
        back.extend(lines)
    assert sorted(r["doc_id"] for r in back) == list(range(100))
    assert all(set(r) == {"doc_id", "text", "lang"} for r in back)


def test_write_jsonl_shards_refuses_existing_path_by_default(spark, tmp_path):
    """ADVICE r8: the default must not silently destroy a prior
    delivery; republishing requires an explicit mode='overwrite'."""
    import glob

    import pytest
    from pyspark.errors import AnalysisException

    from crypto_etl_airflow_spark.sources.files import write_jsonl_shards

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    out = str(tmp_path / "delivery")
    write_jsonl_shards(df, out)
    with pytest.raises(AnalysisException):
        write_jsonl_shards(df, out)  # default mode='error'
    write_jsonl_shards(df, out, mode="overwrite")  # explicit republish
    assert glob.glob(f"{out}/part-*")
