"""HTTP JSON Python DataSource: partition-per-endpoint fetch,
exercised over file:// URLs (no network in the test container)."""

import json

import pytest

from crypto_etl_airflow_spark.sources.http_datasource import HttpJsonDataSource


@pytest.fixture()
def payload_files(tmp_path):
    urls = []
    for i, coins in enumerate([{"bitcoin": {"usd": 97000.5}}, {"solana": {"usd": 215.3}}]):
        p = tmp_path / f"payload_{i}.json"
        p.write_text(json.dumps(coins))
        urls.append(p.as_uri())
    return urls


def test_http_json_source_fans_out(spark, payload_files):
    spark.dataSource.register(HttpJsonDataSource)
    df = (
        spark.read.format("http_json")
        .option("urls", ",".join(payload_files))
        .load()
    )
    assert df.columns == ["url", "payload"]
    assert df.rdd.getNumPartitions() == 2  # one partition per endpoint
    rows = {r.url: json.loads(r.payload) for r in df.collect()}
    assert rows[payload_files[0]] == {"bitcoin": {"usd": 97000.5}}
    assert rows[payload_files[1]] == {"solana": {"usd": 215.3}}


def test_http_json_source_feeds_ingest(spark, payload_files):
    from crypto_etl_airflow_spark.sources.json_ingest import payloads_to_df

    spark.dataSource.register(HttpJsonDataSource)
    raw = (
        spark.read.format("http_json")
        .option("urls", ",".join(payload_files))
        .load()
    )
    parsed = payloads_to_df(raw.select("payload"))
    got = {(r.crypto_id, r.price_usd) for r in parsed.collect()}
    assert got == {("bitcoin", 97000.5), ("solana", 215.3)}
