"""HTTP JSON Python DataSource: partition-per-endpoint fetch,
exercised over file:// URLs (no network in the test container)."""

import json

import pytest

from crypto_etl_airflow_spark.sources.http_datasource import register_http_json


@pytest.fixture()
def payload_files(tmp_path):
    urls = []
    for i, coins in enumerate([{"bitcoin": {"usd": 97000.5}}, {"solana": {"usd": 215.3}}]):
        p = tmp_path / f"payload_{i}.json"
        p.write_text(json.dumps(coins))
        urls.append(p.as_uri())
    return urls


def test_http_json_source_fans_out(spark, payload_files):
    register_http_json(spark)
    df = (
        spark.read.format("http_json")
        .option("urls", ",".join(payload_files))
        .load()
    )
    assert df.columns == ["url", "payload", "poll"]
    assert df.rdd.getNumPartitions() == 2  # one partition per endpoint
    rows = {r.url: json.loads(r.payload) for r in df.collect()}
    assert rows[payload_files[0]] == {"bitcoin": {"usd": 97000.5}}
    assert rows[payload_files[1]] == {"solana": {"usd": 215.3}}


def test_http_json_source_feeds_ingest(spark, payload_files):
    from crypto_etl_airflow_spark.sources.json_ingest import payloads_to_df

    register_http_json(spark)
    raw = (
        spark.read.format("http_json")
        .option("urls", ",".join(payload_files))
        .load()
    )
    parsed = payloads_to_df(raw.select("payload"))
    got = {(r.crypto_id, r.price_usd) for r in parsed.collect()}
    assert got == {("bitcoin", 97000.5), ("solana", 215.3)}


def test_http_poll_stream_source(spark, payload_files, tmp_path):
    """Streaming mode: each micro-batch polls every endpoint once,
    stamping the poll counter — two processed batches yield two polls
    of both endpoints."""
    import time

    register_http_json(spark)
    sdf = (
        spark.readStream.format("http_json")
        .option("urls", ",".join(payload_files))
        .load()
    )
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("http_poll_mem")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            polls = {r.poll for r in spark.table("http_poll_mem").collect()}
            if {0, 1} <= polls:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.table("http_poll_mem").collect()
    by_poll = {}
    for r in rows:
        by_poll.setdefault(r.poll, set()).add(r.url)
    # every completed poll fetched BOTH endpoints
    assert set(by_poll[0]) == set(payload_files)
    assert set(by_poll[1]) == set(payload_files)
