"""HTTP JSON as a first-class Spark data source (Python DataSource API).

The idiomatic Spark-4 realization of the reference's HTTP extract
(reference dags/crypto-etl-pipeline-psql.py:168-179; SURVEY.md §2.1
S1 "custom Python DataSource"): after

    spark.dataSource.register(HttpJsonDataSource)
    df = (spark.read.format("http_json")
          .option("urls", "https://a/x,https://a/y").load())

each URL becomes one input partition, so the fetch fans out across
executors and the result is a plain DataFrame (url, payload) that
downstream parsing (`sources/json_ingest.payloads_to_df`) consumes.

Scale posture: partition-per-endpoint is the right granularity when
endpoints outnumber cores; for few endpoints the driver-side fetch
(`sources/http.fetch_price_payload`) avoids the job entirely. The
reader is self-contained (stdlib urllib only) — it ships to workers
by value, no package import required executor-side.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA_DDL = "url string, payload string"


class _UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class HttpJsonReader(DataSourceReader):
    def __init__(self, urls: Sequence[str], timeout_s: float):
        self.urls = [u for u in urls if u]
        self.timeout_s = timeout_s

    def partitions(self) -> list[_UrlPartition]:
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition) -> Iterator[tuple[str, str]]:
        import urllib.request

        with urllib.request.urlopen(  # noqa: S310 — caller controls URLs
            partition.url, timeout=self.timeout_s
        ) as resp:
            yield partition.url, resp.read().decode("utf-8")


class HttpJsonDataSource(DataSource):
    """``format("http_json")`` — options:

    - ``urls``: comma-separated endpoint list (required);
    - ``timeout_s``: per-request timeout, default 30.
    """

    @classmethod
    def name(cls) -> str:
        return "http_json"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> HttpJsonReader:
        urls = [u.strip() for u in self.options.get("urls", "").split(",")]
        timeout_s = float(self.options.get("timeout_s", "30"))
        return HttpJsonReader(urls, timeout_s)
