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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# shared by batch and streaming reads; batch stamps poll = 0
SCHEMA_DDL = "url string, payload string, poll int"


class _UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class HttpJsonReader(DataSourceReader):
    def __init__(self, urls: Sequence[str], timeout_s: float):
        self.urls = [u for u in urls if u]
        self.timeout_s = timeout_s

    def partitions(self) -> list[_UrlPartition]:
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition) -> Iterator[tuple[str, str, int]]:
        import urllib.request

        with urllib.request.urlopen(  # noqa: S310 — caller controls URLs
            partition.url, timeout=self.timeout_s
        ) as resp:
            yield partition.url, resp.read().decode("utf-8"), 0


class HttpPollStreamReader(SimpleDataSourceStreamReader):
    """Streaming poll source: each micro-batch fetches every endpoint
    once and stamps the poll number — the reference's `@hourly`
    re-extract (reference dags/crypto-etl-pipeline-psql.py:136,168-179)
    as a native streaming source (pair with
    ``trigger(processingTime='1 hour')``).

    Offsets are poll counters, so progress checkpoints/restarts like
    any other source. ``readBetweenOffsets`` re-fetches on replay —
    at-least-once delivery; the idempotent upsert sink
    (streaming/ingest.py) absorbs redelivery, which is exactly the
    reference's ON CONFLICT contract.
    """

    def __init__(self, urls: Sequence[str], timeout_s: float):
        self.urls = [u for u in urls if u]
        self.timeout_s = timeout_s

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _fetch_all(self, poll: int) -> list[tuple[str, str, int]]:
        import urllib.request

        out = []
        for url in self.urls:
            with urllib.request.urlopen(  # noqa: S310
                url, timeout=self.timeout_s
            ) as resp:
                out.append((url, resp.read().decode("utf-8"), poll))
        return out

    def read(self, start: dict):
        poll = start["poll"]
        return iter(self._fetch_all(poll)), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for poll in range(start["poll"], end["poll"]):
            yield from self._fetch_all(poll)


class HttpJsonDataSource(DataSource):
    """``format("http_json")`` — options:

    - ``urls``: comma-separated endpoint list (required);
    - ``timeout_s``: per-request timeout, default 30.

    Batch (``spark.read``): one partition per endpoint, schema
    ``(url, payload)``. Streaming (``spark.readStream``): one fetch of
    every endpoint per micro-batch, schema ``(url, payload, poll)``.
    """

    @classmethod
    def name(cls) -> str:
        return "http_json"

    def _urls(self) -> list[str]:
        return [u.strip() for u in self.options.get("urls", "").split(",")]

    def _timeout(self) -> float:
        return float(self.options.get("timeout_s", "30"))

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> HttpJsonReader:
        return HttpJsonReader(self._urls(), self._timeout())

    def simpleStreamReader(self, schema) -> HttpPollStreamReader:
        return HttpPollStreamReader(self._urls(), self._timeout())


def register_http_json(spark) -> None:
    """Register the source with ``spark`` so ``format("http_json")``
    resolves.

    Registered DataSource classes are cloudpickled into Python
    workers; by default a class pickles BY REFERENCE to its defining
    module, which workers outside the repo root cannot import. Marking
    this module pickle-by-value makes the shipped class
    self-contained (same concern as the inline closures in
    operators/multimodal.py and streaming/stateful.py, solved at the
    serializer level because classes can't be inlined)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(HttpJsonDataSource)
