"""HTTP REST source adapter + source-availability sensor.

Re-expresses the reference's HttpSensor + HttpOperator pair
(reference dags/crypto-etl-pipeline-psql.py:143-179; SURVEY.md §2.1
S1-S2). Spark has no native HTTP source, so:

- a **driver-side adapter** fetches one endpoint and hands the body
  to :func:`json_payload_to_df` — right-sized for the reference's
  single 4-row payload;
- a **distributed fetcher** maps an endpoint DataFrame through
  ``mapInPandas`` for fan-out to thousands of endpoints, each
  partition fetching independently on executors.

The fetch function is injectable so tests never touch the network,
and the sensor loop mirrors the reference's semantics: poll every
``poke_interval`` until ``timeout``, succeed when the check passes
(reference: status 200 and body contains "gecko", :147).
"""

from __future__ import annotations

import time
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator
from typing import Any

Fetcher = Callable[[str], str]

DEFAULT_BASE_URL = "https://api.coingecko.com/api/v3"
DEFAULT_COINS = ("bitcoin", "ethereum", "tether", "solana")
DEFAULT_CURRENCY = "usd"


class SourceUnavailableError(RuntimeError):
    """Raised when the availability sensor exhausts its timeout."""


def _urllib_fetch(url: str, timeout_s: float = 30.0) -> str:
    with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
        return resp.read().decode("utf-8")


def wait_for_source(
    url: str,
    check: Callable[[str], bool],
    poke_interval: float = 10.0,
    timeout: float = 60.0,
    fetch: Fetcher = _urllib_fetch,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """Availability sensor: poll until ``check(body)`` is true.

    Mirrors HttpSensor(poke_interval=10, timeout=60) (reference
    :148-149). Raises :class:`SourceUnavailableError` on timeout.
    """
    deadline = time.monotonic() + timeout
    while True:
        try:
            if check(fetch(url)):
                return
        except Exception:
            pass  # unreachable endpoint == failed poke, keep polling
        if time.monotonic() >= deadline:
            raise SourceUnavailableError(f"source not available within {timeout}s: {url}")
        sleep(poke_interval)


def price_url(
    base_url: str = DEFAULT_BASE_URL,
    coins: tuple[str, ...] = DEFAULT_COINS,
    currency: str = DEFAULT_CURRENCY,
) -> str:
    """Build the simple-price endpoint URL (reference :168-176)."""
    params = urllib.parse.urlencode(
        {"ids": ",".join(coins), "vs_currencies": currency}
    )
    return f"{base_url}/simple/price?{params}"


def fetch_price_payload(
    base_url: str = DEFAULT_BASE_URL,
    coins: tuple[str, ...] = DEFAULT_COINS,
    currency: str = DEFAULT_CURRENCY,
    fetch: Fetcher = _urllib_fetch,
) -> str:
    """Driver-side extract: GET the price payload as raw JSON text."""
    return fetch(price_url(base_url, coins, currency))


def distributed_fetch(endpoints_df: Any, fetch: Fetcher | None = None) -> Any:
    """Fan out HTTP fetches across executors.

    ``endpoints_df`` has a string column ``url``; the result appends a
    ``payload`` string column. Uses ``mapInPandas`` so each Arrow
    batch of URLs is fetched inside one Python worker call — the
    scale path when the source is thousands of endpoints rather than
    one (SURVEY.md §2.1 S1 "for many endpoints").

    The worker closure is self-contained (defaults to an inline
    urllib fetch): module-level helpers would pickle by reference to
    this package, which executors can't always import.
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        endpoints_df.schema.fields
        + [T.StructField("payload", T.StringType())]
    )

    def run(batches: Iterator[Any]) -> Iterator[Any]:
        if fetch is None:
            import urllib.request as _req

            def do_fetch(url: str) -> str:
                with _req.urlopen(url, timeout=30.0) as resp:  # noqa: S310
                    return resp.read().decode("utf-8")
        else:
            do_fetch = fetch

        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [do_fetch(u) for u in pdf["url"]]
            yield pdf

    return endpoints_df.mapInPandas(run, schema=out_schema)
