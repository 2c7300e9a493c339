"""CLI: run the ingest pipeline — the reference DAG as one command.

    python -m crypto_etl_airflow_spark --warehouse /data/crypto \
        [--base-url https://api.coingecko.com/api/v3] \
        [--coins bitcoin,ethereum,tether,solana] [--currency usd] \
        [--checks path/to/checks.yml] [--payload-json path.json]

One invocation = one pipeline run (the reference's hourly tick,
reference dags/crypto-etl-pipeline-psql.py:136 — scheduling stays
with cron/Airflow/K8s, not in the engine). ``--payload-json`` skips
the HTTP extract and reads the payload from a file (air-gapped runs
and tests). ``--checks`` points at a SodaCL-subset file
(quality/sodacl.py); default is the reference's rule set.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="crypto_etl_airflow_spark")
    ap.add_argument("--warehouse", required=True, help="parquet table path")
    ap.add_argument("--base-url", default=None)
    ap.add_argument("--coins", default=None, help="comma-separated ids")
    ap.add_argument("--currency", default="usd")
    ap.add_argument("--checks", default=None, help="SodaCL-subset file")
    ap.add_argument(
        "--payload-json", default=None,
        help="read the price payload from this file instead of HTTP",
    )
    ap.add_argument("--master", default=None, help="spark master override")
    args = ap.parse_args(argv)

    from .pipeline import run_ingest_pipeline
    from .quality.checks import run_scan
    from .session import get_spark
    from .sources.http import DEFAULT_BASE_URL, DEFAULT_COINS

    spark = get_spark(app_name="crypto-etl-ingest", master=args.master)

    if args.payload_json:
        # air-gapped path: payload from disk, no sensor, then the same
        # transform → upsert → gate stages as the HTTP path
        from .operators.upsert import upsert_append
        from .pipeline import UPSERT_KEYS
        from .sources.json_ingest import json_payload_to_df

        payload = open(args.payload_json).read()
        batch = json_payload_to_df(spark, payload, args.currency)
        written = upsert_append(
            spark, batch, args.warehouse, keys=UPSERT_KEYS
        )
        table = spark.read.parquet(args.warehouse)
        scan = run_scan(table, _checks(args))
        scan.enforce()
    else:
        written, scan = run_ingest_pipeline(
            spark,
            args.warehouse,
            base_url=args.base_url or DEFAULT_BASE_URL,
            coins=tuple((args.coins or ",".join(DEFAULT_COINS)).split(",")),
            currency=args.currency,
        )

    print(f"rows_written={written}")
    print(scan.log_text())
    return 0


def _checks(args):
    from .quality.checks import freshness, min_value

    if args.checks:
        from .quality.sodacl import parse_checks

        _table, checks = parse_checks(open(args.checks).read())
        return checks
    return [
        min_value("price_usd", fail_when_lt=0),
        freshness("extracted_at", warn_after="2 hours", fail_after="6 hours"),
    ]


if __name__ == "__main__":
    sys.exit(main())
