"""Local stand-in for the driver's DuckDB correctness harness.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet fixtures and compares row count, column names and values
(order-insensitive, columns sorted by name — mirroring the driver's
described compare). Comparison is EXACT: if a query only matches with
float tolerance, the query itself must be adjusted (round in both
forms) because the driver hashes values.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from crypto_etl_airflow_spark.sources.tables import TABLES


def duckdb_rows(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return cols, cur.fetchall()
    finally:
        con.close()


def _canon(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical text form: repr of the double, so -0.0 != 0.0 is visible
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v


def _sorted_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "?") -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_rows(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    ss = _sorted_rows(s_cols, s_rows)
    dd = _sorted_rows(d_cols, d_rows)
    if ss != dd:
        diffs = [(a, b) for a, b in zip(ss, dd) if a != b][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs duckdb):\n"
            + "\n".join(f"  {a}\n  {b}" for a, b in diffs)
        )
