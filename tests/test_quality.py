"""Quality gate: declarative checks → one agg job → outcomes.

Mirrors include/soda/checks.yml semantics: non-negative price (fail),
freshness 2h warn / 6h fail, plus engine extensions (row_count,
not_null, unique_keys)."""

import datetime as dt

import pytest

from crypto_etl_airflow_spark.quality import (
    QualityGateError,
    freshness,
    min_value,
    max_value,
    not_null,
    row_count,
    run_scan,
    unique_keys,
)

SCHEMA = "crypto_id string, price_usd double, extracted_at timestamp"
NOW = dt.datetime(2024, 1, 1, 12, 0)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _fresh_row(minutes_old, price=1.0, coin="btc"):
    return (coin, price, NOW - dt.timedelta(minutes=minutes_old))


def test_all_pass(spark):
    df = _df(spark, [_fresh_row(10), _fresh_row(20, coin="eth")])
    scan = run_scan(
        df,
        [
            min_value("price_usd", fail_when_lt=0),
            freshness("extracted_at", now=NOW),
            row_count(),
            not_null("price_usd"),
            unique_keys(["crypto_id", "extracted_at"]),
        ],
    )
    assert not scan.failed and not scan.warned
    scan.enforce()  # no raise
    assert "min_value" in scan.log_text()


def test_negative_price_fails_gate(spark):
    df = _df(spark, [_fresh_row(10, price=-0.5)])
    scan = run_scan(df, [min_value("price_usd", fail_when_lt=0)])
    assert scan.failed
    with pytest.raises(QualityGateError, match="min"):
        scan.enforce()


def test_freshness_warn_then_fail(spark):
    warn_df = _df(spark, [_fresh_row(3 * 60)])  # 3h old → warn
    scan = run_scan(warn_df, [freshness("extracted_at", now=NOW)])
    assert scan.warned and not scan.failed
    scan.enforce()  # warn does not halt the pipeline

    fail_df = _df(spark, [_fresh_row(7 * 60)])  # 7h old → fail
    scan = run_scan(fail_df, [freshness("extracted_at", now=NOW)])
    assert scan.failed


def test_duplicate_keys_fail(spark):
    df = _df(spark, [_fresh_row(10), _fresh_row(10)])
    scan = run_scan(df, [unique_keys(["crypto_id", "extracted_at"])])
    assert scan.failed
    assert "1 duplicate keys" in scan.results[0].detail


def test_null_and_max_checks(spark):
    df = _df(spark, [("btc", None, NOW), ("eth", 99.0, NOW)])
    scan = run_scan(
        df, [not_null("price_usd"), max_value("price_usd", warn_when_gt=50)]
    )
    outcomes = {r.name: r.outcome for r in scan.results}
    assert outcomes["not_null(price_usd)"] == "fail"
    assert outcomes["max_value(price_usd)"] == "warn"


def test_single_job_for_many_checks(spark):
    """All measures must land in one agg — count the collected row."""
    df = _df(spark, [_fresh_row(10)])
    checks = [
        min_value("price_usd", fail_when_lt=0),
        max_value("price_usd", fail_when_gt=1e12),
        freshness("extracted_at", now=NOW),
        row_count(),
        not_null("price_usd"),
        unique_keys(["crypto_id", "extracted_at"]),
    ]
    scan = run_scan(df, checks)
    assert len(scan.results) == len(checks)


def test_empty_table_fails_min_and_rowcount(spark):
    df = _df(spark, [])
    scan = run_scan(df, [min_value("price_usd", fail_when_lt=0), row_count()])
    assert scan.failed


def test_profile_table_counts_nulls_and_types(spark):
    from crypto_etl_airflow_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, None, None), (3, "b", 4.0)],
        "id long, name string, score double",
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "name", "score"}
    assert prof["name"].n_nulls == 1 and prof["score"].n_nulls == 1
    assert prof["id"].n_distinct == 3
    assert prof["id"].num_min == 1.0 and prof["id"].num_max == 3.0
    assert prof["name"].str_min == "a" and prof["name"].str_max == "b"
    assert prof["name"].num_min is None and prof["id"].str_min is None
    assert prof["score"].num_mean == 3.0


# ---------------------------------------------------------------------------
# curation gates (round 7): duplicate / PII / quality percent checks
# ---------------------------------------------------------------------------


def test_duplicate_percent_gate(spark):
    from crypto_etl_airflow_spark.quality.checks import (
        duplicate_percent,
        run_scan,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "ALPHA  beta"), (3, "gamma delta"),
         (4, "epsilon zeta")],
        "doc_id long, text string",
    )
    # rows 1+2 normalize identically -> 25% duplicates
    res = run_scan(df, [duplicate_percent("text", fail_when_gt=20.0)])
    assert res.failed and "25.000%" in res.results[0].detail
    res2 = run_scan(df, [duplicate_percent("text", fail_when_gt=30.0)])
    assert not res2.failed


def test_pii_percent_gate_clean_after_redaction(spark):
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.functions.pii import redact_pii
    from crypto_etl_airflow_spark.quality.checks import pii_percent, run_scan

    df = spark.createDataFrame(
        [(1, "mail me at a@b.org"), (2, "call 555-123-4567"),
         (3, "nothing here"), (4, "also clean")],
        "doc_id long, text string",
    )
    dirty = run_scan(df, [pii_percent("text", fail_when_gt=10.0)])
    assert dirty.failed and "50.000%" in dirty.results[0].detail
    clean = df.select("doc_id", redact_pii(F.col("text")).alias("text"))
    assert not run_scan(clean, [pii_percent("text", fail_when_gt=0.0)]).failed


def test_low_quality_percent_warn_level(spark):
    from crypto_etl_airflow_spark.quality.checks import (
        low_quality_percent,
        run_scan,
    )

    good = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame(
        [(1, good), (2, good), (3, "x!!"), (4, good)],
        "doc_id long, text string",
    )
    res = run_scan(
        df, [low_quality_percent("text", warn_when_gt=10.0, fail_when_gt=50.0)]
    )
    assert res.warned and not res.failed


def test_sodacl_parses_curation_gates(spark):
    from crypto_etl_airflow_spark.quality.checks import run_scan
    from crypto_etl_airflow_spark.quality.sodacl import parse_checks

    table, checks = parse_checks(
        """
checks for documents:
  - duplicate_percent(text):
      fail: when > 5
  - pii_percent(text):
      warn: when > 0
      fail: when > 10
  - low_quality_percent(text):
      warn: when > 50
"""
    )
    assert table == "documents" and len(checks) == 3
    df = spark.createDataFrame(
        [(1, "unique one two three"), (2, "other words entirely")],
        "doc_id long, text string",
    )
    res = run_scan(df, checks)
    assert not res.failed


def test_same_kind_percent_checks_do_not_collide(spark):
    # regression: two duplicate_percent checks on DIFFERENT columns in
    # one scan must each evaluate their own measures (run_scan merges
    # measure dicts by key)
    from crypto_etl_airflow_spark.quality.checks import (
        duplicate_percent,
        run_scan,
    )

    df = spark.createDataFrame(
        [(1, "same title", "body a"), (2, "same title", "body b"),
         (3, "other", "body c"), (4, "fourth", "body d")],
        "doc_id long, title string, body string",
    )
    res = run_scan(
        df,
        [duplicate_percent("title", fail_when_gt=10.0),
         duplicate_percent("body", fail_when_gt=10.0)],
    )
    by_name = {r.name: r for r in res.results}
    assert by_name["duplicate_percent(title)"].outcome == "fail"  # 25% dups
    assert by_name["duplicate_percent(body)"].outcome == "pass"  # all distinct


def test_duplicate_percent_ignores_null_text(spark):
    from crypto_etl_airflow_spark.quality.checks import (
        duplicate_percent,
        run_scan,
    )

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None), (4, "gamma")],
        "doc_id long, text string",
    )
    res = run_scan(df, [duplicate_percent("text", fail_when_gt=0.0)])
    assert not res.failed, res.log_text()  # NULL is missing, not duplicate


def test_blocked_content_percent_gate(spark):
    from crypto_etl_airflow_spark.quality.checks import (
        blocked_content_percent,
        run_scan,
    )

    df = spark.createDataFrame(
        [(1, "see https://spam.example.com/x"), (2, "buy crapcoin now"),
         (3, "clean https://ok.org/page"), (4, "also clean")],
        "doc_id long, text string",
    )
    res = run_scan(df, [blocked_content_percent("text", fail_when_gt=25.0)])
    assert res.failed and "50.000%" in res.results[0].detail
    clean = df.filter("doc_id >= 3")
    assert not run_scan(
        clean, [blocked_content_percent("text", fail_when_gt=0.0)]
    ).failed


def test_high_repetition_percent_gate(spark):
    from crypto_etl_airflow_spark.quality.checks import (
        high_repetition_percent,
        run_scan,
    )

    df = spark.createDataFrame(
        [(1, "same\nsame\nsame\nother"),  # dup_line_frac = 0.5
         (2, "a\nb\nc"), (3, "x\ny"), (4, "solo")],
        "doc_id long, text string",
    )
    res = run_scan(
        df, [high_repetition_percent("text", 0.3, fail_when_gt=20.0)]
    )
    assert res.failed and "25.000%" in res.results[0].detail
    assert not run_scan(
        df, [high_repetition_percent("text", 0.6, fail_when_gt=20.0)]
    ).failed


def test_sodacl_parses_new_curation_gates(spark):
    from crypto_etl_airflow_spark.quality.checks import run_scan
    from crypto_etl_airflow_spark.quality.sodacl import parse_checks

    doc = """checks for documents:
  - blocked_content_percent(text):
      fail: when > 0%
  - high_repetition_percent(text):
      warn: when > 10%
"""
    table, checks = parse_checks(doc)
    assert table == "documents" and len(checks) == 2
    df = spark.createDataFrame(
        [(1, "clean a\nclean b")], "doc_id long, text string"
    )
    assert not run_scan(df, checks).failed
