"""Reference-parity query surface.

Queries that restate the reference warehouse's shape and its quality
gate as oracle-checkable plans (SURVEY.md §2.1/§2.2/§2.6). The
``crypto_prices`` table is derived by projecting ``events``
(FIXTURES.md §1): event_type → crypto_id, value → price_usd,
ts → extracted_at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

# deterministic stand-in for wall-clock now() in the freshness check
_FIXED_NOW = "2024-03-01 00:00:00"


def crypto_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference warehouse shape, derived from events."""
    return load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("crypto_id"),
        F.col("value").alias("price_usd"),
        F.col("ts").alias("extracted_at"),
    )


_CRYPTO_PRICES_SQL = """
    SELECT event_type AS crypto_id,
           value AS price_usd,
           ts AS extracted_at
    FROM events
"""


@register(
    "crypto_prices_projection",
    oracle=_CRYPTO_PRICES_SQL,
    tags=("parity", "projection"),
)
def crypto_prices_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered column projection + renames (SURVEY.md §2.2 P3/P5) —
    the reference's transform-output shape, full fidelity."""
    return crypto_prices(spark, sf_dir)


@register(
    "quality_metrics",
    oracle=f"""
    WITH cp AS ({_CRYPTO_PRICES_SQL}),
    m AS (
        SELECT round(min(price_usd), 6) AS min_price_usd,
               max(extracted_at) AS max_extracted_at,
               count(*) AS row_count,
               count(DISTINCT (crypto_id, extracted_at)) AS distinct_keys,
               date_diff('second', max(extracted_at),
                         TIMESTAMP '{_FIXED_NOW}') AS age_seconds
        FROM cp
    )
    SELECT min_price_usd, max_extracted_at, row_count, distinct_keys,
           CASE WHEN min_price_usd < 0 THEN 'fail' ELSE 'pass' END
               AS price_outcome,
           CASE WHEN age_seconds > 6*3600 THEN 'fail'
                WHEN age_seconds > 2*3600 THEN 'warn'
                ELSE 'pass' END AS freshness_outcome,
           CASE WHEN row_count = distinct_keys THEN 'pass' ELSE 'fail' END
               AS unique_outcome
    FROM m
    """,
    tags=("parity", "quality", "agg"),
)
def quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Soda-style quality scan as a single-agg query (SURVEY.md
    §2.6 Q1-Q3, §2.4 A1-A3): min threshold, freshness vs a fixed
    reference instant (wall clock is injected for determinism),
    composite-key uniqueness — one pass, outcomes as columns."""
    cp = crypto_prices(spark, sf_dir)
    m = cp.agg(
        F.round(F.min("price_usd"), 6).alias("min_price_usd"),
        F.max("extracted_at").alias("max_extracted_at"),
        F.count(F.lit(1)).alias("row_count"),
        F.count_distinct("crypto_id", "extracted_at").alias("distinct_keys"),
        (
            F.unix_timestamp(F.lit(_FIXED_NOW).cast("timestamp"))
            - F.unix_timestamp(F.max("extracted_at"))
        ).alias("age_seconds"),
    )
    return m.select(
        "min_price_usd",
        "max_extracted_at",
        "row_count",
        "distinct_keys",
        F.when(F.col("min_price_usd") < 0, "fail")
        .otherwise("pass")
        .alias("price_outcome"),
        F.when(F.col("age_seconds") > 6 * 3600, "fail")
        .when(F.col("age_seconds") > 2 * 3600, "warn")
        .otherwise("pass")
        .alias("freshness_outcome"),
        F.when(F.col("row_count") == F.col("distinct_keys"), "pass")
        .otherwise("fail")
        .alias("unique_outcome"),
    )


@register(
    "dedup_exact_rows",
    oracle=f"""
    SELECT DISTINCT * FROM (
        SELECT * FROM ({_CRYPTO_PRICES_SQL})
        UNION ALL
        SELECT * FROM ({_CRYPTO_PRICES_SQL})
    )
    """,
    tags=("parity", "dedup", "setops"),
)
def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The within-batch half of the ON CONFLICT DO NOTHING contract
    (SURVEY.md §2.1 S6): a doubled batch deduplicates back to one row
    per key. unionAll + dropDuplicates — Spark plans this as one
    hash-aggregate over the union, partial map-side combine included."""
    cp = crypto_prices(spark, sf_dir)
    return cp.unionAll(cp).dropDuplicates()


@register(
    "json_quarantine_stats",
    oracle="""
    WITH c AS (
        SELECT event_type,
               CASE WHEN event_id % 7 = 0
                    THEN substr(props, 1, length(props) - 2)
                    ELSE props END AS payload
        FROM events
    )
    SELECT event_type,
           CAST(count(*) FILTER (WHERE json_valid(payload)) AS BIGINT)
               AS n_valid,
           CAST(count(*) FILTER (WHERE NOT json_valid(payload)) AS BIGINT)
               AS n_invalid
    FROM c GROUP BY event_type
    """,
    tags=("parity", "json", "quality"),
)
def json_quarantine_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poison-payload quarantine (sources/json_ingest.py::
    split_valid_invalid): every 7th event's JSON props is truncated
    mid-object; the split must route exactly those rows to quarantine
    instead of failing the batch (the reference's raise-and-halt
    behavior, :45-46, upgraded for scale)."""
    from pyspark.sql import types as T

    from ..sources.json_ingest import split_valid_invalid

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.when(
            F.col("event_id") % 7 == 0,
            F.expr("substring(props, 1, length(props) - 2)"),
        )
        .otherwise(F.col("props"))
        .alias("payload"),
    )
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    valid, invalid = split_valid_invalid(ev, "payload", schema)
    counted = valid.groupBy("event_type").agg(
        F.count("*").alias("n_valid")
    ).join(
        invalid.groupBy("event_type").agg(F.count("*").alias("n_invalid")),
        "event_type",
        "full",
    )
    return counted.select(
        "event_type",
        F.coalesce("n_valid", F.lit(0)).alias("n_valid"),
        F.coalesce("n_invalid", F.lit(0)).alias("n_invalid"),
    )


@register(
    "profile_orders_table",
    oracle="""
    WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
    SELECT * FROM (
        SELECT 'o_orderkey' AS "column", m.n AS n_rows,
               CAST(0 AS BIGINT) AS n_nulls,
               (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS n_distinct,
               (SELECT round(CAST(min(o_orderkey) AS DOUBLE), 6) FROM orders) AS num_min,
               (SELECT round(CAST(max(o_orderkey) AS DOUBLE), 6) FROM orders) AS num_max,
               (SELECT round(avg(CAST(o_orderkey AS DOUBLE)), 6) FROM orders) AS num_mean,
               CAST(NULL AS VARCHAR) AS str_min, CAST(NULL AS VARCHAR) AS str_max
        FROM m
        UNION ALL
        SELECT 'o_totalprice', m.n, 0,
               (SELECT CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders),
               (SELECT round(CAST(min(o_totalprice) AS DOUBLE), 6) FROM orders),
               (SELECT round(CAST(max(o_totalprice) AS DOUBLE), 6) FROM orders),
               (SELECT round(avg(CAST(o_totalprice AS DOUBLE)), 6) FROM orders),
               NULL, NULL
        FROM m
        UNION ALL
        SELECT 'o_orderstatus', m.n, 0,
               (SELECT CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders),
               NULL, NULL, NULL,
               (SELECT min(o_orderstatus) FROM orders),
               (SELECT max(o_orderstatus) FROM orders)
        FROM m
        UNION ALL
        SELECT 'o_orderpriority', m.n, 0,
               (SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders),
               NULL, NULL, NULL,
               (SELECT min(o_orderpriority) FROM orders),
               (SELECT max(o_orderpriority) FROM orders)
        FROM m
    )
    """,
    tags=("parity", "quality", "profile"),
)
def profile_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile of orders (operators/profile.py):
    null counts, cardinalities, typed ranges/means — the triage
    query every ingest investigation starts with."""
    from ..operators.profile import profile_table

    orders = load_table(spark, sf_dir, "orders")
    return profile_table(
        orders,
        ["o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"],
    )
