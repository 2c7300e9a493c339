"""Event-time windowed aggregations.

All three window shapes are pure DataFrame transformations that run
identically on a batch or an unbounded input — the streaming-only
ingredient is the watermark, which bounds state (how long Spark
keeps an open window waiting for late rows). The reference's 2-hour
freshness warn threshold (include/soda/checks.yml:8) is the default
lateness bound here.

Scale posture: windowed aggregation shuffles on (window, key) with
map-side partial aggregation; state lives in the executor state
store keyed by window, and the watermark is what keeps that state
finite at 100 TB/day — without it every window stays open forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LATENESS = "2 hours"


def with_event_time(df: DataFrame, ts_col: str = "ts", lateness: str = DEFAULT_LATENESS) -> DataFrame:
    """Declare the event-time column + allowed lateness (no-op on a
    batch DataFrame — Spark ignores watermarks outside streaming)."""
    return df.withWatermark(ts_col, lateness)


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """Streaming key-dedup with bounded state: a key is remembered
    until the watermark passes its event time, then its state is
    evicted — the streaming-native half of the reference's
    insert-if-absent contract (the sink-side half is the upsert
    writer in ingest.py). Uses ``dropDuplicatesWithinWatermark`` so
    state does not grow with the full key history."""
    return df.withWatermark(ts_col, lateness).dropDuplicatesWithinWatermark(keys)


def tumbling_counts(df: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Per-type event counts + value totals in fixed tumbling windows."""
    return (
        df.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_avg(
    df: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Overlapping-window event rate + mean value (each event lands
    in ``width/slide`` windows)."""
    return (
        df.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


def session_stats(df: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Per-user activity sessions: a session closes after ``gap`` of
    inactivity; its end is last-event-time + gap (Spark
    ``session_window`` semantics)."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
