"""Incremental rollup: N batch refreshes == one full recompute."""

from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.rollup import (
    hourly_partial,
    refresh_hourly_rollup,
)
from crypto_etl_airflow_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _canon(df):
    return sorted(
        (str(r.bucket), r.entity, r.n_events, round(r.total_value, 6),
         round(r.min_value, 6), round(r.max_value, 6))
        for r in df.collect()
    )


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "rollup")

    # split the table into 3 disjoint batches on event_id % 3 — each
    # refresh folds one batch in; buckets overlap across batches
    for i in range(3):
        refresh_hourly_rollup(spark, ev.filter(F.col("event_id") % 3 == i), path)

    got = spark.read.parquet(path)
    want = hourly_partial(ev)
    assert _canon(got) == _canon(want)


def test_first_refresh_creates_table(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").limit(100)
    path = str(tmp_path / "rollup_new")
    out = refresh_hourly_rollup(spark, ev, path)
    assert out.count() > 0
    assert set(out.columns) == {
        "bucket", "entity", "n_events", "total_value", "min_value", "max_value"
    }


def test_streaming_feeds_rollup(spark, tmp_path):
    """Composition: the streaming foreachBatch sink folds each
    micro-batch into the continuous aggregate — after draining, the
    rollup equals the one computed from the full table."""
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.streaming.sources import stream_events

    path = str(tmp_path / "stream_rollup")

    sdf = stream_events(spark, SF_SMOKE)

    def fold(batch_df, batch_id):
        refresh_hourly_rollup(spark, batch_df, path)

    q = (
        sdf.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(path)
    want = hourly_partial(load_table(spark, SF_SMOKE, "events"))
    assert _canon(got) == _canon(want)
