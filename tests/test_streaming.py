"""Structured Streaming: multi-batch file source, watermark
finalization, cross-batch state, exactly-once ingest.

Batches are forced one-file-per-trigger with maxFilesPerTrigger=1 and
ordered with latestFirst=false + lexicographic file names, so the
micro-batch sequence is deterministic.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crypto_etl_airflow_spark.streaming.ingest import ingest_events_stream
from crypto_etl_airflow_spark.streaming.runner import (
    run_append_to_memory,
    run_complete_to_memory,
)
from crypto_etl_airflow_spark.streaming.stateful import user_running_stats
from crypto_etl_airflow_spark.streaming.windows import (
    session_stats,
    tumbling_counts,
    with_event_time,
)

from .conftest import SF_SMOKE

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _write_batch(spark, path: str, name: str, rows: list[tuple]) -> None:
    # one file per batch: coalesce(1) into its own subdir is not
    # file-source-visible, so write to a staging dir and register the
    # part file under a deterministic name in the watched dir
    import glob
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as staging:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = glob.glob(f"{staging}/part-*.parquet")[0]
        shutil.copy(part, f"{path}/{name}.parquet")


@pytest.fixture()
def watch_dir(tmp_path):
    d = tmp_path / "stream_src"
    d.mkdir()
    return str(d)


def _one_file_per_trigger(spark, path: str):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(path)
    )


def test_streaming_matches_batch_over_multiple_files(spark, watch_dir, tmp_path):
    """Complete-mode windowed agg over N micro-batches == batch agg."""
    batch1 = [(1, _t(1), 1, "click", 1.0), (2, _t(4), 2, "view", 2.0)]
    batch2 = [(3, _t(12), 1, "click", 3.0), (4, _t(14), 1, "error", 4.0)]
    _write_batch(spark, watch_dir, "b000", batch1)
    _write_batch(spark, watch_dir, "b001", batch2)

    sdf = _one_file_per_trigger(spark, watch_dir)
    got = run_complete_to_memory(
        tumbling_counts(sdf), checkpoint=str(tmp_path / "ck1")
    )
    want = tumbling_counts(spark.createDataFrame(batch1 + batch2, SCHEMA))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_watermark_append_mode_finalizes_closed_windows(spark, watch_dir, tmp_path):
    """Append mode emits a window only after the watermark passes its
    end; a row arriving below the late-data watermark is dropped.

    Spark's late-data filter lags eviction by one micro-batch (batch
    N filters with the watermark reported at batch N-1), so the late
    row must arrive two batches after the watermark advance to be
    dropped — hence three files.
    """
    # batch 1: window [0,10) with 2 rows; max ts 00:25 drives the
    # watermark (lateness 10 min) to 00:15 at the end of the batch
    b1 = [
        (1, _t(1), 1, "click", 1.0),
        (2, _t(4), 1, "click", 1.0),
        (3, _t(25), 1, "click", 1.0),
    ]
    # batch 2: the [0,10) window is evicted+emitted here (eviction
    # watermark 00:15 > window end 00:10)
    b2 = [(4, _t(26), 1, "click", 1.0)]
    # batch 3: a late row for the finalized [0,10) window — the
    # late-data watermark is now 00:15, so it must NOT resurrect it
    b3 = [(5, _t(5), 1, "late", 9.0), (6, _t(27), 1, "click", 1.0)]
    _write_batch(spark, watch_dir, "b000", b1)
    _write_batch(spark, watch_dir, "b001", b2)
    _write_batch(spark, watch_dir, "b002", b3)

    sdf = with_event_time(_one_file_per_trigger(spark, watch_dir), lateness="10 minutes")
    got = run_append_to_memory(
        tumbling_counts(sdf), checkpoint=str(tmp_path / "ck2")
    )
    rows = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in got.collect()
    }
    # only the [0,10) click window is finalized (the watermark never
    # passes the [20,30) window end); the late 'late' row at 00:05
    # arrived below the late-data watermark and was dropped
    assert rows == {(_t(0), "click"): (2, 2.0)}


def test_stateful_accumulates_across_batches(spark, watch_dir, tmp_path):
    """applyInPandasWithState carries per-user state batch to batch;
    the last emission per user equals the global batch aggregate."""
    b1 = [(1, _t(1), 1, "click", 1.5), (2, _t(2), 2, "view", 2.0)]
    b2 = [(3, _t(3), 1, "click", 2.5)]
    _write_batch(spark, watch_dir, "b000", b1)
    _write_batch(spark, watch_dir, "b001", b2)

    sdf = _one_file_per_trigger(spark, watch_dir)
    got = run_append_to_memory(
        user_running_stats(sdf), checkpoint=str(tmp_path / "ck3")
    )
    # user 1 appears in both batches -> two emissions, running totals
    u1 = sorted(
        [tuple(r) for r in got.filter(F.col("user_id") == 1).collect()],
        key=lambda r: r[1],
    )
    assert [(r[1], r[2]) for r in u1] == [(1, 1.5), (2, 4.0)]
    assert u1[-1][3] == _t(1) and u1[-1][4] == _t(3)
    u2 = [tuple(r) for r in got.filter(F.col("user_id") == 2).collect()]
    assert [(r[1], r[2]) for r in u2] == [(1, 2.0)]


def test_session_stats_batch_gap_semantics(spark):
    rows = [
        (1, _t(0), 1, "a", 1.0),
        (2, _t(4), 1, "a", 1.0),  # within 5-min gap: same session
        (3, _t(20), 1, "a", 1.0),  # new session
        (4, _t(0), 2, "a", 1.0),
    ]
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in session_stats(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert got == {
        (1, _t(0)): (_t(9), 2),  # end = last event 00:04 + 5 min
        (1, _t(20)): (_t(25), 1),
        (2, _t(0)): (_t(5), 1),
    }


def test_ingest_stream_idempotent_and_resumable(spark, tmp_path):
    """foreachBatch+upsert sink: fresh-checkpoint re-run rewrites
    nothing; same-checkpoint restart ingests only new files."""
    src = tmp_path / "src"
    src.mkdir()
    rows1 = [(1, _t(1), 1, "click", 1.0), (2, _t(2), 2, "view", 2.0)]
    _write_batch(spark, str(src), "events_000", rows1)

    warehouse = str(tmp_path / "wh")
    ck_a = str(tmp_path / "ck_a")
    ingest_events_stream(spark, str(src), warehouse, ck_a)
    assert spark.read.parquet(warehouse).count() == 2

    # re-run with a FRESH checkpoint: source re-reads the file, the
    # upsert writer must add nothing (ON CONFLICT DO NOTHING semantics)
    ingest_events_stream(spark, str(src), warehouse, str(tmp_path / "ck_b"))
    assert spark.read.parquet(warehouse).count() == 2

    # new file + SAME original checkpoint: only the new rows land
    rows2 = [(2, _t(2), 2, "view", 2.0), (3, _t(3), 3, "error", 3.0)]
    _write_batch(spark, str(src), "events_001", rows2)
    ingest_events_stream(spark, str(src), warehouse, ck_a)
    wh = spark.read.parquet(warehouse)
    assert wh.count() == 3
    assert wh.select("event_id").distinct().count() == 3


def test_stream_events_fixture_source_schema(spark):
    """Batch/stream parity: the file-watch source yields EXACTLY the
    batch loader's schema (fixture ``ts`` is parquet timestamp[us]
    with no UTC adjustment → TimestampNTZ in both paths)."""
    from crypto_etl_airflow_spark.sources.tables import load_table
    from crypto_etl_airflow_spark.streaming.sources import stream_events

    batch = load_table(spark, SF_SMOKE, "events")
    sdf = stream_events(spark, SF_SMOKE)
    assert sdf.isStreaming
    assert isinstance(sdf.schema["ts"].dataType, T.TimestampNTZType)
    assert sdf.schema == batch.schema
    got = run_complete_to_memory(
        sdf.groupBy().agg(F.count("*").alias("n"))
    )
    assert got.collect()[0].n == batch.count()


def test_dedup_within_watermark_bounded_state(spark, watch_dir, tmp_path):
    """dropDuplicatesWithinWatermark drops re-deliveries of a key
    while its event time is above the watermark horizon."""
    from crypto_etl_airflow_spark.streaming.windows import dedup_within_watermark

    b1 = [(1, _t(1), 1, "click", 1.0), (2, _t(2), 2, "view", 2.0)]
    # batch 2 redelivers event 1 (same key, same ts) plus a new event
    b2 = [(1, _t(1), 1, "click", 1.0), (3, _t(3), 3, "error", 3.0)]
    _write_batch(spark, watch_dir, "b000", b1)
    _write_batch(spark, watch_dir, "b001", b2)

    sdf = _one_file_per_trigger(spark, watch_dir)
    got = run_append_to_memory(
        dedup_within_watermark(sdf, ["event_id"], lateness="1 hour"),
        checkpoint=str(tmp_path / "ck_dd"),
    )
    ids = sorted(r.event_id for r in got.collect())
    assert ids == [1, 2, 3]  # the redelivered event_id=1 emitted once


def test_stream_stream_interval_join(spark, watch_dir, tmp_path):
    """The interval join runs as a watermarked stream-stream join:
    both sides stream from files; matches within the bound emit."""
    from crypto_etl_airflow_spark.streaming.joins import interval_join

    rows = [
        (1, _t(10), 1, "click", 1.0),
        (2, _t(8), 1, "error", 7.0),   # 2 min before the click: match
        (3, _t(30), 1, "error", 9.0),  # after the click: no match
        (4, _t(10), 2, "click", 1.0),  # other user: no error at all
    ]
    _write_batch(spark, watch_dir, "b000", rows)

    src = _one_file_per_trigger(spark, watch_dir).withWatermark("ts", "1 hour")
    clicks = src.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    errors = src.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("error_ts"),
        F.col("value").alias("error_value"),
    )
    joined = interval_join(
        clicks, errors, keys=["user_id"],
        left_ts="click_ts", right_ts="error_ts",
        lower="10 minutes", upper="0 seconds",
    )
    assert joined.isStreaming
    got = run_append_to_memory(joined, checkpoint=str(tmp_path / "ck_ssj"))
    rows_out = [(r.click_id, r.error_id, r.error_value) for r in got.collect()]
    assert rows_out == [(1, 2, 7.0)]


def test_streaming_gate_halts_on_pii_poisoned_batch(spark, tmp_path):
    """The curation gates compose with the streaming quality gate: a
    micro-batch carrying PII past the threshold fails the query and
    the poisoned batch is never committed to the sink."""
    import glob
    import shutil
    import tempfile

    import pytest
    from pyspark.sql import types as TT
    from pyspark.sql.utils import StreamingQueryException

    from crypto_etl_airflow_spark.quality.checks import (
        QualityGateError,
        pii_percent,
    )
    from crypto_etl_airflow_spark.streaming.quality_gate import (
        gated_batch_writer,
    )

    doc_schema = TT.StructType(
        [TT.StructField("doc_id", TT.LongType()),
         TT.StructField("text", TT.StringType())]
    )
    src = tmp_path / "docs_src"
    src.mkdir()

    def write_doc_batch(name, rows):
        with tempfile.TemporaryDirectory() as staging:
            spark.createDataFrame(rows, doc_schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(staging)
            part = glob.glob(f"{staging}/part-*.parquet")[0]
            shutil.copy(part, f"{src}/{name}.parquet")

    write_doc_batch("b000", [(1, "perfectly clean text")])
    write_doc_batch("b001", [(2, "leaked ssn 123-45-6789")])  # poison
    # the file source orders batches by modification time; force
    # distinct mtimes so the clean batch deterministically runs first
    import os
    os.utime(f"{src}/b000.parquet", (1, 1))
    os.utime(f"{src}/b001.parquet", (2, 2))

    sink = str(tmp_path / "sink")
    gated = gated_batch_writer(
        [pii_percent("text", fail_when_gt=0.0)],
        lambda df, _id: df.write.mode("append").parquet(sink),
    )
    q = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src))
        .writeStream.foreachBatch(gated)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException) as e:
        q.awaitTermination()
    assert QualityGateError.__name__ in str(e.value) or "pii_percent" in str(
        e.value
    )
    committed = spark.read.parquet(sink)
    assert [r.doc_id for r in committed.collect()] == [1]  # poison absent


def test_stateless_curation_projection_runs_on_stream(spark, tmp_path):
    """Intra-document line dedup is a pure projection, so the SAME
    operator body runs unchanged on a stream (per-microbatch, no
    state) — the shape a 100 TB ingest pipeline uses to clean
    documents on the way in. Streaming output must equal the batch
    run over the same files."""
    from crypto_etl_airflow_spark.operators.lines import line_dedup_intradoc

    src = tmp_path / "docs_src"
    src.mkdir()
    rows = [(1, "a\nb\na"), (2, "x\nX \ny"), (3, "solo")]
    doc_schema = "doc_id long, text string"
    spark.createDataFrame(rows, doc_schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))

    stream = (
        spark.readStream.schema(doc_schema).parquet(str(src))
    )
    q = (
        line_dedup_intradoc(stream, "doc_id", "text")
        .writeStream.format("memory")
        .queryName("intradoc_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_intradoc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM intradoc_stream").collect())
    )
    want = sorted(
        map(
            tuple,
            line_dedup_intradoc(
                spark.createDataFrame(rows, doc_schema), "doc_id", "text"
            ).collect(),
        )
    )
    assert got == want and len(got) == 3


def test_ingest_daemon_mode_processes_new_data_across_ticks(spark, tmp_path):
    """processing_time daemon form (the reference's @hourly scheduler
    loop without Airflow, r13): ONE long-lived query must ingest data
    arriving across ticks — no restart between batches — through the
    same idempotent sink."""
    import time as _time

    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        spark, str(src), "events_000", [(1, _t(1), 1, "click", 1.0)]
    )
    warehouse = str(tmp_path / "wh")
    query = ingest_events_stream(
        spark,
        str(src),
        warehouse,
        str(tmp_path / "ck"),
        processing_time="1 second",
    )
    try:

        def _wait_rows(n, timeout=60):
            deadline = _time.time() + timeout
            while _time.time() < deadline:
                try:
                    if spark.read.parquet(warehouse).count() >= n:
                        return True
                except Exception:
                    pass  # warehouse not created yet
                _time.sleep(0.5)
            return False

        assert _wait_rows(1), "first tick never ingested"
        # second file arrives while the daemon is live
        _write_batch(
            spark, str(src), "events_001",
            [(1, _t(1), 1, "click", 1.0), (2, _t(2), 2, "view", 2.0)],
        )
        assert _wait_rows(2), "daemon tick never picked up new file"
    finally:
        query.stop()
    wh = spark.read.parquet(warehouse)
    assert wh.count() == 2  # duplicate event_id 1 suppressed by upsert
    assert wh.select("event_id").distinct().count() == 2


def test_ingest_stream_transactional_with_concurrent_batch_writer(spark, tmp_path):
    """The txlog-backed streaming sink: exactly-once-per-key across a
    fresh-checkpoint redelivery AND a concurrent batch writer into
    the SAME transactional table — the multi-writer race the plain
    parquet sink documents away is exercised here for real."""
    from crypto_etl_airflow_spark.operators.txlog import (
        tx_append_if_absent,
        tx_read,
    )
    from crypto_etl_airflow_spark.streaming.ingest import (
        ingest_events_stream_transactional,
    )

    src = tmp_path / "src"
    src.mkdir()
    rows1 = [(1, _t(1), 1, "click", 1.0), (2, _t(2), 2, "view", 2.0)]
    _write_batch(spark, str(src), "events_000", rows1)

    table = str(tmp_path / "tx")
    ck_a = str(tmp_path / "ck_a")
    ingest_events_stream_transactional(spark, str(src), table, ck_a)
    assert tx_read(spark, table).count() == 2

    # a BATCH writer lands event 3 (and retries event 2) concurrently
    batch = spark.createDataFrame(
        [(2, _t(2), 2, "view", 2.0), (3, _t(3), 3, "error", 3.0)], SCHEMA
    )
    tx_append_if_absent(spark, batch, table, ["event_id"])

    # fresh-checkpoint redelivery of the stream writes NOTHING new
    ingest_events_stream_transactional(
        spark, str(src), table, str(tmp_path / "ck_b")
    )
    out = tx_read(spark, table)
    assert out.count() == 3
    assert out.select("event_id").distinct().count() == 3

    # new file + original checkpoint: only event 4 lands
    _write_batch(
        spark, str(src), "events_001",
        [(3, _t(3), 3, "error", 3.0), (4, _t(4), 4, "click", 4.0)],
    )
    ingest_events_stream_transactional(spark, str(src), table, ck_a)
    assert sorted(
        r["event_id"] for r in tx_read(spark, table).collect()
    ) == [1, 2, 3, 4]
