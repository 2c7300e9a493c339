"""Range-partitioned sorted layout: files must carry disjoint,
tight min/max stats on the clustering column — the enabler for
row-group skipping — and reads must stay exactly correct."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.layout import write_range_partitioned
from crypto_etl_airflow_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _file_ranges(path, col):
    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    return sorted(ranges)


def test_files_have_disjoint_sorted_ranges(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "ev_sorted")
    write_range_partitioned(events, path, ["ts"], n_files=8)

    ranges = _file_ranges(path, "ts")
    assert len(ranges) >= 2  # the range shuffle actually split
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, f"overlapping file ranges: {ranges}"

    # unclustered baseline: a plain write leaves (nearly) every file
    # spanning most of the ts range — nothing could skip
    base = str(tmp_path / "ev_plain")
    events.repartition(8).write.parquet(base)
    plain = _file_ranges(base, "ts")
    total_lo = min(lo for lo, _ in plain)
    total_hi = max(hi for _, hi in plain)
    total = (total_hi - total_lo).total_seconds() or 1.0
    wide = sum(
        1
        for lo, hi in plain
        if (hi - lo).total_seconds() / total >= 0.9
    )
    assert wide >= len(plain) // 2, plain  # hash layout: wide files
    # while every clustered file is narrow
    narrow = sum(
        1
        for lo, hi in ranges
        if (hi - lo).total_seconds() / total <= 0.5
    )
    assert narrow == len(ranges), ranges


def test_range_layout_preserves_rows_exactly(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "ev_sorted")
    write_range_partitioned(events, path, ["ts"], n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == events.count()
    # a time-range predicate returns the identical row set
    mn, mx = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    lo = mn + (mx - mn) * 0.25
    hi = mn + (mx - mn) * 0.75
    pred = F.expr(f"ts >= TIMESTAMP_NTZ'{lo}' AND ts < TIMESTAMP_NTZ'{hi}'")
    want = sorted(r.event_id for r in events.filter(pred).collect())
    got = sorted(r.event_id for r in back.filter(pred).collect())
    assert got == want and want


def test_compact_with_range_cols_clusters_files(spark, tmp_path):
    """compact(range_cols=...) both merges small files AND imposes
    the sorted range layout — per-file ts ranges come out disjoint."""
    from crypto_etl_airflow_spark.operators.compact import compact

    events = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "ev")
    events.repartition(16).write.parquet(path)  # 16 small unsorted files
    n_before = events.count()
    # tiny target → a few output files, clustered on ts
    n_files = compact(spark, path, target_file_bytes=8 * 1024, range_cols=["ts"])
    assert n_files >= 2
    ranges = _file_ranges(path, "ts")
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, ranges
    assert spark.read.parquet(path).count() == n_before
