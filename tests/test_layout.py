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


# ---------------------------------------------------------------------------
# Z-order clustering
# ---------------------------------------------------------------------------


def _py_spread(x: int) -> int:
    x &= (1 << 31) - 1
    x = (x | (x << 16)) & 0x0000FFFF0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0F
    x = (x | (x << 2)) & 0x3333333333333333
    x = (x | (x << 1)) & 0x5555555555555555
    return x


def _py_z(a: int, b: int) -> int:
    return _py_spread(a) | (_py_spread(b) << 1)


def test_z_value_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.operators.layout import z_value

    pts = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (123456, 654321),
           (2**31 - 1, 2**31 - 1), (2**30, 17)]
    df = spark.createDataFrame(pts, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", z_value(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in pts:
        assert got[(a, b)] == _py_z(a, b), (a, b)


def test_z_value_orders_locally(spark):
    # the defining property: z of (1,1)-adjacent points stays within
    # the enclosing power-of-two quadrant — points in the same 2x2
    # cell are z-contiguous
    assert sorted(_py_z(a, b) for a in (0, 1) for b in (0, 1)) == [0, 1, 2, 3]
    assert sorted(_py_z(a, b) for a in (2, 3) for b in (0, 1)) == [4, 5, 6, 7]


def test_zordered_files_cluster_both_columns(spark, tmp_path):
    """After write_zordered, every parquet file covers a small
    rectangle of (a, b) space: per-file min/max spans on BOTH columns
    must be far below the full range (a range-sort on `a` alone would
    leave b spans at ~full range)."""
    import glob

    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.operators.layout import (
        write_range_partitioned,
        write_zordered,
    )

    n = 1 << 12
    side = 1 << 6  # 64x64 grid
    df = (
        spark.range(n)
        .select(
            (F.col("id") % side).alias("a"),
            F.floor(F.col("id") / side).alias("b"),
        )
        .repartition(8)  # destroy any incidental ordering
    )

    def mean_spans(path):
        spans_a, spans_b = [], []
        for f in glob.glob(f"{path}/part-*.parquet"):
            stats = spark.read.parquet(f).agg(
                F.min("a"), F.max("a"), F.min("b"), F.max("b")
            ).first()
            spans_a.append(stats[1] - stats[0])
            spans_b.append(stats[3] - stats[2])
        return sum(spans_a) / len(spans_a), sum(spans_b) / len(spans_b)

    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, "a", "b", n_files=16)
    za, zb = mean_spans(zpath)
    # 16 files over a 64x64 grid -> ideal 16x16 rectangles; allow slack
    assert za <= side / 2 and zb <= side / 2, (za, zb)

    rpath = str(tmp_path / "range_a")
    write_range_partitioned(df, rpath, ["a"], n_files=16)
    _, rb = mean_spans(rpath)
    # the one-dimensional layout cannot cluster b
    assert rb >= side * 0.9, rb
    assert zb < rb / 2


def test_z_value_masks_wide_and_negative_inputs(spark):
    """Regression: inputs outside [0, 2^31) participate with their
    low 31 bits instead of leaking sign/high bits into the interleave
    (which flipped z negative and destroyed the clustering)."""
    from pyspark.sql import functions as F

    from crypto_etl_airflow_spark.operators.layout import z_value

    df = spark.createDataFrame(
        [(-1, 0), (2**31, 5), (2**40 + 7, 2**33 + 9), (-(2**35) - 3, -2)],
        "a long, b long",
    )
    rows = df.select(
        "a", "b", z_value(F.col("a"), F.col("b")).alias("z")
    ).collect()
    mask = (1 << 31) - 1
    for r in rows:
        assert r.z == _py_z(r.a & mask, r.b & mask)
        assert r.z >= 0
