"""as-of join edge cases: no-match NULLs, equal-timestamp matches,
multiple probes between builds."""

import datetime as dt

from crypto_etl_airflow_spark.operators.asof import asof_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_basic_forward_fill(spark):
    probe = spark.createDataFrame(
        [(1, "u", _ts(5)), (2, "u", _ts(10)), (3, "u", _ts(20))],
        "id long, k string, ts timestamp",
    )
    build = spark.createDataFrame(
        [("u", _ts(4), 40.0), ("u", _ts(10), 100.0), ("u", _ts(15), 150.0)],
        "k string, ts timestamp, v double",
    )
    out = {
        r.id: r.v_asof
        for r in asof_join(probe, build, on="ts", keys=["k"], value_cols=["v"]).collect()
    }
    assert out == {1: 40.0, 2: 100.0, 3: 150.0}  # equal ts matches (>=)


def test_asof_no_earlier_build_is_null(spark):
    probe = spark.createDataFrame([(1, "u", _ts(1))], "id long, k string, ts timestamp")
    build = spark.createDataFrame(
        [("u", _ts(9), 9.0)], "k string, ts timestamp, v double"
    )
    [row] = asof_join(probe, build, on="ts", keys=["k"], value_cols=["v"]).collect()
    assert row.v_asof is None


def test_asof_keys_do_not_leak_across_partitions(spark):
    probe = spark.createDataFrame(
        [(1, "a", _ts(10)), (2, "b", _ts(10))], "id long, k string, ts timestamp"
    )
    build = spark.createDataFrame(
        [("a", _ts(5), 5.0)], "k string, ts timestamp, v double"
    )
    out = {
        r.id: r.v_asof
        for r in asof_join(probe, build, on="ts", keys=["k"], value_cols=["v"]).collect()
    }
    assert out == {1: 5.0, 2: None}


def test_asof_multiple_value_cols(spark):
    probe = spark.createDataFrame([(1, "u", _ts(10))], "id long, k string, ts timestamp")
    build = spark.createDataFrame(
        [("u", _ts(5), 5.0, "x")], "k string, ts timestamp, v double, tag string"
    )
    [row] = asof_join(
        probe, build, on="ts", keys=["k"], value_cols=["v", "tag"]
    ).collect()
    assert (row.v_asof, row.tag_asof) == (5.0, "x")


def test_asof_tolerance_nulls_stale_matches(spark):
    import datetime as dt

    def t(minute):
        return dt.datetime(2024, 1, 1, 0, minute)

    probe = spark.createDataFrame(
        [(1, "u", t(10)), (2, "u", t(50))], ["id", "k", "ts"]
    )
    build = spark.createDataFrame([("u", t(5), 7.0)], ["k", "ts", "v"])
    out = {
        r.id: r.v_asof
        for r in asof_join(
            probe, build, on="ts", keys=["k"], value_cols=["v"],
            tolerance="10 MINUTE",
        ).collect()
    }
    # id=1: match at 00:05 is 5 min old -> kept; id=2: 45 min old -> NULL
    assert out == {1: 7.0, 2: None}


def test_asof_tied_build_timestamps_resolve_deterministically(spark):
    # two build rows at the identical (key, ts): the fill must pick a
    # pinned winner (greatest value tuple) on every run/partitioning
    probe = spark.createDataFrame(
        [(1, "u", _ts(10))], "id long, k string, ts timestamp"
    )
    build = spark.createDataFrame(
        [("u", _ts(5), 40.0), ("u", _ts(5), 70.0)],
        "k string, ts timestamp, v double",
    )
    for n_parts in (1, 7):
        out = asof_join(
            probe.repartition(n_parts),
            build.repartition(n_parts),
            on="ts",
            keys=["k"],
            value_cols=["v"],
        ).collect()
        assert [r.v_asof for r in out] == [70.0]


def test_asof_matches_pandas_merge_asof_on_random_data(spark):
    """Semantic cross-check against pandas merge_asof (backward,
    by-key, with and without tolerance) on seeded random series with
    unique (key, ts) build rows."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    base = dt.datetime(2024, 1, 1)
    for tol in (None, "30 minutes"):
        keys = ["a", "b", "c"]
        build_rows, probe_rows = [], []
        for k in keys:
            b_ts = sorted(rng.choice(10_000, size=40, replace=False).tolist())
            build_rows += [
                (k, base + dt.timedelta(seconds=int(s) * 60), float(i))
                for i, s in enumerate(b_ts)
            ]
            p_ts = rng.choice(10_000, size=60, replace=True).tolist()
            probe_rows += [
                (len(probe_rows) + j, k, base + dt.timedelta(seconds=int(s) * 60))
                for j, s in enumerate(p_ts)
            ]
        probe = spark.createDataFrame(probe_rows, "id long, k string, ts timestamp")
        build = spark.createDataFrame(build_rows, "k string, ts timestamp, v double")
        got = {
            r.id: r.v_asof
            for r in asof_join(
                probe, build, on="ts", keys=["k"], value_cols=["v"], tolerance=tol
            ).collect()
        }
        pb = pd.DataFrame(probe_rows, columns=["id", "k", "ts"]).sort_values("ts")
        bb = pd.DataFrame(build_rows, columns=["k", "ts", "v"]).sort_values("ts")
        kwargs = {}
        if tol is not None:
            kwargs["tolerance"] = pd.Timedelta(minutes=30)
        merged = pd.merge_asof(
            pb, bb, on="ts", by="k", direction="backward", **kwargs
        )
        want = {
            int(r.id): (None if pd.isna(r.v) else float(r.v))
            for r in merged.itertuples()
        }
        assert got == want, f"tolerance={tol}"
