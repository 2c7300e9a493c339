"""anomaly_mad_events degeneracy: the Iglewicz–Hoaglin meanAD
fallback when a group's MAD is 0 (ADVICE r8 — previously such groups'
outliers were silently unreported via a NULL score)."""

import datetime

from crypto_etl_airflow_spark.plans.analytics import anomaly_mad_events

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    ts = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(i, ts, 1, et, v, None) for i, (et, v) in enumerate(rows)], SCHEMA
    )


def test_mad_zero_group_falls_back_to_meanad(spark, tmp_path):
    # 9 of 10 values equal the median -> MAD = 0; meanAD = 99.5.
    # fallback score for the outlier: 995 / (1.253314 * 99.5) ~ 7.98
    rows = [("deg", 5.0)] * 9 + [("deg", 1000.0)]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    got = anomaly_mad_events(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.event_type == "deg" and r.value == 1000.0
    assert abs(r.mad_zscore - 995.0 / (1.253314 * 99.5)) < 1e-3


def test_constant_group_has_no_outliers(spark, tmp_path):
    # MAD and meanAD both 0: the group is constant, score NULL,
    # nothing flagged, no division error in either branch
    rows = [("const", 7.0)] * 8 + [("spread", v) for v in (1.0, 2.0, 3.0)]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    got = anomaly_mad_events(spark, str(tmp_path)).collect()
    assert got == []


def test_normal_groups_unchanged_by_fallback(spark, tmp_path):
    # MAD > 0: the classic 0.6745*(x-med)/MAD path must be untouched.
    # values 1..9 plus 1000: med 5.5, MAD 2.5 -> z(1000) ~ 268
    rows = [("n", float(v)) for v in range(1, 10)] + [("n", 1000.0)]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    got = anomaly_mad_events(spark, str(tmp_path)).collect()
    assert [r.value for r in got] == [1000.0]
    assert abs(got[0].mad_zscore - 0.6745 * (1000.0 - 5.5) / 2.5) < 1e-2
