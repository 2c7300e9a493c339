"""Input-parallelism guard (operators/parallel.py): the width probe
must call few-file SMALL tables narrow (widen fires) while few-file
LARGE splittable tables read as the many tasks they really scan as
(no corpus-wide repartition — ADVICE r13)."""

import pytest

from crypto_etl_airflow_spark.operators.parallel import (
    _estimated_scan_tasks,
    _parse_bytes,
    widen_small_input,
)


@pytest.mark.parametrize(
    "text,expect",
    [
        ("134217728", 134217728),
        ("134217728b", 134217728),
        ("128MB", 128 << 20),
        ("128mb", 128 << 20),
        ("4m", 4 << 20),
        ("1k", 1024),
        ("2g", 2 << 30),
        (" 16 ", 16),
    ],
)
def test_parse_bytes(text, expect):
    assert _parse_bytes(text) == expect


@pytest.fixture
def file_confs(spark):
    """Temporarily shrink the file-source split confs so a small
    fixture file behaves like a multi-gigabyte one."""
    keys = ("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes")
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _one_file_df(spark, tmp_path, rows=2000):
    out = str(tmp_path / "one")
    spark.range(rows).coalesce(1).write.parquet(out)
    return spark.read.parquet(out)


def test_small_single_file_still_widens(spark, tmp_path):
    df = _one_file_df(spark, tmp_path)
    assert len(df.inputFiles()) == 1
    est = _estimated_scan_tasks(df, df.inputFiles())
    assert est == 1  # a few KB scans as one task
    widened = widen_small_input(df)
    assert widened is not df  # repartitioned up to the core count
    assert widened.rdd.getNumPartitions() > 1


def test_large_splittable_file_is_not_rewidened(file_confs, tmp_path):
    """The r13 len(files) proxy called this table width=1 and paid a
    full shuffle; folding sizes through the planner's split math must
    report the real task count and skip the widen."""
    spark = file_confs
    df = _one_file_df(spark, tmp_path)
    # make the planner see the one file as hundreds of splits
    spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
    spark.conf.set("spark.sql.files.openCostInBytes", "1")
    fresh = spark.read.parquet(df.inputFiles()[0].replace("file:", "")).select("id")
    est = _estimated_scan_tasks(fresh, fresh.inputFiles())
    target = spark.sparkContext.defaultParallelism
    assert est is not None and est >= target
    assert widen_small_input(fresh) is fresh  # no shuffle added
    # and the estimate agrees with what the scan actually plans
    assert fresh.rdd.getNumPartitions() >= target


def test_non_local_scheme_falls_back(spark, tmp_path):
    df = _one_file_df(spark, tmp_path)
    assert _estimated_scan_tasks(df, ["s3://bucket/part-0.parquet"]) is None
