"""Size-aware execution posture (session.py): proportional partitions
+ AQE off only for PROVABLY tiny inputs; unknown scale (stat = 0 —
remote FS URIs, unreadable paths) must get the classic 100 TB-safe
posture (ADVICE r16)."""

from crypto_etl_airflow_spark.session import (
    PARTITION_INPUT_BYTES,
    SMALL_INPUT_BYTES,
    shuffle_partitions_for_bytes,
    tune_execution,
)


def test_tiny_input_proportional():
    assert shuffle_partitions_for_bytes(PARTITION_INPUT_BYTES, cpus=32) == 1
    assert (
        shuffle_partitions_for_bytes(8 * PARTITION_INPUT_BYTES, cpus=32) == 8
    )


def test_big_input_core_floored():
    assert shuffle_partitions_for_bytes(SMALL_INPUT_BYTES, cpus=32) >= 32
    assert shuffle_partitions_for_bytes(1 << 40, cpus=32) > 32


def test_zero_bytes_means_unknown_not_tiny():
    # a 100 TB s3:// input stats as 0 locally — it must never run
    # single-partition
    assert shuffle_partitions_for_bytes(0, cpus=32) == 32


def test_tune_execution_unknown_input_keeps_aqe_on(spark):
    posture = tune_execution(spark, "/nonexistent/remote/table.parquet")
    assert posture["input_bytes"] == 0
    assert posture["adaptive"] is True
    assert posture["shuffle_partitions"] >= 1
    # restore defaults for the shared session
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")


def test_tune_execution_small_local_input(spark):
    posture = tune_execution(spark, "/root/testdata/sf0.001")
    assert 0 < posture["input_bytes"] < SMALL_INPUT_BYTES
    assert posture["adaptive"] is False
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
