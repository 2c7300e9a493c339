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


def test_reuse_level_is_part_of_the_posture(spark):
    from crypto_etl_airflow_spark.session import REUSE_LEVEL_CONF

    # small local input: disk-backed persist (cache-assist regime)
    p = tune_execution(spark, "/root/testdata/sf0.001")
    assert p["reuse_level"] == "MEMORY_AND_DISK"
    assert spark.conf.get(REUSE_LEVEL_CONF) == "MEMORY_AND_DISK"
    # unknown scale: never spill — a 100 TB remote input must not
    # round-trip its intermediates through one node's disk
    p = tune_execution(spark, "/nonexistent/remote/table.parquet")
    assert p["reuse_level"] == "MEMORY_ONLY"
    assert spark.conf.get(REUSE_LEVEL_CONF) == "MEMORY_ONLY"
    spark.conf.set(REUSE_LEVEL_CONF, "MEMORY_AND_DISK")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")


def test_reuse_respects_posture_level(spark):
    from pyspark import StorageLevel

    from crypto_etl_airflow_spark.operators.dedup import (
        _reuse,
        release_reuse_caches,
    )
    from crypto_etl_airflow_spark.session import REUSE_LEVEL_CONF

    df = spark.range(10)
    try:
        spark.conf.set(REUSE_LEVEL_CONF, "MEMORY_ONLY")
        assert _reuse(df).storageLevel == StorageLevel.MEMORY_ONLY
        release_reuse_caches()
        spark.conf.set(REUSE_LEVEL_CONF, "MEMORY_AND_DISK")
        assert (
            _reuse(spark.range(11)).storageLevel
            == StorageLevel.MEMORY_AND_DISK
        )
        # an unrecognized name falls back to the disk-backed default
        spark.conf.set(REUSE_LEVEL_CONF, "NO_SUCH_LEVEL")
        assert (
            _reuse(spark.range(12)).storageLevel
            == StorageLevel.MEMORY_AND_DISK
        )
    finally:
        release_reuse_caches()
        spark.conf.set(REUSE_LEVEL_CONF, "MEMORY_AND_DISK")
