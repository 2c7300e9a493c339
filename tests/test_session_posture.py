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


def test_apply_query_posture_classic_and_restore(spark):
    """The per-query posture override lives in the ENGINE (VERDICT
    r16 item 4): classic floors partitions at the core count with AQE
    on; auto restores the tune_execution baseline."""
    from crypto_etl_airflow_spark.session import apply_query_posture

    try:
        # tiny baseline: proportional partitions, AQE off
        p = tune_execution(spark, "/root/testdata/sf0.001")
        assert p["adaptive"] is False
        cores = spark.sparkContext.defaultParallelism
        apply_query_posture(spark, "classic")
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) >= cores
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        # auto restores the recorded baseline, not the classic leak
        apply_query_posture(spark, "auto")
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == (
            p["shuffle_partitions"]
        )
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def test_apply_query_posture_snapshots_vanilla_session(spark):
    """On a session that never ran tune_execution (the external
    driver's), the first override snapshots the session's own posture
    so a classic query cannot leak into the next auto query."""
    from crypto_etl_airflow_spark.session import (
        POSTURE_BASE_AQE_CONF,
        POSTURE_BASE_PARTS_CONF,
        apply_query_posture,
    )

    try:
        spark.conf.unset(POSTURE_BASE_PARTS_CONF)
        spark.conf.unset(POSTURE_BASE_AQE_CONF)
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        apply_query_posture(spark, "classic")
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) >= (
            spark.sparkContext.defaultParallelism
        )
        apply_query_posture(spark, "auto")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    finally:
        spark.conf.unset(POSTURE_BASE_PARTS_CONF)
        spark.conf.unset(POSTURE_BASE_AQE_CONF)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def test_query_map_applies_spec_posture(spark):
    """The driver contract's query_map must apply the spec posture —
    the hybrid-RRF classic win is engine behavior, not a bench.py
    side effect (VERDICT r16 item 4)."""
    from crypto_etl_airflow_spark.plans.registry import (
        all_specs,
        query_map,
    )
    from crypto_etl_airflow_spark.session import (
        POSTURE_BASE_AQE_CONF,
        POSTURE_BASE_PARTS_CONF,
    )

    specs = all_specs()
    classic = [n for n, s in specs.items() if s.posture == "classic"]
    assert "similarity_hybrid_rrf_topk" in classic
    qm = query_map()
    try:
        spark.conf.unset(POSTURE_BASE_PARTS_CONF)
        spark.conf.unset(POSTURE_BASE_AQE_CONF)
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        qm["similarity_hybrid_rrf_topk"](spark, "/root/testdata/sf0.001")
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) >= (
            spark.sparkContext.defaultParallelism
        )
        # the next auto query restores the snapshot
        qm["hourly_variation"](spark, "/root/testdata/sf0.001")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    finally:
        spark.conf.unset(POSTURE_BASE_PARTS_CONF)
        spark.conf.unset(POSTURE_BASE_AQE_CONF)
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
