"""SparkSession factory.

One place to set the execution posture for the whole engine:

- **AQE on** (runtime re-planning, partition coalescing, skew-join
  splitting) so join strategy and shuffle sizing adapt to real data
  sizes rather than estimates — essential at 100 TB where static plans
  mis-size.
- **UTC session timezone** — the reference stamps naive local wall
  clock (reference dags/crypto-etl-pipeline-psql.py:56) while its
  README claims UTC; we standardize on UTC and document the deviation.
- **Arrow enabled** for any pandas interchange (Pandas UDFs, toPandas).
- **shuffle.partitions** sized from the env; at cluster scale this is a
  deploy-time config (partitions ≈ 2-3× total cores), never code.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: Input bytes per shuffle partition for the size-aware heuristic
#: below. Deliberately SMALL relative to the classic 128 MB-per-
#: partition rule because it counts COMPRESSED parquet input, and the
#: engine's heavy operators (shingle/token explodes) expand that
#: ~20–50× into shuffle rows; and because with AQE partition
#: coalescing ON, ``spark.sql.shuffle.partitions`` is effectively an
#: UPPER bound — over-provisioning costs a cheap runtime coalesce,
#: under-provisioning costs the measured fixed-partition sort term
#: (SCALE.md r9: the 1000× ngram decade ran ×15.1 at 32 partitions
#: vs ×8.5 at 128 — this heuristic picks ~150 there).
PARTITION_INPUT_BYTES = 4 * 1024 * 1024
MAX_SHUFFLE_PARTITIONS = 65536


def shuffle_partitions_for_bytes(
    n_bytes: int, cpus: int | None = None
) -> int:
    """Size-aware shuffle-partition count: one partition per
    ~``PARTITION_INPUT_BYTES`` of compressed input, floored at the
    core count (never idle a core) and capped to bound scheduler
    overhead. On a real cluster the same formula runs with the
    cluster's total core count — partitions scale with BOTH the data
    and the machine, which is what the fixed-resource scale harness
    exists to emulate."""
    cpus = cpus or DEFAULT_SHUFFLE_PARTITIONS
    return max(cpus, min(MAX_SHUFFLE_PARTITIONS, n_bytes // PARTITION_INPUT_BYTES))


def input_dir_bytes(*paths: str) -> int:
    """Total on-disk bytes of the given table dirs/files."""
    total = 0
    for p in paths:
        if os.path.isfile(p):
            total += os.path.getsize(p)
            continue
        for root, _dirs, files in os.walk(p):
            total += sum(
                os.path.getsize(os.path.join(root, f)) for f in files
            )
    return total


def tune_shuffle_partitions(spark: SparkSession, *paths: str) -> int:
    """Set ``spark.sql.shuffle.partitions`` from the actual input size
    (a runtime-settable session conf — it takes effect for every plan
    compiled afterwards) and return the chosen count. The harnesses
    call this per input directory, so the measured partition-scaling
    fix is default engine behavior, not a manual config footnote."""
    n = shuffle_partitions_for_bytes(input_dir_bytes(*paths))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n


def get_spark(
    app_name: str = "crypto_etl_airflow_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local runs default to ``local[$SPARK_GRAFT_CPUS]``; on a real
    cluster the master comes from spark-submit and this factory only
    contributes the SQL posture.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
