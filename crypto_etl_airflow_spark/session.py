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
