"""Salted join: result-invariance and salt spread."""

from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.skew import salted_join


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_equals_plain_join(spark):
    # hot key: 'a' carries 90% of the fact rows
    fact = spark.createDataFrame(
        [("a", i) for i in range(90)] + [("b", i) for i in range(10)],
        ["k", "v"],
    )
    dim = spark.createDataFrame([("a", "alpha"), ("b", "beta")], ["k", "name"])
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, on=["k"], k=4)
    assert _rows(salted, ["k", "v", "name"]) == _rows(plain, ["k", "v", "name"])


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.createDataFrame([("a", 1), ("c", 2)], ["k", "v"])
    dim = spark.createDataFrame([("a", "alpha")], ["k", "name"])
    got = _rows(salted_join(fact, dim, on=["k"], k=3, how="left"), ["k", "v", "name"])
    assert got == [("a", 1, "alpha"), ("c", 2, None)]


def test_salt_spreads_hot_key(spark):
    fact = spark.createDataFrame([("a", i) for i in range(200)], ["k", "v"])
    n_salts = (
        fact.withColumn("s", F.pmod(F.xxhash64("k", "v"), F.lit(8)))
        .select("s")
        .distinct()
        .count()
    )
    assert n_salts == 8  # the hot key occupies every sub-partition


def test_aqe_skew_join_split_kicks_in(spark):
    """AQE's runtime skew mitigation — the complement to manual
    salting: build a sort-merge join with one pathological key and
    thresholds lowered so local data sizes qualify, then assert the
    executed plan shows the skew-handled SMJ. At real scale the same
    mechanism splits the hot partition into task-sized chunks with no
    code change."""
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        left = spark.range(0, 40_000).select(
            (F.col("id") % 1000 == 0).cast("int").alias("k"),  # ~39k rows on k=0
            F.concat(F.lit("x" * 64), F.col("id")).alias("pad"),
        )
        right = spark.range(0, 2).select(
            F.col("id").cast("int").alias("k"), F.lit("dim").alias("name")
        )
        joined = left.join(right, "k")
        # collect() (not count()) so THIS DataFrame's queryExecution
        # runs and AQE finalizes its plan
        assert len(joined.collect()) == 40_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
