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
