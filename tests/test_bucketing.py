"""Bucketed co-located join: the plan must contain no shuffle.

Writes lineitem and orders bucketed on the join key into the test
warehouse (a tempdir, see conftest), joins them, and checks (a) the
physical plan has no Exchange and (b) the result equals the plain
parquet join.
"""

from pyspark.sql import functions as F

from crypto_etl_airflow_spark.operators.bucketing import write_bucketed
from crypto_etl_airflow_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_bucketed_join_is_exchange_free(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    write_bucketed(li, "li_b", ["l_orderkey"], num_buckets=4, sort_by=["l_orderkey"])
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "orders_b",
        ["l_orderkey"],
        num_buckets=4,
        sort_by=["l_orderkey"],
    )

    # force sort-merge: at fixture scale the planner would broadcast
    # the small side instead (broadcast is cheaper there and needs no
    # bucketing); the 100 TB case this test models is fact-fact SMJ
    joined = spark.table("li_b").join(
        spark.table("orders_b").hint("merge"), "l_orderkey"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    assert "SortMergeJoin" in plan

    got = joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s")
    )
    want = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_groupby_avoids_shuffle(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "li_b2", ["l_orderkey"], num_buckets=4)
    agg = (
        spark.table("li_b2")
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
    assert agg.count() == li.select("l_orderkey").distinct().count()
