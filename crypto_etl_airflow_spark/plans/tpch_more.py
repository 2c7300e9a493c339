"""Extended TPC-H-shape query pack (adapted to the fixture columns).

Widens the oracle-checked relational surface beyond the headline
q1/q3/q5 (plans/relational.py): filtered aggregation (q6), semi-join
existence (q4), returned-item report with top-k (q10), conditional
promo share (q14), window-max top supplier (q15), having-over-join
large orders (q18), disjunctive multi-band predicates (q19), and an
explicitly salted skew join whose oracle is the plain join — salting
must be result-invariant.

The reference itself runs none of these (its read surface is
delegated to Metabase/Postgres, SURVEY.md §2.5/§3.3); they are the
capability surface a warehouse engine must answer, expressed so
Catalyst keeps everything codegen'd and broadcast-eligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..sources.tables import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter", "tpch"),
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6 shape: tight multi-predicate scan + global agg — the
    pure predicate-pushdown benchmark (every filter reaches the
    parquet scan; no shuffle but the final single-partition agg)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "agg", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: EXISTS as a left-semi join, then grouped
    count. The semi join needs only l_orderkey from the probe side —
    column pruning cuts the lineitem scan to one column."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    dated = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        dated.join(
            returned, dated.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q10_returned_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape: who returned the most revenue — 4-table join,
    grouped agg, deterministic top-20 (revenue DESC, custkey tiebreak)."""
    cust, orders, li, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(nation, nation.n_nationkey == cust.c_nationkey)
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT round(
               100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                THEN l.l_extendedprice * (1 - l.l_discount)
                                ELSE 0.0 END)
               / sum(l.l_extendedprice * (1 - l.l_discount)), 6
           ) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-06-01'
      AND l.l_shipdate < TIMESTAMP '1996-07-01'
    """,
    tags=("join", "agg", "conditional", "tpch"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: conditional-aggregate ratio over a month of
    shipments — part broadcasts, one scalar row out."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-06-01")
            & (F.col("l_shipdate") < "1996-07-01")
        )
        .join(part, part.p_partkey == li.l_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    tags=("join", "agg", "window", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape: revenue-per-supplier for a quarter, keep the
    max — the correlated scalar subquery becomes an unpartitioned
    window max (one extra exchange over the tiny grouped result, not
    a second scan of lineitem)."""
    li, sup = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    top = rev.withColumn(
        "__max", F.max("total_revenue").over(W.partitionBy())
    ).filter(F.col("total_revenue") == F.col("__max"))
    return top.join(sup, sup.s_suppkey == top.l_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 120
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("join", "agg", "having", "topk", "tpch"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: orders whose line quantities exceed a
    threshold — aggregate-then-join (the grouped HAVING result is
    tiny, so it broadcasts into orders), deterministic top-100."""
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 120)
    )
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    tags=("join", "filter", "tpch"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: disjunctive multi-band predicates spanning
    both join sides — Catalyst keeps the cross-side OR as a join
    residual while still pushing the brand/size IN-bounds to the
    part scan."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    j = li.join(part, part.p_partkey == li.l_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(band).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice), 2) AS total_price
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
    tags=("join", "skew", "scale"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-dim join executed through the explicit salting
    operator (operators/skew.py): fact rows spread over 8 salt
    sub-keys, dim replicated 8×. The oracle is the PLAIN join —
    salting must be result-invariant; what it changes is only the
    shuffle layout under a hot key."""
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    joined = salted_join(
        li.select("l_orderkey", "l_extendedprice"),
        orders.select("o_orderkey", "o_orderstatus").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        ),
        on=["l_orderkey"],
        k=8,
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    tags=("join", "agg", "tpch"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: shipping volume between a nation pair by year —
    six-table join with a symmetric pair predicate; both nation dims
    broadcast, the pair filter is a post-join residual."""
    li, orders, cust, nation, sup = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "supplier"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
        | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(n1, F.col("c_nkey") == cust.c_nationkey)
        .join(sup, sup.s_suppkey == li.l_suppkey)
        .join(n2, F.col("s_nkey") == sup.s_nationkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    WITH all_lines AS (
        SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT order_year,
           round(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                          ELSE 0.0 END) / sum(volume), 6) AS mkt_share
    FROM all_lines GROUP BY order_year
    """,
    tags=("join", "agg", "conditional", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: one supplier nation's share of a region's PROMO
    volume per year — eight-table star join, conditional-sum ratio."""
    li, part, orders, cust, nation, region, sup = _t(
        spark, sf_dir,
        "lineitem", "part", "orders", "customer", "nation", "region", "supplier",
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    lines = (
        li.join(part.filter(F.col("p_type") == "PROMO"),
                F.col("p_partkey") == li.l_partkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(n1, F.col("c_nkey") == cust.c_nationkey)
        .join(region.filter(F.col("r_name") == "ASIA"),
              F.col("r_regionkey") == F.col("c_rkey"))
        .join(sup, sup.s_suppkey == li.l_suppkey)
        .join(n2, F.col("s_nkey") == sup.s_nationkey)
        .select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return lines.groupBy("order_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(
                    0.0
                )
            )
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )
