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


# ---------------------------------------------------------------------------
# round 2: the remaining TPC-H shapes (q2, q9, q11, q12, q13, q16, q17,
# q20, q21, q22), adapted to the fixture columns — the fixtures carry no
# partsupp/commitdate/receiptdate/container/phone, so lineitem plays the
# part-supplier relation, p_retailprice the cost, and "late" means
# shipped > N days after the order date. The OPERATOR essence of each
# shape (correlated scalar subqueries, exists/not-exists pairs,
# min-per-group equi-match, double aggregation, anti-join + global
# scalar) is preserved.
# ---------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
    WITH co AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority != '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM co GROUP BY c_count
    """,
    tags=("join", "agg", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape: order-count histogram over customers — LEFT
    join with an ON-clause filter (customers with zero qualifying
    orders still count at 0), then aggregation OF an aggregation."""
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    filtered = orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(filtered, filtered.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q22_dormant_rich_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT round(avg(c_acctbal), 6) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    """,
    tags=("join", "anti", "scalar-subquery", "tpch"),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: above-average-balance customers with no order
    since 2000 (lapsed), per nation — global scalar subquery (broadcast) + anti
    join + grouped agg. The average is rounded to 6 decimals in both
    engines so the > comparison can't flip on summation order."""
    cust, orders, nation = _t(spark, sf_dir, "customer", "orders", "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("ab")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    recent = orders.filter(F.col("o_orderdate") >= "2000-01-01")
    dormant = rich.join(
        recent, recent.o_custkey == rich.c_custkey, "left_anti"
    )
    return (
        dormant.join(nation, nation.n_nationkey == dormant.c_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey, avg(l_quantity) AS aq FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.2 * pa.aq
    """,
    tags=("join", "scalar-subquery", "agg", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape: revenue lost to small orders — the correlated
    per-part average becomes one grouped agg joined back (quantities
    are integral, so the 0.2·avg threshold is the same double in any
    engine)."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    pa = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        F.avg("l_quantity").alias("aq")
    )
    brand = part.filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    return (
        li.join(brand, brand.p_partkey == li.l_partkey)
        .join(pa, F.col("pa_key") == li.l_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_returnflag
    """,
    tags=("join", "conditional", "agg", "tpch"),
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape (shipmode → returnflag): late shipments (>60
    days after order) classified by order priority — join with a
    cross-table date predicate + conditional counts."""
    li, orders = _t(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_cnt_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand != 'Brand#1' AND p.p_type != 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
    tags=("join", "anti", "distinct", "tpch"),
)
def q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: how many suppliers can furnish each part
    class — lineitem plays partsupp; the complaint exclusion becomes
    an anti join against negative-balance suppliers; grouped COUNT
    DISTINCT."""
    li, part, sup = _t(spark, sf_dir, "lineitem", "part", "supplier")
    parts = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    bad = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(parts, parts.p_partkey == li.l_partkey)
        .join(bad, bad.s_suppkey == li.l_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH nat_lines AS (
        SELECT l.l_partkey, l.l_extendedprice * (1 - l.l_discount) AS val
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
    ),
    tot AS (SELECT sum(val) AS tv FROM nat_lines)
    SELECT l_partkey, round(sum(val), 2) AS value
    FROM nat_lines CROSS JOIN tot
    GROUP BY l_partkey, tv
    HAVING round(sum(val), 2) > round(0.002 * tv, 2)
    """,
    tags=("join", "scalar-subquery", "having", "tpch"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: parts carrying an outsized share of one
    nation's supplied value (share > 0.2%) — per-part sums HAVING-compared against a
    global-total scalar subquery (both sides rounded to 2 decimals in
    both engines so the threshold can't flip on summation order)."""
    li, sup, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    nat = nation.filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    lines = (
        li.join(sup, sup.s_suppkey == li.l_suppkey)
        .join(nat, F.col("n_nationkey") == sup.s_nationkey)
        .select("l_partkey", val.alias("val"))
    )
    tot = lines.agg(F.sum("val").alias("tv"))
    return (
        lines.groupBy("l_partkey")
        .agg(F.round(F.sum("val"), 2).alias("value"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("value") > F.round(0.002 * F.col("tv"), 2))
        .select("l_partkey", "value")
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS INT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    tags=("join", "agg", "tpch"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: profit per supplier nation per year over a
    part-name filter — p_retailprice·quantity stands in for the
    missing partsupp supplycost."""
    li, part, sup, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    red = part.filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(red, red.p_partkey == li.l_partkey)
        .join(sup, sup.s_suppkey == li.l_suppkey)
        .join(nation, nation.n_nationkey == sup.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@register(
    "q2_cheapest_supplier",
    oracle="""
    WITH cost AS (
        SELECT l.l_partkey, l.l_suppkey,
               round(avg(l.l_extendedprice / l.l_quantity), 6) AS unit_cost
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY 1, 2
    ),
    min_cost AS (SELECT l_partkey, min(unit_cost) AS mc FROM cost GROUP BY l_partkey)
    SELECT p.p_partkey, p.p_brand, s.s_name,
           round(s.s_acctbal, 2) AS s_acctbal, c.unit_cost
    FROM cost c
    JOIN min_cost m ON m.l_partkey = c.l_partkey AND c.unit_cost = m.mc
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    WHERE p.p_size = 10
    """,
    tags=("join", "min-per-group", "tpch"),
)
def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: for every size-10 part, the ASIA supplier
    offering the lowest observed unit price — min-per-group then
    equi-match back (ties keep every minimal supplier, so no
    arbitrary row_number pick); lineitem unit prices stand in for
    partsupp supplycost, rounded to 6 decimals in both engines so the
    min-equality join is exact."""
    li, sup, nation, region, part = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "region", "part"
    )
    asia = (
        nation.join(
            region.filter(F.col("r_name") == "ASIA"),
            region.r_regionkey == nation.n_regionkey,
        ).select("n_nationkey")
    )
    cost = (
        li.join(sup, sup.s_suppkey == li.l_suppkey)
        .join(asia, F.col("n_nationkey") == sup.s_nationkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 6
            ).alias("unit_cost")
        )
    )
    mc = cost.groupBy(F.col("l_partkey").alias("mc_key")).agg(
        F.min("unit_cost").alias("mc")
    )
    return (
        cost.join(
            mc,
            (F.col("mc_key") == cost.l_partkey)
            & (F.col("unit_cost") == F.col("mc")),
        )
        .join(
            part.filter(F.col("p_size") == 10),
            part.p_partkey == cost.l_partkey,
        )
        .join(sup, sup.s_suppkey == cost.l_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "unit_cost",
        )
    )


@register(
    "q20_majority_suppliers",
    oracle="""
    WITH red_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    tot AS (
        SELECT l_partkey, sum(l_quantity) AS tq
        FROM lineitem JOIN red_parts ON p_partkey = l_partkey
        GROUP BY l_partkey
    ),
    per_supp AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
        FROM lineitem JOIN red_parts ON p_partkey = l_partkey
        GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_name, n.n_name
    FROM per_supp ps
    JOIN tot t ON t.l_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE ps.sq > 0.15 * t.tq
    """,
    tags=("join", "semi", "tpch"),
)
def q20_majority_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: suppliers who shipped an outsized share
    (>15%) of some
    red part's total volume — nested per-part / per-(part,supplier)
    sums compared (integral quantities: sums are exact in any
    engine), distinct supplier roster out."""
    li, part, sup, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    red_li = li.join(red, red.p_partkey == li.l_partkey).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    tot = red_li.groupBy(F.col("l_partkey").alias("t_key")).agg(
        F.sum("l_quantity").alias("tq")
    )
    per_supp = red_li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("sq")
    )
    majority = per_supp.join(tot, F.col("t_key") == per_supp.l_partkey).filter(
        F.col("sq") > 0.15 * F.col("tq")
    )
    return (
        majority.join(sup, sup.s_suppkey == majority.l_suppkey)
        .join(nation, nation.n_nationkey == sup.s_nationkey)
        .select("s_name", "n_name")
        .distinct()
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
    WITH l1 AS (
        SELECT l.l_orderkey, l.l_suppkey,
               max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END) AS late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM l1 me
    JOIN supplier s ON s.s_suppkey = me.l_suppkey
    WHERE me.late = 1
      AND EXISTS (SELECT 1 FROM l1 o2
                  WHERE o2.l_orderkey = me.l_orderkey
                    AND o2.l_suppkey != me.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 o3
                      WHERE o3.l_orderkey = me.l_orderkey
                        AND o3.l_suppkey != me.l_suppkey
                        AND o3.late = 1)
    GROUP BY s.s_name
    """,
    tags=("join", "semi", "anti", "tpch"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape: suppliers who ALONE shipped late (>90 days
    after order) on multi-supplier orders — the classic EXISTS +
    NOT-EXISTS pair over the same relation, as a left-semi then a
    left-anti join with non-equi supplier predicates."""
    li, orders, sup = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    late_flag = F.max(
        F.when(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            1,
        ).otherwise(0)
    )
    l1 = (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(late_flag.alias("late"))
    )
    me = l1.filter(F.col("late") == 1)
    others = l1.select(
        F.col("l_orderkey").alias("o_key"),
        F.col("l_suppkey").alias("o_supp"),
        F.col("late").alias("o_late"),
    )
    has_other = me.join(
        others,
        (F.col("o_key") == me.l_orderkey) & (F.col("o_supp") != me.l_suppkey),
        "left_semi",
    )
    sole_late = has_other.join(
        others.filter(F.col("o_late") == 1),
        (F.col("o_key") == has_other.l_orderkey)
        & (F.col("o_supp") != has_other.l_suppkey),
        "left_anti",
    )
    return (
        sole_late.join(sup, sup.s_suppkey == sole_late.l_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
