"""TPC-H-shaped analytical queries adapted to the testdata star schema.

The reference has no relational benchmark; these cover the canonical OLAP
shapes (conditional aggregation, filtered ratios, OR-of-ANDs predicates,
grouped HAVING-IN, priority counting) the driver's star schema implies —
each one a distinct Catalyst plan pattern, each DuckDB-oracled.
Decimal/tie-break determinism conventions per registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register
from .relational import dec, dsum


@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                   AS revenue,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: tight multi-predicate scan + global agg — the "
        "pure pushdown/codegen benchmark.",
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec("l_extendedprice") * dec("l_discount"))
        .cast("double").alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: date-sliced EXISTS semi-join + priority count.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = t.lineitem.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q12_shipmode_priority",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape: conditional counting (CASE-sum pivot) after a "
        "fact-fact join.",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint")
            .alias("low_line_count"),
        )
    )


@register(
    "q14_promo_effect",
    oracle="""
        SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                  * CAST(1 - l_discount AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                   AS promo_ratio
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-06-01'
          AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
    doc="TPC-H Q14 shape: conditional-revenue ratio with a broadcast dim "
        "join. Ratio = exact-decimal double / exact-decimal double.",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    disc = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            (
                F.sum(promo).cast("double") / F.sum(disc).cast("double")
            ).alias("promo_ratio")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                   AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 150
        )
        GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    doc="TPC-H Q18 shape: grouped-HAVING IN-subquery + 3-way join + top-k.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        t.lineitem.join(big.withColumnRenamed("l_orderkey", "big_key"),
                        F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive",
    oracle="""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                   AS revenue,
               count(*) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 40)
           OR (p_type = 'PROMO' AND l_quantity >= 45)
    """,
    doc="TPC-H Q19 shape: OR-of-ANDs predicate across both join sides "
        "(exercises CNF conversion / join-condition pushdown).",
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    joined = t.lineitem.join(
        F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 45))
    )
    return joined.filter(cond).agg(
        F.sum(dec("l_extendedprice") * dec(1 - F.col("l_discount")))
        .cast("double").alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "q7_nation_volume",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE) AS revenue
        FROM (
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4)) AS vol
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ns ON ns.n_nationkey = s_nationkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation nc ON nc.n_nationkey = c_nationkey
            WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
                OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair trade volume by year — "
        "fact-fact join with two broadcast dim chains (supplier->nation, "
        "customer->nation) and a disjunctive cross-side predicate.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ns = t.nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nc = t.nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("s_nkey") == F.col("s_nationkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("c_nkey") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec(1 - F.col("l_discount")))
            .cast("double").alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
        SELECT o_year,
               CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   ns.n_name AS supp_nation,
                   CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4)) AS vol
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ns ON ns.n_nationkey = s_nationkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation nc ON nc.n_nationkey = c_nationkey
            JOIN region   ON r_regionkey = nc.n_regionkey
            WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        )
        GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's market share of a region's PROMO-part "
        "purchases per year — conditional-sum ratio over a 7-table join "
        "(all dims broadcast, facts shuffle once on orderkey).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ns = t.nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    nc = t.nation.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"),
    )
    vol = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    national = F.when(
        F.col("supp_nation") == "NATION_5", vol
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        t.lineitem.join(
            F.broadcast(t.part.filter(F.col("p_type") == "PROMO")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("s_nkey") == F.col("s_nationkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("c_nkey") == F.col("c_nationkey"))
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("c_rkey"),
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(national).cast("double") / F.sum(vol).cast("double"))
            .alias("mkt_share")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                         * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                   AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON n_nationkey = c_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by returned-item revenue in a "
        "quarter — date-sliced fact-fact join + broadcast dims + ranked "
        "limit with unique tie-break.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(dec("l_extendedprice") * dec(1 - F.col("l_discount")))
            .cast("double").alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q13_count_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: customer order-count histogram — outer join with "
        "a join-side-only predicate, then two stacked aggregations.",
)
def q13_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t.customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                             * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR)
                        AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15 shape: supplier(s) with max quarterly revenue — grouped "
        "revenue view + scalar-max subquery. Revenue doubles come from "
        "exact decimal sums, so the equality is deterministic cross-engine.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(dec("l_extendedprice") * dec(1 - F.col("l_discount")))
            .cast("double").alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q22_idle_customers",
    oracle="""
        SELECT c_mktsegment, count(*) AS numcust,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                   AS totacctbal
        FROM customer
        WHERE c_acctbal > (
                SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR)
                            AS DOUBLE) / count(*)
                FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1997-01-01')
        GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no recent "
        "(1997+) orders, per segment — scalar-avg subquery (exact decimal "
        "sum / count, one deterministic FP division) + anti join.",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    thr = (
        t.customer.filter(F.col("c_acctbal") > 0)
        .agg(
            (dsum("c_acctbal") / F.count("*")).alias("avg_bal")
        )
    )
    return (
        t.customer.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t.orders.filter(
                F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
            ).select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )
