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
