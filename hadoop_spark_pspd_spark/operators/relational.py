"""Relational operator surface over the TPC-H-ish star schema.

The reference has no joins/windows/set-ops (SURVEY §2.5-2.8: its two
workloads are single-input group-bys), so everything here is the engine
surface the driver contract requires, expressed with built-in DataFrame ops
so Catalyst handles pushdown, pruning, join selection and AQE.

Scale notes (100 TB discipline):
  * dimension tables (region/nation/customer/supplier/part) are broadcast —
    no shuffle of the fact table for dim enrichment;
  * fact-fact joins (orders-lineitem) are equi-joins on the natural key —
    sort-merge with AQE; at real scale both sides would be bucketed by
    orderkey to make this shuffle-free;
  * every aggregate is partial-then-final (HashAggregateExec) — map-side
    combine, the Spark analog of the reference's combiner
    (reports/fault_test_20251115-184204.job.log:158-159).

Determinism: see registry.py — DECIMAL(18,4) aggregation, double/int
ratios, unique tie-breakers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register


def dec(c: Column | str) -> Column:
    """Exact-aggregation cast (see registry.py determinism conventions)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,4)")


def dsum(c: Column | str) -> Column:
    """SUM over DECIMAL(18,4), surfaced as DOUBLE (exact cross-engine)."""
    return F.sum(dec(c)).cast("double")


# --------------------------------------------------------------------------
# Aggregation pipelines (SURVEY §2.4)
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_charge,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: filter + 8-agg groupBy.",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    # keyed-free pre-aggregation repartition (round-12, the
    # cooccurrence_directed rationale): the fact parquet arrives as 1-2
    # input splits, so the 8 decimal partial aggregates ran near-serial
    # on the scan stage (A/B at sf0.1: 1.5 -> 0.97 s warm, 4.6 -> 2.3 s
    # cold). Project to the 6 needed columns first so the exchange
    # ships no dead bytes; decimal sums are EXACT, so re-ordering rows
    # cannot drift any output. At 100 TB input splits are plentiful and
    # the exchange cost is noise next to the aggregate.
    li = li.select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax",
    ).repartition(spark.sparkContext.defaultParallelism)
    cnt = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(dec("l_extendedprice") * dec(1 - F.col("l_discount")))
        .cast("double").alias("sum_disc_price"),
        F.sum(
            dec("l_extendedprice")
            * dec((1 - F.col("l_discount")) * (1 + F.col("l_tax")))
        ).cast("double").alias("sum_charge"),
        (dsum("l_quantity") / cnt).alias("avg_qty"),
        (dsum("l_extendedprice") / cnt).alias("avg_price"),
        (dsum("l_discount") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@register(
    "q_distinct_agg",
    oracle="""
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_cust,
               count(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="count(DISTINCT) + plain aggs per group (SURVEY A4).",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


@register(
    "q_rollup_revenue",
    oracle="""
        SELECT r_name, n_name,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        GROUP BY ROLLUP(r_name, n_name)
    """,
    doc="ROLLUP hierarchy totals (SURVEY A5).",
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    joined = (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        dsum("o_totalprice").alias("revenue"),
        F.count("*").alias("n_orders"),
    )


@register(
    "q_cube_flags",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    doc="CUBE over the two lineitem flags (SURVEY A5).",
)
def q_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# Joins (SURVEY §2.5)
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3-style: broadcast dim join + fact join + grouped top-k.",
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    ords = t.orders.filter(F.col("o_orderdate") < cutoff)
    li = t.lineitem.filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * dec(1 - F.col("l_discount")))
            .cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
        SELECT n_name,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    doc="TPC-H Q5-style 6-way join, all dims broadcast.",
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ords = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        t.lineitem.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t.customer),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * dec(1 - F.col("l_discount")))
            .cast("double").alias("revenue")
        )
    )


@register(
    "q_top_customers",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_spent,
               count(*) AS n_orders
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        ORDER BY total_spent DESC, c_custkey
        LIMIT 10
    """,
    doc="Top-k by aggregate (TakeOrderedAndProject; SURVEY O2).",
    bench=True,
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(dsum("o_totalprice").alias("total_spent"), F.count("*").alias("n_orders"))
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    "q_semi_join",
    oracle="""
        SELECT n_name, count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
        GROUP BY n_name
    """,
    doc="LEFT SEMI join (EXISTS) + dim enrichment.",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(
            t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"))
    )


@register(
    "q_anti_join",
    oracle="""
        SELECT n_name, count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        GROUP BY n_name
    """,
    doc="LEFT ANTI join (NOT EXISTS) + dim enrichment.",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(
            t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"))
    )


@register(
    "q_outer_join_nulls",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_totalprice > 40000
        WHERE c.c_acctbal < 0
    """,
    doc="LEFT OUTER join with a non-key condition; null-extended rows.",
)
def q_outer_join_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    c = t.customer.filter(F.col("c_acctbal") < 0)
    o = t.orders
    return c.join(
        o,
        (c["c_custkey"] == o["o_custkey"]) & (o["o_totalprice"] > 40000),
        "left",
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


# --------------------------------------------------------------------------
# Window functions (SURVEY §2.6)
# --------------------------------------------------------------------------


@register(
    "q_topk_per_group",
    oracle="""
        SELECT * FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM customer JOIN orders ON c_custkey = o_custkey
        ) WHERE rn <= 3
    """,
    doc="Top-k per group via row_number window.",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    joined = t.orders.join(
        F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey")
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_running_total",
    oracle="""
        WITH daily AS (
            SELECT o_orderpriority,
                   CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS d
            FROM orders GROUP BY 1, 2
        )
        SELECT o_orderpriority, day,
               CAST(CAST(d AS VARCHAR) AS DOUBLE) AS day_total,
               CAST(CAST(SUM(d) OVER (
                   PARTITION BY o_orderpriority ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS VARCHAR) AS DOUBLE) AS running_total
        FROM daily
    """,
    doc="Running total per group (window SUM over exact decimal).",
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    daily = (
        t.orders.groupBy(
            "o_orderpriority",
            F.date_trunc("day", F.col("o_orderdate")).alias("day"),
        )
        .agg(F.sum(dec("o_totalprice")).alias("d"))
    )
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return daily.select(
        "o_orderpriority",
        "day",
        F.col("d").cast("double").alias("day_total"),
        F.sum("d").over(w).cast("double").alias("running_total"),
    )


@register(
    "q_lag_delta",
    oracle="""
        SELECT event_id, user_id, ts, value,
               value - lag(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS delta
        FROM events
    """,
    doc="lag() delta per user over the events stream table.",
)
def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return t.events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "q_rank_dense",
    oracle="""
        SELECT s_suppkey, s_name, s_acctbal,
               rank()       OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rnk,
               dense_rank() OVER (ORDER BY round(s_acctbal, -2) DESC) AS drnk
        FROM supplier
    """,
    doc="rank/dense_rank semantics, computed DISTRIBUTED: the total "
        "order makes rank == row_number (two-level range rank, "
        "functions/ranking.py); dense_rank over the rounded key is the "
        "rank of the key among DISTINCT rounded values (histogram-"
        "scale), broadcast-joined back — no unpartitioned window sorts "
        "the supplier dimension on one task.",
)
def q_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_global_rank

    t = Tables(spark, sf_dir)
    base = with_global_rank(
        t.supplier.select("s_suppkey", "s_name", "s_acctbal"),
        [F.desc("s_acctbal"), F.asc("s_suppkey")],
        rank_col="rnk",
    )
    vals = t.supplier.select(
        F.round(F.col("s_acctbal"), -2).alias("__rv")
    ).distinct()
    dr = with_global_rank(vals, [F.desc("__rv")], rank_col="drnk")
    return base.join(
        F.broadcast(dr),
        F.round(F.col("s_acctbal"), -2) == F.col("__rv"),
    ).select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        F.col("rnk").cast("long").alias("rnk"),
        F.col("drnk").cast("long").alias("drnk"),
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.8)
# --------------------------------------------------------------------------


@register(
    "q_set_ops",
    oracle="""
        WITH asia AS (
            SELECT c_custkey FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        ), rich AS (
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        )
        SELECT 'union' AS op, count(*) AS n
            FROM (SELECT * FROM asia UNION SELECT * FROM rich)
        UNION ALL
        SELECT 'intersect' AS op, count(*) AS n
            FROM (SELECT * FROM asia INTERSECT SELECT * FROM rich)
        UNION ALL
        SELECT 'except' AS op, count(*) AS n
            FROM (SELECT * FROM asia EXCEPT SELECT * FROM rich)
    """,
    doc="UNION / INTERSECT / EXCEPT cardinalities over two customer sets.",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    asia = (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    rich = t.customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")

    def tagged_count(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(
            F.lit(tag).alias("op"), F.col("n")
        )

    return (
        tagged_count(asia.union(rich).distinct(), "union")
        .unionAll(tagged_count(asia.intersect(rich), "intersect"))
        .unionAll(tagged_count(asia.exceptAll(rich).distinct(), "except"))
    )


# --------------------------------------------------------------------------
# Predicates / scalar functions (SURVEY §2.2, §2.9)
# --------------------------------------------------------------------------


@register(
    "q_predicates",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderstatus IN ('O', 'F')
          AND o_totalprice BETWEEN 1000 AND 5000
          AND o_orderpriority LIKE '1-%'
          AND o_custkey IS NOT NULL
    """,
    doc="IN / BETWEEN / LIKE / IS NULL predicate pushdown surface.",
)
def q_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 5000)
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "q_scalar_string",
    oracle="""
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               CAST(length(p_name) AS INTEGER) AS name_len,
               substr(p_name, 1, 5) AS name_head,
               concat(p_brand, '#', p_type) AS brand_type,
               CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_num,
               trim(lower(p_type)) AS type_lc
        FROM part
    """,
    doc="String function family (SURVEY §2.9): upper/length/substr/concat/"
        "regexp_extract/trim/lower.",
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.trim(F.lower(F.col("p_type"))).alias("type_lc"),
    )


@register(
    "q_scalar_datetime",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mon,
               CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER)
                   AS days_since
        FROM orders
    """,
    doc="Date/time function family (SURVEY §2.9): year/month/day/"
        "date_trunc/datediff.",
)
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("days_since"),
    )


@register(
    "q_json_events",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               count(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1
    """,
    doc="JSON extraction from events.props (SURVEY §2.9 JSON family).",
)
def q_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.select(
            F.get_json_object("props", "$.k").cast("int").alias("k"), "value"
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
    )


@register(
    "q_pivot_status",
    oracle="""
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Pivot order status -> columns per priority.",
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )


# --------------------------------------------------------------------------
# Events: time-bucket aggregation + sessionization (SURVEY A2/A3 batch analogs)
# --------------------------------------------------------------------------


@register(
    "q_events_hourly",
    oracle="""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
               count(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="Tumbling-window count as batch (the streaming A2 aggregation over "
        "a bounded replay).",
    bench=True,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
    )


@register(
    "q_sessionize",
    oracle="""
        WITH flagged AS (
            SELECT user_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > 1800 * 1000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(SUM(is_new) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM flagged
        GROUP BY user_id
    """,
    doc="Gap-based sessionization (30-min gap) via lag + cumulative flag.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    is_new = (
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 1800 * 1_000_000),
            1,
        )
        .otherwise(0)
    )
    return (
        t.events.select("user_id", is_new.alias("is_new"))
        .groupBy("user_id")
        .agg(
            F.sum("is_new").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "q_skew_salted_join",
    oracle="""
        SELECT s_name,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR)
                    AS DOUBLE) AS total_qty,
               count(*) AS n_items
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY s_name
    """,
    doc="Skew-resistant equi-join: the big side carries a deterministic "
        "per-row salt (xxhash64 of the row, mod 8 — no rand(), so task "
        "retries recompute identically), the small side is exploded 8x, "
        "and the join key becomes (key, salt) — spreading one hot key "
        "over 8 reducers. Results must equal the plain join, which is "
        "exactly what the oracle computes.",
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.skew import salted_join

    t = Tables(spark, sf_dir)
    big = t.lineitem.select(
        F.col("l_suppkey").alias("suppkey"), "l_quantity"
    )
    small = t.supplier.select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    return (
        salted_join(big, small, "suppkey", salt_n=8)
        .groupBy("s_name")
        .agg(
            dsum("l_quantity").alias("total_qty"),
            F.count("*").alias("n_items"),
        )
    )
