"""Window-frame and aggregate-family extensions (SURVEY §2.6 / A4 depth).

Covers the window surface the base queries don't: value-based RANGE
frames (time-windowed running aggregates — the batch analog of the
streaming sliding window), the rank-distribution family (ntile,
percent_rank, cume_dist, nth_value), and the extended aggregate family
(count_if, bool_and/bool_or, min_by/max_by, median). All oracle-checked;
determinism via unique ORDER BY keys and exact-decimal sums throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register
from .relational import dec


@register(
    "q_window_range_frame",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
               ) AS VARCHAR) AS DOUBLE) AS weekly_spend
        FROM orders
    """,
    doc="Value-based RANGE window frame: per-customer 7-day trailing spend. "
        "Spark orders by unix_date with rangeBetween(-6, 0) — a logical "
        "frame over day values, identical to the oracle's interval RANGE "
        "because order dates are midnight-aligned. Peers share a frame, so "
        "no tie-break is needed for determinism.",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.to_date("o_orderdate")))
        .rangeBetween(-6, 0)
    )
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double")
        .alias("weekly_spend"),
    )


@register(
    "q_window_rank_family",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               ntile(4) OVER w AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume,
               nth_value(c_custkey, 2) OVER (
                   w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_richest
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="Rank-distribution window family: ntile/percent_rank/cume_dist/"
        "nth_value per market segment. The (c_acctbal, c_custkey) ORDER BY "
        "is a total order, so every rank value is deterministic; "
        "percent_rank and cume_dist are integer-ratio doubles (exact).",
)
def q_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t.customer.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("c_custkey", 2).over(wfull).alias("second_richest"),
    )


@register(
    "q_agg_extras",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag, l_orderkey, l_quantity, l_discount, l_tax,
                   l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey DESC
                   ) AS rn_max,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice ASC, l_orderkey ASC
                   ) AS rn_min
        FROM lineitem
        )
        SELECT l_returnflag,
               CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
               bool_and(l_discount <= 0.1) AS all_low_disc,
               bool_or(l_tax > 0.07) AS any_high_tax,
               max(CASE WHEN rn_max = 1 THEN l_orderkey END)
                   AS priciest_order,
               max(CASE WHEN rn_min = 1 THEN l_orderkey END)
                   AS cheapest_order,
               CAST(median(l_quantity) AS DOUBLE) AS median_qty
        FROM ranked
        GROUP BY l_returnflag
    """,
    doc="Extended aggregate family per return flag: count_if, bool_and/"
        "bool_or, max_by/min_by with a unique (l_extendedprice, l_orderkey) "
        "ordering struct (the oracle states the same pick as a row_number "
        "argmax), and median over an int column (midpoint interpolation of "
        "integers is FP-exact).",
)
def q_agg_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    by_max = F.struct(F.col("l_extendedprice"), F.col("l_orderkey"))
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
            F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_disc"),
            F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
            F.max_by("l_orderkey", by_max).alias("priciest_order"),
            F.min_by("l_orderkey", by_max).alias("cheapest_order"),
            F.median("l_quantity").cast("double").alias("median_qty"),
        )
    )


@register(
    "q_window_ignore_nulls",
    oracle="""
        SELECT event_id, user_id,
               last_value(purchase_val IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_purchase_val,
               count(purchase_val) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS purchases_so_far
        FROM (
            SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'purchase' THEN value END
                       AS purchase_val
            FROM events
        )
    """,
    doc="IGNORE NULLS window semantics (the carry-forward / last-"
        "observation pattern the as-of join builds on): last purchase "
        "value so far per user - sparse values carried over null gaps; "
        "running non-null count alongside. Unique (ts, event_id) order.",
)
def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    return t.events.select(
        "event_id",
        "user_id",
        F.last(pv, ignorenulls=True).over(w).alias("last_purchase_val"),
        F.count(pv).over(w).alias("purchases_so_far"),
    )


@register(
    "q_group_by_all",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(year(l_shipdate) AS INT) AS ship_year,
               count(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR)
                    AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ALL
    """,
    doc="Modern GROUP BY ALL (every non-aggregate select item becomes a "
        "key) - same clause text in Spark 3.4+ SQL and DuckDB.",
)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("lineitem_gba")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(year(l_shipdate) AS INT) AS ship_year,
               count(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS sum_qty
        FROM lineitem_gba
        GROUP BY ALL
    """)


@register(
    "q_concurrent_orders",
    oracle="""
        WITH iv AS (
            SELECT o_custkey, o_orderkey,
                   o_orderdate AS s,
                   o_orderdate + INTERVAL 7 DAY AS e
            FROM orders
        )
        SELECT o_custkey AS custkey,
               COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN EXISTS (
                        SELECT 1 FROM iv p
                        WHERE p.o_custkey = iv.o_custkey
                          AND (p.s < iv.s
                               OR (p.s = iv.s AND p.o_orderkey < iv.o_orderkey))
                          AND p.e > iv.s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlapping
        FROM iv GROUP BY o_custkey
    """,
    doc="Sweep-line interval overlap detection, joinless: each order "
        "opens a 7-day processing window; an order is 'overlapping' when "
        "it starts before the running maximum end of the customer's "
        "EARLIER windows (sorted by start, orderkey). One window sort "
        "per customer partition and a running max — zero joins — versus "
        "the oracle's correlated EXISTS self-join; this is the O(n log n)"
        " interval-overlap plan that replaces the O(n^2) theta join at "
        "any scale. Running max end is computed over rows 1..k-1 "
        "(exclusive frame), so the test is exactly 'intersects some "
        "earlier interval'.",
    tags=("window",),
)
def q_concurrent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    iv = t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "o_custkey",
        (F.col("s") < F.max("e").over(w)).alias("overlaps_earlier"),
    )
    return flagged.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.coalesce(F.col("overlaps_earlier"), F.lit(False)).cast("int"))
        .cast("long")
        .alias("n_overlapping"),
    )


@register(
    "q_gap_islands",
    oracle="""
        WITH seq AS (
            SELECT o_custkey, o_orderdate,
                   CASE WHEN o_orderdate
                             <= lag(o_orderdate) OVER w + INTERVAL 30 DAY
                        THEN 0 ELSE 1 END AS new_island
            FROM (SELECT DISTINCT o_custkey, o_orderdate FROM orders)
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
        ), islands AS (
            SELECT o_custkey,
                   SUM(new_island) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island_id
            FROM seq
        ), sized AS (
            SELECT o_custkey, island_id, COUNT(*) AS island_len
            FROM islands GROUP BY o_custkey, island_id
        )
        SELECT o_custkey AS custkey,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(MAX(island_len) AS BIGINT) AS longest_island
        FROM sized GROUP BY o_custkey
    """,
    doc="Gaps-and-islands: per customer, runs of order activity where "
        "consecutive (distinct) order dates are <= 30 days apart — "
        "island count and longest streak, the retention/streak analysis "
        "shape. Classic lag-then-cumulative-sum island numbering: one "
        "window sort per customer partition, then two cheap "
        "aggregations; no self-join, no recursive logic. NULL lag (the "
        "first date) starts island 1 by the CASE's ELSE arm in both "
        "engines.",
    tags=("window",),
)
def q_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    dates = t.orders.select("o_custkey", "o_orderdate").distinct()
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    seq = dates.select(
        "o_custkey",
        "o_orderdate",
        F.when(
            F.col("o_orderdate")
            <= F.lag("o_orderdate").over(w) + F.expr("INTERVAL 30 DAY"),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("new_island"),
    )
    w_cum = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = seq.select(
        "o_custkey",
        F.sum("new_island").over(w_cum).alias("island_id"),
    )
    sized = islands.groupBy("o_custkey", "island_id").agg(
        F.count("*").alias("island_len")
    )
    return sized.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").cast("long").alias("n_islands"),
        F.max("island_len").cast("long").alias("longest_island"),
    )


@register(
    "q_fifo_allocation",
    oracle="""
        WITH alloc AS (
            SELECT o.o_custkey, o.o_orderkey,
                   CAST(o.o_totalprice AS DECIMAL(18,4)) AS price,
                   CAST(c.c_acctbal AS DECIMAL(18,4)) AS budget,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) OVER (
                       PARTITION BY o.o_custkey
                       ORDER BY o.o_orderdate, o.o_orderkey
                   ) AS cum
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        )
        SELECT o_custkey, o_orderkey,
               CAST(CAST(price AS VARCHAR) AS DOUBLE) AS price,
               CASE WHEN cum <= budget THEN 'funded'
                    WHEN cum - price < budget THEN 'partial'
                    ELSE 'unfunded' END AS status,
               CAST(CAST(greatest(
                   CAST(0 AS DECIMAL(18,4)),
                   least(price, budget - (cum - price))
               ) AS VARCHAR) AS DOUBLE) AS funded_amt
        FROM alloc
    """,
    doc="FIFO budget allocation — the oldest-first matching pattern "
        "behind inventory costing, payment application, and quota "
        "spend: each customer's account balance funds their orders in "
        "orderdate order (orderkey tie-break), so an order is fully "
        "funded while the running total stays under budget, the "
        "crossing order is partially funded with the exact remainder, "
        "and everything after is unfunded. One window sum turns the "
        "sequential-sounding allocation into a single per-key scan — "
        "funded_amt = clamp(budget - prior_cum, 0, price) needs no "
        "recursion. All money math is exact DECIMAL(18,4) (window sums "
        "included) in both engines; outputs cross to double through the "
        "shortest-string hop. Scale: one hash shuffle on custkey, "
        "per-customer order counts are bounded, no global sort.",
    tags=("relational", "window"),
)
def q_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    alloc = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        )
        .select(
            "o_custkey",
            "o_orderkey",
            dec(F.col("o_totalprice")).alias("price"),
            dec(F.col("c_acctbal")).alias("budget"),
            F.sum(dec(F.col("o_totalprice"))).over(w).alias("cum"),
        )
    )
    prior = F.col("cum") - F.col("price")
    status = (
        F.when(F.col("cum") <= F.col("budget"), "funded")
        .when(prior < F.col("budget"), "partial")
        .otherwise("unfunded")
    )
    funded = F.greatest(
        F.lit(0).cast("decimal(18,4)"),
        F.least(F.col("price"), F.col("budget") - prior),
    )
    return alloc.select(
        "o_custkey",
        "o_orderkey",
        F.col("price").cast("double").alias("price"),
        status.alias("status"),
        funded.cast("double").alias("funded_amt"),
    )


@register(
    "q_weighted_median",
    oracle="""
        WITH hist AS MATERIALIZED (
            SELECT l_returnflag AS flag, l_extendedprice AS price,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
            FROM lineitem GROUP BY 1, 2
        ), cum AS (
            SELECT flag, price, w,
                   CAST(SUM(w) OVER (PARTITION BY flag ORDER BY price
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
                   CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
            FROM hist
        )
        SELECT flag AS l_returnflag,
               max(tw) AS total_weight,
               min(CASE WHEN 2 * cw >= tw THEN price END) AS median_price
        FROM cum GROUP BY flag
    """,
    doc="Quantity-weighted median extended price per return flag: the "
        "lower weighted median (smallest price whose inclusive "
        "cumulative weight reaches half the total, 2*cw >= tw exact "
        "integer cross-multiplication — no 0.5 anywhere). Engine shape "
        "is the scale-safe grouped-cumsum composition: the VALUE "
        "histogram (flag, price) -> one range-partitioned distributed "
        "running sum over the (flag, price) total order "
        "(functions/ranking.with_running_sums_dist — no single-task "
        "global sort), minus per-flag exclusive offsets computed from "
        "the FLAG-bounded totals with the windowless prefix kernel "
        "and broadcast back. The emitted median is a raw data double — "
        "no arithmetic touches it. The oracle can afford the plain "
        "partitioned window; the engine plan is the one that survives "
        "3 flags x 33 B rows.",
    tags=("windows", "stats"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import (
        ranked_rows,
        with_running_sums,
        with_running_sums_dist,
    )

    t = Tables(spark, sf_dir)
    hist = t.lineitem.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    cum = with_running_sums_dist(
        hist, [F.col("flag"), F.col("price")], ["w"], prefix="c"
    )
    flag_tot = hist.groupBy("flag").agg(
        F.sum("w").cast("bigint").alias("tw")
    )
    # flag dimension is bounded (3): windowless exclusive prefix of the
    # flag totals in (flag) order = what the global cumsum counted
    # before each flag started
    off = with_running_sums(
        flag_tot.select("flag", F.col("tw").alias("w0")),
        "flag",
        ["w0"],
        prefix="cum_",
    ).select(
        "flag", (F.col("cum_w0") - F.col("w0")).alias("off")
    )
    within = (
        cum.join(F.broadcast(flag_tot), "flag")
        .join(F.broadcast(off), "flag")
        .select(
            "flag", "price", "tw",
            (F.col("cw") - F.col("off")).alias("cw_in"),
        )
    )
    return within.groupBy("flag").agg(
        F.max("tw").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cw_in") >= F.col("tw"), F.col("price"))
        ).alias("median_price"),
    ).select(
        F.col("flag").alias("l_returnflag"), "total_weight", "median_price"
    )
