"""TPC-H shape analogs, part 2: the seven shapes the testdata schema forces
us to adapt (no ``partsupp`` table; ``lineitem`` lacks commit/receipt dates).

Each query keeps the *plan shape* of its TPC-H namesake — correlated min
subquery (Q2), multi-dim profit rollup (Q9), grouped-HAVING-vs-global-scalar
(Q11), distinct-count with NOT-IN exclusion (Q16), correlated-avg threshold
(Q17), nested IN over a grouped HAVING (Q20), EXISTS/NOT-EXISTS self-joins
(Q21) — substituting the distinct (part, supplier) pairs observed in
``lineitem`` for ``partsupp`` and ``o_orderdate + 60 days`` lateness for the
missing receipt/commit comparison.

The reference has no relational benchmark at all (SURVEY §2.5: no joins
anywhere in lipeaaraujo/hadoop-spark-pspd — cluster/tools/run_fault_tests.py
is a single-input group-by); this whole family is driver-contract surface.
Determinism conventions per registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register
from .relational import dec, dsum


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH asia_supply AS (
            SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN region   ON r_regionkey = n_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY l_partkey, l_suppkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               cost AS min_cost
        FROM part
        JOIN asia_supply ON l_partkey = p_partkey
        JOIN supplier    ON s_suppkey = l_suppkey
        JOIN nation      ON n_nationkey = s_nationkey
        WHERE p_size BETWEEN 10 AND 20 AND p_type = 'SMALL'
          AND cost = (SELECT MIN(cost) FROM asia_supply a2
                      WHERE a2.l_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2 shape: cheapest regional supplier per part via a "
        "correlated MIN subquery. Supply relation = distinct (part, "
        "supplier) pairs in lineitem with MIN(l_extendedprice) as the "
        "cost (exact double, no arithmetic, so cross-engine equality "
        "is deterministic).",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    asia_supp = (
        t.supplier.join(
            F.broadcast(t.nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = t.part.filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "SMALL")
    ).select("p_partkey", "p_name")
    supply = (
        t.lineitem
        # prune to interesting parts before the pair-agg shuffle: at scale
        # this cuts the groupBy input by |parts|/|part|
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(asia_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    # per-part minimum without a second shuffle: window over the same
    # partitioning the groupBy just produced
    w = Window.partitionBy("l_partkey")
    best = supply.withColumn("min_cost", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(asia_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_cost")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


@register(
    "q9_product_profit",
    oracle="""
        SELECT n_name, o_year,
               CAST(CAST(SUM(amount) AS VARCHAR) AS DOUBLE) AS sum_profit
        FROM (
            SELECT ns.n_name,
                   CAST(year(o_orderdate) AS INT) AS o_year,
                   CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4))
                   - CAST(p_retailprice AS DECIMAL(18,4))
                       * CAST(l_quantity AS DECIMAL(18,4)) AS amount
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ns ON ns.n_nationkey = s_nationkey
            JOIN orders   ON o_orderkey = l_orderkey
            WHERE p_name LIKE '%widget%'
        )
        GROUP BY n_name, o_year
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and order year over a "
        "5-table join, p_retailprice*quantity standing in for the missing "
        "ps_supplycost. amount stays exact decimal in both engines "
        "(DECIMAL(37,8) products, exact subtraction and sum).",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ns = t.nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name")
    )
    amount = dec("l_extendedprice") * dec(1 - F.col("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        t.lineitem.join(
            F.broadcast(t.part.filter(F.col("p_name").like("%widget%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("s_nkey") == F.col("s_nationkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    oracle="""
        SELECT l_partkey AS partkey,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR)
                    AS DOUBLE) AS part_value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY l_partkey
        HAVING CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR)
                    AS DOUBLE)
             > (SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE)
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation   ON n_nationkey = s_nationkey
                JOIN region   ON r_regionkey = n_regionkey
                WHERE r_name = 'EUROPE') * 0.0001
        ORDER BY part_value DESC, partkey
    """,
    doc="TPC-H Q11 shape: per-part value from one region's suppliers, kept "
        "only when above a fraction of the global total (grouped HAVING vs "
        "scalar subquery). Both sides of the comparison are exact-decimal "
        "doubles; the *0.0001 scaling is one FP multiply on identical "
        "inputs in both engines.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    eu = (
        t.supplier.join(
            F.broadcast(t.nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey")
    )
    base = t.lineitem.join(
        F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey")
    )
    # ONE fact scan: the global total is the sum of the per-part decimal
    # sums (exact decimal addition is associative, unlike double), so it
    # re-aggregates the small grouped result instead of re-scanning lineitem.
    per_part = base.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).alias("v_dec")
    )
    total = per_part.agg(
        (F.sum("v_dec").cast("double") * F.lit(0.0001)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("v_dec").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("v_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("partkey"))
    )


@register(
    "q16_supplier_cnt",
    oracle="""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#3'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 100
    """,
    doc="TPC-H Q16 shape: distinct-supplier count per part attribute "
        "triple, excluding an unwanted supplier set via NOT IN "
        "(anti-join; s_suppkey is non-null so NOT IN == anti).",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bad = t.supplier.filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    parts = t.part.filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        t.lineitem.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"),
            F.asc("p_size"),
        )
        .limit(100)
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR)
                    AS DOUBLE) / 7.0 AS avg_yearly,
               count(*) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#5' AND p_type = 'ECONOMY'
          AND l_quantity < (
              SELECT 0.2 * (CAST(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4)))
                                 AS VARCHAR) AS DOUBLE) / count(*))
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: revenue from below-average-quantity lineitems of "
        "a brand/type slice; the correlated AVG subquery decorrelates to a "
        "per-part aggregate + broadcast join. Threshold = 0.2 * "
        "(exact-decimal-sum double / count) — identical op order in both "
        "engines.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    parts = t.part.filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey")
    li = t.lineitem.join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    )
    # decorrelate with a window instead of agg+self-join: ONE scan of the
    # fact and one shuffle on partkey, vs two scans in the naive plan
    w = Window.partitionBy("l_partkey")
    thr = F.lit(0.2) * (
        F.sum(dec("l_quantity")).over(w).cast("double") / F.count("*").over(w)
    )
    return (
        li.withColumn("qty_threshold", thr)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q20_promo_suppliers",
    oracle="""
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
          AND s_suppkey IN (
              SELECT l_suppkey
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE p_name LIKE '%bolt%'
                AND l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate <  TIMESTAMP '1998-01-01'
              GROUP BY l_suppkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 100)
        ORDER BY s_name, s_suppkey
    """,
    doc="TPC-H Q20 shape: region's suppliers who moved serious volume of a "
        "part-name slice in a year — IN over a grouped HAVING (semi-join "
        "after partial agg). Exact-decimal quantity sum vs integer "
        "threshold.",
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    movers = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(t.part.filter(F.col("p_name").like("%bolt%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 100)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        t.supplier.join(
            F.broadcast(t.nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        # movers <= |supplier| rows (grouped by suppkey): dimension-sized,
        # safe to broadcast at any fact scale
        .join(F.broadcast(movers), "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(F.asc("s_name"), F.asc("s_suppkey"))
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders   ON o_orderkey = l1.l_orderkey
        JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    doc="TPC-H Q21 shape: the sole late supplier in multi-supplier "
        "finished orders ('late' = shipped >60 days after order date, "
        "standing in for the missing receipt/commit columns). The "
        "EXISTS + NOT-EXISTS double self-join collapses to ONE pass: "
        "window distinct-counts over the order's suppliers and its late "
        "suppliers — qualify when late AND >=2 suppliers AND exactly one "
        "late supplier (which is then necessarily l1's). Avoids the "
        "classic plan's two extra lineitem shuffles.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    joined = (
        t.lineitem.join(
            t.orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .withColumn("is_late", late)
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        joined.withColumn(
            "n_supp", F.size(F.collect_set("l_suppkey").over(w))
        )
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
    )
    return (
        flagged.join(
            F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )
