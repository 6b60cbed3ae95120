"""Bucketed fact-fact join: the shuffle-free repeated-join strategy.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders) is
shuffling both sides on the key for every query. Bucketing both tables on
the join key at WRITE time (the one-time "cluster-deploy step") co-locates
matching keys in the same bucket files, so every subsequent join plans as
a zero-Exchange SortMergeJoin: no network movement of either fact table,
ever again. tests/test_plans.py pins the zero-Exchange property of the
join subplan; the registered query's only Exchange is the (tiny) final
per-priority aggregate.

Reference tie-in: this is Spark's analog of Hadoop's co-partitioned map
side join the reference's HDFS layout would enable
(cluster/config/hdfs-site.xml block placement); cited per CLAUDE.md.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register

N_BUCKETS = 8


def _bucketed_name(table: str, sf_dir: str) -> str:
    tag = Path(sf_dir).name.replace(".", "_")
    return f"pspd_bkt_{table}_{tag}"


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """One-time bucketed materialization of orders+lineitem on the join
    key (idempotent: skipped when the tables already exist)."""
    t = Tables(spark, sf_dir)
    names = {}
    for table, df, key in (
        ("orders", t.orders, "o_orderkey"),
        ("lineitem", t.lineitem, "l_orderkey"),
    ):
        name = _bucketed_name(table, sf_dir)
        if not spark.catalog.tableExists(name):
            # a fresh session's in-memory metastore forgets tables while
            # their warehouse directories persist — clear the stale
            # location (it's our own derived cache) before rewriting
            import shutil
            from urllib.parse import urlparse

            warehouse = urlparse(
                spark.conf.get("spark.sql.warehouse.dir")
            ).path
            shutil.rmtree(Path(warehouse) / name, ignore_errors=True)
            (
                df.write.mode("overwrite")
                .bucketBy(N_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(name)
            )
        names[table] = name
    return names["orders"], names["lineitem"]


def bucketed_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bare co-located join — zero Exchange (pinned by test_plans)."""
    orders_tbl, lineitem_tbl = ensure_bucketed_tables(spark, sf_dir)
    # merge hint pins SortMergeJoin independent of broadcast thresholds:
    # SMJ over identically-bucketed, sorted inputs needs neither shuffle
    # nor sort
    return spark.table(lineitem_tbl).join(
        spark.table(orders_tbl).hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )


@register(
    "q_bucketed_join",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS n_items,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                         AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    doc="Fact-fact lineitem x orders join off bucketed tables: zero "
        "Exchange below the SortMergeJoin (bucket co-location replaces "
        "the per-query shuffle); only the final small per-priority "
        "aggregate shuffles.",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        bucketed_fact_join(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        )
    )


ZBITS = 16


def zorder_key(x: str, y: str):
    """Morton (Z-order) interleave of the low ZBITS bits of two integer
    columns — the multi-dimensional clustering key for data skipping.

    Sorting/range-partitioning a table by this key gives every output
    file a tight min/max envelope on BOTH x and y simultaneously, so a
    conjunctive box predicate prunes files on either dimension — the
    property a single-column sort only provides for its one column.
    Pure integer bit arithmetic (shift/and/add), bit-identical in any
    engine."""
    return F.expr(
        f"""aggregate(sequence(0, {ZBITS - 1}), 0L, (acc, i) ->
                acc + shiftleft(shiftright({x} & {(1 << ZBITS) - 1}, i) & 1L,
                                2 * i)
                    + shiftleft(shiftright({y} & {(1 << ZBITS) - 1}, i) & 1L,
                                2 * i + 1))"""
    )


@register(
    "q_zorder_key",
    oracle=f"""
        SELECT o_orderkey,
               CAST(list_sum(list_transform(range(0, {ZBITS}),
                   i -> ((((o_custkey & {(1 << ZBITS) - 1}) >> i) & 1)
                             << (2 * i))
                        + ((((CAST(floor(o_totalprice / 1000) AS BIGINT)
                              & {(1 << ZBITS) - 1}) >> i) & 1)
                             << (2 * i + 1))))
                   AS BIGINT) AS zkey
        FROM orders
    """,
    doc="Z-order (Morton) clustering key over (o_custkey, totalprice/1000"
        " bucket): bit-interleave of the two dimensions' low 16 bits — "
        "the layout key that makes multi-dimensional file skipping work "
        "(write sorted by zkey; every file then bounds BOTH columns "
        "tightly; see test_zorder_layout_prunes_box_queries, which also "
        "shows the practical rule: shift the wider dimension down to "
        "equal bit width first, or its high bits dominate the curve and "
        "the layout degenerates toward a single-column sort). Integer "
        "shift/and/add only, hash-exact cross-engine.",
    tags=("layout",),
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    price_bucket = "CAST(floor(o_totalprice / 1000) AS BIGINT)"
    return t.orders.select(
        "o_orderkey",
        zorder_key("o_custkey", price_bucket).alias("zkey"),
    )
