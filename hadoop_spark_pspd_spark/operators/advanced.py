"""Advanced relational operators: as-of join, range join, session windows,
subqueries, grouping sets, exact percentiles.

None exist in the reference (SURVEY §2.5-2.6: its workloads are single-input
group-bys) — these are engine-surface operators the north star requires,
with 100 TB-honest physical strategies:

  * as-of join — Spark has no native one. Three implementations sharing one
    oracle: (a) union both tables + per-key window last(ignorenulls) — one
    shuffle, NO join fanout (an event never pairs with more than its one
    answer), the 100 TB default; (b) equi-join on the partition key +
    max_by(struct) aggregation (one shuffle but event x prior-orders
    fanout — kept as the comparison point); (c) applyInPandas merge_asof
    per key group (Arrow-batched, the per-group-imperative escape hatch).
  * range join — bucketize the range key, equi-join on (key, bucket),
    filter the exact range: turns an inequality join (nested loop) into a
    hash join with bounded bucket fanout.
  * session window — built-in session_window() in batch mode; the oracle
    recomputes sessions via lag/cumsum (the SQL-standard formulation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register

_ASOF_ORACLE = """
    SELECT event_id, user_id, ts, last_orderkey, last_orderdate
    FROM (
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey AS last_orderkey,
               o.o_orderdate AS last_orderdate,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e
        JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
"""


@register(
    "q_asof_join",
    oracle=_ASOF_ORACLE,
    doc="As-of join (latest order at-or-before each event, per user) via "
        "union + per-user window last(ignorenulls): both inputs shuffle "
        "once on user_id, a single sort resolves every event — no "
        "event x prior-orders fanout, so cost is O(n log n) per user "
        "regardless of order history length. Ties broken by "
        "(o_orderdate, o_orderkey) DESC, deterministically.",
    bench=True,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("is_event"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    )
    od = t.orders.select(
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("is_event"),
        "o_orderkey",
        "o_orderdate",
    )
    # at equal ts an order still qualifies (<=), so orders sort before
    # events (is_event 0 < 1); among same-date orders ascending o_orderkey
    # makes last() pick the max — the deterministic tie-break the oracle
    # encodes with row_number() DESC
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_event", "o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    best = F.last(
        F.when(
            F.col("is_event") == 0,
            F.struct(
                F.col("o_orderkey").alias("k"), F.col("o_orderdate").alias("d")
            ),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.unionByName(od)
        .withColumn("best", best)
        .filter((F.col("is_event") == 1) & F.col("best").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("best.k").alias("last_orderkey"),
            F.col("best.d").alias("last_orderdate"),
        )
    )


@register(
    "q_asof_join_maxby",
    oracle=_ASOF_ORACLE,
    doc="ANCHOR ONLY — do not use as the scale path; use q_asof_join "
        "(union + window, one shuffle, zero joins). Same as-of join via "
        "equi-join + max_by(struct) aggregation — partial-aggregatable "
        "but with event x prior-orders join fanout (3x slower at sf0.1, "
        "worse with per-key history depth); kept as the physical-strategy "
        "comparison point.",
    tags=("anchor", "join"),
)
def q_asof_join_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    joined = t.events.join(
        t.orders,
        (F.col("o_custkey") == F.col("user_id"))
        & (F.col("o_orderdate") <= F.col("ts")),
    )
    # max_by over a struct: lexicographic (o_orderdate, o_orderkey) max ==
    # the deterministic "last row at-or-before"
    pick = F.max_by(
        F.struct(
            F.col("o_orderkey").alias("k"), F.col("o_orderdate").alias("d")
        ),
        F.struct(F.col("o_orderdate"), F.col("o_orderkey")),
    )
    return (
        joined.groupBy("event_id", "user_id", "ts")
        .agg(pick.alias("best"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("best.k").alias("last_orderkey"),
            F.col("best.d").alias("last_orderdate"),
        )
    )


_ASOF_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp, "
    "last_orderkey bigint, last_orderdate timestamp"
)


@register(
    "q_asof_join_pandas",
    oracle=_ASOF_ORACLE,
    doc="Same as-of join via applyInPandas + pd.merge_asof per user group — "
        "the Arrow-batched escape hatch for operators DataFrame algebra "
        "can't express. Shares the max_by variant's oracle.",
)
def q_asof_join_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    events = t.events.select("event_id", "user_id", "ts")
    orders = t.orders.select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    # cogroup by a 256-BUCKET of users, not by user_id: cogroup calls
    # Python once per KEY, so per-user grouping paid ~15k pandas calls
    # (~1 ms each = 14.8 s engine wall at sf0.1); merge_asof's by=
    # argument restores exact per-user semantics inside each bucket.
    # Still one shuffle per side, co-partitioned on the bucket.
    bucket = (F.col("user_id") % 256).alias("bkt")
    cogrouped = events.groupBy(bucket).cogroup(orders.groupBy(bucket))

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                columns=[
                    "event_id", "user_id", "ts",
                    "last_orderkey", "last_orderdate",
                ]
            )
        # merge_asof requires both frames sorted on the ON key; the
        # secondary o_orderkey sort makes "last match wins" == the
        # oracle's max(o_orderdate, o_orderkey) tie-break within a user
        right = right.sort_values(["o_orderdate", "o_orderkey"])
        left = left.sort_values("ts")
        out = pd.merge_asof(
            left,
            right.rename(
                columns={
                    "o_orderkey": "last_orderkey",
                    "o_orderdate": "last_orderdate",
                }
            )[["user_id", "last_orderdate", "last_orderkey"]],
            left_on="ts",
            right_on="last_orderdate",
            by="user_id",
            direction="backward",
        )
        out = out.dropna(subset=["last_orderkey"])
        out["last_orderkey"] = out["last_orderkey"].astype("int64")
        return out[["event_id", "user_id", "ts", "last_orderkey", "last_orderdate"]]

    return cogrouped.applyInPandas(merge, schema=_ASOF_SCHEMA)


@register(
    "q_range_join",
    oracle="""
        SELECT e.event_id, count(f.event_id) AS n_following
        FROM events e
        LEFT JOIN events f
          ON f.user_id = e.user_id
         AND f.ts > e.ts
         AND f.ts <= e.ts + INTERVAL 1 HOUR
        GROUP BY e.event_id
    """,
    doc="Range (interval) self-join: events per user within the next hour. "
        "Bucketized to epoch-hour so the physical plan is a hash join on "
        "(user_id, bucket) with fanout 2, not a nested-loop inequality join.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_id", "user_id", "ts")
    bucket = (F.unix_micros(F.col("ts")) / F.lit(3_600_000_000)).cast("long")
    left = ev.select(
        F.col("event_id").alias("e_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        bucket.alias("b"),
    )
    # candidate buckets for the (e_ts, e_ts+1h] window are b and b+1
    probe = left.select(
        "e_id", "e_user", "e_ts", F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("b")
    )
    right = ev.select(
        F.col("event_id").alias("f_id"),
        F.col("user_id").alias("f_user"),
        F.col("ts").alias("f_ts"),
        bucket.alias("b"),
    )
    matches = probe.join(
        right,
        (F.col("e_user") == F.col("f_user"))
        & (probe["b"] == right["b"])
        & (F.col("f_ts") > F.col("e_ts"))
        & (
            F.unix_micros(F.col("f_ts"))
            <= F.unix_micros(F.col("e_ts")) + 3_600_000_000
        ),
    ).select("e_id", "f_id")
    return (
        left.select("e_id")
        .join(matches, "e_id", "left")
        .groupBy("e_id")
        .agg(F.count("f_id").alias("n_following"))
        .select(F.col("e_id").alias("event_id"), "n_following")
    )


@register(
    "q_session_window",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > 1800 * 1000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTES AS session_end,
               count(*) AS n_events
        FROM sessions
        GROUP BY user_id, sid
    """,
    doc="Built-in session_window() (30-min gap) in batch mode; the oracle "
        "recomputes sessions via the lag/cumsum SQL formulation. "
        "session_window end == last event + gap.",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "q_grouping_sets",
    oracle="""
        SELECT r_name, c_mktsegment,
               count(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                   AS revenue
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
    """,
    doc="Explicit GROUPING SETS (SURVEY A5) via the SQL API.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.register_views(prefix="pspd_")
    return spark.sql("""
        SELECT r_name, c_mktsegment,
               count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS revenue
        FROM pspd_region
        JOIN pspd_nation   ON n_regionkey = r_regionkey
        JOIN pspd_customer ON c_nationkey = n_nationkey
        JOIN pspd_orders   ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
    """)


@register(
    "q_scalar_subquery",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR)
                        AS DOUBLE) / count(*) * 1.5
            FROM customer)
    """,
    doc="Uncorrelated scalar subquery in a predicate. The avg threshold is "
        "computed via the exact-decimal path (sum DECIMAL(18,4) -> double / "
        "count) so partial-aggregation summation order can't flip membership "
        "of a boundary row between engines.",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.register_views(prefix="pspd_")
    return spark.sql("""
        SELECT c_custkey, c_name, c_acctbal
        FROM pspd_customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   / count(*) * 1.5
            FROM pspd_customer)
    """)


@register(
    "q_correlated_exists",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49
        )
    """,
    doc="Correlated EXISTS subquery (decorrelated by Catalyst to a "
        "semi-join).",
)
def q_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.register_views(prefix="pspd_")
    return spark.sql("""
        SELECT o_orderkey, o_totalprice
        FROM pspd_orders o
        WHERE EXISTS (
            SELECT 1 FROM pspd_lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49
        )
    """)


@register(
    "q_in_subquery",
    oracle="""
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_partkey IN (
            SELECT l_partkey FROM lineitem WHERE l_discount > 0.09
        )
    """,
    doc="IN subquery -> semi-join.",
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.register_views(prefix="pspd_")
    return spark.sql("""
        SELECT p_partkey, p_name, p_retailprice
        FROM pspd_part
        WHERE p_partkey IN (
            SELECT l_partkey FROM pspd_lineitem WHERE l_discount > 0.09
        )
    """)


@register(
    "q_having",
    oracle="""
        SELECT l_suppkey, count(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                   AS total_qty
        FROM lineitem
        GROUP BY l_suppkey
        HAVING count(*) > 600
    """,
    doc="HAVING post-aggregation filter.",
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    from .relational import dsum

    return (
        t.lineitem.groupBy("l_suppkey")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("total_qty"))
        .filter(F.col("n") > 600)
    )


@register(
    "q_case_coalesce",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 30000 THEN 'high'
                    WHEN o_totalprice >= 10000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
               greatest(o_totalprice, 15000.0) AS floor_price,
               least(CAST(o_orderkey % 7 AS BIGINT),
                     CAST(o_custkey % 5 AS BIGINT)) AS least_mod
        FROM orders
    """,
    doc="CASE/COALESCE/NULLIF/GREATEST/LEAST conditional family.",
)
def q_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 30000, "high")
        .when(F.col("o_totalprice") >= 10000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING"))
        .alias("status_norm"),
        F.greatest(F.col("o_totalprice"), F.lit(15000.0)).alias("floor_price"),
        F.least(
            (F.col("o_orderkey") % 7).cast("bigint"),
            (F.col("o_custkey") % 5).cast("bigint"),
        ).alias("least_mod"),
    )


@register(
    "q_union_all_by_name",
    oracle="""
        SELECT kind, key_id, amount FROM (
            SELECT 'order' AS kind, o_orderkey AS key_id,
                   o_totalprice AS amount
            FROM orders
            WHERE o_totalprice > 48000 AND o_orderkey % 20 = 3
            UNION ALL
            SELECT 'lineitem' AS kind, l_orderkey AS key_id,
                   l_extendedprice AS amount
            FROM lineitem
            WHERE l_extendedprice > 9900 AND l_orderkey % 20 = 3
        )
    """,
    doc="UNION ALL with schema alignment (unionByName). Deterministic "
        "1-in-20 key sample on both branches in both engines — the "
        "union semantics are per-row, and the unsampled form dumped "
        "684k rows into the hash compare (11 s of the sf0.1 sweep).",
)
def q_union_all_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    a = t.orders.filter(
        (F.col("o_totalprice") > 48000) & (F.col("o_orderkey") % 20 == 3)
    ).select(
        F.lit("order").alias("kind"),
        F.col("o_orderkey").alias("key_id"),
        F.col("o_totalprice").alias("amount"),
    )
    b = t.lineitem.filter(
        (F.col("l_extendedprice") > 9900) & (F.col("l_orderkey") % 20 == 3)
    ).select(
        F.col("l_orderkey").alias("key_id"),
        F.lit("lineitem").alias("kind"),
        F.col("l_extendedprice").alias("amount"),
    )
    return a.unionByName(b)


@register(
    "q_asof_join_forward",
    oracle="""
        SELECT c.event_id, c.user_id, c.ts,
               p.event_id AS next_purchase_id,
               p.ts AS next_purchase_ts
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN LATERAL (
            SELECT event_id, ts
            FROM events
            WHERE user_id = c.user_id AND event_type = 'purchase'
              AND ts >= c.ts
            ORDER BY ts, event_id
            LIMIT 1
        ) p ON TRUE
    """,
    doc="FORWARD as-of join (funnel metric: each click's NEXT purchase "
        "per user) - the mirror of q_asof_join's union+window strategy "
        "run over an unbounded-FOLLOWING frame with first(ignorenulls). "
        "Same single-shuffle cost regardless of how many purchases "
        "follow; ties broken by (ts, event_id) ASC, matching the "
        "LATERAL-limit-1 oracle.",
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("is_needle"),
        F.lit(None).cast("bigint").alias("p_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("is_needle"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    # at equal ts the purchase still qualifies (>=): needles sort BEFORE
    # same-ts purchases looking forward, so is_needle DESC; among same-ts
    # purchases ascending p_id makes first() pick the min - the LATERAL
    # ORDER BY ... LIMIT 1 tie-break
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.asc("ts"), F.desc("is_needle"),
            F.asc("p_ts"), F.asc("p_id"),
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    best = F.first(
        F.when(
            F.col("is_needle") == 0,
            F.struct(F.col("p_id").alias("k"), F.col("p_ts").alias("d")),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        clicks.unionByName(purchases)
        .withColumn("best", best)
        .filter((F.col("is_needle") == 1) & F.col("best").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("best.k").alias("next_purchase_id"),
            F.col("best.d").alias("next_purchase_ts"),
        )
    )


@register(
    "q_asof_join_nearest",
    oracle="""
        SELECT c.event_id, c.user_id, c.ts,
               p.event_id AS nearest_purchase_id,
               p.ts AS nearest_purchase_ts
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN LATERAL (
            SELECT event_id, ts
            FROM events
            WHERE user_id = c.user_id AND event_type = 'purchase'
            ORDER BY abs(epoch_us(ts) - epoch_us(c.ts)), ts, event_id
            LIMIT 1
        ) p ON TRUE
    """,
    doc="NEAREST as-of join (minimum absolute time distance, either "
        "direction) - completes the backward/forward family: one union, "
        "one user_id shuffle, a backward and a forward window, then an "
        "integer-microsecond distance compare picks the nearer side "
        "(ties to the earlier purchase, which the oracle's ORDER BY "
        "abs, ts encodes; (user_id, ts) uniqueness makes it total).",
)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(1).alias("is_needle"),
        F.lit(None).cast("bigint").alias("p_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("is_needle"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    u = clicks.unionByName(purchases)
    p_struct = F.when(
        F.col("is_needle") == 0,
        F.struct(F.col("p_id").alias("k"), F.col("p_ts").alias("d")),
    )
    # backward: purchases at-or-before (needle sorts AFTER same-ts
    # purchases: is_needle 0 < 1 asc)
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("is_needle"), F.asc("p_ts"), F.asc("p_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: purchases at-or-after (needle sorts BEFORE same-ts purchases)
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_needle"), F.asc("p_ts"), F.asc("p_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    bwd = F.last(p_struct, ignorenulls=True).over(wb)
    fwd = F.first(p_struct, ignorenulls=True).over(wf)
    us = lambda c: F.unix_micros(c)  # noqa: E731
    with_best = (
        u.withColumn("bwd", bwd)
        .withColumn("fwd", fwd)
        .filter(F.col("is_needle") == 1)
        .withColumn(
            "best",
            F.when(F.col("bwd").isNull(), F.col("fwd"))
            .when(F.col("fwd").isNull(), F.col("bwd"))
            .when(
                us(F.col("ts")) - us(F.col("bwd.d"))
                <= us(F.col("fwd.d")) - us(F.col("ts")),
                F.col("bwd"),
            )
            .otherwise(F.col("fwd")),
        )
        .filter(F.col("best").isNotNull())
    )
    return with_best.select(
        "event_id",
        "user_id",
        "ts",
        F.col("best.k").alias("nearest_purchase_id"),
        F.col("best.d").alias("nearest_purchase_ts"),
    )


@register(
    "q_hierarchy_rollup",
    oracle="""
        WITH RECURSIVE walk(node, anc, depth, acc) AS (
            SELECT p_partkey, p_partkey, CAST(1 AS BIGINT),
                   CAST(p_retailprice AS DECIMAL(18,4))
            FROM part
            UNION ALL
            SELECT w.node, w.anc // 2, w.depth + 1,
                   CAST(w.acc + CAST(p.p_retailprice AS DECIMAL(18,4))
                        AS DECIMAL(18,4))
            FROM walk w JOIN part p ON p.p_partkey = w.anc // 2
            WHERE w.anc > 0
        )
        SELECT node AS p_partkey, depth,
               CAST(CAST(acc AS VARCHAR) AS DOUBLE) AS path_cost
        FROM walk WHERE anc = 0
    """,
    doc="Hierarchical (bill-of-materials) rollup: each part's ancestor "
        "chain in a synthetic containment tree (parent(k) = k div 2, "
        "root 0 — a binary hierarchy derived from the key so the oracle "
        "can replay it), traversed iteratively to yield per-node depth "
        "and exact-decimal path cost (sum of retail prices up the "
        "chain). The org-chart/BOM family: Spark has no recursive CTE, "
        "so the engine walks level-by-level — depth is bounded by "
        "log2(max key) rounds, each one broadcast join of the frontier "
        "against the (dim-sized) part table, lineage truncated per "
        "round. A deeper/wider production hierarchy would use the same "
        "loop with iterative doubling (path halving) to cut rounds to "
        "log(log) — noted here, unnecessary at tree depth ~15.",
    tags=("hierarchy",),
)
def q_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    parts = t.part.select(
        "p_partkey",
        F.col("p_retailprice").cast("decimal(18,4)").alias("price"),
    ).cache()
    state = parts.select(
        F.col("p_partkey").alias("node"),
        F.col("p_partkey").alias("anc"),
        F.lit(1).cast("bigint").alias("depth"),
        F.col("price").alias("acc"),
    ).localCheckpoint(eager=False)
    try:
        while True:
            pending = state.filter(F.col("anc") > 0)
            # lazy cut + count(): ONE job per round materializes and
            # persists the round's state AND answers the emptiness
            # check (the BFS pattern, r7 §5) — the eager checkpoint +
            # isEmpty pair cost two jobs per round across the ~15
            # ancestor-walk rounds
            if pending.count() == 0:
                break
            finished = state.filter(F.col("anc") == 0)
            nxt = (
                pending.withColumn("anc2", F.expr("anc div 2"))
                .join(
                    F.broadcast(
                        parts.select(
                            F.col("p_partkey").alias("anc2"),
                            F.col("price").alias("p2"),
                        )
                    ),
                    "anc2",
                )
                .select(
                    "node",
                    F.col("anc2").alias("anc"),
                    (F.col("depth") + 1).alias("depth"),
                    (F.col("acc") + F.col("p2"))
                    .cast("decimal(18,4)")
                    .alias("acc"),
                )
            )
            # union doubles the partition count every round (2^rounds tasks
            # by the leaves) — re-coalesce to the session's parallelism
            # before truncating lineage so round cost stays constant
            state = (
                finished.unionByName(nxt)
                .coalesce(spark.sparkContext.defaultParallelism)
                .localCheckpoint(eager=False)
            )
        return state.select(
            F.col("node").alias("p_partkey"),
            "depth",
            F.col("acc").cast("double").alias("path_cost"),
        )
    finally:
        parts.unpersist()


@register(
    "q_skyline_customers",
    oracle="""
        WITH metrics AS (
            SELECT o.o_custkey AS custkey,
                   CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                       AS total_qty
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey
        ),
        flagged AS (
            SELECT custkey, n_orders, total_qty,
                   max(total_qty) OVER (
                       ORDER BY n_orders DESC
                       RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
                   ) AS mx_bt,
                   max(total_qty) OVER (PARTITION BY n_orders) AS mx_eq
            FROM metrics
        )
        SELECT custkey, n_orders, total_qty
        FROM flagged
        WHERE (mx_bt IS NULL OR total_qty > mx_bt)
          AND total_qty = mx_eq
    """,
    doc="Skyline (Pareto-optimal front) of 'bulk buyers': customers for "
        "whom no other customer achieves >= total quantity with <= "
        "orders (one strict) — MINIMIZE order count, MAXIMIZE quantity, "
        "the anti-correlated axes that give the classic multi-criteria "
        "operator (Borzsony/Kossmann SKYLINE OF) a non-trivial front. "
        "Semantics via two windows: dominated-by-strictly-fewer-orders "
        "iff mx_bt >= qty (value-RANGE frame over ORDER BY n DESC, "
        "exact on integer keys), dominated-within-equal-n iff qty < "
        "mx_eq; duplicate "
        "(n, qty) points all survive (neither strictly dominates). All "
        "quantities are exact integers (l_quantity is integral — the "
        "double->BIGINT cast is exact, sidestepping Spark-truncates/"
        "DuckDB-rounds divergence). Scale: stage 1 runs the SAME "
        "dominance filter inside 32 hash buckets (skyline-of-union == "
        "skyline-of-partial-skylines, since a globally undominated point "
        "is undominated in its bucket), so the global value-range "
        "windows in stage 2 see only the tiny bucket-survivor union, "
        "never a single-partition sort of the full customer dimension.",
    tags=("relational", "stats"),
)
def q_skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    metrics = (
        t.orders.join(
            t.lineitem,
            t.lineitem.l_orderkey == t.orders.o_orderkey,
        )
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        )
    )

    def survivors(df: DataFrame, part_cols: list) -> DataFrame:
        # empty part_cols = the global pass over the BOUNDED survivor
        # union; partition by the constant custkey % 1 (non-foldable,
        # so Catalyst's window-partition elimination keeps it and
        # WindowExec stays off its no-partition single-task warning
        # path — the group content is identical to the unpartitioned
        # form)
        pcols = part_cols or [F.pmod(F.col("custkey"), F.lit(1))]
        w_bt = (
            Window.partitionBy(*pcols)
            .orderBy(F.col("n_orders").desc())
            .rangeBetween(1, Window.unboundedFollowing)
        )
        w_eq = Window.partitionBy(*pcols, "n_orders")
        flagged = df.select(
            "custkey",
            "n_orders",
            "total_qty",
            F.max("total_qty").over(w_bt).alias("mx_bt"),
            F.max("total_qty").over(w_eq).alias("mx_eq"),
        )
        return flagged.where(
            (F.col("mx_bt").isNull() | (F.col("total_qty") > F.col("mx_bt")))
            & (F.col("total_qty") == F.col("mx_eq"))
        ).select("custkey", "n_orders", "total_qty")

    # stage 1: bucket-local skyline (any deterministic bucketing works —
    # the final output is bucketing-independent); stage 2: global pass
    # over the bounded survivor union
    bucketed = metrics.withColumn("b", F.pmod(F.col("custkey"), F.lit(32)))
    partial = survivors(bucketed, ["b"])
    return survivors(partial, [])


@register(
    "q_relational_division",
    oracle="""
        WITH req AS (
            SELECT brand FROM (
                SELECT p.p_brand AS brand, count(*) AS n
                FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                GROUP BY p.p_brand
                ORDER BY n DESC, brand
                LIMIT 3
            )
        ),
        purchases AS (
            SELECT DISTINCT o.o_custkey AS custkey, p.p_brand AS brand
            FROM orders o
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN part p ON p.p_partkey = l.l_partkey
        )
        SELECT pu.custkey, CAST(count(*) AS BIGINT) AS n_required_bought
        FROM purchases pu JOIN req r ON r.brand = pu.brand
        GROUP BY pu.custkey
        HAVING count(*) = 3
    """,
    doc="Relational division (Codd's 'suppliers who supply ALL parts' "
        "shape): customers who have purchased from EVERY one of the 3 "
        "most-ordered part brands. The divisor set is data-derived but "
        "deterministic (count desc, partkey tie-break) and BOUNDED, so "
        "the division reduces to a broadcast semi-join + a grouped "
        "count-equality — the set-containment idiom that avoids the "
        "classic double-NOT-EXISTS correlated scan entirely. Plan: one "
        "map-side-combined part count, distributed top-3 "
        "(TakeOrderedAndProject), one fact distinct, broadcast join, "
        "one agg; nothing quadratic, the divisor never leaves 3 rows.",
    tags=("relational",),
)
def q_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    enriched = t.lineitem.join(
        t.part, t.part.p_partkey == t.lineitem.l_partkey
    )
    req = (
        enriched.groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("brand"))
        .limit(3)
        .select("brand")
    )
    purchases = (
        t.orders.join(
            enriched, enriched.l_orderkey == t.orders.o_orderkey
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("p_brand").alias("brand"),
        )
        .distinct()
    )
    return (
        purchases.join(F.broadcast(req), "brand")
        .groupBy("custkey")
        .agg(F.count("*").alias("n_required_bought"))
        .where(F.col("n_required_bought") == 3)
    )
