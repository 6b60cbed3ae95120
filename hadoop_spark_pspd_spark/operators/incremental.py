"""Incremental-maintenance + semi-structured (Variant) operators.

A 100 TB corpus is never rebuilt from scratch — it's upserted. The
reference has no notion of updates (its outputs are overwrite-only,
run_fault_tests.py:120), so this is engine surface for the north-star
pipeline: MERGE expressed as pure join algebra (what Delta/Iceberg MERGE
INTO lowers to when no transaction log is present), plus Spark 4 VARIANT
ingestion for schema-on-read JSON — the scale-honest way to keep
semi-structured event payloads queryable without a fixed schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register
from .relational import dec


@register(
    "q_merge_upsert",
    oracle="""
        WITH source AS (
            SELECT o_orderkey AS key, 'U' AS status,
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4))
                        * CAST(1.1 AS DECIMAL(18,4)) AS VARCHAR) AS DOUBLE)
                       AS totalprice
            FROM orders WHERE o_orderkey % 5 = 0
            UNION ALL
            SELECT o_orderkey + 100000000 AS key, 'N' AS status,
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR)
                        AS DOUBLE) AS totalprice
            FROM orders WHERE o_orderkey % 7 = 3
        ), target AS (
            SELECT o_orderkey AS key, o_orderstatus AS status,
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR)
                        AS DOUBLE) AS totalprice
            FROM orders
        )
        SELECT COALESCE(t.key, s.key) AS key,
               COALESCE(s.status, t.status) AS status,
               COALESCE(s.totalprice, t.totalprice) AS totalprice,
               CASE WHEN t.key IS NULL THEN 'insert'
                    WHEN s.key IS NULL THEN 'keep'
                    ELSE 'update' END AS action
        FROM target t FULL OUTER JOIN source s ON t.key = s.key
    """,
    doc="MERGE/upsert as join algebra: a deterministic change set (updates "
        "for key%5=0, inserts for key%7=3 at shifted keys) merged into "
        "orders via full outer join + coalesce — matched rows update, "
        "unmatched source rows insert, the rest keep. One shuffle on the "
        "merge key; at scale the change set is typically small enough to "
        "broadcast, making MERGE a map-side operation.",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    target = t.orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        dec("o_totalprice").cast("double").alias("totalprice"),
    )
    updates = t.orders.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit("U").alias("status"),
        (dec("o_totalprice") * dec(F.lit(1.1))).cast("double")
        .alias("totalprice"),
    )
    inserts = t.orders.filter(F.col("o_orderkey") % 7 == 3).select(
        (F.col("o_orderkey") + 100000000).alias("key"),
        F.lit("N").alias("status"),
        dec("o_totalprice").cast("double").alias("totalprice"),
    )
    source = updates.unionByName(inserts)
    tt = target.alias("t")
    ss = source.alias("s")
    return tt.join(ss, F.col("t.key") == F.col("s.key"), "full_outer").select(
        F.coalesce(F.col("t.key"), F.col("s.key")).alias("key"),
        F.coalesce(F.col("s.status"), F.col("t.status")).alias("status"),
        F.coalesce(F.col("s.totalprice"), F.col("t.totalprice"))
        .alias("totalprice"),
        F.when(F.col("t.key").isNull(), "insert")
        .when(F.col("s.key").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )


@register(
    "q_variant_events",
    oracle="""
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k_bucket,
               count(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
    doc="Spark 4 VARIANT ingestion: parse_json(props) once into a variant "
        "column, then typed variant_get extraction — schema-on-read for "
        "semi-structured payloads with the binary-encoded variant staying "
        "columnar (no per-query JSON re-parse at scale).",
)
def q_variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    v = t.events.select(
        "event_type", F.parse_json("props").alias("pv")
    )
    return (
        v.select(
            "event_type",
            F.variant_get("pv", "$.k", "int").alias("k_bucket"),
        )
        .groupBy("event_type", "k_bucket")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_scd2_history",
    oracle="""
        SELECT o_custkey AS custkey,
               o_orderkey AS version_key,
               o_totalprice_d AS totalprice,
               eff_from,
               coalesce(CAST(eff_to AS VARCHAR), 'current') AS eff_to,
               eff_to IS NULL AS is_current
        FROM (
            SELECT o_custkey, o_orderkey,
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR)
                        AS DOUBLE) AS o_totalprice_d,
                   o_orderdate AS eff_from,
                   lead(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS eff_to
            FROM orders
        )
    """,
    doc="SCD Type-2 history build: each customer's orders become "
        "versioned dimension rows with [eff_from, eff_to) validity "
        "derived from lead() over the change sequence; the open-ended "
        "latest version is flagged current. One shuffle on the dimension "
        "key; (date, orderkey) is the deterministic change order. "
        "eff_to surfaces as VARCHAR with a 'current' sentinel so the "
        "nullable-date column hashes identically cross-engine.",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    h = t.orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("version_key"),
        dec("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_orderdate").alias("eff_from"),
        F.lead("o_orderdate").over(w).alias("eff_to_raw"),
    )
    return h.select(
        "custkey",
        "version_key",
        "totalprice",
        "eff_from",
        F.coalesce(F.col("eff_to_raw").cast("string"), F.lit("current"))
        .alias("eff_to"),
        F.col("eff_to_raw").isNull().alias("is_current"),
    )


@register(
    "q_cdc_apply",
    oracle="""
        WITH log AS (
            SELECT o_orderkey AS key,
                   o_orderdate AS change_ts,
                   o_orderkey % 7 = 3 AS is_delete,
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR)
                        AS DOUBLE) AS val,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn,
                   o_custkey AS entity
            FROM orders
        )
        SELECT entity, key AS last_key, change_ts AS last_change, val
        FROM log
        WHERE rn = 1 AND NOT is_delete
    """,
    doc="CDC changelog apply: a change log (orders stand in; every 7th "
        "key a tombstone) collapses to current state by latest-change-"
        "wins per entity, then tombstoned entities drop out. One shuffle "
        "on the entity key, window + filter — the standard "
        "materialize-current-state pass over a Debezium-shaped feed; "
        "deletes fold in the same pass instead of a separate anti-join.",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    log = t.orders.select(
        F.col("o_custkey").alias("entity"),
        F.col("o_orderkey").alias("key"),
        F.col("o_orderdate").alias("change_ts"),
        (F.col("o_orderkey") % 7 == 3).alias("is_delete"),
        dec("o_totalprice").cast("double").alias("val"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        log.filter((F.col("rn") == 1) & (~F.col("is_delete")))
        .select(
            "entity",
            F.col("key").alias("last_key"),
            F.col("change_ts").alias("last_change"),
            "val",
        )
    )


@register(
    "q_snapshot_diff",
    oracle="""
        WITH old AS (
            SELECT o_orderkey, o_orderpriority
            FROM orders WHERE o_orderkey % 10 <> 0
        ),
        new AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0 THEN 'X-CHANGED'
                        ELSE o_orderpriority END AS o_orderpriority
            FROM orders WHERE o_orderkey % 7 <> 0
        )
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    ELSE 'update' END AS op,
               o.o_orderpriority AS old_priority,
               n.o_orderpriority AS new_priority
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
        WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.o_orderpriority <> n.o_orderpriority
    """,
    doc="Snapshot diff / CDC reconciliation: classify every key as "
        "insert / delete / update between two table states (derived "
        "deterministically from orders: the old snapshot lacks %10 "
        "keys, the new lacks %7 keys and rewrites %3 priorities), "
        "dropping unchanged rows. One full-outer hash join on the key — "
        "the at-scale shape of table reconciliation; pairs with the "
        "MERGE-as-join-algebra upsert in this module.",
    tags=("incremental",),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    old = (
        t.orders.where(F.col("o_orderkey") % 10 != 0)
        .select(
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderpriority").alias("old_priority"),
        )
    )
    new = (
        t.orders.where(F.col("o_orderkey") % 7 != 0)
        .select(
            F.col("o_orderkey").alias("nk"),
            F.when(
                F.col("o_orderkey") % 3 == 0, F.lit("X-CHANGED")
            ).otherwise(F.col("o_orderpriority")).alias("new_priority"),
        )
    )
    joined = old.join(new, F.col("ok") == F.col("nk"), "full_outer")
    op = (
        F.when(F.col("ok").isNull(), F.lit("insert"))
        .when(F.col("nk").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        joined.where(
            F.col("ok").isNull()
            | F.col("nk").isNull()
            | (F.col("old_priority") != F.col("new_priority"))
        )
        .select(
            F.coalesce("ok", "nk").alias("o_orderkey"),
            op.alias("op"),
            "old_priority",
            "new_priority",
        )
    )


@register(
    "q_ivm_aggregate",
    oracle="""
        WITH base AS (
            SELECT * FROM orders WHERE o_orderkey % 11 <> 0
        ), ins AS (
            SELECT * FROM orders WHERE o_orderkey % 11 = 0
        ), del AS (
            SELECT * FROM base WHERE o_orderkey % 13 = 0
        ), effective AS (
            SELECT * FROM base WHERE o_orderkey % 13 <> 0
            UNION ALL
            SELECT * FROM ins
        )
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                         AS VARCHAR) AS DOUBLE) AS total_rev
        FROM effective GROUP BY o_orderpriority
    """,
    doc="Incremental view maintenance for an aggregate: a per-priority "
        "(count, revenue) view is merged with a signed CDC delta — "
        "inserts add, deletes subtract. NOTE: in this self-contained "
        "query the 'old view' is itself derived from the base table, so "
        "the executed plan DOES scan base once; the delta-sized cost "
        "claim applies when the view is materialized between runs (at "
        "100 TB the stored view makes maintenance proportional to the "
        "delta, a fraction of a percent of base). The algebra is what's "
        "being pinned here; the oracle recomputes the "
        "view from the effective table directly, pinning that the "
        "algebraic maintenance is exact (decimal sums make the "
        "subtraction drift-free). Groups whose count reaches zero drop "
        "out of the view, matching the direct recompute.",
    tags=("incremental",),
)
def q_ivm_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.orders.filter(F.col("o_orderkey") % 11 != 0)
    ins = t.orders.filter(F.col("o_orderkey") % 11 == 0)
    dele = base.filter(F.col("o_orderkey") % 13 == 0)

    def view(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            (F.count("*") * sign).alias("n"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,4)")) * sign)
            .alias("rev"),
        )

    # the materialized view as of yesterday + signed delta aggregates;
    # only the delta aggregations touch "new" data
    old_view = view(base, 1)
    delta = view(ins, 1).unionAll(view(dele, -1))
    merged = (
        old_view.unionAll(delta)
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n_orders"), F.sum("rev").alias("rev"))
        .filter(F.col("n_orders") > 0)
    )
    return merged.select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("rev").cast("decimal(18,4)").cast("double").alias("total_rev"),
    )


_ASOF_DATE = "1996-06-30"


@register(
    "q_scd2_asof_lookup",
    oracle=f"""
        WITH h AS (
            SELECT o_custkey, o_orderkey,
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR)
                        AS DOUBLE) AS price,
                   o_orderdate AS eff_from,
                   lead(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                   ) AS eff_to
            FROM orders
        )
        SELECT o_custkey AS custkey,
               o_orderkey AS version_key,
               price AS totalprice,
               CAST(eff_from AS TIMESTAMP) AS eff_from
        FROM h
        WHERE eff_from <= TIMESTAMP '{_ASOF_DATE}'
          AND (eff_to IS NULL OR eff_to > TIMESTAMP '{_ASOF_DATE}')
    """,
    doc="Time travel over the SCD2 history: reconstruct every customer's "
        "dimension row AS OF a fixed date by selecting the version whose "
        "[eff_from, eff_to) interval covers it — the point-in-time "
        "lookup that makes q_scd2_history useful (training-data "
        "snapshots, late-arriving-fact joins, audit reads). Same single "
        "shuffle as the history build; the validity filter prunes to at "
        "most one row per entity. Zero-length versions (two changes on "
        "the lookup date) correctly resolve to the later one.",
    tags=("incremental",),
)
def q_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.lit(_ASOF_DATE).cast("timestamp")
    h = t.orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("version_key"),
        dec("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_orderdate").alias("eff_from"),
        F.lead("o_orderdate").over(w).alias("eff_to"),
    )
    return h.filter(
        (F.col("eff_from") <= d)
        & (F.col("eff_to").isNull() | (F.col("eff_to") > d))
    ).select("custkey", "version_key", "totalprice", "eff_from")


# ---------------------------------------------------------------------------
# Incremental view maintenance for a JOIN view (Blakeley et al. 1986 /
# the DBSP-style bilinear delta rule, public): for V = A JOIN B,
#   dV = dA JOIN B_old  UNION ALL  A_old JOIN dB  UNION ALL  dA JOIN dB
# — maintaining a 100 TB join view touches only the delta-sized terms
# (two delta-broadcast joins and a delta-delta join), never the full
# A JOIN B recompute. This query PROVES the identity on real data: it
# emits the incrementally-maintained aggregate next to the full
# recompute and a per-group equality flag the hash gate checks
# (decimal sums are exact, so equality is exact).


@register(
    "q_ivm_join_delta",
    oracle="""
        WITH a_old AS (
            SELECT * FROM orders WHERE o_orderkey % 10 <> 9
        ), a_new AS (
            SELECT * FROM orders WHERE o_orderkey % 10 = 9
        ), b_old AS (
            SELECT * FROM customer WHERE c_custkey % 97 <> 0
        ), b_new AS (
            SELECT * FROM customer WHERE c_custkey % 97 = 0
        ), term AS (
            SELECT c_mktsegment, 0 AS src, count(*) AS n,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
            FROM a_old JOIN b_old ON o_custkey = c_custkey GROUP BY 1
            UNION ALL
            SELECT c_mktsegment, 1, count(*),
                   SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            FROM a_new JOIN b_old ON o_custkey = c_custkey GROUP BY 1
            UNION ALL
            SELECT c_mktsegment, 2, count(*),
                   SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            FROM a_old JOIN b_new ON o_custkey = c_custkey GROUP BY 1
            UNION ALL
            SELECT c_mktsegment, 3, count(*),
                   SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            FROM a_new JOIN b_new ON o_custkey = c_custkey GROUP BY 1
        ), incr AS (
            SELECT c_mktsegment,
                   CAST(SUM(n) AS BIGINT) AS n_incr,
                   SUM(rev) AS rev_incr_d,
                   CAST(SUM(CASE WHEN src = 0 THEN n ELSE 0 END)
                        AS BIGINT) AS n_old
            FROM term GROUP BY 1
        ), full_v AS (
            SELECT c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_full,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_full_d
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        )
        SELECT i.c_mktsegment, i.n_old, i.n_incr, f.n_full,
               CAST(CAST(i.rev_incr_d AS VARCHAR) AS DOUBLE) AS rev_incr,
               CAST(CAST(f.rev_full_d AS VARCHAR) AS DOUBLE) AS rev_full,
               (i.n_incr = f.n_full
                AND i.rev_incr_d = f.rev_full_d) AS matches
        FROM incr i JOIN full_v f USING (c_mktsegment)
    """,
    doc="Join-view incremental maintenance, proven: V = orders JOIN "
        "customer with BOTH sides receiving a delta batch (order keys "
        "% 10 = 9, customer keys % 97 = 0 stand in for the day's "
        "arrivals); the view updates by the bilinear delta rule "
        "dV = dA*B + A*dB + dA*dB (Blakeley 1986, public) and the "
        "query emits the incrementally-maintained per-segment count "
        "and revenue NEXT TO the full recompute with an exact-decimal "
        "equality flag — a wrong delta term breaks the hash. At scale "
        "the three delta terms are delta-sized joins (the dim side "
        "broadcasts); the full recompute here is the eval column only. "
        "Decimal sums make the equality exact, crossing to double "
        "through the shortest string (oracle) / plain cast (Spark).",
    tags=("incremental",),
)
def q_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    a_old = t.orders.filter(F.col("o_orderkey") % 10 != 9)
    a_new = t.orders.filter(F.col("o_orderkey") % 10 == 9)
    b_old = t.customer.filter(F.col("c_custkey") % 97 != 0)
    b_new = t.customer.filter(F.col("c_custkey") % 97 == 0)

    def term(a: DataFrame, b: DataFrame, src: int) -> DataFrame:
        return (
            a.join(F.broadcast(b), a["o_custkey"] == b["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                F.sum(dec("o_totalprice")).alias("rev"),
            )
            .select("c_mktsegment", F.lit(src).alias("src"), "n", "rev")
        )

    terms = (
        term(a_old, b_old, 0)
        .unionAll(term(a_new, b_old, 1))
        .unionAll(term(a_old, b_new, 2))
        .unionAll(term(a_new, b_new, 3))
    )
    incr = terms.groupBy("c_mktsegment").agg(
        F.sum("n").cast("bigint").alias("n_incr"),
        F.sum("rev").alias("rev_incr_d"),
        F.sum(F.when(F.col("src") == 0, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_old"),
    )
    full_v = (
        t.orders.join(
            F.broadcast(t.customer),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_full"),
            F.sum(dec("o_totalprice")).alias("rev_full_d"),
        )
    )
    return incr.join(full_v, "c_mktsegment").select(
        "c_mktsegment", "n_old", "n_incr", "n_full",
        F.col("rev_incr_d").cast("double").alias("rev_incr"),
        F.col("rev_full_d").cast("double").alias("rev_full"),
        (
            (F.col("n_incr") == F.col("n_full"))
            & (F.col("rev_incr_d") == F.col("rev_full_d"))
        ).alias("matches"),
    )
