"""Scalar/aggregate function-family coverage (SURVEY §2.9 + A4).

One query per family, each oracle-checked: array/map/JSON-struct handling,
extended datetime, exact-safe math (only IEEE-deterministic functions —
sqrt/abs/floor/ceil/round/mod/sign; transcendentals are libm-dependent and
excluded from hash-matched queries), exact percentiles, ordered collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register
from .relational import dsum


@register(
    "q_array_functions",
    oracle="""
        SELECT doc_id,
               CAST(len(w) AS INTEGER) AS n_tokens,
               w[1] AS first_token,
               w[-1] AS last_token,
               array_to_string(list_sort(list_distinct(w)), ',')
                   AS sorted_vocab,
               list_contains(w, 'spark') AS has_spark,
               CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct
        FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), x -> x <> '')
                       AS w
            FROM documents
        )
        WHERE len(w) > 0
    """,
    doc="Array family: size, element access, sort, distinct, contains "
        "(SURVEY §2.9 Array/Map).",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    from ..functions.text import tokens

    w = tokens(F.col("text"))
    return (
        t.documents.select("doc_id", w.alias("w"))
        .filter(F.size("w") > 0)
        .select(
            "doc_id",
            F.size("w").alias("n_tokens"),
            F.col("w").getItem(0).alias("first_token"),
            F.element_at("w", -1).alias("last_token"),
            F.concat_ws(",", F.sort_array(F.array_distinct("w")))
            .alias("sorted_vocab"),
            F.array_contains("w", "spark").alias("has_spark"),
            F.size(F.array_distinct("w")).alias("n_distinct"),
        )
    )


@register(
    "q_map_json_struct",
    oracle="""
        SELECT k, count(*) AS n,
               CAST(min(event_id) AS BIGINT) AS min_event,
               CAST(max(event_id) AS BIGINT) AS max_event
        FROM (
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        GROUP BY k
    """,
    doc="JSON->struct parsing via from_json with an explicit schema "
        "(vs get_json_object in q_json_events), then map-style access.",
)
def q_map_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    parsed = t.events.select(
        "event_id",
        F.from_json(F.col("props"), "k int").alias("p"),
    )
    return (
        parsed.select("event_id", F.col("p.k").alias("k"))
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("min_event"),
            F.max("event_id").alias("max_event"),
        )
    )


@register(
    "q_datetime_extended",
    oracle="""
        SELECT o_orderkey,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(dayofweek(o_orderdate) AS INTEGER) + 1 AS dow,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS woy,
               CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
               CAST(o_orderdate + INTERVAL 3 MONTHS AS TIMESTAMP)
                   AS plus_3m,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        FROM orders
    """,
    doc="Extended datetime family: quarter/dow/doy/weekofyear/last_day/"
        "add_months/unix seconds. DuckDB dayofweek is 0-based Sunday; "
        "Spark's is 1-based Sunday — oracle adds 1.",
)
def q_datetime_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3m"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "q_math_exact",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 1) AS price_r1,
               floor(l_extendedprice) AS price_floor,
               ceil(l_extendedprice) AS price_ceil,
               abs(l_discount - 0.05) AS disc_dev,
               sqrt(l_quantity) AS qty_sqrt,
               CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
               CAST(l_orderkey % 97 AS BIGINT) AS key_mod
        FROM lineitem
        WHERE l_orderkey % 50 = 7
    """,
    doc="IEEE-deterministic math family (round/floor/ceil/abs/sqrt/sign/"
        "mod) — transcendentals excluded by design (libm-dependent). "
        "Deterministic 1-in-50 key sample in BOTH engines: function "
        "coverage is per-row, so dumping the full fact table only "
        "inflated the hash-compare wall (22 s of the sf0.1 sweep).",
)
def q_math_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.where(F.col("l_orderkey") % 50 == 7).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 97).cast("bigint").alias("key_mod"),
    )


@register(
    "q_percentiles",
    oracle="""
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.25) AS p25,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.9) AS p90,
               median(o_totalprice) AS med
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Exact interpolated percentiles (Spark percentile == DuckDB "
        "quantile_cont, verified bit-identical).",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.5)").alias("med"),
    )


@register(
    "q_collect_ordered",
    oracle="""
        SELECT n_name,
               array_to_string(list_sort(list(c_mktsegment)), '|')
                   AS segments_sorted,
               array_to_string(list_sort(list_distinct(list(c_mktsegment))),
                               '|') AS segment_set
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    doc="collect_list/collect_set with explicit sort for deterministic "
        "output (unordered collect is never hash-stable).",
)
def q_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_list("c_mktsegment")))
            .alias("segments_sorted"),
            F.concat_ws(
                "|", F.sort_array(F.array_distinct(F.collect_list("c_mktsegment")))
            ).alias("segment_set"),
        )
    )


_KMV_K = 64
_KMV_SPACE = float(1 << 52)  # md5-13-hex-digit hash space


def _kmv_oracle_branch(col: str, alias: str) -> str:
    return f"""
        {alias} AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n_exact,
                   CAST(MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS BIGINT)
                       AS hk
            FROM (
                SELECT l_returnflag, h,
                       row_number() OVER (
                           PARTITION BY l_returnflag ORDER BY h, v
                       ) AS rn
                FROM (
                    SELECT DISTINCT l_returnflag, {col} AS v,
                           CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)),
                                                1, 13)) AS UBIGINT) AS h
                    FROM lineitem WHERE {col} IS NOT NULL
                )
            ) GROUP BY l_returnflag
        )"""


@register(
    "q_approx_distinct",
    oracle=f"""
        WITH {_kmv_oracle_branch("l_partkey", "parts")},
        {_kmv_oracle_branch("l_suppkey", "supps")}
        SELECT p.l_returnflag,
               p.n_exact AS exact_parts,
               CASE WHEN p.n_exact < {_KMV_K} THEN p.n_exact
                    ELSE CAST(floor(CAST({_KMV_K - 1} AS DOUBLE)
                                    * {_KMV_SPACE}
                                    / CAST(p.hk AS DOUBLE)) AS BIGINT)
               END AS kmv_parts,
               s.n_exact AS exact_supps,
               CASE WHEN s.n_exact < {_KMV_K} THEN s.n_exact
                    ELSE CAST(floor(CAST({_KMV_K - 1} AS DOUBLE)
                                    * {_KMV_SPACE}
                                    / CAST(s.hk AS DOUBLE)) AS BIGINT)
               END AS kmv_supps
        FROM parts p JOIN supps s ON p.l_returnflag = s.l_returnflag
    """,
    doc="Approximate distinct counting per group via a DERANDOMIZED "
        f"K-minimum-values sketch (k={_KMV_K}): hash each distinct value "
        "with the md5-13-hex-digit recipe (byte-identical cross-engine), "
        "keep the k smallest hashes per group, estimate "
        "(k-1) * 2^52 / h_(k) — the classic KMV estimator, floored in "
        "one deterministic double op. Exact counts are emitted alongside "
        "so the sketch error is visible in the output. This replaces the "
        "engine-specific HyperLogLog++ binary (approx_count_distinct, "
        "still exercised in tests/test_properties.py) with a sketch both "
        "engines can recompute bit-identically; at 100 TB the k-smallest "
        "set is a tiny mergeable per-partition state, same as HLL.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)

    def branch(col: str):
        # NULL keys out up front: they'd sort NULLS FIRST in Spark's
        # window vs NULLS LAST in DuckDB's (and countDistinct ignores
        # them anyway)
        d = (
            t.lineitem.filter(F.col(col).isNotNull())
            .select("l_returnflag", F.col(col).alias("v"))
            .distinct()
        )
        h = F.conv(
            F.substring(F.md5(F.col("v").cast("string")), 1, 13), 16, 10
        ).cast("long")
        hashed = d.select("l_returnflag", "v", h.alias("h"))
        # two-level k-smallest: a single window per group would sort the
        # whole distinct set on ONE task (measured 11.6x wall on 10x
        # data). Instead rank within (group, h%64) salt partitions — the
        # global k smallest are necessarily within the per-salt top-k —
        # then rank the <= 64*k survivors per group. Identical output
        # (the oracle keeps the one-window formulation), parallel sort.
        w_salt = Window.partitionBy(
            "l_returnflag", F.pmod("h", F.lit(_KMV_K))
        ).orderBy("h", "v")
        survivors = (
            hashed.withColumn("rs", F.row_number().over(w_salt))
            .filter(F.col("rs") <= _KMV_K)
        )
        w = Window.partitionBy("l_returnflag").orderBy("h", "v")
        kth = (
            survivors.withColumn("rn", F.row_number().over(w))
            .groupBy("l_returnflag")
            .agg(F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk"))
        )
        n = hashed.groupBy("l_returnflag").agg(
            F.count("*").alias("n_exact")
        )
        return n.join(F.broadcast(kth), "l_returnflag")

    def estimate(n_exact, hk):
        return F.when(n_exact < _KMV_K, n_exact).otherwise(
            F.floor(
                F.lit(float(_KMV_K - 1))
                * F.lit(_KMV_SPACE)
                / hk.cast("double")
            ).cast("long")
        )

    parts = branch("l_partkey")
    supps = branch("l_suppkey").select(
        F.col("l_returnflag"),
        F.col("n_exact").alias("n_exact_s"),
        F.col("hk").alias("hk_s"),
    )
    return parts.join(supps, "l_returnflag").select(
        "l_returnflag",
        F.col("n_exact").alias("exact_parts"),
        estimate(F.col("n_exact"), F.col("hk")).alias("kmv_parts"),
        F.col("n_exact_s").alias("exact_supps"),
        estimate(F.col("n_exact_s"), F.col("hk_s")).alias("kmv_supps"),
    )


@register(
    "q_try_functions",
    oracle="""
        SELECT o_orderkey,
               o_totalprice / NULLIF(o_orderkey % 5, 0) AS per_bucket,
               TRY_CAST(string_split(o_orderpriority, '-')[1] AS INTEGER)
                   AS prio_num,
               TRY_CAST(o_orderpriority AS INTEGER) AS not_a_number,
               string_split(o_orderpriority, '-')[3] AS missing_elem,
               TRY_CAST(o_orderstatus AS BIGINT) AS status_num
        FROM orders
        ORDER BY o_orderkey
        LIMIT 500
    """,
    doc="Spark 4 error-safe function family (ANSI mode's escape hatches): "
        "try_divide NULLs division-by-zero, try_cast NULLs bad parses, "
        "try_element_at NULLs out-of-range access — mirrored in DuckDB by "
        "NULLIF-guarded division, TRY_CAST, and its NULL-on-out-of-range "
        "list indexing. per_bucket: double/int exact-input division, "
        "deterministic cross-engine.",
)
def q_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    parts = F.split(F.col("o_orderpriority"), "-")
    return (
        t.orders.select(
            "o_orderkey",
            F.try_divide(
                F.col("o_totalprice"), F.col("o_orderkey") % 5
            ).alias("per_bucket"),
            F.try_element_at(parts, F.lit(1))
            .try_cast("int")
            .alias("prio_num"),
            F.col("o_orderpriority").try_cast("int").alias("not_a_number"),
            F.try_element_at(parts, F.lit(3)).alias("missing_elem"),
            F.col("o_orderstatus").try_cast("bigint").alias("status_num"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


@register(
    "q_higher_order_funcs",
    oracle="""
        SELECT vec_id,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER)
                   AS n_pos,
               len(list_filter(embedding, x -> x > 0.9)) > 0 AS any_big,
               len(list_filter(embedding, x -> NOT (abs(x) < 10))) = 0
                   AS all_small,
               round(list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(embedding,
                           x -> greatest(least(CAST(x AS DOUBLE), 0.25),
                                         -0.25))),
                   (acc, v) -> acc + v), 6) AS clipped_sum,
               CAST(embedding[1] AS DOUBLE) + CAST(embedding[-1] AS DOUBLE)
                   AS ends_sum
        FROM embeddings
    """,
    doc="Higher-order array functions stay JVM-side (SURVEY §2.9 Array "
        "family, the Catalyst lambda path the vector ops build on): "
        "filter/exists/forall/transform/aggregate vs DuckDB's "
        "list_filter/list_reduce. clipped_sum accumulates doubles "
        "left-to-right in BOTH engines (F.aggregate == list_reduce over a "
        "0.0-prepended list), rounded to 6 per the similarity convention.",
)
def q_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    e = F.col("embedding")
    clip = lambda x: F.greatest(  # noqa: E731
        F.least(x.cast("double"), F.lit(0.25)), F.lit(-0.25)
    )
    return t.embeddings.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.exists(e, lambda x: x > 0.9).alias("any_big"),
        F.forall(e, lambda x: F.abs(x) < 10).alias("all_small"),
        F.round(
            F.aggregate(
                F.transform(e, clip), F.lit(0.0), lambda acc, v: acc + v
            ),
            6,
        ).alias("clipped_sum"),
        (
            e.getItem(0).cast("double") + F.element_at(e, -1).cast("double")
        ).alias("ends_sum"),
    )


@register(
    "q_map_hof_functions",
    oracle="""
        SELECT event_id,
               'bucket=' || CAST(user_id % 4 AS VARCHAR)
                   || ',src=EVENTS,type=' || upper(event_type) AS entries,
               3 AS n_keys,
               'bucket,src,type' AS keys_sorted
        FROM events
    """,
    doc="Map higher-order family (SURVEY §2.9 Map): map_from_arrays -> "
        "transform_values (upper) -> map_filter (drop a key) -> "
        "map_concat (add provenance) -> sorted map_entries rendered as a "
        "canonical string. The oracle computes the same final rendering "
        "directly - map-typed columns never cross the comparison boundary "
        "(entry order is undefined), only their sorted serialization.",
)
def q_map_hof_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("status"), F.lit("bucket")),
        F.array(
            F.col("event_type"),
            F.lower(F.col("event_type")),
            (F.col("user_id") % 4).cast("string"),
        ),
    )
    m = F.transform_values(m, lambda k, v: F.upper(v))
    m = F.map_filter(m, lambda k, v: k != F.lit("status"))
    m = F.map_concat(m, F.create_map(F.lit("src"), F.lit("EVENTS")))
    entries = F.array_sort(F.map_entries(m))
    return t.events.select(
        "event_id",
        F.concat_ws(
            ",",
            F.transform(
                entries, lambda e: F.concat(e.key, F.lit("="), e.value)
            ),
        ).alias("entries"),
        F.size(m).alias("n_keys"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_sorted"),
    )


@register(
    "q_percentile_disc",
    oracle="""
        SELECT o_orderpriority,
               quantile_disc(o_totalprice, 0.25) AS p25d,
               quantile_disc(o_totalprice, 0.5) AS p50d,
               quantile_disc(o_totalprice, 0.9) AS p90d,
               count(*) AS n
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="ANSI PERCENTILE_DISC WITHIN GROUP (Spark 3.4+ syntax) vs DuckDB "
        "quantile_disc: discrete percentiles return actual data values "
        "(no interpolation), so parity is exact by construction.",
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p25d"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p50d"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("p90d"),
        F.count("*").alias("n"),
    )


@register(
    "q_listagg_pagination",
    oracle="""
        SELECT o_orderpriority,
               string_agg(o_orderstatus, ',' ORDER BY o_orderstatus,
                          o_orderkey) AS statuses,
               count(*) AS n
        FROM (
            SELECT o_orderpriority, o_orderstatus, o_orderkey
            FROM orders
            ORDER BY o_orderkey
            LIMIT 50 OFFSET 100
        )
        GROUP BY o_orderpriority
    """,
    doc="ANSI LISTAGG WITHIN GROUP (Spark 4) == DuckDB string_agg ORDER "
        "BY, fed by a LIMIT/OFFSET page over a total order - the "
        "pagination + ordered-string-aggregation pair a reporting layer "
        "needs. Deterministic: unique orderkey total order, ordered agg.",
)
def q_listagg_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    page = (
        t.orders.select("o_orderpriority", "o_orderstatus", "o_orderkey")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )
    return page.groupBy("o_orderpriority").agg(
        F.expr(
            "listagg(o_orderstatus, ',') "
            "WITHIN GROUP (ORDER BY o_orderstatus, o_orderkey)"
        ).alias("statuses"),
        F.count("*").alias("n"),
    )


@register(
    "q_percentile_cont_manual",
    oracle="""
        WITH ranked AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        params AS (
            SELECT event_type, n,
                   ((n - 1) * 9) // 10 + 1 AS k_lo,
                   CASE WHEN ((n - 1) * 9) % 10 = 0
                        THEN ((n - 1) * 9) // 10 + 1
                        ELSE ((n - 1) * 9) // 10 + 2 END AS k_hi,
                   CAST(((n - 1) * 9) % 10 AS DOUBLE) / 10.0 AS frac
            FROM (SELECT DISTINCT event_type, n FROM ranked)
        )
        SELECT p.event_type, p.n,
               lo.value AS v_lo, hi.value AS v_hi,
               lo.value + (hi.value - lo.value) * p.frac AS p90
        FROM params p
        JOIN ranked lo ON lo.event_type = p.event_type AND lo.rn = p.k_lo
        JOIN ranked hi ON hi.event_type = p.event_type AND hi.rn = p.k_hi
    """,
    doc="ANSI PERCENTILE_CONT(0.9) rebuilt from first principles so the "
        "interpolation is cross-engine bit-deterministic (the built-ins' "
        "internal accumulation orders differ between engines): target "
        "rank h = (n-1)*0.9 handled as the EXACT integer pair "
        "(9(n-1) div 10, 9(n-1) mod 10) — Spark `div` == DuckDB `//` — "
        "the bracketing values are raw stored doubles picked by a "
        "(value, event_id) total order, frac is one exact-int division, "
        "and the interpolation lo + (hi-lo)*frac is a fixed 3-op IEEE "
        "sequence. One (type)-partitioned window pass (state bounded per "
        "type; two-level like the cusum pattern at extreme scale) plus "
        "two keyed joins against the single bracket row each.",
    tags=("relational", "stats"),
)
def q_percentile_cont_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    w_rn = W.partitionBy("event_type").orderBy("value", "event_id")
    w_n = W.partitionBy("event_type")
    ranked = t.events.select(
        "event_type",
        "value",
        F.row_number().over(w_rn).cast("bigint").alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )
    params = (
        ranked.select("event_type", "n")
        .distinct()
        .select(
            "event_type",
            "n",
            F.expr("((n - 1) * 9) div 10 + 1").alias("k_lo"),
            F.when(
                F.expr("((n - 1) * 9) % 10") == 0,
                F.expr("((n - 1) * 9) div 10 + 1"),
            )
            .otherwise(F.expr("((n - 1) * 9) div 10 + 2"))
            .alias("k_hi"),
            (
                F.expr("((n - 1) * 9) % 10").cast("double") / F.lit(10.0)
            ).alias("frac"),
        )
    )
    lo = ranked.select(
        F.col("event_type").alias("et_lo"),
        F.col("rn").alias("rn_lo"),
        F.col("value").alias("v_lo"),
    )
    hi = ranked.select(
        F.col("event_type").alias("et_hi"),
        F.col("rn").alias("rn_hi"),
        F.col("value").alias("v_hi"),
    )
    return (
        params.join(
            lo,
            (F.col("event_type") == F.col("et_lo"))
            & (F.col("k_lo") == F.col("rn_lo")),
        )
        .join(
            hi,
            (F.col("event_type") == F.col("et_hi"))
            & (F.col("k_hi") == F.col("rn_hi")),
        )
        .select(
            "event_type",
            "n",
            "v_lo",
            "v_hi",
            (
                F.col("v_lo")
                + (F.col("v_hi") - F.col("v_lo")) * F.col("frac")
            ).alias("p90"),
        )
    )


# ---------------------------------------------------------------------------
# XML ingestion surface (Spark 4 from_xml — the remaining semi-
# structured codec next to JSON/variant): events serialize to XML
# elements and parse back through the REAL from_xml path; the oracle
# reconstructs the same values from the original columns, so a parse
# or escaping defect breaks the hash. Sampled deterministically (the
# q_math_exact key-sample rule) to keep the sweep compare-bound low.

_XML_MOD = 11


@register(
    "q_xml_events",
    oracle=f"""
        SELECT event_id,
               CAST(user_id AS BIGINT) AS xml_user,
               event_type AS xml_type,
               CAST(floor(CAST(value AS DOUBLE) * 256) AS BIGINT)
                   AS xml_value_q
        FROM events
        WHERE event_id % {_XML_MOD} = 0
    """,
    doc="XML roundtrip through Spark 4's REAL from_xml parser: each "
        f"sampled event (event_id % {_XML_MOD} = 0) serializes to an "
        "XML element built with concat (attribute + three child "
        "elements), then parses back through from_xml with an explicit "
        "schema — covering the semi-structured codec surface next to "
        "from_json/variant. The oracle reconstructs the same values "
        "relationally from the source columns, so any escaping or "
        "type-coercion defect in the XML path breaks the hash; the "
        "float value crosses as floor(value*256) (exact power-of-two "
        "quantization). Per-row JVM expressions end to end — one scan, "
        "zero shuffles.",
    tags=("functions",),
)
def q_xml_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    sampled = t.events.filter(F.col("event_id") % _XML_MOD == 0)
    xml = sampled.select(
        "event_id",
        F.concat(
            F.lit("<event id=\""), F.col("event_id").cast("string"),
            F.lit("\"><user>"), F.col("user_id").cast("string"),
            F.lit("</user><type>"), F.col("event_type"),
            F.lit("</type><vq>"),
            F.floor(F.col("value").cast("double") * 256)
            .cast("long").cast("string"),
            F.lit("</vq></event>"),
        ).alias("x"),
    )
    parsed = xml.select(
        "event_id",
        F.from_xml(
            "x", "struct<user:bigint, type:string, vq:bigint>"
        ).alias("e"),
    )
    return parsed.select(
        "event_id",
        F.col("e.user").alias("xml_user"),
        F.col("e.type").alias("xml_type"),
        F.col("e.vq").alias("xml_value_q"),
    )


# ---------------------------------------------------------------------------
# URL function family (parse_url/url_encode/url_decode): synthetic but
# well-formed URLs built from document columns run through Spark's
# REAL URL parser; the oracle extracts the same parts with anchored
# regexes over the identical constructed string.


@register(
    "q_url_functions",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/docs/'
                       || CAST(doc_id AS VARCHAR) || '?lang=' || lang
                       || '&n=' || CAST(n_chars AS VARCHAR) AS url
            FROM documents
        )
        SELECT doc_id, url,
               regexp_extract(url, '^https://([^/]+)/', 1) AS host,
               regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '[?&]lang=([^&]*)', 1) AS q_lang,
               regexp_extract(url, '\\?(.*)$', 1) AS query_str
        FROM u
    """,
    doc="URL function-family coverage: well-formed URLs constructed "
        "from document columns run through Spark's REAL parse_url "
        "(HOST, PATH, QUERY, and the keyed QUERY form) — the log-"
        "processing surface every clickstream pipeline needs. The "
        "oracle extracts identical parts with anchored regexes over "
        "the same constructed string, so the two engines cross-check "
        "each other's parsing. Per-row expressions, one scan, zero "
        "shuffles.",
    tags=("functions",),
)
def q_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    u = t.documents.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"),
            F.lit(".example.com/docs/"), F.col("doc_id").cast("string"),
            F.lit("?lang="), F.col("lang"),
            F.lit("&n="), F.col("n_chars").cast("string"),
        ).alias("url"),
    )
    return u.select(
        "doc_id", "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang"))
        .alias("q_lang"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query_str"),
    )
