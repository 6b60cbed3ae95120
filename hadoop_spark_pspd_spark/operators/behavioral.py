"""Behavioral / product analytics over the events stream-as-table.

Funnel progression, retention cohorts, and ordered-sequence detection —
the event-log query family every clickstream warehouse runs. The reference
corpus (events table, SURVEY §2 A2/T1 shapes) stops at windowed counts;
these extend the family to multi-stage per-user analysis.

Scale notes (100 TB events):
  * every stage keys on ``user_id`` — one hash partitioning reused across
    the per-user aggregations (AQE coalesces the re-use; no broadcast of
    anything user-cardinality-sized);
  * the funnel avoids per-user event sorting entirely: each stage is a
    conditional min() aggregation, so the plan is partial-agg -> shuffle ->
    final-agg per stage, never a giant window sort;
  * sequence detection (strictly ordered triple) genuinely needs the
    per-user ordering, so it uses one window sort — the minimum possible;
  * all outputs are integer counts / exact timestamps: hash-stable
    cross-engine with no float conventions needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import Tables
from ..registry import register


@register(
    "q_funnel_stages",
    oracle="""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1
            FROM events WHERE event_type = 'view'
            GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT stage, users FROM (
            SELECT 1 AS stage, count(*) AS users FROM s1
            UNION ALL SELECT 2, count(*) FROM s2
            UNION ALL SELECT 3, count(*) FROM s3
        )
    """,
    doc="Three-stage ordered funnel (view -> click -> purchase): a user "
        "advances to stage N only with an event strictly after their "
        "stage-N-1 timestamp. Each stage is a conditional-min aggregation "
        "keyed on user_id (no window sort); the three shuffles share one "
        "hash partitioning.",
    bench=True,
    tags=("behavioral",),
)
def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_type", "ts")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    one = (
        s1.agg(F.count("*").alias("users"))
        .select(F.lit(1).alias("stage"), "users")
    )
    two = (
        s2.agg(F.count("*").alias("users"))
        .select(F.lit(2).alias("stage"), "users")
    )
    three = (
        s3.agg(F.count("*").alias("users"))
        .select(F.lit(3).alias("stage"), "users")
    )
    return one.unionAll(two).unionAll(three)


@register(
    "q_retention_cohorts",
    oracle="""
        WITH firsts AS (
            SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        )
        SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day,
               CAST(date_diff('day', cohort_day,
                              CAST(date_trunc('day', e.ts) AS DATE)) AS INT)
                   AS day_offset,
               count(DISTINCT e.user_id) AS active_users
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        GROUP BY 1, 2
    """,
    doc="Classic retention triangle: cohort = first-activity day per user; "
        "for each (cohort, day-offset) count distinct users active that "
        "day. Integer/date arithmetic only — hash-stable by construction. "
        "Both shuffles key on user_id before the final small (cohort, "
        "offset) aggregation.",
    tags=("behavioral",),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", F.to_date("ts").alias("day"))
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "q_sequence_triples",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3,
                   lead(ts, 2) OVER w AS ts3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, count(*) AS n_patterns,
               min(ts) AS first_match_ts
        FROM ordered
        WHERE event_type = 'view' AND e2 = 'click' AND e3 = 'purchase'
              -- 48h in micros as one literal: DuckDB evaluates
              -- 3600 * 1000000 in INT32 and overflows
              AND epoch_us(ts3) - epoch_us(ts) <= 172800000000
        GROUP BY user_id
    """,
    doc="MATCH_RECOGNIZE-style strict-sequence detection: three "
        "consecutive events per user forming view->click->purchase within "
        "48 hours (sized to the corpus's ~10h per-user event cadence). One "
        "per-user window sort (the minimum for ordered patterns), then a "
        "plain aggregation.",
    tags=("behavioral",),
)
def q_sequence_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = t.events.select(
        "user_id",
        "event_type",
        "ts",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        F.lead("ts", 2).over(w).alias("ts3"),
    )
    match = ordered.where(
        (F.col("event_type") == "view")
        & (F.col("e2") == "click")
        & (F.col("e3") == "purchase")
        & (
            F.unix_micros("ts3") - F.unix_micros("ts")
            <= 172_800 * 1_000_000
        )
    )
    return match.groupBy("user_id").agg(
        F.count("*").alias("n_patterns"),
        F.min("ts").alias("first_match_ts"),
    )


@register(
    "q_funnel_latency",
    oracle="""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1
            FROM events WHERE event_type = 'view'
            GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, s1.t1, min(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id, s1.t1
        ),
        s3 AS (
            SELECT e.user_id, s2.t2, min(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id, s2.t2
        ),
        gaps AS (
            SELECT 2 AS stage, epoch_us(t2) - epoch_us(t1) AS gap_us FROM s2
            UNION ALL
            SELECT 3, epoch_us(t3) - epoch_us(t2) FROM s3
        )
        SELECT stage,
               count(*) AS n_converted,
               quantile_disc(gap_us, 0.5) AS p50_us,
               quantile_disc(gap_us, 0.9) AS p90_us
        FROM gaps
        GROUP BY stage
    """,
    doc="Time-to-convert distribution per funnel stage: the exact integer "
        "microsecond gap between a user's stage-(N-1) and stage-N "
        "timestamps, summarized with discrete percentiles (actual data "
        "values — exact cross-engine, per q_percentile_disc).",
    tags=("behavioral",),
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_type", "ts")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2.select("user_id", "t2"), "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id", "t2")
        .agg(F.min("ts").alias("t3"))
    )
    gaps = s2.select(
        F.lit(2).alias("stage"),
        (F.unix_micros("t2") - F.unix_micros("t1")).alias("gap_us"),
    ).unionAll(
        s3.select(
            F.lit(3).alias("stage"),
            (F.unix_micros("t3") - F.unix_micros("t2")).alias("gap_us"),
        )
    )
    return gaps.groupBy("stage").agg(
        F.count("*").alias("n_converted"),
        # Spark's percentile_disc returns DOUBLE even over bigint; the
        # values are exact micro gaps << 2^53, so the round-trip is lossless
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)")
        .cast("bigint")
        .alias("p50_us"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_us)")
        .cast("bigint")
        .alias("p90_us"),
    )


@register(
    "q_markov_transitions",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        SELECT prev_type, event_type AS next_type,
               count(*) AS n,
               CAST(count(*) AS DOUBLE)
                   / sum(count(*)) OVER (PARTITION BY prev_type) AS p
        FROM ordered
        WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    """,
    doc="First-order Markov transition matrix of the per-user event "
        "journey: lag over (user_id, ts) then a (prev, next) count; the "
        "transition probability is one integer/integer double division "
        "(hash-stable). The 25-cell matrix is the user-flow profile "
        "product analytics derives sankeys from.",
    tags=("behavioral",),
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = t.events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    counts = (
        ordered.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    row_tot = W.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(row_tot)).alias("p"),
    )


_RULE_MINSUP = 2
_RULE_TOPN = 50


@register(
    "q_assoc_rules",
    oracle=f"""
        WITH baskets AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), item_supp AS (
            SELECT l_partkey AS item, COUNT(*) AS supp FROM baskets
            GROUP BY l_partkey
        ), pair_supp AS (
            SELECT a.l_partkey AS ia, b.l_partkey AS ib, COUNT(*) AS supp
            FROM baskets a JOIN baskets b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY ia, ib
        ), n AS (
            SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets
        ), rules AS (
            SELECT ia AS antecedent, ib AS consequent, supp AS pair_supp
            FROM pair_supp WHERE supp >= {_RULE_MINSUP}
            UNION ALL
            SELECT ib, ia, supp
            FROM pair_supp WHERE supp >= {_RULE_MINSUP}
        ), scored AS (
            SELECT r.antecedent, r.consequent, r.pair_supp,
                   sa.supp AS ant_supp, sc.supp AS cons_supp,
                   CAST(r.pair_supp AS DOUBLE) / sa.supp AS confidence,
                   CAST(n.n_orders * r.pair_supp AS DOUBLE)
                       / CAST(sa.supp * sc.supp AS DOUBLE) AS lift
            FROM rules r
            CROSS JOIN n
            JOIN item_supp sa ON r.antecedent = sa.item
            JOIN item_supp sc ON r.consequent = sc.item
        ), ranked AS (
            SELECT *, row_number() OVER (
                ORDER BY pair_supp DESC, antecedent, consequent) AS rn
            FROM scored
        )
        SELECT antecedent, consequent, pair_supp, ant_supp, cons_supp,
               confidence, lift, rn
        FROM ranked WHERE rn <= {_RULE_TOPN}
    """,
    doc="Association-rule mining (market-basket support/confidence/lift) "
        "over order baskets. Pair supports come from per-order sorted "
        "item-list expansion (basket size is bounded ~7, so the i<j "
        "product is map-side linear — never a baskets self-join); item "
        "supports and the rule join are broadcast-sized. Lift is kept "
        "rational (n*supp_ab / (supp_a*supp_b), exact int products, one "
        "double division) so it hash-matches cross-engine — no log/PMI. "
        "Top rules ranked by support with unique (antecedent, consequent) "
        "tie-break.",
    tags=("behavioral",),
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    baskets = t.lineitem.select("l_orderkey", "l_partkey").distinct()
    items = baskets.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("items"),
            lambda x: F.transform(
                F.filter(F.col("items"), lambda y: y > x),
                lambda y: F.struct(x.alias("ia"), y.alias("ib")),
            ),
        )
    )
    pair_supp = (
        items.select(F.explode(pair_arr).alias("p"))
        .select("p.ia", "p.ib")
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("pair_supp"))
        .filter(F.col("pair_supp") >= _RULE_MINSUP)
    )
    item_supp = baskets.groupBy("l_partkey").agg(
        F.count("*").alias("supp")
    )
    n = baskets.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    rules = pair_supp.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        "pair_supp",
    ).unionAll(
        pair_supp.select(
            F.col("ib").alias("antecedent"),
            F.col("ia").alias("consequent"),
            "pair_supp",
        )
    )
    sa = item_supp.select(
        F.col("l_partkey").alias("antecedent"), F.col("supp").alias("ant_supp")
    )
    sc = item_supp.select(
        F.col("l_partkey").alias("consequent"),
        F.col("supp").alias("cons_supp"),
    )
    scored = (
        rules.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sc), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent", "consequent", "pair_supp", "ant_supp", "cons_supp",
            (F.col("pair_supp").cast("double") / F.col("ant_supp"))
            .alias("confidence"),
            (
                (F.col("n_orders") * F.col("pair_supp")).cast("double")
                / (F.col("ant_supp") * F.col("cons_supp")).cast("double")
            ).alias("lift"),
        )
    )
    # distributed top-N first (TakeOrderedAndProject: per-partition k-heap,
    # driver merge), THEN a windowless rank over only the surviving N rows
    # (sorted-array posexplode — no WindowExec at all)
    from ..functions.ranking import ranked_rows

    top = scored.orderBy(
        F.desc("pair_supp"), "antecedent", "consequent"
    ).limit(_RULE_TOPN)
    return ranked_rows(
        top,
        [(-F.col("pair_supp")), F.col("antecedent"), F.col("consequent")],
        [
            "antecedent", "consequent", "pair_supp", "ant_supp",
            "cons_supp", "confidence", "lift",
        ],
        rank_col="rn",
    ).select(
        "antecedent", "consequent", "pair_supp", "ant_supp", "cons_supp",
        "confidence", "lift", F.col("rn").cast("long").alias("rn"),
    )


@register(
    "q_attribution_multitouch",
    oracle="""
        WITH conv AS (
            SELECT user_id, ts AS cts, event_id AS cid
            FROM events WHERE event_type = 'purchase'
        ),
        tch AS (
            SELECT user_id, ts, event_id, event_type
            FROM events WHERE event_type IN ('view', 'click')
        ),
        ranked AS (
            SELECT t.event_type,
                   row_number() OVER (
                       PARTITION BY c.cid
                       ORDER BY t.ts DESC, t.event_id DESC
                   ) AS rk
            FROM conv c
            JOIN tch t ON c.user_id = t.user_id AND t.ts < c.cts
        )
        SELECT event_type AS touch_type,
               count(*) AS touches,
               SUM(CAST(1 AS DOUBLE) / CAST((CAST(1 AS BIGINT) << rk)
                   AS DOUBLE)) AS credit
        FROM ranked WHERE rk <= 8
        GROUP BY event_type
    """,
    doc="Time-decay multi-touch attribution: each purchase conversion "
        "distributes credit 2^-k to its k-th most recent preceding "
        "view/click touch (k <= 8, unique tie-break ts desc, event_id "
        "desc), aggregated per touch type. The conversion-touch join is "
        "a user-keyed equi-join (per-user event counts are bounded by "
        "data semantics) followed by ONE window rank per conversion — "
        "no cross-user pairs ever form. Exactness: credits are dyadic "
        "rationals with denominator 2^8, so the double SUM is exact and "
        "order-free cross-engine (no HUGEINT drift: a DOUBLE sum stays "
        "DOUBLE in DuckDB).",
)
def q_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    conv = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    tch = t.events.filter(
        F.col("event_type").isin("view", "click")
    ).select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("cid").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = (
        conv.join(tch, "user_id")
        .filter(F.col("ts") < F.col("cts"))
        .select("event_type", F.row_number().over(w).alias("rk"))
    )
    credit = F.lit(1.0) / F.expr("CAST(shiftleft(1L, rk) AS DOUBLE)")
    return (
        ranked.filter(F.col("rk") <= 8)
        .groupBy(F.col("event_type").alias("touch_type"))
        .agg(
            F.count("*").alias("touches"),
            F.sum(credit).alias("credit"),
        )
    )


# ---------------------------------------------------------------------------
# Row-pattern matching over per-user event sequences — the
# MATCH_RECOGNIZE surface Spark SQL lacks, emulated by compiling each
# user's event stream to an initials string and running regexes over
# it. Patterns are kept ambiguity-free (char classes + forced suffix,
# no nested alternation) so Java regex and RE2 scan identically; the
# repo's BPE pre-tokenizer already pins leftmost-first alternation
# parity between the two engines (functions/text.py note).


@register(
    "q_event_regex_match",
    oracle="""
        WITH seqs AS (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(strlen(seq) AS BIGINT) AS seq_len,
               CAST(len(regexp_extract_all(seq, 'vp')) AS BIGINT) AS n_vp,
               CAST(len(regexp_extract_all(seq, 'v[ces]*p'))
                    AS BIGINT) AS n_funnel,
               CAST(coalesce(list_max(list_transform(
                        regexp_extract_all(seq, 'p+'),
                        x -> strlen(x))), 0) AS BIGINT) AS max_p_streak
        FROM seqs
    """,
    doc="Row-pattern matching (the SQL:2016 MATCH_RECOGNIZE shape, "
        "which Spark lacks natively — emulated the scalable way): each "
        "user's event stream compiles to an initials string in (ts, "
        "event_id) order via one sort_array fold (sequences are "
        "user-session-bounded), then funnel patterns run as regexes — "
        "adjacent view->purchase, view-then-purchase with no "
        "intervening view/purchase (v[ces]*p), and the longest "
        "purchase streak (max run of p+). Patterns are "
        "ambiguity-free, so Java regex (Spark) and RE2 (DuckDB) count "
        "identical non-overlapping matches — the same parity "
        "discipline as the BPE pre-tokenizer. One groupBy shuffle; "
        "regex scanning is per-row JVM work that parallelizes "
        "perfectly at 100 TB.",
    tags=("behavioral",),
)
def q_event_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    seqs = (
        t.events.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"),
                F.substring("event_type", 1, 1).alias("c"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list("s")), lambda x: x["c"]
                ),
            ).alias("seq")
        )
    )
    return seqs.select(
        "user_id",
        F.octet_length("seq").cast("bigint").alias("seq_len"),
        F.expr("regexp_count(seq, 'vp')").cast("bigint").alias("n_vp"),
        F.expr("regexp_count(seq, 'v[ces]*p')").cast("bigint")
        .alias("n_funnel"),
        F.coalesce(
            F.array_max(
                F.transform(
                    F.expr("regexp_extract_all(seq, 'p+', 0)"),
                    lambda x: F.octet_length(x).cast("bigint"),
                )
            ),
            F.lit(0).cast("bigint"),
        ).alias("max_p_streak"),
    )
