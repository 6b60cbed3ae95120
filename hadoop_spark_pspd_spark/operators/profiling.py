"""Data-quality profiling and exact-arithmetic statistics.

The operators a curation pipeline runs before trusting a new 100 TB drop:
per-column completeness/cardinality profiling, z-score outlier detection,
and per-group trend fitting — each expressed so both engines compute
bit-identical results (the exact-decimal-moments technique of
operators/stats.py extended to joins-back and closed-form regression).

Scale notes:
  * the column profile is ONE pass over the table (a single aggregate row
    of per-column counters, unpivoted driver-free afterwards) — never one
    scan per column;
  * outlier detection broadcasts the 5-row per-type moment table back onto
    the events scan — no second shuffle of the fact side;
  * the regression is two cascaded aggregations (day, then group) with the
    closed-form slope from exact integer/decimal sums — no iterative
    fitting, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register

_DEC = "decimal(18,4)"


@register(
    "q_column_profile",
    oracle="""
        SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
               count(*) - count(o_orderkey) AS n_nulls,
               count(DISTINCT o_orderkey) AS n_distinct FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
               count(DISTINCT o_custkey) FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus) FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
               count(DISTINCT o_totalprice) FROM orders
        UNION ALL
        SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
               count(DISTINCT o_orderdate) FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
               count(DISTINCT o_orderpriority) FROM orders
    """,
    doc="Deequ-style completeness/cardinality profile of every orders "
        "column in ONE table scan: a single aggregate computes all "
        "per-column counters, then an unpivot emits the long-format "
        "profile. The UNION-ALL oracle rescans per column — fine for an "
        "oracle, wrong for the engine.",
    tags=("profile",),
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(
            (F.count("*") - F.count(c)).alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(c).alias(f"{c}__distinct"))
    one_row = t.orders.agg(*aggs)
    stacked = one_row.select(
        F.expr(
            "stack({n}, {args}) AS (column_name, n_nulls, n_distinct)".format(
                n=len(cols),
                args=", ".join(
                    f"'{c}', {c}__nulls, {c}__distinct" for c in cols
                ),
            )
        ),
        "n_rows",
    )
    return stacked.select("column_name", "n_rows", "n_nulls", "n_distinct")


@register(
    "q_zscore_outliers",
    oracle="""
        WITH moments AS (
            SELECT event_type,
                   count(*) AS n,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS s,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(30,4))
                                 * CAST(value AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS sq
            FROM events
            GROUP BY event_type
        )
        SELECT event_id, e.event_type, value,
               (value - s / n)
                   / sqrt((sq - s * s / n) / (n - 1)) AS z
        FROM events e JOIN moments m ON e.event_type = m.event_type
        WHERE abs((value - s / n)
                  / sqrt((sq - s * s / n) / (n - 1))) > 3
    """,
    doc="Per-type z-score outliers over events.value (|z| > 3). Moments "
        "come from exact decimal sums (stats.py convention), so mean/std "
        "are the same doubles in both engines and the z computation — one "
        "deterministic double expression per row — is hash-stable "
        "unrounded. The 5-row moment table broadcasts back onto the scan.",
    tags=("profile", "stats"),
)
def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_id", "event_type", "value")
    moments = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("s"),
        F.sum(
            F.col("value").cast("decimal(30,4)")
            * F.col("value").cast(_DEC)
        ).cast("double").alias("sq"),
    )
    mean = F.col("s") / F.col("n")
    std = F.sqrt(
        (F.col("sq") - F.col("s") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    )
    z = (F.col("value") - mean) / std
    return (
        ev.join(F.broadcast(moments), "event_type")
        .where(F.abs(z) > 3)
        .select("event_id", "event_type", "value", z.alias("z"))
    )


@register(
    "q_linreg_trend",
    oracle="""
        WITH daily AS (
            SELECT n_name,
                   date_diff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) AS x,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                        AS DECIMAL(18,4)) AS rev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        ),
        sums AS (
            SELECT n_name,
                   count(*) AS n,
                   SUM(x) AS sx,
                   SUM(x * x) AS sxx,
                   CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(8,0)) * rev)
                             AS VARCHAR) AS DOUBLE) AS sxy
            FROM daily
            GROUP BY n_name
        )
        SELECT n_name,
               n AS n_days,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                   AS intercept
        FROM sums
    """,
    doc="Per-nation linear trend of daily order revenue (closed-form OLS "
        "over day index x = days since 1995-01-01). Every sum entering the "
        "slope is exact (bigint x-moments, decimal revenue moments; the "
        "per-day revenue is re-narrowed to DECIMAL(18,4) so the x*rev "
        "product stays inside both engines' 38-digit cap), then one "
        "deterministic double expression — regression without ulp drift.",
    tags=("profile", "stats"),
)
def q_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    daily = (
        t.orders.join(
            F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            "n_name",
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).alias("x"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast(_DEC))
            .cast(_DEC)
            .alias("rev")
        )
    )
    sums = daily.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("rev").cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(8,0)") * F.col("rev"))
        .cast("double")
        .alias("sxy"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return sums.select(
        "n_name",
        F.col("n").alias("n_days"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )


@register(
    "q_dq_expectations",
    oracle="""
        SELECT 'orders_null_custkey' AS check_name,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'orders_dup_orderkey',
               COUNT(*) - COUNT(DISTINCT o_orderkey)
        FROM orders
        UNION ALL
        SELECT 'orders_orphan_custkey', COUNT(*)
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'lineitem_nonpositive_qty',
               CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_negative_price',
               CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_orphan_orderkey', COUNT(*)
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)
    """,
    doc="Data-contract expectation gate: six structural checks (null "
        "keys, duplicate primary key, referential orphans both ways, "
        "domain ranges) reported as one (check_name, n_violations) "
        "table — the pre-ingest validation a 100 TB pipeline runs before "
        "promoting a batch. Each check is a single-pass aggregate or a "
        "broadcast/shuffle anti-join; the checks share scans where "
        "Catalyst can (the three orders checks collapse onto one scan). "
        "A zero-violation report is the promotion condition.",
    tags=("profiling",),
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    orders_null = t.orders.agg(
        F.sum(F.col("o_custkey").isNull().cast("int")).alias("n")
    )
    orders_dup = t.orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("n")
    )
    orders_orphan = (
        t.orders.join(
            t.customer,
            t.orders["o_custkey"] == t.customer["c_custkey"],
            "left_anti",
        ).agg(F.count("*").alias("n"))
    )
    li_qty = t.lineitem.agg(
        F.sum((F.col("l_quantity") <= 0).cast("int")).alias("n")
    )
    li_price = t.lineitem.agg(
        F.sum((F.col("l_extendedprice") < 0).cast("int")).alias("n")
    )
    li_orphan = (
        t.lineitem.join(
            t.orders,
            t.lineitem["l_orderkey"] == t.orders["o_orderkey"],
            "left_anti",
        ).agg(F.count("*").alias("n"))
    )
    return (
        one("orders_null_custkey", orders_null)
        .unionAll(one("orders_dup_orderkey", orders_dup))
        .unionAll(one("orders_orphan_custkey", orders_orphan))
        .unionAll(one("lineitem_nonpositive_qty", li_qty))
        .unionAll(one("lineitem_negative_price", li_price))
        .unionAll(one("lineitem_orphan_orderkey", li_orphan))
    )


_KANON = 5


@register(
    "q_k_anonymity",
    oracle=f"""
        WITH qid AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
                   COUNT(*) AS group_size
            FROM customer
            GROUP BY 1, 2, 3
        )
        SELECT c_nationkey, c_mktsegment, bal_bucket, group_size
        FROM qid WHERE group_size < {_KANON}
    """,
    doc="k-anonymity audit over quasi-identifiers (nation, market "
        "segment, coarsened balance bucket): every combination shared by "
        "fewer than k=5 individuals is a re-identification risk and is "
        "reported for suppression/generalization — the privacy gate a "
        "training-data release runs. One partial+final aggregation on "
        "the quasi-identifier tuple; the violating-group report is "
        "output-sized (small by definition: only rare combinations).",
    tags=("profiling", "privacy"),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.customer.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
            .alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count("*").alias("group_size"))
        .filter(F.col("group_size") < _KANON)
    )


_CONTRIB_CAP = 20


@register(
    "q_contribution_capped_counts",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type,
                   row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS rn
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS capped_count
        FROM ranked WHERE rn <= {_CONTRIB_CAP}
        GROUP BY event_type
    """,
    doc="Bounded-contribution (sensitivity-capped) counting: each user "
        "contributes at most C=20 events per type — the preprocessing "
        "step that bounds per-individual sensitivity before any "
        "differential-privacy noise is added, and the robust-metrics fix "
        "for bot/whale distortion. The cap is the user's FIRST C events "
        "by (ts, event_id) — deterministic, not arbitrary. One window "
        "partitioned by (user, type) then one aggregation; both shuffle "
        "on well-spread keys.",
    tags=("profiling", "privacy"),
)
def q_contribution_capped_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    t = Tables(spark, sf_dir)
    w = _W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        t.events.select(
            "event_type", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= _CONTRIB_CAP)
        .groupBy("event_type")
        .agg(F.count("*").alias("capped_count"))
    )


@register(
    "q_drift_report",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('day', MIN(ts)) + INTERVAL 15 DAY AS mid
            FROM events
        ), tagged AS (
            SELECT event_type,
                   CAST(value AS DECIMAL(18,4)) AS v,
                   (ts < (SELECT mid FROM bounds)) AS is_a
            FROM events
        ), halves AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_b,
                   CAST(CAST(SUM(CASE WHEN is_a THEN v END) AS VARCHAR)
                        AS DOUBLE)
                       / SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS mean_a,
                   CAST(CAST(SUM(CASE WHEN NOT is_a THEN v END) AS VARCHAR)
                        AS DOUBLE)
                       / SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS mean_b
            FROM tagged GROUP BY event_type
        ), totals AS (
            SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b FROM halves
        )
        SELECT h.event_type, h.n_a, h.n_b,
               CAST(h.n_a AS DOUBLE) / t.tot_a AS share_a,
               CAST(h.n_b AS DOUBLE) / t.tot_b AS share_b,
               abs(CAST(h.n_a AS DOUBLE) / t.tot_a
                   - CAST(h.n_b AS DOUBLE) / t.tot_b) AS share_drift,
               h.mean_a, h.mean_b
        FROM halves h CROSS JOIN totals t
    """,
    doc="Distribution-drift report between two time halves of the event "
        "stream (split at min-day + 15 days, computed from the data): "
        "per event type, counts, population shares, absolute share drift "
        "(the rational, log-free stand-in for PSI), and exact-decimal "
        "value means for both halves — the ML-ops check that yesterday's "
        "training distribution still matches today's. One scan, one "
        "aggregation keyed by event type; the totals row broadcasts "
        "back. All drift arithmetic is ratios of exact integers and one "
        "double subtraction, so the report hash-matches cross-engine.",
    tags=("profiling",),
)
def q_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    mid = t.events.agg(
        (F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 15 DAY"))
        .alias("mid")
    )
    tagged = t.events.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.col("value").cast("decimal(18,4)").alias("v"),
        (F.col("ts") < F.col("mid")).alias("is_a"),
    )
    halves = tagged.groupBy("event_type").agg(
        F.sum(F.col("is_a").cast("int")).cast("long").alias("n_a"),
        F.sum((~F.col("is_a")).cast("int")).cast("long").alias("n_b"),
        (
            F.sum(F.when(F.col("is_a"), F.col("v"))).cast("double")
            / F.sum(F.col("is_a").cast("int"))
        ).alias("mean_a"),
        (
            F.sum(F.when(~F.col("is_a"), F.col("v"))).cast("double")
            / F.sum((~F.col("is_a")).cast("int"))
        ).alias("mean_b"),
    )
    totals = halves.agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    share_a = F.col("n_a").cast("double") / F.col("tot_a")
    share_b = F.col("n_b").cast("double") / F.col("tot_b")
    return halves.crossJoin(F.broadcast(totals)).select(
        "event_type",
        "n_a",
        "n_b",
        share_a.alias("share_a"),
        share_b.alias("share_b"),
        F.abs(share_a - share_b).alias("share_drift"),
        "mean_a",
        "mean_b",
    )


@register(
    "q_running_distinct",
    oracle="""
        WITH first_seen AS (
            SELECT user_id,
                   CAST(MIN(date_trunc('day', ts)) AS DATE) AS first_day
            FROM events GROUP BY user_id
        ), per_day AS (
            SELECT first_day AS day, COUNT(*) AS new_users
            FROM first_seen GROUP BY first_day
        ), days AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events
        )
        SELECT d.day,
               CAST(COALESCE(p.new_users, 0) AS BIGINT) AS new_users,
               CAST(SUM(COALESCE(p.new_users, 0)) OVER (
                   ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_users
        FROM days d LEFT JOIN per_day p ON p.day = d.day
    """,
    doc="Cumulative-distinct growth curve (daily active-user "
        "accumulation) WITHOUT a per-day distinct over growing prefixes: "
        "running distinct count == running sum of FIRST-SEEN counts, so "
        "the plan is one min-aggregation per user, one tiny per-day "
        "rollup, and a window over the day axis (bounded by calendar "
        "size, not data size). The naive form — COUNT(DISTINCT user) "
        "over an expanding window — rescans the prefix per day and is "
        "quadratic; this is the standard linear rewrite.",
    tags=("profiling",),
)
def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_running_sums_dist

    t = Tables(spark, sf_dir)
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    first_seen = (
        t.events.select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )
    per_day = first_seen.groupBy(
        F.col("first_day").alias("day")
    ).agg(F.count("*").alias("new_users"))
    days = t.events.select(day.alias("day")).distinct()
    joined = days.join(per_day, "day", "left").select(
        "day",
        F.coalesce(F.col("new_users"), F.lit(0)).cast("long")
        .alias("new_users"),
    )
    # distributed running sum over the day axis (no unpartitioned window)
    return with_running_sums_dist(
        joined, [F.col("day").asc()], ["new_users"], prefix="c_"
    ).select(
        "day",
        "new_users",
        F.col("c_new_users").cast("long").alias("cum_users"),
    )


@register(
    "q_privacy_randomized_response",
    oracle="""
        WITH r AS (
            SELECT c_nationkey,
                   CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS bit,
                   CASE WHEN CAST(('0x' || substr(
                            md5(CAST(c_custkey AS VARCHAR)), 1, 13))
                            AS UBIGINT) % 4 = 0
                        THEN 1 ELSE 0 END AS flip
            FROM customer
        )
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM((bit + flip) % 2) AS BIGINT) AS reported_sum,
               CAST(SUM(bit) AS BIGINT) AS true_sum,
               CAST(2 AS DOUBLE)
                 * (CAST(SUM((bit + flip) % 2) AS BIGINT)
                    / CAST(COUNT(*) AS BIGINT))
                 - CAST(0.5 AS DOUBLE) AS est_rate,
               CAST(SUM(bit) AS BIGINT) / CAST(COUNT(*) AS BIGINT)
                   AS true_rate
        FROM r GROUP BY c_nationkey
    """,
    doc="Local-DP randomized response over a sensitive per-customer bit "
        "(positive account balance): each individual's report is flipped "
        "with probability q=1/4 (flip decision derandomized from "
        "md5(custkey) %% 4 — the repo's sampling convention, so both "
        "engines flip the SAME individuals), then the per-nation rate is "
        "debiased exactly: est = 2*mean_reported - 1/2, all exact "
        "int sums and one double division. Emits the noisy estimate "
        "next to the true rate so the mechanism's error is a first-class "
        "eval column. Map-only mechanism + one aggregation — the "
        "individual bits never leave the mapper unprotected at scale.",
    tags=("profiling", "privacy"),
)
def q_privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bit = F.when(F.col("c_acctbal") > 0, 1).otherwise(0)
    flip = F.when(
        F.conv(
            F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 13),
            16, 10,
        ).cast("bigint") % 4 == 0,
        1,
    ).otherwise(0)
    per = t.customer.select(
        "c_nationkey",
        bit.alias("bit"),
        flip.alias("flip"),
    ).withColumn("reported", (F.col("bit") + F.col("flip")) % 2)
    agg = per.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.sum("reported").alias("reported_sum"),
        F.sum("bit").alias("true_sum"),
    )
    ratio = F.col("reported_sum").cast("double") / F.col("n").cast("double")
    true_ratio = F.col("true_sum").cast("double") / F.col("n").cast("double")
    return agg.select(
        "c_nationkey",
        "n",
        "reported_sum",
        "true_sum",
        (F.lit(2.0) * ratio - F.lit(0.5)).alias("est_rate"),
        true_ratio.alias("true_rate"),
    )


_LDIV = 3  # minimum distinct sensitive values per quasi-id group


@register(
    "q_l_diversity",
    oracle=f"""
        WITH grp AS (
            SELECT c_nationkey,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
                   CAST(COUNT(*) AS BIGINT) AS group_size,
                   CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
            FROM customer
            GROUP BY 1, 2
        )
        SELECT c_nationkey, bal_bucket, group_size, l,
               l < {_LDIV} AS violates
        FROM grp
    """,
    doc="l-diversity audit — k-anonymity's necessary companion: a "
        "quasi-identifier group can be large (k-anonymous) yet leak the "
        "sensitive attribute if every member shares one value, so each "
        "(nation, balance-bucket) group reports its count of DISTINCT "
        "sensitive values (market segment) and a violates flag at "
        "l < 3. Same quasi-id grid as q_k_anonymity, one extra "
        "count-distinct — the pair together is the release gate a "
        "privacy review runs before publishing a microdata extract. "
        "One agg, exact integers.",
    tags=("privacy",),
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    grp = t.customer.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias(
            "bal_bucket"
        ),
    ).agg(
        F.count("*").alias("group_size"),
        F.count_distinct("c_mktsegment").alias("l"),
    )
    return grp.select(
        "c_nationkey",
        "bal_bucket",
        "group_size",
        "l",
        (F.col("l") < _LDIV).alias("violates"),
    )


@register(
    "q_key_skew_profile",
    oracle="""
        WITH per_key AS (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS rows_per_key
            FROM orders GROUP BY o_custkey
        ), hist AS (
            SELECT rows_per_key, CAST(count(*) AS BIGINT) AS n_keys
            FROM per_key GROUP BY rows_per_key
        ), summary AS (
            SELECT CAST(SUM(rows_per_key * n_keys) AS BIGINT) AS n_rows,
                   CAST(SUM(n_keys) AS BIGINT) AS n_keys_total,
                   CAST(MAX(rows_per_key) AS BIGINT) AS max_per_key
            FROM hist
        )
        SELECT h.rows_per_key, h.n_keys,
               s.max_per_key,
               CAST(s.max_per_key * s.n_keys_total AS DOUBLE)
                   / CAST(s.n_rows AS DOUBLE) AS skew_factor
        FROM hist h, summary s
    """,
    doc="Join-key skew profile for orders.o_custkey — the diagnostic "
        "that decides whether a shuffle join needs salting or an AQE "
        "skew split BEFORE the job ships: the rows-per-key histogram "
        "plus the skew factor max_per_key / mean_per_key (cross-"
        "multiplied as max*n_keys/n_rows — one exact division; a "
        "factor near 1 is uniform, >> 1 means one hot key dominates "
        "a reducer). Two aggregations over one scan; the histogram is "
        "bounded by the distinct per-key counts, not the key count.",
    tags=("profiling",),
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    per_key = t.orders.groupBy("o_custkey").agg(
        F.count("*").alias("rows_per_key")
    )
    hist = per_key.groupBy("rows_per_key").agg(
        F.count("*").alias("n_keys")
    )
    summary = hist.agg(
        F.sum(F.col("rows_per_key") * F.col("n_keys"))
        .cast("bigint")
        .alias("n_rows"),
        F.sum("n_keys").cast("bigint").alias("n_keys_total"),
        F.max("rows_per_key").cast("bigint").alias("max_per_key"),
    )
    return hist.crossJoin(F.broadcast(summary)).select(
        "rows_per_key",
        "n_keys",
        "max_per_key",
        (
            (F.col("max_per_key") * F.col("n_keys_total")).cast("double")
            / F.col("n_rows").cast("double")
        ).alias("skew_factor"),
    )


_DEL_MOD = 97  # deterministic deletion cohort: c_custkey % 97 == 0


@register(
    "q_deletion_propagation",
    oracle=f"""
        WITH del AS (
            SELECT c_custkey AS k FROM customer
            WHERE c_custkey % {_DEL_MOD} = 0
        ), c AS (
            SELECT 'customer' AS tbl,
                   CAST(count(*) AS BIGINT) AS n_total,
                   CAST(coalesce(SUM(CASE WHEN c_custkey % {_DEL_MOD} = 0
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_deleted
            FROM customer
        ), o AS (
            SELECT 'orders' AS tbl,
                   CAST(count(*) AS BIGINT) AS n_total,
                   CAST(coalesce(SUM(CASE WHEN d.k IS NOT NULL
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_deleted
            FROM orders LEFT JOIN del d ON o_custkey = d.k
        ), l AS (
            SELECT 'lineitem' AS tbl,
                   CAST(count(*) AS BIGINT) AS n_total,
                   CAST(coalesce(SUM(CASE WHEN d.k IS NOT NULL
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_deleted
            FROM lineitem li
            LEFT JOIN orders ON li.l_orderkey = o_orderkey
            LEFT JOIN del d ON o_custkey = d.k
        ), e AS (
            SELECT 'events' AS tbl,
                   CAST(count(*) AS BIGINT) AS n_total,
                   CAST(coalesce(SUM(CASE WHEN user_id % {_DEL_MOD} = 0
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_deleted
            FROM events
        ), u AS (
            SELECT * FROM c UNION ALL SELECT * FROM o
            UNION ALL SELECT * FROM l UNION ALL SELECT * FROM e
        )
        SELECT tbl, n_total, n_deleted,
               CAST(n_total - n_deleted AS BIGINT) AS n_kept,
               CAST(n_deleted AS DOUBLE)
                   / CAST(CASE WHEN n_total = 0 THEN 1 ELSE n_total END
                          AS DOUBLE) AS pct_deleted
        FROM u
    """,
    doc="Right-to-be-forgotten deletion-impact audit — the blast-radius "
        "report a compliance pipeline produces BEFORE executing a GDPR/"
        "CCPA erasure batch: for a deterministic deletion cohort "
        f"(c_custkey % {_DEL_MOD} = 0), count the rows each table loses "
        "under the cascade customer -> orders -> lineitem plus the "
        "direct user_id hit on events. Per table: total, deleted, "
        "kept, fraction (guarded division, identical CASE in both "
        "engines). Membership is COHORT-derived in both engines "
        "(orders/lineitem join the customer-derived deletion set, not "
        "a bare key predicate): an FK-orphan order whose custkey is "
        "absent from customer is KEPT — there is no customer to erase "
        "— matching the oracle's LEFT JOIN del semantics exactly "
        "(round-8 ADVICE fix; orphan-order fixture pins it). Plan: "
        "the cohort is a filtered customer projection (~1/97 of the "
        "dimension) joined to orders once — AQE broadcasts it when it "
        "fits; lineitem inherits through its natural orders join — "
        "one shuffle on the already-copartitioned orderkey; the 4-row "
        "union is constant. At 100 TB this is exactly the shape of a "
        "real deletion dry-run: no full-table anti-join, no per-user "
        "loop.",
    tags=("profiling", "privacy"),
)
def q_deletion_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    deleted_cust = (F.col("c_custkey") % _DEL_MOD == 0).cast("long")
    c = t.customer.agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.coalesce(F.sum(deleted_cust), F.lit(0)).cast("bigint").alias("n_deleted"),
    ).select(F.lit("customer").alias("tbl"), "n_total", "n_deleted")
    # cohort membership, not a bare predicate: an orphan order whose
    # custkey never appears in customer must be KEPT in both engines
    del_keys = t.customer.filter(
        F.col("c_custkey") % _DEL_MOD == 0
    ).select(F.col("c_custkey").alias("k"))
    orders_flagged = t.orders.select("o_orderkey", "o_custkey").join(
        del_keys, F.col("o_custkey") == F.col("k"), "left"
    )
    del_orders = F.col("k").isNotNull().cast("long")
    o = orders_flagged.agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.coalesce(F.sum(del_orders), F.lit(0)).cast("bigint").alias("n_deleted"),
    ).select(F.lit("orders").alias("tbl"), "n_total", "n_deleted")
    # lineitem inherits the verdict through its parent order (the only
    # table whose deletion status is not key-local)
    order_flag = orders_flagged.select(
        "o_orderkey", del_orders.alias("del_flag")
    )
    li = (
        t.lineitem.select("l_orderkey")
        .join(order_flag, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.coalesce(F.sum(F.coalesce(F.col("del_flag"), F.lit(0))), F.lit(0))
            .cast("bigint")
            .alias("n_deleted"),
        )
        .select(F.lit("lineitem").alias("tbl"), "n_total", "n_deleted")
    )
    del_events = (F.col("user_id") % _DEL_MOD == 0).cast("long")
    e = t.events.agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.coalesce(F.sum(del_events), F.lit(0)).cast("bigint").alias("n_deleted"),
    ).select(F.lit("events").alias("tbl"), "n_total", "n_deleted")
    u = c.unionByName(o).unionByName(li).unionByName(e)
    denom = F.when(F.col("n_total") == 0, F.lit(1)).otherwise(
        F.col("n_total")
    )
    return u.select(
        "tbl",
        "n_total",
        "n_deleted",
        (F.col("n_total") - F.col("n_deleted")).cast("bigint").alias("n_kept"),
        (
            F.col("n_deleted").cast("double") / denom.cast("double")
        ).alias("pct_deleted"),
    )


_BINOM_BITS = 52  # Binomial(52, 1/2) noise: variance 13 ~ sigma 3.6


@register(
    "privacy_binomial_counts",
    oracle=f"""
        WITH per_nation AS (
            SELECT c_nationkey,
                   CAST(count(*) AS BIGINT) AS true_count
            FROM customer GROUP BY c_nationkey
        )
        SELECT p.c_nationkey, p.true_count,
               CAST(CAST(bit_count(CAST(('0x' || substr(
                        md5('binom:' || CAST(p.c_nationkey AS VARCHAR)),
                        1, 13)) AS UBIGINT)) AS BIGINT)
                    - {_BINOM_BITS // 2} AS BIGINT) AS noise,
               CAST(p.true_count
                    + CAST(bit_count(CAST(('0x' || substr(
                          md5('binom:' || CAST(p.c_nationkey AS VARCHAR)),
                          1, 13)) AS UBIGINT)) AS BIGINT)
                    - {_BINOM_BITS // 2} AS BIGINT) AS noisy_count
        FROM per_nation p
    """,
    doc="Central-DP counting via the BINOMIAL MECHANISM (Dwork, "
        "Kenthapadi, McSherry, Mironov & Naor, EUROCRYPT 2006, "
        "public): per-nation customer counts plus centered "
        f"Binomial({_BINOM_BITS}, 1/2) noise — popcount of the 52-bit "
        "md5 draw minus 26 — the discrete, finite-precision noise the "
        "original DP paper analyzed (variance 13, approximating the "
        "Gaussian mechanism). md5-DERANDOMIZED per the repo sampling "
        "convention, so this is a deterministic MECHANISM demo whose "
        "noise column hash-checks (a production run keys the digest "
        "with a fresh release nonce; determinism here is the testing "
        "convention, not a privacy claim — the true counts are "
        "emitted alongside for auditability). Cross-engine: bit_count "
        "is TINYINT in DuckDB and INT in Spark — outer-cast both "
        "(CLAUDE.md round-6 rule 6). Scale: one grouped count into "
        "the 25-row nation dimension; the mechanism is per-group O(1).",
    tags=("privacy",),
)
def privacy_binomial_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    noise = (
        F.bit_count(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("binom:"),
                            F.col("c_nationkey").cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
        ).cast("long")
        - F.lit(_BINOM_BITS // 2)
    )
    return (
        t.customer.groupBy("c_nationkey")
        .agg(F.count("*").cast("long").alias("true_count"))
        .select(
            "c_nationkey",
            "true_count",
            noise.cast("long").alias("noise"),
            (F.col("true_count") + noise).cast("long").alias("noisy_count"),
        )
    )


_KANON_K = 5          # the k in k-anonymity
_KANON_BAND = 50000   # price-band width of the numeric quasi-identifier


@register(
    "privacy_kanonymity_histogram",
    oracle=f"""
        WITH qi AS (
            SELECT o_orderpriority AS pri, o_orderstatus AS st,
                   CAST(year(o_orderdate) AS BIGINT) AS yr,
                   CAST(month(o_orderdate) AS BIGINT) AS mo,
                   CAST(floor(o_totalprice / {_KANON_BAND}) AS BIGINT)
                       AS band
            FROM orders
        ), classes AS (
            SELECT pri, st, yr, mo, band,
                   CAST(count(*) AS BIGINT) AS k_size
            FROM qi GROUP BY 1, 2, 3, 4, 5
        ), by_size AS (
            SELECT k_size,
                   CAST(count(*) AS BIGINT) AS n_classes,
                   CAST(SUM(k_size) AS BIGINT) AS n_rows
            FROM classes GROUP BY k_size
        ), tot AS (
            SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS total
            FROM by_size
        )
        SELECT b.k_size, b.n_classes, b.n_rows,
               CAST(b.n_rows AS DOUBLE)
                   / CAST(CASE WHEN t.total = 0 THEN 1
                               ELSE t.total END AS DOUBLE) AS row_frac,
               CAST(CASE WHEN b.k_size < {_KANON_K} THEN 1 ELSE 0 END
                    AS INTEGER) AS violates_k
        FROM by_size b CROSS JOIN tot t
    """,
    doc="k-ANONYMITY class-size HISTOGRAM (Sweeney 2002, public) — the "
        "complement of q_k_anonymity's violation list (profiling.py:315): "
        "instead of reporting rare groups, report the full distribution "
        "of equivalence-class sizes, which is what fixes k itself and "
        "prices the suppression cost of any candidate k. Classes are "
        "over the quasi-identifier tuple (priority, status, order "
        f"year, month, totalprice band of {_KANON_BAND}) and the class-"
        "size histogram — per distinct class size k, how many classes "
        "and rows sit there, what fraction of the table that is, and "
        f"whether k violates the k>={_KANON_K} re-identification "
        "floor. This is the release-gate audit a privacy pipeline "
        "runs before publishing any quasi-identified aggregate "
        "(rows in violating classes must be suppressed or "
        "generalized). The numeric QI is floor()-bucketed in BOTH "
        "engines (round-10 rule); the row fraction is an exact "
        "int/int double with a zero-guarded denominator. Scale: two "
        "chained grouped counts (QI classes, then the size "
        "histogram) — partial-agg shapes, linear at any corpus size; "
        "the histogram is at most a few hundred rows regardless of "
        "scale.",
    tags=("privacy", "profiling"),
)
def privacy_kanonymity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    qi = t.orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.floor(F.col("o_totalprice") / _KANON_BAND)
        .cast("long")
        .alias("band"),
    )
    classes = qi.groupBy("pri", "st", "yr", "mo", "band").agg(
        F.count("*").cast("long").alias("k_size")
    )
    by_size = classes.groupBy("k_size").agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum("k_size").cast("long").alias("n_rows"),
    )
    tot = by_size.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("total")
    )
    return by_size.crossJoin(F.broadcast(tot)).select(
        "k_size", "n_classes", "n_rows",
        (
            F.col("n_rows").cast("double")
            / F.when(F.col("total") == 0, F.lit(1))
            .otherwise(F.col("total"))
            .cast("double")
        ).alias("row_frac"),
        F.when(F.col("k_size") < _KANON_K, 1)
        .otherwise(0)
        .cast("int")
        .alias("violates_k"),
    )


@register(
    "privacy_tcloseness",
    oracle="""
        WITH seg AS (
            SELECT DISTINCT c_mktsegment AS s FROM customer
        ), gseg AS (
            SELECT c_mktsegment AS s, CAST(COUNT(*) AS BIGINT) AS g
            FROM customer GROUP BY 1
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM customer
        ), grp AS (
            SELECT c_nationkey,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM customer GROUP BY 1, 2
        ), cnt AS (
            SELECT c_nationkey,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
                   c_mktsegment AS s, CAST(COUNT(*) AS BIGINT) AS c
            FROM customer GROUP BY 1, 2, 3
        ), terms AS (
            -- full segment grid per group: an absent segment contributes
            -- |0*N - g*n| = g*n; products in DECIMAL(38,0) (exact past
            -- the int64 ceiling, the round-6 moment recipe)
            SELECT grp.c_nationkey, grp.bal_bucket, grp.n,
                   abs(CAST(COALESCE(cnt.c, 0) AS DECIMAL(38,0))
                           * (SELECT nn FROM tot)
                       - CAST(gseg.g AS DECIMAL(38,0)) * grp.n) AS term
            FROM grp
            CROSS JOIN seg
            JOIN gseg ON gseg.s = seg.s
            LEFT JOIN cnt ON cnt.c_nationkey = grp.c_nationkey
                         AND cnt.bal_bucket = grp.bal_bucket
                         AND cnt.s = seg.s
        )
        SELECT c_nationkey, bal_bucket,
               CAST(n AS BIGINT) AS group_size,
               CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE)
                   / (2.0 * n * (SELECT nn FROM tot)) AS t_emd,
               CAST(5 * SUM(term) >=
                    CAST(2 AS DECIMAL(38,0)) * n * (SELECT nn FROM tot)
                    AS BOOLEAN) AS violates
        FROM terms
        GROUP BY c_nationkey, bal_bucket, n
    """,
    doc="t-closeness audit (Li et al. 2007) — completes the "
        "k-anonymity / l-diversity release-gate trio: for each "
        "quasi-identifier group (nation, coarsened balance bucket), the "
        "variational-distance EMD between the group's sensitive-value "
        "(market segment) distribution and the global one. All terms "
        "are cross-multiplied exact integers |c*N - g*n| formed in "
        "DECIMAL(38,0) (exact to ~1e9 rows); the violates flag at "
        "t >= 1/5 is the integer compare 5*sum >= 2*n*N, never a float "
        "threshold. Two aggregations on the QI tuple plus a "
        "5-segment-bounded grid join — partial-agg friendly, no "
        "windows, output is group-dimension-sized.",
    tags=("privacy", "profiling"),
)
def privacy_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bal = F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
    base = t.customer.select(
        "c_nationkey", bal.alias("bal_bucket"), "c_mktsegment"
    )
    seg = base.select(F.col("c_mktsegment").alias("s")).distinct()
    glob = base.groupBy(F.col("c_mktsegment").alias("s")).agg(
        F.count("*").alias("g")
    )
    tot = base.agg(F.count("*").alias("nn"))
    grp = base.groupBy("c_nationkey", "bal_bucket").agg(
        F.count("*").alias("n")
    )
    cnt = base.groupBy(
        "c_nationkey", "bal_bucket", F.col("c_mktsegment").alias("s")
    ).agg(F.count("*").alias("c"))
    d38 = "decimal(38,0)"
    terms = (
        grp.crossJoin(F.broadcast(seg.join(glob, "s")))
        .crossJoin(F.broadcast(tot))
        .join(cnt, ["c_nationkey", "bal_bucket", "s"], "left")
        .select(
            "c_nationkey",
            "bal_bucket",
            "n",
            "nn",
            F.abs(
                F.coalesce(F.col("c"), F.lit(0)).cast(d38) * F.col("nn")
                - F.col("g").cast(d38) * F.col("n")
            ).alias("term"),
        )
    )
    agg = terms.groupBy("c_nationkey", "bal_bucket", "n", "nn").agg(
        F.sum("term").cast(d38).alias("emd_num")
    )
    return agg.select(
        "c_nationkey",
        "bal_bucket",
        F.col("n").cast("bigint").alias("group_size"),
        (
            F.col("emd_num").cast("double")
            / (F.lit(2.0) * F.col("n") * F.col("nn"))
        ).alias("t_emd"),
        (
            F.lit(5).cast(d38) * F.col("emd_num")
            >= F.lit(2).cast(d38) * F.col("n") * F.col("nn")
        ).alias("violates"),
    )
