"""Statistical aggregates with cross-engine-exact formulations.

Built-in stddev/variance/corr accumulate in floating point with
engine-specific update orders (Welford vs two-pass vs naive) — never
hash-stable. Here the moments are derived from EXACT decimal sums
(sum, sum of squares, cross products), so both engines compute the same
doubles from the same exact integers-scaled-by-10^4, then apply one
deterministic arithmetic expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register
from .relational import dec


@register(
    "q_stats_moments",
    oracle="""
        SELECT o_orderpriority, n,
               s / n AS mean,
               (sq - s * s / n) / (n - 1) AS variance,
               sqrt((sq - s * s / n) / (n - 1)) AS stddev
        FROM (
            SELECT o_orderpriority,
                   count(*) AS n,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS s,
                   -- widen one operand: DuckDB's 18-digit x 18-digit
                   -- multiply stays in int64 and overflows on squares
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))
                                 * CAST(o_totalprice AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS sq
            FROM orders
            GROUP BY o_orderpriority
        )
    """,
    doc="Sample variance/stddev from exact decimal sums (engine-native "
        "stddev/var aggregates are accumulation-order-dependent and never "
        "hash-stable cross-engine).",
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("s"),
        F.sum(dec("o_totalprice") * dec("o_totalprice"))
        .cast("double").alias("sq"),
    )
    var = (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    return base.select(
        "o_orderpriority",
        "n",
        (F.col("s") / F.col("n")).alias("mean"),
        var.alias("variance"),
        F.sqrt(var).alias("stddev"),
    )


@register(
    "q_bitwise_agg",
    oracle="""
        SELECT o_orderpriority,
               CAST(bit_and(o_orderkey % 256) AS BIGINT) AS key_and,
               CAST(bit_or(o_orderkey % 256) AS BIGINT) AS key_or,
               CAST(bit_xor(o_orderkey % 256) AS BIGINT) AS key_xor
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Bitwise aggregate family (bit_and/bit_or/bit_xor) — order-"
        "independent, so exactly portable.",
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    k = (F.col("o_orderkey") % 256)
    return t.orders.groupBy("o_orderpriority").agg(
        F.bit_and(k).cast("bigint").alias("key_and"),
        F.bit_or(k).cast("bigint").alias("key_or"),
        F.bit_xor(k).cast("bigint").alias("key_xor"),
    )


@register(
    "q_regexp_extract_all",
    oracle="""
        SELECT p_partkey,
               array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',')
                   AS words,
               CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INTEGER)
                   AS n_words
        FROM part
    """,
    doc="regexp_extract_all: every match as an array (surfaced as a "
        "joined string for stable hashing).",
)
def q_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    matches = F.regexp_extract_all(F.col("p_name"), F.lit("[a-z]+"), 0)
    return t.part.select(
        "p_partkey",
        F.concat_ws(",", matches).alias("words"),
        F.size(matches).alias("n_words"),
    )


@register(
    "q_ab_test",
    oracle="""
        WITH arms AS (
            SELECT user_id % 2 AS variant,
                   count(*) AS n_events,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_purchases,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                 ELSE 0 END) AS DOUBLE) / count(*) AS rate
            FROM events GROUP BY 1
        )
        SELECT a.n_events AS n_a, a.n_purchases AS conv_a, a.rate AS rate_a,
               b.n_events AS n_b, b.n_purchases AS conv_b, b.rate AS rate_b,
               (a.rate - b.rate)
                   / sqrt(
                       (CAST(a.n_purchases + b.n_purchases AS DOUBLE)
                        / (a.n_events + b.n_events))
                       * (1 - CAST(a.n_purchases + b.n_purchases AS DOUBLE)
                              / (a.n_events + b.n_events))
                       * (1.0 / a.n_events + 1.0 / b.n_events)) AS z_stat
        FROM arms a JOIN arms b ON a.variant = 0 AND b.variant = 1
    """,
    doc="Two-proportion z-test for an A/B experiment over EVENT-level "
        "trials (variant = user_id % 2; a trial is one event, success = "
        "that event being a purchase — deliberately event-level, not "
        "per-user, so the pooled rate stays strictly interior at every "
        "SF; the trials are therefore not independent across a user's "
        "events, which the column names now state honestly): pooled-rate "
        "z-statistic from integer counts and exact integer-ratio doubles "
        "(sqrt is IEEE-correctly-rounded, so the statistic is "
        "hash-stable). One aggregation, one 2-row arm table.",
    tags=("stats",),
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    is_purchase = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    arms = t.events.groupBy(
        (F.col("user_id") % 2).alias("variant")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(is_purchase).cast("bigint").alias("n_purchases"),
        (F.sum(is_purchase).cast("double") / F.count("*")).alias("rate"),
    )
    a = arms.where(F.col("variant") == 0).alias("a")
    b = arms.where(F.col("variant") == 1).alias("b")
    pooled = (
        F.col("a.n_purchases") + F.col("b.n_purchases")
    ).cast("double") / (F.col("a.n_events") + F.col("b.n_events"))
    z = (F.col("a.rate") - F.col("b.rate")) / F.sqrt(
        pooled
        * (1 - pooled)
        * (1.0 / F.col("a.n_events") + 1.0 / F.col("b.n_events"))
    )
    return a.crossJoin(b).select(
        F.col("a.n_events").alias("n_a"),
        F.col("a.n_purchases").alias("conv_a"),
        F.col("a.rate").alias("rate_a"),
        F.col("b.n_events").alias("n_b"),
        F.col("b.n_purchases").alias("conv_b"),
        F.col("b.rate").alias("rate_b"),
        z.alias("z_stat"),
    )


@register(
    "q_equidepth_deciles",
    oracle="""
        SELECT ((rk - 1) * 10) // (SELECT count(*) FROM orders) + 1
                   AS decile,
               count(*) AS n,
               min(o_totalprice) AS lo, max(o_totalprice) AS hi
        FROM (
            SELECT o_totalprice,
                   row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                       AS rk
            FROM orders
        )
        GROUP BY 1
    """,
    doc="Equi-depth decile histogram of order totals: decile = "
        "((rank-1)*10) div N + 1 over the uniquely tie-broken (price, "
        "orderkey) ordering — stated in the oracle as one global "
        "row_number window, computed in the engine as a two-level prefix "
        "rank (within-price-range windows + broadcast per-range count "
        "offsets, the text_pack_shards pattern) so no global "
        "single-partition sort exists in the plan. Complements the "
        "fixed-width q_histogram_bins.",
    tags=("stats", "profile"),
)
def q_equidepth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    base = t.orders.select(
        "o_totalprice",
        "o_orderkey",
        F.floor(F.col("o_totalprice") / 25000).alias("rng"),
    )
    within_w = W.partitionBy("rng").orderBy("o_totalprice", "o_orderkey")
    per_row = base.withColumn(
        "within_rk", F.row_number().over(within_w).cast("bigint")
    )
    from ..functions.ranking import with_running_sums_dist

    offsets = with_running_sums_dist(
        base.groupBy("rng").agg(F.count("*").alias("rcnt")),
        [F.col("rng").asc()],
        ["rcnt"],
        prefix="off_",
        inclusive=False,
    ).select("rng", F.col("off_rcnt").alias("off"))
    n_total = t.orders.agg(F.count("*").alias("n_total"))
    ranked = (
        per_row.join(F.broadcast(offsets), "rng")
        .join(F.broadcast(n_total))
        .select(
            "o_totalprice",
            F.expr("(off + within_rk - 1) * 10 div n_total + 1")
            .alias("decile"),
        )
    )
    return ranked.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "q_mad_robust",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   quantile_disc(value, 0.5) AS median
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               m.median,
               quantile_disc(abs(value - m.median), 0.5) AS mad,
               count(*) AS n
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY e.event_type, m.median
    """,
    doc="Median absolute deviation per event type — the robust spread "
        "metric outlier pipelines prefer over stddev. Both medians are "
        "discrete percentiles (actual data values / exact double "
        "differences), so no accumulation-order noise exists anywhere. "
        "The 5-row median table broadcasts back onto the scan.",
    tags=("stats",),
)
def q_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
        .alias("median")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "median")
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP "
                "(ORDER BY abs(value - median))"
            ).alias("mad"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q_skew_salted_agg",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(18,4)))
                         AS VARCHAR) AS DOUBLE) AS total_value
        FROM events
        GROUP BY event_type
    """,
    doc="Skew-resistant two-phase aggregation: events has only a handful "
        "of event_type keys, so a plain groupBy lands each hot key on one "
        "reducer. Phase 1 groups by (event_type, deterministic salt of "
        "the row mod 16) — map-side partials spread each hot key over 16 "
        "reducers; phase 2 merges the 16 partials per key (dozens of "
        "rows). Decimal partial sums make the two-phase result exactly "
        "the one-phase result, which is what the oracle computes. The "
        "declarative alternative is AQE partial aggregation + skew "
        "handling; this is the explicit form streaming state ops need "
        "(AQE cannot re-plan stateful stages). value is FLOAT: both "
        "phases hop float->string->decimal per the repo convention.",
    tags=("stats", "skew"),
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    salt = F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("salt")
    partial = (
        t.events.select(
            "event_type",
            salt,
            F.col("value").cast("string").cast("decimal(18,4)").alias("v"),
        )
        .groupBy("event_type", "salt")
        .agg(F.count("*").alias("pn"), F.sum("v").alias("pv"))
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("pv").cast("double").alias("total_value"),
        )
    )


@register(
    "ml_wilson_bounds",
    oracle="""
        WITH arms AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pos
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        )
        SELECT segment, n, pos,
               CAST(pos + 2 AS DOUBLE) / CAST(n + 4 AS DOUBLE)
                   AS wilson_center,
               CAST(pos + 2 AS DOUBLE) / CAST(n + 4 AS DOUBLE)
               - 2.0 * sqrt(CAST(pos * (n - pos) + n AS DOUBLE)
                            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                               * CAST(n AS DOUBLE)))
                     * (CAST(n AS DOUBLE) / CAST(n + 4 AS DOUBLE))
                   AS wilson_lo,
               CAST(pos + 2 AS DOUBLE) / CAST(n + 4 AS DOUBLE)
               + 2.0 * sqrt(CAST(pos * (n - pos) + n AS DOUBLE)
                            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                               * CAST(n AS DOUBLE)))
                     * (CAST(n AS DOUBLE) / CAST(n + 4 AS DOUBLE))
                   AS wilson_hi
        FROM arms
    """,
    doc="Wilson score interval (z = 2, i.e. ~95.45%) for the per-segment "
        "URGENT-order rate — the small-sample-safe confidence readout an "
        "experimentation platform reports instead of the naive Wald "
        "interval. Choosing INTEGER z makes the algebra rational: the "
        "center collapses to the Agresti-Coull (pos+2)/(n+4) — one exact "
        "division — and the half-width is a FIXED op sequence "
        "(2*sqrt((pos(n-pos)+n)/n^3) * n/(n+4)) over 2^53-exact integer "
        "terms, so both engines produce bit-identical doubles with no "
        "quantization. The z=2 trick generalizes: any integer z keeps "
        "z^2 exact. Plan: one fact-dim join + one segment agg.",
    tags=("ml", "stats"),
)
def ml_wilson_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    arms = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                .otherwise(0)
            ).alias("pos"),
        )
    )
    n_d = F.col("n").cast("double")
    center = (F.col("pos") + 2).cast("double") / (F.col("n") + 4).cast(
        "double"
    )
    hw = (
        F.lit(2.0)
        * F.sqrt(
            (F.col("pos") * (F.col("n") - F.col("pos")) + F.col("n"))
            .cast("double")
            / (n_d * n_d * n_d)
        )
        * (n_d / (F.col("n") + 4).cast("double"))
    )
    return arms.select(
        "segment",
        "n",
        "pos",
        center.alias("wilson_center"),
        (center - hw).alias("wilson_lo"),
        (center + hw).alias("wilson_hi"),
    )


@register(
    "q_runs_test",
    oracle="""
        WITH seq AS (
            SELECT event_type,
                   CASE WHEN CAST(value AS DOUBLE) > 100.0
                        THEN 1 ELSE 0 END AS x,
                   lag(CASE WHEN CAST(value AS DOUBLE) > 100.0
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                   ) AS px
            FROM events
        ),
        stat AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS n1,
                   CAST(count(*) - SUM(x) AS BIGINT) AS n2,
                   CAST(1 + SUM(CASE WHEN px IS NOT NULL AND x <> px
                                     THEN 1 ELSE 0 END) AS BIGINT) AS runs
            FROM seq GROUP BY event_type
        ),
        dec AS (
            SELECT event_type, n, n1, n2, runs,
                   CAST(2 AS DECIMAL(38,0)) * n1 * n2
                   * (CAST(2 AS DECIMAL(38,0)) * n1 * n2 - n) AS vnum,
                   CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                   * (CAST(n AS DECIMAL(38,0)) - 1) AS vden
            FROM stat
        )
        SELECT event_type, n, n1, n2, runs,
               1.0 + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n AS DOUBLE)
                   AS expected_runs,
               CASE WHEN vnum > 0
                    THEN (CAST(runs AS DOUBLE)
                          - (1.0 + CAST(2 * n1 * n2 AS DOUBLE)
                                   / CAST(n AS DOUBLE)))
                         / sqrt(CAST(CAST(vnum AS VARCHAR) AS DOUBLE)
                                / CAST(CAST(vden AS VARCHAR) AS DOUBLE))
                    ELSE CAST(0 AS DOUBLE) END AS z_stat
        FROM dec
    """,
    doc="Wald-Wolfowitz runs test per event type: is the above/below-100 "
        "value sequence (ordered by the (ts, event_id) total order) "
        "random, or does it cluster? runs = 1 + sign-change count (one "
        "lag window, exact int), expected runs 1 + 2*n1*n2/n is one "
        "exact division (2*n1*n2 <= n^2/2 fits int64 to ~4e9 rows), and "
        "the variance numerator (~n^4) is formed in DECIMAL(38,0) with "
        "shortest-string double crossing (the spearman/MCC rule); z is "
        "then a fixed sub/div/sqrt sequence, degenerate one-class "
        "series guard to 0. The window partitions by type — two-level "
        "(per-day + boundary stitch) at extreme scale, the cusum "
        "pattern.",
    tags=("stats", "timeseries"),
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    x = F.when(F.col("value").cast("double") > 100.0, 1).otherwise(0)
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    seq = t.events.select(
        "event_type", x.alias("x"), F.lag(x).over(w).alias("px")
    )
    stat = seq.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("n1"),
        (F.count("*") - F.sum("x")).alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("px").isNotNull()
                    & (F.col("x") != F.col("px")),
                    1,
                ).otherwise(0)
            )
        ).alias("runs"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    n, n1, n2 = F.col("n"), F.col("n1"), F.col("n2")
    vnum = d(F.lit(2)) * d(n1) * d(n2) * (d(F.lit(2)) * d(n1) * d(n2) - d(n))
    vden = d(n) * d(n) * (d(n) - 1)
    expected = F.lit(1.0) + (2 * n1 * n2).cast("double") / n.cast("double")
    z = F.when(
        vnum > 0,
        (F.col("runs").cast("double") - expected)
        / F.sqrt(vnum.cast("double") / vden.cast("double")),
    ).otherwise(F.lit(0.0))
    return stat.select(
        "event_type", "n", "n1", "n2", "runs",
        expected.alias("expected_runs"),
        z.alias("z_stat"),
    )


@register(
    "q_benford_digits",
    oracle="""
        WITH cents AS (
            SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
                        AS BIGINT) AS c
            FROM orders
            WHERE CAST(o_totalprice AS DOUBLE) >= 0.01
        ),
        digits AS (
            SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER)
                       AS leading_digit
            FROM cents
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM digits)
        SELECT d.leading_digit,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(count(*) AS DOUBLE) / t.n AS share
        FROM digits d CROSS JOIN tot t
        GROUP BY d.leading_digit, t.n
    """,
    doc="Benford's-law audit of order totals: the leading-digit "
        "distribution a fraud/anomaly screen compares against "
        "log10(1+1/d). Digit extraction avoids every float-formatting "
        "trap: totals become integer cents via ONE fixed op sequence "
        "(floor(x*100 + 0.5) — floor is correctly rounded, no rounding-"
        "mode divergence), and the leading digit is the first character "
        "of the INTEGER's string — integer-to-string is unambiguous "
        "cross-engine, unlike double formatting. Share is one exact "
        "division (the expected Benford curve itself is transcendental, "
        "so it stays out of the hashed output — compare downstream). "
        "One map-side digit projection + a 9-bucket agg.",
    tags=("stats",),
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    c = F.floor(
        F.col("o_totalprice").cast("double") * F.lit(100.0) + F.lit(0.5)
    ).cast("bigint")
    digits = (
        t.orders.where(F.col("o_totalprice").cast("double") >= 0.01)
        .select(
            F.substring(c.cast("string"), 1, 1)
            .cast("int")
            .alias("leading_digit")
        )
    )
    tot = digits.agg(F.count("*").alias("n"))
    return (
        digits.groupBy("leading_digit")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .select(
            "leading_digit",
            "cnt",
            (F.col("cnt").cast("double") / F.col("n")).alias("share"),
        )
    )


@register(
    "q_abc_classification",
    oracle="""
        WITH rev AS (
            SELECT l_partkey AS partkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS r
            FROM lineitem GROUP BY l_partkey
        ),
        cum AS (
            SELECT partkey, r,
                   SUM(r) OVER (ORDER BY r DESC, partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cr,
                   SUM(r) OVER () AS total
            FROM rev
        ),
        classed AS (
            SELECT partkey,
                   CASE WHEN cr * 10 <= total * 8 THEN 'A'
                        WHEN cr * 20 <= total * 19 THEN 'B'
                        ELSE 'C' END AS abc_class,
                   r
            FROM cum
        )
        SELECT abc_class,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(CAST(SUM(r) AS VARCHAR) AS DOUBLE) AS class_revenue
        FROM classed
        GROUP BY abc_class
    """,
    doc="ABC inventory classification: parts ranked by exact-decimal "
        "revenue, class A = the prefix holding <= 80% of cumulative "
        "revenue, B to 95%, C the tail. The 80/95 boundaries are tested "
        "by DECIMAL CROSS-MULTIPLICATION (cr*10 <= total*8, cr*20 <= "
        "total*19) — exact integer-scaled decimal comparisons, so a "
        "part sitting ulp-close to a share boundary can NEVER classify "
        "differently across engines the way a double cum/total ratio "
        "could. The running sum is the DISTRIBUTED two-level cumsum "
        "(functions/ranking.with_running_sums_dist, DECIMAL(38,0) "
        "integer units) over the parts dimension — no unpartitioned "
        "window; output is the 3-row class profile.",
    tags=("stats", "relational"),
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_running_sums_dist

    t = Tables(spark, sf_dir)
    rev = t.lineitem.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("r")
    )
    # quantize revenue to exact 1e-4 integer units BEFORE the running
    # sum (round-6 convention) so the distributed cumsum accumulates in
    # DECIMAL(38,0) with no scale-capping rounding; the 80/95 boundary
    # cross-multiplications are invariant under the positive scaling
    rev_q = rev.withColumn(
        "r_units", (F.col("r") * 10000).cast("decimal(38,0)")
    )
    cum = with_running_sums_dist(
        rev_q,
        [F.col("r").desc(), F.col("partkey").asc()],
        ["r_units"],
        prefix="c",
        sum_type="decimal(38,0)",
    )
    total = rev.agg(
        (F.sum("r") * 10000).cast("decimal(38,0)").alias("total_units")
    )
    cum = cum.crossJoin(F.broadcast(total))
    cls = (
        F.when(F.col("cr_units") * 10 <= F.col("total_units") * 8, "A")
        .when(F.col("cr_units") * 20 <= F.col("total_units") * 19, "B")
        .otherwise("C")
    )
    return (
        cum.select(cls.alias("abc_class"), "r")
        .groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("r").cast("double").alias("class_revenue"),
        )
    )


_RAND_B = 64  # randomization replicas; p-value resolution 1/65


@register(
    "ml_randomization_test",
    oracle=f"""
        WITH base AS (
            SELECT event_id,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS is_a,
                   CAST(floor(CAST(value AS DOUBLE)
                              * CAST(1024 AS DOUBLE)) AS BIGINT) AS xq
            FROM events WHERE event_type IN ('purchase', 'click')
        ), obs AS (
            SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
                   CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS n_b,
                   CAST(SUM(CASE WHEN is_a = 1 THEN xq ELSE 0 END)
                        AS DECIMAL(38,0)) AS s_a,
                   CAST(SUM(CASE WHEN is_a = 0 THEN xq ELSE 0 END)
                        AS DECIMAL(38,0)) AS s_b
            FROM base
        ), obs2 AS (
            SELECT n_a, n_b,
                   s_a * CAST(n_b AS DECIMAL(38,0))
                   - s_b * CAST(n_a AS DECIMAL(38,0)) AS t_obs
            FROM obs
        ), reps AS (
            SELECT r.b, base.xq,
                   CAST(('0x' || substr(md5(CAST(base.event_id AS VARCHAR)
                        || ':' || CAST(r.b AS VARCHAR)), 1, 13))
                        AS UBIGINT) % 2 AS g
            FROM base, (SELECT unnest(range(0, {_RAND_B})) AS b) r
        ), rep_stats AS (
            SELECT b,
                   CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END)
                        AS DECIMAL(38,0)) AS na,
                   CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END)
                        AS DECIMAL(38,0)) AS nb,
                   CAST(SUM(CASE WHEN g = 0 THEN xq ELSE 0 END)
                        AS DECIMAL(38,0)) AS sa,
                   CAST(SUM(CASE WHEN g = 1 THEN xq ELSE 0 END)
                        AS DECIMAL(38,0)) AS sb
            FROM reps GROUP BY b
        ), tb AS (SELECT b, sa * nb - sb * na AS t_b FROM rep_stats)
        SELECT o.n_a, o.n_b,
               CAST(CAST(o.t_obs AS VARCHAR) AS DOUBLE) AS t_obs,
               CAST(SUM(CASE WHEN abs(t.t_b) >= abs(o.t_obs)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
               CAST(1 + SUM(CASE WHEN abs(t.t_b) >= abs(o.t_obs)
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST({_RAND_B} + 1 AS DOUBLE) AS p_value
        FROM tb t, obs2 o
        GROUP BY o.n_a, o.n_b, o.t_obs
    """,
    doc="Two-sample randomization test (purchase vs click event values) "
        "with md5-DERANDOMIZED reassignment: replica b sends each row to "
        "pseudo-group A iff the 52-bit md5(event_id:b) hash is even, and "
        "the test statistic is the CROSS-MULTIPLIED mean gap "
        "s_a*n_b - s_b*n_a over floor(value*1024)-quantized integers "
        "(1024 is a power of two, so the quantization multiply is exact) "
        "— every statistic is an exact DECIMAL(38,0) integer, every "
        "comparison |T_b| >= |T_obs| is exact, and the one emitted "
        "double division (1+n_extreme)/65 is a single correctly-rounded "
        "op. This is the resampling-inference engine piece: the same "
        "explode(0..B-1) + one groupBy shape carries bootstrap CIs and "
        "permutation tests at any scale — B*|rows| map-side work, ONE "
        "shuffle of B partial rows, no per-replica jobs.",
    tags=("ml", "stats"),
)
def ml_randomization_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = t.events.filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("is_a"),
        F.floor(F.col("value").cast("double") * F.lit(1024.0))
        .cast("long")
        .alias("xq"),
    )
    obs = (
        base.agg(
            F.sum("is_a").cast("bigint").alias("n_a"),
            (F.count("*") - F.sum("is_a")).cast("bigint").alias("n_b"),
            F.sum(F.when(F.col("is_a") == 1, F.col("xq")).otherwise(0))
            .cast("decimal(38,0)")
            .alias("s_a"),
            F.sum(F.when(F.col("is_a") == 0, F.col("xq")).otherwise(0))
            .cast("decimal(38,0)")
            .alias("s_b"),
        )
        .select(
            "n_a",
            "n_b",
            (
                F.col("s_a") * d38(F.col("n_b"))
                - F.col("s_b") * d38(F.col("n_a"))
            ).alias("t_obs"),
        )
    )
    # pre-explosion repartition: the 64x replica explode plus per-row
    # md5 is CPU-bound — spread the narrow base across every core first
    reps = base.repartition(
        spark.sparkContext.defaultParallelism
    ).select(
        "event_id",
        "xq",
        F.explode(F.sequence(F.lit(0), F.lit(_RAND_B - 1))).alias("b"),
    ).select(
        "b",
        "xq",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("event_id").cast("string"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        ).alias("g"),
    )
    tb = (
        reps.groupBy("b")
        .agg(
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("na"),
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
            .cast("decimal(38,0)")
            .alias("nb"),
            F.sum(F.when(F.col("g") == 0, F.col("xq")).otherwise(0))
            .cast("decimal(38,0)")
            .alias("sa"),
            F.sum(F.when(F.col("g") == 1, F.col("xq")).otherwise(0))
            .cast("decimal(38,0)")
            .alias("sb"),
        )
        .select(
            (F.col("sa") * F.col("nb") - F.col("sb") * F.col("na"))
            .alias("t_b")
        )
    )
    extreme = F.when(
        F.abs(F.col("t_b")) >= F.abs(F.col("t_obs")), 1
    ).otherwise(0)
    return (
        tb.crossJoin(F.broadcast(obs))
        .groupBy("n_a", "n_b", "t_obs")
        .agg(F.sum(extreme).cast("bigint").alias("n_extreme"))
        .select(
            "n_a",
            "n_b",
            F.col("t_obs").cast("string").cast("double").alias("t_obs"),
            "n_extreme",
            (
                (F.lit(1) + F.col("n_extreme")).cast("double")
                / F.lit(float(_RAND_B + 1))
            ).alias("p_value"),
        )
    )


@register(
    "ml_brier_decomposition",
    oracle="""
        WITH cells AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(month(o.o_orderdate) AS INTEGER) AS mon,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pos
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ), scored AS (
            SELECT segment, mon, n, pos,
                   (pos * 256) // n AS p_num
            FROM cells
        )
        SELECT segment, mon, n, pos,
               CAST(p_num AS DOUBLE) / CAST(256 AS DOUBLE) AS p_hat,
               CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS obs_rate,
               CAST(pos * (256 - p_num) * (256 - p_num)
                    + (n - pos) * p_num * p_num AS DOUBLE)
                   / CAST(n * 65536 AS DOUBLE) AS brier_cell,
               (CAST(p_num AS DOUBLE) / CAST(256 AS DOUBLE)
                - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(p_num AS DOUBLE) / CAST(256 AS DOUBLE)
                  - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                   AS reliability_cell
        FROM scored
    """,
    doc="Per-cell Brier-score calibration readout for the historical-"
        "rate predictor of URGENT orders over (segment, order month) "
        "cells: the cell's predicted probability is the DYADIC rational "
        "(pos*256 div n)/256 — exact integer division (Spark div == "
        "DuckDB //) onto a power-of-two grid, so p_hat, the per-cell "
        "Brier numerator pos*(256-p)^2 + (n-pos)*p^2 (exact int64 while "
        "n < 2^37), and its /(n*65536) division are all deterministic "
        "IEEE ops with identical order in both engines. reliability_cell "
        "is the squared calibration gap (p_hat - obs_rate)^2, the "
        "per-cell term of Murphy's reliability decomposition; weighting "
        "by n and summing reconstructs REL, and the same grid carries "
        "resolution/uncertainty. Plan: one fact-dim join + one agg.",
    tags=("ml", "stats"),
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cells = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.month("o_orderdate").cast("int").alias("mon"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                .otherwise(0)
            ).cast("bigint").alias("pos"),
        )
    )
    scored = cells.withColumn(
        "p_num", F.expr("(pos * 256) div n")
    )
    p_hat = F.col("p_num").cast("double") / F.lit(256.0)
    obs = F.col("pos").cast("double") / F.col("n").cast("double")
    q = F.lit(256) - F.col("p_num")
    brier_num = (
        F.col("pos") * q * q
        + (F.col("n") - F.col("pos")) * F.col("p_num") * F.col("p_num")
    )
    return scored.select(
        "segment",
        "mon",
        "n",
        "pos",
        p_hat.alias("p_hat"),
        obs.alias("obs_rate"),
        (
            brier_num.cast("double")
            / (F.col("n") * F.lit(65536)).cast("double")
        ).alias("brier_cell"),
        ((p_hat - obs) * (p_hat - obs)).alias("reliability_cell"),
    )


def _poisson1_thresholds(max_w: int = 8) -> list[int]:
    """floor(CDF_k(Poisson(1)) * 2^52) for k = 0..max_w-1, as exact int
    literals. Computed ONCE here in Python and embedded verbatim in both
    the Spark expression and the DuckDB oracle, so the transcendental
    e^-1 never has to agree across engines — only the comparison of a
    52-bit integer hash against these shared literals does."""
    import math

    out, acc, p = [], 0.0, math.exp(-1.0)
    for k in range(max_w):
        acc += p
        out.append(min(int(acc * (1 << 52)), (1 << 52) - 1))
        p /= k + 1
    return out


_BOOT_B = 64
_POIS_T = _poisson1_thresholds()


def _boot_weight_sql(h: str) -> str:
    """CASE chain mapping a 52-bit hash to a Poisson(1) draw — same
    string works as a Spark SQL expr and inside the DuckDB oracle."""
    whens = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE {whens} ELSE {len(_POIS_T)} END"


@register(
    "ml_poisson_bootstrap",
    oracle=f"""
        WITH hashed AS (
            -- ONE md5 serves TWO 52-bit draws (chars 1-13 / 14-26 of
            -- the 32-char digest), and the hash is hoisted into its
            -- own projection so the CASE chain compares a column, not
            -- 8 re-evaluations (in-situ: 7.5 s -> ~1.9 s at sf0.1)
            SELECT r.b,
                   CAST(o.o_totalprice AS DECIMAL(18,4)) AS price,
                   CAST(('0x' || substr(
                       md5(CAST(o.o_orderkey AS VARCHAR) || ':'
                           || CAST(r.b // 2 AS VARCHAR)),
                       CAST(1 + 13 * (r.b % 2) AS INTEGER), 13))
                       AS UBIGINT) AS hv
            FROM orders o, (SELECT unnest(range(0, {_BOOT_B})) AS b) r
        ), reps AS (
            SELECT b, price, {_boot_weight_sql("hv")} AS w FROM hashed
        ), ests AS (
            SELECT b,
                   CAST(CAST(CAST(SUM(w * price) AS DECIMAL(38,4))
                             AS VARCHAR) AS DOUBLE)
                   / CAST(CASE WHEN SUM(w) = 0 THEN 1
                               ELSE SUM(w) END AS DOUBLE) AS est
            FROM reps GROUP BY b
        ), ranked AS (
            SELECT est, row_number() OVER (ORDER BY est, b) AS rn
            FROM ests
        ), obs AS (
            SELECT CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                             AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS mean_obs
            FROM orders
        )
        SELECT o.n_orders, o.mean_obs,
               MIN(CASE WHEN r.rn = 2 THEN r.est END) AS boot_lo,
               MIN(CASE WHEN r.rn = {_BOOT_B - 1} THEN r.est END)
                   AS boot_hi
        FROM ranked r, obs o
        GROUP BY o.n_orders, o.mean_obs
    """,
    doc="Poisson bootstrap CI for the mean order price — THE "
        "distributed bootstrap (Chamandy et al., Google): classical "
        "resampling needs n draws per replica from one urn (impossible "
        "map-side); weighting each row Poisson(1) per replica is "
        "asymptotically equivalent and embarrassingly parallel. Here "
        "the draw is md5-DERANDOMIZED: replica b gives row k the "
        "weight whose Poisson(1) CDF bucket contains a 52-bit slice of "
        "md5(orderkey:b div 2) (digest chars 1-13 / 14-26 by b % 2 — "
        "one md5 per TWO replicas, the hot cost both engines pay) "
        "— the CDF thresholds are Python-computed "
        "integer literals shared by both engines, so e^-1 never has to "
        "reproduce cross-engine. Replica means are exact-decimal sums "
        "over integer weights divided once; the ~95% interval is the "
        "2nd/63rd order statistic of the B=64 replica means (the 64-row "
        "ranking window is constant-size — not a data-scale sort). One "
        "explode + ONE shuffle of B partial rows carries any corpus "
        "size.",
    tags=("ml", "stats"),
)
def ml_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import ranked_rows

    t = Tables(spark, sf_dir)
    # pre-explosion repartition (the sketch_theta_kmv lesson): a small
    # parquet arrives as 1-2 splits and the 64x replica explode plus
    # per-row md5 is CPU-bound — spread it across every core first
    reps = t.orders.repartition(
        spark.sparkContext.defaultParallelism
    ).select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).withColumn(
        # one md5 serves two 52-bit draws; hoisted so the CASE chain
        # compares a column (mirrors the oracle's hashed CTE)
        "hv",
        F.expr(
            "CAST(conv(substr(md5(concat(CAST(o_orderkey AS STRING), "
            "':', CAST(b div 2 AS STRING))), "
            "CAST(1 + 13 * (b % 2) AS INT), 13), 16, 10) AS BIGINT)"
        ),
    ).withColumn("w", F.expr(_boot_weight_sql("hv")))
    ests = reps.groupBy("b").agg(
        (
            F.sum(F.col("w") * F.col("price"))
            .cast("decimal(38,4)")
            .cast("string")
            .cast("double")
            / F.when(F.sum("w") == 0, 1)
            .otherwise(F.sum("w"))
            .cast("double")
        ).alias("est")
    )
    # B=64 constant rows — windowless rank (sorted-array posexplode)
    ranked = ranked_rows(
        ests, [F.col("est"), F.col("b")], ["est"], rank_col="rn"
    )
    obs = t.orders.agg(
        F.count("*").alias("n_orders"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .cast("string")
            .cast("double")
            / F.count("*").cast("double")
        ).alias("mean_obs"),
    )
    return (
        ranked.crossJoin(F.broadcast(obs))
        .groupBy("n_orders", "mean_obs")
        .agg(
            F.min(F.when(F.col("rn") == 2, F.col("est"))).alias("boot_lo"),
            F.min(
                F.when(F.col("rn") == _BOOT_B - 1, F.col("est"))
            ).alias("boot_hi"),
        )
        .select("n_orders", "mean_obs", "boot_lo", "boot_hi")
    )


@register(
    "ml_cuped_adjustment",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_custkey AS ck,
                   CAST(c.c_custkey % 2 AS INTEGER) AS arm,
                   CAST(COALESCE(SUM(CASE WHEN o.o_orderdate
                                 < DATE '1995-01-01'
                                 THEN CAST(o.o_totalprice AS DECIMAL(18,4))
                                 END), 0) * 10000 AS BIGINT) AS xq,
                   CAST(COALESCE(SUM(CASE WHEN o.o_orderdate
                                 >= DATE '1995-01-01'
                                 THEN CAST(o.o_totalprice AS DECIMAL(18,4))
                                 END), 0) * 10000 AS BIGINT) AS yq
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ), pooled AS (
            SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
                   CAST(SUM(xq) AS DECIMAL(38,0)) AS sx,
                   CAST(SUM(CAST(xq AS DECIMAL(38,0))
                            * CAST(xq AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS sxx,
                   CAST(SUM(CAST(xq AS DECIMAL(38,0))
                            * CAST(yq AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS sxy,
                   CAST(SUM(yq) AS DECIMAL(38,0)) AS sy
            FROM per_cust
        ), theta_t AS (
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sx_d,
                   CASE WHEN n * sxx - sx * sx = 0
                        THEN CAST(0 AS DOUBLE)
                        ELSE CAST(CAST(n * sxy - sx * sy AS VARCHAR)
                                  AS DOUBLE)
                             / CAST(CAST(n * sxx - sx * sx AS VARCHAR)
                                    AS DOUBLE)
                   END AS theta
            FROM pooled
        ), arms AS (
            SELECT arm,
                   CAST(count(*) AS DECIMAL(38,0)) AS na,
                   CAST(SUM(xq) AS DECIMAL(38,0)) AS sxa,
                   CAST(SUM(yq) AS DECIMAL(38,0)) AS sya,
                   CAST(SUM(CAST(xq AS DECIMAL(38,0))
                            * CAST(xq AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS sxxa,
                   CAST(SUM(CAST(yq AS DECIMAL(38,0))
                            * CAST(yq AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS syya,
                   CAST(SUM(CAST(xq AS DECIMAL(38,0))
                            * CAST(yq AS DECIMAL(38,0)))
                        AS DECIMAL(38,0)) AS sxya
            FROM per_cust GROUP BY arm
        ), armd AS (
            SELECT arm, CAST(na AS BIGINT) AS n_arm,
                   CAST(CAST(na AS VARCHAR) AS DOUBLE) AS na_d,
                   CAST(CAST(sxa AS VARCHAR) AS DOUBLE) AS sxa_d,
                   CAST(CAST(sya AS VARCHAR) AS DOUBLE) AS sya_d,
                   CAST(CAST(na * syya - sya * sya AS VARCHAR) AS DOUBLE)
                       AS dy,
                   CAST(CAST(na * sxxa - sxa * sxa AS VARCHAR) AS DOUBLE)
                       AS dx,
                   CAST(CAST(na * sxya - sxa * sya AS VARCHAR) AS DOUBLE)
                       AS dxy
            FROM arms
        )
        SELECT a.arm, a.n_arm,
               a.sya_d / a.na_d / CAST(10000 AS DOUBLE) AS ybar,
               a.sya_d / a.na_d / CAST(10000 AS DOUBLE)
               - t.theta * ((a.sxa_d / a.na_d
                             - t.sx_d / CAST(t.n AS DOUBLE))
                            / CAST(10000 AS DOUBLE)) AS ybar_adj,
               a.dy / (CASE WHEN a.na_d * (a.na_d - CAST(1 AS DOUBLE)) = 0
                            THEN CAST(1 AS DOUBLE)
                            ELSE a.na_d * (a.na_d - CAST(1 AS DOUBLE)) END)
                   / CAST(100000000 AS DOUBLE) AS var_y,
               a.dy / (CASE WHEN a.na_d * (a.na_d - CAST(1 AS DOUBLE)) = 0
                            THEN CAST(1 AS DOUBLE)
                            ELSE a.na_d * (a.na_d - CAST(1 AS DOUBLE)) END)
                   / CAST(100000000 AS DOUBLE)
               - CAST(2 AS DOUBLE) * t.theta
                 * (a.dxy / (CASE WHEN a.na_d * (a.na_d - CAST(1 AS DOUBLE))
                                       = 0
                                  THEN CAST(1 AS DOUBLE)
                                  ELSE a.na_d * (a.na_d - CAST(1 AS DOUBLE))
                             END) / CAST(100000000 AS DOUBLE))
               + t.theta * t.theta
                 * (a.dx / (CASE WHEN a.na_d * (a.na_d - CAST(1 AS DOUBLE))
                                      = 0
                                 THEN CAST(1 AS DOUBLE)
                                 ELSE a.na_d * (a.na_d - CAST(1 AS DOUBLE))
                            END) / CAST(100000000 AS DOUBLE)) AS var_y_adj,
               t.theta AS theta
        FROM armd a, theta_t t
    """,
    doc="CUPED variance reduction for an A/B readout (Deng et al., "
        "WSDM'13): the experiment metric Y (each customer's 1995+ "
        "spend) is adjusted by the pre-experiment covariate X (pre-1995 "
        "spend), theta = cov(X,Y)/var(X) pooled across arms (custkey "
        "parity). Hash-exactness: per-customer spends quantize to "
        "integer 1e-4 currency units (a scale-4 decimal times 10^4 is "
        "integral — exact), every moment and every n*sab - sa*sb "
        "numerator is a DECIMAL(38,0) integer (the spearman recipe), "
        "and each emitted double is one fixed op sequence over their "
        "shortest-string crossings — never a sum of adjusted per-row "
        "doubles, since ybar_adj and var(Y_adj) = var(Y) - 2*theta*cov "
        "+ theta^2*var(X) are algebraic in the moments. theta is "
        "scale-invariant (X and Y share the 10^4 factor), real units "
        "return via one power-of-ten division per output, and the "
        "var(X)=0 / n=1 degeneracies are guarded identically in both "
        "engines. Plan: one fact-dim join, two moment aggs — map-side "
        "combinable at any scale.",
    tags=("ml", "stats"),
)
def ml_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    price = F.col("o_totalprice").cast("decimal(18,4)")
    pre = F.when(
        F.col("o_orderdate") < F.lit("1995-01-01").cast("date"), price
    )
    post = F.when(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"), price
    )
    per_cust = (
        t.customer.join(
            t.orders, t.orders.o_custkey == t.customer.c_custkey, "left"
        )
        .groupBy(
            F.col("c_custkey").alias("ck"),
            (F.col("c_custkey") % 2).cast("int").alias("arm"),
        )
        .agg(
            (F.coalesce(F.sum(pre), F.lit(0)) * 10000)
            .cast("long")
            .alias("xq"),
            (F.coalesce(F.sum(post), F.lit(0)) * 10000)
            .cast("long")
            .alias("yq"),
        )
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731
    xq, yq = d38(F.col("xq")), d38(F.col("yq"))
    pooled = per_cust.agg(
        d38(F.count("*")).alias("n"),
        d38(F.sum("xq")).alias("sx"),
        d38(F.sum(xq * xq)).alias("sxx"),
        d38(F.sum(xq * yq)).alias("sxy"),
        d38(F.sum("yq")).alias("sy"),
    )
    theta_t = pooled.select(
        F.col("n").cast("bigint").alias("n"),
        s2d(F.col("sx")).alias("sx_d"),
        F.when(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") == 0,
            F.lit(0.0),
        )
        .otherwise(
            s2d(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / s2d(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        )
        .alias("theta"),
    )
    arms = per_cust.groupBy("arm").agg(
        d38(F.count("*")).alias("na"),
        d38(F.sum("xq")).alias("sxa"),
        d38(F.sum("yq")).alias("sya"),
        d38(F.sum(xq * xq)).alias("sxxa"),
        d38(F.sum(yq * yq)).alias("syya"),
        d38(F.sum(xq * yq)).alias("sxya"),
    )
    armd = arms.select(
        "arm",
        F.col("na").cast("bigint").alias("n_arm"),
        s2d(F.col("na")).alias("na_d"),
        s2d(F.col("sxa")).alias("sxa_d"),
        s2d(F.col("sya")).alias("sya_d"),
        s2d(
            F.col("na") * F.col("syya") - F.col("sya") * F.col("sya")
        ).alias("dy"),
        s2d(
            F.col("na") * F.col("sxxa") - F.col("sxa") * F.col("sxa")
        ).alias("dx"),
        s2d(
            F.col("na") * F.col("sxya") - F.col("sxa") * F.col("sya")
        ).alias("dxy"),
    )
    ten4 = F.lit(10000.0)
    ten8 = F.lit(100000000.0)
    na_d = F.col("na_d")
    denom = na_d * (na_d - F.lit(1.0))
    dguard = F.when(denom == 0.0, F.lit(1.0)).otherwise(denom)
    ybar = F.col("sya_d") / na_d / ten4
    var_y = F.col("dy") / dguard / ten8
    cov_a = F.col("dxy") / dguard / ten8
    var_xa = F.col("dx") / dguard / ten8
    th = F.col("theta")
    return armd.crossJoin(F.broadcast(theta_t)).select(
        "arm",
        "n_arm",
        ybar.alias("ybar"),
        (
            ybar
            - th
            * (
                (F.col("sxa_d") / na_d - F.col("sx_d") / F.col("n").cast("double"))
                / ten4
            )
        ).alias("ybar_adj"),
        var_y.alias("var_y"),
        (var_y - F.lit(2.0) * th * cov_a + th * th * var_xa).alias(
            "var_y_adj"
        ),
        th.alias("theta"),
    )


@register(
    "ml_att_stratified",
    oracle="""
        WITH units AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(month(o.o_orderdate) AS INTEGER) AS mon,
                   CASE WHEN o.o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END AS treated,
                   CAST(o.o_totalprice AS DECIMAL(18,4)) AS y
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), cells AS (
            SELECT segment, mon,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(treated) AS BIGINT) AS n_t,
                   CAST(count(*) - SUM(treated) AS BIGINT) AS n_c,
                   CAST(SUM(CASE WHEN treated = 1 THEN y END)
                        AS DECIMAL(38,4)) AS sy_t,
                   CAST(SUM(CASE WHEN treated = 0 THEN y END)
                        AS DECIMAL(38,4)) AS sy_c
            FROM units GROUP BY segment, mon
        )
        SELECT segment, mon,
               CAST((n_t * 256) // n AS BIGINT) AS p_num,
               n_t, n_c,
               CAST(CAST(sy_t AS VARCHAR) AS DOUBLE)
                   / CAST(n_t AS DOUBLE) AS ybar_t,
               CAST(CAST(sy_c AS VARCHAR) AS DOUBLE)
                   / CAST(n_c AS DOUBLE) AS ybar_c,
               CAST(CAST(sy_t AS VARCHAR) AS DOUBLE)
                   / CAST(n_t AS DOUBLE)
               - CAST(CAST(sy_c AS VARCHAR) AS DOUBLE)
                   / CAST(n_c AS DOUBLE) AS att_cell
        FROM cells
        WHERE n_t >= 1 AND n_c >= 1
    """,
    doc="Stratified average-treatment-effect-on-the-treated estimator: "
        "URGENT orders (treated) vs the rest, stratified on the "
        "(segment, order month) propensity grid — with a DISCRETE "
        "propensity score, nearest-score matching degenerates exactly "
        "to within-stratum comparison, so this IS propensity matching "
        "without the quadratic pair search. Off-support strata (no "
        "treated or no control units) are dropped, standard PSM "
        "practice. p_num/256 is the same exact-integer-division dyadic "
        "score as ml_brier_decomposition; cell means are exact decimal "
        "sums over one division each, att_cell their fixed-sequence "
        "difference. The overall ATT is the n_t-weighted mean of "
        "att_cell — left to the reader because a cross-cell double sum "
        "would be order-dependent; the per-cell decomposition is the "
        "audit view anyway. Plan: one fact-dim join + one agg.",
    tags=("ml", "stats"),
)
def ml_att_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    treated = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    y = F.col("o_totalprice").cast("decimal(18,4)")
    cells = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.month("o_orderdate").cast("int").alias("mon"),
            treated.alias("treated"),
            y.alias("y"),
        )
        .groupBy("segment", "mon")
        .agg(
            F.count("*").alias("n"),
            F.sum("treated").cast("bigint").alias("n_t"),
            (F.count("*") - F.sum("treated")).cast("bigint").alias("n_c"),
            F.sum(F.when(F.col("treated") == 1, F.col("y")))
            .cast("decimal(38,4)")
            .alias("sy_t"),
            F.sum(F.when(F.col("treated") == 0, F.col("y")))
            .cast("decimal(38,4)")
            .alias("sy_c"),
        )
    )
    ybar_t = F.col("sy_t").cast("string").cast("double") / F.col(
        "n_t"
    ).cast("double")
    ybar_c = F.col("sy_c").cast("string").cast("double") / F.col(
        "n_c"
    ).cast("double")
    return (
        cells.filter((F.col("n_t") >= 1) & (F.col("n_c") >= 1))
        .select(
            "segment",
            "mon",
            F.expr("(n_t * 256) div n").cast("bigint").alias("p_num"),
            "n_t",
            "n_c",
            ybar_t.alias("ybar_t"),
            ybar_c.alias("ybar_c"),
            (ybar_t - ybar_c).alias("att_cell"),
        )
    )


_LC_T = 1 << 52
_LC_TRAIN_CAP = 3 * (_LC_T // 4)  # bottom 75% of hash space trains
_LC_FRACS = (8, 4, 2, 1)  # denominators: train share = 3/4 / d


@register(
    "ml_learning_curve",
    oracle=f"""
        WITH hashed AS (
            SELECT c.c_mktsegment AS segment,
                   CASE WHEN o.o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END AS pos,
                   CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)),
                        1, 13)) AS UBIGINT) AS h
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), test AS (
            SELECT segment,
                   CAST(count(*) AS BIGINT) AS n_t,
                   CAST(SUM(pos) AS BIGINT) AS pos_t
            FROM hashed WHERE h >= {_LC_TRAIN_CAP}
            GROUP BY segment
        ), fracs AS (
            SELECT unnest([{", ".join(str(d) for d in _LC_FRACS)}]) AS d
        ), train AS (
            SELECT f.d, s.segment,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(s.pos) AS BIGINT) AS pos
            FROM hashed s JOIN fracs f
              ON s.h < {_LC_TRAIN_CAP} // f.d
            GROUP BY f.d, s.segment
        ), scored AS (
            SELECT t.segment, f.d,
                   t.n_t, t.pos_t,
                   COALESCE((tr.pos * 256) // tr.n, 128) AS p_num,
                   COALESCE(tr.n, 0) AS n_train_s
            FROM test t
            CROSS JOIN fracs f
            LEFT JOIN train tr ON tr.d = f.d AND tr.segment = t.segment
        )
        SELECT d AS frac_denom,
               CAST(SUM(n_train_s) AS BIGINT) AS n_train,
               CAST(SUM(n_t) AS BIGINT) AS n_test,
               CAST(SUM(pos_t * (256 - p_num) * (256 - p_num)
                        + (n_t - pos_t) * p_num * p_num) AS BIGINT)
                   AS brier_key,
               CAST(SUM(pos_t * (256 - p_num) * (256 - p_num)
                        + (n_t - pos_t) * p_num * p_num) AS DOUBLE)
               / (CAST(SUM(n_t) AS DOUBLE) * CAST(65536 AS DOUBLE))
                   AS brier
        FROM scored
        GROUP BY d
    """,
    doc="Learning-curve evaluation — the data-scaling readout that "
        "decides whether to buy more labels: train the per-segment "
        "URGENT-rate predictor on nested md5-hash-bucketed subsets "
        "(1/8, 1/4, 1/2, all of the 75% train split — NESTED because "
        "the same 52-bit hash orders every subset, so each point adds "
        "data rather than resampling) and score each on the fixed "
        "held-out 25% by the integer Brier key of "
        "ml_brier_decomposition's /256 dyadic grid. Unseen segments "
        "fall back to the p=0.5 prior (p_num 128) identically in both "
        "engines. The whole curve is ONE scan + two bounded aggs: "
        "per-(fraction, segment) counts are sufficient statistics, so "
        "no per-row rescoring or replica explosion of the test set.",
    tags=("ml", "stats"),
)
def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hashed = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("pos"),
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 13),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
    )
    test = (
        hashed.filter(F.col("h") >= _LC_TRAIN_CAP)
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_t"),
            F.sum("pos").cast("bigint").alias("pos_t"),
        )
    )
    fracs = spark.createDataFrame(
        [(d,) for d in _LC_FRACS], "d int"
    )
    train = (
        hashed.crossJoin(F.broadcast(fracs))
        .filter(F.col("h") < F.expr(f"{_LC_TRAIN_CAP}L div d"))
        .groupBy("d", "segment")
        .agg(
            F.count("*").alias("n"),
            F.sum("pos").cast("bigint").alias("pos"),
        )
    )
    scored = (
        test.crossJoin(F.broadcast(fracs))
        .join(F.broadcast(train), ["d", "segment"], "left")
        .select(
            "d",
            "n_t",
            "pos_t",
            F.coalesce(
                F.expr("(pos * 256) div n"), F.lit(128)
            ).alias("p_num"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_train_s"),
        )
    )
    qk = F.lit(256) - F.col("p_num")
    key = F.col("pos_t") * qk * qk + (
        F.col("n_t") - F.col("pos_t")
    ) * F.col("p_num") * F.col("p_num")
    return (
        scored.groupBy(F.col("d").alias("frac_denom"))
        .agg(
            F.sum("n_train_s").cast("bigint").alias("n_train"),
            F.sum("n_t").cast("bigint").alias("n_test"),
            F.sum(key).cast("bigint").alias("brier_key"),
            (
                F.sum(key).cast("double")
                / (F.sum("n_t").cast("double") * F.lit(65536.0))
            ).alias("brier"),
        )
    )


@register(
    "ml_fairness_parity",
    oracle="""
        WITH grp AS (
            SELECT c.c_nationkey AS nation,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pos
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_all,
                   CAST(SUM(pos) AS BIGINT) AS pos_all
            FROM grp
        )
        SELECT g.nation, g.n, g.pos,
               CAST(g.pos AS DOUBLE) / CAST(g.n AS DOUBLE) AS rate,
               CAST(t.pos_all AS DOUBLE) / CAST(t.n_all AS DOUBLE)
                   AS rate_overall,
               CAST(g.pos AS DOUBLE) / CAST(g.n AS DOUBLE)
               - CAST(t.pos_all AS DOUBLE) / CAST(t.n_all AS DOUBLE)
                   AS parity_gap,
               CAST(g.pos * t.n_all - t.pos_all * g.n AS BIGINT)
                   AS gap_key
        FROM grp g, tot t
    """,
    doc="Demographic-parity fairness audit of the URGENT-order rate "
        "across nation groups — the per-group selection-rate readout a "
        "model-governance review requires before a decision system "
        "ships. Per-group and overall rates are exact-integer ratios "
        "(one division each); parity_gap is their fixed-sequence "
        "difference, and gap_key = pos_g*n_all - pos_all*n_g is the "
        "same comparison CROSS-MULTIPLIED into an exact integer, so "
        "downstream thresholding (|gap| > eps) can run with zero float "
        "ambiguity — the ml_randomization_test statistic applied to "
        "group equity. One fact-dim join + one agg; groups broadcast.",
    tags=("ml", "stats"),
)
def ml_fairness_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    grp = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        )
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                .otherwise(0)
            ).cast("bigint").alias("pos"),
        )
    )
    tot = grp.agg(
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum("pos").cast("bigint").alias("pos_all"),
    )
    rate = F.col("pos").cast("double") / F.col("n").cast("double")
    rate_all = F.col("pos_all").cast("double") / F.col("n_all").cast(
        "double"
    )
    return grp.crossJoin(F.broadcast(tot)).select(
        "nation",
        "n",
        "pos",
        rate.alias("rate"),
        rate_all.alias("rate_overall"),
        (rate - rate_all).alias("parity_gap"),
        (
            F.col("pos") * F.col("n_all") - F.col("pos_all") * F.col("n")
        ).cast("bigint").alias("gap_key"),
    )


_CF_T = 1 << 52
_CF_TRAIN = _CF_T // 2          # [0, T/2) trains the predictor
_CF_CAL = 3 * (_CF_T // 4)      # [T/2, 3T/4) calibrates; rest tests
_CF_ALPHAS = (8, 9)             # coverage targets in tenths


@register(
    "ml_conformal_interval",
    oracle=f"""
        WITH hashed AS (
            SELECT o.o_orderkey, c.c_mktsegment AS segment,
                   CAST(CAST(CAST(o.o_totalprice AS DECIMAL(18,4))
                        AS VARCHAR) AS DOUBLE) AS y,
                   CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)),
                        1, 13)) AS UBIGINT) AS h
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ), pred AS (
            SELECT segment,
                   CAST(CAST(SUM(CAST(CAST(y AS VARCHAR)
                        AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS p
            FROM hashed WHERE h < {_CF_TRAIN}
            GROUP BY segment
        ), resid AS (
            SELECT s.o_orderkey, s.h,
                   CAST(floor(abs(s.y - p.p) * CAST(100 AS DOUBLE))
                        AS BIGINT) AS rq
            FROM hashed s JOIN pred p USING (segment)
            WHERE s.h >= {_CF_TRAIN}
        ), hist AS (
            SELECT rq, CAST(count(*) AS BIGINT) AS cnt
            FROM resid WHERE h < {_CF_CAL}
            GROUP BY rq
        ), cum AS (
            SELECT rq,
                   CAST(SUM(cnt) OVER (ORDER BY rq) AS BIGINT) AS cum,
                   CAST(SUM(cnt) OVER () AS BIGINT) AS n_cal
            FROM hist
        ), alphas AS (
            SELECT unnest([{", ".join(str(a) for a in _CF_ALPHAS)}])
                       AS alpha_tenths
        ), qhat AS (
            SELECT a.alpha_tenths, c.n_cal,
                   min(CASE WHEN c.cum >= least(c.n_cal,
                                ((c.n_cal + 1) * a.alpha_tenths) // 10)
                            THEN c.rq END) AS q_cents
            FROM cum c, alphas a
            GROUP BY a.alpha_tenths, c.n_cal
        ), test AS (
            SELECT rq FROM resid WHERE h >= {_CF_CAL}
        )
        SELECT q.alpha_tenths, q.n_cal,
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(q.q_cents AS BIGINT) AS q_cents,
               CAST(SUM(CASE WHEN t.rq <= q.q_cents THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_covered,
               CAST(SUM(CASE WHEN t.rq <= q.q_cents THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS coverage
        FROM test t, qhat q
        GROUP BY q.alpha_tenths, q.n_cal, q.q_cents
    """,
    doc="Split-conformal prediction intervals for the per-segment mean "
        "spend predictor — the distribution-free uncertainty wrapper "
        "(Vovk; popularized for ML eval) a serving system ships instead "
        "of hoping residuals are Gaussian: train/calibrate/test on "
        "disjoint md5-hash slices, take the ceil((n+1)*alpha)-th "
        "smallest calibration residual (EXACT order statistic over "
        "cent-quantized integers, capped at n_cal) as the half-width, "
        "and report held-out coverage, which the conformal guarantee "
        "lower-bounds by alpha. Every comparison is integer-exact; the "
        "only doubles are the predictor means and one coverage ratio "
        "(fixed op sequences). The rank runs over the residual VALUE "
        "HISTOGRAM (the spearman recipe) — the ordered window walks "
        "distinct cent values, never a global row sort of the "
        "calibration slice.",
    tags=("ml", "stats"),
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_running_sums_dist

    t = Tables(spark, sf_dir)
    hashed = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        )
        .select(
            "o_orderkey",
            F.col("c_mktsegment").alias("segment"),
            F.col("o_totalprice")
            .cast("decimal(18,4)")
            .cast("string")
            .cast("double")
            .alias("y"),
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 13),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        # two consumers (pred, resid) and resid re-references it through
        # the broadcast join — unpinned, the orders x customer join
        # lineage re-expanded 16 parquet scans into one plan
        # (plans/r11/ml_conformal_interval_before.txt); round-7 §13
        .localCheckpoint(eager=False)
    )
    pred = (
        hashed.filter(F.col("h") < _CF_TRAIN)
        .groupBy("segment")
        .agg(
            (
                F.sum(F.col("y").cast("string").cast("decimal(18,4)"))
                .cast("string")
                .cast("double")
                / F.count("*").cast("double")
            ).alias("p")
        )
    )
    resid = (
        hashed.filter(F.col("h") >= _CF_TRAIN)
        .join(F.broadcast(pred), "segment")
        .select(
            "o_orderkey",
            "h",
            F.floor(F.abs(F.col("y") - F.col("p")) * F.lit(100.0))
            .cast("bigint")
            .alias("rq"),
        )
        # two consumers (calibration histogram, test slice)
        .localCheckpoint(eager=False)
    )
    hist = (
        resid.filter(F.col("h") < _CF_CAL)
        .groupBy("rq")
        .agg(F.count("*").alias("cnt"))
    )
    # the residual-cent histogram is DATA-bounded (distinct cents over
    # price residuals, ~n_cal in the worst case), so the cumsum must be
    # the distributed two-level kernel — the single-row sorted-array HOF
    # (with_running_sums) is O(k^2) on one thread and hit 140 s at
    # sf0.1. Grand total rides along via a 1-row broadcast.
    n_cal_df = hist.agg(F.sum("cnt").cast("bigint").alias("n_cal"))
    cum = (
        with_running_sums_dist(hist, [F.col("rq").asc()], ["cnt"], prefix="cum_")
        .crossJoin(F.broadcast(n_cal_df))
        .select(
            "rq",
            F.col("cum_cnt").cast("bigint").alias("cum"),
            "n_cal",
        )
    )
    alphas = spark.createDataFrame(
        [(a,) for a in _CF_ALPHAS], "alpha_tenths int"
    )
    qhat = (
        cum.crossJoin(F.broadcast(alphas))
        .groupBy("alpha_tenths", "n_cal")
        .agg(
            F.min(
                F.when(
                    F.col("cum")
                    >= F.least(
                        F.col("n_cal"),
                        F.expr("((n_cal + 1) * alpha_tenths) div 10"),
                    ),
                    F.col("rq"),
                )
            ).alias("q_cents")
        )
    )
    test = resid.filter(F.col("h") >= _CF_CAL).select("rq")
    covered = F.when(F.col("rq") <= F.col("q_cents"), 1).otherwise(0)
    return (
        test.crossJoin(F.broadcast(qhat))
        .groupBy("alpha_tenths", "n_cal", "q_cents")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(covered).cast("bigint").alias("n_covered"),
            (
                F.sum(covered).cast("double") / F.count("*").cast("double")
            ).alias("coverage"),
        )
        .select(
            "alpha_tenths",
            "n_cal",
            "n_test",
            F.col("q_cents").cast("bigint").alias("q_cents"),
            "n_covered",
            "coverage",
        )
    )


@register(
    "ml_srm_check",
    oracle="""
        WITH arms AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_b
            FROM events GROUP BY event_type
        )
        SELECT event_type, n_a, n_b,
               CAST((n_a - n_b) * (n_a - n_b) AS BIGINT) AS srm_key,
               CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                   / CAST(CASE WHEN n_a + n_b = 0 THEN 1
                               ELSE n_a + n_b END AS DOUBLE) AS srm_chi2,
               (n_a - n_b) * (n_a - n_b) > 16 * (n_a + n_b) AS flagged
        FROM arms
    """,
    doc="Sample-ratio-mismatch guardrail — the FIRST check every A/B "
        "readout must pass (a biased assignment invalidates all "
        "downstream stats): per event_type, the chi-square statistic of "
        "the observed 50/50 user_id-parity split, "
        "(n_a - n_b)^2 / (n_a + n_b), with the alert thresholded in "
        "PURE INTEGERS ((n_a-n_b)^2 > 16*(n_a+n_b), i.e. chi2 > 16 ~ "
        "|z| > 4, the industry SRM alarm level) so the flag never "
        "depends on a float comparison. One aggregation; the emitted "
        "chi2 is a single guarded division.",
    tags=("ml", "stats"),
)
def ml_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    arms = t.events.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    d = F.col("n_a") - F.col("n_b")
    tot = F.col("n_a") + F.col("n_b")
    return arms.select(
        "event_type",
        "n_a",
        "n_b",
        (d * d).cast("bigint").alias("srm_key"),
        (
            (d * d).cast("double")
            / F.when(tot == 0, 1).otherwise(tot).cast("double")
        ).alias("srm_chi2"),
        (d * d > 16 * tot).alias("flagged"),
    )


@register(
    "ml_qini_curve",
    oracle="""
        WITH units AS (
            SELECT c.c_custkey AS ck,
                   CAST(c.c_custkey % 2 AS INTEGER) AS treated,
                   CAST(COALESCE(SUM(CASE WHEN o.o_orderdate
                                 < DATE '1995-01-01'
                                 THEN CAST(o.o_totalprice AS DECIMAL(18,4))
                                 END), 0) * 10000 AS BIGINT) AS score_q,
                   CAST(MAX(CASE WHEN o.o_orderdate >= DATE '1995-01-01'
                                  AND o.o_orderpriority = '1-URGENT'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pos
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ), ranked AS (
            SELECT treated, pos,
                   ntile(10) OVER (ORDER BY score_q DESC, ck) AS decile
            FROM units
        ), per_decile AS (
            SELECT decile,
                   CAST(SUM(treated) AS BIGINT) AS n_t,
                   CAST(count(*) - SUM(treated) AS BIGINT) AS n_c,
                   CAST(SUM(CASE WHEN treated = 1 THEN pos ELSE 0 END)
                        AS BIGINT) AS pos_t,
                   CAST(SUM(CASE WHEN treated = 0 THEN pos ELSE 0 END)
                        AS BIGINT) AS pos_c
            FROM ranked GROUP BY decile
        ), cum AS (
            SELECT decile,
                   CAST(SUM(n_t) OVER w AS BIGINT) AS cn_t,
                   CAST(SUM(n_c) OVER w AS BIGINT) AS cn_c,
                   CAST(SUM(pos_t) OVER w AS BIGINT) AS cpos_t,
                   CAST(SUM(pos_c) OVER w AS BIGINT) AS cpos_c
            FROM per_decile
            WINDOW w AS (ORDER BY decile)
        )
        SELECT decile, cn_t, cn_c, cpos_t, cpos_c,
               CAST(cpos_t * cn_c - cpos_c * cn_t AS BIGINT) AS qini_num,
               CAST(cpos_t * cn_c - cpos_c * cn_t AS DOUBLE)
                   / CAST(CASE WHEN cn_c = 0 THEN 1 ELSE cn_c END
                          AS DOUBLE) AS qini
        FROM cum
    """,
    doc="Qini curve — the uplift-modeling evaluation (Radcliffe): rank "
        "customers by a targeting score (pre-1995 spend, quantized to "
        "exact 1e-4 integer units), cut into ntile(10) deciles over a "
        "UNIQUE total order, and report the cumulative incremental-"
        "response curve qini(k) = cum_pos_treated - cum_pos_control * "
        "cum_n_t/cum_n_c for the custkey-parity treatment. The "
        "numerator is emitted CROSS-MULTIPLIED as an exact integer "
        "(the fairness-parity trick) next to the one guarded division; "
        "random targeting gives qini ~ 0 at every k, so the curve's "
        "lift above zero is the model's value. Plan: one fact-dim agg, "
        "then deciles via the DISTRIBUTED two-level rank (range "
        "repartition + per-partition row_number + broadcast offsets, "
        "functions/ranking.py) — no unpartitioned window sorts the "
        "customer dimension on one task — and one 10-row cumsum.",
    tags=("ml", "stats"),
)
def ml_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import (
        ntile_from_rank,
        with_global_rank,
        with_running_sums,
    )

    t = Tables(spark, sf_dir)
    price = F.col("o_totalprice").cast("decimal(18,4)")
    pre = F.when(
        F.col("o_orderdate") < F.lit("1995-01-01").cast("date"), price
    )
    post_urgent = F.when(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderpriority") == "1-URGENT"),
        1,
    ).otherwise(0)
    units = (
        t.customer.join(
            t.orders, t.orders.o_custkey == t.customer.c_custkey, "left"
        )
        .groupBy(
            F.col("c_custkey").alias("ck"),
            (F.col("c_custkey") % 2).cast("int").alias("treated"),
        )
        .agg(
            (F.coalesce(F.sum(pre), F.lit(0)) * 10000)
            .cast("long")
            .alias("score_q"),
            F.max(post_urgent).cast("bigint").alias("pos"),
        )
    )
    ranked = with_global_rank(
        units,
        [F.desc("score_q"), F.asc("ck")],
        rank_col="gr",
        total_col="n_tot",
    ).select(
        "treated",
        "pos",
        ntile_from_rank(F.col("gr"), F.col("n_tot"), 10).alias("decile"),
    )
    per_decile = ranked.groupBy("decile").agg(
        F.sum("treated").cast("bigint").alias("n_t"),
        (F.count("*") - F.sum("treated")).cast("bigint").alias("n_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("pos")).otherwise(0))
        .cast("bigint")
        .alias("pos_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("pos")).otherwise(0))
        .cast("bigint")
        .alias("pos_c"),
    )
    # 10-row cumsum, windowless (functions/ranking.with_running_sums)
    cum = with_running_sums(
        per_decile, "decile", ["n_t", "n_c", "pos_t", "pos_c"], prefix="c"
    ).select("decile", "cn_t", "cn_c", "cpos_t", "cpos_c")
    num = F.col("cpos_t") * F.col("cn_c") - F.col("cpos_c") * F.col("cn_t")
    return cum.select(
        "decile",
        "cn_t",
        "cn_c",
        "cpos_t",
        "cpos_c",
        num.cast("bigint").alias("qini_num"),
        (
            num.cast("double")
            / F.when(F.col("cn_c") == 0, 1)
            .otherwise(F.col("cn_c"))
            .cast("double")
        ).alias("qini"),
    )


# integer z boundaries per weekly look (Pocock-flavored, conservative
# early): crossing |z| > bound at look k stops the experiment
_GS_BOUNDS = (3, 3, 2, 2)


@register(
    "ml_group_sequential",
    oracle=f"""
        WITH base AS (
            SELECT CAST(user_id % 2 AS INTEGER) AS arm,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS conv,
                   (CAST(floor(epoch(ts)) AS BIGINT)
                    - (SELECT CAST(floor(epoch(min(ts))) AS BIGINT)
                       FROM events)) // 604800 + 1 AS week
            FROM events
        ), looks AS (
            SELECT l.k,
                   CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_b,
                   CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END)
                        AS BIGINT) AS c_a,
                   CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END)
                        AS BIGINT) AS c_b
            FROM base, (SELECT unnest(range(1, {len(_GS_BOUNDS)} + 1))
                        AS k) l
            WHERE base.week <= l.k
            GROUP BY l.k
        ), guarded AS (
            -- empty-arm look: n=0 implies c=0, so dividing by the
            -- guarded 1 yields an exact 0 rate in BOTH engines (DuckDB
            -- x/0.0 is NULL while IEEE gives NaN — the round-5 rule)
            SELECT k, n_a, n_b, c_a, c_b,
                   CASE WHEN n_a = 0 THEN 1 ELSE n_a END AS dn_a,
                   CASE WHEN n_b = 0 THEN 1 ELSE n_b END AS dn_b
            FROM looks
        ), stats AS (
            SELECT k, n_a, n_b, c_a, c_b,
                   CAST(c_a AS DOUBLE) / CAST(dn_a AS DOUBLE)
                   - CAST(c_b AS DOUBLE) / CAST(dn_b AS DOUBLE) AS gap,
                   sqrt((CAST(c_a + c_b AS DOUBLE)
                         / CAST(n_a + n_b AS DOUBLE))
                        * (CAST(1 AS DOUBLE)
                           - CAST(c_a + c_b AS DOUBLE)
                             / CAST(n_a + n_b AS DOUBLE))
                        * (CAST(1 AS DOUBLE) / CAST(dn_a AS DOUBLE)
                           + CAST(1 AS DOUBLE) / CAST(dn_b AS DOUBLE)))
                       AS se
            FROM guarded
        )
        SELECT k, n_a, n_b, c_a, c_b,
               CASE WHEN se = 0 THEN CAST(0 AS DOUBLE)
                    ELSE gap / se END AS z,
               abs(CASE WHEN se = 0 THEN CAST(0 AS DOUBLE)
                        ELSE gap / se END)
                   > CAST([{", ".join(str(b) for b in _GS_BOUNDS)}][k]
                          AS DOUBLE) AS crossed
        FROM stats
    """,
    doc="Group-sequential A/B monitoring — the peeking-safe readout an "
        "experimentation platform shows while a test runs. Empty-arm "
        "looks (all rows one user-parity) guard BOTH per-arm "
        "denominators to 1 identically in both engines (c=0 when n=0, "
        "so the rate is an exact 0); pinned by the empty-arm fixture. "
        "experimentation platform shows while a test runs: at each of "
        "4 weekly looks, the CUMULATIVE two-proportion z statistic "
        "(purchase conversion, user-parity arms) against a per-look "
        "INTEGER boundary schedule (3,3,2,2 — Pocock-flavored, "
        "conservative early, so repeated peeking cannot inflate the "
        "false-positive rate the way fixed z=2 at every look does). "
        "Counts are exact integers; z is the q_ab_test fixed op "
        "sequence (sqrt correctly rounded) with the zero-SE degenerate "
        "look guarded identically; boundary crossing compares against "
        "integer literals. One scan x 4 cumulative looks via a "
        "broadcast look table — no per-look rescans.",
    tags=("ml", "stats"),
)
def ml_group_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    min_ts = t.events.agg(F.min("ts").alias("m"))
    base = t.events.crossJoin(F.broadcast(min_ts)).select(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("conv"),
        (
            F.expr(
                "(unix_timestamp(ts) - unix_timestamp(m)) div 604800"
            )
            + 1
        ).alias("week"),
    )
    looks_t = spark.createDataFrame(
        [(k,) for k in range(1, len(_GS_BOUNDS) + 1)], "k int"
    )
    looks = (
        base.crossJoin(F.broadcast(looks_t))
        .filter(F.col("week") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_b"),
            F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
            .cast("bigint")
            .alias("c_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
            .cast("bigint")
            .alias("c_b"),
        )
    )
    # empty-arm guard: n=0 implies c=0, so /1 yields an exact 0 rate —
    # the identical CASE lives in the oracle's `guarded` CTE (DuckDB
    # x/0.0 is NULL where IEEE gives NaN, and se==0 can't catch NaN)
    na = (
        F.when(F.col("n_a") == 0, 1).otherwise(F.col("n_a")).cast("double")
    )
    nb = (
        F.when(F.col("n_b") == 0, 1).otherwise(F.col("n_b")).cast("double")
    )
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    gap = F.col("c_a").cast("double") / na - F.col("c_b").cast(
        "double"
    ) / nb
    se = F.sqrt(
        pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    z = F.when(se == 0.0, F.lit(0.0)).otherwise(gap / se)
    bound = F.element_at(
        F.array(*[F.lit(float(b)) for b in _GS_BOUNDS]), F.col("k")
    )
    return looks.select(
        "k",
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        z.alias("z"),
        (F.abs(z) > bound).alias("crossed"),
    )


# power analysis constants: INTEGER z-scores (z_alpha=2 ~ two-sided 5%,
# z_beta=1 ~ 84% power) and a DYADIC minimum detectable effect 1/64 —
# free parameters pinned to exactly-representable values (round-6 #11)
# so (z_a+z_b)^2 / mde^2 is the exact integer 9 * 4096 = 36864
_PWR_Z2_OVER_MDE2 = 9 * 4096
_PWR_MDE = 1.0 / 64.0


@register(
    "ml_power_analysis",
    oracle=f"""
        WITH du AS (
            SELECT DISTINCT user_id FROM events
        ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_total,
                   CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a
            FROM du
        ), conv AS (
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_conv
            FROM events GROUP BY 1
        ), rates AS (
            SELECT c.event_type, c.n_conv, t.n_total, t.n_a,
                   t.n_total - t.n_a AS n_b,
                   CAST(c.n_conv AS DOUBLE) / CAST(t.n_total AS DOUBLE)
                       AS p1
            FROM conv c, tot t
        ), sized AS (
            SELECT *,
                   least(p1 + {_PWR_MDE!r}, CAST(1 AS DOUBLE)) AS p2
            FROM rates
        )
        SELECT event_type, n_conv, n_total, n_a, n_b,
               CAST(ceil({_PWR_Z2_OVER_MDE2}
                         * (p1 * (CAST(1 AS DOUBLE) - p1)
                            + p2 * (CAST(1 AS DOUBLE) - p2)))
                    AS BIGINT) AS n_required,
               n_a >= CAST(ceil({_PWR_Z2_OVER_MDE2}
                         * (p1 * (CAST(1 AS DOUBLE) - p1)
                            + p2 * (CAST(1 AS DOUBLE) - p2)))
                    AS BIGINT)
               AND n_b >= CAST(ceil({_PWR_Z2_OVER_MDE2}
                         * (p1 * (CAST(1 AS DOUBLE) - p1)
                            + p2 * (CAST(1 AS DOUBLE) - p2)))
                    AS BIGINT) AS powered
        FROM sized
    """,
    doc="Two-proportion experiment sample-size calculator — the power "
        "analysis an experimentation platform runs BEFORE an A/B test "
        "(the companion of ml_srm_check / ml_group_sequential): per "
        "event_type, baseline conversion p1 = distinct converting users "
        "/ distinct users, target p2 = p1 + 1/64, required per-arm n = "
        "ceil((z_a+z_b)^2 (p1(1-p1) + p2(1-p2)) / mde^2) with INTEGER "
        "z's (2, 1) and the DYADIC mde 1/64, so the z/mde factor is the "
        "exact integer 36864 and the whole formula is one fixed "
        "correctly-rounded IEEE op sequence — bit-identical cross-"
        "engine, ceil included. Achieved arm sizes come from the "
        "user-parity split the repo's A/B queries use; powered = both "
        "arms clear n_required. Two aggregations over one events scan; "
        "the 5-row readout joins a 1-row broadcast total.",
    tags=("ml", "stats"),
)
def ml_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select("event_type", "user_id")
    du = ev.select("user_id").distinct()
    tot = du.agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum((F.col("user_id") % 2 == 0).cast("long"))
        .cast("bigint")
        .alias("n_a"),
    )
    conv = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_conv")
    )
    p1 = F.col("n_conv").cast("double") / F.col("n_total").cast("double")
    base = (
        conv.crossJoin(F.broadcast(tot))
        .withColumn("n_b", F.col("n_total") - F.col("n_a"))
        .withColumn("p1", p1)
        .withColumn("p2", F.least(F.col("p1") + F.lit(_PWR_MDE), F.lit(1.0)))
    )
    n_req = F.ceil(
        F.lit(float(_PWR_Z2_OVER_MDE2))
        * (
            F.col("p1") * (F.lit(1.0) - F.col("p1"))
            + F.col("p2") * (F.lit(1.0) - F.col("p2"))
        )
    ).cast("bigint")
    return base.select(
        "event_type",
        "n_conv",
        "n_total",
        "n_a",
        "n_b",
        n_req.alias("n_required"),
        (
            (F.col("n_a") >= n_req) & (F.col("n_b") >= n_req)
        ).alias("powered"),
    )


@register(
    "ml_calibration_bins",
    oracle="""
        WITH h AS (
            SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                         1, 13)) AS UBIGINT) AS hv
            FROM events
        ), scored AS (
            SELECT hv % 256 AS p_q,
                   CASE WHEN (hv // 256) % 256 < hv % 256
                        THEN 1 ELSE 0 END AS y
            FROM h
        )
        SELECT CAST(p_q // 16 AS INTEGER) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(coalesce(SUM(y), 0) AS BIGINT) AS n_pos,
               CAST(coalesce(SUM(p_q), 0) AS BIGINT) AS sum_p_q,
               CAST(coalesce(SUM(p_q), 0) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 256.0) AS mean_pred,
               CAST(coalesce(SUM(y), 0) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS obs_rate
        FROM scored
        GROUP BY 1
    """,
    doc="Model-calibration reliability table (the eval a served "
        "classifier gets before its scores gate anything): a "
        "deterministic md5-derived score grid p = (h % 256)/256 "
        "(dyadic -> every sum is an exact double) with outcomes drawn "
        "as y = [h2 < p] from an independent hash slice (so "
        "E[y|p] = p and the table converges to the diagonal), bucketed "
        "into 16 score bins with per-bin count, positives, exact "
        "fixed-point predicted mass, and the two rates as single "
        "exact-int divisions. The per-bin |obs - pred| gaps are the "
        "ECE numerator, computable exactly from the emitted integers. "
        "Derandomized by the conv/UBIGINT md5 recipe (k=13), so both "
        "engines score identical rows identically. Scale: map-side "
        "hash + one partial-agg shuffle to a 16-row grid.",
    tags=("ml",),
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hv = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 13), 16, 10
    ).cast("long")
    scored = t.events.select(hv.alias("hv")).select(
        (F.col("hv") % 256).alias("p_q"),
        F.when(
            (F.col("hv") / F.lit(256)).cast("long") % 256
            < F.col("hv") % 256,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("y"),
    )
    return scored.groupBy(
        F.expr("p_q div 16").cast("int").alias("bin")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.coalesce(F.sum("y"), F.lit(0)).cast("bigint").alias("n_pos"),
        F.coalesce(F.sum("p_q"), F.lit(0)).cast("bigint").alias("sum_p_q"),
        (
            F.coalesce(F.sum("p_q"), F.lit(0)).cast("double")
            / (F.count("*").cast("double") * F.lit(256.0))
        ).alias("mean_pred"),
        (
            F.coalesce(F.sum("y"), F.lit(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("obs_rate"),
    )


# ---------------------------------------------------------------------------
# Wald's Sequential Probability Ratio Test (Wald 1945, public), replayed
# deterministically. With the SYMMETRIC hypotheses p0 = 0.45 vs
# p1 = 0.55 the log-likelihood increments are +-ln(11/9), so the whole
# LLR path is ln(11/9) * (2*successes_t - t): the boundary crossing is
# an EXACT INTEGER random-walk test |2*cx - t| >= K with
# K = ceil(ln((1-beta)/alpha) / ln(11/9)) = 15 at alpha = beta = 0.05 —
# no per-row transcendental ever evaluates; ln(11/9) appears once as a
# Python literal multiplying an exact integer in the report.

import math as _math

_SPRT_C1 = repr(_math.log(11.0 / 9.0))
_SPRT_K = _math.ceil(_math.log(19.0) / _math.log(11.0 / 9.0))  # = 15


@register(
    "ml_sprt_sequential",
    oracle=f"""
        WITH trials AS (
            SELECT ts, event_id,
                   CASE WHEN value > 35.0 THEN 1 ELSE 0 END AS x
            FROM events WHERE event_type = 'purchase'
        ), walkt AS (
            SELECT CAST(row_number() OVER (ORDER BY ts, event_id)
                        AS BIGINT) AS t,
                   CAST(SUM(x) OVER (ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cx
            FROM trials
        ), wk AS (
            SELECT t, cx, 2 * cx - t AS walk FROM walkt
        ), crossing AS (
            SELECT t, cx, walk FROM wk
            WHERE abs(walk) >= {_SPRT_K}
            ORDER BY t LIMIT 1
        ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n_trials,
                   CAST(coalesce(SUM(x), 0) AS BIGINT) AS n1_total
            FROM trials
        )
        SELECT tot.n_trials, tot.n1_total,
               CAST(coalesce(c.t, 0) AS BIGINT) AS t_decide,
               CAST(coalesce(c.walk, 0) AS BIGINT) AS walk_at_decide,
               CAST(coalesce(c.cx, 0) AS BIGINT) AS n1_at_decide,
               CASE WHEN c.walk >= {_SPRT_K} THEN 'accept_h1'
                    WHEN c.walk <= -{_SPRT_K} THEN 'accept_h0'
                    ELSE 'continue' END AS decision,
               CAST('{_SPRT_C1}' AS DOUBLE)
                   * CAST(coalesce(c.walk, 0) AS DOUBLE)
                   AS llr_at_decide
        FROM tot LEFT JOIN crossing c ON true
    """,
    doc="Wald SPRT replay over the purchase-event success stream "
        "(value > 35, (ts, event_id) order): for the symmetric "
        "hypotheses p0 = 0.45 vs p1 = 0.55 at alpha = beta = 0.05 the "
        "LLR path collapses to ln(11/9) * (2*successes - t), so the "
        "sequential boundary is the EXACT INTEGER random-walk test "
        f"|2*cx - t| >= {_SPRT_K} — no per-row transcendental; ln(11/9) "
        "is one Python literal multiplying the integer walk in the "
        "report (transcendental-constant rule). The engine computes "
        "the cumulative walk with the range-partitioned distributed "
        "running-sum kernel (no single-task global sort) and finds the "
        "first crossing with orderBy+limit (TakeOrderedAndProject); "
        "the oracle affords the plain ordered window. Emits the "
        "decision, crossing time and state, or 'continue' with zeroed "
        "crossing fields when the walk never exits.",
    tags=("ml", "stats"),
)
def ml_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_running_sums_dist

    t = Tables(spark, sf_dir)
    trials = t.events.filter(F.col("event_type") == "purchase").select(
        "ts", "event_id",
        F.when(F.col("value") > 35.0, 1).otherwise(0)
        .cast("bigint").alias("x"),
        F.lit(1).cast("bigint").alias("one"),
    )
    cum = with_running_sums_dist(
        trials, [F.col("ts"), F.col("event_id")], ["x", "one"], prefix="c"
    )
    wk = cum.select(
        F.col("cone").alias("t"),
        F.col("cx").alias("cx"),
        (2 * F.col("cx") - F.col("cone")).alias("walk"),
    )
    crossing = (
        wk.filter(F.abs(F.col("walk")) >= _SPRT_K)
        .orderBy("t")
        .limit(1)
        .select(
            F.col("t").alias("t_c"), F.col("cx").alias("cx_c"),
            F.col("walk").alias("walk_c"), F.lit(1).alias("k"),
        )
    )
    tot = trials.agg(
        F.count("*").cast("bigint").alias("n_trials"),
        F.coalesce(F.sum("x"), F.lit(0)).cast("bigint").alias("n1_total"),
    ).withColumn("k", F.lit(1))
    zl = F.lit(0).cast("bigint")
    out = tot.join(F.broadcast(crossing), "k", "left")
    return out.select(
        "n_trials", "n1_total",
        F.coalesce(F.col("t_c"), zl).alias("t_decide"),
        F.coalesce(F.col("walk_c"), zl).alias("walk_at_decide"),
        F.coalesce(F.col("cx_c"), zl).alias("n1_at_decide"),
        F.when(F.col("walk_c") >= _SPRT_K, "accept_h1")
        .when(F.col("walk_c") <= -_SPRT_K, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
        (F.lit(float(_SPRT_C1))
         * F.coalesce(F.col("walk_c"), zl).cast("double"))
        .alias("llr_at_decide"),
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR control (Benjamini & Hochberg 1995, public)
# over EXACT permutation p-values — the multiple-testing layer every
# experimentation platform needs on top of single-test machinery. One
# hypothesis per event type (even- vs odd-user mean value gap); each
# p-value is (1 + #extreme)/(B + 1) with B = 64 md5-derandomized sign
# reassignments, an exact dyadic c/64; the BH step-up rule
# p_(k) <= k * q / m is evaluated by integer cross-multiplication
# ((1 + c_k) * 4 * m <= k * 65 at q = 1/4), so the rejection set is
# bit-deterministic end to end.

_BH_Q_DEN = 4  # FDR level q = 1/4


@register(
    "ml_bh_fdr",
    oracle=f"""
        WITH base AS (
            SELECT event_id, event_type,
                   CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a,
                   CAST(floor(CAST(value AS DOUBLE)
                              * CAST(1024 AS DOUBLE)) AS BIGINT) AS xq
            FROM events
        ), obs AS (
            SELECT event_type,
                   CAST(SUM(is_a) AS DECIMAL(38,0)) AS n_a,
                   CAST(COUNT(*) - SUM(is_a) AS DECIMAL(38,0)) AS n_b,
                   CAST(SUM(CASE WHEN is_a = 1 THEN xq ELSE 0 END)
                        AS DECIMAL(38,0)) AS s_a,
                   CAST(SUM(CASE WHEN is_a = 0 THEN xq ELSE 0 END)
                        AS DECIMAL(38,0)) AS s_b
            FROM base GROUP BY event_type
        ), obs2 AS (
            SELECT event_type, s_a * n_b - s_b * n_a AS t_obs FROM obs
        ), reps AS (
            SELECT base.event_type, r.b, base.xq,
                   CAST(('0x' || substr(md5(CAST(base.event_id AS VARCHAR)
                        || ':' || CAST(r.b AS VARCHAR)), 1, 13))
                        AS UBIGINT) % 2 AS g
            FROM base, (SELECT unnest(range(0, {_RAND_B})) AS b) r
        ), rep_stats AS (
            SELECT event_type, b,
                   CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END)
                        AS DECIMAL(38,0)) AS na,
                   CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END)
                        AS DECIMAL(38,0)) AS nb,
                   CAST(SUM(CASE WHEN g = 0 THEN xq ELSE 0 END)
                        AS DECIMAL(38,0)) AS sa,
                   CAST(SUM(CASE WHEN g = 1 THEN xq ELSE 0 END)
                        AS DECIMAL(38,0)) AS sb
            FROM reps GROUP BY event_type, b
        ), pv AS (
            SELECT o.event_type,
                   CAST(CAST(o.t_obs AS VARCHAR) AS DOUBLE) AS t_obs,
                   CAST(1 + SUM(CASE WHEN abs(t.sa * t.nb - t.sb * t.na)
                                          >= abs(o.t_obs)
                                     THEN 1 ELSE 0 END) AS BIGINT)
                       AS p_num
            FROM rep_stats t JOIN obs2 o USING (event_type)
            GROUP BY o.event_type, o.t_obs
        ), ranked AS (
            SELECT *,
                   CAST(row_number() OVER (ORDER BY p_num, event_type)
                        AS BIGINT) AS rk,
                   CAST(count(*) OVER () AS BIGINT) AS m
            FROM pv
        ), kmax AS (
            SELECT CAST(coalesce(max(CASE WHEN
                       p_num * {_BH_Q_DEN} * m <= rk * {_RAND_B + 1}
                       THEN rk END), 0) AS BIGINT) AS k_max
            FROM ranked
        )
        SELECT r.event_type, r.t_obs, r.p_num,
               CAST(r.p_num AS DOUBLE)
                   / CAST({_RAND_B + 1} AS DOUBLE) AS p_value,
               r.rk, r.m, k.k_max,
               r.rk <= k.k_max AS rejected
        FROM ranked r CROSS JOIN kmax k
    """,
    doc="Benjamini-Hochberg FDR control (1995, public) at q = 1/4 over "
        "EXACT permutation p-values: per event type, the even- vs odd-"
        "user mean-value gap is tested with 64 md5-derandomized sign "
        "reassignments (the ml_randomization_test machinery — cross-"
        "multiplied DECIMAL(38,0) statistics, power-of-two value "
        "quantization), giving p = (1 + n_extreme)/65 as an exact "
        "dyadic; the step-up rule p_(k) <= k*q/m is then evaluated by "
        "INTEGER cross-multiplication over the type-bounded ranked "
        "p-table (windowless ranked_rows), so the whole rejection set "
        "is bit-deterministic. Scale shape: one 64x replica explode "
        "with map-side partial aggregation into (type, b) groups — "
        "the multiple-testing layer costs the same single shuffle as "
        "one test.",
    tags=("ml", "stats"),
)
def ml_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import ranked_rows

    t = Tables(spark, sf_dir)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = t.events.select(
        "event_id", "event_type",
        (F.col("user_id") % 2 == 0).cast("int").alias("is_a"),
        F.floor(F.col("value").cast("double") * F.lit(1024.0))
        .cast("long")
        .alias("xq"),
    )
    obs = (
        base.groupBy("event_type")
        .agg(
            d38(F.sum("is_a")).alias("n_a"),
            d38(F.count("*") - F.sum("is_a")).alias("n_b"),
            d38(
                F.sum(F.when(F.col("is_a") == 1, F.col("xq")).otherwise(0))
            ).alias("s_a"),
            d38(
                F.sum(F.when(F.col("is_a") == 0, F.col("xq")).otherwise(0))
            ).alias("s_b"),
        )
        .select(
            "event_type",
            (
                F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a")
            ).alias("t_obs"),
        )
    )
    reps = base.repartition(
        spark.sparkContext.defaultParallelism
    ).select(
        "event_type", "xq",
        F.explode(F.sequence(F.lit(0), F.lit(_RAND_B - 1))).alias("b"),
        F.col("event_id"),
    ).select(
        "event_type", "xq", "b",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("event_id").cast("string"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1, 13,
                ),
                16, 10,
            ).cast("long")
            % 2
        ).alias("g"),
    )
    rep_stats = reps.groupBy("event_type", "b").agg(
        d38(F.sum(F.when(F.col("g") == 0, 1).otherwise(0))).alias("na"),
        d38(F.sum(F.when(F.col("g") == 1, 1).otherwise(0))).alias("nb"),
        d38(
            F.sum(F.when(F.col("g") == 0, F.col("xq")).otherwise(0))
        ).alias("sa"),
        d38(
            F.sum(F.when(F.col("g") == 1, F.col("xq")).otherwise(0))
        ).alias("sb"),
    )
    pv = (
        rep_stats.join(F.broadcast(obs), "event_type")
        .groupBy("event_type", "t_obs")
        .agg(
            (
                1
                + F.sum(
                    F.when(
                        F.abs(
                            F.col("sa") * F.col("nb")
                            - F.col("sb") * F.col("na")
                        )
                        >= F.abs(F.col("t_obs")),
                        1,
                    ).otherwise(0)
                )
            ).cast("bigint").alias("p_num")
        )
        .select(
            "event_type",
            F.col("t_obs").cast("double").alias("t_obs"),
            "p_num",
        )
    )
    ranked = ranked_rows(
        pv,
        [F.col("p_num"), F.col("event_type")],
        ["event_type", "t_obs", "p_num"],
        rank_col="rk",
    ).select("*", F.col("rk").cast("bigint").alias("rkb")).drop("rk")
    m_cnt = ranked.agg(F.count("*").cast("bigint").alias("m"))
    ranked = ranked.crossJoin(F.broadcast(m_cnt))
    kmax = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_num") * _BH_Q_DEN * F.col("m")
                    <= F.col("rkb") * (_RAND_B + 1),
                    F.col("rkb"),
                )
            ),
            F.lit(0),
        ).cast("bigint").alias("k_max")
    )
    return ranked.crossJoin(F.broadcast(kmax)).select(
        "event_type", "t_obs", "p_num",
        (F.col("p_num").cast("double") / F.lit(float(_RAND_B + 1)))
        .alias("p_value"),
        F.col("rkb").alias("rk"),
        "m",
        "k_max",
        (F.col("rkb") <= F.col("k_max")).alias("rejected"),
    )


_ISO_PRICE = 30000  # label threshold: P(extendedprice > 30000 | quantity)


@register(
    "ml_isotonic_calibration",
    oracle=f"""
        WITH b AS (
            SELECT CAST(floor(l_quantity) AS BIGINT) AS q,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN l_extendedprice > {_ISO_PRICE}
                                 THEN 1 ELSE 0 END) AS BIGINT) AS pos
            FROM lineitem GROUP BY 1
        ), pair AS (
            SELECT j.q AS jq, k.q AS kq,
                   CAST(SUM(m.pos) AS BIGINT) AS pos_s,
                   CAST(SUM(m.n) AS BIGINT) AS n_s
            FROM b j JOIN b k ON j.q <= k.q
            JOIN b m ON m.q BETWEEN j.q AND k.q
            GROUP BY 1, 2
        ), inner_min AS (
            SELECT i.q, p.jq,
                   min(CAST(p.pos_s AS DOUBLE) / CAST(p.n_s AS DOUBLE))
                       AS m1
            FROM b i JOIN pair p ON p.jq <= i.q AND p.kq >= i.q
            GROUP BY 1, 2
        ), fit AS (
            SELECT q, max(m1) AS iso_rate FROM inner_min GROUP BY 1
        )
        SELECT b.q AS quantity, b.n, b.pos,
               CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE) AS raw_rate,
               f.iso_rate
        FROM b JOIN fit f ON f.q = b.q
    """,
    doc="Isotonic-regression calibration (Zadrozny & Elkan 2002, "
        "public): fit the best NON-DECREASING rate curve for "
        f"P(extendedprice > {_ISO_PRICE} | quantity) over the 50 "
        "quantity buckets — the monotone calibrator a ranking/score "
        "pipeline applies when raw bucket rates are noisy. Instead of "
        "the sequential pool-adjacent-violators loop (stateful, "
        "unfriendly to both engines), it evaluates the CLOSED minimax "
        "form g(i) = max_{{j<=i}} min_{{k>=i}} mean(y[j..k]) "
        "(Robertson-Wright-Dykstra): every interval mean is one "
        "correctly-rounded division of exact integer (pos, n) sums, so "
        "min/max selections are bit-identical cross-engine — no "
        "iteration, no unrolled CTEs. Scale: one fact-table shuffle "
        "into the 50-row bucket table; the O(B^3) minimax grid "
        "(~22k tiny rows) is domain-bounded, costing the same at any "
        "corpus size (the 'training on aggregates' shape, like "
        "ml_ridge_closed_form).",
    tags=("ml", "stats"),
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    b = (
        t.lineitem.select(
            # floor() both engines: DuckDB double->BIGINT rounds half-even
            # while Spark cast truncates — divergent on fractional qty.
            F.floor(F.col("l_quantity")).cast("long").alias("q"),
            F.when(F.col("l_extendedprice") > _ISO_PRICE, 1)
            .otherwise(0)
            .alias("y"),
        )
        .groupBy("q")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
        .cache()
    )
    j = b.select(F.col("q").alias("jq"))
    k = b.select(F.col("q").alias("kq"))
    m = b.select(F.col("q").alias("mq"), "n", "pos")
    pair = (
        j.crossJoin(k)
        .filter(F.col("jq") <= F.col("kq"))
        .join(
            m,
            (F.col("mq") >= F.col("jq")) & (F.col("mq") <= F.col("kq")),
        )
        .groupBy("jq", "kq")
        .agg(
            F.sum("pos").cast("long").alias("pos_s"),
            F.sum("n").cast("long").alias("n_s"),
        )
    )
    i = b.select(F.col("q").alias("iq"))
    inner_min = (
        i.join(
            pair,
            (F.col("jq") <= F.col("iq")) & (F.col("kq") >= F.col("iq")),
        )
        .groupBy("iq", "jq")
        .agg(
            F.min(
                F.col("pos_s").cast("double") / F.col("n_s").cast("double")
            ).alias("m1")
        )
    )
    fit = inner_min.groupBy("iq").agg(F.max("m1").alias("iso_rate"))
    return b.join(fit, b["q"] == fit["iq"]).select(
        F.col("q").alias("quantity"),
        "n",
        "pos",
        (F.col("pos").cast("double") / F.col("n").cast("double")).alias(
            "raw_rate"
        ),
        "iso_rate",
    )


@register(
    "q_moments_skew_kurtosis",
    oracle="""
        WITH q AS (
            SELECT event_type,
                   CAST(floor(value * 100.0) AS DECIMAL(38,0)) AS u
            FROM events
        ), s AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   SUM(u) AS s1d,
                   SUM(u * u) AS s2d,
                   SUM(u * u * u) AS s3d,
                   SUM(u * u * u * u) AS s4d
            FROM q GROUP BY 1
        ), d AS (
            SELECT event_type, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(CAST(s1d AS VARCHAR) AS DOUBLE) AS s1,
                   CAST(CAST(s2d AS VARCHAR) AS DOUBLE) AS s2,
                   CAST(CAST(s3d AS VARCHAR) AS DOUBLE) AS s3,
                   CAST(CAST(s4d AS VARCHAR) AS DOUBLE) AS s4
            FROM s
        ), m AS (
            SELECT event_type, n, s1,
                   (s1 / nd) AS m1,
                   ((s2 / nd) - ((s1 / nd) * (s1 / nd))) AS m2,
                   (((s3 / nd) - ((3.0 * (s1 / nd)) * (s2 / nd)))
                    + ((2.0 * ((s1 / nd) * (s1 / nd))) * (s1 / nd)))
                       AS m3c,
                   ((((s4 / nd) - ((4.0 * (s1 / nd)) * (s3 / nd)))
                     + ((6.0 * ((s1 / nd) * (s1 / nd))) * (s2 / nd)))
                    - ((3.0 * ((s1 / nd) * (s1 / nd)))
                       * ((s1 / nd) * (s1 / nd)))) AS m4c
            FROM d
        )
        SELECT event_type, n, s1 AS units_sum, m1, m2,
               m3c / (CASE WHEN m2 <= 0.0 THEN 1.0 ELSE m2 END
                      * sqrt(CASE WHEN m2 <= 0.0 THEN 1.0 ELSE m2 END))
                   AS skewness,
               (m4c / (CASE WHEN m2 <= 0.0 THEN 1.0 ELSE m2 END
                       * CASE WHEN m2 <= 0.0 THEN 1.0 ELSE m2 END))
                   - 3.0 AS excess_kurtosis
        FROM m
    """,
    doc="Per-event-type skewness and excess kurtosis — the higher-"
        "moment family Spark's built-in skewness()/kurtosis() compute "
        "with ORDER-DEPENDENT float sums (non-deterministic across "
        "partitionings, so unusable under a hash gate). This plan "
        "instead aggregates EXACT integer power sums of the 1e-2-"
        "quantized value (floor(value*100): one correctly-rounded "
        "multiply + floor, identical cross-engine; u^4 sums stay under "
        "1e31 for 1e12 rows in DECIMAL(38,0)), crosses each sum to "
        "double once (shortest-string in the oracle, plain decimal "
        "cast in Spark), and derives central moments through an "
        "IDENTICALLY-PARENTHESIZED chain of correctly-rounded IEEE ops "
        "(+,-,*,/,sqrt), the r5 eigendecomposition principle — "
        "bit-identical in both engines with no fixed-point unrolling. "
        "Zero-variance groups take the m2<=0 guard branch identically "
        "(CLAUDE.md rule 5). One partial+final aggregate; moment math "
        "is per-group O(1) — the canonical training-on-aggregates "
        "shape at any scale.",
    tags=("stats",),
)
def q_moments_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    u = F.floor(F.col("value") * 100.0).cast("decimal(38,0)")
    s = (
        t.events.select("event_type", u.alias("u"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("u").alias("s1d"),
            F.sum(F.col("u") * F.col("u")).alias("s2d"),
            F.sum(F.col("u") * F.col("u") * F.col("u")).alias("s3d"),
            F.sum(
                F.col("u") * F.col("u") * F.col("u") * F.col("u")
            ).alias("s4d"),
        )
    )
    d = s.select(
        "event_type",
        "n",
        F.col("n").cast("double").alias("nd"),
        F.col("s1d").cast("double").alias("s1"),
        F.col("s2d").cast("double").alias("s2"),
        F.col("s3d").cast("double").alias("s3"),
        F.col("s4d").cast("double").alias("s4"),
    )
    m1 = F.col("s1") / F.col("nd")
    m2 = (F.col("s2") / F.col("nd")) - (m1 * m1)
    m3c = ((F.col("s3") / F.col("nd")) - ((F.lit(3.0) * m1) * (F.col("s2") / F.col("nd")))) + (
        (F.lit(2.0) * (m1 * m1)) * m1
    )
    m4c = (
        ((F.col("s4") / F.col("nd")) - ((F.lit(4.0) * m1) * (F.col("s3") / F.col("nd"))))
        + ((F.lit(6.0) * (m1 * m1)) * (F.col("s2") / F.col("nd")))
    ) - ((F.lit(3.0) * (m1 * m1)) * (m1 * m1))
    md = d.select(
        "event_type", "n", F.col("s1").alias("units_sum"),
        m1.alias("m1"), m2.alias("m2"),
        m3c.alias("m3c"), m4c.alias("m4c"),
    )
    g = F.when(F.col("m2") <= 0.0, F.lit(1.0)).otherwise(F.col("m2"))
    return md.select(
        "event_type", "n", "units_sum", "m1", "m2",
        (F.col("m3c") / (g * F.sqrt(g))).alias("skewness"),
        ((F.col("m4c") / (g * g)) - F.lit(3.0)).alias("excess_kurtosis"),
    )


_ECE_FX = 1 << 20
_ECE_PRICE = 150000


@register(
    "ml_calibration_ece",
    oracle=f"""
        WITH labeled AS (
            SELECT o_orderpriority AS bucket,
                   o_orderkey % 2 = 0 AS is_train,
                   CASE WHEN CAST(o_totalprice AS DECIMAL(18,4))
                             > {_ECE_PRICE} THEN 1 ELSE 0 END AS y
            FROM orders
        ), tr AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_train,
                   CAST(SUM(y) AS BIGINT) AS pos_train
            FROM labeled WHERE is_train GROUP BY bucket
        ), te AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS n_test,
                   CAST(SUM(y) AS BIGINT) AS pos_test
            FROM labeled WHERE NOT is_train GROUP BY bucket
        ), merged AS (
            SELECT COALESCE(tr.bucket, te.bucket) AS bucket,
                   COALESCE(n_train, 0) AS n_train,
                   COALESCE(pos_train, 0) AS pos_train,
                   COALESCE(n_test, 0) AS n_test,
                   COALESCE(pos_test, 0) AS pos_test
            FROM tr FULL OUTER JOIN te ON te.bucket = tr.bucket
        ), rates AS (
            SELECT bucket, n_train, pos_train, n_test, pos_test,
                   CAST(pos_train * {_ECE_FX}
                        // (CASE WHEN n_train = 0 THEN 1
                                 ELSE n_train END) AS BIGINT)
                       AS q_train_fx,
                   CAST(pos_test * {_ECE_FX}
                        // (CASE WHEN n_test = 0 THEN 1
                                 ELSE n_test END) AS BIGINT)
                       AS q_test_fx
            FROM merged
        ), gaps AS (
            SELECT *,
                   CAST(n_test * abs(q_test_fx - q_train_fx) AS BIGINT)
                       AS wgap_fx
            FROM rates
        ), tot AS (
            SELECT CAST(SUM(n_test) AS BIGINT) AS nt,
                   CAST(SUM(wgap_fx) AS BIGINT) AS num
            FROM gaps
        )
        SELECT g.bucket, g.n_train, g.pos_train, g.n_test, g.pos_test,
               g.q_train_fx, g.q_test_fx, g.wgap_fx,
               CAST(t.num AS BIGINT) AS ece_num,
               CAST(t.num AS DOUBLE)
                   / CAST((CASE WHEN t.nt = 0 THEN 1 ELSE t.nt END)
                          * {_ECE_FX} AS DOUBLE) AS ece
        FROM gaps g CROSS JOIN tot t
    """,
    doc="Expected Calibration Error (Naeini et al. AAAI 2015, public) "
        "of the frequency model P(totalprice > "
        f"{_ECE_PRICE} | orderpriority) under a deterministic "
        "train/test split (orderkey parity): per bucket, train and "
        "test rates land on the exact 2^20 integer grid via "
        "truncating integer division (Spark div == DuckDB // on "
        "non-negative ints), the per-bucket gap is n_test * "
        "|q_test - q_train| in exact BIGINTs, and ECE is their sum "
        "over one exact int/int division — the binned calibration "
        "audit an eval pipeline runs on every scored model, with no "
        "float rate ever formed before the final ratio. Buckets seen "
        "in only one split survive via a full outer join with "
        "coalesced zero counts and identically zero-guarded divisions "
        "in both engines, so every bucket's test mass enters the ECE "
        "denominator. Scale: two "
        "grouped counts over the fact table into a 5-row priority "
        "dimension; everything after is dimension-bounded.",
    tags=("ml", "stats"),
)
def ml_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    labeled = t.orders.select(
        F.col("o_orderpriority").alias("bucket"),
        (F.col("o_orderkey") % 2 == 0).alias("is_train"),
        F.when(
            F.col("o_totalprice").cast("decimal(18,4)") > _ECE_PRICE, 1
        )
        .otherwise(0)
        .alias("y"),
    )
    tr = (
        labeled.filter("is_train")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_train"),
            F.sum("y").cast("long").alias("pos_train"),
        )
    )
    te = (
        labeled.filter(~F.col("is_train"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.sum("y").cast("long").alias("pos_test"),
        )
    )
    merged = tr.join(te, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_train", F.lit(0)).alias("n_train"),
        F.coalesce("pos_train", F.lit(0)).alias("pos_train"),
        F.coalesce("n_test", F.lit(0)).alias("n_test"),
        F.coalesce("pos_test", F.lit(0)).alias("pos_test"),
    )
    rates = merged.select(
        "bucket", "n_train", "pos_train", "n_test", "pos_test",
        F.expr(
            f"pos_train * {_ECE_FX} div "
            "(CASE WHEN n_train = 0 THEN 1 ELSE n_train END)"
        )
        .cast("long")
        .alias("q_train_fx"),
        F.expr(
            f"pos_test * {_ECE_FX} div "
            "(CASE WHEN n_test = 0 THEN 1 ELSE n_test END)"
        )
        .cast("long")
        .alias("q_test_fx"),
    )
    gaps = rates.select(
        "*",
        (
            F.col("n_test")
            * F.abs(F.col("q_test_fx") - F.col("q_train_fx"))
        )
        .cast("long")
        .alias("wgap_fx"),
    )
    tot = gaps.agg(
        F.sum("n_test").cast("long").alias("nt"),
        F.sum("wgap_fx").cast("long").alias("num"),
    )
    return gaps.crossJoin(F.broadcast(tot)).select(
        "bucket", "n_train", "pos_train", "n_test", "pos_test",
        "q_train_fx", "q_test_fx", "wgap_fx",
        F.col("num").cast("long").alias("ece_num"),
        (
            F.col("num").cast("double")
            / (
                F.when(F.col("nt") == 0, F.lit(1)).otherwise(F.col("nt"))
                * _ECE_FX
            ).cast("double")
        ).alias("ece"),
    )


_GH_PRICE = 150000   # label threshold: y = totalprice > _GH_PRICE
_GH_GRID = 1 << 16   # histogram counts quantized to this grid (scale-free)


@register(
    "ml_gradient_histogram",
    oracle=f"""
        WITH labeled AS (
            SELECT CAST(month(o_orderdate) AS BIGINT) AS mo,
                   CASE WHEN CAST(o_totalprice AS DECIMAL(18,4))
                             > {_GH_PRICE} THEN 1 ELSE 0 END AS y
            FROM orders
        ), hist AS (
            SELECT mo, CAST(count(*) AS BIGINT) AS cnt,
                   CAST(SUM(y) AS BIGINT) AS pos
            FROM labeled GROUP BY mo
        ), tot AS (
            SELECT CAST(CASE WHEN COALESCE(SUM(cnt), 0) = 0 THEN 1
                             ELSE SUM(cnt) END AS BIGINT) AS n
            FROM hist
        ), q AS (
            SELECT mo,
                   CAST(cnt * {_GH_GRID} // (SELECT n FROM tot)
                        AS BIGINT) AS cq,
                   CAST(pos * {_GH_GRID} // (SELECT n FROM tot)
                        AS BIGINT) AS pq
            FROM hist
        ), cum AS (
            SELECT mo, cq, pq,
                   CAST(SUM(cq - 4 * pq) OVER (
                       ORDER BY mo ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS al,
                   CAST(SUM(3 * cq) OVER (
                       ORDER BY mo ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS hl,
                   CAST(SUM(cq - 4 * pq) OVER () AS BIGINT) AS at,
                   CAST(SUM(3 * cq) OVER () AS BIGINT) AS ht
            FROM q
        ), terms AS (
            SELECT mo, cq, pq,
                   al, hl + 16 AS bl,
                   at - al AS ar, ht - hl + 16 AS br,
                   at, ht + 16 AS bt
            FROM cum
        ), frac AS (
            SELECT mo, cq, pq, al, bl, ar, br,
                   CAST(al AS DECIMAL(38,0)) * al * br * bt
                   + CAST(ar AS DECIMAL(38,0)) * ar * bl * bt
                   - CAST(at AS DECIMAL(38,0)) * at * bl * br AS num,
                   CAST(bl AS DECIMAL(38,0)) * br * bt AS den
            FROM terms
        )
        SELECT mo AS split_month,
               cq AS cnt_q, pq AS pos_q,
               al AS g_left_fx, bl AS h_left_fx,
               ar AS g_right_fx, br AS h_right_fx,
               CAST(CAST(num AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(den AS VARCHAR) AS DOUBLE) AS gain
        FROM frac
    """,
    doc="GBDT split-finding GRADIENT HISTOGRAM (the core distributed "
        "operator of XGBoost/LightGBM — Chen & Guestrin KDD'16, "
        "public): logloss gradients at a constant prior p0 = 1/4 for "
        f"the label y = totalprice > {_GH_PRICE}, histogrammed by "
        "order month, then the exact split-gain scan "
        "GL^2/(HL+l) + GR^2/(HR+l) - G^2/(H+l) (lambda = 1) over the "
        "12 candidate thresholds. Determinism recipe: per-month "
        "(count, positives) are quantized to a 2^16 grid over the "
        "total (trunc division — the scale-invariance rule, same as "
        "ml_bradley_terry), making gradients exact ints on the "
        "{-3, +1}/4 grid and hessians 3/16 per row, so gains are "
        "single fractions of DECIMAL(38,0) products (provably < 1e38 "
        "at ANY corpus size) crossed to double via the shortest-"
        "string hop; lambda keeps every denominator >= 16 with no "
        "zero guard needed. Spark plan: one grouped count over the "
        "fact table (partial-agg), then a 12-row windowless HOF "
        "cumsum (with_running_sums — no WindowExec) — the histogram "
        "aggregation IS the distributed work, exactly as in a real "
        "GBDT learner; the split scan is dimension-bounded.",
    tags=("ml", "stats"),
)
def ml_gradient_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_running_sums

    t = Tables(spark, sf_dir)
    labeled = t.orders.select(
        F.month("o_orderdate").cast("long").alias("mo"),
        F.when(
            F.col("o_totalprice").cast("decimal(18,4)") > _GH_PRICE, 1
        )
        .otherwise(0)
        .alias("y"),
    )
    hist = labeled.groupBy("mo").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("y").cast("long").alias("pos"),
    )
    tot = hist.agg(
        F.when(
            F.coalesce(F.sum("cnt"), F.lit(0)) == 0, F.lit(1)
        )
        .otherwise(F.sum("cnt"))
        .cast("long")
        .alias("n")
    )
    q = hist.crossJoin(F.broadcast(tot)).select(
        "mo",
        F.expr(f"cnt * {_GH_GRID} div n").cast("long").alias("cq"),
        F.expr(f"pos * {_GH_GRID} div n").cast("long").alias("pq"),
    )
    qv = q.select(
        "mo", "cq", "pq",
        (F.col("cq") - 4 * F.col("pq")).alias("a"),
        (3 * F.col("cq")).alias("h"),
    )
    cum = with_running_sums(
        qv, "mo", ["cq", "pq", "a", "h"], prefix="c", totals_prefix="t"
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    al, hl = F.col("ca"), F.col("ch")
    at, ht = F.col("ta"), F.col("th")
    bl = hl + 16
    ar = at - al
    br = ht - hl + 16
    bt = ht + 16
    num = d(al) * al * br * bt + d(ar) * ar * bl * bt - d(at) * at * bl * br
    den = d(bl) * br * bt
    return cum.select(
        F.col("mo").alias("split_month"),
        F.col("cq").alias("cnt_q"),
        F.col("pq").alias("pos_q"),
        al.cast("long").alias("g_left_fx"),
        bl.cast("long").alias("h_left_fx"),
        ar.cast("long").alias("g_right_fx"),
        br.cast("long").alias("h_right_fx"),
        (num.cast("double") / den.cast("double")).alias("gain"),
    )
