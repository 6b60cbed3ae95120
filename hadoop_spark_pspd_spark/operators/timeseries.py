"""Time-series rollups over the events table (hypertable-rollup shape).

Multi-resolution continuous aggregates (minute/hour/day) computed in ONE
pass via GROUPING SETS over pre-computed time buckets — the Spark-native
restatement of a hypertable's cascaded rollups: no per-resolution rescan,
partial aggregation shared across resolutions by the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register


@register(
    "q_multires_rollup",
    oracle="""
        SELECT resolution, bucket, event_type, n, sum_value
        FROM (
            SELECT CASE
                       WHEN GROUPING(minute) = 0 THEN 'minute'
                       WHEN GROUPING(hour) = 0 THEN 'hour'
                       ELSE 'day'
                   END AS resolution,
                   CAST(coalesce(minute, hour, day) AS TIMESTAMP) AS bucket,
                   event_type,
                   count(*) AS n,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                       AS sum_value
            FROM (
                SELECT event_type, value,
                       date_trunc('minute', ts) AS minute,
                       date_trunc('hour', ts) AS hour,
                       date_trunc('day', ts) AS day
                FROM events
            )
            GROUP BY GROUPING SETS (
                (minute, hour, day, event_type),
                (hour, day, event_type),
                (day, event_type)
            )
        )
    """,
    doc="Hypertable-style multi-resolution rollup: minute/hour/day "
        "aggregates of events in one scan via GROUPING SETS.",
)
def q_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    t.register_views(prefix="pspd_")
    return spark.sql("""
        SELECT CASE
                   WHEN GROUPING(minute) = 0 THEN 'minute'
                   WHEN GROUPING(hour) = 0 THEN 'hour'
                   ELSE 'day'
               END AS resolution,
               coalesce(minute, hour, day) AS bucket,
               event_type,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM (
            SELECT event_type, value,
                   date_trunc('minute', ts) AS minute,
                   date_trunc('hour', ts) AS hour,
                   date_trunc('day', ts) AS day
            FROM pspd_events
        )
        GROUP BY GROUPING SETS (
            (minute, hour, day, event_type),
            (hour, day, event_type),
            (day, event_type)
        )
    """)


@register(
    "q_gap_fill",
    oracle="""
        WITH bounds AS (
            SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS lo,
                   CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS hi
            FROM events
        ), grid AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
            FROM bounds
        ), actual AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   count(*) AS n
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        )
        SELECT g.day, coalesce(a.n, 0) AS n
        FROM grid g LEFT JOIN actual a ON a.day = g.day
    """,
    doc="Gap-filled daily series: dense calendar grid via sequence() + "
        "left join, zeros where no events (time-series densification).",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bounds = t.events.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    actual = (
        t.events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count("*").alias("cnt"))
    )
    return grid.join(actual, "day", "left").select(
        "day", F.coalesce(F.col("cnt"), F.lit(0)).alias("n")
    )


@register(
    "q_cusum_changepoint",
    oracle="""
        WITH moments AS (
            SELECT event_type, count(*) AS n,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS s
            FROM events GROUP BY event_type
        ),
        cum AS (
            SELECT e.event_type, ts, event_id,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w
                             AS VARCHAR) AS DOUBLE)
                       - row_number() OVER w * (s / n) AS drift
            FROM events e JOIN moments m ON e.event_type = m.event_type
            WINDOW w AS (PARTITION BY e.event_type
                         ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        )
        SELECT event_type, ts AS change_ts, drift AS peak_drift FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY abs(drift) DESC, ts, event_id) AS rk
            FROM cum
        ) WHERE rk = 1
    """,
    doc="CUSUM changepoint per event type: the cumulative deviation from "
        "the series mean, peak = the candidate changepoint. The cumulative "
        "sum is an EXACT decimal running sum and the mean is the "
        "exact-decimal global mean, so the per-row drift is one "
        "deterministic double expression — a drift detector with "
        "hash-stable output. The oracle states the running sum as one "
        "global window per type; the engine computes it as a two-level "
        "prefix sum (within-day window + broadcast per-day decimal "
        "offsets, the text_pack_shards pattern) so no event type becomes "
        "a single serial window partition at scale.",
    tags=("timeseries", "stats"),
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    dec_v = F.col("value").cast("decimal(18,4)")
    ev = t.events.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.to_date("ts").alias("day"),
    )
    moments = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec_v).cast("double").alias("s"),
    )
    within_w = (
        W.partitionBy("event_type", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ord_w = W.partitionBy("event_type", "day").orderBy("ts", "event_id")
    per_row = ev.select(
        "event_type",
        "day",
        "ts",
        "event_id",
        F.sum(dec_v).over(within_w).alias("within_sum"),
        F.row_number().over(ord_w).cast("bigint").alias("within_k"),
    )
    day_w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        ev.groupBy("event_type", "day")
        .agg(F.sum(dec_v).alias("dsum"), F.count("*").alias("dcnt"))
        .select(
            "event_type",
            "day",
            F.coalesce(
                F.sum("dsum").over(day_w),
                F.lit(0).cast("decimal(18,4)"),
            ).alias("off_sum"),
            F.coalesce(F.sum("dcnt").over(day_w), F.lit(0)).alias("off_k"),
        )
    )
    drift = (
        (F.col("off_sum") + F.col("within_sum")).cast("double")
        - (F.col("off_k") + F.col("within_k")) * (F.col("s") / F.col("n"))
    )
    cum = (
        per_row.join(F.broadcast(offsets), ["event_type", "day"])
        .join(F.broadcast(moments), "event_type")
        .select("event_type", "ts", "event_id", drift.alias("drift"))
    )
    pick = W.partitionBy("event_type").orderBy(
        F.abs(F.col("drift")).desc(), "ts", "event_id"
    )
    return (
        cum.withColumn("rk", F.row_number().over(pick))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("ts").alias("change_ts"),
            F.col("drift").alias("peak_drift"),
        )
    )


# 32-step truncated-EWMA weights: term j (j=0 newest) = n_{t-j} / 2^(j+1).
# Every term is an exact dyadic rational with common denominator 2^32 and
# the total numerator stays < 2^53 for hourly counts < ~2^20, so the sum
# is EXACT in f64 and addition order is irrelevant — cross-engine safe
# with no fixed-point scaffolding (the repo's power-of-two-divisor rule).
_EWMA_STEPS = 32


def _ewma_terms_sql() -> str:
    terms = ["n / CAST(2 AS DOUBLE)"]
    terms += [
        f"COALESCE(lag(n, {j}) OVER w, 0) / CAST({1 << (j + 1)} AS DOUBLE)"
        for j in range(1, _EWMA_STEPS)
    ]
    return "\n               + ".join(terms)


@register(
    "ts_ewma_counts",
    oracle=f"""
        WITH hourly AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, hour, n,
               {_ewma_terms_sql()} AS ewma
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour)
    """,
    doc="Exponentially-weighted moving average of hourly event counts "
        "(alpha = 1/2, horizon truncated at 32 buckets over the ordered "
        "sequence of non-empty hours): the smoothed-rate monitor a "
        "streaming-analytics stack derives alerts from. One partial-agg "
        "shuffle to hourly counts (map-side combine), then ONE window "
        "pass computing all 32 lag terms — at 100 TB the window state is "
        "bounded by buckets-per-type, not events. Exactness: each term "
        "n/2^(j+1) is an exact dyadic (power-of-two divisor, counts < "
        "2^20), the 32-term sum's numerator fits 2^53, so the double is "
        "exact and addition order is irrelevant cross-engine.",
)
def ts_ewma_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("hour")
    terms = [F.col("n").cast("double") / F.lit(2.0)]
    terms += [
        F.coalesce(F.lag("n", j).over(w), F.lit(0)).cast("double")
        / F.lit(float(1 << (j + 1)))
        for j in range(1, _EWMA_STEPS)
    ]
    return hourly.select(
        "event_type", "hour", "n",
        reduce(lambda a, b: a + b, terms).alias("ewma"),
    )


@register(
    "ts_resample_ohlc",
    oracle="""
        WITH ranked AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   value,
                   row_number() OVER (PARTITION BY event_type,
                                                   date_trunc('hour', ts)
                                      ORDER BY ts, event_id) AS ra,
                   row_number() OVER (PARTITION BY event_type,
                                                   date_trunc('hour', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rd
            FROM events
        )
        SELECT event_type, hour,
               max(CASE WHEN ra = 1 THEN value END) AS open,
               max(value) AS high,
               min(value) AS low,
               max(CASE WHEN rd = 1 THEN value END) AS close,
               count(*) AS volume,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR)
                    AS DOUBLE) AS sum_value
        FROM ranked
        GROUP BY event_type, hour
    """,
    doc="OHLC resampling (candlestick bars): per (event_type, hour) the "
        "first/max/min/last event value plus volume and exact-decimal "
        "turnover — the market-data downsampler. Open/close are picked by "
        "a total order (ts, event_id), so they are raw stored doubles "
        "(no arithmetic -> no drift); high/low are order-free picks; the "
        "only summed column goes through DECIMAL(18,4). One shuffle: both "
        "row_number windows share the (event_type, hour) partitioning, so "
        "Catalyst plans a single Exchange with two sorts, and the "
        "follow-up groupBy is partition-local. Window state is bounded by "
        "events-per-hour-per-type, never global.",
    tags=("timeseries",),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "ts",
        "event_id",
        "value",
    )
    w_asc = W.partitionBy("event_type", "hour").orderBy("ts", "event_id")
    w_desc = W.partitionBy("event_type", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "event_type",
        "hour",
        "value",
        F.row_number().over(w_asc).alias("ra"),
        F.row_number().over(w_desc).alias("rd"),
    )
    return ranked.groupBy("event_type", "hour").agg(
        F.max(F.when(F.col("ra") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rd") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("volume"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    )


def _autocorr_sql(lag: int) -> str:
    """One lag's Pearson sums over the ordered hourly-count series.

    Every sum is outer-CAST to BIGINT (DuckDB SUM(BIGINT) is HUGEINT)
    BEFORE the int64 products, mirroring the Spark arithmetic exactly."""
    return f"""
            SELECT event_type, CAST({lag} AS INTEGER) AS lag,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM (
                SELECT event_type, n AS x,
                       lead(n, {lag}) OVER (PARTITION BY event_type
                                            ORDER BY hour) AS y
                FROM hourly
            )
            WHERE y IS NOT NULL
            GROUP BY event_type"""


@register(
    "ts_autocorr_lag",
    oracle=f"""
        WITH hourly AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        sums AS ({_autocorr_sql(1)}
            UNION ALL {_autocorr_sql(24)}
        )
        SELECT event_type, lag, n_pairs,
               n_pairs * sxy - sx * sy AS num,
               n_pairs * sxx - sx * sx AS vx,
               n_pairs * syy - sy * sy AS vy,
               CASE WHEN n_pairs * sxx - sx * sx > 0
                     AND n_pairs * syy - sy * sy > 0
                    THEN CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))
                    ELSE CAST(0 AS DOUBLE) END AS autocorr
        FROM sums
    """,
    doc="Lag-1 and lag-24 autocorrelation of the per-type hourly count "
        "series (seasonality detector): Pearson r over (x_t, x_t+lag) "
        "pairs of CONSECUTIVE non-empty hour buckets. All six moment sums "
        "are exact int64 (counts), so num/vx/vy are exact integers and r "
        "is the identical 4-op IEEE expression in both engines — "
        "int64->double casts exact below 2^53, sqrt/mul/div correctly "
        "rounded (the round-5 eigendecomposition rule). Degenerate "
        "(constant) series zero-guard vx/vy identically. One partial-agg "
        "shuffle to hourly counts, one bounded window pass (state = "
        "buckets per type), one tiny final agg. Overflow bound: "
        "n_pairs * sxx < 2^63 needs hourly counts < ~2^21 at 2^21 "
        "buckets — partition the series (e.g. per month) past that.",
    tags=("timeseries", "stats"),
)
def ts_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type").orderBy("hour")
    leads = hourly.select(
        "event_type",
        F.col("n").alias("x"),
        F.lead("n", 1).over(w).alias("y1"),
        F.lead("n", 24).over(w).alias("y24"),
    )
    parts = []
    for lag, ycol in ((1, "y1"), (24, "y24")):
        y = F.col(ycol)
        x = F.col("x")
        sums = (
            leads.where(y.isNotNull())
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_pairs"),
                F.sum(x).alias("sx"),
                F.sum(y).alias("sy"),
                F.sum(x * x).alias("sxx"),
                F.sum(y * y).alias("syy"),
                F.sum(x * y).alias("sxy"),
            )
        )
        num = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
        vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
        vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
        r = F.when(
            (vx > 0) & (vy > 0),
            num.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
        ).otherwise(F.lit(0.0))
        parts.append(
            sums.select(
                "event_type",
                F.lit(lag).cast("int").alias("lag"),
                "n_pairs",
                num.alias("num"),
                vx.alias("vx"),
                vy.alias("vy"),
                r.alias("autocorr"),
            )
        )
    return parts[0].unionAll(parts[1])


@register(
    "ts_seasonal_naive",
    oracle="""
        WITH hourly AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT a.event_type,
               CAST(count(*) AS BIGINT) AS n_eval,
               CAST(SUM(abs(a.n - b.n)) AS BIGINT) AS sae,
               CAST(SUM(a.n - b.n) AS BIGINT) AS bias,
               CAST(CAST(SUM(abs(a.n - b.n)) AS BIGINT) AS DOUBLE)
                   / CAST(count(*) AS BIGINT) AS mae
        FROM hourly a
        JOIN hourly b
          ON a.event_type = b.event_type
         AND b.hour = a.hour - INTERVAL 24 HOUR
        GROUP BY a.event_type
    """,
    doc="Seasonal-naive forecast error: predict each hour's count by the "
        "same hour yesterday (calendar join, so gaps are skipped rather "
        "than misaligned), report per-type MAE + signed bias — the "
        "baseline every anomaly detector must beat. sae/bias are exact "
        "integer sums; mae is ONE correctly-rounded double division of "
        "2^53-exact operands. The self-join runs on the tiny hourly "
        "rollup (post-aggregation), not the fact table, so the join side "
        "is buckets-per-type rows at any corpus scale.",
    tags=("timeseries", "stats"),
)
def ts_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    a = hourly.alias("a")
    b = hourly.alias("b")
    joined = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (
            F.col("b.hour")
            == F.col("a.hour") - F.expr("INTERVAL 24 HOURS")
        ),
    )
    diff = F.col("a.n") - F.col("b.n")
    return joined.groupBy(F.col("a.event_type").alias("event_type")).agg(
        F.count("*").alias("n_eval"),
        F.sum(F.abs(diff)).alias("sae"),
        F.sum(diff).alias("bias"),
        (
            F.sum(F.abs(diff)).cast("double")
            / F.count("*").cast("bigint")
        ).alias("mae"),
    )


@register(
    "q_time_weighted_avg",
    oracle="""
        WITH seq AS (
            SELECT event_type,
                   CAST(value AS DECIMAL(18,4)) AS v,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                   ) - epoch_us(ts) AS dt_us
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_intervals,
               CAST(SUM(dt_us) AS BIGINT) AS total_us,
               CAST(CAST(SUM(v * dt_us) AS VARCHAR) AS DOUBLE)
                   / CAST(SUM(dt_us) AS BIGINT) AS twa
        FROM seq
        WHERE dt_us IS NOT NULL AND dt_us > 0
        GROUP BY event_type
    """,
    doc="Time-weighted average of the event value per type (the "
        "irregular-sampling mean a metrics store reports): each sample "
        "holds until the next one, so its weight is the exact integer "
        "microsecond gap. value routes through DECIMAL(18,4), the "
        "decimal x BIGINT products sum EXACTLY (decimal addition — "
        "summation order irrelevant), and the final twa is exact-sum / "
        "exact-integer: one deterministic double division. Zero-length "
        "gaps (duplicate timestamps) carry zero weight and are dropped "
        "identically. One (type, ts) window for the lead — state "
        "bounded per type partition; at 100 TB partition additionally "
        "by day and stitch boundary gaps like the cusum two-level "
        "prefix pattern.",
    tags=("timeseries",),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = t.events.select(
        "event_type",
        F.col("value").cast("decimal(18,4)").alias("v"),
        (F.lead(us, 1).over(w) - us).alias("dt_us"),
    )
    kept = seq.where(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_intervals"),
        F.sum("dt_us").alias("total_us"),
        (
            F.sum(F.col("v") * F.col("dt_us")).cast("double")
            / F.sum("dt_us")
        ).alias("twa"),
    )


@register(
    "ts_seasonal_profile",
    oracle="""
        WITH base AS (
            SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod,
                   CAST(value AS DECIMAL(18,4)) AS v
            FROM events
        ),
        per AS (
            SELECT event_type, hod,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) AS sum_value
            FROM base GROUP BY event_type, hod
        ),
        tot AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS total_n
            FROM base GROUP BY event_type
        )
        SELECT p.event_type, p.hod, p.n,
               p.sum_value / p.n AS mean_value,
               CAST(p.n AS DOUBLE) / t.total_n AS share
        FROM per p JOIN tot t ON t.event_type = p.event_type
    """,
    doc="Hour-of-day seasonal profile per event type (the diurnal shape "
        "an anomaly baseline conditions on): event count, exact-decimal "
        "mean value, and traffic share per (type, 0..23) bucket. Both "
        "ratios are exact-sum / exact-int single divisions; hour() under "
        "the pinned UTC session tz is identical cross-engine. Two "
        "map-side-combined aggs over a 24-bucket key space — fixed-width "
        "mergeable state at any corpus size.",
    tags=("timeseries",),
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.events.select(
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    per = base.groupBy("event_type", "hod").agg(
        F.count("*").alias("n"),
        F.sum("v").cast("double").alias("sum_value"),
    )
    tot = base.groupBy("event_type").agg(F.count("*").alias("total_n"))
    return per.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hod",
        "n",
        (F.col("sum_value") / F.col("n")).alias("mean_value"),
        (F.col("n").cast("double") / F.col("total_n")).alias("share"),
    )


@register(
    "ts_moving_median",
    oracle="""
        WITH hourly AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        windowed AS (
            SELECT event_type, hour, n,
                   list_sort(list(n) OVER (
                       PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
                   )) AS w
            FROM hourly
        )
        SELECT event_type, hour, n,
               CAST(len(w) AS BIGINT) AS w_size,
               CASE WHEN len(w) % 2 = 1
                    THEN CAST(w[(len(w) + 1) // 2] AS DOUBLE)
                    ELSE (CAST(w[len(w) // 2] AS DOUBLE)
                          + CAST(w[len(w) // 2 + 1] AS DOUBLE)) / 2.0
               END AS moving_median
        FROM windowed
    """,
    doc="5-bucket moving median of hourly counts per type — the "
        "robust smoother a spike-tolerant anomaly baseline uses instead "
        "of a moving mean. Computed from first principles (collect the "
        "ROWS frame, sort, pick) because the engines' built-in windowed "
        "median/interpolation internals differ: odd frames pick a raw "
        "integer, even frames average two integers (a dyadic .5-exact "
        "double), so every output is bit-deterministic. Frame state is "
        "5 values; one (type)-partitioned window pass over the tiny "
        "hourly rollup.",
    tags=("timeseries", "stats"),
)
def ts_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-4, W.currentRow)
    )
    windowed = hourly.select(
        "event_type",
        "hour",
        "n",
        F.sort_array(F.collect_list("n").over(w)).alias("w"),
    )
    size = F.size("w")
    odd = F.element_at(F.col("w"), ((size + 1) / 2).cast("int"))
    lo = F.element_at(F.col("w"), (size / 2).cast("int"))
    hi = F.element_at(F.col("w"), (size / 2 + 1).cast("int"))
    med = F.when(size % 2 == 1, odd.cast("double")).otherwise(
        (lo.cast("double") + hi.cast("double")) / F.lit(2.0)
    )
    return windowed.select(
        "event_type",
        "hour",
        "n",
        size.cast("bigint").alias("w_size"),
        med.alias("moving_median"),
    )


_DONCHIAN_W = 24  # trailing window (hours), current bar excluded


@register(
    "ts_channel_breakout",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), chan AS (
            SELECT event_type, hour, n,
                   CAST(max(n) OVER w AS BIGINT) AS ch_hi,
                   CAST(min(n) OVER w AS BIGINT) AS ch_lo
            FROM hourly
            WINDOW w AS (PARTITION BY event_type ORDER BY hour
                         ROWS BETWEEN {_DONCHIAN_W} PRECEDING
                                  AND 1 PRECEDING)
        )
        SELECT event_type, hour, n, ch_hi, ch_lo,
               CASE WHEN ch_hi IS NULL THEN 0
                    WHEN n > ch_hi THEN 1
                    WHEN n < ch_lo THEN -1
                    ELSE 0 END AS breakout
        FROM chan
    """,
    doc="Donchian channel breakout flags over hourly event counts: the "
        "channel is the max/min count of the trailing 24 bars (current "
        "bar excluded — the standard turtle-trading rule, also the "
        "volume-anomaly alert an ops pipeline fires on traffic spikes/"
        "cliffs). Pure integer window aggregates over a ROWS frame with "
        "a unique (event_type, hour) ordering; the first bars of each "
        "series have an empty frame -> NULL channel -> flag 0, encoded "
        "identically in both engines. One agg + one window over the "
        "same partitioning = two exchanges total; per-series state is "
        "the 24-row frame, never the whole series.",
    tags=("timeseries",),
)
def ts_channel_breakout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    hourly = (
        t.events.groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(F.count("*").alias("n"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-_DONCHIAN_W, -1)
    )
    chan = hourly.select(
        "event_type",
        "hour",
        "n",
        F.max("n").over(w).alias("ch_hi"),
        F.min("n").over(w).alias("ch_lo"),
    )
    breakout = (
        F.when(F.col("ch_hi").isNull(), 0)
        .when(F.col("n") > F.col("ch_hi"), 1)
        .when(F.col("n") < F.col("ch_lo"), -1)
        .otherwise(0)
    )
    return chan.select(
        "event_type", "hour", "n", "ch_hi", "ch_lo",
        breakout.alias("breakout"),
    )


_BT_LAG_H = 168  # seasonal-naive horizon: same hour last week


@register(
    "ts_backtest_mae",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), joined AS (
            SELECT a.event_type, a.n,
                   f.n AS forecast
            FROM hourly a
            JOIN hourly f
              ON f.event_type = a.event_type
             AND f.hour = a.hour - INTERVAL {_BT_LAG_H} HOUR
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_forecasts,
               CAST(SUM(abs(n - forecast)) AS BIGINT) AS abs_err_total,
               CAST(SUM(abs(n - forecast)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS mae,
               CAST(SUM(CASE WHEN n = forecast THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact
        FROM joined GROUP BY event_type
    """,
    doc="Rolling-origin backtest of the seasonal-naive forecaster "
        "(forecast = same hour last week) over hourly event counts — "
        "the baseline every demand-forecasting system must beat, "
        "evaluated the way a forecasting platform actually scores "
        "models: walk forward, score only hours whose seasonal lag "
        "exists. Errors are |count - lag| INTEGER sums (MAE needs no "
        "float accumulation, unlike RMSE), one exact division at the "
        "end. Implemented as a self-equi-join on the shifted hour "
        "rather than a 168-row window frame: one hash join beats "
        "carrying a week of per-series window state, and hours missing "
        "from the lag side drop out exactly like the oracle's inner "
        "join. Two shuffles total.",
    tags=("timeseries", "ml"),
)
def ts_backtest_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hourly = (
        t.events.groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(F.count("*").alias("n"))
    )
    fc = hourly.select(
        "event_type",
        (F.col("hour") + F.expr(f"INTERVAL {_BT_LAG_H} HOURS")).alias(
            "hour"
        ),
        F.col("n").alias("forecast"),
    )
    joined = hourly.join(fc, ["event_type", "hour"])
    err = F.abs(F.col("n") - F.col("forecast"))
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_forecasts"),
        F.sum(err).cast("bigint").alias("abs_err_total"),
        (F.sum(err).cast("double") / F.count("*").cast("double")).alias(
            "mae"
        ),
        F.sum(F.when(F.col("n") == F.col("forecast"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
    )


@register(
    "ts_missing_hours",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour
            FROM events GROUP BY 1, 2
        ), spans AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_observed,
                   CAST((epoch(CAST(max(hour) AS TIMESTAMP))
                         - epoch(CAST(min(hour) AS TIMESTAMP)))
                        AS BIGINT) // 3600 + 1 AS n_expected
            FROM hourly GROUP BY event_type
        )
        SELECT event_type, n_observed,
               CAST(n_expected AS BIGINT) AS n_expected,
               CAST(n_expected - n_observed AS BIGINT) AS n_missing,
               CAST(n_expected - n_observed AS DOUBLE)
                   / CAST(n_expected AS DOUBLE) AS missing_frac
        FROM spans
    """,
    doc="Hourly-continuity audit per event series — the freshness/"
        "completeness check a data-SLA monitor runs on every ingested "
        "stream: expected hours = span between first and last observed "
        "hour (epoch-second arithmetic, integer division by 3600 — "
        "Spark unix_timestamp == DuckDB epoch under the pinned UTC "
        "session), observed = distinct hours present, missing = the "
        "gap count that pages the on-call. All integers plus one exact "
        "division. One agg over the distinct (type, hour) grid.",
    tags=("timeseries", "profiling"),
)
def ts_missing_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hourly = t.events.select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).distinct()
    spans = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_observed"),
        (
            (
                F.unix_timestamp(F.max("hour"))
                - F.unix_timestamp(F.min("hour"))
            )
            / 3600
        ).cast("bigint").alias("span_h"),
    )
    n_expected = F.col("span_h") + 1
    return spans.select(
        "event_type",
        "n_observed",
        n_expected.cast("bigint").alias("n_expected"),
        (n_expected - F.col("n_observed")).cast("bigint").alias("n_missing"),
        (
            (n_expected - F.col("n_observed")).cast("double")
            / n_expected.cast("double")
        ).alias("missing_frac"),
    )


@register(
    "ts_anomaly_seasonal",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), joined AS (
            SELECT a.event_type, a.hour, a.n,
                   f.n AS forecast,
                   a.n - f.n AS resid,
                   abs(a.n - f.n) AS a_resid
            FROM hourly a
            JOIN hourly f
              ON f.event_type = a.event_type
             AND f.hour = a.hour - INTERVAL {_BT_LAG_H} HOUR
        ), hist AS (
            SELECT event_type, a_resid,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM joined GROUP BY 1, 2
        ), cum AS (
            SELECT event_type, a_resid,
                   SUM(cnt) OVER (PARTITION BY event_type
                                  ORDER BY a_resid) AS cum,
                   SUM(cnt) OVER (PARTITION BY event_type) AS tot
            FROM hist
        ), mad AS (
            SELECT event_type,
                   CAST(min(CASE WHEN 2 * cum >= tot
                                 THEN a_resid END) AS BIGINT) AS mad
            FROM cum GROUP BY event_type
        )
        SELECT j.event_type, j.hour, j.n, j.forecast,
               CAST(j.resid AS BIGINT) AS resid,
               m.mad,
               j.a_resid > 4 * (CASE WHEN m.mad = 0 THEN 1
                                     ELSE m.mad END) AS flagged
        FROM joined j JOIN mad m USING (event_type)
    """,
    doc="Seasonality-aware anomaly flags: residual = hourly count minus "
        "the same hour last week (the ts_backtest_mae forecaster), "
        "flagged when |residual| exceeds 4x the series' MEDIAN absolute "
        "residual — robust to the heavy-tailed residuals that wreck "
        "z-score rules, and seasonal where the Donchian breakout is "
        "level-only. The MAD is an exact integer order statistic over "
        "the |residual| VALUE HISTOGRAM (2*cum >= n on the bucket "
        "cumsum — never a row sort), the zero-MAD degenerate series "
        "(perfectly repeating) is guarded to 1 identically in both "
        "engines, and the flag is a pure integer comparison. Three "
        "aggs + one bounded window over distinct residual values.",
    tags=("timeseries", "ml"),
)
def ts_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    hourly = (
        t.events.groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
        )
        .agg(F.count("*").alias("n"))
    )
    fc = hourly.select(
        "event_type",
        (F.col("hour") + F.expr(f"INTERVAL {_BT_LAG_H} HOURS")).alias(
            "hour"
        ),
        F.col("n").alias("forecast"),
    )
    joined = hourly.join(fc, ["event_type", "hour"]).select(
        "event_type",
        "hour",
        "n",
        "forecast",
        (F.col("n") - F.col("forecast")).alias("resid"),
        F.abs(F.col("n") - F.col("forecast")).alias("a_resid"),
    )
    hist = joined.groupBy("event_type", "a_resid").agg(
        F.count("*").alias("cnt")
    )
    cum = hist.select(
        "event_type",
        "a_resid",
        F.sum("cnt")
        .over(W.partitionBy("event_type").orderBy("a_resid"))
        .alias("cum"),
        F.sum("cnt").over(W.partitionBy("event_type")).alias("tot"),
    )
    mad = cum.groupBy("event_type").agg(
        F.min(
            F.when(2 * F.col("cum") >= F.col("tot"), F.col("a_resid"))
        )
        .cast("bigint")
        .alias("mad")
    )
    guard = F.when(F.col("mad") == 0, 1).otherwise(F.col("mad"))
    return joined.join(mad, "event_type").select(
        "event_type",
        "hour",
        "n",
        "forecast",
        F.col("resid").cast("bigint").alias("resid"),
        "mad",
        (F.col("a_resid") > 4 * guard).alias("flagged"),
    )


@register(
    "ts_load_profile",
    oracle="""
        WITH hourly AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        )
        SELECT CAST(dayofweek(hour) AS INTEGER) AS dow,
               CAST(hour(hour) AS INTEGER) AS hod,
               CAST(count(*) AS BIGINT) AS n_samples,
               CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
               CAST(quantile_disc(n, 0.95) AS BIGINT) AS p95,
               CAST(max(n) AS BIGINT) AS peak
        FROM hourly
        GROUP BY 1, 2
    """,
    doc="Hour-of-week load profile — the capacity-planning readout an "
        "autoscaler or on-call rota is sized from: for each (day-of-"
        "week, hour-of-day) bucket, the median, p95, and peak of total "
        "hourly event counts across the observed weeks. Percentiles "
        "are DISCRETE (actual observed counts — percentile_disc == "
        "DuckDB quantile_disc, exact by construction, no "
        "interpolation); day-of-week is aligned across engines (Spark "
        "dayofweek is 1-7 Sunday-first, DuckDB 0-6 — Spark emits "
        "dayofweek - 1). Two aggs; the profile is a fixed 168-row "
        "table at any scale.",
    tags=("timeseries", "profiling"),
)
def ts_load_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hourly = t.events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n"))
    return (
        hourly.groupBy(
            (F.dayofweek("hour") - 1).cast("int").alias("dow"),
            F.hour("hour").cast("int").alias("hod"),
        )
        .agg(
            F.count("*").alias("n_samples"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n)")
            .cast("bigint")
            .alias("p50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY n)")
            .cast("bigint")
            .alias("p95"),
            F.max("n").cast("bigint").alias("peak"),
        )
    )


# Holt linear-trend smoothing in 2^-20 fixed point. alpha = 1/2 and
# beta = 1/4 are DYADIC (round-6 rule: pick power-of-two free params),
# so each update is one integer division by 2 or 4. Divisions are
# OFFSET-PROTECTED: (v + _HOLT_OFF) div d - _HOLT_OFF/d keeps every
# operand positive (trend can be negative), so Spark `div` and
# DuckDB `//` agree REGARDLESS of their negative-operand semantics.
# Exact for |v| < 2^50, i.e. daily counts per type < 2^29.
_HOLT_FP = 1 << 20
_HOLT_OFF = 1 << 50


def _holt_fold_sql(arr: str) -> str:
    lp = (
        f"((e.x * {_HOLT_FP} + acc.l + acc.b + {_HOLT_OFF}) div 2)"
        f" - {_HOLT_OFF // 2}"
    )
    return f"""
        aggregate(
            {arr},
            struct(CAST(0 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
                   false AS started),
            (acc, e) -> IF(NOT acc.started,
                struct(CAST(e.x * {_HOLT_FP} AS BIGINT) AS l,
                       CAST(0 AS BIGINT) AS b, true AS started),
                struct(
                    CAST({lp} AS BIGINT) AS l,
                    CAST((({lp} - acc.l + 3 * acc.b + {_HOLT_OFF}) div 4)
                         - {_HOLT_OFF // 4} AS BIGINT) AS b,
                    true AS started)))
    """


@register(
    "ts_holt_forecast",
    oracle=f"""
        WITH RECURSIVE bounds AS (
            SELECT CAST(floor(epoch(min(ts))) AS BIGINT) // 86400 AS d0,
                   CAST(floor(epoch(max(ts))) AS BIGINT) // 86400 AS d1
            FROM events
        ), spine AS (
            SELECT CAST(unnest(range(0, d1 - d0 + 1)) AS BIGINT) AS step
            FROM bounds
        ), types AS (
            SELECT DISTINCT event_type FROM events
        ), raw AS (
            SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) // 86400
                       - (SELECT d0 FROM bounds) AS step,
                   CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ), daily AS MATERIALIZED (
            SELECT t.event_type, s.step, COALESCE(r.x, 0) AS x
            FROM types t CROSS JOIN spine s
            LEFT JOIN raw r
              ON r.event_type = t.event_type AND r.step = s.step
        ), hw(step, event_type, l, b) AS (
            SELECT step, event_type,
                   CAST(x * {_HOLT_FP} AS BIGINT), CAST(0 AS BIGINT)
            FROM daily WHERE step = 0
            UNION ALL
            SELECT d.step, d.event_type,
                   ((d.x * {_HOLT_FP} + h.l + h.b + {_HOLT_OFF}) // 2)
                       - {_HOLT_OFF // 2},
                   (((((d.x * {_HOLT_FP} + h.l + h.b + {_HOLT_OFF}) // 2)
                       - {_HOLT_OFF // 2}) - h.l + 3 * h.b + {_HOLT_OFF})
                      // 4) - {_HOLT_OFF // 4}
            FROM hw h
            JOIN daily d
              ON d.event_type = h.event_type AND d.step = h.step + 1
        ), last AS (
            SELECT h.event_type, h.l, h.b
            FROM hw h
            JOIN (SELECT event_type, max(step) AS ms FROM hw GROUP BY 1) m
              ON h.event_type = m.event_type AND h.step = m.ms
        ), xl AS (
            SELECT d.event_type, d.x AS x_last
            FROM daily d
            JOIN (SELECT event_type, max(step) AS ms FROM daily
                  GROUP BY 1) m
              ON d.event_type = m.event_type AND d.step = m.ms
        ), nd AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
            FROM daily GROUP BY 1
        )
        SELECT l.event_type, nd.n_days, xl.x_last,
               CAST(l.l AS BIGINT) AS level_q,
               CAST(l.b AS BIGINT) AS trend_q,
               CAST(l.l + l.b AS BIGINT) AS fcst_1,
               CAST(l.l + 7 * l.b AS BIGINT) AS fcst_7
        FROM last l
        JOIN nd ON l.event_type = nd.event_type
        JOIN xl ON l.event_type = xl.event_type
    """,
    doc="Holt double-exponential (level + trend) smoothing of daily "
        "event counts with a 7-day-ahead forecast — the trend-aware "
        "capacity-planning companion of ts_ewma_counts (which smooths "
        "level only). alpha = 1/2, beta = 1/4 (dyadic free parameters), "
        "state in 2^-20 fixed point, every update one offset-protected "
        "integer division — exact, order-free, and replayed bit-"
        "identically by a recursive DuckDB CTE over the same zero-"
        "filled day spine (missing days count 0, so the recursion "
        "depth is the calendar span, not the event count). Spark side "
        "folds each type's bounded daily array in ONE JVM higher-order "
        "aggregate — no window, no Python, no driver loop; the only "
        "shuffles are the daily count agg and the 5-row final group.",
    tags=("timeseries",),
)
def ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "event_type",
        F.expr("unix_timestamp(ts) div 86400").alias("day"),
    )
    raw = ev.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("x")
    )
    bounds = ev.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("d1") - F.col("d0"))
        ).alias("step"),
        "d0",
    )
    # distinct column name for the dimension side: raw and types share
    # the ev lineage, so joining raw["event_type"] == types["event_type"]
    # makes Catalyst emit the trivially-true-predicate self-join warning
    # (round-7 verdict item 6) — renaming breaks the ambiguity outright
    types = ev.select(F.col("event_type").alias("dim_type")).distinct()
    daily = (
        types.crossJoin(F.broadcast(spine))
        .join(
            raw,
            (F.col("day") == F.col("step") + F.col("d0"))
            & (F.col("event_type") == F.col("dim_type")),
            "left",
        )
        .select(
            F.col("dim_type").alias("event_type"),
            "step",
            F.coalesce(F.col("x"), F.lit(0).cast("bigint")).alias("x"),
        )
    )
    folded = daily.groupBy("event_type").agg(
        F.expr(
            _holt_fold_sql(
                "array_sort(collect_list(struct(step, x)))"
            )
        ).alias("st"),
        F.count("*").cast("bigint").alias("n_days"),
        F.max_by("x", "step").cast("bigint").alias("x_last"),
    )
    return folded.select(
        "event_type",
        "n_days",
        "x_last",
        F.col("st.l").alias("level_q"),
        F.col("st.b").alias("trend_q"),
        (F.col("st.l") + F.col("st.b")).alias("fcst_1"),
        (F.col("st.l") + F.lit(7) * F.col("st.b")).alias("fcst_7"),
    )


# ---------------------------------------------------------------------------
# Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013, public
# thesis algorithm — the standard time-series visualization reducer).
# Sequential in the bucket index by construction (each bucket's pick is
# a triangle against the PREVIOUS pick and the NEXT bucket's average),
# so the oracle is B-2 unrolled MATERIALIZED CTEs and every area is an
# exact integer: the next-bucket average is cleared by multiplying
# through by its point count m, giving
#   area2m = |(xp*m - sxn)*(yc - yp) - (xp - xc)*(syn - yp*m)|.

_LTTB_B = 16  # output points: 2 anchors + 14 interior buckets
_LTTB_NB = _LTTB_B - 2


def _lttb_oracle() -> str:
    nb = _LTTB_NB
    parts = [f"""
        WITH hourly AS MATERIALIZED (
            SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hx,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1
        ), series AS MATERIALIZED (
            SELECT CAST(row_number() OVER (ORDER BY hx) - 1 AS BIGINT)
                       AS idx, hx, y
            FROM hourly
        ), meta AS MATERIALIZED (
            SELECT CAST(count(*) AS BIGINT) AS n FROM series
        ), sel0 AS MATERIALIZED (
            SELECT CAST(0 AS BIGINT) AS k, s.hx, s.y,
                   CAST(0 AS BIGINT) AS area2m
            FROM series s CROSS JOIN meta
            WHERE s.idx = 0 AND meta.n >= {_LTTB_B}
        )"""]
    for k in range(1, nb + 1):
        lo = f"1 + (({k - 1} * (meta.n - 2)) // {nb})"
        hi = f"1 + (({k} * (meta.n - 2)) // {nb})"
        nhi = (
            "meta.n" if k == nb
            else f"1 + (({k + 1} * (meta.n - 2)) // {nb})"
        )
        parts.append(f""", sel{k} AS MATERIALIZED (
            SELECT CAST({k} AS BIGINT) AS k, hx, y, area2m FROM (
                SELECT s.hx, s.y,
                       abs( (p.hx * nx.m - nx.sxn) * (s.y - p.y)
                          - (p.hx - s.hx) * (nx.syn - p.y * nx.m) )
                           AS area2m
                FROM series s
                CROSS JOIN meta
                CROSS JOIN (SELECT hx, y FROM sel{k - 1}) p
                CROSS JOIN (
                    SELECT CAST(count(*) AS BIGINT) AS m,
                           CAST(sum(s2.hx) AS BIGINT) AS sxn,
                           CAST(sum(s2.y) AS BIGINT) AS syn
                    FROM series s2 CROSS JOIN meta
                    WHERE s2.idx >= {hi.replace('meta.n', 'meta.n')}
                      AND s2.idx < {nhi}
                ) nx
                WHERE s.idx >= {lo} AND s.idx < {hi}
                  AND meta.n >= {_LTTB_B}
                ORDER BY area2m DESC, s.hx ASC
                LIMIT 1
            )
        )""")
    parts.append(f""", tail_pt AS (
            SELECT CAST({nb + 1} AS BIGINT) AS k, s.hx, s.y,
                   CAST(0 AS BIGINT) AS area2m
            FROM series s CROSS JOIN meta
            WHERE s.idx = meta.n - 1 AND meta.n >= {_LTTB_B}
        )
        SELECT k, hx AS sel_hx, y AS sel_y, area2m FROM (
            SELECT * FROM sel0
            {" ".join(f"UNION ALL SELECT * FROM sel{i}"
                      for i in range(1, nb + 1))}
            UNION ALL SELECT * FROM tail_pt
        )""")
    return "".join(parts)


def _lttb_kernel(pdf):  # noqa: ANN001, ANN202 — pandas in/out
    import pandas as pd

    p = pdf.sort_values("hx")
    xs = [int(v) for v in p["hx"]]
    ys = [int(v) for v in p["y"]]
    n = len(xs)
    nb = _LTTB_NB
    cols = {"k": [], "sel_hx": [], "sel_y": [], "area2m": []}
    if n >= _LTTB_B:
        def emit(k, x, y, a):
            cols["k"].append(k)
            cols["sel_hx"].append(x)
            cols["sel_y"].append(y)
            cols["area2m"].append(a)

        emit(0, xs[0], ys[0], 0)
        xp, yp = xs[0], ys[0]
        for k in range(1, nb + 1):
            lo = 1 + ((k - 1) * (n - 2)) // nb
            hi = 1 + (k * (n - 2)) // nb
            nhi = n if k == nb else 1 + ((k + 1) * (n - 2)) // nb
            m = nhi - hi
            sxn = sum(xs[hi:nhi])
            syn = sum(ys[hi:nhi])
            best = None
            for i in range(lo, hi):
                a = abs(
                    (xp * m - sxn) * (ys[i] - yp)
                    - (xp - xs[i]) * (syn - yp * m)
                )
                # largest area, smallest hx on ties (xs is ascending,
                # so strict > keeps the earliest maximum)
                if best is None or a > best[0]:
                    best = (a, xs[i], ys[i])
            emit(k, best[1], best[2], best[0])
            xp, yp = best[1], best[2]
        emit(nb + 1, xs[-1], ys[-1], 0)
    return pd.DataFrame(
        {
            "k": pd.Series(cols["k"], dtype="int64"),
            "sel_hx": pd.Series(cols["sel_hx"], dtype="int64"),
            "sel_y": pd.Series(cols["sel_y"], dtype="int64"),
            "area2m": pd.Series(cols["area2m"], dtype="int64"),
        }
    )


@register(
    "ts_lttb_downsample",
    oracle=_lttb_oracle(),
    doc="Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013, "
        "the standard dashboard decimation algorithm, public): the "
        "hourly event-count series reduces to 16 points — two anchors "
        "plus one pick per interior bucket maximizing the triangle "
        "area against the previous pick and the NEXT bucket's average. "
        "The average is cleared by multiplying through by the bucket's "
        "point count, so every area is an EXACT BIGINT and the "
        "sequential selection replays bit-identically as 14 unrolled "
        "MATERIALIZED CTEs (round-4 technique). Bucket bounds use "
        "truncating integer division (Spark div == DuckDB //); ties "
        "break to the smallest hour. Series shorter than 16 points "
        "emit nothing in BOTH engines (guarded identically). Scale "
        "shape: the hourly agg is one partial-agg shuffle; the "
        "sequential pass runs on the aggregated series, which is "
        "TIME-SPAN-bounded (a year of hours is 8,760 rows), inside one "
        "applyInPandas task — the same dimension-bounded-fold rule as "
        "ml_bradley_terry. events.ts routes through "
        "catalog.normalize_event_ts; epochs are floored before the "
        "hour division (CLAUDE.md round-6 addendum).",
    tags=("timeseries",),
)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    hourly = (
        t.events.select(
            F.expr("unix_timestamp(ts) div 3600").alias("hx")
        )
        .groupBy("hx")
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    # one non-foldable constant group: the whole (time-bounded) series
    # must be visible to one sequential kernel; % F.lit(1) avoids the
    # foldable-partition elimination (q_skyline lesson, round 7)
    grouped = hourly.withColumn("g", F.col("hx") % F.lit(1))
    return grouped.groupBy("g").applyInPandas(
        _lttb_kernel,
        schema="k bigint, sel_hx bigint, sel_y bigint, area2m bigint",
    )


# ---------------------------------------------------------------------------
# Matrix profile over the hourly count series (Yeh et al., ICDM 2016 —
# public algorithm family). The UN-normalized Euclidean variant is the
# one whose distances are exact integers: d2(i,j) = sum over the window
# of (y[i+k]-y[j+k])^2, so the profile hash-matches cross-engine with
# no fixed-point scaffolding. Formulated DISTRIBUTED by the pair LAG d:
# z_d(t) = (y[t]-y[t+d])^2 rows partition by d, and each window sum is
# a ROWS-frame over consecutive t inside its lag partition — no
# unpartitioned window, no per-pair explosion beyond the O(n^2/2)
# z rows themselves.

_MP_W = 24  # subsequence window (one day of hours)
_MP_EXCL = _MP_W // 2  # trivial-match exclusion zone


@register(
    "ts_matrix_profile",
    oracle=f"""
        WITH hourly AS MATERIALIZED (
            SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hx,
                   CAST(count(*) AS BIGINT) AS y
            FROM events GROUP BY 1
        ), series AS MATERIALIZED (
            SELECT CAST(row_number() OVER (ORDER BY hx) - 1 AS BIGINT)
                       AS idx, hx, y
            FROM hourly
        ), z AS MATERIALIZED (
            SELECT s2.idx - s1.idx AS d, s1.idx AS t,
                   (s1.y - s2.y) * (s1.y - s2.y) AS z
            FROM series s1
            JOIN series s2 ON s2.idx >= s1.idx + {_MP_EXCL}
        ), w AS MATERIALIZED (
            SELECT d, t,
                   CAST(SUM(z) OVER (PARTITION BY d ORDER BY t
                        ROWS BETWEEN CURRENT ROW AND {_MP_W - 1} FOLLOWING)
                       AS BIGINT) AS d2,
                   COUNT(*) OVER (PARTITION BY d ORDER BY t
                        ROWS BETWEEN CURRENT ROW AND {_MP_W - 1} FOLLOWING)
                       AS cnt
            FROM z
        ), p AS MATERIALIZED (
            SELECT t AS i, t + d AS j, d2 FROM w WHERE cnt = {_MP_W}
            UNION ALL
            SELECT t + d AS i, t AS j, d2 FROM w WHERE cnt = {_MP_W}
        ), m1 AS MATERIALIZED (
            SELECT i, min(d2) AS mp_d2 FROM p GROUP BY 1
        )
        SELECT p.i, CAST(max(s.hx) AS BIGINT) AS hx,
               CAST(m1.mp_d2 AS BIGINT) AS mp_d2,
               CAST(min(p.j) AS BIGINT) AS nn_j
        FROM p
        JOIN m1 ON p.i = m1.i AND p.d2 = m1.mp_d2
        JOIN series s ON s.idx = p.i
        GROUP BY p.i, m1.mp_d2
    """,
    doc="Matrix profile of the hourly event-count series (Yeh et al., "
        "ICDM 2016, public): for every 24-hour subsequence, the "
        "distance to its nearest non-trivial neighbor (exclusion zone "
        "12) and that neighbor's index — the motif/discord primitive. "
        "The UN-normalized Euclidean variant keeps every distance an "
        "exact BIGINT (sum of squared integer differences), so no "
        "fixed-point bridge is needed. Distributed shape: pair lags d "
        "become the partition key — z_d(t) = (y[t]-y[t+d])^2 rows come "
        "from one broadcast self-join of the time-bounded series, each "
        "profile window is a ROWS frame inside its lag partition "
        "(PARTITIONED WindowExec only), and the final argmin is a "
        "min-struct aggregate with the smallest-j tie rule. The oracle "
        "outer-casts DuckDB's HUGEINT window sums (round-5 rule 1). "
        "O(n^2/2) z rows for n hourly points is the honest cost of an "
        "exact profile; at 100 TB n is TIME-bounded (8,760/year) while "
        "the event volume below the hourly agg is what actually "
        "scales.",
    tags=("timeseries",),
)
def ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..functions.ranking import ranked_rows

    t = Tables(spark, sf_dir)
    hourly = (
        t.events.select(
            F.expr("unix_timestamp(ts) div 3600").alias("hx")
        )
        .groupBy("hx")
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    series = ranked_rows(hourly, [F.col("hx")], ["hx", "y"]).select(
        (F.col("rk") - 1).cast("bigint").alias("idx"), "hx", "y"
    )
    s1 = series.alias("s1")
    s2 = series.alias("s2")
    z = s1.join(
        F.broadcast(s2),
        F.col("s2.idx") >= F.col("s1.idx") + _MP_EXCL,
    ).select(
        (F.col("s2.idx") - F.col("s1.idx")).alias("d"),
        F.col("s1.idx").alias("t"),
        ((F.col("s1.y") - F.col("s2.y"))
         * (F.col("s1.y") - F.col("s2.y"))).alias("z"),
    )
    frame = (
        W.partitionBy("d").orderBy("t").rowsBetween(0, _MP_W - 1)
    )
    w = z.select(
        "d", "t",
        F.sum("z").over(frame).cast("bigint").alias("d2"),
        F.count("*").over(frame).alias("cnt"),
    ).filter(F.col("cnt") == _MP_W)
    p = w.select(
        F.col("t").alias("i"), (F.col("t") + F.col("d")).alias("j"), "d2"
    ).unionAll(
        w.select(
            (F.col("t") + F.col("d")).alias("i"),
            F.col("t").alias("j"), "d2",
        )
    )
    best = p.groupBy("i").agg(
        F.min(F.struct(F.col("d2"), F.col("j"))).alias("b")
    )
    return (
        best.join(F.broadcast(series), best["i"] == series["idx"])
        .select(
            "i",
            F.col("hx").cast("bigint").alias("hx"),
            F.col("b.d2").cast("bigint").alias("mp_d2"),
            F.col("b.j").cast("bigint").alias("nn_j"),
        )
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (Winters 1960, public) —
# completes the classical forecasting family next to ts_ewma_counts
# (level) and ts_holt_forecast (level+trend): level + trend + a 7-slot
# additive weekly seasonal state. alpha = 1/2, beta = 1/4, gamma = 1/2
# (dyadic), state in 2^-20 fixed point, every update an OFFSET-
# PROTECTED integer division (the round-7 Holt recipe — level, trend
# and seasonal components all go negative on declining series, and the
# offset keeps truncate == floor in both engines). Zero seasonal init,
# level seeded from x_0 — the same defined variant in both engines.

_HW_P = 7  # weekly season


def _hw_sprev_spark() -> str:
    return "element_at(acc.s, CAST(e.step % 7 AS INT) + 1)"


def _hw_lp_spark() -> str:
    return (
        f"((e.x * {_HOLT_FP} - {_hw_sprev_spark()} + acc.l + acc.b"
        f" + {_HOLT_OFF}) div 2) - {_HOLT_OFF // 2}"
    )


def _hw_fold_sql(arr: str) -> str:
    lp = _hw_lp_spark()
    bp = (
        f"((({lp}) - acc.l + 3 * acc.b + {_HOLT_OFF}) div 4)"
        f" - {_HOLT_OFF // 4}"
    )
    sp = (
        f"((e.x * {_HOLT_FP} - ({lp}) + {_hw_sprev_spark()}"
        f" + {_HOLT_OFF}) div 2) - {_HOLT_OFF // 2}"
    )
    return f"""
        aggregate(
            {arr},
            struct(CAST(0 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
                   array_repeat(CAST(0 AS BIGINT), {_HW_P}) AS s,
                   false AS started),
            (acc, e) -> IF(NOT acc.started,
                struct(CAST(e.x * {_HOLT_FP} AS BIGINT) AS l,
                       CAST(0 AS BIGINT) AS b, acc.s AS s,
                       true AS started),
                struct(
                    CAST({lp} AS BIGINT) AS l,
                    CAST({bp} AS BIGINT) AS b,
                    transform(acc.s,
                        (v, i) -> IF(i = CAST(e.step % 7 AS INT),
                                     CAST({sp} AS BIGINT), v)) AS s,
                    true AS started)))
    """


def _hw_oracle() -> str:
    sprev = "CASE d.step % 7 " + " ".join(
        f"WHEN {j} THEN h.s{j}" for j in range(_HW_P)
    ) + " END"
    lp = (
        f"((d.x * {_HOLT_FP} - ({sprev}) + h.l + h.b"
        f" + {_HOLT_OFF}) // 2) - {_HOLT_OFF // 2}"
    )
    bp = (
        f"((({lp}) - h.l + 3 * h.b + {_HOLT_OFF}) // 4)"
        f" - {_HOLT_OFF // 4}"
    )
    sp = (
        f"((d.x * {_HOLT_FP} - ({lp}) + ({sprev})"
        f" + {_HOLT_OFF}) // 2) - {_HOLT_OFF // 2}"
    )
    s_cols = ", ".join(
        f"CASE WHEN d.step % 7 = {j} THEN {sp} ELSE h.s{j} END"
        for j in range(_HW_P)
    )
    def slot(expr: str) -> str:
        return "CASE (" + expr + ") % 7 " + " ".join(
            f"WHEN {j} THEN l2.s{j}" for j in range(_HW_P)
        ) + " END"
    return f"""
        WITH RECURSIVE bounds AS (
            SELECT CAST(floor(epoch(min(ts))) AS BIGINT) // 86400 AS d0,
                   CAST(floor(epoch(max(ts))) AS BIGINT) // 86400 AS d1
            FROM events
        ), spine AS (
            SELECT CAST(unnest(range(0, d1 - d0 + 1)) AS BIGINT) AS step
            FROM bounds
        ), types AS (
            SELECT DISTINCT event_type FROM events
        ), raw AS (
            SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) // 86400
                       - (SELECT d0 FROM bounds) AS step,
                   CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ), daily AS MATERIALIZED (
            SELECT t.event_type, s.step, COALESCE(r.x, 0) AS x
            FROM types t CROSS JOIN spine s
            LEFT JOIN raw r
              ON r.event_type = t.event_type AND r.step = s.step
        ), hw(step, event_type, l, b,
              {", ".join(f"s{j}" for j in range(_HW_P))}) AS (
            SELECT step, event_type,
                   CAST(x * {_HOLT_FP} AS BIGINT), CAST(0 AS BIGINT),
                   {", ".join(["CAST(0 AS BIGINT)"] * _HW_P)}
            FROM daily WHERE step = 0
            UNION ALL
            SELECT d.step, d.event_type,
                   {lp}, {bp}, {s_cols}
            FROM hw h
            JOIN daily d
              ON d.event_type = h.event_type AND d.step = h.step + 1
        ), l2 AS (
            SELECT h.*
            FROM hw h
            JOIN (SELECT event_type, max(step) AS ms FROM hw GROUP BY 1) m
              ON h.event_type = m.event_type AND h.step = m.ms
        ), nd AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
            FROM daily GROUP BY 1
        )
        SELECT l2.event_type, nd.n_days,
               CAST(l2.l AS BIGINT) AS level_q,
               CAST(l2.b AS BIGINT) AS trend_q,
               CAST({" + ".join(f"l2.s{j}" for j in range(_HW_P))}
                    AS BIGINT) AS s_checksum,
               CAST(l2.l + l2.b + ({slot("nd.n_days")})
                    AS BIGINT) AS fcst_1,
               CAST(l2.l + 7 * l2.b + ({slot("nd.n_days + 6")})
                    AS BIGINT) AS fcst_7
        FROM l2 JOIN nd ON l2.event_type = nd.event_type
    """


@register(
    "ts_holt_winters",
    oracle=_hw_oracle(),
    doc="Holt-Winters additive seasonal forecasting (Winters 1960, "
        "public) of daily event counts with a 7-day season: level + "
        "trend + a 7-slot seasonal vector, alpha = 1/2, beta = 1/4, "
        "gamma = 1/2, state in 2^-20 fixed point with every update an "
        "offset-protected truncating integer division (all three "
        "components go negative on declining series — the round-7 "
        "ts_holt_forecast recipe). Zero seasonal init, level seeded "
        "from x_0, both engines identical. Emits the final state, a "
        "seasonal-vector checksum (pins all 7 slots), and 1- and "
        "7-day-ahead forecasts l + h*b + s[(T+h) mod 7]. Spark folds "
        "each type's zero-filled daily spine in ONE JVM higher-order "
        "aggregate (the seasonal vector is an array field of the fold "
        "struct, updated in place by an indexed transform); the oracle "
        "replays the recurrence as a recursive CTE carrying the seven "
        "seasonal columns explicitly.",
    tags=("timeseries",),
)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "event_type",
        F.expr("unix_timestamp(ts) div 86400").alias("day"),
    )
    raw = ev.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("x")
    )
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("d1") - F.col("d0"))
        ).alias("step"),
        "d0",
    )
    types = ev.select(F.col("event_type").alias("dim_type")).distinct()
    daily = (
        types.crossJoin(F.broadcast(spine))
        .join(
            raw,
            (F.col("day") == F.col("step") + F.col("d0"))
            & (F.col("event_type") == F.col("dim_type")),
            "left",
        )
        .select(
            F.col("dim_type").alias("event_type"),
            "step",
            F.coalesce(F.col("x"), F.lit(0).cast("bigint")).alias("x"),
        )
    )
    folded = daily.groupBy("event_type").agg(
        F.expr(
            _hw_fold_sql("array_sort(collect_list(struct(step, x)))")
        ).alias("st"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    def slot(expr):  # noqa: ANN001, ANN202 — seasonal slot lookup
        return F.element_at(
            F.col("st.s"), (expr % _HW_P).cast("int") + 1
        )
    return folded.select(
        "event_type",
        "n_days",
        F.col("st.l").alias("level_q"),
        F.col("st.b").alias("trend_q"),
        F.aggregate(
            F.col("st.s"), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("s_checksum"),
        (F.col("st.l") + F.col("st.b") + slot(F.col("n_days")))
        .cast("bigint").alias("fcst_1"),
        (F.col("st.l") + 7 * F.col("st.b") + slot(F.col("n_days") + 6))
        .cast("bigint").alias("fcst_7"),
    )


@register(
    "ts_cusum_changepoint",
    oracle="""
        WITH hourly AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ), indexed AS (
            SELECT event_type, hour, c,
                   CAST(row_number() OVER (
                       PARTITION BY event_type ORDER BY hour
                   ) AS BIGINT) AS k,
                   CAST(SUM(c) OVER (
                       PARTITION BY event_type ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS s_k,
                   CAST(count(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS t_hours,
                   CAST(SUM(c) OVER (PARTITION BY event_type)
                        AS BIGINT) AS s_t
            FROM hourly
        ), dev AS (
            SELECT event_type, hour, k, t_hours, s_t,
                   abs(t_hours * s_k - k * s_t) AS d
            FROM indexed
        )
        SELECT event_type, t_hours, s_t AS n_events,
               hour AS cp_hour, k AS cp_index,
               CAST(d AS BIGINT) AS d_max,
               CAST(d AS DOUBLE)
                   / CAST(t_hours * s_t AS DOUBLE) AS cusum_stat
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY event_type
                ORDER BY d DESC, hour
            ) AS rn
            FROM dev
        ) WHERE rn = 1
    """,
    doc="Offline CUSUM change-point detection (Page 1954 / the "
        "max-|CUSUM| estimator, public) over the hourly event-count "
        "series per event_type: the change point maximizes "
        "|T*S_k - k*S_T| — the cross-multiplied form of "
        "|S_k - (k/T)*S_T| that keeps every deviation an EXACT BIGINT "
        "(T ~ 1e3 hours, S_T ~ 1e8 events: the product stays far "
        "inside int64; no float CUSUM path ever forms). cusum_stat "
        "normalizes once as exact-int / exact-int (one correctly-"
        "rounded double). Unique (d DESC, hour) tie-break. Scale: one "
        "fact shuffle into the (type, hour) histogram; the windows are "
        "PARTITIONED by event_type over hour-bounded series, never a "
        "global sort (the value-histogram rank-statistics rule).",
    tags=("timeseries",),
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as _W

    t = Tables(spark, sf_dir)
    hourly = (
        t.events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(F.count("*").cast("long").alias("c"))
    )
    w_ord = _W.partitionBy("event_type").orderBy("hour")
    w_all = _W.partitionBy("event_type")
    indexed = hourly.select(
        "event_type",
        "hour",
        F.row_number().over(w_ord).cast("long").alias("k"),
        F.sum("c")
        .over(w_ord.rowsBetween(_W.unboundedPreceding, _W.currentRow))
        .cast("long")
        .alias("s_k"),
        F.count("*").over(w_all).cast("long").alias("t_hours"),
        F.sum("c").over(w_all).cast("long").alias("s_t"),
    )
    dev = indexed.select(
        "event_type", "hour", "k", "t_hours", "s_t",
        F.abs(
            F.col("t_hours") * F.col("s_k") - F.col("k") * F.col("s_t")
        ).alias("d"),
    )
    w_pick = _W.partitionBy("event_type").orderBy(
        F.desc("d"), F.asc("hour")
    )
    return (
        dev.select("*", F.row_number().over(w_pick).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "t_hours",
            F.col("s_t").alias("n_events"),
            F.col("hour").alias("cp_hour"),
            F.col("k").alias("cp_index"),
            F.col("d").cast("long").alias("d_max"),
            (
                F.col("d").cast("double")
                / (F.col("t_hours") * F.col("s_t")).cast("double")
            ).alias("cusum_stat"),
        )
    )


_LB_MAX_LAG = 12


@register(
    "ts_ljung_box",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), rn AS (
            SELECT event_type, n,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY hour) AS r
            FROM hourly
        ), tot AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS nn,
                   CAST(SUM(n) AS BIGINT) AS s,
                   CAST(SUM(n * n) AS BIGINT) AS sxx
            FROM rn GROUP BY event_type
        ), lags AS (
            SELECT CAST(unnest(range(1, {_LB_MAX_LAG} + 1)) AS BIGINT)
                AS lag
        ), pairs AS (
            SELECT a.event_type, l.lag,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(a.n * b.n) AS BIGINT) AS sxy,
                   CAST(SUM(a.n) AS BIGINT) AS px,
                   CAST(SUM(b.n) AS BIGINT) AS py
            FROM rn a
            CROSS JOIN lags l
            JOIN rn b ON b.event_type = a.event_type
                     AND b.r = a.r + l.lag
            GROUP BY a.event_type, l.lag
        ), ck AS (
            -- scaled covariances C_k = N^2*Sxy - N*S*(px+py) + (N-k)*S^2
            -- formed in DECIMAL(38,0) (exact far past int64; never
            -- squared — r_k is a double DIVISION of two hopped exacts,
            -- so no 1e51 intermediates at any corpus scale)
            SELECT p.event_type, p.lag, t.nn,
                   CAST(t.nn AS DECIMAL(38,0)) * t.nn * p.sxy
                   - CAST(t.nn AS DECIMAL(38,0)) * t.s * (p.px + p.py)
                   + (CAST(t.nn AS DECIMAL(38,0)) - p.lag) * t.s * t.s
                       AS c_k,
                   CAST(t.nn AS DECIMAL(38,0)) * t.nn * t.sxx
                   - CAST(t.nn AS DECIMAL(38,0)) * t.s * t.s AS c_0
            FROM pairs p JOIN tot t USING (event_type)
        ), rk AS (
            SELECT event_type, lag, nn,
                   CASE WHEN c_0 = 0 THEN CAST(0 AS DOUBLE)
                        ELSE CAST(CAST(c_k AS VARCHAR) AS DOUBLE)
                             / CAST(CAST(c_0 AS VARCHAR) AS DOUBLE)
                   END AS r_k
            FROM ck
        )
        SELECT event_type, CAST(lag AS INTEGER) AS lag,
               CAST(nn AS BIGINT) AS n_buckets,
               r_k,
               SUM(((r_k * r_k) * nn * (nn + 2.0)) / (nn - lag))
                   OVER (PARTITION BY event_type ORDER BY lag
                         ROWS UNBOUNDED PRECEDING) AS lb_q
        FROM rk
    """,
    doc="Ljung-Box portmanteau white-noise test over the per-type "
        f"hourly count series, lags 1..{_LB_MAX_LAG}: Q(m) = N(N+2) "
        "sum r_k^2/(N-k), emitted as a per-lag running statistic so "
        "every prefix Q is available. The autocovariances are the "
        "EXACT scaled integers C_k = N^2*Sxy - N*S*(px+py) + "
        "(N-k)*S^2 in DECIMAL(38,0) (never squared — r_k crosses to "
        "double by one hopped division, overflow-free at any corpus "
        "scale), and the running Q accumulates in deterministic lag "
        "order inside a per-type window. Series = consecutive "
        "non-empty hour buckets (the ts_autocorr_lag convention). "
        "One partial-agg shuffle to hourly, one self-join on the "
        "bucket index bounded by 12 lags, dimension-sized output.",
    tags=("timeseries", "stats"),
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    hourly = (
        t.events.select(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n"))
    )
    rn = hourly.select(
        "event_type",
        "n",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("hour"))
        .alias("r"),
    ).localCheckpoint(eager=False)  # two consumers: totals + pair join
    tot = rn.groupBy("event_type").agg(
        F.count("*").alias("nn"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
    )
    lags = spark.range(1, _LB_MAX_LAG + 1).select(
        F.col("id").cast("bigint").alias("lag")
    )
    a = rn.alias("a")
    b = rn.select(
        F.col("event_type").alias("bt"),
        F.col("n").alias("bn"),
        F.col("r").alias("br"),
    )
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("bt") == F.col("a.event_type"))
            & (F.col("br") == F.col("a.r") + F.col("lag")),
        )
        .groupBy("a.event_type", "lag")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("a.n") * F.col("bn")).alias("sxy"),
            F.sum("a.n").alias("px"),
            F.sum("bn").alias("py"),
        )
    )
    d38 = "decimal(38,0)"
    nn38 = F.col("nn").cast(d38)
    ck = pairs.join(tot, "event_type").select(
        "event_type",
        "lag",
        "nn",
        (
            nn38 * F.col("nn") * F.col("sxy")
            - nn38 * F.col("s") * (F.col("px") + F.col("py"))
            + (nn38 - F.col("lag")) * F.col("s") * F.col("s")
        ).alias("c_k"),
        (nn38 * F.col("nn") * F.col("sxx") - nn38 * F.col("s") * F.col("s"))
        .alias("c_0"),
    )
    r_k = F.when(F.col("c_0") == 0, F.lit(0.0)).otherwise(
        F.col("c_k").cast("double") / F.col("c_0").cast("double")
    )
    rk = ck.select(
        "event_type", "lag", "nn", r_k.alias("r_k")
    )
    nnd = F.col("nn").cast("double")
    term = ((F.col("r_k") * F.col("r_k")) * F.col("nn") * (nnd + 2.0)) / (
        nnd - F.col("lag")
    )
    win = (
        W.partitionBy("event_type")
        .orderBy("lag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return rk.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("nn").cast("bigint").alias("n_buckets"),
        "r_k",
        F.sum(term).over(win).alias("lb_q"),
    )
