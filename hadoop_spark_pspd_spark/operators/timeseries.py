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
