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
