"""Structured Streaming queries surfaced through the driver contract.

The reference's streaming pipeline (docs/README.md:257) is a Kafka-fed
windowed word count; here the same *incremental* execution runs over a
bounded file-source replay of the ``events`` table (availableNow trigger),
so the final answer is oracle-checkable as plain SQL over the full table.
``window('1 hour')`` aligns to epoch-hour boundaries == date_trunc('hour').
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import normalize_event_ts
from ..registry import register
from ..session import pin_session_conf

_sink_counter = itertools.count()


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded file-source replay of the events table (ns-ts normalized)."""
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the file stream source wants a directory: scan sf_dir with a glob
    # pinned to the events table file
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(stream)


def run_bounded_stream(
    spark: SparkSession,
    source: DataFrame,
    transform,
    output_mode: str = "complete",
) -> DataFrame:
    """Drive a streaming transform over a bounded source to completion,
    collecting results in a memory sink; returns the result as a DataFrame."""
    name = f"pspd_stream_sink_{next(_sink_counter)}"
    q = (
        transform(source)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "stream_hourly_counts",
    oracle="""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type, count(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
    doc="Structured Streaming tumbling-window count over a bounded replay "
        "of events (reference A2/T1 semantics), complete output mode.",
)
def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    source = _events_stream(spark, sf_dir)

    def transform(df: DataFrame) -> DataFrame:
        return df.groupBy(F.window("ts", "1 hour"), "event_type").count()

    result = run_bounded_stream(spark, source, transform, "complete")
    return result.select(
        F.col("window.start").alias("window_start"),
        "event_type",
        F.col("count").alias("n"),
    )


@register(
    "stream_windowed_wordcount",
    oracle="""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               upper(event_type) AS word,
               count(*) AS cnt
        FROM events
        GROUP BY 1, 2
    """,
    doc="The reference streaming pipeline shape (docs/README.md:257): "
        "tokenize -> upper -> windowed count, run incrementally over a "
        "bounded replay (event_type stands in for the message words).",
)
def stream_windowed_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    source = _events_stream(spark, sf_dir)

    from ..streaming.wordcount_stream import windowed_wordcount

    result = run_bounded_stream(
        spark,
        source,
        lambda df: windowed_wordcount(
            df, ts_col="ts", text_col="event_type", window_duration="1 hour"
        ),
        "complete",
    )
    return result.select(
        F.col("window.start").alias("window_start"),
        "word",
        F.col("cnt"),
    )


@register(
    "stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="Streaming exact dedup via dropDuplicatesWithinWatermark on "
        "(user_id, event_type) over the bounded events replay — the "
        "streaming analog of dedup_exact: state holds one entry per key, "
        "watermark bounds state lifetime on unbounded streams. Only the "
        "key columns are emitted (which physical row survives is "
        "arrival-order dependent; the key set is deterministic).",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    source = _events_stream(spark, sf_dir)

    def transform(df: DataFrame) -> DataFrame:
        return (
            df.select("user_id", "event_type", "ts")
            .withWatermark("ts", "365 days")
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        )

    result = run_bounded_stream(spark, source, transform, "append")
    return result.select("user_id", "event_type")
