"""The reference's streaming pipeline, source/sink-agnostic.

Reference semantics (docs/README.md:255-257,265 + PSPD_LabHadoopSpark.pdf
p.2 B2): consume Kafka topic ``canalinput`` -> cast value to string ->
split into words -> explode to rows -> uppercase -> event-time windowed
count with late-data handling -> to_json(struct(word, count, window)) ->
Kafka topic ``canaloutput``.

The transform core is pure DataFrame -> DataFrame so tests drive it with
file/rate/memory sources; Kafka wiring is isolated in kafka_source/
kafka_sink (no broker in the dev env — SURVEY §7.3).
Window kind: tumbling is canonical (the report says only "janelas de
tempo"); pass slide_duration for the sliding variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words_exploded

INPUT_TOPIC = "canalinput"
OUTPUT_TOPIC = "canaloutput"


def windowed_wordcount(
    df: DataFrame,
    ts_col: str = "timestamp",
    text_col: str = "value",
    window_duration: str = "1 minute",
    slide_duration: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """split -> explode -> upper -> window groupBy count (+ watermark).

    Returns columns (window: struct<start,end>, word, cnt) — the reference's
    only nested output type (SURVEY §1.1).
    """
    if watermark_delay:
        df = df.withWatermark(ts_col, watermark_delay)
    words = df.select(
        F.col(ts_col).alias("__ts"), words_exploded(text_col)
    ).select("__ts", F.upper("word").alias("word"))
    win = (
        F.window("__ts", window_duration, slide_duration)
        if slide_duration
        else F.window("__ts", window_duration)
    )
    return words.groupBy(win.alias("window"), "word").agg(
        F.count("*").alias("cnt")
    )


def to_kafka_json(df: DataFrame) -> DataFrame:
    """Format (window, word, cnt) as the reference's JSON output records
    (docs/README.md:257,265: '(palavra, contagem e janela de tempo) ...
    formatados em JSON')."""
    return df.select(
        F.to_json(
            F.struct(
                F.col("word"),
                F.col("cnt").alias("count"),
                F.col("window"),
            )
        ).alias("value")
    )


def kafka_source_contract(bootstrap: str, topic: str = INPUT_TOPIC) -> dict:
    """The exact readStream wiring for reference S3 (docs/README.md:257:
    subscribe ``canalinput``), as data — the single source of truth
    kafka_source drives, and what the no-connector-jar contract test
    asserts against."""
    return {
        "format": "kafka",
        "options": {
            "kafka.bootstrap.servers": bootstrap,
            "subscribe": topic,
        },
    }


def kafka_sink_contract(
    bootstrap: str,
    topic: str = OUTPUT_TOPIC,
    checkpoint: str = "/tmp/pspd_stream_ckpt",
    output_mode: str = "update",
) -> dict:
    """writeStream wiring for reference S4 (JSON records to ``canaloutput``
    with checkpointed state), as data — see kafka_source_contract."""
    return {
        "format": "kafka",
        "options": {
            "kafka.bootstrap.servers": bootstrap,
            "topic": topic,
            "checkpointLocation": checkpoint,
        },
        "output_mode": output_mode,
    }


def kafka_source(spark, bootstrap: str, topic: str = INPUT_TOPIC) -> DataFrame:
    """Reference S3: subscribe to canalinput. Requires the Kafka connector
    jar on the classpath (not in the dev image — gated here)."""
    c = kafka_source_contract(bootstrap, topic)
    reader = spark.readStream.format(c["format"])
    for k, v in c["options"].items():
        reader = reader.option(k, v)
    return reader.load().select(
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("timestamp"),
    )


def kafka_sink(
    df: DataFrame,
    bootstrap: str,
    topic: str = OUTPUT_TOPIC,
    checkpoint: str = "/tmp/pspd_stream_ckpt",
    output_mode: str = "update",
):
    """Reference S4: JSON records to canaloutput with checkpointed state
    (Spark's WAL+checkpoint replaces the reference's YARN retry story)."""
    c = kafka_sink_contract(bootstrap, topic, checkpoint, output_mode)
    writer = to_kafka_json(df).writeStream.format(c["format"])
    for k, v in c["options"].items():
        writer = writer.option(k, v)
    return writer.outputMode(c["output_mode"]).start()


def kafka_wire_source(spark, bootstrap: str, topic: str = INPUT_TOPIC) -> DataFrame:
    """S3 over the engine's wire-protocol source (sources/kafka_datasource):
    same subscribe semantics and output shape as kafka_source, no connector
    jar needed — offset-tracked micro-batches from a live broker socket."""
    from ..sources.kafka_datasource import register_kafka_wire_source

    register_kafka_wire_source(spark)
    return (
        spark.readStream.format("kafkawire")
        .option("bootstrap", bootstrap)
        .option("subscribe", topic)
        .load()
        .select(
            F.col("value").cast("string").alias("value"),
            F.col("timestamp").alias("timestamp"),
        )
    )


def kafka_wire_sink(
    df: DataFrame,
    bootstrap: str,
    topic: str = OUTPUT_TOPIC,
    checkpoint: str = "/tmp/pspd_stream_wire_ckpt",
    output_mode: str = "update",
):
    """S4 over the wire-protocol sink. Python DataSource stream writers
    only take append/complete, so update mode goes through foreachBatch ->
    batch producer (still executor-side, per-partition) — the standard
    Structured Streaming pattern for sinks without native update support."""
    json_df = to_kafka_json(df)

    def _produce(batch_df: DataFrame, _epoch: int) -> None:
        (
            batch_df.write.format("kafkawire")
            .mode("append")
            .option("bootstrap", bootstrap)
            .option("topic", topic)
            .save()
        )

    return (
        json_df.writeStream.foreachBatch(_produce)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
