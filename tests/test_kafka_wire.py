"""S3/S4 end-to-end: the reference's Kafka pipeline over a live broker.

Reference docs/README.md:255-257,265 — topics canalinput/canaloutput,
windowed word count, JSON records (palavra, contagem, janela). The broker
is the in-process wire-protocol implementation (sources/kafka_wire.py);
everything above the socket is the same code a real cluster would run.
"""

from __future__ import annotations

import json
import struct
import time
import zlib

import pytest
from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.sources.kafka_wire import (
    EARLIEST,
    LATEST,
    KafkaWireBroker,
    KafkaWireClient,
    decode_message_set,
    encode_message_set,
)
from hadoop_spark_pspd_spark.streaming.wordcount_stream import (
    kafka_wire_sink,
    kafka_wire_source,
    windowed_wordcount,
)


@pytest.fixture()
def broker():
    b = KafkaWireBroker(n_partitions=2)
    yield b
    b.shutdown()


def test_message_set_crc_and_roundtrip():
    ms = encode_message_set([(123_456, b"k", b"value bytes"), (789, None, b"x")])
    # CRC32 covers magic..value per the spec's Message Sets section
    crc_wire = struct.unpack(">i", ms[12:16])[0] & 0xFFFFFFFF
    first_len = struct.unpack(">i", ms[8:12])[0]
    assert crc_wire == zlib.crc32(ms[16 : 12 + first_len]) & 0xFFFFFFFF
    decoded = decode_message_set(ms)
    assert decoded == [(0, 123_456, b"k", b"value bytes"), (1, 789, None, b"x")]
    # a truncated trailing message is tolerated (spec allows partials)
    assert decode_message_set(ms[:-5]) == decoded[:1]


def test_broker_produce_fetch_offsets_metadata(broker):
    c = KafkaWireClient(broker.bootstrap)
    try:
        assert c.api_versions()[0] == (2, 2)  # Produce v2 negotiated
        base = c.produce("canalinput", 0, [(1000, None, b"a b"), (2000, b"k", b"c")])
        assert base == 0
        assert c.produce("canalinput", 0, [(3000, None, b"d")]) == 2
        assert c.metadata()["topics"]["canalinput"] == [0, 1]
        assert c.list_offsets("canalinput", 0, EARLIEST) == 0
        assert c.list_offsets("canalinput", 0, LATEST) == 3
        hw, msgs = c.fetch("canalinput", 1, 0)
        assert hw == 0 and msgs == []
        hw, msgs = c.fetch("canalinput", 0, 1)
        assert hw == 3
        assert msgs == [(1, 2000, b"k", b"c"), (2, 3000, None, b"d")]
    finally:
        c.close()


def test_spark_batch_read_write_through_broker(spark, broker):
    from hadoop_spark_pspd_spark.sources.kafka_datasource import (
        register_kafka_wire_source,
    )

    register_kafka_wire_source(spark)
    c = KafkaWireClient(broker.bootstrap)
    try:
        c.produce("t_in", 0, [(1_700_000_000_000, None, b"hello")])
        c.produce("t_in", 1, [(1_700_000_001_000, b"kk", b"world")])
        df = (
            spark.read.format("kafkawire")
            .option("bootstrap", broker.bootstrap)
            .option("subscribe", "t_in")
            .load()
        )
        rows = sorted(df.collect(), key=lambda r: r["value"])
        assert [
            (r["key"], bytes(r["value"]), r["partition"], r["offset"])
            for r in rows
        ] == [(None, b"hello", 0, 0), (bytearray(b"kk"), b"world", 1, 0)]
        assert rows[0]["timestamp"].isoformat().startswith("2023-11-14")

        # write side: executor tasks produce; event timestamps preserved
        df.select("value", "timestamp").write.format("kafkawire").mode(
            "append"
        ).option("bootstrap", broker.bootstrap).option("topic", "t_out").save()
        got = c.fetch_all("t_out", 0, 0, 10) + c.fetch_all("t_out", 1, 0, 10)
        assert sorted((ts, v) for _o, ts, _k, v in got) == [
            (1_700_000_000_000, b"hello"),
            (1_700_000_001_000, b"world"),
        ]
    finally:
        c.close()


def test_reference_pipeline_end_to_end(spark, broker, tmp_path):
    """canalinput -> windowed wordcount -> JSON -> canaloutput, with the
    exact output record shape of docs/README.md:265."""
    c = KafkaWireClient(broker.bootstrap)
    try:
        T = 1_704_067_200_000  # 2024-01-01T00:00:00Z
        c.produce(
            "canalinput",
            0,
            [(T, None, b"ola mundo"), (T + 10_000, None, b"mundo spark")],
        )
        c.produce("canalinput", 1, [(T + 70_000, None, b"outra janela")])

        src = kafka_wire_source(spark, broker.bootstrap)
        agg = windowed_wordcount(
            src, window_duration="1 minute", watermark_delay="30 seconds"
        )
        q = kafka_wire_sink(
            agg, broker.bootstrap, checkpoint=str(tmp_path / "ckpt")
        )
        q.awaitTermination()

        out = c.fetch_all("canaloutput", 0, 0, 100) + c.fetch_all(
            "canaloutput", 1, 0, 100
        )
        recs = [json.loads(v) for _o, _ts, _k, v in out]
        # JSON shape: word + count + nested window struct (the reference's
        # only nested type), ISO timestamps
        assert all(set(r) == {"word", "count", "window"} for r in recs)
        assert all(set(r["window"]) == {"start", "end"} for r in recs)
        by_word = {(r["word"], r["window"]["start"]): r["count"] for r in recs}
        assert by_word[("MUNDO", "2024-01-01T00:00:00.000Z")] == 2
        assert by_word[("OLA", "2024-01-01T00:00:00.000Z")] == 1
        assert by_word[("OUTRA", "2024-01-01T00:01:00.000Z")] == 1
        assert len(recs) == 5  # OLA, MUNDO, SPARK / OUTRA, JANELA
    finally:
        c.close()


def test_stream_reads_incrementally_across_batches(spark, broker, tmp_path):
    """Offsets advance per micro-batch: messages produced after the first
    batch land in a later batch, not re-reading from 0 (exactly-once)."""
    from hadoop_spark_pspd_spark.sources.kafka_datasource import (
        register_kafka_wire_source,
    )

    register_kafka_wire_source(spark)
    c = KafkaWireClient(broker.bootstrap)
    try:
        c.produce("inc_in", 0, [(1000, None, b"one")])
        src = (
            spark.readStream.format("kafkawire")
            .option("bootstrap", broker.bootstrap)
            .option("subscribe", "inc_in")
            .load()
            .select("value", "offset", "partition")
        )
        q = (
            src.writeStream.format("kafkawire")
            .option("bootstrap", broker.bootstrap)
            .option("topic", "inc_out")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while broker.message_count("inc_out") < 1:
                assert time.time() < deadline, q.lastProgress
                time.sleep(0.2)
            c.produce("inc_in", 0, [(2000, None, b"two")])
            while broker.message_count("inc_out") < 2:
                assert time.time() < deadline, q.lastProgress
                time.sleep(0.2)
        finally:
            q.stop()
        vals = sorted(
            v
            for p in (0, 1)
            for _o, _ts, _k, v in c.fetch_all("inc_out", p, 0, 100)
        )
        assert vals == [b"one", b"two"]  # no re-delivery of message one
    finally:
        c.close()


def test_arrow_writer_nulls_and_empty_partitions(spark, broker):
    """The Arrow produce path must frame NULL keys/values as the wire's
    int32 -1 fields (not crash or coerce to b''), and empty input
    partitions must produce nothing."""
    from hadoop_spark_pspd_spark.sources.kafka_datasource import (
        register_kafka_wire_source,
    )

    register_kafka_wire_source(spark)
    df = spark.createDataFrame(
        [(None, b"v0"), (b"k1", None), (None, None)],
        "key binary, value binary",
    ).repartition(6)  # more partitions than rows: empty tasks exist
    df.write.format("kafkawire").mode("append").option(
        "bootstrap", broker.bootstrap
    ).option("topic", "t_nulls").save()
    c = KafkaWireClient(broker.bootstrap)
    try:
        pairs = [
            (k, v)
            for p in (0, 1)
            for _o, _t, k, v in c.fetch_all("t_nulls", p, 0, 100)
        ]
        key = lambda kv: (  # noqa: E731 - None-safe sort
            kv[0] is not None, kv[0] or b"",
            kv[1] is not None, kv[1] or b"",
        )
        assert sorted(pairs, key=key) == sorted(
            [(None, None), (None, b"v0"), (b"k1", None)], key=key
        )
    finally:
        c.close()
    back = (
        spark.read.format("kafkawire")
        .option("bootstrap", broker.bootstrap)
        .option("subscribe", "t_nulls")
        .load()
        .select("key", "value")
        .collect()
    )
    vals = [
        (bytes(r["key"]) if r["key"] is not None else None,
         bytes(r["value"]) if r["value"] is not None else None)
        for r in back
    ]
    assert sorted(vals, key=key) == sorted(
        [(None, b"v0"), (b"k1", None), (None, None)], key=key
    )
