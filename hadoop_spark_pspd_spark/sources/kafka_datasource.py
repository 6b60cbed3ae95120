"""Spark 4 Python DataSource over the Kafka wire protocol (S3/S4).

``spark.read/readStream.format("kafkawire")`` and
``df.write/writeStream.format("kafkawire")`` speak the real Kafka wire
protocol (sources/kafka_wire.py) from the executors — offset-tracked
micro-batches on the read side, per-partition produce on the write side.
The exposed schema and option names mirror the spark-sql-kafka connector
(key/value binary, topic/partition/offset/timestamp metadata columns;
``bootstrap``/``subscribe``/``topic`` options), so swapping in the real
connector on a cluster is a one-line format change.

Scale notes: one Spark input partition per Kafka topic-partition (the
connector's own parallelism model); producers write from every executor
task, round-robin over broker partitions; offsets are exactly the
(start, end] ranges Spark's streaming engine checkpoints, so recovery
replays precisely the uncommitted range. The Spark<->Python boundary is
ARROW-BATCHED both ways (round-9): readers yield one pyarrow
RecordBatch per fetched message run and writers receive RecordBatches
(DataSourceArrowWriter), so the per-message cost is one tight wire-
framing loop (kafka_wire.encode/decode_message_set), never a per-row
pickle hop through Spark's row serializer.

Reference semantics exercised on top: docs/README.md:255-257,265 —
topics ``canalinput``/``canaloutput``, windowed word count, JSON output.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

from .kafka_wire import EARLIEST, LATEST, KafkaWireClient

SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp"
)

# one produce request per this many messages: bounds request size while
# keeping the Python produce loop one call per ~batch, not per message
_PRODUCE_CHUNK = 16384


class _TPRange(InputPartition):
    def __init__(
        self, bootstrap: str, topic: str, partition: int, start: int, end: int
    ):
        self.bootstrap = bootstrap
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end


def _arrow_batches(client: KafkaWireClient, part: _TPRange):
    """Fetch [start, end) and yield ONE Arrow RecordBatch for the run —
    the columnar hop Spark converts without per-row pickling."""
    import numpy as np
    import pyarrow as pa

    msgs = client.fetch_all(part.topic, part.partition, part.start, part.end)
    if not msgs:
        return
    n = len(msgs)
    offs = np.fromiter((m[0] for m in msgs), dtype=np.int64, count=n)
    # broker timestamps are ms; Spark's arrow transport wants us
    ts_us = np.fromiter((m[1] for m in msgs), dtype=np.int64, count=n) * 1000
    yield pa.RecordBatch.from_arrays(
        [
            pa.array((m[2] for m in msgs), pa.binary(), size=n),
            pa.array((m[3] for m in msgs), pa.binary(), size=n),
            pa.array([part.topic] * n, pa.string()),
            pa.array(np.full(n, part.partition, dtype=np.int32)),
            pa.array(offs),
            pa.array(ts_us, type=pa.timestamp("us", tz="UTC")),
        ],
        names=["key", "value", "topic", "partition", "offset", "timestamp"],
    )


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self._bootstrap = options["bootstrap"]
        self._topic = options.get("subscribe", options.get("topic"))

    def partitions(self):
        client = KafkaWireClient(self._bootstrap)
        try:
            parts = client.metadata([self._topic])["topics"][self._topic]
            out = []
            for p in parts:
                start = client.list_offsets(self._topic, p, EARLIEST)
                end = client.list_offsets(self._topic, p, LATEST)
                out.append(
                    _TPRange(self._bootstrap, self._topic, p, start, end)
                )
            return out
        finally:
            client.close()

    def read(self, partition: _TPRange):
        client = KafkaWireClient(partition.bootstrap)
        try:
            yield from _arrow_batches(client, partition)
        finally:
            client.close()


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self._bootstrap = options["bootstrap"]
        self._topic = options.get("subscribe", options.get("topic"))
        self._client: KafkaWireClient | None = None

    def __getstate__(self):  # sockets don't pickle to executors
        state = dict(self.__dict__)
        state["_client"] = None
        return state

    def _conn(self) -> KafkaWireClient:
        if self._client is None:
            self._client = KafkaWireClient(self._bootstrap)
        return self._client

    def _offsets(self, which: int) -> dict:
        client = self._conn()
        parts = client.metadata([self._topic])["topics"][self._topic]
        return {
            str(p): client.list_offsets(self._topic, p, which) for p in parts
        }

    def initialOffset(self) -> dict:
        return self._offsets(EARLIEST)

    def latestOffset(self) -> dict:
        return self._offsets(LATEST)

    def partitions(self, start: dict, end: dict):
        return [
            _TPRange(
                self._bootstrap,
                self._topic,
                int(p),
                start.get(p, 0),
                end[p],
            )
            for p in sorted(end)
        ]

    def read(self, partition: _TPRange):
        client = KafkaWireClient(partition.bootstrap)
        try:
            yield from _arrow_batches(client, partition)
        finally:
            client.close()

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        if self._client is not None:
            self._client.close()


def _binary_column(col):
    """Arrow column -> list of bytes|None, casting string columns."""
    import pyarrow as pa

    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        col = col.cast(pa.binary())
    elif pa.types.is_large_binary(t):
        col = col.cast(pa.binary())
    return col.to_pylist()


def _epoch_ms_column(col) -> list[int]:
    """Arrow timestamp column -> epoch-ms ints (None -> 0, the same
    default the row path used for timestamp-less producers)."""
    import numpy as np
    import pyarrow as pa

    unit = col.type.unit
    ints = col.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)
    if unit == "s":
        ints = ints * 1000
    elif unit == "us":
        ints = ints // 1000
    elif unit == "ns":
        ints = ints // 1_000_000
    return [int(v) for v in ints]


def _produce_arrow_batches(bootstrap: str, topic: str, iterator) -> int:
    """Executor-side produce over Arrow RecordBatches: one columnar
    decode + one wire-framing loop per batch (never per-row Row access),
    round-robin over broker partitions, preserving a row-supplied event
    timestamp when present."""
    import pyarrow as pa
    from pyspark import TaskContext

    client = KafkaWireClient(bootstrap)
    ctx = TaskContext.get()
    task_id = ctx.partitionId() if ctx else 0
    try:
        n_parts = len(client.metadata([topic])["topics"][topic]) or 1
        target = task_id % n_parts
        n = 0
        for rb in iterator:
            if rb.num_rows == 0:
                continue
            cols = {
                name.lower(): rb.column(i)
                for i, name in enumerate(rb.schema.names)
            }
            values = _binary_column(cols["value"])
            keys = (
                _binary_column(cols["key"])
                if "key" in cols
                else [None] * rb.num_rows
            )
            ts_col = cols.get("timestamp")
            if ts_col is not None and pa.types.is_timestamp(ts_col.type):
                ts_ms = _epoch_ms_column(ts_col)
            else:
                ts_ms = [0] * rb.num_rows
            msgs = list(zip(ts_ms, keys, values))
            for i in range(0, len(msgs), _PRODUCE_CHUNK):
                chunk = msgs[i : i + _PRODUCE_CHUNK]
                client.produce(topic, target, chunk)
                n += len(chunk)
        return n
    finally:
        client.close()


class _ProduceCommit(WriterCommitMessage):
    def __init__(self, n: int):
        self.n = n


class _BatchWriter(DataSourceArrowWriter):
    def __init__(self, options: dict):
        self._bootstrap = options["bootstrap"]
        self._topic = options["topic"]

    def write(self, iterator) -> _ProduceCommit:
        return _ProduceCommit(
            _produce_arrow_batches(self._bootstrap, self._topic, iterator)
        )

    def commit(self, messages) -> None:
        pass

    def abort(self, messages) -> None:
        pass


class _StreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, options: dict):
        self._bootstrap = options["bootstrap"]
        self._topic = options["topic"]

    def write(self, iterator) -> _ProduceCommit:
        return _ProduceCommit(
            _produce_arrow_batches(self._bootstrap, self._topic, iterator)
        )

    def commit(self, messages, batchId) -> None:
        pass

    def abort(self, messages, batchId) -> None:
        pass


class KafkaWireDataSource(DataSource):
    """format("kafkawire"): Kafka wire protocol source/sink, batch+stream."""

    @classmethod
    def name(cls) -> str:
        return "kafkawire"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> _BatchWriter:
        return _BatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> _StreamWriter:
        return _StreamWriter(self.options)


def register_kafka_wire_source(spark) -> None:
    """Idempotently register format("kafkawire") on the session."""
    try:
        spark.dataSource.register(KafkaWireDataSource)
    except Exception:  # already registered
        pass
