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
replays precisely the uncommitted range.

Reference semantics exercised on top: docs/README.md:255-257,265 —
topics ``canalinput``/``canaloutput``, windowed word count, JSON output.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from .kafka_wire import EARLIEST, LATEST, KafkaWireClient

SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp"
)


class _TPRange(InputPartition):
    def __init__(
        self, bootstrap: str, topic: str, partition: int, start: int, end: int
    ):
        self.bootstrap = bootstrap
        self.topic = topic
        self.partition = partition
        self.start = start
        self.end = end


def _rows(client: KafkaWireClient, part: _TPRange):
    for offset, ts_ms, key, value in client.fetch_all(
        part.topic, part.partition, part.start, part.end
    ):
        yield (
            key,
            value,
            part.topic,
            part.partition,
            offset,
            datetime.fromtimestamp(ts_ms / 1000, tz=timezone.utc),
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
            yield from _rows(client, partition)
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
            yield from _rows(client, partition)
        finally:
            client.close()

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        if self._client is not None:
            self._client.close()


def _produce_rows(bootstrap: str, topic: str, iterator) -> int:
    """Executor-side produce: round-robin batches over broker partitions,
    preserving a row-supplied event timestamp when present."""
    from pyspark import TaskContext

    client = KafkaWireClient(bootstrap)
    task_id = (TaskContext.get().partitionId() if TaskContext.get() else 0)
    try:
        n_parts = len(client.metadata([topic])["topics"][topic]) or 1
        target = task_id % n_parts
        batch: list[tuple[int, bytes | None, bytes | None]] = []
        n = 0
        for row in iterator:
            value = row["value"]
            if isinstance(value, str):
                value = value.encode("utf-8")
            key = row["key"] if "key" in row.__fields__ else None
            if isinstance(key, str):
                key = key.encode("utf-8")
            ts = row["timestamp"] if "timestamp" in row.__fields__ else None
            ts_ms = int(ts.timestamp() * 1000) if ts is not None else 0
            batch.append((ts_ms, key, value))
            if len(batch) >= 500:
                client.produce(topic, target, batch)
                n += len(batch)
                batch = []
        if batch:
            client.produce(topic, target, batch)
            n += len(batch)
        return n
    finally:
        client.close()


class _ProduceCommit(WriterCommitMessage):
    def __init__(self, n: int):
        self.n = n


class _BatchWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self._bootstrap = options["bootstrap"]
        self._topic = options["topic"]

    def write(self, iterator) -> _ProduceCommit:
        return _ProduceCommit(
            _produce_rows(self._bootstrap, self._topic, iterator)
        )

    def commit(self, messages) -> None:
        pass

    def abort(self, messages) -> None:
        pass


class _StreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self._bootstrap = options["bootstrap"]
        self._topic = options["topic"]

    def write(self, iterator) -> _ProduceCommit:
        return _ProduceCommit(
            _produce_rows(self._bootstrap, self._topic, iterator)
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
