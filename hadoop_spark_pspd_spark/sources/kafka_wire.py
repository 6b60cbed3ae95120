"""Minimal Kafka wire-protocol client + in-process single-node broker.

The reference's streaming pipeline runs Discord -> Kafka(``canalinput``) ->
Spark Structured Streaming -> Kafka(``canaloutput``) (reference
docs/README.md:255-257,265). This dev image has no Kafka distribution, no
connector jar, and no network, so to exercise S3/S4 end-to-end the engine
ships a protocol-conformant micro-stack written to the PUBLIC Kafka
protocol spec (https://kafka.apache.org/protocol):

  * client: ApiVersions v0, Metadata v1, Produce v2, Fetch v2,
    ListOffsets v1 — framed big-endian messages over TCP, message format
    v1 (MessageSet with per-message CRC32, magic=1, CreateTime
    timestamps). These are exactly the APIs/versions a 0.10.x-era Java
    client negotiates, so the subset is real protocol, not a toy RPC.
  * broker: threaded TCP server holding topic-partition logs in memory
    with auto-topic-creation — the single-node stand-in for the
    reference's broker container.

Boundary (stated, not hidden): this stack speaks message-format v1
(magic=1, MessageSet framing) ONLY. A modern client that negotiates the
v2 record-batch format (magic=2, introduced in Kafka 0.11 — varint
headers, batch-level CRC32C) cannot talk to this broker, and the broker
never up/down-converts. That is exactly the 0.10.x-era protocol surface
and no more; the spark-sql-kafka connector path against a real cluster is
the production route (streaming/wordcount_stream.py kafka_source/
kafka_sink, whose option wiring is pinned by the no-jar contract test).

Production path unchanged: ``streaming/wordcount_stream.py``'s
kafka_source/kafka_sink use the spark-sql-kafka connector against a real
cluster. This module exists so the canalinput -> windowed count ->
canaloutput loop is *executed*, over a real socket, in tests and in the
registered ``stream_kafka_roundtrip`` query (kafka_datasource.py).
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
import zlib

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_VERSIONS = 18

EARLIEST = -2
LATEST = -1

# ---------------------------------------------------------------------------
# primitive encoding (big-endian, per the protocol's "Protocol Primitive
# Types" table)
# ---------------------------------------------------------------------------


def _i8(v: int) -> bytes:
    return struct.pack(">b", v)


def _i16(v: int) -> bytes:
    return struct.pack(">h", v)


def _i32(v: int) -> bytes:
    return struct.pack(">i", v)


def _i64(v: int) -> bytes:
    return struct.pack(">q", v)


def _string(s: str | None) -> bytes:
    if s is None:
        return _i16(-1)
    b = s.encode("utf-8")
    return _i16(len(b)) + b


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return _i32(-1)
    return _i32(len(b)) + b


def _array(items: list[bytes]) -> bytes:
    return _i32(len(items)) + b"".join(items)


class _Reader:
    """Cursor over one framed request/response payload."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def i8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def string(self) -> str | None:
        n = self.i16()
        return None if n < 0 else self._take(n).decode("utf-8")

    def bytes(self) -> bytes | None:
        n = self.i32()
        return None if n < 0 else self._take(n)


# ---------------------------------------------------------------------------
# message format v1 (magic=1): the on-wire record layout for Produce v2 /
# Fetch v2. CRC32 covers magic..value, per the spec's "Message Sets".
# ---------------------------------------------------------------------------


# batched framing (round-9): the encode/decode loops below are the
# per-message hot path shared by client AND broker — they avoid the
# per-field helper calls of the rest of this module (one struct pack per
# fixed-width field group, locals-bound C functions), so a 100k-message
# produce/fetch pays tens of milliseconds of Python, and the Spark
# boundary above moves whole Arrow record batches (kafka_datasource.py),
# one Python call per partition per micro-batch.
_MAGIC1_ATTR0 = b"\x01\x00"
_NULL_FIELD = b"\xff\xff\xff\xff"  # int32 -1: null key/value
_PACK_I32 = struct.Struct(">i").pack
_PACK_I64 = struct.Struct(">q").pack
_PACK_FRAME = struct.Struct(">qii").pack  # offset, size, crc
_UNPACK_FRAME = struct.Struct(">qi").unpack_from  # offset, size
_UNPACK_I32 = struct.Struct(">i").unpack_from
_UNPACK_I64 = struct.Struct(">q").unpack_from


def encode_message_set(
    msgs: list[tuple[int, bytes | None, bytes | None]],
    base_offset: int = 0,
) -> bytes:
    """msgs: [(timestamp_ms, key, value)] -> MessageSet v1 bytes."""
    crc32 = zlib.crc32
    p32, p64, frame = _PACK_I32, _PACK_I64, _PACK_FRAME
    out = []
    offset = base_offset
    for ts, key, value in msgs:
        body = (
            _MAGIC1_ATTR0
            + p64(ts)
            + (_NULL_FIELD if key is None else p32(len(key)) + key)
            + (_NULL_FIELD if value is None else p32(len(value)) + value)
        )
        crc = crc32(body)  # int32 on the wire: re-sign
        out.append(
            frame(
                offset,
                len(body) + 4,
                crc - 0x100000000 if crc >= 0x80000000 else crc,
            )
            + body
        )
        offset += 1
    return b"".join(out)


def decode_message_set(
    buf: bytes,
) -> list[tuple[int, int, bytes | None, bytes | None]]:
    """MessageSet v1 bytes -> [(offset, timestamp_ms, key, value)].

    Tolerates a trailing partial message (the spec allows brokers to
    return one at the end of a fetch)."""
    u_frame, u32, u64 = _UNPACK_FRAME, _UNPACK_I32, _UNPACK_I64
    total = len(buf)
    pos = 0
    msgs = []
    while pos + 12 <= total:
        offset, size = u_frame(buf, pos)
        pos += 12
        if pos + size > total:
            break  # partial trailing message
        # crc(4, trusted transport here; validated in tests) magic(1)
        # attributes(1: uncompressed) [ts(8) if magic>=1] key value
        magic = buf[pos + 4]
        p = pos + 6
        if magic >= 1:
            ts = u64(buf, p)[0]
            p += 8
        else:
            ts = -1
        klen = u32(buf, p)[0]
        p += 4
        if klen < 0:
            key = None
        else:
            key = buf[p : p + klen]
            p += klen
        vlen = u32(buf, p)[0]
        p += 4
        value = None if vlen < 0 else buf[p : p + vlen]
        msgs.append((offset, ts, key, value))
        pos += size
    return msgs


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------


class KafkaWireClient:
    """Blocking single-connection client for the implemented API subset."""

    def __init__(self, bootstrap: str, client_id: str = "pspd-engine"):
        host, port = bootstrap.rsplit(":", 1)
        self._addr = (host, int(port))
        self._client_id = client_id
        self._sock: socket.socket | None = None
        self._corr = 0
        self._lock = threading.Lock()

    def _conn(self) -> socket.socket:
        if self._sock is None:
            self._sock = socket.create_connection(self._addr, timeout=30)
        return self._sock

    def close(self) -> None:
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def _call(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        with self._lock:
            self._corr += 1
            corr = self._corr
            header = (
                _i16(api_key)
                + _i16(api_version)
                + _i32(corr)
                + _string(self._client_id)
            )
            payload = header + body
            sock = self._conn()
            sock.sendall(_i32(len(payload)) + payload)
            raw = self._recv_exact(sock, 4)
            (size,) = struct.unpack(">i", raw)
            resp = _Reader(self._recv_exact(sock, size))
            assert resp.i32() == corr, "correlation id mismatch"
            return resp

    @staticmethod
    def _recv_exact(sock: socket.socket, n: int) -> bytes:
        chunks = []
        while n:
            chunk = sock.recv(n)
            if not chunk:
                raise ConnectionError("broker closed connection")
            chunks.append(chunk)
            n -= len(chunk)
        return b"".join(chunks)

    def api_versions(self) -> dict[int, tuple[int, int]]:
        r = self._call(API_VERSIONS, 0, b"")
        err = r.i16()
        assert err == 0, f"ApiVersions error {err}"
        return {r.i16(): (r.i16(), r.i16()) for _ in range(r.i32())}

    def metadata(self, topics: list[str] | None = None) -> dict:
        body = (
            _i32(-1)
            if topics is None
            else _array([_string(t) for t in topics])
        )
        r = self._call(API_METADATA, 1, body)
        brokers = [
            (r.i32(), r.string(), r.i32(), r.string())
            for _ in range(r.i32())
        ]
        controller = r.i32()
        out_topics = {}
        for _ in range(r.i32()):
            r.i16()  # topic error
            name = r.string()
            r.i8()  # is_internal
            parts = []
            for _ in range(r.i32()):
                r.i16()  # partition error
                idx = r.i32()
                r.i32()  # leader
                for _ in range(r.i32()):
                    r.i32()  # replicas
                for _ in range(r.i32()):
                    r.i32()  # isr
                parts.append(idx)
            out_topics[name] = sorted(parts)
        return {"brokers": brokers, "controller": controller, "topics": out_topics}

    def produce(
        self,
        topic: str,
        partition: int,
        msgs: list[tuple[int, bytes | None, bytes | None]],
    ) -> int:
        """Append [(timestamp_ms, key, value)]; returns base offset."""
        record_set = encode_message_set(msgs)
        body = (
            _i16(1)  # acks=1: leader ack
            + _i32(30_000)
            + _array(
                [
                    _string(topic)
                    + _array([_i32(partition) + _bytes(record_set)])
                ]
            )
        )
        r = self._call(API_PRODUCE, 2, body)
        n_topics = r.i32()
        base = -1
        for _ in range(n_topics):
            r.string()
            for _ in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                assert err == 0, f"Produce error {err}"
                base = r.i64()
                r.i64()  # log_append_time
        r.i32()  # throttle_time_ms
        return base

    def fetch(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_bytes: int = 1 << 20,
    ) -> tuple[int, list[tuple[int, int, bytes | None, bytes | None]]]:
        """-> (high_watermark, [(offset, timestamp_ms, key, value)])."""
        body = (
            _i32(-1)  # replica_id: normal consumer
            + _i32(100)  # max_wait_ms
            + _i32(0)  # min_bytes
            + _array(
                [
                    _string(topic)
                    + _array(
                        [_i32(partition) + _i64(offset) + _i32(max_bytes)]
                    )
                ]
            )
        )
        r = self._call(API_FETCH, 2, body)
        r.i32()  # throttle_time_ms
        hw, msgs = -1, []
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                assert err == 0, f"Fetch error {err}"
                hw = r.i64()
                record_set = r.bytes() or b""
                msgs = decode_message_set(record_set)
        return hw, msgs

    def list_offsets(self, topic: str, partition: int, timestamp: int) -> int:
        """timestamp: EARLIEST (-2) or LATEST (-1) -> log offset."""
        body = _i32(-1) + _array(
            [_string(topic) + _array([_i32(partition) + _i64(timestamp)])]
        )
        r = self._call(API_LIST_OFFSETS, 1, body)
        off = -1
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()  # partition
                err = r.i16()
                assert err == 0, f"ListOffsets error {err}"
                r.i64()  # timestamp
                off = r.i64()
        return off

    def fetch_all(
        self, topic: str, partition: int, start: int, end: int
    ) -> list[tuple[int, int, bytes | None, bytes | None]]:
        """Fetch [start, end) looping on max_bytes-bounded responses."""
        out: list[tuple[int, int, bytes | None, bytes | None]] = []
        offset = start
        while offset < end:
            _, msgs = self.fetch(topic, partition, offset)
            msgs = [m for m in msgs if start <= m[0] < end]
            if not msgs:
                break
            out.extend(msgs)
            offset = msgs[-1][0] + 1
        return out


# ---------------------------------------------------------------------------
# broker
# ---------------------------------------------------------------------------


class _BrokerState:
    def __init__(self, n_partitions: int):
        self.n_partitions = n_partitions
        self.lock = threading.Lock()
        # (topic, partition) -> list[(timestamp_ms, key, value)]
        self.logs: dict[tuple[str, int], list] = {}
        self.topics: set[str] = set()

    def ensure_topic(self, topic: str) -> None:
        with self.lock:
            if topic not in self.topics:
                self.topics.add(topic)
                for p in range(self.n_partitions):
                    self.logs[(topic, p)] = []


class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:  # one connection, many framed requests
        state: _BrokerState = self.server.state  # type: ignore[attr-defined]
        host, port = self.server.server_address  # type: ignore[attr-defined]
        sock = self.request
        try:
            while True:
                raw = self._recv_exact(sock, 4)
                if raw is None:
                    return
                (size,) = struct.unpack(">i", raw)
                payload = self._recv_exact(sock, size)
                if payload is None:
                    return
                r = _Reader(payload)
                api_key, api_version = r.i16(), r.i16()
                corr = r.i32()
                r.string()  # client_id
                body = self._dispatch(state, host, port, api_key, api_version, r)
                resp = _i32(corr) + body
                sock.sendall(_i32(len(resp)) + resp)
        except (ConnectionError, OSError):
            return

    @staticmethod
    def _recv_exact(sock, n: int) -> bytes | None:
        chunks = []
        while n:
            try:
                chunk = sock.recv(n)
            except OSError:
                return None
            if not chunk:
                return None
            chunks.append(chunk)
            n -= len(chunk)
        return b"".join(chunks)

    def _dispatch(
        self,
        state: _BrokerState,
        host: str,
        port: int,
        api_key: int,
        api_version: int,
        r: _Reader,
    ) -> bytes:
        if api_key == API_VERSIONS:
            supported = [
                (API_PRODUCE, 2, 2),
                (API_FETCH, 2, 2),
                (API_LIST_OFFSETS, 1, 1),
                (API_METADATA, 1, 1),
                (API_VERSIONS, 0, 0),
            ]
            return _i16(0) + _array(
                [_i16(k) + _i16(lo) + _i16(hi) for k, lo, hi in supported]
            )

        if api_key == API_METADATA:
            n = r.i32()
            names = (
                sorted(state.topics)
                if n < 0
                else [r.string() for _ in range(n)]
            )
            for t in names:
                state.ensure_topic(t)  # auto.create.topics.enable=true
            brokers = _array([_i32(0) + _string(host) + _i32(port) + _string(None)])
            topics = []
            with state.lock:
                for t in names:
                    parts = [
                        _i16(0)
                        + _i32(p)
                        + _i32(0)
                        + _array([_i32(0)])
                        + _array([_i32(0)])
                        for p in range(state.n_partitions)
                    ]
                    topics.append(
                        _i16(0) + _string(t) + _i8(0) + _array(parts)
                    )
            return brokers + _i32(0) + _array(topics)

        if api_key == API_PRODUCE:
            r.i16()  # acks
            r.i32()  # timeout
            responses = []
            for _ in range(r.i32()):
                topic = r.string()
                state.ensure_topic(topic)
                part_resps = []
                for _ in range(r.i32()):
                    partition = r.i32()
                    record_set = r.bytes() or b""
                    msgs = decode_message_set(record_set)
                    with state.lock:
                        log = state.logs[(topic, partition)]
                        base = len(log)
                        log.extend((ts, k, v) for _o, ts, k, v in msgs)
                    part_resps.append(
                        _i32(partition) + _i16(0) + _i64(base) + _i64(-1)
                    )
                responses.append(_string(topic) + _array(part_resps))
            return _array(responses) + _i32(0)

        if api_key == API_FETCH:
            r.i32()  # replica_id
            r.i32()  # max_wait
            r.i32()  # min_bytes
            responses = []
            for _ in range(r.i32()):
                topic = r.string()
                state.ensure_topic(topic)
                part_resps = []
                for _ in range(r.i32()):
                    partition = r.i32()
                    offset = r.i64()
                    max_bytes = r.i32()
                    with state.lock:
                        log = list(state.logs.get((topic, partition), []))
                    hw = len(log)
                    batch: list[tuple[int, bytes | None, bytes | None]] = []
                    size = 0
                    for o in range(offset, hw):
                        ts, k, v = log[o]
                        size += 26 + len(k or b"") + len(v or b"")
                        if batch and size > max_bytes:
                            break
                        batch.append((ts, k, v))
                    record_set = encode_message_set(batch, base_offset=offset)
                    part_resps.append(
                        _i32(partition)
                        + _i16(0)
                        + _i64(hw)
                        + _bytes(record_set)
                    )
                responses.append(_string(topic) + _array(part_resps))
            return _i32(0) + _array(responses)

        if api_key == API_LIST_OFFSETS:
            r.i32()  # replica_id
            responses = []
            for _ in range(r.i32()):
                topic = r.string()
                state.ensure_topic(topic)
                part_resps = []
                for _ in range(r.i32()):
                    partition = r.i32()
                    ts = r.i64()
                    with state.lock:
                        n = len(state.logs.get((topic, partition), []))
                    off = 0 if ts == EARLIEST else n
                    part_resps.append(
                        _i32(partition) + _i16(0) + _i64(-1) + _i64(off)
                    )
                responses.append(_string(topic) + _array(part_resps))
            return _array(responses)

        raise ValueError(f"unsupported api_key {api_key}")


class KafkaWireBroker:
    """In-process single-node broker; ``bootstrap`` gives host:port."""

    def __init__(self, n_partitions: int = 2, port: int = 0):
        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server(("127.0.0.1", port), _Handler)
        self._server.state = _BrokerState(n_partitions)  # type: ignore[attr-defined]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def bootstrap(self) -> str:
        host, port = self._server.server_address
        return f"{host}:{port}"

    @property
    def n_partitions(self) -> int:
        return self._server.state.n_partitions  # type: ignore[attr-defined]

    def message_count(self, topic: str) -> int:
        state: _BrokerState = self._server.state  # type: ignore[attr-defined]
        with state.lock:
            return sum(
                len(log)
                for (t, _p), log in state.logs.items()
                if t == topic
            )

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()
