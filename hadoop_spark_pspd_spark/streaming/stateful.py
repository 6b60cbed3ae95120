"""Custom stateful streaming operator via applyInPandasWithState (T4).

The reference's streaming surface is a built-in windowed count
(docs/README.md:257); this is the engine's escape hatch for operators the
built-ins can't express: arbitrary per-key state evolved across
micro-batches. Demonstrated with a per-user running profile (event count,
value sum, max gap between events) that survives batch boundaries — the
state-store-backed analog of the reference's continuously-updating count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_gap_s double"
)
STATE_SCHEMA = "n bigint, total double, last_us bigint, max_gap_us bigint"


def _update_user_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for one user into running state and
    emit the updated profile."""
    if state.exists:
        n, total, last_us, max_gap_us = state.get
    else:
        n, total, last_us, max_gap_us = 0, 0.0, None, 0

    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts_us, value in zip(
            pdf["ts"].astype("int64") // 1000, pdf["value"]
        ):
            if last_us is not None:
                max_gap_us = max(max_gap_us, ts_us - last_us)
            last_us = int(ts_us)
            n += 1
            total += float(value)

    state.update((n, total, last_us, max_gap_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_gap_s": [max_gap_us / 1e6],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events(user_id, ts, value) -> continuously-updated per-user profile."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor API to
# applyInPandasWithState — typed state handles (ValueState/ListState/
# MapState), timers, and TTL. Same per-user profile, same determinism
# argument: (user_id, ts) is unique, so the ts-ordered fold is replayable.
# ---------------------------------------------------------------------------

from ._protobuf_compat import ensure_protobuf

try:  # Spark >= 4.0; the streaming runner additionally needs protobuf
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    _HAS_TWS = ensure_protobuf()
except ImportError:  # pragma: no cover - older Spark
    if "StatefulProcessor" not in dir():
        StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False


class UserProfileProcessor(StatefulProcessor):
    """ValueState-backed fold: (n, total, last_us, max_gap_us) per user."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState(
            "profile", STATE_SCHEMA
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        # ValueState.get() returns None when unset — one state-server
        # round trip instead of the exists()+get() pair per key per batch
        cur = self._state.get()
        if cur is not None:
            n, total, last_us, max_gap_us = cur
        else:
            n, total, last_us, max_gap_us = 0, 0.0, None, 0
        for pdf in rows:
            pdf = pdf.sort_values("ts")
            for ts_us, value in zip(
                pdf["ts"].astype("int64") // 1000, pdf["value"]
            ):
                if last_us is not None:
                    max_gap_us = max(max_gap_us, ts_us - last_us)
                last_us = int(ts_us)
                n += 1
                total += float(value)
        self._state.update((n, total, last_us, max_gap_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_gap_s": [max_gap_us / 1e6],
            }
        )

    def close(self) -> None:
        pass


def user_profile_stream_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas flavor of user_profile_stream.

    TWS state lives in named column families, which only the RocksDB
    state store provider supports (HDFSBackedStateStoreProvider throws
    STATE_STORE_MULTIPLE_COLUMN_FAMILIES) — pin it for the session; it is
    also the at-scale backend (bounded state memory, changelog
    checkpointing), and test_stateful_query_on_rocksdb_state_store pins
    result parity with the default provider.
    """
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state"
        ".RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserProfileProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# Event-time TIMER sessions on transformWithStateInPandas: custom session
# windows with gap-timeout emission — the full TWS surface (typed state +
# registered timers). Gap-closed sessions emit from input processing
# (deterministic in-batch); still-open sessions emit when the event-time
# watermark passes last_ts + gap (the timer); sessions whose gap has not
# elapsed at end-of-stream stay in state. Spark timers are MILLISECOND-
# floored, so the emit rule is exactly
#   floor((last_us + GAP_US)/1000) <= floor(max_ts_us/1000)
# which the oracle encodes verbatim.
# ---------------------------------------------------------------------------

SESSION_GAP_MS = 1_800_000  # 30 minutes
_GAP_US = SESSION_GAP_MS * 1000

SESSION_STATE_SCHEMA = (
    "start_us long, last_us long, n long, timer_ms long"
)
SESSION_OUT_SCHEMA = "user_id long, start_us long, last_us long, n_events long"


def _session_frame(rows):
    return pd.DataFrame(
        {
            "user_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "start_us": pd.Series([r[1] for r in rows], dtype="int64"),
            "last_us": pd.Series([r[2] for r in rows], dtype="int64"),
            "n_events": pd.Series([r[3] for r in rows], dtype="int64"),
        }
    )


class SessionTimerProcessor(StatefulProcessor):
    """ValueState session accumulator + one registered event-time timer
    per key (re-armed on every batch; the stale one deleted first)."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._handle = handle
        self._state = handle.getValueState("sess", SESSION_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        # one get() round trip (None when unset) instead of exists()+get()
        cur = self._state.get()
        if cur is not None:
            start, last, n, timer = cur
        else:
            start = last = n = timer = None
        closed: list[tuple] = []
        uid = key[0]
        for pdf in rows:
            pdf = pdf.sort_values("ts")
            for ts_us in pdf["ts"].astype("int64") // 1000:
                ts_us = int(ts_us)
                if last is None:
                    start, last, n = ts_us, ts_us, 1
                elif ts_us - last > _GAP_US:
                    closed.append((uid, start, last, n))
                    start, last, n = ts_us, ts_us, 1
                else:
                    last = max(last, ts_us)
                    n += 1
        if timer is not None:
            self._handle.deleteTimer(timer)
        new_timer = (last + _GAP_US) // 1000  # ms-floored, like Spark
        self._handle.registerTimer(new_timer)
        self._state.update((start, last, n, new_timer))
        yield _session_frame(closed)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        out: list[tuple] = []
        cur = self._state.get()  # None when unset: one round trip
        if cur is not None:
            start, last, n, timer = cur
            if timer == expiredTimerInfo.getExpiryTimeInMs():
                out.append((key[0], start, last, n))
                self._state.clear()
        yield _session_frame(out)

    def close(self) -> None:
        pass


def session_timer_stream(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas with EventTime timers: custom gap
    sessions per user. Requires the RocksDB provider (column families)
    and a watermark on ts (0s delay -> final watermark = max event
    time, ms-floored)."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state"
        ".RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionTimerProcessor(),
            outputStructType=SESSION_OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def _session_gap_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState flavor of the timer sessions: GroupState +
    EventTimeTimeout reproduces the same ms-floored emit rule."""
    uid = key[0]
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            state.remove()
            yield _session_frame([(uid, start, last, n)])
        else:
            yield _session_frame([])
        return
    if state.exists:
        start, last, n = state.get
    else:
        start = last = n = None
    closed: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts_us in pdf["ts"].astype("int64") // 1000:
            ts_us = int(ts_us)
            if last is None:
                start, last, n = ts_us, ts_us, 1
            elif ts_us - last > _GAP_US:
                closed.append((uid, start, last, n))
                start, last, n = ts_us, ts_us, 1
            else:
                last = max(last, ts_us)
                n += 1
    state.update((start, last, n))
    state.setTimeoutTimestamp((last + _GAP_US) // 1000)
    yield _session_frame(closed)


def session_gap_stream_legacy(events: DataFrame) -> DataFrame:
    """Timer-session semantics on the applyInPandasWithState API (no
    protobuf runner needed) — the fallback lane for JVMs the TWS shim
    cannot reach."""
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_gap_fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType="start_us long, last_us long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# MapState on transformWithStateInPandas: per-user map keyed by
# event_type holding (count, value_sum) — the remaining typed-state
# family after ValueState (UserProfileProcessor) and timers
# (SessionTimerProcessor). Fallback for JVMs without a reachable
# protobuf runtime: the identical fold on applyInPandasWithState with
# the map key lifted into the grouping key (composite (user, type)
# ValueState) — same rows, same oracle.
# ---------------------------------------------------------------------------

TYPE_COUNTS_OUT_SCHEMA = (
    "user_id bigint, event_type string, n_events bigint, "
    "total_value double"
)
TYPE_COUNTS_STATE_SCHEMA = "n bigint, total double"


class TypeCountsProcessor(StatefulProcessor):
    """MapState-backed fold: event_type -> (n, total) per user."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._m = handle.getMapState(
            "type_counts", "event_type string", TYPE_COUNTS_STATE_SCHEMA
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        uid = key[0]
        # buffer the fold locally: every MapState call is a Python<->
        # state-server ROUND TRIP, and the original per-row
        # containsKey/getValue/updateValue triple made this processor
        # per-row-bound (~3 round trips x every cohort event; measured
        # 14.9 s in-sweep at sf0.1, ~3x the other TWS queries). One
        # getValue per touched key on first touch + one updateValue per
        # touched key after the batch loop performs the IDENTICAL
        # arithmetic in the identical ts order — (n, total) evolve
        # bit-identically — with O(distinct types) state calls instead
        # of O(rows).
        acc: dict[str, tuple[int, float]] = {}
        for pdf in rows:
            pdf = pdf.sort_values("ts")
            for et, value in zip(pdf["event_type"], pdf["value"]):
                et = str(et)
                if et in acc:
                    n, total = acc[et]
                elif self._m.containsKey((et,)):
                    n, total = self._m.getValue((et,))
                else:
                    n, total = 0, 0.0
                acc[et] = (n + 1, total + float(value))
        out = sorted(acc)  # map-iteration order is not contractual
        for et in out:
            self._m.updateValue((et,), acc[et])
        yield pd.DataFrame(
            {
                "user_id": pd.Series([uid] * len(out), dtype="int64"),
                "event_type": pd.Series(out, dtype="object"),
                "n_events": pd.Series(
                    [acc[et][0] for et in out], dtype="int64",
                ),
                "total_value": pd.Series(
                    [acc[et][1] for et in out], dtype="float64",
                ),
            }
        )

    def close(self) -> None:
        pass


def type_counts_stream_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas with a per-user MapState (RocksDB
    provider required for column families, as the other TWS streams)."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state"
        ".RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "event_type", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TypeCountsProcessor(),
            outputStructType=TYPE_COUNTS_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def _update_type_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for value in pdf["value"]:
            n += 1
            total += float(value)
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "n_events": [n],
            "total_value": [total],
        }
    )


def type_counts_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState fallback: map key lifted into the group."""
    return (
        events.select("user_id", "event_type", "ts", "value")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _update_type_counts,
            outputStructType=TYPE_COUNTS_OUT_SCHEMA,
            stateStructType=TYPE_COUNTS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# ListState on transformWithStateInPandas: per-user sliding window of
# the last K events — with MapState (TypeCountsProcessor), ValueState
# (UserProfileProcessor) and timers (SessionTimerProcessor) this
# completes the typed-state quartet. State is the ts-ordered event
# list, truncated to K via put() each batch (per-user arrival is
# ts-ordered for the bounded file stream, so append order == ts
# order; the processor still re-sorts defensively before truncating).
# ---------------------------------------------------------------------------

RECENT_K = 8
RECENT_OUT_SCHEMA = (
    "user_id bigint, n_window bigint, window_value double, "
    "last_us bigint, first_us bigint"
)
RECENT_ROW_SCHEMA = "ts_us bigint, value double"


class RecentWindowProcessor(StatefulProcessor):
    """ListState-backed last-K window per user."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._l = handle.getListState("recent", RECENT_ROW_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        uid = key[0]
        cur: list[tuple[int, float]] = (
            [tuple(r) for r in self._l.get()] if self._l.exists() else []
        )
        for pdf in rows:
            pdf = pdf.sort_values("ts")
            cur.extend(
                (int(ts_us), float(v))
                for ts_us, v in zip(
                    pdf["ts"].astype("int64") // 1000, pdf["value"]
                )
            )
        cur.sort(key=lambda r: r[0])
        cur = cur[-RECENT_K:]
        self._l.put(cur)
        # window sum folded in ts order (deterministic, <= K terms)
        total = 0.0
        for _, v in cur:
            total += v
        yield pd.DataFrame(
            {
                "user_id": pd.Series([uid], dtype="int64"),
                "n_window": pd.Series([len(cur)], dtype="int64"),
                "window_value": pd.Series([total], dtype="float64"),
                "last_us": pd.Series([cur[-1][0]], dtype="int64"),
                "first_us": pd.Series([cur[0][0]], dtype="int64"),
            }
        )

    def close(self) -> None:
        pass


def recent_window_stream_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas with per-user ListState (RocksDB)."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state"
        ".RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RecentWindowProcessor(),
            outputStructType=RECENT_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def _update_recent_window(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fallback: the same last-K fold with the list flattened into a
    fixed-width ValueState row (2K scalar slots)."""
    if state.exists:
        flat = list(state.get)
    else:
        flat = [None] * (2 * RECENT_K)
    cur = [
        (int(flat[2 * i]), float(flat[2 * i + 1]))
        for i in range(RECENT_K)
        if flat[2 * i] is not None
    ]
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        cur.extend(
            (int(ts_us), float(v))
            for ts_us, v in zip(
                pdf["ts"].astype("int64") // 1000, pdf["value"]
            )
        )
    cur.sort(key=lambda r: r[0])
    cur = cur[-RECENT_K:]
    flat = []
    for ts_us, v in cur:
        flat += [ts_us, v]
    flat += [None] * (2 * RECENT_K - len(flat))
    state.update(tuple(flat))
    total = 0.0
    for _, v in cur:
        total += v
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_window": [len(cur)],
            "window_value": [total],
            "last_us": [cur[-1][0]],
            "first_us": [cur[0][0]],
        }
    )


_RECENT_STATE_SCHEMA = ", ".join(
    f"t{i} bigint, v{i} double" for i in range(RECENT_K)
)


def recent_window_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState fallback for the last-K window."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_recent_window,
            outputStructType=RECENT_OUT_SCHEMA,
            stateStructType=_RECENT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
