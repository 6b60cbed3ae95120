"""Structured Streaming queries surfaced through the driver contract.

The reference's streaming pipeline (docs/README.md:257) is a Kafka-fed
windowed word count; here the same *incremental* execution runs over a
bounded file-source replay of the ``events`` table (availableNow trigger),
so the final answer is oracle-checkable as plain SQL over the full table.
``window('1 hour')`` aligns to epoch-hour boundaries == date_trunc('hour').
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import normalize_event_ts
from ..registry import register
from .cdc import _HLL_ALPHA_M2, _HLL_M, _HLL_RHO_CASE
from ..session import pin_session_conf
from ..streaming._protobuf_compat import ensure_protobuf

# Run at import (registry load) time: sets PYTHONPATH so any JVM built
# AFTER load_all() spawns TWS driver workers that can import protobuf.
# Env-only and idempotent; harmless when protobuf is pip-installed.
ensure_protobuf()

_sink_counter = itertools.count()


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded file-source replay of the events table (ns-ts normalized).

    Handles BOTH physical layouts: events.parquet as a single file (the
    driver's testdata) and as a Spark-written DIRECTORY of part files
    (replicated/simulated dirs). The glob formulation alone silently
    matches ZERO files in the directory layout — the file-stream source
    treats pathGlobFilter entries as file names — which would make every
    streaming query return an empty (wrong) result instead of failing.
    """
    import os

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        stream = spark.readStream.schema(schema).parquet(path)
    else:
        # single file: the file stream source wants a directory — scan
        # sf_dir with a glob pinned to the events table file
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    return normalize_event_ts(stream)


_STATE_ROWS_PER_PARTITION = 50_000
_events_rows_cache: dict[str, int] = {}


def _events_rows(spark: SparkSession, sf_dir: str) -> int:
    """Row count of the events table (parquet-footer metadata count),
    cached per sf_dir — one trivial job per sweep, not per query."""
    if sf_dir not in _events_rows_cache:
        _events_rows_cache[sf_dir] = spark.read.parquet(
            f"{sf_dir}/events.parquet"
        ).count()
    return _events_rows_cache[sf_dir]


def sized_state_partitions(spark: SparkSession, sf_dir: str, rows=None):
    """Temporarily size spark.sql.shuffle.partitions — which fixes the
    STATE STORE partition count of every stateful operator started
    under it — to the bounded replay's volume instead of the global
    shuffle config.

    Why: each stateful task pays a per-partition state-store setup cost
    every micro-batch (a stream-stream join keeps FOUR stores per
    partition), so 32 state partitions over ~100k rows is pure
    overhead — measured 13.5 s -> 2.8 s on stream_stream_join at sf0.1
    by moving 32 -> 8. The rule (~50k state rows per partition, floor
    4, ceiling the session's shuffle config) scales the same operator
    back up on a real cluster: at 100 TB the ceiling — the cluster-
    sized shuffle config — is what binds, and state partitioning
    matches the cluster again. Round-7 verdict item 5.
    """
    from contextlib import contextmanager

    @contextmanager
    def _ctx():
        cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        n_rows = _events_rows(spark, sf_dir) if rows is None else rows
        parts = max(
            4,
            min(cap, n_rows // _STATE_ROWS_PER_PARTITION + 1),
        )
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            yield parts
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    return _ctx()


def run_bounded_stream(
    spark: SparkSession,
    source: DataFrame,
    transform,
    output_mode: str = "complete",
    sf_dir: str | None = None,
    state_rows: int | None = None,
) -> DataFrame:
    """Drive a streaming transform over a bounded source to completion,
    collecting results in a memory sink; returns the result as a
    DataFrame. When ``sf_dir`` is given, state-store partitioning is
    sized to the replay volume (see sized_state_partitions);
    ``state_rows`` overrides the volume when the transform sees only a
    cohort of the replay."""
    name = f"pspd_stream_sink_{next(_sink_counter)}"

    def _start():
        q = (
            transform(source)
            .writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if sf_dir is None:
        _start()
    else:
        with sized_state_partitions(spark, sf_dir, rows=state_rows):
            _start()
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

    # state rows = DISTINCT GROUPS (hours x event types), dimension-
    # bounded at ~10k regardless of corpus size — not the input row
    # count the default would use. Fewer state partitions = fewer
    # per-micro-batch store setups (round-8 §1); the r11 8v32 scaling
    # ratio of 0.78 was exactly this overhead growing with cores.
    result = run_bounded_stream(
        spark, source, transform, "complete", sf_dir=sf_dir,
        state_rows=10_000,
    )
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
        sf_dir=sf_dir,
        # dimension-bounded state (hours x words) — see stream_hourly_counts
        state_rows=10_000,
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

    result = run_bounded_stream(spark, source, transform, "append", sf_dir=sf_dir)
    return result.select("user_id", "event_type")


@register(
    "stream_session_windows",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > 1800 * 1000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTES AS session_end,
               count(*) AS n_events
        FROM sessions
        GROUP BY user_id, sid
    """,
    doc="Streaming session_window() (30-min gap, reference T4 surface) "
        "over the bounded events replay, complete output mode — the "
        "incremental state-store path computes the same sessions the "
        "batch q_session_window and the lag/cumsum oracle produce.",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    source = _events_stream(spark, sf_dir)

    def transform(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        ).agg(F.count("*").alias("n_events"))

    result = run_bounded_stream(spark, source, transform, "complete", sf_dir=sf_dir)
    return result.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


@register(
    "stream_sliding_counts",
    oracle="""
        WITH g AS (
            SELECT make_timestamp((epoch_us(ts) // (1800 * 1000000))
                                  * (1800 * 1000000)) AS w0,
                   event_type
            FROM events
        )
        SELECT window_start, event_type, count(*) AS n
        FROM (
            SELECT w0 AS window_start, event_type FROM g
            UNION ALL
            SELECT w0 - INTERVAL 30 MINUTES AS window_start, event_type FROM g
        )
        GROUP BY window_start, event_type
    """,
    doc="Streaming SLIDING-window count (1 h window, 30 min slide — the "
        "reference T1's optional sliding reading): every event lands in "
        "exactly two epoch-aligned windows, which the oracle reproduces "
        "as a two-way shifted-truncation UNION ALL.",
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    source = _events_stream(spark, sf_dir)

    def transform(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.window("ts", "1 hour", "30 minutes"), "event_type"
        ).count()

    result = run_bounded_stream(spark, source, transform, "complete", sf_dir=sf_dir)
    return result.select(
        F.col("window.start").alias("window_start"),
        "event_type",
        F.col("count").alias("n"),
    )


@register(
    "stream_stream_join",
    oracle="""
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               date_diff('second', c.ts, p.ts) AS secs_to_purchase
        FROM events c JOIN events p
          ON p.user_id = c.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 30 MINUTES
    """,
    doc="Watermarked stream-stream equi-join (reference §2.5 engine "
        "surface; state-store backed): clicks joined to same-user "
        "purchases within the following 30 minutes, both sides replayed "
        "from the bounded events source with 1-day watermarks. The time "
        "bound lets Spark evict join state; the oracle is the plain "
        "interval self-join.",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            _events_stream(spark, sf_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "1 day")
        )

    clicks = side("click", "c")
    purchases = side("purchase", "p")
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    name = f"pspd_stream_sink_{next(_sink_counter)}"
    with sized_state_partitions(spark, sf_dir):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        F.col("c_user").alias("user_id"),
        F.col("c_id").alias("click_id"),
        F.col("p_id").alias("purchase_id"),
        (
            F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")
        ).alias("secs_to_purchase"),
    )


@register(
    "stream_stream_left_join",
    oracle="""
        WITH c AS (
            SELECT user_id cu, event_id cid, ts cts FROM events
            WHERE event_type = 'click'
        ), p AS (
            SELECT user_id pu, event_id pid, ts pts FROM events
            WHERE event_type = 'purchase'
        ), j AS (
            SELECT cu, cid, pid, cts, pts
            FROM c LEFT JOIN p
              ON pu = cu AND pts >= cts
             AND pts <= cts + INTERVAL 30 MINUTES
        ), wm AS (
            SELECT least((SELECT max(cts) FROM c),
                         (SELECT max(pts) FROM p))
                   - INTERVAL 1 MINUTE AS w
        )
        SELECT cu AS user_id, cid AS click_id, pid AS purchase_id,
               date_diff('second', cts, pts) AS secs_to_purchase
        FROM j
        WHERE pid IS NOT NULL
           OR cts + INTERVAL 30 MINUTES < (SELECT w FROM wm)
    """,
    doc="LEFT-OUTER watermarked stream-stream join: every click pairs "
        "with same-user purchases in the following 30 minutes, and "
        "clicks with no such purchase surface with NULLs once the "
        "watermark closes their join window. The oracle restates Spark's "
        "eviction rule exactly: the final watermark is min over both "
        "sides of (max event time - 1 minute delay), and an unmatched "
        "click emits iff click_ts + 30 min < watermark (clicks whose "
        "window is still open at end-of-stream stay in state and do NOT "
        "emit — verified row-for-row against the incremental run).",
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            _events_stream(spark, sf_dir)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "1 minute")
        )

    clicks = side("click", "c")
    purchases = side("purchase", "p")
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    )
    name = f"pspd_stream_sink_{next(_sink_counter)}"
    with sized_state_partitions(spark, sf_dir):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        F.col("c_user").alias("user_id"),
        F.col("c_id").alias("click_id"),
        F.col("p_id").alias("purchase_id"),
        (
            F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")
        ).alias("secs_to_purchase"),
    )


@register(
    "stream_topk_words",
    oracle="""
        SELECT upper(event_type) AS word, count(*) AS cnt
        FROM events
        GROUP BY 1
        ORDER BY cnt DESC, word
        LIMIT 3
    """,
    doc="The reference's word-cloud top-k (SURVEY O2, spec'd-but-"
        "unimplemented Kibana step) as a LIVE streaming query: complete "
        "output mode allows ORDER BY + LIMIT on the continuously-updated "
        "aggregate; the bounded replay's final frame equals batch top-k.",
)
def stream_topk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    source = _events_stream(spark, sf_dir)

    def transform(df: DataFrame) -> DataFrame:
        return (
            df.select(F.upper("event_type").alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("word"))
            .limit(3)
        )

    return run_bounded_stream(spark, source, transform, "complete", sf_dir=sf_dir)


@register(
    "stream_user_profiles",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts, value,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) AS gap
            FROM events
        )
        SELECT user_id,
               count(*) AS n_events,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(value ORDER BY ts)),
                   (a, b) -> a + b) AS total_value,
               COALESCE(max(gap), 0) / 1e6 AS max_gap_s
        FROM seq GROUP BY user_id
    """,
    doc="CUSTOM STATEFUL operator (applyInPandasWithState, reference T4 "
        "surface): per-user running profile folded across micro-batches "
        "in event-time order. Normally rows-only territory, but the fold "
        "is deterministic here - (user_id, ts) is unique at every sf, so "
        "the Python float accumulation order is exactly ts order, which "
        "the oracle replays with list_reduce over list(value ORDER BY "
        "ts); gaps are integer microsecond diffs.",
)
def stream_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    from ..streaming.stateful import user_profile_stream

    source = _events_stream(spark, sf_dir)
    result = run_bounded_stream(
        spark, source, user_profile_stream, "update", sf_dir=sf_dir
    )
    # update-mode memory sink appends one row per user per micro-batch;
    # the LAST emission per user is the final profile
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        result.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "n_events", "total_value", "max_gap_s")
    )


def _tws_runnable(spark: SparkSession) -> bool:
    """True iff a transformWithState driver worker spawned by THIS
    session's JVM will find a protobuf runtime: either pip-installed
    (workers share site-packages) or the shim dirs are on the JVM's
    inherited PYTHONPATH (only JVMs launched after ensure_protobuf)."""
    from ..streaming import stateful

    if not stateful._HAS_TWS:
        return False
    try:
        import importlib.util

        spec = importlib.util.find_spec("google.protobuf.descriptor")
        if spec is not None and "google_appengine" not in str(
            spec.origin or ""
        ):
            return True
    except (ImportError, ModuleNotFoundError):
        pass
    from ..streaming._protobuf_compat import _GAE, _SHIM

    jvm_pp = spark._jvm.System.getenv("PYTHONPATH") or ""
    return _SHIM in jvm_pp or _GAE in jvm_pp


# Deterministic cohort for the TWS pair: transformWithStateInPandas pays
# a Python state-server round per (partition x micro-batch) plus Arrow
# transfer of every input row, so the TWS surface is exercised on a
# user_id cohort while the FULL-corpus fold stays hash-checked by the
# broker-free twins (stream_user_profiles / stream_session_windows) —
# the same oracle-mirrored-cohort pattern as stream_kafka_roundtrip
# (round-7 verdict item 5; round-8 item 6 applies it to the TWS pair).
_TWS_MOD = 4


@register(
    "stream_user_profiles_tws",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, ts, value,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) AS gap
            FROM events
            WHERE user_id % {_TWS_MOD} = 0
        )
        SELECT user_id,
               count(*) AS n_events,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(value ORDER BY ts)),
                   (a, b) -> a + b) AS total_value,
               COALESCE(max(gap), 0) / 1e6 AS max_gap_s
        FROM seq GROUP BY user_id
    """,
    doc="CUSTOM STATEFUL operator on transformWithStateInPandas — "
        "Spark 4's successor API to applyInPandasWithState (typed "
        "ValueState handles, named column families, RocksDB state "
        "store): the same per-user profile fold as "
        "stream_user_profiles, hash-checked against the same "
        "ts-ordered list_reduce oracle. The state store provider is "
        "pinned to RocksDB for the query (TWS column families require "
        "it; it is also the at-scale backend — bounded state memory, "
        "changelog checkpointing) and restored after, so the rest of "
        "the sweep keeps the default provider. TWS's driver worker "
        "speaks protobuf; when the session's JVM was launched without "
        "a reachable protobuf runtime (a bare driver session on an "
        "image with no pip protobuf — the shim in "
        "streaming/_protobuf_compat.py can only help JVMs started "
        "AFTER it sets PYTHONPATH), the query falls back to the "
        "applyInPandasWithState implementation: identical semantics, "
        "same oracle, and the TWS path is still exercised by every "
        "builder sweep (load_all precedes session build there). Runs "
        f"on the deterministic user_id % {_TWS_MOD} = 0 cohort "
        "(oracle-mirrored) — the full-corpus fold is hash-checked by "
        "stream_user_profiles; TWS pays a Python state-server round "
        "per partition-batch plus Arrow transfer of every input row, "
        "so the cohort bounds harness volume without narrowing the "
        "exercised surface.",
    tags=("streaming",),
)
def stream_user_profiles_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    from ..streaming.stateful import (
        user_profile_stream,
        user_profile_stream_tws,
    )

    transform = (
        user_profile_stream_tws
        if _tws_runnable(spark)
        else user_profile_stream
    )
    source = _events_stream(spark, sf_dir).filter(
        F.col("user_id") % _TWS_MOD == 0
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    try:
        result = run_bounded_stream(
            spark, source, transform, "update", sf_dir=sf_dir,
            state_rows=_events_rows(spark, sf_dir) // _TWS_MOD,
        )
        # materialized memory sink: one row per user per micro-batch;
        # keep the final (max n_events) emission per user
        w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
        return (
            result.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("user_id", "n_events", "total_value", "max_gap_s")
        )
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


@register(
    "stream_type_counts_tws",
    oracle=f"""
        SELECT user_id, event_type,
               count(*) AS n_events,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(value ORDER BY ts)),
                   (a, b) -> a + b) AS total_value
        FROM events
        WHERE user_id % {_TWS_MOD} = 0
        GROUP BY user_id, event_type
    """,
    doc="MapState on transformWithStateInPandas — the remaining typed "
        "TWS state family after ValueState (stream_user_profiles_tws) "
        "and timers (stream_session_timers_tws): one per-user map "
        "keyed by event_type holding (count, value_sum), updated per "
        "micro-batch, emitted per touched key in sorted order "
        "(map-iteration order is not contractual). Same RocksDB "
        "provider pin + protobuf-fallback contract as the other TWS "
        "queries; the fallback lifts the map key into the grouping "
        "key (composite (user, type) ValueState) with identical rows. "
        f"Deterministic user_id % {_TWS_MOD} = 0 cohort, oracle = "
        "per-(user,type) count + ts-ordered list_reduce sum.",
    tags=("streaming",),
)
def stream_type_counts_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    from ..streaming.stateful import (
        type_counts_stream,
        type_counts_stream_tws,
    )

    transform = (
        type_counts_stream_tws
        if _tws_runnable(spark)
        else type_counts_stream
    )
    source = _events_stream(spark, sf_dir).filter(
        F.col("user_id") % _TWS_MOD == 0
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    try:
        result = run_bounded_stream(
            spark, source, transform, "update", sf_dir=sf_dir,
            state_rows=_events_rows(spark, sf_dir) // _TWS_MOD,
        )
        # keep the final (max n_events) emission per (user, type)
        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.desc("n_events")
        )
        return (
            result.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("user_id", "event_type", "n_events", "total_value")
        )
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


@register(
    "stream_recent_window_tws",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   list(value ORDER BY ts) AS lv,
                   list(CAST(epoch_us(ts) AS BIGINT) ORDER BY ts) AS lt,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            WHERE user_id % {_TWS_MOD} = 0
            GROUP BY user_id
        )
        SELECT user_id,
               least(n, 8) AS n_window,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                lv[greatest(n - 7, 1):]),
                   (a, b) -> a + b) AS window_value,
               lt[n] AS last_us,
               lt[greatest(n - 7, 1)] AS first_us
        FROM per_user
    """,
    doc="ListState on transformWithStateInPandas — completes the typed "
        "TWS state quartet (ValueState, MapState, timers, ListState): "
        "a per-user sliding window of the last K=8 events kept in "
        "ListState (put() truncation each batch), emitting the window "
        "count, ts-ordered value fold, and first/last event times. "
        "Same RocksDB pin + protobuf fallback contract (fallback "
        "flattens the list into a fixed 2K-slot ValueState row — "
        "identical rows, parity-tested). Deterministic cohort; oracle "
        "slices the ts-ordered per-user list to its last 8 elements "
        "and folds in the same order.",
    tags=("streaming",),
)
def stream_recent_window_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    from ..streaming.stateful import (
        recent_window_stream,
        recent_window_stream_tws,
    )

    transform = (
        recent_window_stream_tws
        if _tws_runnable(spark)
        else recent_window_stream
    )
    source = _events_stream(spark, sf_dir).filter(
        F.col("user_id") % _TWS_MOD == 0
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    try:
        result = run_bounded_stream(
            spark, source, transform, "update", sf_dir=sf_dir,
            state_rows=_events_rows(spark, sf_dir) // _TWS_MOD,
        )
        # final state per user: the emission with the greatest
        # last-event time (strictly grows for a ts-ordered arrival),
        # n_window breaking pre-saturation ties
        w = Window.partitionBy("user_id").orderBy(
            F.desc("last_us"), F.desc("n_window")
        )
        return (
            result.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(
                "user_id", "n_window", "window_value", "last_us",
                "first_us",
            )
        )
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


@register(
    "stream_session_timers_tws",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                           > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WHERE user_id % {_TWS_MOD} = 0
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM seq
        ), agg AS (
            SELECT user_id, sid,
                   min(ts) AS session_start,
                   max(ts) AS session_last,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM sess GROUP BY 1, 2
        ), mx AS (SELECT max(ts) AS max_ts FROM events
                  WHERE user_id % {_TWS_MOD} = 0)
        SELECT user_id,
               CAST(session_start AS TIMESTAMP) AS session_start,
               CAST(session_last AS TIMESTAMP) AS session_last,
               n_events
        FROM agg CROSS JOIN mx
        WHERE (epoch_us(session_last) + 1800000000) // 1000
              <= epoch_us(max_ts) // 1000
    """,
    doc="CUSTOM session windows with EVENT-TIME TIMERS on "
        "transformWithStateInPandas — the full TWS surface (typed "
        "ValueState + registerTimer/handleExpiredTimer): 30-minute gap "
        "sessions per user, where gap-closed sessions emit from input "
        "processing and still-open sessions emit when the watermark "
        "passes last_ts + gap via a registered timer; sessions whose "
        "gap has not elapsed at end-of-stream stay in state and do NOT "
        "emit. Spark timers are millisecond-floored, so the oracle "
        "encodes the exact contract: emit iff floor((last_us + "
        "gap_us)/1000) <= floor(max_ts_us/1000) (0s watermark delay). "
        "Falls back to the identical-semantics applyInPandasWithState "
        "+ EventTimeTimeout lane on JVMs the protobuf shim cannot "
        "reach (same rule: GroupState timeouts are watermark-ms "
        "gated too). State is one (start, last, n, timer) tuple per "
        "ACTIVE user — watermark-expired keys are freed by the timer "
        "path, the state-boundedness property gap sessions need at "
        f"100 TB. Runs on the deterministic user_id % {_TWS_MOD} = 0 "
        "cohort (oracle-mirrored, including the watermark's max-ts "
        "contract) — full-corpus gap sessions are hash-checked by "
        "stream_session_windows; see stream_user_profiles_tws for the "
        "cohort rationale.",
    tags=("streaming",),
)
def stream_session_timers_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    from ..streaming.stateful import (
        session_gap_stream_legacy,
        session_timer_stream,
    )

    transform = (
        session_timer_stream
        if _tws_runnable(spark)
        else session_gap_stream_legacy
    )
    source = _events_stream(spark, sf_dir).filter(
        F.col("user_id") % _TWS_MOD == 0
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    try:
        result = run_bounded_stream(
            spark, source, transform, "append", sf_dir=sf_dir,
            state_rows=_events_rows(spark, sf_dir) // _TWS_MOD,
        )
        return result.select(
            "user_id",
            F.timestamp_micros(F.col("start_us")).alias("session_start"),
            F.timestamp_micros(F.col("last_us")).alias("session_last"),
            "n_events",
        )
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)


@register(
    "stream_salted_counts",
    oracle="""
        SELECT event_type, count(*) AS n
        FROM events
        GROUP BY event_type
    """,
    doc="Two-phase salted aggregation on the STREAMING side, where it "
        "actually matters: AQE cannot re-plan a stateful stage, so a hot "
        "grouping key pins one state-store partition forever. Phase 1 is "
        "the streaming aggregation on (event_type, deterministic salt of "
        "event_id mod 16) — state and updates for each hot key spread "
        "over 16 partitions; phase 2 merges the 16 partials per key as a "
        "BATCH aggregation over the completed sink (exact integer "
        "counts, so two-phase == one-phase, which is the oracle). Same "
        "pattern as q_skew_salted_agg, lifted to the state store.",
    tags=("streaming", "skew"),
)
def stream_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_session_conf(spark)
    source = _events_stream(spark, sf_dir)

    def transform(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type",
            F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("salt"),
        ).count()

    partials = run_bounded_stream(spark, source, transform, "complete", sf_dir=sf_dir)
    return partials.groupBy("event_type").agg(
        F.sum("count").alias("n")
    )


_N_SPOOL_SLICES = 4


def _spool_events(spark: SparkSession, sf_dir: str) -> str:
    """Split the events table into slice files in a tmp spool dir so the
    file stream source (maxFilesPerTrigger=1) replays it as MULTIPLE
    micro-batches. Idempotent per (sf_dir, source mtime)."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from ..catalog import Tables

    tag = Path(sf_dir).name.replace(".", "_")
    spool = Path(tempfile.gettempdir()) / f"pspd_stream_spool_{tag}"
    marker = spool / "_SPOOL_OK"
    src_mtime = str(os.path.getmtime(f"{sf_dir}/events.parquet"))
    if marker.exists() and marker.read_text() == src_mtime:
        return str(spool)
    shutil.rmtree(spool, ignore_errors=True)
    events = Tables(spark, sf_dir).events  # ts normalized at write time
    for i in range(_N_SPOOL_SLICES):
        (
            events.filter(F.pmod(F.col("event_id"), _N_SPOOL_SLICES) == i)
            .repartition(1)
            .write.mode("append")
            .parquet(str(spool))
        )
    marker.write_text(src_mtime)
    return str(spool)


@register(
    "stream_foreachbatch_merge",
    oracle="""
        SELECT user_id, COUNT(*) AS n_events,
               CAST(MAX(ts) AS TIMESTAMP) AS last_ts
        FROM events GROUP BY user_id
    """,
    doc="foreachBatch incremental MERGE sink: the events table is "
        "replayed as 4 micro-batches (spooled slice files, "
        "maxFilesPerTrigger=1); each batch is aggregated per user and "
        "full-outer-merged into a parquet state table (counts add, "
        "last_ts takes the max), written to a fresh versioned directory "
        "per batch — the atomic-swap pattern that makes a retried batch "
        "rewrite the same version instead of double-applying (exactly-"
        "once on top of at-least-once delivery). This is the canonical "
        "Structured Streaming upsert-into-a-lakehouse-table shape (what "
        "MERGE INTO does when a transaction log exists). The final state "
        "must equal the all-at-once batch aggregate, which is exactly "
        "what the oracle checks.",
)
def stream_foreachbatch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    from pathlib import Path

    pin_session_conf(spark)
    spool = _spool_events(spark, sf_dir)
    schema = spark.read.parquet(spool).schema
    run = next(_sink_counter)
    tmp = Path(tempfile.gettempdir())
    # PID-scoped name: concurrent sessions can't collide; stale bases
    # from dead sessions are reaped here (ADVICE r03: the per-run dirs
    # accumulated unboundedly across verify/bench runs)
    for stale in tmp.glob("pspd_fb_merge_*"):
        pid = stale.name.split("_")[3] if stale.name.count("_") >= 3 else ""
        if pid.isdigit() and not Path(f"/proc/{pid}").exists():
            shutil.rmtree(stale, ignore_errors=True)
    base = tmp / f"pspd_fb_merge_{os.getpid()}_{run}"
    shutil.rmtree(base, ignore_errors=True)
    base.mkdir(parents=True)
    state = {"path": None}

    def merge(batch: DataFrame, batch_id: int) -> None:
        agg = batch.groupBy("user_id").agg(
            F.count("*").alias("n_events"), F.max("ts").alias("last_ts")
        )
        if state["path"] is not None:
            cur = spark.read.parquet(state["path"])
            t, s = cur.alias("t"), agg.alias("s")
            agg = t.join(
                s, F.col("t.user_id") == F.col("s.user_id"), "full_outer"
            ).select(
                F.coalesce(F.col("t.user_id"), F.col("s.user_id"))
                .alias("user_id"),
                (
                    F.coalesce(F.col("t.n_events"), F.lit(0))
                    + F.coalesce(F.col("s.n_events"), F.lit(0))
                ).alias("n_events"),
                F.greatest(
                    F.coalesce(F.col("t.last_ts"), F.col("s.last_ts")),
                    F.coalesce(F.col("s.last_ts"), F.col("t.last_ts")),
                ).alias("last_ts"),
            )
        # versioned-by-batch-id target: a retry of batch N overwrites
        # version N (idempotent), never double-applies into version N-1
        new_path = str(base / f"v{batch_id}")
        agg.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path

    with sized_state_partitions(spark, sf_dir):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(spool)
            .writeStream.foreachBatch(merge)
            .option(
                "checkpointLocation", str(base / "_checkpoint")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # Return the final merged state as a LAZY distributed read of the
    # last version — zero driver-side collect (round-7 verdict item 1:
    # at real scale the per-user state is itself big data). Superseded
    # versions and the checkpoint are deleted now; the surviving
    # version stays on disk until the stale-run reaper above collects
    # it (PID-scoped, so a later run in this or any live process never
    # races it).
    final_path = state["path"]
    for child in base.iterdir():
        if str(child) != final_path:
            shutil.rmtree(child, ignore_errors=True)
    return spark.read.parquet(final_path)


@register(
    "stream_dedup_windowed_counts",
    oracle="""
        SELECT window_start, event_type,
               CAST(count(*) AS BIGINT) AS n_active
        FROM (
            SELECT DISTINCT user_id, event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start
            FROM events
        )
        GROUP BY window_start, event_type
    """,
    doc="CHAINED stateful streaming (two state stores in one query — the "
        "multiple-stateful-operator capability): per-hour rate-capped "
        "activity counts, computed as dropDuplicates on (user, type, "
        "hour) feeding a streaming aggregation downstream. The dedup key "
        "includes the hour bucket, so the downstream count is "
        "survivor-independent (arrival order can pick any duplicate — "
        "they all carry the same bucket) and equals the batch DISTINCT "
        "oracle deterministically. State sizing: dedup state is one "
        "entry per active (user, type, hour) — watermark-expirable on "
        "unbounded streams — and the agg state is the bounded bucket "
        "grid; both shuffle once on their own keys.",
    tags=("streaming",),
)
def stream_dedup_windowed_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pin_session_conf(spark)
    source = _events_stream(spark, sf_dir)

    def transform(df: DataFrame) -> DataFrame:
        hourly = df.select(
            "user_id",
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
        )
        deduped = hourly.dropDuplicates(
            ["user_id", "event_type", "window_start"]
        )
        return deduped.groupBy("window_start", "event_type").agg(
            F.count("*").alias("n_active")
        )

    return run_bounded_stream(spark, source, transform, "complete", sf_dir=sf_dir)


@register(
    "stream_chained_window_aggs",
    oracle="""
        WITH hourly AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
                   event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        mx AS (SELECT max(ts) AS max_ts FROM events)
        SELECT CAST(date_trunc('day', h) AS TIMESTAMP) AS day_start,
               event_type,
               CAST(SUM(n) AS BIGINT) AS n_day
        FROM hourly CROSS JOIN mx
        GROUP BY 1, 2, mx.max_ts
        HAVING CAST(date_trunc('day', h) AS TIMESTAMP) + INTERVAL 1 DAY
               <= mx.max_ts
    """,
    doc="CHAINED streaming window aggregations (Spark's "
        "multi-aggregation path, window_time() re-windowing): hourly "
        "counts roll up into daily counts inside ONE streaming query — "
        "the hierarchical continuous-rollup shape a metrics store runs. "
        "Append mode is required (the chained-agg correctness rule), so "
        "the query emits exactly the CLOSED day windows: end <= the "
        "final watermark (max event time, 0s delay). The oracle encodes "
        "that contract — day windows whose end exceeds max(ts) are "
        "withheld by watermark semantics, not missing data. Both window "
        "states are bounded bucket grids; each agg shuffles once on its "
        "own keys.",
    tags=("streaming",),
)
def stream_chained_window_aggs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pin_session_conf(spark)
    source = _events_stream(spark, sf_dir)

    def transform(df: DataFrame) -> DataFrame:
        hourly = (
            df.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n"))
        )
        return hourly.groupBy(
            F.window(F.window_time("window"), "1 day"), "event_type"
        ).agg(F.sum("n").alias("n_day"))

    result = run_bounded_stream(spark, source, transform, "append", sf_dir=sf_dir)
    return result.select(
        F.col("window.start").alias("day_start"),
        "event_type",
        F.col("n_day"),
    )


@register(
    "stream_hll_registers",
    oracle=f"""
        WITH h AS (
            SELECT CAST(CAST(('0x' || substr(md5(
                       CAST(event_id AS VARCHAR)), 1, 13)) AS UBIGINT)
                       AS BIGINT) AS h
            FROM events
        ), rw AS (
            SELECT h % {_HLL_M} AS j, h // {_HLL_M} AS w FROM h
        ), regs AS (
            SELECT j, max({_HLL_RHO_CASE}) AS m_j
            FROM rw GROUP BY j
        ), grid AS (
            SELECT CAST(unnest(range(0, {_HLL_M})) AS BIGINT) AS j
        ), full_regs AS (
            SELECT g.j, CAST(coalesce(r.m_j, 0) AS BIGINT) AS m_j
            FROM grid g LEFT JOIN regs r ON g.j = r.j
        ), summary AS (
            SELECT CAST(SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS v_empty,
                   SUM(CAST(1 AS DOUBLE)
                       / CAST(CAST(1 AS BIGINT) << m_j AS DOUBLE)) AS z_sum
            FROM full_regs
        ), exact AS (
            SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS n_exact
            FROM events
        )
        SELECT f.j, f.m_j, s.v_empty, s.z_sum,
               CAST('{_HLL_ALPHA_M2}' AS DOUBLE) / s.z_sum AS hll_est,
               e.n_exact
        FROM full_regs f CROSS JOIN summary s CROSS JOIN exact e
    """,
    doc="STREAMING HyperLogLog: the event stream replays in micro-"
        "batches through foreachBatch, each batch reduces to its own "
        "256-register max table, and the running state merges by "
        "register max into a batch-id-versioned parquet target "
        "(idempotent under retries, like stream_foreachbatch_merge). "
        "Because register max is commutative, associative and "
        "idempotent, the final state is EXACTLY the batch HLL of the "
        "whole stream — no watermark contract needed; the oracle is "
        "the plain batch register table over the same rows, so any "
        "merge-path defect (lost batch, double-applied batch with a "
        "wrong combine, dropped register) breaks the hash. This is "
        "the mergeable-sketch pattern that gives streaming distinct "
        "counts O(m) state at 100 TB instead of a per-key dedup "
        "store. Constant 256-row state per merge; estimate math "
        "identical to sketch_hll_registers (exact dyadic harmonic "
        "sum, literal alpha).",
    tags=("streaming", "sketch"),
)
def stream_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    from pathlib import Path

    pin_session_conf(spark)
    spool = _spool_events(spark, sf_dir)
    schema = spark.read.parquet(spool).schema
    run = next(_sink_counter)
    tmp = Path(tempfile.gettempdir())
    for stale in tmp.glob("pspd_hll_stream_*"):
        pid = stale.name.split("_")[3] if stale.name.count("_") >= 3 else ""
        if pid.isdigit() and not Path(f"/proc/{pid}").exists():
            shutil.rmtree(stale, ignore_errors=True)
    base = tmp / f"pspd_hll_stream_{os.getpid()}_{run}"
    shutil.rmtree(base, ignore_errors=True)
    base.mkdir(parents=True)
    state = {"path": None}

    def batch_regs(batch: DataFrame) -> DataFrame:
        h = batch.select(
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 13),
                16, 10,
            ).cast("long").alias("h")
        )
        rw = h.select(
            (F.col("h") % _HLL_M).alias("j"),
            F.expr(f"h div {_HLL_M}").alias("w"),
        )
        return rw.groupBy("j").agg(
            F.max(F.expr(_HLL_RHO_CASE)).cast("bigint").alias("m_j")
        )

    def merge(batch: DataFrame, batch_id: int) -> None:
        regs = batch_regs(batch)
        if state["path"] is not None:
            cur = spark.read.parquet(state["path"])
            t, s = cur.alias("t"), regs.alias("s")
            regs = t.join(
                s, F.col("t.j") == F.col("s.j"), "full_outer"
            ).select(
                F.coalesce(F.col("t.j"), F.col("s.j")).alias("j"),
                F.greatest(
                    F.coalesce(F.col("t.m_j"), F.lit(0).cast("bigint")),
                    F.coalesce(F.col("s.m_j"), F.lit(0).cast("bigint")),
                ).alias("m_j"),
            )
        new_path = str(base / f"v{batch_id}")
        regs.coalesce(1).write.mode("overwrite").parquet(new_path)
        state["path"] = new_path

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", str(base / "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final_path = state["path"]
    if final_path is None:
        # zero micro-batches (empty/absent events spool): seed an empty
        # register table so the grid join below still emits the 256
        # zero registers the oracle's coalesce(0) path produces
        final_path = str(base / "v_empty")
        spark.createDataFrame([], "j BIGINT, m_j BIGINT").coalesce(
            1
        ).write.mode("overwrite").parquet(final_path)
    for child in base.iterdir():
        if str(child) != final_path:
            shutil.rmtree(child, ignore_errors=True)
    # the surviving v{batch_id} dir outlives the query (the returned
    # DataFrame reads it lazily); reap it at interpreter exit — the
    # dead-pid sweep above covers crashes
    import atexit

    atexit.register(shutil.rmtree, str(base), ignore_errors=True)
    regs = spark.read.parquet(final_path)
    from ..catalog import Tables

    t = Tables(spark, sf_dir)
    grid = spark.range(_HLL_M).select(F.col("id").alias("j"))
    full_regs = grid.join(F.broadcast(regs), "j", "left").select(
        "j",
        F.coalesce(F.col("m_j"), F.lit(0)).cast("bigint").alias("m_j"),
    )
    summary = full_regs.agg(
        F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("v_empty"),
        F.sum(
            F.expr(
                "CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), "
                "CAST(m_j AS INT)) AS DOUBLE)"
            )
        ).alias("z_sum"),
    )
    exact = t.events.agg(
        F.countDistinct("event_id").cast("bigint").alias("n_exact")
    )
    return (
        full_regs.crossJoin(F.broadcast(summary))
        .crossJoin(F.broadcast(exact))
        .select(
            "j", "m_j", "v_empty", "z_sum",
            (F.lit(float(_HLL_ALPHA_M2)) / F.col("z_sum")).alias("hll_est"),
            "n_exact",
        )
    )
