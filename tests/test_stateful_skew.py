"""Custom stateful streaming operator (T4) + skew-mitigation helpers."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.functions.skew import null_safe_key, salted_join
from hadoop_spark_pspd_spark.streaming.stateful import user_profile_stream


def test_stateful_user_profile_across_batches(spark, tmp_path):
    """State must survive micro-batch boundaries: two source files, the
    second batch's profile includes the first batch's events."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        '{"user_id":1,"ts":"2024-01-01T00:00:00","value":10.0}\n'
        '{"user_id":1,"ts":"2024-01-01T00:10:00","value":5.0}\n'
        '{"user_id":2,"ts":"2024-01-01T00:00:00","value":1.0}\n'
    )
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        user_profile_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("profiles")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # second batch arrives after the first query completed: restartable
    # state would need a checkpoint; here assert the one-batch fold first
    rows = {r["user_id"]: r for r in spark.sql("SELECT * FROM profiles").collect()}
    assert rows[1]["n_events"] == 2
    assert rows[1]["total_value"] == 15.0
    assert rows[1]["max_gap_s"] == 600.0
    assert rows[2]["n_events"] == 1

    # now a second file + a restarted query on the same checkpoint ->
    # state restored from the state store and folded forward (T5: the
    # engine-level analog of the reference's recovery story). The memory
    # sink can't recover from a checkpoint, so use foreachBatch->parquet.
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    src2 = tmp_path / "src2"
    src2.mkdir()

    def run_once():
        stream2 = (
            spark.readStream.schema(
                "user_id bigint, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .json(str(src2))
        )
        q = (
            user_profile_stream(stream2)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, _epoch: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    (src2 / "b1.json").write_text(
        '{"user_id":1,"ts":"2024-01-01T00:00:00","value":10.0}\n'
    )
    run_once()
    (src2 / "b2.json").write_text(
        '{"user_id":1,"ts":"2024-01-01T01:00:00","value":2.5}\n'
    )
    run_once()
    emissions = sorted(
        map(tuple, spark.read.parquet(out).collect()), key=lambda r: r[1]
    )
    # run 1 emitted (n=1, 10.0, gap 0); run 2 restored state and emitted
    # (n=2, 12.5, gap 3600)
    assert emissions[-1] == (1, 2, 12.5, 3600.0)
    assert emissions[0][1] == 1 and emissions[0][2] == 10.0


def test_salted_join_matches_plain_join(spark):
    big = spark.range(0, 10_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(5)], "k long, name string"
    )
    plain = big.join(small, "k").select("k", "v", "name")
    salted = salted_join(big, small, "k", salt_n=4).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_null_safe_key(spark):
    df = spark.createDataFrame(
        [(None,), ("a",), (None,)], "k string"
    ).select(null_safe_key("k").alias("nk"))
    vals = sorted(r["nk"] for r in df.collect())
    assert vals == ["__null__", "__null__", "a"]


def test_tws_user_profiles_match_legacy_api(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 successor API) must produce the
    same per-user profiles as applyInPandasWithState. The TWS runner needs
    a working protobuf package - absent in this image, so this skips there
    (implementation is real; see stateful._HAS_TWS)."""
    import pytest as _pytest

    from hadoop_spark_pspd_spark.streaming import stateful

    if not stateful._HAS_TWS:
        _pytest.skip("transformWithStateInPandas runner needs protobuf")

    from hadoop_spark_pspd_spark.operators.streaming_queries import (
        _events_stream,
        run_bounded_stream,
    )
    from hadoop_spark_pspd_spark.session import pin_session_conf

    pin_session_conf(spark)
    sf = "/root/testdata/sf0.001"
    legacy = run_bounded_stream(
        spark, _events_stream(spark, sf), stateful.user_profile_stream, "update"
    )
    tws = run_bounded_stream(
        spark,
        _events_stream(spark, sf),
        stateful.user_profile_stream_tws,
        "update",
    )
    assert sorted(map(tuple, legacy.collect())) == sorted(
        map(tuple, tws.collect())
    )


def test_stateful_query_on_rocksdb_state_store(spark, tmp_path):
    """The at-scale state backend: the same stateful query runs on the
    RocksDB state store provider (bounded state memory + changelog
    checkpointing on real clusters) and produces identical results to
    the default HDFS-backed provider."""
    import json as _json

    from hadoop_spark_pspd_spark.operators.streaming_queries import (
        run_bounded_stream,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    rows = [
        {"ts": f"2024-01-01T00:{m:02d}:00", "w": w}
        for m, w in enumerate(["a", "b", "a", "c", "a", "b"])
    ]
    (src_dir / "b.json").write_text("\n".join(_json.dumps(r) for r in rows))

    def counts(provider: str | None):
        if provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        source = spark.readStream.schema("ts timestamp, w string").json(
            str(src_dir)
        )
        res = run_bounded_stream(
            spark,
            source,
            lambda df: df.groupBy(F.window("ts", "2 minutes"), "w").count(),
            "complete",
        )
        return sorted(
            (r["window"]["start"].isoformat(), r["w"], r["count"])
            for r in res.collect()
        )

    rocks = counts(
        "org.apache.spark.sql.execution.streaming.state"
        ".RocksDBStateStoreProvider"
    )
    default = counts(None)
    assert rocks == default and len(rocks) == 6


def test_tws_query_falls_back_without_protobuf(spark, monkeypatch):
    """stream_user_profiles_tws must degrade to the
    applyInPandasWithState implementation (same oracle semantics) when
    the TWS runner is unavailable — e.g. a driver-built JVM that never
    saw the protobuf shim's PYTHONPATH."""
    from hadoop_spark_pspd_spark.registry import load_all
    from hadoop_spark_pspd_spark.streaming import stateful

    reg = load_all()
    monkeypatch.setattr(stateful, "_HAS_TWS", False)
    sf = "/root/testdata/sf0.001"
    got = sorted(
        map(tuple, reg["stream_user_profiles_tws"].fn(spark, sf).collect())
    )
    # the TWS variant runs on the oracle-mirrored user_id cohort; the
    # full-corpus twin restricted to that cohort must agree exactly
    from hadoop_spark_pspd_spark.operators.streaming_queries import _TWS_MOD

    want = sorted(
        tuple(r)
        for r in reg["stream_user_profiles"].fn(spark, sf).collect()
        if r["user_id"] % _TWS_MOD == 0
    )
    assert got == want
    assert got, "cohort must be non-empty at sf0.001"


def test_session_timer_tws_and_legacy_agree(spark, monkeypatch):
    """The TWS timer lane and the applyInPandasWithState fallback must
    emit the identical session set (both ms-floor watermark-gated)."""
    from hadoop_spark_pspd_spark.registry import load_all
    from hadoop_spark_pspd_spark.streaming import stateful

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    tws_rows = sorted(
        map(tuple, reg["stream_session_timers_tws"].fn(spark, sf).collect())
    )
    monkeypatch.setattr(stateful, "_HAS_TWS", False)
    legacy_rows = sorted(
        map(tuple, reg["stream_session_timers_tws"].fn(spark, sf).collect())
    )
    assert tws_rows == legacy_rows
    assert tws_rows, "fixture data must produce at least one closed session"


def test_type_counts_tws_and_fallback_agree(spark, monkeypatch):
    """The MapState lane and its composite-key applyInPandasWithState
    fallback must emit identical (user, type) totals."""
    from hadoop_spark_pspd_spark.registry import load_all
    from hadoop_spark_pspd_spark.streaming import stateful

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    tws = sorted(
        map(tuple, reg["stream_type_counts_tws"].fn(spark, sf).collect())
    )
    monkeypatch.setattr(stateful, "_HAS_TWS", False)
    fb = sorted(
        map(tuple, reg["stream_type_counts_tws"].fn(spark, sf).collect())
    )
    assert tws == fb
    assert tws, "cohort must be non-empty at sf0.001"


def test_recent_window_tws_and_fallback_agree(spark, monkeypatch):
    """The ListState lane and its flattened-ValueState fallback must
    emit identical last-K windows."""
    from hadoop_spark_pspd_spark.registry import load_all
    from hadoop_spark_pspd_spark.streaming import stateful

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    tws = sorted(
        map(tuple, reg["stream_recent_window_tws"].fn(spark, sf).collect())
    )
    monkeypatch.setattr(stateful, "_HAS_TWS", False)
    fb = sorted(
        map(tuple, reg["stream_recent_window_tws"].fn(spark, sf).collect())
    )
    assert tws == fb
    assert tws, "cohort must be non-empty at sf0.001"
    # every window is bounded by K and time-ordered
    for _, n_window, _, last_us, first_us in tws:
        assert 1 <= n_window <= stateful.RECENT_K
        assert first_us <= last_us
