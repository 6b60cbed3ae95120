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
