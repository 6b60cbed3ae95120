"""Stream-stream join (watermarked, time-bounded) + bucketed shuffle-free
batch join — the two remaining join topologies."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_stream_stream_join_time_bounded(spark, tmp_path):
    """Two event streams joined on key within a +/-10min time bound —
    the watermarked stream-stream equi-join (state-store backed)."""
    left_dir = tmp_path / "left"
    right_dir = tmp_path / "right"
    left_dir.mkdir()
    right_dir.mkdir()
    (left_dir / "l.json").write_text(
        json.dumps({"k": 1, "lts": "2024-01-01T00:00:00", "lv": "a"})
        + "\n"
        + json.dumps({"k": 2, "lts": "2024-01-01T01:00:00", "lv": "b"})
    )
    (right_dir / "r.json").write_text(
        json.dumps({"k": 1, "rts": "2024-01-01T00:05:00", "rv": "x"})
        + "\n"
        + json.dumps({"k": 2, "rts": "2024-01-01T03:00:00", "rv": "y"})
    )
    left = (
        spark.readStream.schema("k long, lts timestamp, lv string")
        .json(str(left_dir))
        .withWatermark("lts", "1 hour")
    )
    right = (
        spark.readStream.schema("k long, rts timestamp, rv string")
        .json(str(right_dir))
        .withWatermark("rts", "1 hour")
    )
    joined = left.join(
        right,
        (left["k"] == right["k"])
        & (right["rts"] >= left["lts"] - F.expr("INTERVAL 10 MINUTES"))
        & (right["rts"] <= left["lts"] + F.expr("INTERVAL 10 MINUTES")),
    ).select(left["k"], "lv", "rv")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [tuple(r) for r in spark.sql("SELECT * FROM ss_join").collect()]
    # k=1 within 10min -> joins; k=2 is 2h apart -> excluded by time bound
    assert rows == [(1, "a", "x")]


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Bucketing both sides on the join key co-locates data at write time:
    the join plan has NO Exchange — the 100 TB repeated-join strategy
    (SURVEY §7: 'bucketing is the cluster-deploy step')."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # and it still answers correctly
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
