"""SparkSession factory.

Mirrors the resource envelope the reference ran under (2 workers x 2 vcores,
YARN — cluster/config/yarn-site.xml:41-56) only in spirit: the engine is
cluster-agnostic and tuned for local[N] in tests while keeping every knob
that matters at 1000-executor scale (AQE, skew join handling, shuffle
partition sizing, Arrow for the Python boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "hadoop_spark_pspd_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    UTC session timezone is load-bearing: the DuckDB oracle compares
    timestamp-derived values as naive UTC.
    """
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    # local mode = one JVM: driver memory is the only memory knob that
    # matters. The 1 GB Spark default OOMs a 4 GB WordCount shuffle, but
    # oversizing hurts too (64g measured ~+30% wall on small queries from
    # GC behavior) — 16g handles the reference-scale corpus with headroom.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bytes-bound Arrow batching: giant-row mapInPandas inputs (the
        # near-dup screen ships two occupancy-capped vector blocks per
        # row — ~28 MB/row at d=768) OOM the 16g heap when the default
        # rows-bound batching (10k rows) builds one batch in memory;
        # 64 MB bounds the in-flight batch for any row width without
        # touching normal small-row batching (round-10 d=768 leg)
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(64 << 20))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def pin_session_conf(spark: SparkSession) -> SparkSession:
    """Pin the runtime confs the engine's oracle parity depends on.

    The driver may hand us a session it built itself; these are all
    runtime-settable and idempotent.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # a foreign session usually carries Spark's 200-partition default —
    # wrong at both ends (overhead at test scale, undersized at 100 TB);
    # size to the actual core count (streaming state ops don't get AQE
    # coalescing, so this matters beyond cosmetics)
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    # events.parquet stores ts as TIMESTAMP(NANOS) which Spark has no type
    # for; read as long and floor-truncate to micros (catalog.Tables.events),
    # matching DuckDB's truncating ns->us read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
