"""Multi-format source/sink roundtrip (S-surface breadth).

The reference's estate is HDFS text + parquet (run_fault_tests.py:120,
docs/README.md:257 for the Kafka JSON path); a migrating estate also
holds CSV, JSONL, and ORC. This registers an end-to-end proof that a
table survives a write+read roundtrip through every interchange format
bit-identically: value-bearing aggregates of each roundtripped copy must
hash-match the parquet original. CSV/JSON carry doubles as text — Spark
writes shortest-roundtrip reprs and parses them back to the identical
bits, which is exactly the engine's cross-engine float convention
applied to its own sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register

_FORMATS = ("csv", "json", "orc")


def _roundtrip_base(sf_dir: str) -> str:
    """Per-invocation unique scratch base (ADVICE r03: a fixed shared
    /tmp path let concurrent sessions collide mid-overwrite and leaked
    across runs). mkdtemp is unique per call; the caller removes it once
    the aggregates are materialized."""
    import tempfile
    from pathlib import Path

    tag = Path(sf_dir).name.replace(".", "_")
    return tempfile.mkdtemp(prefix=f"pspd_roundtrip_{tag}_")


@register(
    "q_multiformat_roundtrip",
    oracle="""
        WITH agg AS (
            SELECT COUNT(*) AS n_rows,
                   COUNT(DISTINCT o_orderkey) AS n_keys,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS total_rev
            FROM orders
        )
        SELECT 'csv' AS fmt, n_rows, n_keys, total_rev FROM agg
        UNION ALL
        SELECT 'json', n_rows, n_keys, total_rev FROM agg
        UNION ALL
        SELECT 'orc', n_rows, n_keys, total_rev FROM agg
    """,
    doc="Write the orders table to CSV, JSONL, and ORC sinks, read each "
        "back (explicit schema for the text formats), and aggregate "
        "every copy — counts, key cardinality, and the exact-decimal "
        "revenue total must be IDENTICAL to the parquet original for all "
        "three, proving lossless serialization (text formats round-trip "
        "doubles through shortest-repr strings). Each roundtrip is one "
        "write + one scan; the per-format aggregates are independent "
        "single-pass partial+final aggregations.",
    tags=("sources",),
)
def q_multiformat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    from pathlib import Path

    from ..sources.writers import write_jsonl, write_orc

    t = Tables(spark, sf_dir)
    orders = t.orders
    schema = orders.schema

    base = _roundtrip_base(sf_dir)
    csv_dir, json_dir, orc_dir = (str(Path(base) / f) for f in _FORMATS)

    try:
        (
            orders.write.mode("overwrite")
            .option("header", True)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .csv(csv_dir)
        )
        write_jsonl(orders, json_dir)
        write_orc(orders, orc_dir)

        readers = {
            "csv": spark.read.schema(schema)
            .option("header", True)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .csv(csv_dir),
            "json": spark.read.schema(schema).json(json_dir),
            "orc": spark.read.orc(orc_dir),
        }

        out: DataFrame | None = None
        for fmt in _FORMATS:
            agg = readers[fmt].agg(
                F.count("*").alias("n_rows"),
                F.countDistinct("o_orderkey").alias("n_keys"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("total_rev"),
            ).select(F.lit(fmt).alias("fmt"), "n_rows", "n_keys", "total_rev")
            out = agg if out is None else out.unionAll(agg)
        # materialize the (3-row) aggregate BEFORE deleting the scratch
        # files the lazy plan reads from — the roundtrip I/O is the
        # operator's point; the localized result is constant-size
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_PRUNE_KEYS = ("1-URGENT", "5-LOW")


@register(
    "q_partition_pruning_scan",
    oracle=f"""
        WITH f AS (
            SELECT * FROM orders
            WHERE o_orderpriority IN ('{_PRUNE_KEYS[0]}',
                                      '{_PRUNE_KEYS[1]}')
        ), dirs AS (
            SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT)
                       AS n_part_dirs
            FROM f
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                         AS VARCHAR) AS DOUBLE) AS total_rev,
               max(d.n_part_dirs) AS n_part_dirs
        FROM f CROSS JOIN dirs d
        GROUP BY o_orderpriority
    """,
    doc="Hive-style partition pruning, proven end to end: orders is "
        "written to scratch PARTITIONED BY o_orderpriority, read back "
        "with an IN-list filter on the partition column, and the "
        "output carries n_part_dirs = the count of distinct partition "
        "directories the scan ACTUALLY touched (via input_file_name() "
        "— runtime evidence, not a plan claim; the matching static "
        "claim is pinned in test_plans.py as a non-empty "
        "PartitionFilters clause). At 100 TB partition pruning is the "
        "difference between scanning 2/5ths and 5/5ths of a table — "
        "this query fails its hash if pruning ever regresses to "
        "reading extra directories. Money aggregates follow the "
        "DECIMAL(18,4) convention; the 2-row aggregate is "
        "materialized before the scratch tree is deleted (the "
        "q_multiformat_roundtrip collect rule).",
    tags=("sources",),
)
def q_partition_pruning_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    t = Tables(spark, sf_dir)
    base = _roundtrip_base(sf_dir)
    try:
        (
            t.orders.write.mode("overwrite")
            .partitionBy("o_orderpriority")
            .parquet(base)
        )
        rd = spark.read.parquet(base).filter(
            F.col("o_orderpriority").isin(*_PRUNE_KEYS)
        )
        dirs = rd.select(
            F.regexp_extract(
                F.input_file_name(), "o_orderpriority=([^/]+)", 1
            ).alias("pdir")
        ).agg(F.countDistinct("pdir").cast("bigint").alias("n_part_dirs"))
        agg = (
            rd.groupBy("o_orderpriority")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.countDistinct("o_orderkey").cast("bigint")
                .alias("n_keys"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("total_rev"),
            )
            .crossJoin(F.broadcast(dirs))
            .select(
                "o_orderpriority", "n_rows", "n_keys", "total_rev",
                "n_part_dirs",
            )
        )
        rows = agg.collect()  # 2 rows — materialize before rmtree
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "q_schema_evolution",
    oracle="""
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<missing>'
                    ELSE o_orderpriority END AS prio,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_from_v1,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                         AS VARCHAR) AS DOUBLE) AS total_rev
        FROM orders
        GROUP BY 1
    """,
    doc="Schema evolution across parquet batches, proven end to end: "
        "batch v1 (even order keys) is written WITHOUT the "
        "o_orderpriority column, batch v2 (odd keys) WITH it; the "
        "union is read back through mergeSchema=true and aggregated by "
        "the evolved column with v1 rows surfacing as '<missing>' via "
        "coalesce. This is the append-only data-lake lifecycle every "
        "long-lived 100 TB table goes through — columns arrive "
        "mid-history and old files must keep reading as NULLs, not "
        "errors. The oracle reconstructs the same view from the "
        "original table with a parity CASE. Money follows the "
        "DECIMAL(18,4) convention; the 6-row aggregate materializes "
        "before scratch cleanup.",
    tags=("sources",),
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    from pathlib import Path

    t = Tables(spark, sf_dir)
    base = _roundtrip_base(sf_dir)
    try:
        v1 = t.orders.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        v2 = t.orders.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        )
        v1.write.mode("overwrite").parquet(str(Path(base) / "b1"))
        v2.write.mode("overwrite").parquet(str(Path(base) / "b2"))
        rd = spark.read.option("mergeSchema", True).parquet(
            str(Path(base) / "b1"), str(Path(base) / "b2")
        )
        agg = (
            rd.groupBy(
                F.coalesce(F.col("o_orderpriority"), F.lit("<missing>"))
                .alias("prio")
            )
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(
                    F.when(F.col("o_orderpriority").isNull(), 1)
                    .otherwise(0)
                ).cast("bigint").alias("n_from_v1"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("total_rev"),
            )
        )
        rows = agg.collect()  # <= 6 rows (5 priorities + '<missing>')
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_CSV_CORRUPT_MOD = 13


@register(
    "q_csv_corrupt_records",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows_read,
               CAST(SUM(CASE WHEN o_orderkey % {_CSV_CORRUPT_MOD} <> 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
               CAST(SUM(CASE WHEN o_orderkey % {_CSV_CORRUPT_MOD} = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
               CAST(CAST(SUM(CASE WHEN o_orderkey % {_CSV_CORRUPT_MOD}
                                       <> 0
                                  THEN CAST(o_totalprice
                                            AS DECIMAL(18,4)) END)
                         AS VARCHAR) AS DOUBLE) AS good_rev
        FROM orders
    """,
    doc="Malformed-record handling on a CSV source, proven end to end: "
        "order rows serialize to CSV lines with every "
        f"{_CSV_CORRUPT_MOD}th order's price replaced by a non-numeric "
        "token, and the read-back uses PERMISSIVE mode with "
        "columnNameOfCorruptRecord — the production posture where bad "
        "upstream rows must be QUARANTINED and counted, never dropped "
        "silently or allowed to kill a 100 TB ingest. The corrupt "
        "cohort must surface exactly (n_corrupt), parse NO price into "
        "the good aggregate, and leave the good-row revenue "
        "bit-identical to the parquet original (Spark writes "
        "shortest-roundtrip doubles and reparses the same bits — the "
        "q_multiformat_roundtrip convention). Single-row aggregate "
        "materialized before scratch cleanup.",
    tags=("sources",),
)
def q_csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    t = Tables(spark, sf_dir)
    base = _roundtrip_base(sf_dir)
    try:
        price_txt = F.when(
            F.col("o_orderkey") % _CSV_CORRUPT_MOD == 0, F.lit("oops")
        ).otherwise(F.col("o_totalprice").cast("string"))
        lines = t.orders.select(
            F.concat_ws(
                ",",
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                price_txt,
            ).alias("value")
        )
        lines.write.mode("overwrite").text(base)
        rd = (
            spark.read.schema(
                "o_orderkey long, o_custkey long, o_totalprice double, "
                "_corrupt string"
            )
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .csv(base)
        )
        agg = rd.agg(
            F.count("*").cast("bigint").alias("n_rows_read"),
            F.sum(F.when(F.col("_corrupt").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_good"),
            F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_corrupt"),
            F.sum(
                F.when(
                    F.col("_corrupt").isNull(),
                    F.col("o_totalprice").cast("decimal(18,4)"),
                )
            ).cast("double").alias("good_rev"),
        )
        rows = agg.collect()  # single summary row, then rmtree
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
