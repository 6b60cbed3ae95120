"""Sinks (SURVEY §2.1): TSV (reference parity), parquet (engine default),
JSONL (observability shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_tsv(df: DataFrame, path: str, sort_cols: list[str] | None = None) -> None:
    """Reference S2: word\\tcount text sink; mode('overwrite') subsumes the
    reference's manual pre-delete (run_fault_tests.py:120 — skipping it
    crashed the job, reports/fault_test_20251115-181827.job.log:2)."""
    out = df.sortWithinPartitions(*sort_cols) if sort_cols else df
    out.write.mode("overwrite").option("sep", "\t").csv(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Reference S5: one JSON object per line (run_fault_tests.py:235,261)."""
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink — the other columnar format large Hadoop-era estates hold;
    zlib default, schema preserved like parquet."""
    df.write.mode("overwrite").orc(path)


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    sort_col: str | None = None,
) -> int:
    """Small-files maintenance: rewrite a parquet directory into
    ~target-sized files (streaming sinks and over-parallel writers leave
    thousands of tiny files; at 100 TB the NameNode/listing cost and
    per-file open overhead dominate scans — periodic compaction is the
    standard fix). File count comes from the actual on-disk byte size;
    with ``sort_col`` the rewrite range-partitions on it so each output
    file covers a disjoint key range (min/max footer stats then prune
    scans — the poor man's clustering). Returns the output file count.

    No reference analog (its corpus is static HDFS files); this is
    engine-side data-layout tooling for the S6/S9 managed-storage path.
    """
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src)
    fs = p.getFileSystem(conf)
    n_bytes = fs.getContentSummary(p).getLength()
    n_files = max(1, math.ceil(n_bytes / target_file_bytes))
    df = spark.read.parquet(src)
    if sort_col:
        out = df.repartitionByRange(n_files, sort_col)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    return n_files
