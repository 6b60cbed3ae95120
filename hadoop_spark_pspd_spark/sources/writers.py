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
