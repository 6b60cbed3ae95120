"""Source readers (SURVEY §2.1).

S1 (recursive text-dir scan), S9 (parquet), plus CSV/JSONL — each a thin
declarative wrapper so Catalyst keeps pushdown/pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_text_dir(spark: SparkSession, path: str, recursive: bool = True) -> DataFrame:
    """Reference S1: all files under a dir as lines (run_fault_tests.py:28
    uses input.dir.recursive=true)."""
    return (
        spark.read.option("recursiveFileLookup", str(recursive).lower()).text(path)
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    reader = spark.read.option("sep", sep).option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Reference S5 shape: one JSON object per line (run_fault_tests.py:261)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def rate_source(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Reference S10: streaming test source without Kafka."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan: same pushdown/pruning contract as parquet."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Ingest opaque media files as (path, modificationTime, length,
    content: binary) — the entry point of the multimodal pipeline
    (operators/multimodal.py consumes the content column)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
