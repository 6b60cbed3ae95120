"""Synthetic data generators (reference S8 parity).

generate_wordcount_data.sh:12-18 writes FILES x LINES_PER_FILE lines of a
fixed 10-word Portuguese vocabulary + per-file idxNN + per-line linhaN
varying tokens. Restated declaratively: spark.range + format_string —
fully distributed, no driver-side row materialization, so it scales to any
corpus size the cluster can hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the reference's fixed vocabulary (generate_wordcount_data.sh:15)
FIXED_VOCAB = (
    "hadoop tolerancia falhas desempenho wordcount texto "
    "dados processamento throughput latencia"
)


def synthetic_wordcount_corpus(
    spark: SparkSession,
    files: int = 12,
    lines_per_file: int = 3_000_000,
    partitions: int | None = None,
) -> DataFrame:
    """One row per line: '<vocab> idxNN linhaN' — the reference's exact
    line shape (defaults mirror FILES=12, LINES_PER_FILE=3000000)."""
    total = files * lines_per_file
    n_parts = partitions or spark.sparkContext.defaultParallelism
    return spark.range(0, total, 1, n_parts).select(
        F.format_string(
            f"{FIXED_VOCAB} idx%02d linha%d",
            (F.col("id") / lines_per_file).cast("int"),
            (F.col("id") % lines_per_file).cast("int"),
        ).alias("value")
    )


def expected_corpus_stats(files: int, lines_per_file: int) -> dict:
    """The invariants the reference's counters encode
    (reports/fault_test_20251115-184204.job.log:153-154,163)."""
    total_lines = files * lines_per_file
    vocab_n = len(FIXED_VOCAB.split())
    return {
        "lines": total_lines,
        "tokens": total_lines * (vocab_n + 2),
        "distinct_words": vocab_n + files + lines_per_file,
    }


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource: the same corpus as a NATIVE pluggable source —
# `spark.read.format("pspd_corpus").option("files", 12).load()`. One input
# partition per reference file (the reference's 12-file layout is the
# partitioning), rows generated in-executor, no disk staging.
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _CorpusReader(DataSourceReader):
        def __init__(self, options):
            self.files = int(options.get("files", 12))
            self.lines = int(options.get("lines_per_file", 1000))

        def partitions(self):
            return [InputPartition(i) for i in range(self.files)]

        def read(self, partition):
            f = partition.value
            for line in range(self.lines):
                yield (f"{FIXED_VOCAB} idx{f:02d} linha{line}",)

    class CorpusDataSource(DataSource):
        """format('pspd_corpus'): generate_wordcount_data.sh as a source."""

        @classmethod
        def name(cls) -> str:
            return "pspd_corpus"

        def schema(self) -> str:
            return "value string"

        def reader(self, schema):
            return _CorpusReader(self.options)

    HAS_PY_DATASOURCE = True
except ImportError:  # pragma: no cover - Spark < 4
    HAS_PY_DATASOURCE = False


def register_corpus_source(spark: SparkSession) -> None:
    """Idempotently register the pspd_corpus format on the session."""
    if HAS_PY_DATASOURCE:
        spark.dataSource.register(CorpusDataSource)
