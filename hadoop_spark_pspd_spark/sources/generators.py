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
