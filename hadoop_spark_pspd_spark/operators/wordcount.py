"""WordCount — the reference's entire batch surface, Spark-first.

Reference parity: Hadoop MapReduce WordCount invoked at
cluster/tools/run_fault_tests.py:26-30 (tokenize -> (word,1) -> combiner ->
shuffle -> sum -> key-sorted TSV). In Spark this is one declarative pipeline;
HashAggregateExec's partial/final split reproduces the map-side combiner
(the reference's 7x combine reduction, reports/fault_test_20251115-184204
.job.log:158-159) automatically, and the sort lands on the already-
aggregated (small) result.

The flagship variant runs over the ``documents`` table's text column; the
file variant (wordcount_text_dir) reproduces the reference's recursive
HDFS-dir scan (run_fault_tests.py:28, input.dir.recursive=true).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.text import words_exploded
from ..registry import register


def wordcount_df(text_df: DataFrame, text_col: str = "value") -> DataFrame:
    """scan -> explode(split) -> filter '' -> groupBy.count (SURVEY §3.1)."""
    return (
        text_df.select(words_exploded(text_col))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def wordcount_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """Recursive text-dir scan variant (reference S1 parity)."""
    lines = spark.read.option("recursiveFileLookup", "true").text(path)
    return wordcount_df(lines, "value")


def write_tsv(df: DataFrame, out: str) -> None:
    """Reference S2 parity: word\\tcount text sink, overwrite semantics
    (Spark's mode('overwrite') subsumes run_fault_tests.py:120's manual
    pre-delete)."""
    df.orderBy("word").write.mode("overwrite").option("sep", "\t").csv(out)


@register(
    "wc_words",
    oracle="""
        SELECT w AS word, count(*) AS cnt
        FROM (SELECT unnest(string_split_regex(text, '[ \\t\\n\\r\\f]+')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY w
    """,
    doc="Grouped word count over documents.text (reference A1).",
    bench=True,
)
def wc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return wordcount_df(t.documents, "text")


@register(
    "wc_top20",
    oracle="""
        SELECT w AS word, count(*) AS cnt
        FROM (SELECT unnest(string_split_regex(text, '[ \\t\\n\\r\\f]+')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY w
        ORDER BY cnt DESC, word
        LIMIT 20
    """,
    doc="Top-k words (reference O2: the spec'd word-cloud top-k).",
)
def wc_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        wordcount_df(t.documents, "text")
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )


@register(
    "wc_upper_words",
    oracle="""
        SELECT upper(w) AS word, count(*) AS cnt
        FROM (SELECT unnest(string_split_regex(text, '[ \\t\\n\\r\\f]+')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY upper(w)
    """,
    doc="Uppercased word count — the streaming pipeline's normalization "
        "(docs/README.md:257 'convertidas para maiúsculas') as batch.",
)
def wc_upper_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    words = t.documents.select(words_exploded("text"))
    return (
        words.select(F.upper("word").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
