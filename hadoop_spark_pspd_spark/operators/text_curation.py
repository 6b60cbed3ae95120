"""Corpus-curation operators a training-data pipeline runs before
tokenization: repetition filtering (Gopher-style quality rule) and
benchmark decontamination (test-set overlap removal).

Both are pure built-in-expression plans over the ``documents`` table
(explode -> groupBy inverted index; no UDFs), shuffle-bounded and
broadcast-friendly: the decontamination benchmark side is tiny and
broadcasts, the corpus is scanned once. Cited per CLAUDE.md: the
reference has no analog (its corpus prep is
cluster/shared/generate_wordcount_data.sh) — these extend the engine's
north-star LLM-pipeline surface (SURVEY §7.1-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register
from ..functions.text import tokens, word_ngrams, word_shingles

REP_N = 2  # word-2-grams for repetition metrics
DUP_THRESHOLD = 0.5  # keep docs with duplicate-2-gram fraction <= 0.5
DECON_N = 4  # word-4-grams for decontamination overlap
BENCH_DOCS = 40  # doc_id < 40 plays the held-out benchmark set

_SHINGLE_SQL = """
    SELECT doc_id,
           unnest(list_transform(
               range(1, greatest(len(w) - {nm1}, 0) + 1),
               i -> array_to_string(w[i:i+{nm1}], ' '))) AS s
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                             x -> x <> '') AS w
          FROM documents)
"""


@register(
    "text_repetition_filter",
    oracle=f"""
        WITH sh AS ({_SHINGLE_SQL.format(nm1=REP_N - 1)}),
        per AS (
            SELECT doc_id, s, count(*) AS c FROM sh GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n2g,
               CAST(count(*) AS BIGINT) AS d2g,
               (CAST(SUM(c) AS BIGINT) - count(*))
                   / CAST(SUM(c) AS BIGINT) AS dup_ratio,
               max(c) / CAST(SUM(c) AS BIGINT) AS top_ratio,
               ((CAST(SUM(c) AS BIGINT) - count(*))
                   / CAST(SUM(c) AS BIGINT)) <= {DUP_THRESHOLD} AS keep
        FROM per GROUP BY doc_id
    """,
    doc="Gopher-style repetition quality rule: per-doc duplicate word-"
        "2-gram fraction and top-2-gram mass; keep docs under the "
        "duplication threshold. Exact integer counts, one division.",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    per = (
        t.documents.select(
            "doc_id",
            F.explode(word_ngrams(tokens(F.col("text")), REP_N)).alias("s"),
        )
        .groupBy("doc_id", "s")
        .agg(F.count("*").alias("c"))
    )
    n2g = F.sum("c").alias("n2g")
    agg = per.groupBy("doc_id").agg(
        n2g,
        F.count("*").alias("d2g"),
        F.max("c").alias("maxc"),
    )
    dup = (F.col("n2g") - F.col("d2g")) / F.col("n2g")
    return agg.select(
        "doc_id",
        "n2g",
        "d2g",
        dup.alias("dup_ratio"),
        (F.col("maxc") / F.col("n2g")).alias("top_ratio"),
        (dup <= DUP_THRESHOLD).alias("keep"),
    )


@register(
    "text_decontaminate",
    oracle=f"""
        WITH sh AS (
            SELECT DISTINCT doc_id, s
            FROM ({_SHINGLE_SQL.format(nm1=DECON_N - 1)})
        ),
        bench AS (
            SELECT DISTINCT s FROM sh WHERE doc_id < {BENCH_DOCS}
        ),
        hits AS (
            SELECT sh.doc_id, count(*) AS n_hits
            FROM sh JOIN bench ON sh.s = bench.s
            WHERE sh.doc_id >= {BENCH_DOCS}
            GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               coalesce(h.n_hits, 0) = 0 AS keep
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id >= {BENCH_DOCS}
    """,
    doc="Benchmark decontamination: drop corpus docs sharing any word-"
        "4-gram with the held-out set (docs 0..39 stand in). The bench "
        "shingle set is small -> broadcast join; corpus scanned once.",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    sh = t.documents.select(
        "doc_id",
        F.explode(
            word_shingles(tokens(F.col("text")), DECON_N)
        ).alias("s"),
    ).distinct()
    bench = (
        sh.filter(F.col("doc_id") < BENCH_DOCS).select("s").distinct()
    )
    hits = (
        sh.filter(F.col("doc_id") >= BENCH_DOCS)
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("h"))
    )
    corpus = t.documents.filter(F.col("doc_id") >= BENCH_DOCS).select("doc_id")
    return corpus.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("h"), F.lit(0)).alias("n_hits"),
        (F.coalesce(F.col("h"), F.lit(0)) == 0).alias("keep"),
    )
