"""Training-data-pipeline text transforms over ``documents``.

The operations a 100 TB pretraining pipeline runs after dedup/quality
filtering: fixed-size token chunking with overlap (the tokenize-and-pack
shape), pattern scrubbing/masking, and deterministic content-hash sampling
(reproducible across runs/engines — no rand(), so lineage recomputation and
the DuckDB oracle both agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.text import tokens
from ..registry import register

CHUNK_TOKENS = 50
CHUNK_STRIDE = 40  # 10-token overlap


@register(
    "q_chunk_documents",
    oracle=f"""
        SELECT doc_id,
               CAST(i - 1 AS INTEGER) AS chunk_idx,
               array_to_string(w[(i-1)*{CHUNK_STRIDE}+1 :
                                 (i-1)*{CHUNK_STRIDE}+{CHUNK_TOKENS}], ' ')
                   AS chunk_text,
               CAST(least({CHUNK_TOKENS},
                          len(w) - (i-1)*{CHUNK_STRIDE}) AS INTEGER)
                   AS chunk_len
        FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), x -> x <> '')
                       AS w
            FROM documents
        ), UNNEST(range(1, CAST(ceil((greatest(len(w) - {CHUNK_TOKENS}, 0))
                                     / {CHUNK_STRIDE}.0) AS BIGINT) + 2))
               AS t(i)
        WHERE (i-1) * {CHUNK_STRIDE} < len(w)
    """,
    doc=f"Fixed-size token chunking ({CHUNK_TOKENS} tokens, stride "
        f"{CHUNK_STRIDE}): the tokenize-and-pack step of a pretraining "
        "pipeline, as pure array ops (no UDF).",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = tokens(F.col("text"))
    n_chunks = F.ceil(
        F.greatest(F.size("w") - F.lit(CHUNK_TOKENS), F.lit(0))
        / F.lit(float(CHUNK_STRIDE))
    ).cast("int") + 1
    docs = t.documents.select("doc_id", w.alias("w")).filter(F.size("w") > 0)
    chunks = docs.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).filter(F.col("chunk_idx") * CHUNK_STRIDE < F.size("w"))
    start = F.col("chunk_idx") * CHUNK_STRIDE
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", F.slice("w", start + 1, CHUNK_TOKENS))
        .alias("chunk_text"),
        F.least(F.lit(CHUNK_TOKENS), F.size("w") - start)
        .cast("int").alias("chunk_len"),
    )


@register(
    "q_mask_patterns",
    oracle="""
        SELECT c_custkey,
               regexp_replace(c_name, '[0-9]+', '<NUM>', 'g') AS name_masked,
               regexp_replace(c_name, 'Customer#0*', 'C', 'g') AS name_short,
               CAST(length(regexp_replace(c_name, '[^0-9]', '', 'g'))
                    AS INTEGER) AS n_digits
        FROM customer
    """,
    doc="Pattern scrubbing/masking (the PII-redaction shape): digit "
        "masking, prefix collapse, digit counting.",
)
def q_mask_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]+", "<NUM>").alias("name_masked"),
        F.regexp_replace("c_name", "Customer#0*", "C").alias("name_short"),
        F.length(F.regexp_replace("c_name", "[^0-9]", "")).alias("n_digits"),
    )


@register(
    "q_sample_deterministic",
    oracle="""
        SELECT doc_id, lang, substr(md5(text), 1, 2) AS bucket
        FROM documents
        WHERE substr(md5(text), 1, 2) < '29'
    """,
    doc="Deterministic content-hash Bernoulli sampling (~16%): md5-prefix "
        "threshold instead of rand(), so retries/lineage/the oracle all "
        "select the same rows.",
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bucket = F.substring(F.md5(F.col("text")), 1, 2)
    return (
        t.documents.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < "29")
    )


@register(
    "q_stratified_sample",
    oracle="""
        SELECT doc_id, lang
        FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY md5(text), doc_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY lang) AS n_lang
            FROM documents
        )
        WHERE rn <= CAST(ceil(n_lang * 0.2) AS BIGINT)
    """,
    doc="Stratified 20%-per-language sample, ordered by content hash "
        "(deterministic, proportional across strata).",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    w_rank = W.partitionBy("lang").orderBy(F.md5(F.col("text")), F.col("doc_id"))
    w_cnt = W.partitionBy("lang")
    return (
        t.documents.select(
            "doc_id",
            "lang",
            F.row_number().over(w_rank).cast("long").alias("rn"),
            F.count("*").over(w_cnt).alias("n_lang"),
        )
        .filter(F.col("rn") <= F.ceil(F.col("n_lang") * 0.2).cast("long"))
        .select("doc_id", "lang")
    )
