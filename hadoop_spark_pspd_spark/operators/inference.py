"""Batch inference over the documents table via Pandas UDF.

The assignment spec's optional extension (docs/PSPD_LabHadoopSpark.pdf
p.2-3: neural models, e.g. sentiment analysis, over the stream) mapped to
the engine's Arrow-vectorized inference path (SURVEY §2.11). No model libs
in this container, so the "model" is a deterministic lexicon scorer — the
pipeline shape (pandas_udf, Arrow batches, no per-row py4j) is the real
deliverable, and the lexicon math keeps it oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..catalog import Tables
from ..registry import register
from .relational import dec

POSITIVE = ("fast", "big", "value")
NEGATIVE = ("slow", "small", "filter")

_SQL_TOKENS = "list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), x -> x <> '')"


def _sql_hits(words: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(w, x -> x IN ({in_list})))"


@F.pandas_udf(DoubleType())
def sentiment_score(texts: pd.Series) -> pd.Series:
    """Lexicon 'model': (pos_hits - neg_hits) / n_tokens per document.
    Stands in for real batch inference (same Arrow-batched call shape a
    transformer scorer would use)."""
    pos, neg = set(POSITIVE), set(NEGATIVE)

    def score(text: str) -> float:
        toks = [t for t in text.split() if t]
        if not toks:
            return 0.0
        p = sum(t in pos for t in toks)
        n = sum(t in neg for t in toks)
        return (p - n) / len(toks)

    return texts.map(score)


@register(
    "infer_sentiment",
    oracle=f"""
        SELECT doc_id,
               CAST({_sql_hits(POSITIVE)} - {_sql_hits(NEGATIVE)} AS DOUBLE)
                   / len(w) AS score,
               CASE WHEN {_sql_hits(POSITIVE)} > {_sql_hits(NEGATIVE)}
                        THEN 'positive'
                    WHEN {_sql_hits(POSITIVE)} < {_sql_hits(NEGATIVE)}
                        THEN 'negative'
                    ELSE 'neutral' END AS label
        FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents)
        WHERE len(w) > 0
    """,
    doc="Pandas-UDF batch inference (lexicon sentiment stand-in for the "
        "spec's neural-model extension). Arrow-vectorized; one Python "
        "round-trip per batch, not per row.",
)
def infer_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    scored = t.documents.select(
        "doc_id", sentiment_score(F.col("text")).alias("score")
    ).filter(F.length(F.trim("text")) > 0)
    label = (
        F.when(F.col("score") > 0, "positive")
        .when(F.col("score") < 0, "negative")
        .otherwise("neutral")
    )
    return scored.select("doc_id", "score", label.alias("label"))


@register(
    "q_cogroup_profile",
    oracle="""
        SELECT user_id,
               COALESCE(o.n_orders, 0) AS n_orders,
               COALESCE(o.total_spend, 0.0) AS total_spend,
               COALESCE(e.n_events, 0) AS n_events
        FROM (SELECT DISTINCT user_id FROM (
                  SELECT o_custkey AS user_id FROM orders
                  UNION ALL SELECT user_id FROM events))
        LEFT JOIN (
            SELECT o_custkey AS user_id, count(*) AS n_orders,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS total_spend
            FROM orders GROUP BY 1) o USING (user_id)
        LEFT JOIN (
            SELECT user_id, count(*) AS n_events
            FROM events GROUP BY 1) e USING (user_id)
    """,
    doc="Grouped COGROUP over two tables (SURVEY §2.11, the remaining "
        "pandas-API surface): orders and events cogrouped per customer "
        "key into one Arrow-batched pandas function that sees BOTH "
        "groups side by side - the per-key merge pattern (feature "
        "assembly, reconciliation) that a join + two aggs can't express "
        "when the merge logic is imperative. Here the merge IS two aggs, "
        "so the full-outer-join SQL oracles it exactly (decimal spend, "
        "int counts).",
)
def q_cogroup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    orders = t.orders.select(
        F.col("o_custkey").alias("user_id"),
        dec("o_totalprice").alias("price_dec"),
    )
    events = t.events.select("user_id")

    def merge(key: tuple, odf: pd.DataFrame, edf: pd.DataFrame):
        # decimal objects survive Arrow -> exact sum; cast to float once
        total = float(sum(odf["price_dec"], 0)) if len(odf) else 0.0
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_orders": [len(odf)],
                "total_spend": [total],
                "n_events": [len(edf)],
            }
        )

    return (
        orders.groupBy("user_id")
        .cogroup(events.groupBy("user_id"))
        .applyInPandas(
            merge,
            schema="user_id bigint, n_orders bigint, total_spend double, "
                   "n_events bigint",
        )
    )
