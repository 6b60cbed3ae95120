"""Stream-static enrichment + remaining reshape coverage.

Stream-static join (SURVEY §2.5 engine surface): the streaming events
replay joined against the static customer dim inside the micro-batch plan —
the canonical enrichment topology (dim broadcast per batch, no stream
repartition).

unpivot/posexplode: the reshape pair (SURVEY §2.9/F1 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register
from .relational import dsum
from .streaming_queries import _events_stream, run_bounded_stream


@register(
    "stream_static_enrich",
    oracle="""
        SELECT c_mktsegment, event_type, count(*) AS n
        FROM events JOIN customer ON c_custkey = user_id
        GROUP BY 1, 2
    """,
    doc="Stream-static join: streaming events enriched with the customer "
        "dim (broadcast inside each micro-batch), grouped counts; oracle "
        "is the bounded-batch equivalent.",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    static_dim = t.customer.select("c_custkey", "c_mktsegment")
    source = _events_stream(spark, sf_dir)

    def transform(df: DataFrame) -> DataFrame:
        return (
            df.join(
                F.broadcast(static_dim),
                F.col("c_custkey") == F.col("user_id"),
            )
            .groupBy("c_mktsegment", "event_type")
            .count()
        )

    result = run_bounded_stream(spark, source, transform, "complete", sf_dir=sf_dir)
    return result.select(
        "c_mktsegment", "event_type", F.col("count").alias("n")
    )


@register(
    "q_unpivot",
    oracle="""
        SELECT n_name, metric, CAST(value AS DOUBLE) AS value
        FROM (
            SELECT n_name,
                   CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
                       AS total_bal,
                   CAST(count(*) AS DOUBLE) AS n_cust,
                   CAST(max(c_acctbal) AS DOUBLE) AS max_bal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        )
        UNPIVOT (value FOR metric IN (total_bal, n_cust, max_bal))
    """,
    doc="UNPIVOT/melt: wide per-nation metrics to (nation, metric, value) "
        "long form.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    wide = (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            dsum("c_acctbal").alias("total_bal"),
            F.count("*").cast("double").alias("n_cust"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["total_bal", "n_cust", "max_bal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "q_posexplode",
    oracle="""
        SELECT doc_id,
               CAST(i - 1 AS INTEGER) AS pos,
               w[i] AS token
        FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), x -> x <> '')
                       AS w
            FROM documents
        ), UNNEST(range(1, len(w) + 1)) AS t(i)
        WHERE doc_id < 20
    """,
    doc="posexplode: tokens with their ordinal position (the "
        "UDTF-with-index shape).",
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    from ..functions.text import tokens

    return (
        t.documents.filter(F.col("doc_id") < 20)
        .select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token"))
    )
