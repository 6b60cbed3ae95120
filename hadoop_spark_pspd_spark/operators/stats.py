"""Statistical aggregates with cross-engine-exact formulations.

Built-in stddev/variance/corr accumulate in floating point with
engine-specific update orders (Welford vs two-pass vs naive) — never
hash-stable. Here the moments are derived from EXACT decimal sums
(sum, sum of squares, cross products), so both engines compute the same
doubles from the same exact integers-scaled-by-10^4, then apply one
deterministic arithmetic expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register
from .relational import dec


@register(
    "q_stats_moments",
    oracle="""
        SELECT o_orderpriority, n,
               s / n AS mean,
               (sq - s * s / n) / (n - 1) AS variance,
               sqrt((sq - s * s / n) / (n - 1)) AS stddev
        FROM (
            SELECT o_orderpriority,
                   count(*) AS n,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS s,
                   -- widen one operand: DuckDB's 18-digit x 18-digit
                   -- multiply stays in int64 and overflows on squares
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))
                                 * CAST(o_totalprice AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS sq
            FROM orders
            GROUP BY o_orderpriority
        )
    """,
    doc="Sample variance/stddev from exact decimal sums (engine-native "
        "stddev/var aggregates are accumulation-order-dependent and never "
        "hash-stable cross-engine).",
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("s"),
        F.sum(dec("o_totalprice") * dec("o_totalprice"))
        .cast("double").alias("sq"),
    )
    var = (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    return base.select(
        "o_orderpriority",
        "n",
        (F.col("s") / F.col("n")).alias("mean"),
        var.alias("variance"),
        F.sqrt(var).alias("stddev"),
    )


@register(
    "q_bitwise_agg",
    oracle="""
        SELECT o_orderpriority,
               CAST(bit_and(o_orderkey % 256) AS BIGINT) AS key_and,
               CAST(bit_or(o_orderkey % 256) AS BIGINT) AS key_or,
               CAST(bit_xor(o_orderkey % 256) AS BIGINT) AS key_xor
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Bitwise aggregate family (bit_and/bit_or/bit_xor) — order-"
        "independent, so exactly portable.",
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    k = (F.col("o_orderkey") % 256)
    return t.orders.groupBy("o_orderpriority").agg(
        F.bit_and(k).cast("bigint").alias("key_and"),
        F.bit_or(k).cast("bigint").alias("key_or"),
        F.bit_xor(k).cast("bigint").alias("key_xor"),
    )


@register(
    "q_regexp_extract_all",
    oracle="""
        SELECT p_partkey,
               array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',')
                   AS words,
               CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INTEGER)
                   AS n_words
        FROM part
    """,
    doc="regexp_extract_all: every match as an array (surfaced as a "
        "joined string for stable hashing).",
)
def q_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    matches = F.regexp_extract_all(F.col("p_name"), F.lit("[a-z]+"), 0)
    return t.part.select(
        "p_partkey",
        F.concat_ws(",", matches).alias("words"),
        F.size(matches).alias("n_words"),
    )
