"""Sketch-flavored and runtime-pruning operators.

Three patterns a 100 TB engine leans on when full shuffles stop being an
option:

  * heavy hitters with a partition-local candidate prune (the classic
    two-phase frequent-items algorithm): the full (word, count) shuffle is
    replaced by a candidate set provably complete by a pigeonhole argument,
    so shuffle volume is O(candidates), not O(vocabulary);
  * Spark's optimizer-injected runtime bloom filter (InjectRuntimeFilter),
    the declarative form of build-side->probe-side semi-join pruning;
  * fixed-width histogram binning, the O(1)-state profile every column
    profiler starts from.

All three have exact relational semantics, so each carries a plain-SQL
DuckDB oracle.
"""

from __future__ import annotations

import collections
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.text import words_exploded
from ..registry import register
from .relational import dsum

# A word is a "heavy hitter" when it carries at least 1/HH_K of all token
# occurrences. Relative thresholds pigeonhole partition-locally: if
# sum_p c_p >= (sum_p N_p) / K then c_p >= N_p / K in at least one
# partition — so pruning each partition at its own N_p/K keeps a provably
# complete candidate superset without knowing the global total.
HH_K = 30

_TOKS_ORACLE = """
        SELECT unnest(list_filter(
                   string_split_regex(lower(text), '[ \t\n\r\f]+'),
                   x -> x <> '')) AS word
        FROM documents
"""


_WS_RE = re.compile(r"[ \t\n\r\f]+")  # functions/text.WHITESPACE_RE


def _hh_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition exact counts; emit words with local share >= 1/HH_K.

    Receives (pre-lowered) DOCUMENTS, not exploded tokens: tokenizing
    inside the worker means Arrow ships one row per document instead of
    one per token — a 5-7x batch-transfer cut that is the difference at
    100 TB. The split is the same explicit char class as
    functions/text.tokens, and lowercasing stays JVM-side so both phases
    see byte-identical strings.

    The counter is bounded by the partition's distinct-word count. For
    vocabularies that outgrow executor heap, swap it for a Misra-Gries
    summary of k >> HH_K counters — the emit rule below is unchanged
    because MG undercounts by at most N_p/k.
    """
    counts: collections.Counter[str] = collections.Counter()
    total = 0
    for pdf in batches:
        for txt in pdf["text"]:
            toks = [t for t in _WS_RE.split(txt) if t]
            total += len(toks)
            counts.update(toks)
    cands = [w for w, c in counts.items() if c * HH_K >= total]
    yield pd.DataFrame({"word": pd.Series(cands, dtype="object")})


@register(
    "q_heavy_hitters",
    oracle=f"""
        WITH toks AS ({_TOKS_ORACLE})
        SELECT word, count(*) AS n
        FROM toks
        GROUP BY word
        HAVING count(*) * {HH_K} >= (SELECT count(*) FROM toks)
    """,
    doc="Frequent items (share >= 1/30 of all tokens) via the two-phase "
        "distributed heavy-hitter algorithm: partition-local candidate "
        "prune (pigeonhole-complete, mapInPandas), then exact counting of "
        "candidates only — the words shuffled are O(candidates), never "
        "O(vocabulary). Oracle is the direct GROUP BY / HAVING.",
    bench=True,
    tags=("sketch", "text"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    toks = t.documents.select(words_exploded(F.lower("text")))
    lowered = t.documents.select(F.lower("text").alias("text"))
    cands = (
        lowered.mapInPandas(_hh_candidates, schema="word string")
        .distinct()
    )
    total = toks.agg(F.count("*").alias("grand_total"))
    return (
        toks.join(F.broadcast(cands), "word")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(total))
        .where(F.col("n") * HH_K >= F.col("grand_total"))
        .select("word", "n")
    )


@register(
    "q_runtime_filter_join",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n_items,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                         AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY l_returnflag
    """,
    doc="Selective fact-dim join with Spark's optimizer-injected runtime "
        "bloom filter enabled (InjectRuntimeFilter): the urgent-orders "
        "build side seeds a bloom filter pushed into the lineitem scan, so "
        "non-matching rows die before the shuffle — the declarative "
        "equivalent of a hand-built semi-join prefilter. Semantics are the "
        "plain join, which is exactly what the oracle runs.",
    tags=("sketch", "join"),
)
def q_runtime_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    # lower the local-mode thresholds so the rule actually fires at test SFs
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    t = Tables(spark, sf_dir)
    urgent = t.orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        t.lineitem.join(urgent, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice").alias("revenue"),
        )
    )


@register(
    "q_histogram_bins",
    oracle="""
        SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
               count(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                         AS VARCHAR) AS DOUBLE) AS total
        FROM orders
        GROUP BY 1
    """,
    doc="Fixed-width histogram of order totals (25k-wide buckets): "
        "constant-space per-bucket state, one partial+final aggregation. "
        "The bucket id is floor() of one double division — identical IEEE "
        "arithmetic in both engines, so hash-stable without decimal hops.",
    tags=("sketch", "profile"),
)
def q_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy(
            F.floor(F.col("o_totalprice") / 25000).alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("total"),
        )
    )
