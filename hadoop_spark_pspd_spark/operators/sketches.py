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
        "distributed heavy-hitter algorithm, entirely in JVM built-ins: "
        "phase 1 groups exploded tokens by (spark_partition_id, word) — "
        "pid is constant within a partition, so the map-side partial "
        "aggregation reduces each partition to its exact local counts "
        "before anything moves — and keeps words with local share >= "
        "1/K (pigeonhole-complete candidate superset). Phase 2 exact-"
        "counts candidates only. No Python in the hot path: tokenization "
        "stays in whole-stage codegen instead of shipping every document "
        "through Arrow. For vocabularies that outgrow memory, phase 1's "
        "exact per-partition counts can be swapped for a Misra-Gries "
        "summary of k >> HH_K counters (the emit rule is unchanged since "
        "MG undercounts by at most N_p/k). Oracle is the direct "
        "GROUP BY / HAVING.",
    bench=True,
    tags=("sketch", "text"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # round-12: ONE corpus pass. The old shape re-tokenized the corpus
    # three times (candidate pass, grand-total pass, exact-recount
    # pass); every downstream number is derivable from the exact
    # per-(pid, word) local counts alone: n(word) = sum_p c_p and
    # grand_total = sum_p N_p, so phases 2 and 3 aggregate the
    # vocabulary-sized `local` table instead of rescanning documents.
    # The pre-explosion repartition parallelizes tokenize off the 1-2
    # input splits (shingles_exploded rationale); output is invariant
    # to the partitioning because candidates are a pigeonhole-complete
    # SUPERSET at any partitioning and the final filter is exact.
    toks_pid = t.documents.repartition(
        spark.sparkContext.defaultParallelism
    ).select(
        F.spark_partition_id().alias("pid"),
        words_exploded(F.lower("text")),
    )
    # lazy pin: three consumers (ptot, cands, the exact recount) would
    # otherwise re-run the tokenize+aggregate subtree per reference
    local = toks_pid.groupBy("pid", "word").agg(
        F.count("*").alias("c")
    ).localCheckpoint(eager=False)
    # per-partition token totals N_p, recovered from the local counts
    # themselves (no second scan); #partitions rows — broadcast.
    ptot = local.groupBy("pid").agg(F.sum("c").alias("np"))
    cands = (
        local.join(F.broadcast(ptot), "pid")
        .where(F.col("c") * HH_K >= F.col("np"))
        .select("word")
        .distinct()
    )
    total = ptot.agg(F.sum("np").alias("grand_total"))
    return (
        local.join(F.broadcast(cands), "word")
        .groupBy("word")
        .agg(F.sum("c").alias("n"))
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
    # The bloom-filter confs are session-wide; leaving them set (notably
    # applicationSideScanSizeThreshold=0) would inject runtime filters into
    # every later query's shuffle joins and make harness timings
    # order-dependent. Set them, bake this query's optimized plan (the
    # QueryExecution caches its optimizedPlan, so the injected filter
    # survives the restore — InjectRuntimeFilter is a logical-optimizer
    # rule and AQE's runtime re-planning never strips it), then restore.
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # lower the local-mode thresholds so the rule fires at test SFs
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    t = Tables(spark, sf_dir)
    urgent = t.orders.where(F.col("o_orderpriority") == "1-URGENT")
    df = (
        t.lineitem.join(urgent, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice").alias("revenue"),
        )
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df._jdf.queryExecution().optimizedPlan()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df


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


# Explicit Bloom filter with MEASURED false-positive rate — the
# hand-built sibling of the optimizer-injected runtime filter above:
# m = 2^16 bits, k = 4 hash functions, every position an
# md5-derandomized draw (two 52-bit draws per digest, chars 1-13 and
# 14-26 — the round-10 two-draws recipe), so both engines build the
# IDENTICAL filter and the observed FPR is hash-stable.
_BLOOM_M = 1 << 16
_BLOOM_K = 4


def _bloom_positions_sql(col: str) -> list[str]:
    """The 4 bit positions of a token, DuckDB side."""
    out = []
    for d in range(2):  # two digests: md5(tok||'0'), md5(tok||'1')
        for half in (1, 14):  # two 52-bit draws per digest
            out.append(
                f"CAST(CAST(('0x' || substr(md5({col} || '{d}'), {half}, 13)) "
                f"AS UBIGINT) % {_BLOOM_M} AS BIGINT)"
            )
    return out


def _bloom_positions(col) -> list:
    out = []
    for d in range(2):
        digest = F.md5(F.concat(col, F.lit(str(d))))
        for half in (1, 14):
            out.append(
                F.conv(F.substring(digest, half, 13), 16, 10)
                .cast("bigint") % _BLOOM_M
            )
    return out


@register(
    "sketch_bloom_fpr",
    oracle=f"""
        WITH tok AS (
            SELECT DISTINCT source, word FROM (
                SELECT source,
                       unnest(list_filter(
                           string_split_regex(lower(text),
                                              '[ \\t\\n\\r\\f]+'),
                           x -> x <> '')) AS word
                FROM documents)
        ), pos AS (
            SELECT source, word, unnest([
                {", ".join(_bloom_positions_sql("word"))}
            ]) AS p
            FROM tok
        ), bits AS MATERIALIZED (
            SELECT DISTINCT p FROM pos WHERE source = 'src0'
        ), probe AS (
            SELECT t.source, t.word,
                   count(b.p) AS hits,
                   max(CASE WHEN a.word IS NOT NULL THEN 1 ELSE 0 END)
                       AS in_a
            FROM pos t
            LEFT JOIN bits b ON b.p = t.p
            LEFT JOIN (SELECT DISTINCT word FROM tok
                       WHERE source = 'src0') a ON a.word = t.word
            WHERE t.source <> 'src0'
            GROUP BY t.source, t.word
        ), nb AS (
            SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM bits
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_probe,
               CAST(SUM(in_a) AS BIGINT) AS n_present,
               CAST(SUM(CASE WHEN hits = {_BLOOM_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pass,
               CAST(SUM(CASE WHEN hits = {_BLOOM_K} AND in_a = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
               CAST(SUM(CASE WHEN hits = {_BLOOM_K} AND in_a = 0
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / (CASE WHEN count(*) - SUM(in_a) = 0 THEN 1
                           ELSE count(*) - SUM(in_a) END)
                   AS fpr_observed,
               (SELECT n_bits_set FROM nb) AS n_bits_set,
               power(CAST((SELECT n_bits_set FROM nb) AS DOUBLE)
                     / {_BLOOM_M}, {_BLOOM_K}) AS fpr_analytic
        FROM probe
        GROUP BY source
    """,
    doc="Explicit Bloom-filter semi-join screen with MEASURED accuracy: "
        "build an m=2^16-bit, k=4 filter over src0's distinct tokens "
        "(every bit an md5-derandomized draw, identical cross-engine), "
        "probe every other source's tokens, and report pass/"
        "false-positive counts, the observed FPR, and the analytic "
        "(bits_set/m)^k bound (bits_set/2^16 is an exact dyadic, the "
        "power three correctly-rounded multiplies). The filter is "
        "position-set-sized (<= 2^16 rows) so the build broadcasts at "
        "any corpus scale; probes are one explode (x4) + one broadcast "
        "join + one aggregate — the hand-built sibling of Spark's "
        "InjectRuntimeFilter shown in q_runtime_filter_join.",
    tags=("sketch", "dedup"),
)
def sketch_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    sc = spark.sparkContext
    tok = (
        t.documents.repartition(sc.defaultParallelism)
        .select(
            "source",
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower("text"), "[ \t\n\r\f]+"),
                        lambda x: x != F.lit(""),
                    )
                )
            ).alias("word"),
        )
        .distinct()
    )
    pos_arr = F.array(*_bloom_positions(F.col("word")))
    pos = tok.select("source", "word", F.explode(pos_arr).alias("p"))
    bits = (
        pos.where(F.col("source") == "src0").select("p").distinct().cache()
    )
    n_bits = bits.count()
    a_words = (
        tok.where(F.col("source") == "src0")
        .select(F.col("word").alias("aw"))
        .distinct()
    )
    probe = (
        pos.where(F.col("source") != "src0")
        .join(
            F.broadcast(bits.withColumn("hit", F.lit(1))), "p", "left"
        )
        .groupBy("source", "word")
        .agg(F.coalesce(F.sum("hit"), F.lit(0)).alias("hits"))
        .join(
            F.broadcast(a_words),
            F.col("word") == F.col("aw"),
            "left",
        )
        .select(
            "source",
            "hits",
            F.when(F.col("aw").isNotNull(), 1).otherwise(0).alias("in_a"),
        )
    )
    passed = F.col("hits") == _BLOOM_K
    fp = passed & (F.col("in_a") == 0)
    return probe.groupBy("source").agg(
        F.count("*").alias("n_probe"),
        F.sum("in_a").cast("bigint").alias("n_present"),
        F.sum(F.when(passed, 1).otherwise(0)).cast("bigint").alias("n_pass"),
        F.sum(F.when(fp, 1).otherwise(0)).cast("bigint").alias("n_false_pos"),
        (
            # zero-guard IDENTICALLY cross-engine (round-5 rule 5):
            # a source fully contained in src0 has no negatives
            F.sum(F.when(fp, 1).otherwise(0)).cast("double")
            / F.when(
                F.count("*") - F.sum("in_a") == 0, F.lit(1)
            ).otherwise(F.count("*") - F.sum("in_a"))
        ).alias("fpr_observed"),
        F.lit(n_bits).cast("bigint").alias("n_bits_set"),
        F.pow(F.lit(n_bits).cast("double") / _BLOOM_M, _BLOOM_K).alias(
            "fpr_analytic"
        ),
    )
