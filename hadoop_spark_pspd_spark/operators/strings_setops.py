"""Remaining string-function family + multiset set operations."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register


@register(
    "q_string_extras",
    oracle="""
        SELECT c_custkey,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
               split_part(c_name, '#', 1) AS name_prefix,
               reverse(c_mktsegment) AS seg_rev,
               repeat(substr(c_mktsegment, 1, 1), 3) AS initials,
               CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
               starts_with(c_mktsegment, 'A') AS seg_a,
               regexp_replace(c_name, '[0-9]+', 'N', 'g') AS name_masked,
               left(c_mktsegment, 4) AS seg_head,
               right(c_mktsegment, 2) AS seg_tail
        FROM customer
    """,
    doc="String family extras: lpad/split_part/reverse/repeat/instr/"
        "startswith/regexp_replace/left/right.",
)
def q_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_prefix"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("initials"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.startswith(F.col("c_mktsegment"), F.lit("A")).alias("seg_a"),
        F.regexp_replace("c_name", "[0-9]+", "N").alias("name_masked"),
        F.substring("c_mktsegment", 1, 4).alias("seg_head"),
        F.col("c_mktsegment").substr(
            F.length("c_mktsegment") - 1, F.lit(2)
        ).alias("seg_tail"),
    )


@register(
    "q_multiset_ops",
    oracle="""
        WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45),
             b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_discount > 0.08)
        SELECT 'intersect_all' AS op, count(*) AS n
            FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
        UNION ALL
        SELECT 'except_all' AS op, count(*) AS n
            FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    """,
    doc="Multiset INTERSECT ALL / EXCEPT ALL (bag semantics, not distinct).",
)
def q_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    a = t.lineitem.filter(F.col("l_quantity") > 45).select(
        F.col("l_suppkey").alias("k")
    )
    b = t.lineitem.filter(F.col("l_discount") > 0.08).select(
        F.col("l_suppkey").alias("k")
    )

    def tagged(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(
            F.lit(tag).alias("op"), F.col("n")
        )

    return tagged(a.intersectAll(b), "intersect_all").unionAll(
        tagged(a.exceptAll(b), "except_all")
    )


@register(
    "q_fuzzy_nearest_name",
    oracle="""
        WITH q AS (
            SELECT c_custkey AS qk, c_name AS qn
            FROM customer WHERE c_custkey < 100
        ), pairs AS (
            SELECT qk, c_custkey AS ck, levenshtein(qn, c_name) AS d
            FROM q JOIN customer ON c_custkey <> qk
        ), ranked AS (
            SELECT qk, ck, d,
                   row_number() OVER (PARTITION BY qk ORDER BY d, ck) AS rk
            FROM pairs
        )
        SELECT qk, ck, d FROM ranked WHERE rk = 1
    """,
    doc="Entity-resolution primitive: nearest other customer name by "
        "levenshtein edit distance for a query slice (unit costs in both "
        "engines; integer distances, custkey tie-break). The slice "
        "broadcasts; the corpus is scanned once - the same shape LSH "
        "blocking would feed at 100 TB.",
)
def q_fuzzy_nearest_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    q = t.customer.filter(F.col("c_custkey") < 100).select(
        F.col("c_custkey").alias("qk"), F.col("c_name").alias("qn")
    )
    pairs = (
        # pre-explosion repartition (CLAUDE.md r6 §2): the customer
        # parquet arrives as ONE input split, so the broadcast
        # nested-loop join — and with it every levenshtein evaluation
        # (|q| x |customer| of them, the real cost of this query) —
        # would run on a single task
        t.customer.select("c_custkey", "c_name")
        .repartition(spark.sparkContext.defaultParallelism)
        .join(F.broadcast(q), F.col("c_custkey") != F.col("qk"))
        .select(
            "qk",
            F.col("c_custkey").alias("ck"),
            F.levenshtein("qn", "c_name").cast("long").alias("d"),
        )
    )
    # argmin per query key as a MIN over the lexicographic (d, ck)
    # struct: identical row to row_number(ORDER BY d, ck) = 1 (both
    # integers, ck unique), but the aggregate does map-side partial
    # reduction — the exchange carries ~|q| rows instead of shuffling
    # and sorting the full |q| x |customer| pair stream under a window
    # (guide §2.3 "aggregate before you shuffle")
    return (
        pairs.groupBy("qk")
        .agg(F.min(F.struct("d", "ck")).alias("m"))
        .select("qk", F.col("m.ck").alias("ck"), F.col("m.d").alias("d"))
    )


@register(
    "q_name_blocking_er",
    oracle="""
        WITH vars AS (
            SELECT c_custkey AS k, c_name AS n,
                   unnest(list_append(
                       list_transform(range(1, length(c_name) + 1),
                           i -> substr(c_name, 1, CAST(i - 1 AS INTEGER))
                                || substr(c_name, CAST(i + 1 AS INTEGER))),
                       c_name)) AS v
            FROM customer WHERE c_custkey % 4 = 1
        ),
        cand AS (
            SELECT DISTINCT a.k AS key_a, b.k AS key_b,
                            a.n AS na, b.n AS nb
            FROM vars a JOIN vars b ON a.v = b.v AND a.k < b.k
        )
        SELECT key_a, key_b,
               CAST(levenshtein(na, nb) AS BIGINT) AS d
        FROM cand
        WHERE levenshtein(na, nb) <= 1
    """,
    doc="Corpus-vs-corpus entity resolution (deterministic 1-in-4 key "
        "sample of the corpus in both engines — synthetic TPC-H names "
        "differ by single digits, so the unsampled near-pair OUTPUT was "
        "262k rows of hash-compare wall) with FastSS "
        "deletion-neighborhood blocking: every name generates its "
        "1-deletion variants (plus itself); two strings within edit "
        "distance 1 MUST share a variant, so candidates come from one "
        "hash equi-join on the variant key — O(n*L) blocking rows, "
        "never the O(n^2) cross join — then exact levenshtein verifies. "
        "Complete by the FastSS property for threshold 1; thresholds "
        "k >= 2 generalize via k-deletion neighborhoods or PassJoin "
        "segment pigeonholing (same join shape, bigger neighborhoods). "
        "Complements q_fuzzy_nearest_name, whose query slice broadcasts.",
    tags=("dedup", "strings"),
)
def q_name_blocking_er(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    n = F.col("c_name")
    dels = F.transform(
        F.sequence(F.lit(1), F.length(n)),
        lambda i: F.concat(
            n.substr(F.lit(1), i - 1), n.substr(i + 1, F.length(n))
        ),
    )
    vars_df = t.customer.where(F.col("c_custkey") % 4 == 1).select(
        F.col("c_custkey").alias("k"),
        n.alias("n"),
        F.explode(F.array_append(dels, n)).alias("v"),
    )
    a = vars_df.alias("a")
    b = vars_df.alias("b")
    # dedup on the two INT keys only, then join the names back from the
    # (broadcastable) customer dim: distinct over (int, int) is 2.7x
    # cheaper than over the 4-wide (int, int, string, string) row, and
    # levenshtein runs once per DISTINCT pair (262k) instead of once
    # per raw candidate (1.45M) — measured 15 s -> ~6 s at sf0.1
    cand = (
        a.join(
            b,
            (F.col("a.v") == F.col("b.v")) & (F.col("a.k") < F.col("b.k")),
        )
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
        )
        .distinct()
    )
    names = t.customer.select(
        F.col("c_custkey"), F.col("c_name")
    )
    withnames = cand.join(
        F.broadcast(names.select(F.col("c_custkey").alias("key_a"),
                                 F.col("c_name").alias("na"))),
        "key_a",
    ).join(
        F.broadcast(names.select(F.col("c_custkey").alias("key_b"),
                                 F.col("c_name").alias("nb"))),
        "key_b",
    )
    d = F.levenshtein("na", "nb").cast("long")
    return withnames.where(d <= 1).select("key_a", "key_b", d.alias("d"))


@register(
    "q_golden_record",
    oracle="""
        WITH RECURSIVE vars AS (
            SELECT c_custkey AS k, c_name AS n,
                   c_nationkey AS nat, c_mktsegment AS seg,
                   unnest(list_append(
                       list_transform(range(1, length(c_name) + 1),
                           i -> substr(c_name, 1, CAST(i - 1 AS INTEGER))
                                || substr(c_name, CAST(i + 1 AS INTEGER))),
                       c_name)) AS v
            FROM customer WHERE c_custkey % 4 = 1
        ),
        cand AS (
            SELECT DISTINCT a.k AS key_a, b.k AS key_b
            FROM vars a JOIN vars b ON a.v = b.v AND a.k < b.k
             AND a.nat = b.nat AND a.seg = b.seg
            WHERE levenshtein(a.n, b.n) <= 1
        ),
        edges AS (
            SELECT key_a AS u, key_b AS v FROM cand
            UNION ALL
            SELECT key_b, key_a FROM cand
        ),
        reach(u, v) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        lab AS (SELECT u AS k, min(v) AS cluster_id FROM reach GROUP BY u),
        members AS (
            SELECT c.c_custkey,
                   coalesce(l.cluster_id, c.c_custkey) AS cluster_id,
                   c.c_acctbal, c.c_nationkey
            FROM customer c LEFT JOIN lab l ON c.c_custkey = l.k
        ),
        golden AS (
            SELECT cluster_id,
                   count(*) AS n_members,
                   max(c_acctbal) AS acctbal,
                   CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
            FROM members GROUP BY cluster_id
        )
        SELECT g.cluster_id, g.n_members, g.acctbal, g.n_nations,
               c.c_name AS name
        FROM golden g JOIN customer c ON g.cluster_id = c.c_custkey
    """,
    doc="Golden-record consolidation on top of FastSS entity resolution: "
        "match = edit-distance<=1 AND same nation AND same market "
        "segment (the attribute agreement keeps sequential serial-number "
        "names from transitively chaining the whole table into one "
        "cluster — a real ER rule, not just string distance); pairs "
        "come from deletion-neighborhood blocking (never O(n^2)) -> "
        "connected components via partition-local contraction CC -> "
        "one surviving record per entity cluster with deterministic "
        "survivorship rules (canonical key = min custkey, name from the "
        "canonical member, acctbal = exact MAX — a comparison, not an "
        "accumulation, so no decimal scaffolding — plus a distinct-"
        "nation conflict signal). Singletons survive as their own "
        "golden records, so output covers the full customer table. "
        "Oracle: recursive-CTE reachability over the identical pair "
        "SQL.",
    tags=("dedup", "strings"),
)
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.graph import min_label_components

    t = Tables(spark, sf_dir)
    n = F.col("c_name")
    dels = F.transform(
        F.sequence(F.lit(1), F.length(n)),
        lambda i: F.concat(
            n.substr(F.lit(1), i - 1), n.substr(i + 1, F.length(n))
        ),
    )
    vars_df = t.customer.where(F.col("c_custkey") % 4 == 1).select(
        F.col("c_custkey").alias("k"),
        n.alias("n"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.explode(F.array_append(dels, n)).alias("v"),
    )
    a, b = vars_df.alias("a"), vars_df.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.v") == F.col("b.v"))
            & (F.col("a.k") < F.col("b.k"))
            & (F.col("a.nat") == F.col("b.nat"))
            & (F.col("a.seg") == F.col("b.seg")),
        )
        .filter(F.levenshtein(F.col("a.n"), F.col("b.n")) <= 1)
        .select(
            F.col("a.k").alias("key_a"), F.col("b.k").alias("key_b")
        )
        .distinct()
    )
    edges = pairs.union(
        pairs.select(F.col("key_b"), F.col("key_a"))
    ).toDF("u", "v").cache()
    labels = min_label_components(edges).select(
        F.col("node").alias("c_custkey"), F.col("label")
    )
    members = (
        t.customer.select("c_custkey", "c_acctbal", "c_nationkey")
        .join(labels, "c_custkey", "left")
        .select(
            F.coalesce(F.col("label"), F.col("c_custkey"))
            .alias("cluster_id"),
            "c_acctbal", "c_nationkey",
        )
    )
    golden = members.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.max("c_acctbal").alias("acctbal"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )
    return golden.join(
        t.customer.select(
            F.col("c_custkey").alias("cluster_id"),
            F.col("c_name").alias("name"),
        ),
        "cluster_id",
    ).select("cluster_id", "n_members", "acctbal", "n_nations", "name")
