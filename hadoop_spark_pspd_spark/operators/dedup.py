"""Deduplication operators over ``documents`` (north-star surface, SURVEY §7.1-6).

Four tiers, all shuffle-friendly (no driver-side materialization):

  * exact        — hash-groupBy on content fingerprint; one shuffle.
  * ngram-jaccard — exact word-3-gram Jaccard via inverted-index self-join
                    (explode shingles, join on shingle, count common per pair).
                    Exact but O(sum of per-shingle df^2); the correctness
                    anchor for the approximate tiers.
  * minhash-lsh  — 32-perm MinHash signature derived map-side from the
                    per-doc shingle set (ONE shuffle for sketch+verify
                    state), 8x4 banding, bucket join for candidates,
                    exact-Jaccard verification of candidates only. The
                    100 TB scale path: candidate count is ~linear for
                    near-dup-sparse corpora. At the 0.8 threshold, band
                    recall is 1-(1-j^4)^8 (98.5% at j=0.80, ~1 for the
                    j≈0.98 planted dups), so its output equals the exact
                    query's — which is exactly what the shared oracle checks.
  * simhash      — 64-bit fingerprint, hamming<=3 pairs found via 4x16-bit
                    chunk banding (pigeonhole). Hash-dependent -> rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.hashing import (
    band_keys,
    hamming64,
    minhash_components_from_set,
    simhash64_md5,
)
from ..functions.text import normalized_text, tokens, word_shingles
from ..registry import register

SHINGLE_N = 3
JACCARD_THRESHOLD = 0.8
# 32 perms in 8 bands of 4: candidate recall at threshold j is
# 1-(1-j^4)^8 — 98.5% at j=0.80, ~1-1e-9 at the j>=0.97 planted dups.
# Candidates are exact-verified afterwards, so precision is always 1.
NUM_PERM = 32
BANDS = 8

_JACCARD_ORACLE = f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(w) - {SHINGLE_N - 1}, 0) + 1),
                       i -> array_to_string(w[i:i+{SHINGLE_N - 1}], ' '))) AS s
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                                     x -> x <> '') AS w
                  FROM documents))
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), pair_common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(c / (sa.n + sb.n - c), 6) AS jaccard
    FROM pair_common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE c / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
"""


def doc_shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, sh): each doc's DISTINCT word-3-gram shingle array,
    computed entirely MAP-SIDE (no explode + groupBy + collect_set
    round trip — guide §2.4), cached. Shingle-less docs are dropped by
    testing the TOKEN count BEFORE the projection: a filter on
    size(sh) pushes below the Project and re-evaluates the whole
    shingle build per row (the round-8 CollapseProject trap; measured
    0.8 -> 4.5 s at sf0.1). Array order is first-occurrence (vs
    collect_set's arbitrary order): every consumer must be
    order-invariant over the array (min-of-transform signatures,
    array_intersect/size)."""
    sc = docs.sparkSession.sparkContext
    toks = tokens(F.col("text"))
    return (
        docs.repartition(sc.defaultParallelism)
        .filter(F.size(toks) >= SHINGLE_N)
        .select(
            "doc_id",
            word_shingles(toks, SHINGLE_N).alias("sh"),
        )
        .cache()
    )


def shingles_exploded(docs: DataFrame) -> DataFrame:
    """(doc_id, s): one row per distinct word-3-gram shingle per document.

    Repartition first: a small parquet file arrives as ONE input split, and
    tokenize+shingle is CPU-bound — without the (cheap, pre-explosion)
    shuffle the whole stage runs on one core. At 100 TB input splits are
    plentiful and Catalyst elides the no-op repartition cost relative to
    the explode.
    """
    sc = docs.sparkSession.sparkContext
    return docs.repartition(sc.defaultParallelism).select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), SHINGLE_N)).alias("s"),
    )


def _exact_jaccard_pairs(exploded: DataFrame) -> DataFrame:
    """Jaccard for all co-shingled pairs via inverted-index self-join."""
    sizes = exploded.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "dedup_exact",
    oracle="""
        SELECT md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\r\\f]+', ' ', 'g')) AS fp,
               min(doc_id) AS keep_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on normalized-content fingerprint; "
        "keep lowest doc_id.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.documents.select(
            F.md5(normalized_text("text")).alias("fp"), "doc_id"
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
    doc="ANCHOR ONLY — do not use as the scale path; use "
        "dedup_allpairs_prefix. Exact word-3-gram Jaccard near-dup pairs "
        "(threshold 0.8) via inverted-index self-join: join volume is "
        "O(sum df^2), which degrades on high-df shingles at corpus scale.",
    tags=("anchor", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # the shingle table feeds three plan branches (sizes + both join sides);
    # cache it so tokenize/shingle runs once, not three times
    exploded = shingles_exploded(t.documents).cache()
    return _exact_jaccard_pairs(exploded)


@register(
    "dedup_minhash_lsh",
    oracle=_JACCARD_ORACLE,
    doc="MinHash(32)+LSH(8x4) candidate generation, exact-Jaccard verified. "
        "Shares the exact oracle: candidate recall 1-(1-j^4)^8 at Jaccard j "
        "(~1 for the planted j>=0.97 dups), and verification is exact.",
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # ZERO corpus shuffles for sketch + verify state (round-12): each
    # doc's distinct shingle set comes straight from word_shingles'
    # array — entirely map-side — instead of the explode + groupBy +
    # collect_set round trip, which shuffled every shingle string just
    # to rebuild the per-doc array (guide §2.4: remove shuffles
    # outright). Every consumer (array_min-of-transform signatures,
    # array_intersect/size verification) is ORDER-INVARIANT over the
    # array, so dropping collect_set's arbitrary order changes nothing.
    # The size>0 filter mirrors the old explode-drop of shingle-less
    # docs. The banding self-join and the pair-verification joins run
    # off this single cached relation; at scale the tiny candidate-pair
    # list broadcasts, so verification adds no extra shuffle of the
    # corpus. (The shingle-less-doc drop mirrors the old explode-drop;
    # load-bearing at scale — empty signatures would all band together
    # quadratically.)
    doc_sets = doc_shingle_sets(t.documents)
    sig = doc_sets.select(
        "doc_id", *minhash_components_from_set(F.col("sh"), NUM_PERM)
    )
    banded = sig.select("doc_id", *band_keys("mh", NUM_PERM, BANDS))
    # melt band columns -> (doc_id, band_idx, bh), then bucket self-join
    stack_expr = ", ".join(f"{b}, band{b}" for b in range(BANDS))
    melted = banded.selectExpr(
        "doc_id", f"stack({BANDS}, {stack_expr}) AS (band_idx, bh)"
    )
    a = melted.alias("a")
    b = melted.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    joined = candidates.join(
        doc_sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
        "doc_a",
    ).join(
        doc_sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
        "doc_b",
    )
    c = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = c / (F.size("sh_a") + F.size("sh_b") - c)
    return (
        joined.filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def _simhash_oracle() -> str:
    """DuckDB SQL recomputing the EXACT md5-derived simhash pipeline:
    64 per-bit vote sums (bits 0..51 from the first 13 md5 hex chars,
    52..63 from the next 3 — the conv/UBIGINT recipe, exact for k<=13),
    sign-packed into four 16-bit chunks, OR-of-chunk-equality candidate
    join, hamming = popcount over the four chunk XORs."""
    votes = ",\n               ".join(
        (
            f"SUM(CASE WHEN ((h1 >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
            if b < 52
            else
            f"SUM(CASE WHEN ((h2 >> {b - 52}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
        )
        for b in range(64)
    )
    chunks = ",\n               ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN v{16 * c + p} > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(16)
        )
        + f" AS BIGINT) AS c{c}"
        for c in range(4)
    )
    ham = " + ".join(f"bit_count(xor(a.c{c}, b.c{c}))" for c in range(4))
    chunk_eq = " OR ".join(f"a.c{c} = b.c{c}" for c in range(4))
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(
                       string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                       x -> x <> '')) AS tok
            FROM documents
        ), h AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(tok), 1, 13)) AS UBIGINT) AS h1,
                   CAST(('0x' || substr(md5(tok), 14, 3)) AS UBIGINT) AS h2
            FROM toks
        ), votes AS (
            SELECT doc_id,
               {votes}
            FROM h GROUP BY doc_id
        ), chunks AS (
            SELECT doc_id,
               {chunks}
            FROM votes
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST({ham} AS INTEGER) AS hamming
        FROM chunks a JOIN chunks b
          ON a.doc_id < b.doc_id AND ({chunk_eq})
        WHERE {ham} <= 3
    """


@register(
    "dedup_simhash",
    oracle=_simhash_oracle(),
    doc="SimHash-64 near-dup pairs at hamming<=3, candidates via 4x16-bit "
        "chunk banding (pigeonhole guarantees recall at the 3-bit "
        "radius). Bit-hashes are md5-derived (conv(substr(md5,1,13)) + "
        "the next 3 hex chars) instead of xxhash64 — same sketch "
        "quality, but byte-identical in DuckDB, so the whole pipeline "
        "is hash-matched by the oracle instead of rows-only.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    toks = t.documents.repartition(
        spark.sparkContext.defaultParallelism
    ).select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    sim = simhash64_md5(toks, "doc_id", "tok")
    chunks = sim.select(
        "doc_id",
        "simhash",
        *[
            F.shiftright("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF)).alias(f"c{c}")
            for c in range(4)
        ],
        # 8 consumers (4 band self-joins x 2 sides) otherwise re-run
        # the full per-token md5 simhash — 8 corpus scans in the plan
        # (round-7 technique 13); doc-count-sized, so the pin is ~free
    ).localCheckpoint(eager=False)
    cand = None
    for c in range(4):
        a = chunks.alias("a")
        b = chunks.alias("b")
        pairs = a.join(
            b,
            (F.col(f"a.c{c}") == F.col(f"b.c{c}"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        cand = pairs if cand is None else cand.unionAll(pairs)
    return (
        cand.distinct()
        .select(
            "doc_a",
            "doc_b",
            hamming64(F.col("sh_a"), F.col("sh_b")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )


@register(
    "dedup_incremental",
    oracle="""
        WITH fp AS (
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)),
                       '[ \\t\\n\\r\\f]+', ' ', 'g')) AS f,
                   doc_id % 5 = 4 AS is_new
            FROM documents
        ),
        existing AS (SELECT DISTINCT f FROM fp WHERE NOT is_new),
        batch AS (
            SELECT doc_id, f,
                   min(doc_id) OVER (PARTITION BY f) AS first_in_batch
            FROM fp WHERE is_new
        )
        SELECT b.doc_id, b.f AS fp,
               e.f IS NOT NULL AS dup_of_existing,
               e.f IS NULL AND b.doc_id = b.first_in_batch AS keep
        FROM batch b LEFT JOIN existing e ON b.f = e.f
    """,
    doc="Incremental-ingest exact dedup: a new batch (docs with "
        "doc_id %% 5 == 4 stand in for the day's arrivals) is deduped "
        "against the existing corpus by content fingerprint AND within "
        "itself (first batch doc per fingerprint wins). The existing "
        "side reduces to distinct fingerprints before the join — at "
        "100 TB that is the fingerprint index you keep between ingest "
        "runs, not a rescan; here both sides derive from the same table "
        "so one oracle covers the composition.",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    fp = t.documents.select(
        "doc_id",
        F.md5(normalized_text("text")).alias("f"),
        (F.col("doc_id") % 5 == 4).alias("is_new"),
    )
    existing = fp.filter(~F.col("is_new")).select("f").distinct()
    batch = fp.filter(F.col("is_new")).withColumn(
        "first_in_batch", F.min("doc_id").over(Window.partitionBy("f"))
    )
    return batch.join(
        existing.withColumnRenamed("f", "ef"),
        batch["f"] == F.col("ef"),
        "left",
    ).select(
        "doc_id",
        F.col("f").alias("fp"),
        F.col("ef").isNotNull().alias("dup_of_existing"),
        (F.col("ef").isNull() & (F.col("doc_id") == F.col("first_in_batch")))
        .alias("keep"),
    )


_CLUSTER_ORACLE = f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({_JACCARD_ORACLE}),
    edges AS MATERIALIZED (
        -- MATERIALIZED: the recursive closure re-evaluates its join
        -- input per iteration; inlined, the whole minhash pair query
        -- would re-run ~diameter times (round-4 inlining trap)
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u
"""


@register(
    "dedup_clusters",
    oracle=_CLUSTER_ORACLE,
    doc="Near-dup cluster assignment: connected components over the "
        "verified Jaccard>=0.8 pair graph via partition-local contraction "
        "CC (vectorized numpy hash-to-min per partition; shared nodes "
        "splice partitions; O(log) contraction levels, no diameter "
        "dependence — see functions/graph.min_label_components). Oracle: "
        "DuckDB recursive-CTE reachability closure. The keep-list for a "
        "dedup pipeline is then doc_id == cluster_id.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.graph import min_label_components

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").cache()
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).toDF("u", "v").cache()
    return min_label_components(edges).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _allpairs_prefix_stages(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(doc_sorted CACHED, distinct candidate pairs) — the shared
    prefix-filter pipeline, exposed so the scale protocol can count
    candidates vs verified survivors (round-8 verdict item 1)."""
    t = Tables(spark, sf_dir)
    # round-12: both explode consumers (the df aggregation and the
    # df-attach join) read the CACHED map-side shingle-array table —
    # before, the uncached tokenize+shingle+explode subtree ran twice
    # (two full corpus passes, visible as two Scan parquet + Generate
    # branches in plans/r12/dedup_allpairs_prefix_before.txt).
    exploded = doc_shingle_sets(t.documents).select(
        "doc_id", F.explode("sh").alias("s")
    )
    # global rarity order: (document frequency, shingle) is a total order,
    # no materialized rank needed
    df_tbl = exploded.groupBy("s").agg(F.count("*").alias("df"))
    with_df = exploded.join(df_tbl, "s")
    # cached: consumed 4x below (both prefix sides + both doc_set sides);
    # without it the whole explode->df-join->collect_list chain re-runs
    # per consumer. Session-scoped; verify/bench clear the cache per query.
    doc_sorted = with_df.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("df", "s"))).alias("sorted_sh")
    ).cache()
    n = F.size("sorted_sh")
    prefix_len = (n - F.ceil(F.lit(JACCARD_THRESHOLD) * n) + 1).cast("int")
    prefixes = doc_sorted.select(
        "doc_id",
        n.alias("n"),
        F.explode(F.slice("sorted_sh", F.lit(1), prefix_len)).alias("p"),
    ).select("doc_id", "n", F.col("p.s").alias("s"))
    a = prefixes.alias("a")
    b = prefixes.alias("b")
    # length filter (PPJoin): J(A,B) >= t forces t*max(|A|,|B|) <= min –
    # a cheap residual predicate on the hash join that drops candidates
    # whose sizes alone rule them out, before the distinct + verify join.
    len_ok = F.least(F.col("a.n"), F.col("b.n")) >= F.ceil(
        F.lit(JACCARD_THRESHOLD) * F.greatest(F.col("a.n"), F.col("b.n"))
    )
    candidates = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & len_ok,
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return doc_sorted, candidates



@register(
    "dedup_allpairs_prefix",
    oracle=_JACCARD_ORACLE,
    doc="Exact Jaccard near-dup pairs via AllPairs/PPJoin PREFIX FILTERING "
        "(Bayardo et al., WWW'07; public algorithm): order each doc's "
        "shingles by global rarity (df, s), index only the first "
        "n - ceil(t*n) + 1 of them - if J(A,B) >= t the two prefixes "
        "must share a shingle, so joining prefixes instead of full "
        "postings is lossless while cutting the candidate blow-up on "
        "common shingles. Candidates are then exact-verified on the "
        "cached full sets (same as the LSH tier). Same oracle as the "
        "naive inverted-index query - the point is identical output "
        "from a plan whose self-join input is ~5x smaller.",
    bench=True,
)
def dedup_allpairs_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc_sorted, candidates = _allpairs_prefix_stages(spark, sf_dir)
    doc_sets = doc_sorted.select(
        "doc_id",
        F.transform("sorted_sh", lambda x: x.s).alias("sh"),
    )
    joined = candidates.join(
        doc_sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
        "doc_a",
    ).join(
        doc_sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
        "doc_b",
    )
    c = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = c / (F.size("sh_a") + F.size("sh_b") - c)
    return joined.filter(jac >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


@register(
    "dedup_clusters_starcc",
    oracle=_CLUSTER_ORACLE,
    doc="Near-dup cluster assignment via alternating large-star/small-star "
        "contraction (Kiveris et al., SoCC'14) over the same verified "
        "Jaccard>=0.8 pair graph as dedup_clusters — identical output "
        "(same recursive-CTE oracle), different execution shape: the "
        "default path contracts inside numpy kernels and splices via "
        "shared nodes, while star contraction keeps every step as pure "
        "DataFrame aggregations/joins — O(log^2 n) rounds on ANY "
        "topology with no Python stage at all, the variant to prefer "
        "when executor Python workers are the bottleneck. Each round is "
        "two aggregations + two joins on a monotonically shrinking edge "
        "set, lineage truncated per round.",
)
def dedup_clusters_starcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.graph import star_contraction_components

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").cache()
    edges = pairs.union(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).toDF("u", "v").cache()
    try:
        return star_contraction_components(edges).select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        )
    finally:
        pairs.unpersist()
        edges.unpersist()


_CONTAIN_T = 0.9
_CONTAIN_MAX_DF = 100


@register(
    "dedup_containment",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(w) - {SHINGLE_N - 1}, 0) + 1),
                       i -> array_to_string(w[i:i+{SHINGLE_N - 1}], ' '))) AS s
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                                     x -> x <> '') AS w
                  FROM documents))
    ), dfreq AS (
        SELECT s, count(*) AS df FROM sh GROUP BY s
    ), sh_r AS (
        SELECT sh.doc_id, sh.s FROM sh
        JOIN dfreq ON dfreq.s = sh.s AND dfreq.df <= {_CONTAIN_MAX_DF}
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh_r GROUP BY doc_id
    ), pair_common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM sh_r a JOIN sh_r b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), scored AS (
        SELECT p.doc_a, p.doc_b, p.c, sa.n AS na, sb.n AS nb
        FROM pair_common p
        JOIN sizes sa ON sa.doc_id = p.doc_a
        JOIN sizes sb ON sb.doc_id = p.doc_b
    )
    SELECT doc_a AS src_doc, doc_b AS dst_doc,
           round(c / na, 6) AS containment
    FROM scored WHERE c / na >= {_CONTAIN_T}
    UNION ALL
    SELECT doc_b, doc_a, round(c / nb, 6)
    FROM scored WHERE c / nb >= {_CONTAIN_T}
    """,
    doc="Asymmetric containment detection (|A∩B| / |A| >= 0.9 over rare "
        "word-3-gram shingles): the quote/eval-leak shape Jaccard misses "
        "— a short benchmark prompt embedded inside a long document has "
        "tiny Jaccard but containment ~1. Join volume is bounded by "
        "dropping shingles with document frequency > "
        f"{_CONTAIN_MAX_DF} (stopword-shingle removal, applied "
        "identically in both engines as part of the semantics), capping "
        "the inverted-index self-join at sum(df<=cap) * cap — linear-ish "
        "in the corpus, never the unfiltered sum(df^2). Directed output: "
        "one row per (contained doc, containing doc) direction.",
    tags=("dedup",),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # lazy checkpoints, not cache: each shared subtree has 2-3 consumers
    # and the fwd/rev union below references the WHOLE scored lineage
    # twice — with cache() the logical plan kept every re-expansion (the
    # before-plan carried 65 parquet scans of documents,
    # plans/r11/dedup_containment_before.txt) and Catalyst re-analyzed
    # the full tree per reference; the checkpoint truncates lineage to a
    # Scan ExistingRDD (round-7 §13)
    exploded = shingles_exploded(t.documents).localCheckpoint(eager=False)
    dfreq = exploded.groupBy("s").agg(F.count("*").alias("df"))
    sh_r = (
        exploded.join(
            dfreq.filter(F.col("df") <= _CONTAIN_MAX_DF).select("s"), "s"
        )
    ).localCheckpoint(eager=False)
    sizes = sh_r.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh_r.alias("a"), sh_r.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    scored = (
        common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        ).join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        # two consumers (fwd and rev): the expensive inverted-index
        # self-join must run once, not once per direction
        .localCheckpoint(eager=False)
    )
    fwd = scored.filter(F.col("c") / F.col("na") >= _CONTAIN_T).select(
        F.col("doc_a").alias("src_doc"),
        F.col("doc_b").alias("dst_doc"),
        F.round(F.col("c") / F.col("na"), 6).alias("containment"),
    )
    rev = scored.filter(F.col("c") / F.col("nb") >= _CONTAIN_T).select(
        F.col("doc_b").alias("src_doc"),
        F.col("doc_a").alias("dst_doc"),
        F.round(F.col("c") / F.col("nb"), 6).alias("containment"),
    )
    return fwd.unionAll(rev)


@register(
    "dedup_incremental_lsh",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(w) - {SHINGLE_N - 1}, 0) + 1),
                       i -> array_to_string(w[i:i+{SHINGLE_N - 1}], ' '))) AS s
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                                     x -> x <> '') AS w
                  FROM documents))
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), pair_common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT doc_a, doc_b FROM pair_common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE c / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
    )
    SELECT d.doc_id,
           CASE WHEN EXISTS (
                    SELECT 1 FROM pairs p
                    WHERE (p.doc_a = d.doc_id AND p.doc_b % 5 <> 4)
                       OR (p.doc_b = d.doc_id AND p.doc_a % 5 <> 4))
                THEN 'dup_of_corpus'
                WHEN EXISTS (
                    SELECT 1 FROM pairs p
                    WHERE p.doc_b = d.doc_id AND p.doc_a % 5 = 4)
                THEN 'dup_in_batch'
                ELSE 'kept' END AS status
    FROM documents d WHERE d.doc_id % 5 = 4
    """,
    doc="Incremental NEAR-dup ingestion (the LSH analog of "
        "dedup_incremental's exact path): the day's batch (doc_id%5==4) "
        "is banded with MinHash(32)/LSH(8x4) and joined against the "
        "corpus band index — at 100 TB that index is a stored table "
        "maintained per ingest, so daily cost is batch-sized, never a "
        "corpus rescan. Candidates are exact-Jaccard verified; each "
        "batch doc reports 'dup_of_corpus' (near-dup of an existing "
        "doc), 'dup_in_batch' (a smaller-id batch near-dup exists — "
        "pairwise first-wins, mirroring the exact incremental op), or "
        "'kept'. The oracle is the full exact-Jaccard pair relation "
        "(LSH recall ~1 at the 0.8 threshold on this corpus, as "
        "dedup_minhash_lsh's shared oracle already pins).",
    tags=("dedup", "incremental"),
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    is_batch = F.col("doc_id") % 5 == 4
    # map-side shingle arrays (round-12, see doc_shingle_sets): no
    # explode + collect_set corpus shuffle; all consumers below are
    # order-invariant over the array
    doc_sets = doc_shingle_sets(t.documents)
    sig = doc_sets.select(
        "doc_id", *minhash_components_from_set(F.col("sh"), NUM_PERM)
    )
    banded = sig.select("doc_id", *band_keys("mh", NUM_PERM, BANDS))
    stack_expr = ", ".join(f"{b}, band{b}" for b in range(BANDS))
    melted = banded.selectExpr(
        "doc_id", f"stack({BANDS}, {stack_expr}) AS (band_idx, bh)"
    ).cache()
    batch_bands = melted.filter(is_batch)
    corpus_bands = melted.filter(~is_batch)

    def verified(cands: DataFrame) -> DataFrame:
        joined = cands.join(
            doc_sets.select(
                F.col("doc_id").alias("doc_x"), F.col("sh").alias("sh_x")
            ),
            "doc_x",
        ).join(
            doc_sets.select(
                F.col("doc_id").alias("doc_y"), F.col("sh").alias("sh_y")
            ),
            "doc_y",
        )
        c = F.size(F.array_intersect("sh_x", "sh_y"))
        jac = c / (F.size("sh_x") + F.size("sh_y") - c)
        return joined.filter(jac >= JACCARD_THRESHOLD).select(
            "doc_x", "doc_y"
        )

    bb, cb = batch_bands.alias("bb"), corpus_bands.alias("cb")
    cand_corpus = (
        bb.join(
            cb,
            (F.col("bb.band_idx") == F.col("cb.band_idx"))
            & (F.col("bb.bh") == F.col("cb.bh")),
        )
        .select(
            F.col("bb.doc_id").alias("doc_x"),
            F.col("cb.doc_id").alias("doc_y"),
        )
        .distinct()
    )
    b1, b2 = batch_bands.alias("b1"), batch_bands.alias("b2")
    cand_batch = (
        b1.join(
            b2,
            (F.col("b1.band_idx") == F.col("b2.band_idx"))
            & (F.col("b1.bh") == F.col("b2.bh"))
            & (F.col("b1.doc_id") > F.col("b2.doc_id")),
        )
        .select(
            F.col("b1.doc_id").alias("doc_x"),  # the LARGER (loser) id
            F.col("b2.doc_id").alias("doc_y"),
        )
        .distinct()
    )
    dup_corpus = verified(cand_corpus).select("doc_x").distinct() \
        .withColumn("hit_corpus", F.lit(True))
    dup_batch = verified(cand_batch).select("doc_x").distinct() \
        .withColumn("hit_batch", F.lit(True))
    batch_docs = t.documents.filter(is_batch).select("doc_id")
    return (
        batch_docs.join(
            dup_corpus.withColumnRenamed("doc_x", "doc_id"), "doc_id", "left"
        )
        .join(
            dup_batch.withColumnRenamed("doc_x", "doc_id"), "doc_id", "left"
        )
        .select(
            "doc_id",
            F.when(F.col("hit_corpus"), F.lit("dup_of_corpus"))
            .when(F.col("hit_batch"), F.lit("dup_in_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )


_SPAN_K = 32  # duplicated-span window, in BYTES


def _window_partitions(spark: SparkSession, sf_dir: str) -> int:
    """Partition count for per-byte window tables, derived from the
    documents parquet's ON-DISK size (no scan): ~512 KB of parquet
    (~1-2 MB of text, so ~1-2M window rows, ~100 MB serialized) per
    partition. The round-10 subtree pin (lazy localCheckpoint on the
    exploded window table) is only safe when partitions are bounded —
    checkpoint blocks are unevictable, and at the 100x protocol scale
    the unsized explode inherited ~37 input-split partitions of ~6M
    rows each, starving execution memory in the shared local-mode
    heap (SparkOutOfMemoryError in the dup-hash aggregate; caught by
    this round's 100x run). Floor at the core count so small corpora
    keep full parallelism."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{sf_dir}/documents.parquet")
    n_bytes = p.getFileSystem(conf).getContentSummary(p).getLength()
    return max(
        spark.sparkContext.defaultParallelism,
        int(n_bytes // (512 << 10)),
    )


@register(
    "dedup_span_coverage",
    oracle=f"""
        WITH docs AS MATERIALIZED (
            SELECT doc_id, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents
        ), wins AS MATERIALIZED (
            SELECT doc_id, pos,
                   md5(substr(hx, CAST(2 * pos - 1 AS INTEGER),
                              {2 * _SPAN_K})) AS h
            FROM (
                SELECT doc_id, hx,
                       CAST(unnest(range(1, n - {_SPAN_K} + 2)) AS BIGINT)
                           AS pos
                FROM docs WHERE n >= {_SPAN_K}
            )
        ), dup_h AS MATERIALIZED (
            SELECT h FROM wins GROUP BY h HAVING COUNT(*) > 1
        ), dup_wins AS MATERIALIZED (
            SELECT w.doc_id, w.pos FROM wins w JOIN dup_h d ON w.h = d.h
        ), covered AS (
            SELECT doc_id,
                   CAST(SUM(GREATEST(
                       0,
                       (pos + {_SPAN_K} - 1)
                       - GREATEST(COALESCE(prev_end, 0), pos - 1)
                   )) AS BIGINT) AS covered_bytes
            FROM (
                SELECT doc_id, pos,
                       MAX(pos + {_SPAN_K} - 1) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING
                       ) AS prev_end
                FROM dup_wins
            ) GROUP BY doc_id
        )
        SELECT d.doc_id, d.n AS n_bytes,
               COALESCE(c.covered_bytes, 0) AS covered_bytes,
               CAST(COALESCE(c.covered_bytes, 0) AS DOUBLE)
                   / CAST(d.n AS DOUBLE) AS dup_fraction
        FROM docs d LEFT JOIN covered c ON c.doc_id = d.doc_id
        WHERE d.n > 0
    """,
    doc=f"ExactSubstr-style duplicated-span coverage (Lee et al. 2022, "
        f"'Deduplicating Training Data Makes Language Models Better' — "
        f"public algorithm, approximated with fixed-length fingerprints "
        f"as large pipelines do): every {_SPAN_K}-byte window of every "
        "document is fingerprinted (md5 over the hex byte string — "
        "byte-identical cross-engine); a window whose fingerprint occurs "
        "more than once ANYWHERE in the corpus is a duplicated span, and "
        "per document the union of its duplicated intervals (classic "
        "running-max-end window arithmetic) yields covered_bytes and "
        "dup_fraction — the removal metric an ExactSubstr pass acts on. "
        "Spark plan: one explode to corpus-bytes window rows, one "
        "fingerprint groupBy (the only corpus-scale shuffle), a "
        "semi-join back, and a per-doc window — linear in corpus bytes "
        "at any scale, no suffix array needed for the coverage metric.",
    tags=("dedup",),
)
def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as _W

    t = Tables(spark, sf_dir)
    k = _SPAN_K
    hx = F.hex(F.col("text").cast("binary"))
    docs = t.documents.select(
        "doc_id",
        hx.alias("hx"),
        F.octet_length("text").cast("long").alias("n"),
    )
    wins = (
        docs.filter(F.col("n") >= k)
        # byte-sized pre-explosion repartition: bounds every window
        # partition (and therefore every unevictable checkpoint block
        # below) regardless of corpus size — see _window_partitions
        .repartition(_window_partitions(spark, sf_dir))
        .select(
            "doc_id",
            "hx",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - k + 1),
                    lambda i: F.md5(F.substring(F.col("hx"), i * 2 - 1, 2 * k)),
                )
            ).alias("p0", "h"),
        )
        .select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "h")
        # two consumers (the dup-hash aggregate and the semi-join back)
        # otherwise re-run the full per-byte md5 window generation —
        # Catalyst planned 2 generator scans (round-7 technique 13:
        # lazy checkpoint pins multi-consumer subtrees); 9.2 -> ~5 s
        # warm at sf0.1
        .localCheckpoint(eager=False)
    )
    # carry the byte-derived width through the corpus-scale exchanges:
    # at the static session shuffle partitions (32), a 100x corpus puts
    # 2M+ window rows per partition into the fingerprint aggregate /
    # join build / per-doc window sort — measured Java-heap OOM in the
    # substring twin's 100x run. repartition-by-key before groupBy/
    # join/window is exchange-neutral (the consumer reuses it).
    n_parts = _window_partitions(spark, sf_dir)
    wins_by_h = wins.repartition(n_parts, "h")
    dup_h = wins_by_h.groupBy("h").agg(F.count("*").alias("c")).filter(
        F.col("c") > 1
    ).select("h")
    dup_wins = wins_by_h.join(dup_h, "h", "left_semi").repartition(
        n_parts, "doc_id"
    )
    w_prev = (
        _W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    covered = (
        dup_wins.withColumn(
            "prev_end", F.max(F.col("pos") + k - 1).over(w_prev)
        )
        .select(
            "doc_id",
            F.greatest(
                F.lit(0).cast("long"),
                (F.col("pos") + k - 1)
                - F.greatest(
                    F.coalesce(F.col("prev_end"), F.lit(0).cast("long")),
                    F.col("pos") - 1,
                ),
            ).alias("add"),
        )
        .groupBy("doc_id")
        .agg(F.sum("add").cast("long").alias("covered_bytes"))
    )
    return (
        docs.filter(F.col("n") > 0)
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").alias("n_bytes"),
            F.coalesce(F.col("covered_bytes"), F.lit(0).cast("long"))
            .alias("covered_bytes"),
            (
                F.coalesce(F.col("covered_bytes"), F.lit(0).cast("long"))
                .cast("double")
                / F.col("n").cast("double")
            ).alias("dup_fraction"),
        )
    )


_SOFT_FX = 1 << 30  # weight quantum: floor(2^30 / dup_count) per doc


@register(
    "dedup_soft_weights",
    oracle=f"""
        WITH fp AS (
            SELECT doc_id, source,
                   md5(regexp_replace(lower(trim(text)),
                       '[ \\t\\n\\r\\f]+', ' ', 'g')) AS fp
            FROM documents
        ), counted AS (
            SELECT doc_id, source,
                   CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS c
            FROM fp
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_docs,
               CAST(SUM({_SOFT_FX} // c) AS BIGINT) AS eff_fx,
               CAST(CAST(SUM({_SOFT_FX} // c) AS BIGINT) AS DOUBLE)
                   / {_SOFT_FX} AS eff_size
        FROM counted GROUP BY source
    """,
    doc="Soft deduplication (frequency downweighting, the SlimPajama/"
        "D4-style alternative to hard dropping): every doc in an "
        "exact-dup cluster of size c gets sampling weight 1/c, so each "
        "distinct text contributes unit mass no matter how often the "
        "crawl re-serves it. Per source: docs, duplicated docs, and "
        "the effective (weighted) dataset size. Weights are "
        "fixed-point floor(2^30 / c) integers summed as exact BIGINTs "
        "(a double 1/c sum would be order-dependent), with one final "
        "exact power-of-two division for the display double — the "
        "same order-free-sum discipline as pagerank/kmeans. Two "
        "shuffles total (fingerprint window + source agg), both "
        "partial-agg friendly; no driver state.",
    tags=("dedup",),
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..functions.text import normalized_text

    t = Tables(spark, sf_dir)
    fp = t.documents.select(
        "doc_id", "source", F.md5(normalized_text("text")).alias("fp")
    )
    counted = fp.select(
        "source",
        F.count("*").over(W.partitionBy("fp")).cast("bigint").alias("c"),
    )
    w_fx = F.expr(f"{_SOFT_FX} div c")
    return counted.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_docs"),
        F.sum(w_fx).cast("bigint").alias("eff_fx"),
        (F.sum(w_fx).cast("bigint").cast("double") / _SOFT_FX).alias(
            "eff_size"
        ),
    )


@register(
    "dedup_minhash_calibration",
    oracle=f"""
        WITH sh AS (
            SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, greatest(len(w) - {SHINGLE_N - 1}, 0) + 1),
                           i -> array_to_string(w[i:i+{SHINGLE_N - 1}], ' ')))
                           AS s
                FROM (SELECT doc_id,
                             list_filter(
                                 string_split_regex(text,
                                     '[ \\t\\n\\r\\f]+'),
                                 x -> x <> '') AS w
                      FROM documents))
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), pair_common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT doc_a, doc_b,
                   round(c / (sa.n + sb.n - c), 6) AS jaccard
            FROM pair_common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE c / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
        ), mh AS (
            -- one md5 serves TWO 52-bit permutation draws (digest
            -- chars 1-13 / 14-26 by i % 2): halves the dominant
            -- hashing cost in BOTH engines (the poisson-bootstrap
            -- round-10 recipe)
            SELECT doc_id, p.i,
                   MIN(CAST(CAST(('0x' || substr(
                       md5(CAST(p.i // 2 AS VARCHAR) || ':' || s),
                       CAST(1 + 13 * (p.i % 2) AS INTEGER), 13))
                       AS UBIGINT) AS BIGINT)) AS mh
            FROM sh CROSS JOIN (
                SELECT CAST(unnest(range(0, {NUM_PERM})) AS BIGINT) AS i) p
            GROUP BY doc_id, p.i
        ), matches AS (
            SELECT pr.doc_a, pr.doc_b,
                   CAST(SUM(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END)
                        AS BIGINT) AS mh_matches
            FROM pairs pr
            JOIN mh a ON a.doc_id = pr.doc_a
            JOIN mh b ON b.doc_id = pr.doc_b AND b.i = a.i
            GROUP BY 1, 2
        )
        SELECT m.doc_a, m.doc_b, m.mh_matches,
               CAST(m.mh_matches AS DOUBLE) / {NUM_PERM} AS est_jaccard,
               p.jaccard
        FROM matches m JOIN pairs p USING (doc_a, doc_b)
    """,
    doc="MinHash estimator calibration as a first-class eval operator: "
        "for every TRUE near-dup pair (exact Jaccard >= 0.8), the "
        "32-perm MinHash signature agreement count and the estimate it "
        "implies (matches/32, a power-of-two division -> exact double) "
        "next to the exact Jaccard — the accuracy audit a pipeline runs "
        "before trusting sketch-only dedup at a scale where exact "
        "verification is unaffordable. The signature here is md5-"
        "derandomized (the CLAUDE.md conv/UBIGINT bridge) so the oracle "
        "replays it bit-identically; the production op "
        "(dedup_minhash_lsh) keeps its faster xxhash64 signature, whose "
        "match-count distribution this op calibrates. Spark side stays "
        "in the codegen explode+groupBy path (no interpreted HOF md5s); "
        "per-perm work is one shuffle of shingle rows x 32.",
    tags=("dedup", "eval"),
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # lazy localCheckpoint, NOT cache: four consumers (sizes, the
    # pair self-join's two legs, the x32 signature explode) re-read
    # this subtree inside ONE action, and an explicit cache adds a
    # materialization barrier (round-6 technique 7 — measured here:
    # cache 7.6 s warm / 16.5 s cold vs ckpt 3.8 s / 5.8 s at sf0.1).
    # No .distinct(): word_shingles is array_distinct per doc and
    # doc_id is unique, so (doc_id, s) rows are already globally
    # distinct — the old distinct() was a full corpus exchange for
    # nothing (round-12, guide §2.4).
    sh = shingles_exploded(t.documents).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pair_common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    pairs = (
        pair_common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
    perms = spark.range(NUM_PERM).select(F.col("id").cast("bigint").alias("i"))
    mh = (
        sh.crossJoin(perms)
        .select(
            "doc_id",
            "i",
            # one md5 per TWO permutations (chars 1-13 / 14-26 by
            # i % 2) — mirrors the oracle's mh CTE exactly
            F.expr(
                "CAST(conv(substr(md5(concat(CAST(i div 2 AS STRING), "
                "':', s)), CAST(1 + 13 * (i % 2) AS INT), 13), 16, 10) "
                "AS BIGINT)"
            ).alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("mh"))
    )
    mha = mh.select(
        F.col("doc_id").alias("doc_a"), "i", F.col("mh").alias("mh_a")
    )
    mhb = mh.select(
        F.col("doc_id").alias("db"),
        F.col("i").alias("ib"),
        F.col("mh").alias("mh_b"),
    )
    matches = (
        pairs.join(mha, "doc_a")
        .join(mhb, (F.col("ib") == F.col("i")) & (F.col("db") == F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("mh_matches")
        )
    )
    return matches.join(pairs, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "mh_matches",
        (F.col("mh_matches").cast("double") / NUM_PERM).alias("est_jaccard"),
        "jaccard",
    )


# ---------------------------------------------------------------------------
# Incremental dedup against a CONSTANT-SIZE Bloom index
# ---------------------------------------------------------------------------

_BLOOM_WORDS = 1024          # filter = 1024 x 63-bit words (~64 Kbit)
_BLOOM_BITS = _BLOOM_WORDS * 63
_BLOOM_STARTS = (1, 6, 11, 16)   # k=4 md5-hex slices as independent hashes


@register(
    "dedup_incremental_bloom",
    oracle=f"""
        WITH fp AS (
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)),
                       '[ \\t\\n\\r\\f]+', ' ', 'g')) AS f,
                   doc_id % 5 = 4 AS is_new
            FROM documents
        ),
        pos AS (
            SELECT doc_id, is_new,
                   CAST(CAST(('0x' || substr(f, u.s, 13)) AS UBIGINT)
                        % {_BLOOM_BITS} AS BIGINT) AS p
            FROM fp, (SELECT unnest([{", ".join(map(str, _BLOOM_STARTS))}])
                      AS s) u
        ),
        bloom AS (
            SELECT p // 63 AS word,
                   CAST(bit_or(CAST(1 AS BIGINT)
                        << CAST(p % 63 AS INTEGER)) AS BIGINT) AS bits
            FROM (SELECT DISTINCT p FROM pos WHERE NOT is_new)
            GROUP BY 1
        ),
        probe AS (
            SELECT t.doc_id,
                   bool_and(b.bits IS NOT NULL
                            AND ((b.bits >> CAST(t.p % 63 AS INTEGER))
                                 & 1) = 1) AS bloom_hit
            FROM (SELECT doc_id, p FROM pos WHERE is_new) t
            LEFT JOIN bloom b ON t.p // 63 = b.word
            GROUP BY t.doc_id
        ),
        existing AS (SELECT DISTINCT f FROM fp WHERE NOT is_new)
        SELECT p.doc_id, p.bloom_hit, e.f IS NOT NULL AS is_dup
        FROM probe p
        JOIN fp t ON p.doc_id = t.doc_id
        LEFT JOIN existing e ON t.f = e.f
    """,
    doc="Incremental exact dedup probed through a CONSTANT-SIZE Bloom "
        "index (1024 x 63-bit words, k=4 md5-hex-slice hashes — fully "
        "deterministic, the repo's 13-hex UBIGINT bridge): yesterday's "
        "corpus folds into ~8 KB of bit_or-merged words (a mergeable, "
        "broadcastable sketch whose size is INDEPENDENT of corpus "
        "size, vs the LSH band index that grows with it), today's "
        "batch tests membership via a broadcast join on word index, "
        "and only Bloom HITS need the exact fingerprint verify. "
        "Output: per-batch-doc (bloom_hit, is_dup) — is_dup => "
        "bloom_hit by construction (no false negatives); the gap "
        "measures the false-positive rate the verify join pays for. "
        "Max shift 62 keeps every word positive in int64 in both "
        "engines.",
    tags=("dedup", "incremental"),
)
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    fp = t.documents.select(
        "doc_id",
        F.md5(normalized_text("text")).alias("f"),
        (F.col("doc_id") % 5 == 4).alias("is_new"),
    ).cache()
    starts = F.array(*[F.lit(s) for s in _BLOOM_STARTS])
    pos = fp.select(
        "doc_id", "is_new", "f", F.explode(starts).alias("s")
    ).select(
        "doc_id", "is_new",
        (
            F.conv(F.expr("substring(f, s, 13)"), 16, 10)
            .cast("long") % _BLOOM_BITS
        ).alias("p"),
    )
    bloom = (
        pos.filter(~F.col("is_new"))
        .select("p").distinct()
        .select(
            F.expr("p div 63").alias("word"),
            F.expr("shiftleft(1L, CAST(p % 63 AS INT))").alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )
    probe = (
        pos.filter(F.col("is_new"))
        .select("doc_id", "p", F.expr("p div 63").alias("word"))
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "doc_id",
            (
                F.col("bits").isNotNull()
                & (
                    F.expr(
                        "(bits >> CAST(p % 63 AS INT)) & 1"
                    ) == 1
                )
            ).alias("hit"),
        )
        .groupBy("doc_id")
        .agg(F.bool_and("hit").alias("bloom_hit"))
    )
    existing = fp.filter(~F.col("is_new")).select("f").distinct()
    return (
        probe.join(fp.filter(F.col("is_new")).select("doc_id", "f"), "doc_id")
        .join(
            existing.withColumnRenamed("f", "ef"),
            F.col("f") == F.col("ef"),
            "left",
        )
        .select(
            "doc_id", "bloom_hit",
            F.col("ef").isNotNull().alias("is_dup"),
        )
    )


@register(
    "dedup_cluster_sizes",
    oracle=f"""
        WITH lab AS ({_CLUSTER_ORACLE})
        SELECT size, CAST(count(*) AS BIGINT) AS n_clusters
        FROM (
            SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
            FROM lab GROUP BY cluster_id
        ) GROUP BY size
    """,
    doc="Near-dup cluster SIZE distribution — the curation report that "
        "decides dedup policy (a corpus of pairs needs different "
        "handling than one with thousand-document clone families, and "
        "the histogram is the evidence). Two tiny aggregations over the "
        "dedup_clusters labeling (partition-local contraction CC); "
        "covers only documents that appear in a verified near-dup pair, "
        "matching the dedup_clusters contract. Oracle: size histogram "
        "over the identical recursive-CTE closure.",
    tags=("dedup",),
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = dedup_clusters(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("size"))
    return sizes.groupBy("size").agg(F.count("*").alias("n_clusters"))


@register(
    "dedup_keep_longest",
    oracle=f"""
        WITH lab AS ({_CLUSTER_ORACLE}),
        members AS (
            SELECT l.cluster_id, l.doc_id,
                   CAST(strlen(d.text) AS BIGINT) AS n_bytes
            FROM lab l JOIN documents d ON d.doc_id = l.doc_id
        )
        SELECT cluster_id,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(max(n_bytes) AS BIGINT) AS keep_bytes,
               min(CASE WHEN n_bytes = mx THEN doc_id END) AS keep_id
        FROM (
            SELECT *, max(n_bytes) OVER (PARTITION BY cluster_id) AS mx
            FROM members
        )
        GROUP BY cluster_id
    """,
    doc="Content-aware survivorship for near-dup clusters: keep the "
        "LONGEST member (byte length; min doc_id tie-break) instead of "
        "the min-id one — the policy curation pipelines actually want, "
        "since near-dups are usually truncations/excerpts of one "
        "fuller document and dropping the long copy loses content. "
        "Same contraction-CC labeling as dedup_clusters; the argmax is "
        "a max-comparison (no arithmetic, hash-trivial). Byte-defined "
        "length (octet_length == DuckDB strlen).",
    tags=("dedup",),
)
def dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    labels = dedup_clusters(spark, sf_dir).select(
        F.col("doc_id"), F.col("cluster_id")
    )
    members = labels.join(
        t.documents.select(
            "doc_id", F.octet_length("text").cast("bigint").alias("n_bytes")
        ),
        "doc_id",
    )
    return members.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.max("n_bytes").alias("keep_bytes"),
        F.min_by(
            F.col("doc_id"),
            F.struct((-F.col("n_bytes")).alias("a"), F.col("doc_id").alias("b")),
        ).alias("keep_id"),
    )


_SUB_K = 32  # minimum duplicated-substring length, in BYTES


@register(
    "dedup_substring_exact",
    oracle=f"""
        WITH docs AS MATERIALIZED (
            SELECT doc_id, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents
        ), wins AS MATERIALIZED (
            SELECT doc_id, pos,
                   md5(substr(hx, CAST(2 * pos - 1 AS INTEGER),
                              {2 * _SUB_K})) AS h
            FROM (
                SELECT doc_id, hx,
                       CAST(unnest(range(1, n - {_SUB_K} + 2)) AS BIGINT)
                           AS pos
                FROM docs WHERE n >= {_SUB_K}
            )
        ), mult AS MATERIALIZED (
            SELECT h, CAST(COUNT(*) AS BIGINT) AS c
            FROM wins GROUP BY h HAVING COUNT(*) > 1
        ), dup_wins AS MATERIALIZED (
            SELECT w.doc_id, w.pos, m.c
            FROM wins w JOIN mult m ON w.h = m.h
        ), flagged AS (
            SELECT doc_id, pos, c,
                   CASE WHEN prev_end IS NULL
                             OR pos > prev_end + 1 THEN 1
                        ELSE 0 END AS new_span
            FROM (
                SELECT doc_id, pos, c,
                       MAX(pos + {_SUB_K} - 1) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING
                       ) AS prev_end
                FROM dup_wins
            )
        ), islands AS (
            SELECT doc_id, pos, c,
                   SUM(new_span) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island
            FROM flagged
        )
        SELECT doc_id,
               CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + {_SUB_K} - 1 AS BIGINT) AS span_end,
               CAST(MAX(pos) + {_SUB_K} - MIN(pos) AS BIGINT)
                   AS span_bytes,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(MAX(c) AS BIGINT) AS max_mult
        FROM islands
        GROUP BY doc_id, island
    """,
    doc="ExactSubstr dedup CUT LIST (Lee et al. 2022, 'Deduplicating "
        "Training Data Makes Language Models Better' — the "
        "suffix-array pass, public): per document, the MAXIMAL "
        f"duplicated spans of length >= {_SUB_K} bytes, i.e. the "
        "intervals the dedup pass actually removes. Equivalence that "
        "makes this exact WITHOUT materializing suffix ranks: a "
        f"substring of length m >= {_SUB_K} repeats in the corpus iff "
        f"each of its m-{_SUB_K}+1 fixed-width {_SUB_K}-byte windows "
        "repeats, so the union of duplicated windows equals the union "
        "of maximal duplicated substrings — the same positional cover "
        "a suffix array's repeat scan yields, computed as a "
        "distributed shingle sort over byte offsets (the "
        "prefix-doubling-free formulation; never a driver-side "
        "array). Spans report byte offsets (1-based, inclusive), the "
        "window count and the max global multiplicity of any window "
        "in the span (the repeat's copy pressure). Windows are "
        "fingerprinted md5-over-hex-bytes (byte-identical "
        "cross-engine); interval union is the classic "
        "running-max-end + island-id window pattern, partitioned by "
        "doc. Spark plan: one explode to corpus-byte window rows "
        "(pinned multi-consumer subtree), ONE corpus-scale groupBy "
        "on fingerprints, a join back carrying multiplicity, and a "
        "per-doc window — linear in corpus bytes at any scale; "
        "output is bounded by the duplicated regions, not the "
        "corpus. Complements dedup_span_coverage (dedup.py:785), "
        "which reduces the same cover to per-doc byte totals; this "
        "emits the spans themselves.",
    tags=("dedup",),
)
def dedup_substring_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as _W

    t = Tables(spark, sf_dir)
    k = _SUB_K
    hx = F.hex(F.col("text").cast("binary"))
    docs = t.documents.select(
        "doc_id",
        hx.alias("hx"),
        F.octet_length("text").cast("long").alias("n"),
    )
    wins = (
        docs.filter(F.col("n") >= k)
        # byte-sized pre-explosion repartition — bounds checkpoint
        # blocks at any corpus size (see _window_partitions)
        .repartition(_window_partitions(spark, sf_dir))
        .select(
            "doc_id",
            "hx",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n") - k + 1),
                    lambda i: F.md5(
                        F.substring(F.col("hx"), i * 2 - 1, 2 * k)
                    ),
                )
            ).alias("p0", "h"),
        )
        .select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "h")
        # two consumers (the multiplicity aggregate and the join back)
        # would otherwise re-run the per-byte md5 window generation
        # (round-7 technique 13: lazy checkpoint pins multi-consumer
        # subtrees — same fix as dedup_span_coverage)
        .localCheckpoint(eager=False)
    )
    # byte-derived width through every corpus-scale exchange (same
    # heap-OOM fix as dedup_span_coverage — the 100x protocol killed
    # this query's fingerprint join at 32 static shuffle partitions)
    n_parts = _window_partitions(spark, sf_dir)
    wins_by_h = wins.repartition(n_parts, "h")
    mult = (
        wins_by_h.groupBy("h")
        .agg(F.count("*").cast("long").alias("c"))
        .filter(F.col("c") > 1)
    )
    dup_wins = (
        wins_by_h.join(mult, "h")
        .select("doc_id", "pos", "c")
        .repartition(n_parts, "doc_id")
    )
    w_prev = (
        _W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    w_run = (
        _W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    flagged = dup_wins.withColumn(
        "prev_end", F.max(F.col("pos") + k - 1).over(w_prev)
    ).withColumn(
        "new_span",
        F.when(
            F.col("prev_end").isNull()
            | (F.col("pos") > F.col("prev_end") + 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn("island", F.sum("new_span").over(w_run))
    return islands.groupBy("doc_id", "island").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + k - 1).cast("long").alias("span_end"),
        (F.max("pos") + k - F.min("pos")).cast("long").alias("span_bytes"),
        F.count("*").cast("long").alias("n_windows"),
        F.max("c").cast("long").alias("max_mult"),
    ).drop("island")


@register(
    "text_url_dedup",
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   doc_id // 4 AS gid,
                   doc_id % 4 AS var,
                   (CASE doc_id % 4 WHEN 1 THEN 'HTTP'
                                    WHEN 3 THEN 'Http'
                                    ELSE 'http' END)
                   || '://'
                   || (CASE doc_id % 4
                       WHEN 0 THEN 'www.example.com'
                       WHEN 1 THEN 'WWW.EXAMPLE.COM:80'
                       WHEN 2 THEN 'Example.Com'
                       ELSE 'www.Example.Com' END)
                   || '/corpus/' || CAST(doc_id // 4 AS VARCHAR)
                   || (CASE WHEN doc_id % 4 = 2 THEN '/' ELSE '' END)
                   || '?'
                   || (CASE doc_id % 4
                       WHEN 0 THEN 'id=' || CAST(doc_id // 4 AS VARCHAR)
                                || '&v=1&utm_source=news&fbclid=zzz'
                       WHEN 1 THEN 'id=' || CAST(doc_id // 4 AS VARCHAR)
                                || '&v=1'
                       WHEN 2 THEN 'v=1&id='
                                || CAST(doc_id // 4 AS VARCHAR)
                                || '&gclid=123'
                       ELSE 'v=1&id=' || CAST(doc_id // 4 AS VARCHAR)
                                || '&utm_campaign=x' END)
                   || (CASE doc_id % 4 WHEN 1 THEN '#sec2'
                                       WHEN 3 THEN '#top'
                                       ELSE '' END) AS url
            FROM documents
        ), parts AS (
            SELECT doc_id, url,
                   lower(COALESCE(regexp_extract(
                       url, '^([A-Za-z]+)://', 1), '')) AS scheme_c,
                   lower(COALESCE(regexp_extract(
                       url, '^[A-Za-z]+://([^/?#]+)', 1), '')) AS hostport,
                   COALESCE(regexp_extract(
                       url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '')
                       AS path_raw,
                   COALESCE(regexp_extract(url, '\\?([^#]*)', 1), '')
                       AS query_raw
            FROM raw
        ), canon AS (
            SELECT doc_id, url, scheme_c,
                   regexp_replace(
                       CASE WHEN scheme_c = 'http' THEN
                                regexp_replace(hostport, ':80$', '')
                            WHEN scheme_c = 'https' THEN
                                regexp_replace(hostport, ':443$', '')
                            ELSE hostport END,
                       '^www\\.', '') AS host_c,
                   CASE WHEN regexp_replace(path_raw, '/+$', '') = ''
                        THEN '/'
                        ELSE regexp_replace(path_raw, '/+$', '') END
                       AS path_c,
                   array_to_string(
                       list_sort(list_filter(
                           str_split(query_raw, '&'),
                           x -> x <> '' AND NOT regexp_matches(
                               x, '^(utm_[^=]*|fbclid|gclid|ref)='))),
                       '&') AS params_c
            FROM parts
        ), keyed AS (
            SELECT doc_id, url,
                   scheme_c || '://' || host_c || path_c
                   || (CASE WHEN params_c = '' THEN ''
                            ELSE '?' || params_c END) AS canonical_url
            FROM canon
        )
        SELECT canonical_url,
               CAST(COUNT(*) AS BIGINT) AS n_raw,
               CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants,
               CAST(MIN(doc_id) AS BIGINT) AS keep_id
        FROM keyed
        GROUP BY canonical_url
    """,
    doc="URL-canonicalization dedup (the CCNet / Common Crawl "
        "curation step, public): canonicalize each document's URL — "
        "lowercase scheme+host, strip a 'www.' prefix and the "
        "scheme's default port, drop the fragment, remove tracking "
        "parameters (utm_*, fbclid, gclid, ref) and SORT the "
        "remaining query params, trim trailing slashes (root stays "
        "'/') — then exact-dedup by the canonical string: n_raw "
        "copies collapse to one keep_id (min doc_id). The documents "
        "table carries no URL column, so raw URLs are constructed "
        "deterministically from doc_id with the messiness the "
        "canonicalizer must erase (case-mixed schemes/hosts, :80 "
        "ports, shuffled+tracking-polluted query strings, fragments, "
        "trailing slashes — four variants per canonical target), and "
        "both engines parse the IDENTICAL string with anchored "
        "regexes + per-row list ops, cross-checking each other. "
        "Spark plan: pure per-row JVM expressions (regexp/filter/"
        "sort_array/array_join — no UDF), then ONE groupBy on the "
        "canonical key — the linear exact-dedup shape at any scale.",
    tags=("dedup", "text"),
)
def text_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    gid = F.expr("doc_id div 4").cast("string")
    var = F.col("doc_id") % 4
    scheme = (
        F.when(var == 1, F.lit("HTTP"))
        .when(var == 3, F.lit("Http"))
        .otherwise(F.lit("http"))
    )
    host = (
        F.when(var == 0, F.lit("www.example.com"))
        .when(var == 1, F.lit("WWW.EXAMPLE.COM:80"))
        .when(var == 2, F.lit("Example.Com"))
        .otherwise(F.lit("www.Example.Com"))
    )
    query = (
        F.when(
            var == 0,
            F.concat(F.lit("id="), gid,
                     F.lit("&v=1&utm_source=news&fbclid=zzz")),
        )
        .when(var == 1, F.concat(F.lit("id="), gid, F.lit("&v=1")))
        .when(
            var == 2,
            F.concat(F.lit("v=1&id="), gid, F.lit("&gclid=123")),
        )
        .otherwise(
            F.concat(F.lit("v=1&id="), gid, F.lit("&utm_campaign=x"))
        )
    )
    frag = (
        F.when(var == 1, F.lit("#sec2"))
        .when(var == 3, F.lit("#top"))
        .otherwise(F.lit(""))
    )
    raw = t.documents.select(
        "doc_id",
        F.concat(
            scheme, F.lit("://"), host, F.lit("/corpus/"), gid,
            F.when(var == 2, F.lit("/")).otherwise(F.lit("")),
            F.lit("?"), query, frag,
        ).alias("url"),
    )
    parts = raw.select(
        "doc_id", "url",
        F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1))
        .alias("scheme_c"),
        F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1))
        .alias("hostport"),
        F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
        .alias("path_raw"),
        F.regexp_extract("url", r"\?([^#]*)", 1).alias("query_raw"),
    )
    host_c = F.regexp_replace(
        F.when(
            F.col("scheme_c") == "http",
            F.regexp_replace("hostport", r":80$", ""),
        )
        .when(
            F.col("scheme_c") == "https",
            F.regexp_replace("hostport", r":443$", ""),
        )
        .otherwise(F.col("hostport")),
        r"^www\.", "",
    )
    path_stripped = F.regexp_replace("path_raw", r"/+$", "")
    path_c = F.when(path_stripped == "", F.lit("/")).otherwise(
        path_stripped
    )
    params_c = F.array_join(
        F.sort_array(
            F.filter(
                F.split("query_raw", "&"),
                lambda x: (x != "")
                & ~x.rlike(r"^(utm_[^=]*|fbclid|gclid|ref)="),
            )
        ),
        "&",
    )
    keyed = parts.select(
        "doc_id", "url",
        F.concat(
            F.col("scheme_c"), F.lit("://"), host_c, path_c,
            F.when(params_c == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), params_c)
            ),
        ).alias("canonical_url"),
    )
    return keyed.groupBy("canonical_url").agg(
        F.count("*").cast("long").alias("n_raw"),
        F.countDistinct("url").cast("long").alias("n_variants"),
        F.min("doc_id").cast("long").alias("keep_id"),
    )


_BBIT_B = 2                 # bits kept per permutation (Li & Konig)
_BBIT_C = 1.0 / (1 << _BBIT_B)  # collision floor for a large universe


@register(
    "dedup_minhash_bbit",
    oracle=f"""
        WITH sh AS (
            SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, greatest(len(w) - {SHINGLE_N - 1}, 0) + 1),
                           i -> array_to_string(w[i:i+{SHINGLE_N - 1}], ' ')))
                           AS s
                FROM (SELECT doc_id,
                             list_filter(
                                 string_split_regex(text,
                                     '[ \\t\\n\\r\\f]+'),
                                 x -> x <> '') AS w
                      FROM documents))
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), pair_common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT doc_a, doc_b,
                   round(c / (sa.n + sb.n - c), 6) AS jaccard
            FROM pair_common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE c / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
        ), mh AS (
            SELECT doc_id, p.i,
                   MIN(CAST(CAST(('0x' || substr(
                       md5(CAST(p.i // 2 AS VARCHAR) || ':' || s),
                       CAST(1 + 13 * (p.i % 2) AS INTEGER), 13))
                       AS UBIGINT) AS BIGINT))
                   % {1 << _BBIT_B} AS mb
            FROM sh CROSS JOIN (
                SELECT CAST(unnest(range(0, {NUM_PERM})) AS BIGINT) AS i) p
            GROUP BY doc_id, p.i
        ), matches AS (
            SELECT pr.doc_a, pr.doc_b,
                   CAST(SUM(CASE WHEN a.mb = b.mb THEN 1 ELSE 0 END)
                        AS BIGINT) AS bbit_matches
            FROM pairs pr
            JOIN mh a ON a.doc_id = pr.doc_a
            JOIN mh b ON b.doc_id = pr.doc_b AND b.i = a.i
            GROUP BY 1, 2
        )
        SELECT m.doc_a, m.doc_b, m.bbit_matches,
               (CAST(m.bbit_matches AS DOUBLE) / {NUM_PERM}
                - {_BBIT_C}) / (1.0 - {_BBIT_C}) AS est_jaccard_bbit,
               p.jaccard
        FROM matches m JOIN pairs p USING (doc_a, doc_b)
    """,
    doc="b-BIT MINWISE HASHING estimator eval (Li & Konig, WWW 2010 / "
        "CACM 2011, public): store only the lowest "
        f"b = {_BBIT_B} bits of each of the {NUM_PERM} permutation "
        "min-hashes (a 16x signature-memory cut vs 64-bit minhashes — "
        "the storage trick that makes billion-doc sketch indexes "
        "fit), and for every TRUE near-dup pair compare the b-bit "
        "collision count against the exact Jaccard via the unbiased "
        "estimator (rate - C)/(1 - C) with the large-universe "
        f"collision floor C = 1/2^b = {_BBIT_C}. The estimate is "
        "exact-arithmetic clean: matches/32 is dyadic, C is dyadic, "
        "and the final division is one correctly-rounded IEEE op — "
        "no transcendental ever forms. Same md5-derandomized "
        "signature machinery as dedup_minhash_calibration (two 52-bit "
        "draws per digest), so the oracle replays bit-identically; "
        "the b-bit truncation is mh % 4 on the non-negative BIGINT "
        "draw (identical in both engines). Scale: the b-bit table is "
        "the same one-shuffle signature groupBy, and the pair legs "
        "join on the banded true-pair set — linear in corpus "
        "shingles.",
    tags=("dedup", "eval"),
)
def dedup_minhash_bbit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # shared shingle subtree: lazy checkpoint, not cache (see
    # dedup_minhash_calibration — same four-consumer shape; no
    # .distinct() — already distinct, see there)
    sh = shingles_exploded(t.documents).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pair_common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    pairs = (
        pair_common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        # three consumers (pair-doc set below, matches join, final
        # join): pin so the shingle self-join runs once
        .localCheckpoint(eager=False)
    )
    # signatures are only ever consumed joined to `pairs` — semi-join
    # the shingle table to the near-dup doc set BEFORE the xNUM_PERM
    # hash explode (guide §3.2: pre-filter the big side before the
    # expensive expansion). The doc set is near-dup-bounded (orders of
    # magnitude below the corpus), so it broadcasts; per-doc signature
    # values are unchanged, and non-pair docs never reached the output.
    pair_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b")))
        .distinct()
    )
    sh_pairs = sh.join(F.broadcast(pair_docs), "doc_id", "left_semi")
    perms = spark.range(NUM_PERM).select(F.col("id").cast("bigint").alias("i"))
    mh = (
        sh_pairs.crossJoin(perms)
        .select(
            "doc_id",
            "i",
            F.expr(
                "CAST(conv(substr(md5(concat(CAST(i div 2 AS STRING), "
                "':', s)), CAST(1 + 13 * (i % 2) AS INT), 13), 16, 10) "
                "AS BIGINT)"
            ).alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg((F.min("h") % (1 << _BBIT_B)).alias("mb"))
    )
    mha = mh.select(
        F.col("doc_id").alias("doc_a"), "i", F.col("mb").alias("mb_a")
    )
    mhb = mh.select(
        F.col("doc_id").alias("db"),
        F.col("i").alias("ib"),
        F.col("mb").alias("mb_b"),
    )
    matches = (
        pairs.join(mha, "doc_a")
        .join(mhb, (F.col("ib") == F.col("i")) & (F.col("db") == F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.when(F.col("mb_a") == F.col("mb_b"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("bbit_matches")
        )
    )
    return matches.join(pairs, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "bbit_matches",
        (
            (F.col("bbit_matches").cast("double") / NUM_PERM - _BBIT_C)
            / (1.0 - _BBIT_C)
        ).alias("est_jaccard_bbit"),
        "jaccard",
    )


# CCNet-style paragraph dedup (Wenzek et al. 2020): hash each paragraph,
# keep exactly ONE occurrence corpus-wide (the first by document order),
# drop every other copy. The synthetic corpus is single-line, so
# "paragraph" is the deterministic proxy of non-overlapping 16-token
# chunks (same spirit as Lee et al. span fingerprints; reference analog:
# the corpus-cleaning stage of cluster/tools/run_fault_tests.py's
# wordcount input prep has no dedup — this is a driver-contract
# extension). Winner per chunk hash = min(doc_id, chunk_idx) packed as
# an exact int64 (doc_id*2^32 + idx; idx < 2^32 by construction, so the
# pack is collision-free and the min is the lexicographic first
# occurrence in both engines).
_PARA_TOK = 16


@register(
    "dedup_paragraph_ccnet",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                               x -> x <> '') AS w
            FROM documents
        ), tok2 AS (
            SELECT doc_id, w, len(w) AS n FROM tok WHERE len(w) >= 1
        ), grid AS (
            SELECT doc_id, w, n,
                   unnest(range(0, (n + {_PARA_TOK - 1}) // {_PARA_TOK}))
                       AS idx
            FROM tok2
        ), occ AS (
            SELECT doc_id, idx,
                   md5(array_to_string(
                       w[idx*{_PARA_TOK}+1 : idx*{_PARA_TOK}+{_PARA_TOK}],
                       ' ')) AS h,
                   least({_PARA_TOK}, n - idx*{_PARA_TOK}) AS ntok,
                   doc_id * 4294967296 + idx AS okey
            FROM grid
        ), win AS (
            SELECT h, min(okey) AS mink FROM occ GROUP BY h
        ), per_doc AS (
            SELECT o.doc_id,
                   count(*) AS n_chunks,
                   sum(CASE WHEN o.okey = w.mink THEN 0 ELSE 1 END)
                       AS n_dup_chunks,
                   sum(o.ntok) AS tok_total,
                   sum(CASE WHEN o.okey = w.mink THEN o.ntok ELSE 0 END)
                       AS tok_retained
            FROM occ o JOIN win w USING (h)
            GROUP BY o.doc_id
        )
        SELECT doc_id,
               CAST(n_chunks AS BIGINT) AS n_chunks,
               CAST(n_dup_chunks AS BIGINT) AS n_dup_chunks,
               CAST(tok_total AS BIGINT) AS tok_total,
               CAST(tok_retained AS BIGINT) AS tok_retained,
               CAST(tok_retained AS DOUBLE) / CAST(tok_total AS BIGINT)
                   AS retained_ratio
        FROM per_doc
    """,
    doc="CCNet-style cross-document paragraph dedup: md5 per "
        "non-overlapping 16-token chunk, keep the first occurrence "
        "corpus-wide (min packed doc_id/idx), report per-doc retained "
        "token mass. One bounded explode (n/16 fanout), one "
        "partial-agg-friendly groupBy on the chunk hash, one hash-keyed "
        "join back, one per-doc aggregate — all linear, no all-pairs "
        "anywhere; the 100 TB path is identical to dedup_exact's "
        "hash-groupBy shape.",
    tags=("dedup", "documents"),
)
def dedup_paragraph_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    sc = spark.sparkContext
    P = _PARA_TOK
    toks = (
        # pre-explosion repartition: the doc parquet arrives as 1-2
        # splits; tokenize+chunk is CPU-bound (round-6 pattern)
        t.documents.repartition(sc.defaultParallelism)
        .select("doc_id", tokens(F.col("text")).alias("w"))
        .withColumn("n", F.size("w"))
        .where(F.col("n") >= 1)
    )
    # integer chunk count must be exact — floor-div via DIV, never
    # double division (CLAUDE.md round-6 (6))
    occ = (
        toks.select(
            "doc_id",
            "n",
            "w",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.expr(f"(n + {P - 1}) DIV {P}") - 1,
                )
            ).alias("idx"),
        )
        .select(
            "doc_id",
            "idx",
            F.md5(
                F.concat_ws(
                    " ", F.slice(F.col("w"), F.col("idx") * P + 1, P)
                )
            ).alias("h"),
            F.least(F.lit(P), F.col("n") - F.col("idx") * P)
            .cast("bigint")
            .alias("ntok"),
            (F.col("doc_id") * F.lit(4294967296).cast("bigint")
             + F.col("idx")).alias("okey"),
        )
    )
    win = occ.groupBy("h").agg(F.min("okey").alias("mink"))
    retained = F.col("okey") == F.col("mink")
    per_doc = (
        occ.join(win, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(retained, 0).otherwise(1))
            .cast("bigint")
            .alias("n_dup_chunks"),
            F.sum("ntok").cast("bigint").alias("tok_total"),
            F.sum(F.when(retained, F.col("ntok")).otherwise(0))
            .cast("bigint")
            .alias("tok_retained"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_dup_chunks",
        "tok_total",
        "tok_retained",
        (F.col("tok_retained").cast("double") / F.col("tok_total"))
        .alias("retained_ratio"),
    )
