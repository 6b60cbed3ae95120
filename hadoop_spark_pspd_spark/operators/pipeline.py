"""The composed training-data curation pipeline (north-star flagship).

Chains the engine's curation stages over ``documents`` exactly the way a
100 TB pretraining-data job would, each stage shuffle-bounded:

  1. quality gate   — length + stopword-ratio bounds (text_analysis.py);
     map-only.
  2. exact dedup    — keep the lowest doc_id per normalized-content
     fingerprint; one shuffle on the fingerprint.
  3. near-dup dedup — MinHash-LSH candidates + exact-Jaccard verification
     + connected components among the survivors (dedup.py machinery);
     keep each component's lowest doc_id.

Output is the curated keep-list (doc_id, n_tokens). The whole composition
is DuckDB-oracled in ONE SQL statement (recursive CTE for the component
step), so stage ordering — dedup only among quality survivors, clustering
only among exact-dedup survivors — is pinned cross-engine, not just each
stage in isolation. examples/training_data_pipeline.py extends the
composition with chunking + sampling + a partitioned parquet sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.hashing import band_keys, minhash_components_from_set
from ..functions.text import normalized_text, tokens, word_shingles
from ..registry import register
from .dedup import BANDS, JACCARD_THRESHOLD, NUM_PERM, SHINGLE_N
from .text_analysis import STOPWORDS, _hits, _sql_hits

_PIPELINE_ORACLE = f"""
    WITH RECURSIVE
    tok AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    quality AS MATERIALIZED (
        SELECT doc_id, text, w, len(w) AS n_tokens
        FROM tok
        WHERE len(w) BETWEEN 10 AND 1000
          AND CAST({_sql_hits(STOPWORDS)} AS DOUBLE) / len(w)
              BETWEEN 0.01 AND 0.6
    ),
    exact_keep AS MATERIALIZED (
        SELECT min(doc_id) AS doc_id
        FROM quality
        GROUP BY md5(regexp_replace(lower(trim(text)),
                                    '[ \\t\\n\\r\\f]+', ' ', 'g'))
    ),
    surv AS MATERIALIZED (SELECT q.* FROM quality q JOIN exact_keep USING (doc_id)),
    sh AS MATERIALIZED (
        SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(w) - {SHINGLE_N - 1}, 0) + 1),
                       i -> array_to_string(w[i:i+{SHINGLE_N - 1}], ' ')))
                       AS s
            FROM surv)
    ),
    sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pair_common AS MATERIALIZED (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
        SELECT doc_a, doc_b
        FROM pair_common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE c / (sa.n + sb.n - c) >= {JACCARD_THRESHOLD}
    ),
    edges AS MATERIALIZED (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    dropped AS (
        SELECT u AS doc_id FROM reach GROUP BY u HAVING u <> min(v)
    )
    SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens
    FROM surv s
    WHERE s.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def curated_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, text): the curated corpus after all three gates."""
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    base = t.documents.select(
        "doc_id",
        "text",
        F.size(toks).cast("bigint").alias("n_tokens"),
        _hits(toks, STOPWORDS).cast("bigint").alias("stop_hits"),
    )
    ratio = F.col("stop_hits").cast("double") / F.col("n_tokens")
    quality = base.filter(
        F.col("n_tokens").between(10, 1000) & ratio.between(0.01, 0.6)
    )
    # exact dedup: lowest doc_id per normalized-content fingerprint
    fp_rank = Window.partitionBy(F.md5(normalized_text("text"))).orderBy(
        "doc_id"
    )
    surv = (
        quality.withColumn("rn", F.row_number().over(fp_rank))
        .filter(F.col("rn") == 1)
        .drop("rn", "stop_hits")
        .cache()
    )
    # near-dup components among survivors (zero-shuffle LSH state,
    # dedup.py round-12): per-doc distinct shingle arrays map-side —
    # no explode + collect_set round trip; all consumers are
    # order-invariant over the array. (Survivors have n_tokens >= 10,
    # so no shingle-less docs exist here either way.)
    doc_sets = (
        surv.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            word_shingles(tokens(F.col("text")), SHINGLE_N).alias("sh"),
        )
        .cache()
    )
    sig = doc_sets.select(
        "doc_id", *minhash_components_from_set(F.col("sh"), NUM_PERM)
    )
    banded = sig.select("doc_id", *band_keys("mh", NUM_PERM, BANDS))
    stack_expr = ", ".join(f"{b}, band{b}" for b in range(BANDS))
    melted = banded.selectExpr(
        "doc_id", f"stack({BANDS}, {stack_expr}) AS (band_idx, bh)"
    )
    a, b = melted.alias("a"), melted.alias("b")
    cand = (
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
    joined = cand.join(
        doc_sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
        "doc_a",
    ).join(
        doc_sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
        "doc_b",
    )
    c = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = c / (F.size("sh_a") + F.size("sh_b") - c)
    pairs = joined.filter(jac >= JACCARD_THRESHOLD).select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b"), F.col("doc_a"))
    ).toDF("u", "v").localCheckpoint(eager=False)
    # ^ pinned BEFORE min_label_components (the dedup_clusters calling
    # convention): its count materializes the whole curation upstream
    # once and the single-task CC kernel reads persisted partitions —
    # unpinned, the coalesce(1) kernel re-ran the upstream serially
    # (measured 4.7 -> 7.6 s before this pin)
    # round-11: the original per-round min-label join loop (eager
    # checkpoint + changed-count join = 2+ driver jobs per round,
    # diameter rounds) predated functions/graph.min_label_components,
    # which computes the IDENTICAL (node, component-min) labeling in 2
    # jobs via partition-local contraction kernels — the dedup_clusters
    # path reused here
    from ..functions.graph import min_label_components

    labels = min_label_components(edges).select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    dropped = labels.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    return surv.join(dropped, "doc_id", "left_anti")


@register(
    "pipeline_curate",
    oracle=_PIPELINE_ORACLE,
    doc="Composed curation pipeline: quality gate -> exact dedup -> "
        "MinHash-LSH near-dup components, keeping each component's lowest "
        "doc_id. One SQL statement (recursive CTE) oracles the WHOLE "
        "composition, pinning stage ordering cross-engine.",
)
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curated_documents(spark, sf_dir).select("doc_id", "n_tokens")


# --------------------------------------------------------------------------
# pipeline_train_mix — the training-MIX composition (round 8)
# --------------------------------------------------------------------------

TM_BUDGET = 30_000  # token budget for the curated mix
TM_EPOCHS = 2
TM_SHARDS = 4


def _tm_oracle() -> str:
    from .text_curation import (
        BENCH_DOCS,
        DECON_N,
        _SHINGLE_SQL,
        _rate_case_sql,
    )

    return f"""
        WITH sh AS MATERIALIZED (
            SELECT DISTINCT doc_id, s
            FROM ({_SHINGLE_SQL.format(nm1=DECON_N - 1)})
        ), bench AS MATERIALIZED (
            SELECT DISTINCT s FROM sh WHERE doc_id < {BENCH_DOCS}
        ), contaminated AS (
            SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (s)
            WHERE sh.doc_id >= {BENCH_DOCS}
        ), clean AS (
            -- NOT EXISTS, not NOT IN: a NULL doc_id must behave like
            -- Spark's left_anti (kept), not vacuously filter every row
            SELECT d.doc_id, d.lang, d.text FROM documents d
            WHERE d.doc_id >= {BENCH_DOCS}
              AND NOT EXISTS (SELECT 1 FROM contaminated c
                              WHERE c.doc_id = d.doc_id)
        ), mixed AS (
            SELECT doc_id, text FROM clean
            WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                  < ({_rate_case_sql()})
        ), tok AS (
            SELECT doc_id,
                   CAST(strlen(text) AS BIGINT) AS n_bytes,
                   CAST(len(list_filter(
                       string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                       x -> x <> '')) AS BIGINT) AS n_tokens
            FROM mixed
        ), cum AS (
            SELECT doc_id, n_bytes, n_tokens,
                   CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM tok
        ), kept AS (
            SELECT * FROM cum WHERE cum_tokens <= {TM_BUDGET}
        ), eh AS (
            SELECT k.n_bytes, k.n_tokens, e.epoch,
                   CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)
                        || ':' || CAST(e.epoch AS VARCHAR)), 1, 13))
                        AS UBIGINT) AS hv
            FROM kept k,
                 (SELECT unnest(range(0, {TM_EPOCHS})) AS epoch) e
        )
        SELECT CAST(epoch AS INTEGER) AS epoch,
               CAST(hv % {TM_SHARDS} AS INTEGER) AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM eh
        GROUP BY 1, 2
    """


@register(
    "pipeline_train_mix",
    oracle=_tm_oracle(),
    doc="Composed training-MIX pipeline (the companion flagship to "
        "pipeline_curate's dedup chain): benchmark DECONTAMINATION "
        "(drop corpus docs sharing any word-4-gram with the held-out "
        "set; broadcast bench shingles) -> weighted MIXTURE sampling "
        "(deterministic per-language md5 thresholds) -> TOKEN-BUDGET "
        f"cut (docs in doc_id order until {TM_BUDGET} cumulative "
        "tokens — the budget boundary depends on every upstream "
        "survivor, so the composition is genuinely order-sensitive, "
        "computed with the distributed two-level running-sum kernel, "
        "no global window) -> per-EPOCH shard assignment "
        "(md5(doc_id:epoch) % shards) with a per-(epoch, shard) "
        "count/byte/token balance report. One SQL statement oracles "
        "the whole composition. Scale: decontamination is one "
        "broadcast semi-join over the shingle scan, mixture is "
        "map-side, the cumsum is the range-partitioned kernel, and "
        "the final agg is a bounded grid — every stage "
        "shuffle-bounded at 100 TB.",
    tags=("pipeline", "text", "curation"),
)
def pipeline_train_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_running_sums_dist
    from .text_curation import (
        BENCH_DOCS,
        DECON_N,
        MIXTURE_DEFAULT,
        MIXTURE_RATES,
    )

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "lang", "text")
    # stage 1: decontaminate against the held-out bench docs
    sh = docs.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), DECON_N)).alias("s"),
    ).distinct()
    bench = (
        sh.filter(F.col("doc_id") < BENCH_DOCS).select("s").distinct()
    )
    contaminated = (
        sh.filter(F.col("doc_id") >= BENCH_DOCS)
        .join(F.broadcast(bench), "s")
        .select("doc_id")
        .distinct()
    )
    clean = docs.filter(F.col("doc_id") >= BENCH_DOCS).join(
        contaminated, "doc_id", "left_anti"
    )
    # stage 2: per-language mixture sampling (map-side, derandomized)
    rate = F.lit(MIXTURE_DEFAULT)
    for lang, thr in MIXTURE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(thr)).otherwise(rate)
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    mixed = clean.filter(key < rate).select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    # stage 3: token-budget cut over the doc_id order (distributed
    # two-level cumsum — no unpartitioned window)
    cum = with_running_sums_dist(
        mixed, [F.asc("doc_id")], ["n_tokens"], prefix="cum_"
    )
    kept = cum.filter(F.col("cum_n_tokens") <= TM_BUDGET)
    # stage 4: per-epoch deterministic shard assignment + balance grid
    base = kept.select(
        "doc_id",
        "n_bytes",
        "n_tokens",
        F.explode(F.sequence(F.lit(0), F.lit(TM_EPOCHS - 1))).alias(
            "epoch"
        ),
    )
    hv = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("epoch").cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    return (
        base.select("n_bytes", "n_tokens", "epoch", hv.alias("hv"))
        .groupBy(
            F.col("epoch").cast("int").alias("epoch"),
            (F.col("hv") % TM_SHARDS).cast("int").alias("shard"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


# Composed MULTIMODAL curation: real image decode -> brightness
# quality gate -> text-dedup winner join, in one oracled query. The
# stage ordering (gate on DECODED stats, dedup on the paired text) is
# what the composition pins — each piece alone is already covered
# (mm_png_decode_stats, dedup_exact).
_MC_LO, _MC_HI = 126, 129  # mean-channel band, exact integer compare


@register(
    "pipeline_media_curate",
    oracle=f"""
        WITH docs AS (
            SELECT doc_id,
                   CAST(16 + doc_id % 13 AS INTEGER) AS width,
                   CAST(12 + doc_id % 7 AS INTEGER) AS height
            FROM documents WHERE doc_id >= 0 AND doc_id % 17 = 0
        ), xs AS (
            SELECT doc_id, width, height, unnest(range(0, width)) AS x
            FROM docs
        ), ys AS (
            SELECT doc_id, width, height, x,
                   unnest(range(0, height)) AS y
            FROM xs
        ), px AS (
            SELECT doc_id, width, height,
                   (x*3 + y*7 + doc_id*13) % 256
                   + (x*3 + y*7 + 11 + doc_id*13) % 256
                   + (x*3 + y*7 + 22 + doc_id*13) % 256 AS v
            FROM ys
        ), stats AS (
            SELECT doc_id, width, height,
                   CAST(SUM(v) AS BIGINT) AS px_total
            FROM px GROUP BY doc_id, width, height
        ), winners AS (
            SELECT min(doc_id) AS doc_id
            FROM documents
            GROUP BY md5(regexp_replace(lower(trim(text)),
                                        '[ \\t\\n\\r\\f]+', ' ', 'g'))
        )
        SELECT s.doc_id, s.width, s.height, s.px_total,
               CAST(CASE WHEN s.px_total >= {_MC_LO} * 3 * s.width * s.height
                          AND s.px_total <  {_MC_HI} * 3 * s.width * s.height
                         THEN 1 ELSE 0 END AS INTEGER) AS quality_pass,
               CAST(CASE WHEN w.doc_id IS NOT NULL THEN 1 ELSE 0 END
                    AS INTEGER) AS dedup_winner,
               CAST(CASE WHEN s.px_total >= {_MC_LO} * 3 * s.width * s.height
                          AND s.px_total <  {_MC_HI} * 3 * s.width * s.height
                          AND w.doc_id IS NOT NULL
                         THEN 1 ELSE 0 END AS INTEGER) AS curated
        FROM stats s
        LEFT JOIN winners w ON w.doc_id = s.doc_id
    """,
    doc="Composed multimodal curation manifest: REAL PNG decode "
        "(mm_png_decode_stats' full encode->stdlib-decode path) feeds "
        "a brightness quality gate (mean channel in [126,129), the "
        "cross-multiplied integer compare px_total vs bound*3*w*h — "
        "never a float mean), joined against the text-side exact-dedup "
        "winner set; `curated` marks images passing BOTH. Pins the "
        "pipeline ordering a 100 TB media-curation job runs: decode "
        "stats are map-only mapInPandas, the gate is a scalar filter, "
        "the dedup join meets the residue-filtered winner set (AQE broadcast at small scale, shuffle join at corpus scale). "
        "Reference analog: none (driver-contract extension; the "
        "text-side composition is pipeline_curate).",
    tags=("pipeline", "multimodal"),
)
def pipeline_media_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .media_decode import mm_png_decode_stats

    t = Tables(spark, sf_dir)
    stats = mm_png_decode_stats(spark, sf_dir).select(
        "doc_id",
        "width",
        "height",
        (F.col("r_sum") + F.col("g_sum") + F.col("b_sum")).alias("px_total"),
    )
    winners = (
        t.documents.groupBy(F.md5(normalized_text("text")))
        .agg(F.min("doc_id").alias("win_id"))
        .select("win_id")
        # only cohort ids can match — the residue filter cuts the
        # winner side 17x before the join (winners is CORPUS-sized, so
        # no broadcast hint: AQE picks broadcast at test scale and a
        # shuffle join at 100 TB, both correct)
        .where((F.col("win_id") % 17 == 0) & (F.col("win_id") >= 0))
    )
    lo = F.lit(3 * _MC_LO) * F.col("width") * F.col("height")
    hi = F.lit(3 * _MC_HI) * F.col("width") * F.col("height")
    quality = (F.col("px_total") >= lo) & (F.col("px_total") < hi)
    is_win = F.col("win_id").isNotNull()
    return (
        stats.join(
            winners,
            F.col("doc_id") == F.col("win_id"),
            "left",
        )
        .select(
            "doc_id",
            "width",
            "height",
            "px_total",
            F.when(quality, 1).otherwise(0).cast("int").alias("quality_pass"),
            F.when(is_win, 1).otherwise(0).cast("int").alias("dedup_winner"),
            F.when(quality & is_win, 1)
            .otherwise(0)
            .cast("int")
            .alias("curated"),
        )
    )
