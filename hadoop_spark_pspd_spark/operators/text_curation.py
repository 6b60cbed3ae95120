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

# weighted-mixture targets: per-language keep rate as a 2-hex-digit md5
# prefix threshold (fraction = int(threshold,16)/256) — string compare of
# lowercase hex is numeric compare, identical in Spark and DuckDB
MIXTURE_RATES = {"en": "80", "de": "40", "es": "40", "fr": "40", "zh": "20"}
MIXTURE_DEFAULT = "10"
SHARD_BUDGET = 2000  # tokens per training shard
SHARD_BUCKET_W = 100  # doc_ids per prefix-sum bucket

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
    # round-12 (guide §2.4): the statistic is entirely PER-DOCUMENT, so
    # the explode -> groupBy(doc_id, s) -> groupBy(doc_id) round trip
    # (two corpus-scale exchanges) is replaced by ONE map-side fold
    # over the doc's sorted gram array: a single aggregate() pass
    # yields (total, distinct, max run) — run lengths of the sorted
    # array ARE the per-gram counts. The gram expression is referenced
    # exactly once (inside sort_array), so CollapseProject cannot
    # re-evaluate the tokenize per output column (the round-8 trap).
    # The token-count pre-filter mirrors the old explode-drop of docs
    # with no 2-grams. Zero exchanges, zero joins.
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    acc_t = "struct<n:bigint,d:bigint,best:bigint,cur:bigint,prev:string>"
    init = F.lit(None).cast(acc_t)

    def step(acc, x):
        new_run = acc.isNull() | (x != acc["prev"])
        cur = F.when(new_run, F.lit(1).cast("bigint")).otherwise(
            acc["cur"] + 1
        )
        return F.struct(
            (F.coalesce(acc["n"], F.lit(0).cast("bigint")) + 1).alias("n"),
            (
                F.coalesce(acc["d"], F.lit(0).cast("bigint"))
                + F.when(new_run, 1).otherwise(0)
            ).alias("d"),
            F.greatest(
                F.coalesce(acc["best"], F.lit(0).cast("bigint")), cur
            ).alias("best"),
            cur.alias("cur"),
            x.alias("prev"),
        )

    stats = F.aggregate(
        F.sort_array(word_ngrams(toks, REP_N)),
        init,
        step,
        lambda acc: F.struct(
            acc["n"].alias("n2g"),
            acc["d"].alias("d2g"),
            acc["best"].alias("maxc"),
        ),
    )
    agg = (
        t.documents
        .repartition(spark.sparkContext.defaultParallelism)
        .filter(F.size(toks) >= REP_N)
        .select("doc_id", stats.alias("st"))
        .select(
            "doc_id",
            F.col("st.n2g").alias("n2g"),
            F.col("st.d2g").alias("d2g"),
            F.col("st.maxc").alias("maxc"),
        )
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
    # NOT pinned despite two consumers (round-11 A/B): the branches
    # carry DISJOINT pushed-down doc_id predicates (< vs >= BENCH_DOCS),
    # so the two "duplicate" pipelines scan disjoint slices ~ one full
    # scan total; a localCheckpoint here materializes the WHOLE shingle
    # table first and loses the pushdown (measured 5.1 -> 6.5 s at
    # sf0.1, reverted)
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


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN '{thr}'" for lang, thr in MIXTURE_RATES.items()
    )
    return f"CASE lang {whens} ELSE '{MIXTURE_DEFAULT}' END"


@register(
    "text_mixture_sample",
    oracle=f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
              < ({_rate_case_sql()})
    """,
    doc="Weighted dataset mixture: deterministic per-language Bernoulli "
        "sampling via an md5(doc_id) 2-hex-digit threshold (en 50%, "
        "de/es/fr 25%, zh 12.5%, default 6.25%). A pure map-side filter "
        "— no shuffle, no RNG state, reproducible across engines and "
        "cluster sizes; the standard way to re-weight corpus sources "
        "for a training mix at 100 TB.",
)
def text_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    rate = F.lit(MIXTURE_DEFAULT)
    for lang, thr in MIXTURE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(thr)).otherwise(rate)
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return t.documents.filter(key < rate).select("doc_id", "lang", "source")


@register(
    "text_pack_shards",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   CAST(len(list_filter(
                       string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                       x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
               CAST((CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens)
                   // {SHARD_BUDGET} AS BIGINT) AS shard
        FROM tok
    """,
    doc=f"Token-budget shard packing: assign docs (in doc_id order) to "
        f"{SHARD_BUDGET}-token training shards by running token count. "
        "The global prefix sum is computed scalably in two levels: a "
        "window WITHIN each doc_id bucket plus broadcast per-bucket "
        "offsets (one tiny single-partition window over n_buckets rows) "
        "— no global single-partition window over the corpus, the "
        "classic parallel prefix-sum shape. Oracle states the same "
        "result as one global window; integer arithmetic, bit-exact.",
)
def text_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        (F.col("doc_id") / SHARD_BUCKET_W).cast("bigint").alias("bucket"),
    )
    within = F.sum("n_tokens").over(
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_doc = tok.withColumn("within_cum", within)
    from ..functions.ranking import with_running_sums_dist

    # bucket-axis offsets via the distributed exclusive running sum
    # (the axis grows with the corpus — no unpartitioned window)
    offsets = with_running_sums_dist(
        tok.groupBy("bucket").agg(F.sum("n_tokens").alias("btot")),
        [F.col("bucket").asc()],
        ["btot"],
        prefix="off_",
        inclusive=False,
    ).select("bucket", F.col("off_btot").alias("offset"))
    cum = (F.col("offset") + F.col("within_cum")).alias("cum_tokens")
    return (
        per_doc.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            cum,
            F.expr(f"(offset + within_cum - n_tokens) div {SHARD_BUDGET}")
            .alias("shard"),
        )
    )


@register(
    "text_source_profile",
    oracle="""
        WITH fp AS (
            SELECT source, lang, doc_id,
                   md5(regexp_replace(lower(trim(text)),
                       '[ \\t\\n\\r\\f]+', ' ', 'g')) AS f,
                   CAST(len(list_filter(
                       string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                       x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_tokens) AS BIGINT) / count(*) AS avg_tokens,
               (count(*) - count(DISTINCT f)) / count(*) AS dup_rate
        FROM fp GROUP BY source
    """,
    doc="Per-source corpus profile (the 'corpus card' a curation run "
        "publishes per ingest source): doc count, language spread, "
        "token volume, and exact-dup rate from the normalized-content "
        "fingerprint — one shuffle on source after a map-side "
        "fingerprint+count projection. Ratios are exact-int/int "
        "divisions per the cross-engine determinism convention.",
)
def text_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import normalized_text

    t = Tables(spark, sf_dir)
    fp = t.documents.select(
        "source",
        "lang",
        F.md5(normalized_text("text")).alias("f"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    return fp.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens") / F.count("*")).alias("avg_tokens"),
        (
            (F.count("*") - F.countDistinct("f")) / F.count("*")
        ).alias("dup_rate"),
    )


_DSIR_B = 1024           # hashed-unigram buckets
_DSIR_FX = 1 << 30       # probability quantum (exact integer division)
_DSIR_TARGET = "src0"    # the "domain we want more of"
_DSIR_TOP = 100

_DSIR_TOKENS = (
    "list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), x -> x <> '')"
)


@register(
    "text_dsir_weights",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, unnest({_DSIR_TOKENS}) AS tk
            FROM documents
        ), bt AS (
            SELECT doc_id, source,
                   CAST(CAST(('0x' || substr(md5(tk), 1, 8)) AS UBIGINT)
                        % {_DSIR_B} AS BIGINT) AS bucket
            FROM toks
        ), tcnt AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS ct
            FROM bt WHERE source = '{_DSIR_TARGET}' GROUP BY bucket
        ), rcnt AS (
            SELECT bucket, CAST(count(*) AS BIGINT) AS cr
            FROM bt GROUP BY bucket
        ), tot AS (
            SELECT CAST((SELECT count(*) FROM bt
                         WHERE source = '{_DSIR_TARGET}') AS BIGINT) AS tt,
                   CAST((SELECT count(*) FROM bt) AS BIGINT) AS tr
        ), w AS (
            SELECT r.bucket,
                   ((COALESCE(t.ct, 0) + 1) * {_DSIR_FX}) // (tot.tt + {_DSIR_B})
                   - ((r.cr + 1) * {_DSIR_FX}) // (tot.tr + {_DSIR_B})
                       AS diff_fx
            FROM rcnt r LEFT JOIN tcnt t ON t.bucket = r.bucket, tot
        ), db AS (
            SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS n
            FROM bt GROUP BY doc_id, bucket
        ), scored AS (
            SELECT db.doc_id,
                   CAST(SUM(db.n * w.diff_fx) AS BIGINT) AS score_fx,
                   CAST(SUM(db.n) AS BIGINT) AS n_tokens
            FROM db JOIN w ON w.bucket = db.bucket
            GROUP BY db.doc_id
        )
        SELECT doc_id, score_fx, n_tokens, rk FROM (
            SELECT doc_id, score_fx, n_tokens,
                   row_number() OVER (
                       ORDER BY score_fx DESC, doc_id
                   ) AS rk
            FROM scored
        ) WHERE rk <= {_DSIR_TOP}
    """,
    doc="DSIR-style data selection (Xie et al. 2023, linearized): "
        f"hashed-unigram distributions ({_DSIR_B} md5 buckets, add-one "
        f"smoothing) for the target domain (source='{_DSIR_TARGET}') "
        "and the raw corpus; each doc scores the sum over its tokens "
        "of the smoothed probability DIFFERENCE p_t(b) - p_r(b), and "
        f"the top-{_DSIR_TOP} most target-like docs are selected. The "
        "log-likelihood-ratio of real DSIR is replaced by the exact "
        "first-order difference so the whole score is integer: "
        "probabilities quantize via EXACT integer division "
        "((c+1)*2^30 div (T+B) — no float floor-at-boundary risk, "
        "truncation semantics agree between Spark div and DuckDB //), "
        "token counts multiply in, sums stay BIGINT. Scale: two "
        f"{_DSIR_B}-row distribution tables broadcast; the corpus is "
        "scanned once (doc-bucket partial aggs); the global top-k "
        "window would swap to per-partition top-k + merge at 100 TB. "
        "No driver state, no vocabulary: the hashing trick again. "
        "OVERFLOW BOUND: (c+1)*2^30 wraps int64 only when one bucket "
        "holds > 2^33 (~8.6e9) tokens — a ~9-trillion-token corpus at "
        "1024 buckets; past that, raise _DSIR_B (counts split across "
        "buckets) or drop _DSIR_FX to 2^20 before deploying.",
    tags=("text", "curation"),
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bt = t.documents.select(
        "doc_id",
        "source",
        F.explode(tokens(F.col("text"))).alias("tk"),
    ).select(
        "doc_id",
        "source",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("tk")), 1, 8), 16, 10).cast(
                "bigint"
            ),
            F.lit(_DSIR_B),
        )
        .cast("bigint")
        .alias("bucket"),
    )
    tcnt = (
        bt.filter(F.col("source") == _DSIR_TARGET)
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("ct"))
    )
    rcnt = bt.groupBy("bucket").agg(F.count("*").cast("bigint").alias("cr"))
    totals = bt.agg(
        F.sum(F.when(F.col("source") == _DSIR_TARGET, 1).otherwise(0))
        .cast("bigint")
        .alias("tt"),
        F.count("*").cast("bigint").alias("tr"),
    )
    w = (
        rcnt.join(tcnt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.expr(
                f"((coalesce(ct, 0) + 1) * {_DSIR_FX}) div (tt + {_DSIR_B})"
                f" - ((cr + 1) * {_DSIR_FX}) div (tr + {_DSIR_B})"
            ).alias("diff_fx"),
        )
    )
    db = bt.groupBy("doc_id", "bucket").agg(
        F.count("*").cast("bigint").alias("n")
    )
    scored = (
        db.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("n") * F.col("diff_fx"))
            .cast("bigint")
            .alias("score_fx"),
            F.sum("n").cast("bigint").alias("n_tokens"),
        )
    )
    from ..functions.ranking import ranked_rows

    # distributed top-k (TakeOrderedAndProject — the repo idiom), then
    # a windowless rank over the surviving constant-size rows
    top = scored.orderBy(
        F.desc("score_fx"), F.asc("doc_id")
    ).limit(_DSIR_TOP)
    return ranked_rows(
        top,
        [-F.col("score_fx"), F.col("doc_id")],
        ["doc_id", "score_fx", "n_tokens"],
        rank_col="rk",
    ).select(
        "doc_id",
        "score_fx",
        "n_tokens",
        F.col("rk").cast("long").alias("rk"),
    )


_TEMP_FX = 1 << 20  # fixed-point quantum for sqrt weights
_TEMP_BUDGET = 10_000  # sample budget to allocate across sources


@register(
    "text_temperature_mix",
    oracle=f"""
        WITH counts AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        ), wq AS (
            SELECT source, n_docs,
                   CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * {_TEMP_FX})
                        AS BIGINT) AS weight_fx
            FROM counts
        ), tot AS (
            SELECT CAST(SUM(weight_fx) AS BIGINT) AS tw FROM wq
        ), base AS (
            SELECT w.source, w.n_docs, w.weight_fx,
                   ({_TEMP_BUDGET} * w.weight_fx) // t.tw AS alloc0,
                   ({_TEMP_BUDGET} * w.weight_fx) % t.tw AS rem,
                   t.tw AS tw
            FROM wq w CROSS JOIN tot t
        ), ranked AS (
            SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
                   CAST(SUM(alloc0) OVER () AS BIGINT) AS alloc_sum
            FROM base
        )
        SELECT source, n_docs, weight_fx,
               CAST(alloc0 + CASE WHEN rk <= {_TEMP_BUDGET} - alloc_sum
                                  THEN 1 ELSE 0 END AS BIGINT) AS alloc,
               CAST(weight_fx AS DOUBLE) / CAST(tw AS DOUBLE) AS share
        FROM ranked
    """,
    doc="Temperature-scaled source mixture (the T5/mT5 alpha-sampling "
        "rebalance, alpha = 0.5): per-source sampling weight n^0.5 "
        "flattens the source distribution so low-resource sources are "
        "upsampled; a 10k-draw budget is allocated by the largest-"
        "remainder method so allocations are integers summing exactly "
        "to the budget. alpha = 0.5 is the one temperature with an "
        "exactly-oracle-able power: sqrt is correctly rounded in both "
        "engines, quantized to fixed point (floor(sqrt(n) * 2^20)) "
        "BEFORE the order-dependent sum so the total is an exact "
        "integer; quotas use exact integer div/mod (Spark `div` == "
        "DuckDB `//`, both truncating) and the tie-ranked remainders "
        "carry a unique source tie-break. The only double emitted is "
        "one exact-int division (share). Scale: everything after the "
        "per-source count (one partial-agg shuffle) is 20 rows.",
    tags=("text", "curation"),
)
def text_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    counts = t.documents.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    wq = counts.withColumn(
        "weight_fx",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * _TEMP_FX).cast(
            "bigint"
        ),
    )
    tot = wq.agg(F.sum("weight_fx").cast("bigint").alias("tw"))
    base = (
        wq.crossJoin(F.broadcast(tot))
        .withColumn(
            "alloc0", F.expr(f"({_TEMP_BUDGET} * weight_fx) div tw")
        )
        .withColumn(
            "rem", (F.lit(_TEMP_BUDGET) * F.col("weight_fx")) % F.col("tw")
        )
    )
    from ..functions.ranking import ranked_rows

    # sources are a bounded dimension — windowless rank + a broadcast
    # grand total instead of two unpartitioned windows
    tot_alloc = base.agg(
        F.sum("alloc0").cast("bigint").alias("alloc_sum")
    )
    ranked = ranked_rows(
        base,
        [-F.col("rem"), F.col("source")],
        ["source", "n_docs", "weight_fx", "alloc0", "tw"],
        rank_col="rk",
    ).crossJoin(F.broadcast(tot_alloc))
    return ranked.select(
        "source",
        "n_docs",
        "weight_fx",
        (
            F.col("alloc0")
            + F.when(
                F.col("rk") <= _TEMP_BUDGET - F.col("alloc_sum"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc"),
        (F.col("weight_fx").cast("double") / F.col("tw").cast("double"))
        .alias("share"),
    )


# ---------------------------------------------------------------------------
# Gopher quality-rule battery (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher" — public rule set).
# Every rule is an exact integer count compared via CROSS-MULTIPLICATION
# (3*n <= sum_len, never sum_len/n >= 3.0), so no division ever reaches a
# hashed column and the booleans are bit-identical cross-engine.

_GOPHER_MIN_WORDS = 5
_GOPHER_MAX_WORDS = 100_000
_GOPHER_STOPWORDS = ("the", "a", "to", "of", "and", "that", "have", "with")
_GOPHER_MIN_STOP = 2

_STOP_SQL = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)


@register(
    "text_gopher_rules",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text,
                                                  '[ \t\n\r\f]+'),
                               x -> x <> '') AS w,
                   strlen(text) AS nb,
                   strlen(replace(text, '#', '')) AS nb_hash,
                   strlen(replace(text, '...', '')) AS nb_ell
            FROM documents
        ), m AS (
            SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_words,
                   CAST(coalesce(list_sum(
                       list_transform(w, x -> strlen(x))), 0)
                       AS BIGINT) AS sum_wlen,
                   CAST(len(list_filter(w,
                       x -> regexp_matches(x, '[A-Za-z]')))
                       AS BIGINT) AS n_alpha,
                   CAST(len(list_intersect(w, [{_STOP_SQL}]))
                       AS BIGINT) AS n_stop,
                   CAST((nb - nb_hash)
                        + (nb - nb_ell) // 3 AS BIGINT) AS n_symbols
            FROM toks
        )
        SELECT doc_id, n_words, sum_wlen, n_alpha, n_stop, n_symbols,
               (n_words >= {_GOPHER_MIN_WORDS}
                AND n_words <= {_GOPHER_MAX_WORDS}) AS r_words,
               (3 * n_words <= sum_wlen
                AND sum_wlen <= 10 * n_words) AS r_wlen,
               (10 * n_symbols <= n_words) AS r_symbols,
               (5 * n_alpha >= 4 * n_words) AS r_alpha,
               (n_stop >= {_GOPHER_MIN_STOP}) AS r_stop,
               (n_words >= {_GOPHER_MIN_WORDS}
                AND n_words <= {_GOPHER_MAX_WORDS}
                AND 3 * n_words <= sum_wlen
                AND sum_wlen <= 10 * n_words
                AND 10 * n_symbols <= n_words
                AND 5 * n_alpha >= 4 * n_words
                AND n_stop >= {_GOPHER_MIN_STOP}) AS keep
        FROM m
    """,
    doc="Gopher quality-filter rule battery (Rae et al. 2021, public "
        "rule set): per-doc word-count bounds, mean-word-length bounds "
        "(3..10 bytes), symbol-to-word ratio ('#' and '...' marks), "
        "fraction of words with an alphabetic character >= 0.8, and "
        ">= 2 distinct stopwords present. Every rule is an exact "
        "integer count compared by cross-multiplication — no division "
        "reaches the output, so the booleans are bit-identical cross-"
        "engine. The whole plan is per-row higher-order functions over "
        "the token array (size/aggregate/filter/array_intersect): ONE "
        "corpus scan, ZERO shuffles — the ideal 100 TB shape for a "
        "row-local quality gate. Word length is BYTE-defined "
        "(octet_length == DuckDB strlen, CLAUDE.md round-4 rule). The "
        "reference has no curation surface (WordCount lab); this "
        "extends the LLM-pipeline north star (SURVEY §7).",
    tags=("text", "curation"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    d = t.documents.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.aggregate(
            toks,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.octet_length(x).cast("bigint"),
        ).alias("sum_wlen"),
        F.size(
            F.filter(toks, lambda x: x.rlike("[A-Za-z]"))
        ).cast("bigint").alias("n_alpha"),
        F.size(
            F.array_intersect(
                toks, F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS])
            )
        ).cast("bigint").alias("n_stop"),
        (
            (F.octet_length("text")
             - F.octet_length(F.replace(F.col("text"), F.lit("#"))))
            + F.expr(
                "(octet_length(text)"
                " - octet_length(replace(text, '...', ''))) div 3"
            )
        ).cast("bigint").alias("n_symbols"),
    )
    r_words = (F.col("n_words") >= _GOPHER_MIN_WORDS) & (
        F.col("n_words") <= _GOPHER_MAX_WORDS
    )
    r_wlen = (3 * F.col("n_words") <= F.col("sum_wlen")) & (
        F.col("sum_wlen") <= 10 * F.col("n_words")
    )
    r_symbols = 10 * F.col("n_symbols") <= F.col("n_words")
    r_alpha = 5 * F.col("n_alpha") >= 4 * F.col("n_words")
    r_stop = F.col("n_stop") >= _GOPHER_MIN_STOP
    return d.select(
        "doc_id", "n_words", "sum_wlen", "n_alpha", "n_stop", "n_symbols",
        r_words.alias("r_words"),
        r_wlen.alias("r_wlen"),
        r_symbols.alias("r_symbols"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stop"),
        (r_words & r_wlen & r_symbols & r_alpha & r_stop).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Fixed-phrase blocklist filter (the C4 "bad words" gate shape): count
# non-overlapping occurrences of each phrase via the replace-length trick
# — both engines replace left-to-right non-overlapping, and the length
# delta divides the phrase length exactly, so the counts are exact ints.

_BLOCK_PHRASES = ("slow scan", "big table", "drop table", "value value")


def _block_cols_sql() -> str:
    cols = []
    for i, p in enumerate(_BLOCK_PHRASES, 1):
        cols.append(
            f"CAST((strlen(text) - strlen(replace(text, '{p}', '')))"
            f" // {len(p)} AS BIGINT) AS hits_{i}"
        )
    return ",\n                   ".join(cols)


@register(
    "text_blocklist_hits",
    oracle=f"""
        WITH h AS (
            SELECT doc_id,
                   CAST(len(list_filter(
                       string_split_regex(text, '[ \t\n\r\f]+'),
                       x -> x <> '')) AS BIGINT) AS n_words,
                   {_block_cols_sql()}
            FROM documents
        )
        SELECT doc_id, n_words, hits_1, hits_2, hits_3, hits_4,
               CAST(hits_1 + hits_2 + hits_3 + hits_4 AS BIGINT)
                   AS n_hits,
               (hits_1 + hits_2 + hits_3 + hits_4) = 0 AS keep,
               (20 * (hits_1 + hits_2 + hits_3 + hits_4) <= n_words)
                   AS under_rate
        FROM h
    """,
    doc="Fixed-phrase blocklist gate (the C4-style 'bad words' filter, "
        "public recipe): per-doc non-overlapping occurrence counts of "
        "each blocklist phrase via the replace-length trick — "
        "(len(text) - len(replace(text, p, ''))) div len(p) is an "
        "exact integer in both engines because replace is left-to-"
        "right non-overlapping in both. Emits per-phrase counts, the "
        "zero-tolerance keep flag, and a rate-based flag (20x cross-"
        "multiplied, no division). Pure per-row string expressions: "
        "one scan, zero shuffles, whole-stage-codegen end to end — "
        "the gate composes with any downstream pipeline stage for "
        "free at 100 TB.",
    tags=("text", "curation"),
)
def text_blocklist_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cols = [F.col("doc_id"),
            F.size(tokens(F.col("text"))).cast("bigint").alias("n_words")]
    for i, p in enumerate(_BLOCK_PHRASES, 1):
        cols.append(
            F.expr(
                f"CAST((octet_length(text)"
                f" - octet_length(replace(text, '{p}', '')))"
                f" div {len(p)} AS BIGINT)"
            ).alias(f"hits_{i}")
        )
    h = t.documents.select(*cols)
    total = sum(
        (F.col(f"hits_{i}") for i in range(2, len(_BLOCK_PHRASES) + 1)),
        F.col("hits_1"),
    )
    return h.select(
        "doc_id", "n_words", "hits_1", "hits_2", "hits_3", "hits_4",
        total.cast("bigint").alias("n_hits"),
        (total == 0).alias("keep"),
        (20 * total <= F.col("n_words")).alias("under_rate"),
    )
