"""Text-analysis operators over ``documents`` (north-star surface).

All built-in higher-order functions (JVM-side, codegen'd) — no UDFs:
token counting, quality scoring (length/stopword ratios), n-gram-heuristic
language ID, and content fingerprinting (md5 over normalized text — portable
across engines, unlike xxhash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.text import normalized_text, tokens
from ..registry import register

STOPWORDS = ("the", "a", "of", "and", "to", "in")
# marker tokens per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "la", "les", "et"),
    "de": ("der", "die", "das", "und"),
}

_SQL_TOKENS = "list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), x -> x <> '')"


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(lst, x)))


def _sql_hits(words: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(w, x -> x IN ({in_list})))"


@register(
    "text_stats",
    oracle=f"""
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_tokens,
               CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nospace,
               CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(w)
                   AS avg_token_len
        FROM (SELECT doc_id, text, {_SQL_TOKENS} AS w FROM documents)
        WHERE len(w) > 0
    """,
    doc="Token counting + average token length per document.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks).cast("bigint")
    n_chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("bigint")
    return (
        t.documents.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            n_chars.alias("n_chars_nospace"),
            (n_chars.cast("double") / n_tokens).alias("avg_token_len"),
        )
        .filter(F.col("n_tokens") > 0)
    )


@register(
    "text_quality",
    oracle=f"""
        SELECT doc_id, n_tokens, stop_hits,
               CAST(stop_hits AS DOUBLE) / n_tokens AS stopword_ratio,
               (n_tokens BETWEEN 10 AND 1000
                AND CAST(stop_hits AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.6)
                   AS is_quality
        FROM (
            SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_tokens,
                   CAST({_sql_hits(STOPWORDS)} AS BIGINT) AS stop_hits
            FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents)
        )
        WHERE n_tokens > 0
    """,
    doc="Quality scoring: length bounds + stopword-ratio bounds "
        "(the C4/Gopher-style rule shape).",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    base = t.documents.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        _hits(toks, STOPWORDS).cast("bigint").alias("stop_hits"),
    ).filter(F.col("n_tokens") > 0)
    ratio = F.col("stop_hits").cast("double") / F.col("n_tokens")
    return base.select(
        "doc_id",
        "n_tokens",
        "stop_hits",
        ratio.alias("stopword_ratio"),
        (
            F.col("n_tokens").between(10, 1000) & ratio.between(0.01, 0.6)
        ).alias("is_quality"),
    )


@register(
    "text_langid",
    oracle=f"""
        SELECT doc_id,
               en_hits, es_hits, fr_hits, de_hits,
               CASE
                   WHEN greatest(en_hits, es_hits, fr_hits, de_hits) = 0 THEN 'und'
                   WHEN en_hits >= greatest(es_hits, fr_hits, de_hits) THEN 'en'
                   WHEN es_hits >= greatest(fr_hits, de_hits) THEN 'es'
                   WHEN fr_hits >= de_hits THEN 'fr'
                   ELSE 'de'
               END AS predicted_lang
        FROM (
            SELECT doc_id,
                   CAST({_sql_hits(LANG_MARKERS['en'])} AS BIGINT) AS en_hits,
                   CAST({_sql_hits(LANG_MARKERS['es'])} AS BIGINT) AS es_hits,
                   CAST({_sql_hits(LANG_MARKERS['fr'])} AS BIGINT) AS fr_hits,
                   CAST({_sql_hits(LANG_MARKERS['de'])} AS BIGINT) AS de_hits
            FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents)
        )
    """,
    doc="Marker-token language-ID heuristic with deterministic tie order "
        "en > es > fr > de.",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    base = t.documents.select(
        "doc_id",
        *[
            _hits(toks, LANG_MARKERS[lang]).cast("bigint").alias(f"{lang}_hits")
            for lang in ("en", "es", "fr", "de")
        ],
    )
    en, es, fr, de = (F.col(f"{l}_hits") for l in ("en", "es", "fr", "de"))
    predicted = (
        F.when(F.greatest(en, es, fr, de) == 0, "und")
        .when(en >= F.greatest(es, fr, de), "en")
        .when(es >= F.greatest(fr, de), "es")
        .when(fr >= de, "fr")
        .otherwise("de")
    )
    return base.select("*", predicted.alias("predicted_lang"))


@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\r\\f]+', ' ', 'g'))
                   AS content_fp,
               md5(array_to_string(
                   list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), x -> x <> ''),
                   ' ')) AS token_fp
        FROM documents
    """,
    doc="Document fingerprinting: md5 over normalized text and over the "
        "canonical token stream (portable content hashes).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.md5(normalized_text("text")).alias("content_fp"),
        F.md5(F.concat_ws(" ", tokens(F.col("text")))).alias("token_fp"),
    )


# GPT-2-style pre-tokenizer, lookahead-free so Java regex (Spark) and RE2
# (DuckDB) agree: contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs. Leftmost-first alternation in both engines.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+"


@register(
    "text_bpe_tokens",
    oracle="""
        SELECT doc_id,
               CAST(len(bpe) AS INTEGER) AS n_bpe,
               CAST(len(ws) AS INTEGER) AS n_ws,
               len(bpe) / len(ws) AS bpe_per_ws,
               bpe[1] AS first_tok,
               bpe[-1] AS last_tok
        FROM (
            SELECT doc_id,
                   regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+')
                       AS bpe,
                   list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
                               x -> x <> '') AS ws
            FROM documents
        )
        WHERE len(ws) > 0 AND len(bpe) > 0
    """,
    doc="BPE-ish token counting (north-star text pipeline): a GPT-2-style "
        "pre-tokenizer regex kept lookahead-free so Spark's Java regex and "
        "DuckDB's RE2 produce identical token streams; reported next to "
        "whitespace token counts (tokens-per-word ratio = int/int, one "
        "deterministic FP divide).",
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    from ..functions.text import tokens

    d = t.documents.select(
        "doc_id",
        F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0).alias("bpe"),
        tokens(F.col("text")).alias("ws"),
    ).filter((F.size("ws") > 0) & (F.size("bpe") > 0))
    return d.select(
        "doc_id",
        F.size("bpe").alias("n_bpe"),
        F.size("ws").alias("n_ws"),
        (F.size("bpe") / F.size("ws")).alias("bpe_per_ws"),
        F.col("bpe").getItem(0).alias("first_tok"),
        F.element_at("bpe", -1).alias("last_tok"),
    )


@register(
    "text_inverted_index",
    oracle="""
        WITH posting AS (
            SELECT DISTINCT word, doc_id FROM (
                SELECT doc_id,
                       unnest(list_filter(string_split_regex(lower(text),
                           '[ \t\n\r\f]+'), x -> x <> '')) AS word
                FROM documents
            )
        )
        SELECT word,
               count(*) AS df,
               list_aggr(list_sort(list(doc_id))[1:8],
                         'string_agg', ',') AS head_postings
        FROM posting
        GROUP BY word
    """,
    doc="Search-index build: word -> document-frequency + the first 8 "
        "doc_ids of the sorted posting list (serialized to a CSV string "
        "so the comparison is order-exact). distinct (word, doc) then one "
        "groupBy — posting lists shuffle once, pre-deduped map-side.",
    tags=("text",),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    posting = (
        t.documents.select(
            "doc_id",
            F.explode(tokens(F.lower("text"))).alias("word"),
        )
        .distinct()
    )
    return posting.groupBy("word").agg(
        F.count("*").alias("df"),
        F.concat_ws(
            ",",
            F.slice(F.array_sort(F.collect_list("doc_id")), 1, 8),
        ).alias("head_postings"),
    )


@register(
    "text_tfidf_topk",
    oracle="""
        WITH tf AS (
            SELECT word, doc_id, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(list_filter(string_split_regex(lower(text),
                           '[ \t\n\r\f]+'), x -> x <> '')) AS word
                FROM documents
            ) GROUP BY 1, 2
        ),
        df AS (
            SELECT word, count(*) AS df FROM tf GROUP BY word
        ),
        scored AS (
            SELECT t.word, t.doc_id, t.tf, d.df,
                   CAST(t.tf * (SELECT count(*) FROM documents) AS DOUBLE)
                       / d.df AS score
            FROM tf t JOIN df d ON t.word = d.word
        )
        SELECT word, doc_id, tf, df, score FROM (
            SELECT *, row_number() OVER (PARTITION BY word
                       ORDER BY score DESC, doc_id) AS rk
            FROM scored
        ) WHERE rk <= 3
    """,
    doc="Log-free TF-IDF ranking: score = tf * N / df (the rational idf "
        "N/df replaces log(N/df) — same ordering per word, no "
        "transcendental so the hash is exact). Top-3 documents per word "
        "with doc_id tie-break; df table broadcasts back onto tf.",
    tags=("text",),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    tf = (
        t.documents.select(
            "doc_id", F.explode(tokens(F.lower("text"))).alias("word")
        )
        .groupBy("word", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = t.documents.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "word")
        .join(F.broadcast(n_docs))
        .select(
            "word",
            "doc_id",
            "tf",
            "df",
            (
                (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
            ).alias("score"),
        )
    )
    w = W.partitionBy("word").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("word", "doc_id", "tf", "df", "score")
    )


@register(
    "text_bm25_topk",
    oracle="""
        WITH tf AS (
            SELECT word, doc_id, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(list_filter(string_split_regex(lower(text),
                           '[ \t\n\r\f]+'), x -> x <> '')) AS word
                FROM documents
            ) GROUP BY 1, 2
        ),
        dl AS (
            SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
        ),
        stats AS (
            SELECT CAST(SUM(dl) AS BIGINT) AS tot_toks,
                   count(*) AS n_docs
            FROM dl
        ),
        df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        scored AS (
            SELECT t.word, t.doc_id, t.tf, d.df, l.dl,
                   ((CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
                   * ((CAST(t.tf AS DOUBLE) * 2.2)
                      / (t.tf + 1.2 * (0.25 + 0.75
                         * (l.dl / (CAST(s.tot_toks AS DOUBLE) / s.n_docs)))))
                       AS score
            FROM tf t
            JOIN df d ON t.word = d.word
            JOIN dl l ON t.doc_id = l.doc_id
            CROSS JOIN stats s
        )
        SELECT word, doc_id, tf, df, dl, score FROM (
            SELECT *, row_number() OVER (PARTITION BY word
                       ORDER BY score DESC, doc_id) AS rk
            FROM scored
        ) WHERE rk <= 3
    """,
    doc="Okapi BM25 ranking (k1=1.2, b=0.75), top-3 documents per word: "
        "the tf-saturation term tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) is "
        "full BM25; the idf factor uses the rational odds "
        "(N-df+0.5)/(df+0.5) — the argument of BM25's log — instead of "
        "the log itself (repo convention: no transcendentals in hashed "
        "outputs; log is monotone, so per-word rankings are identical "
        "and only the absolute scale differs). Every arithmetic step is "
        "a correctly-rounded IEEE op evaluated in the same order in both "
        "engines, so scores are bit-identical without rounding. Plan: "
        "tf one shuffle; df and dl broadcast back; window top-3 "
        "partitioned by word with doc_id tie-break.",
    tags=("text",),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    tf = (
        t.documents.select(
            "doc_id", F.explode(tokens(F.lower("text"))).alias("word")
        )
        .groupBy("word", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.sum("dl").cast("long").alias("tot_toks"),
        F.count("*").alias("n_docs"),
    )
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    avgdl = F.col("tot_toks").cast("double") / F.col("n_docs")
    idf = (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    sat = (F.col("tf").cast("double") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * (F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(df), "word")
        .join(F.broadcast(dl), "doc_id")
        .join(F.broadcast(stats))
        .select("word", "doc_id", "tf", "df", "dl", (idf * sat).alias("score"))
    )
    w = W.partitionBy("word").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("word", "doc_id", "tf", "df", "dl", "score")
    )


_FH_BUCKETS = 256
_FH_WRANGE = 2001  # weights in [-1000, 1000] thousandths


@register(
    "text_feature_hashing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_SQL_TOKENS}) AS tk FROM documents
        ), hashed AS (
            SELECT doc_id,
                   CAST(CAST(('0x' || substr(md5(tk), 1, 8)) AS UBIGINT)
                        % {_FH_BUCKETS} AS BIGINT) AS bucket,
                   CASE WHEN CAST(('0x' || substr(md5(tk), 9, 1)) AS UBIGINT)
                             % 2 = 0
                        THEN 1 ELSE -1 END AS sgn
            FROM toks
        ), feats AS (
            SELECT doc_id, bucket,
                   CAST(SUM(sgn) AS BIGINT) AS feat,
                   CAST(count(*) AS BIGINT) AS hits
            FROM hashed GROUP BY doc_id, bucket
        ), weighted AS (
            SELECT doc_id, feat, hits,
                   CAST(CAST(('0x' || substr(md5('b' ||
                            CAST(bucket AS VARCHAR)), 1, 8)) AS UBIGINT)
                        % {_FH_WRANGE} AS BIGINT) - 1000 AS w_milli
            FROM feats
        )
        SELECT doc_id,
               CAST(SUM(hits) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN feat <> 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nnz_buckets,
               CAST(SUM(abs(feat)) AS BIGINT) AS l1_mass,
               CAST(SUM(feat * w_milli) AS BIGINT) AS score_milli,
               CAST(CAST(SUM(feat * w_milli) AS BIGINT) AS DOUBLE) / 1000
                   AS score
        FROM weighted GROUP BY doc_id
    """,
    doc="The hashing trick (signed feature hashing, "
        "Weinberger et al. 2009): every token maps to one of "
        f"{_FH_BUCKETS} buckets via md5, with an independent md5 hex "
        "digit choosing +/-1 so collisions cancel in expectation — the "
        "fixed-width featurization fastText-style quality classifiers "
        "run over a crawl. Per doc: token count, non-zero buckets, L1 "
        "feature mass, and a linear-model score against a "
        "hash-derandomized integer weight vector (thousandths), summed "
        "as exact ints (score_milli) with one final double division "
        "for display. Map-side only — groupBy(doc, bucket) then "
        "groupBy(doc) both partial-agg before shuffling, no "
        "vocabulary/dictionary state anywhere (the whole point of "
        "hashing at 100 TB: no driver-side vocab build, unbounded "
        "token space, fixed memory). All md5-derived ints follow the "
        "repo's conv(substr(md5,1,k<=13)) == '0x'||substr UBIGINT "
        "convention.",
    tags=("text",),
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    tk = F.col("tk")
    exploded = t.documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tk")
    )
    hb = F.conv(F.substring(F.md5(tk), 1, 8), 16, 10).cast("bigint")
    sb = F.conv(F.substring(F.md5(tk), 9, 1), 16, 10).cast("bigint")
    hashed = exploded.select(
        "doc_id",
        F.pmod(hb, F.lit(_FH_BUCKETS)).cast("bigint").alias("bucket"),
        F.when(F.pmod(sb, F.lit(2)) == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    feats = hashed.groupBy("doc_id", "bucket").agg(
        F.sum("sgn").cast("bigint").alias("feat"),
        F.count("*").cast("bigint").alias("hits"),
    )
    wb = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("b"), F.col("bucket").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    weighted = feats.select(
        "doc_id",
        "feat",
        "hits",
        (F.pmod(wb, F.lit(_FH_WRANGE)) - 1000).alias("w_milli"),
    )
    return weighted.groupBy("doc_id").agg(
        F.sum("hits").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("feat") != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("nnz_buckets"),
        F.sum(F.abs(F.col("feat"))).cast("bigint").alias("l1_mass"),
        F.sum(F.col("feat") * F.col("w_milli"))
        .cast("bigint")
        .alias("score_milli"),
        (
            F.sum(F.col("feat") * F.col("w_milli")).cast("bigint").cast("double")
            / 1000
        ).alias("score"),
    )


def _langid_pred_sql() -> str:
    """The text_langid prediction as a reusable CTE body."""
    return f"""
        SELECT doc_id,
               CASE
                   WHEN greatest(en_hits, es_hits, fr_hits, de_hits) = 0
                       THEN 'und'
                   WHEN en_hits >= greatest(es_hits, fr_hits, de_hits)
                       THEN 'en'
                   WHEN es_hits >= greatest(fr_hits, de_hits) THEN 'es'
                   WHEN fr_hits >= de_hits THEN 'fr'
                   ELSE 'de'
               END AS predicted_lang
        FROM (
            SELECT doc_id,
                   CAST({_sql_hits(LANG_MARKERS['en'])} AS BIGINT) AS en_hits,
                   CAST({_sql_hits(LANG_MARKERS['es'])} AS BIGINT) AS es_hits,
                   CAST({_sql_hits(LANG_MARKERS['fr'])} AS BIGINT) AS fr_hits,
                   CAST({_sql_hits(LANG_MARKERS['de'])} AS BIGINT) AS de_hits
            FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents)
        )
    """


@register(
    "text_langid_confusion",
    oracle=f"""
        WITH pred AS ({_langid_pred_sql()}),
        per AS (
            SELECT d.lang, p.predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM pred p JOIN documents d USING (doc_id)
            GROUP BY 1, 2
        ), tot AS (
            SELECT lang, CAST(SUM(n) AS BIGINT) AS lang_total
            FROM per GROUP BY lang
        )
        SELECT per.lang, per.predicted_lang, per.n, t.lang_total,
               CAST(per.n AS DOUBLE) / CAST(t.lang_total AS DOUBLE) AS frac
        FROM per JOIN tot t USING (lang)
    """,
    doc="Language-ID quality eval as a first-class operator: the "
        "confusion matrix of the marker-token classifier against the "
        "corpus's ground-truth lang label, with per-truth-language row "
        "fractions (the recall diagonal). The eval a curation pipeline "
        "runs before trusting a langid gate at scale — one aggregation "
        "over the classifier's map-side scores, no extra corpus pass. "
        "frac is one exact-int division; lang_total >= 1 whenever the "
        "group exists, so no zero guard is needed.",
    tags=("text", "eval"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    pred = text_langid(spark, sf_dir).select("doc_id", "predicted_lang")
    per = (
        pred.join(t.documents.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = per.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("lang_total")
    )
    return per.join(tot, "lang").select(
        "lang",
        "predicted_lang",
        "n",
        "lang_total",
        (F.col("n").cast("double") / F.col("lang_total").cast("double"))
        .alias("frac"),
    )


@register(
    "ml_cohens_kappa",
    oracle=f"""
        WITH pred AS ({_langid_pred_sql()}),
        joined AS (
            SELECT d.lang AS truth, p.predicted_lang AS pred
            FROM documents d JOIN pred p ON p.doc_id = d.doc_id
        ),
        marg AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN truth = pred THEN 1 ELSE 0 END)
                        AS BIGINT) AS agree
            FROM joined
        ),
        byc AS (
            SELECT cls, CAST(SUM(rt) AS BIGINT) AS r,
                   CAST(SUM(pc) AS BIGINT) AS c
            FROM (
                SELECT truth AS cls, 1 AS rt, 0 AS pc FROM joined
                UNION ALL
                SELECT pred, 0, 1 FROM joined
            ) GROUP BY cls
        ),
        chance AS (
            SELECT CAST(SUM(r * c) AS BIGINT) AS s FROM byc
        )
        SELECT m.n, m.agree, ch.s AS chance_weight,
               CASE WHEN CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
                         - CAST(ch.s AS DOUBLE) <> 0
                    THEN (CAST(m.agree AS DOUBLE) * CAST(m.n AS DOUBLE)
                          - CAST(ch.s AS DOUBLE))
                         / (CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE)
                            - CAST(ch.s AS DOUBLE))
                    ELSE CAST(0 AS DOUBLE) END AS kappa
        FROM marg m CROSS JOIN chance ch
    """,
    doc="Cohen's kappa between the marker-token language-ID prediction "
        "and the stored lang labels — chance-corrected agreement, the "
        "weak-labeler quality gate of an annotation pipeline. Algebra "
        "kept rational: kappa = (po - pe)/(1 - pe) is multiplied "
        "through by n^2, giving (agree*n - S)/(n^2 - S) with "
        "S = sum over classes of row*col marginal products — agree, n, "
        "S all exact int64, the numerator/denominator formed by the "
        "IDENTICAL double products both sides (exact below 2^53), one "
        "final division, and a degenerate single-class corpus "
        "(pe = 1 -> denominator 0) guards to 0 identically. Plan: one "
        "doc join, one union-pivoted marginal agg, two scalar rows.",
    tags=("ml", "stats", "text"),
)
def ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    pred = text_langid(spark, sf_dir).select("doc_id", "predicted_lang")
    joined = pred.join(
        t.documents.select("doc_id", F.col("lang").alias("truth")),
        "doc_id",
    ).select("truth", F.col("predicted_lang").alias("pred"))
    marg = joined.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("truth") == F.col("pred"), 1).otherwise(0))
        .alias("agree"),
    )
    byc = (
        joined.select(
            F.col("truth").alias("cls"), F.lit(1).alias("rt"),
            F.lit(0).alias("pc"),
        )
        .unionAll(
            joined.select(
                F.col("pred").alias("cls"), F.lit(0).alias("rt"),
                F.lit(1).alias("pc"),
            )
        )
        .groupBy("cls")
        .agg(F.sum("rt").alias("r"), F.sum("pc").alias("c"))
    )
    chance = byc.agg(F.sum(F.col("r") * F.col("c")).alias("s"))
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    agree_d = F.col("agree").cast("double")
    den = n_d * n_d - s_d
    kappa = F.when(
        den != 0, (agree_d * n_d - s_d) / den
    ).otherwise(F.lit(0.0))
    return marg.crossJoin(F.broadcast(chance)).select(
        "n",
        "agree",
        F.col("s").alias("chance_weight"),
        kappa.alias("kappa"),
    )


@register(
    "ml_f1_scores",
    oracle=f"""
        WITH pred AS ({_langid_pred_sql()}),
        joined AS (
            SELECT d.lang AS truth, p.predicted_lang AS pred
            FROM documents d JOIN pred p ON p.doc_id = d.doc_id
        ),
        classes AS (
            SELECT DISTINCT truth AS cls FROM joined
            UNION
            SELECT DISTINCT pred FROM joined
        ),
        per AS (
            SELECT c.cls,
                   CAST(SUM(CASE WHEN j.truth = c.cls AND j.pred = c.cls
                                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN j.truth <> c.cls AND j.pred = c.cls
                                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN j.truth = c.cls AND j.pred <> c.cls
                                 THEN 1 ELSE 0 END) AS BIGINT) AS fn
            FROM classes c CROSS JOIN joined j
            GROUP BY c.cls
        )
        SELECT cls, tp, fp, fn,
               CASE WHEN tp + fp > 0
                    THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS precision_,
               CASE WHEN tp + fn > 0
                    THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS recall_,
               CASE WHEN 2 * tp + fp + fn > 0
                    THEN CAST(2 * tp AS DOUBLE)
                         / CAST(2 * tp + fp + fn AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS f1
        FROM per
    """,
    doc="Per-class precision / recall / F1 of the language-ID weak "
        "labeler against stored labels. The F1 chain rule 2PR/(P+R) is "
        "algebraically collapsed to the SINGLE exact rational "
        "2*TP/(2*TP+FP+FN), so every emitted metric is exactly one "
        "correctly-rounded division of int64 counts — no chained float "
        "arithmetic to drift, and never-predicted / absent classes "
        "zero-guard all three identically. The per-class counts come "
        "from one bounded classes x rows expansion (|classes| <= 5) — "
        "at scale, compute the (truth, pred) contingency FIRST and "
        "expand that bounded matrix instead.",
    tags=("ml", "stats", "text"),
)
def ml_f1_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    pred = text_langid(spark, sf_dir).select("doc_id", "predicted_lang")
    joined = pred.join(
        t.documents.select("doc_id", F.col("lang").alias("truth")),
        "doc_id",
    ).select("truth", F.col("predicted_lang").alias("pred"))
    classes = (
        joined.select(F.col("truth").alias("cls"))
        .union(joined.select(F.col("pred").alias("cls")))
        .distinct()
    )
    j = joined.crossJoin(F.broadcast(classes))
    per = j.groupBy("cls").agg(
        F.sum(
            F.when(
                (F.col("truth") == F.col("cls"))
                & (F.col("pred") == F.col("cls")),
                1,
            ).otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when(
                (F.col("truth") != F.col("cls"))
                & (F.col("pred") == F.col("cls")),
                1,
            ).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when(
                (F.col("truth") == F.col("cls"))
                & (F.col("pred") != F.col("cls")),
                1,
            ).otherwise(0)
        ).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(
        tp + fp > 0, tp.cast("double") / (tp + fp).cast("double")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        tp + fn > 0, tp.cast("double") / (tp + fn).cast("double")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        2 * tp + fp + fn > 0,
        (2 * tp).cast("double") / (2 * tp + fp + fn).cast("double"),
    ).otherwise(F.lit(0.0))
    return per.select(
        "cls", "tp", "fp", "fn",
        prec.alias("precision_"),
        rec.alias("recall_"),
        f1.alias("f1"),
    )


@register(
    "ml_mcc",
    oracle=f"""
        WITH pred AS ({_langid_pred_sql()}),
        cm AS (
            SELECT CAST(SUM(CASE WHEN d.lang = 'en'
                                  AND p.predicted_lang = 'en'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN d.lang <> 'en'
                                  AND p.predicted_lang = 'en'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN d.lang = 'en'
                                  AND p.predicted_lang <> 'en'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                   CAST(SUM(CASE WHEN d.lang <> 'en'
                                  AND p.predicted_lang <> 'en'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS tn
            FROM documents d JOIN pred p ON p.doc_id = d.doc_id
        ),
        dec AS (
            SELECT tp, fp, fn, tn,
                   CAST(tp AS DECIMAL(38,0)) * CAST(tn AS DECIMAL(38,0))
                   - CAST(fp AS DECIMAL(38,0)) * CAST(fn AS DECIMAL(38,0))
                       AS num,
                   (CAST(tp + fp AS DECIMAL(38,0)))
                   * (CAST(tp + fn AS DECIMAL(38,0)))
                   * (CAST(tn + fp AS DECIMAL(38,0)))
                   * (CAST(tn + fn AS DECIMAL(38,0))) AS den
            FROM cm
        )
        SELECT tp, fp, fn, tn,
               CASE WHEN den > 0
                    THEN CAST(CAST(num AS VARCHAR) AS DOUBLE)
                         / sqrt(CAST(CAST(den AS VARCHAR) AS DOUBLE))
                    ELSE CAST(0 AS DOUBLE) END AS mcc
        FROM dec
    """,
    doc="Matthews correlation coefficient of the is-English detector "
        "(langid vs stored labels) — the single-number binary-classifier "
        "quality score robust to class imbalance. num = TP*TN - FP*FN "
        "and the 4-marginal product are formed in DECIMAL(38,0) (the "
        "marginal product reaches n^4 — int64 dies past ~55k docs, the "
        "spearman lesson applied PREEMPTIVELY), cross to double via the "
        "exact decimal's shortest string, and MCC is num / sqrt(den) — "
        "two correctly-rounded ops. A degenerate marginal (any empty "
        "row/column) guards to 0 identically. One join + one 4-counter "
        "scalar agg.",
    tags=("ml", "stats", "text"),
)
def ml_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    pred = text_langid(spark, sf_dir).select("doc_id", "predicted_lang")
    joined = pred.join(
        t.documents.select("doc_id", F.col("lang").alias("truth")),
        "doc_id",
    )
    is_t = F.col("truth") == "en"
    is_p = F.col("predicted_lang") == "en"
    cm = joined.agg(
        F.sum(F.when(is_t & is_p, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~is_t & is_p, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(is_t & ~is_p, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~is_t & ~is_p, 1).otherwise(0)).alias("tn"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tp, fp, fn, tn = (F.col(x) for x in ("tp", "fp", "fn", "tn"))
    num = d(tp) * d(tn) - d(fp) * d(fn)
    den = d(tp + fp) * d(tp + fn) * d(tn + fp) * d(tn + fn)
    mcc = F.when(
        den > 0, num.cast("double") / F.sqrt(den.cast("double"))
    ).otherwise(F.lit(0.0))
    return cm.select("tp", "fp", "fn", "tn", mcc.alias("mcc"))


_COLL_MIN_SUPPORT = 5
_COLL_TOPK = 50


@register(
    "text_collocations",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text),
                       '[ \\t\\n\\r\\f]+'), x -> x <> '') AS ws
            FROM documents
        ), bg AS (
            SELECT ws[i] AS w1, ws[i + 1] AS w2
            FROM (
                SELECT ws, unnest(range(1, len(ws))) AS i
                FROM toks WHERE len(ws) >= 2
            )
        ), bgc AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
            FROM bg GROUP BY w1, w2
        ), uni AS (
            SELECT word, CAST(count(*) AS BIGINT) AS c
            FROM (
                SELECT unnest(list_filter(string_split_regex(lower(text),
                    '[ \\t\\n\\r\\f]+'), x -> x <> '')) AS word
                FROM documents
            ) GROUP BY word
        ), scored AS (
            SELECT b.w1 || ' ' || b.w2 AS bigram, b.c_xy,
                   u1.c AS c_x, u2.c AS c_y,
                   round(CAST(2 * b.c_xy AS DOUBLE)
                         / CAST(u1.c + u2.c AS DOUBLE), 6) AS dice
            FROM bgc b
            JOIN uni u1 ON u1.word = b.w1
            JOIN uni u2 ON u2.word = b.w2
            WHERE b.c_xy >= {_COLL_MIN_SUPPORT}
        )
        SELECT bigram, c_xy, c_x, c_y, dice
        FROM scored
        ORDER BY dice DESC, bigram
        LIMIT {_COLL_TOPK}
    """,
    doc="Collocation mining: the top-50 word bigrams by DICE coefficient "
        "2*c_xy/(c_x + c_y) with support >= 5 — the phrase detector a "
        "tokenizer-training pipeline runs to decide which word pairs "
        "merge into single vocabulary units (word2vec's phrase pass uses "
        "the same counts). Dice is chosen over PMI deliberately: it is "
        "a single division of exact integers onto a [0,1] score, so the "
        "round-to-6 ranking convention applies with no transcendentals. "
        "Ranking ties break on the bigram string; the global top-k is "
        "orderBy+limit (TakeOrderedAndProject — per-partition pruned, "
        "never a single-partition window). Plan: one bigram agg, one "
        "unigram agg, two hash joins on the word key.",
    tags=("text",),
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_ngrams

    t = Tables(spark, sf_dir)
    # pin the token arrays behind a lazy checkpoint: word_ngrams
    # references its input array several times (size, sequence bound,
    # slice) and the bigram and unigram branches are separate consumers
    # — CollapseProject otherwise inlines the lower+split into every
    # reference, re-tokenizing the corpus per use (the round-8 §1 trap;
    # the before-plan showed SIX parquet scans of documents for this
    # one query, plans/r11/text_collocations_before.txt)
    tok_df = t.documents.select(
        tokens(F.lower(F.col("text"))).alias("ws")
    ).localCheckpoint(eager=False)
    bg = tok_df.select(
        F.explode(word_ngrams(F.col("ws"), 2)).alias("bigram")
    ).select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    uni = (
        tok_df.select(F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    scored = (
        bgc.filter(F.col("c_xy") >= _COLL_MIN_SUPPORT)
        .join(
            uni.select(F.col("word").alias("w1"), F.col("c").alias("c_x")),
            "w1",
        )
        .join(
            uni.select(F.col("word").alias("w2"), F.col("c").alias("c_y")),
            "w2",
        )
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "c_xy",
            "c_x",
            "c_y",
            F.round(
                (2 * F.col("c_xy")).cast("double")
                / (F.col("c_x") + F.col("c_y")).cast("double"),
                6,
            ).alias("dice"),
        )
    )
    return scored.orderBy(F.desc("dice"), "bigram").limit(_COLL_TOPK)


@register(
    "text_postings_dgaps",
    oracle="""
        WITH posting AS (
            SELECT DISTINCT word, doc_id FROM (
                SELECT doc_id,
                       unnest(list_filter(string_split_regex(lower(text),
                           '[ \\t\\n\\r\\f]+'), x -> x <> '')) AS word
                FROM documents
            )
        ), gaps AS (
            SELECT word,
                   COALESCE(
                       doc_id - lag(doc_id) OVER (PARTITION BY word
                                                  ORDER BY doc_id),
                       doc_id + 1
                   ) AS gap
            FROM posting
        )
        SELECT word,
               CAST(count(*) AS BIGINT) AS df,
               CAST(SUM(strlen(bin(gap))) AS BIGINT) AS total_bits,
               CAST(SUM(strlen(bin(gap))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS avg_bits,
               CAST(max(gap) AS BIGINT) AS max_gap
        FROM gaps
        GROUP BY word
        HAVING count(*) >= 5
    """,
    doc="Posting-list delta-gap compressibility profile — the estimate "
        "an inverted-index builder reads before picking a postings "
        "codec (vbyte/PFOR/Elias): per term (df >= 5), the sorted "
        "doc_id deltas' total and average BINARY MAGNITUDE in bits "
        "(length of the gap's binary representation = the payload bits "
        "a gamma/vbyte code would spend; frequent terms have small "
        "gaps, rare terms cost ~log2(N) bits each). Pure integers: "
        "gaps from one lag window per term (first posting encodes "
        "doc_id+1 so every gap is positive), bits via length(bin(x)) "
        "in both engines, one exact total/df division. Plan: distinct "
        "(word, doc) -> one word-partitioned window -> one agg; "
        "posting lists shuffle once.",
    tags=("text",),
)
def text_postings_dgaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..functions.text import words_exploded

    t = Tables(spark, sf_dir)
    posting = (
        t.documents.select(
            "doc_id", words_exploded(F.lower(F.col("text")))
        )
        .distinct()
    )
    w = W.partitionBy("word").orderBy("doc_id")
    gaps = posting.select(
        "word",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(w),
            F.col("doc_id") + 1,
        ).alias("gap"),
    )
    bits = F.length(F.bin(F.col("gap")))
    return (
        gaps.groupBy("word")
        .agg(
            F.count("*").alias("df"),
            F.sum(bits).cast("bigint").alias("total_bits"),
            (
                F.sum(bits).cast("double") / F.count("*").cast("double")
            ).alias("avg_bits"),
            F.max("gap").cast("bigint").alias("max_gap"),
        )
        .filter(F.col("df") >= 5)
    )


@register(
    "text_readability",
    oracle="""
        WITH feats AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(text,
                       '[ \\t\\n\\r\\f]+'), x -> x <> '')) AS BIGINT)
                       AS n_words,
                   CAST(greatest(len(regexp_extract_all(text, '[.!?]+')),
                       1) AS BIGINT) AS n_sents,
                   CAST(greatest(len(regexp_extract_all(lower(text),
                       '[aeiouy]+')), 1) AS BIGINT) AS n_syll
            FROM documents
        )
        SELECT doc_id, n_words, n_sents, n_syll,
               CAST(206.835 AS DOUBLE)
               - CAST(1.015 AS DOUBLE)
                 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
               - CAST(84.6 AS DOUBLE)
                 * (CAST(n_syll AS DOUBLE) / CAST(greatest(n_words, 1)
                                                  AS DOUBLE))
                   AS flesch
        FROM feats
    """,
    doc="Flesch reading-ease score per document — the readability "
        "feature quality-filter pipelines mix into curation scores "
        "(very low readability correlates with boilerplate/code/spam). "
        "Syllables are approximated by vowel-group count (the standard "
        "regex surrogate, identical RE2 pattern in both engines), "
        "sentences by terminal-punctuation runs; both are floored at 1 "
        "and the words denominator is guarded, so every ratio is an "
        "exact-integer division and the score one fixed constant-"
        "weighted op sequence — deterministic despite the non-dyadic "
        "Flesch constants, because both engines parse the identical "
        "decimal literals to the same doubles and apply the same op "
        "order. Map-only: zero shuffles.",
    tags=("text",),
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    n_words = F.size(tokens(F.col("text"))).cast("bigint")
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)),
        F.lit(1),
    ).cast("bigint")
    n_syll = F.greatest(
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
        ),
        F.lit(1),
    ).cast("bigint")
    feats = t.documents.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sents").cast("double"))
        - F.lit(84.6)
        * (
            F.col("n_syll").cast("double")
            / F.greatest(F.col("n_words"), F.lit(1)).cast("double")
        )
    )
    return feats.select(
        "doc_id", "n_words", "n_sents", "n_syll", flesch.alias("flesch")
    )


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
# "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03 —
# the MOSS algorithm; public). Byte-level k-grams hashed with the repo's
# md5-52-bit bridge; each sliding window of W consecutive gram hashes
# selects its minimum (rightmost on ties — the robust-winnowing rule),
# and the fingerprint set is the distinct selected (position, hash)
# pairs. Guarantees: any shared substring of length >= K + W - 1 shares
# at least one fingerprint, and the expected density is 2/(W+1).

_WIN_K = 8  # gram size in BYTES (16 hex chars)
_WIN_W = 4  # window size in gram positions
_WIN_MIN = _WIN_K + _WIN_W - 1  # shortest doc with a full window
_WIN_SENTINEL = 1 << 62  # > any 52-bit gram hash


@register(
    "text_winnowing",
    oracle=f"""
        WITH d AS MATERIALIZED (
            SELECT doc_id, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents WHERE strlen(text) >= {_WIN_MIN}
        ), g AS (
            SELECT doc_id, n - {_WIN_K - 1} AS ng,
                   CAST(unnest(range(1, n - {_WIN_K - 2})) AS BIGINT) AS i
            FROM d
        ), g2 AS MATERIALIZED (
            SELECT g.doc_id, g.ng, g.i,
                   CAST(CAST(('0x' || substr(md5(
                       substr(d.hx, CAST(2 * g.i - 1 AS INTEGER),
                              {2 * _WIN_K})), 1, 13)) AS UBIGINT)
                       AS BIGINT) AS h
            FROM g JOIN d USING (doc_id)
        ), mw AS MATERIALIZED (
            SELECT doc_id, i AS j, mh FROM (
                SELECT doc_id, i,
                       min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW
                            AND {_WIN_W - 1} FOLLOWING) AS mh,
                       count(*) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW
                            AND {_WIN_W - 1} FOLLOWING) AS cnt
                FROM g2
            ) WHERE cnt = {_WIN_W}
        ), sel AS (
            SELECT m.doc_id, m.mh AS h, max(g.i) AS i
            FROM mw m
            JOIN g2 g ON g.doc_id = m.doc_id AND g.h = m.mh
                     AND g.i BETWEEN m.j AND m.j + {_WIN_W - 1}
            GROUP BY m.doc_id, m.j, m.mh
        ), fp AS (
            SELECT DISTINCT doc_id, i, h FROM sel
        )
        SELECT f.doc_id,
               CAST(max(d.n) - {_WIN_K - 1} AS BIGINT) AS n_grams,
               CAST(count(*) AS BIGINT) AS n_fp,
               CAST(SUM(f.h) AS BIGINT) AS h_checksum,
               CAST(SUM(f.i) AS BIGINT) AS pos_sum,
               CAST(count(*) AS DOUBLE)
                   / CAST(max(d.n) - {_WIN_K - 1} AS BIGINT) AS fp_density
        FROM fp f JOIN d USING (doc_id)
        GROUP BY f.doc_id
    """,
    doc="Winnowing document fingerprints (Schleimer et al., SIGMOD'03 — "
        "the MOSS local fingerprinting algorithm, public): 8-byte grams "
        "over the raw text bytes (hex-string substr, the cdc.py byte "
        "bridge), 52-bit md5 hashes, and every 4-gram sliding window "
        "selects its minimum hash (rightmost wins ties). Emits per doc "
        "the distinct-fingerprint count, exact integer checksums of the "
        "selected hashes and positions, and the selection density "
        "(expected 2/(W+1) = 0.4). The WHOLE plan is per-row nested "
        "higher-order functions (transform/aggregate over gram index "
        "sequences): one corpus scan, ZERO shuffles and zero window "
        "exchanges — at 100 TB the fingerprint stage is embarrassingly "
        "parallel and the (doc, hash) pairs it would feed into an "
        "overlap join never leave the mapper here. Any shared substring "
        ">= K+W-1 = 11 bytes shares a fingerprint (the paper's "
        "guarantee), so this composes with dedup_span_coverage as the "
        "sketch-sized alternative.",
    tags=("text", "dedup"),
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    d = (
        t.documents.filter(F.octet_length("text") >= _WIN_MIN)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.hex(F.encode("text", "utf-8")).alias("hx"),
            F.octet_length("text").cast("bigint").alias("n"),
        )
        .withColumn("ng", F.col("n") - (_WIN_K - 1))
    )
    # robust winnowing: scan each window left->right keeping the
    # minimal hash, replacing on <= so ties land on the RIGHTMOST
    # position (the paper's tie rule; matches the oracle's max(i)).
    # The gram-hash ARRAY is computed once per doc and pinned behind a
    # repartition exchange: without the barrier, CollapseProject
    # inlines the array-valued projection into every element_at
    # reference and re-evaluates md5 over the whole gram array per
    # lookup (7.6 s at sf0.01); computing hashes inline per (window,
    # offset) costs 4-8 md5 calls per gram (19 s at the 10x sim-sf1).
    # The exchange caps the md5 count at exactly ONE per gram and the
    # window scan becomes pure array lookups (19.04 s -> ~2 s at 10x).
    harr = F.transform(
        F.sequence(F.lit(1).cast("bigint"), F.col("ng")),
        lambda i: F.conv(
            F.substring(
                F.md5(F.substring("hx", (i * 2 - 1).cast("int"),
                                  F.lit(2 * _WIN_K))),
                1, 13,
            ),
            16, 10,
        ).cast("long"),
    )
    d = d.select("doc_id", "ng", harr.alias("harr")).repartition(
        spark.sparkContext.defaultParallelism
    )

    def gram_hash(i):  # noqa: ANN001, ANN202 — array lookup, not md5
        return F.element_at(F.col("harr"), i.cast("int"))

    zero = F.struct(
        F.lit(_WIN_SENTINEL).cast("long").alias("h"),
        F.lit(0).cast("long").alias("i"),
    )
    sel = F.transform(
        F.sequence(F.lit(1).cast("bigint"), F.col("ng") - (_WIN_W - 1)),
        lambda j: F.aggregate(
            F.sequence(j, j + (_WIN_W - 1)),
            zero,
            lambda acc, i: F.when(
                gram_hash(i) <= acc["h"],
                F.struct(gram_hash(i).alias("h"), i.alias("i")),
            ).otherwise(acc),
        ),
    )
    fp = d.withColumn("fp", F.array_distinct(sel))
    zl = F.lit(0).cast("long")
    return fp.select(
        "doc_id",
        F.col("ng").alias("n_grams"),
        F.size("fp").cast("bigint").alias("n_fp"),
        F.aggregate(F.col("fp"), zl, lambda a, x: a + x["h"]).alias(
            "h_checksum"
        ),
        F.aggregate(F.col("fp"), zl, lambda a, x: a + x["i"]).alias(
            "pos_sum"
        ),
        (F.size("fp").cast("double") / F.col("ng").cast("double")).alias(
            "fp_density"
        ),
    )


@register(
    "text_zipf_slope",
    oracle=f"""
        WITH tf AS (
            SELECT s AS term, CAST(count(*) AS BIGINT) AS f
            FROM (
                SELECT unnest({_SQL_TOKENS}) AS s FROM documents
            ) GROUP BY 1
        ), ranked AS (
            SELECT f, CAST(row_number() OVER (ORDER BY f DESC, term)
                           AS BIGINT) AS r
            FROM tf
        ), buck AS (
            SELECT CAST(length(bin(r)) - 1 AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS n_terms,
                   CAST(SUM(f) AS BIGINT) AS freq_sum
            FROM ranked GROUP BY 1
        ), pts AS (
            SELECT k, n_terms, freq_sum,
                   CAST(length(bin(freq_sum // n_terms)) - 1 AS BIGINT)
                       AS log2_mean_f
            FROM buck
        ), fit AS (
            SELECT CAST(count(*) AS BIGINT) AS nb,
                   CAST(SUM(k) AS BIGINT) AS sx,
                   CAST(SUM(log2_mean_f) AS BIGINT) AS sy,
                   CAST(SUM(k * log2_mean_f) AS BIGINT) AS sxy,
                   CAST(SUM(k * k) AS BIGINT) AS sxx
            FROM pts
        )
        SELECT p.k, p.n_terms, p.freq_sum, p.log2_mean_f,
               CAST(f.nb * f.sxy - f.sx * f.sy AS DOUBLE)
                   / CAST(CASE WHEN f.nb * f.sxx - f.sx * f.sx = 0
                               THEN 1
                               ELSE f.nb * f.sxx - f.sx * f.sx END
                          AS DOUBLE) AS zipf_slope
        FROM pts p CROSS JOIN fit f
    """,
    doc="Zipf rank-frequency diagnostic: rank the vocabulary by "
        "frequency (unique (f desc, term) tie-break), bucket by "
        "floor(log2(rank)), and OLS-fit log2(mean bucket frequency) "
        "against the bucket index — the slope is ~-s for a Zipf(s) "
        "corpus, the standard sanity check that a crawl slice has "
        "natural-language frequency structure (template spam and "
        "boilerplate floods flatten it). EXACT cross-engine: the "
        "global rank uses the distributed two-level kernel (range "
        "partitioning + per-partition windows + broadcast offsets — "
        "never an unpartitioned window; DuckDB affords the plain "
        "row_number), floor(log2(x)) is length(bin(x)) - 1 in BOTH "
        "engines (string binary repr, no float log), mean bucket "
        "frequency is exact integer division (Spark div == DuckDB //), "
        "the OLS moments are integer sums over the ~log2(vocab)-row "
        "bucket table, and the single slope division is one correctly-"
        "rounded IEEE op with the zero-denominator guard applied "
        "identically. Scale: one corpus-tokens shuffle into the term-"
        "frequency agg, one range shuffle for the rank — the fit "
        "itself costs nothing at any corpus size.",
    tags=("text",),
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_global_rank

    t = Tables(spark, sf_dir)
    tf = (
        t.documents.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("f"))
    )
    ranked = with_global_rank(
        tf, [F.col("f").desc(), F.col("term")], rank_col="r"
    )
    buck = (
        ranked.select(
            (F.length(F.bin("r")) - 1).cast("long").alias("k"), "f"
        )
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("f").cast("long").alias("freq_sum"),
        )
    )
    pts = buck.withColumn(
        "log2_mean_f",
        (
            F.length(F.bin(F.expr("freq_sum div n_terms"))) - 1
        ).cast("long"),
    )
    fit = pts.agg(
        F.count("*").cast("long").alias("nb"),
        F.sum("k").cast("long").alias("sx"),
        F.sum("log2_mean_f").cast("long").alias("sy"),
        F.sum(F.col("k") * F.col("log2_mean_f")).cast("long").alias("sxy"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("sxx"),
    )
    den = F.col("nb") * F.col("sxx") - F.col("sx") * F.col("sx")
    return pts.crossJoin(F.broadcast(fit)).select(
        "k",
        "n_terms",
        "freq_sum",
        "log2_mean_f",
        (
            (F.col("nb") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / F.when(den == 0, F.lit(1).cast("long"))
            .otherwise(den)
            .cast("double")
        ).alias("zipf_slope"),
    )


_BIGRAM_TOKS_SQL = (
    "list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), "
    "x -> x <> '')"
)


@register(
    "text_bigram_lm_score",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_BIGRAM_TOKS_SQL} AS w
            FROM documents
        ), bi AS MATERIALIZED (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, greatest(len(w), 1)),
                       i -> w[i] || ' ' || w[i+1])) AS bg,
                   unnest(list_transform(
                       range(1, greatest(len(w), 1)),
                       i -> w[i])) AS w1
            FROM toks
        ), cb AS (
            SELECT bg, CAST(count(*) AS BIGINT) AS cab FROM bi GROUP BY bg
        ), cf AS (
            SELECT w1, CAST(count(*) AS BIGINT) AS ca FROM bi GROUP BY w1
        ), scored AS (
            SELECT bi.doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM((length(bin(cb.cab)) - 1)
                            - (length(bin(cf.ca + 16)) - 1))
                        AS BIGINT) AS bits
            FROM bi JOIN cb ON cb.bg = bi.bg JOIN cf ON cf.w1 = bi.w1
            GROUP BY bi.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(s.bits, 0) AS BIGINT) AS bits_score,
               CAST(COALESCE(s.bits, 0) AS DOUBLE)
                   / CASE WHEN COALESCE(s.n_bigrams, 0) = 0 THEN 1
                          ELSE s.n_bigrams END AS bits_per_bigram
        FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
    """,
    doc="Bigram language-model quality score with EXACT-INTEGER "
        "log-probabilities — the KenLM-perplexity filter shape (CCNet / "
        "Wenzek et al. 2020, public) made hash-checkable: per doc, sum "
        "over its word bigrams of floor(log2 c(w1 w2)) - floor(log2 "
        "(c(w1 .) + 16)) — the smoothed conditional bigram log-prob in "
        "WHOLE BITS (the +16 pseudocount keeps hapax contexts from "
        "scoring 'perfectly': an unsmoothed self-trained LM gives "
        "c_ab = c_a = 1 pairs p = 1, so gibberish would score 0), "
        "where floor(log2 x) is length(bin(x)) - 1, an exact integer "
        "in both engines (no per-row transcendental ever evaluates; "
        "the round-8 UCB trick generalized from baked literals to "
        "data-derived counts). Corpus-fluent docs score near 0 bits/"
        "bigram, gibberish scores deeply negative — the ranking a "
        "perplexity filter thresholds on. bits_per_bigram is one "
        "int/int division (correctly rounded, zero-guarded identically "
        "per CLAUDE.md rule 5). Scale: one corpus-bigram explode "
        "feeding two grouped counts, then bounded-fanout joins back on "
        "bigram / first-word keys (the BM25 inverted-index shape); "
        "partial aggregation bounds every shuffle by distinct-bigram "
        "cardinality, never O(corpus^2).",
    tags=("text", "curation"),
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_ngrams

    t = Tables(spark, sf_dir)
    docs = t.documents.select("doc_id", "text")
    bi = (
        docs.select(
            "doc_id",
            F.explode(word_ngrams(tokens(F.col("text")), 2)).alias("bg"),
        )
        .localCheckpoint(eager=False)  # 2 consumers: one corpus scan
    )
    cb = bi.groupBy("bg").agg(F.count("*").cast("long").alias("cab"))
    # round-12 (guide §2.3): everything downstream of cb is VOCABULARY-
    # sized, not corpus-sized. ca (bigrams starting with w1) is the sum
    # of cab over that w1 — derived from cb instead of re-shuffling the
    # full bigram stream by w1; bits is a per-DISTINCT-bigram value, so
    # it joins back to the stream once (by bg) instead of dragging the
    # stream through a second corpus-scale join by w1. Old shape: 5
    # corpus-scale exchanges; new: 3 (cb agg, the bits join, the
    # per-doc aggregation) — identical integers throughout.
    bgt = cb.withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
    cf = bgt.groupBy("w1").agg(F.sum("cab").cast("long").alias("ca"))
    bits = (
        (F.length(F.bin(F.col("cab"))) - 1)
        - (F.length(F.bin(F.col("ca") + 16)) - 1)
    )
    per_bg = bgt.join(cf, "w1").select("bg", bits.alias("bg_bits"))
    scored = (
        bi.join(per_bg, "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("bg_bits").cast("long").alias("bits"),
        )
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("bits", F.lit(0)).cast("long").alias("bits_score"),
        (
            F.coalesce("bits", F.lit(0)).cast("double")
            / F.when(F.coalesce("n_bigrams", F.lit(0)) == 0, 1)
            .otherwise(F.col("n_bigrams"))
            .cast("double")
        ).alias("bits_per_bigram"),
    )
