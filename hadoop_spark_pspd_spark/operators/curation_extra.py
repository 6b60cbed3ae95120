"""Corpus-curation extras: PII redaction, cross-doc boilerplate removal,
n-gram LM scoring, deterministic reservoir sampling, Count-Min sketch.

The reference pipeline stops at WordCount (cluster/tools/run_fault_tests.py:26-30);
these are the north-star LLM-data operators layered on the same corpus
surface. Every query here is a pure DataFrame plan (no Python UDF) with an
exact DuckDB oracle:

* ``text_pii_redact`` — regex scrub of emails/IPv4 (the standard masking
  pass before training). Map-only: no shuffle at any scale.
* ``text_boilerplate_passages`` — CCNet-style shared-passage removal, but
  cross-document: hash fixed-width word windows, drop windows that occur in
  >= 5% of documents. Two shuffles (passage-frequency agg + per-doc
  regroup); the passage-frequency table is Zipf-shaped and tiny relative to
  the corpus, so the flagging join broadcasts at 100 TB.
* ``text_lm_bigram_score`` — corpus-LM fluency proxy: average corpus
  frequency of a document's bigrams. Rational arithmetic only (no log), so
  the score hash-matches cross-engine.
* ``q_reservoir_sample`` — deterministic uniform-k sample as top-k by
  md5(key): each partition keeps its local top-k (the distributed analogue
  of reservoir merging), TakeOrderedAndProject merges on the driver —
  no full sort, no full shuffle.
* ``sketch_countmin`` — Count-Min frequency sketch built as a pure
  aggregation: (row, cell) counts ARE the sketch, mergeable by sum across
  partitions/days; probes read min over rows. Width 1024 x depth 3 via
  md5-derived hashes shared bit-exactly with the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# DuckDB spellings of the same patterns (RE2 accepts this subset verbatim).
_EMAIL_SQL = EMAIL_RE
_IPV4_SQL = IPV4_RE


@register(
    "text_pii_redact",
    oracle="""
        WITH aug AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com from 10.0.'
                        || CAST(doc_id % 256 AS VARCHAR) || '.'
                        || CAST(doc_id % 7 + 1 AS VARCHAR) AS raw
            FROM documents
        ), stage1 AS (
            SELECT doc_id, raw,
                   len(regexp_extract_all(raw, '{email}')) AS n_emails,
                   regexp_replace(raw, '{email}', '<EMAIL>', 'g') AS no_email
            FROM aug
        )
        SELECT doc_id, n_emails,
               len(regexp_extract_all(no_email, '{ip}')) AS n_ips,
               regexp_replace(no_email, '{ip}', '<IP>', 'g') AS redacted
        FROM stage1
    """.format(email=_EMAIL_SQL, ip=_IPV4_SQL),
    doc="PII redaction: regex masking of emails then IPv4 addresses, with "
        "per-doc redaction counts. Deterministic synthetic PII (derived "
        "from doc_id) is appended so the scrub provably fires on every row. "
        "Map-only — one projection, no shuffle; at 100 TB this runs at scan "
        "speed with full column pruning (only doc_id, text read).",
    tags=("curation",),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    raw = F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"), F.lit("."),
        (F.col("doc_id") % 7 + 1).cast("string"),
    )
    aug = t.documents.select("doc_id", raw.alias("raw"))
    stage1 = aug.select(
        "doc_id",
        F.regexp_count("raw", F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_replace("raw", EMAIL_RE, "<EMAIL>").alias("no_email"),
    )
    return stage1.select(
        "doc_id",
        "n_emails",
        F.regexp_count("no_email", F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_replace("no_email", IPV4_RE, "<IP>").alias("redacted"),
    )


_PASSAGE_W = 2          # words per passage window (stride = width)
_BOILER_FRAC = 0.05     # passage is boilerplate if seen in >= 5% of docs


@register(
    "text_boilerplate_passages",
    oracle="""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS words
            FROM documents WHERE length(text) > 0
        ), chunks0 AS (
            SELECT doc_id, words,
                   unnest(range(0, CAST(ceil(len(words) / {w}.0) AS BIGINT)))
                       AS pos
            FROM d
        ), chunks AS (
            SELECT doc_id, pos,
                   array_to_string(
                       words[(pos*{w}+1):(pos*{w}+{w})], ' ') AS chunk
            FROM chunks0
        ), freq AS (
            SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM chunks
            GROUP BY chunk
        ), bl AS (
            SELECT chunk FROM freq
            WHERE df >= {frac} * (SELECT COUNT(*) FROM documents
                                  WHERE length(text) > 0)
        ), flagged AS (
            SELECT c.doc_id, c.pos, c.chunk,
                   (b.chunk IS NOT NULL) AS is_bl
            FROM chunks c LEFT JOIN bl b ON c.chunk = b.chunk
        )
        SELECT doc_id,
               COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN is_bl THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped,
               COALESCE(string_agg(chunk, ' ' ORDER BY pos)
                            FILTER (WHERE NOT is_bl), '') AS kept_text
        FROM flagged GROUP BY doc_id
    """.format(w=_PASSAGE_W, frac=_BOILER_FRAC),
    doc="Cross-document boilerplate removal (CCNet-style shared-passage "
        "filter): split each doc into fixed-width word windows, count each "
        "window's document frequency corpus-wide, drop windows present in "
        ">= 5% of documents, reassemble the surviving text in order. The "
        "frequency table is Zipf-shaped (tiny vs the corpus), so at scale "
        "the flagging join is a broadcast; the per-doc regroup shuffles on "
        "doc_id exactly once.",
    tags=("curation",),
)
def text_boilerplate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = _PASSAGE_W
    d = (
        t.documents.filter(F.length("text") > 0)
        .select("doc_id", F.split("text", " ").alias("words"))
    )
    chunks = (
        d.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, cast(ceil(size(words)/{w}.0) as int) - 1),"
                    f" i -> concat_ws(' ', slice(words, i*{w}+1, {w})))"
                )
            ).alias("pos", "chunk"),
        )
    )
    n_docs = (
        t.documents.filter(F.length("text") > 0)
        .agg(F.count("*").alias("n_docs"))
    )
    freq = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("df")
    )
    bl = (
        freq.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") >= _BOILER_FRAC * F.col("n_docs"))
        .select("chunk", F.lit(True).alias("is_bl_hit"))
    )
    flagged = chunks.join(F.broadcast(bl), "chunk", "left").select(
        "doc_id", "pos", "chunk",
        F.coalesce(F.col("is_bl_hit"), F.lit(False)).alias("is_bl"),
    )
    kept = F.array_sort(
        F.collect_list(
            F.when(~F.col("is_bl"), F.struct("pos", "chunk"))
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.col("is_bl").cast("int")).cast("long").alias("n_dropped"),
        F.concat_ws(
            " ", F.transform(kept, lambda s: s.getField("chunk"))
        ).alias("kept_text"),
    )


@register(
    "text_lm_bigram_score",
    oracle="""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS words
            FROM documents
            WHERE len(string_split(text, ' ')) >= 2
        ), bg0 AS (
            SELECT doc_id, words, unnest(range(1, len(words))) AS i
            FROM d
        ), bg AS (
            SELECT doc_id, words[i] || ' ' || words[i+1] AS bigram
            FROM bg0
        ), counts AS (
            SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram
        )
        SELECT bg.doc_id,
               COUNT(*) AS n_bigrams,
               CAST(SUM(c.cnt) AS BIGINT) AS total_freq,
               CAST(CAST(SUM(c.cnt) AS BIGINT) AS DOUBLE) / COUNT(*)
                   AS avg_bigram_freq
        FROM bg JOIN counts c ON bg.bigram = c.bigram
        GROUP BY bg.doc_id
    """,
    doc="Corpus-LM fluency proxy: a document's average corpus frequency of "
        "its bigrams (the count-based analogue of LM perplexity scoring, "
        "kept rational — no log — so the score hash-matches cross-engine). "
        "Shape: one bigram-count aggregation, one join back, one per-doc "
        "aggregation. The bigram table follows Zipf, so at 100 TB the "
        "high-frequency head broadcasts and the long tail stays an "
        "equi-join on bigram; score = exact-int sum / int count, one "
        "double division.",
    tags=("curation",),
)
def text_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    d = (
        t.documents.select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= 2)
    )
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(words) - 1),"
                " i -> concat(element_at(words, i), ' ',"
                " element_at(words, i + 1)))"
            )
        ).alias("bigram"),
    )
    counts = bg.groupBy("bigram").agg(F.count("*").alias("cnt"))
    return (
        bg.join(counts, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("cnt").cast("long").alias("total_freq"),
            (
                F.sum("cnt").cast("long").cast("double") / F.count("*")
            ).alias("avg_bigram_freq"),
        )
    )


_SAMPLE_K = 100


@register(
    "q_reservoir_sample",
    oracle=f"""
        SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS priority
        FROM orders
        ORDER BY priority, o_orderkey
        LIMIT {_SAMPLE_K}
    """,
    doc="Deterministic uniform-k sample (reservoir-sampling semantics, "
        "derandomized): priority = md5(key), keep the k smallest. Spark "
        "plans this as TakeOrderedAndProject — each partition keeps a "
        "local k-heap and only k rows per partition reach the driver "
        "merge, exactly the distributed reservoir-merge shape; no global "
        "sort, no shuffle of the corpus. Uniformity comes from md5's "
        "avalanche over the key; determinism makes it oracle-checkable "
        "(vs rand(), which could never hash-match).",
    tags=("curation",),
)
def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.select(
            "o_orderkey",
            F.md5(F.col("o_orderkey").cast("string")).alias("priority"),
        )
        .orderBy("priority", "o_orderkey")
        .limit(_SAMPLE_K)
    )


# Width deliberately tiny vs the test vocabulary so hash collisions (and
# therefore the sketch's one-sided overestimate) are actually visible in
# the output; production would size width ~ 2/epsilon.
_CM_WIDTH = 16
_CM_DEPTH = 3
_CM_PROBES = (
    "spark", "join", "merge", "window", "batch", "stream",
    "vector", "hash", "table", "query", "zebra", "quantum",
)


def _cm_cell_sql(word_expr: str, j_expr: str) -> str:
    """DuckDB cell index: top-32-bit md5 of word#row, mod width."""
    return (
        f"CAST(('0x' || substr(md5({word_expr} || '#' "
        f"|| CAST({j_expr} AS VARCHAR)), 1, 8)) AS UBIGINT) "
        f"% {_CM_WIDTH}"
    )


def _cm_cell(word: F.Column, j: F.Column) -> F.Column:
    salted = F.concat(word, F.lit("#"), j.cast("string"))
    return F.pmod(
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("bigint"),
        F.lit(_CM_WIDTH),
    )


@register(
    "sketch_countmin",
    oracle="""
        WITH tokens AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ), cells AS (
            SELECT j, {cell_tok} AS cell, COUNT(*) AS cnt
            FROM tokens, range(0, {depth}) r(j)
            GROUP BY j, cell
        ), probes AS (
            SELECT unnest([{probe_list}]) AS word
        ), est AS (
            SELECT p.word,
                   MIN(COALESCE(c.cnt, 0)) AS cm_estimate
            FROM probes p
            CROSS JOIN range(0, {depth}) r(j)
            LEFT JOIN cells c
              ON c.j = r.j AND c.cell = {cell_probe}
            GROUP BY p.word
        ), exact AS (
            SELECT word, COUNT(*) AS cnt FROM tokens
            WHERE word IN ({probe_list})
            GROUP BY word
        )
        SELECT e.word, e.cm_estimate,
               COALESCE(x.cnt, 0) AS exact_cnt
        FROM est e LEFT JOIN exact x ON e.word = x.word
    """.format(
        cell_tok=_cm_cell_sql("word", "j"),
        cell_probe=_cm_cell_sql("p.word", "r.j"),
        depth=_CM_DEPTH,
        probe_list=", ".join(f"'{w}'" for w in _CM_PROBES),
    ),
    doc="Count-Min sketch as a pure aggregation: token stream x depth "
        "rows -> groupBy(row, md5-derived cell) counts; the (row, cell, "
        "count) table IS the sketch — mergeable across partitions, days, "
        "or corpora by summing cells, which is how it stays one map-side-"
        "combined shuffle at 100 TB (vs exact word counts whose key space "
        "grows with vocabulary, the sketch is a FIXED depth x width grid "
        "— width 16 here, deliberately undersized vs the vocabulary so "
        "collisions show; production sizes width ~ 2/epsilon). Probes "
        "report min-over-rows estimates next to exact counts, so the "
        "one-sided overestimate guarantee is visible in the output. "
        "Hashes are md5-top-32-bits shared bit-exactly with the oracle.",
    tags=("sketch",),
)
def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    tokens = t.documents.select(
        F.explode(F.split("text", " ")).alias("word")
    )
    rows = F.array(*[F.lit(j) for j in range(_CM_DEPTH)])
    cells = (
        tokens.select("word", F.explode(rows).alias("j"))
        .select("j", _cm_cell(F.col("word"), F.col("j")).alias("cell"))
        .groupBy("j", "cell")
        .agg(F.count("*").alias("cnt"))
    )
    probes = spark.createDataFrame(
        [(w,) for w in _CM_PROBES], "word string"
    )
    probe_cells = probes.select(
        "word", F.explode(rows).alias("j")
    ).select(
        "word", "j", _cm_cell(F.col("word"), F.col("j")).alias("cell")
    )
    est = (
        probe_cells.join(F.broadcast(cells), ["j", "cell"], "left")
        .select("word", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy("word")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    exact = (
        tokens.filter(F.col("word").isin(*_CM_PROBES))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    return est.join(F.broadcast(exact), "word", "left").select(
        "word",
        "cm_estimate",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("exact_cnt"),
    )


@register(
    "text_cross_source_dedup",
    oracle="""
        WITH fp AS (
            SELECT doc_id, source,
                   md5(array_to_string(
                       list_sort(list_distinct(string_split(text, ' '))),
                       ' ')) AS fingerprint
            FROM documents
        ), ranked AS (
            SELECT fingerprint, doc_id, source,
                   row_number() OVER (
                       PARTITION BY fingerprint
                       ORDER BY source, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY fingerprint) AS n_copies,
                   COUNT(DISTINCT source) OVER (PARTITION BY fingerprint)
                       AS n_sources
            FROM fp
        )
        SELECT fingerprint, doc_id AS kept_doc_id, source AS kept_source,
               n_copies, CAST(n_sources AS BIGINT) AS n_sources
        FROM ranked WHERE rn = 1
    """,
    doc="Cross-source provenance-aware dedup: documents are fingerprinted "
        "on their sorted DISTINCT word set (bag-collapse: word order and "
        "repetition don't distinguish), grouped corpus-wide, and one "
        "winner per fingerprint is kept by source priority (here "
        "lexicographic source, doc_id tie-break) — the multi-crawl "
        "curation step that keeps the highest-quality provenance of each "
        "duplicated page. One shuffle on fingerprint; winner selection, "
        "copy count, and source spread come from the same partitioning "
        "(no second shuffle).",
    tags=("curation",),
)
def text_cross_source_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    fp = t.documents.select(
        "doc_id",
        "source",
        F.md5(
            F.concat_ws(
                " ", F.sort_array(F.array_distinct(F.split("text", " ")))
            )
        ).alias("fingerprint"),
    )
    # one aggregation on the fingerprint key computes winner + stats
    # together (no window-over-window): min(struct) is the priority pick
    agg = fp.groupBy("fingerprint").agg(
        F.min(F.struct("source", "doc_id")).alias("w"),
        F.count("*").alias("n_copies"),
        F.countDistinct("source").alias("n_sources"),
    )
    return agg.select(
        "fingerprint",
        F.col("w.doc_id").alias("kept_doc_id"),
        F.col("w.source").alias("kept_source"),
        "n_copies",
        F.col("n_sources").cast("long").alias("n_sources"),
    )


@register(
    "text_ngram_novelty",
    oracle="""
        WITH sh AS (
            SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, greatest(len(w) - 2, 0) + 1),
                           i -> array_to_string(w[i:i+2], ' '))) AS s
                FROM (SELECT doc_id,
                             list_filter(
                                 string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                                 x -> x <> '') AS w
                      FROM documents))
        ), dfreq AS (
            SELECT s, count(*) AS df FROM sh GROUP BY s
        )
        SELECT sh.doc_id,
               COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unique,
               CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*) AS novelty
        FROM sh JOIN dfreq ON dfreq.s = sh.s
        GROUP BY sh.doc_id
    """,
    doc="Trigram novelty score: the fraction of a document's distinct "
        "word-3-gram shingles that appear in NO other document — high "
        "novelty marks original content, near-zero marks templated/"
        "boilerplate pages (the inverse signal of "
        "text_boilerplate_passages, at shingle granularity). Reuses the "
        "dedup shingle pipeline: one document-frequency aggregation, one "
        "equi-join back (Zipf head broadcasts at scale), one per-doc "
        "aggregation; score = exact int / int, one double division.",
    tags=("curation",),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import shingles_exploded

    t = Tables(spark, sf_dir)
    sh = shingles_exploded(t.documents).cache()
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
    return (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("int")).cast("long")
            .alias("n_unique"),
            (
                F.sum((F.col("df") == 1).cast("int")).cast("double")
                / F.count("*")
            ).alias("novelty"),
        )
    )


_NUCLEUS_P = 0.8


@register(
    "text_nucleus_filter",
    oracle=f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   CAST(strlen(text) AS BIGINT) AS mass,
                   CAST(SUM(CAST(strlen(text) AS BIGINT)) OVER (
                       PARTITION BY source
                       ORDER BY strlen(text) DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_mass,
                   SUM(CAST(strlen(text) AS BIGINT)) OVER (
                       PARTITION BY source) AS total_mass
            FROM documents
        )
        SELECT doc_id, source, mass, cum_mass
        FROM ranked
        WHERE (cum_mass - mass) * CAST(10 AS BIGINT)
              < CAST({int(_NUCLEUS_P * 10)} AS BIGINT) * total_mass
    """,
    doc="Nucleus (top-p mass) curation filter: within each source, keep "
        "the largest documents until 80% of that source's total text "
        "mass is covered (the crossing document included) — the "
        "mass-budgeted selection a mixture builder uses when a source "
        "quota is expressed in tokens rather than documents. The "
        "cumulative-share test is kept in EXACT integer arithmetic "
        "(cum*10 < 8*total, no double division), so the cut point can't "
        "drift cross-engine. Mass is BYTE-defined (Spark octet_length == "
        "DuckDB strlen, both UTF-8 byte counts): character-length "
        "semantics diverge cross-engine on non-ASCII/degenerate text "
        "(CORRECTNESS_r03 hash mismatch on driver data the ASCII-ish "
        "local corpus never exercised — now pinned by the multibyte "
        "fixture in tests/test_oracle_fixtures.py). The cum_mass window "
        "SUM is outer-CAST to BIGINT: DuckDB SUM(BIGINT) yields HUGEINT, "
        "which pandas canonicalizers coerce to float64 (the r3/r4 driver "
        "hash mismatch — verify_local now audits oracle output types for "
        "this class). One window sort per "
        "source partition; at 100 TB per-source partitions parallelize "
        "independently and the ordering key (doc byte length) needs no "
        "secondary scan.",
    tags=("curation",),
)
def text_nucleus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    t = Tables(spark, sf_dir)
    mass = F.octet_length("text").cast("long")
    w_cum = (
        _W.partitionBy("source")
        .orderBy(F.desc(F.octet_length("text")), "doc_id")
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    w_tot = _W.partitionBy("source")
    ranked = t.documents.select(
        "doc_id",
        "source",
        mass.alias("mass"),
        F.sum(mass).over(w_cum).alias("cum_mass"),
        F.sum(mass).over(w_tot).alias("total_mass"),
    )
    keep = (F.col("cum_mass") - F.col("mass")) * 10 < F.lit(
        int(_NUCLEUS_P * 10)
    ) * F.col("total_mass")
    return ranked.filter(keep).select("doc_id", "source", "mass", "cum_mass")


_VOCAB_BUCKET = 50  # docs per growth-curve bucket


@register(
    "text_vocab_growth",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ), first_seen AS (
            SELECT word, MIN(doc_id) AS first_doc FROM words GROUP BY word
        ), per_bucket AS (
            SELECT CAST(first_doc // {_VOCAB_BUCKET} AS BIGINT) AS bucket,
                   COUNT(*) AS new_words
            FROM first_seen GROUP BY 1
        ), buckets AS (
            SELECT DISTINCT CAST(doc_id // {_VOCAB_BUCKET} AS BIGINT)
                AS bucket
            FROM documents
        )
        SELECT b.bucket,
               CAST(COALESCE(p.new_words, 0) AS BIGINT) AS new_words,
               CAST(SUM(COALESCE(p.new_words, 0)) OVER (
                   ORDER BY b.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS vocab_size
        FROM buckets b LEFT JOIN per_bucket p ON p.bucket = b.bucket
    """,
    doc="Vocabulary growth curve (Heaps'-law diagnostic): cumulative "
        "distinct word count as the corpus is consumed in doc-id order, "
        "bucketed every 50 documents — the curve a tokenizer team reads "
        "to size vocabularies and spot corpus saturation. Same linear "
        "first-seen rewrite as q_running_distinct (min doc per word, "
        "tiny per-bucket rollup, window over the bucket axis) instead of "
        "a quadratic expanding-prefix distinct.",
    tags=("curation",),
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_running_sums_dist

    t = Tables(spark, sf_dir)
    words = t.documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    first_seen = words.groupBy("word").agg(
        F.min("doc_id").alias("first_doc")
    )
    per_bucket = first_seen.groupBy(
        F.expr(f"first_doc div {_VOCAB_BUCKET}").cast("bigint")
        .alias("bucket")
    ).agg(F.count("*").alias("new_words"))
    buckets = t.documents.select(
        F.expr(f"doc_id div {_VOCAB_BUCKET}").cast("bigint").alias("bucket")
    ).distinct()
    joined = buckets.join(per_bucket, "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("new_words"), F.lit(0)).cast("long")
        .alias("new_words"),
    )
    # distributed running sum over the bucket axis (no unpartitioned
    # window — the axis grows with corpus size)
    return with_running_sums_dist(
        joined, [F.col("bucket").asc()], ["new_words"], prefix="c_"
    ).select(
        "bucket",
        "new_words",
        F.col("c_new_words").cast("long").alias("vocab_size"),
    )


# AMS (Alon-Matias-Szegedy) F2 sketch: 16 independent +/-1 counters. The
# sign for counter j is bit j of the word's top-52-bit md5 value — shared
# bit-exactly with the oracle via the conv/UBIGINT recipe (k = 13 hex
# chars). Each counter is an exact integer sum, so the whole sketch is
# order-free and cross-engine deterministic with no fixed-point scaffold.
_AMS_COUNTERS = 16


def _ams_oracle() -> str:
    sums = ",\n                   ".join(
        f"CAST(SUM(c * (1 - 2 * ((h >> {j}) & 1))) AS BIGINT) AS s{j}"
        for j in range(_AMS_COUNTERS)
    )
    rows = "\n            UNION ALL ".join(
        f"SELECT CAST({j} AS INTEGER) AS j, s{j} AS counter, "
        f"s{j} * s{j} AS est, exact_f2, n_distinct FROM agg"
        for j in range(_AMS_COUNTERS)
    )
    return f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ), wc AS (
            SELECT word, count(*) AS c FROM toks GROUP BY word
        ), hashed AS (
            SELECT c,
                   CAST(CAST(('0x' || substr(md5(word), 1, 13)) AS UBIGINT)
                        AS BIGINT) AS h
            FROM wc
        ), agg AS (
            SELECT {sums},
                   CAST(SUM(c * c) AS BIGINT) AS exact_f2,
                   CAST(count(*) AS BIGINT) AS n_distinct
            FROM hashed
        )
        {rows}
    """


@register(
    "sketch_ams_f2",
    oracle=_ams_oracle(),
    doc="AMS second-frequency-moment sketch over the document token "
        "stream: 16 +/-1 counters (sign = bit j of the word's md5-derived "
        "52-bit hash), each estimator = counter^2, published next to the "
        "exact F2 = sum(c^2) so the unbiasedness is visible in the "
        "output. The sketch is ONE grouped word count (map-side combined) "
        "followed by a single 18-column global aggregate — a fixed-width "
        "mergeable state like sketch_countmin, so at 100 TB it merges "
        "across shards/days by adding counters. Exactness: every counter "
        "is an integer sum (|s_j| <= total tokens), est = s_j^2 needs "
        "|s_j| < 2^31.5 to stay in int64 — at larger corpora emit the "
        "counters and square downstream. Signs come from ONE md5 per "
        "distinct word, not per (word, counter): the 52 hash bits are "
        "pairwise-independent enough for the classic median-of-estimates "
        "read-out, and the single-hash layout keeps the scan ALU-bound.",
    tags=("sketch",),
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    wc = (
        t.documents.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    h = F.conv(F.substring(F.md5("word"), 1, 13), 16, 10).cast("long")
    hashed = wc.select("c", h.alias("h"))
    sums = [
        F.sum(
            F.col("c")
            * (
                F.lit(1)
                - F.lit(2)
                * F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))
            )
        ).alias(f"s{j}")
        for j in range(_AMS_COUNTERS)
    ]
    agg = hashed.agg(
        *sums,
        F.sum(F.col("c") * F.col("c")).alias("exact_f2"),
        F.count("*").alias("n_distinct"),
    )
    counters = F.array(*[F.col(f"s{j}") for j in range(_AMS_COUNTERS)])
    return agg.select(
        F.posexplode(counters).alias("j", "counter"),
        "exact_f2",
        "n_distinct",
    ).select(
        F.col("j").cast("int").alias("j"),
        "counter",
        (F.col("counter") * F.col("counter")).alias("est"),
        "exact_f2",
        "n_distinct",
    )


_EPOCHS = 2       # training epochs to audit
_SHUF_SHARDS = 8  # shards per epoch


@register(
    "text_epoch_shuffle",
    oracle=f"""
        WITH h AS (
            SELECT e.epoch,
                   CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                         || ':' || CAST(e.epoch AS VARCHAR)), 1, 13))
                        AS UBIGINT) AS hv,
                   CAST(strlen(d.text) AS BIGINT) AS n_bytes
            FROM documents d,
                 (SELECT unnest(range(0, {_EPOCHS})) AS epoch) e
        )
        SELECT CAST(epoch AS INTEGER) AS epoch,
               CAST(hv % {_SHUF_SHARDS} AS INTEGER) AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(min(hv) AS BIGINT) AS min_h,
               CAST(max(hv) AS BIGINT) AS max_h
        FROM h
        GROUP BY 1, 2
    """,
    doc="Deterministic per-epoch training shuffle + shard-balance "
        "audit: each epoch reshuffles the corpus by h = "
        "md5(doc_id:epoch) (the cross-engine conv/UBIGINT recipe, "
        "k=13 hex chars so h < 2^52 fits BIGINT exactly), shard = "
        "h % 8. Emits per-(epoch, shard) doc counts, byte mass "
        "(octet-defined), and the h-range checksum — the balance "
        "report that validates shard assignment before a training run, "
        "and a different deterministic permutation per epoch (the "
        "data-order property epoch training needs). Map-side hash + "
        "one bounded group-by; no rank, no shuffle beyond the 16-cell "
        "agg — embarrassingly parallel at any corpus size.",
    tags=("text", "curation"),
)
def text_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    epochs = F.explode(
        F.sequence(F.lit(0), F.lit(_EPOCHS - 1))
    ).alias("epoch")
    base = t.documents.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        epochs,
    )
    h = F.conv(
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
        base.select("epoch", "n_bytes", h.alias("hv"))
        .groupBy(
            F.col("epoch").cast("int").alias("epoch"),
            (F.col("hv") % _SHUF_SHARDS).cast("int").alias("shard"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("hv").alias("min_h"),
            F.max("hv").alias("max_h"),
        )
    )
