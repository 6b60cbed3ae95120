"""Byte-level BPE merge induction over the ``documents`` vocabulary.

The tokenizer-training primitive of a modern LLM data pipeline (Sennrich
et al. 2016 word-level BPE, applied at the byte level as in GPT-2-family
tokenizers — both public algorithms; the reference has no tokenizer
tier at all, cluster/tools/run_fault_tests.py:26-30 tokenizes by
whitespace only). Learns the first ``N_MERGES`` merges:

  1. vocabulary = top ``VOCAB_TOP`` corpus words by count (count desc,
     word tie-break — BPE training conventionally runs on a bounded
     word-count table, which Zipf keeps tiny relative to the corpus);
  2. every word becomes its UTF-8 BYTE sequence, each byte rendered as
     a 2-hex-char symbol (byte level sidesteps all cross-engine unicode
     char semantics — hex() is byte-identical in Spark and DuckDB);
  3. per round: count adjacent symbol pairs weighted by word count
     (overlapping occurrences count, the standard formulation), pick
     the max pair (freq desc, then lexicographic), and merge its
     non-overlapping occurrences left-to-right greedily.

Everything is INTEGER arithmetic + total-order tie-breaks — no floats —
so the 12 rounds replay exactly in DuckDB as unrolled MATERIALIZED CTEs
(the fixed-iteration oracle pattern shared with graph_pagerank /
kmeans_embeddings). The greedy left-to-right non-overlap rule is
expressed relationally: match positions form gaps-and-islands runs per
word; within a run, every even offset from the run start is an applied
merge (exactly what a sequential scan-and-skip produces).

Scale: per round, one pair-count shuffle over the symbol table (bounded
by vocab size x word length, NOT corpus size), one broadcast of the
1-row winning pair, and per-word window ops — the corpus is touched
once, for the initial word count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.text import tokens
from ..registry import register

N_MERGES = 12
VOCAB_TOP = 2000
_MAX_WORD_BYTES = 1024

_SQL_WORDS = (
    "unnest(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), "
    "x -> x <> ''))"
)


def _bpe_oracle() -> str:
    rounds = []
    for r in range(N_MERGES):
        rounds.append(f"""
        , p{r} AS MATERIALIZED (
            SELECT word, cnt, pos, sym AS a,
                   lead(sym) OVER (PARTITION BY word ORDER BY pos) AS b
            FROM s{r}
        ), f{r} AS MATERIALIZED (
            SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS freq
            FROM p{r} WHERE b IS NOT NULL GROUP BY a, b
        ), b{r} AS MATERIALIZED (
            SELECT a, b, freq FROM f{r} ORDER BY freq DESC, a, b LIMIT 1
        ), m{r} AS MATERIALIZED (
            SELECT word, pos,
                   CASE WHEN (pos - min(pos) OVER (PARTITION BY word, grp))
                             % 2 = 0
                        THEN 1 ELSE 0 END AS active
            FROM (
                SELECT p.word, p.pos,
                       p.pos - row_number() OVER (
                           PARTITION BY p.word ORDER BY p.pos
                       ) AS grp
                FROM p{r} p JOIN b{r} x ON p.a = x.a AND p.b = x.b
            )
        ), s{r + 1} AS MATERIALIZED (
            SELECT word, cnt,
                   row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
                   CASE WHEN act = 1 THEN a2 || b2 ELSE sym END AS sym
            FROM (
                SELECT s.word, s.cnt, s.pos, s.sym,
                       COALESCE(ma.active, 0) AS act,
                       COALESCE(mb.active, 0) AS consumed,
                       x.a AS a2, x.b AS b2
                FROM s{r} s
                LEFT JOIN m{r} ma ON ma.word = s.word AND ma.pos = s.pos
                LEFT JOIN m{r} mb ON mb.word = s.word AND mb.pos = s.pos - 1
                CROSS JOIN b{r} x
            ) WHERE consumed = 0
        )""")
    unions = "\n        UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, a AS lhs, b AS rhs, freq "
        f"FROM b{r}"
        for r in range(N_MERGES)
    )
    return f"""
        WITH vocab AS MATERIALIZED (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT {_SQL_WORDS} AS word FROM documents)
            GROUP BY word
            ORDER BY cnt DESC, word
            LIMIT {VOCAB_TOP}
        ), s0 AS MATERIALIZED (
            SELECT word, cnt, CAST(u.i AS BIGINT) AS pos,
                   substr(hx, CAST(2 * u.i - 1 AS INTEGER), 2) AS sym
            FROM (
                SELECT word, cnt, hex(encode(word)) AS hx,
                       strlen(word) AS n
                FROM vocab
            ), range(1, {_MAX_WORD_BYTES} + 1) u(i)
            WHERE u.i <= n
        ){''.join(rounds)}
        {unions}
    """


@register(
    "text_bpe_merges",
    oracle=_bpe_oracle(),
    doc="Byte-level BPE tokenizer induction: the first 12 merge rules "
        "(merge_rank, lhs, rhs, freq) learned from the corpus word-count "
        "table (top-2000 words, UTF-8 bytes as hex symbols). Pair counts "
        "are weighted adjacent-symbol sums; the winning pair (freq desc, "
        "lexicographic tie-break) is merged greedily left-to-right, "
        "expressed relationally via gaps-and-islands even-offset runs. "
        "Pure integer arithmetic + total orders -> the 12 rounds replay "
        "exactly in DuckDB as unrolled MATERIALIZED CTEs. The corpus is "
        "scanned once (word count); every round is bounded by vocab size "
        "x word length, with the 1-row winner broadcast.",
    tags=("curation", "text"),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    vocab = (
        t.documents.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(VOCAB_TOP)
    )
    hx = F.hex(F.col("word").cast("binary"))
    state = (
        vocab.select(
            "word",
            "cnt",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.octet_length("word")),
                    lambda i: F.substring(hx, i * 2 - 1, F.lit(2)),
                )
            ).alias("p0", "sym"),
        )
        .select(
            "word", "cnt", (F.col("p0") + 1).cast("long").alias("pos"), "sym"
        )
        .localCheckpoint()
    )
    w = Window.partitionBy("word").orderBy("pos")
    merge_rows = []
    for r in range(N_MERGES):
        pairs = state.select(
            "word",
            "cnt",
            "pos",
            F.col("sym").alias("a"),
            F.lead("sym").over(w).alias("b"),
        )
        freq = (
            pairs.filter(F.col("b").isNotNull())
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("freq"))
        )
        best = (
            freq.orderBy(F.desc("freq"), "a", "b").limit(1).localCheckpoint()
        )
        merge_rows.append(
            best.select(
                F.lit(r).cast("long").alias("merge_rank"),
                F.col("a").alias("lhs"),
                F.col("b").alias("rhs"),
                "freq",
            )
        )
        matches = pairs.join(
            F.broadcast(best.select("a", "b")), ["a", "b"]
        ).select("word", "pos")
        grp = (F.col("pos") - F.row_number().over(w)).alias("grp")
        w_run = Window.partitionBy("word", "grp")
        actives = (
            matches.select("word", "pos", grp)
            .select(
                "word",
                "pos",
                (
                    (F.col("pos") - F.min("pos").over(w_run)) % 2 == 0
                ).cast("int").alias("active"),
            )
        )
        ma = actives.select(
            F.col("word").alias("word"), F.col("pos").alias("pos"),
            F.col("active").alias("act"),
        )
        mb = actives.select(
            F.col("word").alias("word"),
            (F.col("pos") + 1).alias("pos"),
            F.col("active").alias("consumed"),
        )
        state = (
            state.join(F.broadcast(ma), ["word", "pos"], "left")
            .join(F.broadcast(mb), ["word", "pos"], "left")
            .crossJoin(
                F.broadcast(
                    best.select(
                        F.col("a").alias("a2"), F.col("b").alias("b2")
                    )
                )
            )
            .filter(F.coalesce(F.col("consumed"), F.lit(0)) == 0)
            .select(
                "word",
                "cnt",
                "pos",
                F.when(
                    F.coalesce(F.col("act"), F.lit(0)) == 1,
                    F.concat("a2", "b2"),
                )
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
            .select(
                "word",
                "cnt",
                F.row_number().over(w).cast("long").alias("pos"),
                "sym",
            )
            .localCheckpoint()
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    return out
