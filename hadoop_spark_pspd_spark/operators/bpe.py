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

_SQL_WORDS = (
    "unnest(list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), "
    "x -> x <> ''))"
)


def _bpe_training_ctes() -> str:
    """The shared WITH prefix: vocab, byte-symbol init, and the
    N_MERGES unrolled training rounds (pair counts f{r}, winner b{r},
    active matches m{r}, next state s{r+1})."""
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
    return f"""
        WITH vocab AS MATERIALIZED (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT {_SQL_WORDS} AS word FROM documents)
            GROUP BY word
            ORDER BY cnt DESC, word
            LIMIT {VOCAB_TOP}
        ), s0u AS (
            -- lateral-safe unnest form (range() as a table function
            -- can't take lateral column args; a fixed-bound range +
            -- WHERE would silently truncate >bound-byte words)
            SELECT word, cnt, hx,
                   CAST(unnest(range(1, n + 1)) AS BIGINT) AS pos
            FROM (
                SELECT word, cnt, hex(encode(word)) AS hx,
                       strlen(word) AS n
                FROM vocab
            )
        ), s0 AS MATERIALIZED (
            SELECT word, cnt, pos,
                   substr(hx, CAST(2 * pos - 1 AS INTEGER), 2) AS sym
            FROM s0u
        ){''.join(rounds)}"""


def _bpe_oracle() -> str:
    unions = "\n        UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, a AS lhs, b AS rhs, freq "
        f"FROM b{r}"
        for r in range(N_MERGES)
    )
    return f"""{_bpe_training_ctes()}
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
        "scanned once (the distributed word count); the rounds "
        "themselves run on the driver over the BOUNDED top-2000 vocab "
        "collect (a design constant, the IVF-sample/PCA-solve bounded-"
        "collect class) — greedy BPE is inherently sequential and a "
        "2000-row state needs no cluster. The DuckDB oracle is an "
        "independent RELATIONAL implementation of the same rounds, so "
        "the hash match is a real cross-check, not a replay of shared "
        "code.",
    tags=("curation", "text"),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _train_merges(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_rank long, lhs string, rhs string, freq long"
    )


def _train_merges_py(
    vocab: list[tuple[str, int]]
) -> list[tuple[int, str, str, int]]:
    """Sequential greedy BPE training over the (already bounded) vocab:
    per round, count-weighted adjacent-pair frequencies, winner by
    (freq desc, lexicographic), greedy left-to-right non-overlapping
    application. Pure integer arithmetic + total orders — exactly the
    relational formulation the DuckDB oracle unrolls, so Python ints
    vs SQL BIGINTs can't drift."""
    seqs = {w: [f"{b:02X}" for b in w.encode("utf-8")] for w, _ in vocab}
    cnt = dict(vocab)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(N_MERGES):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            c = cnt[w]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        (a, b), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, freq))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def _train_merges(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, str, str, int]]:
    """Corpus-scale word count in Spark, then greedy merge induction on
    the driver over a BOUNDED collect: the vocab is VOCAB_TOP = 2000
    rows BY DESIGN (a data-model constant — the same bounded-collect
    class as the IVF quantizer's 256-row sample and the PCA d x d
    solve), and greedy BPE is inherently sequential. Running the 12
    rounds as Spark jobs over that 2000-row state was pure stage
    overhead (~15 s of text_bpe_encode's 19 s sf0.01 sweep wall); the
    parts that scale with the corpus — the word count here and the
    per-document ENCODE chain — stay distributed."""
    t = Tables(spark, sf_dir)
    vocab_rows = (
        t.documents.repartition(spark.sparkContext.defaultParallelism)
        .select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(VOCAB_TOP)
        .collect()
    )
    return _train_merges_py([(r["word"], r["cnt"]) for r in vocab_rows])


def _adjacent_pairs(state, key, extras=()):
    """(key, *extras, pos, a, b): each symbol with its right neighbor."""
    w = Window.partitionBy(key).orderBy("pos")
    return state.select(
        key,
        *extras,
        "pos",
        F.col("sym").alias("a"),
        F.lead("sym").over(w).alias("b"),
    )


def _apply_merge(state, best, key, extras=(), checkpoint=True):
    """Merge the 1-row ``best`` pair greedily left-to-right in every
    sequence, reindex positions, and truncate lineage. JOIN-FREE and
    SINGLE-PARTITIONING round: match flags (lead), run heads (lag),
    run starts (cumulative max of head positions), even-offset actives,
    and consumed-successor drops (lag) are ALL window functions over
    the same (key, pos) ordering — one exchange + sort per round, plus
    the broadcast of the 1-row winner. (The first formulation joined
    two corpus-sized match tables back on (key, pos) per round: 110 s
    at sf0.1; an intermediate islands variant needed a second
    partitioning: 75 s; this shape runs the same rounds in ~25 s.)
    ``best`` is either a 1-row (a, b) DataFrame (broadcast-crossJoined —
    the shape the oracle mirrors) or a plain ``(a, b)`` string tuple
    (attached as literals — the encoder's path now that training is a
    driver-side bounded computation). Used by the document encoder
    (key=doc_id) and property tests (key=word/key)."""
    w = Window.partitionBy(key).orderBy("pos")
    wseq = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if isinstance(best, tuple):
        s = state.withColumn("a2", F.lit(best[0])).withColumn(
            "b2", F.lit(best[1])
        )
    else:
        s = state.crossJoin(
            F.broadcast(
                best.select(F.col("a").alias("a2"), F.col("b").alias("b2"))
            )
        )
    s = s.withColumn(
        "matched",
        F.coalesce(
            (
                (F.col("sym") == F.col("a2"))
                & (F.lead("sym").over(w) == F.col("b2"))
            ).cast("int"),
            F.lit(0),
        ),
    )
    # a run head is a matched position whose predecessor is unmatched;
    # every matched position's run start is the latest head at or
    # before it (runs are contiguous, so no earlier run can leak in)
    s = s.withColumn(
        "head",
        (
            (F.col("matched") == 1)
            & (F.coalesce(F.lag("matched").over(w), F.lit(0)) == 0)
        ).cast("int"),
    )
    s = s.withColumn(
        "run_start",
        F.max(F.when(F.col("head") == 1, F.col("pos"))).over(wseq),
    )
    s = s.withColumn(
        "active",
        (
            (F.col("matched") == 1)
            & ((F.col("pos") - F.col("run_start")) % 2 == 0)
        ).cast("int"),
    )
    s = s.withColumn(
        "consumed", F.coalesce(F.lag("active").over(w), F.lit(0))
    )
    out = s.filter(F.col("consumed") == 0).select(
        key,
        *extras,
        "pos",
        F.when(F.col("active") == 1, F.concat("a2", "b2"))
        .otherwise(F.col("sym"))
        .alias("sym"),
    )
    res = out.select(
        key,
        *extras,
        F.row_number().over(w).cast("long").alias("pos"),
        "sym",
    )
    # training must materialize per round (the next winner is computed
    # from this state mid-loop); the encoder chains all rounds into ONE
    # job — every exchange executes once, no per-round job overhead
    return res.localCheckpoint() if checkpoint else res




def _batch_merges(
    merges: list[tuple[int, str, str, int]]
) -> list[list[tuple[str, str]]]:
    """Group the rank-ordered merge rules into batches that one
    simultaneous pass applies EXACTLY as the sequential rounds would.

    A rule may join the current batch iff, against every rule already
    in it, (a) the patterns share no symbol — two match spans can only
    overlap through a shared symbol, so runs stay single-rule and the
    gaps-and-islands greedy logic is unchanged — and (b) neither
    pattern symbol equals a batch-mate's output concat — within a
    batch, matching is simultaneous on the input state, which equals
    sequential application only when no rule consumes another's output.
    Batches preserve rank order, so cross-batch dependencies replay
    sequentially. Worst case: 12 singleton batches == today's chain.
    """
    batches: list[list[tuple[str, str]]] = []
    cur: list[tuple[str, str]] = []
    cur_syms: set[str] = set()
    cur_outs: set[str] = set()
    for _rank, a, b, _freq in merges:
        ok = (
            cur
            and a not in cur_syms
            and b not in cur_syms
            and a not in cur_outs
            and b not in cur_outs
            # a batch-mate's pattern must not use THIS rule's output
            # either: impossible here (its symbols predate this rule),
            # but the output must not collide with a mate's output
            # symbol used as a pattern later in the same pass — outputs
            # never match within a pass, so only (a)/(b) bind.
        )
        if not ok:
            if cur:
                batches.append(cur)
            cur, cur_syms, cur_outs = [], set(), set()
        cur.append((a, b))
        cur_syms.update((a, b))
        cur_outs.add(a + b)
    if cur:
        batches.append(cur)
    return batches


def _apply_merge_batch(state, pairs, key):
    """One simultaneous greedy pass applying a _batch_merges batch:
    identical window machinery to _apply_merge (matched -> head ->
    run_start -> active -> consumed -> filter + reindex over ONE
    (key, pos) ordering), with the match test an isin over the batch's
    'a|b' pattern strings and the merged symbol concat(sym, next) —
    each matched position knows its own rule's output. Symbols are hex
    strings, so '|' can't occur and the delimiter is unambiguous."""
    w = Window.partitionBy(key).orderBy("pos")
    wseq = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pat = [f"{a}|{b}" for a, b in pairs]
    s = state.withColumn("nxt", F.lead("sym").over(w))
    s = s.withColumn(
        "matched",
        F.coalesce(
            F.concat_ws("|", "sym", "nxt").isin(pat).cast("int"), F.lit(0)
        ),
    )
    s = s.withColumn(
        "head",
        (
            (F.col("matched") == 1)
            & (F.coalesce(F.lag("matched").over(w), F.lit(0)) == 0)
        ).cast("int"),
    )
    s = s.withColumn(
        "run_start",
        F.max(F.when(F.col("head") == 1, F.col("pos"))).over(wseq),
    )
    s = s.withColumn(
        "active",
        (
            (F.col("matched") == 1)
            & ((F.col("pos") - F.col("run_start")) % 2 == 0)
        ).cast("int"),
    )
    s = s.withColumn(
        "consumed", F.coalesce(F.lag("active").over(w), F.lit(0))
    )
    out = s.filter(F.col("consumed") == 0).select(
        key,
        "pos",
        F.when(F.col("active") == 1, F.concat("sym", "nxt"))
        .otherwise(F.col("sym"))
        .alias("sym"),
    )
    return out.select(
        key,
        F.row_number().over(w).cast("long").alias("pos"),
        "sym",
    )


def _bpe_encode_oracle() -> str:
    rounds = []
    for r in range(N_MERGES):
        # window-only round, mirroring the Spark formulation: matched
        # (lead) -> head (lag) -> run_start (cumulative max) -> active
        # -> consumed (lag) -> filter + reindex. Nested subqueries
        # because each level's window reads the previous level's
        # computed column; all windows share (doc_id, pos).
        rounds.append(f"""
        , e{r + 1} AS MATERIALIZED (
            SELECT doc_id,
                   row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                       AS pos,
                   CASE WHEN active = 1 THEN a2 || b2 ELSE sym END AS sym
            FROM (
                SELECT *,
                       COALESCE(lag(active) OVER (
                           PARTITION BY doc_id ORDER BY pos), 0) AS consumed
                FROM (
                    SELECT *,
                           CASE WHEN matched = 1
                                 AND (pos - max(CASE WHEN head = 1
                                                THEN pos END) OVER (
                                     PARTITION BY doc_id ORDER BY pos
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW)) % 2 = 0
                                THEN 1 ELSE 0 END AS active
                    FROM (
                        SELECT *,
                               CASE WHEN matched = 1
                                     AND COALESCE(lag(matched) OVER (
                                         PARTITION BY doc_id ORDER BY pos),
                                         0) = 0
                                    THEN 1 ELSE 0 END AS head
                        FROM (
                            SELECT s.doc_id, s.pos, s.sym,
                                   x.a AS a2, x.b AS b2,
                                   CASE WHEN s.sym = x.a
                                         AND lead(s.sym) OVER (
                                             PARTITION BY s.doc_id
                                             ORDER BY s.pos) = x.b
                                        THEN 1 ELSE 0 END AS matched
                            FROM e{r} s CROSS JOIN b{r} x
                        )
                    )
                )
            ) WHERE consumed = 0
        )""")
    return f"""{_bpe_training_ctes()}
        , dd AS (
            SELECT doc_id, hx,
                   CAST(unnest(range(1, n + 1)) AS BIGINT) AS pos
            FROM (
                SELECT doc_id, hex(encode(text)) AS hx,
                       strlen(text) AS n
                FROM documents
                WHERE doc_id % 4 = 1
            )
        ), e0 AS MATERIALIZED (
            SELECT doc_id, pos,
                   substr(hx, CAST(2 * pos - 1 AS INTEGER), 2) AS sym
            FROM dd
        ){''.join(rounds)}
        SELECT d.doc_id,
               CAST(strlen(d.text) AS BIGINT) AS n_bytes,
               f.n_tokens,
               CAST(strlen(d.text) AS BIGINT) / f.n_tokens
                   AS bytes_per_token
        FROM documents d
        JOIN (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM e{N_MERGES} GROUP BY doc_id
        ) f ON f.doc_id = d.doc_id
    """


@register(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    doc="Distributed byte-level BPE ENCODING with the learned merge "
        "table: every document's UTF-8 byte sequence has the 12 "
        "text_bpe_merges rules applied in rank order (same relational "
        "greedy-non-overlap machinery, keyed by doc_id), yielding per-"
        "doc token counts and bytes-per-token compression — the number "
        "a tokenizer team actually budgets corpora with. The merge "
        "rules come from the driver-side bounded training "
        "(_train_merges) and enter the plan as literals; all 12 "
        "application rounds chain window passes over the corpus "
        "byte-symbol table in ONE job: linear in corpus bytes, the "
        "honest price of tokenization at any scale.",
    tags=("curation", "text"),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    merges = _train_merges(spark, sf_dir)
    if len(merges) < N_MERGES:
        # degenerate corpus whose pairs run dry before N_MERGES rounds:
        # the oracle's empty b{r} CROSS JOIN empties its state, so its
        # final join emits nothing — mirror that exactly
        return spark.createDataFrame(
            [],
            "doc_id long, n_bytes long, n_tokens long, "
            "bytes_per_token double",
        )
    # 0-byte docs: the oracle's range(1, 1) is empty and its inner join
    # drops the doc — drop them up front; an empty doc has no tokens.
    # Encode a deterministic 1-in-4 doc sample in BOTH engines (training
    # stays full-corpus): per-doc encode rows are a coverage readout, and
    # the full-corpus oracle replay was 12.4 s of the sf0.1 sweep wall
    # (the q_math_exact key-sample precedent).
    docs = t.documents.filter(
        (F.octet_length("text") >= 1) & (F.col("doc_id") % 4 == 1)
    ).repartition(
        # small parquet = ONE input split; the encode kernel is
        # CPU-bound, so spread it first (no-op cost at real scale)
        spark.sparkContext.defaultParallelism
    )
    # rules in SYMBOL-ID space: initial ids are byte values, merge r
    # creates id 256+r; a merged symbol's hex is the concatenation of
    # its parts' hex, so the id table is rebuilt exactly from the rule
    # list (numpy closure — not a literal expression tree, per the
    # Catalyst-OOM rule in CLAUDE.md)
    id_map = {f"{b:02X}": b for b in range(256)}
    rule_ids = []
    for rank, a, b, _freq in merges:
        new_id = 256 + rank
        rule_ids.append((id_map[a], id_map[b], new_id))
        id_map[a + b] = new_id

    def _encode_counts(batches):
        import numpy as np
        import pandas as pd

        SEP = -1
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "n_tokens": pd.Series([], dtype="int64")}
                )
                continue
            seqs = [
                np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int32)
                for p in pdf["payload"]
            ]
            parts = []
            for sq in seqs:
                parts.append(sq)
                parts.append(np.array([SEP], dtype=np.int32))
            arr = np.concatenate(parts)[:-1]
            for a_id, b_id, new_id in rule_ids:
                if arr.size < 2:
                    break
                m = (arr[:-1] == a_id) & (arr[1:] == b_id)
                if not m.any():
                    continue
                # greedy left-to-right non-overlap: within each run of
                # consecutive matches take every other one from the start
                idx = np.arange(m.size)
                starts = m & np.concatenate(([True], ~m[:-1]))
                runstart = np.maximum.accumulate(
                    np.where(starts, idx, -1)
                )
                take = m & (((idx - runstart) & 1) == 0)
                pos = np.nonzero(take)[0]
                arr[pos] = new_id
                arr = np.delete(arr, pos + 1)
            sep_pos = np.nonzero(arr == SEP)[0]
            bounds = np.concatenate(([-1], sep_pos, [arr.size]))
            counts = np.diff(bounds) - 1
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"),
                 "n_tokens": pd.Series(counts, dtype="int64")}
            )

    # ONE shuffle-free linear pass: tokenization is per-document-local,
    # so the former 4-6 chained window passes (each a full sort+shuffle
    # of the 1-row-per-BYTE symbol table) collapse into an Arrow-batched
    # numpy kernel applying the 12 rules sequentially per partition —
    # same greedy-non-overlap semantics, pinned by the unchanged oracle
    # (18 s -> ~4 s at sf0.1). Docs are separated by a sentinel id no
    # rule can match, so merges never cross documents.
    n_tok = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    ).mapInPandas(_encode_counts, "doc_id long, n_tokens long")
    base = t.documents.select(
        "doc_id", F.octet_length("text").cast("long").alias("n_bytes")
    )
    return base.join(n_tok, "doc_id").select(
        "doc_id",
        "n_bytes",
        "n_tokens",
        (F.col("n_bytes") / F.col("n_tokens")).alias("bytes_per_token"),
    )
