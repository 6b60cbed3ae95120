"""BPE checks. Since round 5 the ENGINE's training is itself the
sequential scan-and-skip algorithm (driver-side over the bounded vocab),
so _reference_bpe below is no longer a fully independent third
implementation of TRAINING — the independent training cross-check is
the DuckDB oracle's relational gaps-and-islands formulation
(test_oracle_parity/test_oracle_fixtures hash it). What stays
independently pinned here: the Spark ENCODE path's window-only
greedy-non-overlap machinery (_apply_merge) against scan-and-skip on
adversarial sequences, and the vocab-count plumbing feeding training."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.catalog import Tables
from hadoop_spark_pspd_spark.functions.text import tokens
from hadoop_spark_pspd_spark.operators.bpe import (
    N_MERGES,
    VOCAB_TOP,
    text_bpe_merges,
)

from conftest import SF_SMOKE


def _reference_bpe(vocab: dict[str, int], n_merges: int):
    seqs = {
        w: [f"{b:02X}" for b in w.encode("utf-8")] for w in vocab
    }
    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += vocab[w]
        if not counts:
            break
        # max freq, then lexicographic (a, b)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), freq = best
        merges.append((rank, a, b, freq))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2  # greedy left-to-right, non-overlapping
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_matches_sequential_reference(spark):
    t = Tables(spark, SF_SMOKE)
    vocab_rows = (
        t.documents.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(VOCAB_TOP)
        .collect()
    )
    vocab = {r["word"]: r["cnt"] for r in vocab_rows}
    expect = _reference_bpe(vocab, N_MERGES)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["freq"])
        for r in text_bpe_merges(spark, SF_SMOKE)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expect


def test_apply_merge_equals_scan_and_skip_on_random_sequences(spark):
    """Property check of the window-only greedy rule on adversarial
    inputs the corpus never produces: 200 random sequences over a
    2-symbol alphabet (maximizing overlapping-run edge cases: aaaa...,
    runs at boundaries, full-sequence runs), merged against a random
    pair — one Spark job for all sequences, compared against the
    sequential scan-and-skip reference per sequence."""
    import random

    from hadoop_spark_pspd_spark.operators.bpe import _apply_merge

    rng = random.Random(20260814)
    seqs = {
        k: [rng.choice("ab") for _ in range(rng.randint(1, 12))]
        for k in range(200)
    }
    a, b = "a", "a"  # the hardest pair: self-overlapping runs
    rows = [
        (k, pos + 1, sym)
        for k, syms in seqs.items()
        for pos, sym in enumerate(syms)
    ]
    state = spark.createDataFrame(rows, "key long, pos long, sym string")
    best = spark.createDataFrame([(a, b, 1)], "a string, b string, freq long")
    got = {}
    for r in _apply_merge(state, best, "key").collect():
        got.setdefault(r["key"], []).append((r["pos"], r["sym"]))
    got = {k: [s for _, s in sorted(v)] for k, v in got.items()}

    def scan_and_skip(syms):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    for k, syms in seqs.items():
        assert got[k] == scan_and_skip(syms), (k, syms, got[k])


def test_bpe_end_to_end_on_overlap_and_tie_adversarial_corpus(
    spark, tmp_path_factory
):
    """The round-4 brief's adversarial case: corpora built from EVERY
    {a,b}-string up to length 6 (one occurrence each) — maximal pair-
    frequency TIES (broken lexicographically), self-overlapping runs
    (aaaaaa), alternations whose merged symbol immediately re-pairs in
    later rounds (ababab -> ab ab ab -> abab ab), and merges landing at
    word boundaries. Both text_bpe_merges AND text_bpe_encode must match
    the sequential scan-and-skip reference across all 12 rounds."""
    words = []
    for n in range(1, 7):
        for bits in range(1 << n):
            words.append(
                "".join("ab"[(bits >> i) & 1] for i in range(n))
            )
    # one doc per word plus stress docs that put overlapping runs at
    # word boundaries inside multi-word lines
    docs = [(i, w) for i, w in enumerate(words)]
    docs += [
        (len(docs), "ababab aaaaaa ababa abaab"),
        (len(docs) + 1, "aaaa aaaa aaaa"),
        (len(docs) + 2, "bababa abab ba"),
    ]
    d = tmp_path_factory.mktemp("bpe_tie_sf")
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    sf = str(d)

    t = Tables(spark, sf)
    vocab_rows = (
        t.documents.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(VOCAB_TOP)
        .collect()
    )
    vocab = {r["word"]: r["cnt"] for r in vocab_rows}
    expect = _reference_bpe(vocab, N_MERGES)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["freq"])
        for r in text_bpe_merges(spark, sf).orderBy("merge_rank").collect()
    ]
    assert got == expect

    # sequential encode with the learned rules, rank order, scan-and-skip
    def encode(text: str) -> int:
        syms = [f"{b:02X}" for b in text.encode("utf-8")]
        for _rank, a, b, _f in expect:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    from hadoop_spark_pspd_spark.operators.bpe import text_bpe_encode

    enc = {
        r["doc_id"]: (r["n_bytes"], r["n_tokens"])
        for r in text_bpe_encode(spark, sf).collect()
    }
    # the encode query emits the deterministic 1-in-4 doc sample
    # (training stays full-corpus); non-sampled docs must be absent
    assert set(enc) == {d for d, _t in docs if d % 4 == 1}
    for doc_id, text in docs:
        if doc_id % 4 != 1:
            continue
        nb = len(text.encode("utf-8"))
        assert enc[doc_id] == (nb, encode(text)), (doc_id, text, enc[doc_id])
