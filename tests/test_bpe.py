"""Independent reference check for text_bpe_merges: a third
implementation (sequential pure Python, the textbook scan-and-skip
formulation) must produce the identical 12 merge rules — pinning that
the relational gaps-and-islands merge rule really equals greedy
left-to-right non-overlapping application, independent of the DuckDB
oracle sharing the engine's relational formulation."""

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
