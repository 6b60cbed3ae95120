"""Semantic invariants for the corpus-curation operators beyond the
oracle-equality check (test_oracle_parity covers bit-exactness).

Reference has no analog (its corpus prep is
cluster/shared/generate_wordcount_data.sh); these are north-star
LLM-pipeline extensions (SURVEY §7.1-6).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.operators.text_curation import (
    MIXTURE_RATES,
    SHARD_BUDGET,
    text_mixture_sample,
    text_pack_shards,
)
from conftest import SF_GATE


def test_pack_shards_budget_invariants(spark):
    rows = text_pack_shards(spark, SF_GATE).orderBy("doc_id").collect()
    # shard ids non-decreasing in doc order, starting at 0
    shards = [r.shard for r in rows]
    assert shards[0] == 0
    assert all(a <= b for a, b in zip(shards, shards[1:]))
    # each doc is assigned to the shard in which its first token lands
    for r in rows:
        assert (r.cum_tokens - r.n_tokens) // SHARD_BUDGET == r.shard
    # a shard's content exceeds the budget by at most its last doc's
    # spill-over (docs aren't split), never by a whole extra doc
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, docs in by_shard.items():
        tot = sum(d.n_tokens for d in docs)
        assert tot < SHARD_BUDGET + docs[-1].n_tokens or len(docs) == 1
    # cumulative sum is the plain global prefix sum
    run = 0
    for r in rows:
        run += r.n_tokens
        assert r.cum_tokens == run


def test_mixture_sample_rates(spark):
    docs = spark.read.parquet(f"{SF_GATE}/documents.parquet")
    totals = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    picked = text_mixture_sample(spark, SF_GATE)
    got = {
        r.lang: r.n
        for r in picked.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # sampling is a per-doc Bernoulli at rate int(threshold,16)/256 —
    # binomial bounds are loose at these counts, so just pin ordering:
    # en keeps the most mass and every language keeps a strict subset
    for lang, thr in MIXTURE_RATES.items():
        rate = int(thr, 16) / 256
        assert got.get(lang, 0) <= totals[lang]
        # expected count with generous +/- slack (3 sigma-ish)
        exp = totals[lang] * rate
        sd = max(3 * (exp * (1 - rate)) ** 0.5, 6)
        assert abs(got.get(lang, 0) - exp) <= sd, (lang, got.get(lang), exp)
    # determinism: same call twice, identical selection
    again = {
        r.lang: r.n
        for r in text_mixture_sample(spark, SF_GATE)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == again
