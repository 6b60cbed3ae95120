"""Invariant tests for the curation-extras family (curation_extra.py +
sim_twostage_rerank). Oracle parity is covered by test_oracle_parity /
verify_local; these pin the semantic guarantees the hashes can't express.
"""

from __future__ import annotations

import pytest

from hadoop_spark_pspd_spark.operators import curation_extra as cx
from hadoop_spark_pspd_spark.operators.similarity import (
    sim_topk_bruteforce,
    sim_twostage_rerank,
)

from conftest import SF_SMOKE


def test_pii_redact_scrubs_everything(spark):
    rows = cx.text_pii_redact(spark, SF_SMOKE).collect()
    assert rows
    import re

    for r in rows:
        # every doc got the synthetic PII appended, so both counters fire
        assert r.n_emails >= 1 and r.n_ips >= 1
        assert re.search(cx.EMAIL_RE, r.redacted) is None
        assert re.search(cx.IPV4_RE, r.redacted) is None
        assert "<EMAIL>" in r.redacted and "<IP>" in r.redacted


def test_boilerplate_kept_text_is_subsequence(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    out = cx.text_boilerplate_passages(spark, SF_SMOKE).collect()
    assert len(out) == len(docs)
    dropped_total = 0
    for r in out:
        words = docs[r.doc_id].split(" ")
        n_chunks = (len(words) + cx._PASSAGE_W - 1) // cx._PASSAGE_W
        assert r.n_chunks == n_chunks
        assert 0 <= r.n_dropped <= r.n_chunks
        dropped_total += r.n_dropped
        # kept_text is the original text with whole chunks removed, so its
        # words must be an in-order subsequence of the original words
        kept = r.kept_text.split(" ") if r.kept_text else []
        it = iter(words)
        assert all(w in it for w in kept)
    # the 5% document-frequency threshold must actually fire on this corpus
    assert dropped_total > 0


def test_lm_bigram_score_bounds(spark):
    out = cx.text_lm_bigram_score(spark, SF_SMOKE).collect()
    assert out
    for r in out:
        # every bigram occurs at least once (itself), so avg freq >= 1
        assert r.avg_bigram_freq >= 1.0
        assert r.total_freq >= r.n_bigrams


def test_reservoir_sample_is_uniform_prefix(spark):
    out = cx.q_reservoir_sample(spark, SF_SMOKE).collect()
    assert len(out) == cx._SAMPLE_K
    # deterministic: same k keys on a rerun
    again = cx.q_reservoir_sample(spark, SF_SMOKE).collect()
    assert {r.o_orderkey for r in out} == {r.o_orderkey for r in again}
    # priorities form the global minimum set: max sampled priority must be
    # below the minimum priority of any unsampled key
    import duckdb

    lo = duckdb.sql(
        f"""
        SELECT max(p) FROM (
            SELECT md5(CAST(o_orderkey AS VARCHAR)) AS p
            FROM '{SF_SMOKE}/orders.parquet'
            ORDER BY p LIMIT {cx._SAMPLE_K}
        )
        """
    ).fetchone()[0]
    assert max(r.priority for r in out) == lo


def test_countmin_overestimates_only(spark):
    out = {r.word: r for r in cx.sketch_countmin(spark, SF_SMOKE).collect()}
    assert set(out) == set(cx._CM_PROBES)
    assert all(r.cm_estimate >= r.exact_cnt for r in out.values())
    # absent probes may still collide into occupied cells, but present
    # words must have nonzero estimates
    assert out["zebra"].exact_cnt == 0
    present = [r for r in out.values() if r.exact_cnt > 0]
    assert present and all(r.cm_estimate > 0 for r in present)
    # width 16 is deliberately undersized: at least one probe must show
    # the collision overestimate, or the demo is vacuous
    assert any(r.cm_estimate > r.exact_cnt for r in out.values())


def test_twostage_rerank_exact_on_survivors(spark):
    """Stage 2 must be EXACT cosine: every returned (query, candidate)
    sim equals an independent full-dim recomputation, and ranks follow
    sim desc with candidate_id tie-break. (Recall vs brute force is a
    data property, not a pipeline invariant — the uniform synthetic
    embeddings are hyperplane/prefix pruning's documented worst case.)"""
    import numpy as np

    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(
            f"{SF_SMOKE}/embeddings.parquet"
        ).collect()
    }
    rows = sim_twostage_rerank(spark, SF_SMOKE).collect()
    assert len(rows) == 25  # 5 queries x top-5
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
        q, c = emb[r.query_id], emb[r.candidate_id]
        want = float(
            q.dot(c) / (np.sqrt(q.dot(q)) * np.sqrt(c.dot(c)))
        )
        assert abs(r.sim - round(want, 6)) <= 1e-6
        # coarse score really is the 8-dim prefix dot product
        want_coarse = float(q[:8].dot(c[:8]))
        assert abs(r.coarse - round(want_coarse, 6)) <= 1e-6
    for q_rows in by_query.values():
        q_rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in q_rows] == [1, 2, 3, 4, 5]
        sims = [(-r.sim, r.candidate_id) for r in q_rows]
        assert sims == sorted(sims)
