"""Invariant tests for the ML dataset-prep family (ml_data.py) — the
guarantees the oracle hashes can't express directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.catalog import Tables
from hadoop_spark_pspd_spark.operators import ml_data as md

from conftest import SF_SMOKE


def test_group_split_has_zero_leakage(spark):
    """The split is keyed on user_id, so no user may contribute events
    to both splits — the property that makes it leakage-free."""
    t = Tables(spark, SF_SMOKE)
    split_expr = F.when(
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16, 10,
            ).cast("bigint"),
            F.lit(10),
        )
        < md._TRAIN_PCT,
        F.lit("train"),
    ).otherwise(F.lit("test"))
    per_user = (
        t.events.select("user_id", split_expr.alias("split"))
        .groupBy("user_id")
        .agg(F.countDistinct("split").alias("n_splits"))
    )
    assert per_user.filter(F.col("n_splits") > 1).count() == 0
    # and the audit query's totals tie out to the raw table
    out = {r.split: r for r in md.q_group_split(spark, SF_SMOKE).collect()}
    # the tiny smoke corpus may hash every user into one split; the
    # partition property is what matters, not the occupancy
    assert set(out) <= {"train", "test"} and out
    assert sum(r.n_events for r in out.values()) == t.events.count()


def test_class_balance_factors(spark):
    rows = md.q_class_balance(spark, SF_SMOKE).collect()
    mx = max(r.n_before for r in rows)
    for r in rows:
        assert r.factor == mx // r.n_before
        assert r.n_after == r.n_before * r.factor
        # oversampling never overshoots the majority class
        assert r.n_after <= mx


def test_chunk_overlap_covers_and_overlaps(spark):
    """Every word of every document appears in at least one chunk, and
    consecutive chunks share exactly width-stride words (except at the
    tail)."""
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .limit(50)
        .collect()
    }
    out = (
        md.text_chunk_overlap(spark, SF_SMOKE)
        .filter(F.col("doc_id").isin(*docs.keys()))
        .collect()
    )
    w, s = md._CHUNK_W, md._CHUNK_STRIDE
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = (
            r.chunk_text.split(" ") if r.chunk_text else []
        )
        assert r.n_tokens == len(by_doc[r.doc_id][r.chunk_id])
    for doc_id, words in docs.items():
        chunks = by_doc[doc_id]
        # chunk i starts at word i*stride and holds up to `w` words
        for i, chunk in chunks.items():
            assert chunk == words[i * s : i * s + w]
        # stride coverage: the union of chunk spans is the whole doc
        covered = set()
        for i in chunks:
            covered.update(range(i * s, min(i * s + w, len(words))))
        assert covered == set(range(len(words)))


def test_winsorize_bounds_are_respected(spark):
    t = Tables(spark, SF_SMOKE)
    raw = t.orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(cast(o_totalprice as double), 0.05)").alias("lo"),
        F.expr("percentile(cast(o_totalprice as double), 0.95)").alias("hi"),
        F.avg(F.col("o_totalprice").cast("double")).alias("raw_mean"),
    )
    bounds = {r.o_orderpriority: r for r in raw.collect()}
    for r in md.q_winsorize(spark, SF_SMOKE).collect():
        b = bounds[r.o_orderpriority]
        assert b.lo <= r.winsorized_mean <= b.hi
