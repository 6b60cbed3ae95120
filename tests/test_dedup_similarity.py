"""Property tests for the dedup + similarity operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
)
from hadoop_spark_pspd_spark.operators.similarity import (
    cosine_topk,
    sim_topk_bruteforce,
)

from conftest import SF_SMOKE


def test_minhash_matches_exact_jaccard(spark):
    """LSH recall at the 0.8 threshold must be total on this corpus —
    the minhash pipeline and the exact inverted-index join agree."""
    exact = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()
    }
    assert exact == lsh
    assert all(j >= JACCARD_THRESHOLD for _, _, j in exact)


def test_exact_dedup_keeps_min_id(spark):
    dup_docs = spark.createDataFrame(
        [(10, "a b c"), (3, "a b c"), (7, "x  y"), (8, "x y")],
        "doc_id long, text string",
    )
    from hadoop_spark_pspd_spark.functions.text import normalized_text

    res = {
        r["keep_id"]: r["n_copies"]
        for r in dup_docs.select(
            F.md5(normalized_text("text")).alias("fp"), "doc_id"
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .collect()
    }
    # whitespace-normalized: "x  y" == "x y"
    assert res == {3: 2, 7: 2}


def test_dedup_exact_no_dups_in_corpus(spark):
    res = dedup_exact(spark, SF_SMOKE)
    assert res.filter(F.col("n_copies") > 1).count() == 0


def test_simhash_finds_planted_near_dups(spark):
    """SimHash measures token-distribution similarity, shingle-Jaccard
    measures phrase similarity — different notions, so we assert substantial
    (not total) agreement on the planted near-dups: the majority of exact
    shingle near-dups collide at hamming<=3, and vice versa."""
    sim_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_simhash(spark, SF_SMOKE).collect()
    }
    exact_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    }
    assert sim_pairs, "expected planted near-dups to collide"
    inter = len(sim_pairs & exact_pairs)
    assert inter >= len(exact_pairs) * 0.6
    assert inter >= len(sim_pairs) * 0.6


def test_cosine_topk_self_excluded_and_k(spark):
    res = sim_topk_bruteforce(spark, SF_SMOKE).collect()
    by_query: dict[int, list] = {}
    for r in res:
        assert r["candidate_id"] != r["query_id"]
        by_query.setdefault(r["query_id"], []).append(r)
    assert set(by_query) == set(range(10))
    for rows in by_query.values():
        assert len(rows) == 5
        sims = [r["sim"] for r in sorted(rows, key=lambda r: r["rk"])]
        assert sims == sorted(sims, reverse=True)
        assert all(-1.0 <= s <= 1.0 for s in sims)


def test_cosine_topk_identical_vector_is_top1(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.7, 0.7, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    res = cosine_topk(emb.filter("vec_id = 0"), emb, k=2).collect()
    top = sorted(res, key=lambda r: r["rk"])
    assert top[0]["candidate_id"] == 1 and top[0]["sim"] == 1.0
    assert top[1]["candidate_id"] == 3


def test_neardup_bucketed_equals_allpairs_anchor(spark):
    """Registered cell-pair-prefiltered near-dup must equal the exact
    O(n^2) anchor — recall 1 by the spherical triangle inequality."""
    from hadoop_spark_pspd_spark.operators.similarity import (
        neardup_allpairs_anchor,
        sim_embedding_neardup,
    )

    got = {
        (r["vec_a"], r["vec_b"], r["sim"])
        for r in sim_embedding_neardup(spark, SF_SMOKE).collect()
    }
    want = {
        (r["vec_a"], r["vec_b"], r["sim"])
        for r in neardup_allpairs_anchor(spark, SF_SMOKE).collect()
    }
    assert got == want and len(want) > 0


def test_neardup_plan_has_no_nested_loop_join(spark):
    from hadoop_spark_pspd_spark.operators.similarity import (
        sim_embedding_neardup,
    )
    from hadoop_spark_pspd_spark.plans.checks import formatted_plan

    plan = formatted_plan(sim_embedding_neardup(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_neardup_adversarial_uniform_corpus(spark, tmp_path):
    """Adversarially uniform embedding corpus: cell radii are all large,
    so the triangle-inequality cell-pair prefilter cannot prune and the
    plan degrades to block-partitioned exact comparison
    (similarity.py documents this). Asserts (a) output correctness —
    recall 1 vs a numpy float64 brute force, planted near-dups found;
    (b) candidate volume stays within the block-partition bound C(n,2)
    (each unordered pair enumerated at most once); (c) the degraded plan
    is still hash equi-joins, never a nested-loop/cartesian product."""
    import numpy as np

    from hadoop_spark_pspd_spark.operators.similarity import (
        DIM,
        neardup_candidates,
        sim_embedding_neardup,
    )
    from hadoop_spark_pspd_spark.plans.checks import formatted_plan

    rng = np.random.default_rng(7)
    n = 120
    base = rng.standard_normal((n, DIM))
    # plant 8 noisy near-dup pairs (cosine ~0.93) on the uniform cloud
    for k in range(8):
        base[100 + k] = base[k] + 0.05 * rng.standard_normal(DIM)
    unit = base / np.linalg.norm(base, axis=1, keepdims=True)
    emb = unit.astype(np.float32)
    rows = [(i, [float(x) for x in emb[i]], 0) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf_dir = str(tmp_path / "adv")
    df.coalesce(4).write.parquet(f"{sf_dir}/embeddings.parquet")

    m = emb.astype(np.float64)
    mu = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mu @ mu.T
    want = {
        (i, j): cos[i, j]
        for i in range(n)
        for j in range(i + 1, n)
        if cos[i, j] >= 0.4
    }

    got = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in sim_embedding_neardup(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    assert got  # the planted pairs are present
    for key, sim in got.items():
        assert abs(sim - want[key]) < 2e-6, (key, sim, want[key])

    cand = neardup_candidates(spark, sf_dir)
    n_cand = cand.count()
    assert n_cand <= n * (n - 1) // 2
    plan = formatted_plan(cand)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # the numpy screen materializes only near-threshold survivors: on this
    # uniform cloud that is FAR below the block-partition bound (the old
    # pre-screen path exploded every unpruned pair as a row)
    assert n_cand <= 4 * len(want) + 64

    # occupancy salting: cap=16 forces every cell into sub-blocks; output
    # must be unchanged (blocks partition cells, every block pair within a
    # surviving cell pair is compared, so completeness is cap-invariant)
    from hadoop_spark_pspd_spark.functions.vectors import dot as vdot
    from pyspark.sql import functions as F

    salted = neardup_candidates(spark, sf_dir, cap=16)
    sim = vdot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    got_salted = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in salted.filter(sim >= 0.4)
        .select(
            F.least("ida", "idb").alias("vec_a"),
            F.greatest("ida", "idb").alias("vec_b"),
            F.round(sim, 6).alias("sim"),
        )
        .collect()
    }
    assert got_salted == got
    spark.catalog.clearCache()


def test_hard_negatives_cross_cluster_and_ranked(spark):
    """sim_hard_negatives invariants the oracle hash can't express: every
    mined negative really is in a different cluster than its query, the
    query itself never appears, per-query sims are non-increasing in
    rank, and each mined sim is the TRUE max over that query's
    cross-cluster candidates (spot-checked at rk=1)."""
    from hadoop_spark_pspd_spark.operators.clustering import (
        ITERATIONS,
        kmeans_assignments,
    )
    from hadoop_spark_pspd_spark.operators.similarity import (
        sim_hard_negatives,
    )

    rows = sim_hard_negatives(spark, SF_SMOKE).collect()
    assert len(rows) == 50  # 10 queries x top-5
    lab = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_assignments(spark, SF_SMOKE, ITERATIONS).collect()
    }
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["candidate_id"] != r["query_id"]
        assert lab[r["candidate_id"]] == r["cand_cluster"]
        assert r["cand_cluster"] != lab[r["query_id"]]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        sims = [r["sim"] for r in rs]
        assert sims == sorted(sims, reverse=True), (q, sims)


def test_mmr_diversifies_vs_pure_relevance(spark):
    """Rank 1 must be the relevance argmax; the full MMR pick set must
    DIFFER from the pure-relevance top-8 (the redundancy penalty has to
    actually reorder something on this corpus), and every pick must come
    from the top-32 candidate pool."""
    from pyspark.sql import functions as F

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.functions.vectors import cosine
    from hadoop_spark_pspd_spark.operators.similarity import (
        _MMR_CANDIDATES,
        _MMR_K,
        _MMR_QUERY_ID,
        sim_mmr_diversify,
    )

    sf = "/root/testdata/sf0.001"
    out = {r["rank"]: r["vec_id"] for r in sim_mmr_diversify(spark, sf).collect()}
    assert len(out) == _MMR_K

    t = Tables(spark, sf)
    q = t.embeddings.filter(F.col("vec_id") == _MMR_QUERY_ID).select(
        F.col("embedding").alias("qe")
    )
    by_rel = [
        r["vec_id"]
        for r in t.embeddings.filter(F.col("vec_id") != _MMR_QUERY_ID)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_CANDIDATES)
        .collect()
    ]
    assert out[1] == by_rel[0], "rank 1 must be the relevance argmax"
    assert set(out.values()) <= set(by_rel), "picks must come from top-32"
    assert set(out.values()) != set(by_rel[:_MMR_K]), (
        "MMR set identical to pure-relevance top-8 — no diversification"
    )


def test_kcenter_min_dist_non_increasing(spark):
    """Gonzalez traversal invariant: each new center's distance to the
    selected set can only shrink as the set grows, so the min_dist
    column is non-increasing over ranks 2..k; picks are distinct and
    rank 1 is the seed with NULL distance."""
    from hadoop_spark_pspd_spark.operators.similarity import (
        _KC_SEED,
        sim_kcenter_coreset,
    )

    rows = sorted(
        sim_kcenter_coreset(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["rank"],
    )
    assert rows[0]["vec_id"] == _KC_SEED and rows[0]["min_dist"] is None
    dists = [r["min_dist"] for r in rows[1:]]
    assert all(d is not None and d > 0 for d in dists)
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == len(ids)


def test_kcenter_kernel_matches_distributed_loop(spark):
    """sim_kcenter_coreset's single-task Gonzalez kernel (round-11
    optimization) must emit BIT-identical rows to the distributed
    per-round argmax loop — same vec_ids, same min_dist doubles, NULL
    seed distance — since both replay the identical cosine fold +
    BigDecimal-HALF_UP round-6 sequence."""
    from hadoop_spark_pspd_spark.operators import similarity as S

    def run():
        return [
            (r.rank, r.vec_id, r.min_dist)
            for r in S.sim_kcenter_coreset(spark, SF_SMOKE)
            .orderBy("rank")
            .collect()
        ]

    kernel_rows = run()
    old = S._KC_LOCAL_VEC_CAP
    try:
        S._KC_LOCAL_VEC_CAP = 0  # force the distributed loop
        loop_rows = run()
    finally:
        S._KC_LOCAL_VEC_CAP = old
    assert kernel_rows == loop_rows
    assert kernel_rows[0][2] is None and len(kernel_rows) == S._KC_K


def test_neardup_kernel_matches_distributed_screen(spark, monkeypatch):
    """sim_embedding_neardup's single-task kernel (round-12) must emit
    BIT-identical rows to the distributed cell/block screen — same
    (vec_a, vec_b) set, same round-6 sim doubles — since both derive
    every emitted double from the identical exact op sequence."""
    from hadoop_spark_pspd_spark.operators import similarity as S

    def run():
        return sorted(
            (r.vec_a, r.vec_b, r.sim)
            for r in S.sim_embedding_neardup(spark, SF_SMOKE).collect()
        )

    kernel_rows = run()
    monkeypatch.setattr(S, "_ND_LOCAL_VEC_CAP", 0)  # force distributed
    dist_rows = run()
    assert kernel_rows == dist_rows and len(kernel_rows) > 0


def test_kcenter_zero_norm_embedding_parity(spark, monkeypatch):
    """A zero-norm embedding divides by zero in the cosine: Spark yields
    NULL (candidate sorts last, never picked) while naive numpy yields
    NaN that poisons np.minimum and crashes the task. Kernel and loop
    must emit IDENTICAL rows on a corpus containing a zero vector
    (ADVICE r11 / r5 identical-denominator-guard rule)."""
    from types import SimpleNamespace

    from hadoop_spark_pspd_spark.operators import similarity as S

    rows = [
        (int(i), [float((i * 7 + j * 3) % 11 - 5) for j in range(4)])
        for i in range(20)
    ]
    rows[7] = (7, [0.0, 0.0, 0.0, 0.0])  # zero-norm, non-seed
    edf = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    monkeypatch.setattr(
        S, "Tables", lambda *_: SimpleNamespace(embeddings=edf)
    )

    def run():
        return [
            (r.rank, r.vec_id, r.min_dist)
            for r in S.sim_kcenter_coreset(spark, SF_SMOKE)
            .orderBy("rank")
            .collect()
        ]

    kernel_rows = run()
    monkeypatch.setattr(S, "_KC_LOCAL_VEC_CAP", 0)  # force the loop
    loop_rows = run()
    assert kernel_rows == loop_rows
    assert all(vid != 7 for _, vid, _ in kernel_rows)
