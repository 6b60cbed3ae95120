"""ANN quality: recall@5 of the LSH and IVF paths vs exact brute force.

The synthetic embeddings are uniformly spread (max pairwise cosine ~0.51),
which is the adversarial case for locality-sensitive prefilters — floors
here are calibrated to that, and serve as regression tripwires for the
bucketing logic (a broken bucket join shows up as recall ~0).
"""

from __future__ import annotations

from hadoop_spark_pspd_spark.operators.similarity import (
    sim_ann_ivf,
    sim_ann_lsh,
    sim_topk_bruteforce,
)

from conftest import SF_GATE


def _topk(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["candidate_id"])
    return out


def test_ann_recall_floors(spark):
    bf = _topk(sim_topk_bruteforce(spark, SF_GATE))
    lsh = _topk(sim_ann_lsh(spark, SF_GATE))
    ivf = _topk(sim_ann_ivf(spark, SF_GATE))
    lsh_recall = sum(
        len(lsh.get(q, set()) & bf[q]) / len(bf[q]) for q in bf
    ) / len(bf)
    ivf_recall = sum(
        len(ivf.get(q, set()) & bf[q]) / len(bf[q]) for q in bf
    ) / len(bf)
    assert lsh_recall >= 0.4, f"LSH recall@5 collapsed: {lsh_recall}"
    assert ivf_recall >= 0.3, f"IVF recall@5 collapsed: {ivf_recall}"
    # every ANN hit must be a real vector with a valid rank
    for d in (lsh, ivf):
        for q, cands in d.items():
            assert len(cands) <= 5
            assert q not in cands


def test_hamming_topk_matches_numpy(spark):
    """Independent numpy popcount reference: signatures, distances, and
    the full top-5 ranking (hamming asc, candidate_id tie-break) must
    match the Spark operator exactly at the smoke SF."""
    import numpy as np

    from conftest import SF_SMOKE
    from hadoop_spark_pspd_spark.operators.similarity import sim_hamming_topk

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float32)
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    sigs = {
        v: int("".join("1" if x >= 0 else "0" for x in e[::-1]), 2)
        for v, e in emb.items()
    }
    expected = {}
    for q in sorted(sigs):
        if q >= 10:
            continue
        dists = sorted(
            (bin(sigs[q] ^ s).count("1"), c)
            for c, s in sigs.items()
            if c != q
        )
        expected[q] = [(c, h, rk + 1) for rk, (h, c) in enumerate(dists[:5])]
    got = {}
    for r in sim_hamming_topk(spark, SF_SMOKE).collect():
        got.setdefault(r["query_id"], []).append(
            (r["candidate_id"], r["hamming"], r["rk"])
        )
        # rerank column is a true cosine of the selected pair
        a, b = emb[r["query_id"]], emb[r["candidate_id"]]
        ref = float(
            np.dot(a.astype(np.float64), b.astype(np.float64))
            / (np.linalg.norm(a.astype(np.float64))
               * np.linalg.norm(b.astype(np.float64)))
        )
        assert abs(r["sim"] - ref) < 1e-5
    got = {q: sorted(v, key=lambda t: t[2]) for q, v in got.items()}
    assert got == expected


def test_pq_recall_floor(spark):
    """PQ-ADC with top-32 rerank on the uniform (adversarial) corpus:
    measured recall@5 is 0.62/0.70 at sf0.001/sf0.01 — floor at 0.5 as
    the regression tripwire (a broken codebook/LUT shows up as ~0)."""
    from hadoop_spark_pspd_spark.operators.similarity import sim_ann_pq

    bf = _topk(sim_topk_bruteforce(spark, SF_GATE))
    pq = _topk(sim_ann_pq(spark, SF_GATE))
    recall = sum(
        len(pq.get(q, set()) & bf[q]) / len(bf[q]) for q in bf
    ) / len(bf)
    assert recall >= 0.5, f"PQ recall@5 collapsed: {recall}"
    for q, cands in pq.items():
        assert len(cands) <= 5
        assert q not in cands


def test_ivfpq_recall_floor_and_containment(spark):
    """Composed IVF,PQ on the uniform (adversarial) corpus: recall@5
    floor at 0.3 (it can only lose candidates vs plain PQ — the probe
    filter removes cells — so a collapse signals a broken composition);
    every returned candidate must ALSO be a candidate the probe allows:
    its primary cell is among the query's nprobe cells (containment in
    the IVF candidate relation, checked against sim_ann_ivf's cells)."""
    from hadoop_spark_pspd_spark.operators.similarity import (
        _IVF_CELLS,
        _IVF_NPROBE,
        _LSH_FP,
        _train_coarse_quantizer,
        sim_ann_ivfpq,
    )

    import numpy as np

    from hadoop_spark_pspd_spark.catalog import Tables

    bf = _topk(sim_topk_bruteforce(spark, SF_GATE))
    got = _topk(sim_ann_ivfpq(spark, SF_GATE))
    recall = sum(
        len(got.get(q, set()) & bf[q]) / len(bf[q]) for q in bf
    ) / len(bf)
    assert recall >= 0.3, f"IVF,PQ recall@5 collapsed: {recall}"

    # recompute the fixed-point cell assignment in numpy (the operator's
    # exact arithmetic) and check probe containment for every result
    t = Tables(spark, SF_GATE)
    rows = t.embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.stack(
        [np.asarray(r["embedding"], dtype=np.float32) for r in rows]
    ).astype(np.float64)
    cents = _train_coarse_quantizer(t.embeddings, _IVF_CELLS)
    prods = np.floor(
        mat[:, None, :] * cents[None, :, :] * float(_LSH_FP)
    ).sum(axis=2)
    order = np.argsort(-prods, axis=1, kind="stable")
    primary = {int(i): int(order[k, 0]) for k, i in enumerate(ids)}
    probes = {
        int(i): set(order[k, :_IVF_NPROBE].tolist())
        for k, i in enumerate(ids)
    }
    for q, cands in got.items():
        for c in cands:
            assert primary[c] in probes[q], (q, c)
    spark.catalog.clearCache()

def test_ivfadc_recall_floor_and_containment(spark):
    """IVFADC (residual PQ) on the uniform (adversarial) corpus: the
    residual codebooks model the within-cell distribution, so recall
    should not trail raw-coordinate IVF,PQ — floor at 0.3 as the
    composition tripwire, plus the same probe-containment invariant
    (every hit's primary cell is among the query's nprobe cells)."""
    import numpy as np

    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.operators.similarity import (
        _IVF_CELLS,
        _IVF_NPROBE,
        _LSH_FP,
        _train_coarse_quantizer,
        sim_ann_ivfadc,
    )

    bf = _topk(sim_topk_bruteforce(spark, SF_GATE))
    got = _topk(sim_ann_ivfadc(spark, SF_GATE))
    recall = sum(
        len(got.get(q, set()) & bf[q]) / len(bf[q]) for q in bf
    ) / len(bf)
    assert recall >= 0.3, f"IVFADC recall@5 collapsed: {recall}"

    t = Tables(spark, SF_GATE)
    rows = t.embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.stack(
        [np.asarray(r["embedding"], dtype=np.float32) for r in rows]
    ).astype(np.float64)
    cents = _train_coarse_quantizer(t.embeddings, _IVF_CELLS)
    prods = np.floor(
        mat[:, None, :] * cents[None, :, :] * float(_LSH_FP)
    ).sum(axis=2)
    order = np.argsort(-prods, axis=1, kind="stable")
    primary = {int(i): int(order[k, 0]) for k, i in enumerate(ids)}
    probes = {
        int(i): set(order[k, :_IVF_NPROBE].tolist())
        for k, i in enumerate(ids)
    }
    for q, cands in got.items():
        assert len(cands) <= 5
        assert q not in cands
        for c in cands:
            assert primary[c] in probes[q], (q, c)
    spark.catalog.clearCache()
