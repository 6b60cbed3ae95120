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
