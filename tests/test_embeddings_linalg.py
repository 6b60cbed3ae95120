"""Invariant tests for the distributed Gram / PCA operators
(embeddings_linalg.py). The oracle sweep hash-matches all three queries
(the PCA pair via the deterministic fixed-point power-iteration fit
replayed in DuckDB); these tests pin the SEMANTIC quality the hash can't
see — variance ordering, decorrelation, whitened unit variance."""

from __future__ import annotations

import numpy as np

from hadoop_spark_pspd_spark.catalog import Tables
from hadoop_spark_pspd_spark.operators.embeddings_linalg import (
    _FP_SCALE,
    DIM,
    N_COMPONENTS,
    sim_gram_matrix,
    sim_pca_project,
    sim_pca_whiten,
)

from conftest import SF_SMOKE


def _embedding_matrix(spark) -> np.ndarray:
    rows = (
        Tables(spark, SF_SMOKE)
        .embeddings.select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r["embedding"] for r in rows], dtype=np.float32).astype(
        np.float64
    )


def test_gram_matrix_matches_numpy_fixed_point(spark):
    """The distributed integer sums must equal a single-machine replay of
    the same quantization: floor(x_i*x_j * 2^20) per vector, summed
    exactly — proving the aggregate is order-free, not just close."""
    m = _embedding_matrix(spark)
    per_vec = np.floor(
        np.einsum("ni,nj->nij", m, m) * float(_FP_SCALE)
    ).astype(np.int64)
    expect = per_vec.sum(axis=0, dtype=np.int64)
    got = {}
    for r in sim_gram_matrix(spark, SF_SMOKE).collect():
        got[(r["i"], r["j"])] = r["s_fixed"]
    assert len(got) == DIM * (DIM + 1) // 2
    for i in range(DIM):
        for j in range(i, DIM):
            assert got[(i, j)] == expect[i, j], (i, j)
    # diagonal entries are sums of floors of squares: never negative
    assert all(v >= 0 for (i, j), v in got.items() if i == j)


def _pivot(rows) -> np.ndarray:
    """(vec_id, k, value) scalar rows -> (n, N_COMPONENTS) matrix. The
    scalar shape is the driver-comparator contract (array cells are
    unhashable in its pandas canonicalizer)."""
    by_vec: dict[int, dict[int, float]] = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], {})[r["k"]] = r["value"]
    return np.array(
        [
            [by_vec[v][k] for k in range(N_COMPONENTS)]
            for v in sorted(by_vec)
        ]
    )


def test_pca_projection_invariants(spark):
    comps = _pivot(sim_pca_project(spark, SF_SMOKE).collect())
    n = len(_embedding_matrix(spark))
    assert comps.shape == (n, N_COMPONENTS)
    # centered projection: per-axis mean ~0 (fixed-point mean + round-6
    # tolerance)
    assert np.abs(comps.mean(axis=0)).max() < 1e-3
    # principal axes are variance-ordered
    var = comps.var(axis=0)
    assert all(var[k] + 1e-9 >= var[k + 1] for k in range(len(var) - 1))
    assert var[0] > 0
    # decorrelated: off-diagonal covariance is quantization-level noise
    cov = np.cov(comps.T)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-2 * cov.diagonal().max()
    # deterministic across reruns (fixed-point stats + sign-fixed axes)
    again = _pivot(sim_pca_project(spark, SF_SMOKE).collect())
    assert np.array_equal(comps, again)


def test_pca_whitening_unit_variance(spark):
    comps = _pivot(sim_pca_whiten(spark, SF_SMOKE).collect())
    assert comps.shape[1] == N_COMPONENTS
    # whitened axes: ~unit variance, ~zero mean (quantization + round-6
    # tolerance; population-vs-sample normalization gives 1/n vs 1/(n-1)
    # — compare against the population variance the fit used)
    var = comps.var(axis=0)
    assert np.abs(var - 1.0).max() < 5e-2, var
    assert np.abs(comps.mean(axis=0)).max() < 1e-2
    # decorrelated
    cov = np.cov(comps.T)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 5e-2
