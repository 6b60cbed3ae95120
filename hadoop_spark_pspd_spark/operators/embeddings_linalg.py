"""Distributed linear algebra over the ``embeddings`` table.

The embedding-preprocessing tier a 100 TB curation pipeline needs before
semantic dedup / ANN: a one-pass distributed Gram matrix (the sufficient
statistic for covariance/PCA) and the PCA projection built on it.

Scale design:
  * the Gram aggregation is the textbook map-side-combinable shape — each
    task reduces its partition to at most d*(d+1)/2 = 2080 partial sums
    before anything shuffles, so shuffle volume is O(partitions * d^2)
    regardless of row count;
  * the d x d eigendecomposition is O(d^3) driver work on a BOUNDED
    2080-row collect (d = 64 is a data-model constant, like the IVF
    quantizer's 256-row sample — similarity.py:191);
  * the projection is a broadcast matrix multiply: an Arrow-batched
    pandas UDF with a numpy closure (CLAUDE.md: big literal expression
    trees OOM Catalyst; a numpy closure is the right vehicle for a
    64 x k constant matrix), no shuffle at all.

Determinism: distributed double summation is order-dependent, so the Gram
sums are computed in FIXED POINT — every product is floored to 2^-20
units (one correctly-rounded double multiply + floor, identical in both
engines), summed exactly as integers (order-free), and divided back by
the power-of-two scale (exact). Quantization error is bounded by
n * 2^-21 per entry and is immaterial to the PCA consumer; what it buys
is a bit-identical aggregate at ANY parallelism — the same trick as the
repo's exact-decimal money sums, in integer form.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register

DIM = 64  # embeddings.embedding width (TESTDATA.md)
_FP_SCALE = 1 << 20  # fixed-point quantum for order-free integer sums
N_COMPONENTS = 8


def _partial_gram(batches):
    """Per-task partial Gram in fixed point: floor(x_i*x_j * 2^20) summed
    as int64 over the task's rows, emitted as 2080 upper-triangle rows.

    numpy float64 multiply and floor are the same correctly-rounded IEEE
    ops the SQL expression (and the DuckDB oracle) performs, and integer
    sums are order-free — so this Arrow-vectorized path is BIT-IDENTICAL
    to a pure-SQL formulation, just ~100x cheaper per row (a Catalyst
    higher-order-function formulation interprets ~2080 lambda closures
    per row; here it's one einsum per 1024-row chunk)."""
    import pandas as pd

    acc = np.zeros((DIM, DIM), dtype=np.int64)
    for pdf in batches:
        if not len(pdf):
            continue
        mat = np.stack(pdf["embedding"].values).astype(np.float64)
        for s in range(0, len(mat), 1024):
            chunk = mat[s:s + 1024]
            acc += (
                np.floor(
                    np.einsum("ni,nj->nij", chunk, chunk) * float(_FP_SCALE)
                )
                .astype(np.int64)
                .sum(axis=0, dtype=np.int64)
            )
    iu = np.triu_indices(DIM)
    yield pd.DataFrame(
        {
            "i": iu[0].astype("int32"),
            "j": iu[1].astype("int32"),
            "p": acc[iu],
        }
    )


@register(
    "sim_gram_matrix",
    oracle=f"""
        WITH prods AS (
            SELECT CAST(ii.i AS INTEGER) AS i,
                   CAST(jj.j AS INTEGER) AS j,
                   CAST(floor(
                       (CAST(embedding[CAST(ii.i AS INTEGER) + 1] AS DOUBLE)
                        * CAST(embedding[CAST(jj.j AS INTEGER) + 1] AS DOUBLE))
                       * {float(_FP_SCALE)}) AS BIGINT) AS p
            FROM embeddings, range(0, {DIM}) ii(i), range(0, {DIM}) jj(j)
            WHERE jj.j >= ii.i
        )
        SELECT i, j,
               CAST(SUM(p) AS BIGINT) AS s_fixed,
               CAST(CAST(SUM(p) AS BIGINT) AS DOUBLE) / {_FP_SCALE} AS s
        FROM prods GROUP BY i, j
    """,
    doc="One-pass distributed Gram matrix over embeddings: per-vector "
        "upper-triangle products quantized to 2^-20 fixed point (floor of "
        "one correctly-rounded double multiply — deterministic in both "
        "engines AND in numpy), summed as exact integers so the aggregate "
        "is order-free at any parallelism, then rescaled by the exact "
        "power-of-two. Each task reduces its rows to 2080 int64 partials "
        "inside an Arrow-batched mapInPandas (one einsum per 1024-row "
        "chunk — the integer quantization is what licenses the numpy "
        "fast path to stay bit-identical to the SQL oracle) before the "
        "(only) shuffle of 2080-key partials — the sufficient statistic "
        "for covariance/PCA at 100 TB. DuckDB's sum(bigint) is HUGEINT, "
        "cast back in the oracle per the type-drift convention.",
    tags=("similarity", "linalg"),
)
def sim_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.embeddings.select("embedding")
        .mapInPandas(_partial_gram, schema="i int, j int, p long")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("s_fixed"))
        .select(
            "i",
            "j",
            "s_fixed",
            (F.col("s_fixed").cast("double") / _FP_SCALE).alias("s"),
        )
    )


def _fit_pca(spark: SparkSession, sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Fit mean + top-N_COMPONENTS principal axes from distributed
    fixed-point sufficient statistics (bounded 2080 + 64-row collects)."""
    t = Tables(spark, sf_dir)
    e = F.col("embedding")
    idx = F.sequence(F.lit(0), F.lit(DIM - 1))
    sums = F.transform(
        idx,
        lambda i: F.floor(
            F.element_at(e, i + 1).cast("double") * F.lit(float(_FP_SCALE))
        ).cast("long"),
    )
    stats = (
        t.embeddings.select(
            F.explode(F.arrays_zip(idx.alias("i"), sums.alias("sx"))).alias("z")
        )
        .select("z.i", "z.sx")
        .groupBy("i")
        .agg(F.sum("sx").alias("sx"), F.count("*").alias("n"))
        .collect()
    )
    n = stats[0]["n"]
    mean = np.zeros(DIM)
    for r in stats:
        mean[r["i"]] = r["sx"] / _FP_SCALE / n
    gram = np.zeros((DIM, DIM))
    for r in sim_gram_matrix(spark, sf_dir).collect():
        gram[r["i"], r["j"]] = gram[r["j"], r["i"]] = r["s"]
    cov = gram / n - np.outer(mean, mean)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:N_COMPONENTS]
    comps = eigvec[:, order]
    # deterministic sign: each axis points so its largest-|.| coordinate
    # is positive (eigh's sign is arbitrary)
    for k in range(comps.shape[1]):
        pivot = np.argmax(np.abs(comps[:, k]))
        if comps[pivot, k] < 0:
            comps[:, k] = -comps[:, k]
    return mean, comps, eigval[order]


def _project_query(
    spark: SparkSession, sf_dir: str, mean: np.ndarray, mat_w: np.ndarray
) -> DataFrame:
    """(x - mean) @ mat_w for every embedding — broadcast numpy-closure
    pandas UDF, zero shuffle; outputs rounded to 6.

    Emitted as SCALAR rows (vec_id, k, value) via posexplode rather than
    an array<double> column: the driver's correctness comparator
    canonicalizes output with a pandas sort, and list-valued cells are
    unhashable there (observed CORRECTNESS_r03 `TypeError: unhashable
    type: 'list'`). Scalar-only output is a repo-wide invariant now,
    enforced by tools/verify_local.py and tests/test_registry_contract.
    """
    import pandas as pd

    t = Tables(spark, sf_dir)

    def _project(embs):
        mat = np.stack(embs.values).astype(np.float64)
        proj = (mat - mean) @ mat_w
        return pd.Series(list(np.round(proj, 6)))

    _project.__annotations__ = {"embs": pd.Series, "return": pd.Series}
    proj_udf = F.pandas_udf(_project, "array<double>")
    return t.embeddings.select(
        "vec_id", proj_udf(F.col("embedding")).alias("components")
    ).select(
        "vec_id",
        F.posexplode("components").alias("k", "value"),
    )


@register(
    "sim_pca_project",
    oracle=None,  # eigendecomposition: not one SQL query; invariant tests
    doc="PCA projection of every embedding onto the top-8 principal axes "
        "(components from the distributed fixed-point Gram/mean "
        "statistics; d x d eigh is bounded O(d^3) driver work, d = 64). "
        "The projection itself is a broadcast matrix multiply in an "
        "Arrow-batched pandas UDF with a numpy closure — zero shuffle, "
        "scales to any corpus. Axis signs are fixed deterministically "
        "(largest-|coordinate| positive); outputs rounded to 6 and "
        "posexploded to scalar (vec_id, k, value) rows for the driver's "
        "comparator. The whitened variant is the same path with axes "
        "scaled by 1/sqrt(eigenvalue).",
    tags=("similarity", "linalg"),
)
def sim_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    mean, comps, _ = _fit_pca(spark, sf_dir)
    return _project_query(spark, sf_dir, mean, comps)


@register(
    "sim_pca_whiten",
    oracle=None,  # eigendecomposition: not one SQL query; invariant tests
    doc="PCA whitening of every embedding: same distributed fixed-point "
        "fit as sim_pca_project, axes scaled by 1/sqrt(eigenvalue) so "
        "the projected components have ~unit variance and zero "
        "cross-correlation — the preconditioner that makes cosine/L2 "
        "ANN behave on anisotropic embedding clouds. Same zero-shuffle "
        "broadcast-matmul execution.",
    tags=("similarity", "linalg"),
)
def sim_pca_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    mean, comps, lams = _fit_pca(spark, sf_dir)
    mat_w = comps / np.sqrt(np.maximum(lams, 1e-12))
    return _project_query(spark, sf_dir, mean, mat_w)
