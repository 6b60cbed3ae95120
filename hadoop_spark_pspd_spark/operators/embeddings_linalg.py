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
_PSCALE = 1 << 24  # fixed-point quantum for the PCA fit / projection
N_COMPONENTS = 8
_N_SQUARINGS = 7  # power iteration via C^(2^7): 128 power steps


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


def _fp_matmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Fixed-point matrix product: every scalar product is floored to
    2^-24 units (one correctly-rounded double multiply, one exact floor —
    identical IEEE ops in numpy and DuckDB), then summed EXACTLY as
    int64 (order-free) and rescaled by the exact power of two. By
    induction on identical inputs, the result is bit-identical to the
    oracle's relational formulation of the same product."""
    prods = np.floor((a[:, :, None] * b[None, :, :]) * float(_PSCALE))
    return prods.astype(np.int64).sum(axis=1, dtype=np.int64) / float(_PSCALE)


def _fp_matvec(a: np.ndarray, v: np.ndarray) -> np.ndarray:
    prods = np.floor((a * v[None, :]) * float(_PSCALE))
    return prods.astype(np.int64).sum(axis=1, dtype=np.int64) / float(_PSCALE)


def _fp_dot(a: np.ndarray, b: np.ndarray) -> float:
    prods = np.floor((a * b) * float(_PSCALE))
    return float(prods.astype(np.int64).sum(dtype=np.int64)) / float(_PSCALE)


def _power_fit(cov: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Top-N_COMPONENTS eigenpairs of ``cov`` by squared-matrix power
    iteration with deflation — every order-dependent reduction in fixed
    point, every element-wise op a single correctly-rounded IEEE op, so
    the identical algorithm unrolled as the oracle's MATERIALIZED CTEs
    reproduces these exact doubles (the pagerank/kmeans replay pattern,
    extended to eigendecomposition).

    Per component: rescale by max|entry| (exact comparison + one
    division), square _N_SQUARINGS times (fixed-point matmuls -> the
    dominant eigenvector amplified as C^128), two fixed-point matvecs
    from the deterministic start vector v0_i = 1 + i/64, one-shot
    classical Gram-Schmidt against previously extracted axes
    (fixed-point dots), normalize by sqrt of a fixed-point sum of
    squares (IEEE sqrt is correctly rounded in both engines), sign-fix
    (largest-|coordinate| positive, first index on ties — numpy argmax
    == ORDER BY abs DESC, i ASC LIMIT 1), Rayleigh eigenvalue on the
    CURRENT deflated matrix, then deflate C -= (lam*u_i)*u_j with
    pinned multiply order. Verified on sf0.01: eigenvalues within
    3e-4 relative of eigh, extracted-set orthogonality < 2e-6."""
    v0 = 1.0 + np.arange(DIM, dtype=np.float64) / 64.0
    c = cov.copy()
    us: list[np.ndarray] = []
    lams: list[float] = []

    def den(x: float) -> float:
        # rank-deficient covariance: once deflation (or a degenerate
        # corpus) zeroes the matrix, max|entry| and the norm are exactly
        # 0.0 and 0/0 would emit NaN (and then undefined int64s through
        # the projection floor) while DuckDB's x/0.0 yields NULL — a
        # cross-engine divergence of the r3/r4 data-dependent class.
        # Dividing by 1 instead makes every degenerate component an
        # exact zero vector in BOTH engines (the oracle applies the
        # identical CASE guard), pinned by the rank-deficient fixture in
        # tests/test_oracle_fixtures.py.
        return x if x != 0.0 else 1.0

    for _ in range(N_COMPONENTS):
        a = c / den(np.max(np.abs(c)))
        for _r in range(_N_SQUARINGS):
            p = _fp_matmul(a, a)
            a = p / den(np.max(np.abs(p)))
        w = _fp_matvec(a, _fp_matvec(a, v0))
        adj = np.zeros(DIM)
        if us:
            prev = np.stack(us)
            d = np.array([_fp_dot(u, w) for u in us])
            adj = (
                np.floor((d[:, None] * prev) * float(_PSCALE))
                .astype(np.int64)
                .sum(axis=0, dtype=np.int64)
                / float(_PSCALE)
            )
        w3 = w - adj
        u = w3 / den(np.sqrt(_fp_dot(w3, w3)))
        if u[np.argmax(np.abs(u))] < 0:
            u = u * -1.0
        lam = _fp_dot(u, _fp_matvec(c, u))
        c = c - (lam * u)[:, None] * u[None, :]
        us.append(u)
        lams.append(lam)
    return np.stack(us).T, np.array(lams)


def _fit_pca(
    spark: SparkSession, sf_dir: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit mean + top-N_COMPONENTS principal axes from distributed
    fixed-point sufficient statistics (bounded 2080 + 64-row collects).
    The O(d^3) driver-side solve is the deterministic _power_fit replay
    (not eigh — eigh's LAPACK internals can't be reproduced in SQL, the
    fixed-point power iteration can and is, so the PCA pair hash-matches
    the DuckDB oracle instead of being rows-only)."""
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
        g = r["s_fixed"] / _FP_SCALE
        gram[r["i"], r["j"]] = gram[r["j"], r["i"]] = g
    cov = gram / n - np.outer(mean, mean)
    comps, lams = _power_fit(cov)
    return mean, comps, lams


def _project_query(
    spark: SparkSession, sf_dir: str, mean: np.ndarray, mat_w: np.ndarray
) -> DataFrame:
    """(x - mean) @ mat_w for every embedding — broadcast numpy-closure
    pandas UDF, zero shuffle; outputs 2^-24 fixed-point quantized.

    Emitted as SCALAR rows (vec_id, k, value) via posexplode rather than
    an array<double> column: the driver's correctness comparator
    canonicalizes output with a pandas sort, and list-valued cells are
    unhashable there (observed CORRECTNESS_r03 `TypeError: unhashable
    type: 'list'`). Scalar-only output is a repo-wide invariant now,
    enforced by tools/verify_local.py and tests/test_oracle_parity.py.
    """
    import pandas as pd

    t = Tables(spark, sf_dir)

    def _project(embs):
        mat = np.stack(embs.values).astype(np.float64)
        # fixed-point projection: p_k = sum_j floor(((x_j - mean_j)
        # * W_jk) * 2^24) summed as int64, emitted as p / 2^24 — the
        # quantized value is EXACT and order-free, so it hash-matches
        # the oracle's relational unnest+join+grouped-int-sum without
        # any decimal rounding (round-to-6 of a binary-quantized value
        # can land exactly on a .5 decimal boundary where numpy
        # half-even and DuckDB half-away diverge)
        d = mat - mean
        p = (
            np.floor((d[:, :, None] * mat_w[None, :, :]) * float(_PSCALE))
            .astype(np.int64)
            .sum(axis=1, dtype=np.int64)
        )
        return pd.Series(list(p / float(_PSCALE)))

    _project.__annotations__ = {"embs": pd.Series, "return": pd.Series}
    proj_udf = F.pandas_udf(_project, "array<double>")
    return t.embeddings.select(
        "vec_id", proj_udf(F.col("embedding")).alias("components")
    ).select(
        "vec_id",
        F.posexplode("components").alias("k", "value"),
    )


def _pca_oracle(whiten: bool) -> str:
    """DuckDB replay of the ENTIRE deterministic PCA fit + projection.

    Mirrors _fit_pca/_power_fit/_project_query op for op: fixed-point
    mean/Gram sufficient statistics, covariance, then per component the
    rescale -> 7 fixed-point matrix squarings -> 2 matvecs from v0 ->
    one-shot Gram-Schmidt -> sqrt-normalize -> sign fix -> Rayleigh ->
    deflation, all as unrolled MATERIALIZED CTEs (the pagerank/kmeans
    pattern; MATERIALIZED is load-bearing — inlining re-expands the
    ~130-CTE prefix exponentially). Every reduction is an exact integer
    sum of floor((x*y) * 2^24) terms, every element-wise op a single
    correctly-rounded IEEE op on inputs identical by induction, so the
    final doubles are bit-identical to the numpy fit."""
    fp = f"CAST({_FP_SCALE} AS DOUBLE)"
    ps = f"CAST({_PSCALE} AS DOUBLE)"

    def fsum(expr: str) -> str:
        return (
            f"CAST(CAST(SUM(CAST(floor(({expr}) * {ps}) AS BIGINT)) "
            f"AS BIGINT) AS DOUBLE) / {ps}"
        )

    parts = [f"""
        WITH dims AS MATERIALIZED (
            SELECT CAST(unnest(range(0, {DIM})) AS INTEGER) AS i
        ), nrows AS MATERIALIZED (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
        ), msum AS MATERIALIZED (
            SELECT d.i AS i,
                   CAST(SUM(CAST(floor(
                       CAST(embedding[d.i + 1] AS DOUBLE) * {fp}
                   ) AS BIGINT)) AS BIGINT) AS sx
            FROM embeddings, dims d GROUP BY d.i
        ), mean AS MATERIALIZED (
            SELECT i,
                   (CAST(sx AS DOUBLE) / {fp}) / (SELECT n FROM nrows) AS m
            FROM msum
        ), gramq AS MATERIALIZED (
            SELECT ii.i AS i, jj.i AS j,
                   CAST(SUM(CAST(floor(
                       (CAST(embedding[ii.i + 1] AS DOUBLE)
                        * CAST(embedding[jj.i + 1] AS DOUBLE)) * {fp}
                   ) AS BIGINT)) AS BIGINT) AS sf
            FROM embeddings, dims ii, dims jj
            WHERE jj.i >= ii.i
            GROUP BY ii.i, jj.i
        ), gsym AS MATERIALIZED (
            SELECT i, j, sf FROM gramq
            UNION ALL
            SELECT j AS i, i AS j, sf FROM gramq WHERE i <> j
        ), cov0 AS MATERIALIZED (
            SELECT g.i AS i, g.j AS j,
                   (CAST(g.sf AS DOUBLE) / {fp}) / (SELECT n FROM nrows)
                   - (mi.m * mj.m) AS v
            FROM gsym g
            JOIN mean mi ON mi.i = g.i
            JOIN mean mj ON mj.i = g.j
        )"""]
    for c in range(N_COMPONENTS):
        parts.append(f"""
        , a{c}_0 AS MATERIALIZED (
            SELECT i, j, v / (SELECT CASE WHEN MAX(ABS(v)) = CAST(0 AS
                DOUBLE) THEN CAST(1 AS DOUBLE) ELSE MAX(ABS(v)) END
                FROM cov{c}) AS v
            FROM cov{c}
        )""")
        for r in range(1, _N_SQUARINGS + 1):
            parts.append(f"""
        , p{c}_{r} AS MATERIALIZED (
            SELECT a.i AS i, b.j AS j, {fsum('a.v * b.v')} AS v
            FROM a{c}_{r - 1} a JOIN a{c}_{r - 1} b ON a.j = b.i
            GROUP BY a.i, b.j
        ), a{c}_{r} AS MATERIALIZED (
            SELECT i, j, v / (SELECT CASE WHEN MAX(ABS(v)) = CAST(0 AS
                DOUBLE) THEN CAST(1 AS DOUBLE) ELSE MAX(ABS(v)) END
                FROM p{c}_{r}) AS v
            FROM p{c}_{r}
        )""")
        s = _N_SQUARINGS
        if c == 0:
            prev = (
                "SELECT CAST(NULL AS INTEGER) AS k, CAST(NULL AS INTEGER)"
                " AS i, CAST(NULL AS DOUBLE) AS v WHERE FALSE"
            )
        else:
            prev = "\n            UNION ALL ".join(
                f"SELECT CAST({k} AS INTEGER) AS k, i, v FROM u{k}"
                for k in range(c)
            )
        parts.append(f"""
        , w1_{c} AS MATERIALIZED (
            SELECT a.i AS i,
                   {fsum('a.v * (CAST(1 AS DOUBLE) + CAST(a.j AS DOUBLE) / CAST(64 AS DOUBLE))')} AS v
            FROM a{c}_{s} a GROUP BY a.i
        ), w2_{c} AS MATERIALIZED (
            SELECT a.i AS i, {fsum('a.v * w.v')} AS v
            FROM a{c}_{s} a JOIN w1_{c} w ON w.i = a.j GROUP BY a.i
        ), prev{c} AS MATERIALIZED (
            {prev}
        ), dots{c} AS MATERIALIZED (
            SELECT u.k AS k, {fsum('u.v * w.v')} AS d
            FROM prev{c} u JOIN w2_{c} w ON w.i = u.i GROUP BY u.k
        ), gsadj{c} AS MATERIALIZED (
            SELECT u.i AS i, {fsum('d.d * u.v')} AS adj
            FROM prev{c} u JOIN dots{c} d ON d.k = u.k GROUP BY u.i
        ), w3_{c} AS MATERIALIZED (
            SELECT w.i AS i, w.v - COALESCE(g.adj, CAST(0 AS DOUBLE)) AS v
            FROM w2_{c} w LEFT JOIN gsadj{c} g ON g.i = w.i
        ), nrm{c} AS MATERIALIZED (
            SELECT sqrt({fsum('v * v')}) AS s FROM w3_{c}
        ), upre{c} AS MATERIALIZED (
            SELECT i, v / (SELECT CASE WHEN s = CAST(0 AS DOUBLE)
                THEN CAST(1 AS DOUBLE) ELSE s END FROM nrm{c}) AS v
            FROM w3_{c}
        ), sgn{c} AS MATERIALIZED (
            SELECT CASE WHEN v < CAST(0 AS DOUBLE) THEN CAST(-1 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END AS s
            FROM upre{c} ORDER BY ABS(v) DESC, i LIMIT 1
        ), u{c} AS MATERIALIZED (
            SELECT i, v * (SELECT s FROM sgn{c}) AS v FROM upre{c}
        ), z{c} AS MATERIALIZED (
            SELECT c.i AS i, {fsum('c.v * u.v')} AS v
            FROM cov{c} c JOIN u{c} u ON u.i = c.j GROUP BY c.i
        ), lam{c} AS MATERIALIZED (
            SELECT {fsum('u.v * z.v')} AS l
            FROM u{c} u JOIN z{c} z ON z.i = u.i
        )""")
        if c + 1 < N_COMPONENTS:
            parts.append(f"""
        , cov{c + 1} AS MATERIALIZED (
            SELECT c.i AS i, c.j AS j,
                   c.v - (((SELECT l FROM lam{c}) * ui.v) * uj.v) AS v
            FROM cov{c} c
            JOIN u{c} ui ON ui.i = c.i
            JOIN u{c} uj ON uj.i = c.j
        )""")
    if whiten:
        wsel = "\n            UNION ALL ".join(
            f"SELECT CAST({c} AS INTEGER) AS k, i,"
            f" v / sqrt(GREATEST((SELECT l FROM lam{c}),"
            f" CAST(1e-12 AS DOUBLE))) AS v FROM u{c}"
            for c in range(N_COMPONENTS)
        )
    else:
        wsel = "\n            UNION ALL ".join(
            f"SELECT CAST({c} AS INTEGER) AS k, i, v FROM u{c}"
            for c in range(N_COMPONENTS)
        )
    parts.append(f"""
        , wmat AS MATERIALIZED (
            {wsel}
        )
        SELECT e.vec_id AS vec_id, w.k AS k,
               {fsum('(CAST(e.embedding[w.i + 1] AS DOUBLE) - m.m) * w.v')}
                   AS value
        FROM embeddings e, wmat w JOIN mean m ON m.i = w.i
        GROUP BY e.vec_id, w.k
    """)
    return "".join(parts)


@register(
    "sim_pca_project",
    oracle=_pca_oracle(whiten=False),
    doc="PCA projection of every embedding onto the top-8 principal axes "
        "(components from the distributed fixed-point Gram/mean "
        "statistics; the d x d solve is bounded O(d^3) driver work, "
        "d = 64, via deterministic squared-matrix power iteration with "
        "deflation instead of eigh — eigenvalues within 3e-4 relative "
        "of eigh on sf0.01, and the WHOLE fit replays bit-identically "
        "as the oracle's unrolled MATERIALIZED CTEs, turning the last "
        "rows-only query pair into hash-matched ones). The projection "
        "itself is a broadcast matrix multiply in an Arrow-batched "
        "pandas UDF with a numpy closure — zero shuffle, scales to any "
        "corpus; outputs are 2^-24 fixed-point quantized (exact, no "
        "decimal rounding) and posexploded to scalar (vec_id, k, value) "
        "rows for the driver's comparator. The whitened variant is the "
        "same path with axes scaled by 1/sqrt(eigenvalue).",
    tags=("similarity", "linalg"),
)
def sim_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    mean, comps, _ = _fit_pca(spark, sf_dir)
    return _project_query(spark, sf_dir, mean, comps)


@register(
    "sim_pca_whiten",
    oracle=_pca_oracle(whiten=True),
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
