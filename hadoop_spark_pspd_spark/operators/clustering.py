"""Embedding clustering: distributed Lloyd's k-means over ``embeddings``.

A training-data-pipeline staple (cluster-then-sample curation, semantic
sharding) the reference lacks entirely (its only iterative behavior is
YARN's retry loop, run_fault_tests.py:229-297). Spark-first design:

  * points never leave executors — per-iteration state is the k x dim
    centroid table, which broadcasts;
  * assignment = argmin over a broadcast cross join, computed with
    zip_with/aggregate fold (JVM codegen, no UDF);
  * centroid update = posexplode to (cluster, dim, coord), exact
    DECIMAL(27,14) sums per (cluster, dim) -> deterministic means
    regardless of partial-agg order, re-packed with sorted collect_list;
  * fixed iteration count + lowest-vec_id init => bit-reproducible runs
    (validated by tests/test_clustering.py); rows-only at the driver gate
    because multi-round FP argmin isn't expressible as one SQL query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register

K = 10
ITERATIONS = 3
_DEC = "decimal(27,14)"


def _sq_dist(a, b):
    """Sum of squared coordinate differences, folded left-to-right (a
    fixed association order, so both engines of a rerun agree bitwise)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def assign_points(pts: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cluster_id, dist): nearest centroid per point, ties to the
    lowest cluster_id via lexicographic struct-min."""
    scored = pts.join(F.broadcast(centroids)).select(
        "vec_id",
        "emb",
        F.struct(
            _sq_dist(F.col("emb"), F.col("centroid")).alias("dist"),
            F.col("cluster_id"),
        ).alias("cand"),
    )
    best = (
        scored.groupBy("vec_id")
        .agg(F.min("cand").alias("best"), F.first("emb").alias("emb"))
        .select(
            "vec_id",
            "emb",
            F.col("best.cluster_id").alias("cluster_id"),
            F.col("best.dist").alias("dist"),
        )
    )
    return best


def update_centroids(assigned: DataFrame) -> DataFrame:
    """Element-wise mean per cluster: exact decimal sums per (cluster, dim),
    one deterministic double division, repacked in dim order."""
    per_dim = (
        assigned.select(
            "cluster_id", F.posexplode("emb").alias("dim", "coord")
        )
        .groupBy("cluster_id", "dim")
        .agg(
            (
                # double->decimal through the shortest string repr: the
                # repo's cross-engine cast convention (direct casts
                # round differently), which is what lets the DuckDB
                # oracle replicate the means bit-for-bit
                F.sum(F.col("coord").cast("string").cast(_DEC))
                .cast("double")
                / F.count("*")
            ).alias("mean")
        )
    )
    return (
        per_dim.groupBy("cluster_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("mean")))
                ),
                lambda s: s["mean"],
            ).alias("centroid")
        )
    )


_DIM = 64  # embeddings.embedding width (TESTDATA.md)


def _kmeans_oracle() -> str:
    """DuckDB WITH-prefix replaying Lloyd's EXACTLY (no final SELECT —
    see kmeans_assignment_ctes/_kmeans_query_oracle): the fixed 3
    iterations are unrolled as materialized CTE pairs (assign a{i},
    update c{i+1}).
    Every engine-sensitive step already follows a repo determinism
    convention — squared-distance folds accumulate in index order
    (list_sum == Spark's aggregate fold, proved by the cosine oracles),
    means go through exact decimal sums with the shortest-string cast
    hops on both edges, argmin ties break on cluster_id — so every
    centroid double and every assignment is bit-identical by
    induction."""
    sq = (
        f"list_sum(list_transform(range(1, {_DIM} + 1), j -> "
        "(p.emb[j] - c.centroid[j]) * (p.emb[j] - c.centroid[j])))"
    )

    def assign(i: int, cent: str) -> str:
        return f"""
        a{i} AS MATERIALIZED (
            SELECT vec_id, emb, cluster_id, dist FROM (
                SELECT vec_id, emb, cluster_id, dist,
                       row_number() OVER (
                           PARTITION BY vec_id ORDER BY dist, cluster_id
                       ) AS rn
                FROM (
                    SELECT p.vec_id, p.emb, c.cluster_id, {sq} AS dist
                    FROM pts p, {cent} c
                )
            ) WHERE rn = 1
        )"""

    def update(i: int) -> str:
        return f"""
        c{i + 1} AS MATERIALIZED (
            SELECT cluster_id, list(mean ORDER BY dim) AS centroid
            FROM (
                SELECT cluster_id, CAST(dim AS INTEGER) AS dim,
                       CAST(CAST(SUM(CAST(CAST(coord AS VARCHAR)
                                          AS DECIMAL(27,14))) AS VARCHAR)
                            AS DOUBLE) / count(*) AS mean
                FROM (
                    SELECT cluster_id,
                           unnest(emb) AS coord,
                           unnest(range(len(emb))) AS dim
                    FROM a{i}
                )
                GROUP BY cluster_id, CAST(dim AS INTEGER)
            ) GROUP BY cluster_id
        )"""

    rounds = "".join(
        f", {assign(i, f'c{i}')}, {update(i)}" for i in range(ITERATIONS)
    )
    return f"""
        WITH pts AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ), c0 AS MATERIALIZED (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id,
                   emb AS centroid
            FROM (SELECT vec_id, emb FROM pts ORDER BY vec_id LIMIT {K})
        ){rounds}, {assign(ITERATIONS, f"c{ITERATIONS}")}"""


def kmeans_assignment_ctes() -> str:
    """The full unrolled-Lloyd's WITH prefix, ending at the final
    assignment CTE ``a{ITERATIONS}`` (vec_id, emb, cluster_id, dist) —
    shared by the kmeans oracle and downstream cluster-conditioned
    oracles (sim_hard_negatives), so their hash checks replay the
    IDENTICAL fit."""
    return _kmeans_oracle()


def _kmeans_query_oracle() -> str:
    return f"""{_kmeans_oracle()}
        SELECT vec_id, cluster_id, round(dist, 6) AS dist
        FROM a{ITERATIONS}
    """


@register(
    "kmeans_embeddings",
    oracle=_kmeans_query_oracle(),
    doc="Lloyd's k-means (k=10, 3 iterations, lowest-vec_id init) over the "
        "embedding vectors; returns (vec_id, cluster_id, dist). Broadcast "
        "centroids, zip_with/aggregate distances, exact-decimal means "
        "(shortest-string cast hops) — no UDF, no driver-side point "
        "materialization. Deterministic end-to-end, so the full "
        "assignment is hash-matched by an unrolled-CTE DuckDB replay of "
        "all three Lloyd rounds.",
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_assignments(spark, sf_dir, ITERATIONS)


def kmeans_assignments(
    spark: SparkSession, sf_dir: str, iterations: int
) -> DataFrame:
    """Run Lloyd's for ``iterations`` rounds; see kmeans_embeddings."""
    t = Tables(spark, sf_dir)
    pts = t.embeddings.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    ).cache()
    # first K vecs by id (distributed TakeOrdered), then a windowless
    # 0-based index via sorted-array posexplode over the K rows
    centroids = (
        pts.orderBy("vec_id")
        .limit(K)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("vec_id", "emb"))
            ).alias("a")
        )
        .select(F.posexplode("a").alias("cluster_id", "e"))
        .select("cluster_id", F.col("e.emb").alias("centroid"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        assigned = assign_points(pts, centroids)
        centroids = update_centroids(assigned).localCheckpoint()
    final = assign_points(pts, centroids)
    return final.select(
        "vec_id", "cluster_id", F.round("dist", 6).alias("dist")
    )


@register(
    "q_label_centroids",
    oracle="""
        SELECT label, CAST(dim AS INTEGER) AS dim,
               CAST(CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(27,14)))
                         AS VARCHAR) AS DOUBLE) / count(*) AS centroid_val,
               count(*) AS n_vecs
        FROM (
            SELECT label,
                   unnest(embedding) AS x,
                   unnest(range(len(embedding))) AS dim
            FROM embeddings
        )
        GROUP BY label, CAST(dim AS INTEGER)
    """,
    doc="Per-label mean embedding (the supervised-centroid / class-prototype "
        "op a curation pipeline uses for label-conditioned filtering): "
        "posexplode to (label, dim, coord), exact decimal sums, one final "
        "double divide. NEW determinism rule proved here: float->decimal "
        "must hop through the SHORTEST STRING REPR (.cast('string') / "
        "CAST(x AS VARCHAR)) — both engines' direct float->decimal casts "
        "disagree, but both print the same shortest-roundtrip decimal and "
        "parse it identically. DuckDB's zipped unnest(range(len)) "
        "reproduces posexplode's 0-based dim index.",
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.embeddings.select(
            "label", F.posexplode("embedding").alias("dim", "x")
        )
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("x").cast("string").cast("decimal(27,14)"))
                .cast("double")
                / F.count("*")
            ).alias("centroid_val"),
            F.count("*").alias("n_vecs"),
        )
    )


_CENTROID_CTE = """
        WITH cent AS (
            SELECT label, CAST(dim AS INTEGER) AS dim,
                   CAST(CAST(
                       CAST(CAST(SUM(CAST(CAST(x AS VARCHAR)
                                 AS DECIMAL(27,14))) AS VARCHAR) AS DOUBLE)
                       / count(*) AS VARCHAR) AS DECIMAL(18,9)) AS v
            FROM (
                SELECT label,
                       unnest(embedding) AS x,
                       unnest(range(len(embedding))) AS dim
                FROM embeddings
            )
            GROUP BY label, CAST(dim AS INTEGER)
        ), norms AS (
            SELECT label,
                   CAST(CAST(SUM(v * v) AS VARCHAR) AS DOUBLE) AS nrm
            FROM cent GROUP BY label
        )
"""


@register(
    "sim_centroid_affinity",
    oracle=_CENTROID_CTE + """
        SELECT a.label AS label_a, b.label AS label_b,
               round(
                   CAST(CAST(SUM(a.v * b.v) AS VARCHAR) AS DOUBLE)
                   / (sqrt(na.nrm) * sqrt(nb.nrm)),
                   6) AS cos_sim
        FROM cent a
        JOIN cent b ON a.dim = b.dim AND a.label < b.label
        JOIN norms na ON na.label = a.label
        JOIN norms nb ON nb.label = b.label
        GROUP BY a.label, b.label, na.nrm, nb.nrm
    """,
    doc="Class-prototype affinity matrix: pairwise cosine between the "
        "per-label mean embeddings (the post-clustering diagnostic that "
        "tells a curation pipeline which label populations overlap). "
        "Centroids come from the exact-decimal means of "
        "q_label_centroids, re-quantized to DECIMAL(18,9) via the "
        "shortest-string hop so the k^2 dot products are EXACT decimal "
        "sums (no double summation-order drift), with one double "
        "division + sqrt at the end, rounded to 6. Everything after the "
        "per-dim aggregation is k*dim-sized — broadcast scale at any "
        "corpus size.",
    tags=("similarity", "clustering"),
)
def sim_centroid_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cent = q_label_centroids(spark, sf_dir).select(
        "label",
        "dim",
        F.col("centroid_val").cast("string").cast("decimal(18,9)").alias("v"),
    )
    norms = cent.groupBy("label").agg(
        F.sum(F.col("v") * F.col("v")).cast("double").alias("nrm")
    )
    a, b = cent.alias("a"), cent.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg((F.sum(F.col("a.v") * F.col("b.v"))).cast("double").alias("dot"))
    )
    na = norms.select(
        F.col("label").alias("label_a"), F.col("nrm").alias("nrm_a")
    )
    nb = norms.select(
        F.col("label").alias("label_b"), F.col("nrm").alias("nrm_b")
    )
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dot") / (F.sqrt("nrm_a") * F.sqrt("nrm_b")), 6
            ).alias("cos_sim"),
        )
    )


_DRIFT_FP = 1 << 40  # fixed-point quantum for cross-centroid products


@register(
    "ml_embedding_drift",
    oracle=f"""
        WITH ex AS (
            SELECT label, unnest(embedding) AS x,
                   unnest(range(1, {_DIM} + 1)) AS dim
            FROM embeddings
        ), cl AS (
            SELECT label, dim,
                   CAST(CAST(SUM(CAST(CAST(x AS VARCHAR)
                        AS DECIMAL(27,14))) AS VARCHAR) AS DOUBLE)
                       / count(*) AS c,
                   CAST(count(*) AS BIGINT) AS n_vecs
            FROM ex GROUP BY label, dim
        ), cg AS (
            SELECT dim,
                   CAST(CAST(SUM(CAST(CAST(x AS VARCHAR)
                        AS DECIMAL(27,14))) AS VARCHAR) AS DOUBLE)
                       / count(*) AS g
            FROM ex GROUP BY dim
        ), terms AS (
            SELECT cl.label, cl.n_vecs,
                   CAST(floor(cl.c * cg.g * {float(_DRIFT_FP)})
                        AS BIGINT) AS t_lg,
                   CAST(floor(cl.c * cl.c * {float(_DRIFT_FP)})
                        AS BIGINT) AS t_ll,
                   CAST(floor(cg.g * cg.g * {float(_DRIFT_FP)})
                        AS BIGINT) AS t_gg
            FROM cl JOIN cg USING (dim)
        ), sums AS (
            SELECT label, max(n_vecs) AS n_vecs,
                   CAST(SUM(t_lg) AS BIGINT) AS dot_q,
                   CAST(SUM(t_ll) AS BIGINT) AS nl_q,
                   CAST(SUM(t_gg) AS BIGINT) AS ng_q
            FROM terms GROUP BY label
        )
        SELECT label, CAST(n_vecs AS BIGINT) AS n_vecs,
               dot_q, nl_q, ng_q,
               CAST(dot_q AS DOUBLE)
               / sqrt(CASE WHEN CAST(nl_q AS DOUBLE)
                                * CAST(ng_q AS DOUBLE) = 0
                           THEN CAST(1 AS DOUBLE)
                           ELSE CAST(nl_q AS DOUBLE)
                                * CAST(ng_q AS DOUBLE) END)
                   AS cos_to_global
        FROM sums
    """,
    doc="Per-label embedding drift against the corpus centroid — the "
        "observability check a feature-store owner runs when a model's "
        "inputs may have shifted (a label whose centroid swings away "
        "from the global mean flags a regime change or an upstream "
        "encoder bump). Centroid coordinates are exact-decimal means "
        "(the q_label_centroids recipe); the cross-centroid dot and "
        "norms are summed in 2^-40 FIXED POINT (the Gram/pagerank "
        "trick) so the 64-term reductions are order-free integers, and "
        "the final cosine is one sqrt/div sequence over those exact "
        "ints with the zero-norm degeneracy guarded identically. Two "
        "aggs over one unnest — the same scan serves both centroid "
        "levels.",
    tags=("ml", "similarity"),
)
def ml_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ex = t.embeddings.select(
        "label", F.posexplode("embedding").alias("d0", "x")
    ).select("label", (F.col("d0") + 1).alias("dim"), "x")
    dmean = (
        F.sum(F.col("x").cast("string").cast("decimal(27,14)"))
        .cast("string")
        .cast("double")
    )
    cl = ex.groupBy("label", "dim").agg(
        (dmean / F.count("*")).alias("c"),
        F.count("*").alias("n_vecs"),
    )
    cg = ex.groupBy("dim").agg((dmean / F.count("*")).alias("g"))
    fp = float(_DRIFT_FP)
    terms = cl.join(cg, "dim").select(
        "label",
        "n_vecs",
        F.floor(F.col("c") * F.col("g") * fp).cast("bigint").alias("t_lg"),
        F.floor(F.col("c") * F.col("c") * fp).cast("bigint").alias("t_ll"),
        F.floor(F.col("g") * F.col("g") * fp).cast("bigint").alias("t_gg"),
    )
    sums = terms.groupBy("label").agg(
        F.max("n_vecs").cast("bigint").alias("n_vecs"),
        F.sum("t_lg").cast("bigint").alias("dot_q"),
        F.sum("t_ll").cast("bigint").alias("nl_q"),
        F.sum("t_gg").cast("bigint").alias("ng_q"),
    )
    den = F.col("nl_q").cast("double") * F.col("ng_q").cast("double")
    return sums.select(
        "label",
        "n_vecs",
        "dot_q",
        "nl_q",
        "ng_q",
        (
            F.col("dot_q").cast("double")
            / F.sqrt(F.when(den == 0.0, F.lit(1.0)).otherwise(den))
        ).alias("cos_to_global"),
    )
