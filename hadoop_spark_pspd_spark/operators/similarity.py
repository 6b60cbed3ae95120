"""Similarity search over ``embeddings`` (north-star surface).

Brute-force cosine top-k is the correctness baseline: broadcast the (small)
query set against the full corpus — at 100 TB the corpus side stays
partitioned and never shuffles; only the query set moves. The LSH-bucketed
variant (random-hyperplane signatures, seeded/deterministic) is the scale
path: candidates come from bucket-equality joins instead of the full cross
product, then get exact-cosine reranked.

All vector math is JVM-side (zip_with/aggregate in DOUBLE, sequential
accumulation) — no Python UDF; the DuckDB oracle replicates the same
order of operations (list_transform + list_sum), and scores are rounded to
6 decimals BEFORE ranking so top-k tie-breaks (by candidate_id) agree
cross-engine.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import Tables
from ..functions.vectors import cosine, dot, norm
from ..registry import register

N_QUERIES = 10
TOP_K = 5
DIM = 64
# multi-table LSH: L tables of b hyperplane bits each. b controls bucket
# selectivity (2^b buckets/table), L controls recall (union of candidates).
# Tuned on the synthetic embeddings (uniformly spread, max pairwise cosine
# ~0.51 — the WORST case for hyperplane LSH): L=16/b=6 reaches recall@5
# ~0.5 while scanning ~23% of the corpus; clustered real-world embeddings
# sit far above this at the same config.
LSH_TABLES = 16
LSH_BITS = 6
_PLANES_SEED = 42

def _cosine_sql(a: str = "q", b: str = "c") -> str:
    """Inline rounded-cosine SQL between ``{a}.embedding`` and
    ``{b}.embedding`` — index-ordered list_sum matching the Spark
    zip_with/aggregate fold bit for bit."""
    return f"""
    round(
        list_sum(list_transform(range(1, {DIM} + 1),
            i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(range(1, {DIM} + 1),
               i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({a}.embedding[i] AS DOUBLE))))
           * sqrt(list_sum(list_transform(range(1, {DIM} + 1),
               i -> CAST({b}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE))))),
        6)
"""


_COSINE_SQL = _cosine_sql("q", "c")


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (self excluded)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = corpus.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("candidate_id"),
        F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("candidate_id"))
    return (
        scored.select(
            "*", F.row_number().over(w).cast("long").alias("rk")
        )
        .filter(F.col("rk") <= k)
    )


@register(
    "sim_topk_bruteforce",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding FROM embeddings
            WHERE vec_id < {N_QUERIES}
        ), pairs AS (
            SELECT q.query_id, c.vec_id AS candidate_id, {_COSINE_SQL} AS sim
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        ), ranked AS (
            SELECT query_id, candidate_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, candidate_id
                   ) AS rk
            FROM pairs
        )
        SELECT query_id, candidate_id, sim, rk FROM ranked WHERE rk <= {TOP_K}
    """,
    doc="Exact brute-force cosine top-5 for the first 10 vectors as queries.",
    bench=True,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    queries = t.embeddings.filter(F.col("vec_id") < N_QUERIES)
    return cosine_topk(queries, t.embeddings, TOP_K)


_FILT_QUERIES = 20


@register(
    "sim_filtered_topk",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, label, embedding FROM embeddings
            WHERE vec_id < {_FILT_QUERIES}
        ), pairs AS (
            SELECT q.query_id, c.vec_id AS candidate_id,
                   {_COSINE_SQL} AS sim
            FROM q JOIN embeddings c
              ON c.vec_id <> q.query_id AND c.label = q.label
        ), ranked AS (
            SELECT query_id, candidate_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, candidate_id
                   ) AS rk,
                   CAST(count(*) OVER (PARTITION BY query_id) AS BIGINT)
                       AS n_candidates
            FROM pairs
        )
        SELECT query_id, candidate_id, sim, rk, n_candidates
        FROM ranked WHERE rk <= {TOP_K}
    """,
    doc="FILTERED vector search (the metadata-constrained ANN shape "
        "every retrieval stack needs: 'nearest neighbors WHERE "
        "label = X'): exact cosine top-5 per query among same-label "
        "candidates only, plus the per-query candidate-pool size (the "
        "selectivity a planner uses to choose pre- vs post-filtering). "
        "This is PRE-filtering — the label predicate joins before any "
        "distance math, so at 100 TB the corpus scan prunes on the "
        "metadata column (a partition/cluster key in a real layout) "
        "and only the small query set broadcasts; post-filtering a "
        "global top-k would mis-recall low-selectivity labels. A "
        "query whose label has no other members yields no rows, "
        "identically in both engines.",
    tags=("similarity",),
)
def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    q = t.embeddings.filter(F.col("vec_id") < _FILT_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qe"),
    )
    pairs = t.embeddings.join(
        F.broadcast(q),
        (F.col("label") == F.col("qlabel"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("candidate_id"),
        F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("candidate_id")
    )
    wc = W.partitionBy("query_id")
    return (
        scored.select(
            "*",
            F.row_number().over(w).cast("long").alias("rk"),
            F.count("*").over(wc).cast("long").alias("n_candidates"),
        )
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "candidate_id", "sim", "rk", "n_candidates")
    )


_RRF_K = 60  # the standard RRF damping constant
_RRF_CRED = 1 << 20  # integer credit numerator (exact div both engines)
_RRF_QUERIES = 5
_RRF_LEG_K = 20  # depth of each retrieval leg
_RRF_FINAL_K = 10


@register(
    "sim_hybrid_rrf",
    oracle=f"""
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest(list_filter(
                string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                x -> x <> '')) AS w
            FROM documents
        ), qt AS (
            SELECT doc_id AS query_id, w FROM tok
            WHERE doc_id < {_RRF_QUERIES}
        ), lex_pairs AS (
            SELECT qt.query_id, tok.doc_id AS candidate_id,
                   CAST(count(*) AS BIGINT) AS overlap
            FROM qt JOIN tok ON qt.w = tok.w
            WHERE tok.doc_id <> qt.query_id
            GROUP BY 1, 2
        ), lex AS (
            SELECT query_id, candidate_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY overlap DESC, candidate_id
                   ) AS lex_rk
            FROM lex_pairs
            QUALIFY lex_rk <= {_RRF_LEG_K}
        ), q AS (
            SELECT vec_id AS query_id, embedding FROM embeddings
            WHERE vec_id < {_RRF_QUERIES}
        ), sem_pairs AS (
            SELECT q.query_id, c.vec_id AS candidate_id,
                   {_COSINE_SQL} AS sim
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        ), sem AS (
            SELECT query_id, candidate_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, candidate_id
                   ) AS sem_rk
            FROM sem_pairs
            QUALIFY sem_rk <= {_RRF_LEG_K}
        ), fused AS (
            SELECT coalesce(l.query_id, s.query_id) AS query_id,
                   coalesce(l.candidate_id, s.candidate_id)
                       AS candidate_id,
                   CAST(coalesce({_RRF_CRED} // ({_RRF_K} + l.lex_rk), 0)
                        + coalesce({_RRF_CRED} // ({_RRF_K} + s.sem_rk), 0)
                        AS BIGINT) AS rrf_q
            FROM lex l FULL OUTER JOIN sem s
              ON l.query_id = s.query_id
             AND l.candidate_id = s.candidate_id
        )
        SELECT query_id, candidate_id, rrf_q,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY rrf_q DESC, candidate_id
               ) AS rk
        FROM fused
        QUALIFY rk <= {_RRF_FINAL_K}
    """,
    doc="HYBRID retrieval with reciprocal-rank fusion (the standard "
        "lexical+semantic stack: BM25-ish keyword leg fused with a "
        "vector leg): per query doc, a token-overlap top-20 over "
        "documents and a cosine top-20 over embeddings (vec_id == "
        "doc_id) are fused by integer RRF credits "
        f"(2^20 div ({_RRF_K} + rank) — Spark div == DuckDB //, exact, "
        "so the fused score is an exact BIGINT, no 1/(k+r) float "
        "drift), keeping the top-10. Unmatched-leg candidates get the "
        "single-leg credit via a full outer join. Scale: both legs "
        "broadcast only the query set; the lexical leg joins the "
        "corpus token explode against the tiny query-token set, the "
        "semantic leg is the brute screen (LSH-bucketed at real "
        "scale); the fuse is a top-k-bounded outer join.",
    tags=("similarity", "text"),
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens as _tokens

    t = Tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("w")
    ).distinct()
    qt = tok.filter(F.col("doc_id") < _RRF_QUERIES).select(
        F.col("doc_id").alias("query_id"), "w"
    )
    lex_pairs = (
        tok.join(F.broadcast(qt), "w")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("candidate_id"))
        .agg(F.count("*").cast("bigint").alias("overlap"))
    )
    w_lex = W.partitionBy("query_id").orderBy(
        F.desc("overlap"), F.asc("candidate_id")
    )
    lex = (
        lex_pairs.select(
            "query_id",
            "candidate_id",
            F.row_number().over(w_lex).cast("long").alias("lex_rk"),
        )
        .filter(F.col("lex_rk") <= _RRF_LEG_K)
    )
    q = t.embeddings.filter(F.col("vec_id") < _RRF_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    sem_pairs = t.embeddings.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("candidate_id"),
        F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim"),
    )
    w_sem = W.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("candidate_id")
    )
    sem = (
        sem_pairs.select(
            "query_id",
            "candidate_id",
            F.row_number().over(w_sem).cast("long").alias("sem_rk"),
        )
        .filter(F.col("sem_rk") <= _RRF_LEG_K)
    )
    fused = (
        lex.alias("l")
        .join(
            sem.alias("s"),
            (F.col("l.query_id") == F.col("s.query_id"))
            & (F.col("l.candidate_id") == F.col("s.candidate_id")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("l.query_id"), F.col("s.query_id")).alias(
                "query_id"
            ),
            F.coalesce(
                F.col("l.candidate_id"), F.col("s.candidate_id")
            ).alias("candidate_id"),
            (
                F.coalesce(
                    F.expr(f"{_RRF_CRED} div ({_RRF_K} + lex_rk)"),
                    F.lit(0),
                )
                + F.coalesce(
                    F.expr(f"{_RRF_CRED} div ({_RRF_K} + sem_rk)"),
                    F.lit(0),
                )
            )
            .cast("bigint")
            .alias("rrf_q"),
        )
    )
    w_fin = W.partitionBy("query_id").orderBy(
        F.desc("rrf_q"), F.asc("candidate_id")
    )
    return fused.select(
        "*", F.row_number().over(w_fin).cast("long").alias("rk")
    ).filter(F.col("rk") <= _RRF_FINAL_K)


def _hyperplanes() -> np.ndarray:
    """Seeded random hyperplanes — deterministic across runs/executors."""
    rng = np.random.default_rng(_PLANES_SEED)
    return rng.standard_normal((LSH_TABLES, LSH_BITS, DIM))


# fixed-point quantum for the hyperplane dot products: each x_i * plane_ip
# product is floored to 2^-20 units and summed as exact integers, so the
# SIGN (the LSH bit) is order-free — bit-identical between the numpy
# batch path and the DuckDB oracle's list_sum (the Gram-matrix trick,
# embeddings_linalg.py, applied to hashing).
_LSH_FP = 1 << 20


def lsh_bucket_udf():
    """Arrow-batched pandas UDF: embedding -> array of LSH_TABLES bucket
    ids. One (chunked) numpy broadcast-multiply + floor + sum against the
    (16*6) x 64 plane tensor per batch — the CLAUDE.md-sanctioned vehicle
    for constant-matrix math (the previous 16x6x64 literal-array
    zip_with/aggregate fold interpreted ~6k lambda ops per row and was
    the slowest query in the sweep at 11.7 s / sf0.1)."""
    import pandas as pd

    planes_flat = _hyperplanes().reshape(LSH_TABLES * LSH_BITS, DIM)
    weights = (1 << np.arange(LSH_BITS, dtype=np.int64))

    def _buckets(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.values).astype(np.float64)
        out = np.empty((len(mat), LSH_TABLES * LSH_BITS), dtype=np.int64)
        for s in range(0, len(mat), 256):
            chunk = mat[s:s + 256]
            prods = np.floor(
                chunk[:, None, :] * planes_flat[None, :, :] * float(_LSH_FP)
            )
            out[s:s + 256] = prods.sum(axis=2, dtype=np.float64).astype(
                np.int64
            )
        bits = (out > 0).reshape(-1, LSH_TABLES, LSH_BITS)
        buckets = (bits * weights[None, None, :]).sum(axis=2)
        return pd.Series(list(buckets))

    _buckets.__annotations__ = {"embs": pd.Series, "return": pd.Series}
    return F.pandas_udf(_buckets, "array<long>")


def _ann_lsh_oracle() -> str:
    """DuckDB SQL recomputing the identical LSH index: per-table bucket
    ids from fixed-point hyperplane sign bits (bit-identical to the
    numpy path by the order-free integer sum), the same
    bucket-equality candidate join, and the same rounded exact-cosine
    rerank as sim_topk_bruteforce's oracle.

    Formulated RELATIONALLY (flat plane-weight table joined to the
    unnested embedding, grouped sums) rather than as per-row
    list_transform lambdas over 96 literal arrays — the lambda version
    interpreted ~6k closure ops per row and took 139 s at sf0.1; the
    join+aggregate shape is the same work DuckDB vectorizes in ~2 s."""
    planes = _hyperplanes().reshape(LSH_TABLES * LSH_BITS * DIM)
    lits = ", ".join(repr(float(v)) for v in planes)
    per_tbl = LSH_BITS * DIM
    return f"""
        WITH planes AS MATERIALIZED (
            SELECT CAST((n - 1) // {per_tbl} AS INTEGER) AS t,
                   CAST(((n - 1) % {per_tbl}) // {DIM} AS INTEGER) AS p,
                   CAST((n - 1) % {DIM} + 1 AS INTEGER) AS i,
                   l[CAST(n AS INTEGER)] AS w
            FROM (SELECT [{lits}] AS l), range(1, {LSH_TABLES * per_tbl} + 1) r(n)
        ), ev AS MATERIALIZED (
            SELECT vec_id, CAST(u.i AS INTEGER) AS i,
                   CAST(embedding[CAST(u.i AS INTEGER)] AS DOUBLE) AS x
            FROM embeddings, range(1, {DIM} + 1) u(i)
        ), dots AS MATERIALIZED (
            SELECT e.vec_id, pl.t, pl.p,
                   SUM(CAST(floor(e.x * pl.w * {float(_LSH_FP)}) AS BIGINT))
                       AS d
            FROM ev e JOIN planes pl ON e.i = pl.i
            GROUP BY e.vec_id, pl.t, pl.p
        ), melted AS MATERIALIZED (
            SELECT vec_id, t AS tbl,
                   CAST(SUM(CASE WHEN d > 0
                            THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)
                        AS BIGINT) AS bucket
            FROM dots GROUP BY vec_id, t
        ), cand AS (
            SELECT DISTINCT qm.vec_id AS query_id, m.vec_id AS candidate_id
            FROM melted m
            JOIN melted qm
              ON m.tbl = qm.tbl AND m.bucket = qm.bucket
            WHERE qm.vec_id < {N_QUERIES} AND m.vec_id <> qm.vec_id
        ), scored AS (
            SELECT cand.query_id, cand.candidate_id, {_COSINE_SQL} AS sim
            FROM cand
            JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.candidate_id
        ), ranked AS (
            SELECT query_id, candidate_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, candidate_id
                   ) AS rk
            FROM scored
        )
        SELECT query_id, candidate_id, sim, rk FROM ranked WHERE rk <= {TOP_K}
    """


@register(
    "sim_ann_lsh",
    oracle=_ann_lsh_oracle(),
    doc="ANN via multi-table random-hyperplane LSH (16 tables x 6 bits) + "
        "exact cosine rerank within bucket. The 100 TB path: candidate "
        "lookup is one hash equi-join on (table, bucket) against the "
        "broadcast query side — never a cross product. Bucket bits are "
        "seeded-hyperplane dot-product signs computed in 2^-20 FIXED "
        "POINT inside an Arrow-batched numpy pandas UDF (order-free "
        "integer sums => bit-identical to the SQL oracle AND ~100x "
        "cheaper than the interpreted higher-order-function fold it "
        "replaced), so the whole approximate index is hash-matched, not "
        "rows-only.",
    bench=True,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id", "embedding", lsh_bucket_udf()(F.col("embedding")).alias("bk")
    )
    # melt to (vec_id, tbl, bucket) so candidate lookup is a single
    # hash-joinable equi-join on (tbl, bucket) — an OR of per-table matches
    # would force a nested-loop scan and defeat the index at scale.
    melted = emb.select(
        "vec_id", F.posexplode("bk").alias("tbl", "bucket")
    )
    q_melted = (
        melted.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "tbl", "bucket")
    )
    cand_ids = (
        melted.join(F.broadcast(q_melted), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("candidate_id"))
        .distinct()
    )
    q_vecs = t.embeddings.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = (
        cand_ids.join(
            t.embeddings.select(
                F.col("vec_id").alias("candidate_id"), "embedding"
            ),
            "candidate_id",
        )
        .join(F.broadcast(q_vecs), "query_id")
        .select(
            "query_id",
            "candidate_id",
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("candidate_id"))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= TOP_K)
    )


_QUANT_SAMPLE = 256
_QUANT_ITERS = 5


def _train_coarse_quantizer(
    emb: DataFrame, k_cells: int, iters: int = _QUANT_ITERS
) -> np.ndarray:
    """Deterministic k-means coarse quantizer, trained driver-side on a
    bounded sample (256 x DIM floats — tiny, documented Catalyst-OOM
    workaround). Every step follows a cross-engine determinism
    convention so a SQL oracle can replay the training bit-for-bit:

      * sample = first 256 vectors by vec_id; init = its first k_cells
        rows (replaces the earlier seeded rng.choice — a Philox draw no
        SQL engine can reproduce);
      * assignment = argmax of the FIXED-POINT dot product (each
        product floored to 2^-20 units, summed as exact integers —
        order-free), ties to the lowest cell id;
      * update = exact DECIMAL(27,14) means with the shortest-string
        cast hops on both edges (the repo's double<->decimal
        convention); empty cells keep their previous centroid.
    """
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(_QUANT_SAMPLE)
        .collect()
    )
    sample = [[float(v) for v in r["embedding"]] for r in rows]
    return np.array(_lloyd_rounds(sample, k_cells, iters), dtype=np.float64)


def _lloyd_rounds(
    sample: list[list[float]], k_cells: int, iters: int
) -> list[list[float]]:
    """The deterministic Lloyd loop itself (init = first k rows,
    fixed-point dot argmax, exact-decimal means, empty-cell carry-over)
    on an in-memory sample — shared by the IVF coarse quantizer and the
    per-subspace PQ codebooks."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    cents = [list(sample[i]) for i in range(k_cells)]
    q14 = Decimal("1e-14")
    for _ in range(iters):
        assign = []
        for x in sample:
            best, best_d = 0, None
            for c, cent in enumerate(cents):
                d = 0
                for xi, ci in zip(x, cent):
                    d += math.floor(xi * ci * _LSH_FP)
                if best_d is None or d > best_d:
                    best_d, best = d, c
            assign.append(best)
        for c in range(k_cells):
            members = [sample[i] for i, a in enumerate(assign) if a == c]
            if not members:
                continue  # keep previous centroid
            cents[c] = [
                float(
                    sum(
                        Decimal(repr(m[j])).quantize(q14, ROUND_HALF_UP)
                        for m in members
                    )
                )
                / len(members)
                for j in range(len(members[0]))
            ]
    return cents


_IVF_CELLS = 16
_IVF_NPROBE = 2


_IVF_FX = (
    f"list_sum(list_transform(range(1, {DIM} + 1), j -> "
    f"CAST(floor(s.emb[j] * c.centroid[j] * {float(_LSH_FP)}) "
    "AS BIGINT)))"
)


def _q_assign(name: str, src: str, cent: str, keep: str) -> str:
    """Fixed-point max-dot cell assignment CTE (lowest-cell tie-break)."""
    return f"""
        {name} AS MATERIALIZED (
            SELECT vec_id, emb, cell, rn FROM (
                SELECT s.vec_id, s.emb, c.cell,
                       row_number() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {_IVF_FX} DESC, c.cell
                       ) AS rn
                FROM {src} s, {cent} c
            ) WHERE rn <= {keep}
        )"""


def _quant_train_prefix(k: int) -> str:
    """WITH-body replaying the driver-side coarse-quantizer training:
    pts (doubles), smp (first-256 sample), q0 (first-k init), then
    _QUANT_ITERS unrolled Lloyd rounds ending at the trained q5.
    Shared verbatim by the IVF and silhouette oracles so the replayed
    codebook cannot drift between them."""
    rounds = []
    for i in range(_QUANT_ITERS):
        rounds.append(_q_assign(f"sa{i}", "smp", f"q{i}", "1"))
        rounds.append(f"""
        q{i + 1} AS MATERIALIZED (
            SELECT c.cell, COALESCE(m.centroid, c.centroid) AS centroid
            FROM q{i} c LEFT JOIN (
                SELECT cell, list(mean ORDER BY dim) AS centroid
                FROM (
                    SELECT cell, CAST(dim AS INTEGER) AS dim,
                           CAST(CAST(SUM(CAST(CAST(coord AS VARCHAR)
                                              AS DECIMAL(27,14)))
                                     AS VARCHAR) AS DOUBLE)
                           / count(*) AS mean
                    FROM (
                        SELECT cell, unnest(emb) AS coord,
                               unnest(range(len(emb))) AS dim
                        FROM sa{i}
                    ) GROUP BY cell, CAST(dim AS INTEGER)
                ) GROUP BY cell
            ) m ON m.cell = c.cell
        )""")
    return f"""WITH pts AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ), smp AS MATERIALIZED (
            SELECT vec_id, emb FROM pts ORDER BY vec_id LIMIT {_QUANT_SAMPLE}
        ), q0 AS MATERIALIZED (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                   emb AS centroid
            FROM (SELECT vec_id, emb FROM smp ORDER BY vec_id LIMIT {k})
        ),{",".join(rounds)}"""


def _ivf_oracle() -> str:
    """DuckDB SQL replaying the whole IVF pipeline bit-for-bit: the
    driver-side quantizer training (5 unrolled Lloyd rounds on the
    first-256 sample, fixed-point dot argmax, exact-decimal means with
    empty-cell carry-over — the shared _quant_train_prefix), the
    full-corpus fixed-point cell assignment, the probe join, and the
    rounded exact-cosine rerank."""
    k, nprobe = _IVF_CELLS, _IVF_NPROBE
    fx = _IVF_FX

    def assign(name: str, src: str, cent: str, keep: str) -> str:
        return f"""
        {name} AS MATERIALIZED (
            SELECT vec_id, emb, cell, rn FROM (
                SELECT s.vec_id, s.emb, c.cell,
                       row_number() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {fx} DESC, c.cell
                       ) AS rn
                FROM {src} s, {cent} c
            ) WHERE rn <= {keep}
        )"""

    return f"""
        {_quant_train_prefix(k)},
        {assign("ranked", "pts", f"q{_QUANT_ITERS}", str(nprobe))},
        corpus AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
        qprobe AS (
            SELECT vec_id AS query_id, cell FROM ranked
            WHERE vec_id < {N_QUERIES}
        ),
        cand AS (
            SELECT DISTINCT qp.query_id, co.vec_id AS candidate_id
            FROM corpus co JOIN qprobe qp ON co.cell = qp.cell
            WHERE co.vec_id <> qp.query_id
        ), scored AS (
            SELECT cand.query_id, cand.candidate_id, {_COSINE_SQL} AS sim
            FROM cand
            JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.candidate_id
        ), reranked AS (
            SELECT query_id, candidate_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, candidate_id
                   ) AS rk
            FROM scored
        )
        SELECT query_id, candidate_id, sim, rk
        FROM reranked WHERE rk <= {TOP_K}
    """


@register(
    "sim_ann_ivf",
    oracle=_ivf_oracle(),
    doc="ANN via IVF (inverted-file index): deterministic k-means "
        "centroids as the coarse quantizer (first-256 sample, "
        "fixed-point dot argmax, exact-decimal means — every step a "
        "repo determinism convention), cells assigned by max "
        "fixed-point dot product, queries probe their nprobe=2 nearest "
        "cells, exact cosine rerank within probed cells. The "
        "alternative scale path to hyperplane LSH: cell assignment is "
        "one broadcast map-side pass, candidate lookup a hash-joinable "
        "equi-join on cell id. Hash-matched end-to-end by a DuckDB "
        "replay of the quantizer training AND the index/probe/rerank.",
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    k_cells, nprobe = _IVF_CELLS, _IVF_NPROBE
    centroids = _train_coarse_quantizer(t.embeddings, k_cells)

    # cell assignment via Arrow-batched numpy — k*dim literal expression
    # trees would blow up Catalyst (observed driver OOM); a vectorized
    # pandas UDF with the (tiny) centroid matrix in the closure is both
    # the fast and the memory-sane encoding. Fixed-point dots (floor
    # per product, exact integer sums — order-free) keep the argmax
    # bit-identical to the SQL oracle; stable argsort on the negated
    # dots reproduces ORDER BY dot DESC, cell ASC tie-breaks.
    import pandas as pd

    def _top_cells(embs):
        mat = np.stack(embs.values).astype(np.float64)
        out = np.empty((len(mat), k_cells), dtype=np.int64)
        for s in range(0, len(mat), 256):
            chunk = mat[s:s + 256]
            prods = np.floor(
                chunk[:, None, :] * centroids[None, :, :] * float(_LSH_FP)
            )
            # |summand| <= 2^20*|x*c| summed over 64 dims << 2^53:
            # float64 addition of these integers is exact, order-free
            out[s:s + 256] = prods.sum(axis=2).astype(np.int64)
        order = np.argsort(-out, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf's signature inspection rejects — attach real ones
    _top_cells.__annotations__ = {"embs": pd.Series, "return": pd.Series}
    top_cells = F.pandas_udf(_top_cells, "array<int>")

    with_cells = t.embeddings.select(
        "vec_id", "embedding", top_cells(F.col("embedding")).alias("cells")
    )
    # corpus side indexes each vector in its PRIMARY cell; queries probe
    # their top-nprobe cells
    corpus_cells = with_cells.select(
        "vec_id", "embedding", F.col("cells").getItem(0).alias("cell")
    )
    q_cells = (
        with_cells.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.explode("cells").alias("cell"),
        )
    )
    cand = corpus_cells.join(F.broadcast(q_cells), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("candidate_id"),
        F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim"),
    ).distinct()
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("candidate_id"))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= TOP_K)
    )


_NEARDUP_PAIRS_SQL = f"""
        WITH nv AS (
            -- per-VECTOR norm, computed once (n rows), not per PAIR
            -- (C(n,2) rows x 2): identical double to the inline form
            -- (same sqrt-of-ordered-list_sum on the same input), 3x
            -- less list work on the quadratic side in both engines
            SELECT vec_id, embedding,
                   sqrt(list_sum(list_transform(range(1, {DIM} + 1),
                       i -> CAST(embedding[i] AS DOUBLE)
                            * CAST(embedding[i] AS DOUBLE)))) AS nrm
            FROM embeddings
        )
        SELECT vec_a, vec_b, round(cosim, 6) AS sim
        FROM (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   list_sum(list_transform(range(1, {DIM} + 1),
                       i -> CAST(a.embedding[i] AS DOUBLE)
                            * CAST(b.embedding[i] AS DOUBLE)))
                   / (a.nrm * b.nrm) AS cosim
            FROM nv a JOIN nv b ON a.vec_id < b.vec_id
        )
        WHERE cosim >= 0.4
"""


@register(
    "sim_embedding_neardup",
    oracle=_NEARDUP_PAIRS_SQL,
    doc="Embedding-cosine near-dup pairs (sim >= 0.4) via a PROVABLY "
        "COMPLETE cell-pair prefilter + blocked numpy screen: assign every "
        "vector to its nearest (max-cosine) coarse-quantizer centroid, "
        "track per-cell max angular residual r_i, and only compare cell "
        "pairs (i,j) where the spherical triangle inequality theta(ci,cj) "
        "<= theta_t + r_i + r_j can't rule the pair out — recall is 1 by "
        "construction (no LSH miss probability). Surviving cell pairs are "
        "compared as OCCUPANCY-CAPPED blocks (oversized cells salted into "
        "<=cap sub-blocks) inside one Arrow-batched mapInPandas matmul "
        "screen with a 1e-6 slack margin (>= 1e9x the f64 GEMM error "
        "bound d*eps ~ 7e-15, so no true pair is screened out); only "
        "screen survivors materialize as rows and get the exact JVM-HOF "
        "cosine verify. On clustered real-world embeddings most cell "
        "pairs prune; on an adversarially uniform corpus the screen work "
        "degrades to block-partitioned exact comparison — inherent to "
        "exact recall-1 semantics — but runs at dense-matmul rate inside "
        "bounded ~cap^2 tasks and never materializes a candidate row that "
        "fails the threshold.",
    bench=True,
    tags=("similarity",),
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    threshold = 0.4
    # single-task screen+verify kernel under the vector cap (round-12,
    # the kcenter treatment): the distributed shape costs ~6 sequential
    # driver jobs (count, dim probe, quantizer training, cell stats,
    # screen+verify) — at any local scale that orchestration dwarfs the
    # data work (2000 vectors at sf0.1). The kernel does one blocked
    # f64-GEMM screen with the same slack margin, then re-derives every
    # emitted double through the EXACT HOF op sequence (_seq_dot_np
    # fold, guarded division, _round6_np) — row-identical to the
    # distributed path, which remains the at-scale path.
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "embedding").localCheckpoint(
        eager=False
    )
    if emb.count() <= _ND_LOCAL_VEC_CAP:
        def _nd_kernel(batches):
            import numpy as np
            import pandas as pd

            ids_l, embs_l = [], []
            for pdf in batches:
                ids_l.append(pdf["vec_id"].to_numpy(dtype=np.int64))
                embs_l.append(
                    np.stack(
                        [np.asarray(e, dtype=np.float32)
                         for e in pdf["embedding"]]
                    )
                    if len(pdf)
                    else np.zeros((0, 0), dtype=np.float32)
                )
            ids = (np.concatenate(ids_l)
                   if ids_l else np.zeros(0, dtype=np.int64))
            empty = pd.DataFrame(
                {"vec_a": pd.Series([], dtype="int64"),
                 "vec_b": pd.Series([], dtype="int64"),
                 "sim": pd.Series([], dtype="float64")}
            )
            if not ids.size:
                yield empty
                return
            X64 = np.vstack([e for e in embs_l if e.size]).astype(
                np.float64
            )
            norms = np.sqrt(_seq_dot_np(X64, X64))
            ok = norms > 0.0  # zero-norm: Spark sim is NULL, never kept
            U = np.where(ok[:, None], X64, 0.0) / np.where(
                ok, norms, 1.0
            )[:, None]
            thr = threshold - _SCREEN_MARGIN
            out_frames = []
            n = len(ids)
            blk = 2048  # bounds the screen slab at ~blk*n*8 bytes
            for lo in range(0, n, blk):
                hi = min(lo + blk, n)
                g = U[lo:hi] @ U.T
                mask = (g >= thr) & (ids[lo:hi, None] < ids[None, :])
                mask &= ok[lo:hi, None] & ok[None, :]
                ia, ib = np.nonzero(mask)
                if not len(ia):
                    continue
                ia = ia + lo
                # exact verify: identical op sequence to the HOF
                # expressions (fold, na*nb product, one division)
                sim = _seq_dot_np(X64[ia], X64[ib]) / (
                    norms[ia] * norms[ib]
                )
                keep = sim >= threshold
                if not keep.any():
                    continue
                out_frames.append(pd.DataFrame(
                    {"vec_a": pd.Series(ids[ia[keep]], dtype="int64"),
                     "vec_b": pd.Series(ids[ib[keep]], dtype="int64"),
                     "sim": pd.Series(
                         _round6_np(sim[keep]), dtype="float64")}
                ))
            yield (pd.concat(out_frames, ignore_index=True)
                   if out_frames else empty)

        return emb.coalesce(1).mapInPandas(
            _nd_kernel, "vec_a long, vec_b long, sim double"
        )
    cand = neardup_candidates(spark, sf_dir, threshold)
    # zip_with/aggregate cosine is numerically symmetric (per-index products
    # commute, accumulation order is index order), so least/greatest
    # reordering can't drift the rounded score vs the oracle's a<b layout.
    # The numpy screen only ever REMOVES pairs the exact filter would also
    # remove (slack margin >> GEMM error); every emitted double below comes
    # from the same HOF expressions as before, pinned by the oracle hash.
    sim = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return cand.filter(sim >= threshold).select(
        F.least("ida", "idb").alias("vec_a"),
        F.greatest("ida", "idb").alias("vec_b"),
        F.round(sim, 6).alias("sim"),
    )


# occupancy cap per block: bounds mapInPandas task pair-work at cap^2
# (~16M dots, ~0.2 s of f64 matmul) and block bytes at cap*DIM*4 (~1 MB)
_NEARDUP_CAP = 4096
# max vectors for the SINGLE-TASK screen+verify kernel (the kcenter cap
# pattern): 8192^2 pair dots ~ 4 Gflop of blocked f64 GEMM, well under
# a second serial; past it the distributed cell/block screen runs
_ND_LOCAL_VEC_CAP = 8192
# screen slack: exact_sim >= t implies gemm_sim >= t - margin, since
# |gemm - exact| <= d*eps/(1-d*eps) ~ 7.1e-15 for unit vectors (Higham
# 3.5); 1e-6 leaves 8 orders of magnitude of headroom
_SCREEN_MARGIN = 1e-6


def neardup_candidates(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4,
    k_cells: int | None = None, cap: int = _NEARDUP_CAP,
) -> DataFrame:
    """Screened candidate pair stream (ida, ea, na, idb, eb, nb) from the
    cell-pair prefilter + blocked matmul screen — the complete-by-
    construction half of sim_embedding_neardup, exposed separately so
    tests can measure candidate volume against the block-partition bound
    C(n,2) on an adversarially uniform corpus.

    Completeness: (1) blocks partition each cell, and every block pair
    within a surviving cell pair is compared, so every vector pair not
    provably below threshold (triangle inequality) reaches the screen;
    (2) the screen keeps any pair whose f64-matmul cosine >= threshold -
    margin, and the matmul differs from the exact HOF dot by <= ~7e-15,
    so no true pair is dropped. Only survivors become rows: worst-case
    (uniform corpus, no true pairs) candidate MATERIALIZATION is ~0 even
    though screen flops stay quadratic — the unavoidable cost of exact
    recall-1 semantics, paid at dense-matmul rate in <=cap^2-pair tasks."""
    import math

    import pandas as pd

    t = Tables(spark, sf_dir)
    n = t.embeddings.count()
    row0 = t.embeddings.select(F.size("embedding").alias("d")).first()
    dim = int(row0["d"]) if row0 else DIM
    wide = cap * dim * 4 > (4 << 20)
    if wide:
        # replication traffic is ~n * n_blocks * dim * 4 bytes (each
        # vector ships once per participating block pair); grow the cap
        # to ~24 MB of block bytes so wide vectors move in fewer,
        # bigger blocks (Python groups stay ~100 MB f64)
        cap = max(cap, (24 << 20) // (dim * 4))
    if k_cells is None:
        # ~sqrt(n/8) cells: block-pair count ~n/16 on uniform data while
        # keeping per-cell populations large enough for efficient matmul
        # blocks; capped at the quantizer's 256-row training sample
        k_cells = min(_QUANT_SAMPLE, max(16, math.isqrt(max(n, 1) // 8)))
        if wide:
            # cells BOUND block size from below (a block never spans
            # cells), so fine cells defeat the byte-sized cap: 158
            # cells at n=200k/d=768 made 1,266-vector blocks and each
            # vector shipped 158x (~100 GB of spill, disk-filled twice
            # in round 10). Bound cells so a cell ~ one cap-sized
            # block; pruning on uniform data was nil anyway, and
            # clustered corpora still prune at ~25 cells.
            k_cells = max(16, min(k_cells, -(-n // cap)))
    centroids = _train_coarse_quantizer(t.embeddings, k_cells)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def _assign(embs):
        mat = np.stack(embs.values).astype(np.float64)
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = unit @ cn.T
        cell = cos.argmax(axis=1)
        theta = np.arccos(
            np.clip(cos[np.arange(len(cell)), cell], -1.0, 1.0)
        )
        return pd.DataFrame(
            {"cell": cell.astype("int32"), "theta": theta}
        )

    _assign.__annotations__ = {"embs": pd.Series, "return": pd.DataFrame}
    assign_udf = F.pandas_udf(_assign, "cell int, theta double")

    assigned = (
        t.embeddings.select(
            "vec_id", "embedding", assign_udf(F.col("embedding")).alias("a")
        )
        .select("vec_id", "embedding", "a.cell", "a.theta")
        .cache()
    )
    # per-cell max residual angle + occupancy: k_cells rows — bounded
    # driver collect
    stats = {
        r["cell"]: (r["r"], r["cnt"])
        for r in assigned.groupBy("cell")
        .agg(F.max("theta").alias("r"), F.count("*").alias("cnt"))
        .collect()
    }
    theta_t = math.acos(threshold)
    cc = np.clip(cn @ cn.T, -1.0, 1.0)
    # two physical shapes for the same screen, chosen by BLOCK BYTES
    # (cap * dim * 4):
    #  * narrow vectors (d <= ~256, block <= 4 MB): materialize blocks
    #    via collect_list and join block pairs — fewest shuffled rows,
    #    the measured-fastest shape at d=64 (~2 s sf0.1);
    #  * wide vectors: pair-MEMBERSHIP rows. Joining collect_list'd
    #    block tables pairs ~28 MB rows at d=768 whose UnsafeRow
    #    copies inside the sort-merge join OOM'd the 16g heap at
    #    n=200k (round 10); instead ship each VECTOR (a ~KB row) once
    #    per pair it participates in via a broadcast membership join
    #    and regroup by pair id — the shuffle moves the same bytes in
    #    spillable KB-rows, and no giant row ever exists. (cap and
    #    k_cells were bytes-adjusted above, before quantizer training.)
    nsplit = {c: -(-cnt // cap) for c, (_, cnt) in stats.items()}
    # surviving cell pairs, expanded over occupancy-salt sub-blocks; each
    # unordered vector pair is covered by exactly one block pair (same
    # block -> the in-task ida<idb mask keeps one orientation)
    blk_pairs = []
    cells = sorted(stats)
    for i in cells:
        ri = stats[i][0]
        for j in cells:
            if i > j:
                continue
            if math.acos(cc[i, j]) > theta_t + ri + stats[j][0] + 1e-6:
                continue
            for si in range(nsplit[i]):
                for sj in range(nsplit[j]):
                    if i == j and si > sj:
                        continue
                    blk_pairs.append(
                        (i, si, j, sj, i == j and si == sj)
                    )
    salted = assigned.select(
        "vec_id", "embedding", "cell",
        F.pmod(
            F.col("vec_id"),
            F.coalesce(
                F.element_at(
                    F.create_map(
                        *[F.lit(x) for kv in nsplit.items() for x in kv]
                    ),
                    F.col("cell"),
                ),
                F.lit(1),
            ),
        ).cast("int").alias("salt"),
    )

    thr = threshold - _SCREEN_MARGIN
    out_schema = "ida long, ea array<float>, idb long, eb array<float>"

    if wide:
        members = []  # (cell, salt, pair_id, side): 'a'/'b'/'s' (same)
        for pid, (ci, si, cj, sj, same) in enumerate(blk_pairs):
            if same:
                members.append((ci, si, pid, "s"))
            else:
                members.append((ci, si, pid, "a"))
                members.append((cj, sj, pid, "b"))
        member_df = spark.createDataFrame(
            members, "cell int, salt int, pair_id int, side string"
        )
        stream = salted.join(
            F.broadcast(member_df), ["cell", "salt"]
        ).select("pair_id", "side", "vec_id", "embedding")

        def _screen_group(_key, pdf):
            side = pdf["side"].to_numpy()
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.stack(pdf["embedding"].values).astype(np.float64)
            same = bool((side == "s").any())
            if same:
                a_idx = b_idx = np.arange(len(ids))
            else:
                a_idx = np.nonzero(side == "a")[0]
                b_idx = np.nonzero(side == "b")[0]
            ids_a, ids_b = ids[a_idx], ids[b_idx]
            A, B = mat[a_idx], mat[b_idx]
            Au = A / np.linalg.norm(A, axis=1, keepdims=True)
            Bu = B / np.linalg.norm(B, axis=1, keepdims=True)
            mask = (Au @ Bu.T) >= thr
            if same:
                mask &= ids_a[:, None] < ids_b[None, :]
            ia, ib = np.nonzero(mask)
            emb = pdf["embedding"].values
            # explicit dtypes: an EMPTY result would otherwise default
            # to float64 columns, which Arrow can't cast to list<float>
            return pd.DataFrame(
                {"ida": pd.Series(ids_a[ia], dtype="int64"),
                 "ea": pd.Series(
                     [emb[a_idx[x]] for x in ia], dtype="object"),
                 "idb": pd.Series(ids_b[ib], dtype="int64"),
                 "eb": pd.Series(
                     [emb[b_idx[x]] for x in ib], dtype="object")}
            )

        screened = stream.groupBy("pair_id").applyInPandas(
            _screen_group, out_schema
        )
    else:
        pair_df = spark.createDataFrame(
            blk_pairs, "ci int, si int, cj int, sj int, same boolean"
        )
        blocks = salted.groupBy("cell", "salt").agg(
            F.collect_list(F.struct("vec_id", "embedding")).alias("members")
        )

        def _screen(batches):
            for pdf in batches:
                out_ida, out_ea, out_idb, out_eb = [], [], [], []
                for ma, mb, same in zip(pdf["ma"], pdf["mb"], pdf["same"]):
                    ids_a = np.array(
                        [m["vec_id"] for m in ma], dtype=np.int64)
                    ids_b = np.array(
                        [m["vec_id"] for m in mb], dtype=np.int64)
                    A = np.stack(
                        [m["embedding"] for m in ma]).astype(np.float64)
                    B = np.stack(
                        [m["embedding"] for m in mb]).astype(np.float64)
                    Au = A / np.linalg.norm(A, axis=1, keepdims=True)
                    Bu = B / np.linalg.norm(B, axis=1, keepdims=True)
                    mask = (Au @ Bu.T) >= thr
                    if same:
                        mask &= ids_a[:, None] < ids_b[None, :]
                    ia, ib = np.nonzero(mask)
                    out_ida.extend(ids_a[ia])
                    out_ea.extend(ma[x]["embedding"] for x in ia)
                    out_idb.extend(ids_b[ib])
                    out_eb.extend(mb[x]["embedding"] for x in ib)
                # explicit dtypes (empty-batch rule, CLAUDE.md r6-5)
                yield pd.DataFrame(
                    {"ida": pd.Series(out_ida, dtype="int64"),
                     "ea": pd.Series(out_ea, dtype="object"),
                     "idb": pd.Series(out_idb, dtype="int64"),
                     "eb": pd.Series(out_eb, dtype="object")}
                )

        stream = (
            blocks.select(
                F.col("cell").alias("ci"), F.col("salt").alias("si"),
                F.col("members").alias("ma"),
            )
            .join(F.broadcast(pair_df), ["ci", "si"])
            .join(
                blocks.select(
                    F.col("cell").alias("cj"), F.col("salt").alias("sj"),
                    F.col("members").alias("mb"),
                ),
                ["cj", "sj"],
            )
        )
        screened = stream.mapInPandas(_screen, out_schema)
    # exact verify inputs: same HOF norm on the same float32 arrays as the
    # pre-screen implementation — identical doubles, oracle-hash pinned
    return screened.select(
        "ida", "ea", norm(F.col("ea")).alias("na"),
        "idb", "eb", norm(F.col("eb")).alias("nb"),
    )


@register(
    "sim_semantic_dedup",
    oracle=f"""
        WITH RECURSIVE pairs AS MATERIALIZED ({_NEARDUP_PAIRS_SQL}),
        edges AS MATERIALIZED (
            -- MATERIALIZED is load-bearing: the recursive reach CTE
            -- below re-evaluates its join input EVERY iteration, and
            -- an inlined pair query re-ran the full cosine screen ~20x
            -- (2 s -> 48 s at sf0.1; the round-4 inlining trap)
            SELECT vec_a AS u, vec_b AS v FROM pairs
            UNION ALL
            SELECT vec_b AS u, vec_a AS v FROM pairs
        ),
        reach(u, v) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        lab AS (SELECT u AS vec_id, min(v) AS cluster_id FROM reach GROUP BY u)
        SELECT e.vec_id,
               CAST(coalesce(l.cluster_id, e.vec_id) AS BIGINT) AS cluster_id,
               coalesce(l.cluster_id, e.vec_id) = e.vec_id AS keep
        FROM embeddings e LEFT JOIN lab l ON e.vec_id = l.vec_id
    """,
    doc="SemDeDup-style semantic dedup over embeddings: cosine near-dup "
        "pairs (the provably-complete cell-pair prefilter above) -> "
        "connected components via partition-local contraction CC -> "
        "keep one representative (min vec_id) per semantic cluster. "
        "Singleton vectors are their own clusters, so the output is a "
        "full keep/drop list over the corpus — the composed operator a "
        "curation pipeline actually runs. Oracle: recursive-CTE "
        "reachability closure over the identical pair SQL.",
)
def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.graph import min_label_components

    t = Tables(spark, sf_dir)
    pairs = sim_embedding_neardup(spark, sf_dir).select("vec_a", "vec_b").cache()
    edges = pairs.union(
        pairs.select(F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"))
    ).toDF("u", "v").cache()
    labels = min_label_components(edges).select(
        F.col("node").alias("vec_id"), F.col("label").alias("cluster_id")
    )
    return (
        t.embeddings.select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("cluster_id"), F.col("vec_id")).alias("cluster_id"),
            (
                F.coalesce(F.col("cluster_id"), F.col("vec_id"))
                == F.col("vec_id")
            ).alias("keep"),
        )
    )


@register(
    "sim_quantize_int8",
    oracle=f"""
        WITH d AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ), mm AS (
            SELECT vec_id, e,
                   list_min(e) AS vmin, list_max(e) AS vmax
            FROM d
        )
        SELECT vec_id, vmin, vmax,
               CAST(list_sum(list_transform(e,
                   x -> CAST(least(255, floor((x - vmin) / (vmax - vmin)
                        * 256)) AS BIGINT))) AS BIGINT) AS codes_sum,
               CAST(list_count(list_filter(range(1, {DIM} + 1),
                   i -> floor((e[i] - vmin) / (vmax - vmin) * 256)
                        >= 256)) AS BIGINT) AS n_clipped
        FROM mm
    """,
    doc="Per-vector int8 scalar quantization summary (the embedding-"
        "compression step before an ANN index ships to object storage): "
        "code = min(255, floor((x - vmin)/(vmax - vmin) * 256)). All "
        "math is element-wise IEEE double with identical op order in "
        "both engines and floor (not round) avoids half-way rounding-"
        "mode drift, so the code stream is bit-deterministic; the query "
        "surfaces per-vector range, code checksum, and clip count. "
        "Map-side only — no shuffle.",
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = t.embeddings.select("vec_id", e.alias("e"))
    mm = d.select(
        "vec_id",
        "e",
        F.array_min("e").alias("vmin"),
        F.array_max("e").alias("vmax"),
    )
    raw = lambda x: F.floor(  # noqa: E731
        (x - F.col("vmin")) / (F.col("vmax") - F.col("vmin")) * 256
    )
    codes = F.transform(
        F.col("e"), lambda x: F.least(F.lit(255).cast("bigint"), raw(x))
    )
    return mm.select(
        "vec_id",
        "vmin",
        "vmax",
        F.aggregate(
            codes, F.lit(0).cast("bigint"), lambda acc, c: acc + c
        ).alias("codes_sum"),
        F.size(F.filter(F.col("e"), lambda x: raw(x) >= 256))
        .cast("bigint")
        .alias("n_clipped"),
    )


def neardup_allpairs_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-only exact all-pairs anchor for sim_embedding_neardup.

    O(n^2) theta-join — correct at test scale, never registered/benched;
    the registered query must equal this output exactly (recall-1 check in
    tests/test_dedup_similarity.py).
    """
    t = Tables(spark, sf_dir)
    a = t.embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = t.embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    sim = cosine(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(sim >= 0.4)
        .select("vec_a", "vec_b", F.round(sim, 6).alias("sim"))
    )


@register(
    "sim_label_knn",
    oracle=f"""
        WITH cent AS (
            SELECT label, dim,
                   CAST(CAST(SUM(CAST(CAST(x AS VARCHAR) AS DECIMAL(27,14)))
                             AS VARCHAR) AS DOUBLE) / count(*) AS cv
            FROM (SELECT label, unnest(embedding) AS x,
                         unnest(range(len(embedding))) AS dim
                  FROM embeddings)
            GROUP BY label, dim
        ), cvec AS (
            SELECT label, list(cv ORDER BY dim) AS centroid
            FROM cent GROUP BY label
        ), pairs AS (
            SELECT cvec.label, e.vec_id,
                   round(
                       list_sum(list_transform(range(1, {DIM} + 1),
                           i -> centroid[i] * CAST(e.embedding[i] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(range(1, {DIM} + 1),
                              i -> centroid[i] * centroid[i])))
                          * sqrt(list_sum(list_transform(range(1, {DIM} + 1),
                              i -> CAST(e.embedding[i] AS DOUBLE)
                                   * CAST(e.embedding[i] AS DOUBLE))))),
                       6) AS sim
            FROM cvec JOIN embeddings e ON TRUE
        ), ranked AS (
            SELECT label, vec_id, sim,
                   row_number() OVER (
                       PARTITION BY label ORDER BY sim DESC, vec_id
                   ) AS rk
            FROM pairs
        )
        SELECT label, vec_id, sim, rk FROM ranked WHERE rk <= {TOP_K}
    """,
    doc="Class-prototype kNN (hard-example mining): per-label centroid "
        "(exact decimal means via the float->string->decimal hop), then "
        "top-5 nearest embeddings by cosine to each centroid. Centroids "
        "are dimension-sized -> broadcast; the corpus is scanned once. "
        "Ordered collect (array_sort over (dim, value) structs) rebuilds "
        "the centroid vector deterministically.",
)
def sim_label_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cent = (
        t.embeddings.select(
            "label", F.posexplode("embedding").alias("dim", "x")
        )
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("x").cast("string").cast("decimal(27,14)"))
                .cast("double")
                / F.count("*")
            ).alias("cv")
        )
    )
    cvec = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))),
            lambda s: s.cv,
        ).alias("centroid")
    )
    pairs = t.embeddings.select("vec_id", "embedding").crossJoin(
        F.broadcast(cvec)
    )
    scored = pairs.select(
        "label",
        "vec_id",
        F.round(cosine(F.col("centroid"), F.col("embedding")), 6).alias("sim"),
    )
    w = W.partitionBy("label").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .select("label", "vec_id", "sim", "rk")
    )


_DOT_SQL = """
    round(
        list_sum(list_transform(range(1, {dim} + 1),
            i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),
        6)
""".format(dim=DIM)


@register(
    "sim_rrf_fusion",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding FROM embeddings
            WHERE vec_id < {N_QUERIES}
        ), pairs AS (
            SELECT q.query_id, c.vec_id AS candidate_id,
                   {_COSINE_SQL} AS cos_sim,
                   {_DOT_SQL} AS dot_sim
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        ), ranked AS (
            SELECT query_id, candidate_id,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, candidate_id) AS r_cos,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY dot_sim DESC, candidate_id) AS r_dot
            FROM pairs
        ), fused AS (
            SELECT query_id, candidate_id, r_cos, r_dot,
                   1.0 / (60 + r_cos) + 1.0 / (60 + r_dot) AS rrf
            FROM ranked
        )
        SELECT query_id, candidate_id, r_cos, r_dot, rrf FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY rrf DESC, candidate_id) AS rk
            FROM fused
        ) WHERE rk <= {TOP_K}
    """,
    doc="Reciprocal-rank fusion of two retrieval rankings (cosine and raw "
        "dot product) per query: rrf = 1/(60+r1) + 1/(60+r2), the standard "
        "k=60 fusion. Ranks are integers and the fusion is one fixed "
        "two-term double expression, so the fused ordering is hash-stable. "
        "One pair materialization feeds both rankings — the corpus is "
        "scanned once, never shuffled (queries broadcast).",
    tags=("similarity",),
)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import dot

    t = Tables(spark, sf_dir)
    queries = t.embeddings.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = (
        t.embeddings.select(
            F.col("vec_id").alias("candidate_id"), "embedding"
        )
        .crossJoin(F.broadcast(queries))
        .where(F.col("candidate_id") != F.col("query_id"))
        .select(
            "query_id",
            "candidate_id",
            F.round(cosine(F.col("qe"), F.col("embedding")), 6)
            .alias("cos_sim"),
            F.round(dot(F.col("qe"), F.col("embedding")), 6)
            .alias("dot_sim"),
        )
    )
    w_cos = W.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("candidate_id")
    )
    w_dot = W.partitionBy("query_id").orderBy(
        F.desc("dot_sim"), F.asc("candidate_id")
    )
    ranked = pairs.select(
        "query_id",
        "candidate_id",
        F.row_number().over(w_cos).cast("long").alias("r_cos"),
        F.row_number().over(w_dot).cast("long").alias("r_dot"),
    )
    rrf = 1.0 / (F.lit(60) + F.col("r_cos")) + 1.0 / (
        F.lit(60) + F.col("r_dot")
    )
    fused = ranked.withColumn("rrf", rrf)
    pick = W.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("candidate_id")
    )
    return (
        fused.withColumn("rk", F.row_number().over(pick))
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "candidate_id", "r_cos", "r_dot", "rrf")
    )


_RERANK_QUERIES = 5
_RERANK_COARSE_DIM = 8
_RERANK_CAND = 50

_COARSE_SQL = """
    round(
        list_sum(list_transform(range(1, {cd} + 1),
            i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),
        6)
""".format(cd=_RERANK_COARSE_DIM)


@register(
    "sim_twostage_rerank",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding FROM embeddings
            WHERE vec_id < {_RERANK_QUERIES}
        ), pairs AS (
            SELECT q.query_id, c.vec_id AS candidate_id,
                   {_COARSE_SQL} AS coarse,
                   {_COSINE_SQL} AS sim
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        ), coarse_ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY query_id ORDER BY coarse DESC, candidate_id
                   ) AS crk
            FROM pairs
        ), final AS (
            SELECT query_id, candidate_id, coarse, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, candidate_id
                   ) AS rk
            FROM coarse_ranked WHERE crk <= {_RERANK_CAND}
        )
        SELECT query_id, candidate_id, coarse, sim, rk
        FROM final WHERE rk <= {TOP_K}
    """,
    doc="Two-stage progressive rerank (the Matryoshka/PQ serving shape): "
        "stage 1 scores every candidate on only the first "
        f"{_RERANK_COARSE_DIM} dimensions (8x less arithmetic + memory "
        "traffic per pair) and keeps the top-"
        f"{_RERANK_CAND} per query; stage 2 computes exact full-dim cosine "
        "only on survivors. At 100 TB the corpus side stays partitioned "
        "(queries broadcast), stage-1 cost dominates and is ~dim_coarse/dim "
        "of brute force, and stage 2 touches a constant number of rows per "
        "query. Both stages deterministic: scores rounded to 6 before "
        "ranking, candidate_id tie-break.",
    tags=("similarity",),
)
def sim_twostage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    q = t.embeddings.filter(F.col("vec_id") < _RERANK_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = (
        t.embeddings.select(
            F.col("vec_id").alias("candidate_id"), "embedding"
        )
        .crossJoin(F.broadcast(q))
        .where(F.col("candidate_id") != F.col("query_id"))
    )
    coarse = F.round(
        F.aggregate(
            F.zip_with(
                F.slice(F.col("qe"), 1, _RERANK_COARSE_DIM),
                F.slice(F.col("embedding"), 1, _RERANK_COARSE_DIM),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    scored = pairs.select(
        "query_id", "candidate_id", "qe", "embedding",
        coarse.alias("coarse"),
    )
    w1 = W.partitionBy("query_id").orderBy(
        F.desc("coarse"), F.asc("candidate_id")
    )
    survivors = (
        scored.withColumn("crk", F.row_number().over(w1))
        .where(F.col("crk") <= _RERANK_CAND)
        .select(
            "query_id", "candidate_id", "coarse",
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim"),
        )
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("candidate_id")
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w2).cast("long"))
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "candidate_id", "coarse", "sim", "rk")
    )


def _hard_negatives_oracle() -> str:
    from .clustering import ITERATIONS as _KM_IT
    from .clustering import kmeans_assignment_ctes

    return f"""{kmeans_assignment_ctes()}
        , lab AS MATERIALIZED (
            SELECT vec_id, cluster_id FROM a{_KM_IT}
        ), qs AS (
            SELECT q.vec_id AS query_id, q.embedding,
                   l.cluster_id AS qcl
            FROM embeddings q JOIN lab l ON l.vec_id = q.vec_id
            WHERE q.vec_id < {N_QUERIES}
        ), scored AS (
            SELECT qs.query_id, c.vec_id AS candidate_id,
                   lc.cluster_id AS cand_cluster,
                   {_cosine_sql("qs", "c")} AS sim
            FROM qs, embeddings c
            JOIN lab lc ON lc.vec_id = c.vec_id
            WHERE lc.cluster_id <> qs.qcl
        )
        SELECT query_id, candidate_id, cand_cluster, sim, rk FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY sim DESC, candidate_id
            ) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """


@register(
    "sim_hard_negatives",
    oracle=_hard_negatives_oracle(),
    doc="Contrastive hard-negative mining: for each query vector (first "
        f"{N_QUERIES} vec_ids), the top-{TOP_K} most-cosine-similar "
        "vectors whose k-means cluster DIFFERS from the query's — the "
        "semantically-close-but-different examples an embedding-training "
        "pipeline pairs with its positives (cluster disagreement as the "
        "cheap negative-label proxy; a query's own cluster, including "
        "itself, is excluded by the inequality). Reuses the deterministic "
        "3-round Lloyd's fit (clustering.py) — assignments broadcast "
        "(node-dimension k x dim state), candidate scoring is a "
        "broadcast join of the 10-row query side against the corpus "
        "(the corpus never shuffles; at 100 TB the query side is the "
        "small fixed set being mined for). Oracle replays the IDENTICAL "
        "Lloyd CTEs (kmeans_assignment_ctes) then brute-force ranks — "
        "hash-matched end to end.",
    tags=("similarity",),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .clustering import ITERATIONS as _KM_IT
    from .clustering import kmeans_assignments

    t = Tables(spark, sf_dir)
    lab = kmeans_assignments(spark, sf_dir, _KM_IT).select(
        "vec_id", "cluster_id"
    )
    base = t.embeddings.select("vec_id", "embedding").join(lab, "vec_id")
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("cluster_id").alias("qcl"),
    )
    scored = (
        base.join(F.broadcast(q), F.col("cluster_id") != F.col("qcl"))
        .select(
            "query_id",
            F.col("vec_id").alias("candidate_id"),
            F.col("cluster_id").alias("cand_cluster"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("candidate_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "candidate_id", "cand_cluster", "sim", "rk")
    )


_MATRYOSHKA_DIMS = (8, 16, 32)


def _prefix_cosine_sql(a: str, b: str, dim: int) -> str:
    """Inline rounded cosine over the first ``dim`` coordinates only —
    the truncated-embedding (Matryoshka) similarity."""
    return f"""
    round(
        list_sum(list_transform(range(1, {dim} + 1),
            i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(range(1, {dim} + 1),
               i -> CAST({a}.embedding[i] AS DOUBLE) * CAST({a}.embedding[i] AS DOUBLE))))
           * sqrt(list_sum(list_transform(range(1, {dim} + 1),
               i -> CAST({b}.embedding[i] AS DOUBLE) * CAST({b}.embedding[i] AS DOUBLE))))),
        6)
"""


def _matryoshka_oracle() -> str:
    per_dim = []
    for d in _MATRYOSHKA_DIMS:
        per_dim.append(f"""
        , p{d} AS MATERIALIZED (
            SELECT query_id, candidate_id FROM (
                SELECT q.query_id, c.vec_id AS candidate_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY {_prefix_cosine_sql("q", "c", d)} DESC,
                                    c.vec_id
                       ) AS rk
                FROM q JOIN embeddings c ON c.vec_id <> q.query_id
            ) WHERE rk <= {TOP_K}
        )""")
    unions = "\n            UNION ALL ".join(
        f"""SELECT query_id, CAST({d} AS INTEGER) AS prefix_dim,
                   CAST(SUM(CASE WHEN f.candidate_id IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
            FROM p{d} p
            LEFT JOIN full_rank f USING (query_id, candidate_id)
            GROUP BY query_id"""
        for d in _MATRYOSHKA_DIMS
    )
    return f"""
        WITH q AS MATERIALIZED (
            SELECT vec_id AS query_id, embedding FROM embeddings
            WHERE vec_id < {N_QUERIES}
        ), full_rank AS MATERIALIZED (
            SELECT query_id, candidate_id FROM (
                SELECT q.query_id, c.vec_id AS candidate_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY {_COSINE_SQL} DESC, c.vec_id
                       ) AS rk
                FROM q JOIN embeddings c ON c.vec_id <> q.query_id
            ) WHERE rk <= {TOP_K}
        ){''.join(per_dim)}
        SELECT query_id, prefix_dim, n_overlap,
               CAST(n_overlap AS DOUBLE) / {TOP_K} AS recall_at_k
        FROM ({unions})
    """


@register(
    "sim_matryoshka_recall",
    oracle=_matryoshka_oracle(),
    doc="Truncated-embedding retrieval-quality evaluation (the "
        "measurement that justifies Matryoshka/PQ serving dims): for "
        f"each of the first {N_QUERIES} query vectors and each prefix "
        f"width in {_MATRYOSHKA_DIMS}, the overlap between the top-"
        f"{TOP_K} neighbors ranked by PREFIX-dim cosine and the top-"
        f"{TOP_K} by full-dim cosine — recall@{TOP_K} per (query, "
        "width), the curve an embedding-serving owner reads before "
        "shipping an 8x-cheaper index. All rankings round-6 + "
        "candidate_id tie-broken (the repo similarity convention); "
        "recall is exact-int overlap / k, one deterministic double "
        "division. Queries broadcast, the corpus side stays partitioned "
        "and is scanned once per width — the widths could share one "
        "scan via a single multi-column pass at 100 TB, but each pass "
        "is already the brute-force ground-truth cost this evaluation "
        "inherently pays on a sampled query set.",
    tags=("similarity",),
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    queries = t.embeddings.filter(F.col("vec_id") < N_QUERIES)
    full5 = cosine_topk(queries, t.embeddings, TOP_K).select(
        "query_id", "candidate_id", F.lit(1).alias("hit")
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    per_dim = []
    for d in _MATRYOSHKA_DIMS:
        sim = F.round(
            cosine(
                F.slice(F.col("qe"), 1, d),
                F.slice(F.col("embedding"), 1, d),
            ),
            6,
        )
        w = W.partitionBy("query_id").orderBy(
            F.desc("psim"), F.asc("candidate_id")
        )
        topd = (
            t.embeddings.join(
                F.broadcast(q), F.col("vec_id") != F.col("query_id")
            )
            .select(
                "query_id",
                F.col("vec_id").alias("candidate_id"),
                sim.alias("psim"),
            )
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= TOP_K)
        )
        per_dim.append(
            topd.join(F.broadcast(full5), ["query_id", "candidate_id"], "left")
            .groupBy("query_id")
            .agg(
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                .cast("long")
                .alias("n_overlap")
            )
            .select(
                "query_id",
                F.lit(d).alias("prefix_dim"),
                "n_overlap",
                (F.col("n_overlap").cast("double") / TOP_K)
                .alias("recall_at_k"),
            )
        )
    out = per_dim[0]
    for p in per_dim[1:]:
        out = out.unionAll(p)
    return out


# --- binary (sign-bit) quantization + Hamming search --------------------

_HAM_WORDS = 2  # 64 dims packed into 2x32-bit words (each fits BIGINT)


def _sign_word_spark(lo: int) -> F.Column:
    """Bits lo..lo+31 of the sign signature as one BIGINT word.

    Bit i is set iff embedding[lo + i] >= 0 — a pure comparison, no
    arithmetic, so the signature is trivially bit-identical cross-engine
    (float >= 0 has no rounding). 32 literal power-of-two terms chained
    as one codegen expression (tiny tree — far below the Catalyst
    literal-array limits documented in CLAUDE.md)."""
    acc = F.lit(0).cast("bigint")
    for i in range(32):
        acc = acc + F.when(
            F.element_at(F.col("embedding"), lo + i + 1) >= 0,
            F.lit(1 << i).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
    return acc


def _sign_word_sql(lo: int) -> str:
    return f"""CAST(list_sum(list_transform(range(0, 32), i ->
        CASE WHEN embedding[{lo} + i + 1] >= 0
             THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END))
        AS BIGINT)"""


@register(
    "sim_hamming_topk",
    oracle=f"""
        WITH sig AS (
            SELECT vec_id,
                   {_sign_word_sql(0)} AS w0,
                   {_sign_word_sql(32)} AS w1
            FROM embeddings
        ), qs AS (
            SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
            FROM sig WHERE vec_id < {N_QUERIES}
        ), ham AS (
            SELECT qs.query_id, c.vec_id AS candidate_id,
                   CAST(CAST(bit_count(xor(qs.q0, c.w0)) AS BIGINT)
                      + CAST(bit_count(xor(qs.q1, c.w1)) AS BIGINT)
                        AS BIGINT) AS hamming
            FROM qs JOIN sig c ON c.vec_id <> qs.query_id
        ), ranked AS (
            SELECT query_id, candidate_id, hamming,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY hamming, candidate_id
                   ) AS rk
            FROM ham
        )
        SELECT r.query_id, r.candidate_id, r.hamming, r.rk,
               {_cosine_sql("q", "c")} AS sim
        FROM ranked r
        JOIN embeddings q ON q.vec_id = r.query_id
        JOIN embeddings c ON c.vec_id = r.candidate_id
        WHERE r.rk <= {TOP_K}
    """,
    doc="Binary-code ANN: each vector's 64 dims collapse to a 64-bit "
        "sign signature (bit i = embedding[i] >= 0) packed as two "
        "BIGINT words; neighbor search ranks by popcount Hamming "
        "distance (bit_count(xor)) with candidate_id tie-break, then "
        "exact-cosine-reranks the survivors. The 100 TB story is the "
        "32x scan-width cut: the Hamming pass reads 16 bytes/vector "
        "instead of 256 (sign bits keep ~cosine order for centered "
        "embeddings — Charikar's hyperplane bound with axis-aligned "
        "planes), queries broadcast, and only the <=k survivors ever "
        "touch full floats again. All-integer scoring: zero FP until "
        "the final round-6 rerank column. DuckDB bit_count returns "
        "TINYINT and list_sum HUGEINT — both outer-cast (the "
        "oracle_audit drift classes).",
    tags=("similarity",),
)
def sim_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    sig = t.embeddings.select(
        "vec_id",
        _sign_word_spark(0).alias("w0"),
        _sign_word_spark(32).alias("w1"),
    )
    qs = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    ham = sig.join(F.broadcast(qs), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("candidate_id"),
        (
            F.bit_count(F.col("q0").bitwiseXOR(F.col("w0"))).cast("bigint")
            + F.bit_count(F.col("q1").bitwiseXOR(F.col("w1"))).cast("bigint")
        ).alias("hamming"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("candidate_id")
    )
    top = (
        ham.select("*", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= TOP_K)
    )
    qe = t.embeddings.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    ce = t.embeddings.select(
        F.col("vec_id").alias("candidate_id"), F.col("embedding").alias("ce")
    )
    return (
        ce.join(F.broadcast(top), "candidate_id")
        .join(F.broadcast(qe), "query_id")
        .select(
            "query_id",
            "candidate_id",
            "hamming",
            "rk",
            F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("sim"),
        )
    )


# --- product quantization (ADC) ANN -------------------------------------

_PQ_M = 8        # subspaces
_PQ_SUBDIM = DIM // _PQ_M
_PQ_K = 16       # centroids per subspace codebook
_PQ_ITERS = 2    # Lloyd rounds per subspace (oracle-replayed)
_PQ_RERANK = 32  # ADC survivors that get exact-cosine reranked


def _train_pq_codebooks(emb: DataFrame) -> np.ndarray:
    """Per-subspace deterministic codebooks: the IVF trainer's exact
    Lloyd loop (_lloyd_rounds — first-k init, fixed-point dot argmax,
    exact-decimal means) run independently on each 8-dim slice of the
    same bounded first-256 sample. One collect, eight codebooks."""
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(_QUANT_SAMPLE)
        .collect()
    )
    full = [[float(v) for v in r["embedding"]] for r in rows]
    books = []
    for m in range(_PQ_M):
        lo = m * _PQ_SUBDIM
        sub = [x[lo:lo + _PQ_SUBDIM] for x in full]
        books.append(_lloyd_rounds(sub, _PQ_K, _PQ_ITERS))
    return np.array(books, dtype=np.float64)  # (M, K, SUBDIM)


def _pq_parts() -> tuple[list[str], list[str], list[str]]:
    """The PQ pipeline's CTE fragments (subspace codebook trainings,
    corpus encodings enc{m}, query LUTs qd{m}) against the shared
    pts/smp prefix — reused verbatim by the plain-PQ oracle and the
    composed IVF+PQ oracle so the replayed codebooks cannot drift."""
    sd, fp = _PQ_SUBDIM, float(_LSH_FP)

    def fx(src_expr: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {sd} + 1), j -> "
            f"CAST(floor({src_expr} * c.centroid[j] * {fp}) AS BIGINT)))"
        )

    parts = []
    enc_sel, qd_sel = [], []
    for m in range(_PQ_M):
        lo = m * _PQ_SUBDIM
        parts.append(f"""
        sm{m} AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(range(1, {sd} + 1), j -> emb[{lo} + j])
                       AS emb
            FROM smp
        ), cb{m}_0 AS MATERIALIZED (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                   emb AS centroid
            FROM (SELECT vec_id, emb FROM sm{m} ORDER BY vec_id
                  LIMIT {_PQ_K})
        )""")
        for i in range(_PQ_ITERS):
            parts.append(f"""
        sa{m}_{i} AS MATERIALIZED (
            SELECT vec_id, emb, cell FROM (
                SELECT s.vec_id, s.emb, c.cell,
                       row_number() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {fx("s.emb[j]")} DESC, c.cell
                       ) AS rn
                FROM sm{m} s, cb{m}_{i} c
            ) WHERE rn = 1
        ), cb{m}_{i + 1} AS MATERIALIZED (
            SELECT c.cell, COALESCE(x.centroid, c.centroid) AS centroid
            FROM cb{m}_{i} c LEFT JOIN (
                SELECT cell, list(mean ORDER BY dim) AS centroid
                FROM (
                    SELECT cell, CAST(dim AS INTEGER) AS dim,
                           CAST(CAST(SUM(CAST(CAST(coord AS VARCHAR)
                                              AS DECIMAL(27,14)))
                                     AS VARCHAR) AS DOUBLE)
                           / count(*) AS mean
                    FROM (
                        SELECT cell, unnest(emb) AS coord,
                               unnest(range(len(emb))) AS dim
                        FROM sa{m}_{i}
                    ) GROUP BY cell, CAST(dim AS INTEGER)
                ) GROUP BY cell
            ) x ON x.cell = c.cell
        )""")
        parts.append(f"""
        enc{m} AS MATERIALIZED (
            SELECT vec_id, cell FROM (
                SELECT s.vec_id, c.cell,
                       row_number() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {fx(f"s.emb[{lo} + j]")} DESC, c.cell
                       ) AS rn
                FROM pts s, cb{m}_{_PQ_ITERS} c
            ) WHERE rn = 1
        ), qd{m} AS MATERIALIZED (
            SELECT s.vec_id AS query_id, c.cell,
                   CAST({fx(f"s.emb[{lo} + j]")} AS BIGINT) AS fx
            FROM pts s, cb{m}_{_PQ_ITERS} c
            WHERE s.vec_id < {N_QUERIES}
        )""")
        enc_sel.append(f"SELECT {m} AS m, vec_id, cell FROM enc{m}")
        qd_sel.append(f"SELECT {m} AS m, query_id, cell, fx FROM qd{m}")
    return parts, enc_sel, qd_sel


def _pq_oracle() -> str:
    """DuckDB replay of the whole PQ pipeline: 8 independent subspace
    codebook trainings (2 unrolled Lloyd rounds each, the IVF oracle's
    exact CTE shapes on 8-dim slices), full-corpus encoding, the
    query-side fixed-point ADC lookup table, score-by-sum over
    subspace codes, and the exact-cosine rerank of the top-32."""
    parts, enc_sel, qd_sel = _pq_parts()
    return f"""
        WITH pts AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ), smp AS MATERIALIZED (
            SELECT vec_id, emb FROM pts ORDER BY vec_id LIMIT {_QUANT_SAMPLE}
        ), {",".join(parts)},
        enc_all AS ({" UNION ALL ".join(enc_sel)}),
        qd_all AS ({" UNION ALL ".join(qd_sel)}),
        approx AS (
            SELECT q.query_id, e.vec_id AS candidate_id,
                   CAST(SUM(q.fx) AS BIGINT) AS afx
            FROM enc_all e JOIN qd_all q ON q.m = e.m AND q.cell = e.cell
            WHERE e.vec_id <> q.query_id
            GROUP BY q.query_id, e.vec_id
        ), cand AS (
            SELECT query_id, candidate_id FROM (
                SELECT query_id, candidate_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY afx DESC, candidate_id
                       ) AS arn
                FROM approx
            ) WHERE arn <= {_PQ_RERANK}
        ), scored AS (
            SELECT cand.query_id, cand.candidate_id, {_COSINE_SQL} AS sim
            FROM cand
            JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.candidate_id
        )
        SELECT query_id, candidate_id, sim, rk FROM (
            SELECT query_id, candidate_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, candidate_id
                   ) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """


@register(
    "sim_ann_pq",
    oracle=_pq_oracle(),
    doc="ANN via product quantization with asymmetric distance "
        f"computation (Jegou et al. 2011): the {DIM} dims split into "
        f"{_PQ_M} x {_PQ_SUBDIM}-dim subspaces, each with its own "
        f"{_PQ_K}-centroid codebook (deterministic Lloyd on the "
        "first-256 sample — the IVF quantizer's exact conventions per "
        "slice), so every vector compresses to 8 codes (4 bits each "
        "in a real serialization — 64x smaller than the floats). "
        "Search never decompresses the corpus: each query precomputes "
        f"a {_PQ_M}x{_PQ_K} fixed-point inner-product lookup table, "
        "the ADC scan is a broadcast equi-join on (subspace, code) "
        "plus an integer sum — exact, order-free — and only the "
        f"top-{_PQ_RERANK} approximate survivors are exact-cosine "
        f"reranked to the final top-{TOP_K}. The 100 TB story: codes "
        "are rewritten once at ingest (map-only), the scan side reads "
        "8 bytes/vector with zero shuffle (LUT broadcasts), and "
        "codebooks are driver-bounded constants. Hash-matched by a "
        "full DuckDB replay: 8 subspace trainings, encoding, LUT, "
        "ADC, rerank.",
    bench=True,
    tags=("similarity",),
)
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    t = Tables(spark, sf_dir)
    books = _train_pq_codebooks(t.embeddings)  # (M, K, SUBDIM)

    def _encode(embs):
        mat = np.stack(embs.values).astype(np.float64)
        n = len(mat)
        codes = np.empty((n, _PQ_M), dtype=np.int64)
        for m in range(_PQ_M):
            lo = m * _PQ_SUBDIM
            sub = mat[:, lo:lo + _PQ_SUBDIM]
            # (n, K) fixed-point dots: floor per product, exact int sum
            prods = np.floor(
                sub[:, None, :] * books[m][None, :, :] * float(_LSH_FP)
            ).sum(axis=2)
            # argmax with lowest-cell tie-break == stable argsort desc
            codes[:, m] = np.argsort(-prods, axis=1, kind="stable")[:, 0]
        return pd.Series([row.astype("int32").tolist() for row in codes])

    _encode.__annotations__ = {"embs": pd.Series, "return": pd.Series}
    encode = F.pandas_udf(_encode, "array<int>")

    coded = t.embeddings.select(
        "vec_id", encode(F.col("embedding")).alias("codes")
    )
    enc = coded.select(
        "vec_id", F.posexplode("codes").alias("m", "cell")
    )

    # query-side LUT: JVM zip_with/aggregate fixed-point dots of each
    # query sub-slice against every codebook centroid (10 x 128 rows)
    cb_rows = [
        (m, c, [float(v) for v in books[m][c]])
        for m in range(_PQ_M)
        for c in range(_PQ_K)
    ]
    cb = spark.createDataFrame(
        cb_rows, "m int, cell int, centroid array<double>"
    )
    q = t.embeddings.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    sub = F.slice(F.col("qe"), F.col("m") * _PQ_SUBDIM + 1, _PQ_SUBDIM)
    fx = F.aggregate(
        F.zip_with(
            sub,
            F.col("centroid"),
            lambda x, y: F.floor(x.cast("double") * y * float(_LSH_FP)),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    qd = q.crossJoin(F.broadcast(cb)).select(
        "query_id", "m", "cell", fx.cast("bigint").alias("fx")
    )

    approx = (
        enc.join(F.broadcast(qd), ["m", "cell"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("candidate_id"))
        .agg(F.sum("fx").cast("bigint").alias("afx"))
    )
    aw = W.partitionBy("query_id").orderBy(
        F.desc("afx"), F.asc("candidate_id")
    )
    cand = (
        approx.select(
            "query_id",
            "candidate_id",
            F.row_number().over(aw).alias("arn"),
        )
        .filter(F.col("arn") <= _PQ_RERANK)
        .drop("arn")
    )
    ce = t.embeddings.select(
        F.col("vec_id").alias("candidate_id"), F.col("embedding").alias("ce")
    )
    scored = (
        ce.join(F.broadcast(cand), "candidate_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "candidate_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("candidate_id"))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= TOP_K)
    )


# --- cluster-quality evaluation (simplified silhouette) ------------------

_SIL_FX = 1 << 24  # quantum for the per-point silhouette before summing


def _silhouette_oracle() -> str:
    """Replays the trained coarse quantizer (shared prefix), assigns
    every vector to its NEAREST centroid by fixed-point squared
    Euclidean distance, and computes the centroid-based (simplified)
    silhouette (b - a) / max(a, b) from the exact 2^-20-quantized
    distances, quantized to 2^-24 before the order-free per-cluster
    sum."""
    fp = float(_LSH_FP)
    d2 = (
        f"list_sum(list_transform(range(1, {DIM} + 1), j -> "
        f"CAST(floor((s.emb[j] - c.centroid[j])"
        f" * (s.emb[j] - c.centroid[j]) * {fp}) AS BIGINT)))"
    )
    return f"""
        {_quant_train_prefix(_IVF_CELLS)},
        d AS MATERIALIZED (
            SELECT s.vec_id, c.cell, CAST({d2} AS BIGINT) AS d2
            FROM pts s, q{_QUANT_ITERS} c
        ), r AS (
            SELECT vec_id, cell, d2,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY d2, cell
                   ) AS rn
            FROM d
        ), own AS (
            SELECT vec_id, cell, d2 AS a_fx FROM r WHERE rn = 1
        ), other AS (
            SELECT r.vec_id, min(r.d2) AS b_fx
            FROM r JOIN own o
              ON o.vec_id = r.vec_id AND r.cell <> o.cell
            GROUP BY r.vec_id
        ), sil AS (
            SELECT o.vec_id, o.cell,
                   CAST(floor(
                       CASE WHEN greatest(CAST(o.a_fx AS DOUBLE) / {fp},
                                          CAST(t.b_fx AS DOUBLE) / {fp}) = 0
                            THEN CAST(0 AS DOUBLE)
                            ELSE (CAST(t.b_fx AS DOUBLE) / {fp}
                                  - CAST(o.a_fx AS DOUBLE) / {fp})
                                 / greatest(CAST(o.a_fx AS DOUBLE) / {fp},
                                            CAST(t.b_fx AS DOUBLE) / {fp})
                       END * {float(_SIL_FX)}) AS BIGINT) AS s_fx
            FROM own o JOIN other t ON t.vec_id = o.vec_id
        )
        SELECT cell,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(SUM(s_fx) AS BIGINT) AS sil_fx,
               CAST(CAST(SUM(s_fx) AS BIGINT) AS DOUBLE)
                   / (count(*) * {float(_SIL_FX)}) AS mean_sil
        FROM sil GROUP BY cell
    """


@register(
    "sim_silhouette",
    oracle=_silhouette_oracle(),
    doc="Centroid-based (simplified) silhouette — the cluster-quality "
        "gate a curation pipeline checks before trusting k-means "
        "buckets for semantic dedup or mixture balancing: per point, "
        "a = squared distance to its nearest centroid, b = to the "
        "runner-up, s = (b - a)/max(a, b); per cluster, membership and "
        "mean s. Distances are fixed-point (each squared-difference "
        "term floored to 2^-20 units, summed as exact ints — the "
        "pagerank/Gram discipline), the scalar s chain is all "
        "exact-or-correctly-rounded IEEE ops on exactly-representable "
        "quantized inputs, and s re-quantizes to 2^-24 ints before the "
        "per-cluster sum so aggregation order can't drift it. The "
        "max(a,b)=0 degenerate point (a vector EQUAL to its centroid "
        "in a 1-member cell) is zero-guarded IDENTICALLY in both "
        "engines (the round-5 division-guard convention). Full-corpus "
        "cost: one broadcast k x dim matmul per vector (numpy pandas "
        "UDF, Arrow-batched) + one groupBy(cell) — map-side, no "
        "shuffle beyond the 16-row aggregate; the simplified (not "
        "pairwise) silhouette is exactly what stays computable at "
        "100 TB, O(n*k) instead of O(n^2).",
    tags=("similarity", "clustering"),
)
def sim_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    t = Tables(spark, sf_dir)
    cents = _train_coarse_quantizer(t.embeddings, _IVF_CELLS)

    def _sil_parts(embs):
        mat = np.stack(embs.values).astype(np.float64)
        diffs = mat[:, None, :] - cents[None, :, :]
        d2 = np.floor(diffs * diffs * float(_LSH_FP)).sum(axis=2)
        order = np.argsort(d2, axis=1, kind="stable")
        own = order[:, 0]
        a_fx = d2[np.arange(len(mat)), own]
        second = order[:, 1]
        b_fx = d2[np.arange(len(mat)), second]
        return pd.DataFrame(
            {
                "cell": own.astype("int32"),
                "a_fx": a_fx.astype("int64"),
                "b_fx": b_fx.astype("int64"),
            }
        )

    _sil_parts.__annotations__ = {"embs": pd.Series, "return": pd.DataFrame}
    sil_parts = F.pandas_udf(
        _sil_parts, "cell int, a_fx long, b_fx long"
    )

    fp = float(_LSH_FP)
    parts = t.embeddings.select(
        sil_parts(F.col("embedding")).alias("p")
    ).select("p.cell", "p.a_fx", "p.b_fx")
    a_q = F.col("a_fx").cast("double") / fp
    b_q = F.col("b_fx").cast("double") / fp
    mx = F.greatest(a_q, b_q)
    s = F.when(mx == 0, F.lit(0.0)).otherwise((b_q - a_q) / mx)
    quant = parts.select(
        "cell",
        F.floor(s * float(_SIL_FX)).cast("bigint").alias("s_fx"),
    )
    return quant.groupBy("cell").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum("s_fx").cast("bigint").alias("sil_fx"),
        (
            F.sum("s_fx").cast("bigint").cast("double")
            / (F.count("*") * float(_SIL_FX))
        ).alias("mean_sil"),
    )


# ------------------------------------------------- MMR diversification

# Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
# greedily pick K results balancing relevance to the query against
# redundancy with already-selected results. The scale path: stage 1
# (corpus scoring + top-C cut) is the distributed cost, identical in
# shape to sim_topk_bruteforce; the greedy loop touches only the C
# candidates and runs inside one bounded applyInPandas group.
_MMR_QUERY_ID = 0
_MMR_CANDIDATES = 32
_MMR_K = 8
# lambda=0.7: score = 0.7*rel - 0.3*max_sim_to_selected. Both engines
# combine the same round-6 doubles with the same two literals, so the
# scores (and hence the greedy argmax ordering) are bit-identical.


def _mmr_greedy(pdf):
    """One bounded group: rows (c_id, rel_c, s_id, sim) for every ordered
    candidate pair. Pure-Python float64 greedy — the identical IEEE ops
    the unrolled SQL replay performs."""
    import pandas as pd

    rel = {}
    sims = {}
    for r in pdf.itertuples(index=False):
        rel[int(r.c_id)] = float(r.rel_c)
        sims[(int(r.c_id), int(r.s_id))] = float(r.sim)
    remaining = sorted(rel)
    selected: list[int] = []
    out = {"rank": [], "vec_id": [], "rel": [], "mmr_score": []}
    for k in range(1, _MMR_K + 1):
        best = None
        for c in remaining:
            if selected:
                # TRUE max — cosines can be negative, and a negative
                # max-sim is a diversity BONUS (standard MMR; clamping
                # at 0 diverges from the SQL replay's MAX aggregate)
                ms = max(sims[(c, s)] for s in selected)
                score = 0.7 * rel[c] - 0.3 * ms
            else:
                score = 0.7 * rel[c]
            if best is None or score > best[0]:
                best = (score, c)
        score, c = best
        selected.append(c)
        remaining.remove(c)
        out["rank"].append(k)
        out["vec_id"].append(c)
        out["rel"].append(rel[c])
        out["mmr_score"].append(score)
    return pd.DataFrame(
        {
            "rank": pd.Series(out["rank"], dtype="int32"),
            "vec_id": pd.Series(out["vec_id"], dtype="int64"),
            "rel": pd.Series(out["rel"], dtype="float64"),
            "mmr_score": pd.Series(out["mmr_score"], dtype="float64"),
        }
    )


def _mmr_oracle() -> str:
    """Unrolled greedy replay: sel_k CTEs accumulate picks; every pick is
    ORDER BY score DESC, vec_id LIMIT 1 over bit-identical doubles
    (round-6 cosines combined with CAST'd double literals)."""
    steps = []
    picks = ["SELECT 1 AS rank, vec_id, rel, "
             "CAST(0.7 AS DOUBLE) * rel AS mmr_score FROM p1"]
    steps.append("""
        p1 AS MATERIALIZED (
            SELECT vec_id, rel FROM cand ORDER BY rel DESC, vec_id LIMIT 1
        ), sel1 AS (SELECT vec_id FROM p1)""")
    for k in range(2, _MMR_K + 1):
        steps.append(f"""
        p{k} AS MATERIALIZED (
            SELECT c.vec_id, c.rel,
                   CAST(0.7 AS DOUBLE) * c.rel
                   - CAST(0.3 AS DOUBLE) * mx.m AS score
            FROM cand c
            JOIN (SELECT p.c_id, MAX(p.sim) AS m FROM pairs p
                  WHERE p.s_id IN (SELECT vec_id FROM sel{k - 1})
                  GROUP BY p.c_id) mx ON mx.c_id = c.vec_id
            WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
            ORDER BY score DESC, c.vec_id LIMIT 1
        ), sel{k} AS (
            SELECT vec_id FROM sel{k - 1}
            UNION ALL SELECT vec_id FROM p{k}
        )""")
        picks.append(
            f"SELECT {k} AS rank, vec_id, rel, score AS mmr_score FROM p{k}"
        )
    union = "\n            UNION ALL ".join(picks)
    return f"""
        WITH q AS (
            SELECT embedding FROM embeddings WHERE vec_id = {_MMR_QUERY_ID}
        ), rel0 AS (
            SELECT c.vec_id, {_cosine_sql("q", "c")} AS rel
            FROM embeddings c, q WHERE c.vec_id <> {_MMR_QUERY_ID}
        ), cand AS MATERIALIZED (
            SELECT vec_id, rel FROM rel0 ORDER BY rel DESC, vec_id
            LIMIT {_MMR_CANDIDATES}
        ), pairs AS MATERIALIZED (
            SELECT a.vec_id AS c_id, b.vec_id AS s_id,
                   {_cosine_sql("ea", "eb")} AS sim
            FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
            JOIN embeddings ea ON ea.vec_id = a.vec_id
            JOIN embeddings eb ON eb.vec_id = b.vec_id
        ),{",".join(steps)}
        SELECT CAST(rank AS INTEGER) AS rank, vec_id, rel, mmr_score
        FROM ({union})
    """


@register(
    "sim_mmr_diversify",
    oracle=_mmr_oracle(),
    doc="MMR (Maximal Marginal Relevance) diversified top-8: score the "
        "corpus against query vec 0 (round-6 cosine, the bruteforce "
        "scoring stage), keep the top-32 candidates, then greedily pick "
        "8 maximizing 0.7*rel - 0.3*max_sim_to_already_selected. The "
        "greedy loop runs in one bounded 992-row applyInPandas group "
        "(no driver collect); the oracle replays it as 8 unrolled "
        "MATERIALIZED argmax CTEs. Scores are combinations of round-6 "
        "doubles with identical literals, so the argmax ordering is "
        "bit-identical cross-engine.",
)
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") == _MMR_QUERY_ID).select(
        F.col("embedding").alias("qe")
    )
    rel = (
        emb.filter(F.col("vec_id") != _MMR_QUERY_ID)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("rel_c"),
        )
    )
    cand = rel.orderBy(F.desc("rel_c"), F.asc("vec_id")).limit(
        _MMR_CANDIDATES
    ).cache()
    a = cand.select(
        F.col("vec_id").alias("c_id"),
        F.col("rel_c"),
        F.col("embedding").alias("ea"),
    )
    b = cand.select(
        F.col("vec_id").alias("s_id"), F.col("embedding").alias("eb")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("c_id") != F.col("s_id"))
        .select(
            "c_id",
            "rel_c",
            "s_id",
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("sim"),
        )
    )
    return (
        pairs.groupBy(F.lit(1).alias("g"))
        .applyInPandas(
            lambda _, pdf: _mmr_greedy(pdf),
            schema="rank int, vec_id bigint, rel double, mmr_score double",
        )
    )


# ------------------------------------------------ k-center coreset pick

# Gonzalez farthest-point traversal: seed at vec 0, then repeatedly add
# the point whose distance to the nearest already-selected center is
# LARGEST — the classic 2-approximation for k-center and the standard
# deterministic coreset / diversity-selection pass over an embedding
# corpus (also the derandomized analog of k-means++ seeding). Distances
# are 1 - round6(cosine), so every comparison is over bit-identical
# doubles cross-engine.
_KC_K = 8
_KC_SEED = 0

# max embedding rows for the single-task Gonzalez kernel: ~256 MB of
# f32 vectors at d=64; past it the distributed per-round argmax below
# is the path (the graph-kernel cap pattern applied to vectors)
_KC_LOCAL_VEC_CAP = 1_000_000


def _seq_dot_np(a64, b64):
    """Left-to-right per-dimension fold: acc starts 0.0, one add per
    dim — matches F.aggregate(zip_with(...), 0.0, acc + v) exactly
    (vectorized across rows, SEQUENTIAL across dims — exactly
    functions/vectors.dot). Accepts (2D, 1D), (1D, 1D) or (2D, 2D)."""
    import numpy as np

    d = a64.shape[-1]
    acc = np.zeros(a64.shape[0], dtype=np.float64) \
        if a64.ndim == 2 else np.float64(0.0)
    for j in range(d):
        acc = acc + (
            (a64[:, j] if a64.ndim == 2 else a64[j])
            * (b64[j] if b64.ndim == 1 else b64[:, j])
        )
    return acc


def _round6_np(vals):
    """Spark's round(x, 6) == BigDecimal.valueOf(x).setScale(6,
    HALF_UP) — HALF_UP on the SHORTEST-STRING decimal repr of the
    double (Double.toString == Python repr), NOT on its exact binary
    expansion. Vectorized fast path: scale by 1e6 and round
    half-away-from-zero in float64; the float product can only
    disagree with the decimal-string path when the scaled fractional
    part lands within ~1e-10 of a tie, so route everything within 1e-6
    of .5 (measure-~2e-6 of inputs) through the exact Decimal(repr(v))
    slow path. Replaces the round-11 per-element Decimal loop (O(k*n)
    interpreter-speed ops near the 1M-vector cap — VERDICT r11 #4)."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    q6 = Decimal("0.000001")
    a = np.abs(vals)
    scaled = a * 1e6
    frac = scaled - np.floor(scaled)
    out = np.copysign(np.floor(scaled + 0.5), vals) / 1e6
    near_tie = np.flatnonzero(np.abs(frac - 0.5) < 1e-6)
    for j in near_tie:
        out[j] = float(
            Decimal(repr(float(vals[j]))).quantize(
                q6, rounding=ROUND_HALF_UP
            )
        )
    return out


def _kcenter_kernel(batches):
    """Exact single-task replay of the Gonzalez farthest-point loop.
    Bit-identical to the distributed path: the cosine fold is the same
    left-to-right sequence of correctly-rounded IEEE ops
    (_seq_dot_np == functions/vectors.dot) and round-6 mirrors Spark's
    BigDecimal.valueOf HALF_UP exactly (_round6_np). Yields the same
    (rank, vec_id, min_dist) rows, NULL min_dist for the seed."""
    import numpy as np
    import pandas as pd

    ids_l, embs_l = [], []
    for pdf in batches:
        ids_l.append(pdf["vec_id"].to_numpy(dtype=np.int64))
        embs_l.append(
            np.stack([np.asarray(e, dtype=np.float32) for e in pdf["embedding"]])
            if len(pdf)
            else np.zeros((0, 0), dtype=np.float32)
        )
    ids = np.concatenate(ids_l) if ids_l else np.zeros(0, dtype=np.int64)
    if not ids.size:
        yield pd.DataFrame(
            {"rank": pd.Series([], dtype="int32"),
             "vec_id": pd.Series([], dtype="int64"),
             "min_dist": pd.Series([], dtype="Float64")}
        )
        return
    X = np.vstack([e for e in embs_l if e.size])
    n, d = X.shape
    X64 = X.astype(np.float64)
    seq_dot = _seq_dot_np
    round6 = _round6_np
    norms = np.sqrt(seq_dot(X64, X64))
    seed_pos = int(np.flatnonzero(ids == _KC_SEED)[0])
    sel = [seed_pos]
    out_rank, out_id, out_dist = [1], [int(ids[seed_pos])], [None]
    mind = np.full(n, np.inf)
    for k in range(2, _KC_K + 1):
        c64 = X64[sel[-1]]
        cnorm = np.sqrt(seq_dot(c64, c64))
        denom = cnorm * norms
        # Spark/DuckDB double division by zero yields NULL (not IEEE
        # inf/NaN): a zero-norm candidate's dist is NULL every round,
        # so its mind stays NULL and it sorts LAST under the loop's
        # ORDER BY mind DESC (NULLS LAST) — never picked. -inf mirrors
        # that exactly in the argmax (r5 identical-denominator-guard
        # rule; NaN would instead poison np.minimum and crash the
        # kernel while the loop survives).
        zero = denom == 0.0
        cos = seq_dot(X64, c64) / np.where(zero, 1.0, denom)
        dist = np.where(zero, -np.inf, 1.0 - round6(cos))
        mind = np.minimum(mind, dist)
        cand = np.ones(n, dtype=bool)
        cand[sel] = False
        best = np.flatnonzero(cand & (mind == mind[cand].max()))
        pick = best[np.argmin(ids[best])]
        sel.append(int(pick))
        out_rank.append(k)
        out_id.append(int(ids[pick]))
        out_dist.append(float(mind[pick]))
    yield pd.DataFrame(
        {
            "rank": pd.Series(out_rank, dtype="int32"),
            "vec_id": pd.Series(out_id, dtype="int64"),
            "min_dist": pd.Series(out_dist, dtype="Float64"),
        }
    )


def _kcenter_oracle() -> str:
    steps = []
    picks = [
        f"SELECT 1 AS rank, CAST({_KC_SEED} AS BIGINT) AS vec_id, "
        "CAST(NULL AS DOUBLE) AS min_dist"
    ]
    steps.append(
        f"sel1 AS (SELECT CAST({_KC_SEED} AS BIGINT) AS vec_id)"
    )
    for k in range(2, _KC_K + 1):
        steps.append(f"""
        p{k} AS MATERIALIZED (
            SELECT c.vec_id,
                   MIN(CAST(1 AS DOUBLE) - {_cosine_sql("c", "s")}) AS mind
            FROM embeddings c, embeddings s
            WHERE s.vec_id IN (SELECT vec_id FROM sel{k - 1})
              AND c.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
            GROUP BY c.vec_id
            ORDER BY mind DESC, c.vec_id LIMIT 1
        ), sel{k} AS (
            SELECT vec_id FROM sel{k - 1}
            UNION ALL SELECT vec_id FROM p{k}
        )""")
        picks.append(
            f"SELECT {k} AS rank, vec_id, mind AS min_dist FROM p{k}"
        )
    union = "\n            UNION ALL ".join(picks)
    return f"""
        WITH {",".join(steps)}
        SELECT CAST(rank AS INTEGER) AS rank, vec_id, min_dist
        FROM ({union})
    """


@register(
    "sim_kcenter_coreset",
    oracle=_kcenter_oracle(),
    doc="Deterministic k-center coreset selection (Gonzalez farthest-"
        "point traversal, k=8): seed at vec 0, each step adds the corpus "
        "point maximizing its min round-6 cosine distance to the "
        "selected set. Every step is one DISTRIBUTED full-corpus argmax "
        "(cosines against <=7 broadcast literal centers, JVM-side "
        "zip_with fold) followed by a single-row bounded collect — the "
        "k-sequential structure is inherent to the algorithm. The "
        "oracle replays the traversal as unrolled MATERIALIZED argmax "
        "CTEs over the identical rounded distances.",
)
def sim_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "embedding").localCheckpoint(
        eager=False
    )
    # single-task exact kernel under the vector cap (the graph-kernel
    # pattern): the k-1 sequential distributed argmax rounds each cost a
    # driver job + per-round Catalyst analysis of a fresh literal-center
    # expression tree — the dominant wall at any local scale (measured
    # ~5 s at sf0.1). The kernel replays the identical fold/round/argmax
    # sequence in one task; the loop below stays the at-scale path.
    if emb.count() <= _KC_LOCAL_VEC_CAP:
        return emb.coalesce(1).mapInPandas(
            _kcenter_kernel, "rank int, vec_id long, min_dist double"
        )
    emb = emb.cache()
    seed = emb.filter(F.col("vec_id") == _KC_SEED).collect()[0]
    selected = [(int(seed["vec_id"]), list(seed["embedding"]))]
    out = [(1, int(seed["vec_id"]), None)]
    for k in range(2, _KC_K + 1):
        # the denominator is guarded IDENTICALLY to the kernel's -inf
        # sentinel (r5 rule): a zero-norm embedding's cosine is NULL —
        # least() ignores it and an all-NULL mind sorts last — instead
        # of an ANSI DIVIDE_BY_ZERO task failure.
        def _dist(v):
            c = F.array(*[F.lit(float(x)) for x in v])
            den = norm(c) * norm(F.col("embedding"))
            return F.lit(1.0) - F.round(
                F.when(den != 0.0, dot(c, F.col("embedding")) / den), 6
            )

        dists = [_dist(v) for _, v in selected]
        mind = dists[0] if len(dists) == 1 else F.least(*dists)
        ids = [i for i, _ in selected]
        pick = (
            emb.filter(~F.col("vec_id").isin(ids))
            .select("vec_id", "embedding", mind.alias("mind"))
            .orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        selected.append((int(pick["vec_id"]), list(pick["embedding"])))
        out.append((k, int(pick["vec_id"]), float(pick["mind"])))
    return spark.createDataFrame(
        out, "rank int, vec_id long, min_dist double"
    )


# --- IVF + PQ composed serving index (FAISS IVF,PQ shape) ----------------


def _ivfpq_oracle() -> str:
    """Composed replay: the coarse-quantizer training prefix (pts/smp/
    q0..q5 — shared verbatim with the IVF and silhouette oracles), the
    nprobe=2 cell assignment, PLUS the PQ codebook parts (shared
    verbatim with the plain-PQ oracle), with the ADC aggregation
    restricted to candidates whose PRIMARY coarse cell is probed by the
    query — the FAISS IVF,PQ serving composition (codes over raw
    vectors; the residual-encoding IVFADC variant is the documented
    next step)."""
    parts, enc_sel, qd_sel = _pq_parts()
    return f"""
        {_quant_train_prefix(_IVF_CELLS)},
        {_q_assign("ranked", "pts", f"q{_QUANT_ITERS}", str(_IVF_NPROBE))},
        corpus AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
        qprobe AS (
            SELECT vec_id AS query_id, cell FROM ranked
            WHERE vec_id < {N_QUERIES}
        ),
        {",".join(parts)},
        enc_all AS ({" UNION ALL ".join(enc_sel)}),
        qd_all AS ({" UNION ALL ".join(qd_sel)}),
        approx AS (
            SELECT qp.query_id, e.vec_id AS candidate_id,
                   CAST(SUM(q.fx) AS BIGINT) AS afx
            FROM enc_all e
            JOIN corpus co ON co.vec_id = e.vec_id
            JOIN qprobe qp ON qp.cell = co.cell
                          AND qp.query_id <> e.vec_id
            JOIN qd_all q ON q.m = e.m AND q.cell = e.cell
                         AND q.query_id = qp.query_id
            GROUP BY qp.query_id, e.vec_id
        ), cand AS (
            SELECT query_id, candidate_id FROM (
                SELECT query_id, candidate_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY afx DESC, candidate_id
                       ) AS arn
                FROM approx
            ) WHERE arn <= {_PQ_RERANK}
        ), scored AS (
            SELECT cand.query_id, cand.candidate_id, {_COSINE_SQL} AS sim
            FROM cand
            JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.candidate_id
        )
        SELECT query_id, candidate_id, sim, rk FROM (
            SELECT query_id, candidate_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, candidate_id
                   ) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """


@register(
    "sim_ann_ivfpq",
    oracle=_ivfpq_oracle(),
    doc="The composed FAISS-style serving index, IVF,PQ: the coarse "
        f"quantizer ({_IVF_CELLS} cells, deterministic Lloyd) restricts "
        "each query's candidates to its nprobe=2 probed cells via a "
        "hash equi-join on cell id, and WITHIN the probed cells scoring "
        "is compressed-domain ADC over the 8x16 subspace codebooks "
        "(never decompressing the corpus), then exact-cosine rerank of "
        "the top-32 survivors. At 100 TB this is the two-level cost "
        "structure production ANN uses: probe fraction (nprobe/cells) "
        "times ADC scan rate, with exact work bounded by the rerank "
        "budget. Both trainings and the probe/ADC/rerank replay "
        "bit-for-bit in the composed oracle (shared CTE prefixes with "
        "sim_ann_ivf and sim_ann_pq, so the three indexes provably "
        "share one codebook universe). Residual-encoding IVFADC is the "
        "documented next refinement.",
)
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    t = Tables(spark, sf_dir)
    k_cells, nprobe = _IVF_CELLS, _IVF_NPROBE
    centroids = _train_coarse_quantizer(t.embeddings, k_cells)
    books = _train_pq_codebooks(t.embeddings)

    def _cells_and_codes(embs):
        mat = np.stack(embs.values).astype(np.float64)
        n = len(mat)
        prods = np.floor(
            mat[:, None, :] * centroids[None, :, :] * float(_LSH_FP)
        ).sum(axis=2)
        cells = np.argsort(-prods, axis=1, kind="stable")[:, :nprobe]
        codes = np.empty((n, _PQ_M), dtype=np.int64)
        for m in range(_PQ_M):
            lo = m * _PQ_SUBDIM
            sub = mat[:, lo:lo + _PQ_SUBDIM]
            p = np.floor(
                sub[:, None, :] * books[m][None, :, :] * float(_LSH_FP)
            ).sum(axis=2)
            codes[:, m] = np.argsort(-p, axis=1, kind="stable")[:, 0]
        return pd.DataFrame(
            {
                "cells": [r.astype("int32").tolist() for r in cells],
                "codes": [r.astype("int32").tolist() for r in codes],
            }
        )

    _cells_and_codes.__annotations__ = {
        "embs": pd.Series, "return": pd.DataFrame,
    }
    assign = F.pandas_udf(
        _cells_and_codes, "cells array<int>, codes array<int>"
    )

    indexed = t.embeddings.select(
        "vec_id", "embedding", assign(F.col("embedding")).alias("a")
    ).select("vec_id", "embedding", "a.cells", "a.codes")
    corpus = indexed.select(
        "vec_id", F.col("cells").getItem(0).alias("ccell"),
        F.posexplode("codes").alias("m", "code"),
    )
    qprobe = (
        indexed.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode("cells").alias("ccell"),
        )
    )
    # query-side LUT (the sim_ann_pq expression, verbatim semantics)
    cb_rows = [
        (m, c, [float(v) for v in books[m][c]])
        for m in range(_PQ_M)
        for c in range(_PQ_K)
    ]
    cb = spark.createDataFrame(
        cb_rows, "m int, code int, centroid array<double>"
    )
    q = t.embeddings.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    sub = F.slice(F.col("qe"), F.col("m") * _PQ_SUBDIM + 1, _PQ_SUBDIM)
    fx = F.aggregate(
        F.zip_with(
            sub,
            F.col("centroid"),
            lambda x, y: F.floor(x.cast("double") * y * float(_LSH_FP)),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    qd = q.crossJoin(F.broadcast(cb)).select(
        "query_id", "m", "code", fx.cast("bigint").alias("fx")
    )

    approx = (
        corpus.join(F.broadcast(qprobe), "ccell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(qd), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("candidate_id"))
        .agg(F.sum("fx").cast("bigint").alias("afx"))
    )
    aw = W.partitionBy("query_id").orderBy(
        F.desc("afx"), F.asc("candidate_id")
    )
    cand = (
        approx.select(
            "query_id", "candidate_id",
            F.row_number().over(aw).alias("arn"),
        )
        .filter(F.col("arn") <= _PQ_RERANK)
        .drop("arn")
    )
    ce = t.embeddings.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("embedding").alias("ce"),
    )
    scored = (
        ce.join(F.broadcast(cand), "candidate_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "candidate_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("candidate_id")
    )
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= TOP_K)
    )


# --- IVFADC: residual-encoded IVF,PQ (Jegou/Douze/Schmid TPAMI 2011) -----

_ADC_FX = 1 << 20  # residual grid: r_fx = floor(r * 2^20), exact both ways


def _train_residual_codebooks(
    emb: DataFrame, centroids: np.ndarray
) -> np.ndarray:
    """Residual PQ codebooks on the bounded first-256 sample: assign
    each sample vector to its primary coarse cell (the _IVF_FX
    fixed-point dot argmax), form r = x - centroid (ONE IEEE
    subtraction of bit-identical doubles — itself bit-identical
    cross-engine), land it on the exact 2^-20 grid (floor(r * 2^20):
    power-of-two scaling is exact), then run a PURE-INTEGER Lloyd per
    8-dim subspace: assignment is the exact int64 dot argmax
    (products <= 2^46, sums < 2^49), the update a TRUNCATING integer
    mean — DuckDB // truncates toward zero on negatives while Python
    // floors, so trunc is spelled out. No decimal hops anywhere:
    unlike the raw-coordinate codebooks (whose float32-derived coords
    fit DECIMAL(27,14) exactly), residuals are full-precision doubles
    whose 14-digit decimal quantization could round differently
    cross-engine. Returns int64 (M, K, SUBDIM) codebooks on the grid."""
    import math

    rows = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(_QUANT_SAMPLE)
        .collect()
    )
    sample = [[float(v) for v in r["embedding"]] for r in rows]
    rfx = []
    for x in sample:
        best, best_d = 0, None
        for c in range(len(centroids)):
            d = 0
            for xi, ci in zip(x, centroids[c]):
                d += math.floor(xi * ci * _LSH_FP)
            if best_d is None or d > best_d:
                best_d, best = d, c
        cent = centroids[best]
        rfx.append(
            [math.floor((xi - ci) * _ADC_FX) for xi, ci in zip(x, cent)]
        )

    def trunc_div(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a) // b)

    books = np.zeros((_PQ_M, _PQ_K, _PQ_SUBDIM), dtype=np.int64)
    for m in range(_PQ_M):
        lo = m * _PQ_SUBDIM
        sub = [r[lo:lo + _PQ_SUBDIM] for r in rfx]
        cents = [list(sub[i]) for i in range(_PQ_K)]
        for _ in range(_PQ_ITERS):
            assign = []
            for s in sub:
                best, best_d = 0, None
                for c, cent in enumerate(cents):
                    d = sum(si * ci for si, ci in zip(s, cent))
                    if best_d is None or d > best_d:
                        best_d, best = d, c
                assign.append(best)
            for c in range(_PQ_K):
                members = [sub[i] for i, a in enumerate(assign) if a == c]
                if not members:
                    continue  # keep previous codeword
                cents[c] = [
                    trunc_div(sum(mm[j] for mm in members), len(members))
                    for j in range(_PQ_SUBDIM)
                ]
        books[m] = np.array(cents, dtype=np.int64)
    return books


def _ivfadc_oracle() -> str:
    """Composed replay: the shared coarse-quantizer prefix (pts/smp/
    q0..q5, verbatim the IVF/IVFPQ oracles'), residual formation on
    the exact 2^-20 integer grid, per-subspace INTEGER Lloyd codebook
    training (SUM // count truncates identically in DuckDB and the
    driver's trunc_div), residual encoding of the corpus, and ADC
    scoring afx = <q_fx, cent_fx> + sum_m LUT[m, code] — every term an
    exact int64 product sum, so the candidate ranking replays
    bit-for-bit. Exact-cosine rerank of the top-32 as in IVF,PQ."""
    k, nprobe = _IVF_CELLS, _IVF_NPROBE
    dim, sd, fx = DIM, _PQ_SUBDIM, float(_ADC_FX)
    parts = []
    enc_sel, qd_sel = [], []
    for m in range(_PQ_M):
        lo = m * sd
        idot = (
            f"list_sum(list_transform(range(1, {sd} + 1), "
            f"j -> s.rfx[{lo} + j] * c.cfx[j]))"
        )
        parts.append(f"""
        rcb{m}_0 AS MATERIALIZED (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                   list_transform(range(1, {sd} + 1),
                                  j -> rfx[{lo} + j]) AS cfx
            FROM (SELECT vec_id, rfx FROM rsmp ORDER BY vec_id
                  LIMIT {_PQ_K})
        )""")
        for i in range(_PQ_ITERS):
            parts.append(f"""
        ras{m}_{i} AS MATERIALIZED (
            SELECT vec_id, rfx, cell FROM (
                SELECT s.vec_id, s.rfx, c.cell,
                       row_number() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {idot} DESC, c.cell
                       ) AS rn
                FROM rsmp s, rcb{m}_{i} c
            ) WHERE rn = 1
        ), rcb{m}_{i + 1} AS MATERIALIZED (
            SELECT c.cell, COALESCE(x.cfx, c.cfx) AS cfx
            FROM rcb{m}_{i} c LEFT JOIN (
                SELECT cell, list(v ORDER BY dim) AS cfx
                FROM (
                    SELECT a.cell, CAST(d.dim AS INTEGER) AS dim,
                           CAST(SUM(a.rfx[{lo} + d.dim]) // count(*)
                                AS BIGINT) AS v
                    FROM ras{m}_{i} a,
                         (SELECT unnest(range(1, {sd} + 1)) AS dim) d
                    GROUP BY a.cell, CAST(d.dim AS INTEGER)
                ) GROUP BY cell
            ) x ON x.cell = c.cell
        )""")
        parts.append(f"""
        radc{m} AS MATERIALIZED (
            SELECT vec_id, cell, code FROM (
                SELECT s.vec_id, s.cell, c.cell AS code,
                       row_number() OVER (
                           PARTITION BY s.vec_id
                           ORDER BY {idot} DESC, c.cell
                       ) AS rn
                FROM corpusr s, rcb{m}_{_PQ_ITERS} c
            ) WHERE rn = 1
        ), rqd{m} AS MATERIALIZED (
            SELECT q.query_id, c.cell AS code,
                   CAST(list_sum(list_transform(range(1, {sd} + 1),
                       j -> q.qfx[{lo} + j] * c.cfx[j])) AS BIGINT) AS fx
            FROM qfxt q, rcb{m}_{_PQ_ITERS} c
        )""")
        enc_sel.append(f"SELECT {m} AS m, vec_id, cell, code FROM radc{m}")
        qd_sel.append(f"SELECT {m} AS m, query_id, code, fx FROM rqd{m}")
    return f"""
        {_quant_train_prefix(k)},
        {_q_assign("ranked", "pts", f"q{_QUANT_ITERS}", str(nprobe))},
        {_q_assign("ssmp", "smp", f"q{_QUANT_ITERS}", "1")},
        corpusr AS MATERIALIZED (
            SELECT r.vec_id, r.cell,
                   list_transform(range(1, {dim} + 1), j ->
                       CAST(floor((r.emb[j] - c.centroid[j]) * {fx})
                            AS BIGINT)) AS rfx
            FROM ranked r JOIN q{_QUANT_ITERS} c ON c.cell = r.cell
            WHERE r.rn = 1
        ),
        rsmp AS MATERIALIZED (
            SELECT s.vec_id,
                   list_transform(range(1, {dim} + 1), j ->
                       CAST(floor((s.emb[j] - c.centroid[j]) * {fx})
                            AS BIGINT)) AS rfx
            FROM ssmp s JOIN q{_QUANT_ITERS} c ON c.cell = s.cell
        ),
        qprobe AS (
            SELECT vec_id AS query_id, cell FROM ranked
            WHERE vec_id < {N_QUERIES}
        ),
        qfxt AS MATERIALIZED (
            SELECT vec_id AS query_id,
                   list_transform(range(1, {dim} + 1), j ->
                       CAST(floor(emb[j] * {fx}) AS BIGINT)) AS qfx
            FROM pts WHERE vec_id < {N_QUERIES}
        ),
        centfx AS MATERIALIZED (
            SELECT cell,
                   list_transform(range(1, {dim} + 1), j ->
                       CAST(floor(centroid[j] * {fx}) AS BIGINT)) AS cfx
            FROM q{_QUANT_ITERS}
        ),
        qcofs AS MATERIALIZED (
            SELECT q.query_id, c.cell,
                   CAST(list_sum(list_transform(range(1, {dim} + 1),
                       j -> q.qfx[j] * c.cfx[j])) AS BIGINT) AS qcfx
            FROM qfxt q, centfx c
        ),
        {",".join(parts)},
        enc_all AS ({" UNION ALL ".join(enc_sel)}),
        rqd_all AS ({" UNION ALL ".join(qd_sel)}),
        rsums AS (
            SELECT qp.query_id, e.vec_id AS candidate_id, e.cell,
                   CAST(SUM(l.fx) AS BIGINT) AS rsum
            FROM enc_all e
            JOIN qprobe qp ON qp.cell = e.cell
                          AND qp.query_id <> e.vec_id
            JOIN rqd_all l ON l.m = e.m AND l.code = e.code
                          AND l.query_id = qp.query_id
            GROUP BY 1, 2, 3
        ),
        approx AS (
            SELECT r.query_id, r.candidate_id, r.rsum + o.qcfx AS afx
            FROM rsums r JOIN qcofs o ON o.query_id = r.query_id
                                     AND o.cell = r.cell
        ), cand AS (
            SELECT query_id, candidate_id FROM (
                SELECT query_id, candidate_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY afx DESC, candidate_id
                       ) AS arn
                FROM approx
            ) WHERE arn <= {_PQ_RERANK}
        ), scored AS (
            SELECT cand.query_id, cand.candidate_id, {_COSINE_SQL} AS sim
            FROM cand
            JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.candidate_id
        )
        SELECT query_id, candidate_id, sim, rk FROM (
            SELECT query_id, candidate_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, candidate_id
                   ) AS rk
            FROM scored
        ) WHERE rk <= {TOP_K}
    """


@register(
    "sim_ann_ivfadc",
    oracle=_ivfadc_oracle(),
    doc="IVFADC — the residual-encoding refinement of IVF,PQ (Jegou, "
        "Douze & Schmid, 'Product Quantization for Nearest Neighbor "
        "Search', TPAMI 2011; the FAISS IndexIVFPQ default): corpus "
        "vectors are PQ-coded on their RESIDUAL x - centroid(cell) "
        "rather than raw coordinates, so the codebooks spend their 16 "
        "codewords on the within-cell distribution — and ADC scoring "
        "adds the per-cell offset <q, centroid> back: afx = "
        "<q, cent_c> + sum_m LUT[m, code_m] ~ <q, x>. Every quantity "
        "lives on the exact 2^-20 integer grid (residual floor, query "
        "floor, integer-Lloyd codebooks with truncating integer means), "
        "so training, encoding AND scoring replay bit-identically in "
        "the DuckDB oracle with no decimal machinery. Scale: identical "
        "two-level cost to sim_ann_ivfpq (probe fraction x ADC scan, "
        "exact work bounded by the 32-candidate rerank); the index adds "
        "one broadcast of the 16x64 centroid + 8x16x8 codebook ints per "
        "executor — bytes, not data.",
    tags=("similarity",),
)
def sim_ann_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pandas as pd

    t = Tables(spark, sf_dir)
    k_cells, nprobe = _IVF_CELLS, _IVF_NPROBE
    centroids = _train_coarse_quantizer(t.embeddings, k_cells)
    books = _train_residual_codebooks(t.embeddings, centroids)

    def _cells_and_codes(embs):
        mat = np.stack(embs.values).astype(np.float64)
        n = len(mat)
        prods = np.floor(
            mat[:, None, :] * centroids[None, :, :] * float(_LSH_FP)
        ).sum(axis=2)
        order = np.argsort(-prods, axis=1, kind="stable")
        cells = order[:, :nprobe]
        prim = order[:, 0]
        # residual on the exact 2^-20 grid; int64 matmul (never BLAS)
        rfx = np.floor(
            (mat - centroids[prim]) * float(_ADC_FX)
        ).astype(np.int64)
        codes = np.empty((n, _PQ_M), dtype=np.int64)
        for m in range(_PQ_M):
            lo = m * _PQ_SUBDIM
            d = rfx[:, lo:lo + _PQ_SUBDIM] @ books[m].T
            codes[:, m] = np.argsort(-d, axis=1, kind="stable")[:, 0]
        return pd.DataFrame(
            {
                "cells": [r.astype("int32").tolist() for r in cells],
                "codes": [r.astype("int32").tolist() for r in codes],
            }
        )

    _cells_and_codes.__annotations__ = {
        "embs": pd.Series, "return": pd.DataFrame,
    }
    assign = F.pandas_udf(
        _cells_and_codes, "cells array<int>, codes array<int>"
    )

    indexed = t.embeddings.select(
        "vec_id", "embedding", assign(F.col("embedding")).alias("a")
    ).select("vec_id", "embedding", "a.cells", "a.codes")
    corpus = indexed.select(
        "vec_id", F.col("cells").getItem(0).alias("ccell"),
        F.posexplode("codes").alias("m", "code"),
    )
    qprobe = (
        indexed.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode("cells").alias("ccell"),
        )
    )
    # query fixed-point vector (JVM-side HOF; floor of an exact
    # power-of-two scaling — bit-identical to the oracle's floor)
    q = t.embeddings.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * float(_ADC_FX))
            .cast("long"),
        ).alias("qfx"),
    )

    # per-cell offset <q_fx, cent_fx> and per-(m, code) residual LUT:
    # both against bytes-sized literal tables, built as broadcast joins
    cent_fx_rows = [
        (c, [int(math.floor(v * _ADC_FX)) for v in centroids[c]])
        for c in range(k_cells)
    ]
    centfx = spark.createDataFrame(cent_fx_rows, "cell int, cfx array<long>")
    qc = q.crossJoin(F.broadcast(centfx)).select(
        "query_id",
        F.col("cell").alias("ccell"),
        F.aggregate(
            F.zip_with(F.col("qfx"), F.col("cfx"), lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("qcfx"),
    )
    cb_rows = [
        (m, c, [int(v) for v in books[m][c]])
        for m in range(_PQ_M)
        for c in range(_PQ_K)
    ]
    cb = spark.createDataFrame(cb_rows, "m int, code int, cfx array<long>")
    qd = q.crossJoin(F.broadcast(cb)).select(
        "query_id", "m", "code",
        F.aggregate(
            F.zip_with(
                F.slice(F.col("qfx"), F.col("m") * _PQ_SUBDIM + 1,
                        _PQ_SUBDIM),
                F.col("cfx"),
                lambda x, y: x * y,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("fx"),
    )

    rsums = (
        corpus.join(F.broadcast(qprobe), "ccell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(qd), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("candidate_id"), "ccell")
        .agg(F.sum("fx").cast("bigint").alias("rsum"))
    )
    approx = rsums.join(F.broadcast(qc), ["query_id", "ccell"]).select(
        "query_id", "candidate_id",
        (F.col("rsum") + F.col("qcfx")).alias("afx"),
    )
    aw = W.partitionBy("query_id").orderBy(
        F.desc("afx"), F.asc("candidate_id")
    )
    cand = (
        approx.select(
            "query_id", "candidate_id",
            F.row_number().over(aw).alias("arn"),
        )
        .filter(F.col("arn") <= _PQ_RERANK)
        .drop("arn")
    )
    ce = t.embeddings.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("embedding").alias("ce"),
    )
    qe = q.select("query_id", "qe")
    scored = (
        ce.join(F.broadcast(cand), "candidate_id")
        .join(F.broadcast(qe), "query_id")
        .select(
            "query_id", "candidate_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("candidate_id")
    )
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rk"))
        .filter(F.col("rk") <= TOP_K)
    )


# Exponentially-discounted gain weights: position i (1-based) contributes
# rel_i / 2^(i-1). Every weight and every prefix sum below is an exact
# dyadic rational on denominator 2^7, so grouped sums are order-free and
# the doubles are bit-identical cross-engine with no fixed-point scaffold
# (the ts_ewma_counts rule) — unlike NDCG's 1/log2(i+1), which would put
# a transcendental in a hashed output.
_EDCG_K = 8
_EDCG_W = [1.0 / (1 << i) for i in range(_EDCG_K)]
_EDCG_IDEAL = [0.0] + [
    float(sum(_EDCG_W[: j + 1])) for j in range(_EDCG_K)
]


@register(
    "sim_edcg_eval",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding, label
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ), pairs AS (
            SELECT q.query_id, q.label AS qlabel,
                   c.vec_id AS candidate_id, c.label AS clabel,
                   {_COSINE_SQL} AS sim
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        ), ranked AS (
            SELECT query_id, qlabel, clabel,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, candidate_id
                   ) AS rk
            FROM pairs
        ), per_q AS (
            SELECT query_id, qlabel,
                   CAST(SUM(CASE WHEN clabel = qlabel THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_rel_retrieved,
                   SUM(CASE WHEN clabel = qlabel
                       THEN ([{", ".join(f"CAST({w!r} AS DOUBLE)" for w in _EDCG_W)}])
                            [CAST(rk AS INTEGER)]
                       ELSE 0.0 END) AS edcg
            FROM ranked WHERE rk <= {_EDCG_K}
            GROUP BY query_id, qlabel
        ), lbl AS (
            SELECT label, CAST(count(*) AS BIGINT) AS cnt
            FROM embeddings GROUP BY label
        )
        SELECT p.query_id, p.n_rel_retrieved,
               CAST(edcg AS DOUBLE) AS edcg,
               ([{", ".join(f"CAST({v!r} AS DOUBLE)" for v in _EDCG_IDEAL)}])
                   [CAST(least(l.cnt - 1, {_EDCG_K}) + 1 AS INTEGER)]
                   AS iedcg,
               CASE WHEN ([{", ".join(f"CAST({v!r} AS DOUBLE)" for v in _EDCG_IDEAL)}])
                        [CAST(least(l.cnt - 1, {_EDCG_K}) + 1 AS INTEGER)]
                        > 0
                    THEN CAST(edcg AS DOUBLE)
                         / ([{", ".join(f"CAST({v!r} AS DOUBLE)" for v in _EDCG_IDEAL)}])
                           [CAST(least(l.cnt - 1, {_EDCG_K}) + 1 AS INTEGER)]
                    ELSE 0.0 END AS nedcg
        FROM per_q p JOIN lbl l ON l.label = p.qlabel
    """,
    doc="Retrieval-quality evaluation of exact cosine top-8 against the "
        "label ground truth: per query, the exponentially-discounted "
        "cumulative gain (rel_i / 2^(i-1)), its ideal value given how "
        "many relevant vectors exist in the corpus, and the normalized "
        "ratio — the recall-curve metric of an embedding-search eval "
        "harness. Exactness: every weight and ideal prefix sum is a "
        "dyadic rational on denominator 2^7 (order-free sums, "
        "bit-identical literals in both engines), and nEDCG is ONE "
        "correctly-rounded division of two exact doubles; a query whose "
        "label has no other members zero-guards to 0.0 identically. "
        "Plan: the ranking reuses the broadcast-query brute-force scan "
        "(corpus never shuffles); the gain/ideal stages touch only "
        "10 x 8 ranked rows plus a per-label count.",
    tags=("similarity", "ml"),
)
def sim_edcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.where(F.col("vec_id") < N_QUERIES)
    top = cosine_topk(q, emb, k=_EDCG_K)
    qlab = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    clab = emb.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("label").alias("clabel"),
    )
    wts = F.array(*[F.lit(w) for w in _EDCG_W])
    scored = top.join(qlab, "query_id").join(clab, "candidate_id")
    rel = F.col("clabel") == F.col("qlabel")
    per_q = scored.groupBy("query_id", "qlabel").agg(
        F.sum(F.when(rel, 1).otherwise(0)).alias("n_rel_retrieved"),
        F.sum(
            F.when(rel, F.element_at(wts, F.col("rk").cast("int")))
            .otherwise(F.lit(0.0))
        ).alias("edcg"),
    )
    lbl = emb.groupBy("label").agg(F.count("*").alias("cnt"))
    ideal_arr = F.array(*[F.lit(v) for v in _EDCG_IDEAL])
    joined = per_q.join(
        F.broadcast(lbl), per_q.qlabel == lbl.label
    )
    iedcg = F.element_at(
        ideal_arr,
        (F.least(F.col("cnt") - 1, F.lit(_EDCG_K)) + 1).cast("int"),
    )
    return joined.select(
        "query_id",
        "n_rel_retrieved",
        F.col("edcg").cast("double").alias("edcg"),
        iedcg.alias("iedcg"),
        F.when(iedcg > 0, F.col("edcg").cast("double") / iedcg)
        .otherwise(F.lit(0.0))
        .alias("nedcg"),
    )


def _int8_recall_oracle() -> str:
    return f"""
        WITH mnmx AS MATERIALIZED (
            SELECT dim,
                   min(CAST(x AS DOUBLE)) AS mn,
                   max(CAST(x AS DOUBLE)) AS mx
            FROM (
                SELECT unnest(embedding) AS x,
                       unnest(range(1, {DIM} + 1)) AS dim
                FROM embeddings
            ) GROUP BY dim
        ), codes AS MATERIALIZED (
            SELECT e.vec_id, m.dim,
                   CAST(least(255, floor(
                       (CAST(e.embedding[m.dim] AS DOUBLE) - m.mn)
                       / (CASE WHEN m.mx = m.mn THEN CAST(1 AS DOUBLE)
                               ELSE m.mx - m.mn END)
                       * CAST(256 AS DOUBLE))) AS BIGINT) AS code
            FROM embeddings e, mnmx m
        ), q AS MATERIALIZED (
            SELECT vec_id AS query_id, embedding FROM embeddings
            WHERE vec_id < {N_QUERIES}
        ), qdots AS MATERIALIZED (
            SELECT qc.vec_id AS query_id, cc.vec_id AS candidate_id,
                   CAST(SUM(qc.code * cc.code) AS BIGINT) AS idot
            FROM codes qc
            JOIN codes cc ON cc.dim = qc.dim
                         AND cc.vec_id <> qc.vec_id
            WHERE qc.vec_id < {N_QUERIES}
            GROUP BY 1, 2
        ), int_rank AS MATERIALIZED (
            SELECT query_id, candidate_id FROM (
                SELECT query_id, candidate_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY idot DESC, candidate_id
                       ) AS rk
                FROM qdots
            ) WHERE rk <= {TOP_K}
        ), full_rank AS MATERIALIZED (
            SELECT query_id, candidate_id FROM (
                SELECT q.query_id, c.vec_id AS candidate_id,
                       row_number() OVER (
                           PARTITION BY q.query_id
                           ORDER BY {_COSINE_SQL} DESC, c.vec_id
                       ) AS rk
                FROM q JOIN embeddings c ON c.vec_id <> q.query_id
            ) WHERE rk <= {TOP_K}
        )
        SELECT i.query_id,
               CAST(SUM(CASE WHEN f.candidate_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
               CAST(SUM(CASE WHEN f.candidate_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS DOUBLE) / {TOP_K}
                   AS recall_at_k
        FROM int_rank i
        LEFT JOIN full_rank f USING (query_id, candidate_id)
        GROUP BY i.query_id
    """


@register(
    "sim_int8_recall",
    oracle=_int8_recall_oracle(),
    doc="Scalar-quantization retrieval-quality evaluation — the "
        "measurement that decides whether an int8 index (4x smaller, "
        "SIMD-dottable) may replace the f32 index: rank the corpus by "
        "INTEGER dot product over global-per-dim SQ8 codes "
        "code = min(255, floor((x - mn_d)/(mx_d - mn_d) * 256)) and "
        "report overlap@k against the exact full-precision cosine "
        "ranking per query. The integer dot (<= 64*255^2 per pair) is "
        "order-free and exact, codes are deterministic because min/max "
        "are value PICKS and the quantizer is a fixed IEEE op sequence "
        "with the constant-dimension degeneracy guarded identically; "
        "rankings tie-break on candidate_id. Spark keeps codes as "
        "map-side arrays (two bounded 64-element min/max collects "
        "broadcast as literals); the oracle formulates the same dot "
        "RELATIONALLY (unnest + dim join + grouped sum — the round-4 "
        "rule: never per-row list lambdas over big intermediates).",
    tags=("similarity",),
)
def sim_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # bounded driver state: 64 per-dim (min, max) pairs -> literal arrays
    mnmx_rows = (
        t.embeddings.select(
            F.posexplode(F.col("embedding")).alias("d", "x")
        )
        .groupBy("d")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .collect()
    )
    mn = [0.0] * DIM
    mx = [0.0] * DIM
    for r in mnmx_rows:
        mn[r["d"]] = r["mn"]
        mx[r["d"]] = r["mx"]

    def code_arr(col: F.Column) -> F.Column:
        mn_arr = F.array(*[F.lit(v) for v in mn])
        mx_arr = F.array(*[F.lit(v) for v in mx])
        return F.zip_with(
            F.zip_with(col, mn_arr, lambda x, m: F.struct(
                x.cast("double").alias("x"), m.alias("mn"))),
            mx_arr,
            lambda s, hi: F.least(
                F.lit(255).cast("bigint"),
                F.floor(
                    (s["x"] - s["mn"])
                    / F.when(hi == s["mn"], F.lit(1.0)).otherwise(
                        hi - s["mn"]
                    )
                    * F.lit(256.0)
                ),
            ),
        )

    coded = t.embeddings.select(
        "vec_id", code_arr(F.col("embedding")).alias("codes")
    )
    qc = coded.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("codes").alias("qcodes")
    )
    idot = F.aggregate(
        F.zip_with(F.col("qcodes"), F.col("codes"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("idot"), F.asc("candidate_id")
    )
    int_rank = (
        coded.join(F.broadcast(qc), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("candidate_id"),
            idot.alias("idot"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "candidate_id")
    )
    queries = t.embeddings.filter(F.col("vec_id") < N_QUERIES)
    full5 = cosine_topk(queries, t.embeddings, TOP_K).select(
        "query_id", "candidate_id", F.lit(1).alias("hit")
    )
    return (
        int_rank.join(F.broadcast(full5), ["query_id", "candidate_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_overlap")
        )
        .select(
            "query_id",
            "n_overlap",
            (F.col("n_overlap").cast("double") / TOP_K).alias("recall_at_k"),
        )
    )


@register(
    "sim_lsh_recall",
    oracle=f"""
        WITH lsh AS ({_ann_lsh_oracle()}),
        full_rank AS (
            SELECT query_id, candidate_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_cosine_sql("q", "c")} DESC, c.vec_id
                       ) AS rk
                FROM embeddings q
                JOIN embeddings c ON c.vec_id <> q.vec_id
                WHERE q.vec_id < {N_QUERIES}
            ) WHERE rk <= {TOP_K}
        ), counts AS (
            SELECT l.query_id,
                   CAST(count(*) AS BIGINT) AS n_returned,
                   CAST(SUM(CASE WHEN f.candidate_id IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
            FROM lsh l
            LEFT JOIN full_rank f USING (query_id, candidate_id)
            GROUP BY l.query_id
        )
        SELECT q.vec_id AS query_id,
               COALESCE(c.n_returned, 0) AS n_returned,
               COALESCE(c.n_overlap, 0) AS n_overlap,
               CAST(COALESCE(c.n_overlap, 0) AS DOUBLE) / {TOP_K}
                   AS recall_at_k
        FROM (SELECT vec_id FROM embeddings
              WHERE vec_id < {N_QUERIES}) q
        LEFT JOIN counts c ON c.query_id = q.vec_id
    """,
    doc="LSH index quality audit: recall@k of sim_ann_lsh's bucketed "
        "candidates-then-rerank result against the exact brute-force "
        "cosine top-k, per query — the measurement that tunes "
        "tables x bits before an index ships (completing the ANN-eval "
        "triple: matryoshka widths, int8 codes, and now the LSH index "
        "itself). Queries whose buckets return fewer than k candidates "
        "surface with n_returned < k instead of silently inflating "
        "recall. Both sides are already hash-deterministic (fixed-point "
        "hyperplane signs, round-6 rerank, id tie-breaks), so the "
        "composition inherits exactness; the oracle nests the identical "
        "LSH SQL as a CTE.",
    tags=("similarity",),
)
def sim_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    lsh = sim_ann_lsh(spark, sf_dir).select("query_id", "candidate_id")
    queries = t.embeddings.filter(F.col("vec_id") < N_QUERIES)
    full5 = cosine_topk(queries, t.embeddings, TOP_K).select(
        "query_id", "candidate_id", F.lit(1).alias("hit")
    )
    counts = (
        lsh.join(F.broadcast(full5), ["query_id", "candidate_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_returned"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_overlap"),
        )
    )
    return (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(counts, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_returned", F.lit(0)).alias("n_returned"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (
                F.coalesce("n_overlap", F.lit(0)).cast("double") / TOP_K
            ).alias("recall_at_k"),
        )
    )


@register(
    "sim_pq_recall",
    oracle=f"""
        WITH pq AS ({_pq_oracle()}),
        full_rank AS (
            SELECT query_id, candidate_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_cosine_sql("q", "c")} DESC, c.vec_id
                       ) AS rk
                FROM embeddings q
                JOIN embeddings c ON c.vec_id <> q.vec_id
                WHERE q.vec_id < {N_QUERIES}
            ) WHERE rk <= {TOP_K}
        ), counts AS (
            SELECT p.query_id,
                   CAST(count(*) AS BIGINT) AS n_returned,
                   CAST(SUM(CASE WHEN f.candidate_id IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
            FROM pq p
            LEFT JOIN full_rank f USING (query_id, candidate_id)
            GROUP BY p.query_id
        )
        SELECT q.vec_id AS query_id,
               COALESCE(c.n_returned, 0) AS n_returned,
               COALESCE(c.n_overlap, 0) AS n_overlap,
               CAST(COALESCE(c.n_overlap, 0) AS DOUBLE) / {TOP_K}
                   AS recall_at_k
        FROM (SELECT vec_id FROM embeddings
              WHERE vec_id < {N_QUERIES}) q
        LEFT JOIN counts c ON c.query_id = q.vec_id
    """,
    doc="PQ index quality audit: recall@k of sim_ann_pq's ADC-scan-"
        "then-rerank result against the exact brute-force cosine top-k "
        "per query — closing the ANN-eval QUADRUPLE (matryoshka widths, "
        "int8 codes, LSH tables, and now the product quantizer), so "
        "every approximate index in the engine ships with its accuracy "
        "measurement as a first-class oracled query. Composition "
        "inherits exactness from the deterministic codebooks and "
        "round-6 rerank; the oracle nests the full PQ-training replay "
        "SQL as a CTE.",
    tags=("similarity",),
)
def sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    pq = sim_ann_pq(spark, sf_dir).select("query_id", "candidate_id")
    queries = t.embeddings.filter(F.col("vec_id") < N_QUERIES)
    full5 = cosine_topk(queries, t.embeddings, TOP_K).select(
        "query_id", "candidate_id", F.lit(1).alias("hit")
    )
    counts = (
        pq.join(F.broadcast(full5), ["query_id", "candidate_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_returned"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_overlap"),
        )
    )
    return (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(counts, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_returned", F.lit(0)).alias("n_returned"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (
                F.coalesce("n_overlap", F.lit(0)).cast("double") / TOP_K
            ).alias("recall_at_k"),
        )
    )
