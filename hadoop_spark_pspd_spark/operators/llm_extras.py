"""Serving- and training-efficiency operators for an LLM data platform.

Five operator families the reference has no analog for (its surface is
WordCount-class; cluster/tools/run_fault_tests.py:26-30) but a 100 TB
training/serving pipeline runs daily:

- prefix-cache audit (sim_prefix_cache): the KV-cache hit-rate estimate
  a serving fleet uses to size prefix caches (vLLM/SGLang-style
  automatic prefix caching).
- Bradley-Terry preference strength (ml_bradley_terry): the MM
  estimator behind reward-model / arena-style pairwise rankings
  (Bradley & Terry 1952; Hunter 2004 MM), in exact integer fixed point
  so it hash-matches an unrolled DuckDB replay.
- cross-source contamination matrix (text_source_overlap): pairwise
  4-gram Jaccard between corpus sources, the "did these two crawls
  overlap" report run before mixing sources.
- length-grouped batching audit (text_length_batching): padding-waste
  comparison of arrival-order vs sorted-by-length batch packing
  (the dynamic-batching question every trainer answers).
- Johnson-Lindenstrauss projection distortion (sim_random_projection_jl):
  +/-1 sign projection (Achlioptas 2003) 64d -> 16d with the norm-
  preservation histogram that validates the projection before an ANN
  index reuses it.

Every query is DuckDB-oracled via the repo's exact-arithmetic
conventions (md5 sign/hash bridges, integer `div` == `//`, power-of-two
scale factors, guarded divisions identical in both engines).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import Tables
from ..functions.text import tokens, word_shingles
from ..registry import register

_TOK_SQL = (
    "list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), "
    "x -> x <> '')"
)

# ---------------------------------------------------------------- prefix cache

_PC_DEPTHS = (2, 4, 8)  # prefix lengths (tokens) to audit


@register(
    "sim_prefix_cache",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, {_TOK_SQL} AS w FROM documents
        ), p AS (
            SELECT d.depth,
                   array_to_string(list_slice(w.w, 1, d.depth), ' ')
                       AS prefix
            FROM w, (SELECT unnest([{", ".join(str(d) for d in _PC_DEPTHS)}])
                         AS depth) d
            WHERE len(w.w) >= d.depth
        ), g AS (
            SELECT depth, prefix, count(*) AS cnt
            FROM p GROUP BY 1, 2
        )
        SELECT CAST(depth AS INTEGER) AS depth,
               CAST(SUM(cnt) AS BIGINT) AS n_prompts,
               CAST(count(*) AS BIGINT) AS n_prefixes,
               CAST(SUM(cnt) - count(*) AS BIGINT) AS n_cached,
               CAST(max(cnt) AS BIGINT) AS max_share,
               CAST((SUM(cnt) - count(*)) * depth AS BIGINT)
                   AS tokens_saved,
               CAST(SUM(cnt) - count(*) AS DOUBLE)
                   / CAST(SUM(cnt) AS DOUBLE) AS hit_rate
        FROM g GROUP BY depth
    """,
    doc="Prefix-cache hit-rate audit — the sizing estimate for "
        "KV-cache prefix reuse in an LLM serving fleet (automatic "
        "prefix caching: a request whose first d tokens match an "
        "earlier request's reuses that prefix's KV blocks). Treating "
        "each document as a prompt, for depths d in (2, 4, 8): group "
        "prompts by their exact d-token prefix; every prompt beyond "
        "the first in a group is a cache hit. Emits per depth the "
        "prompt count, distinct-prefix count, hit count, largest "
        "shared-prefix cohort, tokens saved (hits * d) and the hit "
        "rate (exact-double / integer). Plan: one map-side prefix "
        "projection (explode over 3 constant depths), one "
        "(depth, prefix) group-by with map-side combine, one bounded "
        "3-row rollup — no window, no join; at 100 TB the prefix "
        "group-by is the only shuffle and its key space shrinks with "
        "prompt diversity.",
    tags=("similarity", "serving"),
)
def sim_prefix_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.documents.select("doc_id", tokens("text").alias("w"))
    pref = (
        base.select(
            "w",
            F.explode(
                F.array(*[F.lit(d) for d in _PC_DEPTHS])
            ).alias("depth"),
        )
        .where(F.size("w") >= F.col("depth"))
        .select(
            "depth",
            F.concat_ws(
                " ", F.slice("w", F.lit(1), F.col("depth"))
            ).alias("prefix"),
        )
    )
    g = pref.groupBy("depth", "prefix").agg(F.count("*").alias("cnt"))
    agg = g.groupBy(F.col("depth").cast("int").alias("depth")).agg(
        F.sum("cnt").cast("bigint").alias("n_prompts"),
        F.count("*").cast("bigint").alias("n_prefixes"),
        F.max("cnt").cast("bigint").alias("max_share"),
    )
    cached = F.col("n_prompts") - F.col("n_prefixes")
    return agg.select(
        "depth",
        "n_prompts",
        "n_prefixes",
        cached.alias("n_cached"),
        "max_share",
        (cached * F.col("depth").cast("bigint")).alias("tokens_saved"),
        (cached.cast("double") / F.col("n_prompts").cast("double")).alias(
            "hit_rate"
        ),
    )


# ---------------------------------------------------------------- Bradley-Terry

_BT_ITERS = 3          # unrolled MM iterations
_BT_CQ = 1 << 16       # count-quantization grid (scale-invariance of BT)
_BT_S0 = 1 << 20       # initial strength (fixed-point units 2^-20)
_BT_FP = 1 << 40       # per-step fixed-point scale
_BT_SMAX = 1 << 40     # strength clamp ceiling


def _bt_oracle() -> str:
    steps = []
    for i in range(_BT_ITERS):
        # every iteration MATERIALIZED: DuckDB inlines single-reference
        # CTEs and would re-expand the prefix per reference (the
        # round-4 unrolled-CTE trap)
        steps.append(f"""
        , t{i} AS MATERIALIZED (
            SELECT m.src AS nat,
                   CAST(SUM((m.nq * {_BT_FP}) // (si.s + sj.s))
                        AS BIGINT) AS t
            FROM m
            JOIN s{i} si ON m.src = si.nat
            JOIN s{i} sj ON m.dst = sj.nat
            GROUP BY 1
        ), s{i + 1} AS MATERIALIZED (
            SELECT w.nat,
                   least(greatest((w.wq * {_BT_FP})
                                  // greatest(t{i}.t, 1), 1),
                         {_BT_SMAX}) AS s
            FROM wq w JOIN t{i} ON w.nat = t{i}.nat
        )""")
    return f"""
        WITH sn AS (
            SELECT s.s_suppkey, n.n_name AS nat
            FROM supplier s JOIN nation n
              ON s.s_nationkey = n.n_nationkey
        ), li AS MATERIALIZED (
            SELECT l.l_orderkey, l.l_linenumber, sn.nat,
                   l.l_quantity AS qty
            FROM lineitem l JOIN sn ON l.l_suppkey = sn.s_suppkey
        ), wins AS MATERIALIZED (
            SELECT CASE WHEN a.qty > b.qty THEN a.nat ELSE b.nat END
                       AS wnat,
                   CASE WHEN a.qty > b.qty THEN b.nat ELSE a.nat END
                       AS lnat,
                   count(*) AS w
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_linenumber < b.l_linenumber
            WHERE a.nat <> b.nat AND a.qty <> b.qty
            GROUP BY 1, 2
        ), tot AS (
            SELECT CAST(SUM(w) AS BIGINT) AS nt FROM wins
        ), m AS MATERIALIZED (
            SELECT src, dst,
                   (CAST(SUM(w) AS BIGINT) * {_BT_CQ})
                       // (SELECT nt FROM tot) AS nq
            FROM (
                SELECT wnat AS src, lnat AS dst, w FROM wins
                UNION ALL
                SELECT lnat, wnat, w FROM wins
            ) GROUP BY 1, 2
        ), nodes AS (
            SELECT DISTINCT src AS nat FROM m
        ), wq AS (
            SELECT nodes.nat,
                   coalesce((SELECT (CAST(SUM(w) AS BIGINT) * {_BT_CQ})
                                 // (SELECT nt FROM tot)
                             FROM wins WHERE wins.wnat = nodes.nat),
                            0) AS wq
            FROM nodes
        ), s0 AS (
            SELECT nat, CAST({_BT_S0} AS BIGINT) AS s FROM nodes
        ){"".join(steps)}
        , mq AS (
            SELECT src AS nat, CAST(SUM(nq) AS BIGINT) AS mq
            FROM m GROUP BY 1
        )
        SELECT s.nat AS nation,
               CAST(w.wq AS BIGINT) AS wins_q,
               mq.mq AS matches_q,
               CAST(s.s AS BIGINT) AS strength,
               CAST(row_number() OVER (ORDER BY s.s DESC, s.nat)
                    AS INTEGER) AS rk
        FROM s{_BT_ITERS} s
        JOIN wq w ON s.nat = w.nat
        JOIN mq ON s.nat = mq.nat
    """


@register(
    "ml_bradley_terry",
    oracle=_bt_oracle(),
    doc="Bradley-Terry preference-strength estimation — the model "
        "behind reward-model training data audits and arena-style "
        "pairwise rankings (Bradley & Terry 1952; Hunter 2004 MM "
        "algorithm). Matches: within each order, every lineitem pair "
        "from two different supplier nations is a comparison won by "
        "the larger l_quantity (ties skipped). The distributed part is "
        "the per-order pairwise self-join + (winner, loser) count "
        "aggregation; the 25x25 nation match matrix is DIMENSION-"
        "bounded, so the 3 MM iterations fold on the driver (the "
        "repo's bounded-collect precedent: vocab top-2000, Gram "
        "partials). Exactness: counts are quantized once to a 2^16 "
        "grid over the total (BT is scale-invariant in the counts), "
        "each MM step is pure integer arithmetic — terms "
        "(nq * 2^40) div (S_i + S_j) summed as ints (order-free), "
        "S' = (Wq * 2^40) div max(T, 1) clamped to [1, 2^40] — so "
        "Python's // replays bit-identically as DuckDB's // across "
        "3 unrolled MATERIALIZED CTE iterations. All intermediates "
        "< 2^61, no doubles anywhere.",
    tags=("ml", "stats"),
)
def ml_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    sup_nat = t.supplier.join(
        t.nation, t.supplier.s_nationkey == t.nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nat"))
    li = (
        t.lineitem.select(
            "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity"
        )
        .join(F.broadcast(sup_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "nat",
            F.col("l_quantity").alias("qty"),
        )
    )
    a, b = li.alias("a"), li.alias("b")
    wins = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
        )
        .where(
            (F.col("a.nat") != F.col("b.nat"))
            & (F.col("a.qty") != F.col("b.qty"))
        )
        .select(
            F.when(F.col("a.qty") > F.col("b.qty"), F.col("a.nat"))
            .otherwise(F.col("b.nat"))
            .alias("wnat"),
            F.when(F.col("a.qty") > F.col("b.qty"), F.col("b.nat"))
            .otherwise(F.col("a.nat"))
            .alias("lnat"),
        )
        .groupBy("wnat", "lnat")
        .agg(F.count("*").alias("w"))
    )
    # nation-dimension-bounded collect (<= 25*24 rows)
    rows = wins.collect()
    n_tot = sum(r["w"] for r in rows)
    nodes = sorted({r["wnat"] for r in rows} | {r["lnat"] for r in rows})
    if not rows or n_tot == 0:
        return spark.createDataFrame(
            [],
            "nation string, wins_q long, matches_q long, "
            "strength long, rk int",
        )
    w_raw = {n: 0 for n in nodes}
    n_dir: dict[tuple[str, str], int] = {}
    for r in rows:
        w_raw[r["wnat"]] += r["w"]
        n_dir[(r["wnat"], r["lnat"])] = (
            n_dir.get((r["wnat"], r["lnat"]), 0) + r["w"]
        )
        n_dir[(r["lnat"], r["wnat"])] = (
            n_dir.get((r["lnat"], r["wnat"]), 0) + r["w"]
        )
    wq = {n: (w_raw[n] * _BT_CQ) // n_tot for n in nodes}
    nq = {k: (v * _BT_CQ) // n_tot for k, v in n_dir.items()}
    s = {n: _BT_S0 for n in nodes}
    for _ in range(_BT_ITERS):
        t_acc = {
            i: sum(
                (nq[(i, j)] * _BT_FP) // (s[i] + s[j])
                for j in nodes
                if (i, j) in nq
            )
            for i in nodes
        }
        s = {
            i: min(max((wq[i] * _BT_FP) // max(t_acc[i], 1), 1), _BT_SMAX)
            for i in nodes
        }
    mq = {
        n: sum(v for (i, _j), v in nq.items() if i == n) for n in nodes
    }
    ranked = sorted(nodes, key=lambda n: (-s[n], n))
    out = [
        (n, wq[n], mq[n], s[n], rk + 1) for rk, n in enumerate(ranked)
    ]
    return spark.createDataFrame(
        out,
        "nation string, wins_q long, matches_q long, strength long, rk int",
    )


# ---------------------------------------------------------------- source overlap

_SO_N = 4  # contamination shingle width


@register(
    "text_source_overlap",
    oracle=f"""
        WITH w AS (
            SELECT source, {_TOK_SQL} AS w FROM documents
        ), sh AS MATERIALIZED (
            SELECT DISTINCT source, g FROM (
                SELECT source,
                       unnest(list_transform(
                           range(1, greatest(len(w) - {_SO_N - 1}, 0) + 1),
                           i -> array_to_string(w[i:i+{_SO_N - 1}], ' ')))
                           AS g
                FROM w
            )
        ), per AS (
            SELECT source, CAST(count(*) AS BIGINT) AS ng
            FROM sh GROUP BY 1
        ), pr AS (
            SELECT a.source AS s1, b.source AS s2,
                   CAST(count(*) AS BIGINT) AS shared
            FROM sh a JOIN sh b
              ON a.g = b.g AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT pr.s1, pr.s2,
               p1.ng AS grams_s1, p2.ng AS grams_s2, pr.shared,
               CAST(pr.shared AS DOUBLE)
                   / CAST(p1.ng + p2.ng - pr.shared AS DOUBLE) AS jaccard
        FROM pr
        JOIN per p1 ON pr.s1 = p1.source
        JOIN per p2 ON pr.s2 = p2.source
    """,
    doc="Cross-source contamination matrix — pairwise word-4-gram "
        "Jaccard between every pair of corpus sources, the 'do these "
        "two crawls overlap' report run before fixing mixture weights "
        "(the source-level companion of text_decontaminate's corpus-"
        "vs-benchmark check). Distinct (source, 4-gram) set via HOF "
        "shingling, per-source set sizes, then a gram equi-join whose "
        "per-gram fanout is bounded by the SOURCE dimension (<= "
        "C(20,2) pairs per gram), never by corpus size. Pairs with "
        "zero shared grams are absent (identical in both engines). "
        "Jaccard = shared / (|A| + |B| - shared), exact ints into one "
        "double division. One shuffle on the gram key at any scale.",
    tags=("text", "curation"),
)
def text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # lazy localCheckpoint: the distinct gram set feeds FOUR consumers
    # (both self-join sides + two per-source count branches) whose
    # projections differ, so Catalyst plans four independent corpus
    # scans (8 FileScans observed) with no exchange reuse — pin the set
    # to one materialized RDD so the corpus is tokenized exactly once
    sh = (
        t.documents.select(
            "source",
            F.explode(word_shingles(tokens("text"), _SO_N)).alias("g"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    per = sh.groupBy("source").agg(F.count("*").cast("bigint").alias("ng"))
    # per-gram source-set expansion instead of the gram self-join (the
    # basket-pair pattern, ml_data._basket_pair_counts): sources are a
    # bounded dimension (<=45 ordered pairs per gram), so one groupBy(g)
    # + a map-side pair explode emits exactly the self-join's
    # (a.g == b.g AND a.source < b.source) rows while shuffling the
    # gram table once instead of twice-plus-join
    pair_arr = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x: F.transform(
                F.filter(F.col("ss"), lambda y: x < y),
                lambda y: F.struct(x.alias("s1"), y.alias("s2")),
            ),
        )
    )
    pr = (
        sh.groupBy("g")
        .agg(F.collect_set("source").alias("ss"))
        .select(F.explode(pair_arr).alias("p"))
        .select("p.s1", "p.s2")
        .groupBy("s1", "s2")
        .agg(F.count("*").cast("bigint").alias("shared"))
    )
    p1 = per.select(F.col("source").alias("s1"), F.col("ng").alias("grams_s1"))
    p2 = per.select(F.col("source").alias("s2"), F.col("ng").alias("grams_s2"))
    return (
        pr.join(F.broadcast(p1), "s1")
        .join(F.broadcast(p2), "s2")
        .select(
            "s1",
            "s2",
            "grams_s1",
            "grams_s2",
            "shared",
            (
                F.col("shared").cast("double")
                / (
                    F.col("grams_s1") + F.col("grams_s2") - F.col("shared")
                ).cast("double")
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------- length batching

_LB_B = 32  # batch size (requests per training batch)


@register(
    "text_length_batching",
    oracle=f"""
        WITH toks AS (
            SELECT source, doc_id,
                   CAST(len({_TOK_SQL}) AS BIGINT) AS n_tok
            FROM documents
        ), nz AS (
            SELECT * FROM toks WHERE n_tok >= 1
        ), assigned AS (
            SELECT source, n_tok,
                   (row_number() OVER (PARTITION BY source
                                       ORDER BY doc_id) - 1)
                       // {_LB_B} AS batch_a,
                   (row_number() OVER (PARTITION BY source
                                       ORDER BY n_tok, doc_id) - 1)
                       // {_LB_B} AS batch_s
            FROM nz
        ), pa AS (
            SELECT source,
                   CAST(SUM(mx * c - st) AS BIGINT) AS pad
            FROM (SELECT source, batch_a, max(n_tok) AS mx,
                         count(*) AS c, SUM(n_tok) AS st
                  FROM assigned GROUP BY 1, 2)
            GROUP BY 1
        ), ps AS (
            SELECT source,
                   CAST(SUM(mx * c - st) AS BIGINT) AS pad
            FROM (SELECT source, batch_s, max(n_tok) AS mx,
                         count(*) AS c, SUM(n_tok) AS st
                  FROM assigned GROUP BY 1, 2)
            GROUP BY 1
        ), base AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tok) AS BIGINT) AS total_tokens
            FROM nz GROUP BY 1
        )
        SELECT base.source, base.n_docs, base.total_tokens,
               pa.pad AS pad_arrival, ps.pad AS pad_sorted,
               CAST(pa.pad - ps.pad AS DOUBLE)
                   / CAST(CASE WHEN pa.pad = 0 THEN 1 ELSE pa.pad END
                          AS DOUBLE) AS savings
        FROM base
        JOIN pa ON base.source = pa.source
        JOIN ps ON base.source = ps.source
    """,
    doc=f"Length-grouped batching audit — the padding-waste comparison "
        f"that justifies sorted (length-grouped) batching in a training "
        f"or batch-inference loader: per source shard, docs are packed "
        f"into {_LB_B}-request batches in arrival (doc_id) order vs "
        f"sorted-by-length order, and each batch pads every sequence "
        f"to its max length. Emits per source the doc/token mass, both "
        f"padding-token totals, and the fractional savings (guarded "
        f"division, identical CASE in both engines). Windows are "
        f"PARTITIONED by the source shard — at 100 TB each shard "
        f"batches independently, exactly how multi-shard loaders work; "
        f"no global order exists anywhere. Zero-token docs are dropped "
        f"before ranking so row_number streams align cross-engine.",
    tags=("text", "curation"),
)
def text_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # lazy localCheckpoint AFTER dropping text: three consumers (base
    # counts + two window branches) would each re-scan and re-tokenize
    # the corpus (6 FileScans observed); the pinned RDD is 3 narrow
    # columns, so the corpus is read once
    nz = (
        t.documents.select(
            "source",
            "doc_id",
            F.size(tokens("text")).cast("bigint").alias("n_tok"),
        )
        .where(F.col("n_tok") >= 1)
        .localCheckpoint(eager=False)
    )
    w_a = W.partitionBy("source").orderBy("doc_id")
    w_s = W.partitionBy("source").orderBy("n_tok", "doc_id")
    # power-of-two batch size: (rn-1)/B is an exact double division, so
    # floor is the true integer quotient (round-6 rule 6)
    assigned = nz.select(
        "source",
        "n_tok",
        F.floor((F.row_number().over(w_a) - 1) / F.lit(float(_LB_B)))
        .cast("bigint")
        .alias("batch_a"),
        F.floor((F.row_number().over(w_s) - 1) / F.lit(float(_LB_B)))
        .cast("bigint")
        .alias("batch_s"),
    )

    def pad_of(batch_col: str, name: str) -> DataFrame:
        return (
            assigned.groupBy("source", batch_col)
            .agg(
                F.max("n_tok").alias("mx"),
                F.count("*").alias("c"),
                F.sum("n_tok").alias("st"),
            )
            .groupBy("source")
            .agg(
                F.sum(F.col("mx") * F.col("c") - F.col("st"))
                .cast("bigint")
                .alias(name)
            )
        )

    base = nz.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
    )
    pa = pad_of("batch_a", "pad_arrival")
    ps = pad_of("batch_s", "pad_sorted")
    denom = F.when(F.col("pad_arrival") == 0, F.lit(1)).otherwise(
        F.col("pad_arrival")
    )
    return (
        base.join(pa, "source")
        .join(ps, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "pad_arrival",
            "pad_sorted",
            (
                (F.col("pad_arrival") - F.col("pad_sorted")).cast("double")
                / denom.cast("double")
            ).alias("savings"),
        )
    )


# ---------------------------------------------------------------- JL projection

_JL_DIN = 64
_JL_DOUT = 16
_JL_Q = 1 << 20  # power-of-two quantization grid: float*2^20 is exact


def _jl_sign(j: int, k: int) -> int:
    """Deterministic +/-1 from md5 parity — identical constants feed the
    numpy kernel and the oracle's literal VALUES table."""
    h = hashlib.md5(f"{j}:{k}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


_JL_SIGNS = [
    [_jl_sign(j, k) for k in range(_JL_DIN)] for j in range(_JL_DOUT)
]


def _jl_oracle() -> str:
    vals = ", ".join(
        f"({j}, {k + 1}, {_JL_SIGNS[j][k]})"
        for j in range(_JL_DOUT)
        for k in range(_JL_DIN)
    )
    return f"""
        WITH s(j, k, sgn) AS (
            VALUES {vals}
        ), q AS MATERIALIZED (
            SELECT e.vec_id, kk.k,
                   CAST(floor(CAST(e.embedding[kk.k] AS DOUBLE)
                              * {float(_JL_Q)}) AS BIGINT) AS q
            FROM embeddings e,
                 (SELECT unnest(range(1, {_JL_DIN + 1})) AS k) kk
            WHERE len(e.embedding) = {_JL_DIN}
        ), p AS MATERIALIZED (
            SELECT q.vec_id, s.j,
                   CAST(SUM(s.sgn * q.q) AS BIGINT) AS p
            FROM q JOIN s ON q.k = s.k
            GROUP BY 1, 2
        ), sp AS (
            SELECT vec_id, CAST(SUM(p * p) AS BIGINT) AS sp
            FROM p GROUP BY 1
        ), sq AS (
            SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS sq
            FROM q GROUP BY 1
        ), b AS (
            SELECT sp.vec_id,
                   ({_JL_DOUT * 2} * sp.sp)
                       // greatest({_JL_DOUT} * sq.sq, 1) AS bucket
            FROM sp JOIN sq ON sp.vec_id = sq.vec_id
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(min(vec_id) AS BIGINT) AS min_vec,
               CAST(max(vec_id) AS BIGINT) AS max_vec
        FROM b GROUP BY 1
    """


@register(
    "sim_random_projection_jl",
    oracle=_jl_oracle(),
    doc=f"Johnson-Lindenstrauss +/-1 sign projection (Achlioptas 2003) "
        f"{_JL_DIN}d -> {_JL_DOUT}d with the norm-preservation "
        f"distortion histogram that validates the projection before an "
        f"ANN index adopts it (E[|Px|^2] = d_out * |x|^2 for sign "
        f"matrices; norm preservation extends to pairwise distances by "
        f"linearity on differences). Exact cross-engine: embeddings "
        f"quantize to the 2^20 integer grid (float -> double is exact, "
        f"* 2^20 is a power-of-two scale, floor is exact), the "
        f"projection is an integer matmul against md5-derived +/-1 "
        f"signs shared verbatim by the numpy closure and the oracle's "
        f"literal VALUES table (round-4 relational-weight-table "
        f"recipe), and the distortion bucket floor(2 * d_out * |Px|^2 "
        f"/ (d_out * |x|^2) * ... ) is one exact integer division "
        f"(bucket 32 = ratio 1.0). Spark side is one Arrow-batched "
        f"mapInPandas int64 matmul (all magnitudes < 2^61) + a bounded "
        f"histogram group-by — embarrassingly parallel; the oracle "
        f"side is fully relational (unnest + sign join + grouped "
        f"sums), never a per-row list lambda.",
    tags=("similarity",),
)
def sim_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    t = Tables(spark, sf_dir)

    def kern(batches):
        signs = np.array(_JL_SIGNS, dtype=np.int64)  # d_out x d_in
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {
                        "vec_id": pd.Series([], dtype="int64"),
                        "bucket": pd.Series([], dtype="int64"),
                    }
                )
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.floor(v * float(_JL_Q)).astype(np.int64)
            p = q @ signs.T
            sp = (p * p).sum(axis=1)
            sq = (q * q).sum(axis=1)
            bucket = (2 * _JL_DOUT * sp) // np.maximum(_JL_DOUT * sq, 1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "bucket": pd.Series(bucket, dtype="int64"),
                }
            )

    # ragged vectors would crash np.stack while the oracle's embedding[k]
    # silently NULLs — define the behavior identically: project only
    # exactly-_JL_DIN-dimensional vectors in BOTH engines
    per_vec = (
        t.embeddings.select("vec_id", "embedding")
        .where(F.size("embedding") == _JL_DIN)
        .mapInPandas(kern, "vec_id long, bucket long")
    )
    return per_vec.groupBy("bucket").agg(
        F.count("*").alias("n_vecs"),
        F.min("vec_id").alias("min_vec"),
        F.max("vec_id").alias("max_vec"),
    )
