"""Batch inference over the documents table via Pandas UDF.

The assignment spec's optional extension (docs/PSPD_LabHadoopSpark.pdf
p.2-3: neural models, e.g. sentiment analysis, over the stream) mapped to
the engine's Arrow-vectorized inference path (SURVEY §2.11). No model libs
in this container, so the "model" is a deterministic lexicon scorer — the
pipeline shape (pandas_udf, Arrow batches, no per-row py4j) is the real
deliverable, and the lexicon math keeps it oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..catalog import Tables
from ..registry import register
from .relational import dec

POSITIVE = ("fast", "big", "value")
NEGATIVE = ("slow", "small", "filter")

_SQL_TOKENS = "list_filter(string_split_regex(text, '[ \\t\\n\\r\\f]+'), x -> x <> '')"


def _sql_hits(words: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(w, x -> x IN ({in_list})))"


@F.pandas_udf(DoubleType())
def sentiment_score(texts: pd.Series) -> pd.Series:
    """Lexicon 'model': (pos_hits - neg_hits) / n_tokens per document.
    Stands in for real batch inference (same Arrow-batched call shape a
    transformer scorer would use)."""
    pos, neg = set(POSITIVE), set(NEGATIVE)

    def score(text: str) -> float:
        toks = [t for t in text.split() if t]
        if not toks:
            return 0.0
        p = sum(t in pos for t in toks)
        n = sum(t in neg for t in toks)
        return (p - n) / len(toks)

    return texts.map(score)


@register(
    "infer_sentiment",
    oracle=f"""
        SELECT doc_id,
               CAST({_sql_hits(POSITIVE)} - {_sql_hits(NEGATIVE)} AS DOUBLE)
                   / len(w) AS score,
               CASE WHEN {_sql_hits(POSITIVE)} > {_sql_hits(NEGATIVE)}
                        THEN 'positive'
                    WHEN {_sql_hits(POSITIVE)} < {_sql_hits(NEGATIVE)}
                        THEN 'negative'
                    ELSE 'neutral' END AS label
        FROM (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents)
        WHERE len(w) > 0
    """,
    doc="Pandas-UDF batch inference (lexicon sentiment stand-in for the "
        "spec's neural-model extension). Arrow-vectorized; one Python "
        "round-trip per batch, not per row.",
)
def infer_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    scored = t.documents.select(
        "doc_id", sentiment_score(F.col("text")).alias("score")
    ).filter(F.length(F.trim("text")) > 0)
    label = (
        F.when(F.col("score") > 0, "positive")
        .when(F.col("score") < 0, "negative")
        .otherwise("neutral")
    )
    return scored.select("doc_id", "score", label.alias("label"))


# deterministic 1-in-4 user sample in BOTH engines: the cogroup surface
# is per-group, so the full dimension only multiplied the 1-row-pandas-
# frame-per-group overhead (19.5 s of the sf0.1 sweep)
_PROFILE_ORACLE = """
    SELECT user_id,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.total_spend, 0.0) AS total_spend,
           COALESCE(e.n_events, 0) AS n_events
    FROM (SELECT DISTINCT user_id FROM (
              SELECT o_custkey AS user_id FROM orders
              WHERE o_custkey % 4 = 1
              UNION ALL SELECT user_id FROM events
              WHERE user_id % 4 = 1))
    LEFT JOIN (
        SELECT o_custkey AS user_id, count(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                         AS VARCHAR) AS DOUBLE) AS total_spend
        FROM orders WHERE o_custkey % 4 = 1 GROUP BY 1) o USING (user_id)
    LEFT JOIN (
        SELECT user_id, count(*) AS n_events
        FROM events WHERE user_id % 4 = 1 GROUP BY 1) e USING (user_id)
"""


@register(
    "q_cogroup_profile",
    oracle=_PROFILE_ORACLE,
    doc="Grouped COGROUP over two tables (SURVEY §2.11, the remaining "
        "pandas-API surface): orders and events cogrouped per customer "
        "key into one Arrow-batched pandas function that sees BOTH "
        "groups side by side - the per-key merge pattern (feature "
        "assembly, reconciliation) that a join + two aggs can't express "
        "when the merge logic is imperative. Here the merge IS two aggs, "
        "so the full-outer-join SQL oracles it exactly (decimal spend, "
        "int counts).",
)
def q_cogroup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    orders = t.orders.where(F.col("o_custkey") % 4 == 1).select(
        F.col("o_custkey").alias("user_id"),
        dec("o_totalprice").alias("price_dec"),
    )
    events = t.events.where(F.col("user_id") % 4 == 1).select("user_id")
    # cogroup on a user BUCKET, not the raw key: cogroup pays one Python
    # call per key, so per-user grouping made ~N_users pandas calls; the
    # per-user merge happens vectorized inside the bucket instead
    bucket = (F.col("user_id") % 256).alias("bkt")

    def merge(odf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        users = sorted(set(odf["user_id"]).union(edf["user_id"]))
        if not users:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_orders": pd.Series([], dtype="int64"),
                    "total_spend": pd.Series([], dtype="float64"),
                    "n_events": pd.Series([], dtype="int64"),
                }
            )
        # decimal objects survive Arrow -> exact per-user decimal sum,
        # ONE float conversion at the end (same exactness as before)
        n_orders = odf.groupby("user_id").size()
        spend = odf.groupby("user_id")["price_dec"].apply(
            lambda s: float(s.sum())
        )
        n_events = edf.groupby("user_id").size()
        out = pd.DataFrame({"user_id": pd.Series(users, dtype="int64")})
        out["n_orders"] = (
            out["user_id"].map(n_orders).fillna(0).astype("int64")
        )
        out["total_spend"] = (
            out["user_id"].map(spend).fillna(0.0).astype("float64")
        )
        out["n_events"] = (
            out["user_id"].map(n_events).fillna(0).astype("int64")
        )
        return out

    return (
        orders.groupBy(bucket)
        .cogroup(events.groupBy(bucket))
        .applyInPandas(
            merge,
            schema="user_id bigint, n_orders bigint, total_spend double, "
                   "n_events bigint",
        )
    )


@register(
    "q_user_profile_join",
    oracle=_PROFILE_ORACLE,
    doc="Declarative twin of q_cogroup_profile (VERDICT r5 #4): identical "
        "output as a full-outer join of two pre-aggregated sides — two "
        "map-side-combined shuffles + one key-partitioned join, zero "
        "Python. This is the SCALE path (q_cogroup_profile stays as the "
        "§2.11 cogroup API exercise, now bucket-cogrouped so Python is "
        "called 256 times, not once per user). This plan stays "
        "whole-stage codegen end to end.",
)
def q_user_profile_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # same 1-in-4 user sample as the cogroup twin (shared oracle)
    o = (
        t.orders.where(F.col("o_custkey") % 4 == 1)
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_spend"),
        )
    )
    e = (
        t.events.where(F.col("user_id") % 4 == 1)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return (
        o.join(e, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


from ..functions.text import tokens as _tokens  # noqa: E402

_LM_STOP = ("the", "a", "of", "and", "to", "in")
_LM_W0, _LM_W1, _LM_W2, _LM_W3, _LM_W4 = -1.2, 0.01, 2.0, -0.5, 1.5
_LM_THRESHOLDS = (-0.5, -0.25, 0.0, 0.25, 0.5)

_MARGIN_SQL = f"""
    round(
        CAST({_LM_W0} AS DOUBLE)
        + CAST({_LM_W1} AS DOUBLE) * len(w)
        + CAST({_LM_W2} AS DOUBLE)
            * ({_sql_hits(_LM_STOP)} / len(w))
        + CAST({_LM_W3} AS DOUBLE)
            * (CAST(list_sum(list_transform(w, x -> length(x)))
                    AS BIGINT) / len(w))
        + CAST({_LM_W4} AS DOUBLE)
            * (len(list_distinct(w)) / len(w)),
        6)
"""


def _margin_col() -> F.Column:
    """JVM-side linear-model margin over engineered token features; the
    expression tree mirrors the oracle's left-associated arithmetic so
    the doubles are bit-identical (then round-6 for safety)."""
    w = _tokens(F.col("text"))
    n = F.size(w)
    stop_hits = F.size(F.filter(w, lambda x: x.isin(*_LM_STOP)))
    sumlen = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda a, b: a + b
    )
    dist = F.size(F.array_distinct(w))
    margin = (
        F.lit(_LM_W0)
        + F.lit(_LM_W1) * n
        + F.lit(_LM_W2) * (stop_hits / n)
        + F.lit(_LM_W3) * (sumlen.cast("bigint") / n)
        + F.lit(_LM_W4) * (dist / n)
    )
    return F.round(margin, 6)


@register(
    "infer_linear_margin",
    oracle=f"""
        WITH feat AS (
            SELECT doc_id, lang, {_SQL_TOKENS} AS w FROM documents
        )
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_tokens,
               {_MARGIN_SQL} AS margin,
               ({_MARGIN_SQL} > 0) AS pred
        FROM feat WHERE len(w) > 0
    """,
    doc="JVM-only linear-model inference: a fixed-weight classifier over "
        "engineered token features (token count, stopword ratio, mean "
        "word length, distinct ratio) computed entirely with built-in "
        "array expressions — the counterpoint to infer_sentiment's "
        "pandas-UDF path, showing model scoring can stay inside "
        "whole-stage codegen with zero Python when the features are "
        "expressible (real pipelines export linear/GBDT models to SQL "
        "exactly this way). Map-only: no shuffle at any scale; features "
        "are exact int ratios, the margin one fixed-order expression "
        "rounded to 6.",
    tags=("inference",),
)
def infer_linear_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = _tokens(F.col("text"))
    margin = _margin_col()
    return (
        t.documents.filter(F.size(_tokens(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.size(w).cast("long").alias("n_tokens"),
            margin.alias("margin"),
            (margin > 0).alias("pred"),
        )
    )


@register(
    "infer_threshold_sweep",
    oracle=f"""
        WITH scored AS (
            SELECT (lang = 'en') AS label, {_MARGIN_SQL} AS margin
            FROM (SELECT doc_id, lang, {_SQL_TOKENS} AS w FROM documents)
            WHERE len(w) > 0
        ), t AS (
            SELECT unnest([{", ".join(f"CAST({x} AS DOUBLE)" for x in _LM_THRESHOLDS)}])
                AS threshold
        )
        SELECT t.threshold,
               CAST(SUM(CASE WHEN margin > threshold AND label
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN margin > threshold AND NOT label
                             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN margin <= threshold AND label
                             THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN margin <= threshold AND NOT label
                             THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM scored CROSS JOIN t
        GROUP BY t.threshold
    """,
    doc="Model-evaluation sweep: confusion-matrix counts for the linear "
        "classifier at five decision thresholds against a weak label "
        "(lang == 'en'), in ONE pass — each doc expands to 5 (threshold, "
        "outcome) contributions locally, then one partial+final "
        "aggregation keyed by threshold. The corpus is scanned once no "
        "matter how many thresholds are swept; precision/recall derive "
        "from the integer counts downstream (kept as exact ints here so "
        "the hash needs no division convention).",
    tags=("inference",),
)
def infer_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    scored = (
        t.documents.filter(F.size(_tokens(F.col("text"))) > 0)
        .select(
            (F.col("lang") == "en").alias("label"),
            _margin_col().alias("margin"),
        )
    )
    thresholds = F.array(*[F.lit(float(x)) for x in _LM_THRESHOLDS])
    expanded = scored.select(
        "label", "margin", F.explode(thresholds).alias("threshold")
    )
    hit = F.col("margin") > F.col("threshold")
    return expanded.groupBy("threshold").agg(
        F.sum((hit & F.col("label")).cast("int")).cast("long").alias("tp"),
        F.sum((hit & ~F.col("label")).cast("int")).cast("long").alias("fp"),
        F.sum((~hit & F.col("label")).cast("int")).cast("long").alias("fn"),
        F.sum((~hit & ~F.col("label")).cast("int")).cast("long").alias("tn"),
    )


# ------------------------------------------------- calibration analysis

# fixed-width margin bins over [-2, 2): bin = floor((margin+2)/0.5),
# clamped to [0, 15]. 0.5 is a power of two, so the division is EXACT
# in doubles (identical bin assignment cross-engine); per-bin margin
# mass is summed as exact round-6 micro-units (int64), so no double
# summation order exists anywhere.
_CAL_LO, _CAL_WIDTH, _CAL_BINS = -2.0, 0.5, 16


@register(
    "infer_calibration_bins",
    oracle=f"""
        WITH scored AS (
            SELECT (lang = 'en') AS label, {_MARGIN_SQL} AS margin
            FROM (SELECT doc_id, lang, {_SQL_TOKENS} AS w FROM documents)
            WHERE len(w) > 0
        ), binned AS (
            SELECT least(greatest(CAST(floor(
                       (margin - CAST({_CAL_LO} AS DOUBLE))
                       / CAST({_CAL_WIDTH} AS DOUBLE)) AS BIGINT),
                       0), {_CAL_BINS - 1}) AS bin,
                   label,
                   CAST(round(margin * CAST(1000000 AS DOUBLE)) AS BIGINT)
                       AS margin_micro
            FROM scored
        )
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
                   AS positives,
               CAST(SUM(margin_micro) AS BIGINT) AS sum_margin_micro,
               CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
                   / CAST(COUNT(*) AS BIGINT) AS emp_rate
        FROM binned GROUP BY bin
    """,
    doc="Model-calibration (reliability-curve) bins for the linear "
        "classifier vs the weak lang=='en' label: round-6 margins fall "
        "into 16 fixed-width bins over [-2,2) (width 0.5 — a power of "
        "two, so the binning division is exact in doubles), each bin "
        "reporting size, positive count, empirical positive rate "
        "(exact int ratio), and the margin mass as exact round-6 "
        "micro-units so no double summation order exists. One "
        "partial+final aggregation; downstream ECE is a trivial "
        "combination of these columns.",
    tags=("inference",),
)
def infer_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    scored = (
        t.documents.filter(F.size(_tokens(F.col("text"))) > 0)
        .select(
            (F.col("lang") == "en").alias("label"),
            _margin_col().alias("margin"),
        )
    )
    bin_col = F.least(
        F.greatest(
            F.floor(
                (F.col("margin") - F.lit(_CAL_LO)) / F.lit(_CAL_WIDTH)
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ),
        F.lit(_CAL_BINS - 1).cast("bigint"),
    )
    binned = scored.select(
        bin_col.alias("bin"),
        "label",
        F.round(F.col("margin") * F.lit(1000000.0))
        .cast("bigint")
        .alias("margin_micro"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum(F.col("label").cast("int")).cast("long").alias("positives"),
        F.sum("margin_micro").alias("sum_margin_micro"),
        (
            F.sum(F.col("label").cast("int")).cast("long").cast("double")
            / F.count("*").cast("double")
        ).alias("emp_rate"),
    )


# ---------------------------------------------------------------------------
# Distributed model TRAINING: fixed-point batch perceptron over embeddings
# ---------------------------------------------------------------------------

_PCP_FP = 1 << 14   # feature quantization: |x| <= 1 -> |xq| <= 2^14
_PCP_ITERS = 5
_PCP_DIM = 64


def _perceptron_oracle() -> str:
    """Unrolled MATERIALIZED-CTE replay of the training loop (the
    pagerank/PCA technique): every reduction is an exact BIGINT sum
    (order-free), every per-element step integer arithmetic, so DuckDB
    replays the Spark loop bit for bit. SUMs outer-cast to BIGINT
    (DuckDB SUM(BIGINT) -> HUGEINT drift rule)."""
    parts = [f"""
        WITH ids AS MATERIALIZED (
            SELECT vec_id,
                   CASE WHEN label % 2 = 1 THEN 1 ELSE -1 END AS y,
                   unnest(range(1, {_PCP_DIM + 1})) AS j,
                   embedding
            FROM embeddings
        ),
        xq AS MATERIALIZED (
            SELECT vec_id, y, CAST(j AS INTEGER) AS j,
                   CAST(floor(CAST(embedding[j] AS DOUBLE)
                        * CAST({_PCP_FP} AS DOUBLE)) AS BIGINT) AS x
            FROM ids
        ),
        w0 AS MATERIALIZED (
            SELECT CAST(unnest(range(1, {_PCP_DIM + 1})) AS INTEGER) AS j,
                   CAST(0 AS BIGINT) AS w
        )"""]
    for t in range(1, _PCP_ITERS + 1):
        parts.append(f""",
        sc{t} AS MATERIALIZED (
            SELECT x.vec_id, x.y,
                   CAST(SUM(w.w * x.x) AS BIGINT) AS score
            FROM xq x JOIN w{t - 1} w ON x.j = w.j
            GROUP BY x.vec_id, x.y
        ),
        w{t} AS MATERIALIZED (
            SELECT x.j,
                   any_value(wp.w)
                   + CAST(SUM(CASE WHEN s.y * s.score <= 0
                                   THEN s.y * x.x ELSE 0 END) AS BIGINT)
                       AS w
            FROM xq x
            JOIN sc{t} s ON x.vec_id = s.vec_id
            JOIN w{t - 1} wp ON x.j = wp.j
            GROUP BY x.j
        ),
        m{t} AS MATERIALIZED (
            SELECT CAST({t} AS BIGINT) AS iter,
                   CAST(SUM(CASE WHEN y * score <= 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS errors,
                   (SELECT CAST(SUM(abs(w)) AS BIGINT) FROM w{t}) AS w_l1
            FROM sc{t}
        )""")
    unions = "\n            UNION ALL ".join(
        f"SELECT iter, errors, w_l1 FROM m{t}"
        for t in range(1, _PCP_ITERS + 1)
    )
    parts.append(f"""
        SELECT iter, errors, w_l1 FROM (
            {unions}
        )""")
    return "".join(parts)


@register(
    "infer_perceptron_train",
    oracle=_perceptron_oracle(),
    doc="DISTRIBUTED MODEL TRAINING on Spark: 5 iterations of batch "
        "perceptron over the embeddings table (binary target y = "
        "label parity). Each iteration broadcasts the 64-int weight "
        "vector into an Arrow-batched mapInPandas pass that emits "
        "per-partition integer partial sums (map-side combine: 64+1 "
        "rows per partition, never per-row traffic), then one tiny "
        "groupBy reduces them — the textbook broadcast-gradient "
        "pattern that scales to 1000 executors with per-iteration "
        "shuffle bytes independent of corpus size. Exactness: features "
        "quantized to floor(x*2^14) ints (|w| <= T*n*2^14 and scores "
        "<= 64*|w|*2^14 stay far inside int64 for n*T < 2^30), updates "
        "are order-free integer sums, so the loop replays bit-for-bit "
        "as the oracle's unrolled MATERIALIZED CTEs. Output: per-iter "
        "misclassification count + L1 weight mass.",
)
def infer_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "embedding", "label").cache()
    fp = float(_PCP_FP)

    def _pass(w_vec: "np.ndarray"):
        """One training pass: per-partition (j, update_j) partials plus
        a (-1, errors) row, reduced by a 65-key groupBy."""

        def gen(batches):
            upd = np.zeros(_PCP_DIM, dtype=np.int64)
            errors = 0
            for pdf in batches:
                X = np.stack(pdf["embedding"].values).astype(np.float64)
                xq = np.floor(X * fp).astype(np.int64)
                y = np.where(
                    (pdf["label"].to_numpy() % 2) == 1, 1, -1
                ).astype(np.int64)
                score = xq @ w_vec
                mis = (y * score) <= 0
                errors += int(mis.sum())
                upd += (xq[mis] * y[mis, None]).sum(axis=0, dtype=np.int64)
            out = pd.DataFrame(
                {"j": np.arange(1, _PCP_DIM + 1, dtype=np.int32),
                 "c": upd}
            )
            out.loc[len(out)] = {"j": -1, "c": errors}
            yield out.astype({"j": "int32", "c": "int64"})

        rows = (
            emb.mapInPandas(gen, "j int, c long")
            .groupBy("j").agg(F.sum("c").alias("c"))
            .collect()
        )
        agg = {r["j"]: r["c"] for r in rows}
        update = np.array(
            [agg.get(j, 0) for j in range(1, _PCP_DIM + 1)], dtype=np.int64
        )
        return update, int(agg.get(-1, 0))

    w = np.zeros(_PCP_DIM, dtype=np.int64)
    history = []
    for it in range(1, _PCP_ITERS + 1):
        update, errors = _pass(w)
        w = w + update
        history.append((it, errors, int(np.abs(w).sum())))
    return spark.createDataFrame(
        history, "iter long, errors long, w_l1 long"
    )


# ---------------------------------------------------------------------------
# Decision-stump split finding (the GBDT inner loop), exact integers
# ---------------------------------------------------------------------------

_STUMP_BUCKET = 1 << 11   # histogram bucket width in 2^14-quantized units
_STUMP_SCALE = 1 << 20    # fixed-point scale for the Gini impurity key


@register(
    "infer_tree_split",
    oracle=f"""
        WITH xe AS (
            SELECT label, unnest(range(1, {_PCP_DIM + 1})) AS j, embedding
            FROM embeddings
        ),
        xq AS (
            SELECT label, CAST(j AS INTEGER) AS j,
                   CAST(floor(CAST(embedding[j] AS DOUBLE)
                        * CAST({_PCP_FP} AS DOUBLE)) AS BIGINT) AS xq
            FROM xe
        ),
        cnt AS (
            SELECT j, (xq + {_PCP_FP}) // {_STUMP_BUCKET} AS b, label,
                   count(*) AS c
            FROM xq GROUP BY 1, 2, 3
        ),
        grid AS (
            SELECT CAST(js.j AS INTEGER) AS j, CAST(bs.b AS BIGINT) AS b,
                   ls.label
            FROM (SELECT unnest(range(1, {_PCP_DIM + 1})) AS j) js,
                 (SELECT unnest(range(0, 17)) AS b) bs,
                 (SELECT DISTINCT label FROM embeddings) ls
        ),
        dense AS (
            SELECT g.j, g.b, g.label, COALESCE(c.c, 0) AS c
            FROM grid g LEFT JOIN cnt c
              ON g.j = c.j AND g.b = c.b AND g.label = c.label
        ),
        cum AS (
            SELECT j, b,
                   CAST(COALESCE(SUM(c) OVER (
                       PARTITION BY j, label ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cl,
                   CAST(SUM(c) OVER (PARTITION BY j, label) AS BIGINT)
                       AS tot
            FROM dense
        ),
        agg AS (
            SELECT j, b,
                   CAST(SUM(cl) AS BIGINT) AS n_l,
                   CAST(SUM(cl * cl) AS BIGINT) AS ssq_l,
                   CAST(SUM(tot - cl) AS BIGINT) AS n_r,
                   CAST(SUM((tot - cl) * (tot - cl)) AS BIGINT) AS ssq_r
            FROM cum WHERE b >= 1 GROUP BY j, b
        ),
        scored AS (
            SELECT j, b, n_l, n_r,
                   ((n_l * n_l - ssq_l) * {_STUMP_SCALE}) // n_l
                   + ((n_r * n_r - ssq_r) * {_STUMP_SCALE}) // n_r AS score
            FROM agg WHERE n_l > 0 AND n_r > 0
        )
        SELECT CAST(rk AS BIGINT) AS rk, j,
               CAST(b * {_STUMP_BUCKET} - {_PCP_FP} AS BIGINT)
                   AS threshold_q,
               n_l, n_r, score
        FROM (
            SELECT *, row_number() OVER (ORDER BY score, j, b) AS rk
            FROM scored
        ) WHERE rk <= 5
    """,
    doc="Exact decision-stump split finding over embeddings (the GBDT "
        "inner loop): features quantize to floor(x*2^14), histogram into "
        "16 buckets, per-class counts accumulate once (ONE corpus-scale "
        "aggregation of 64 dims x 17 buckets x classes), then every "
        "candidate threshold's weighted Gini impurity comes from window "
        "prefix sums over the tiny histogram — the classic "
        "histogram-based split search (LightGBM-style) where corpus "
        "bytes are touched exactly once regardless of candidate count. "
        "Impurity ranks by the integer key floor(imp*2^20) via exact "
        "truncating division (Spark div == DuckDB //, both toward zero "
        "on non-negative operands), ties to (j, bucket) — fully "
        "deterministic, no floats anywhere. Top-5 splits emitted.",
)
def infer_tree_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    fp, bw, sc = _PCP_FP, _STUMP_BUCKET, _STUMP_SCALE
    xq = (
        t.embeddings.select(
            "label", F.posexplode("embedding").alias("p", "x")
        )
        .select(
            "label",
            (F.col("p") + 1).cast("int").alias("j"),
            F.floor(F.col("x").cast("double") * F.lit(float(fp)))
            .alias("xq"),
        )
    )
    cnt = (
        xq.select(
            "j",
            F.expr(f"(xq + {fp}) div {bw}").alias("b"),
            "label",
        )
        .groupBy("j", "b", "label")
        .agg(F.count("*").alias("c"))
    )
    grid = (
        spark.range(1, _PCP_DIM + 1)
        .select(F.col("id").cast("int").alias("j"))
        .select("j", F.explode(F.sequence(F.lit(0), F.lit(16))).alias("bs"))
        .select("j", F.col("bs").cast("long").alias("b"))
        .crossJoin(F.broadcast(t.embeddings.select("label").distinct()))
    )
    dense = grid.join(cnt, ["j", "b", "label"], "left").na.fill({"c": 0})
    wpre = (
        W.partitionBy("j", "label").orderBy("b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wtot = W.partitionBy("j", "label")
    cum = dense.select(
        "j", "b",
        F.coalesce(F.sum("c").over(wpre), F.lit(0)).alias("cl"),
        F.sum("c").over(wtot).alias("tot"),
    )
    agg = (
        cum.filter(F.col("b") >= 1)
        .groupBy("j", "b")
        .agg(
            F.sum("cl").alias("n_l"),
            F.sum(F.col("cl") * F.col("cl")).alias("ssq_l"),
            F.sum(F.col("tot") - F.col("cl")).alias("n_r"),
            F.sum(
                (F.col("tot") - F.col("cl"))
                * (F.col("tot") - F.col("cl"))
            ).alias("ssq_r"),
        )
    )
    scored = agg.filter((F.col("n_l") > 0) & (F.col("n_r") > 0)).select(
        "j", "b", "n_l", "n_r",
        (
            F.expr(f"((n_l * n_l - ssq_l) * {sc}) div n_l")
            + F.expr(f"((n_r * n_r - ssq_r) * {sc}) div n_r")
        ).alias("score"),
    )
    # the (j, b) grid is config-bounded — windowless top-5 with rank
    # (sorted-array slice + posexplode, functions/ranking.ranked_rows)
    from ..functions.ranking import ranked_rows

    return ranked_rows(
        scored,
        [F.col("score"), F.col("j"), F.col("b")],
        ["j", "b", "n_l", "n_r", "score"],
        k=5,
        rank_col="rk",
    ).select(
        F.col("rk").cast("long").alias("rk"),
        "j",
        (F.col("b") * bw - fp).cast("long").alias("threshold_q"),
        "n_l", "n_r", "score",
    )


# ---------------------------------------------------------------------------
# L2-boosting with stumps (mini-GBDT): 3 rounds over the split search
# ---------------------------------------------------------------------------

_BST_RES = 1 << 10    # residual fixed-point: y = +-1 -> +-1024
_BST_KEY = 16         # split-gain key quantum (keeps S^2*key inside int64)
_BST_ROUNDS = 3


def _boost_oracle() -> str:
    """Unrolled replay of the boosting loop: every residual/histogram/
    gain/leaf-value step is integer arithmetic (Spark div == DuckDB //,
    BOTH truncating toward zero — verified for negative operands), the
    per-round argmax is ORDER BY key DESC, j, b LIMIT 1 (the same unique
    tie-break the Spark side applies to the collected histogram)."""
    head = f"""
        WITH ids AS MATERIALIZED (
            SELECT vec_id,
                   CASE WHEN label % 2 = 1 THEN 1 ELSE -1 END AS y,
                   unnest(range(1, {_PCP_DIM + 1})) AS j,
                   embedding
            FROM embeddings
        ),
        xqm AS MATERIALIZED (
            SELECT vec_id, y, CAST(j AS INTEGER) AS j,
                   CAST(floor(CAST(embedding[j] AS DOUBLE)
                        * CAST({_PCP_FP} AS DOUBLE)) AS BIGINT) AS xq
            FROM ids
        ),
        grid AS (
            SELECT CAST(js.j AS INTEGER) AS j, CAST(bs.b AS BIGINT) AS b
            FROM (SELECT unnest(range(1, {_PCP_DIM + 1})) AS j) js,
                 (SELECT unnest(range(0, 17)) AS b) bs
        ),
        r0 AS MATERIALIZED (
            SELECT DISTINCT vec_id, CAST(y * {_BST_RES} AS BIGINT) AS r
            FROM ids
        )"""
    parts = [head]
    for m in range(1, _BST_ROUNDS + 1):
        parts.append(f""",
        h{m} AS MATERIALIZED (
            SELECT x.j, (x.xq + {_PCP_FP}) // {_STUMP_BUCKET} AS b,
                   CAST(SUM(r.r) AS BIGINT) AS s, count(*) AS c
            FROM xqm x JOIN r{m - 1} r USING (vec_id)
            GROUP BY 1, 2
        ),
        d{m} AS (
            SELECT g.j, g.b, COALESCE(h.s, 0) AS s, COALESCE(h.c, 0) AS c
            FROM grid g LEFT JOIN h{m} h ON g.j = h.j AND g.b = h.b
        ),
        cum{m} AS (
            SELECT j, b,
                   CAST(COALESCE(SUM(s) OVER w, 0) AS BIGINT) AS sl,
                   CAST(COALESCE(SUM(c) OVER w, 0) AS BIGINT) AS nl,
                   CAST(SUM(s) OVER (PARTITION BY j) AS BIGINT) AS st,
                   CAST(SUM(c) OVER (PARTITION BY j) AS BIGINT) AS nt
            FROM d{m}
            WINDOW w AS (PARTITION BY j ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ),
        s{m} AS MATERIALIZED (
            SELECT j, CAST(b * {_STUMP_BUCKET} - {_PCP_FP} AS BIGINT)
                       AS thr_q,
                   sl // nl AS gl, (st - sl) // (nt - nl) AS gr,
                   (sl * sl * {_BST_KEY}) // nl
                   + ((st - sl) * (st - sl) * {_BST_KEY}) // (nt - nl)
                       AS key
            FROM cum{m}
            WHERE b >= 1 AND nl > 0 AND nt - nl > 0
            ORDER BY key DESC, j, b LIMIT 1
        ),
        r{m} AS MATERIALIZED (
            SELECT r.vec_id,
                   r.r - (CASE WHEN x.xq < s.thr_q THEN s.gl
                               ELSE s.gr END) AS r
            FROM r{m - 1} r
            JOIN s{m} s ON TRUE
            JOIN xqm x ON x.vec_id = r.vec_id AND x.j = s.j
        ),
        m{m} AS MATERIALIZED (
            SELECT CAST({m} AS BIGINT) AS round,
                   (SELECT j FROM s{m}) AS j,
                   (SELECT thr_q FROM s{m}) AS threshold_q,
                   (SELECT gl FROM s{m}) AS gamma_l,
                   (SELECT gr FROM s{m}) AS gamma_r,
                   (SELECT CAST(SUM(r * r) AS BIGINT) FROM r{m}) AS sse_q
            FROM s{m}
        )""")
    unions = "\n            UNION ALL ".join(
        f"SELECT * FROM m{t}" for t in range(1, _BST_ROUNDS + 1)
    )
    parts.append(f"""
        SELECT round, j, threshold_q, gamma_l, gamma_r, sse_q FROM (
            {unions}
        )""")
    return "".join(parts)


@register(
    "infer_boosted_stumps",
    oracle=_boost_oracle(),
    doc="Mini-GBDT: 3 rounds of L2 gradient boosting with decision-stump "
        "base learners over embeddings (target y = +-1 from label "
        "parity, fixed-point residuals in 2^10 units). Each round is the "
        "histogram split search of infer_tree_split on the CURRENT "
        "residuals — one corpus-scale aggregation to a 64x17 histogram "
        "(bounded driver collect, like the BPE vocab), variance-gain key "
        "(S_L^2*16) div n_L + (S_R^2*16) div n_R maximized with unique "
        "(key desc, j, b) tie-break, leaf values = truncating-division "
        "residual means (Spark div == DuckDB //, toward zero even for "
        "negative sums — verified), residuals updated via a broadcast "
        "scalar split. Per-round shuffle bytes are histogram-sized, "
        "independent of corpus scale; int64 bounds hold for n < 2^21 "
        "(|r| <= 2^13 after 3 rounds). Output: per-round split + leaf "
        "values + post-round SSE, replayed exactly by unrolled "
        "MATERIALIZED CTEs.",
)
def infer_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    t = Tables(spark, sf_dir)
    fp, bw, res, keyq = _PCP_FP, _STUMP_BUCKET, _BST_RES, _BST_KEY
    yq = F.when(F.col("label") % 2 == 1, res).otherwise(-res)
    emb = t.embeddings.select(
        "vec_id", "embedding", yq.cast("long").alias("yq")
    ).cache()

    def tdiv(a: int, b: int) -> int:
        """Truncating integer division toward zero (Spark div / DuckDB
        // semantics; Python's // floors, which differs for negatives)."""
        q = abs(a) // b
        return q if a >= 0 else -q

    history: list[tuple[int, int, int, int]] = []  # (j, thr_q, gl, gr)

    def resid() -> "F.Column":
        r = F.col("yq")
        for j, thr_q, gl, gr in history:
            xq_j = F.floor(
                F.element_at("embedding", j).cast("double")
                * F.lit(float(fp))
            )
            r = r - F.when(xq_j < thr_q, F.lit(gl)).otherwise(F.lit(gr))
        return r

    out = []
    for m in range(1, _BST_ROUNDS + 1):
        hist = (
            emb.select(resid().alias("r"),
                       F.posexplode("embedding").alias("p", "x"))
            .select(
                "r",
                (F.col("p") + 1).cast("int").alias("j"),
                F.expr(
                    f"(CAST(floor(CAST(x AS DOUBLE) * {float(fp)}) "
                    f"AS BIGINT) + {fp}) div {bw}"
                ).alias("b"),
            )
            .groupBy("j", "b")
            .agg(F.sum("r").alias("s"), F.count("*").alias("c"))
            .collect()
        )
        S = np.zeros((_PCP_DIM + 1, 17), dtype=np.int64)
        C = np.zeros((_PCP_DIM + 1, 17), dtype=np.int64)
        for row in hist:
            S[row["j"], row["b"]] = row["s"]
            C[row["j"], row["b"]] = row["c"]
        best = None
        for j in range(1, _PCP_DIM + 1):
            sl = nl = 0
            st, nt = int(S[j].sum()), int(C[j].sum())
            for b in range(1, 17):
                sl += int(S[j, b - 1])
                nl += int(C[j, b - 1])
                if nl == 0 or nt - nl == 0:
                    continue
                key = tdiv(sl * sl * keyq, nl) + tdiv(
                    (st - sl) * (st - sl) * keyq, nt - nl
                )
                cand = (-key, j, b)
                if best is None or cand < best[0]:
                    best = (cand, sl, nl, st, nt)
        if best is None:
            break
        (_negkey, j, b), sl, nl, st, nt = best
        thr_q = b * bw - fp
        gl, gr = tdiv(sl, nl), tdiv(st - sl, nt - nl)
        history.append((j, thr_q, gl, gr))
        sse = emb.select(resid().alias("r")).agg(
            F.sum(F.col("r") * F.col("r")).alias("sse")
        ).collect()[0]["sse"]
        out.append((m, j, thr_q, gl, gr, int(sse)))
    return spark.createDataFrame(
        out,
        "round long, j int, threshold_q long, gamma_l long, "
        "gamma_r long, sse_q long",
    )


@register(
    "q_arrow_byte_stats",
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(max(strlen(text)) AS BIGINT) AS max_bytes
        FROM documents
        GROUP BY source
    """,
    doc="mapInArrow surface (SURVEY §2.11's Arrow-NATIVE lane, distinct "
        "from the pandas lanes): per-document byte and codepoint masses "
        "computed with pyarrow compute kernels directly on the Arrow "
        "RecordBatch — zero pandas materialization, zero per-row Python "
        "— then a grouped per-source profile. binary_length on the "
        "utf8->binary cast == DuckDB strlen (the repo's byte-mass "
        "convention); utf8_length == DuckDB length (codepoints). The "
        "batch never leaves Arrow until the JVM aggregation, so this is "
        "the cheapest Python touchpoint Spark offers — the shape a "
        "feature extractor uses when pandas conversion is the "
        "bottleneck.",
)
def q_arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    t = Tables(spark, sf_dir)

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("source"),
                    pc.cast(
                        pc.binary_length(pc.cast(text, pa.binary())),
                        pa.int64(),
                    ),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                names=["source", "n_bytes", "n_chars"],
            )

    per_doc = t.documents.select("source", "text").mapInArrow(
        stats, "source string, n_bytes long, n_chars long"
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.max("n_bytes").cast("bigint").alias("max_bytes"),
    )
