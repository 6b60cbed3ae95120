"""ML dataset-preparation operators: leakage-free splits, class
rebalancing, overlapping context chunking, robust (winsorized) stats.

The reference computes one WordCount (cluster/tools/run_fault_tests.py:26-30);
these extend the same corpus surface with the dataset-side operations a
training pipeline runs right before tokenization. All pure DataFrame
plans with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register

_TRAIN_PCT = 8  # md5(user) % 10 < 8 -> train


@register(
    "q_group_split",
    oracle=f"""
        WITH tagged AS (
            SELECT user_id, event_type,
                   CASE WHEN CAST(('0x' || substr(
                            md5(CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                            % 10 < {_TRAIN_PCT}
                        THEN 'train' ELSE 'test' END AS split
            FROM events
        )
        SELECT split,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases
        FROM tagged GROUP BY split
    """,
    doc="Group-aware (user-level) train/test split: split assignment "
        "hashes the GROUP key (user_id), so every event of a user lands "
        "in exactly one split by construction — the leakage-free split a "
        "training pipeline needs (row-level random splits leak user "
        "behavior across splits). Hash-derandomized (md5 % 10), so the "
        "same user maps to the same split on every run, cluster, and "
        "engine — no shuffle to assign, one aggregation to audit.",
    tags=("ml-data",),
)
def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    split = F.when(
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16, 10,
            ).cast("bigint"),
            F.lit(10),
        )
        < _TRAIN_PCT,
        F.lit("train"),
    ).otherwise(F.lit("test"))
    return (
        t.events.select("user_id", "event_type", split.alias("split"))
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("long")
            .alias("n_purchases"),
        )
    )


@register(
    "q_class_balance",
    oracle="""
        WITH counts AS (
            SELECT event_type, COUNT(*) AS n_before FROM events
            GROUP BY event_type
        ), factors AS (
            SELECT event_type, n_before,
                   CAST((SELECT MAX(n_before) FROM counts) // n_before
                        AS BIGINT) AS factor
            FROM counts
        )
        SELECT event_type, n_before, factor,
               n_before * factor AS n_after
        FROM factors
    """,
    doc="Class-balanced oversampling: each minority class's rows are "
        "replicated floor(max_class/n_class) times via explode(sequence) "
        "— a map-side operation (no shuffle to resample; the tiny "
        "class-factor table broadcasts). The audit aggregation recounts "
        "the resampled stream, pinning n_after = n_before * factor. At "
        "100 TB replication happens at scan time per partition; skew "
        "from a very rare class is bounded because factors multiply rows "
        "within their own partitions.",
    tags=("ml-data",),
)
def q_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    counts = t.events.groupBy("event_type").agg(
        F.count("*").alias("n_before")
    )
    mx = counts.agg(F.max("n_before").alias("mx"))
    factors = counts.crossJoin(F.broadcast(mx)).select(
        "event_type",
        "n_before",
        F.expr("mx div n_before").cast("bigint").alias("factor"),
    )
    resampled = (
        t.events.select("event_type")
        .join(F.broadcast(factors), "event_type")
        .select(
            "event_type",
            F.explode(F.expr("sequence(1, factor)")).alias("_i"),
        )
    )
    after = resampled.groupBy("event_type").agg(
        F.count("*").alias("n_after")
    )
    return factors.join(after, "event_type").select(
        "event_type", "n_before", "factor", "n_after"
    )


_CHUNK_W = 6    # words per context window
_CHUNK_STRIDE = 4  # overlap = width - stride


@register(
    "text_chunk_overlap",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS words
            FROM documents WHERE length(text) > 0
        ), starts AS (
            SELECT doc_id, words,
                   unnest(range(0, CAST(ceil(len(words) / {_CHUNK_STRIDE}.0)
                                        AS BIGINT))) AS chunk_id
            FROM d
        )
        SELECT doc_id, chunk_id,
               array_to_string(
                   words[(chunk_id*{_CHUNK_STRIDE}+1)
                         :(chunk_id*{_CHUNK_STRIDE}+{_CHUNK_W})],
                   ' ') AS chunk_text,
               len(words[(chunk_id*{_CHUNK_STRIDE}+1)
                         :(chunk_id*{_CHUNK_STRIDE}+{_CHUNK_W})])
                   AS n_tokens
        FROM starts
    """,
    doc="Sliding-window context chunking with overlap (width "
        f"{_CHUNK_W}, stride {_CHUNK_STRIDE}): the long-document packing "
        "shape where consecutive training windows share width-stride "
        "tokens of context. Pure map-side explode — rows multiply by "
        "~1/stride locally, no shuffle; at 100 TB this runs at scan "
        "speed and the output feeds the tokenizer directly.",
    tags=("ml-data", "curation"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w, s = _CHUNK_W, _CHUNK_STRIDE
    d = (
        t.documents.filter(F.length("text") > 0)
        .select("doc_id", F.split("text", " ").alias("words"))
    )
    return d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(words)/{s}.0) as int)"
                f" - 1), i -> slice(words, i*{s}+1, {w}))"
            )
        ).alias("chunk_id", "chunk_words"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.concat_ws(" ", "chunk_words").alias("chunk_text"),
        F.size("chunk_words").cast("long").alias("n_tokens"),
    )


@register(
    "q_winsorize",
    oracle="""
        WITH bounds AS (
            SELECT o_orderpriority,
                   quantile_cont(CAST(o_totalprice AS DOUBLE), 0.05) AS lo,
                   quantile_cont(CAST(o_totalprice AS DOUBLE), 0.95) AS hi
            FROM orders GROUP BY o_orderpriority
        ), clamped AS (
            SELECT o.o_orderpriority,
                   CAST(round(
                       CASE WHEN CAST(o.o_totalprice AS DOUBLE) < b.lo
                                THEN b.lo
                            WHEN CAST(o.o_totalprice AS DOUBLE) > b.hi
                                THEN b.hi
                            ELSE CAST(o.o_totalprice AS DOUBLE) END,
                       4) AS DECIMAL(18,4)) AS v
            FROM orders o JOIN bounds b
              ON o.o_orderpriority = b.o_orderpriority
        )
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) / COUNT(*)
                   AS winsorized_mean
        FROM clamped GROUP BY o_orderpriority
    """,
    doc="Winsorized (outlier-clamped) per-group mean: exact interpolated "
        "P5/P95 bounds per group, values clamped into [lo, hi], then an "
        "exact-decimal mean (clamped doubles rounded to 4dp and summed "
        "as DECIMAL so the cross-engine hash can't drift with summation "
        "order). Two aggregations on the same grouping key — at scale "
        "the bounds table is one row per group and broadcasts back onto "
        "the fact scan; exact percentiles use Spark's percentile "
        "(== DuckDB quantile_cont linear interpolation).",
    tags=("ml-data",),
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    bounds = t.orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(cast(o_totalprice as double), 0.05)").alias("lo"),
        F.expr("percentile(cast(o_totalprice as double), 0.95)").alias("hi"),
    )
    v = F.col("o_totalprice").cast("double")
    clamped = (
        t.orders.join(F.broadcast(bounds), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.round(
                F.when(v < F.col("lo"), F.col("lo"))
                .when(v > F.col("hi"), F.col("hi"))
                .otherwise(v),
                4,
            ).cast("decimal(18,4)").alias("v"),
        )
    )
    return clamped.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        (F.sum("v").cast("double") / F.count("*")).alias("winsorized_mean"),
    )


_WSAMPLE_K = 64


@register(
    "q_weighted_sample",
    oracle=f"""
        WITH keyed AS (
            SELECT o_orderkey,
                   CAST(o_totalprice AS DOUBLE) AS weight,
                   round(
                       ln((CAST(('0x' || substr(
                               md5(CAST(o_orderkey AS VARCHAR)), 1, 13))
                               AS UBIGINT) + 1) / 4503599627370496.0)
                       / CAST(o_totalprice AS DOUBLE),
                       12) AS priority
            FROM orders
        )
        SELECT o_orderkey, weight
        FROM keyed
        ORDER BY priority DESC, o_orderkey
        LIMIT {_WSAMPLE_K}
    """,
    doc="Weighted sampling without replacement (Efraimidis-Spirakis A-ES, "
        "derandomized): u = md5-derived uniform in (0,1], priority = "
        "ln(u)/w (the monotone equivalent of u^(1/w)), keep the top-k "
        "priorities. Distributed exactly like the uniform reservoir: "
        "TakeOrderedAndProject keeps a per-partition k-heap, only k rows "
        "per partition reach the driver merge — no shuffle, no sort of "
        "the corpus. Priorities are rounded to 12 decimals before "
        "ranking (ties broken by key) so the one transcendental (ln) "
        "can't flip an ordering across engines; the hashed OUTPUT is "
        "keys + weights only.",
    tags=("ml-data",),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    h = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    u = (h + 1) / F.lit(float(1 << 52))
    w = F.col("o_totalprice").cast("double")
    keyed = t.orders.select(
        "o_orderkey",
        w.alias("weight"),
        F.round(F.log(u) / w, 12).alias("priority"),
    )
    return (
        keyed.orderBy(F.desc("priority"), "o_orderkey")
        .limit(_WSAMPLE_K)
        .select("o_orderkey", "weight")
    )


@register(
    "q_pit_features",
    oracle="""
        WITH u AS (
            SELECT MAX(user_id) + 1 AS n FROM events
        ), o AS (
            SELECT o_orderkey,
                   o_custkey % (SELECT n FROM u) AS user_id,
                   o_orderdate
            FROM orders
        )
        SELECT o.o_orderkey, o.user_id,
               COUNT(e.user_id) AS n_prior_events,
               COALESCE(CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,4)))
                                  AS VARCHAR) AS DOUBLE), 0.0)
                   AS prior_value_sum
        FROM o LEFT JOIN events e
          ON e.user_id = o.user_id AND e.ts < o.o_orderdate
        GROUP BY o.o_orderkey, o.user_id
    """,
    doc="Point-in-time-correct feature join (the feature-store backfill "
        "op): for every order, that entity's event count and value sum "
        "STRICTLY BEFORE the order timestamp — no future leakage by "
        "construction. Implemented with the union+window trick (same "
        "family as q_asof_join): events and orders interleave into one "
        "per-entity timeline, cumulative aggregates run over a single "
        "window sort with order rows sequenced before same-instant "
        "events, then only order rows are kept — ONE shuffle on the "
        "entity key, zero joins, vs the oracle's per-order correlated "
        "aggregation. Value sums are exact decimals.",
    tags=("ml-data",),
)
def q_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    t = Tables(spark, sf_dir)
    n_users = t.events.agg((F.max("user_id") + 1).alias("n"))
    ev = t.events.select(
        "user_id",
        F.col("ts").alias("pit_ts"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    orders = (
        t.orders.crossJoin(F.broadcast(n_users))
        .select(
            F.pmod(F.col("o_custkey"), F.col("n")).alias("user_id"),
            F.col("o_orderdate").alias("pit_ts"),
            F.lit(1).alias("is_order"),
            "o_orderkey",
            F.lit(None).cast("decimal(18,4)").alias("v"),
        )
    )
    # order rows sort BEFORE same-instant events (is_order DESC), so the
    # cumulative aggregate at an order row sees only strictly-earlier events
    timeline = ev.unionByName(orders)
    w = (
        _W.partitionBy("user_id")
        .orderBy("pit_ts", F.desc("is_order"), "o_orderkey")
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    feats = timeline.select(
        "user_id",
        "is_order",
        "o_orderkey",
        F.sum(1 - F.col("is_order")).over(w).cast("long")
        .alias("n_prior_events"),
        F.coalesce(F.sum("v").over(w).cast("double"), F.lit(0.0))
        .alias("prior_value_sum"),
    )
    return feats.filter(F.col("is_order") == 1).select(
        "o_orderkey", "user_id", "n_prior_events", "prior_value_sum"
    )


@register(
    "q_quantile_transform",
    oracle="""
        SELECT o_orderkey, o_orderpriority,
               CAST(o_totalprice AS DOUBLE) AS price,
               percent_rank() OVER (
                   PARTITION BY o_orderpriority ORDER BY o_totalprice
               ) AS q
        FROM orders
    """,
    doc="Per-group quantile (rank-uniform) feature transform: each value "
        "maps to its percent_rank within its group — the distribution-"
        "free normalization ML pipelines use for heavy-tailed features. "
        "percent_rank = (rank-1)/(n-1) is exact-int rational (tie-aware, "
        "no interpolation), so it hash-matches cross-engine with no "
        "float convention needed. One window sort per group; at 100 TB "
        "a group's rows must fit a partition — for truly giant groups "
        "the two-level equi-depth decile variant (q_deciles) is the "
        "scale path.",
    tags=("ml-data",),
)
def q_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    t = Tables(spark, sf_dir)
    w = _W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return t.orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("price"),
        F.percent_rank().over(w).alias("q"),
    )


@register(
    "q_unpivot_metrics",
    oracle="""
        WITH wide AS (
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS DOUBLE) AS n_orders,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS total_rev,
                   CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value
        FROM wide
        UNION ALL
        SELECT o_orderpriority, 'total_rev', total_rev FROM wide
        UNION ALL
        SELECT o_orderpriority, 'max_price', max_price FROM wide
    """,
    doc="Wide-to-long reshaping via the native UNPIVOT operator (the "
        "inverse of q_pivot_status): a per-priority metric table melts "
        "into (group, metric, value) rows — the shape metric stores and "
        "plotting layers want. Spark's unpivot is a zero-shuffle local "
        "expand (each input row emits one row per value column), exactly "
        "the oracle's UNION ALL re-reads without the re-read. Metrics "
        "are exact decimals cast to double once.",
    tags=("ml-data",),
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    wide = t.orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_rev"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_orders", "total_rev", "max_price"],
        "metric",
        "value",
    )


@register(
    "q_sliding_distinct_users",
    oracle="""
        SELECT CAST(date_trunc('hour', e.ts)
                    - to_hours(k.k) AS TIMESTAMP) AS window_start,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM events e
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) k
        GROUP BY 1
    """,
    doc="Sliding-window distinct users (3-hour windows, 1-hour slide): "
        "the overlap factor is handled by Spark's window() expand (each "
        "event lands in exactly 3 windows — a bounded local multiply, "
        "like the oracle's k in {0,1,2} cross join), then one "
        "partial+final distinct aggregation per window. At 100 TB the "
        "shuffle key is (window, user) — high cardinality, well spread; "
        "the per-window distinct COUNT is the second, tiny aggregation. "
        "This is the batch replica of the streaming sliding-window "
        "family (stream_hourly_counts et al.).",
    tags=("ml-data", "streaming"),
)
def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "3 hours", "1 hour"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.col("window.start").alias("window_start"),
            "n_users",
        )
    )


_CTX = 256  # context length (power of two: token_offset / _CTX is an
# exact double op in both engines — no floor-at-boundary drift)


@register(
    "text_seq_packing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source,
                   CAST(len(list_filter(
                       string_split_regex(text, '[ \\t\\n\\r\\f]+'),
                       x -> x <> '')) AS BIGINT) AS n_tok
            FROM documents
        ), spans AS (
            SELECT doc_id, source, n_tok,
                   CAST(SUM(n_tok) OVER (
                       PARTITION BY source ORDER BY doc_id
                   ) AS BIGINT) AS cum
            FROM toks WHERE n_tok >= 1
        ), binned AS (
            SELECT source, doc_id, n_tok, cum, cum - n_tok AS tok_start,
                   unnest(range(
                       CAST(floor((cum - n_tok) / {_CTX}.0) AS BIGINT),
                       CAST(floor((cum - 1) / {_CTX}.0) AS BIGINT) + 1
                   )) AS bin_id
            FROM spans
        )
        SELECT source, bin_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN tok_start >= bin_id * {_CTX}
                              AND cum <= (bin_id + 1) * {_CTX}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_full_docs,
               CAST(SUM(least(cum, (bin_id + 1) * {_CTX})
                        - greatest(tok_start, bin_id * {_CTX}))
                    AS BIGINT) AS fill_tokens,
               CAST(SUM(least(cum, (bin_id + 1) * {_CTX})
                        - greatest(tok_start, bin_id * {_CTX}))
                    AS DOUBLE) / {_CTX} AS utilization
        FROM binned
        GROUP BY source, bin_id
    """,
    doc="Concatenate-and-chunk sequence packing into fixed "
        f"{_CTX}-token context windows, per source shard — the layout "
        "step that turns a curated corpus into training sequences (the "
        "GPT-style 'pack then split at context boundaries' scheme; "
        "docs crossing a boundary continue into the next window). "
        "Per (source, window): overlapping docs, fully-contained docs, "
        "filled tokens, utilization. The running offset is a window "
        "cumsum PARTITIONED BY SOURCE shard — no global ordering, so "
        "at 100 TB each shard packs independently (exactly how "
        "multi-file tokenized datasets are laid out) and the span->"
        "window expansion is a map-side sequence explode bounded by "
        "doc_len/ctx. Zero-token docs are filtered BEFORE the explode "
        "(Spark's sequence(a, b) with b < a would emit a phantom "
        "descending range — the round-5 empty-string gotcha). All "
        "integers; utilization divides by the power-of-two context "
        "length, one exact double op; window + plain SUMs outer-cast "
        "to BIGINT (DuckDB HUGEINT drift).",
    tags=("text", "ml"),
)
def text_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..functions.text import tokens

    t = Tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
    )
    w = W.partitionBy("source").orderBy("doc_id")
    spans = (
        toks.filter(F.col("n_tok") >= 1)
        .select(
            "source",
            "doc_id",
            "n_tok",
            F.sum("n_tok").over(w).cast("bigint").alias("cum"),
        )
        .withColumn("tok_start", F.col("cum") - F.col("n_tok"))
    )
    binned = spans.select(
        "source",
        "tok_start",
        "cum",
        F.explode(
            F.sequence(
                F.floor(F.col("tok_start") / _CTX),
                F.floor((F.col("cum") - 1) / _CTX),
            )
        ).alias("bin_id"),
    )
    lo = F.col("bin_id") * _CTX
    hi = (F.col("bin_id") + 1) * _CTX
    filled = F.least(F.col("cum"), hi) - F.greatest(F.col("tok_start"), lo)
    return binned.groupBy("source", "bin_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(
            F.when(
                (F.col("tok_start") >= lo) & (F.col("cum") <= hi), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_full_docs"),
        F.sum(filled).cast("bigint").alias("fill_tokens"),
        (F.sum(filled).cast("double") / _CTX).alias("utilization"),
    )


@register(
    "ml_kfold_assign",
    oracle="""
        WITH folds AS (
            SELECT doc_id, lang, source,
                   CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                        1, 13)) AS UBIGINT) % 5 AS BIGINT) AS fold
            FROM documents
        )
        SELECT fold, lang, count(*) AS n,
               CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_src0
        FROM folds GROUP BY fold, lang
    """,
    doc="Deterministic k-fold assignment (k=5) for train/eval splits: "
        "fold = md5(doc_id) mod 5 via the repo's cross-engine 13-hex-"
        "digit bridge — stable under retries, lineage replay, and "
        "repartitioning (no rand()), so the same document lands in the "
        "same fold on every cluster. Output is the per-(fold, lang) "
        "stratification audit (plus a source marginal) a pipeline "
        "checks before training; the assignment itself is a map-only "
        "projection that joins against nothing.",
)
def ml_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    fold = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
            16, 10,
        ).cast("long") % 5
    )
    return (
        t.documents.select(
            fold.alias("fold"), "lang",
            F.when(F.col("source") == "src0", 1).otherwise(0).alias("s0"),
        )
        .groupBy("fold", "lang")
        .agg(F.count("*").alias("n"), F.sum("s0").alias("n_src0"))
    )


@register(
    "ml_target_encoding",
    oracle="""
        WITH labeled AS (
            SELECT c.c_mktsegment AS segment,
                   CASE WHEN o.o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END AS tgt
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        gstats AS (
            SELECT CAST(SUM(tgt) AS BIGINT) AS g_pos,
                   CAST(count(*) AS BIGINT) AS g_n
            FROM labeled
        ),
        per_seg AS (
            SELECT segment,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(tgt) AS BIGINT) AS pos
            FROM labeled GROUP BY segment
        )
        SELECT segment, n, pos, g_pos, g_n,
               (CAST(pos AS DOUBLE)
                + CAST(100 AS DOUBLE)
                  * (CAST(g_pos AS DOUBLE) / CAST(g_n AS DOUBLE)))
               / CAST(n + 100 AS DOUBLE) AS enc
        FROM per_seg CROSS JOIN gstats
    """,
    doc="Smoothed mean target encoding of customer market segment against "
        "the is-URGENT order label (the categorical-feature encoder of a "
        "tabular training pipeline): enc = (pos + m*prior)/(n + m) with "
        "m = 100 pseudo-observations of the global rate. The raw counts "
        "(n, pos, g_pos, g_n) are exact integers in the output; enc is a "
        "FIXED 4-op IEEE expression (div, mul, add, div over 2^53-exact "
        "ints) evaluated in the identical order by both engines, so it "
        "hash-matches with no quantization and — unlike an all-integer "
        "cross-multiplied form — never overflows at corpus scale. Plan: "
        "one fact-to-dim equi-join, one segment agg, one scalar agg "
        "broadcast back; nothing grows with the fact table but the join.",
    tags=("ml", "stats"),
)
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    labeled = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("tgt"),
        )
    )
    glob = labeled.agg(
        F.sum("tgt").alias("g_pos"), F.count("*").alias("g_n")
    )
    per_seg = labeled.groupBy("segment").agg(
        F.count("*").alias("n"), F.sum("tgt").alias("pos")
    )
    enc = (
        F.col("pos").cast("double")
        + F.lit(100.0)
        * (F.col("g_pos").cast("double") / F.col("g_n").cast("double"))
    ) / (F.col("n") + F.lit(100)).cast("double")
    return per_seg.crossJoin(F.broadcast(glob)).select(
        "segment", "n", "pos", "g_pos", "g_n", enc.alias("enc")
    )


_PREF_STOPWORDS = ("the", "a", "of", "and", "to", "in")
_PREF_K = 3
_PREF_Q = 1 << 20


@register(
    "ml_preference_pairs",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang, source,
                   CAST(len(w) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(w, x -> x IN
                        ({", ".join(f"'{s}'" for s in _PREF_STOPWORDS)})))
                        AS BIGINT) AS stop_hits
            FROM (
                SELECT doc_id, lang, source,
                       list_filter(string_split_regex(text,
                           '[ \\t\\n\\r\\f]+'), x -> x <> '') AS w
                FROM documents
            )
            WHERE len(w) > 0
        ), keyed AS (
            SELECT doc_id, lang, source,
                   (stop_hits * {_PREF_Q}) // n_tokens AS score
            FROM scored
        ), ranked AS (
            SELECT doc_id, lang, source, score,
                   row_number() OVER (PARTITION BY lang, source
                                      ORDER BY score DESC, doc_id) AS rn_c,
                   row_number() OVER (PARTITION BY lang, source
                                      ORDER BY score ASC, doc_id DESC) AS rn_r
            FROM keyed
        )
        SELECT c.lang, c.source, CAST(c.rn_c AS INTEGER) AS pair_rank,
               c.doc_id AS chosen_doc, r.doc_id AS rejected_doc,
               c.score AS chosen_score, r.score AS rejected_score
        FROM ranked c
        JOIN ranked r
          ON c.lang = r.lang AND c.source = r.source AND c.rn_c = r.rn_r
        WHERE c.rn_c <= {_PREF_K} AND c.score > r.score
    """,
    doc="Preference-pair mining (the DPO/RLHF data-prep step): within "
        "each (lang, source) stratum, pair the k best-scored documents "
        "with the k worst as (chosen, rejected), matched by rank. The "
        "quality key is the stopword-density rational quantized by EXACT "
        "integer division ((hits * 2^20) div n_tokens — Spark `div` == "
        "DuckDB `//`, truncation toward zero), so ranking never touches "
        "a double; ties break on doc_id, opposite directions on the two "
        "ends so a tiny stratum can't pair a doc with itself, and equal-"
        "score pairs are dropped (chosen must STRICTLY outscore "
        "rejected). Plan: tokens/hits compute map-side; both row_number "
        "windows share one (lang, source) Exchange, and the self-join's "
        "two sides re-derive partition-local window passes from that "
        "shared Exchange (CPU x2 on the dimension-scale scored relation, "
        "zero extra shuffles — verified in the formatted plan); group "
        "state never exceeds documents-per-stratum.",
    tags=("ml", "text"),
)
def ml_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..functions.text import tokens

    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    stop_lst = F.array(*[F.lit(s) for s in _PREF_STOPWORDS])
    scored = t.documents.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(
            F.filter(toks, lambda x: F.array_contains(stop_lst, x))
        ).cast("bigint").alias("stop_hits"),
    ).where(F.col("n_tokens") > 0)
    keyed = scored.select(
        "doc_id",
        "lang",
        "source",
        F.expr(f"(stop_hits * {_PREF_Q}) div n_tokens").alias("score"),
    )
    w_c = W.partitionBy("lang", "source").orderBy(
        F.col("score").desc(), "doc_id"
    )
    w_r = W.partitionBy("lang", "source").orderBy(
        F.col("score").asc(), F.col("doc_id").desc()
    )
    ranked = keyed.select(
        "doc_id",
        "lang",
        "source",
        "score",
        F.row_number().over(w_c).alias("rn_c"),
        F.row_number().over(w_r).alias("rn_r"),
    )
    c = ranked.alias("c")
    r = ranked.alias("r")
    return (
        c.join(
            r,
            (F.col("c.lang") == F.col("r.lang"))
            & (F.col("c.source") == F.col("r.source"))
            & (F.col("c.rn_c") == F.col("r.rn_r")),
        )
        .where((F.col("c.rn_c") <= _PREF_K)
               & (F.col("c.score") > F.col("r.score")))
        .select(
            F.col("c.lang").alias("lang"),
            F.col("c.source").alias("source"),
            F.col("c.rn_c").cast("int").alias("pair_rank"),
            F.col("c.doc_id").alias("chosen_doc"),
            F.col("r.doc_id").alias("rejected_doc"),
            F.col("c.score").alias("chosen_score"),
            F.col("r.score").alias("rejected_score"),
        )
    )


_NEG_POOL = 64
_NEG_K = 4


@register(
    "ml_negative_sampling",
    oracle=f"""
        WITH pos AS (
            SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        ),
        pool AS (
            SELECT part FROM (
                SELECT p_partkey AS part,
                       row_number() OVER (
                           ORDER BY CAST(('0x' || substr(md5(
                               CAST(p_partkey AS VARCHAR)), 1, 13))
                               AS UBIGINT),
                               p_partkey) AS rn
                FROM part
            ) WHERE rn <= {_NEG_POOL}
        ),
        cand AS (
            SELECT c.cust, pool.part,
                   CAST(('0x' || substr(md5(CAST(c.cust AS VARCHAR)
                       || '#' || CAST(pool.part AS VARCHAR)), 1, 13))
                       AS UBIGINT) AS h
            FROM (SELECT DISTINCT cust FROM pos) c CROSS JOIN pool
        ),
        surv AS (
            SELECT cust, part, h FROM cand c
            WHERE NOT EXISTS (
                SELECT 1 FROM pos p
                WHERE p.cust = c.cust AND p.part = c.part
            )
        )
        SELECT cust, CAST(rn AS INTEGER) AS neg_rank, part FROM (
            SELECT cust, part,
                   row_number() OVER (PARTITION BY cust
                                      ORDER BY h, part) AS rn
            FROM surv
        ) WHERE rn <= {_NEG_K}
    """,
    doc="Deterministic negative sampling for recommender/contrastive "
        "training: per active customer, 4 parts they never ordered, "
        "drawn from a fixed 64-part candidate pool. Both 'random' "
        "choices are md5-derandomized (pool = smallest md5(partkey); "
        "per-customer order = md5(cust#part)) so the sample is "
        "reproducible and cross-engine bit-identical while staying "
        "hash-uniform. The rank is assigned AFTER the anti-join, so "
        "every customer gets exactly k negatives whenever the pool "
        "minus their positives has k left. Plan: one fact-scale "
        "distinct for positives, a broadcast 64-row pool fanned out to "
        "64 rows/customer, one anti-join on (cust, part), one bounded "
        "window — nothing quadratic in catalog size, and the pool "
        "constant is the only knob at 100 TB.",
    tags=("ml",),
)
def ml_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    pos = (
        t.orders.join(
            t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey
        )
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
        )
        .distinct()
    )
    pool_h = F.conv(
        F.substring(F.md5(F.col("p_partkey").cast("string")), 1, 13), 16, 10
    ).cast("long")
    # orderBy + limit plans as TakeOrderedAndProject (distributed top-k
    # with per-partition pruning), NOT the single-partition global-window
    # sort a row_number() formulation would force on the parts catalog.
    pool = (
        t.part.select(F.col("p_partkey").alias("part"), pool_h.alias("h"))
        .orderBy(F.col("h"), F.col("part"))
        .limit(_NEG_POOL)
        .select("part")
    )
    custs = pos.select("cust").distinct()
    cand_h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("cust").cast("string"),
                    F.lit("#"),
                    F.col("part").cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    cand = custs.crossJoin(F.broadcast(pool)).select(
        "cust", "part", cand_h.alias("h")
    )
    surv = cand.join(pos, ["cust", "part"], "left_anti")
    win = W.partitionBy("cust").orderBy(F.col("h"), F.col("part"))
    return (
        surv.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= _NEG_K)
        .select("cust", F.col("rn").cast("int").alias("neg_rank"), "part")
    )


@register(
    "ml_chi2_association",
    oracle="""
        WITH labeled AS (
            SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        cells AS (
            SELECT seg, pri, CAST(count(*) AS BIGINT) AS o
            FROM labeled GROUP BY seg, pri
        ),
        rows_ AS (
            SELECT seg, CAST(count(*) AS BIGINT) AS r
            FROM labeled GROUP BY seg
        ),
        cols_ AS (
            SELECT pri, CAST(count(*) AS BIGINT) AS c
            FROM labeled GROUP BY pri
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM labeled),
        grid AS (
            SELECT r_.seg, c_.pri, r_.r, c_.c, t.t,
                   coalesce(cl.o, 0) AS o
            FROM rows_ r_
            CROSS JOIN cols_ c_
            CROSS JOIN tot t
            LEFT JOIN cells cl ON cl.seg = r_.seg AND cl.pri = c_.pri
        ),
        scored AS (
            SELECT seg, pri, o, r, c, t,
                   (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
                       / CAST(t AS DOUBLE) AS e,
                   (CAST(o AS DOUBLE)
                    - (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
                      / CAST(t AS DOUBLE))
                   * (CAST(o AS DOUBLE)
                      - (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
                        / CAST(t AS DOUBLE))
                   / ((CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
                      / CAST(t AS DOUBLE)) AS cell
            FROM grid
        ),
        total AS (
            SELECT list_sum(list_transform(
                       list_sort(list({'s': seg, 'p': pri, 'v': cell})),
                       x -> x.v)) AS chi2
            FROM scored
        )
        SELECT s.seg, s.pri, s.o, s.e, s.cell,
               CAST(t.chi2 AS DOUBLE) AS chi2
        FROM scored s CROSS JOIN total t
    """,
    doc="Chi-square association between customer market segment and "
        "order priority — the categorical feature-selection statistic "
        "(the transcendental-free sibling of mutual information). Every "
        "expected count e = r*c/t and cell term (o-e)^2/e is the "
        "IDENTICAL sequence of correctly-rounded IEEE ops on 2^53-exact "
        "integer marginals (casting to double BEFORE the product also "
        "sidesteps the r*c int64 overflow at corpus scale), zero cells "
        "are materialized by the marginal cross join so sparse "
        "contingency tables score correctly, and the chi2 TOTAL is a "
        "fold over the (seg, pri)-sorted cell list — deterministic "
        "summation order in both engines (the cosine list_sum rule), "
        "where a grouped SUM of doubles would drift. Plan: one fact-dim "
        "join, three tiny aggs, a bounded #seg x #pri grid.",
    tags=("ml", "stats"),
)
def ml_chi2_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    labeled = t.orders.join(
        t.customer, t.orders.o_custkey == t.customer.c_custkey
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("pri"),
    )
    cells = labeled.groupBy("seg", "pri").agg(F.count("*").alias("o"))
    rows_ = labeled.groupBy("seg").agg(F.count("*").alias("r"))
    cols_ = labeled.groupBy("pri").agg(F.count("*").alias("c"))
    tot = labeled.agg(F.count("*").alias("t"))
    grid = (
        rows_.crossJoin(cols_)
        .crossJoin(F.broadcast(tot))
        .join(cells, ["seg", "pri"], "left")
        .select(
            "seg",
            "pri",
            "r",
            "c",
            "t",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    e = (
        F.col("r").cast("double") * F.col("c").cast("double")
    ) / F.col("t").cast("double")
    d = F.col("o").cast("double") - e
    scored = grid.select(
        "seg", "pri", "o", "r", "c", "t",
        e.alias("e"),
        (d * d / e).alias("cell"),
    )
    folded = scored.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("seg").alias("s"),
                        F.col("pri").alias("p"),
                        F.col("cell").alias("v"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["v"],
        ).alias("chi2")
    )
    return scored.crossJoin(F.broadcast(folded)).select(
        "seg", "pri", "o", "e", "cell",
        F.col("chi2").cast("double").alias("chi2"),
    )


@register(
    "ml_auc_exact",
    oracle="""
        WITH scored AS (
            SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 16.0)
                        AS BIGINT) AS s,
                   CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y
            FROM embeddings
        ),
        grp AS (
            SELECT s, CAST(count(*) AS BIGINT) AS c,
                   CAST(SUM(y) AS BIGINT) AS cp
            FROM scored GROUP BY s
        ),
        ranked AS (
            SELECT s, c, cp,
                   CAST(coalesce(SUM(c) OVER (
                       ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS before
            FROM grp
        ),
        tot AS (
            SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(count(*) - SUM(y) AS BIGINT) AS n_neg
            FROM scored
        ),
        agg AS (
            SELECT CAST(SUM(cp * (2 * (before + 1) + c - 1)) AS BIGINT)
                       AS two_ranksum
            FROM ranked
        )
        SELECT t.n_pos, t.n_neg,
               a.two_ranksum - t.n_pos * (t.n_pos + 1) AS u2,
               CASE WHEN t.n_pos > 0 AND t.n_neg > 0
                    THEN CAST(a.two_ranksum - t.n_pos * (t.n_pos + 1)
                              AS DOUBLE)
                         / CAST(2 * t.n_pos * t.n_neg AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS auc
        FROM agg a CROSS JOIN tot t
    """,
    doc="Exact ROC AUC via the Mann-Whitney rank-sum identity, with "
        "proper midrank tie handling done in INTEGER arithmetic: scores "
        "are bucketed (floor(e1*16) — floor of one exact double product, "
        "deliberately coarse so ties exercise the midrank path), each "
        "tied group contributes cp * (2*(rank_start) + c - 1) in "
        "HALF-rank units, so two_ranksum and U2 = 2U are exact int64 "
        "and AUC is ONE correctly-rounded division — no per-pair "
        "comparisons (the naive O(n_pos*n_neg) definition) and no "
        "float rank averaging. Single-class corpora zero-guard to 0. "
        "Plan: one grouped count per score bucket, one bounded "
        "value-ordered window over buckets (not rows), two scalar aggs "
        "— AUC over 100 TB of scores costs one shuffle of the bucket "
        "histogram.",
    tags=("ml", "stats"),
)
def ml_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_running_sums_dist

    t = Tables(spark, sf_dir)
    e1 = F.col("embedding").getItem(0).cast("double")
    scored = t.embeddings.select(
        F.floor(e1 * F.lit(16.0)).cast("bigint").alias("s"),
        F.when(F.col("label") % 2 == 1, 1).otherwise(0).alias("y"),
    )
    grp = scored.groupBy("s").agg(
        F.count("*").alias("c"), F.sum("y").alias("cp")
    )
    # exclusive cumsum over the bucket histogram, distributed (range
    # repartition + per-partition window — no unpartitioned WindowExec)
    ranked = with_running_sums_dist(
        grp, [F.col("s").asc()], ["c"], prefix="before_", inclusive=False
    ).withColumnRenamed("before_c", "before")
    tot = scored.agg(
        F.sum("y").alias("n_pos"),
        (F.count("*") - F.sum("y")).alias("n_neg"),
    )
    agg = ranked.agg(
        F.sum(
            F.col("cp")
            * (2 * (F.col("before") + 1) + F.col("c") - 1)
        ).alias("two_ranksum")
    )
    u2 = F.col("two_ranksum") - F.col("n_pos") * (F.col("n_pos") + 1)
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        u2.cast("double")
        / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.crossJoin(F.broadcast(tot)).select(
        "n_pos", "n_neg", u2.alias("u2"), auc.alias("auc")
    )


def _spearman_rank_sql(var: str) -> str:
    """2x-midrank assignment for one variable over the metrics CTE."""
    return f"""
            SELECT {var} AS v,
                   2 * CAST(coalesce(SUM(c) OVER (
                       ORDER BY {var}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) + CAST(c AS BIGINT) + 1 AS mr2
            FROM (
                SELECT {var}, CAST(count(*) AS BIGINT) AS c
                FROM metrics GROUP BY {var}
            )"""


@register(
    "ml_spearman_corr",
    oracle=f"""
        WITH metrics AS (
            SELECT o.o_custkey AS custkey,
                   CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS x,
                   CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS y
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey
        ),
        rx AS ({_spearman_rank_sql("x")}),
        ry AS ({_spearman_rank_sql("y")}),
        paired AS (
            SELECT rx.mr2 AS a, ry.mr2 AS b
            FROM metrics m
            JOIN rx ON rx.v = m.x
            JOIN ry ON ry.v = m.y
        ),
        sums AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(a) AS BIGINT) AS sa,
                   CAST(SUM(b) AS BIGINT) AS sb,
                   CAST(SUM(a * a) AS BIGINT) AS saa,
                   CAST(SUM(b * b) AS BIGINT) AS sbb,
                   CAST(SUM(a * b) AS BIGINT) AS sab
            FROM paired
        )
        , dec AS (
            SELECT n,
                   CAST(n AS DECIMAL(38,0)) AS nd,
                   CAST(sa AS DECIMAL(38,0)) AS sad,
                   CAST(sb AS DECIMAL(38,0)) AS sbd,
                   CAST(saa AS DECIMAL(38,0)) AS saad,
                   CAST(sbb AS DECIMAL(38,0)) AS sbbd,
                   CAST(sab AS DECIMAL(38,0)) AS sabd
            FROM sums
        )
        SELECT n,
               CAST(CAST(nd * sabd - sad * sbd AS VARCHAR) AS DOUBLE)
                   AS num,
               CAST(CAST(nd * saad - sad * sad AS VARCHAR) AS DOUBLE)
                   AS va,
               CAST(CAST(nd * sbbd - sbd * sbd AS VARCHAR) AS DOUBLE)
                   AS vb,
               CASE WHEN nd * saad - sad * sad > 0
                     AND nd * sbbd - sbd * sbd > 0
                    THEN CAST(CAST(nd * sabd - sad * sbd AS VARCHAR)
                              AS DOUBLE)
                         / (sqrt(CAST(CAST(nd * saad - sad * sad
                                           AS VARCHAR) AS DOUBLE))
                            * sqrt(CAST(CAST(nd * sbbd - sbd * sbd
                                             AS VARCHAR) AS DOUBLE)))
                    ELSE CAST(0 AS DOUBLE) END AS spearman
        FROM dec
    """,
    doc="Spearman rank correlation between per-customer order count and "
        "total quantity: Pearson over 2x-MIDRANKS, where each tied value "
        "group's doubled midrank 2*rank_start + c - 1 + 2 is an exact "
        "int64 (the ml_auc_exact identity) — proper tie handling with "
        "zero float rank averaging. The six moment sums are exact "
        "integers, r is the identical sqrt/mul/div IEEE expression both "
        "sides (the ts_autocorr_lag recipe), constant variables guard "
        "to 0. Rank assignment runs over the VALUE HISTOGRAM (one "
        "bounded value-ordered window per variable), then joins back by "
        "value — rank-correlating 100 TB costs two histogram shuffles, "
        "not a global row sort. The moment PRODUCTS (n*saa <= 4n^4) "
        "overflow int64 past ~39k rows, so they are formed in "
        "DECIMAL(38,0) — exact to 10^38, good to ~10^9 rows — and cross "
        "to double via the exact decimal's shortest-string value "
        "(correctly-rounded identically in both engines).",
    tags=("ml", "stats"),
)
def ml_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    metrics = (
        t.orders.join(
            t.lineitem, t.lineitem.l_orderkey == t.orders.o_orderkey
        )
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.countDistinct("o_orderkey").alias("x"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("y"),
        )
    )

    def ranks(var: str) -> DataFrame:
        from ..functions.ranking import with_running_sums_dist

        hist = metrics.groupBy(var).agg(F.count("*").alias("c"))
        cum = with_running_sums_dist(
            hist,
            [F.col(var).asc()],
            ["c"],
            prefix="pre_",
            inclusive=False,
        )
        return cum.select(
            F.col(var).alias("v"),
            (2 * F.col("pre_c") + F.col("c") + 1).alias("mr2"),
        )

    rx = ranks("x").withColumnRenamed("mr2", "a")
    ry = ranks("y").withColumnRenamed("mr2", "b")
    paired = (
        metrics.join(F.broadcast(rx), metrics.x == rx.v)
        .join(F.broadcast(ry), metrics.y == ry.v)
        .select("a", "b")
    )
    sums = paired.agg(
        F.count("*").alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = d("n") * d("sab") - d("sa") * d("sb")
    va = d("n") * d("saa") - d("sa") * d("sa")
    vb = d("n") * d("sbb") - d("sb") * d("sb")
    r = F.when(
        (va > 0) & (vb > 0),
        num.cast("double")
        / (F.sqrt(va.cast("double")) * F.sqrt(vb.cast("double"))),
    ).otherwise(F.lit(0.0))
    return sums.select(
        "n",
        num.cast("double").alias("num"),
        va.cast("double").alias("va"),
        vb.cast("double").alias("vb"),
        r.alias("spearman"),
    )


@register(
    "ml_ks_statistic",
    oracle="""
        WITH scored AS (
            SELECT CAST(floor(CAST(value AS DOUBLE) * 16.0) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS b
            FROM events
            WHERE event_type IN ('purchase', 'click')
        ),
        hist AS (
            SELECT s, CAST(SUM(a) AS BIGINT) AS ca,
                   CAST(SUM(b) AS BIGINT) AS cb
            FROM scored GROUP BY s
        ),
        cum AS (
            SELECT s,
                   CAST(SUM(ca) OVER w AS BIGINT) AS ca_cum,
                   CAST(SUM(cb) OVER w AS BIGINT) AS cb_cum
            FROM hist
            WINDOW w AS (ORDER BY s
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        tot AS (
            SELECT CAST(SUM(a) AS BIGINT) AS na,
                   CAST(SUM(b) AS BIGINT) AS nb
            FROM scored
        ),
        gaps AS (
            SELECT s, abs(ca_cum * t.nb - cb_cum * t.na) AS gap,
                   t.na, t.nb
            FROM cum CROSS JOIN tot t
        )
        SELECT s AS ks_bucket, na, nb, gap AS d_num,
               CASE WHEN na > 0 AND nb > 0
                    THEN CAST(gap AS DOUBLE) / CAST(na * nb AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS ks
        FROM (
            SELECT *, row_number() OVER (ORDER BY gap DESC, s) AS rk
            FROM gaps
        ) WHERE rk = 1
    """,
    doc="Two-sample Kolmogorov-Smirnov statistic between the purchase "
        "and click value distributions (the drift test a feature-"
        "monitoring pipeline runs between cohorts): D = max over "
        "thresholds of |F_a - F_b|, computed entirely in integers by "
        "cross-multiplying the cumulative counts (|ca_cum*nb - "
        "cb_cum*na| — the common-denominator trick), so the max and its "
        "argmax bucket are exact and the final KS value is one "
        "correctly-rounded division. Values are bucketed by "
        "floor(value*16) (one exact double product) and the CDFs walk "
        "the bucket HISTOGRAM with one value-ordered window — at 100 TB "
        "the window state is #buckets, never #rows. Empty cohorts guard "
        "to 0.",
    tags=("ml", "stats"),
)
def ml_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_running_sums_dist

    t = Tables(spark, sf_dir)
    scored = t.events.where(
        F.col("event_type").isin("purchase", "click")
    ).select(
        F.floor(F.col("value").cast("double") * F.lit(16.0))
        .cast("bigint")
        .alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("b"),
    )
    hist = scored.groupBy("s").agg(
        F.sum("a").alias("ca"), F.sum("b").alias("cb")
    )
    # distributed inclusive cumsum over the value histogram (no
    # unpartitioned window), then a windowless argmax: max over the
    # (gap, -s) struct realizes ORDER BY gap DESC, s ASC pick-first
    cum = with_running_sums_dist(
        hist, [F.col("s").asc()], ["ca", "cb"], prefix="cum_"
    ).select(
        "s",
        F.col("cum_ca").alias("ca_cum"),
        F.col("cum_cb").alias("cb_cum"),
    )
    tot = scored.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "s",
        F.abs(
            F.col("ca_cum") * F.col("nb") - F.col("cb_cum") * F.col("na")
        ).alias("gap"),
        "na",
        "nb",
    )
    best = gaps.agg(
        F.max(
            F.struct(
                F.col("gap"),
                (-F.col("s")).alias("neg_s"),
                F.col("na"),
                F.col("nb"),
            )
        ).alias("m")
    ).select(
        (-F.col("m.neg_s")).alias("s"),
        F.col("m.gap").alias("gap"),
        F.col("m.na").alias("na"),
        F.col("m.nb").alias("nb"),
    )
    ks = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0),
        F.col("gap").cast("double")
        / (F.col("na") * F.col("nb")).cast("double"),
    ).otherwise(F.lit(0.0))
    return best.select(
        F.col("s").alias("ks_bucket"),
        "na",
        "nb",
        F.col("gap").alias("d_num"),
        ks.alias("ks"),
    )


@register(
    "ml_gini_concentration",
    oracle="""
        WITH spend AS (
            SELECT o_custkey AS custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS x
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT x, CAST(row_number() OVER (ORDER BY x, custkey)
                           AS BIGINT) AS i
            FROM spend
        ),
        sums AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   SUM(x) AS s,
                   SUM(i * x) AS s1
            FROM ranked
        )
        SELECT n,
               CAST(CAST(s AS VARCHAR) AS DOUBLE) AS total_spend,
               CAST(CAST(2 * s1 - (n + 1) * s AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(n * s AS VARCHAR) AS DOUBLE) AS gini
        FROM sums
    """,
    doc="Gini coefficient of customer spend concentration — the "
        "inequality metric a curation pipeline tracks for source/"
        "contributor skew: G = (2*sum(i*x_i) - (n+1)*sum(x)) / "
        "(n*sum(x)) over spend sorted ascending. Every sum is EXACT "
        "decimal (rank i is int64, i*x stays decimal; tie positions "
        "among equal x don't change sum(i*x), and the (x, custkey) "
        "order is total anyway), both operands reach double through the "
        "shortest-string hop, and G is one correctly-rounded division. "
        "n*sum and (n+1)*sum stay inside DECIMAL(38,4) to ~10^15 "
        "customers x 10^8 spend. Ranks are assigned DISTRIBUTED "
        "(functions/ranking.py two-level rank: range repartition + "
        "per-partition row_number + broadcast offsets) — no "
        "unpartitioned window over the customer dimension.",
    tags=("ml", "stats"),
)
def ml_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_global_rank

    t = Tables(spark, sf_dir)
    spend = t.orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("x")
    )
    ranked = with_global_rank(
        spend, [F.col("x").asc(), F.col("custkey").asc()], rank_col="i"
    ).select("x", "i")
    sums = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("i") * F.col("x")).alias("s1"),
    )
    num = (2 * F.col("s1") - (F.col("n") + 1) * F.col("s")).cast("double")
    den = (F.col("n") * F.col("s")).cast("double")
    return sums.select(
        "n",
        F.col("s").cast("double").alias("total_spend"),
        (num / den).alias("gini"),
    )


@register(
    "q_decile_lift",
    oracle="""
        WITH scored AS (
            SELECT vec_id,
                   CAST(floor(CAST(embedding[1] AS DOUBLE) * 16.0)
                        AS BIGINT) AS s,
                   CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y
            FROM embeddings
        ),
        tiled AS (
            SELECT y, ntile(10) OVER (ORDER BY s DESC, vec_id) AS decile
            FROM scored
        ),
        per AS (
            SELECT CAST(decile AS INTEGER) AS decile,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS pos
            FROM tiled GROUP BY decile
        ),
        cum AS (
            SELECT decile, n, pos,
                   CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
                   CAST(SUM(pos) OVER w AS BIGINT) AS cum_pos,
                   CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
                   CAST(SUM(pos) OVER () AS BIGINT) AS tot_pos
            FROM per
            WINDOW w AS (ORDER BY decile
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT decile, n, pos, cum_n, cum_pos,
               CASE WHEN tot_pos > 0
                    THEN CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS capture,
               CASE WHEN cum_n * tot_pos > 0
                    THEN CAST(cum_pos * tot_n AS DOUBLE)
                         / CAST(cum_n * tot_pos AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS lift
        FROM cum
    """,
    doc="Decile lift / gains table for the bucketed embedding score "
        "against the odd-label target — the business-facing readout of "
        "ml_auc_exact's ranking quality (top-decile capture and lift "
        "drive campaign sizing). ntile(10) over the UNIQUE total order "
        "(score desc, vec_id) is deterministic in both engines "
        "(SQL-standard equal buckets, remainder to the first); capture "
        "is one exact division and lift is cross-multiplied to the "
        "single division (cum_pos*tot_n)/(cum_n*tot_pos) of exact int64 "
        "products (<= n^2), zero-guarded for empty targets. Deciles "
        "come from the DISTRIBUTED two-level rank (range repartition + "
        "per-partition row_number + broadcast offsets + windowless "
        "integer ntile arithmetic, functions/ranking.py) — no "
        "unpartitioned window ever sorts the scored table on one task.",
    tags=("ml", "stats"),
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import (
        ntile_from_rank,
        with_global_rank,
        with_running_sums,
    )

    t = Tables(spark, sf_dir)
    e1 = F.col("embedding").getItem(0).cast("double")
    scored = t.embeddings.select(
        "vec_id",
        F.floor(e1 * F.lit(16.0)).cast("bigint").alias("s"),
        F.when(F.col("label") % 2 == 1, 1).otherwise(0).alias("y"),
    )
    tiled = with_global_rank(
        scored,
        [F.col("s").desc(), F.col("vec_id").asc()],
        rank_col="gr",
        total_col="n_tot",
    ).select(
        "y",
        ntile_from_rank(F.col("gr"), F.col("n_tot"), 10).alias("decile"),
    )
    per = tiled.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    # 10-row cumsum + totals, windowless
    cum = with_running_sums(
        per, "decile", ["n", "pos"], prefix="cum_", totals_prefix="tot_"
    )
    capture = F.when(
        F.col("tot_pos") > 0,
        F.col("cum_pos").cast("double") / F.col("tot_pos").cast("double"),
    ).otherwise(F.lit(0.0))
    lift = F.when(
        F.col("cum_n") * F.col("tot_pos") > 0,
        (F.col("cum_pos") * F.col("tot_n")).cast("double")
        / (F.col("cum_n") * F.col("tot_pos")).cast("double"),
    ).otherwise(F.lit(0.0))
    return cum.select(
        "decile", "n", "pos", "cum_n", "cum_pos",
        capture.alias("capture"), lift.alias("lift"),
    )


@register(
    "q_rfm_segments",
    oracle="""
        WITH base AS (
            SELECT o_custkey AS custkey,
                   max(o_orderdate) AS last_order,
                   CAST(count(*) AS BIGINT) AS frequency,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
            FROM orders GROUP BY o_custkey
        ),
        anchor AS (SELECT max(o_orderdate) AS now FROM orders),
        rfm AS (
            SELECT custkey,
                   CAST(date_diff('day', last_order, a.now) AS BIGINT)
                       AS recency_days,
                   frequency, monetary,
                   ntile(5) OVER (ORDER BY
                       date_diff('day', last_order, a.now), custkey)
                       AS r_score,
                   ntile(5) OVER (ORDER BY frequency DESC, custkey)
                       AS f_score,
                   ntile(5) OVER (ORDER BY monetary DESC, custkey)
                       AS m_score
            FROM base CROSS JOIN anchor a
        )
        SELECT CAST(r_score AS INTEGER) AS r_score,
               CAST(f_score AS INTEGER) AS f_score,
               CAST(m_score AS INTEGER) AS m_score,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(CAST(SUM(monetary) AS VARCHAR) AS DOUBLE)
                   AS segment_revenue
        FROM rfm
        GROUP BY r_score, f_score, m_score
    """,
    doc="RFM segmentation (recency / frequency / monetary — the "
        "classic CRM scoring grid): per customer, integer day-recency "
        "against the corpus max date, order count, and exact-decimal "
        "spend, each quintiled by ntile(5) over a UNIQUE total order "
        "(metric, custkey) — deterministic in both engines, score 1 = "
        "best (most recent / most frequent / highest spend). Output is "
        "the up-to-125-cell segment grid with exact counts and decimal "
        "revenue. Three chained DISTRIBUTED two-level ranks "
        "(functions/ranking.py: range repartition + per-partition "
        "row_number + broadcast offsets) + one bounded grid agg — no "
        "unpartitioned window sorts the customer dimension.",
    tags=("ml", "relational"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import ntile_from_rank, with_global_rank

    t = Tables(spark, sf_dir)
    base = t.orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias(
            "monetary"
        ),
    )
    anchor = t.orders.agg(F.max("o_orderdate").alias("now"))
    rfm = base.crossJoin(F.broadcast(anchor)).select(
        "custkey",
        F.datediff(F.col("now"), F.col("last_order"))
        .cast("bigint")
        .alias("recency_days"),
        "frequency",
        "monetary",
    )
    # three quintiles = three chained distributed ranks (each a range
    # repartition + per-partition row_number; no join-back needed since
    # the rank column rides along the chain) — zero unpartitioned windows
    scored = rfm
    for metric, order in (
        ("r_score", [F.col("recency_days").asc(), F.col("custkey").asc()]),
        ("f_score", [F.col("frequency").desc(), F.col("custkey").asc()]),
        ("m_score", [F.col("monetary").desc(), F.col("custkey").asc()]),
    ):
        scored = with_global_rank(
            scored, order, rank_col="__r", total_col="__n"
        ).withColumn(
            metric, ntile_from_rank(F.col("__r"), F.col("__n"), 5)
        ).drop("__r", "__n")
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers"),
        F.sum("monetary").cast("double").alias("segment_revenue"),
    )


_CF_TOPN = 5  # neighbors kept per item


def _basket_items(spark: SparkSession, t: Tables) -> DataFrame:
    """One row per order: the DISTINCT item set as an array, grouped in
    a single keyed aggregation. collect_set subsumes the oracle's
    `SELECT DISTINCT l_orderkey, l_partkey` (set semantics per order),
    so the basket self-join the CF family used to run — two shuffles of
    the fact slice plus the join — collapses to ONE collect_set shuffle,
    with the pair expansion running map-side as a HOF product (the
    cooccurrence_directed pattern, graph.py:107). Keyed pre-repartition
    for the same reason as there: the fact parquet arrives as 1-2 input
    splits and the partial aggregate would otherwise run near-serial."""
    return (
        t.lineitem.select("l_orderkey", "l_partkey")
        .repartition(spark.sparkContext.defaultParallelism, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("items"))
    )


def _basket_pair_counts(per_order: DataFrame, symmetric: bool) -> DataFrame:
    """(item, nbr, c_ab) basket co-occurrence counts from the per-order
    item-set table. Basket size is bounded (~7 lineitems per order), so
    the within-order pair product is a bounded map-side explode —
    per distinct pair this emits exactly the rows of the oracle's
    a.l_partkey < b.l_partkey self-join (and its swap when
    ``symmetric``), because collect_set already deduplicated per order."""
    cond = (lambda x, y: x != y) if symmetric else (lambda x, y: x < y)
    pair_arr = F.flatten(
        F.transform(
            F.col("items"),
            lambda x: F.transform(
                F.filter(F.col("items"), lambda y: cond(x, y)),
                lambda y: F.struct(x.alias("item"), y.alias("nbr")),
            ),
        )
    )
    return (
        per_order.select(F.explode(pair_arr).alias("p"))
        .select("p.item", "p.nbr")
        .groupBy("item", "nbr")
        .agg(F.count("*").alias("c_ab"))
    )


@register(
    "ml_item_cf",
    oracle=f"""
        WITH baskets AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), item_n AS (
            SELECT l_partkey AS item, CAST(count(*) AS BIGINT) AS c
            FROM baskets GROUP BY 1
        ), pair_c AS (
            SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
                   CAST(count(*) AS BIGINT) AS c_ab
            FROM baskets a
            JOIN baskets b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ), sym AS (
            SELECT item_a AS item, item_b AS nbr, c_ab FROM pair_c
            UNION ALL
            SELECT item_b, item_a, c_ab FROM pair_c
        ), scored AS (
            SELECT s.item, s.nbr, s.c_ab,
                   round(CAST(s.c_ab AS DOUBLE)
                         / sqrt(CAST(na.c AS DOUBLE)
                                * CAST(nb.c AS DOUBLE)), 6) AS sim
            FROM sym s
            JOIN item_n na ON na.item = s.item
            JOIN item_n nb ON nb.item = s.nbr
            WHERE s.c_ab >= 2
        )
        SELECT item, nbr, c_ab, sim FROM (
            SELECT item, nbr, c_ab, sim,
                   row_number() OVER (PARTITION BY item
                                      ORDER BY sim DESC, nbr) AS rk
            FROM scored
        ) WHERE rk <= {_CF_TOPN}
    """,
    doc="Item-item collaborative filtering (the Amazon-style 'customers "
        "who bought X also bought Y' recommender): co-purchase counts "
        "over order baskets -> cosine similarity on the implicit 0/1 "
        "basket matrix, sim(a,b) = c_ab / sqrt(c_a * c_b), top-5 "
        "neighbors per item at support >= 2. Counts are exact integers, "
        "the similarity is one fixed sqrt/div sequence rounded to 6 "
        "before ranking with an item-id tie-break (the repo similarity "
        "convention). Pair volume is bounded by per-order basket size "
        "(~7 lineitems -> <=21 unordered pairs per order), so the "
        "self-join is linear in lineitem at any corpus scale — the same "
        "shape as the supplier co-occurrence graph, never user x user.",
    bench=True,
    tags=("ml",),
)
def ml_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    # one fact aggregation feeds BOTH the pair counts and the per-item
    # basket counts — lazy checkpoint so the two consumers read it once
    # (round-7 §13; was: distinct + self-join + separate groupBy = three
    # fact-scale shuffles, bench median 3.98 s at sf0.1)
    per_order = _basket_items(spark, t).localCheckpoint(eager=False)
    item_n = (
        per_order.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("c"))
    )
    # both orientations emitted by the expansion (!=, not <) so ONE
    # aggregation produces the symmetric neighbor table — the union of
    # a <-trimmed pair table duplicated the whole lineage
    sym = _basket_pair_counts(per_order, symmetric=True)
    scored = (
        sym.filter(F.col("c_ab") >= 2)
        .join(item_n.select(F.col("item"), F.col("c").alias("ca")), "item")
        .join(
            item_n.select(F.col("item").alias("nbr"), F.col("c").alias("cb")),
            "nbr",
        )
        .select(
            "item",
            "nbr",
            "c_ab",
            F.round(
                F.col("c_ab").cast("double")
                / F.sqrt(F.col("ca").cast("double") * F.col("cb").cast("double")),
                6,
            ).alias("sim"),
        )
    )
    w = W.partitionBy("item").orderBy(F.desc("sim"), F.asc("nbr"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CF_TOPN)
        .select("item", "nbr", "c_ab", "sim")
    )


@register(
    "ml_cf_coverage",
    oracle=f"""
        WITH baskets AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), item_n AS (
            SELECT l_partkey AS item, CAST(count(*) AS BIGINT) AS c
            FROM baskets GROUP BY 1
        ), pair_c AS (
            SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
                   CAST(count(*) AS BIGINT) AS c_ab
            FROM baskets a
            JOIN baskets b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ), covered AS (
            SELECT DISTINCT item FROM (
                SELECT item_a AS item FROM pair_c WHERE c_ab >= 2
                UNION ALL
                SELECT item_b FROM pair_c WHERE c_ab >= 2
            )
        ), nums AS (
            SELECT CAST((SELECT count(*) FROM part) AS BIGINT)
                       AS n_catalog,
                   CAST((SELECT count(*) FROM item_n) AS BIGINT)
                       AS n_purchased,
                   CAST((SELECT count(*) FROM covered) AS BIGINT)
                       AS n_with_recs
        )
        SELECT n_catalog, n_purchased, n_with_recs,
               CAST(n_with_recs AS DOUBLE) / CAST(n_catalog AS DOUBLE)
                   AS catalog_coverage,
               CAST(n_with_recs AS DOUBLE) / CAST(n_purchased AS DOUBLE)
                   AS purchased_coverage
        FROM nums
    """,
    doc="Recommender catalog-coverage readout — the cold-start health "
        "metric reviewed alongside accuracy (a recommender that covers "
        "20% of the catalog funnels all traffic to head items no "
        "matter how good its precision is): how many catalog items "
        "were ever purchased, how many clear ml_item_cf's support "
        "threshold and therefore have at least one neighbor, and both "
        "coverage ratios (exact-integer divisions). Same bounded "
        "basket-pair aggregation as ml_item_cf; three scalar "
        "subqueries fold to one row.",
    tags=("ml",),
)
def ml_cf_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # shared per-order item sets (see ml_item_cf) — one fact aggregation
    # for both the item counts and the a<b pair counts
    per_order = _basket_items(spark, t).localCheckpoint(eager=False)
    item_n = (
        per_order.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("c"))
    )
    pair_c = (
        _basket_pair_counts(per_order, symmetric=False)
        .toDF("item_a", "item_b", "c_ab")
        .filter(F.col("c_ab") >= 2)
    )
    covered = (
        pair_c.select(F.col("item_a").alias("item"))
        .union(pair_c.select(F.col("item_b").alias("item")))
        .distinct()
    )
    nums = (
        t.part.agg(F.count("*").alias("n_catalog"))
        .crossJoin(item_n.agg(F.count("*").alias("n_purchased")))
        .crossJoin(covered.agg(F.count("*").alias("n_with_recs")))
    )
    return nums.select(
        "n_catalog",
        "n_purchased",
        "n_with_recs",
        (
            F.col("n_with_recs").cast("double")
            / F.col("n_catalog").cast("double")
        ).alias("catalog_coverage"),
        (
            F.col("n_with_recs").cast("double")
            / F.col("n_purchased").cast("double")
        ).alias("purchased_coverage"),
    )


_LEAK_T = 1 << 52
_LEAK_TRAIN = 3 * (_LEAK_T // 4)  # 75/25 md5 split


def _leakage_oracle() -> str:
    from .dedup import _JACCARD_ORACLE

    return f"""
        WITH pairs AS (
            {_JACCARD_ORACLE}
        ), tagged AS (
            SELECT p.doc_a, p.doc_b,
                   (CAST(('0x' || substr(md5(CAST(p.doc_a AS VARCHAR)),
                        1, 13)) AS UBIGINT) < {_LEAK_TRAIN}) AS a_train,
                   (CAST(('0x' || substr(md5(CAST(p.doc_b AS VARCHAR)),
                        1, 13)) AS UBIGINT) < {_LEAK_TRAIN}) AS b_train
            FROM pairs p
        )
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN a_train <> b_train THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cross_split,
               CAST(SUM(CASE WHEN a_train <> b_train THEN 1 ELSE 0 END)
                    AS DOUBLE)
                   / CAST(CASE WHEN count(*) = 0 THEN 1
                               ELSE count(*) END AS DOUBLE) AS leak_frac
        FROM tagged
    """


@register(
    "ml_holdout_leakage",
    oracle=_leakage_oracle(),
    doc="Train/test leakage audit — the check that catches the classic "
        "eval bug where near-duplicate documents straddle a random "
        "split and the model 'generalizes' to test items it memorized "
        "from train: count verified Jaccard>=0.8 near-dup pairs whose "
        "endpoints land on opposite sides of the 75/25 md5 document "
        "split. A nonzero leak_frac means dedup must run BEFORE "
        "splitting (the SemDeDup/C4 ordering). Composes the exact "
        "near-dup pair SQL with the md5 split predicate; all counts "
        "exact, one guarded division. The pair generation is the "
        "bounded LSH path on the Spark side (same shared oracle as "
        "dedup_minhash_lsh).",
    tags=("ml", "dedup"),
)
def ml_holdout_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    h = lambda c: F.conv(  # noqa: E731
        F.substring(F.md5(F.col(c).cast("string")), 1, 13), 16, 10
    ).cast("long")
    tagged = pairs.select(
        (h("doc_a") < F.lit(_LEAK_TRAIN)).alias("a_train"),
        (h("doc_b") < F.lit(_LEAK_TRAIN)).alias("b_train"),
    )
    cross = F.when(F.col("a_train") != F.col("b_train"), 1).otherwise(0)
    return tagged.agg(
        F.count("*").alias("n_pairs"),
        F.sum(cross).cast("bigint").alias("n_cross_split"),
        (
            F.sum(cross).cast("double")
            / F.when(F.count("*") == 0, 1)
            .otherwise(F.count("*"))
            .cast("double")
        ).alias("leak_frac"),
    )


@register(
    "ml_cohort_ltv",
    oracle="""
        WITH firsts AS (
            SELECT o_custkey,
                   CAST(date_trunc('month', MIN(o_orderdate)) AS DATE)
                       AS cohort
            FROM orders GROUP BY o_custkey
        ), cohort_sizes AS (
            SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
            FROM firsts GROUP BY cohort
        ), spend AS (
            SELECT f.cohort,
                   CAST((year(o.o_orderdate) - year(f.cohort)) * 12
                        + (month(o.o_orderdate) - month(f.cohort))
                        AS INTEGER) AS age,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4)))
                        AS DECIMAL(38,4)) AS rev
            FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
            GROUP BY 1, 2
        ), cum AS (
            SELECT cohort, age,
                   CAST(SUM(CAST(rev * 10000 AS BIGINT)) OVER (
                       PARTITION BY cohort ORDER BY age
                   ) AS BIGINT) AS cum_rev_q
            FROM spend
        )
        SELECT c.cohort, c.age, s.n_customers, c.cum_rev_q,
               CAST(c.cum_rev_q AS DOUBLE)
                   / CAST(s.n_customers AS DOUBLE)
                   / CAST(10000 AS DOUBLE) AS ltv_per_customer
        FROM cum c JOIN cohort_sizes s USING (cohort)
    """,
    doc="Cohort lifetime-value curve — the growth-analytics readout "
        "next to the retention triangle: customers cohorted by "
        "first-order month, revenue accumulated by cohort age in "
        "months, LTV = cumulative revenue / cohort size. Monetary sums "
        "quantize to exact 1e-4 integer units BEFORE the cumulative "
        "window (a decimal window sum would be exact too, but the "
        "integer form sidesteps the round-5 HUGEINT window-type drift "
        "class outright); age is pure year/month integer arithmetic; "
        "ltv is two exact divisions. Plan: one first-order agg, one "
        "fact agg, one bounded per-cohort cumsum.",
    tags=("ml", "behavioral"),
)
def ml_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    firsts = t.orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate"))
        .cast("date")
        .alias("cohort")
    )
    sizes = firsts.groupBy("cohort").agg(
        F.count("*").alias("n_customers")
    )
    age = (
        (F.year("o_orderdate") - F.year("cohort")) * 12
        + (F.month("o_orderdate") - F.month("cohort"))
    ).cast("int")
    spend = (
        t.orders.join(firsts, "o_custkey")
        .groupBy("cohort", age.alias("age"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias("rev")
        )
    )
    w = W.partitionBy("cohort").orderBy("age")
    cum = spend.select(
        "cohort",
        "age",
        F.sum((F.col("rev") * 10000).cast("bigint"))
        .over(w)
        .cast("bigint")
        .alias("cum_rev_q"),
    )
    return cum.join(sizes, "cohort").select(
        "cohort",
        "age",
        "n_customers",
        "cum_rev_q",
        (
            F.col("cum_rev_q").cast("double")
            / F.col("n_customers").cast("double")
            / F.lit(10000.0)
        ).alias("ltv_per_customer"),
    )


@register(
    "ml_ipw_stratified",
    oracle="""
        WITH base AS (
            SELECT c_mktsegment AS stratum,
                   CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END AS tr,
                   CAST(CAST(CAST(c_acctbal AS VARCHAR) AS DECIMAL(18,4))
                        * 10000 AS BIGINT) AS y_q
            FROM customer
        ), agg AS (
            SELECT stratum,
                   CAST(count(*) AS BIGINT) AS n_s,
                   CAST(coalesce(SUM(tr), 0) AS BIGINT) AS t_s,
                   CAST(coalesce(SUM(CASE WHEN tr = 1 THEN y_q END), 0)
                        AS BIGINT) AS y1_sum_q,
                   CAST(coalesce(SUM(CASE WHEN tr = 0 THEN y_q END), 0)
                        AS BIGINT) AS y0_sum_q
            FROM base GROUP BY stratum
        )
        SELECT stratum, n_s, t_s, y1_sum_q, y0_sum_q,
               CAST(t_s AS DOUBLE) / CAST(n_s AS DOUBLE) AS propensity,
               CASE WHEN t_s = 0 OR t_s = n_s THEN NULL
                    ELSE (CAST(y1_sum_q AS DOUBLE)
                          / CAST(t_s * 10000 AS DOUBLE))
                         - (CAST(y0_sum_q AS DOUBLE)
                            / CAST((n_s - t_s) * 10000 AS DOUBLE))
               END AS ate_s
        FROM agg
    """,
    doc="Stratified inverse-propensity treatment-effect estimate (the "
        "observational-causal companion to ml_cuped_adjustment): per "
        "market-segment stratum, a deterministic treatment cohort "
        "(c_custkey % 2), exact integer sufficient statistics (balance "
        "quantized to 1e-4 units through the shortest-string "
        "double->decimal hop), the stratum propensity t_s/n_s as one "
        "exact-int division, and the per-stratum mean effect as a "
        "fixed three-op IEEE expression (two exact-int divisions + one "
        "subtraction — identical trees in both engines). Degenerate "
        "strata (all-treated / all-control) emit NULL under an "
        "identical CASE guard. The cross-strata pooled estimate is a "
        "driver-trivial weighted sum of these rows when needed — the "
        "emitted grid IS the auditable artifact. Scale: one "
        "partial-agg shuffle to a dimension-bounded stratum grid.",
    tags=("ml",),
)
def ml_ipw_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    tr = (F.col("c_custkey") % 2 == 0).cast("int")
    y_q = (
        F.col("c_acctbal")
        .cast("string")
        .cast("decimal(18,4)")
        * 10000
    ).cast("bigint")
    base = t.customer.select(
        F.col("c_mktsegment").alias("stratum"),
        tr.alias("tr"),
        y_q.alias("y_q"),
    )
    agg = base.groupBy("stratum").agg(
        F.count("*").cast("bigint").alias("n_s"),
        F.coalesce(F.sum("tr"), F.lit(0)).cast("bigint").alias("t_s"),
        F.coalesce(
            F.sum(F.when(F.col("tr") == 1, F.col("y_q"))), F.lit(0)
        )
        .cast("bigint")
        .alias("y1_sum_q"),
        F.coalesce(
            F.sum(F.when(F.col("tr") == 0, F.col("y_q"))), F.lit(0)
        )
        .cast("bigint")
        .alias("y0_sum_q"),
    )
    degenerate = (F.col("t_s") == 0) | (F.col("t_s") == F.col("n_s"))
    ate = (
        F.col("y1_sum_q").cast("double")
        / (F.col("t_s") * 10000).cast("double")
    ) - (
        F.col("y0_sum_q").cast("double")
        / ((F.col("n_s") - F.col("t_s")) * 10000).cast("double")
    )
    return agg.select(
        "stratum",
        "n_s",
        "t_s",
        "y1_sum_q",
        "y0_sum_q",
        (F.col("t_s").cast("double") / F.col("n_s").cast("double")).alias(
            "propensity"
        ),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(ate)
        .alias("ate_s"),
    )


# ---------------------------------------------------------------------------
# Deterministic UCB1 bandit replay (Auer, Cesa-Bianchi & Fischer 2002,
# public algorithm). Event types are the arms; each arm's reward
# sequence is its events in (ts, event_id) order thresholded at
# value > 35. Two determinism choices make the replay bit-identical
# cross-engine: the exploration numerator uses floor(log2(r0 + step))
# — an integer CONSTANT per unrolled step, never a per-row ln() — and
# every UCB index is exactly two correctly-rounded IEEE ops
# (int/int division, sqrt, plus one addition) over exact integer
# state, which Python and DuckDB evaluate to the same bits
# (round-5 technique 2).

_UCB_T = 32  # UCB-phase steps after the one-pull-per-arm init
_UCB_R0 = 16  # exploration clock offset: L = floor(log2(r0 + step))
_UCB_THRESH = 35.0
_UCB_MAX_PULLS = 64  # per-arm reward prefix both engines read


def _ucb_l(step: int) -> int:
    return (_UCB_R0 + step).bit_length() - 1


def _ucb_oracle() -> str:
    parts = [f"""
        WITH rw AS MATERIALIZED (
            SELECT event_type AS arm,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS pull,
                   CASE WHEN value > {_UCB_THRESH} THEN 1 ELSE 0 END AS r
            FROM events
        ), rw2 AS MATERIALIZED (
            SELECT arm, pull, r FROM rw WHERE pull <= {_UCB_MAX_PULLS}
        ), st0 AS MATERIALIZED (
            SELECT a.arm, CAST(1 AS BIGINT) AS n,
                   CAST(coalesce(r1.r, 0) AS BIGINT) AS s
            FROM (SELECT DISTINCT arm FROM rw2) a
            LEFT JOIN rw2 r1 ON r1.arm = a.arm AND r1.pull = 1
        )"""]
    for t in range(1, _UCB_T + 1):
        two_l = 2 * _ucb_l(t)
        parts.append(f""", pk{t} AS MATERIALIZED (
            SELECT arm, n, s FROM st{t - 1}
            ORDER BY (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                      + sqrt(CAST({two_l} AS DOUBLE)
                             / CAST(n AS DOUBLE))) DESC, arm
            LIMIT 1
        ), st{t} AS MATERIALIZED (
            SELECT st.arm,
                   CAST(st.n + CASE WHEN st.arm = p.arm THEN 1 ELSE 0 END
                        AS BIGINT) AS n,
                   CAST(st.s + CASE WHEN st.arm = p.arm
                                    THEN coalesce(r2.r, 0) ELSE 0 END
                        AS BIGINT) AS s
            FROM st{t - 1} st
            CROSS JOIN pk{t} p
            LEFT JOIN rw2 r2 ON r2.arm = p.arm AND r2.pull = p.n + 1
        )""")
    outs = " UNION ALL ".join(
        f"""SELECT CAST({t} AS BIGINT) AS step, p.arm,
                   CAST(coalesce(r2.r, 0) AS BIGINT) AS r,
                   CAST(p.n + 1 AS BIGINT) AS n_after,
                   CAST(p.s + coalesce(r2.r, 0) AS BIGINT) AS s_after
            FROM pk{t} p
            LEFT JOIN rw2 r2 ON r2.arm = p.arm AND r2.pull = p.n + 1"""
        for t in range(1, _UCB_T + 1)
    )
    parts.append(f" SELECT * FROM ({outs})")
    return "".join(parts)


@register(
    "ml_ucb_bandit",
    oracle=_ucb_oracle(),
    doc="Deterministic UCB1 bandit replay (Auer et al. 2002, public): "
        "event types are the arms, each arm's reward stream is its "
        "events in (ts, event_id) order thresholded at value > 35, and "
        "after one init pull per arm the policy runs 32 UCB steps. The "
        "exploration term uses floor(log2(16 + step)) — an integer "
        "constant baked into each unrolled oracle step, never per-row "
        "ln() — so every index is exactly div + sqrt + add over exact "
        "integer state: correctly-rounded IEEE ops that Python and "
        "DuckDB agree on bit-for-bit, making even the argmax ORDER BY "
        "deterministic (arm name breaks exact ties). The engine side "
        "reads only the 64-pull reward prefix per arm (one partitioned "
        "window + filter — data-scale work stays distributed) and "
        "replays the 32-step fold on the driver over an EVENT-TYPE-"
        "bounded table (the ml_bradley_terry dimension-bounded-fold "
        "rule); the oracle replays the same fold as 64 MATERIALIZED "
        "CTEs. Output is the pick sequence with exact integer state.",
    tags=("ml",),
)
def ml_ucb_bandit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    rw = (
        t.events.select(
            F.col("event_type").alias("arm"),
            F.row_number().over(w).alias("pull"),
            F.when(F.col("value") > _UCB_THRESH, 1).otherwise(0).alias("r"),
        )
        .filter(F.col("pull") <= _UCB_MAX_PULLS)
    )
    # event-type-bounded collect: <= 5 arms x 64 pulls (test_collect_audit)
    rows = rw.collect()
    rewards = {(r["arm"], r["pull"]): r["r"] for r in rows}
    arms = sorted({a for a, _ in rewards})
    n = {a: 1 for a in arms}
    s = {a: rewards.get((a, 1), 0) for a in arms}
    out = []
    for step in range(1, _UCB_T + 1):
        two_l = 2 * _ucb_l(step)
        best = None
        for a in arms:
            idx = s[a] / n[a] + math.sqrt(two_l / n[a])
            if best is None or idx > best[0] or (
                idx == best[0] and a < best[1]
            ):
                best = (idx, a)
        a = best[1]
        r = rewards.get((a, n[a] + 1), 0)
        n[a] += 1
        s[a] += r
        out.append((step, a, r, n[a], s[a]))
    return spark.createDataFrame(
        out, "step long, arm string, r long, n_after long, s_after long"
    )


# ---------------------------------------------------------------------------
# Kernel MMD^2 drift between embedding cohorts (Gretton et al., JMLR
# 2012 — public). The degree-2 polynomial kernel k(x,y) = (c + <x,y>)^2
# FACTORIZES: sum_ij <xi,xj>^2 = ||sum_i xi xi^T||_F^2 and
# sum_ij <xi,xj> = |sum_i xi|^2, so the biased MMD^2 needs ONE linear
# pass producing d sum-vector cells and d^2 Gram-moment cells per
# cohort — never the quadratic pair join. Embeddings quantize to
# floor(x * 64) so every moment is an exact integer; the squared-moment
# reductions form in DECIMAL(38,0) (the ml_spearman_corr recipe) and
# cross to double via the decimal's shortest string.

_MMD_QF = 64  # power-of-two quantizer: float*64 and floor are exact
_MMD_C = 4096  # kernel offset, scale-matched to the integer dots
_MMD_D = 64  # embedding dimensionality


@register(
    "ml_mmd_drift",
    oracle=f"""
        WITH dims AS MATERIALIZED (
            SELECT vec_id, vec_id % 2 AS c, a,
                   CAST(floor(CAST(embedding[a] AS DOUBLE) * {_MMD_QF})
                        AS BIGINT) AS q
            FROM (SELECT vec_id, embedding,
                         CAST(unnest(range(1, {_MMD_D + 1})) AS INTEGER)
                             AS a
                  FROM embeddings)
        ), vsum AS MATERIALIZED (
            SELECT a,
                   CAST(coalesce(SUM(CASE WHEN c = 0 THEN q END), 0)
                        AS DECIMAL(38,0)) AS v0,
                   CAST(coalesce(SUM(CASE WHEN c = 1 THEN q END), 0)
                        AS DECIMAL(38,0)) AS v1
            FROM dims GROUP BY a
        ), gsum AS MATERIALIZED (
            SELECT d1.a AS a, d2.a AS b,
                   CAST(coalesce(SUM(CASE WHEN d1.c = 0
                                          THEN d1.q * d2.q END), 0)
                        AS DECIMAL(38,0)) AS g0,
                   CAST(coalesce(SUM(CASE WHEN d1.c = 1
                                          THEN d1.q * d2.q END), 0)
                        AS DECIMAL(38,0)) AS g1
            FROM dims d1 JOIN dims d2 USING (vec_id)
            GROUP BY 1, 2
        ), cnt AS (
            SELECT CAST(coalesce(SUM(CASE WHEN vec_id % 2 = 0
                                          THEN 1 END), 0) AS BIGINT) AS m,
                   CAST(coalesce(SUM(CASE WHEN vec_id % 2 = 1
                                          THEN 1 END), 0) AS BIGINT) AS n
            FROM embeddings
        ), vred AS (
            SELECT CAST(SUM(v0 * v0) AS DECIMAL(38,0)) AS va2,
                   CAST(SUM(v1 * v1) AS DECIMAL(38,0)) AS vb2,
                   CAST(SUM(v0 * v1) AS DECIMAL(38,0)) AS vab
            FROM vsum
        ), gred AS (
            SELECT CAST(SUM(g0 * g0) AS DECIMAL(38,0)) AS qa,
                   CAST(SUM(g1 * g1) AS DECIMAL(38,0)) AS qb,
                   CAST(SUM(g0 * g1) AS DECIMAL(38,0)) AS qab
            FROM gsum
        ), terms AS (
            SELECT cnt.m, cnt.n,
                   CAST(CAST(CAST(2 * {_MMD_C} AS DECIMAL(38,0)) * va2
                             + qa AS VARCHAR) AS DOUBLE)
                       / CAST(CASE WHEN cnt.m = 0 THEN 1
                                   ELSE cnt.m * cnt.m END AS DOUBLE) AS ta,
                   CAST(CAST(CAST(2 * {_MMD_C} AS DECIMAL(38,0)) * vb2
                             + qb AS VARCHAR) AS DOUBLE)
                       / CAST(CASE WHEN cnt.n = 0 THEN 1
                                   ELSE cnt.n * cnt.n END AS DOUBLE) AS tb,
                   CAST(CAST(CAST(2 * {_MMD_C} AS DECIMAL(38,0)) * vab
                             + qab AS VARCHAR) AS DOUBLE)
                       / CAST(CASE WHEN cnt.m * cnt.n = 0 THEN 1
                                   ELSE cnt.m * cnt.n END AS DOUBLE) AS tab,
                   CAST(CAST(va2 AS VARCHAR) AS DOUBLE) AS va2,
                   CAST(CAST(vb2 AS VARCHAR) AS DOUBLE) AS vb2,
                   CAST(CAST(qa AS VARCHAR) AS DOUBLE) AS qa,
                   CAST(CAST(qb AS VARCHAR) AS DOUBLE) AS qb
            FROM cnt CROSS JOIN vred CROSS JOIN gred
        )
        SELECT m, n, va2, vb2, qa, qb, ta, tb, tab,
               ((ta + tb) - 2 * tab) AS mmd2
        FROM terms
    """,
    doc="Kernel two-sample drift test: biased MMD^2 between the even "
        "and odd embedding cohorts under the degree-2 polynomial "
        "kernel (c + <x,y>)^2 (Gretton et al., JMLR 2012, public). The "
        "kernel FACTORIZES — sum_ij <xi,xj>^2 is the Frobenius norm of "
        "the cohort's second-moment matrix and sum_ij <xi,xj> is "
        "|sum xi|^2 — so the engine runs ONE linear pass producing 64 "
        "sum-vector cells and 64^2 Gram cells per cohort (map-side "
        "partial agg, d^2-bounded shuffle) instead of the O(N^2) pair "
        "join the naive estimator needs: the property that makes exact "
        "kernel drift testing feasible at 100 TB. Embeddings quantize "
        "by floor(x*64) (exact float ops), every moment is an exact "
        "integer, squared-moment reductions form in DECIMAL(38,0) and "
        "cross to double via the shortest string; the three final "
        "divisions and the (ta + tb) - 2*tab combination are the "
        "identical correctly-rounded IEEE sequence in both engines, "
        "with data-derived denominators zero-guarded identically.",
    tags=("ml", "similarity"),
)
def ml_mmd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    qarr = F.transform(
        F.col("embedding"),
        lambda e: F.floor(e.cast("double") * _MMD_QF).cast("long"),
    )
    ex = (
        t.embeddings.select(
            (F.col("vec_id") % 2).alias("c"), qarr.alias("qarr")
        )
        # pre-explosion repartition (r6 §2): the embeddings parquet is
        # 1-2 input splits, so the d x d pair explode below would run
        # near-serial; checkpoint because dims/pairs/cnt are three
        # consumers of the same quantized table (was 6 parquet scans,
        # plans/r11/ml_mmd_drift_before.txt)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=False)
    )
    dims = ex.select(
        "c", F.posexplode("qarr").alias("a0", "q")
    ).select("c", (F.col("a0") + 1).alias("a"), "q")
    pairs = ex.select(
        "c",
        F.explode(
            F.flatten(
                F.transform(
                    F.col("qarr"),
                    lambda xa, a: F.transform(
                        F.col("qarr"),
                        lambda xb, b: F.struct(
                            (a + 1).alias("a"),
                            (b + 1).alias("b"),
                            (xa * xb).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("e"),
    ).select("c", "e.a", "e.b", "e.p")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    z = F.lit(0).cast("long")
    vsum = dims.groupBy("a").agg(
        dec(F.coalesce(F.sum(F.when(F.col("c") == 0, F.col("q"))), z))
        .alias("v0"),
        dec(F.coalesce(F.sum(F.when(F.col("c") == 1, F.col("q"))), z))
        .alias("v1"),
    )
    gsum = pairs.groupBy("a", "b").agg(
        dec(F.coalesce(F.sum(F.when(F.col("c") == 0, F.col("p"))), z))
        .alias("g0"),
        dec(F.coalesce(F.sum(F.when(F.col("c") == 1, F.col("p"))), z))
        .alias("g1"),
    )
    # counts off the pinned table (third consumer) — no extra corpus scan
    cnt = ex.agg(
        F.coalesce(F.sum(F.when(F.col("c") == 0, 1)), F.lit(0))
        .cast("bigint").alias("m"),
        F.coalesce(F.sum(F.when(F.col("c") == 1, 1)), F.lit(0))
        .cast("bigint").alias("n"),
    )
    vred = vsum.agg(
        dec(F.sum(F.col("v0") * F.col("v0"))).alias("va2"),
        dec(F.sum(F.col("v1") * F.col("v1"))).alias("vb2"),
        dec(F.sum(F.col("v0") * F.col("v1"))).alias("vab"),
    )
    gred = gsum.agg(
        dec(F.sum(F.col("g0") * F.col("g0"))).alias("qa"),
        dec(F.sum(F.col("g1") * F.col("g1"))).alias("qb"),
        dec(F.sum(F.col("g0") * F.col("g1"))).alias("qab"),
    )
    ck = dec(F.lit(2 * _MMD_C))
    g1 = lambda c: F.when(c == 0, F.lit(1).cast("bigint")).otherwise(c)  # noqa: E731
    terms = (
        cnt.crossJoin(F.broadcast(vred))
        .crossJoin(F.broadcast(gred))
        .select(
            "m", "n",
            ((ck * F.col("va2") + F.col("qa")).cast("double")
             / g1(F.col("m") * F.col("m")).cast("double")).alias("ta"),
            ((ck * F.col("vb2") + F.col("qb")).cast("double")
             / g1(F.col("n") * F.col("n")).cast("double")).alias("tb"),
            ((ck * F.col("vab") + F.col("qab")).cast("double")
             / g1(F.col("m") * F.col("n")).cast("double")).alias("tab"),
            F.col("va2").cast("double").alias("va2"),
            F.col("vb2").cast("double").alias("vb2"),
            F.col("qa").cast("double").alias("qa"),
            F.col("qb").cast("double").alias("qb"),
        )
    )
    return terms.select(
        "m", "n", "va2", "vb2", "qa", "qb", "ta", "tb", "tab",
        ((F.col("ta") + F.col("tb")) - 2 * F.col("tab")).alias("mmd2"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival curve (Kaplan & Meier 1958, public). Time-to-
# first-purchase per user in hours, censored at the last observed event
# when no purchase exists. The product-limit estimator is a SEQUENTIAL
# truncating recurrence, so it is exact-integer by construction:
#   S_k = (S_{k-1} * (n_k - d_k)) div n_k,  S_0 = 2^30
# (Spark div == DuckDB //, all operands non-negative; products stay
# below 2^53 so the engine's (p - p%b)/b floor-division is exact). The
# engine folds the DURATION histogram — time-bounded, not row-bounded —
# inside one sorted-array HOF aggregate; the oracle replays the same
# fold as a recursive CTE walking the histogram by row number.

_KM_FX = 1 << 30


@register(
    "ml_kaplan_meier",
    oracle=f"""
        WITH RECURSIVE ev AS MATERIALIZED (
            SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
                   event_type
            FROM events
        ), pu AS MATERIALIZED (
            SELECT f.user_id,
                   CASE WHEN p.tp IS NOT NULL
                        THEN (p.tp - f.t0) // 3600
                        ELSE (l.tl - f.t0) // 3600 END AS t,
                   CASE WHEN p.tp IS NOT NULL THEN 1 ELSE 0 END AS evf
            FROM (SELECT user_id, min(es) AS t0 FROM ev GROUP BY 1) f
            LEFT JOIN (SELECT user_id, min(es) AS tp FROM ev
                       WHERE event_type = 'purchase' GROUP BY 1) p
                USING (user_id)
            JOIN (SELECT user_id, max(es) AS tl FROM ev GROUP BY 1) l
                USING (user_id)
        ), hist AS MATERIALIZED (
            SELECT t, CAST(count(*) AS BIGINT) AS c_all,
                   CAST(SUM(evf) AS BIGINT) AS d,
                   CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rn
            FROM pu GROUP BY t
        ), meta AS MATERIALIZED (
            SELECT CAST(SUM(c_all) AS BIGINT) AS n FROM hist
        ), st AS (
            SELECT CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS consumed,
                   CAST({_KM_FX} AS BIGINT) AS s,
                   CAST(0 AS BIGINT) AS t, CAST(0 AS BIGINT) AS n_risk,
                   CAST(0 AS BIGINT) AS d
            UNION ALL
            SELECT h.rn, st.consumed + h.c_all,
                   CASE WHEN h.d > 0
                        THEN (st.s * ((m.n - st.consumed) - h.d))
                             // (m.n - st.consumed)
                        ELSE st.s END,
                   h.t, m.n - st.consumed, h.d
            FROM st
            JOIN hist h ON h.rn = st.rn + 1
            CROSS JOIN meta m
        )
        SELECT t, n_risk, d, s AS s_fx,
               CAST(s AS DOUBLE) / {float(_KM_FX)} AS surv
        FROM st WHERE rn >= 1 AND d > 0
    """,
    doc="Kaplan-Meier product-limit survival curve (public, 1958) over "
        "time-to-first-purchase per user (hours; users with no "
        "purchase are right-censored at their last observed event — "
        "the retention-analysis shape). The estimator is computed as "
        "the exact-integer truncating recurrence S_k = S_{k-1} * "
        "(n_k - d_k) div n_k at 2^30 fixed point, so the whole curve "
        "hash-matches: Spark div == DuckDB //, every operand is non-"
        "negative, and the 2^30 scale keeps products under 2^53 where "
        "the engine's (p - p%b)/b floor division is exact. The risk "
        "set walks the DURATION histogram (time-bounded cardinality, "
        "the LTTB rule) inside one sorted-array HOF fold — per-user "
        "reduction is the only data-scale shuffle; the oracle replays "
        "the fold as a recursive CTE over row-numbered histogram "
        "steps. The reported survival double is s_fx / 2^30 — an "
        "exact dyadic, no rounding anywhere.",
    tags=("ml", "timeseries"),
)
def ml_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id",
        F.expr("unix_timestamp(ts)").alias("es"),
        "event_type",
    )
    fe = ev.groupBy("user_id").agg(
        F.min("es").alias("t0"), F.max("es").alias("tl")
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("es").alias("tp"))
    )
    pu = fe.join(fp, "user_id", "left").select(
        F.when(
            F.col("tp").isNotNull(),
            F.expr("(tp - t0) div 3600"),
        ).otherwise(F.expr("(tl - t0) div 3600")).alias("t"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("evf"),
    )
    hist = pu.groupBy("t").agg(
        F.count("*").cast("bigint").alias("c_all"),
        F.sum("evf").cast("bigint").alias("d"),
    )
    out_t = "array<struct<t:bigint,n_risk:bigint,d:bigint,s_fx:bigint>>"
    acc_t = f"struct<consumed:bigint,s:bigint,out:{out_t}>"
    one = hist.agg(
        F.sort_array(
            F.collect_list(F.struct("t", "c_all", "d"))
        ).alias("arr")
    ).select(
        "arr",
        F.aggregate(
            "arr", F.lit(0).cast("bigint"), lambda a, x: a + x["c_all"]
        ).alias("n_total"),
    )

    def step(acc, x):  # noqa: ANN001, ANN202
        n_k = F.col("n_total") - acc["consumed"]
        p = acc["s"] * (n_k - x["d"])
        s_new = F.when(
            x["d"] > 0,
            ((p - p % n_k).cast("double") / n_k.cast("double"))
            .cast("bigint"),
        ).otherwise(acc["s"])
        entry = F.struct(
            x["t"].alias("t"),
            n_k.alias("n_risk"),
            x["d"].alias("d"),
            s_new.alias("s_fx"),
        )
        return F.struct(
            (acc["consumed"] + x["c_all"]).alias("consumed"),
            s_new.alias("s"),
            F.when(
                x["d"] > 0, F.concat(acc["out"], F.array(entry))
            ).otherwise(acc["out"]).alias("out"),
        )

    init = F.struct(
        F.lit(0).cast("bigint").alias("consumed"),
        F.lit(_KM_FX).cast("bigint").alias("s"),
        F.array().cast(out_t).alias("out"),
    ).cast(acc_t)
    folded = one.select(
        F.explode(F.aggregate("arr", init, step)["out"]).alias("e")
    )
    return folded.select(
        F.col("e.t").alias("t"),
        F.col("e.n_risk").alias("n_risk"),
        F.col("e.d").alias("d"),
        F.col("e.s_fx").alias("s_fx"),
        (F.col("e.s_fx").cast("double") / F.lit(float(_KM_FX))).alias(
            "surv"
        ),
    )


# ---------------------------------------------------------------------------
# Permutation feature importance (Breiman 2001, public): re-score a
# fixed classifier with one feature column permuted and report the
# exact drop in correct predictions. The permutation is DERANDOMIZED
# and shuffle-local: docs hash into 64 md5 buckets and each bucket
# cyclically shifts by one position in (md5, doc_id) order — a genuine
# permutation computed with PARTITIONED windows only (no global sort),
# which is also the shape that scales: the swap join moves each row
# once, keyed by (bucket, position).

_PI_BUCKETS = 64
_PI_THRESH = 525  # integer decision threshold for the fixed classifier
_PI_W = (5, 3, 1)  # weights over (n_tokens, stop_hits, nonspace_bytes)


@register(
    "ml_permutation_importance",
    oracle=f"""
        WITH f AS MATERIALIZED (
            SELECT doc_id,
                   CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y,
                   CAST(len(list_filter(string_split_regex(text,
                            '[ \t\n\r\f]+'), x -> x <> '')) AS BIGINT)
                       AS f1,
                   CAST(len(list_filter(list_filter(
                            string_split_regex(text, '[ \t\n\r\f]+'),
                            x -> x <> ''),
                            x -> x IN ('the', 'a', 'of'))) AS BIGINT)
                       AS f2,
                   CAST(strlen(replace(text, ' ', '')) AS BIGINT) AS f3,
                   CAST(CAST(('0x' || substr(md5(
                        CAST(doc_id AS VARCHAR)), 1, 13)) AS UBIGINT)
                        AS BIGINT) AS h
            FROM documents
        ), r AS MATERIALIZED (
            SELECT *,
                   h % {_PI_BUCKETS} AS bucket,
                   row_number() OVER (PARTITION BY h % {_PI_BUCKETS}
                                      ORDER BY h, doc_id) AS rn,
                   count(*) OVER (PARTITION BY h % {_PI_BUCKETS}) AS cnt
            FROM f
        ), j AS MATERIALIZED (
            SELECT a.y,
                   a.f1, a.f2, a.f3,
                   b.f1 AS p1, b.f2 AS p2, b.f3 AS p3
            FROM r a JOIN r b
              ON b.bucket = a.bucket AND b.rn = a.rn % a.cnt + 1
        ), s AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN ({_PI_W[0]}*f1 + {_PI_W[1]}*f2
                                       + {_PI_W[2]}*f3 > {_PI_THRESH})
                                      = (y = 1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS base_c,
                   CAST(SUM(CASE WHEN ({_PI_W[0]}*p1 + {_PI_W[1]}*f2
                                       + {_PI_W[2]}*f3 > {_PI_THRESH})
                                      = (y = 1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                   CAST(SUM(CASE WHEN ({_PI_W[0]}*f1 + {_PI_W[1]}*p2
                                       + {_PI_W[2]}*f3 > {_PI_THRESH})
                                      = (y = 1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                   CAST(SUM(CASE WHEN ({_PI_W[0]}*f1 + {_PI_W[1]}*f2
                                       + {_PI_W[2]}*p3 > {_PI_THRESH})
                                      = (y = 1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c3
            FROM j
        )
        SELECT 'n_tokens' AS feature, n, base_c AS base_correct,
               c1 AS perm_correct, base_c - c1 AS drop_correct FROM s
        UNION ALL
        SELECT 'stop_hits', n, base_c, c2, base_c - c2 FROM s
        UNION ALL
        SELECT 'nonspace_bytes', n, base_c, c3, base_c - c3 FROM s
    """,
    doc="Permutation feature importance (Breiman 2001, public) for a "
        "fixed integer linear classifier predicting the document "
        "length class (n_chars >= 300) from token count, stopword "
        "hits, and non-space bytes: each feature column is permuted by "
        "a DERANDOMIZED md5-bucketed cyclic shift (64 buckets, shift "
        "by one in (md5, doc_id) order — a genuine permutation built "
        "from PARTITIONED windows only) and the exact drop in correct "
        "predictions is reported per feature. Every score is an "
        "integer dot product compared to an integer threshold, so "
        "base and permuted accuracies hash-match with no float "
        "anywhere. The swap join is keyed by (bucket, position): one "
        "co-partitioned shuffle, no global sort, no broadcast of the "
        "data side — the permutation shape that survives 100 TB.",
    tags=("ml",),
)
def ml_permutation_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..functions.text import tokens

    t = Tables(spark, sf_dir)
    toks = tokens(F.col("text"))
    stops = F.array(F.lit("the"), F.lit("a"), F.lit("of"))
    f = t.documents.select(
        "doc_id",
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("y"),
        F.size(toks).cast("bigint").alias("f1"),
        F.size(
            F.filter(toks, lambda x: F.array_contains(stops, x))
        ).cast("bigint").alias("f2"),
        F.octet_length(F.replace(F.col("text"), F.lit(" ")))
        .cast("bigint").alias("f3"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
               16, 10).cast("long").alias("h"),
    ).withColumn("bucket", F.col("h") % _PI_BUCKETS)
    r = f.select(
        "*",
        F.row_number().over(
            W.partitionBy("bucket").orderBy("h", "doc_id")
        ).alias("rn"),
        F.count("*").over(W.partitionBy("bucket")).alias("cnt"),
    )
    a = r.alias("a")
    b = r.alias("b")
    j = a.join(
        b,
        (F.col("b.bucket") == F.col("a.bucket"))
        & (F.col("b.rn") == F.col("a.rn") % F.col("a.cnt") + 1),
    ).select(
        F.col("a.y").alias("y"),
        F.col("a.f1").alias("f1"), F.col("a.f2").alias("f2"),
        F.col("a.f3").alias("f3"),
        F.col("b.f1").alias("p1"), F.col("b.f2").alias("p2"),
        F.col("b.f3").alias("p3"),
    )
    w1, w2, w3 = _PI_W

    def correct(c1, c2, c3):  # noqa: ANN001, ANN202
        score = w1 * F.col(c1) + w2 * F.col(c2) + w3 * F.col(c3)
        return F.sum(
            F.when((score > _PI_THRESH) == (F.col("y") == 1), 1)
            .otherwise(0)
        ).cast("bigint")

    s = j.agg(
        F.count("*").cast("bigint").alias("n"),
        correct("f1", "f2", "f3").alias("base_c"),
        correct("p1", "f2", "f3").alias("c1"),
        correct("f1", "p2", "f3").alias("c2"),
        correct("f1", "f2", "p3").alias("c3"),
    )
    out = None
    for name, col in (
        ("n_tokens", "c1"), ("stop_hits", "c2"), ("nonspace_bytes", "c3")
    ):
        row = s.select(
            F.lit(name).alias("feature"), "n",
            F.col("base_c").alias("base_correct"),
            F.col(col).alias("perm_correct"),
            (F.col("base_c") - F.col(col)).alias("drop_correct"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# Caliper matching (Rosenbaum & Rubin 1985, public): the matched-pairs
# companion to ml_ipw_stratified/ml_att_stratified. Treated and
# control units pair WITHIN a (segment, balance-bucket) cell by rank
# alignment — the deterministic stand-in for nearest-neighbor
# propensity matching; the bucket width is the caliper.

_CM_TREAT_MOD = 7  # c_custkey % 7 = 0 is the treated cohort (~1/7)
_CM_BUCKET_Q = 1000 * 10000  # 1000-currency-unit caliper in 1e-4 units


@register(
    "ml_caliper_match",
    oracle=f"""
        WITH spend AS (
            SELECT o_custkey AS ck,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 10000
                        AS BIGINT) AS y_q
            FROM orders GROUP BY 1
        ), base AS (
            SELECT c.c_mktsegment AS seg,
                   CASE WHEN c.c_custkey % {_CM_TREAT_MOD} = 0
                        THEN 1 ELSE 0 END AS tr,
                   CAST(CAST(CAST(c.c_acctbal AS VARCHAR)
                             AS DECIMAL(18,4)) * 10000 AS BIGINT) AS bal_q,
                   coalesce(s.y_q, 0) AS y_q,
                   c.c_custkey AS ck
            FROM customer c LEFT JOIN spend s ON c.c_custkey = s.ck
        ), ranked AS (
            SELECT *, bal_q // {_CM_BUCKET_Q} AS bkt,
                   row_number() OVER (
                       PARTITION BY seg, bal_q // {_CM_BUCKET_Q}, tr
                       ORDER BY bal_q, ck) AS rn
            FROM base
        ), pairs AS (
            SELECT t.seg, t.y_q AS yt, c.y_q AS yc,
                   t.bal_q - c.bal_q AS bal_gap_q
            FROM ranked t
            JOIN ranked c
              ON c.seg = t.seg AND c.bkt = t.bkt AND c.rn = t.rn
             AND t.tr = 1 AND c.tr = 0
        ), counts AS (
            SELECT seg,
                   CAST(SUM(CASE WHEN tr = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_treated,
                   CAST(SUM(CASE WHEN tr = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_control
            FROM ranked GROUP BY seg
        )
        SELECT co.seg, co.n_treated, co.n_control,
               CAST(coalesce(count(p.yt), 0) AS BIGINT) AS n_matched,
               CAST(coalesce(SUM(p.yt - p.yc), 0) AS BIGINT)
                   AS diff_sum_q,
               CAST(coalesce(SUM(abs(p.bal_gap_q)), 0) AS BIGINT)
                   AS bal_gap_sum_q,
               CAST(coalesce(SUM(p.yt - p.yc), 0) AS DOUBLE)
                   / CAST(CASE WHEN count(p.yt) = 0 THEN 1
                               ELSE count(p.yt) END * 10000 AS DOUBLE)
                   AS att_matched
        FROM counts co LEFT JOIN pairs p ON p.seg = co.seg
        GROUP BY co.seg, co.n_treated, co.n_control
    """,
    doc="Caliper matched-pairs treatment effect (Rosenbaum & Rubin "
        "1985, public): treated customers (c_custkey % 7 = 0) pair "
        "with controls inside (market segment, 1000-unit account-"
        "balance bucket) cells by RANK ALIGNMENT — the t-th treated "
        "by balance matches the t-th control, a deterministic "
        "nearest-neighbor stand-in whose bucket width is the caliper; "
        "unmatched treated drop out (counted). Outcome is total order "
        "spend in exact 1e-4 integer units (the ml_ipw quantization), "
        "so the matched-pair difference sum and the covariate balance "
        "gap are exact BIGINTs and the per-segment ATT is one guarded "
        "division. All windows partition by (segment, bucket, arm); "
        "the pair join is co-partitioned on the same keys — no global "
        "sort, no broadcast of the unit table. Negative balances "
        "bucket by truncation in BOTH engines (Spark div == DuckDB "
        "//).",
    tags=("ml",),
)
def ml_caliper_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    spend = t.orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,4)")) * 10000)
        .cast("bigint")
        .alias("y_q")
    )
    base = (
        t.customer.join(
            spend, t.customer["c_custkey"] == spend["ck"], "left"
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.when(F.col("c_custkey") % _CM_TREAT_MOD == 0, 1)
            .otherwise(0)
            .alias("tr"),
            (
                F.col("c_acctbal").cast("string").cast("decimal(18,4)")
                * 10000
            ).cast("bigint").alias("bal_q"),
            F.coalesce(F.col("y_q"), F.lit(0).cast("bigint")).alias("y_q"),
            F.col("c_custkey").alias("ckey"),
        )
        .withColumn("bkt", F.expr(f"bal_q div {_CM_BUCKET_Q}"))
    )
    ranked = base.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("seg", "bkt", "tr").orderBy("bal_q", "ckey")
        ),
    )
    tr = ranked.filter(F.col("tr") == 1).alias("t")
    ct = ranked.filter(F.col("tr") == 0).alias("c")
    pairs = tr.join(
        ct,
        (F.col("c.seg") == F.col("t.seg"))
        & (F.col("c.bkt") == F.col("t.bkt"))
        & (F.col("c.rn") == F.col("t.rn")),
    ).select(
        F.col("t.seg").alias("seg"),
        F.col("t.y_q").alias("yt"),
        F.col("c.y_q").alias("yc"),
        (F.col("t.bal_q") - F.col("c.bal_q")).alias("bal_gap_q"),
    )
    counts = ranked.groupBy("seg").agg(
        F.sum(F.when(F.col("tr") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_treated"),
        F.sum(F.when(F.col("tr") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_control"),
    )
    zl = F.lit(0).cast("bigint")
    agg = counts.join(pairs, "seg", "left").groupBy(
        "seg", "n_treated", "n_control"
    ).agg(
        F.coalesce(F.count(F.col("yt")), zl).cast("bigint")
        .alias("n_matched"),
        F.coalesce(F.sum(F.col("yt") - F.col("yc")), zl)
        .cast("bigint")
        .alias("diff_sum_q"),
        F.coalesce(F.sum(F.abs(F.col("bal_gap_q"))), zl)
        .cast("bigint")
        .alias("bal_gap_sum_q"),
    )
    n_m = F.col("n_matched")
    return agg.select(
        "seg", "n_treated", "n_control", "n_matched", "diff_sum_q",
        "bal_gap_sum_q",
        (
            F.col("diff_sum_q").cast("double")
            / (F.when(n_m == 0, F.lit(1).cast("bigint")).otherwise(n_m)
               * 10000).cast("double")
        ).alias("att_matched"),
    )


# ---------------------------------------------------------------------------
# Closed-form ridge regression (Hoerl & Kennard 1970, public): two
# features + intercept solved by Cramer's rule over EXACT integer
# moment sums — the multiple-regression extension of q_linreg_trend.
# (X^T X + lambda*I) is positive definite for lambda > 0, so the
# determinant is never zero and no division guard is needed even on a
# SINGULAR design (constant feature) — ridge's whole point, pinned by
# fixture. Every moment is a BIGINT, every determinant a DECIMAL(38,0)
# expansion written in the identical association in both engines
# (exact integers — association is irrelevant), and the coefficients
# are single correctly-rounded divisions of shortest-string doubles.

_RIDGE_LAMBDA = 64


@register(
    "ml_ridge_closed_form",
    oracle=f"""
        WITH base AS (
            SELECT CAST(l_quantity AS BIGINT) AS x1,
                   CAST(floor(CAST(l_discount AS DOUBLE) * 100)
                        AS BIGINT) AS x2,
                   CAST(floor(CAST(l_extendedprice AS DOUBLE))
                        AS BIGINT) AS y
            FROM lineitem
        ), m AS (
            SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
                   CAST(SUM(x1) AS DECIMAL(38,0)) AS s1,
                   CAST(SUM(x2) AS DECIMAL(38,0)) AS s2,
                   CAST(SUM(x1*x1) AS DECIMAL(38,0)) AS s11,
                   CAST(SUM(x2*x2) AS DECIMAL(38,0)) AS s22,
                   CAST(SUM(x1*x2) AS DECIMAL(38,0)) AS s12,
                   CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
                   CAST(SUM(x1*y) AS DECIMAL(38,0)) AS s1y,
                   CAST(SUM(x2*y) AS DECIMAL(38,0)) AS s2y
            FROM base
        ), a AS (
            SELECT n + {_RIDGE_LAMBDA} AS a11, s1 AS a12, s2 AS a13,
                   s1 AS a21, s11 + {_RIDGE_LAMBDA} AS a22, s12 AS a23,
                   s2 AS a31, s12 AS a32, s22 + {_RIDGE_LAMBDA} AS a33,
                   sy AS b1, s1y AS b2, s2y AS b3, n
            FROM m
        ), dets AS (
            SELECT n,
                   a11*(a22*a33 - a23*a32) - a12*(a21*a33 - a23*a31)
                       + a13*(a21*a32 - a22*a31) AS det_a,
                   b1*(a22*a33 - a23*a32) - a12*(b2*a33 - a23*b3)
                       + a13*(b2*a32 - a22*b3) AS det_0,
                   a11*(b2*a33 - a23*b3) - b1*(a21*a33 - a23*a31)
                       + a13*(a21*b3 - b2*a31) AS det_1,
                   a11*(a22*b3 - b2*a32) - a12*(a21*b3 - b2*a31)
                       + b1*(a21*a32 - a22*a31) AS det_2
            FROM a
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(CAST(det_a AS VARCHAR) AS DOUBLE) AS det_a,
               CAST(CAST(det_0 AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(det_a AS VARCHAR) AS DOUBLE) AS beta0,
               CAST(CAST(det_1 AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(det_a AS VARCHAR) AS DOUBLE) AS beta1,
               CAST(CAST(det_2 AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(det_a AS VARCHAR) AS DOUBLE) AS beta2
        FROM dets
    """,
    doc="Closed-form ridge regression (Hoerl & Kennard 1970, public) "
        "of floor(extended price) on quantity and discount-cents with "
        f"lambda = {_RIDGE_LAMBDA}: one linear pass produces nine exact "
        "integer moment sums (map-side partial agg, single-row "
        "shuffle), the 3x3 normal-equation system solves by Cramer's "
        "rule with determinants expanded identically in both engines "
        "over DECIMAL(38,0) (exact — association is irrelevant on "
        "integers; magnitudes stay under 10^33 through 10x data), and "
        "each coefficient is one correctly-rounded division of "
        "shortest-string doubles. Ridge's positive-definite shift "
        "means det > 0 ALWAYS — no zero-division guard even on a "
        "singular design (constant feature), which the fixture pins. "
        "At 100 TB this is the canonical 'training on aggregates' "
        "shape: model fit cost = one aggregation, not a solver job.",
    tags=("ml",),
)
def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = t.lineitem.select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.floor(F.col("l_discount").cast("double") * 100)
        .cast("bigint").alias("x2"),
        F.floor(F.col("l_extendedprice").cast("double"))
        .cast("bigint").alias("y"),
    )
    m = base.agg(
        d38(F.count("*")).alias("n"),
        d38(F.sum("x1")).alias("s1"),
        d38(F.sum("x2")).alias("s2"),
        d38(F.sum(F.col("x1") * F.col("x1"))).alias("s11"),
        d38(F.sum(F.col("x2") * F.col("x2"))).alias("s22"),
        d38(F.sum(F.col("x1") * F.col("x2"))).alias("s12"),
        d38(F.sum("y")).alias("sy"),
        d38(F.sum(F.col("x1") * F.col("y"))).alias("s1y"),
        d38(F.sum(F.col("x2") * F.col("y"))).alias("s2y"),
    )
    lam = F.lit(_RIDGE_LAMBDA).cast("decimal(38,0)")
    a = m.select(
        "n",
        (F.col("n") + lam).alias("a11"), F.col("s1").alias("a12"),
        F.col("s2").alias("a13"),
        F.col("s1").alias("a21"), (F.col("s11") + lam).alias("a22"),
        F.col("s12").alias("a23"),
        F.col("s2").alias("a31"), F.col("s12").alias("a32"),
        (F.col("s22") + lam).alias("a33"),
        F.col("sy").alias("b1"), F.col("s1y").alias("b2"),
        F.col("s2y").alias("b3"),
    )
    c = F.col
    det_a = (
        c("a11") * (c("a22") * c("a33") - c("a23") * c("a32"))
        - c("a12") * (c("a21") * c("a33") - c("a23") * c("a31"))
        + c("a13") * (c("a21") * c("a32") - c("a22") * c("a31"))
    )
    det_0 = (
        c("b1") * (c("a22") * c("a33") - c("a23") * c("a32"))
        - c("a12") * (c("b2") * c("a33") - c("a23") * c("b3"))
        + c("a13") * (c("b2") * c("a32") - c("a22") * c("b3"))
    )
    det_1 = (
        c("a11") * (c("b2") * c("a33") - c("a23") * c("b3"))
        - c("b1") * (c("a21") * c("a33") - c("a23") * c("a31"))
        + c("a13") * (c("a21") * c("b3") - c("b2") * c("a31"))
    )
    det_2 = (
        c("a11") * (c("a22") * c("b3") - c("b2") * c("a32"))
        - c("a12") * (c("a21") * c("b3") - c("b2") * c("a31"))
        + c("b1") * (c("a21") * c("a32") - c("a22") * c("a31"))
    )
    dets = a.select(
        "n",
        det_a.alias("det_a"), det_0.alias("det_0"),
        det_1.alias("det_1"), det_2.alias("det_2"),
    )
    da = c("det_a").cast("double")
    return dets.select(
        c("n").cast("bigint").alias("n"),
        da.alias("det_a"),
        (c("det_0").cast("double") / da).alias("beta0"),
        (c("det_1").cast("double") / da).alias("beta1"),
        (c("det_2").cast("double") / da).alias("beta2"),
    )


_PR_G = 1 << 20  # recall/precision land on this exact integer grid


@register(
    "ml_pr_auc",
    oracle=f"""
        WITH scored AS (
            SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 16.0)
                        AS BIGINT) AS s,
                   CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS y
            FROM embeddings
        ), grp AS (
            SELECT s, CAST(count(*) AS BIGINT) AS c,
                   CAST(SUM(y) AS BIGINT) AS cp
            FROM scored GROUP BY s
        ), cum AS (
            SELECT s, c, cp,
                   CAST(SUM(c) OVER (
                       ORDER BY s DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS nb,
                   CAST(SUM(cp) OVER (
                       ORDER BY s DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS tpb
            FROM grp
        ), tot AS (
            SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(count(*) - SUM(y) AS BIGINT) AS n_neg
            FROM scored
        ), terms AS (
            SELECT
                (tpb * {_PR_G}
                 // (CASE WHEN t.n_pos = 0 THEN 1 ELSE t.n_pos END)
                 - (tpb - cp) * {_PR_G}
                 // (CASE WHEN t.n_pos = 0 THEN 1 ELSE t.n_pos END))
                * (tpb * {_PR_G} // nb
                   + CASE WHEN nb - c = 0 THEN {_PR_G}
                          ELSE (tpb - cp) * {_PR_G} // (nb - c) END)
                AS term_fx
            FROM cum CROSS JOIN tot t
        )
        SELECT t.n_pos, t.n_neg,
               CAST(COALESCE(SUM(term_fx), 0) AS BIGINT) AS ap_fx,
               CASE WHEN t.n_pos > 0
                    THEN CAST(COALESCE(SUM(term_fx), 0) AS DOUBLE)
                         / {2.0 * _PR_G * _PR_G}
                    ELSE CAST(0 AS DOUBLE) END AS pr_auc
        FROM terms CROSS JOIN tot t
        GROUP BY t.n_pos, t.n_neg
    """,
    doc="Exact trapezoidal PR-AUC (precision-recall curve area — Davis "
        "& Goadrich ICML 2006, public; the imbalanced-data companion "
        "to ml_auc_exact, same bucketed score floor(e1*16) and parity "
        "label): walk the score buckets in descending order, and at "
        "each boundary quantize recall TP/P and precision TP/N to the "
        f"exact 2^20 integer grid (truncating integer division — "
        "Spark div == DuckDB //), so each trapezoid term "
        "(R_b - R_prev) * (P_b + P_prev) is an exact int64 < 2^41 and "
        "the bucket sum is ORDER-FREE (the float trapezoid sum would "
        "be order-sensitive and engine-divergent). pr_auc = "
        "ap_fx / 2^41 is one exact dyadic division. The curve starts "
        "at the (R=0, P=1) convention (the empty prefix's precision); "
        "single-class corpora zero-guard to 0. The previous boundary "
        "needs no lag: prev_TP = TP - cp, prev_N = N - c. Plan: one "
        "grouped count per score bucket, one distributed bucket-"
        "ordered cumsum (with_running_sums_dist — never an "
        "unpartitioned window), one scalar agg — PR-AUC over 100 TB "
        "of scores costs one shuffle of the bucket histogram.",
    tags=("ml", "stats"),
)
def ml_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ranking import with_running_sums_dist

    t = Tables(spark, sf_dir)
    e1 = F.col("embedding").getItem(0).cast("double")
    scored = t.embeddings.select(
        F.floor(e1 * F.lit(16.0)).cast("bigint").alias("s"),
        F.when(F.col("label") % 2 == 1, 1).otherwise(0).alias("y"),
    )
    grp = scored.groupBy("s").agg(
        F.count("*").alias("c"), F.sum("y").alias("cp")
    )
    cum = (
        with_running_sums_dist(
            grp, [F.col("s").desc()], ["c", "cp"], prefix="cum_"
        )
        .withColumnRenamed("cum_c", "nb")
        .withColumnRenamed("cum_cp", "tpb")
    )
    tot = scored.agg(
        F.sum("y").cast("long").alias("n_pos"),
        (F.count("*") - F.sum("y")).cast("long").alias("n_neg"),
    )
    g = _PR_G
    terms = cum.crossJoin(F.broadcast(tot)).select(
        "n_pos",
        "n_neg",
        (
            F.expr(
                f"tpb * {g} div (CASE WHEN n_pos = 0 THEN 1 ELSE n_pos END)"
                f" - (tpb - cp) * {g}"
                f" div (CASE WHEN n_pos = 0 THEN 1 ELSE n_pos END)"
            )
            * F.expr(
                f"tpb * {g} div nb"
                f" + CASE WHEN nb - c = 0 THEN {g}"
                f"        ELSE (tpb - cp) * {g} div (nb - c) END"
            )
        ).alias("term_fx"),
    )
    return terms.groupBy("n_pos", "n_neg").agg(
        F.coalesce(F.sum("term_fx"), F.lit(0))
        .cast("long")
        .alias("ap_fx"),
        F.when(
            F.col("n_pos") > 0,
            F.coalesce(F.sum("term_fx"), F.lit(0)).cast("double")
            / F.lit(2.0 * g * g),
        )
        .otherwise(F.lit(0.0))
        .alias("pr_auc"),
    )
