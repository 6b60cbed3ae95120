"""Graph algorithms over a data-derived co-occurrence graph.

The graph: suppliers are nodes; the weight of edge (a, b) is the number of
orders whose lineitems include both suppliers. Dense small-SF graphs are
tamed by a mutual-top-k sparsification (each node keeps its 8 strongest
neighbors; an edge survives only if BOTH endpoints kept it) — the standard
kNN-graph construction, which bounds every node's degree by a constant so
downstream triangle enumeration is O(V * k^2) at ANY scale instead of
O(V * d_max^2) on a possibly-complete co-occurrence graph.

Companion to the connected-components operator (dedup_clusters,
operators/dedup.py) — together: components, triangles/clustering
structure, and PageRank centrality.

Scale notes (100 TB):
  * the co-occurrence count gathers each order's supplier list with ONE
    fact-scale groupBy and expands within-order pairs map-side (HOF
    product over the bounded ~7-lineitem order) — same multiplicity
    semantics as the oracle's lineitem self-join, one less fact shuffle;
    the pair explosion is a constant factor of lineitem, not quadratic;
  * top-k per node is one window over the edge list; the mutual filter is
    a self-join on the k-bounded survivor set — tiny;
  * PageRank iterations are one broadcast join + one groupBy per round
    over the right-sized cached edge table (~2M rows/partition), with a
    lineage cut every 5th round — in-between rounds chain as nested
    broadcast stages in a single job (same pattern as k-means,
    clustering.py:117, plus the round-5 checkpoint batching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from contextlib import contextmanager

from ..catalog import Tables
from ..registry import register


@contextmanager
def _aqe_off(spark: SparkSession):
    """Disable AQE around an iterative loop's materializations.

    Every round of a broadcast-iterand loop is already explicitly
    sized (broadcast hints, pre-repartitioned cached edge sets), so
    AQE has nothing to improve — but its per-stage re-planning adds
    driver latency to EVERY chained round (measured at sf0.1:
    pagerank 5.5 -> 4.5 s, LPA 4.4 -> 3.9 s medians). Scoped to the
    loop body and restored in finally; at cluster scale the guarded
    section still behaves: the joins it covers are hint-pinned, and
    skew-sensitive exchanges (the edge build) run OUTSIDE the guard.
    """
    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)

TOP_K = 8
PR_ITERS = 10
PR_DAMP = 0.85
# fixed-point quantum for order-free PageRank contribution sums: each
# rank*p product is floored to 2^-40 units and summed as exact integers,
# so the per-iteration aggregate (and hence every rank double) is
# bit-identical at ANY parallelism AND across engines — the
# embeddings_linalg.py Gram trick applied to link analysis. Bound:
# sum(rank*p) <= 1 per dst, so fx <= 2^40 * indegree << 2^63.
PR_FP = 1 << 40

_EDGES_ORACLE = f"""
        WITH pairs AS MATERIALIZED (
            -- MATERIALIZED throughout: several consumers reference
            -- `edges` many times (and the BFS oracle joins it inside a
            -- recursive CTE, which re-evaluates its inputs EVERY
            -- iteration) — inlined, DuckDB re-ran the fact self-join
            -- per reference (the round-4 inlining trap)
            SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS w
            FROM lineitem a
            JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        ),
        directed AS MATERIALIZED (
            SELECT s1 AS src, s2 AS dst, w FROM pairs
            UNION ALL
            SELECT s2, s1, w FROM pairs
        ),
        topk AS MATERIALIZED (
            SELECT src, dst FROM (
                SELECT src, dst,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY w DESC, dst) AS rn
                FROM directed
            ) WHERE rn <= {TOP_K}
        ),
        edges AS MATERIALIZED (
            SELECT a.src AS s1, a.dst AS s2
            FROM topk a JOIN topk b ON a.src = b.dst AND a.dst = b.src
            WHERE a.src < a.dst
        )
"""


def cooccurrence_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH orientations of the weighted co-occurrence graph
    (src, dst, w = lineitem-pair count), in one aggregation.

    One groupBy(orderkey) gathers each order's supplier list (order size
    is bounded ~7), then the within-order ordered-pair expansion (x != y
    by value) runs map-side as a higher-order-function product — per
    distinct supplier pair this emits m_x * m_y rows in each direction,
    exactly the oracle's a.suppkey < b.suppkey lineitem self-join UNION
    ALL its swap. Building directed natively (instead of pairs + union)
    halves the plan: one fact-scale shuffle (collect_list) and one pair
    reduce, no duplicated lineage under the union."""
    t = Tables(spark, sf_dir)
    per_order = (
        t.lineitem.select("l_orderkey", "l_suppkey")
        # keyed pre-repartition: the fact parquet arrives as 1-2 input
        # splits, so the partial collect_list would run near-serial on
        # the scan stage; repartitioning BY THE GROUP KEY moves the
        # whole aggregate (and the downstream pair explode) onto the
        # full core count while the groupBy reuses the partitioning —
        # no second exchange (A/B at sf0.1: 5.3/2.0 s -> 2.4/1.4 s).
        # At 100 TB input splits are plentiful and this exchange is a
        # no-op cost next to the aggregate itself.
        .repartition(
            spark.sparkContext.defaultParallelism, "l_orderkey"
        )
        .groupBy("l_orderkey")
        .agg(F.collect_list("l_suppkey").alias("ss"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x: F.transform(
                F.filter(F.col("ss"), lambda y: x != y),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    return (
        per_order.select(F.explode(pair_arr).alias("p"))
        .select("p.src", "p.dst")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )


# max directed co-occurrence rows resolved by the single-task
# sparsification kernel (same bound as the BFS/katz/pagerank kernels)
_CO_EDGES_LOCAL_CAP = 4_000_000


def _directed_pinned(spark, sf_dir):
    """(lazily checkpointed directed co-occurrence table, row count) —
    the shared cap-gate read for the kernel family; the count is also
    the materialization job for the checkpoint."""
    pinned = cooccurrence_directed(spark, sf_dir).localCheckpoint(
        eager=False
    )
    return pinned, pinned.count()


def _mutual_prefiltered(pinned):
    """Two-stage kernel input shape (round-12): the parallel per-batch
    local top-K prefilter runs across all partitions of the
    materialized checkpoint, and the repartition(1) exchange funnels
    only the ~K-per-(batch, src) survivors into the single merge task —
    vs coalesce(1), which would collapse the prefilter itself into the
    serial task. The repartition("src") exchange makes each task's rows
    complete per src, so the prefilter emits the EXACT global per-src
    top-K — cutting the serial Arrow transfer from |directed| rows to
    <= K per src (measured 907k -> ~8k at sf0.1). A/B note: a per-batch
    prefilter WITHOUT the src exchange only cut 907k -> 697k (srcs here
    average ~900 neighbors spread across batches) and was a wash."""
    return pinned.repartition("src").mapInPandas(
        _local_topk_prefilter, "src long, dst long, w long"
    ).repartition(1)


def _local_topk_prefilter(batches):
    """Parallel stage-1 of the two-stage mutual-top-K kernel: per TASK
    (the caller partitions by src, so each src's rows are complete
    here), keep each src's top-K rows by (w desc, dst asc) — the EXACT
    global per-src top-K, computed in parallel across partitions. The
    single merge task downstream then ships <= K rows per src instead
    of the full directed table (measured 907k -> ~8k at sf0.1)."""
    import numpy as np
    import pandas as pd

    ss, ds, ws = [], [], []
    for pdf in batches:
        ss.append(pdf["src"].to_numpy(dtype=np.int64))
        ds.append(pdf["dst"].to_numpy(dtype=np.int64))
        ws.append(pdf["w"].to_numpy(dtype=np.int64))
    if not ss or not sum(len(a) for a in ss):
        return
    s = np.concatenate(ss)
    d = np.concatenate(ds)
    w = np.concatenate(ws)
    order = np.lexsort((d, -w, s))
    gs = s[order]
    starts = np.empty(len(gs), dtype=bool)
    starts[0] = True
    starts[1:] = gs[1:] != gs[:-1]
    group_start = np.maximum.accumulate(
        np.where(starts, np.arange(len(gs)), 0)
    )
    rank = np.arange(len(gs)) - group_start
    keep = order[rank < TOP_K]
    yield pd.DataFrame(
        {"src": pd.Series(s[keep], dtype="int64"),
         "dst": pd.Series(d[keep], dtype="int64"),
         "w": pd.Series(w[keep], dtype="int64")}
    )


def _topk_mutual_ids(batches):
    """Exact mutual-top-K sparsification over one task's (src, dst, w)
    directed co-occurrence rows: per src keep the top-K neighbors by
    (w desc, dst asc) — identical to the row_number window — then keep
    pairs present in BOTH directions. Returns (s1_ids, s2_ids) numpy
    arrays with s1 < s2 (empty on empty input). Pure integer
    selection/dedup ops, row-identical to the DataFrame path."""
    import numpy as np

    ss, ds, ws = [], [], []
    for pdf in batches:
        ss.append(pdf["src"].to_numpy(dtype=np.int64))
        ds.append(pdf["dst"].to_numpy(dtype=np.int64))
        ws.append(pdf["w"].to_numpy(dtype=np.int64))
    if not ss or not sum(len(a) for a in ss):
        empty = np.zeros(0, dtype=np.int64)
        return empty, empty
    s = np.concatenate(ss)
    d = np.concatenate(ds)
    w = np.concatenate(ws)
    nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    si, di = inv[: len(s)], inv[len(s):]
    n = len(nodes)
    # rank within src by (w desc, dst asc): lexsort is stable, last key
    # is primary
    order = np.lexsort((di, -w, si))
    gs = si[order]
    starts = np.empty(len(gs), dtype=bool)
    starts[0] = True
    starts[1:] = gs[1:] != gs[:-1]
    group_start = np.maximum.accumulate(
        np.where(starts, np.arange(len(gs)), 0)
    )
    rank = np.arange(len(gs)) - group_start
    keep = order[rank < TOP_K]
    ka, kb = si[keep], di[keep]
    # mutual: (a, b) kept AND (b, a) kept — membership via sorted packed keys
    pack = ka * n + kb
    pack_sorted = np.sort(pack)
    swapped = kb * n + ka
    pos = np.searchsorted(pack_sorted, swapped)
    pos = np.minimum(pos, len(pack_sorted) - 1)
    mutual = pack_sorted[pos] == swapped
    m = (ka < kb) & mutual
    return nodes[ka[m]], nodes[kb[m]]


def _topk_mutual_kernel(batches):
    """mapInPandas wrapper over _topk_mutual_ids: emits the mutual
    edge rows (s1, s2) with s1 < s2."""
    import pandas as pd

    s1, s2 = _topk_mutual_ids(batches)
    yield pd.DataFrame(
        {"s1": pd.Series(s1, dtype="int64"),
         "s2": pd.Series(s2, dtype="int64")}
    )


def cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-top-8 sparsified supplier co-occurrence edges (s1 < s2).

    Round-11: under _CO_EDGES_LOCAL_CAP the partitioned top-k window +
    mutual self-join (two exchanges + a sort, paid by every one of the
    ~12 graph consumers) run as one vectorized single-task kernel over
    the checkpointed directed table; the DataFrame path below is the
    at-scale fallback, row-identical (exact integer selection)."""
    pinned, n_directed = _directed_pinned(spark, sf_dir)
    return _edges_from_directed(pinned, n_directed)


def _edges_from_directed(pinned, n_directed) -> DataFrame:
    """Mutual-top-8 edge set from an already-pinned directed table —
    factored out so fused consumers (LPA, triangle) can fall back
    WITHOUT rebuilding the directed table past the cap."""
    if n_directed <= _CO_EDGES_LOCAL_CAP:
        # the result must be pinned too: consumers reference the edge
        # set several times (adjacency unions, wedge joins, membership
        # anti-joins) and mapInPandas is NOT an Exchange — without the
        # checkpoint ReuseExchange cannot dedup it and the kernel
        # re-executes per reference (measured: clustering_coefficient
        # 3.4 -> 7.8 s before this pin)
        return _mutual_prefiltered(pinned).mapInPandas(
            _topk_mutual_kernel, "s1 long, s2 long"
        ).localCheckpoint(eager=False)
    win = W.partitionBy("src").orderBy(F.col("w").desc(), "dst")
    topk = (
        pinned.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= TOP_K)
        .select("src", "dst")
    )
    ta = topk.alias("ta")
    tb = topk.alias("tb")
    return (
        ta.join(
            tb,
            (F.col("ta.src") == F.col("tb.dst"))
            & (F.col("ta.dst") == F.col("tb.src")),
        )
        .where(F.col("ta.src") < F.col("ta.dst"))
        .select(F.col("ta.src").alias("s1"), F.col("ta.dst").alias("s2"))
    )


def _triangle_kernel(batches):
    """Fused single-task kernel: mutual-top-K edges, then ordered-wedge
    triangle enumeration — for each edge pair (a,b),(b,c) check (a,c)
    membership, exactly the e1/e2/e3 join. Degree <= TOP_K bounds the
    wedge expansion at TOP_K * E rows. Always emits exactly ONE
    (n_edges, n_triangles) row (0, 0 on an empty graph), matching the
    count-aggregate crossJoin of the DataFrame path."""
    import numpy as np
    import pandas as pd

    s1, s2 = _topk_mutual_ids(batches)
    n_edges = len(s1)
    n_tri = 0
    if n_edges:
        nodes, inv = np.unique(np.concatenate([s1, s2]),
                               return_inverse=True)
        ka, kb = inv[:n_edges], inv[n_edges:]
        n = len(nodes)
        order = np.lexsort((kb, ka))
        ea, eb = ka[order], kb[order]
        pack_sorted = ea * n + eb  # ascending: sorted by (ea, eb)
        starts = np.searchsorted(ea, np.arange(n), side="left")
        ends = np.searchsorted(ea, np.arange(n), side="right")
        cnt = ends[eb] - starts[eb]  # wedge continuations per edge
        offsets = np.concatenate(([0], np.cumsum(cnt)))
        rep_edge = np.repeat(np.arange(n_edges), cnt)
        within = np.arange(offsets[-1]) - offsets[rep_edge]
        second = starts[eb[rep_edge]] + within
        key = ea[rep_edge] * n + eb[second]  # (a, c) candidate edge
        pos = np.searchsorted(pack_sorted, key)
        pos = np.minimum(pos, n_edges - 1)
        n_tri = int(np.sum(pack_sorted[pos] == key))
    yield pd.DataFrame(
        {"n_edges": pd.Series([n_edges], dtype="int64"),
         "n_triangles": pd.Series([n_tri], dtype="int64")}
    )


@register(
    "q_triangle_count",
    oracle=_EDGES_ORACLE + """
        SELECT (SELECT count(*) FROM edges) AS n_edges,
               (SELECT count(*)
                FROM edges e1
                JOIN edges e2 ON e1.s2 = e2.s1
                JOIN edges e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
               ) AS n_triangles
    """,
    doc="Triangle count on the mutual-top-8 supplier co-occurrence graph "
        "(ordered-wedge enumeration: s1<s2<s3 via two joins on the "
        "degree-bounded edge list). Sparsification caps the join volume at "
        "V*64 wedges regardless of how dense co-occurrence gets.",
    bench=True,
    tags=("graph",),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round-12: under the kernel cap, triangle counting fuses into the
    # mutual-top-8 merge task itself (exact integer wedge enumeration
    # over the degree-<=8 edge set) — one job instead of kernel +
    # cache + three broadcast joins + two aggregations. The join
    # formulation below stays the at-scale path, row-identical.
    pinned, n_directed = _directed_pinned(spark, sf_dir)
    if n_directed <= _CO_EDGES_LOCAL_CAP:
        return _mutual_prefiltered(pinned).mapInPandas(
            _triangle_kernel, "n_edges long, n_triangles long"
        )
    # .cache() (not eager localCheckpoint): the returned DataFrame must
    # stay lazy with full lineage so plan audits see the edge-building
    # stages. The cache is released by the harnesses' per-query
    # clearCache (verify_local, bench) — the repo-wide convention for
    # shared intermediates, restated in tests/test_graph_behavioral.py
    # for contexts that call operators directly.
    edges = _edges_from_directed(pinned, n_directed).cache()
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.s2") == F.col("e2.s1"))
    tris = wedges.join(
        e3,
        (F.col("e3.s1") == F.col("e1.s1"))
        & (F.col("e3.s2") == F.col("e2.s2")),
    )
    n_tri = tris.agg(F.count("*").alias("n_triangles"))
    n_edge = edges.agg(F.count("*").alias("n_edges"))
    return n_edge.crossJoin(n_tri).select("n_edges", "n_triangles")


@register(
    "q_degree_distribution",
    oracle=_EDGES_ORACLE + """
        SELECT degree, count(*) AS n_nodes FROM (
            SELECT node, count(*) AS degree FROM (
                SELECT s1 AS node FROM edges
                UNION ALL
                SELECT s2 FROM edges
            ) GROUP BY node
        ) GROUP BY degree
    """,
    doc="Degree histogram of the sparsified co-occurrence graph — the "
        "profile that validates the mutual-top-k cap (no degree exceeds "
        "TOP_K).",
    tags=("graph",),
)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = cooccurrence_edges(spark, sf_dir)
    nodes = edges.select(F.col("s1").alias("node")).unionAll(
        edges.select(F.col("s2").alias("node"))
    )
    return (
        nodes.groupBy("node")
        .agg(F.count("*").alias("degree"))
        .groupBy("degree")
        .agg(F.count("*").alias("n_nodes"))
    )


def _pagerank_oracle() -> str:
    """DuckDB SQL reproducing graph_pagerank EXACTLY: the 10 iterations
    are unrolled as chained CTEs (standard SQL forbids aggregation over
    the recursive term, and unrolling a FIXED iteration count is the
    honest equivalent), and every iteration uses the same fixed-point
    contribution sum as the Spark side, so the rank doubles are
    bit-identical by induction — no tolerance needed."""
    fp = float(PR_FP)
    iters = []
    for i in range(PR_ITERS):
        iters.append(f"""
        , r{i + 1} AS MATERIALIZED (
            SELECT n.node,
                   (CAST(1 AS DOUBLE) - CAST({PR_DAMP} AS DOUBLE))
                       / (SELECT n FROM nn)
                   + CAST({PR_DAMP} AS DOUBLE)
                     * COALESCE(CAST(s.fx AS DOUBLE) / {fp},
                                CAST(0 AS DOUBLE)) AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst,
                       CAST(SUM(CAST(floor(r.rank * e.p * {fp}) AS BIGINT))
                            AS BIGINT) AS fx
                FROM r{i} r JOIN norm e ON r.node = e.src
                GROUP BY e.dst
            ) s ON n.node = s.dst
        )""")
    return f"""
        WITH pairs AS MATERIALIZED (
            SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, count(*) AS w
            FROM lineitem a
            JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        ),
        directed AS MATERIALIZED (
            SELECT s1 AS src, s2 AS dst, CAST(w AS BIGINT) AS w FROM pairs
            UNION ALL
            SELECT s2, s1, CAST(w AS BIGINT) FROM pairs
        ),
        nn AS MATERIALIZED (SELECT COUNT(DISTINCT src) AS n FROM directed),
        outw AS MATERIALIZED (
            SELECT src, CAST(SUM(w) AS BIGINT) AS w_out
            FROM directed GROUP BY src
        ),
        norm AS MATERIALIZED (
            SELECT d.src, d.dst,
                   CAST(d.w AS DOUBLE) / CAST(o.w_out AS DOUBLE) AS p
            FROM directed d JOIN outw o ON d.src = o.src
        ),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM directed),
        r0 AS MATERIALIZED (
            SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank
            FROM nodes
        ){''.join(iters)}
        SELECT node, round(rank, 6) AS rank
        FROM r{PR_ITERS}
        ORDER BY round(rank, 6) DESC, node
        LIMIT 20
    """


# max edge rows for the single-task pagerank kernel (the BFS/katz/CC
# cap): ~96 MB of (src, dst, w) int64 triples, 10 O(E) vectorized
# sweeps
_PR_LOCAL_EDGE_CAP = 4_000_000


def _pagerank_kernel(batches):
    """Exact single-task replay of the pagerank loop over one
    partition's (src, dst, w) directed edge rows. Bit-identical to the
    distributed path by the same argument that licenses the DuckDB
    oracle: the per-iteration contribution sum is exact int64 in 2^-40
    fixed point (order-free), and every float step — p = w/w_out,
    floor((rank*p)*2^40), teleport + 0.85*(fx/2^40) — is the identical
    sequence of correctly-rounded IEEE ops in numpy and the JVM
    (CLAUDE.md round-5 §2). Emits (node, rank) for every node."""
    import numpy as np
    import pandas as pd

    ss, ds, ws = [], [], []
    for pdf in batches:
        ss.append(pdf["src"].to_numpy(dtype=np.int64))
        ds.append(pdf["dst"].to_numpy(dtype=np.int64))
        ws.append(pdf["w"].to_numpy(dtype=np.int64))
    if not ss or not sum(len(a) for a in ss):
        yield pd.DataFrame(
            {"node": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="float64")}
        )
        return
    s = np.concatenate(ss)
    d = np.concatenate(ds)
    w = np.concatenate(ws)
    # the directed edge list is symmetric, so unique(src) == the node set
    nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
    ui, vi = inv[: len(s)], inv[len(s):]
    n = len(nodes)
    w_out = np.zeros(n, dtype=np.int64)
    np.add.at(w_out, ui, w)
    # identical float64 division sequence to the Spark projection
    p = w.astype(np.float64) / w_out[ui].astype(np.float64)
    rank = np.full(n, 1.0 / n, dtype=np.float64)
    teleport = (1.0 - PR_DAMP) / n
    fp = float(PR_FP)
    for _ in range(PR_ITERS):
        contrib = np.floor((rank[ui] * p) * fp).astype(np.int64)
        fx = np.zeros(n, dtype=np.int64)
        np.add.at(fx, vi, contrib)
        rank = teleport + PR_DAMP * (fx.astype(np.float64) / fp)
    yield pd.DataFrame(
        {"node": pd.Series(nodes, dtype="int64"),
         "rank": pd.Series(rank, dtype="float64")}
    )


def pagerank_round(
    norm: DataFrame, ranks: DataFrame, teleport: float
) -> DataFrame:
    """One PageRank iteration body — broadcast the node-sized rank
    table into the cached normalized edge list, sum inbound mass in
    2^-40 fixed point, rescale. Factored out of the loop so
    tools/plan_report.py can render the per-round physical plan that
    localCheckpoint otherwise truncates to Scan ExistingRDD
    (VERDICT r6 #6)."""
    return (
        norm.join(F.broadcast(ranks), norm["src"] == ranks["node"])
        .groupBy("dst")
        .agg(
            F.sum(
                F.floor(
                    F.col("rank") * F.col("p") * F.lit(float(PR_FP))
                ).cast("long")
            ).alias("fx")
        )
        .select(
            F.col("dst").alias("node"),
            (
                F.lit(teleport)
                + F.lit(PR_DAMP)
                * (F.col("fx").cast("double") / F.lit(float(PR_FP)))
            ).alias("rank"),
        )
    )



@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(),
    doc="Weighted PageRank (damping 0.85, 10 iterations) on the full "
        "directed co-occurrence graph; returns the top 20 suppliers by "
        "rank rounded to 6 (suppkey tie-break). Per-iteration inbound "
        "mass is summed in 2^-40 FIXED POINT (floor one double product, "
        "sum exact integers, rescale by the exact power of two), so "
        "every rank double is bit-identical at any parallelism and "
        "across engines — which is what licenses the unrolled-CTE "
        "DuckDB oracle to hash-match an iterative algorithm. Join + "
        "groupBy per iteration, localCheckpoint to cut lineage — the "
        "k-means pattern (clustering.py:117) applied to link analysis.",
    bench=True,
    tags=("graph",),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = cooccurrence_directed(spark, sf_dir).localCheckpoint(
        eager=False
    )
    n_edges = edges.count()
    # single-task exact kernel under the cap (the BFS/katz treatment):
    # the 2^-40 fixed-point design makes every rank double bit-identical
    # at ANY parallelism — including one task — so when the edge set
    # fits, the 10-round broadcast loop (2 jobs per 5 rounds plus
    # out_w/norm materializations; bench median 8.2 s at sf0.1 under
    # ambient load) collapses into one vectorized mapInPandas pass. The
    # distributed loop below is unchanged as the at-scale path.
    if n_edges <= _PR_LOCAL_EDGE_CAP:
        ranks = edges.coalesce(1).mapInPandas(
            _pagerank_kernel, "node long, rank double"
        )
        return (
            ranks.select("node", F.round("rank", 6).alias("rank"))
            .orderBy(F.col("rank").desc(), "node")
            .limit(20)
        )
    edges = edges.cache()
    # out_w's group keys ARE the node set (the directed edge list is
    # symmetric, every node appears as src), so a separate
    # select(src).distinct() job would be redundant — cache out_w and
    # read both n_nodes and the initial rank rows off it (one fewer
    # shuffle job per query)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("w_out")).cache()
    n_nodes = out_w.count()  # also materializes the edges cache
    # right-size the cached edge table the 10 iterations rescan: the
    # session's 32 shuffle partitions hold ~30k rows each here — per-
    # iteration stage overhead (32 tasks x 10 rounds x 2 stages) costs
    # more than the scan itself (measured 5.0 s -> 2.6 s for the
    # iteration loop at sf0.1). ~2M rows per partition keeps the same
    # repartition correct at 1000x the edges; the count above is free
    # on the just-materialized checkpoint.
    n_parts = max(4, int(n_edges // 2_000_000) + 1)
    norm = (
        # out_w is node-dimension-sized: broadcast so normalizing the
        # edge table never shuffles it
        edges.repartition(n_parts)
        .join(F.broadcast(out_w), "src")
        .select(
            "src",
            "dst",
            (F.col("w").cast("double") / F.col("w_out").cast("double"))
            .alias("p"),
        )
        .cache()
    )
    # lazy: the first loop round's job materializes it (the eager cut
    # here was one whole extra driver job)
    ranks = out_w.select(
        F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint(eager=False)
    teleport = (1.0 - PR_DAMP) / n_nodes
    with _aqe_off(spark):
        for it in range(PR_ITERS):
            # the rank table is node-dimension-sized (suppliers), orders of
            # magnitude below the edge table — BROADCAST it so no iteration
            # ever re-shuffles the cached 900k-row edge side (measured 17 s
            # -> ~5 s at sf0.1; without the hint the localCheckpoint'd rank
            # RDD has no stats and Catalyst plans a sort-merge join every
            # round). For a web-scale graph whose node table outgrows
            # broadcast, pre-partition norm by src once and repartition
            # ranks to the same key instead (co-partitioned shuffle join).
            # the directed edge list is SYMMETRIC by construction (both
            # orientations of every pair), so every node with rank has
            # inbound edges and the contribution aggregate covers the node
            # set exactly — no dangling-node LEFT JOIN back to `nodes` is
            # needed (the oracle keeps the textbook left join; its probe
            # matches every row, so results are identical). Dropping it
            # halves the per-iteration stage count: bench-protocol median
            # (clearCache between runs) 7.2 s -> 3.9 s at sf0.1. A graph
            # built from asymmetric edges would need the left join back.
            ranks = pagerank_round(norm, ranks, teleport)
            # lineage cut every 5th iteration, not every one: iterations in
            # between CHAIN as nested broadcast-exchange stages inside a
            # single job (every exchange still executes exactly once), so
            # 10 rounds cost 2 driver jobs instead of 10 eager
            # materializations — the round-4 brief's checkpoint-batching
            # item. Interval sweep at sf0.1: every-1 ~5.0 s, every-2 2.63,
            # every-3 2.44, every-5 2.37, every-10 2.89 (plan-compile cost
            # overtakes job overhead) for the iteration loop.
            if (it + 1) % 5 == 0 or it + 1 == PR_ITERS:
                ranks = ranks.localCheckpoint()
    # ranks is materialized (localCheckpoint is eager), so the shared
    # intermediates can be released here instead of leaning on the
    # harnesses' per-query clearCache — repeated pytest calls would
    # otherwise accumulate cached edge/rank DataFrames in executor memory.
    for cached in (norm, out_w, edges):
        cached.unpersist()
    return (
        ranks.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(20)
    )


K_CORE = 3
KCORE_MAX_ITERS = 30


def _kcore_oracle() -> str:
    """DuckDB SQL reproducing graph_kcore exactly: the peel loop is
    unrolled to KCORE_MAX_ITERS rounds (standard SQL forbids aggregation
    over a recursive term). Peeling is monotone and idempotent at the
    fixpoint, so `Spark's <=30 rounds with early break` and `always 30
    unrolled rounds` produce the identical edge set — extra rounds after
    convergence are no-ops, and if convergence takes >30 rounds both
    sides stop at exactly round 30."""
    rounds = []
    for i in range(KCORE_MAX_ITERS):
        # AS MATERIALIZED: DuckDB inlines single-reference CTEs, and e{i}
        # is referenced 3x per round — inlining would re-expand the whole
        # prefix 3^30 times (observed as "Too many open files" on the
        # base parquet). Materializing each round keeps the oracle linear.
        rounds.append(f"""
        , k{i} AS MATERIALIZED (
            SELECT src FROM e{i} GROUP BY src HAVING COUNT(*) >= {K_CORE}
        ), e{i + 1} AS MATERIALIZED (
            SELECT e.src, e.dst
            FROM e{i} e
            JOIN k{i} a ON e.src = a.src
            JOIN k{i} b ON e.dst = b.src
        )""")
    return f"""
        WITH pairs AS MATERIALIZED (
            SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
            FROM lineitem a
            JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        ),
        e0 AS MATERIALIZED (
            SELECT s1 AS src, s2 AS dst FROM pairs
            UNION ALL
            SELECT s2, s1 FROM pairs
        ){''.join(rounds)}
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM e{KCORE_MAX_ITERS}
        GROUP BY src
        ORDER BY node
    """


@register(
    "graph_kcore",
    oracle=_kcore_oracle(),
    doc="K-core decomposition (k=3) of the supplier co-occurrence graph: "
        "iteratively peel nodes of degree < k until fixpoint. Each round "
        "is one degree aggregation + two semi-join prunes on the "
        "surviving edge set, localCheckpoint cutting the lineage "
        "(the k-means / PageRank iteration pattern); AQE picks "
        "broadcast vs shuffle for the keep-set joins by size. The "
        "fixpoint is unique regardless of peel order (integer-only "
        "computation, no float drift possible), so the output "
        "(surviving node, in-core degree) is deterministic and "
        "hash-matched by a max-rounds-unrolled DuckDB peel.",
    tags=("graph",),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = cooccurrence_directed(spark, sf_dir).select("src", "dst")
    cur = edges.localCheckpoint()
    n_edges = cur.count()
    for _ in range(KCORE_MAX_ITERS):
        deg = cur.groupBy("src").agg(F.count("*").alias("d"))
        keep = deg.where(F.col("d") >= K_CORE).select("src")
        # keep is node-dimension-sized; BROADCAST both semi-joins so no
        # peel round shuffles the edge set (localCheckpoint'd edges have
        # no stats, so Catalyst would otherwise sort-merge 2x per round
        # — measured 17x wall growth on 10x data before the hint, 1.0x
        # after)
        nxt = (
            cur.join(F.broadcast(keep), "src", "left_semi")
            .join(
                F.broadcast(keep.select(F.col("src").alias("dst"))),
                "dst",
                "left_semi",
            )
            .localCheckpoint()
        )
        n_next = nxt.count()
        cur = nxt
        if n_next == n_edges:
            break
        n_edges = n_next
    return (
        cur.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("degree"))
        .orderBy("node")
    )


_BFS_MAX_HOPS = 20

_BFS_ORACLE = _EDGES_ORACLE.replace("WITH pairs", "WITH RECURSIVE pairs", 1) + f"""
        , both_dir AS MATERIALIZED (
            -- MATERIALIZED: the recursive walk joins both_dir every
            -- iteration (20 rounds) — inlined it re-expanded the whole
            -- edge construction per round
            SELECT s1 AS u, s2 AS v FROM edges
            UNION ALL
            SELECT s2, s1 FROM edges
        ), src AS (
            SELECT MIN(s1) AS s FROM edges
        ), walk(node, d) AS (
            SELECT s, 0 FROM src
            UNION
            SELECT b.v, w.d + 1
            FROM walk w JOIN both_dir b ON w.node = b.u
            WHERE w.d < {_BFS_MAX_HOPS}
        )
        SELECT node, CAST(MIN(d) AS BIGINT) AS hops
        FROM walk GROUP BY node
"""

# max edge rows resolved by the single-task BFS kernel: ~64 MB of int64
# pairs, <=20 O(E) vectorized sweeps (~0.3 s) — same bound as
# functions/graph._LOCAL_CC_EDGE_CAP
_BFS_LOCAL_EDGE_CAP = 4_000_000


def _bfs_kernel(batches):
    """Exact radius-bounded BFS over one partition's (u, v) edge rows
    (both orientations present) — thin wrapper over _bfs_np."""
    import numpy as np
    import pandas as pd

    us, vs = [], []
    for pdf in batches:
        us.append(pdf["u"].to_numpy(dtype=np.int64))
        vs.append(pdf["v"].to_numpy(dtype=np.int64))
    if not us or not sum(len(a) for a in us):
        yield pd.DataFrame(
            {"node": pd.Series([], dtype="int64"),
             "hops": pd.Series([], dtype="int64")}
        )
        return
    yield _bfs_np(np.concatenate(us), np.concatenate(vs))


def _bfs_fused_kernel(batches):
    """Fused single-task kernel (round-12, the LPA/triangle treatment):
    mutual-top-K edges then the BFS rounds, skipping the intermediate
    edge materialization + union + count jobs. Row-identical to
    _bfs_kernel over cooccurrence_edges' both-orientations table."""
    import numpy as np
    import pandas as pd

    s1, s2 = _topk_mutual_ids(batches)
    if not len(s1):
        yield pd.DataFrame(
            {"node": pd.Series([], dtype="int64"),
             "hops": pd.Series([], dtype="int64")}
        )
        return
    yield _bfs_np(np.concatenate([s1, s2]), np.concatenate([s2, s1]))


def _bfs_np(u, v):
    """Radius-bounded BFS core over (u, v) edge id arrays (both
    orientations present). Root = the minimum node id (== the loop
    path's both.agg(min(u)) because the edge list is symmetric).
    Returns the (node, hops) pandas frame for every node reached within
    _BFS_MAX_HOPS — row-identical to the distributed frontier loop (hop
    distances are exact integers; no float order sensitivity)."""
    import numpy as np
    import pandas as pd

    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    n = len(nodes)
    dist = np.full(n, -1, dtype=np.int64)
    dist[0] = 0  # np.unique sorts ascending -> index 0 IS the min node
    frontier = np.zeros(n, dtype=bool)
    frontier[0] = True
    for d in range(1, _BFS_MAX_HOPS + 1):
        cand = vi[frontier[ui]]
        cand = cand[dist[cand] < 0]
        if cand.size == 0:
            break
        cand = np.unique(cand)
        dist[cand] = d
        frontier[:] = False
        frontier[cand] = True
    reached = dist >= 0
    return pd.DataFrame(
        {"node": pd.Series(nodes[reached], dtype="int64"),
         "hops": pd.Series(dist[reached], dtype="int64")}
    )


@register(
    "graph_bfs_hops",
    oracle=_BFS_ORACLE,
    doc="Single-source BFS hop distances (radius-bounded at "
        f"{_BFS_MAX_HOPS}) from the minimum node of the mutual-top-8 "
        "co-occurrence graph. Frontier-expansion BFS: each round joins "
        "only the FRONTIER (nodes first reached last round) against the "
        "edge list and anti-joins the visited set — per-round cost is "
        "proportional to the frontier's edge boundary, never the whole "
        "graph; lineage truncated per round. This is the traversal "
        "primitive under shortest-path features and reachability "
        "filters; oracle = recursive-CTE reachability with depth bound.",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round-12: the sparsification fuses INTO the kernel task (the LPA/
    # triangle treatment — mutual edges <= directed rows makes the
    # directed-row gate strictly safer than the old 2x-edges gate),
    # skipping the intermediate edge kernel + union + count jobs; the
    # both-table kernel and the distributed frontier loop below stay as
    # the fallback ladder for data past each cap.
    pinned, n_directed = _directed_pinned(spark, sf_dir)
    if n_directed <= _CO_EDGES_LOCAL_CAP:
        return _mutual_prefiltered(pinned).mapInPandas(
            _bfs_fused_kernel, "node long, hops long"
        )
    edges = _edges_from_directed(pinned, n_directed)
    both = (
        edges.select(F.col("s1").alias("u"), F.col("s2").alias("v"))
        .union(edges.select(F.col("s2").alias("u"), F.col("s1").alias("v")))
        # lazy: the count below materializes AND persists it in one job
        .localCheckpoint(eager=False)
    )
    n_both = both.count()
    # single-task exact kernel when the sparsified edge set fits one
    # task (the min_label_components pattern, CLAUDE.md r6 §1, applied
    # to traversal): a Spark BFS pays one driver job per ROUND — up to
    # _BFS_MAX_HOPS jobs whose per-round stage wall dwarfs the ~V*8-row
    # data work at any local scale (measured 7.4 s in-sweep at sf0.1) —
    # while the vectorized numpy kernel resolves all rounds in one
    # mapInPandas task. Hop distances are exact integers, so kernel and
    # loop emit IDENTICAL rows; the distributed frontier loop below
    # remains the at-scale path (edge sets past the cap).
    if n_both <= _BFS_LOCAL_EDGE_CAP:
        return both.coalesce(1).mapInPandas(
            _bfs_kernel, "node long, hops long"
        )
    # right-size the edge list every round rescans (the pagerank
    # treatment): mutual-top-8 sparsification bounds it at V*8 rows, so
    # session-default partitioning holds ~250 rows per task here — pure
    # stage overhead (measured 6.3 s -> 4.3 s at sf0.1). Shrink-only:
    # coalesce to ~2M rows per partition when the checkpoint is
    # over-partitioned (a narrow, per-round-free op); when the count
    # calls for MORE partitions than the checkpoint has, leave it alone
    # — upstream cluster-sized shuffle.partitions governs the upper
    # bound, and a coalesce there would silently cap parallelism (a
    # repartition+re-checkpoint costs ~1.2 s, more than it saves here).
    target = max(4, int(n_both // 2_000_000) + 1)
    if target < both.rdd.getNumPartitions():
        both = both.coalesce(target)
    # bounded driver-side scalar: the BFS root (one bigint)
    s0 = both.agg(F.min("u")).collect()[0][0]
    visited = spark.createDataFrame(
        [(s0, 0)], "node long, hops long"
    ).localCheckpoint()
    frontier = visited.select("node")
    for d in range(1, _BFS_MAX_HOPS + 1):
        nxt = (
            # the frontier is the small side by construction — broadcast
            # it so the edge list never shuffles
            both.join(F.broadcast(frontier), frontier["node"] == both["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(d).cast("long"))
            # lazy cut + count(): ONE job per round materializes and
            # persists every partition AND answers the emptiness check
            # (eager localCheckpoint + isEmpty cost two jobs per round,
            # and isEmpty on a lazy checkpoint persists only the
            # partitions it touches)
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            break
        # union accretes nxt's partitions every round; keep the visited
        # set compact WITHOUT an extra eager materialization per round —
        # unions of already-checkpointed rounds are cheap lineage
        visited = visited.union(nxt).coalesce(
            spark.sparkContext.defaultParallelism
        )
        frontier = nxt.select("node")
    return visited


_LP_K = 20  # predicted links to emit


@register(
    "graph_link_prediction",
    oracle=_EDGES_ORACLE + f"""
        , adj AS (
            SELECT s1 AS a, s2 AS n FROM edges
            UNION ALL
            SELECT s2, s1 FROM edges
        ), deg AS (
            SELECT a, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY a
        ), cand AS (
            SELECT x.a AS s1, y.a AS s2, CAST(count(*) AS BIGINT) AS cn
            FROM adj x JOIN adj y ON x.n = y.n AND x.a < y.a
            GROUP BY x.a, y.a
        ), nonedge AS (
            SELECT c.s1, c.s2, c.cn
            FROM cand c LEFT JOIN edges e ON e.s1 = c.s1 AND e.s2 = c.s2
            WHERE e.s1 IS NULL
        ), scored AS (
            SELECT ne.s1, ne.s2, ne.cn,
                   CAST(ne.cn AS DOUBLE) / (da.d + db.d - ne.cn) AS jaccard
            FROM nonedge ne
            JOIN deg da ON da.a = ne.s1
            JOIN deg db ON db.a = ne.s2
        )
        SELECT s1, s2, cn, jaccard, rk FROM (
            SELECT s1, s2, cn, jaccard,
                   row_number() OVER (
                       ORDER BY jaccard DESC, cn DESC, s1, s2
                   ) AS rk
            FROM scored
        ) WHERE rk <= {_LP_K}
    """,
    doc="Neighborhood-overlap link prediction on the mutual-top-8 "
        "supplier graph: for every NON-adjacent pair sharing at least "
        "one neighbor, common-neighbor count and Jaccard coefficient "
        f"cn / (deg_a + deg_b - cn); top-{_LP_K} predicted edges. "
        "Candidate generation is the wedge self-join on the "
        "degree-capped adjacency list — O(V * k^2) pairs at ANY scale "
        "(never all-pairs), the same bound that makes the triangle "
        "count tractable. Scores are exact int/int double divisions "
        "(denominator >= max degree >= 1 by construction — no zero "
        "guard needed); ranking tie-breaks (cn, s1, s2) make the "
        "global top-k unique. The final window is a single global "
        "row_number over the wedge-bounded candidate set — at 100 TB "
        "swap in the top-k-per-partition + merge pattern "
        "(wordcount.py's wc_top20) if the candidate set outgrows one "
        "task; the k-bounded graph keeps it |V|*64 worst case.",
    tags=("graph",),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = cooccurrence_edges(spark, sf_dir).cache()
    adj = edges.select(
        F.col("s1").alias("a"), F.col("s2").alias("n")
    ).unionAll(edges.select(F.col("s2").alias("a"), F.col("s1").alias("n")))
    deg = adj.groupBy("a").agg(F.count("*").cast("bigint").alias("d"))
    x = adj.alias("x")
    y = adj.alias("y")
    cand = (
        x.join(y, (F.col("x.n") == F.col("y.n")) & (F.col("x.a") < F.col("y.a")))
        .groupBy(F.col("x.a").alias("s1"), F.col("y.a").alias("s2"))
        .agg(F.count("*").cast("bigint").alias("cn"))
    )
    nonedge = cand.join(edges, ["s1", "s2"], "left_anti")
    da = deg.select(F.col("a").alias("s1"), F.col("d").alias("da"))
    db = deg.select(F.col("a").alias("s2"), F.col("d").alias("db"))
    scored = (
        nonedge.join(F.broadcast(da), "s1")
        .join(F.broadcast(db), "s2")
        .select(
            "s1",
            "s2",
            "cn",
            (
                F.col("cn").cast("double")
                / (F.col("da") + F.col("db") - F.col("cn"))
            ).alias("jaccard"),
        )
    )
    # distributed top-K (TakeOrderedAndProject prunes per partition),
    # then a windowless rank over the surviving K rows
    from ..functions.ranking import ranked_rows

    top = scored.orderBy(
        F.desc("jaccard"), F.desc("cn"), F.asc("s1"), F.asc("s2")
    ).limit(_LP_K)
    return ranked_rows(
        top,
        [-F.col("jaccard"), -F.col("cn"), F.col("s1"), F.col("s2")],
        ["s1", "s2", "cn", "jaccard"],
        rank_col="rk",
    ).select(
        "s1", "s2", "cn", "jaccard",
        F.col("rk").cast("long").alias("rk"),
    )


@register(
    "graph_modularity",
    oracle=_EDGES_ORACLE + """
        , nodes AS (
            SELECT node, count(*) AS deg FROM (
                SELECT s1 AS node FROM edges
                UNION ALL
                SELECT s2 FROM edges
            ) GROUP BY node
        ), comm AS (
            SELECT n.node, n.deg, s.s_nationkey AS nationkey
            FROM nodes n JOIN supplier s ON s.s_suppkey = n.node
        ), m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
        internal AS (
            SELECT ca.nationkey, CAST(count(*) AS BIGINT) AS e_c
            FROM edges e
            JOIN comm ca ON ca.node = e.s1
            JOIN comm cb ON cb.node = e.s2
            WHERE ca.nationkey = cb.nationkey
            GROUP BY ca.nationkey
        ), per_comm AS (
            SELECT c.nationkey,
                   CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(COALESCE(any_value(i.e_c), 0) AS BIGINT) AS e_c,
                   CAST(SUM(c.deg) AS BIGINT) AS d_c
            FROM comm c LEFT JOIN internal i ON i.nationkey = c.nationkey
            GROUP BY c.nationkey
        )
        SELECT p.nationkey, p.n_nodes, p.e_c, p.d_c,
               CAST(4 * m.m * p.e_c - p.d_c * p.d_c AS BIGINT) AS q_num,
               CAST(CAST(4 * m.m * p.e_c - p.d_c * p.d_c AS BIGINT)
                    AS DOUBLE) / (CAST(4 AS DOUBLE) * m.m * m.m)
                   AS q_contrib
        FROM per_comm p, m
    """,
    doc="Newman modularity of the nation partition on the sparsified "
        "supplier graph — the community-quality score that validates "
        "an attribute (or label-prop) clustering before it drives "
        "downstream grouping. Per community: nodes, internal edges, "
        "degree mass, and its modularity contribution. The textbook "
        "Q = sum_c [e_c/m - (d_c/2m)^2] is a sum of float RATIOS — "
        "order-dependent cross-engine — so each term is restated over "
        "the common denominator 4m^2: q_num = 4*m*e_c - d_c^2 is an "
        "exact BIGINT per community (safe while m < ~1.5e9; beyond "
        "that switch the numerator to DECIMAL — noted, not hit, at "
        "this graph's V*k/2 edge bound), and the single double "
        "division per row is exact-op deterministic. One broadcast "
        "join to the supplier dim for communities; everything else "
        "reuses the degree-capped edge list.",
    tags=("graph",),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    edges = cooccurrence_edges(spark, sf_dir).cache()
    nodes = (
        edges.select(F.col("s1").alias("node"))
        .unionAll(edges.select(F.col("s2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    comm = nodes.join(
        F.broadcast(
            t.supplier.select(
                F.col("s_suppkey").alias("node"),
                F.col("s_nationkey").alias("nationkey"),
            )
        ),
        "node",
    )
    m = edges.agg(F.count("*").cast("bigint").alias("m"))
    ca = comm.select(F.col("node").alias("s1"), F.col("nationkey").alias("na"))
    cb = comm.select(F.col("node").alias("s2"), F.col("nationkey").alias("nb"))
    internal = (
        edges.join(F.broadcast(ca), "s1")
        .join(F.broadcast(cb), "s2")
        .filter(F.col("na") == F.col("nb"))
        .groupBy(F.col("na").alias("nationkey"))
        .agg(F.count("*").cast("bigint").alias("e_c"))
    )
    per_comm = (
        comm.groupBy("nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.sum("deg").cast("bigint").alias("d_c"),
        )
        .join(internal, "nationkey", "left")
        .select(
            "nationkey",
            "n_nodes",
            F.coalesce(F.col("e_c"), F.lit(0)).cast("bigint").alias("e_c"),
            "d_c",
        )
    )
    q_num = (
        F.lit(4) * F.col("m") * F.col("e_c")
        - F.col("d_c") * F.col("d_c")
    ).cast("bigint")
    return per_comm.crossJoin(F.broadcast(m)).select(
        "nationkey",
        "n_nodes",
        "e_c",
        "d_c",
        q_num.alias("q_num"),
        (q_num.cast("double") / (4.0 * F.col("m") * F.col("m"))).alias(
            "q_contrib"
        ),
    )


# ---------------------------------------------------------------------------
# Label-propagation communities (synchronous, deterministic)
# ---------------------------------------------------------------------------

LPA_ITERS = 5


def _lpa_oracle() -> str:
    """Unrolled MATERIALIZED-CTE replay of 5 synchronous LPA rounds over
    the mutual-top-8 co-occurrence graph: all-integer mode-with-min-tie
    updates, so the loop is deterministic and engine-independent."""
    parts = [_EDGES_ORACLE + """,
        nbrs AS MATERIALIZED (
            SELECT s1 AS node, s2 AS nbr FROM edges
            UNION ALL
            SELECT s2, s1 FROM edges
        ),
        l0 AS MATERIALIZED (
            SELECT DISTINCT node, node AS label FROM nbrs
        )"""]
    for t in range(1, LPA_ITERS + 1):
        parts.append(f""",
        c{t} AS MATERIALIZED (
            SELECT e.node, l.label, count(*) AS c
            FROM nbrs e JOIN l{t - 1} l ON e.nbr = l.node
            GROUP BY e.node, l.label
        ),
        l{t} AS MATERIALIZED (
            SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY c DESC, label) AS rn
                FROM c{t}
            ) WHERE rn = 1
        )""")
    parts.append(f"""
        SELECT node, label FROM l{LPA_ITERS}""")
    return "".join(parts)


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle(),
    doc="Synchronous label-propagation communities over the mutual-top-8 "
        "supplier co-occurrence graph: 5 rounds where every node "
        "simultaneously adopts its neighbors' MODE label (ties to the "
        "smallest label id) — the classic near-linear community detector "
        "(Raghavan et al. 2007). Fixed iteration count keeps sync-LPA's "
        "possible oscillation deterministic. Per round: the node-sized "
        "label table BROADCASTS into the cached edge list (no edge "
        "shuffle per round) and ONE groupBy(node) gathers each node's "
        "<=8 neighbor labels, whose mode-with-min-tie is a JVM-side HOF "
        "scan over the sorted array — so a round is exactly one O(E) "
        "shuffle and zero windows, and lazy localCheckpoints keep 5 "
        "chained rounds from compounding plan depth (11.5x wall at 10x "
        "data before the cuts, ~1x after); all-integer updates replay "
        "exactly in the oracle's unrolled MATERIALIZED CTEs. Degree is "
        "capped at 8 by the edge sparsifier, so nothing skews and the "
        "per-node array is constant-size.",
    bench=True,
    tags=("graph",),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Loop shape follows the r5 pagerank lesson (BENCH_NOTES): broadcast
    # the bounded label table, cut lineage each round (lazily — an eager
    # cut costs a synchronous job per round), and keep a round at ONE
    # exchange: collect_list of <=8 neighbor labels per node, then the
    # mode with min-label tie-break as an aggregate() fold over the
    # SORTED array (ascending order makes strictly-longer-run the exact
    # tie rule). If node count outgrew broadcast on a real cluster, the
    # join falls back to the pagerank co-partitioned shuffle pattern
    # (graph.py:314-320).
    # single-task exact kernel under the cap (the pagerank/BFS/katz
    # treatment): labels are integers and the mode-with-min-tie rule is
    # order-free given the full neighbor multiset, so the vectorized
    # run-length kernel replays the 5 synchronous rounds row-identically
    # in one task. Round-12: the sparsification fuses INTO that task
    # (mutual edges <= directed rows, so the directed-row gate is
    # strictly safer than the old 2x-edges gate), skipping the
    # intermediate edge kernel + union + count jobs; the broadcast-loop
    # below stays the at-scale path.
    pinned, n_directed = _directed_pinned(spark, sf_dir)
    if n_directed <= _CO_EDGES_LOCAL_CAP:
        return _mutual_prefiltered(pinned).mapInPandas(
            _lpa_fused_kernel, "node long, label long"
        )
    edges = _edges_from_directed(pinned, n_directed)
    both = (
        edges.select(F.col("s1").alias("node"), F.col("s2").alias("nbr"))
        .unionAll(
            edges.select(F.col("s2").alias("node"), F.col("s1").alias("nbr"))
        )
        .localCheckpoint(eager=False)
    )
    if both.count() <= _BFS_LOCAL_EDGE_CAP:
        return both.coalesce(1).mapInPandas(
            _lpa_kernel, "node long, label long"
        )
    nbrs = (
        both
        # partition ONCE by the join key: the cache preserves the
        # partitioning, so every round's label join shuffles only the
        # node-sized label table, never the edges — and no per-round
        # driver round-trip (a broadcast build would serialize the 5
        # rounds into synchronous jobs; measured 2x slower at sf0.1)
        .repartition("nbr")
        .cache()
    )
    labels = (
        nbrs.select("node").distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=False)
    )
    # NOTE: no _aqe_off guard here — LPA's rounds are LAZY and execute
    # in the caller's action, so the guard would need a forced
    # materialization, and the extra job costs more than AQE-off saves
    # (alternating fresh-process A/B at sf0.1: guarded 6.1-6.4 s vs
    # lazy 4.8-5.6 s medians). Pagerank's loop is eager inside the
    # function, so its guard is free — see graph_pagerank.
    for _ in range(LPA_ITERS):
        labels = lpa_round(nbrs, labels).localCheckpoint(eager=False)
    return labels


def _lpa_kernel(batches):
    """Exact single-task replay of the LPA loop over one partition's
    (node, nbr) rows (both orientations present): LPA_ITERS synchronous
    rounds, each assigning every node the MODE of its neighbors' labels
    with ties to the smallest label — exactly _mode_sorted's
    strictly-longer-run rule over the ascending label list. All labels
    are node ids (int64), so kernel and DataFrame loop emit identical
    rows."""
    import numpy as np
    import pandas as pd

    us, vs = [], []
    for pdf in batches:
        us.append(pdf["node"].to_numpy(dtype=np.int64))
        vs.append(pdf["nbr"].to_numpy(dtype=np.int64))
    if not us or not sum(len(a) for a in us):
        yield pd.DataFrame(
            {"node": pd.Series([], dtype="int64"),
             "label": pd.Series([], dtype="int64")}
        )
        return
    u = np.concatenate(us)
    v = np.concatenate(vs)
    yield _lpa_np(u, v)


def _lpa_fused_kernel(batches):
    """Fused single-task kernel (round-12): mutual-top-K edges then the
    LPA rounds, skipping the intermediate edge materialization + union
    jobs of the shared-kernel path. Row-identical to _lpa_kernel over
    cooccurrence_edges' both-orientations table."""
    import numpy as np
    import pandas as pd

    s1, s2 = _topk_mutual_ids(batches)
    if not len(s1):
        yield pd.DataFrame(
            {"node": pd.Series([], dtype="int64"),
             "label": pd.Series([], dtype="int64")}
        )
        return
    yield _lpa_np(np.concatenate([s1, s2]), np.concatenate([s2, s1]))


def _lpa_np(u, v):
    """LPA_ITERS synchronous mode-with-min-tie rounds over (u, v) edge
    id arrays (both orientations present); returns the (node, label)
    pandas frame."""
    import numpy as np
    import pandas as pd

    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    lab = nodes.copy()  # initial label = own node id
    for _ in range(LPA_ITERS):
        nl = lab[vi]  # neighbor labels per (node, nbr) row
        order = np.lexsort((nl, ui))
        gu, gl = ui[order], nl[order]
        # run-length encode (node, label) groups; labels ascend per node
        new_run = np.empty(len(gu), dtype=bool)
        new_run[0] = True
        new_run[1:] = (gu[1:] != gu[:-1]) | (gl[1:] != gl[:-1])
        counts = np.diff(np.append(np.flatnonzero(new_run), len(gu)))
        run_node = gu[new_run]
        run_label = gl[new_run]
        # per node: max count, ties -> smallest label (== first max of
        # the ascending-label fold)
        sel_order = np.lexsort((run_label, -counts, run_node))
        rn = run_node[sel_order]
        first = np.empty(len(rn), dtype=bool)
        first[0] = True
        first[1:] = rn[1:] != rn[:-1]
        lab = lab.copy()
        lab[rn[first]] = run_label[sel_order][first]
    return pd.DataFrame(
        {"node": pd.Series(nodes, dtype="int64"),
         "label": pd.Series(lab, dtype="int64")}
    )


_LPA_ACC_T = "struct<bv:bigint,bl:int,cv:bigint,cl:int>"


def _mode_sorted(arr):
    """Mode of a SORTED ascending array, ties to the smallest value:
    one pass tracking (best_val, best_len, cur_val, cur_len); only a
    STRICTLY longer run replaces the best, so the first (smallest)
    mode wins ties."""
    init = F.lit(None).cast(_LPA_ACC_T)
    step = lambda acc, x: F.when(  # noqa: E731
        acc.isNull(),
        F.struct(
            x.alias("bv"), F.lit(1).alias("bl"),
            x.alias("cv"), F.lit(1).alias("cl"),
        ),
    ).otherwise(
        F.when(
            x == acc["cv"],
            F.when(
                acc["cl"] + 1 > acc["bl"],
                F.struct(
                    x.alias("bv"), (acc["cl"] + 1).alias("bl"),
                    x.alias("cv"), (acc["cl"] + 1).alias("cl"),
                ),
            ).otherwise(
                F.struct(
                    acc["bv"].alias("bv"), acc["bl"].alias("bl"),
                    x.alias("cv"), (acc["cl"] + 1).alias("cl"),
                )
            ),
        ).otherwise(
            F.struct(
                acc["bv"].alias("bv"), acc["bl"].alias("bl"),
                x.alias("cv"), F.lit(1).alias("cl"),
            )
        )
    )
    return F.aggregate(arr, init, step, lambda acc: acc["bv"])


def lpa_round(nbrs: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous-LPA round body — label join (only the node-sized
    label table shuffles; nbrs is pre-partitioned by the join key) +
    one groupBy gathering each node's <=8 neighbor labels, mode with
    min-tie as a JVM HOF fold. Factored out so tools/plan_report.py can
    render the per-round plan (VERDICT r6 #6)."""
    return (
        nbrs.join(
            labels.select(F.col("node").alias("nbr"), "label"),
            "nbr",
        )
        .groupBy("node")
        .agg(
            _mode_sorted(
                F.sort_array(F.collect_list("label"))
            ).alias("label")
        )
    )


@register(
    "graph_degree_assortativity",
    oracle=_EDGES_ORACLE + """
        , directed2 AS (
            SELECT s1 AS src, s2 AS dst FROM edges
            UNION ALL
            SELECT s2, s1 FROM edges
        ),
        deg AS (
            SELECT src AS node, CAST(count(*) AS BIGINT) AS d
            FROM directed2 GROUP BY src
        ),
        sums AS (
            SELECT CAST(count(*) AS BIGINT) AS m,
                   CAST(SUM(dx.d) AS BIGINT) AS s1,
                   CAST(SUM(dx.d * dy.d) AS BIGINT) AS sxy,
                   CAST(SUM(dx.d * dx.d) AS BIGINT) AS sxx
            FROM directed2 e
            JOIN deg dx ON dx.node = e.src
            JOIN deg dy ON dy.node = e.dst
        )
        SELECT m, s1,
               m * sxy - s1 * s1 AS num,
               m * sxx - s1 * s1 AS den,
               CASE WHEN m * sxx - s1 * s1 <> 0
                    THEN CAST(m * sxy - s1 * s1 AS DOUBLE)
                         / CAST(m * sxx - s1 * s1 AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS assortativity
        FROM sums
    """,
    doc="Degree assortativity of the mutual-top-8 co-occurrence graph: "
        "Pearson correlation of endpoint degrees over DIRECTED edge "
        "instances (each undirected edge contributes both orientations, "
        "the standard Newman symmetrization — so sum/variance of the src "
        "side equal the dst side and r = (m*sxy - s1^2)/(m*sxx - s1^2) "
        "needs NO square roots). Every moment is an exact int64 sum "
        "(degrees are capped at 8 by the mutual-top-k sparsification, so "
        "m*sxx <= 64*m^2 stays under 2^63 for m < 2^28 directed edges; "
        "shard the graph before that). The division is one correctly- "
        "rounded double op; a regular graph (den = 0) zero-guards to 0 "
        "identically in both engines. Plan: the degree table is an agg "
        "over the k-bounded survivor edges (tiny at any scale), joined "
        "back twice by key, then a single global agg.",
    tags=("graph", "stats"),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deliberately NOT cached: the three uses of `directed` are identical
    # subtrees in ONE job, so Catalyst's ReuseExchange already computes
    # the co-occurrence build once — an explicit cache adds a
    # materialization barrier and measures ~40% slower (A/B, sf0.1)
    edges = cooccurrence_edges(spark, sf_dir)
    directed = edges.selectExpr("s1 AS src", "s2 AS dst").unionAll(
        edges.selectExpr("s2 AS src", "s1 AS dst")
    )
    deg = directed.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("d")
    )
    dx = deg.alias("dx")
    dy = deg.alias("dy")
    paired = (
        directed.join(dx, F.col("src") == F.col("dx.node"))
        .join(dy, F.col("dst") == F.col("dy.node"))
        .select(F.col("dx.d").alias("xd"), F.col("dy.d").alias("yd"))
    )
    sums = paired.agg(
        F.count("*").alias("m"),
        F.sum("xd").alias("s1"),
        F.sum(F.col("xd") * F.col("yd")).alias("sxy"),
        F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
    )
    num = F.col("m") * F.col("sxy") - F.col("s1") * F.col("s1")
    den = F.col("m") * F.col("sxx") - F.col("s1") * F.col("s1")
    r = F.when(
        den != 0, num.cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))
    return sums.select(
        "m",
        "s1",
        num.alias("num"),
        den.alias("den"),
        r.alias("assortativity"),
    )


_WALK_STEPS = 3


def _walk_hash_sql(step: int, cur: str, nxt: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{step}#' || CAST({cur} AS VARCHAR) "
        f"|| '#' || CAST({nxt} AS VARCHAR)), 1, 13)) AS UBIGINT)"
    )


def _walks_oracle() -> str:
    ctes = [
        """
        directed2 AS MATERIALIZED (
            SELECT s1 AS src, s2 AS dst FROM edges
            UNION ALL
            SELECT s2, s1 FROM edges
        ),
        w0 AS MATERIALIZED (
            SELECT DISTINCT src AS start, src AS cur FROM directed2
        )"""
    ]
    prev_cols = []
    for s in range(1, _WALK_STEPS + 1):
        inner_carry = "".join(f"w.n{j}, " for j in range(1, s))
        outer_carry = "".join(f"n{j}, " for j in range(1, s))
        ctes.append(f"""
        w{s} AS MATERIALIZED (
            SELECT start, {outer_carry}n{s}, n{s} AS cur FROM (
                SELECT w.start, {inner_carry}e.dst AS n{s},
                       row_number() OVER (
                           PARTITION BY w.start
                           ORDER BY {_walk_hash_sql(s, "w.cur", "e.dst")},
                                    e.dst) AS rn
                FROM w{s - 1} w JOIN directed2 e ON e.src = w.cur
            ) WHERE rn = 1
        )""")
        prev_cols.append(f"n{s}")
    cols = ", ".join(prev_cols)
    return (
        ",".join(ctes)
        + f"""
        SELECT start, {cols} FROM w{_WALK_STEPS}
    """
    )


@register(
    "graph_deterministic_walks",
    oracle=_EDGES_ORACLE + "," + _walks_oracle(),
    doc="Derandomized random walks over the mutual-top-8 graph (the "
        "node2vec/DeepWalk corpus generator): one 3-step walk per start "
        "node, where step s moves from cur to the out-neighbor minimizing "
        "md5('s#cur#dst') — the repo's md5-derandomization recipe, so "
        "the 'random' choice is reproducible, cross-engine bit-identical "
        "(52-bit conv/UBIGINT keys order identically), and still "
        "hash-uniform across neighbors. Each step is ONE equi-join of "
        "the walk frontier (|V| rows) against the degree<=8 adjacency "
        "plus a per-start row_number — work O(V*8) per step at any "
        "scale, no driver state, trivially extended to longer walks or "
        "multiple walks per node by salting the hash prefix. Walks may "
        "revisit nodes (standard for corpus generation); every node has "
        "an out-neighbor by construction (mutual edges are symmetric).",
    tags=("graph",),
)
def graph_deterministic_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the adjacency is rescanned once per walk step plus once for the
    # frontier init: cache it so the fact-scale co-occurrence build runs
    # once, not _WALK_STEPS + 1 times
    edges = cooccurrence_edges(spark, sf_dir)
    directed = edges.selectExpr("s1 AS src", "s2 AS dst").unionAll(
        edges.selectExpr("s2 AS src", "s1 AS dst")
    ).cache()
    walk = directed.select(F.col("src").alias("start")).distinct().select(
        "start", F.col("start").alias("cur")
    )
    for s in range(1, _WALK_STEPS + 1):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{s}#"),
                        F.col("cur").cast("string"),
                        F.lit("#"),
                        F.col("dst").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        carry = [f"n{j}" for j in range(1, s)]
        win = W.partitionBy("start").orderBy(F.col("h"), F.col("dst"))
        walk = (
            walk.join(directed, walk.cur == directed.src)
            .select("start", *carry, F.col("dst"), h.alias("h"))
            .withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") == 1)
            .select(
                "start", *carry,
                F.col("dst").alias(f"n{s}"),
                F.col("dst").alias("cur"),
            )
        )
    return walk.select(
        "start", *[f"n{j}" for j in range(1, _WALK_STEPS + 1)]
    )


@register(
    "graph_clustering_coefficient",
    oracle=_EDGES_ORACLE + """
        , directed3 AS (
            SELECT s1 AS src FROM edges
            UNION ALL
            SELECT s2 FROM edges
        ),
        deg AS (
            SELECT src AS node, CAST(count(*) AS BIGINT) AS d
            FROM directed3 GROUP BY src
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS wedges
            FROM deg
        ),
        tri AS (
            SELECT CAST(count(*) AS BIGINT) AS triangles
            FROM edges e1
            JOIN edges e2 ON e1.s2 = e2.s1
            JOIN edges e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
        )
        SELECT a.n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
               a.wedges, t.triangles,
               CASE WHEN a.wedges > 0
                    THEN CAST(3 * t.triangles AS DOUBLE)
                         / CAST(a.wedges AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS global_cc
        FROM agg a CROSS JOIN tri t
    """,
    doc="Global clustering coefficient (transitivity) of the "
        "mutual-top-8 graph: 3*triangles / wedges, where wedges = "
        "sum over nodes of C(d, 2) — both exact integers (d <= 8 by the "
        "sparsification; d(d-1)/2 is integral so the in-SUM division is "
        "exact), the ratio is one correctly-rounded double division, and "
        "a triangle-free/star graph zero-guards wedges = 0 identically. "
        "Plan: degree agg on the k-bounded survivor set + the same "
        "V*64-bounded ordered-wedge triangle join as q_triangle_count; "
        "the fact-scale build's three references dedupe via "
        "ReuseExchange (the assortativity A/B rule — no explicit cache).",
    tags=("graph", "stats"),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = cooccurrence_edges(spark, sf_dir)
    nodes_dir = edges.selectExpr("s1 AS src").unionAll(
        edges.selectExpr("s2 AS src")
    )
    deg = nodes_dir.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("d")
    )
    agg = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2)
        .cast("bigint")
        .alias("wedges"),
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.s2") == F.col("e2.s1"))
        .join(
            e3,
            (F.col("e3.s1") == F.col("e1.s1"))
            & (F.col("e3.s2") == F.col("e2.s2")),
        )
        .agg(F.count("*").alias("triangles"))
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    cc = F.when(
        F.col("wedges") > 0,
        (F.lit(3) * F.col("triangles")).cast("double")
        / F.col("wedges").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        agg.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes", "n_edges", "wedges", "triangles",
            cc.alias("global_cc"),
        )
    )


_RICH_KS = (2, 4, 8, 16, 32)


@register(
    "graph_richclub",
    oracle=_EDGES_ORACLE + f"""
        , deg AS (
            SELECT node, CAST(count(*) AS BIGINT) AS d
            FROM (
                SELECT s1 AS node FROM edges
                UNION ALL
                SELECT s2 AS node FROM edges
            ) GROUP BY node
        ), ks AS (
            SELECT unnest([{", ".join(str(k) for k in _RICH_KS)}]) AS k
        ), rich AS (
            SELECT ks.k, deg.node
            FROM deg JOIN ks ON deg.d > ks.k
        ), nk AS (
            SELECT k, CAST(count(*) AS BIGINT) AS n_rich
            FROM rich GROUP BY k
        ), ek AS (
            SELECT a.k, CAST(count(*) AS BIGINT) AS e_rich
            FROM edges e
            JOIN rich a ON a.node = e.s1
            JOIN rich b ON b.node = e.s2 AND b.k = a.k
            GROUP BY a.k
        )
        SELECT ks.k, COALESCE(nk.n_rich, 0) AS n_rich,
               COALESCE(ek.e_rich, 0) AS e_rich,
               CAST(2 * COALESCE(ek.e_rich, 0) AS DOUBLE)
               / CAST(CASE WHEN COALESCE(nk.n_rich, 0) < 2 THEN 1
                           ELSE nk.n_rich * (nk.n_rich - 1)
                      END AS DOUBLE) AS phi
        FROM ks
        LEFT JOIN nk ON nk.k = ks.k
        LEFT JOIN ek ON ek.k = ks.k
    """,
    doc="Rich-club coefficient phi(k) = 2*E_k / (N_k*(N_k-1)) over the "
        "mutual-top-8 supplier co-occurrence graph, for the degree "
        "thresholds k in {2,4,8,16,32}: do high-degree hubs "
        "preferentially interconnect? (Colizza et al., Nature Physics "
        "2006 — the connectivity-concentration audit run on web and "
        "citation graphs before sampling them.) Exact integer counts, "
        "one double division per k with the N_k < 2 degeneracy guarded "
        "identically in both engines. Plan: degree agg + a 5-way "
        "threshold broadcast + two broadcast-ish joins back to the "
        "sparsified edge list — |edges| is already capped at V*8 by "
        "the mutual-top-k construction, so every step is linear in V.",
    tags=("graph",),
)
def graph_richclub(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = cooccurrence_edges(spark, sf_dir).cache()
    deg = (
        edges.select(F.col("s1").alias("node"))
        .union(edges.select(F.col("s2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    ks = spark.createDataFrame([(k,) for k in _RICH_KS], "k int")
    # three consumers (nk + both ek join sides) — pin so the degree
    # aggregation + k-grid cross runs once (round-7 §13)
    rich = deg.crossJoin(F.broadcast(ks)).filter(
        F.col("d") > F.col("k")
    ).select("k", "node").localCheckpoint(eager=False)
    nk = rich.groupBy("k").agg(F.count("*").alias("n_rich"))
    ek = (
        edges.join(
            rich.select(F.col("k"), F.col("node").alias("s1")), "s1"
        )
        .join(
            rich.select(F.col("k").alias("k"), F.col("node").alias("s2")),
            ["k", "s2"],
        )
        .groupBy("k")
        .agg(F.count("*").alias("e_rich"))
    )
    nk_g = F.coalesce(F.col("n_rich"), F.lit(0))
    ek_g = F.coalesce(F.col("e_rich"), F.lit(0))
    phi = (2 * ek_g).cast("double") / F.when(
        nk_g < 2, 1
    ).otherwise(nk_g * (nk_g - 1)).cast("double")
    return (
        F.broadcast(ks)
        .join(nk, "k", "left")
        .join(ek, "k", "left")
        .select(
            "k",
            nk_g.alias("n_rich"),
            ek_g.alias("e_rich"),
            phi.alias("phi"),
        )
    )


_KATZ_ROUNDS = 6  # attenuation beta = 1/2, truncated at 6 hops


def _katz_oracle() -> str:
    """Unrolled MATERIALIZED CTEs replaying the exact integer recursion
    p_{{k+1}}(v) = sum over edges (u, v) of p_k(u), with the katz key
    accumulating p_k(v) * 2^(ROUNDS - k) — every quantity is an exact
    path count times a power of two, so the centrality is an int64."""
    steps = []
    for k in range(1, _KATZ_ROUNDS + 1):
        steps.append(f"""
        , p{k} AS MATERIALIZED (
            SELECT b.v AS node, CAST(SUM(p.c) AS BIGINT) AS c
            FROM p{k - 1} p JOIN bidir b ON b.u = p.node
            GROUP BY b.v
        )""")
    acc = " + ".join(
        f"COALESCE(p{k}.c, 0) * {1 << (_KATZ_ROUNDS - k)}"
        for k in range(1, _KATZ_ROUNDS + 1)
    )
    joins = "\n            ".join(
        f"LEFT JOIN p{k} ON p{k}.node = n.node"
        for k in range(1, _KATZ_ROUNDS + 1)
    )
    return f"""
        , bidir AS MATERIALIZED (
            SELECT s1 AS u, s2 AS v FROM edges
            UNION ALL
            SELECT s2, s1 FROM edges
        ), p0 AS MATERIALIZED (
            SELECT node, CAST(1 AS BIGINT) AS c
            FROM (SELECT DISTINCT u AS node FROM bidir)
        ){"".join(steps)}
        SELECT n.node,
               CAST({acc} AS BIGINT) AS katz_q,
               CAST({acc} AS DOUBLE) / {float(1 << _KATZ_ROUNDS)}
                   AS katz
        FROM p0 n
            {joins}
    """


def _katz_kernel(batches):
    """Exact truncated-Katz walk counts over one partition's directed
    (u, v) edge rows (both orientations present) — thin wrapper over
    _katz_np."""
    import numpy as np
    import pandas as pd

    us, vs = [], []
    for pdf in batches:
        us.append(pdf["u"].to_numpy(dtype=np.int64))
        vs.append(pdf["v"].to_numpy(dtype=np.int64))
    if not us or not sum(len(a) for a in us):
        yield _katz_empty(pd)
        return
    yield _katz_np(np.concatenate(us), np.concatenate(vs))


def _katz_fused_kernel(batches):
    """Fused single-task kernel (round-12, the LPA/triangle treatment):
    mutual-top-K edges then the walk-count rounds, skipping the
    intermediate edge materialization + union + count jobs.
    Row-identical to _katz_kernel over cooccurrence_edges'
    both-orientations table."""
    import numpy as np
    import pandas as pd

    s1, s2 = _topk_mutual_ids(batches)
    if not len(s1):
        yield _katz_empty(pd)
        return
    yield _katz_np(np.concatenate([s1, s2]), np.concatenate([s2, s1]))


def _katz_empty(pd):
    return pd.DataFrame(
        {"node": pd.Series([], dtype="int64"),
         "katz_q": pd.Series([], dtype="int64"),
         "katz": pd.Series([], dtype="float64")}
    )


def _katz_np(u, v):
    """Truncated-Katz core over (u, v) edge id arrays (both
    orientations present): c_k(v) = sum over edges u->v of c_{k-1}(u),
    katz_q = sum_k c_k * 2^(ROUNDS-k) — all int64 (degree^k <= 8^6 per
    node on the mutual-top-8 graph), and the katz double is the exact
    dyadic katz_q / 2^ROUNDS. Row-identical to the DataFrame join
    loop."""
    import numpy as np
    import pandas as pd

    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    n = len(nodes)
    c = np.ones(n, dtype=np.int64)
    acc = np.zeros(n, dtype=np.int64)
    for k in range(1, _KATZ_ROUNDS + 1):
        nc = np.zeros(n, dtype=np.int64)
        np.add.at(nc, vi, c[ui])
        c = nc
        acc += c << (_KATZ_ROUNDS - k)
    return pd.DataFrame(
        {"node": pd.Series(nodes, dtype="int64"),
         "katz_q": pd.Series(acc, dtype="int64"),
         "katz": pd.Series(
             acc.astype(np.float64) / float(1 << _KATZ_ROUNDS),
             dtype="float64",
         )}
    )


@register(
    "graph_katz_centrality",
    oracle=_EDGES_ORACLE + _katz_oracle(),
    doc="Katz centrality with attenuation beta = 1/2 truncated at 6 "
        "hops over the sparsified co-occurrence graph: katz(v) = "
        "sum_k beta^k * (number of k-walks ending at v). Choosing a "
        "POWER-OF-TWO attenuation makes every term an integer walk "
        "count times 2^(6-k), so the whole centrality is an exact "
        "int64 key (emitted alongside the /2^6 double) — no fixed-"
        "point scaffolding needed, walk counts are bounded by "
        "degree^k <= 8^6 per node on the mutual-top-8 graph. Six "
        "join+groupBy rounds over the V*8 edge list, lineage cut "
        "lazily; the oracle unrolls the same recursion as MATERIALIZED "
        "CTEs. Complements PageRank (random-walk stationary mass) with "
        "the walk-counting centrality family.",
    tags=("graph",),
)
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round-12: sparsification fused into the kernel task (the LPA/BFS/
    # triangle treatment; directed-row gate is strictly safer than the
    # old 2x-edges gate), skipping the edge kernel + union + count jobs.
    pinned, n_directed = _directed_pinned(spark, sf_dir)
    if n_directed <= _CO_EDGES_LOCAL_CAP:
        return _mutual_prefiltered(pinned).mapInPandas(
            _katz_fused_kernel, "node long, katz_q long, katz double"
        )
    edges = _edges_from_directed(pinned, n_directed)
    bidir = (
        edges.select(F.col("s1").alias("u"), F.col("s2").alias("v"))
        .union(edges.select(F.col("s2").alias("u"), F.col("s1").alias("v")))
        .localCheckpoint(eager=False)
    )
    # single-task exact kernel under the cap (the BFS treatment,
    # _bfs_kernel above): walk counts are exact int64 matrix-vector
    # products, so the 6 join+groupBy rounds (12 lazy checkpoints, the
    # dominating stage overhead at any local scale — 6.4 s median at
    # sf0.1) collapse into one vectorized mapInPandas task with
    # row-identical output; the DataFrame loop below stays the at-scale
    # path for edge sets past the cap.
    if bidir.count() <= _BFS_LOCAL_EDGE_CAP:
        return bidir.coalesce(1).mapInPandas(
            _katz_kernel, "node long, katz_q long, katz double"
        )
    p = (
        bidir.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("c", F.lit(1).cast("bigint"))
        .localCheckpoint(eager=False)
    )
    nodes = p.select("node")
    acc = p.select(
        "node",
        (F.col("c") * F.lit(0)).alias("katz_q"),  # walks of length >= 1 only
    )
    for k in range(1, _KATZ_ROUNDS + 1):
        p = (
            bidir.join(p, bidir["u"] == p["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("c").cast("bigint").alias("c"))
            .localCheckpoint(eager=False)
        )
        acc = (
            acc.join(p.withColumnRenamed("c", "ck"), "node", "left")
            .select(
                "node",
                (
                    F.col("katz_q")
                    + F.coalesce(F.col("ck"), F.lit(0))
                    * F.lit(1 << (_KATZ_ROUNDS - k)).cast("bigint")
                ).alias("katz_q"),
            )
            .localCheckpoint(eager=False)
        )
    return nodes.join(acc, "node", "left").select(
        "node",
        F.coalesce("katz_q", F.lit(0)).cast("bigint").alias("katz_q"),
        (
            F.coalesce("katz_q", F.lit(0)).cast("double")
            / F.lit(float(1 << _KATZ_ROUNDS))
        ).alias("katz"),
    )


_HITS_FX = 65536  # 2^16 score grid: sums stay far inside BIGINT
_HITS_ITERS = 3  # authority updates (hub updates interleave)

# single-task HITS kernel gates: edge rows (one per (user, type) pair)
# AND total event mass — sum(w * score) must stay inside int64, so the
# kernel only engages when fx * sum(w) < 2^61 (sum(w) < 2^45); the
# normalization product raw * fx (up to 2^77) is formed in exact
# Python ints either way
_HITS_LOCAL_EDGE_CAP = 4_000_000
_HITS_LOCAL_MASS_CAP = 1 << 45


def _hits_kernel(batches):
    """Exact single-task replay of the HITS loop over one partition's
    (u, i, w) bipartite edge rows. Every score lives on the exact 2^16
    integer grid: mass sums are int64-safe under _HITS_LOCAL_MASS_CAP,
    and each normalization raw * 2^16 // t is computed in Python ints
    (arbitrary precision — the kernel analog of the DECIMAL(38,0)
    product), with // == Spark's div on non-negative operands. Emits
    (event_type, auth_fx, authority) row-identical to the loop."""
    import numpy as np
    import pandas as pd

    us, is_, ws = [], [], []
    for pdf in batches:
        us.append(pdf["u"].to_numpy(dtype=np.int64))
        is_.append(pdf["i"].to_numpy(dtype=object))
        ws.append(pdf["w"].to_numpy(dtype=np.int64))
    if not us or not sum(len(a) for a in us):
        yield pd.DataFrame(
            {"event_type": pd.Series([], dtype="object"),
             "auth_fx": pd.Series([], dtype="int64"),
             "authority": pd.Series([], dtype="float64")}
        )
        return
    u = np.concatenate(us)
    i = np.concatenate(is_)
    w = np.concatenate(ws)
    users, ui = np.unique(u, return_inverse=True)
    # event_type can be NULL on dirty data: np.unique would TypeError
    # sorting a None/str object array and kill the task, while the
    # distributed groupBy tolerates a NULL key — factorize keeps NA as
    # its own group (emitted as NULL via Arrow), matching the loop.
    ti, types = pd.factorize(i, use_na_sentinel=False)
    fx = _HITS_FX

    def normalize(raw):
        t = int(raw.sum())
        t = 1 if t == 0 else t
        return np.fromiter(
            (int(r) * fx // t for r in raw.tolist()),
            dtype=np.int64,
            count=len(raw),
        )

    hx = np.full(len(users), fx, dtype=np.int64)
    ax = None
    for it in range(1, _HITS_ITERS + 1):
        raw_a = np.zeros(len(types), dtype=np.int64)
        np.add.at(raw_a, ti, w * hx[ui])
        ax = normalize(raw_a)
        if it < _HITS_ITERS:
            raw_h = np.zeros(len(users), dtype=np.int64)
            np.add.at(raw_h, ui, w * ax[ti])
            hx = normalize(raw_h)
    yield pd.DataFrame(
        {"event_type": pd.Series(types, dtype="object"),
         "auth_fx": pd.Series(ax, dtype="int64"),
         "authority": pd.Series(
             ax.astype(np.float64) / float(fx), dtype="float64"
         )}
    )


def _hits_oracle() -> str:
    """Unrolled HITS replay: every score is an exact BIGINT on the
    2^16 grid, every normalization an exact integer division (DuckDB
    // == Spark div, truncation toward zero on non-negative ints), so
    the iterative eigen-pair replays bit-identically — the pagerank
    recipe on the bipartite user->event_type graph."""
    fx = _HITS_FX
    parts = [f"""
        WITH e AS MATERIALIZED (
            SELECT user_id AS u, event_type AS i,
                   CAST(count(*) AS BIGINT) AS w
            FROM events GROUP BY 1, 2
        ), h0 AS MATERIALIZED (
            SELECT u, CAST({fx} AS BIGINT) AS hx
            FROM (SELECT DISTINCT u FROM e)
        )"""]
    prev_h = "h0"
    for it in range(1, _HITS_ITERS + 1):
        parts.append(f""", a{it}r AS MATERIALIZED (
            SELECT e.i,
                   CAST(SUM(CAST(e.w AS DECIMAL(38,0)) * {prev_h}.hx)
                        AS BIGINT) AS raw
            FROM e JOIN {prev_h} ON e.u = {prev_h}.u
            GROUP BY e.i
        ), a{it}t AS MATERIALIZED (
            SELECT CASE WHEN CAST(SUM(CAST(raw AS DECIMAL(38,0)))
                             AS BIGINT) = 0 THEN 1
                        ELSE CAST(SUM(CAST(raw AS DECIMAL(38,0)))
                             AS BIGINT) END AS t
            FROM a{it}r
        ), a{it} AS MATERIALIZED (
            SELECT i, CAST(CAST(raw AS HUGEINT) * {fx}
                           // (SELECT t FROM a{it}t) AS BIGINT) AS ax
            FROM a{it}r
        )""")
        if it < _HITS_ITERS:
            parts.append(f""", h{it}r AS MATERIALIZED (
                SELECT e.u,
                       CAST(SUM(CAST(e.w AS DECIMAL(38,0)) * a{it}.ax)
                            AS BIGINT) AS raw
                FROM e JOIN a{it} ON e.i = a{it}.i
                GROUP BY e.u
            ), h{it}t AS MATERIALIZED (
                SELECT CASE WHEN CAST(SUM(CAST(raw AS DECIMAL(38,0)))
                                 AS BIGINT) = 0 THEN 1
                            ELSE CAST(SUM(CAST(raw AS DECIMAL(38,0)))
                                 AS BIGINT) END AS t
                FROM h{it}r
            ), h{it} AS MATERIALIZED (
                SELECT u, CAST(CAST(raw AS HUGEINT) * {fx}
                               // (SELECT t FROM h{it}t) AS BIGINT) AS hx
                FROM h{it}r
            )""")
            prev_h = f"h{it}"
    parts.append(f"""
        SELECT i AS event_type, ax AS auth_fx,
               CAST(ax AS DOUBLE) / {fx}.0 AS authority
        FROM a{_HITS_ITERS}
    """)
    return "".join(parts)


@register(
    "graph_hits_bipartite",
    oracle=_hits_oracle(),
    doc="HITS hubs/authorities (Kleinberg 1999, public) on the DIRECTED "
        "bipartite user -> event_type interaction graph (the symmetric "
        "co-occurrence graph pagerank uses would make hubs == "
        f"authorities). {_HITS_ITERS} authority updates with hub "
        "updates interleaved; every score lives on an exact 2^16 "
        "integer grid: per-step mass is SUM(w * score) formed in "
        "DECIMAL(38,0) then cast to BIGINT (bounded: w*score <= 1e7 "
        "per edge, the SUMS fit to ~1e12 edges), and each "
        "normalization forms raw * 2^16 in DECIMAL(38,0) / HUGEINT "
        "(plain BIGINT would overflow past ~2^31 events) before the "
        "exact truncating integer division — Spark div == DuckDB //, "
        "zero-total guarded "
        "identically (CLAUDE.md rule 5). The authority double is the "
        "exact dyadic ax/2^16. Scale: per-iteration cost is one "
        "grouped aggregate over the (user, type) edge table with the "
        "type-dimension score table BROADCAST — the pagerank loop "
        "shape on a bipartite graph; no window, no Python.",
    tags=("graph",),
)
def graph_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = _HITS_FX
    t = Tables(spark, sf_dir)
    e = (
        t.events.groupBy(
            F.col("user_id").alias("u"), F.col("event_type").alias("i")
        )
        .agg(F.count("*").cast("long").alias("w"))
        .localCheckpoint(eager=False)
    )
    # single-task exact kernel under the caps (the pagerank pattern on
    # the bipartite graph): the 2^16-grid integer design is
    # parallelism-invariant, so the 5 aggregate+normalize half-steps
    # (each a checkpointed subtree + scalar-total crossJoin) collapse
    # into one task when the aggregated edge table fits and total mass
    # keeps int64 exact; the loop below stays the at-scale path.
    # Bounded collect: ONE 2-column stats row off the aggregated table.
    n_rows, total_w = e.groupBy().agg(
        F.count("*"), F.coalesce(F.sum("w"), F.lit(0))
    ).collect()[0]
    if n_rows <= _HITS_LOCAL_EDGE_CAP and total_w <= _HITS_LOCAL_MASS_CAP:
        return e.coalesce(1).mapInPandas(
            _hits_kernel,
            "event_type string, auth_fx long, authority double",
        )
    e = e.cache()
    # every hub starts at the FULL grid constant (not fx // n_users,
    # which is 0 past 2^16 users — silently degenerate); the first
    # normalization makes the initial scale irrelevant.
    hubs = e.select("u").distinct().select(
        "u", F.lit(fx).cast("long").alias("hx")
    )

    def _step(edges, scores, key, out_key, score_col, out_col):
        # pin the raw mass table: BOTH the total aggregate and the
        # normalize select consume it, and it also truncates the
        # per-iteration lineage (unpinned, the final plan re-expanded
        # every step subtree — the LPA compounding-plan-depth trap,
        # 27.7 s -> ~4 s at sf0.1); node/type-dimension-sized, so the
        # lazy checkpoint is ~free
        raw = (
            edges.join(F.broadcast(scores), key)
            .groupBy(out_key)
            .agg(
                F.sum(
                    F.col("w").cast("decimal(38,0)") * F.col(score_col)
                )
                .cast("bigint")
                .alias("raw")
            )
            .localCheckpoint(eager=False)
        )
        tot = raw.agg(
            F.sum(F.col("raw").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("t")
        ).select(
            F.when(F.col("t") == 0, F.lit(1).cast("long"))
            .otherwise(F.col("t"))
            .alias("t")
        )
        # the raw * 2^16 product must form in DECIMAL(38,0) (oracle:
        # HUGEINT): raw can reach total mass ~ n_events * 2^16, so the
        # plain-BIGINT product overflows past ~2^31 events — DuckDB
        # errors, non-ANSI Spark wraps silently.
        return raw.crossJoin(F.broadcast(tot)).select(
            out_key,
            F.expr(f"CAST(raw AS DECIMAL(38,0)) * {fx} div t")
            .cast("long")
            .alias(out_col),
        )

    auth = None
    for it in range(1, _HITS_ITERS + 1):
        # each step nests an aggregate + crossJoin subtree; without a
        # lineage cut the final plan re-expands all five step subtrees
        # (the LPA compounding-plan-depth trap: 27.7 s -> ~3 s at
        # sf0.1). The score tables are node/type-dimension-sized, so
        # the lazy checkpoint is ~free.
        auth = _step(e, hubs, "u", "i", "hx", "ax")
        if it < _HITS_ITERS:
            hubs = _step(e, auth, "i", "u", "ax", "hx")
    return auth.select(
        F.col("i").alias("event_type"),
        F.col("ax").alias("auth_fx"),
        (F.col("ax").cast("double") / F.lit(float(fx))).alias("authority"),
    )


_SPEC_ITERS = 24
_SPEC_BITS = 24  # rescale ceiling: |v| kept under 2^24 between rounds


def _spectral_edges_sql() -> str:
    """Shared WITH-body: the weighted nation co-occurrence graph (one
    count per (order, nation pair) incidence) QUANTIZED to a 2^16 grid
    over the total weight (w * 2^16 // sum(w), trunc division — Spark
    div == DuckDB //; the ml_bradley_terry scale-invariance recipe),
    its degrees, the shift constant c = 2*max_deg + 1 > lambda_max(L),
    and M = c*I - L. Quantizing bounds deg <= 2^17 and c <= 2^18+1, so
    the per-round product sums stay provably < 2^63 at ANY corpus
    size (raw counts would push c past 2^28 at large SF and overflow
    the BIGINT multiply)."""
    return """
        rawpairs AS MATERIALIZED (
            SELECT a.nat AS i, b.nat AS j,
                   CAST(count(*) AS BIGINT) AS w
            FROM (
                SELECT DISTINCT l.l_orderkey, s.s_nationkey AS nat
                FROM lineitem l JOIN supplier s
                     ON s.s_suppkey = l.l_suppkey
            ) a JOIN (
                SELECT DISTINCT l.l_orderkey, s.s_nationkey AS nat
                FROM lineitem l JOIN supplier s
                     ON s.s_suppkey = l.l_suppkey
            ) b ON a.l_orderkey = b.l_orderkey AND a.nat < b.nat
            GROUP BY 1, 2
        ), wtot AS MATERIALIZED (
            SELECT CAST(CASE WHEN COALESCE(SUM(w), 0) = 0 THEN 1
                             ELSE SUM(w) END AS BIGINT) AS tw
            FROM rawpairs
        ), pairs AS MATERIALIZED (
            SELECT i, j,
                   CAST(w * 65536 // (SELECT tw FROM wtot) AS BIGINT)
                       AS w
            FROM rawpairs
        ), edges AS MATERIALIZED (
            SELECT i, j, w FROM pairs
            UNION ALL
            SELECT j AS i, i AS j, w FROM pairs
        ), nodes AS MATERIALIZED (
            SELECT CAST(n_nationkey AS BIGINT) AS node FROM nation
        ), deg AS MATERIALIZED (
            SELECT n.node,
                   CAST(COALESCE(SUM(e.w), 0) AS BIGINT) AS d
            FROM nodes n LEFT JOIN edges e ON e.i = n.node
            GROUP BY n.node
        ), cconst AS MATERIALIZED (
            SELECT CAST(2 * MAX(d) + 1 AS BIGINT) AS c FROM deg
        ), m AS MATERIALIZED (
            SELECT d.node AS i, d.node AS j,
                   (SELECT c FROM cconst) - d.d AS val
            FROM deg d
            UNION ALL
            SELECT i, j, w AS val FROM edges
        ), nn AS MATERIALIZED (
            SELECT CAST(count(*) AS BIGINT) AS n FROM nodes
        )"""


def _spectral_oracle() -> str:
    """Unrolled integer power iteration with ones-deflation: every
    round is deflate (n*v - sum(v) — cross-multiplied, no division),
    multiply by M (grouped int sums), and a truncating power-of-two
    rescale (v // (1 << s), s from length(bin(max|v|)); DuckDB //
    truncates toward zero exactly like the driver fold's trunc_div)."""
    parts = [f"""
        WITH {_spectral_edges_sql()}, v0 AS MATERIALIZED (
            SELECT node, node + 1 AS val FROM nodes
        )"""]
    prev = "v0"
    for t in range(_SPEC_ITERS):
        parts.append(f""", d{t} AS MATERIALIZED (
            SELECT node,
                   (SELECT n FROM nn) * val
                   - (SELECT CAST(SUM(val) AS BIGINT) FROM {prev}) AS val
            FROM {prev}
        ), p{t} AS MATERIALIZED (
            SELECT m.i AS node,
                   CAST(SUM(m.val * d.val) AS BIGINT) AS val
            FROM m JOIN d{t} d ON d.node = m.j
            GROUP BY m.i
        ), s{t} AS MATERIALIZED (
            SELECT GREATEST(
                length(bin(GREATEST(MAX(abs(val)), 1)))
                - {_SPEC_BITS}, 0) AS s
            FROM p{t}
        ), v{t + 1} AS MATERIALIZED (
            SELECT node,
                   CASE WHEN (SELECT s FROM s{t}) > 0
                        THEN val // (CAST(1 AS BIGINT)
                                     << (SELECT s FROM s{t}))
                        ELSE val END AS val
            FROM p{t}
        )""")
        prev = f"v{t + 1}"
    parts.append(f"""
        SELECT n.n_name AS nation, v.node AS nationkey,
               CAST(v.val AS BIGINT) AS fiedler_fx,
               CAST(CASE WHEN v.val > 0 THEN 1 ELSE 0 END
                    AS INTEGER) AS side
        FROM {prev} v JOIN nation n ON n.n_nationkey = v.node
    """)
    return "".join(parts)


@register(
    "graph_spectral_partition",
    oracle=_spectral_oracle(),
    doc="Spectral bisection by the FIEDLER VECTOR (Fiedler 1973; the "
        "classic graph-partitioning first cut, public) of the weighted "
        "nation co-occurrence graph: power iteration on M = c*I - L "
        "(c = 2*max_deg + 1 > lambda_max, so L's SMALLEST nonzero "
        "eigenpair becomes M's dominant one once the all-ones kernel "
        "is removed), with ones-DEFLATION done cross-multiplied "
        "(n*v - sum(v) — exact integers, no division) and per-round "
        "truncating power-of-two rescales (v // (1 << s), s from the "
        "bit length of max|v|) — every step pure int64, so the "
        f"{_SPEC_ITERS} rounds replay bit-identically in DuckDB "
        "(the round-5 eigen recipe with the round-7 driver-fold "
        "economics: the 25x25 nation matrix is DIMENSION-bounded, so "
        "iterating it in Python costs nothing at any corpus scale). "
        "side = sign(fiedler) is the bisection a partitioner feeds "
        "back into placement. Edge weights are quantized to a 2^16 "
        "grid over the total (w * 2^16 // sum(w), trunc division in "
        "both engines) so c and every product sum are bounded "
        "independent of corpus size — no int64 ceiling. Distributed "
        "part: one per-order distinct-nation pair expansion "
        "(<= C(7,2) pairs/order — linear in lineitem) into the "
        "25^2-bounded weight matrix.",
    tags=("graph",),
)
def graph_spectral_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    on = (
        t.lineitem.select("l_orderkey", "l_suppkey")
        .join(
            F.broadcast(
                t.supplier.select("s_suppkey", "s_nationkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "l_orderkey", F.col("s_nationkey").cast("long").alias("nat")
        )
        .distinct()
    )
    a, b = on.alias("a"), on.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.nat") < F.col("b.nat")),
        )
        .groupBy(F.col("a.nat").alias("i"), F.col("b.nat").alias("j"))
        .agg(F.count("*").cast("long").alias("w"))
        .collect()
    )
    nodes = [
        int(r["n_nationkey"])
        for r in t.nation.select("n_nationkey").collect()
    ]
    names = {
        int(r["n_nationkey"]): r["n_name"]
        for r in t.nation.select("n_nationkey", "n_name").collect()
    }
    idx = {node: k for k, node in enumerate(sorted(nodes))}
    n = len(nodes)
    # quantize weights to the 2^16 grid over the total (exact trunc
    # division, matching the oracle's //) so degrees stay <= 2^17 and
    # every power-iteration product is < 2^63 at any corpus size
    total_w = sum(int(r["w"]) for r in pairs) or 1
    W = [[0] * n for _ in range(n)]
    for r in pairs:
        i, j = idx[int(r["i"])], idx[int(r["j"])]
        w = int(r["w"]) * 65536 // total_w
        W[i][j] += w
        W[j][i] += w
    deg = [sum(row) for row in W]
    c = 2 * max(deg) + 1 if deg else 1
    M = [
        [(c - deg[i]) if i == j else W[i][j] for j in range(n)]
        for i in range(n)
    ]

    def trunc_div(a_: int, b_: int) -> int:
        return a_ // b_ if a_ >= 0 else -((-a_) // b_)

    ordered = sorted(nodes)
    v = [node + 1 for node in ordered]
    for _ in range(_SPEC_ITERS):
        sv = sum(v)
        v = [n * x - sv for x in v]
        v = [sum(M[i][j] * v[j] for j in range(n)) for i in range(n)]
        mx = max(max(abs(x) for x in v), 1)
        s = mx.bit_length() - _SPEC_BITS
        if s > 0:
            v = [trunc_div(x, 1 << s) for x in v]
    rows = [
        (names[node], node, int(v[k]), 1 if v[k] > 0 else 0)
        for k, node in enumerate(ordered)
    ]
    return spark.createDataFrame(
        rows, "nation string, nationkey long, fiedler_fx long, side int"
    )


K_TRUSS = 3
TRUSS_MAX_ITERS = 8


def _ktruss_oracle() -> str:
    """DuckDB SQL reproducing graph_ktruss exactly: the support-peel
    loop unrolled to TRUSS_MAX_ITERS rounds (the graph_kcore recipe —
    peeling is monotone and idempotent at the fixpoint, so fixed
    unrolled rounds == Spark's early-break loop; every round AS
    MATERIALIZED or DuckDB re-expands the prefix per reference)."""
    rounds = []
    for i in range(TRUSS_MAX_ITERS):
        rounds.append(f"""
        , b{i} AS MATERIALIZED (
            SELECT s1 AS u, s2 AS v FROM e{i}
            UNION ALL
            SELECT s2, s1 FROM e{i}
        ), sup{i} AS MATERIALIZED (
            SELECT x.v AS s1, y.v AS s2, count(*) AS sup
            FROM b{i} x
            JOIN b{i} y ON x.u = y.u AND x.v < y.v
            JOIN e{i} e ON e.s1 = x.v AND e.s2 = y.v
            GROUP BY 1, 2
        ), e{i + 1} AS MATERIALIZED (
            SELECT s.s1, s.s2 FROM sup{i} s
            WHERE s.sup >= {K_TRUSS - 2}
        )""")
    last = TRUSS_MAX_ITERS
    return _EDGES_ORACLE + f"""
        , e0 AS MATERIALIZED (SELECT s1, s2 FROM edges)
        {''.join(rounds)}
        , bf AS MATERIALIZED (
            SELECT s1 AS u, s2 AS v FROM e{last}
            UNION ALL
            SELECT s2, s1 FROM e{last}
        )
        SELECT x.v AS s1, y.v AS s2, CAST(count(*) AS BIGINT) AS support
        FROM bf x
        JOIN bf y ON x.u = y.u AND x.v < y.v
        JOIN e{last} e ON e.s1 = x.v AND e.s2 = y.v
        GROUP BY 1, 2
    """


def _edge_support(cur: DataFrame) -> DataFrame:
    """Per-edge triangle support on an s1<s2 edge set: wedges from the
    both-direction adjacency (u<v neighbor pairs per pivot) inner-joined
    back to the edge set. Degree is bounded by the mutual-top-{TOP_K}
    sparsification, so each pivot emits <= C(8,2)=28 wedges — linear in
    edges at any corpus size."""
    both = cur.union(
        cur.select(F.col("s2").alias("s1"), F.col("s1").alias("s2"))
    ).select(F.col("s1").alias("u"), F.col("s2").alias("v"))
    x = both.alias("x")
    y = both.alias("y")
    wedges = x.join(
        y,
        (F.col("x.u") == F.col("y.u")) & (F.col("x.v") < F.col("y.v")),
    ).select(F.col("x.v").alias("s1"), F.col("y.v").alias("s2"))
    return (
        wedges.join(cur, ["s1", "s2"])
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("sup"))
    )


@register(
    "graph_ktruss",
    oracle=_ktruss_oracle(),
    doc=f"K-truss decomposition (k={K_TRUSS}) of the mutual-top-{TOP_K} "
        "supplier co-occurrence graph: iteratively drop edges in fewer "
        f"than {K_TRUSS - 2} triangles until fixpoint (Cohen 2008). Each "
        "round is one degree-bounded wedge self-join + one edge "
        "semi-filter; the mutual-top-k sparsification caps degree at "
        f"{TOP_K}, so wedge count is linear in edges at any scale (the "
        "q_triangle_count shape iterated). Integer-only -> unique "
        "fixpoint regardless of peel order; hash-matched by an "
        "unrolled-MATERIALIZED DuckDB peel. Emits surviving edges with "
        "their in-truss support.",
    tags=("graph",),
)
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    cur = cooccurrence_edges(spark, sf_dir).localCheckpoint()
    n_edges = cur.count()
    for _ in range(TRUSS_MAX_ITERS):
        sup = _edge_support(cur)
        # sup is edge-sized but shrinks every round; AQE picks the join
        # strategy. Inner join == the oracle's sup-filter semantics:
        # an edge in no triangle has no sup row and is dropped.
        nxt = (
            sup.where(F.col("sup") >= K_TRUSS - 2)
            .select("s1", "s2")
            .localCheckpoint(eager=False)
        )
        n_next = nxt.count()
        cur = nxt
        if n_next == n_edges:
            break
        n_edges = n_next
    return _edge_support(cur).select(
        "s1", "s2", F.col("sup").cast("bigint").alias("support")
    )
