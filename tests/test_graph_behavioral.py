"""Semantics + plan-shape tests for the behavioral, sketch, and graph
operator families (beyond the registry-wide oracle parity sweep).

Cache convention: q_triangle_count marks its shared edge list with
.cache(); the verify/bench harnesses release it with a per-query
spark.catalog.clearCache(). Tests (and any other caller invoking
operators directly) should do the same after collecting, or repeated
calls accumulate cached edge DataFrames in executor memory — the
session-level conftest fixture clears caches between modules."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.operators.behavioral import q_funnel_stages
from hadoop_spark_pspd_spark.operators.graph import (
    TOP_K,
    cooccurrence_edges,
    graph_pagerank,
)
from hadoop_spark_pspd_spark.operators.sketches import (
    q_heavy_hitters,
    q_runtime_filter_join,
)
from hadoop_spark_pspd_spark.plans.checks import formatted_plan

from conftest import SF_SMOKE


def test_funnel_is_monotone(spark):
    rows = {
        r["stage"]: r["users"]
        for r in q_funnel_stages(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {1, 2, 3}
    # each stage requires the previous one strictly earlier
    assert rows[1] >= rows[2] >= rows[3]
    assert rows[1] > 0


def test_heavy_hitter_candidate_prune_is_complete(spark):
    """The pruned two-phase plan must equal the direct GROUP BY/HAVING."""
    from hadoop_spark_pspd_spark.catalog import Tables
    from hadoop_spark_pspd_spark.functions.text import words_exploded
    from hadoop_spark_pspd_spark.operators.sketches import HH_K

    got = {
        (r["word"], r["n"])
        for r in q_heavy_hitters(spark, SF_SMOKE).collect()
    }
    toks = Tables(spark, SF_SMOKE).documents.select(
        words_exploded(F.lower("text"))
    )
    total = toks.count()
    direct = {
        (r["word"], r["n"])
        for r in toks.groupBy("word")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") * HH_K >= F.lit(total))
        .collect()
    }
    assert got == direct and got


def test_heavy_hitter_plan_has_no_python_stage(spark):
    """Phase 1 is JVM built-ins: the plan must ship nothing through the
    Python worker (no mapInPandas / Arrow eval stage)."""
    plan = formatted_plan(q_heavy_hitters(spark, SF_SMOKE)).lower()
    assert "mapinpandas" not in plan
    assert "arrowevalpython" not in plan
    assert "batchevalpython" not in plan


def test_runtime_filter_join_restores_session_confs(spark):
    """q_runtime_filter_join bakes its bloom confs into its own plan and
    must not leak them into the session (leaked
    applicationSideScanSizeThreshold=0 would inject bloom filters into
    every later query and make bench timings order-dependent)."""
    keys = [
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold",
    ]
    before = [spark.conf.get(k, None) for k in keys]
    df = q_runtime_filter_join(spark, SF_SMOKE)
    after = [spark.conf.get(k, None) for k in keys]
    assert before == after
    # and the baked plan still carries the runtime filter under the
    # restored (default-threshold) session confs when broadcast is off
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df2 = q_runtime_filter_join(spark, SF_SMOKE)
        plan = df2._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "might_contain" in plan or "bloomfilter" in plan
        assert [spark.conf.get(k, None) for k in keys] == before
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    del df


def test_runtime_bloom_filter_is_injected(spark):
    """InjectRuntimeFilter only rewrites joins it can't broadcast-by-size
    (a broadcast already prunes the probe side). At test SFs every build
    side fits the 10MB broadcast threshold, so disable size-broadcasting
    here to reproduce the at-scale shuffle-join plan and assert the bloom
    filter lands on the probe side."""
    default = {
        (r["l_returnflag"], r["n_items"], r["revenue"])
        for r in q_runtime_filter_join(spark, SF_SMOKE).collect()
    }
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_runtime_filter_join(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "might_contain" in plan or "bloomfilter" in plan
        shuffled = {
            (r["l_returnflag"], r["n_items"], r["revenue"])
            for r in df.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert shuffled == default  # the runtime filter never changes semantics


def test_mutual_topk_bounds_degree(spark):
    edges = cooccurrence_edges(spark, SF_SMOKE)
    nodes = edges.select(F.col("s1").alias("node")).unionAll(
        edges.select(F.col("s2").alias("node"))
    )
    max_deg = (
        nodes.groupBy("node")
        .agg(F.count("*").alias("d"))
        .agg(F.max("d").alias("m"))
        .collect()[0]["m"]
    )
    assert max_deg <= TOP_K


def test_pagerank_is_a_probability_distribution(spark):
    # top-20 ranks on the sf0.001 graph (10 suppliers -> all nodes present)
    rows = graph_pagerank(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    assert all(r["rank"] > 0 for r in rows)
    total = sum(r["rank"] for r in rows)
    # 10-node graph: the 20-row limit covers every node, so ranks sum to ~1
    assert abs(total - 1.0) < 1e-3
    # deterministic across runs (localCheckpoint + exact replay)
    again = graph_pagerank(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_kcore_property_holds_at_fixpoint(spark):
    """Every surviving node's degree within the surviving subgraph is
    >= k, and recomputing the peel in plain Python on the collected
    smoke-scale graph gives the identical core (the fixpoint is unique
    regardless of peel order)."""
    from hadoop_spark_pspd_spark.operators.graph import (
        K_CORE,
        cooccurrence_directed,
        graph_kcore,
    )

    got = {
        r["node"]: r["degree"]
        for r in graph_kcore(spark, SF_SMOKE).collect()
    }
    assert all(d >= K_CORE for d in got.values())

    edges = {
        (r["src"], r["dst"])
        for r in cooccurrence_directed(spark, SF_SMOKE)
        .select("src", "dst")
        .collect()
    }
    nodes = {s for s, _ in edges}
    while True:
        deg = {n: 0 for n in nodes}
        for s, d in edges:
            if s in nodes and d in nodes:
                deg[s] += 1
        drop = {n for n, dg in deg.items() if dg < K_CORE}
        if not drop:
            break
        nodes -= drop
    expect = {}
    for s, d in edges:
        if s in nodes and d in nodes:
            expect[s] = expect.get(s, 0) + 1
    assert got == expect


def test_star_contraction_matches_union_find(spark):
    """Star-contraction CC (the O(log^2 n)-round scale path) must agree
    with a driver-side union-find on topologies min-label propagation
    handles poorly: a long chain (diameter = n) plus disjoint cliques."""
    import random

    from pyspark.sql import functions as F

    from hadoop_spark_pspd_spark.functions.graph import (
        star_contraction_components,
    )

    edges = [(i, i + 1) for i in range(40)]  # chain, diameter 40
    edges += [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
    rng = random.Random(13)
    edges += [
        (rng.randrange(200, 260), rng.randrange(200, 260)) for _ in range(60)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for n in list(parent):
        comps.setdefault(find(n), []).append(n)
    want = {n: min(v) for _, v in comps.items() for n in v}

    df = spark.createDataFrame(edges, "u long, v long")
    both = df.union(
        df.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    got = {
        r.node: r.label for r in star_contraction_components(both).collect()
    }
    assert got == want


def test_min_label_components_matches_union_find(spark):
    """Contraction-based CC (partition-local numpy kernels spliced by
    shared nodes) must agree with a driver-side union-find on the same
    adversarial topologies as the star-contraction test — a long chain
    (the shape that made the old per-round join loop diameter-bound),
    disjoint cliques, and a random clump — BOTH through the direct
    single-task path and through the multi-level contraction path
    (cap lowered so the splice logic actually runs)."""
    import random

    from pyspark.sql import functions as F

    from hadoop_spark_pspd_spark.functions import graph as G

    edges = [(i, i + 1) for i in range(40)]  # chain, diameter 40
    edges += [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
    rng = random.Random(29)
    edges += [
        (rng.randrange(200, 260), rng.randrange(200, 260)) for _ in range(60)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for n in list(parent):
        comps.setdefault(find(n), []).append(n)
    want = {n: min(v) for _, v in comps.items() for n in v}

    df = spark.createDataFrame(edges, "u long, v long")
    both = df.union(
        df.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).repartition(8)  # scatter edges so partition-local CC is partial

    got = {r.node: r.label for r in G.min_label_components(both).collect()}
    assert got == want

    # force the contraction loop: cap below the edge count so at least
    # one partition-local star-contraction level runs before the final
    # single-task pass
    old_cap = G._LOCAL_CC_EDGE_CAP
    try:
        G._LOCAL_CC_EDGE_CAP = 16
        got2 = {
            r.node: r.label for r in G.min_label_components(both).collect()
        }
    finally:
        G._LOCAL_CC_EDGE_CAP = old_cap
    assert got2 == want


def test_min_label_components_degenerate_edges(spark):
    """Robustness classes the generated pair data can't produce:
    duplicate edges, self-loops, a two-node component, and an edge set
    exactly AT the local cap (boundary: must take the single-task
    path, not contraction)."""
    from pyspark.sql import functions as F

    from hadoop_spark_pspd_spark.functions import graph as G

    edges = [
        (1, 2), (2, 1), (1, 2), (2, 1),   # duplicated both ways
        (3, 3),                            # self-loop: own component
        (4, 5), (5, 4),
        (5, 6), (6, 5),
    ]
    df = spark.createDataFrame(edges, "u long, v long").repartition(4)
    got = {r.node: r.label for r in G.min_label_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 4, 6: 4}

    # cap boundary: n_edges == cap must NOT trigger a contraction level
    old = G._LOCAL_CC_EDGE_CAP
    try:
        G._LOCAL_CC_EDGE_CAP = len(edges)
        got2 = {
            r.node: r.label for r in G.min_label_components(df).collect()
        }
        G._LOCAL_CC_EDGE_CAP = len(edges) - 1  # one below: contraction
        got3 = {
            r.node: r.label for r in G.min_label_components(df).collect()
        }
    finally:
        G._LOCAL_CC_EDGE_CAP = old
    assert got2 == got and got3 == got


def test_bfs_kernel_matches_loop_and_reference(spark, monkeypatch):
    """graph_bfs_hops' single-task numpy kernel (round-11 optimization)
    must emit exactly the rows of (a) a driver-side reference BFS and
    (b) the distributed frontier-loop fallback path, on adversarial
    topologies: a chain longer than _BFS_MAX_HOPS (hop bound binds), a
    clique bridged to the chain, and an unreachable component (must be
    absent from the output)."""
    import pandas as pd

    from hadoop_spark_pspd_spark.operators import graph as G

    # node 0 is the min -> BFS root. Chain 0..30 (len > 20-hop bound),
    # clique {2, 40, 41, 42}, island {100, 101} unreachable from 0.
    und = [(i, i + 1) for i in range(30)]
    und += [(a, b) for a in (2, 40, 41) for b in (40, 41, 42) if a < b]
    und += [(100, 101)]
    both = und + [(b, a) for a, b in und]

    # driver-side reference BFS with the same hop bound
    adj: dict[int, set[int]] = {}
    for a, b in both:
        adj.setdefault(a, set()).add(b)
    want, frontier = {0: 0}, {0}
    for d in range(1, G._BFS_MAX_HOPS + 1):
        nxt = {
            v for u in frontier for v in adj.get(u, ()) if v not in want
        }
        for v in nxt:
            want[v] = d
        frontier = nxt

    # (a) the kernel directly
    pdf = pd.DataFrame(both, columns=["u", "v"])
    [out] = list(G._bfs_kernel(iter([pdf])))
    got_kernel = dict(zip(out["node"], out["hops"]))
    assert got_kernel == want

    # (b) all three operator paths must agree: fused kernel (round-12),
    # window-join edges + both-table kernel, distributed frontier loop.
    # Every degree here is <= 8 so mutual-top-8(directed) == und.
    directed = [(a, b, 1) for a, b in both]
    ddf = spark.createDataFrame(directed, "src long, dst long, w long")
    monkeypatch.setattr(G, "cooccurrence_directed", lambda *_: ddf)

    def run():
        return {
            r.node: r.hops
            for r in G.graph_bfs_hops(spark, SF_SMOKE).collect()
        }

    fused_rows = run()
    monkeypatch.setattr(G, "_CO_EDGES_LOCAL_CAP", 0)  # force edge joins
    kernel_rows = run()
    monkeypatch.setattr(G, "_BFS_LOCAL_EDGE_CAP", 0)  # force the loop
    loop_rows = run()
    assert fused_rows == kernel_rows == loop_rows == want


def test_katz_kernel_matches_loop(spark, monkeypatch):
    """graph_katz_centrality's single-task walk-count kernel (round-11
    optimization) must emit exactly the rows of the DataFrame join-loop
    path and of a driver-side reference recursion, including on a
    chain (asymmetric degrees) plus a clique."""
    from hadoop_spark_pspd_spark.operators import graph as G

    und = [(i, i + 1) for i in range(12)]
    und += [(a, b) for a in (3, 50, 51) for b in (50, 51, 52) if a < b]
    both = und + [(b, a) for a, b in und]

    # driver-side reference: c_k(v) = sum_{u->v} c_{k-1}(u)
    nodes = sorted({x for e in both for x in e})
    c = {x: 1 for x in nodes}
    acc = {x: 0 for x in nodes}
    for k in range(1, G._KATZ_ROUNDS + 1):
        nc = {x: 0 for x in nodes}
        for u, v in both:
            nc[v] += c[u]
        c = nc
        for x in nodes:
            acc[x] += c[x] * (1 << (G._KATZ_ROUNDS - k))
    want = {
        x: (acc[x], acc[x] / float(1 << G._KATZ_ROUNDS)) for x in nodes
    }

    # all degrees <= 8 -> mutual-top-8(directed) == und; all three
    # operator paths (fused kernel / edge joins + both-table kernel /
    # DataFrame loop) must agree with the reference
    directed = [(a, b, 1) for a, b in both]
    ddf = spark.createDataFrame(directed, "src long, dst long, w long")
    monkeypatch.setattr(G, "cooccurrence_directed", lambda *_: ddf)

    def run():
        return {
            r.node: (r.katz_q, r.katz)
            for r in G.graph_katz_centrality(spark, SF_SMOKE).collect()
        }

    fused_rows = run()
    monkeypatch.setattr(G, "_CO_EDGES_LOCAL_CAP", 0)  # force edge joins
    kernel_rows = run()
    monkeypatch.setattr(G, "_BFS_LOCAL_EDGE_CAP", 0)  # force the loop
    loop_rows = run()
    assert fused_rows == kernel_rows == loop_rows == want


def test_pagerank_and_lpa_kernels_match_loops(spark, monkeypatch):
    """The round-11 single-task kernels for graph_pagerank and
    graph_label_propagation must emit BIT-identical rows to the
    distributed loop paths on an asymmetric-degree graph (chain + hub +
    clique) — the fixed-point / integer-mode designs are what license
    this, so any drift here is a determinism regression."""
    from hadoop_spark_pspd_spark.operators import graph as G

    und = [(i, i + 1) for i in range(10)]
    und += [(0, j) for j in range(2, 8)]          # hub with parallel paths
    und += [(a, b) for a in (5, 30, 31) for b in (30, 31, 32) if a < b]
    pairs = sorted(set(und))

    # directed co-occurrence analog: both orientations, weight = 1 + (u+v) % 3
    directed = [(a, b, 1 + (a + b) % 3) for a, b in pairs]
    directed += [(b, a, w) for a, b, w in directed]
    ddf = spark.createDataFrame(directed, "src long, dst long, w long")
    monkeypatch.setattr(G, "cooccurrence_directed", lambda *_: ddf)

    def run_pr():
        return [
            (r.node, r.rank)
            for r in G.graph_pagerank(spark, SF_SMOKE).collect()
        ]

    pr_kernel = run_pr()
    monkeypatch.setattr(G, "_PR_LOCAL_EDGE_CAP", 0)  # force the loop
    pr_loop = run_pr()
    assert pr_kernel == pr_loop  # bit-identical doubles, same order

    def run_lpa():
        return {
            r.node: r.label
            for r in G.graph_label_propagation(spark, SF_SMOKE).collect()
        }

    # every node's degree is <= 8 here, so mutual-top-8(ddf) == pairs
    # and all three paths must agree on the SAME graph
    lpa_fused = run_lpa()
    # force the intermediate path: window-join edge build + both-table
    # LPA kernel (the pre-round-12 shape)
    monkeypatch.setattr(G, "_CO_EDGES_LOCAL_CAP", 0)
    lpa_kernel = run_lpa()
    monkeypatch.setattr(G, "_BFS_LOCAL_EDGE_CAP", 0)  # force the loop
    lpa_loop = run_lpa()
    assert lpa_fused == lpa_kernel == lpa_loop


def test_triangle_fused_kernel_matches_join_path(spark, monkeypatch):
    """q_triangle_count's fused kernel (round-12: mutual-top-8 + wedge
    enumeration in one task) must emit the identical single
    (n_edges, n_triangles) row as the join formulation, on a graph with
    triangles inside and ACROSS top-8 boundaries."""
    from hadoop_spark_pspd_spark.operators import graph as G

    und = [(i, i + 1) for i in range(10)] + [(0, 2), (1, 3), (0, 3)]
    und += [(a, b) for a in range(20, 25) for b in range(20, 25) if a < b]
    directed = [(a, b, 1 + (a * 7 + b) % 4) for a, b in sorted(set(und))]
    directed += [(b, a, w) for a, b, w in directed]
    ddf = spark.createDataFrame(directed, "src long, dst long, w long")
    monkeypatch.setattr(G, "cooccurrence_directed", lambda *_: ddf)

    def run():
        return [
            (r.n_edges, r.n_triangles)
            for r in G.q_triangle_count(spark, SF_SMOKE).collect()
        ]

    fused = run()
    monkeypatch.setattr(G, "_CO_EDGES_LOCAL_CAP", 0)  # force the joins
    joined = run()
    assert fused == joined and len(fused) == 1
    assert fused[0][1] > 0  # the fixture actually contains triangles


def test_topk_mutual_kernel_matches_window_join(spark, monkeypatch):
    """cooccurrence_edges' single-task sparsification kernel (round-11)
    must emit exactly the mutual-top-K edge set of the window+self-join
    path, including on weight TIES (dst tie-break) and one-directional
    top-K membership (a in top-8 of b but not vice versa)."""
    from hadoop_spark_pspd_spark.operators import graph as G

    rows = []
    # node 0 co-occurs with 1..12: weights force top-8 selection with
    # ties (w = 5 for dst 4..9 -> dst tie-break decides the cut)
    for j in range(1, 13):
        w = 9 if j < 4 else 5
        rows += [(0, j, w), (j, 0, w)]
    # clique 20..24 all weight 1 (all mutual)
    for a in range(20, 25):
        for b in range(20, 25):
            if a != b:
                rows.append((a, b, 1))
    # 1..12 also co-occur among themselves lightly so node 0 falls OUT
    # of some of their top-8 lists (asymmetric membership)
    for j in range(1, 12):
        rows += [(j, j + 1, 7), (j + 1, j, 7)]
    ddf = spark.createDataFrame(rows, "src long, dst long, w long")
    monkeypatch.setattr(G, "cooccurrence_directed", lambda *_: ddf)

    def run():
        return sorted(
            (r.s1, r.s2)
            for r in G.cooccurrence_edges(spark, SF_SMOKE).collect()
        )

    kernel_rows = run()
    monkeypatch.setattr(G, "_CO_EDGES_LOCAL_CAP", 0)  # force the window
    loop_rows = run()
    assert kernel_rows == loop_rows and len(kernel_rows) > 0


def test_hits_kernel_tolerates_null_event_type(spark, monkeypatch):
    """A NULL event_type (dirty events data) must not kill the kernel
    task: np.unique on a None/str object array raises TypeError, while
    the distributed groupBy keeps a NULL group — kernel and loop must
    emit the SAME rows including the NULL-keyed one (ADVICE r11)."""
    from types import SimpleNamespace

    from hadoop_spark_pspd_spark.operators import graph as G

    rows = [(1, "view"), (1, None), (2, "view"), (2, "buy"), (3, None),
            (3, "buy"), (4, "view"), (4, None), (4, "buy")]
    edf = spark.createDataFrame(rows, "user_id long, event_type string")
    monkeypatch.setattr(
        G, "Tables", lambda *_: SimpleNamespace(events=edf)
    )

    def run():
        return sorted(
            (
                (r.event_type, r.auth_fx, r.authority)
                for r in G.graph_hits_bipartite(spark, SF_SMOKE).collect()
            ),
            key=lambda x: (x[0] is not None, x),
        )

    kernel_rows = run()
    monkeypatch.setattr(G, "_HITS_LOCAL_EDGE_CAP", 0)  # force the loop
    loop_rows = run()
    assert kernel_rows == loop_rows
    assert any(et is None for et, _, _ in kernel_rows)


def test_hits_kernel_matches_loop(spark, monkeypatch):
    """graph_hits_bipartite's single-task kernel must emit exactly the
    distributed loop's rows — the 2^16-grid integer design makes both
    parallelism-invariant, including the zero-mass guard and trunc
    division."""
    from hadoop_spark_pspd_spark.operators import graph as G

    def run():
        return sorted(
            (r.event_type, r.auth_fx, r.authority)
            for r in G.graph_hits_bipartite(spark, SF_SMOKE).collect()
        )

    kernel_rows = run()
    monkeypatch.setattr(G, "_HITS_LOCAL_EDGE_CAP", 0)  # force the loop
    loop_rows = run()
    assert kernel_rows == loop_rows and len(kernel_rows) > 0
