"""Distributed connected components via iterative min-label propagation.

Each round every node takes the min of its own label and its neighbors'
labels; convergence needs graph-diameter rounds. Near-dup graphs are
quasi-cliques, so 2-3 rounds in practice. Per-round lineage is truncated
with localCheckpoint so the physical plan stays bounded regardless of
iteration count (no recursive plan growth — the Spark analog of the
DuckDB recursive-CTE oracle).

No reference analog (the reference computes no graphs); this backs the
north-star dedup/semantic-dedup cluster assignment (SURVEY §7.1-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# max edge rows resolved by the single-task exact kernel; bounds the
# final task at ~64 MB of int64 pairs and <1 s of vectorized numpy
_LOCAL_CC_EDGE_CAP = 4_000_000

# safety bound on contraction levels: each level collapses the row set
# to <= one star edge per distinct node, so 20 levels cover any input
# that contracts at all; hitting it means the node set itself is bigger
# than the single-task cap and the caller should switch algorithms
_MAX_CC_LEVELS = 20


def _cc_kernel(batches):
    """Exact connected components over one partition's (u, v) edge rows:
    vectorized hash-to-min (np.minimum.at scatter + pointer halving),
    treating edges as undirected. Emits (node, label=component min) for
    every node in the partition. O(E log V) numpy work, no Python loop
    over edges."""
    import numpy as np
    import pandas as pd

    us, vs = [], []
    for pdf in batches:
        us.append(pdf["u"].to_numpy(dtype=np.int64))
        vs.append(pdf["v"].to_numpy(dtype=np.int64))
    if not us or not sum(len(a) for a in us):
        yield pd.DataFrame(
            {"node": pd.Series([], dtype="int64"),
             "label": pd.Series([], dtype="int64")}
        )
        return
    u = np.concatenate(us)
    v = np.concatenate(vs)
    # np.unique sorts ascending, so index order == node-id order and the
    # component's min index maps back to the component's min node id
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = lab.copy()
        np.minimum.at(lab, ui, lab[vi])
        np.minimum.at(lab, vi, lab[ui])
        lab = np.minimum(lab, lab[lab])
        if np.array_equal(lab, old):
            break
    # resolve forest pointers to roots (min of component)
    while True:
        nl = lab[lab]
        if np.array_equal(nl, lab):
            break
        lab = nl
    yield pd.DataFrame(
        {"node": pd.Series(nodes, dtype="int64"),
         "label": pd.Series(nodes[lab], dtype="int64")}
    )


def min_label_components(edges: DataFrame) -> DataFrame:
    """``edges`` is a directed edge list with columns (u, v) containing
    BOTH orientations of every undirected edge. Returns (node, label)
    where label is the component's minimum node id. Only nodes that
    appear in ``edges`` are returned — callers join back to the full
    entity table for singleton handling.

    Design (replaced the per-round join loop in round 6): iterative
    label propagation needs graph-DIAMETER (or with pointer halving,
    log-diameter) Spark rounds, and in local mode every round costs a
    multi-second stage wall regardless of data size — a 1,840-edge
    cosine-chain graph burned 52 s. Instead, run PARTITION-LOCAL exact
    CC (vectorized numpy hash-to-min inside mapInPandas) and emit each
    partition's (node, local_min) star edges: stars preserve the
    partition subgraph's connectivity, and nodes shared across
    partitions splice the stars together, so the union is an
    equivalence-preserving CONTRACTION of the input (all nodes kept,
    edge rows collapse toward one star per component). Repeat until the
    edge set fits _LOCAL_CC_EDGE_CAP, then one single-task kernel pass
    labels every node exactly. Small graphs resolve in 2 jobs total; a
    100 TB edge set takes O(log) contraction levels of ~2M-row tasks
    with a per-level shuffle — no diameter dependence, no driver-side
    state beyond a per-level count."""
    work = edges.select(
        F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v")
    )
    n = work.count()
    levels = 0
    while n > _LOCAL_CC_EDGE_CAP:
        # contract until the star set fits the single-task cap; row
        # count is monotone non-increasing after level 1 (each level
        # emits one star edge per distinct node), so n >= prev means a
        # genuine stall — the NODE set alone exceeds the cap and no
        # amount of contraction helps. Instead of coalesce(1)ing an
        # unbounded set into a silent single-task OOM (ADVICE r6),
        # hand the equivalence-preserving star set to the fully
        # distributed star-contraction algorithm, which needs no
        # single-task pass at all.
        stalled = levels >= _MAX_CC_LEVELS
        if not stalled:
            parts = n // 2_000_000 + 1
            work = (
                work.repartition(parts)
                .mapInPandas(_cc_kernel, "node long, label long")
                .distinct()
                .toDF("u", "v")
                .localCheckpoint(eager=False)
            )
            prev, n = n, work.count()
            levels += 1
            stalled = n >= prev
        if stalled and n > _LOCAL_CC_EDGE_CAP:
            sym = work.union(
                work.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            return star_contraction_components(sym)
    return work.coalesce(1).mapInPandas(_cc_kernel, "node long, label long")


def star_contraction_components(edges: DataFrame) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — public algorithm). ``edges`` is a directed edge
    list with columns (u, v) containing BOTH orientations of every
    undirected edge; returns (node, label) for every node that appears,
    label = the component's minimum node id.

    Why this exists next to min_label_components: label propagation
    converges in graph-DIAMETER rounds, which is fine for quasi-clique
    near-dup components but pathological for chain-shaped graphs (a
    100 TB web graph has long paths). Star contraction converges in
    O(log^2 n) rounds on ANY topology: each round every node hooks its
    neighbors onto its neighborhood minimum, halving component height.
    Per round: two aggregations + two joins, lineage truncated with
    localCheckpoint; the edge set only shrinks (toward one star per
    component), so round cost is non-increasing.
    """

    def canonical(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.greatest("u", "v").alias("hi"),
                F.least("u", "v").alias("lo"),
            )
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )

    # isolated self-labeled nodes fall out of the edge set immediately;
    # remember every node ever seen so the final labeling covers them
    all_nodes = edges.select(F.col("u").alias("node")).distinct() \
        .localCheckpoint()
    # lazy cut + count(): ONE job materializes the round's edge set AND
    # answers the convergence check (the BFS pattern, CLAUDE.md r7 §5);
    # the eager per-round localCheckpoints + a recount of the PREVIOUS
    # round's already-known cardinality cost ~4 driver jobs per round
    # (measured: dedup_clusters_starcc 6.7 s in-sweep at sf0.1, round
    # overhead dominating the shrinking edge set)
    cur = canonical(edges).localCheckpoint(eager=False)
    n_cur = cur.count()
    while True:
        both = cur.select(F.col("hi").alias("u"), F.col("lo").alias("v")) \
            .union(cur.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
        m = both.groupBy("u").agg(F.min("v").alias("mn")) \
            .select("u", F.least("mn", "u").alias("m"))
        # large-star: neighbors strictly above u hook onto u's minimum
        large = (
            both.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # lazy: materialized (and persisted) by the new.count() job below;
        # both2's two union branches read the same checkpointed RDD
        after_large = canonical(large).localCheckpoint(eager=False)
        both2 = after_large.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).union(after_large.select(
            F.col("lo").alias("u"), F.col("hi").alias("v")
        ))
        m2 = both2.groupBy("u").agg(F.min("v").alias("mn")) \
            .select("u", F.least("mn", "u").alias("m"))
        # small-star: u and its not-above neighbors hook onto the minimum
        small = (
            both2.join(m2, "u")
            .filter(F.col("v") < F.col("u"))
            .select("v", "m")
            .toDF("u", "v")
            .union(m2.select(F.col("u"), F.col("m").alias("v")))
        )
        new = canonical(small).localCheckpoint(eager=False)
        # convergence test: the edge count shrinks monotonically toward
        # one star per component, so a cheap count inequality proves
        # non-convergence most rounds; only count-equal rounds pay the
        # exact (exceptAll) set comparison
        n_new = new.count()
        if n_new == n_cur:
            delta = (
                new.exceptAll(cur).count() + cur.exceptAll(new).count()
            )
        else:
            delta = 1
        cur, n_cur = new, n_new
        if delta == 0:
            break
    # fixpoint: every component is a star centered at its minimum
    stars = cur.select(F.col("hi").alias("node"), F.col("lo").alias("lbl")) \
        .union(cur.select(F.col("lo").alias("node"), F.col("lo").alias("lbl")))
    labels = stars.groupBy("node").agg(F.min("lbl").alias("label"))
    return (
        all_nodes.join(labels, "node", "left")
        .select(
            "node", F.coalesce("label", F.col("node")).alias("label")
        )
    )
