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


def min_label_components(edges: DataFrame) -> DataFrame:
    """``edges`` is a directed edge list with columns (u, v) containing
    BOTH orientations of every undirected edge. Returns (node, label)
    where label is the component's minimum node id. Only nodes that
    appear in ``edges`` are returned — callers join back to the full
    entity table for singleton handling."""
    labels = (
        edges.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    while True:
        nbr = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels["node"] == nbr["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_min"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels


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
    cur = canonical(edges).localCheckpoint()
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
        after_large = canonical(large).localCheckpoint()
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
        new = canonical(small).localCheckpoint()
        # convergence test: the edge count shrinks monotonically toward
        # one star per component, so a cheap count inequality proves
        # non-convergence most rounds; only count-equal rounds pay the
        # exact (exceptAll) set comparison
        if new.count() == cur.count():
            delta = (
                new.exceptAll(cur).count() + cur.exceptAll(new).count()
            )
        else:
            delta = 1
        cur = new
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
