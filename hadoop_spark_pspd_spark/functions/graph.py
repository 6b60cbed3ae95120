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
