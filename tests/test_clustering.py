"""k-means quality gates: Lloyd's invariants + bit-reproducibility.

No DuckDB oracle exists for multi-round FP argmin (the driver records a
rows-only check), so correctness rests on the algorithm's invariants:
inertia is non-increasing per round, every cluster id is valid, and a
rerun is bit-identical (exact-decimal centroid means make partial-agg
order irrelevant).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.operators.clustering import (
    K,
    kmeans_assignments,
    kmeans_embeddings,
)

from conftest import SF_SMOKE


def _inertia(df) -> float:
    return df.agg(F.sum("dist")).collect()[0][0]


def test_inertia_non_increasing(spark):
    i1 = _inertia(kmeans_assignments(spark, SF_SMOKE, 1))
    i3 = _inertia(kmeans_assignments(spark, SF_SMOKE, 3))
    assert i3 <= i1 + 1e-9


def test_assignments_deterministic_and_complete(spark):
    a = kmeans_embeddings(spark, SF_SMOKE)
    b = kmeans_embeddings(spark, SF_SMOKE)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    n_pts = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert a.count() == n_pts
    ids = {r.cluster_id for r in a.select("cluster_id").distinct().collect()}
    assert ids <= set(range(K))
