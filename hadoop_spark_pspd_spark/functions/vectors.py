"""Vector column expressions over ``array<float>`` embeddings.

All JVM-side (higher-order functions) — no Python UDF in the hot path.
Products/sums are computed in DOUBLE with left-to-right sequential
accumulation, which the DuckDB oracle replicates (list_sum over
list_transform preserves order), so values agree to ~1e-14 and a round-6
makes them hash-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
