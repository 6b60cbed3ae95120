"""Skew-mitigation helpers: salted join for hot keys.

AQE's skew-join split (enabled in the session factory) handles most skew at
runtime; salting is the explicit tool for pathological hot keys the
optimizer can't split (e.g. a null-heavy or celebrity key in a 100 TB
fact table). Pattern: replicate the small side SALT_N times, scatter the
big side's hot keys across salt buckets, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on `key`, salted to break per-key skew.

    The big side gets a deterministic-per-row salt (hash of all columns,
    mod salt_n — no rand(), so retries/lineage recompute identically);
    the small side is exploded salt_n times. Output columns = natural join
    output (salt dropped).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n))
    big_salted = big.withColumn("__salt", salt.cast("int"))
    small_salted = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return big_salted.join(small_salted, [key, "__salt"], how).drop("__salt")


def null_safe_key(col: str | Column, sentinel: str = "__null__") -> Column:
    """Map NULL join keys to a sentinel so they don't all hash to one
    reducer (the classic null-skew fix) while keeping them joinable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(sentinel))
