"""Distributed exact global ranking — the two-level rank/ntile kernel.

A global ``row_number()`` / ``ntile(n)`` over an unpartitioned window
forces WindowExec to sort the ENTIRE input on one task — the
single-partition-sort anti-pattern that dies at cluster scale. The
scale-safe equivalent, when the ORDER BY is a total order (unique
tie-break, the repo convention for every ranking):

1. ``repartitionByRange`` on the order — non-overlapping sorted ranges,
   balanced by sampling, so range-partition id order == sort order.
   Spark's range sampler seeds deterministically per input partition
   (task-retry correctness requires it), so re-executions of the same
   exchange produce identical boundaries.
2. per-partition ``row_number`` via a window PARTITIONED by
   ``spark_partition_id()`` — P balanced sorts, no global sort.
3. per-partition row counts -> cumulative offsets over the P-row
   (config-bounded, not data-bounded) side table, broadcast back:
   global_rank = offset + local_rank. Exact, deterministic.

``ntile`` then needs no window at all: with N rows and n buckets Spark
(and the SQL standard, and DuckDB) give the first N mod n buckets
ceil(N/n) rows and the rest floor(N/n), so the bucket of global rank r
is pure integer arithmetic on (r, N). All divisions here are EXACT in
doubles: for positive ints a,b with a < 2^53, (a - a % b) / b divides
without remainder and IEEE division of a representable quotient is
exact — no floor(double) one-ulp traps (CLAUDE.md round-6 #6).

No reference analog (the reference computes no rankings); this backs
the driver-contract ranking queries (ml_qini_curve, q_rfm_segments,
q_decile_lift, ml_gini_concentration).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division for non-negative ints < 2^53: a % b is
    exact, the difference is an exact multiple of b, and IEEE division
    of an exactly-representable quotient is correctly rounded to that
    quotient. Avoids F.expr (no column names here) and floor(double)."""
    return ((a - a % b) / b).cast("bigint")


def with_global_rank(
    df: DataFrame,
    order: Sequence[Column],
    rank_col: str = "gr",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach the exact 1-based global row_number over ``order`` (which
    MUST be a total order — include a unique tie-break) as ``rank_col``,
    computed with range partitioning + per-partition windows + broadcast
    offsets (no unpartitioned window). If ``total_col`` is given, the
    total row count rides along on the same broadcast join for free."""
    spark = df.sparkSession
    p = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # localCheckpoint pins the range exchange to ONE materialized RDD:
    # the counts branch and the rank branch below prune different
    # columns, so Catalyst plans two DIFFERENT exchanges (no reuse) and
    # each would re-sample range boundaries independently — at sf0.1
    # the boundaries diverged and offsets no longer matched pids
    # (duplicate/missing global ranks). With the checkpoint, boundaries
    # and partition indices are structural properties of a single RDD.
    ranged = (
        df.repartitionByRange(p, *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # offsets: P rows, P = shuffle-partition CONFIG (not data). Computed
    # WINDOWLESS — collect the (pid, count) pairs into one sorted array
    # (global agg, partial+final, no WindowExec at all; a lit(0)
    # partitionBy would be folded away by Catalyst's window-partition
    # elimination and re-trigger the no-partition warning) and prefix-sum
    # with a JVM HOF: O(P^2) work on one row, bounded by config.
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    offsets = counts.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__pid"), F.col("__c")))
        ).alias("a")
    ).select(
        F.inline(
            F.expr(
                "transform(a, (e, i) -> struct("
                "e.__pid AS __pid, "
                "aggregate(slice(a, 1, i), 0L, (acc, x) -> acc + x.__c)"
                " AS __off, "
                "aggregate(a, 0L, (acc, x) -> acc + x.__c) AS __tot))"
            )
        )
    )
    w_local = W.partitionBy("__pid").orderBy(*order)
    out = (
        ranged.withColumn("__lr", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(
            rank_col,
            (F.col("__off") + F.col("__lr")).cast("bigint"),
        )
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__tot"))
    return out.drop("__pid", "__lr", "__off", "__tot")


def with_running_sums_dist(
    df: DataFrame,
    order: Sequence[Column],
    value_cols: Sequence[str],
    prefix: str = "c",
    inclusive: bool = True,
    sum_type: str = "bigint",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed running sums of ``value_cols`` over the total order
    ``order`` — the scale-safe replacement for ``sum().over(W.orderBy)``
    (which sorts everything on one task). Same two-level shape as
    with_global_rank: range repartition, per-partition cumsum window
    (partitioned by pid), windowless HOF prefix-sum of the P per-
    partition totals, broadcast back. ``sum_type`` must hold the grand
    total ("bigint" or a decimal like "decimal(38,4)")."""
    spark = df.sparkSession
    p = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    zero = f"CAST(0 AS {sum_type})"
    # single materialized RDD — see with_global_rank for why the two
    # consumer branches must share one set of range boundaries/pids
    ranged = (
        df.repartitionByRange(p, *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    per = ranged.groupBy("__pid").agg(
        *[
            F.sum(c).cast(sum_type).alias(f"__s_{i}")
            for i, c in enumerate(value_cols)
        ]
    )
    offs_fields = ", ".join(
        f"CAST(aggregate(slice(a, 1, i), {zero}, "
        f"(acc, x) -> CAST(acc + x.__s_{i2} AS {sum_type})) "
        f"AS {sum_type}) AS __o_{i2}"
        for i2 in range(len(value_cols))
    )
    offsets = per.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("__pid"),
                    *[F.col(f"__s_{i}") for i in range(len(value_cols))],
                )
            )
        ).alias("a")
    ).select(
        F.inline(
            F.expr(
                "transform(a, (e, i) -> "
                f"struct(e.__pid AS __pid, {offs_fields}))"
            )
        )
    )
    end = W.currentRow if inclusive else -1
    w_local = (
        W.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, end)
    )
    out = ranged.join(F.broadcast(offsets), "__pid")
    for i, c in enumerate(value_cols):
        out = out.withColumn(
            f"{prefix}{c}",
            (
                F.col(f"__o_{i}")
                + F.coalesce(
                    F.sum(c).over(w_local).cast(sum_type),
                    F.expr(zero),
                )
            ).cast(sum_type),
        )
    return out.drop(
        "__pid", *[f"__o_{i}" for i in range(len(value_cols))]
    )


def ranked_rows(
    df: DataFrame,
    sort_cols: Sequence[Column],
    payload: Sequence[str],
    k: int | None = None,
    rank_col: str = "rk",
) -> DataFrame:
    """Windowless global rank for a SMALL (constant- or config-bounded)
    table: collect into one sorted array, optionally keep the first
    ``k``, posexplode back with the 1-based rank. ``sort_cols`` must
    realize the desired order ASCENDING (negate numeric columns for
    descending); ties beyond the listed keys follow the remaining
    struct fields, so include a unique tie-break. For data-scale
    inputs, reduce with ``df.orderBy(...).limit(k)`` (distributed
    TakeOrderedAndProject) BEFORE calling this."""
    keys = [c.alias(f"__k{i}") for i, c in enumerate(sort_cols)]
    arr = df.agg(
        F.sort_array(
            F.collect_list(
                F.struct(*keys, *[F.col(c) for c in payload])
            )
        ).alias("a")
    )
    if k is not None:
        arr = arr.select(F.slice("a", 1, k).alias("a"))
    return arr.select(
        F.posexplode("a").alias("__pos", "__e")
    ).select(
        (F.col("__pos") + 1).cast("int").alias(rank_col),
        *[F.col(f"__e.{c}").alias(c) for c in payload],
    )


def with_running_sums(
    df: DataFrame,
    key: str,
    value_cols: Sequence[str],
    prefix: str = "c",
    totals_prefix: str | None = None,
) -> DataFrame:
    """Cumulative (inclusive) sums of bigint ``value_cols`` ordered by
    ``key`` ascending, for a SMALL (constant- or config-bounded) table —
    e.g. a 10-row decile summary. Windowless: one global agg collects
    the rows into a sorted array and a JVM HOF prefix-sums it (O(k^2)
    on one row), so no WindowExec path is ever taken. ``key`` must be
    unique. If ``totals_prefix`` is given, grand totals ride along."""
    arr = df.agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col(key), *[F.col(c) for c in value_cols])
            )
        ).alias("a")
    )
    passthru = ", ".join(f"e.{c} AS {c}" for c in value_cols)
    cums = ", ".join(
        f"aggregate(slice(a, 1, i + 1), 0L, (acc, x) -> acc + x.{c})"
        f" AS {prefix}{c}"
        for c in value_cols
    )
    tots = (
        ", "
        + ", ".join(
            f"aggregate(a, 0L, (acc, x) -> acc + x.{c})"
            f" AS {totals_prefix}{c}"
            for c in value_cols
        )
        if totals_prefix is not None
        else ""
    )
    return arr.select(
        F.inline(
            F.expr(
                f"transform(a, (e, i) -> struct(e.{key} AS {key}, "
                f"{passthru}, {cums}{tots}))"
            )
        )
    )


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """SQL-standard ntile(n) bucket of global rank ``rank`` among
    ``total`` rows, windowless: first total%n buckets get one extra row.
    Matches Spark's NTile and DuckDB's ntile exactly for any total,
    including total < n (q=0: every row lands in its own bucket via the
    head branch, and the guarded tail branch is never selected)."""
    nn = F.lit(n).cast("bigint")
    q = _idiv(total, nn)
    rmd = (total % nn).cast("bigint")
    head = rmd * (q + F.lit(1))
    return (
        F.when(rank <= head, _idiv(rank - 1, q + F.lit(1)) + 1)
        .otherwise(
            rmd + _idiv(rank - head - 1, F.greatest(q, F.lit(1))) + 1
        )
        .cast("int")
    )
