"""Skyline (Pareto frontier) via the distributed local-skyline merge.

The skyline of a set under (maximize spend, maximize n_orders): rows no
other row dominates (>= in both dimensions, > in at least one). The
scale-safe plan is the classic two-level algorithm: each partition computes
its LOCAL skyline (the global skyline is provably a subset of the union of
local skylines — a dominating row within the partition would also dominate
globally), then the small union is reduced once more. Shuffle volume is
O(sum of local skyline sizes) — for d=2 typically O(log n) per partition —
never the full table.

Both levels run the same sort-scan filter (sort by spend desc, keep rows
beating the running n_orders max), an O(n log n) exact method for d=2.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register
from .relational import dsum

_SCHEMA = "o_custkey bigint, n_orders bigint, spend double"


def _local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    dfs = list(batches)
    if not dfs:
        return
    pdf = pd.concat(dfs, ignore_index=True)
    if pdf.empty:
        yield pdf
        return
    pdf = pdf.sort_values(
        ["spend", "n_orders"], ascending=[False, False], kind="mergesort"
    )
    keep_idx = []
    best_n = None  # max n_orders among strictly-higher-spend rows
    for spend, grp in pdf.groupby("spend", sort=False):
        gmax = grp["n_orders"].max()
        # same-spend rows with smaller n are dominated inside the group;
        # the group max survives only if it beats every higher-spend row
        if best_n is None or gmax > best_n:
            keep_idx.extend(grp.index[grp["n_orders"] == gmax].tolist())
            best_n = gmax
        else:
            best_n = max(best_n, gmax)
    yield pdf.loc[keep_idx]


@register(
    "q_pareto_customers",
    oracle="""
        WITH base AS (
            SELECT o_custkey,
                   count(*) AS n_orders,
                   CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                             AS VARCHAR) AS DOUBLE) AS spend
            FROM orders
            GROUP BY o_custkey
        )
        SELECT o_custkey, n_orders, spend
        FROM base b
        WHERE NOT EXISTS (
            SELECT 1 FROM base o
            WHERE o.spend >= b.spend AND o.n_orders >= b.n_orders
                  AND (o.spend > b.spend OR o.n_orders > b.n_orders)
        )
    """,
    doc="Pareto-optimal customers under (maximize total spend, maximize "
        "order count): partition-local skylines merged and reduced once — "
        "never the quadratic NOT-EXISTS self-join the oracle runs. Spend "
        "is the exact-decimal sum cast to double, so both engines compare "
        "identical values.",
    tags=("pareto",),
)
def q_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    base = t.orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("spend"),
    )
    local = base.mapInPandas(_local_skyline, schema=_SCHEMA)
    # the union of local skylines is tiny: one final single-partition pass
    return local.repartition(1).mapInPandas(_local_skyline, schema=_SCHEMA)
