"""Physical-plan inspection helpers.

Used by tests to assert the plans we designed for actually materialize:
filters reach the parquet scan, small dims broadcast, aggregates split
partial/final (the reference's combiner analog), codegen spans exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(plan: str) -> int:
    """Shuffle Exchange nodes in a formatted plan (broadcast exchanges
    excluded — they are `BroadcastExchange`)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine present (HashAggregate partial before the exchange)."""
    plan = formatted_plan(df)
    return "HashAggregate" in plan and "Exchange" in plan


def has_wholestage_codegen(df: DataFrame) -> bool:
    """Codegen ids only appear in the formatted plan once AQE finalizes —
    execute the plan (test-scale data), then inspect the final plan."""
    df.collect()
    return "codegen id" in formatted_plan(df)
