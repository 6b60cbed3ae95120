"""Query registry: the single source of truth for the driver contract.

Every implemented operator registers a named query function
``fn(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an equivalent
ANSI-SQL oracle string DuckDB runs on the same parquet tables.

Cross-engine determinism conventions (this is why the oracle hash-matches):
  * money/quantity aggregates go through CAST(... AS DECIMAL(18,4)) in BOTH
    engines — decimal addition is exact, so summation order can't drift the
    result the way double summation does;
  * ratios/averages are computed as exact-decimal-sum cast to DOUBLE divided
    by an integer count — one deterministic double op;
  * similarity scores (sqrt involved, decimal impossible) are rounded to 6
    decimals on values of magnitude ~1 (ulp noise ~1e-14 << 5e-7 boundary);
  * FLOAT columns entering decimal aggregation hop through the shortest
    string repr (Spark .cast("string").cast("decimal"), DuckDB
    CAST(CAST(x AS VARCHAR) AS DECIMAL)) — the engines' direct
    float->decimal casts disagree, but both print and parse the same
    shortest-roundtrip decimal (proved over every sf0.1 embedding value);
  * every top-k ORDER BY carries a unique tie-break column;
  * all computed columns are aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class EngineQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, EngineQuery] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = EngineQuery(
            name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""),
            bench=bench, tags=tags,
        )
        return fn

    return deco


def load_all() -> dict[str, EngineQuery]:
    """Import every operator module (side effect: registration)."""
    from .operators import (  # noqa: F401
        advanced,
        behavioral,
        bpe,
        bucketing,
        cdc,
        clustering,
        curation_extra,
        dedup,
        embeddings_linalg,
        functions_coverage,
        graph,
        incremental,
        inference,
        kafka_pipeline,
        llm_extras,
        media_decode,
        ml_data,
        multimodal,
        pareto,
        pipeline,
        profiling,
        relational,
        similarity,
        sketches,
        sources_roundtrip,
        sql_surface,
        stats,
        streaming_enrich,
        streaming_queries,
        strings_setops,
        text_analysis,
        text_curation,
        text_pipeline,
        timeseries,
        tpch_like,
        tpch_like2,
        windows_extra,
        wordcount,
    )

    return REGISTRY
