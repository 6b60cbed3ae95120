"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (WordCount over documents, the reference's
                headline workload) at sf0.001.
queries()     — every implemented operator from SURVEY.md §2, from the
                engine registry.
oracle_sql()  — matching DuckDB SQL per query: ALL registered queries carry
                one (run tools/query_inventory.py for the current count)
                (iterative/approximate ops included, via fixed-point
                arithmetic + unrolled-CTE replays — since round 5 even
                the PCA pair, whose deterministic power-iteration fit
                replays as MATERIALIZED CTEs).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from hadoop_spark_pspd_spark.registry import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grouped word count over documents.text (reference A1)."""
    reg = load_all()
    return reg["wc_words"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in load_all().items() if q.oracle is not None
    }
