"""The driver-gate mirror: every oracled query must match DuckDB exactly.

This is SURVEY §5.2-1 — operator-level correctness vs the DuckDB oracle,
with the comparison the driver uses (row count + sorted column names +
order-insensitive values), tightened to exact repr equality (our
determinism conventions make floats bit-identical; any drift here would
likely fail the driver's value hash).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest

from hadoop_spark_pspd_spark.catalog import TABLES
from hadoop_spark_pspd_spark.registry import load_all

from conftest import SF_SMOKE

REGISTRY = load_all()
ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _assert_scalar_only(df, name):
    """The driver's comparator canonicalizes with a pandas sort — array/
    map/struct cells are unhashable there (CORRECTNESS_r03 TypeError on
    sim_pca_*). Every registered query must emit scalar columns only."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    nonscalar = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nonscalar, (
        f"{name} emits non-scalar output column(s) the driver's "
        f"comparator cannot canonicalize: {nonscalar}"
    )


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_exact(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_SMOKE)
    _assert_scalar_only(sdf, name)
    rel = duck.sql(q.oracle)
    scols, dcols = sdf.columns, rel.columns
    assert sorted(c.lower() for c in scols) == sorted(
        c.lower() for c in dcols
    ), f"column names differ: {scols} vs {dcols}"
    sidx = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
    srows = sorted(tuple(repr(_norm(r[i])) for i in sidx) for r in sdf.collect())
    drows = sorted(tuple(repr(_norm(r[i])) for i in didx) for r in rel.fetchall())
    assert len(srows) == len(drows), f"row count {len(srows)} vs {len(drows)}"
    mismatches = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, f"{len(mismatches)} mismatched rows, first: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    _assert_scalar_only(df, name)
    assert df.count() >= 0  # runs to completion with a stable schema
    assert df.columns
