"""Driver-contract smoke: what the driver's t1 check does, pinned locally.

entry(spark) must run and return a stable-schema DataFrame; queries() and
oracle_sql() must be consistent (every oracle belongs to a query, every
oracle is non-empty SQL text ending in a SELECT-producing statement).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod


def test_entry_runs_and_has_stable_schema(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    # flagship is the wordcount: (word, cnt)
    assert [f.name for f in df.schema.fields] == ["word", "cnt"]
    df2 = entry_mod.entry(spark)
    assert df2.schema == df.schema  # re-entry is stable


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 128
    assert all(callable(f) for f in qs.values())
    for name, sql in osql.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_every_query_importable_without_spark_session():
    # load_all() must not require a live session (the driver imports the
    # module before building its own session)
    from hadoop_spark_pspd_spark.registry import load_all

    reg = load_all()
    assert len(reg) == len(entry_mod.queries())
