"""Unit tests for the distributed ranking kernel (functions/ranking.py)
plus the round-7 adversarial fixtures:

* with_global_rank / ntile_from_rank / with_running_sums[_dist] /
  ranked_rows against plain Python references on multi-partition data —
  these helpers replace every unpartitioned window in the repo, so they
  carry the correctness of all former global-window queries;
* extreme leading-key skew at 10x replication (round-7 verdict item 4):
  range-exchange partition balance + tie spreading + exact ranks when
  95% of rows share one leading key value;
* ml_group_sequential EMPTY-ARM fixture (all user_ids one parity): the
  per-arm rate divisions must be zero-guarded identically in both
  engines (ADVICE r6 — Spark NaN vs DuckDB NULL on x/0.0);
* min_label_components stall guard: a node set that cannot contract
  below the single-task cap must raise, not coalesce(1) unbounded.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.functions.ranking import (
    ntile_from_rank,
    ranked_rows,
    with_global_rank,
    with_running_sums,
    with_running_sums_dist,
)
from hadoop_spark_pspd_spark.registry import load_all

REGISTRY = load_all()


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


# ---------------------------------------------------------------------------
# with_global_rank
# ---------------------------------------------------------------------------


def test_global_rank_matches_total_order(spark):
    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = with_global_rank(
        df,
        [F.desc("v"), F.asc("id")],
        rank_col="gr",
        total_col="nt",
        num_partitions=7,
    ).collect()
    assert len(out) == 500
    assert all(r["nt"] == 500 for r in out)
    expect = sorted(rows, key=lambda r: (-r[1], r[0]))
    got = sorted(out, key=lambda r: r["gr"])
    assert [r["gr"] for r in got] == list(range(1, 501))
    assert [(r["id"], r["v"]) for r in got] == expect


def test_global_rank_single_and_empty(spark):
    one = spark.createDataFrame([(1, 2)], "id long, v long")
    r = with_global_rank(one, [F.asc("v"), F.asc("id")], "gr").collect()
    assert [(x["id"], x["gr"]) for x in r] == [(1, 1)]
    empty = spark.createDataFrame([], "id long, v long")
    assert (
        with_global_rank(empty, [F.asc("v")], "gr").count() == 0
    )


# ---------------------------------------------------------------------------
# ntile_from_rank
# ---------------------------------------------------------------------------


def _ntile_ref(r: int, total: int, n: int) -> int:
    q, rmd = divmod(total, n)
    head = rmd * (q + 1)
    if r <= head:
        return (r - 1) // (q + 1) + 1
    return rmd + (r - head - 1) // max(q, 1) + 1


@pytest.mark.parametrize("total,n", [(7, 10), (10, 10), (23, 10), (40, 3), (1, 5)])
def test_ntile_from_rank_matches_sql_standard(spark, total, n):
    # reference: Spark's own ntile over the same total order
    from pyspark.sql.window import Window as W

    df = spark.createDataFrame([(i,) for i in range(1, total + 1)], "r long")
    ref = {
        row["r"]: row["t"]
        for row in df.select(
            "r", F.ntile(n).over(W.partitionBy(F.lit(0)).orderBy("r")).alias("t")
        ).collect()
    }
    got = {
        row["r"]: row["t"]
        for row in df.select(
            "r",
            ntile_from_rank(F.col("r"), F.lit(total).cast("bigint"), n).alias("t"),
        ).collect()
    }
    for r in range(1, total + 1):
        assert got[r] == _ntile_ref(r, total, n)
        # Spark's NTile may disagree with nothing — double-pin vs engine
        assert got[r] == ref[r], (r, total, n)


# ---------------------------------------------------------------------------
# skew stress (round-7 verdict item 4)
# ---------------------------------------------------------------------------


def test_global_rank_under_extreme_leading_key_skew(spark):
    """Leading sort key 95% one constant value at 10x replication
    (RFM `frequency` is nearly constant at real scale). The kernel
    range-repartitions on the FULL order including the unique
    tie-break, so the constant-key mass must be SPLIT across range
    boundaries — prove the per-partition balance AND exact rank
    correctness rather than assuming the sampler handles it."""
    base = 2_000
    replicas = 10
    n = base * replicas
    p = 16
    rows = [
        # 95% of rows share freq=1; ids stay unique across replicas
        (rep * base + i, 1 if i % 20 != 0 else 2 + (i % 7))
        for rep in range(replicas)
        for i in range(base)
    ]
    df = spark.createDataFrame(rows, "id long, freq long").repartition(8)
    order = [F.desc("freq"), F.asc("id")]

    # (a) balance of the kernel's own range exchange: no partition may
    # hold more than 3x the ideal share, and the skewed key must span
    # several partitions (ties split by the id tie-break)
    ranged = df.repartitionByRange(p, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    sizes = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    assert sum(sizes.values()) == n
    ideal = n / p
    assert max(sizes.values()) <= 3 * ideal, sizes
    skew_parts = {
        r["__pid"]
        for r in ranged.filter(F.col("freq") == 1)
        .select("__pid")
        .distinct()
        .collect()
    }
    assert len(skew_parts) >= p // 2, (
        f"constant leading key landed on only {len(skew_parts)} of {p} "
        "partitions — tie-break is not spreading ties across ranges"
    )

    # (b) end-to-end rank exactness through the public kernel
    out = with_global_rank(
        df, order, rank_col="gr", total_col="nt", num_partitions=p
    ).collect()
    assert len(out) == n
    assert all(r["nt"] == n for r in out)
    got = sorted(out, key=lambda r: r["gr"])
    assert [r["gr"] for r in got] == list(range(1, n + 1))
    expect_ids = [
        i for i, _ in sorted(rows, key=lambda r: (-r[1], r[0]))
    ]
    assert [r["id"] for r in got] == expect_ids


# ---------------------------------------------------------------------------
# running sums
# ---------------------------------------------------------------------------


def test_running_sums_dist_inclusive_exclusive(spark):
    rows = [(k, k % 5 + 1) for k in range(200)]
    df = spark.createDataFrame(rows, "k long, c long")
    inc = {
        r["k"]: r["cum_c"]
        for r in with_running_sums_dist(
            df, [F.col("k").asc()], ["c"], prefix="cum_", num_partitions=6
        ).collect()
    }
    exc = {
        r["k"]: r["pre_c"]
        for r in with_running_sums_dist(
            df,
            [F.col("k").asc()],
            ["c"],
            prefix="pre_",
            inclusive=False,
            num_partitions=6,
        ).collect()
    }
    run = 0
    for k, c in sorted(rows):
        assert exc[k] == run
        run += c
        assert inc[k] == run


def test_running_sums_dist_decimal(spark):
    rows = [(k, Decimal(f"{k}.25")) for k in range(50)]
    df = spark.createDataFrame(rows, "k long, m decimal(18,4)")
    out = {
        r["k"]: r["cm"]
        for r in with_running_sums_dist(
            df,
            [F.col("k").asc()],
            ["m"],
            prefix="c",
            sum_type="decimal(38,4)",
            num_partitions=4,
        ).collect()
    }
    run = Decimal(0)
    for k, m in sorted(rows):
        run += m
        assert out[k] == run


def test_running_sums_tiny_with_totals(spark):
    df = spark.createDataFrame(
        [(1, 10), (3, 30), (2, 20)], "b long, n long"
    )
    out = sorted(
        with_running_sums(
            df, "b", ["n"], prefix="cum_", totals_prefix="tot_"
        ).collect(),
        key=lambda r: r["b"],
    )
    assert [(r["b"], r["n"], r["cum_n"], r["tot_n"]) for r in out] == [
        (1, 10, 10, 60),
        (2, 20, 30, 60),
        (3, 30, 60, 60),
    ]


# ---------------------------------------------------------------------------
# ranked_rows
# ---------------------------------------------------------------------------


def test_ranked_rows_desc_via_negation_and_slice(spark):
    rows = [(i, float((i * 13) % 7)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, s double")
    out = ranked_rows(
        df, [-F.col("s"), F.col("id")], ["id", "s"], k=5, rank_col="rk"
    ).collect()
    expect = sorted(rows, key=lambda r: (-r[1], r[0]))[:5]
    got = sorted(out, key=lambda r: r["rk"])
    assert [(r["id"], r["s"]) for r in got] == expect
    assert [r["rk"] for r in got] == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# ml_group_sequential empty-arm fixture (ADVICE r6)
# ---------------------------------------------------------------------------

_EPOCH = dt.datetime(2024, 3, 4, 0, 0, 0)


@pytest.fixture(scope="module")
def empty_arm_sf(tmp_path_factory, spark):
    """events where EVERY user_id is even -> arm 1 (odd parity) is empty
    at every look; week 1 additionally has all-purchase rows so the
    pooled rate is 1 and se == 0 (both degenerate guards exercised)."""
    rows = []
    eid = 0
    for week in range(4):
        n = 6 + week
        for k in range(n):
            etype = (
                "purchase"
                if (week == 0 or (eid % 3 == 0))
                else "click"
            )
            rows.append(
                (
                    eid,
                    _EPOCH + dt.timedelta(days=7 * week, hours=k),
                    (eid * 2) % 10,  # always even -> arm 0 only
                    etype,
                    1.0,
                    "{}",
                )
            )
            eid += 1
    d = tmp_path_factory.mktemp("empty_arm_sf")
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_group_sequential_empty_arm_parity(spark, empty_arm_sf):
    q = REGISTRY["ml_group_sequential"]
    sdf = q.fn(spark, empty_arm_sf)
    srows = sdf.collect()
    # no NaN/Infinity anywhere (the Spark-side symptom of an unguarded
    # x/0.0) and all four looks present
    assert len(srows) == 4
    for r in srows:
        assert math.isfinite(r["z"]), r
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM '{empty_arm_sf}/events.parquet/*.parquet'"
    )
    rel = con.sql(q.oracle)
    scols, dcols = sdf.columns, rel.columns
    sidx = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
    got = sorted(
        tuple(repr(_norm(r[i])) for i in sidx) for r in srows
    )
    want = sorted(
        tuple(repr(_norm(r[i])) for i in didx) for r in rel.fetchall()
    )
    con.close()
    assert got == want


# ---------------------------------------------------------------------------
# min_label_components stall guard (ADVICE r6)
# ---------------------------------------------------------------------------


def test_cc_stall_falls_back_to_star_contraction(spark, monkeypatch):
    import hadoop_spark_pspd_spark.functions.graph as g

    monkeypatch.setattr(g, "_LOCAL_CC_EDGE_CAP", 2)
    # a perfect matching: contraction emits one row per NODE, so the
    # row set GROWS from 3 edges to 6 stars and can never fit the cap —
    # the guard must route to the fully distributed star-contraction
    # algorithm instead of coalesce(1)ing an unbounded set, and the
    # result must stay exact
    edges = spark.createDataFrame(
        [(0, 1), (2, 3), (4, 5)], "u long, v long"
    )
    out = {
        r["node"]: r["label"]
        for r in g.min_label_components(edges).collect()
    }
    assert out == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4}


def test_cc_small_graph_still_exact(spark):
    import hadoop_spark_pspd_spark.functions.graph as g

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "u long, v long"
    )
    out = {
        r["node"]: r["label"] for r in g.min_label_components(edges).collect()
    }
    assert out == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}
