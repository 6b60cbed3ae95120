"""Adversarial/property coverage for the round-6 ML/similarity ops.

* sim_edcg_eval: a query whose label has NO other corpus member has
  ideal EDCG 0 — the nedcg zero-guard must emit 0.0 in BOTH engines
  (generated testdata has balanced labels, so only a fixture exercises
  this).
* ml_negative_sampling: sampled negatives must be disjoint from the
  customer's positives, exactly k per customer when the pool allows,
  and bit-stable across invocations (md5-derandomized).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import numpy as np
import pytest

from hadoop_spark_pspd_spark.registry import load_all

REGISTRY = load_all()

_DIM = 64


def _vec(seed: int) -> list[float]:
    rng = np.random.RandomState(seed)
    return [float(np.float32(x)) for x in rng.randn(_DIM)]


@pytest.fixture(scope="module")
def singleton_label_sf(tmp_path_factory, spark):
    """12-vector corpus; vec 3 carries label 99 with no other member."""
    d = tmp_path_factory.mktemp("singleton_label_sf")
    rows = []
    for i in range(12):
        label = 99 if i == 3 else i % 2
        rows.append((i, _vec(i), label))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _run_both(name, spark, sf_dir, tables):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    rel = con.sql(q.oracle)
    scols, dcols = sdf.columns, rel.columns
    sidx = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
    srows = sorted(
        tuple(repr(_norm(r[i])) for i in sidx) for r in sdf.collect()
    )
    drows = sorted(
        tuple(repr(_norm(r[i])) for i in didx) for r in rel.fetchall()
    )
    con.close()
    return srows, drows


def test_edcg_singleton_label_guard_parity(spark, singleton_label_sf):
    srows, drows = _run_both(
        "sim_edcg_eval", spark, singleton_label_sf, ("embeddings",)
    )
    assert srows == drows, (
        f"first diff: "
        f"{next(((a, b) for a, b in zip(srows, drows) if a != b), None)}"
    )
    out = {
        r["query_id"]: r
        for r in REGISTRY["sim_edcg_eval"]
        .fn(spark, singleton_label_sf)
        .collect()
    }
    assert len(out) == 10
    # query 3's label is a singleton: nothing relevant exists
    assert out[3]["n_rel_retrieved"] == 0
    assert out[3]["iedcg"] == 0.0
    assert out[3]["nedcg"] == 0.0  # guarded, never NULL/NaN
    # every other query has >= 5 same-label members (12-vector corpus,
    # two labels) -> ideal saturates at the full prefix for its m
    for qid, r in out.items():
        if qid != 3:
            assert r["iedcg"] > 0
            assert 0.0 <= r["nedcg"] <= 1.0


def test_negative_sampling_invariants(spark):
    sf = "/root/testdata/sf0.001"
    df = REGISTRY["ml_negative_sampling"].fn(spark, sf)
    rows = df.collect()
    assert rows, "sampler returned nothing"
    # exactly k ranks per customer, contiguous from 1
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r["cust"], []).append(r["neg_rank"])
    for cust, ranks in by_cust.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) == 4, f"cust {cust} got {len(ranks)} negatives"
    # negatives are disjoint from positives
    from pyspark.sql import functions as F

    from hadoop_spark_pspd_spark.catalog import Tables

    t = Tables(spark, sf)
    pos = (
        t.orders.join(
            t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey
        )
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
        )
        .distinct()
    )
    overlap = df.join(pos, ["cust", "part"]).count()
    assert overlap == 0
    # md5-derandomized: a second invocation is bit-identical
    again = sorted(
        (r["cust"], r["neg_rank"], r["part"])
        for r in REGISTRY["ml_negative_sampling"].fn(spark, sf).collect()
    )
    assert again == sorted(
        (r["cust"], r["neg_rank"], r["part"]) for r in rows
    )


def test_skyline_matches_bruteforce_dominance(spark):
    """The two-stage window skyline must equal the O(n^2) NOT EXISTS
    definition (minimize n_orders, maximize total_qty, one strict)."""
    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["custkey"], r["n_orders"], r["total_qty"])
        for r in REGISTRY["q_skyline_customers"].fn(spark, sf).collect()
    )
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = sorted(
        tuple(r)
        for r in con.sql("""
            WITH metrics AS (
                SELECT o.o_custkey AS custkey,
                       CAST(count(DISTINCT o.o_orderkey) AS BIGINT)
                           AS n_orders,
                       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                           AS total_qty
                FROM orders o JOIN lineitem l
                  ON l.l_orderkey = o.o_orderkey
                GROUP BY o.o_custkey
            )
            SELECT custkey, n_orders, total_qty FROM metrics m
            WHERE NOT EXISTS (
                SELECT 1 FROM metrics d
                WHERE d.n_orders <= m.n_orders
                  AND d.total_qty >= m.total_qty
                  AND (d.n_orders < m.n_orders
                       OR d.total_qty > m.total_qty)
            )
        """).fetchall()
    )
    con.close()
    assert got == want


@pytest.fixture(scope="module")
def auc_fixture_sf(tmp_path_factory, spark):
    """Scores engineered so floor(e1*16) gives buckets [1,1,2,3] with
    labels [even, odd, even, odd] -> hand-computed AUC 0.625 (ties
    exercise the midrank path), plus a second corpus variant check."""
    d = tmp_path_factory.mktemp("auc_fixture_sf")
    # e1 values: bucket = floor(e1*16): 0.07->1, 0.09->1, 0.14->2, 0.2->3
    rows = [
        (0, [0.07] + [0.0] * 63, 0),   # even label -> negative
        (1, [0.09] + [0.0] * 63, 1),   # odd  label -> positive
        (2, [0.14] + [0.0] * 63, 2),   # negative
        (3, [0.20] + [0.0] * 63, 3),   # positive
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def single_class_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("single_class_sf")
    rows = [(i, [0.1 * i] + [0.0] * 63, 2 * i) for i in range(4)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_auc_known_answer_with_midranks(spark, auc_fixture_sf):
    srows, drows = _run_both(
        "ml_auc_exact", spark, auc_fixture_sf, ("embeddings",)
    )
    assert srows == drows
    row = REGISTRY["ml_auc_exact"].fn(spark, auc_fixture_sf).collect()[0]
    # midranks: tied bucket 1 -> 1.5 each; positives at 1.5 and 4
    # U = (1.5 + 4) - 2*3/2 = 2.5 ; AUC = 2.5 / (2*2) = 0.625
    assert row["n_pos"] == 2 and row["n_neg"] == 2
    assert row["u2"] == 5  # 2U
    assert row["auc"] == 0.625


def test_auc_single_class_guard(spark, single_class_sf):
    srows, drows = _run_both(
        "ml_auc_exact", spark, single_class_sf, ("embeddings",)
    )
    assert srows == drows
    row = REGISTRY["ml_auc_exact"].fn(spark, single_class_sf).collect()[0]
    assert row["n_pos"] == 0
    assert row["auc"] == 0.0  # guarded, not NULL/NaN


def test_spearman_perfect_monotone_is_exactly_one(spark, tmp_path):
    """x and y perfectly rank-aligned (with ties) -> spearman == 1.0
    exactly: the decimal moment products make va == vb == num."""
    d = tmp_path / "sp_sf"
    d.mkdir()
    # customers 1..6, orders shaped so n_orders and total_qty are
    # co-monotone with a tie pair: (1,10) (1,10) (2,20) (2,20) (3,30) (4,40)
    orders, lineitem, ok = [], [], 0
    shapes = [(1, 10), (1, 10), (2, 20), (2, 20), (3, 30), (4, 40)]
    for cust, (n_ord, qty) in enumerate(shapes, start=1):
        per_order = qty // n_ord
        for j in range(n_ord):
            ok += 1
            orders.append((ok, cust, "O", 1.0, None, "1-URGENT"))
            lineitem.append((ok, 1, 1, 1, float(per_order), 1.0, 0.0,
                             0.0, "N", "O", None))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        lineitem,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    srows, drows = _run_both(
        "ml_spearman_corr", spark, str(d), ("orders", "lineitem")
    )
    assert srows == drows
    row = REGISTRY["ml_spearman_corr"].fn(spark, str(d)).collect()[0]
    assert row["n"] == 6
    assert row["va"] == row["vb"] == row["num"]
    assert row["spearman"] == 1.0


# ------------------------------------------------------------- stratified IPW


def test_ipw_degenerate_strata_null_guard(spark, tmp_path):
    """All-treated and all-control strata must emit NULL ate_s under the
    identical CASE guard in both engines (never NaN/inf — the round-5
    x/0.0 divergence class); a mixed stratum computes the exact
    two-division effect, and a non-dyadic balance (123.45) must survive
    the shortest-string double->decimal quantization identically."""
    rows = [
        # stratum ALLT: every custkey even -> all treated
        (2, "a", 0, 123.45, "ALLT"),
        (4, "b", 0, -7.25, "ALLT"),
        # stratum ALLC: every custkey odd -> all control
        (1, "c", 0, 50.00, "ALLC"),
        (3, "d", 0, 0.0, "ALLC"),
        # stratum MIX: one of each
        (6, "e", 0, 100.10, "MIX"),
        (7, "f", 0, 0.10, "MIX"),
    ]
    sf = str(tmp_path / "ipw")
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(f"{sf}/customer.parquet")
    got = {
        r["stratum"]: r
        for r in REGISTRY["ml_ipw_stratified"].fn(spark, sf).collect()
    }
    assert got["ALLT"]["ate_s"] is None and got["ALLT"]["propensity"] == 1.0
    assert got["ALLC"]["ate_s"] is None and got["ALLC"]["propensity"] == 0.0
    assert got["MIX"]["ate_s"] == 100.10 - 0.10
    assert got["ALLT"]["y1_sum_q"] == 1234500 + (-72500)
    srows, drows = _run_both(
        "ml_ipw_stratified", spark, sf, ("customer",)
    )
    assert srows == drows
