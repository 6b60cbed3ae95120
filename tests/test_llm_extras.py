"""Adversarial fixtures for the llm_extras operators — edge cases the
generated testdata never produces (zero-padding division guard, zero
vectors, sub-depth prompts, fully-identical / fully-disjoint sources,
dominance tournaments), each checked ENGINE-vs-ORACLE so a cross-engine
divergence cannot hide behind a generated-data sweep."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest

from hadoop_spark_pspd_spark.registry import load_all

REGISTRY = load_all()


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _run_both(name: str, spark, sf_dir: str, tables: tuple[str, ...]):
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
    assert sorted(c.lower() for c in scols) == sorted(
        c.lower() for c in dcols
    )
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


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{path}/documents.parquet")


# ---------------------------------------------------------------- batching


def test_length_batching_zero_pad_guard(spark, tmp_path):
    """A source whose docs all have IDENTICAL token counts pads ZERO in
    both orderings — the savings division must hit the pad_arrival=0
    guard identically in both engines (DuckDB x/0.0 -> NULL vs IEEE inf,
    the round-5 divergence class)."""
    rows = [(i, "a b c", "en", "uniform") for i in range(5)]
    rows += [
        (10, "w", "en", "mixed"),
        (11, "w x y z w x y z", "en", "mixed"),
        (12, "w x", "en", "mixed"),
    ]
    sf = str(tmp_path / "lb")
    _write_docs(spark, sf, rows)
    srows, drows = _run_both(
        "text_length_batching", spark, sf, ("documents",)
    )
    assert srows == drows
    uniform = [r for r in srows if r[-1] == "'uniform'"] or [
        r for r in srows if "'uniform'" in r
    ]
    assert uniform, srows
    # savings column is 0.0 exactly on the zero-pad source
    assert any("0.0" in c for c in uniform[0])


def test_length_batching_sorted_never_worse_here(spark, tmp_path):
    """On a single-batch-many-lengths source, sorted and arrival padding
    agree (same single batch); on a multi-batch source with interleaved
    lengths, sorted padding is strictly smaller."""
    # 64 docs alternating 1-token / 9-token: arrival batches mix both
    # lengths (pad 8 per 1-token doc), sorted batches are homogeneous
    rows = [
        (i, "t " * (9 if i % 2 else 1), "en", "alt") for i in range(64)
    ]
    sf = str(tmp_path / "lb2")
    _write_docs(spark, sf, rows)
    out = {
        r["source"]: r
        for r in REGISTRY["text_length_batching"].fn(spark, sf).collect()
    }
    assert out["alt"]["pad_sorted"] < out["alt"]["pad_arrival"]
    srows, drows = _run_both(
        "text_length_batching", spark, sf, ("documents",)
    )
    assert srows == drows


# ---------------------------------------------------------------- prefix cache


def test_prefix_cache_sub_depth_prompts(spark, tmp_path):
    """Docs shorter than a depth are excluded from that depth's pool
    (not padded, not counted); empty docs appear nowhere. Shared-prefix
    counting is exact on a crafted cohort."""
    rows = [
        (0, "", "en", "s"),                      # 0 tokens: nowhere
        (1, "hello", "en", "s"),                 # 1 token: nowhere (min depth 2)
        (2, "hello world", "en", "s"),           # 2 tokens: depth 2 only
        (3, "hello world foo bar", "en", "s"),   # 4: depths 2, 4
        (4, "hello world foo bar", "en", "s"),   # exact dup of 3
        (5, "hello world zzz qqq a b c d", "en", "s"),  # 8: all depths
    ]
    sf = str(tmp_path / "pc")
    _write_docs(spark, sf, rows)
    got = {
        r["depth"]: r
        for r in REGISTRY["sim_prefix_cache"].fn(spark, sf).collect()
    }
    # depth 2: docs 2,3,4,5 share prefix "hello world" -> 1 prefix, 3 hits
    assert got[2]["n_prompts"] == 4
    assert got[2]["n_prefixes"] == 1
    assert got[2]["n_cached"] == 3
    assert got[2]["tokens_saved"] == 6
    # depth 4: docs 3,4 share; doc 5 distinct -> 2 prefixes, 1 hit
    assert got[4]["n_prompts"] == 3
    assert got[4]["n_prefixes"] == 2
    assert got[4]["max_share"] == 2
    # depth 8: only doc 5 -> no reuse
    assert got[8]["n_prompts"] == 1
    assert got[8]["n_cached"] == 0
    srows, drows = _run_both("sim_prefix_cache", spark, sf, ("documents",))
    assert srows == drows


# ---------------------------------------------------------------- source overlap


def test_source_overlap_identical_and_disjoint(spark, tmp_path):
    """Two sources with the same 4-gram set give jaccard 1.0; a source
    sharing nothing produces NO pair row (absent in both engines)."""
    text = "alpha beta gamma delta epsilon"
    rows = [
        (0, text, "en", "sa"),
        (1, text, "en", "sb"),
        (2, "one two three four five six", "en", "sc"),
        (3, "tiny", "en", "sd"),  # < 4 tokens: no grams at all
    ]
    sf = str(tmp_path / "so")
    _write_docs(spark, sf, rows)
    got = {
        (r["s1"], r["s2"]): r
        for r in REGISTRY["text_source_overlap"].fn(spark, sf).collect()
    }
    assert set(got) == {("sa", "sb")}
    assert got[("sa", "sb")]["jaccard"] == 1.0
    assert got[("sa", "sb")]["shared"] == 2  # 5 tokens -> 2 4-grams
    srows, drows = _run_both(
        "text_source_overlap", spark, sf, ("documents",)
    )
    assert srows == drows


# ---------------------------------------------------------------- JL projection


def test_jl_zero_vector_guard_and_parity(spark, tmp_path):
    """A zero embedding has |q|^2 = 0: the greatest(.., 1) guard must
    fire identically (bucket 0) in numpy and DuckDB; negative and
    non-dyadic float components must quantize identically."""
    import numpy as np

    from hadoop_spark_pspd_spark.operators.llm_extras import _JL_DIN

    rng = np.random.default_rng(7)
    vecs = [
        [0.0] * _JL_DIN,                                   # zero vector
        [(-1) ** k * 0.5 for k in range(_JL_DIN)],          # exact dyadics
        [float(np.float32(0.1 * (k + 1))) for k in range(_JL_DIN)],
        list(rng.standard_normal(_JL_DIN).astype(np.float32).astype(float)),
    ]
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    sf = str(tmp_path / "jl")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")
    got = {
        r["bucket"]: r
        for r in REGISTRY["sim_random_projection_jl"].fn(spark, sf).collect()
    }
    assert 0 in got and got[0]["min_vec"] == 0  # zero vector -> bucket 0
    srows, drows = _run_both(
        "sim_random_projection_jl", spark, sf, ("embeddings",)
    )
    assert srows == drows


# ---------------------------------------------------------------- Bradley-Terry


@pytest.fixture()
def bt_fixture(spark, tmp_path):
    """3-nation dominance tournament: ALPHA's lineitems always out-
    quantity BETA's, BETA's always out-quantity GAMMA's. Includes a
    tied pair (skipped) and a same-nation pair (skipped)."""
    sf = str(tmp_path / "bt")
    spark.createDataFrame(
        [(0, "ALPHA"), (1, "BETA"), (2, "GAMMA")],
        "n_nationkey long, n_name string",
    ).coalesce(1).write.parquet(f"{sf}/nation.parquet")
    spark.createDataFrame(
        [(10, 0), (11, 1), (12, 2), (13, 0)],
        "s_suppkey long, s_nationkey long",
    ).coalesce(1).write.parquet(f"{sf}/supplier.parquet")
    li = []
    for o in range(6):
        li += [
            (o, 1, 10, Decimal("30.00")),  # ALPHA
            (o, 2, 11, Decimal("20.00")),  # BETA
            (o, 3, 12, Decimal("10.00")),  # GAMMA
        ]
    # tie (skipped) and same-nation pair (skipped)
    li += [(100, 1, 10, Decimal("5.00")), (100, 2, 11, Decimal("5.00"))]
    li += [(101, 1, 10, Decimal("9.00")), (101, 2, 13, Decimal("1.00"))]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_linenumber int, l_suppkey long, "
        "l_quantity decimal(12,2)",
    ).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")
    return sf


def test_bradley_terry_dominance_order_and_parity(spark, bt_fixture):
    got = REGISTRY["ml_bradley_terry"].fn(spark, bt_fixture).collect()
    by_rank = sorted(got, key=lambda r: r["rk"])
    assert [r["nation"] for r in by_rank] == ["ALPHA", "BETA", "GAMMA"]
    assert by_rank[0]["strength"] > by_rank[1]["strength"] > by_rank[2][
        "strength"
    ]
    # 18 decisive comparisons: 6 orders x 3 pairs; ties/same-nation skipped
    alpha = by_rank[0]
    assert alpha["wins_q"] > 0
    srows, drows = _run_both(
        "ml_bradley_terry",
        spark,
        bt_fixture,
        ("nation", "supplier", "lineitem"),
    )
    assert srows == drows


def test_bradley_terry_matches_sequential_reference(spark, bt_fixture):
    """The engine's driver-side integer MM must equal an independently
    written reference fold (exact, no tolerance)."""
    from hadoop_spark_pspd_spark.operators.llm_extras import (
        _BT_CQ, _BT_FP, _BT_ITERS, _BT_S0, _BT_SMAX,
    )

    # raw decisive comparisons on the fixture, by construction:
    # per order o in 0..5: A>B, A>G, B>G  -> 6 each; order 101: A>A skipped
    wins = {("ALPHA", "BETA"): 6, ("ALPHA", "GAMMA"): 6, ("BETA", "GAMMA"): 6}
    n_tot = sum(wins.values())
    nodes = ["ALPHA", "BETA", "GAMMA"]
    w_raw = {n: sum(v for (a, _b), v in wins.items() if a == n) for n in nodes}
    nd: dict[tuple[str, str], int] = {}
    for (a, b), v in wins.items():
        nd[(a, b)] = nd.get((a, b), 0) + v
        nd[(b, a)] = nd.get((b, a), 0) + v
    wq = {n: (w_raw[n] * _BT_CQ) // n_tot for n in nodes}
    nq = {k: (v * _BT_CQ) // n_tot for k, v in nd.items()}
    s = {n: _BT_S0 for n in nodes}
    for _ in range(_BT_ITERS):
        t = {
            i: sum(
                (nq[(i, j)] * _BT_FP) // (s[i] + s[j])
                for j in nodes
                if (i, j) in nq
            )
            for i in nodes
        }
        s = {
            i: min(max((wq[i] * _BT_FP) // max(t[i], 1), 1), _BT_SMAX)
            for i in nodes
        }
    got = {
        r["nation"]: r["strength"]
        for r in REGISTRY["ml_bradley_terry"].fn(spark, bt_fixture).collect()
    }
    assert got == s


def test_bradley_terry_empty_when_no_decisive_pairs(spark, tmp_path):
    """All-tied quantities -> zero decisive matches -> empty result with
    the declared schema (and an empty oracle side)."""
    sf = str(tmp_path / "bt0")
    spark.createDataFrame(
        [(0, "ALPHA"), (1, "BETA")], "n_nationkey long, n_name string"
    ).coalesce(1).write.parquet(f"{sf}/nation.parquet")
    spark.createDataFrame(
        [(10, 0), (11, 1)], "s_suppkey long, s_nationkey long"
    ).coalesce(1).write.parquet(f"{sf}/supplier.parquet")
    spark.createDataFrame(
        [
            (0, 1, 10, Decimal("5.00")),
            (0, 2, 11, Decimal("5.00")),
        ],
        "l_orderkey long, l_linenumber int, l_suppkey long, "
        "l_quantity decimal(12,2)",
    ).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")
    df = REGISTRY["ml_bradley_terry"].fn(spark, sf)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "nation", "wins_q", "matches_q", "strength", "rk",
    ]


# ---------------------------------------------------------------- deletion audit


def test_deletion_propagation_orphan_lineitem(spark, tmp_path):
    """A lineitem whose parent order is MISSING must count as kept
    (left-join NULL -> not deleted) identically in both engines; an
    ORPHAN ORDER whose custkey satisfies %97==0 but is absent from
    customer must ALSO be kept (cohort membership, not the bare
    predicate — round-8 ADVICE fix), together with its lineitems; and
    a table with zero rows must hit the n_total=0 division guard."""
    sf = str(tmp_path / "delp")
    spark.createDataFrame(
        [(0, "x"), (97, "y"), (194, "z"), (5, "w")],
        "c_custkey long, c_name string",
    ).coalesce(1).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        # 1003's custkey 291 = 3*97 satisfies the predicate but has NO
        # customer row: an FK-orphan order that must be KEPT
        [(1000, 97), (1001, 5), (1002, 194), (1003, 291)],
        "o_orderkey long, o_custkey long",
    ).coalesce(1).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        # 9999 = orphan lineitem; 1003 = child of the orphan order
        [(1000, 1), (1001, 1), (9999, 1), (1003, 1)],
        "l_orderkey long, l_linenumber int",
    ).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [], "event_id long, user_id long",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = {
        r["tbl"]: r
        for r in REGISTRY["q_deletion_propagation"].fn(spark, sf).collect()
    }
    assert got["customer"]["n_deleted"] == 3  # 0, 97, 194
    assert got["orders"]["n_deleted"] == 2    # custkeys 97, 194; NOT 291
    assert got["orders"]["n_kept"] == 2       # custkey 5 + orphan 291
    assert got["lineitem"]["n_deleted"] == 1  # order 1000; orphans kept
    assert got["lineitem"]["n_kept"] == 3
    assert got["events"]["n_total"] == 0
    assert got["events"]["pct_deleted"] == 0.0  # guarded 0/1
    srows, drows = _run_both(
        "q_deletion_propagation",
        spark,
        sf,
        ("customer", "orders", "lineitem", "events"),
    )
    assert srows == drows


def test_jl_ragged_vectors_excluded(spark, tmp_path):
    """Vectors whose dimension differs from _JL_DIN are excluded
    IDENTICALLY in both engines (numpy would crash on a ragged stack;
    DuckDB's embedding[k] would silently NULL — both now filter)."""
    from hadoop_spark_pspd_spark.operators.llm_extras import _JL_DIN

    rows = [
        (0, [0.5] * _JL_DIN, 0),        # valid
        (1, [0.5] * (_JL_DIN - 3), 0),  # short: excluded
        (2, [0.5] * (_JL_DIN + 2), 0),  # long: excluded
    ]
    sf = str(tmp_path / "jlr")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")
    got = REGISTRY["sim_random_projection_jl"].fn(spark, sf).collect()
    assert sum(r["n_vecs"] for r in got) == 1
    srows, drows = _run_both(
        "sim_random_projection_jl", spark, sf, ("embeddings",)
    )
    assert srows == drows


# ---------------------------------------------------------------- power analysis


def test_power_analysis_saturated_rate_clamp(spark, tmp_path):
    """p1 = 1.0 (every user converts) forces the p2 = least(p1 + 1/64, 1)
    clamp: both variance terms are exactly 0, n_required is exactly 0,
    and powered is true — identically in both engines. A second type
    converts exactly half the users (p1 = 0.5, the variance maximum)."""
    rows = []
    for u in range(8):
        rows.append((len(rows), u, "always"))       # all 8 users
        if u < 4:
            rows.append((len(rows), u, "half"))     # users 0-3 only
    sf = str(tmp_path / "pwr")
    spark.createDataFrame(
        [(i, u, et) for i, u, et in rows],
        "event_id long, user_id long, event_type string",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = {
        r["event_type"]: r
        for r in REGISTRY["ml_power_analysis"].fn(spark, sf).collect()
    }
    assert got["always"]["n_required"] == 0
    assert got["always"]["powered"] is True
    # p1=0.5: v1=0.25, p2=0.5+1/64 -> n_req = ceil(36864*(0.25+p2*(1-p2)))
    p2 = 0.5 + 1.0 / 64.0
    import math

    assert got["half"]["n_required"] == math.ceil(
        36864 * (0.25 + p2 * (1 - p2))
    )
    assert got["half"]["powered"] is False  # only 4 users per arm
    srows, drows = _run_both(
        "ml_power_analysis", spark, sf, ("events",)
    )
    assert srows == drows


# ---------------------------------------------------------------- Holt forecast


def test_holt_forecast_negative_trend_and_gap(spark, tmp_path):
    """A strictly DECLINING series drives the trend state negative —
    the offset-protected integer divisions must match a sequential
    Python reference exactly (Python // floors; the offset keeps every
    operand positive so floor == truncate); a missing day must
    zero-fill through the spine in both engines."""
    from hadoop_spark_pspd_spark.operators.llm_extras import _JL_DIN  # noqa: F401
    from hadoop_spark_pspd_spark.operators.timeseries import (
        _HOLT_FP, _HOLT_OFF,
    )

    # day 0: 100 events, day 1: 60, day 2: MISSING (gap -> 0), day 3: 10
    counts = {0: 100, 1: 60, 3: 10}
    rows = []
    eid = 0
    for day, n in counts.items():
        for i in range(n):
            rows.append((eid, day * 86400 + i, eid % 7, "click"))
            eid += 1
    sf = str(tmp_path / "holt")
    spark.createDataFrame(
        [
            (e, __import__("datetime").datetime.utcfromtimestamp(ts), u, et)
            for e, ts, u, et in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    def div2(v):
        return ((v + _HOLT_OFF) // 2) - _HOLT_OFF // 2

    def div4(v):
        return ((v + _HOLT_OFF) // 4) - _HOLT_OFF // 4

    series = [counts.get(d, 0) for d in range(4)]
    level = series[0] * _HOLT_FP
    trend = 0
    for x in series[1:]:
        lp = div2(x * _HOLT_FP + level + trend)
        trend = div4(lp - level + 3 * trend)
        level = lp
    got = REGISTRY["ts_holt_forecast"].fn(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert trend < 0  # the declining series actually exercised the path
    assert (r["level_q"], r["trend_q"]) == (level, trend)
    assert r["fcst_7"] == level + 7 * trend
    assert r["n_days"] == 4 and r["x_last"] == 10
    srows, drows = _run_both("ts_holt_forecast", spark, sf, ("events",))
    assert srows == drows


# ------------------------------------------------------------- train-mix pipeline


def test_train_mix_budget_boundary_and_contamination(spark, tmp_path):
    """The composed pipeline's three cut points, fixture-pinned:
    a doc STRADDLING the token budget is dropped (cum <= budget, not
    cum - n_tokens < budget) identically in both engines; a corpus doc
    sharing a 4-gram with a bench doc is decontaminated even when its
    mixture key would keep it; bench docs never reach the output."""
    from hadoop_spark_pspd_spark.operators.pipeline import TM_BUDGET

    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        # bench doc (doc_id < 40)
        (0, bench_text, "en", "web"),
        # contaminated corpus doc: contains the bench 4-gram
        (40, "alpha beta gamma delta UNIQUE tail here", "en", "web"),
    ]
    # 300 clean 250-token docs (unique vocab per doc, so no cross-doc
    # bench contamination): the mixture keeps ~half, whose cumulative
    # tokens pass the 30k budget mid-corpus — docs straddling or after
    # the boundary are DROPPED even if a later small doc "would fit"
    for d in range(41, 341):
        rows.append(
            (d, " ".join(f"w{d}_{j}" for j in range(250)), "en", "web")
        )
    sf = str(tmp_path / "tm")
    _write_docs(spark, sf, rows)
    srows, drows = _run_both(
        "pipeline_train_mix", spark, sf, ("documents",)
    )
    assert srows == drows
    # python reference for the kept set: cum runs over ALL mixture
    # survivors in doc_id order (a dropped doc still advances cum)
    import hashlib

    def mix_keep(doc_id):
        return hashlib.md5(str(doc_id).encode()).hexdigest()[:2] < "80"

    kept, cum = [], 0
    for doc_id, text, _, _ in rows[2:]:
        if not mix_keep(doc_id):
            continue
        n = len(text.split())
        cum += n
        if cum <= TM_BUDGET:
            kept.append(doc_id)
    assert 0 < len(kept) < sum(mix_keep(d) for d, *_ in rows[2:]), (
        "fixture must exercise the budget cut"
    )
    # _run_both sorts columns alphabetically:
    # epoch, n_docs, shard, total_bytes, total_tokens -> n_docs is [1]
    total_docs = sum(int(r[1]) for r in srows) if srows else 0
    from hadoop_spark_pspd_spark.operators.pipeline import TM_EPOCHS

    assert total_docs == len(kept) * TM_EPOCHS


def test_holt_winters_negative_state_python_reference(spark, tmp_path):
    """ts_holt_winters on a strictly declining 10-day series: level,
    trend AND the seasonal slots go negative; every offset-protected
    division must match a sequential Python reference bit-for-bit, and
    the engine must hash-match the recursive-CTE oracle."""
    from hadoop_spark_pspd_spark.operators.timeseries import (
        _HOLT_FP, _HOLT_OFF,
    )

    counts = {d: 200 - 19 * d for d in range(10)}  # 200,181,...,29
    rows = []
    eid = 0
    for day, n in counts.items():
        for i in range(n):
            rows.append((eid, day * 86400 + i, eid % 7, "click"))
            eid += 1
    sf = str(tmp_path / "hw")
    spark.createDataFrame(
        [
            (e, __import__("datetime").datetime.utcfromtimestamp(ts), u, et)
            for e, ts, u, et in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")

    def odiv(v, d):
        return ((v + _HOLT_OFF) // d) - _HOLT_OFF // d

    series = [counts[d] for d in range(10)]
    level, trend, season = series[0] * _HOLT_FP, 0, [0] * 7
    for step in range(1, 10):
        x = series[step]
        sprev = season[step % 7]
        lp = odiv(x * _HOLT_FP - sprev + level + trend, 2)
        trend = odiv(lp - level + 3 * trend, 4)
        season[step % 7] = odiv(x * _HOLT_FP - lp + sprev, 2)
        level = lp
    got = REGISTRY["ts_holt_winters"].fn(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert trend < 0 and min(season) < 0  # negative paths exercised
    assert (r["level_q"], r["trend_q"]) == (level, trend)
    assert r["s_checksum"] == sum(season)
    assert r["fcst_1"] == level + trend + season[10 % 7]
    assert r["fcst_7"] == level + 7 * trend + season[(10 + 6) % 7]
    srows, drows = _run_both("ts_holt_winters", spark, sf, ("events",))
    assert srows == drows


def test_bh_fdr_rejects_genuine_effect(spark, tmp_path):
    """ml_bh_fdr on a fixture where ONE type's value depends strongly
    on user parity (the treatment) and two types are pure null: the
    shifted type must be rejected at q = 1/4 and the null types must
    survive; both engines must agree exactly."""
    rows = []
    eid = 0
    for ty, shift in (("boost", 50.0), ("nullA", 0.0), ("nullB", 0.0)):
        for i in range(400):
            user = i % 20
            val = 10.0 + (i % 7) + (shift if user % 2 == 0 else 0.0)
            rows.append((eid, 1000 + i, user, ty, val, "{}"))
            eid += 1
    sf = str(tmp_path / "bh")
    spark.createDataFrame(
        [
            (e, __import__("datetime").datetime.utcfromtimestamp(ts),
             u, ty, v, p)
            for e, ts, u, ty, v, p in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(f"{sf}/events.parquet")
    got = {
        r["event_type"]: (r["p_num"], r["rejected"])
        for r in REGISTRY["ml_bh_fdr"].fn(spark, sf).collect()
    }
    assert got["boost"][0] == 1  # no permutation beats the true split
    assert got["boost"][1] is True
    assert got["nullA"][1] is False and got["nullB"][1] is False
    srows, drows = _run_both("ml_bh_fdr", spark, sf, ("events",))
    assert srows == drows
