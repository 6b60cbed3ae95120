"""Adversarial-data oracle parity for the round-8 session-2 operators —
degenerate shapes the generated testdata never produces (the round-5
rule: every data-derived guard gets a fixture that exercises it).

* text_gopher_rules: a ZERO-TOKEN doc (whitespace only), a '#'-heavy
  doc and an ellipsis-heavy doc — the n_words = 0 branches and the
  symbol-ratio rule never fire on the generated corpus (no '#'/'...').
* text_blocklist_hits: 'value value value' contains the blocklist
  phrase 'value value' ONCE under non-overlapping replace semantics —
  pins the left-to-right scan parity between engines.
* text_winnowing: a doc whose 8-byte gram repeats INSIDE one 4-gram
  window — the rightmost-min tie rule must pick the later position in
  both engines.
* ml_mmd_drift: all vec_ids share one parity — an EMPTY cohort zeroes
  m or n, and the guarded divisions must agree (never NULL vs inf).
* q_weighted_median: a group whose total weight is exactly crossed at
  a boundary value, and a single-row group.
* sketch_hll_registers: a tiny key space leaves registers EMPTY —
  v_empty > 0 and the m_j = 0 slots must contribute 2^0 terms.
* ts_matrix_profile: a CONSTANT hourly series zeroes every distance —
  nn_j must tie-break to the smallest j; a series shorter than
  window + exclusion emits nothing.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from hadoop_spark_pspd_spark.registry import load_all

REGISTRY = load_all()

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


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
    assert sorted(c.lower() for c in scols) == sorted(
        c.lower() for c in dcols
    )
    sidx = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
    srows = sorted(
        tuple(repr(r[i]) for i in sidx) for r in sdf.collect()
    )
    drows = sorted(
        tuple(repr(r[i]) for i in didx) for r in rel.fetchall()
    )
    con.close()
    return srows, drows


@pytest.fixture(scope="module")
def text_fixture_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("r8s2_text_sf")
    docs = [
        (0, "   \t  ", "en", "s0", 6),  # zero tokens
        (1, "ok # ## ### the a to of and words here now", "en", "s0", 42),
        (2, "wait... well... hmm... the a to of and fine", "en", "s0", 43),
        (3, "the a to of and that have with normal words", "en", "s0", 44),
        (4, "value value value", "en", "s0", 17),  # overlap pin
        # repeated 8-byte gram inside one window: 'abcdefgh' at byte
        # positions 1 and 5 (text 'abcdabcdefghefgh...' puts identical
        # grams close); simplest: 16 identical bytes -> every gram in
        # the first window is identical -> rightmost must win
        (5, "aaaaaaaaaaaaaaaaaaaaaaaa the a of", "en", "s0", 33),
    ]
    spark.createDataFrame(docs, _DOC_SCHEMA).coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_gopher_rules_degenerate_docs_parity(spark, text_fixture_sf):
    srows, drows = _run_both(
        "text_gopher_rules", spark, text_fixture_sf, ("documents",)
    )
    assert srows == drows
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["text_gopher_rules"].fn(
            spark, text_fixture_sf
        ).collect()
    }
    assert rows[0]["n_words"] == 0 and rows[0]["keep"] is False
    assert rows[1]["n_symbols"] == 6 and rows[1]["r_symbols"] is False
    assert rows[2]["n_symbols"] == 3 and rows[2]["r_symbols"] is False
    assert rows[3]["keep"] is True


def test_blocklist_nonoverlap_parity(spark, text_fixture_sf):
    srows, drows = _run_both(
        "text_blocklist_hits", spark, text_fixture_sf, ("documents",)
    )
    assert srows == drows
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["text_blocklist_hits"].fn(
            spark, text_fixture_sf
        ).collect()
    }
    # 'value value value' holds ONE non-overlapping 'value value'
    assert rows[4]["hits_4"] == 1 and rows[4]["keep"] is False


def test_winnowing_tie_breaks_rightmost(spark, text_fixture_sf):
    srows, drows = _run_both(
        "text_winnowing", spark, text_fixture_sf, ("documents",)
    )
    assert srows == drows
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["text_winnowing"].fn(
            spark, text_fixture_sf
        ).collect()
    }
    # doc 0 is 6 bytes (< 11) -> excluded entirely
    assert 0 not in rows
    # doc 5 starts with 24 'a's: the first windows see identical gram
    # hashes; distinct fingerprints must stay small because the
    # rightmost-tie rule re-selects the SAME positions going forward
    assert rows[5]["n_fp"] < rows[5]["n_grams"]


@pytest.fixture(scope="module")
def mmd_fixture_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("r8s2_mmd_sf")
    rows = [
        (2 * i, [float(i % 5) / 8.0] * 64, i % 3) for i in range(12)
    ]  # every vec_id EVEN -> cohort B empty
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_mmd_empty_cohort_guard_parity(spark, mmd_fixture_sf):
    srows, drows = _run_both(
        "ml_mmd_drift", spark, mmd_fixture_sf, ("embeddings",)
    )
    assert srows == drows
    r = REGISTRY["ml_mmd_drift"].fn(spark, mmd_fixture_sf).collect()[0]
    assert r["n"] == 0 and r["m"] == 12
    assert r["tb"] == 0.0 and r["tab"] == 0.0  # guarded, not NULL/inf


@pytest.fixture(scope="module")
def wmedian_fixture_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("r8s2_wm_sf")
    # flag 'X': weights 1,1,2 over prices 10,20,30 -> total 4, the
    # inclusive cumsum crosses 2 exactly AT price 20 (2*cw == tw)
    # flag 'Y': single row
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "X", "O", "1996-01-01"),
        (2, 1, 1, 1, 1.0, 20.0, 0.0, 0.0, "X", "O", "1996-01-01"),
        (3, 1, 1, 1, 2.0, 30.0, 0.0, 0.0, "X", "O", "1996-01-01"),
        (4, 1, 1, 1, 7.0, 99.0, 0.0, 0.0, "Y", "O", "1996-01-01"),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber "
        "int, l_quantity double, l_extendedprice double, l_discount "
        "double, l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_weighted_median_boundary_parity(spark, wmedian_fixture_sf):
    srows, drows = _run_both(
        "q_weighted_median", spark, wmedian_fixture_sf, ("lineitem",)
    )
    assert srows == drows
    rows = {
        r["l_returnflag"]: r
        for r in REGISTRY["q_weighted_median"].fn(
            spark, wmedian_fixture_sf
        ).collect()
    }
    assert rows["X"]["median_price"] == 20.0  # 2*cw == tw crossing
    assert rows["Y"]["median_price"] == 99.0


@pytest.fixture(scope="module")
def hll_fixture_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("r8s2_hll_sf")
    rows = [
        (i, i % 3 + 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-01")
        for i in range(9)
    ]  # 3 distinct l_partkey -> most registers EMPTY
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber "
        "int, l_quantity double, l_extendedprice double, l_discount "
        "double, l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_hll_empty_registers_parity(spark, hll_fixture_sf):
    srows, drows = _run_both(
        "sketch_hll_registers", spark, hll_fixture_sf, ("lineitem",)
    )
    assert srows == drows
    rows = REGISTRY["sketch_hll_registers"].fn(
        spark, hll_fixture_sf
    ).collect()
    assert len(rows) == 256
    r0 = rows[0]
    assert r0["v_empty"] == 253 and r0["n_exact"] == 3


@pytest.fixture(scope="module")
def mp_fixture_sf(tmp_path_factory, spark):
    base = dt.datetime(2024, 5, 1)
    d = tmp_path_factory.mktemp("r8s2_mp_sf")
    rows = []
    eid = 0
    # constant series: 60 hours, 2 events each -> all distances 0
    for h in range(60):
        for k in range(2):
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=k),
                 eid % 5, "c", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    # short series: 20 hours < window 24
    s = tmp_path_factory.mktemp("r8s2_mp_short_sf")
    short = [
        (1000 + h, base + dt.timedelta(hours=h), 0, "c", 1.0, "{}")
        for h in range(20)
    ]
    spark.createDataFrame(
        short,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(s / "events.parquet"))
    return str(d), str(s)


def test_matrix_profile_constant_and_short_series(spark, mp_fixture_sf):
    const_sf, short_sf = mp_fixture_sf
    srows, drows = _run_both(
        "ts_matrix_profile", spark, const_sf, ("events",)
    )
    assert srows == drows
    rows = {
        r["i"]: r
        for r in REGISTRY["ts_matrix_profile"].fn(
            spark, const_sf
        ).collect()
    }
    # constant series: every distance 0, nearest neighbor must
    # tie-break to the SMALLEST valid j (0 for i >= 12, else i + 12)
    for i, r in rows.items():
        assert r["mp_d2"] == 0
        assert r["nn_j"] == (0 if i >= 12 else i + 12), (i, r["nn_j"])
    srows, drows = _run_both(
        "ts_matrix_profile", spark, short_sf, ("events",)
    )
    assert srows == drows == []


@pytest.fixture(scope="module")
def ridge_fixture_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("r8s2_ridge_sf")
    # x2 CONSTANT -> the OLS normal matrix is singular; ridge must
    # still solve (det > 0) and recover the y = 100*x1 slope closely
    rows = [
        (i, 1, 1, 1, float(1 + i % 9), float(100 * (1 + i % 9)),
         0.05, 0.0, "N", "O", "1996-01-01")
        for i in range(200)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber "
        "int, l_quantity double, l_extendedprice double, l_discount "
        "double, l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_ridge_singular_design_parity(spark, ridge_fixture_sf):
    srows, drows = _run_both(
        "ml_ridge_closed_form", spark, ridge_fixture_sf, ("lineitem",)
    )
    assert srows == drows
    r = REGISTRY["ml_ridge_closed_form"].fn(
        spark, ridge_fixture_sf
    ).collect()[0]
    assert r["det_a"] > 0  # PD + lambda: solvable despite constant x2
    # lambda = 64 at n = 200 shrinks the slope noticeably; what matters
    # is solvability + proximity, not unbiasedness
    assert abs(r["beta1"] - 100.0) < 10.0
