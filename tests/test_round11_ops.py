"""Hand-computed fixtures for the round-11 operators (beyond the
oracle-parity gate): exact expected values on corpora small enough to
fold by hand, plus the degenerate shapes the generated testdata can't
produce."""

from __future__ import annotations

import pytest

from hadoop_spark_pspd_spark.registry import load_all

REGISTRY = load_all()


# ------------------------------------------------- gradient histogram


@pytest.fixture(scope="module")
def two_month_orders_sf(tmp_path_factory, spark):
    """Orders in exactly two months with hand-picked label rates:
    month 1 = 4 orders, 0 positive; month 2 = 4 orders, 4 positive —
    the perfect split, so the month-1 threshold must carry the max
    gain and the degenerate last split must be gain 0."""
    d = tmp_path_factory.mktemp("r11_gh_sf")
    rows = []
    for i in range(4):
        rows.append((i, f"2024-01-{10 + i:02d}", 100000.0))      # y=0
    for i in range(4):
        rows.append((10 + i, f"2024-02-{10 + i:02d}", 200000.0))  # y=1
    spark.createDataFrame(
        [
            (k, ds + " 00:00:00", p)
            for k, ds, p in rows
        ],
        "o_orderkey long, o_orderdate_s string, o_totalprice double",
    ).selectExpr(
        "o_orderkey",
        "CAST(o_orderdate_s AS TIMESTAMP) AS o_orderdate",
        "o_totalprice",
    ).coalesce(1).write.parquet(str(d / "orders.parquet"))
    return str(d)


def test_gradient_histogram_hand_values(spark, two_month_orders_sf):
    rows = {
        r["split_month"]: r
        for r in REGISTRY["ml_gradient_histogram"]
        .fn(spark, two_month_orders_sf)
        .collect()
    }
    assert set(rows) == {1, 2}
    grid = 1 << 16
    half = 4 * grid // 8  # each month holds half the quantized mass
    m1, m2 = rows[1], rows[2]
    # month 1: no positives -> pq 0, G = cq; month 2: all positive ->
    # G = cq - 4cq = -3cq
    assert (m1["cnt_q"], m1["pos_q"]) == (half, 0)
    assert (m2["cnt_q"], m2["pos_q"]) == (half, half)
    assert m1["g_left_fx"] == half
    assert m1["h_left_fx"] == 3 * half + 16
    assert m1["g_right_fx"] == -3 * half
    assert m1["h_right_fx"] == 3 * half + 16
    # split after month 1 separates the classes: gain > 0; the
    # degenerate last split (right side empty) is the -G^2/B_T term
    # against itself -> strictly less, and its left fraction equals
    # the total fraction
    assert m1["gain"] > 0.0
    assert m2["gain"] < m1["gain"]
    # hand value: AL=half, AR=-3half, AT=-2half; BL=BR=3half+16,
    # BT=6half+16
    al, ar, at = half, -3 * half, -2 * half
    bl = br = 3 * half + 16
    bt = 6 * half + 16
    want = (al * al * br * bt + ar * ar * bl * bt - at * at * bl * br) / (
        bl * br * bt
    )
    assert abs(m1["gain"] - want) < 1e-12 * abs(want)


# --------------------------------------------------------- b-bit eval


@pytest.fixture(scope="module")
def twin_docs_sf(tmp_path_factory, spark):
    """Two identical docs (Jaccard 1.0) plus one unrelated: the b-bit
    signature must agree on all 32 perms for the twins -> estimator
    exactly 1.0."""
    d = tmp_path_factory.mktemp("r11_bbit_sf")
    twin = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    spark.createDataFrame(
        [
            (0, twin),
            (1, twin),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_bbit_identical_docs_estimate_one(spark, twin_docs_sf):
    out = REGISTRY["dedup_minhash_bbit"].fn(spark, twin_docs_sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["bbit_matches"] == 32
    assert r["est_jaccard_bbit"] == 1.0
    assert r["jaccard"] == 1.0


# ----------------------------------------------------------- URL dedup


def test_url_dedup_groups_of_four(spark):
    """On any documents table, consecutive doc_id quadruples share one
    canonical URL: every canonical group must have n_raw == the number
    of its doc_ids present, 4 distinct raw variants when full, and the
    canonical string must be fully normalized."""
    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["text_url_dedup"].fn(spark, sf).collect()
    assert rows
    for r in rows:
        assert r["canonical_url"].startswith("http://example.com/corpus/")
        assert "utm_" not in r["canonical_url"]
        assert "#" not in r["canonical_url"]
        assert "www." not in r["canonical_url"]
        assert ":80" not in r["canonical_url"]
        gid = int(r["canonical_url"].split("/corpus/")[1].split("?")[0])
        assert r["canonical_url"].endswith(f"?id={gid}&v=1")
        assert r["keep_id"] == gid * 4
        assert 1 <= r["n_raw"] <= 4
        assert r["n_variants"] == r["n_raw"]  # every variant distinct


# ----------------------------------------------- k-anonymity histogram


@pytest.fixture(scope="module")
def kanon_orders_sf(tmp_path_factory, spark):
    """Orders engineered into known class sizes: one QI class of 6
    rows (safe), two classes of 2 rows (violating k=5)."""
    d = tmp_path_factory.mktemp("r11_kanon_sf")
    rows = []
    for i in range(6):  # class A: same priority/status/month/band
        rows.append((i, "1-URGENT", "F", "2024-03-05 00:00:00", 10000.0))
    for i in range(2):  # class B
        rows.append((10 + i, "2-HIGH", "O", "2024-03-05 00:00:00", 10000.0))
    for i in range(2):  # class C (different month)
        rows.append((20 + i, "2-HIGH", "O", "2024-04-05 00:00:00", 10000.0))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, o_orderstatus string, "
        "o_orderdate_s string, o_totalprice double",
    ).selectExpr(
        "o_orderkey", "o_orderpriority", "o_orderstatus",
        "CAST(o_orderdate_s AS TIMESTAMP) AS o_orderdate", "o_totalprice",
    ).coalesce(1).write.parquet(str(d / "orders.parquet"))
    return str(d)


def test_kanonymity_histogram_hand_values(spark, kanon_orders_sf):
    rows = {
        r["k_size"]: r
        for r in REGISTRY["privacy_kanonymity_histogram"]
        .fn(spark, kanon_orders_sf)
        .collect()
    }
    assert set(rows) == {2, 6}
    assert rows[2]["n_classes"] == 2 and rows[2]["n_rows"] == 4
    assert rows[6]["n_classes"] == 1 and rows[6]["n_rows"] == 6
    assert rows[2]["violates_k"] == 1 and rows[6]["violates_k"] == 0
    assert rows[2]["row_frac"] == 0.4 and rows[6]["row_frac"] == 0.6


# -------------------------------------------------------------- PR-AUC


@pytest.fixture(scope="module")
def separable_embeddings_sf(tmp_path_factory, spark):
    """Perfectly separable scores: all odd labels (positives) score in
    bucket 16, all even (negatives) in bucket 0 -> PR-AUC exactly 1."""
    d = tmp_path_factory.mktemp("r11_prauc_sf")
    rows = []
    for i in range(40):
        y = i % 2
        e1 = 1.0 if y == 1 else 0.01
        rows.append((i, [e1] + [0.0] * 7, y))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_pr_auc_perfect_separation(spark, separable_embeddings_sf):
    out = REGISTRY["ml_pr_auc"].fn(spark, separable_embeddings_sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_pos"], r["n_neg"]) == (20, 20)
    assert r["pr_auc"] == 1.0


# ---------------------------------------------- CCNet paragraph dedup


@pytest.fixture(scope="module")
def paragraph_docs_sf(tmp_path_factory, spark):
    """Three docs built from 16-token chunks A/B/C:
    doc 0 = A+B (32 tok), doc 1 = B+C (32 tok), doc 2 = A (16 tok),
    plus doc 3 = 5-token partial chunk duplicated nowhere.
    Winners: A@doc0, B@doc0, C@doc1, partial@doc3."""
    d = tmp_path_factory.mktemp("r11_ccnet_sf")
    A = " ".join(f"a{i}" for i in range(16))
    B = " ".join(f"b{i}" for i in range(16))
    C = " ".join(f"c{i}" for i in range(16))
    P = "p0 p1 p2 p3 p4"
    rows = [
        (0, A + " " + B, "en", "s", 0),
        (1, B + " " + C, "en", "s", 0),
        (2, A, "en", "s", 0),
        (3, P, "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_paragraph_ccnet_hand_values(spark, paragraph_docs_sf):
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_paragraph_ccnet"]
        .fn(spark, paragraph_docs_sf)
        .collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    # doc 0 owns both its chunks (first occurrence of A and B)
    assert rows[0]["n_dup_chunks"] == 0
    assert rows[0]["tok_retained"] == 32 and rows[0]["tok_total"] == 32
    # doc 1: B is a dup (doc 0 wins), C retained
    assert rows[1]["n_dup_chunks"] == 1
    assert rows[1]["tok_retained"] == 16
    assert rows[1]["retained_ratio"] == 0.5
    # doc 2: A entirely duplicated
    assert rows[2]["tok_retained"] == 0 and rows[2]["n_dup_chunks"] == 1
    assert rows[2]["retained_ratio"] == 0.0
    # doc 3: unique 5-token partial chunk fully retained
    assert rows[3]["n_chunks"] == 1 and rows[3]["tok_total"] == 5
    assert rows[3]["retained_ratio"] == 1.0


# ------------------------------------------------------------ k-truss


@pytest.fixture(scope="module")
def triangle_lineitem_sf(tmp_path_factory, spark):
    """One order with suppliers {1,2,3} (a triangle), one with {4,5}
    (pendant edge), one with {3,4} (bridge) — the 3-truss must keep
    exactly the triangle, each edge with support 1."""
    d = tmp_path_factory.mktemp("r11_truss_sf")
    rows = []
    for ok, sups in [(1, [1, 2, 3]), (2, [4, 5]), (3, [3, 4])]:
        for s in sups:
            rows.append((ok, s, 1.0, 1.0, "1996-01-01"))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_shipdate_s string",
    ).selectExpr(
        "l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "CAST(l_shipdate_s AS DATE) AS l_shipdate"
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_ktruss_triangle_only(spark, triangle_lineitem_sf):
    out = sorted(
        (r["s1"], r["s2"], r["support"])
        for r in REGISTRY["graph_ktruss"].fn(spark, triangle_lineitem_sf)
        .collect()
    )
    assert out == [(1, 2, 1), (1, 3, 1), (2, 3, 1)]


# -------------------------------------------------------- t-closeness


@pytest.fixture(scope="module")
def skewed_customer_sf(tmp_path_factory, spark):
    """Global segments: A x6, B x2 (N=8, q = 3/4, 1/4). Group (0,0):
    4xA -> EMD = (1/2)(|1-3/4| + |0-1/4|) = 1/4 >= 1/5 -> violates.
    Group (1,0): 2A+2B -> EMD = (1/2)(1/4 + 1/4) = 1/4 -> violates.
    Verified numerically: group (0,0) terms |4*8-6*4|=8, |0*8-2*4|=8
    -> sum 16, t = 16/(2*4*8) = 0.25."""
    d = tmp_path_factory.mktemp("r11_tclose_sf")
    rows = []
    cid = 0
    for seg in ["A"] * 4:
        rows.append((cid, 0, seg, 100.0)); cid += 1
    for seg in ["A", "A", "B", "B"]:
        rows.append((cid, 1, seg, 100.0)); cid += 1
    spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string, "
        "c_acctbal double"
    ).coalesce(1).write.parquet(str(d / "customer.parquet"))
    return str(d)


def test_tcloseness_hand_values(spark, skewed_customer_sf):
    rows = {
        (r["c_nationkey"], r["bal_bucket"]): r
        for r in REGISTRY["privacy_tcloseness"]
        .fn(spark, skewed_customer_sf)
        .collect()
    }
    assert set(rows) == {(0, 0), (1, 0)}
    assert rows[(0, 0)]["t_emd"] == 0.25 and rows[(0, 0)]["violates"]
    assert rows[(1, 0)]["t_emd"] == 0.25 and rows[(1, 0)]["violates"]


# --------------------------------------------------------- bloom FPR


@pytest.fixture(scope="module")
def bloom_docs_sf(tmp_path_factory, spark):
    """src0 vocabulary {a0..a199}; srcX probes with 100 shared + 100
    disjoint tokens, plus srcY fully contained in src0 (the
    zero-negatives denominator guard path)."""
    d = tmp_path_factory.mktemp("r11_bloom_sf")
    rows = [
        (0, " ".join(f"a{i}" for i in range(200)), "en", "src0", 0),
        (1, " ".join([f"a{i}" for i in range(100)]
                     + [f"z{i}" for i in range(100)]), "en", "srcX", 0),
        (2, " ".join(f"a{i}" for i in range(50)), "en", "srcY", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_bloom_fpr_semantics(spark, bloom_docs_sf):
    rows = {
        r["source"]: r
        for r in REGISTRY["sketch_bloom_fpr"].fn(spark, bloom_docs_sf)
        .collect()
    }
    assert set(rows) == {"srcX", "srcY"}
    x = rows["srcX"]
    assert x["n_probe"] == 200 and x["n_present"] == 100
    # every truly-present token must pass (no false negatives — the
    # Bloom guarantee)
    assert x["n_pass"] >= x["n_present"]
    assert x["n_false_pos"] == x["n_pass"] - x["n_present"]
    # at 800 set bits / 65536, analytic FPR ~ 2e-8: expect zero FPs
    assert x["n_false_pos"] == 0
    assert x["fpr_observed"] == 0.0
    y = rows["srcY"]
    assert y["n_probe"] == 50 and y["n_present"] == 50
    assert y["n_pass"] == 50 and y["fpr_observed"] == 0.0


# ---------------------------------------------------------- Ljung-Box


@pytest.fixture(scope="module")
def alternating_events_sf(tmp_path_factory, spark):
    """One event type whose hourly counts alternate 1,3,1,3,... over 40
    hours: a perfectly anti-correlated series, r_1 must be strongly
    negative and Q must grow with every lag; plus a constant type
    (c_0 = 0 -> all r_k exactly 0, Q exactly 0)."""
    d = tmp_path_factory.mktemp("r11_lb_sf")
    rows = []
    eid = 0
    base = 1_700_000_000_000_000
    for h in range(40):
        for i in range(1 if h % 2 == 0 else 3):
            rows.append((eid, 7, "alt", base + h * 3_600_000_000, 1.0))
            eid += 1
        rows.append((eid, 8, "const", base + h * 3_600_000_000, 1.0))
        eid += 1
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts_us long, value double"
    ).selectExpr(
        "event_id", "user_id", "event_type",
        "timestamp_micros(ts_us) AS ts", "value"
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_ljung_box_hand_series(spark, alternating_events_sf):
    rows = [
        r.asDict()
        for r in REGISTRY["ts_ljung_box"].fn(spark, alternating_events_sf)
        .collect()
    ]
    alt = sorted(
        (r for r in rows if r["event_type"] == "alt"),
        key=lambda r: r["lag"],
    )
    const = [r for r in rows if r["event_type"] == "const"]
    assert len(alt) == 12 and len(const) == 12
    assert all(r["n_buckets"] == 40 for r in alt)
    # alternating series: r_1 ~ -1 (slightly above due to edge terms),
    # r_2 ~ +1, and Q is monotone nondecreasing in the lag
    assert alt[0]["r_k"] < -0.9
    assert alt[1]["r_k"] > 0.9
    qs = [r["lb_q"] for r in alt]
    assert all(b >= a for a, b in zip(qs, qs[1:]))
    assert qs[0] > 30  # N(N+2)r^2/(N-1) ~ 40*42*0.95^2/39
    # constant series: zero-guarded exactly
    assert all(r["r_k"] == 0.0 and r["lb_q"] == 0.0 for r in const)
