"""Round-9 operators: Zipf rank-frequency slope + isotonic calibration.

Fixtures the generated testdata cannot produce: a synthetic corpus with
KNOWN Zipf(1) structure (the slope must come out ~-1, and the
single-bucket corpus must hit the zero-denominator guard identically in
both engines), and a V-shaped rate curve whose isotonic fit requires
multiple pool-adjacent-violators merges (compared against an
independent PAV reference implementation — the registered operator uses
the minimax closed form, so agreement is a real cross-check, not a
self-comparison).
"""

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
    sidx = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
    srows = sorted(
        tuple(repr(_norm(r[i])) for i in sidx) for r in sdf.collect()
    )
    drows = sorted(
        tuple(repr(_norm(r[i])) for i in didx) for r in rel.fetchall()
    )
    con.close()
    spark.catalog.clearCache()
    return srows, drows


@pytest.fixture(scope="module")
def zipf_sf(tmp_path_factory, spark):
    """Corpus with exact Zipf(1) token counts: term_i appears
    floor(1024/i) times for i in 1..256 — the rank-bucket log2 means
    then fall by ~1 per bucket, so the fitted slope must be ~-1."""
    d = tmp_path_factory.mktemp("zipf_sf")
    words = []
    for i in range(1, 257):
        words.extend([f"w{i:04d}"] * (1024 // i))
    # spread over a few documents so the explode has >1 row
    docs, chunk = [], 500
    for j in range(0, len(words), chunk):
        docs.append((j // chunk, " ".join(words[j : j + chunk]),
                     "en", "s0", 0))
    df = spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    df.coalesce(2).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def oneword_sf(tmp_path_factory, spark):
    """Single-term corpus: one rank bucket, so the slope's OLS
    denominator is ZERO — both engines must take the guard branch."""
    d = tmp_path_factory.mktemp("oneword_sf")
    df = spark.createDataFrame(
        [(0, "solo solo solo", "en", "s0", 14)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_zipf_slope_recovers_minus_one(spark, zipf_sf):
    srows, drows = _run_both(
        "text_zipf_slope", spark, zipf_sf, ("documents",)
    )
    assert srows == drows
    rows = REGISTRY["text_zipf_slope"].fn(spark, zipf_sf).collect()
    assert len(rows) >= 7  # 256 ranks -> buckets k=0..8
    slope = rows[0]["zipf_slope"]
    assert all(r["zipf_slope"] == slope for r in rows)
    assert -1.3 <= slope <= -0.7, slope
    spark.catalog.clearCache()


def test_zipf_slope_single_bucket_guard(spark, oneword_sf):
    srows, drows = _run_both(
        "text_zipf_slope", spark, oneword_sf, ("documents",)
    )
    assert srows == drows
    rows = REGISTRY["text_zipf_slope"].fn(spark, oneword_sf).collect()
    assert len(rows) == 1
    assert rows[0]["zipf_slope"] == 0.0  # 0-numerator / guarded 1
    spark.catalog.clearCache()


# --- isotonic ---------------------------------------------------------

# V-shaped + zig-zag raw rates over 8 quantity buckets: multiple PAV
# merges, including a cascade (the pooled [0.9, 0.1] block must keep
# merging left as later low buckets arrive).
_ISO_BUCKETS = [
    # (quantity, n, pos): raw rates .9 .1 .5 .4 .2 .8 .8 1.0
    (1, 10, 9),
    (2, 10, 1),
    (3, 10, 5),
    (4, 10, 4),
    (5, 10, 2),
    (6, 10, 8),
    (7, 10, 8),
    (8, 10, 10),
]


def _pav_reference(buckets):
    """Independent weighted PAV (non-decreasing): the textbook stack
    algorithm, structurally different from the operator's minimax form."""
    blocks = []  # [pos_sum, n_sum, width]
    for _q, n, pos in buckets:
        blocks.append([pos, n, 1])
        while (
            len(blocks) > 1
            and blocks[-2][0] * blocks[-1][1]
            >= blocks[-1][0] * blocks[-2][1]
        ):
            p2, n2, w2 = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += n2
            blocks[-1][2] += w2
    out = []
    for p, n, w in blocks:
        out.extend([p / n] * w)
    return out


@pytest.fixture(scope="module")
def iso_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("iso_sf")
    rows = []
    for q, n, pos in _ISO_BUCKETS:
        for i in range(n):
            rows.append((float(q), 40000.0 if i < pos else 10000.0))
    df = spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double"
    )
    df.coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_isotonic_matches_pav_reference(spark, iso_sf):
    srows, drows = _run_both(
        "ml_isotonic_calibration", spark, iso_sf, ("lineitem",)
    )
    assert srows == drows
    rows = sorted(
        REGISTRY["ml_isotonic_calibration"].fn(spark, iso_sf).collect(),
        key=lambda r: r["quantity"],
    )
    got = [r["iso_rate"] for r in rows]
    want = _pav_reference(_ISO_BUCKETS)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-12, (got, want)
    # monotone, and the fixture really forced pooling
    assert all(a <= b for a, b in zip(got, got[1:]))
    raw = [r["raw_rate"] for r in rows]
    assert any(abs(g - r) > 1e-9 for g, r in zip(got, raw))
    spark.catalog.clearCache()


# --- higher moments ---------------------------------------------------

@pytest.fixture(scope="module")
def const_events_sf(tmp_path_factory, spark):
    """Events with a CONSTANT value per type: m2 is ~0 (possibly a tiny
    float residue from the correctly-rounded s1/n), so skew/kurtosis
    must take the m2<=0 guard branch identically in both engines; a
    second type carries genuine skew so the non-guard path is also
    exercised on the same fixture."""
    d = tmp_path_factory.mktemp("const_events_sf")
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0, i % 7, "flat", 12.34, "{}") for i in range(40)
    ] + [
        (100 + i, t0, i % 7, "skewed", float(v), "{}")
        for i, v in enumerate([1, 1, 1, 1, 1, 1, 1, 1, 1, 500])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_moments_guard_and_skew_parity(spark, const_events_sf):
    srows, drows = _run_both(
        "q_moments_skew_kurtosis", spark, const_events_sf, ("events",)
    )
    assert srows == drows
    rows = {
        r["event_type"]: r
        for r in REGISTRY["q_moments_skew_kurtosis"]
        .fn(spark, const_events_sf)
        .collect()
    }
    assert abs(rows["flat"]["m2"]) < 1e-6  # constant -> (near-)zero var
    assert rows["skewed"]["skewness"] > 2.0  # one huge outlier
    assert rows["skewed"]["excess_kurtosis"] > 3.0
    spark.catalog.clearCache()


# --- HITS --------------------------------------------------------------

@pytest.fixture(scope="module")
def hits_events_sf(tmp_path_factory, spark):
    """Bipartite graph with a KNOWN authority ordering: every user
    touches 'hub_item'; only users 0-1 touch 'niche'; user 0 (the
    strongest hub) also touches 'elite'. authority(hub_item) must
    dominate, and 'elite' (endorsed only by the top hub) must beat
    'niche' on equal edge counts after one hub refinement."""
    d = tmp_path_factory.mktemp("hits_events_sf")
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(6):
        for _ in range(4):  # every user -> hub_item, weight 4
            rows.append((eid, t0, u, "hub_item", 1.0, "{}")); eid += 1
    for u in (0, 1):
        rows.append((eid, t0, u, "niche", 1.0, "{}")); eid += 1
    for _ in range(2):
        rows.append((eid, t0, 0, "elite", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_hits_authority_ordering_and_parity(spark, hits_events_sf):
    srows, drows = _run_both(
        "graph_hits_bipartite", spark, hits_events_sf, ("events",)
    )
    assert srows == drows
    rows = {
        r["event_type"]: r["auth_fx"]
        for r in REGISTRY["graph_hits_bipartite"]
        .fn(spark, hits_events_sf)
        .collect()
    }
    assert set(rows) == {"hub_item", "niche", "elite"}
    assert rows["hub_item"] > rows["niche"]
    assert rows["hub_item"] > rows["elite"]
    # scores are on the exact 2^16 grid and ~sum to it (floor losses)
    total = sum(rows.values())
    assert 65536 - 16 <= total <= 65536
    spark.catalog.clearCache()
