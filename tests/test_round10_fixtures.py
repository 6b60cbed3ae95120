"""Round-10 adversarial fixtures (ADVICE.md r9 items).

* ml_isotonic_calibration: bucketing used CAST(l_quantity AS BIGINT) —
  DuckDB double->BIGINT rounds half-even while Spark cast truncates
  toward zero, so any FRACTIONAL quantity diverged buckets (latent:
  generated testdata quantities are integral). Fixed to floor() on both
  sides; pinned here on a corpus of half-boundary (3.5) and plain
  fractional (2.7) quantities where round-half-even != truncate.

* graph_hits_bipartite: hub scores initialized at 65536 // n_users —
  0 for >2^16 distinct users, collapsing every score to 0 IDENTICALLY
  in both engines (hash gate passes a degenerate output). Fixed to
  init at the full grid constant; pinned here by a 70k-user corpus
  asserting parity AND a non-degenerate (positive-mass) output.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone
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


def _run_both(name, spark, sf_dir, tables):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    con = duckdb.connect()
    try:
        con.execute("SET memory_limit='4GB'")
        con.execute("SET threads=4")
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
    finally:
        con.close()
    return srows, drows


@pytest.fixture(scope="module")
def fractional_qty_sf(tmp_path_factory, spark):
    """lineitem with fractional quantities straddling rounding modes:
    3.5 (half-even -> 4, truncate -> 3) and 2.7 (round -> 3,
    truncate -> 2) force divergent buckets under the old CAST; both
    floor to distinct buckets so isotonic pooling is exercised too."""
    d = tmp_path_factory.mktemp("r10_isotonic_sf")
    rows = []
    lk = 0
    # (quantity, extendedprice) — prices straddle the 30000 label
    # threshold so raw rates are non-monotone and PAV pooling happens
    for qty, price in [
        (2.7, 45000.0), (2.7, 10000.0),          # bucket 2: rate 1/2
        (3.5, 9000.0), (3.5, 8000.0),            # bucket 3: rate 0/2
        (3.5, 50000.0), (2.5, 31000.0),          # + one high per bucket
        (5.0, 29000.0), (5.25, 32000.0),         # bucket 5: rate 1/2
        (7.9, 40000.0), (7.1, 41000.0),          # bucket 7: rate 2/2
    ]:
        lk += 1
        rows.append(
            (lk, 1, 1, 1, qty, price, 0.0, 0.0, "N", "O",
             datetime(1996, 1, 1))
        )
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber "
        "int, l_quantity double, l_extendedprice double, l_discount "
        "double, l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_isotonic_fractional_bucket_parity(spark, fractional_qty_sf):
    srows, drows = _run_both(
        "ml_isotonic_calibration", spark, fractional_qty_sf, ("lineitem",)
    )
    assert srows == drows
    rows = {
        r["quantity"]: r
        for r in REGISTRY["ml_isotonic_calibration"]
        .fn(spark, fractional_qty_sf)
        .collect()
    }
    # floor() semantics: 2.5/2.7 -> 2, 3.5 -> 3, 5.0/5.25 -> 5, 7.x -> 7
    assert set(rows) == {2, 3, 5, 7}
    assert rows[2]["n"] == 3 and rows[3]["n"] == 3
    # iso_rate must be non-decreasing in quantity (the whole point)
    qs = sorted(rows)
    for a, b in zip(qs, qs[1:]):
        assert rows[a]["iso_rate"] <= rows[b]["iso_rate"] + 1e-12


def test_isotonic_fixture_discriminates_cast_semantics(fractional_qty_sf):
    """The fixture must separate round-half-even bucketing from
    truncation: under the OLD oracle cast, 2.7 lands in bucket 3 and
    3.5 in bucket 4, giving a different bucket histogram than floor."""
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM "
            f"'{fractional_qty_sf}/lineitem.parquet/*.parquet'"
        )
        old = con.sql(
            "SELECT CAST(l_quantity AS BIGINT) AS q, count(*) "
            "FROM lineitem GROUP BY 1 ORDER BY 1"
        ).fetchall()
        new = con.sql(
            "SELECT CAST(floor(l_quantity) AS BIGINT) AS q, count(*) "
            "FROM lineitem GROUP BY 1 ORDER BY 1"
        ).fetchall()
    finally:
        con.close()
    assert old != new, "fixture does not separate half-even from floor"


@pytest.fixture(scope="module")
def many_users_sf(tmp_path_factory, spark):
    """events with 70,000 distinct users (> 2^16): the old hub init
    65536 // n_users would be 0 here, collapsing HITS to all-zero in
    both engines. Types are skewed (user_id % 7 with a heavy 'view'
    tail) so authority masses differ across types."""
    d = tmp_path_factory.mktemp("r10_hits_sf")
    n = 70_000
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    df = spark.range(n).selectExpr(
        "id AS event_id",
        f"timestamp'{base.strftime('%Y-%m-%d %H:%M:%S')}' AS ts",
        "id AS user_id",
        "CASE WHEN id % 2 = 0 THEN 'view' "
        "ELSE element_at(array('click','cart','purchase'), "
        "CAST(id % 3 AS INT) + 1) END AS event_type",
        "CAST(id AS DOUBLE) AS value",
        "'{}' AS props",
    )
    df.coalesce(2).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_hits_many_users_parity_and_nondegenerate(spark, many_users_sf):
    srows, drows = _run_both(
        "graph_hits_bipartite", spark, many_users_sf, ("events",)
    )
    assert srows == drows
    out = (
        REGISTRY["graph_hits_bipartite"].fn(spark, many_users_sf).collect()
    )
    # the old init made every auth_fx 0 here; fixed output carries mass
    assert sum(r["auth_fx"] for r in out) > 0
    top = max(out, key=lambda r: r["auth_fx"])
    assert top["event_type"] == "view"  # half of all users point at it


@pytest.fixture(scope="module")
def lm_fixture_sf(tmp_path_factory, spark):
    """Corpus where fluent (corpus-common) and gibberish docs separate:
    docs 0-3 share the same common bigrams; doc 4 is one-of-a-kind;
    doc 5 is empty and doc 6 single-token (no bigrams — the zero-guard
    rows); doc 7 has multibyte tokens repeated so unicode bigram keys
    join correctly."""
    d = tmp_path_factory.mktemp("r10_lm_sf")
    rows = [
        (0, "the cat sat on the mat", "en", "s0"),
        (1, "the cat sat on the rug", "en", "s0"),
        (2, "the cat sat on the mat", "en", "s1"),
        (3, "the cat ran on the mat", "en", "s1"),
        (4, "zxq qvw jjk pfd", "en", "s2"),        # gibberish
        (5, "", "en", "s2"),                        # empty
        (6, "solo", "en", "s2"),                    # one token
        (7, "漢字 の 漢字 の 漢字", "ja", "s3"),    # multibyte bigrams
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_bigram_lm_score_parity_and_ordering(spark, lm_fixture_sf):
    srows, drows = _run_both(
        "text_bigram_lm_score", spark, lm_fixture_sf, ("documents",)
    )
    assert srows == drows
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["text_bigram_lm_score"]
        .fn(spark, lm_fixture_sf)
        .collect()
    }
    assert set(rows) == set(range(8))
    # zero-guard rows: no bigrams -> score 0, bpb 0.0
    for i in (5, 6):
        assert rows[i]["n_bigrams"] == 0
        assert rows[i]["bits_score"] == 0
        assert rows[i]["bits_per_bigram"] == 0.0
    # gibberish scores strictly below every fluent doc per bigram
    fluent_bpb = [rows[i]["bits_per_bigram"] for i in (0, 1, 2, 3)]
    assert rows[4]["bits_per_bigram"] < min(fluent_bpb)
    # a doc made of corpus-common bigrams scores near 0 (conditional
    # probability ~1 -> ~0 bits)
    assert max(fluent_bpb) <= 0.0
    assert rows[7]["n_bigrams"] == 4  # multibyte keys joined


@pytest.fixture(scope="module")
def two_clique_sf(tmp_path_factory, spark):
    """Nation co-occurrence graph = two 4-cliques bridged by one edge:
    orders 1..12 pair nations within {0..3}, 13..24 within {4..7},
    order 25 bridges 3-4. The Fiedler bisection must cut the bridge."""
    d = tmp_path_factory.mktemp("r10_spectral_sf")
    spark.createDataFrame(
        [(k, f"NAT{k}", 0, "") for k in range(8)],
        "n_nationkey long, n_name string, n_regionkey long, "
        "n_comment string",
    ).coalesce(1).write.parquet(str(d / "nation.parquet"))
    spark.createDataFrame(
        [(k + 1, k) for k in range(8)],
        "s_suppkey long, s_nationkey long",
    ).coalesce(1).write.parquet(str(d / "supplier.parquet"))
    rows, ok = [], 0
    import itertools

    for grp in (range(0, 4), range(4, 8)):
        for a, b in itertools.combinations(grp, 2):
            for _ in range(2):  # weight 2 per clique edge
                ok += 1
                rows.append((ok, a + 1))
                rows.append((ok, b + 1))
    ok += 1
    rows.append((ok, 4))  # bridge order: nations 3 and 4 (weight 1)
    rows.append((ok, 5))
    spark.createDataFrame(
        [(o, i + 1, s, 1.0) for i, (o, s) in enumerate(rows)],
        "l_orderkey long, l_linenumber long, l_suppkey long, "
        "l_quantity double",
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_spectral_partition_cuts_the_bridge(spark, two_clique_sf):
    srows, drows = _run_both(
        "graph_spectral_partition", spark, two_clique_sf,
        ("nation", "supplier", "lineitem"),
    )
    assert srows == drows
    rows = {
        r["nationkey"]: r
        for r in REGISTRY["graph_spectral_partition"]
        .fn(spark, two_clique_sf)
        .collect()
    }
    sides = {k: rows[k]["side"] for k in rows}
    a = {sides[k] for k in range(0, 4)}
    b = {sides[k] for k in range(4, 8)}
    assert len(a) == 1 and len(b) == 1 and a != b, sides
