"""Round-11 adversarial fixtures (ADVICE.md r10 items).

* ml_calibration_ece: the train/test per-bucket counts were INNER
  joined, silently dropping any priority bucket present in only one
  split and excluding its test mass from the ECE denominator
  (identical in both engines, so the hash gate passed an
  under-covering stat). Fixed to a full outer join with coalesced
  zero counts and identically zero-guarded divisions; pinned here on
  a fixture with a train-only and a test-only bucket and an exactly
  hand-computable ECE.

* graph_spectral_partition: the power-iteration product sum was
  bounded by ~n * c * 2^30 with c = 2*max_deg + 1 DATA-derived —
  an unguarded int64 ceiling around max_deg ~ 2^28 at large SF.
  Fixed by quantizing edge weights to a 2^16 grid over the total
  (w * 2^16 // sum(w), trunc division in both engines — the
  ml_bradley_terry recipe); pinned here by parity on a skew-weighted
  graph plus a direct assertion that the oracle's degrees respect
  the 2^17 bound regardless of raw weight scale.

* decode_jpeg: the marker walk rejected spec-legal 0xFF fill bytes
  before markers (T.81 B.1.1.2 allows any number), and truncated
  streams surfaced as IndexError/struct.error. Fixed to skip fill
  bytes and normalize truncation to ValueError; pinned on a
  fill-byte-decorated encoder stream and a truncation sweep.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest

from hadoop_spark_pspd_spark.functions.jpeg_codec import (
    decode_jpeg,
    encode_jpeg_gray,
)
from hadoop_spark_pspd_spark.operators.graph import _spectral_edges_sql
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


# ---------------------------------------------------------------- ECE


@pytest.fixture(scope="module")
def split_only_buckets_sf(tmp_path_factory, spark):
    """orders where priority 'A' exists only in the train split (even
    orderkeys), 'B' only in test (odd), 'C' in both — hand-designed so
    ECE = 0.5 exactly when B's test mass enters the denominator (the
    old inner join dropped B entirely and got a different number)."""
    d = tmp_path_factory.mktemp("r11_ece_sf")
    rows = [
        # A: train-only (even keys), rate 1/2
        (2, "A", 200000.0), (4, "A", 100000.0),
        # B: test-only (odd keys), rate 2/4
        (1, "B", 200000.0), (3, "B", 180000.0),
        (5, "B", 100000.0), (7, "B", 90000.0),
        # C: both splits — train 1/2, test 2/2
        (6, "C", 160000.0), (8, "C", 100000.0),
        (9, "C", 170000.0), (11, "C", 190000.0),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).coalesce(1).write.parquet(str(d / "orders.parquet"))
    return str(d)


def test_ece_split_only_buckets_parity_and_value(
    spark, split_only_buckets_sf
):
    srows, drows = _run_both(
        "ml_calibration_ece", spark, split_only_buckets_sf, ("orders",)
    )
    assert srows == drows
    rows = {
        r["bucket"]: r
        for r in REGISTRY["ml_calibration_ece"]
        .fn(spark, split_only_buckets_sf)
        .collect()
    }
    # every bucket survives the outer join — A (train-only) included
    assert set(rows) == {"A", "B", "C"}
    fx = 1 << 20
    a, b, c = rows["A"], rows["B"], rows["C"]
    assert (a["n_train"], a["n_test"]) == (2, 0)
    assert (b["n_train"], b["n_test"]) == (0, 4)
    assert (c["n_train"], c["n_test"]) == (2, 2)
    # zero-guarded rates: train-only bucket contributes 0 gap mass,
    # test-only bucket's gap is measured against a 0 train rate
    assert a["wgap_fx"] == 0
    assert b["q_train_fx"] == 0 and b["q_test_fx"] == fx // 2
    assert b["wgap_fx"] == 4 * (fx // 2)
    assert c["wgap_fx"] == 2 * (fx - fx // 2)
    # nt = 0 + 4 + 2 = 6, num = 2*FX/2*... = 3*FX -> ECE exactly 0.5
    assert a["ece"] == 0.5


# ----------------------------------------------- spectral quantization


@pytest.fixture(scope="module")
def skew_weight_sf(tmp_path_factory, spark):
    """3-nation path graph with a 1000:1 weight skew: 1000 orders pair
    nations (0,1), one order pairs (1,2). Raw degrees reach 1001 — the
    quantized grid must compress them below 2^17 while keeping the
    structure (node 2 hangs off the heavy 0-1 pair by a thread)."""
    d = tmp_path_factory.mktemp("r11_spectral_sf")
    spark.createDataFrame(
        [(k, f"NAT{k}", 0, "") for k in range(3)],
        "n_nationkey long, n_name string, n_regionkey long, "
        "n_comment string",
    ).coalesce(1).write.parquet(str(d / "nation.parquet"))
    spark.createDataFrame(
        [(k + 1, k) for k in range(3)],
        "s_suppkey long, s_nationkey long",
    ).coalesce(1).write.parquet(str(d / "supplier.parquet"))
    rows = []
    for ok in range(1, 1001):  # orders 1..1000: nations 0 and 1
        rows.append((ok, 1))
        rows.append((ok, 2))
    rows.append((1001, 2))  # order 1001: nations 1 and 2
    rows.append((1001, 3))
    spark.createDataFrame(
        [(o, i + 1, s, 1.0) for i, (o, s) in enumerate(rows)],
        "l_orderkey long, l_linenumber long, l_suppkey long, "
        "l_quantity double",
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_spectral_skew_weights_parity(spark, skew_weight_sf):
    srows, drows = _run_both(
        "graph_spectral_partition", spark, skew_weight_sf,
        ("nation", "supplier", "lineitem"),
    )
    assert srows == drows


def test_spectral_degrees_respect_quantized_bound(skew_weight_sf):
    """The oracle's degree table must stay <= 2^17 NO MATTER the raw
    co-occurrence counts — that bound is what makes every
    power-iteration product provably < 2^63 at any corpus size."""
    con = duckdb.connect()
    try:
        con.execute("SET memory_limit='4GB'")
        con.execute("SET threads=4")
        for t in ("nation", "supplier", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{skew_weight_sf}/{t}.parquet/*.parquet'"
            )
        (max_deg,) = con.sql(
            f"WITH {_spectral_edges_sql()} SELECT MAX(d) FROM deg"
        ).fetchone()
        (raw_max,) = con.sql(
            f"WITH {_spectral_edges_sql()} "
            "SELECT MAX(w) FROM rawpairs"
        ).fetchone()
    finally:
        con.close()
    assert raw_max == 1000  # the fixture really is skew-weighted
    assert max_deg <= 1 << 17
    assert max_deg > 0  # quantization kept the heavy edge's mass


# ------------------------------------------------------ JPEG hardening


def _tiny_jpeg() -> bytes:
    blk = [(x * 7 + y * 3) % 256 for y in range(8) for x in range(8)]
    return encode_jpeg_gray([blk], 8, 8, [1] * 64)


def test_jpeg_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker. Decorate every marker boundary after SOI with extra 0xFFs
    and require the identical decode."""
    img = _tiny_jpeg()
    ref = decode_jpeg(img)
    # insert fills right after SOI and again before the 3rd marker
    decorated = bytearray(img)
    positions = [
        i for i in range(2, len(img) - 1)
        if img[i] == 0xFF and img[i + 1] not in (0x00, 0xFF)
    ]
    for p in sorted(positions[:3], reverse=True):
        decorated[p:p] = b"\xff\xff\xff"
    out = decode_jpeg(bytes(decorated))
    assert out == ref


def test_jpeg_truncation_raises_valueerror_only():
    """Truncating the stream at any point must surface ValueError or
    NotImplementedError — never a bare IndexError/KeyError/
    struct.error (the documented exception contract)."""
    img = _tiny_jpeg()
    for cut in range(1, len(img), max(1, len(img) // 37)):
        try:
            decode_jpeg(img[:cut])
        except (ValueError, NotImplementedError):
            pass
        # anything else (IndexError, KeyError, struct.error) fails


# ------------------------------------------- exact-substring cut list


@pytest.fixture(scope="module")
def substring_sf(tmp_path_factory, spark):
    """Corpus with hand-placed exact repeats (window K = 32 bytes):

    * doc 0 / doc 1 share a 50-byte substring S at different offsets
      (cross-doc repeat; expected maximal spans exactly S's extent);
    * doc 2 contains a 40-byte block T twice, 5 bytes apart
      (WITHIN-doc repeat -> two disjoint spans in the same doc);
    * doc 3 is shorter than K, doc 4 has no repeat, doc 5 is empty
      (the n >= K guard rows);
    * docs 6 / 7 share a substring containing MULTIBYTE chars —
      offsets must be BYTE-defined (utf-8), not char-defined.
    """
    d = tmp_path_factory.mktemp("r11_substr_sf")
    s = "the quick brown fox jumps over a lazy sleeping dog"[:50]
    assert len(s.encode()) == 50
    t = "0123456789abcdefghijklmnopqrstuvwxyzWXYZ"[:40]
    m = ("héllo wörld répeated ségment long enough to cover "
         "thirty-two bytes easily")
    rows = [
        (0, "A" * 10 + s + "B" * 10),
        (1, "C" * 5 + s + "D" * 20),
        (2, t + "....." + t),
        (3, "tiny"),
        (4, "z" + "unique-" * 5),          # 36 bytes, no repeat
        (5, ""),
        (6, "<<" + m + ">>"),
        (7, "[[[" + m + "]]]"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d), len(m.encode())


def test_substring_exact_parity_and_spans(spark, substring_sf):
    sf_dir, m_bytes = substring_sf
    srows, drows = _run_both(
        "dedup_substring_exact", spark, sf_dir, ("documents",)
    )
    assert srows == drows
    spans = {}
    for r in (
        REGISTRY["dedup_substring_exact"].fn(spark, sf_dir).collect()
    ):
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_bytes"],
             r["n_windows"], r["max_mult"])
        )
    for k in spans:
        spans[k].sort()
    # docs 3 (short), 4 (unique), 5 (empty) emit nothing
    assert set(spans) == {0, 1, 2, 6, 7}
    # cross-doc repeat: exactly S's extent, 19 windows, multiplicity 2
    assert spans[0] == [(11, 60, 50, 19, 2)]
    assert spans[1] == [(6, 55, 50, 19, 2)]
    # within-doc repeat: two disjoint maximal spans of T's extent
    assert spans[2] == [(1, 40, 40, 9, 2), (46, 85, 40, 9, 2)]
    # multibyte shared block: byte-defined offsets
    assert spans[6] == [(3, 2 + m_bytes, m_bytes, m_bytes - 31, 2)]
    assert spans[7] == [(4, 3 + m_bytes, m_bytes, m_bytes - 31, 2)]
