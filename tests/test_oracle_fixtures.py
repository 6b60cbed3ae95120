"""Adversarial-data oracle parity: fixtures the generated testdata never
exercises.

CORRECTNESS_r03 showed `text_nucleus_filter` hash-mismatching on the
driver's parquet while green on every local sweep — a data-dependent
cross-engine divergence. The engine-sensitive term was `length(text)`:
Spark counts UTF-8 code points where DuckDB's `length` also counts code
points but the two disagree with each other (and with any byte budget)
once non-ASCII text shows up in the ORDER BY / mass sums. The fix byte-
defines mass (Spark `octet_length` == DuckDB `strlen`); this module pins
that equivalence on a corpus of emoji / combining characters / NUL bytes
/ CJK — inputs where char-length and byte-length DISAGREE on ordering,
so the old formulation cannot pass.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pytest

from hadoop_spark_pspd_spark.registry import load_all

REGISTRY = load_all()

# byte lengths: 'aaaa...'=n, emoji 👍🏽=8B/2cp, é(combining)=3B/2cp,
# CJK 漢=3B/1cp — crafted so byte-rank and char-rank orderings differ
# within each source group.
_DOCS = [
    # source s0: doc 0 is char-longest but doc 1 is byte-longest
    (0, "aaaaaaaaaa", "en", "s0"),            # 10 B / 10 cp
    (1, "👍🏽👍🏽", "en", "s0"),                  # 16 B / 4 cp
    (2, "漢字漢字", "zh", "s0"),               # 12 B / 4 cp
    (3, "ééé", "fr", "s0"),  # 9 B / 6 cp (combining)
    # source s1: NUL bytes + mixed
    (4, "a\x00b\x00c", "en", "s1"),            # 5 B / 5 cp
    (5, "ééé", "fr", "s1"),                    # 6 B / 3 cp (precomposed)
    (6, "xyz", "en", "s1"),                    # 3 B / 3 cp
    (7, "👍", "en", "s1"),                     # 4 B / 1 cp
    # source s2: ties on bytes broken by doc_id
    (8, "漢b", "zh", "s2"),                    # 4 B
    (9, "abcd", "en", "s2"),                   # 4 B
    (10, "", "en", "s2"),                      # 0 B
]


@pytest.fixture(scope="module")
def adversarial_sf(tmp_path_factory, spark):
    """A minimal sf dir holding only documents.parquet (all the nucleus
    query touches)."""
    d = tmp_path_factory.mktemp("adversarial_sf")
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in _DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _run_both(name: str, spark, sf_dir: str):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
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


def test_nucleus_filter_multibyte_parity(spark, adversarial_sf):
    srows, drows = _run_both("text_nucleus_filter", spark, adversarial_sf)
    assert srows == drows, f"first diff: {next((a, b) for a, b in zip(srows, drows) if a != b)}"


def test_fixture_discriminates_char_vs_byte_mass(adversarial_sf):
    """The fixture must make the OLD char-length formulation fail: the
    byte-mass and char-mass keep sets differ on this corpus, so a
    char-length regression cannot silently pass the parity test above."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{adversarial_sf}/documents.parquet/*.parquet'"
    )
    tmpl = """
        WITH ranked AS (
            SELECT doc_id,
                   SUM(CAST({m}(text) AS BIGINT)) OVER (
                       PARTITION BY source
                       ORDER BY {m}(text) DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - CAST({m}(text) AS BIGINT) AS prior_mass,
                   SUM(CAST({m}(text) AS BIGINT)) OVER (
                       PARTITION BY source) AS total_mass
            FROM documents
        )
        SELECT doc_id FROM ranked
        WHERE prior_mass * 10 < 8 * total_mass
        ORDER BY doc_id
    """
    by_bytes = con.sql(tmpl.format(m="strlen")).fetchall()
    by_chars = con.sql(tmpl.format(m="length")).fetchall()
    con.close()
    assert by_bytes != by_chars, (
        "fixture does not separate byte-mass from char-mass nucleus cuts"
    )


# --- BPE encode: empty docs + giant tokens (ADVICE r4) -------------------
#
# Two data-dependent divergences the generated testdata never exercises:
#   * a 0-byte document: Spark's sequence(1, octet_length=0) is the
#     DESCENDING [1, 0] -> two phantom empty symbols -> n_tokens=2, while
#     the oracle's range(1, 1) is empty and its join drops the doc;
#   * a whitespace-free token >1024 bytes in the vocab: the old training
#     oracle unrolled word bytes via a fixed range(1, 1025) WHERE i <= n,
#     silently truncating, while Spark exploded the full octet_length.
# Both are fixed (filter octet_length>=1; lateral-safe unnest form) and
# pinned here by cross-engine parity on a corpus containing both shapes.

_BIG_TOKEN = "Q" + "abcdefgh" * 190  # 1521 bytes, whitespace-free

# ids chosen so the adversarial docs land INSIDE the encode query's
# deterministic 1-in-4 sample (doc_id % 4 == 1): empty doc, >1KB vocab
# word, and multibyte text must all flow through the sampled encode path
_BPE_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "en", "s0"),
    (1, "the quick brown fox the quick brown fox", "en", "s0"),
    (2, "pack my box with five dozen jugs", "en", "s1"),
    (5, "the lazy dog sleeps the lazy dog barks", "en", "s1"),
    (6, "", "en", "s1"),                        # empty doc OUTSIDE sample
    (7, "quick quick quick brown brown fox", "en", "s2"),
    (9, "", "en", "s0"),                        # empty doc IN the sample
    (13, _BIG_TOKEN + " " + _BIG_TOKEN, "en", "s1"),  # >1KB word, sampled
    (17, "漢字 the 漢字 fox", "zh", "s2"),      # multibyte, sampled
]


@pytest.fixture(scope="module")
def bpe_adversarial_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("bpe_adversarial_sf")
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in _BPE_DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_bpe_encode_empty_doc_and_giant_token_parity(
    spark, bpe_adversarial_sf
):
    srows, drows = _run_both("text_bpe_encode", spark, bpe_adversarial_sf)
    assert srows == drows, (
        f"{len(srows)} vs {len(drows)} rows; first diff: "
        f"{next(((a, b) for a, b in zip(srows, drows) if a != b), None)}"
    )
    # empty docs must be ABSENT (no tokens), not present with n_tokens=2;
    # the encode query emits the deterministic 1-in-4 doc sample
    # (doc_id % 4 == 1), training full-corpus
    assert len(srows) == len(
        [d for d in _BPE_DOCS if d[1] and d[0] % 4 == 1]
    )


def test_bpe_merges_giant_token_parity(spark, bpe_adversarial_sf):
    srows, drows = _run_both("text_bpe_merges", spark, bpe_adversarial_sf)
    assert srows == drows, (
        f"first diff: "
        f"{next(((a, b) for a, b in zip(srows, drows) if a != b), None)}"
    )


# --- PCA on rank-deficient embeddings (round-5 review finding) ----------
#
# A corpus spanning fewer than N_COMPONENTS effective dimensions zeroes
# the deflated covariance once fixed-point quantization eats the
# residual; the unguarded fit then computed 0/0 -> numpy NaN (and
# undefined int64s through the projection floor) while DuckDB's x/0.0
# yields NULL — a data-dependent cross-engine divergence of the same
# class as the r3/r4 nucleus/BPE failures. Both engines now divide by a
# CASE-guarded denominator (0 -> 1), making degenerate components exact
# zero vectors; this fixture pins cross-engine parity on a rank-2,
# 6-row corpus.


@pytest.fixture(scope="module")
def rank_deficient_sf(tmp_path_factory, spark):
    import numpy as np

    d = tmp_path_factory.mktemp("rankdef_sf")
    rng = np.random.default_rng(7)
    b1, b2 = rng.standard_normal((2, 64)).astype(np.float32)
    vecs = [
        (i, [float(v) for v in (a * b1 + b * b2)], i % 3)
        for i, (a, b) in enumerate(
            [(1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (2.0, -1.0),
             (-1.0, 0.5), (0.5, 0.5)]
        )
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label long"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_pca_rank_deficient_parity(spark, rank_deficient_sf):
    import duckdb

    from hadoop_spark_pspd_spark.registry import load_all

    reg = load_all()
    for name in ("sim_pca_project", "sim_pca_whiten"):
        q = reg[name]
        sdf = q.fn(spark, rank_deficient_sf)
        srows = sorted(
            tuple(repr(_norm(v)) for v in r) for r in sdf.collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{rank_deficient_sf}/embeddings.parquet/*.parquet'"
        )
        drows = sorted(
            tuple(repr(_norm(v)) for v in r)
            for r in con.sql(q.oracle).fetchall()
        )
        con.close()
        assert len(srows) == 48, name  # 6 vecs x 8 components
        assert srows == drows, (
            name,
            next(((a, b) for a, b in zip(srows, drows) if a != b), None),
        )
        # no NaN/None leaked from the degenerate components
        assert not any("nan" in c.lower() or "None" in c
                       for row in srows for c in row), name


# --- text_seq_packing: zero-token docs + multi-window spans -------------

_PACK_DOCS = [
    # source p0: empty + whitespace-only docs (0 tokens — must be
    # DROPPED before the window explode: Spark sequence(a, b) with
    # b < a emits a phantom DESCENDING range, and the oracle's
    # range() is empty -> cross-engine divergence if unfiltered)
    (0, "", "en", "p0"),
    (1, " \t  \n ", "en", "p0"),
    (2, "one two three", "en", "p0"),
    # a 600-token doc: spans 3 windows of 256 from a non-zero offset
    (3, " ".join(f"w{i}" for i in range(600)), "en", "p0"),
    (4, "tail", "en", "p0"),
    # source p1: exactly one full window (boundary-exact doc)
    (5, " ".join(f"x{i}" for i in range(256)), "en", "p1"),
    (6, "after", "en", "p1"),
]


@pytest.fixture(scope="module")
def packing_sf(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("packing_sf")
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in _PACK_DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_seq_packing_empty_and_boundary_parity(spark, packing_sf):
    srows, drows = _run_both("text_seq_packing", spark, packing_sf)
    assert srows == drows, (
        f"first diff: "
        f"{next((a, b) for a, b in zip(srows, drows) if a != b)}"
    )
    # the zero-token docs must not appear anywhere: source p0 packs
    # 3 + 600 + 1 = 604 tokens -> windows 0..2, every window's n_docs
    # counts only non-empty docs
    import math as _m

    by_key = {}
    for r in srows:
        # columns sorted by name: bin_id, fill_tokens, n_docs,
        # n_full_docs, source, utilization
        by_key[(eval(r[4]), eval(r[0]))] = tuple(eval(x) for x in r[1:4])
    assert set(by_key) == {("p0", 0), ("p0", 1), ("p0", 2),
                           ("p1", 0), ("p1", 1)}
    # p0 window 0: doc2 (3 tok, full) + doc3 spill-in (253 of 600)
    assert by_key[("p0", 0)] == (256, 2, 1)
    # p0 window 2: doc3 tail (91 tok) + doc4 (1 tok, full) = 92
    assert by_key[("p0", 2)] == (92, 2, 1)
    # p1: doc5 fills window 0 exactly; doc6 starts window 1
    assert by_key[("p1", 0)] == (256, 1, 1)
    assert by_key[("p1", 1)] == (1, 1, 1)


# --- sim_silhouette: duplicate-centroid max(a,b)=0 guard ----------------


@pytest.fixture(scope="module")
def dup_centroid_sf(tmp_path_factory, spark):
    """16 one-hot vectors with v1 == v0: the trained quantizer keeps two
    IDENTICAL centroids (cell 1 goes empty -> carry-over), so v0/v1 hit
    a = b = 0 — the max(a,b)=0 division guard no generated corpus
    reaches (DuckDB 0/0 -> NULL vs IEEE NaN without it)."""
    d = tmp_path_factory.mktemp("dupcent_sf")
    vecs = []
    for i in range(16):
        e = [0.0] * 64
        e[0 if i <= 1 else i] = 1.0
        vecs.append((i, e, i % 3))
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label long"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_silhouette_degenerate_guard_parity(spark, dup_centroid_sf):
    import duckdb

    q = REGISTRY["sim_silhouette"]
    sdf = q.fn(spark, dup_centroid_sf)
    srows = sorted(tuple(repr(_norm(v)) for v in r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{dup_centroid_sf}/embeddings.parquet/*.parquet'"
    )
    drows = sorted(
        tuple(repr(_norm(v)) for v in r) for r in con.sql(q.oracle).fetchall()
    )
    con.close()
    assert srows == drows, (
        f"first diff: "
        f"{next((a, b) for a, b in zip(srows, drows) if a != b)}"
    )
    by_cell = {r["cell"]: r for r in sdf.collect()}
    # the duplicate pair: both members sit ON two identical centroids ->
    # guarded s = 0 exactly (an unguarded engine yields NULL/NaN here)
    assert by_cell[0]["n_members"] == 2
    assert by_cell[0]["mean_sil"] == 0.0
    # every isolated one-hot point: a = 0, b = 2 -> s = 1
    assert all(
        by_cell[c]["mean_sil"] == 1.0 for c in by_cell if c not in (0, 1)
    )


# ---------------------------------------------------------------- CDC / KMV

def test_cdc_chunks_multibyte_and_short_doc_parity(spark, adversarial_sf):
    """text_cdc_chunks on the multibyte corpus: docs shorter than the
    8-byte hash window (single-chunk path), the 0-byte doc (dropped
    identically both sides), NUL bytes, and multibyte sequences whose
    hex expansion must chunk identically in numpy and the SQL replay."""
    srows, drows = _run_both("text_cdc_chunks", spark, adversarial_sf)
    assert srows == drows, (
        f"first diff: "
        f"{next((a, b) for a, b in zip(srows, drows) if a != b)}"
    )


def test_theta_kmv_all_sources_below_window(spark, adversarial_sf):
    """Only one source has any >=8-byte doc, so the pair join is EMPTY —
    pins that both engines agree on the degenerate no-pairs result."""
    srows, drows = _run_both("sketch_theta_kmv", spark, adversarial_sf)
    assert srows == drows == []


@pytest.fixture(scope="module")
def kmv_sf(tmp_path_factory, spark):
    """Three sources with >=8-byte multibyte docs: s0/s1 share a long
    phrase (nonzero overlap), s2 is disjoint; s1 has fewer distinct
    shingles than s0 (exercises per-source theta in exact mode and the
    h < theta_min asymmetric cut)."""
    shared = "the quick brown fox jumps over the lazy dog 漢字 " * 3
    docs = [
        (0, shared + "alpha beta gamma delta", "en", "s0"),
        (1, "unique-to-s0 zzzz 👍🏽👍🏽 content here padded out", "en", "s0"),
        (2, shared + "epsilon zeta", "en", "s1"),
        (3, "совершенно другой текст без общих шинглов вообще", "ru", "s2"),
        (4, "yet more disjoint bytes ~~~~ 0123456789", "en", "s2"),
    ]
    d = tmp_path_factory.mktemp("kmv_sf")
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_theta_kmv_overlap_parity(spark, kmv_sf):
    srows, drows = _run_both("sketch_theta_kmv", spark, kmv_sf)
    assert srows == drows, (
        f"first diff: "
        f"{next((a, b) for a, b in zip(srows, drows) if a != b)}"
    )
    # semantic pins: s0/s1 share the phrase, s2 is disjoint from both
    q = REGISTRY["sketch_theta_kmv"]
    rows = {(r["source_a"], r["source_b"]): r
            for r in q.fn(spark, kmv_sf).collect()}
    assert rows[("s0", "s1")]["true_common"] > 0
    assert rows[("s0", "s1")]["sk_common"] > 0
    assert rows[("s1", "s2")]["true_common"] == 0
    assert rows[("s1", "s2")]["sk_common"] == 0


@pytest.fixture(scope="module")
def skewed_mix_sf(tmp_path_factory, spark):
    """Heavily skewed source sizes (1 / 3 / 47 docs) so the largest-
    remainder +1 actually fires and sqrt-flattening visibly reorders
    shares vs raw proportions."""
    docs = []
    i = 0
    for src, n in (("tiny", 1), ("small", 3), ("big", 47)):
        for _ in range(n):
            docs.append((i, f"doc {i} text", "en", src))
            i += 1
    d = tmp_path_factory.mktemp("skewed_mix_sf")
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_temperature_mix_skewed_parity(spark, skewed_mix_sf):
    srows, drows = _run_both("text_temperature_mix", spark, skewed_mix_sf)
    assert srows == drows, (
        f"first diff: "
        f"{next((a, b) for a, b in zip(srows, drows) if a != b)}"
    )
    q = REGISTRY["text_temperature_mix"]
    rows = {r["source"]: r for r in q.fn(spark, skewed_mix_sf).collect()}
    # allocations are integers summing exactly to the budget
    assert sum(r["alloc"] for r in rows.values()) == 10_000
    # sqrt flattening: tiny source gets MORE than its raw 1/51 share
    assert rows["tiny"]["alloc"] > 10_000 * 1 / 51
    # and big still gets the most
    assert rows["big"]["alloc"] > rows["small"]["alloc"] > rows["tiny"]["alloc"]


def test_cdc_boundary_stability_under_insertion():
    """THE content-defined-chunking property (why it beats fixed-size
    chunking for dedup): inserting bytes near the start re-aligns at the
    next content boundary, so all later chunks keep their fingerprints.
    Pure-worker check (no Spark session needed)."""
    import hashlib

    import pandas as pd

    from hadoop_spark_pspd_spark.operators.cdc import _cdc_chunk_batches

    # deterministic varied content (periodic text can dodge h%64==0
    # boundaries entirely); 2 KB of md5-chain hex -> ~34 chunks
    base = b"".join(
        hashlib.md5(str(i).encode()).hexdigest().encode()
        for i in range(64)
    )
    v2 = base[:20] + b"INSERTED" + base[20:]

    def chunks(payload):
        pdf = pd.DataFrame(
            {"source": ["s"], "text": [payload.decode("ascii")]}
        )
        out = pd.concat(list(_cdc_chunk_batches(iter([pdf]))))
        return list(out["fp"])

    a, b = chunks(base), chunks(v2)
    shared = len(set(a) & set(b))
    # all chunks after the first re-aligned boundary survive: the edit
    # can only disturb the chunk(s) covering the insertion point
    assert shared >= len(a) - 2, (len(a), len(b), shared)
    assert len(a) >= 6  # the corpus is long enough to be multi-chunk
    # contrast: fixed 64-byte chunking shifts EVERY chunk after the edit
    def fixed(payload):
        return [
            hashlib.md5(payload[i : i + 64]).hexdigest()
            for i in range(0, len(payload), 64)
        ]
    fa, fb = fixed(base), fixed(v2)
    assert len(set(fa) & set(fb)) <= 1  # only the pre-edit chunk survives


def test_theta_kmv_sketches_are_mergeable():
    """The 100 TB property: a KMV sketch of A ∪ B is exactly the k
    smallest of (sketch(A) ∪ sketch(B)) — per-partition sketches merge
    associatively with no second pass over the data. Pure-python check
    against the op's md5-derived 52-bit hash."""
    import hashlib

    K = 64

    def h(item: str) -> int:
        return int(hashlib.md5(item.encode()).hexdigest()[:13], 16)

    def kmv(items):
        hs = sorted({h(x) for x in items})
        return hs[:K]

    a = {f"shingle-a-{i}" for i in range(500)}
    b = {f"shingle-b-{i}" for i in range(300)} | {
        f"shingle-a-{i}" for i in range(100)
    }
    merged = sorted(set(kmv(a)) | set(kmv(b)))[:K]
    assert merged == kmv(a | b)


# ------------------------------------------------------- mm_image_phash
# The generated corpora plant INSERTION near-dups (lengths differ by a
# few bytes), which no positional image hash survives — so at sf0.01 the
# phash query legitimately returns 0 pairs. This fixture supplies the
# media analog the generator never produces: same-length payloads with a
# few substituted bytes ("pixel noise"), where the aHash must both find
# the pair and hash-match the oracle. Also pins: byte-definedness on
# non-ASCII payloads, the <64-byte drop, and the flat-payload (all bits
# zero under strict >) degenerate pair.


@pytest.fixture(scope="module")
def phash_sf(tmp_path_factory, spark):
    base = "".join(chr(33 + (i * 7) % 90) for i in range(512))
    noisy = list(base)
    for pos in (37, 200, 450):  # 3 substituted "pixels"
        noisy[pos] = "~" if base[pos] != "~" else "!"
    noisy = "".join(noisy)
    other = "".join(chr(33 + (i * i * 13) % 90) for i in range(480))
    docs = [
        (0, base, "en", "s0"),
        (1, noisy, "en", "s0"),          # near-dup of 0 (substitutions)
        (2, other, "en", "s0"),          # unrelated
        (3, "short", "en", "s0"),        # < 64 B, dropped
        (4, "👍🏽漢" * 40, "zh", "s1"),    # multibyte: 440 B / 120 cp
        (5, "a" * 128, "en", "s1"),      # flat payload -> all-zero hash
        (6, "b" * 96, "en", "s1"),       # flat payload -> all-zero hash
    ]
    d = tmp_path_factory.mktemp("phash_sf")
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_image_phash_noise_pair_parity(spark, phash_sf):
    srows, drows = _run_both("mm_image_phash", spark, phash_sf)
    assert srows == drows, (
        f"first diff: "
        f"{next((a, b) for a, b in zip(srows, drows) if a != b)}"
    )
    # cols sorted by name: (doc_a, doc_b, hamming)
    pairs = {(r[0], r[1]): r[2] for r in srows}
    assert ("0", "1") in pairs, f"noise pair not found: {sorted(pairs)}"
    assert ("5", "6") in pairs and pairs[("5", "6")] == "0", (
        "flat payloads must share the all-zero hash"
    )
    assert all(a != "3" and b != "3" for a, b in pairs), "short doc leaked"
