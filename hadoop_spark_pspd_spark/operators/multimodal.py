"""Multimodal column plumbing (north-star surface).

Image/audio/video are treated as opaque ``binary`` payloads with typed
metadata. The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partitioning — is real and tested. Decode backends
(``decode_media``): ``stdlib`` REALLY decodes PNG (zlib inflate +
scanline de-filter, functions/media_codecs.py) and WAV (wave module)
with zero third-party deps — exercised end to end by the oracled
queries in operators/media_decode.py; ``pil`` covers long-tail image
formats on clusters with Pillow (env-gated tests); the deterministic
byte-length ``fake`` remains for the queries whose oracles predate the
real codecs (it keeps hashes independent of any codec).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Tables
from ..registry import register

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, first_byte int, payload_md5 string, "
    "fake_width int, fake_height int"
)


def decode_media(
    payload: bytes, kind: str = "image", fake: bool = False,
    backend: str | None = None,
):
    """Decode a media payload. Backend selection mirrors the external-
    Kafka seam ($PSPD_KAFKA_BOOTSTRAP -> real broker):
    ``PSPD_MEDIA_DECODE=stdlib`` (or ``backend="stdlib"``) decodes REAL
    bytes with zero third-party deps — PNG via the zlib+struct codec in
    functions/media_codecs.py, WAV via the stdlib wave module — and
    runs end to end in this sandbox (oracled queries:
    mm_png_decode_stats / mm_wav_decode_stats). ``PSPD_MEDIA_DECODE=
    pil`` routes images through Pillow on clusters that have it (long-
    tail formats: JPEG, interlaced/palette PNG, 16-bit). The legacy
    deterministic byte-length fake remains for queries whose oracles
    predate the real codecs. Env-gated PIL coverage:
    tests/test_media_external.py."""
    import os

    if backend is None and not fake:
        backend = os.environ.get("PSPD_MEDIA_DECODE")
    if fake or backend in (None, "fake"):
        if not fake and backend is None:
            raise NotImplementedError(
                "no media decode backend selected; pass fake=True for "
                "the deterministic stub, or set PSPD_MEDIA_DECODE="
                "stdlib (PNG/WAV, zero deps) or =pil (Pillow)"
            )
        n = len(payload)
        return {"width": n % 640, "height": (n * 7) % 480}
    if backend == "stdlib":
        from ..functions.media_codecs import decode_png, decode_wav

        if kind == "image":
            dec = decode_png(payload)
            return {"width": dec["width"], "height": dec["height"]}
        if kind == "audio":
            dec = decode_wav(payload)
            return {
                "n_frames": dec["n_frames"],
                "sample_rate": dec["sample_rate"],
                "channels": dec["channels"],
            }
        raise NotImplementedError(
            f"stdlib backend decodes image(PNG)/audio(WAV), not {kind!r}"
        )
    if backend == "pil":
        if kind != "image":
            raise NotImplementedError(
                f"PIL backend decodes images only, not {kind!r}"
            )
        import io

        from PIL import Image  # import-gated: only on the real path

        with Image.open(io.BytesIO(payload)) as im:
            return {"width": im.width, "height": im.height}
    raise ValueError(f"unknown media decode backend {backend!r}")


REAL_DIMS_SCHEMA = "doc_id bigint, width int, height int"


def media_dimensions(df: DataFrame, backend: str | None = None) -> DataFrame:
    """(doc_id, payload: binary) -> real decoded (width, height) via the
    selected backend inside the SAME Arrow-batched mapInPandas plumbing
    the fake pipeline uses. backend="stdlib" (PNG) runs fully in this
    sandbox; "pil" is the long-tail-format seam a real cluster flips on
    with PSPD_MEDIA_DECODE=pil. Not registered directly — the oracled
    decode coverage lives in operators/media_decode.py, where the
    payload content is SQL-predictable."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                decode_media(p, kind="image", backend=backend)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series(
                        [d["width"] for d in dims], dtype="int32"
                    ),
                    "height": pd.Series(
                        [d["height"] for d in dims], dtype="int32"
                    ),
                }
            )

    return df.mapInPandas(_decode, schema=REAL_DIMS_SCHEMA)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        payloads = pdf["payload"]
        decoded = [decode_media(p, fake=True) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1
                ).astype("int32"),
                "payload_md5": payloads.map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
                "fake_width": pd.Series(
                    [d["width"] for d in decoded], dtype="int32"
                ),
                "fake_height": pd.Series(
                    [d["height"] for d in decoded], dtype="int32"
                ),
            }
        )


def binary_features(df: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) -> typed feature columns via mapInPandas."""
    return df.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


@register(
    "mm_binary_features",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(CASE WHEN length(text) > 0 THEN ascii(text) ELSE -1 END
                    AS INTEGER) AS first_byte,
               md5(text) AS payload_md5,
               CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
               CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER)
                   AS fake_height
        FROM documents
    """,
    doc="Binary-column feature extraction over mapInPandas (Arrow batches); "
        "documents.text utf-8-encoded stands in for the media payload. "
        "Decode stage is the deterministic fake (real decode stubbed).",
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payloads = t.documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return binary_features(payloads)


FRAME_SIZE = 64
FRAME_STRIDE = 2  # sample every 2nd frame

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame_md5 string"


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: treat each payload as a fixed-size frame
    sequence ('video'), emit every FRAME_STRIDE-th frame's digest."""
    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = (len(payload) + FRAME_SIZE - 1) // FRAME_SIZE
            for i in range(0, n_frames, FRAME_STRIDE):
                frame = payload[i * FRAME_SIZE : (i + 1) * FRAME_SIZE]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_len"].append(len(frame))
                out["frame_md5"].append(hashlib.md5(frame).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "frame_len": pd.Series(out["frame_len"], dtype="int32"),
                "frame_md5": pd.Series(out["frame_md5"], dtype="object"),
            }
        )


def sample_frames(df: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) -> one row per sampled frame."""
    return df.mapInPandas(_sample_frames, schema=FRAME_SCHEMA)


@register(
    "mm_frame_sample",
    oracle=f"""
        SELECT doc_id,
               CAST(g AS INTEGER) AS frame_idx,
               CAST(length(substring(text, g * {FRAME_SIZE} + 1,
                                     {FRAME_SIZE})) AS INTEGER) AS frame_len,
               md5(substring(text, g * {FRAME_SIZE} + 1, {FRAME_SIZE}))
                   AS frame_md5
        FROM documents, generate_series(0, 1000, {FRAME_STRIDE}) t(g)
        WHERE g * {FRAME_SIZE} < length(text)
    """,
    doc="Frame sampling over an opaque binary 'video' column: mapInPandas "
        "slices each payload into 64-byte frames and keeps every 2nd one. "
        "documents.text is pure ASCII at every sf, so the SQL oracle's "
        "char-substring equals the Python byte slicing. The 0..1000 "
        "constant series stands in for a lateral generate_series (DuckDB "
        "lacks lateral table-function args); the WHERE prunes it per doc.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payloads = t.documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return sample_frames(payloads)


RESIZE_SCHEMA = (
    "doc_id bigint, in_w int, in_h int, out_w int, out_h int"
)
RESIZE_TARGET_W = 64


def _resize_dims(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: fake-decode dims, then aspect-preserving
    fit-to-width-64 resize (the geometry a real PIL thumbnail would use;
    actual pixel resampling is behind the decode stub)."""
    import math

    for pdf in batches:
        rows = {"doc_id": [], "in_w": [], "in_h": [], "out_w": [], "out_h": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            d = decode_media(payload, fake=True)
            w, h = d["width"], d["height"]
            out_h = int(math.floor(h * float(RESIZE_TARGET_W) / max(w, 1)))
            rows["doc_id"].append(doc_id)
            rows["in_w"].append(w)
            rows["in_h"].append(h)
            rows["out_w"].append(RESIZE_TARGET_W)
            rows["out_h"].append(out_h)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "in_w": pd.Series(rows["in_w"], dtype="int32"),
                "in_h": pd.Series(rows["in_h"], dtype="int32"),
                "out_w": pd.Series(rows["out_w"], dtype="int32"),
                "out_h": pd.Series(rows["out_h"], dtype="int32"),
            }
        )


def resize_dims(df: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) -> input + fit-to-width-64 output dims."""
    return df.mapInPandas(_resize_dims, schema=RESIZE_SCHEMA)


@register(
    "mm_resize",
    oracle=f"""
        SELECT doc_id,
               CAST(octet_length(encode(text)) % 640 AS INTEGER) AS in_w,
               CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS in_h,
               CAST({RESIZE_TARGET_W} AS INTEGER) AS out_w,
               CAST(floor(((octet_length(encode(text)) * 7) % 480)
                          * {RESIZE_TARGET_W}.0
                          / greatest(octet_length(encode(text)) % 640, 1))
                    AS INTEGER) AS out_h
        FROM documents
    """,
    doc="Aspect-preserving resize geometry over the fake-decoded dims via "
        "mapInPandas — h*64.0/max(w,1) is one exact int-product double "
        "division, floor'd, identical in numpy-free Python and SQL. The "
        "pixel resampling itself sits behind the decode stub.",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payloads = t.documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return resize_dims(payloads)


# ------------------------------------------------------------------ audio

AUDIO_WIN = 256  # samples per analysis window (full windows only)

AUDIO_SCHEMA = (
    "doc_id bigint, n_windows bigint, total_energy bigint, "
    "max_window_energy bigint, peak_abs bigint, rms double"
)


def _audio_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: payload bytes as unsigned 8-bit PCM centered
    at 128; per full 256-sample window sum-of-squares energy and peak.

    numpy int64 sums are exact (order-free); the one double is
    sqrt(total/(n*256)) — both operands exact ints, so the division and
    sqrt are single correctly-rounded IEEE ops identical to DuckDB's.
    """
    import math

    import numpy as np

    for pdf in batches:
        rows = {k: [] for k in (
            "doc_id", "n_windows", "total_energy", "max_window_energy",
            "peak_abs", "rms",
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            nw = n // AUDIO_WIN
            if nw == 0:
                continue
            arr = (
                np.frombuffer(payload[: nw * AUDIO_WIN], dtype=np.uint8)
                .astype(np.int64)
                .reshape(nw, AUDIO_WIN)
                - 128
            )
            energy = (arr * arr).sum(axis=1)
            total = int(energy.sum())
            rows["doc_id"].append(doc_id)
            rows["n_windows"].append(nw)
            rows["total_energy"].append(total)
            rows["max_window_energy"].append(int(energy.max()))
            rows["peak_abs"].append(int(np.abs(arr).max()))
            rows["rms"].append(math.sqrt(total / (nw * AUDIO_WIN)))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "n_windows": pd.Series(rows["n_windows"], dtype="int64"),
                "total_energy": pd.Series(
                    rows["total_energy"], dtype="int64"
                ),
                "max_window_energy": pd.Series(
                    rows["max_window_energy"], dtype="int64"
                ),
                "peak_abs": pd.Series(rows["peak_abs"], dtype="int64"),
                "rms": pd.Series(rows["rms"], dtype="float64"),
            }
        )


def audio_energy(df: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) -> windowed energy features."""
    return df.mapInPandas(_audio_energy, schema=AUDIO_SCHEMA)


@register(
    "mm_audio_energy",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents WHERE strlen(text) >= {AUDIO_WIN}
        ), pos AS (
            SELECT doc_id,
                   CAST(unnest(range(1, (n // {AUDIO_WIN}) * {AUDIO_WIN} + 1))
                        AS BIGINT) AS pos
            FROM d
        ), v AS MATERIALIZED (
            SELECT p.doc_id, (p.pos - 1) // {AUDIO_WIN} AS win,
                   CAST(CAST(('0x' || substr(d.hx,
                        CAST(2 * p.pos - 1 AS INTEGER), 2)) AS UBIGINT)
                        AS BIGINT) - 128 AS s
            FROM pos p JOIN d USING (doc_id)
        ), w AS (
            SELECT doc_id, win, CAST(SUM(s * s) AS BIGINT) AS energy,
                   CAST(MAX(abs(s)) AS BIGINT) AS peak
            FROM v GROUP BY doc_id, win
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(energy) AS BIGINT) AS total_energy,
               CAST(MAX(energy) AS BIGINT) AS max_window_energy,
               CAST(MAX(peak) AS BIGINT) AS peak_abs,
               sqrt(CAST(SUM(energy) AS BIGINT)
                    / CAST(COUNT(*) * {AUDIO_WIN} AS BIGINT)) AS rms
        FROM w GROUP BY doc_id
    """,
    doc="Audio-style feature extraction over the opaque binary payload: "
        "bytes as unsigned 8-bit PCM centered at 128, non-overlapping "
        "256-sample windows, per-window sum-of-squares energy and peak "
        "amplitude, per-doc totals and RMS. Spark side is one linear "
        "mapInPandas numpy scan (the 100 TB path — no per-sample rows); "
        "the oracle replays the identical windows relationally from the "
        "hex expansion. All sums exact int64; rms is "
        "sqrt(exact_int / exact_int), correctly rounded identically in "
        "numpy and DuckDB. Real audio decode (codec frames -> PCM) sits "
        "behind the decode_media stub like the image/video ops.",
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payloads = t.documents.filter(
        F.octet_length("text") >= AUDIO_WIN
    ).select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return audio_energy(payloads)


# ------------------------------------------------------- perceptual hash

PHASH_CELLS = 64   # 8x8 "image" -> 64-bit average hash
PHASH_BANDS = 4    # 4x16-bit LSH bands for the candidate join
PHASH_MAX_HAMMING = 6
# cross-multiplied mean test needs 255*n^2 < 2^63 -> n < ~1.9e8; cap at
# 2^26 bytes (67 MB) in BOTH engines so numpy can't wrap / DuckDB can't raise
PHASH_MAX_BYTES = 1 << 26

PHASH_SCHEMA = "doc_id bigint, b0 bigint, b1 bigint, b2 bigint, b3 bigint"


def _ahash_bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: 64-bit average hash over the payload bytes.

    Cell i covers bytes {j : j*64 // n == i} (the same closed-form both
    the oracle and this side use — NOT prefix-floor boundaries, which
    disagree with the closed form when i*n % 64 != 0). Bit i is the
    exact integer comparison cell_sum*n > total*cell_count — a
    cross-multiplied mean test, so no doubles anywhere.
    """
    import numpy as np

    shifts = np.arange(16, dtype=np.int64)
    for pdf in batches:
        rows = {"doc_id": [], "b0": [], "b1": [], "b2": [], "b3": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            if n < PHASH_CELLS or n >= PHASH_MAX_BYTES:
                continue
            vals = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            prefix = np.concatenate(([0], np.cumsum(vals)))
            i = np.arange(PHASH_CELLS + 1, dtype=np.int64)
            # first byte of cell i is ceil(i*n/64); exact int64 arithmetic
            starts = (i * n + PHASH_CELLS - 1) // PHASH_CELLS
            cs = prefix[starts[1:]] - prefix[starts[:-1]]
            cc = starts[1:] - starts[:-1]
            total = int(prefix[n])
            bits = ((cs * n) > (total * cc)).astype(np.int64)
            rows["doc_id"].append(doc_id)
            for c in range(PHASH_BANDS):
                chunk = bits[16 * c : 16 * c + 16]
                rows[f"b{c}"].append(int((chunk << shifts).sum()))
        yield pd.DataFrame(
            {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
        )


def ahash_bands(df: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) -> four 16-bit average-hash bands."""
    return df.mapInPandas(_ahash_bands, schema=PHASH_SCHEMA)


def _phash_oracle() -> str:
    band_exprs = ",\n               ".join(
        f"CAST(SUM(CASE WHEN cell // 16 = {c} THEN bit << "
        f"CAST(cell % 16 AS INTEGER) ELSE 0 END) AS BIGINT) AS b{c}"
        for c in range(PHASH_BANDS)
    )
    ham = " + ".join(
        f"bit_count(xor(a.b{c}, b.b{c}))" for c in range(PHASH_BANDS)
    )
    band_eq = " OR ".join(f"a.b{c} = b.b{c}" for c in range(PHASH_BANDS))
    return f"""
        WITH d AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents WHERE strlen(text) >= {PHASH_CELLS}
                              AND strlen(text) < {PHASH_MAX_BYTES}
        ), pos AS (
            SELECT doc_id, CAST(unnest(range(1, n + 1)) AS BIGINT) AS pos
            FROM d
        ), v AS MATERIALIZED (
            SELECT p.doc_id,
                   ((p.pos - 1) * {PHASH_CELLS}) // d.n AS cell,
                   CAST(CAST(('0x' || substr(d.hx,
                        CAST(2 * p.pos - 1 AS INTEGER), 2)) AS UBIGINT)
                        AS BIGINT) AS s
            FROM pos p JOIN d ON p.doc_id = d.doc_id
        ), w AS (
            SELECT doc_id, cell, CAST(SUM(s) AS BIGINT) AS cs,
                   CAST(COUNT(*) AS BIGINT) AS cc
            FROM v GROUP BY doc_id, cell
        ), tot AS (
            SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS total
            FROM w GROUP BY doc_id
        ), bits AS (
            SELECT w.doc_id, w.cell,
                   CASE WHEN w.cs * d.n > t.total * w.cc
                        THEN 1 ELSE 0 END AS bit
            FROM w JOIN d ON w.doc_id = d.doc_id
                   JOIN tot t ON w.doc_id = t.doc_id
        ), bands AS (
            SELECT doc_id,
               {band_exprs}
            FROM bits GROUP BY doc_id
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST({ham} AS INTEGER) AS hamming
        FROM bands a JOIN bands b
          ON a.doc_id < b.doc_id AND ({band_eq})
        WHERE {ham} <= {PHASH_MAX_HAMMING}
    """


@register(
    "mm_image_phash",
    oracle=_phash_oracle(),
    doc="Perceptual near-dup detection over opaque binary 'image' "
        "payloads: a 64-bit average hash (8x8 cells over the byte "
        "stream; bit = cell mean above global mean, tested as the exact "
        "cross-multiplied integer comparison cell_sum*n > total*count, "
        "so no doubles exist anywhere in the pipeline), then 4x16-bit "
        "band LSH for candidates and popcount Hamming <= 6 to confirm. "
        "RECALL CONTRACT: pairs within Hamming 3 are GUARANTEED "
        "(pigeonhole over 4 bands); distance 4-6 pairs are best-effort "
        "— reported iff the bit errors leave at least one band intact "
        "(Spark and the oracle share the identical band join, so the "
        "hash gate is unaffected). Payloads are capped at 2^26 bytes in "
        "both engines so the cross-multiplied test cell_sum*n <= "
        "255*n^2 < 2^63 can never overflow int64 (numpy would wrap "
        "silently; DuckDB would raise). "
        "The hash derivation is one linear numpy scan per payload via "
        "mapInPandas (the 100 TB path); the candidate join is the same "
        "banded equi-join as dedup_simhash. Real pixel decode sits "
        "behind the decode_media stub; the byte stream stands in for "
        "the decoded grayscale raster.",
)
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce as _reduce

    t = Tables(spark, sf_dir)
    payloads = t.documents.filter(
        (F.octet_length("text") >= PHASH_CELLS)
        & (F.octet_length("text") < PHASH_MAX_BYTES)
    ).select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    hashes = ahash_bands(payloads).cache()
    stack_expr = ", ".join(f"{c}, b{c}" for c in range(PHASH_BANDS))
    melted = hashes.selectExpr(
        "doc_id", f"stack({PHASH_BANDS}, {stack_expr}) AS (band_idx, bv)"
    )
    a = melted.alias("a")
    b = melted.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ha = hashes.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{c}").alias(f"a{c}") for c in range(PHASH_BANDS)],
    )
    hb = hashes.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{c}").alias(f"bb{c}") for c in range(PHASH_BANDS)],
    )
    ham = _reduce(
        lambda x, y: x + y,
        [
            F.bit_count(F.col(f"a{c}").bitwiseXOR(F.col(f"bb{c}")))
            for c in range(PHASH_BANDS)
        ],
    ).cast("int")
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
    )


# --------------------------------------------------- video shot detection

SHOT_FRAME = 64       # bytes per fake frame (matches mm_frame_sample)
SHOT_THRESHOLD = 96   # |sig_t - sig_{t-1}| > threshold -> shot boundary

SHOT_SCHEMA = (
    "doc_id bigint, n_frames bigint, n_shots bigint, "
    "longest_shot bigint, first_boundary bigint"
)


def _shot_boundaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: payload = fake 'video' of SHOT_FRAME-byte
    frames (full frames only). Frame signature = byte sum; a shot
    boundary sits before frame t when |sig_t - sig_{t-1}| > threshold.
    All arithmetic is int64 — exact, order-free."""
    import numpy as np

    for pdf in batches:
        rows = {k: [] for k in (
            "doc_id", "n_frames", "n_shots", "longest_shot",
            "first_boundary",
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            nf = len(payload) // SHOT_FRAME
            if nf == 0:
                continue
            sig = (
                np.frombuffer(payload[: nf * SHOT_FRAME], dtype=np.uint8)
                .astype(np.int64)
                .reshape(nf, SHOT_FRAME)
                .sum(axis=1)
            )
            jumps = np.abs(np.diff(sig)) > SHOT_THRESHOLD
            bounds = np.flatnonzero(jumps) + 1  # frame idx starting a shot
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [nf]))
            rows["doc_id"].append(doc_id)
            rows["n_frames"].append(nf)
            rows["n_shots"].append(len(starts))
            rows["longest_shot"].append(int((ends - starts).max()))
            rows["first_boundary"].append(
                int(bounds[0]) if len(bounds) else -1
            )
        yield pd.DataFrame(
            {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
        )


def shot_boundaries(df: DataFrame) -> DataFrame:
    """(doc_id, payload: binary) -> per-doc shot segmentation stats."""
    return df.mapInPandas(_shot_boundaries, schema=SHOT_SCHEMA)


@register(
    "mm_video_shot_boundaries",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents WHERE strlen(text) >= {SHOT_FRAME}
        ), pos AS (
            SELECT doc_id,
                   CAST(unnest(range(1, (n // {SHOT_FRAME}) * {SHOT_FRAME} + 1))
                        AS BIGINT) AS pos
            FROM d
        ), v AS MATERIALIZED (
            SELECT p.doc_id, (p.pos - 1) // {SHOT_FRAME} AS frame,
                   CAST(CAST(('0x' || substr(d.hx,
                        CAST(2 * p.pos - 1 AS INTEGER), 2)) AS UBIGINT)
                        AS BIGINT) AS s
            FROM pos p JOIN d ON p.doc_id = d.doc_id
        ), sig AS (
            SELECT doc_id, frame, CAST(SUM(s) AS BIGINT) AS sig
            FROM v GROUP BY doc_id, frame
        ), jump AS (
            SELECT doc_id, frame,
                   CASE WHEN frame = 0 THEN 1
                        WHEN abs(sig - lag(sig) OVER (
                                 PARTITION BY doc_id ORDER BY frame))
                             > {SHOT_THRESHOLD} THEN 1
                        ELSE 0 END AS is_start
            FROM sig
        ), shots AS (
            SELECT doc_id, frame AS start_frame,
                   COALESCE(lead(frame) OVER (
                       PARTITION BY doc_id ORDER BY frame), nf.n_frames)
                       - frame AS shot_len
            FROM (SELECT doc_id, frame FROM jump WHERE is_start = 1) j
            JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames
                  FROM sig GROUP BY doc_id) nf USING (doc_id)
        )
        SELECT s.doc_id,
               nf.n_frames,
               CAST(COUNT(*) AS BIGINT) AS n_shots,
               CAST(MAX(s.shot_len) AS BIGINT) AS longest_shot,
               CAST(COALESCE(MIN(CASE WHEN s.start_frame > 0
                                      THEN s.start_frame END), -1)
                    AS BIGINT) AS first_boundary
        FROM shots s
        JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames
              FROM sig GROUP BY doc_id) nf ON s.doc_id = nf.doc_id
        GROUP BY s.doc_id, nf.n_frames
    """,
    doc="Shot-boundary detection over an opaque binary 'video' column: "
        "frames are 64-byte slices, frame signature = exact int byte "
        "sum, a new shot starts where the signature jumps by more than "
        f"{SHOT_THRESHOLD}. Emits per-doc frame/shot counts, longest "
        "shot run, and the first boundary index. One linear mapInPandas "
        "numpy scan per payload (the 100 TB path); the oracle rebuilds "
        "the identical segmentation relationally with window lag/lead "
        "over the per-frame sums. Real codec decode sits behind the "
        "decode_media stub.",
)
def mm_video_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payloads = t.documents.filter(
        F.octet_length("text") >= SHOT_FRAME
    ).select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return shot_boundaries(payloads)


# ------------------------------------------------------- VAD segmentation

VAD_SCHEMA = (
    "doc_id bigint, n_windows bigint, active_windows bigint, "
    "n_segments bigint, longest_run bigint, first_active_win bigint"
)


def _audio_vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: energy-gated activity segmentation, one linear
    numpy scan per payload. A window is ACTIVE iff its energy exceeds
    the payload's mean window energy by the exact cross-multiplied test
    energy * n_windows > total_energy (all int64 — no data-derived
    division anywhere), then consecutive active windows merge into
    segments."""
    import numpy as np

    for pdf in batches:
        out = {k: [] for k in (
            "doc_id", "n_windows", "active_windows", "n_segments",
            "longest_run", "first_active_win",
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = (len(payload) // AUDIO_WIN) * AUDIO_WIN
            if n == 0:
                continue
            s = (
                np.frombuffer(payload[:n], dtype=np.uint8)
                .astype(np.int64) - 128
            )
            e = (s * s).reshape(-1, AUDIO_WIN).sum(axis=1)
            nw = len(e)
            active = e * nw > e.sum()
            idx = np.nonzero(active)[0]
            if len(idx):
                starts = np.diff(idx, prepend=idx[0] - 2) > 1
                seg_ids = np.cumsum(starts)
                lens = np.bincount(seg_ids)[1:]
                n_seg, longest, first = int(seg_ids[-1]), int(lens.max()), int(idx[0])
            else:
                n_seg, longest, first = 0, 0, -1
            out["doc_id"].append(doc_id)
            out["n_windows"].append(nw)
            out["active_windows"].append(int(active.sum()))
            out["n_segments"].append(n_seg)
            out["longest_run"].append(longest)
            out["first_active_win"].append(first)
        yield pd.DataFrame(
            {k: pd.Series(v, dtype="int64") for k, v in out.items()}
        )


@register(
    "mm_audio_vad",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents WHERE strlen(text) >= {AUDIO_WIN}
        ), pos AS (
            SELECT doc_id,
                   CAST(unnest(range(1, (n // {AUDIO_WIN}) * {AUDIO_WIN} + 1))
                        AS BIGINT) AS pos
            FROM d
        ), v AS MATERIALIZED (
            SELECT p.doc_id, (p.pos - 1) // {AUDIO_WIN} AS win,
                   CAST(CAST(('0x' || substr(d.hx,
                        CAST(2 * p.pos - 1 AS INTEGER), 2)) AS UBIGINT)
                        AS BIGINT) - 128 AS s
            FROM pos p JOIN d USING (doc_id)
        ), w AS MATERIALIZED (
            SELECT doc_id, win, CAST(SUM(s * s) AS BIGINT) AS energy
            FROM v GROUP BY doc_id, win
        ), tot AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nw,
                   CAST(SUM(energy) AS BIGINT) AS total
            FROM w GROUP BY doc_id
        ), act AS (
            SELECT w.doc_id, w.win
            FROM w JOIN tot USING (doc_id)
            WHERE w.energy * tot.nw > tot.total
        ), seg AS (
            SELECT doc_id, win,
                   win - row_number() OVER (PARTITION BY doc_id
                                            ORDER BY win) AS g
            FROM act
        ), segs AS (
            SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS len,
                   CAST(MIN(win) AS BIGINT) AS s0
            FROM seg GROUP BY doc_id, g
        ), per_doc AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
                   CAST(SUM(len) AS BIGINT) AS active_windows,
                   CAST(MAX(len) AS BIGINT) AS longest_run,
                   CAST(MIN(s0) AS BIGINT) AS first_active_win
            FROM segs GROUP BY doc_id
        )
        SELECT t.doc_id, t.nw AS n_windows,
               COALESCE(p.active_windows, 0) AS active_windows,
               COALESCE(p.n_segments, 0) AS n_segments,
               COALESCE(p.longest_run, 0) AS longest_run,
               COALESCE(p.first_active_win, -1) AS first_active_win
        FROM tot t LEFT JOIN per_doc p USING (doc_id)
    """,
    doc="Voice-activity-detection segmentation over the opaque audio "
        "payload (bytes as unsigned 8-bit PCM, 256-sample windows, the "
        "mm_audio_energy framing): a window is active iff its energy "
        "exceeds the payload mean by the exact cross-multiplied integer "
        "test energy*n > total (no data-derived division — the r5 "
        "zero-guard class never arises), consecutive active windows "
        "merge into segments (gap-islands), per-doc segment stats "
        "emitted. Spark side is one linear map-only numpy scan (zero "
        "Exchange before the output); the oracle replays windows "
        "relationally and the islands via a row_number difference. All "
        "integers end to end.",
)
def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payloads = t.documents.filter(
        F.octet_length("text") >= AUDIO_WIN
    ).select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return payloads.mapInPandas(_audio_vad, schema=VAD_SCHEMA)


TILE_BYTES = 64  # one "8x8 pixel block" of the opaque payload


@register(
    "mm_image_tiles",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   strlen(text) // {TILE_BYTES} AS n_tiles
            FROM documents WHERE strlen(text) >= {TILE_BYTES}
        ), pos AS (
            SELECT doc_id, hx, unnest(range(0, n_tiles)) AS i
            FROM d
        ), tiles AS (
            SELECT doc_id,
                   md5(substr(hx, CAST(i * {TILE_BYTES * 2} + 1 AS INTEGER),
                       {TILE_BYTES * 2})) AS fp
            FROM pos
        ), dupfp AS (
            SELECT fp FROM tiles
            GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
        ), per_doc AS (
            SELECT t.doc_id,
                   CAST(SUM(CASE WHEN f.fp IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_tiles
            FROM tiles t LEFT JOIN dupfp f USING (fp)
            GROUP BY t.doc_id
        )
        SELECT d.doc_id, CAST(d.n_tiles AS BIGINT) AS n_tiles,
               p.n_dup_tiles,
               CAST(p.n_dup_tiles AS DOUBLE)
                   / CAST(d.n_tiles AS DOUBLE) AS dup_frac
        FROM d JOIN per_doc p USING (doc_id)
    """,
    doc="Sub-image tile dedup — the watermark/logo/borrowed-crop "
        "detector an image-corpus curation pipeline runs BELOW whole-"
        "image hashing: the opaque payload (utf-8 bytes standing in for "
        "the decoded raster, the mm_binary_features convention) splits "
        "into fixed 64-byte tiles (8x8 pixel blocks), each tile "
        "fingerprinted with md5; a tile is duplicated when its "
        "fingerprint appears in >= 2 DISTINCT documents, and each doc "
        "reports its duplicated-tile count and fraction. Byte-defined "
        "cross-engine (octet_length == DuckDB strlen; tiles sliced from "
        "the hex encoding at 128-char stride). Plan: linear tile "
        "explode (bounded 2x blowup of the scan), one fingerprint "
        "groupBy, one broadcast-size semi-join back — no pairwise "
        "comparison ever materializes, so 100 TB of images cost two "
        "shuffles of tile-row volume.",
    tags=("multimodal", "dedup"),
)
def mm_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    d = (
        t.documents.filter(F.octet_length("text") >= TILE_BYTES)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.hex(F.encode("text", "utf-8")).alias("hx"),
            F.expr(
                f"CAST(octet_length(text) AS BIGINT) div {TILE_BYTES}"
            ).alias("n_tiles"),
        )
    )
    tiles = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_tiles") - 1),
                lambda i: F.md5(
                    F.col("hx").substr(
                        i * (TILE_BYTES * 2) + 1, F.lit(TILE_BYTES * 2)
                    )
                ),
            )
        ).alias("fp"),
    )
    dupfp = (
        tiles.groupBy("fp")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("fp")
    )
    per_doc = (
        tiles.join(dupfp, "fp", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_tiles"))
    )
    return (
        d.select("doc_id", "n_tiles")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tiles",
            F.coalesce("n_dup_tiles", F.lit(0)).alias("n_dup_tiles"),
            (
                F.coalesce("n_dup_tiles", F.lit(0)).cast("double")
                / F.col("n_tiles").cast("double")
            ).alias("dup_frac"),
        )
    )


@register(
    "mm_byte_chisq",
    oracle="""
        WITH d AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents WHERE strlen(text) >= 1
        ), bytes AS (
            SELECT doc_id, n,
                   substr(hx, CAST(2 * i - 1 AS INTEGER), 2) AS bp
            FROM (SELECT doc_id, hx, n, unnest(range(1, n + 1)) AS i
                  FROM d)
        ), hist AS (
            SELECT doc_id, n, bp, CAST(count(*) AS BIGINT) AS c
            FROM bytes GROUP BY doc_id, n, bp
        )
        SELECT doc_id, n,
               CAST(256 * SUM(c * c) - n * n AS BIGINT) AS chisq_key,
               CAST(256 * SUM(c * c) - n * n AS DOUBLE)
                   / CAST(n AS DOUBLE) AS chisq,
               CAST(count(*) AS BIGINT) AS n_distinct_bytes
        FROM hist GROUP BY doc_id, n
    """,
    doc="Byte-histogram chi-square uniformity statistic per payload — "
        "the compressibility screen a media-ingest pipeline runs BEFORE "
        "spending decode/transcode CPU: already-compressed or encrypted "
        "blobs have near-uniform byte histograms (chisq ~ 255), "
        "structured/text payloads score orders of magnitude higher. "
        "The statistic collapses to pure integers: chi2 = "
        "(256*sum(c_b^2) - n^2)/n, exact in int64 for payloads to 2^26 "
        "bytes (sum c^2 <= n^2 <= 2^52, x256 < 2^63), one final "
        "division. Spark side is a single Arrow-batched mapInPandas "
        "numpy bincount — map-only, zero shuffles, the oracle replays "
        "the histogram relationally over hex pairs.",
    tags=("multimodal",),
)
def mm_byte_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    t = Tables(spark, sf_dir)
    payloads = t.documents.filter(F.octet_length("text") >= 1).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def _chisq(batches):
        import numpy as np

        for pdf in batches:
            ids, ns, keys, chis, nd = [], [], [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                n = int(arr.size)
                c = np.bincount(arr, minlength=256).astype(np.int64)
                ssq = int((c * c).sum())
                key = 256 * ssq - n * n
                ids.append(did)
                ns.append(n)
                keys.append(key)
                chis.append(float(key) / float(n))
                nd.append(int((c > 0).sum()))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "n": pd.Series(ns, dtype="int64"),
                 "chisq_key": pd.Series(keys, dtype="int64"),
                 "chisq": pd.Series(chis, dtype="float64"),
                 "n_distinct_bytes": pd.Series(nd, dtype="int64")}
            )

    return payloads.mapInPandas(
        _chisq,
        "doc_id long, n long, chisq_key long, chisq double, "
        "n_distinct_bytes long",
    )


_VID_JACCARD = 0.5
_VID_DF_CAP = 100  # signatures shared by more docs are too common to index


@register(
    "mm_video_neardup",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents WHERE strlen(text) >= {SHOT_FRAME}
        ), pos AS (
            SELECT doc_id,
                   CAST(unnest(range(1,
                        (n // {SHOT_FRAME}) * {SHOT_FRAME} + 1))
                        AS BIGINT) AS pos
            FROM d
        ), v AS MATERIALIZED (
            SELECT p.doc_id, (p.pos - 1) // {SHOT_FRAME} AS frame,
                   CAST(CAST(('0x' || substr(d.hx,
                        CAST(2 * p.pos - 1 AS INTEGER), 2)) AS UBIGINT)
                        AS BIGINT) AS s
            FROM pos p JOIN d ON p.doc_id = d.doc_id
        ), sigset AS MATERIALIZED (
            SELECT DISTINCT doc_id, sig FROM (
                SELECT doc_id, frame, CAST(SUM(s) AS BIGINT) AS sig
                FROM v GROUP BY doc_id, frame
            )
        ), rare AS (
            SELECT sig FROM sigset
            GROUP BY sig HAVING count(*) <= {_VID_DF_CAP}
        ), idx AS (
            SELECT s.doc_id, s.sig FROM sigset s JOIN rare USING (sig)
        ), sizes AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS nsig
            FROM sigset GROUP BY doc_id
        ), pair_common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS c
            FROM idx a JOIN idx b
              ON a.sig = b.sig AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(CAST(c AS DOUBLE)
                     / CAST(sa.nsig + sb.nsig - c AS DOUBLE), 6)
                   AS jaccard
        FROM pair_common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(c AS DOUBLE)
              / CAST(sa.nsig + sb.nsig - c AS DOUBLE) >= {_VID_JACCARD}
    """,
    doc="Whole-video near-duplicate pairs: each payload's DISTINCT set "
        "of 64-byte frame signatures (the mm_video_shot_boundaries "
        "framing) is Jaccard-compared via an inverted index on the "
        "signature value, df <= 100 cap bounding the candidate join "
        "(the dedup_containment recipe) — re-encoded, trimmed, or "
        "re-containered copies of the same footage keep most frame "
        "signatures even when byte-level hashes all change, which is "
        "why video dedup runs at the frame-fingerprint level. "
        "Candidate volume is O(sum df^2) with df capped, never video x "
        "video; jaccard is one exact division rounded to 6. Real codec "
        "decode sits behind the decode_media stub; byte frames stand "
        "in for decoded-frame perceptual hashes.",
    tags=("multimodal", "dedup"),
)
def mm_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    t = Tables(spark, sf_dir)
    payloads = (
        t.documents.filter(F.octet_length("text") >= SHOT_FRAME)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )

    def _sigsets(batches):
        import numpy as np

        for pdf in batches:
            ids, sigs = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                nf = arr.size // SHOT_FRAME
                fr = (
                    arr[: nf * SHOT_FRAME]
                    .reshape(nf, SHOT_FRAME)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                for s in np.unique(fr):
                    ids.append(did)
                    sigs.append(int(s))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "sig": pd.Series(sigs, dtype="int64")}
            )

    sigset = payloads.mapInPandas(
        _sigsets, "doc_id long, sig long"
    ).cache()
    rare = (
        sigset.groupBy("sig")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _VID_DF_CAP)
        .select("sig")
    )
    idx = sigset.join(rare, "sig")
    sizes = sigset.groupBy("doc_id").agg(F.count("*").alias("nsig"))
    a, b = idx.alias("a"), idx.alias("b")
    pair_common = (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c").cast("double") / (
        F.col("na") + F.col("nb") - F.col("c")
    ).cast("double")
    return (
        pair_common.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsig").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsig").alias("nb")),
            "doc_b",
        )
        .filter(jac >= _VID_JACCARD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "mm_audio_snr",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   CAST(strlen(text) AS BIGINT) AS n
            FROM documents WHERE strlen(text) >= {AUDIO_WIN}
        ), pos AS (
            SELECT doc_id,
                   CAST(unnest(range(1, (n // {AUDIO_WIN}) * {AUDIO_WIN} + 1))
                        AS BIGINT) AS pos
            FROM d
        ), v AS MATERIALIZED (
            SELECT p.doc_id, (p.pos - 1) // {AUDIO_WIN} AS win,
                   CAST(CAST(('0x' || substr(d.hx,
                        CAST(2 * p.pos - 1 AS INTEGER), 2)) AS UBIGINT)
                        AS BIGINT) - 128 AS s
            FROM pos p JOIN d USING (doc_id)
        ), w AS MATERIALIZED (
            SELECT doc_id, win, CAST(SUM(s * s) AS BIGINT) AS energy
            FROM v GROUP BY doc_id, win
        ), tot AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nw,
                   CAST(SUM(energy) AS BIGINT) AS total
            FROM w GROUP BY doc_id
        ), split AS (
            SELECT w.doc_id,
                   CAST(SUM(CASE WHEN w.energy * t.nw > t.total
                                 THEN w.energy ELSE 0 END)
                        AS BIGINT) AS sig_energy,
                   CAST(SUM(CASE WHEN w.energy * t.nw > t.total
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sig,
                   CAST(SUM(CASE WHEN w.energy * t.nw > t.total
                                 THEN 0 ELSE w.energy END)
                        AS BIGINT) AS noise_energy,
                   CAST(SUM(CASE WHEN w.energy * t.nw > t.total
                                 THEN 0 ELSE 1 END) AS BIGINT) AS n_noise
            FROM w JOIN tot t USING (doc_id)
            GROUP BY w.doc_id
        )
        SELECT doc_id, n_sig, n_noise, sig_energy, noise_energy,
               CAST(sig_energy * n_noise AS BIGINT) AS snr_num,
               CAST(noise_energy * n_sig AS BIGINT) AS snr_den,
               CAST(sig_energy * n_noise AS DOUBLE)
                   / CAST(CASE WHEN noise_energy * n_sig = 0 THEN 1
                               ELSE noise_energy * n_sig END AS DOUBLE)
                   AS snr
        FROM split
    """,
    doc="Per-payload signal-to-noise ratio over the mm_audio_vad "
        "window split — the recording-quality screen an audio-corpus "
        "pipeline gates on before paying for transcription (SNR near 1 "
        "means the 'speech' windows are barely above the floor): mean "
        "active-window energy over mean inactive-window energy, "
        "emitted CROSS-MULTIPLIED as exact integers "
        "(sig_energy*n_noise / noise_energy*n_sig — one guarded "
        "division; energies are exact int sums of (byte-128)^2, the "
        "active test is the same integer cross-multiplied mean test as "
        "VAD). Map-reduce only: one window agg + one per-doc agg. The "
        "int64 payload-size bound (255^2 * n^2-scale products) holds "
        "to ~2^23 bytes, the documented mm payload cap.",
    tags=("multimodal",),
)
def mm_audio_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    t = Tables(spark, sf_dir)
    payloads = (
        t.documents.filter(F.octet_length("text") >= AUDIO_WIN)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )

    def _snr(batches):
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "n_sig", "n_noise", "sig_energy",
                    "noise_energy")}
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                nw = arr.size // AUDIO_WIN
                s = (
                    arr[: nw * AUDIO_WIN]
                    .reshape(nw, AUDIO_WIN)
                    .astype(np.int64)
                    - 128
                )
                e = (s * s).sum(axis=1)
                total = int(e.sum())
                active = e * nw > total
                out["doc_id"].append(did)
                out["n_sig"].append(int(active.sum()))
                out["n_noise"].append(int((~active).sum()))
                out["sig_energy"].append(int(e[active].sum()))
                out["noise_energy"].append(int(e[~active].sum()))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    split = payloads.mapInPandas(
        _snr,
        "doc_id long, n_sig long, n_noise long, sig_energy long, "
        "noise_energy long",
    )
    num = F.col("sig_energy") * F.col("n_noise")
    den = F.col("noise_energy") * F.col("n_sig")
    return split.select(
        "doc_id",
        "n_sig",
        "n_noise",
        "sig_energy",
        "noise_energy",
        num.cast("bigint").alias("snr_num"),
        den.cast("bigint").alias("snr_den"),
        (
            num.cast("double")
            / F.when(den == 0, 1).otherwise(den).cast("double")
        ).alias("snr"),
    )
