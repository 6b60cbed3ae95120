"""Multimodal column plumbing (north-star surface).

Image/audio/video are treated as opaque ``binary`` payloads with typed
metadata. The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partitioning — is real and tested; the actual media decode is
STUBBED (no image/audio libs in this container): ``decode_media`` raises
NotImplementedError unless the deterministic fake decoder is selected.

The fake decoder derives width/height/etc. purely from byte length, so the
whole pipeline (including the Pandas-UDF boundary) stays oracle-checkable
in SQL.
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


def decode_media(payload: bytes, kind: str = "image", fake: bool = False):
    """Decode a media payload. Real decoding requires PIL/ffmpeg — not in
    this container; the deterministic fake keeps the pipeline testable."""
    if not fake:
        raise NotImplementedError(
            "real media decode needs PIL/ffmpeg (not installed); "
            "pass fake=True for the deterministic stub"
        )
    n = len(payload)
    return {"width": n % 640, "height": (n * 7) % 480}


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
