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
