"""Env-gated REAL media decode — skipped in the sandbox (no Pillow).

The engine's multimodal surface keeps every ORACLED query on the
deterministic fake decoder (operators/multimodal.py), so hashes never
depend on an optional native lib. The REAL decode path is a seam,
mirroring the external-Kafka gate (tests/test_kafka_external.py):

    PSPD_MEDIA_DECODE=pil python -m pytest tests/test_media_external.py

On a cluster where Pillow is installed this drives actual PNG payloads
through the same Arrow-batched mapInPandas plumbing the fake pipeline
uses and asserts the decoded dimensions are the true image dimensions.
"""

from __future__ import annotations

import os
import struct
import zlib

import pytest

BACKEND = os.environ.get("PSPD_MEDIA_DECODE")

pytestmark = pytest.mark.skipif(
    BACKEND != "pil",
    reason="set PSPD_MEDIA_DECODE=pil (with Pillow installed) to run "
           "the real media decode path",
)


def _png(width: int, height: int) -> bytes:
    """Minimal valid grayscale PNG, stdlib-only (no PIL needed to BUILD
    the fixture — only to decode it)."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x7f" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_media_pil_real_dimensions():
    from hadoop_spark_pspd_spark.operators.multimodal import decode_media

    got = decode_media(_png(17, 9), kind="image", backend="pil")
    assert got == {"width": 17, "height": 9}
    # env-driven selection (backend=None reads PSPD_MEDIA_DECODE)
    got_env = decode_media(_png(5, 3), kind="image")
    assert got_env == {"width": 5, "height": 3}


def test_media_dimensions_pipeline_real(spark):
    from hadoop_spark_pspd_spark.operators.multimodal import media_dimensions

    rows = [(i, _png(10 + i, 20 + 2 * i)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"])
        for r in media_dimensions(df, backend="pil").collect()
    }
    assert got == {i: (10 + i, 20 + 2 * i) for i in range(12)}
