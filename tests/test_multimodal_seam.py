"""Execute the REAL-decode seam (backend="pil") WITHOUT Pillow.

VERDICT r6 #4: the env-gated real-decode branch
(operators/multimodal.py decode_media / media_dimensions) had never
executed anywhere — the sandbox lacks Pillow and the external test
(tests/test_media_external.py) only runs where it's installed. These
tests cover the seam's LOGIC (import path, Image.open context manager,
width/height extraction, Arrow-batched mapInPandas plumbing) against a
recorded-fixture PIL API surface:

* driver side — a stub ``PIL.Image`` injected into sys.modules;
* executor side — the same stub shipped as a zip via
  ``sparkContext.addPyFile``, so the Python WORKERS import it when the
  mapInPandas batch calls ``from PIL import Image``.

The stub parses the minimal-PNG IHDR (stdlib struct/zlib, the same
fixture builder as the env-gated real test), so the asserted dimensions
are true image dimensions, not echoes of the fake decoder.
"""

from __future__ import annotations

import struct
import sys
import types
import zipfile
import zlib

import pytest

_PIL_IMAGE_SRC = '''\
"""Recorded-fixture PIL.Image surface: enough of the API for
decode_media's real path (open() -> context manager with width/height).
Parses the PNG IHDR for the true dimensions."""
import struct


class _Im:
    def __init__(self, width, height):
        self.width = width
        self.height = height

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def open(fp):
    data = fp.read()
    if data[:8] != b"\\x89PNG\\r\\n\\x1a\\n":
        raise OSError("cannot identify image file")
    width, height = struct.unpack(">II", data[16:24])
    return _Im(width, height)
'''


def _png(width: int, height: int) -> bytes:
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


@pytest.fixture()
def stub_pil(monkeypatch):
    """Driver-side PIL stub in sys.modules (undone automatically)."""
    pil = types.ModuleType("PIL")
    image = types.ModuleType("PIL.Image")
    exec(compile(_PIL_IMAGE_SRC, "<stub PIL.Image>", "exec"), image.__dict__)
    pil.Image = image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image)
    return pil


def test_decode_media_pil_branch_driver_side(stub_pil):
    from hadoop_spark_pspd_spark.operators.multimodal import decode_media

    assert decode_media(_png(17, 9), kind="image", backend="pil") == {
        "width": 17,
        "height": 9,
    }
    with pytest.raises(NotImplementedError):
        decode_media(b"x", kind="audio", backend="pil")
    with pytest.raises(OSError):
        decode_media(b"not a png", kind="image", backend="pil")


def test_decode_media_env_selection(stub_pil, monkeypatch):
    from hadoop_spark_pspd_spark.operators.multimodal import decode_media

    monkeypatch.setenv("PSPD_MEDIA_DECODE", "pil")
    assert decode_media(_png(5, 3), kind="image") == {
        "width": 5,
        "height": 3,
    }


def test_media_dimensions_executor_side(spark, tmp_path):
    """The full mapInPandas plumbing with backend='pil': workers import
    the stub from an addPyFile zip and return TRUE PNG dimensions."""
    zpath = tmp_path / "pil_stub.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("PIL/__init__.py", "")
        z.writestr("PIL/Image.py", _PIL_IMAGE_SRC)
    spark.sparkContext.addPyFile(str(zpath))

    from hadoop_spark_pspd_spark.operators.multimodal import (
        media_dimensions,
    )

    rows = [(1, _png(17, 9)), (2, _png(64, 2)), (3, _png(1, 1))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"])
        for r in media_dimensions(df, backend="pil").collect()
    }
    assert got == {1: (17, 9), 2: (64, 2), 3: (1, 1)}
