"""Baseline JPEG codec validation (functions/jpeg_codec.py), in the
test order the PNG path established (tests/test_media_codecs.py):

1. the integer IDCT against an independent float cos() reference;
2. hand-computed spec vectors (DC-only block has a closed form);
3. encoder->decoder roundtrips exercising DC differentials, AC runs,
   ZRL and EOB paths;
4. externally-produced files — JPEGs shipped with the OS / Spark
   distribution (skip-if-absent), including pixel-level ground truth
   (a white background must decode to exactly (255,255,255) through
   the whole Huffman + dequant + IDCT + color-convert path);
5. loud refusal of unsupported shapes (progressive SOF2).
"""

from __future__ import annotations

import math
import random

import pytest

from hadoop_spark_pspd_spark.functions.jpeg_codec import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg_gray,
    idct_2d,
)


def _float_idct(coef):
    out = []
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    au = 1 / math.sqrt(2) if u == 0 else 1.0
                    av = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        au * av * coef[v * 8 + u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out.append(max(0, min(255, round(128 + s / 4))))
    return out


def test_integer_idct_tracks_float_reference():
    """The 14-bit fixed-point tensor IDCT must stay within +-1 of the
    real-valued IDCT on random sparse and dense blocks — the accuracy
    class T.81 Annex A expects of a compliant IDCT."""
    rng = random.Random(7)
    for _ in range(60):
        coef = [0] * 64
        for _ in range(rng.randint(1, 24)):
            coef[rng.randrange(64)] = rng.randint(-500, 500)
        a, b = idct_2d(coef), _float_idct(coef)
        assert all(abs(x - y) <= 1 for x, y in zip(a, b))


def test_dc_only_block_closed_form():
    """DC-only: every sample is 128 + descale(C * M00^2) with
    M00 = 5793; C = 80 * qt 2 = 160 gives exactly 148."""
    qt = [2] * 64
    blk = [0] * 64
    blk[0] = 80
    d = decode_jpeg(encode_jpeg_gray([blk], 8, 8, qt))
    assert (d["width"], d["height"], d["channels"]) == (8, 8, 1)
    exp = 128 + ((160 * 5793 * 5793 + (1 << 27) + (1 << 50)) >> 28) - (
        1 << 22
    )
    assert exp == 148
    assert all(p == exp for p in d["pixels"])


def test_multiblock_roundtrip_runs_zrl_dc_diff():
    """Random coefficient blocks (negative values, variable runs, a
    far coefficient forcing ZRL, differential DC across 12 blocks)
    must decode to exactly the integer IDCT of the dequantized
    inputs."""
    rng = random.Random(13)
    W, H = 32, 24
    nb = (W // 8) * (H // 8)
    qt = [1 + (i % 8) for i in range(64)]
    blocks = []
    for b in range(nb):
        blk = [0] * 64
        blk[0] = rng.randint(-200, 200)
        for _ in range(rng.randint(0, 6)):
            blk[ZIGZAG[rng.randrange(1, 64)]] = rng.randint(-30, 30)
        if b % 3 == 0:
            blk[ZIGZAG[60]] = 5  # forces >= 2 ZRL symbols
        blocks.append(blk)
    d = decode_jpeg(encode_jpeg_gray(blocks, W, H, qt))
    px = d["pixels"]
    for bi, blk in enumerate(blocks):
        exp = idct_2d([blk[i] * qt[i] for i in range(64)])
        by, bx = divmod(bi, W // 8)
        for y in range(8):
            for x in range(8):
                assert px[(by * 8 + y) * W + bx * 8 + x] == exp[y * 8 + x]


def test_encoder_emits_genuine_marker_stream():
    blk = [0] * 64
    blk[0] = 10
    img = encode_jpeg_gray([blk], 8, 8, [1] * 64)
    assert img[:2] == b"\xff\xd8" and img[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in img[:30]
    # SOF0 marker present (baseline), never SOF2
    assert b"\xff\xc0" in img and b"\xff\xc2" not in img


# ------------------------------------------------------ external ground truth

EXTERNAL_BASELINE = [
    # (path, w, h) — all SOF0; first two 4:4:4, kitten 4:2:0
    ("/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/"
     "ext/flower-of-life.jpg", 161, 161),
    ("/usr/lib/google-cloud-sdk/platform/google_appengine/google/"
     "appengine/tools/java/jetty12/jetty-home/modules/demo.d/root/"
     "images/webtide_logo.jpg", 245, 60),
    ("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/"
     "DP802813.jpg", 199, 313),
]


@pytest.mark.parametrize("path,w,h", EXTERNAL_BASELINE)
def test_external_baseline_decodes(path, w, h):
    try:
        data = open(path, "rb").read()
    except OSError:
        pytest.skip(f"{path} not present on this host")
    d = decode_jpeg(data)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    assert len(d["pixels"]) == w * h * 3
    n = w * h * 3
    mean = sum(d["pixels"]) / n
    assert 20 < mean < 240 and min(d["pixels"]) < max(d["pixels"])


def test_external_white_background_is_exact():
    """flower-of-life.jpg has a white background: JFIF white is
    Y=255, Cb=Cr=128, which must decode to exactly (255, 255, 255)
    through Huffman + dequant + IDCT + the fixed-point color convert —
    pixel-level ground truth from a third-party encoder."""
    path = EXTERNAL_BASELINE[0][0]
    try:
        data = open(path, "rb").read()
    except OSError:
        pytest.skip("flower-of-life.jpg not present")
    d = decode_jpeg(data)
    assert list(d["pixels"][:3]) == [255, 255, 255]


def test_progressive_refused_loudly():
    path = "/usr/share/doc/nodejs/thin-white-stripe.jpg"
    try:
        data = open(path, "rb").read()
    except OSError:
        pytest.skip("nodejs doc images not present")
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(data)


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
