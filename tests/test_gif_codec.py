"""GIF codec ground truth: hand-computed spec vectors, third-party
files (idlelib icons — externally-encoded LZW, including interlaced),
and loud-failure contracts. Roundtrip alone would hide symmetric
encoder/decoder bugs (the r8 JPEG lesson), so the LZW bitstream is
pinned byte-exactly by hand."""

from __future__ import annotations

import glob
import struct

import pytest

from hadoop_spark_pspd_spark.functions.gif_codec import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)

pytestmark = pytest.mark.smoke

ICONS = sorted(
    glob.glob(
        "/root/.pyenv/versions/*/lib/python3.*/idlelib/Icons/*.gif"
    )
)


def test_lzw_hand_packed_spec_vector():
    """indices [1,1,1] at min_code_size 2: codes are [clear=4, 1, 6,
    eoi=5], all 3-bit, LSB-first -> exactly bytes 8C 0B. Code 6 is the
    KwKwK case (the decoder receives its own next index)."""
    assert lzw_encode(bytes([1, 1, 1]), 2) == bytes([0x8C, 0x0B])
    assert lzw_decode(bytes([0x8C, 0x0B]), 2) == bytes([1, 1, 1])


def test_lzw_width_growth_and_table_reset_roundtrip():
    import random

    rng = random.Random(7)
    for n, k in [(345, 64), (20000, 256), (70000, 8)]:
        idx = bytes(rng.randrange(k) for _ in range(n))
        b = max(2, (k - 1).bit_length())
        assert lzw_decode(lzw_encode(idx, b), b) == idx


def test_lzw_truncation_is_value_error():
    enc = lzw_encode(bytes(range(64)) * 8, 6)
    with pytest.raises(ValueError, match="truncated"):
        lzw_decode(enc[: len(enc) // 2], 6)


def test_container_roundtrip_all_dims():
    pal = bytes(range(192))
    for doc_id in range(0, 120, 7):
        w, h = 11 + doc_id % 13, 7 + doc_id % 9
        idx = bytes((x * 7 + y * 13) % 64 for y in range(h) for x in range(w))
        d = decode_gif(encode_gif(idx, w, h, pal))
        assert (d["width"], d["height"]) == (w, h)
        assert d["pixels"] == idx
        assert d["palette"][: len(pal)] == pal


@pytest.mark.parametrize("path", ICONS)
def test_external_gifs_decode(path):
    d = decode_gif(open(path, "rb").read())
    assert len(d["pixels"]) == d["width"] * d["height"]
    assert len(d["palette"]) % 3 == 0 and d["palette"]
    assert max(d["pixels"]) < len(d["palette"]) // 3


def test_external_glyph_content():
    """plusnode.gif must actually contain a plus: the center row and
    center column carry a color the four corners don't — pixel-level
    ground truth from a third-party encoder."""
    path = [p for p in ICONS if p.endswith("plusnode.gif")]
    if not path:
        pytest.skip("idlelib icons not present")
    d = decode_gif(open(path[0], "rb").read())
    w, h = d["width"], d["height"]
    assert (w, h) == (11, 11)
    px = d["pixels"]
    center = px[(h // 2) * w + w // 2]
    corners = {px[0], px[w - 1], px[(h - 1) * w], px[h * w - 1]}
    assert center not in corners
    # plus arms: the center color runs along the middle row
    mid_row = px[(h // 2) * w : (h // 2 + 1) * w]
    assert mid_row.count(center) >= 5


def test_external_interlaced_decodes():
    """folder.gif is interlaced (packed bit 0x40 set in the file) —
    decoding must de-interlace; its top row is NOT the 4th pass."""
    path = [p for p in ICONS if p.endswith("folder.gif")]
    if not path:
        pytest.skip("idlelib icons not present")
    raw = open(path[0], "rb").read()
    # confirm the fixture really is interlaced (image descriptor flag)
    pos = 13 + 3 * (1 << ((raw[10] & 7) + 1))
    while raw[pos] == 0x21:
        pos += 2
        while raw[pos]:
            pos += 1 + raw[pos]
        pos += 1
    assert raw[pos] == 0x2C
    assert struct.unpack("<HHHHB", raw[pos + 1 : pos + 10])[4] & 0x40
    d = decode_gif(raw)
    assert len(d["pixels"]) == d["width"] * d["height"]


def test_corrupt_signature_and_no_image():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(b"GIF89a" + b"\x00" * 4)


def test_anim_multiframe_roundtrip():
    from hadoop_spark_pspd_spark.functions.gif_codec import (
        decode_gif_frames,
        encode_gif_anim,
    )

    frames = []
    for f in range(3):
        w, h = 7 + f, 5 + f
        frames.append(
            dict(
                left=f, top=2 * f, width=w, height=h, delay_cs=4 + f,
                pixels=bytes(
                    (x * 5 + y * 7 + f * 11) % 64
                    for y in range(h)
                    for x in range(w)
                ),
            )
        )
    g = encode_gif_anim(frames, 16, 14, bytes(range(192)))
    d = decode_gif_frames(g)
    assert (d["screen_width"], d["screen_height"]) == (16, 14)
    assert len(d["frames"]) == 3
    for fin, fout in zip(frames, d["frames"]):
        for k in ("left", "top", "width", "height", "delay_cs", "pixels"):
            assert fin[k] == fout[k]
    # GCE transparency flag was off in every frame
    assert all(fr["transparent"] is None for fr in d["frames"])


def test_anim_decoder_reads_external_single_frame():
    from hadoop_spark_pspd_spark.functions.gif_codec import (
        decode_gif_frames,
    )

    if not ICONS:
        pytest.skip("idlelib icons not present")
    d = decode_gif_frames(open(ICONS[0], "rb").read())
    assert len(d["frames"]) == 1
    fr = d["frames"][0]
    assert len(fr["pixels"]) == fr["width"] * fr["height"]
