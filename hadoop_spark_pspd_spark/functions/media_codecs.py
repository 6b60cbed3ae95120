"""Pure-stdlib media codecs: PNG (zlib + struct) and WAV (wave).

The reference has no media surface (it is a WordCount lab —
`cluster/tools/run_fault_tests.py`); multimodal columns are a driver-
contract extension. Round 7 left real decode env-gated behind Pillow;
this module closes that gap with decoders built ONLY on the Python
standard library, so the sandbox exercises a genuine bytes-to-pixels /
bytes-to-samples path end-to-end:

- PNG: 8-bit greyscale/RGB/RGBA/palette, sequential AND Adam7
  interlaced, per the public PNG
  spec (RFC 2083): chunk framing with CRC-32 verification, zlib
  inflate of the IDAT stream, and full scanline de-filtering (None /
  Sub / Up / Average / Paeth).
- WAV: integer PCM via the stdlib ``wave`` module (header parse +
  frame extraction); sample decoding is little-endian two's-complement
  per the RIFF/WAVE spec.

The matching encoders exist so tests and oracled queries can build
REAL payloads whose decoded content is computable in ANSI SQL: encode
a deterministic pixel/sample formula, decode it back through the full
inflate + de-filter path, and compare exact integer statistics against
a DuckDB oracle evaluating the same formula relationally.

Unsupported shapes (16-bit depth, float WAV) raise
``NotImplementedError`` loudly — a real cluster flips
``PSPD_MEDIA_DECODE=pil`` for the remaining long tail.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE_BY_CHANNELS = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 3,
    row_filter=None,
    palette: bytes | None = None,
) -> bytes:
    """Encode row-major 8-bit pixel bytes as a real PNG.

    ``row_filter(y) -> 0..4`` selects the scanline filter (default
    ``y % 5`` so every filter type — including Paeth — is exercised by
    any image of >= 5 rows, making a round-trip test meaningful).
    With ``palette`` (RGB triples, <= 256 entries), ``pixels`` are
    1-byte palette INDICES and the file is written as color type 3
    with a PLTE chunk (channels must be 1).
    """
    if palette is not None:
        if channels != 1:
            raise ValueError("palette PNGs take 1-byte indices")
        if len(palette) % 3 != 0 or not 3 <= len(palette) <= 768:
            raise ValueError("palette must be 1..256 RGB triples")
        if any(b >= len(palette) // 3 for b in pixels):
            raise ValueError("palette index out of range")
    elif channels not in _COLOR_TYPE_BY_CHANNELS:
        raise NotImplementedError(f"channels={channels} not supported")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    if row_filter is None:
        row_filter = lambda y: y % 5  # noqa: E731
    bpp = channels
    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ftype = row_filter(y)
        raw.append(ftype)
        if ftype == 0:  # None
            raw.extend(row)
        elif ftype == 1:  # Sub
            raw.extend(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif ftype == 2:  # Up
            raw.extend((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ftype == 3:  # Average
            raw.extend(
                (row[i] - (((row[i - bpp] if i >= bpp else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        elif ftype == 4:  # Paeth
            raw.extend(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"filter type {ftype} out of range")
        prev = row
    color_type = 3 if palette is not None else _COLOR_TYPE_BY_CHANNELS[channels]
    ihdr = struct.pack(
        ">IIBBBBB",
        width,
        height,
        8,
        color_type,
        0,
        0,
        0,
    )
    plte = _chunk(b"PLTE", palette) if palette is not None else b""
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + plte
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _defilter(raw: bytes, width: int, height: int, channels: int) -> bytearray:
    """De-filter a filtered sub-image (one filter byte per scanline,
    per the PNG spec): None / Sub / Up / Average / Paeth."""
    bpp = channels
    stride = width * channels
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        cur = bytearray(stride)
        if ftype == 0:
            cur[:] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                cur[i] = (line[i] + (cur[i - bpp] if i >= bpp else 0)) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                cur[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                cur[i] = (
                    line[i]
                    + _paeth(
                        cur[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                ) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ftype}")
        out[y * stride:(y + 1) * stride] = cur
        prev = bytes(cur)
    return out


# Adam7 pass layout (PNG spec 8.2, public): (x0, y0, dx, dy)
ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _deinterlace_adam7(
    raw: bytes, width: int, height: int, channels: int
) -> bytearray:
    """Adam7 deinterlacing: the inflated stream holds 7 independently
    filtered sub-images (empty passes absent); de-filter each and
    scatter its pixels to the (x0 + i*dx, y0 + j*dy) grid."""
    out = bytearray(width * height * channels)
    pos = 0
    for x0, y0, dx, dy in ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * channels
        seg = raw[pos:pos + (stride + 1) * ph]
        if len(seg) != (stride + 1) * ph:
            raise ValueError("truncated interlaced pass data")
        pos += (stride + 1) * ph
        sub = _defilter(seg, pw, ph, channels)
        for j in range(ph):
            y = y0 + j * dy
            for i in range(pw):
                x = x0 + i * dx
                src = (j * pw + i) * channels
                dst = (y * width + x) * channels
                out[dst:dst + channels] = sub[src:src + channels]
    if pos != len(raw):
        raise ValueError(
            f"interlaced data has {len(raw) - pos} trailing bytes"
        )
    return out


def decode_png(payload: bytes) -> dict:
    """Decode a PNG: CRC-checked chunk walk, IDAT inflate, de-filter.

    Returns ``{"width", "height", "channels", "pixels"}`` with pixels
    as row-major 8-bit bytes. Supports sequential and Adam7-interlaced
    8-bit greyscale
    (color type 0), RGB (2), palette (3 — indices dereference through
    the PLTE chunk to RGB output, plus a "palette_size" key) and
    RGBA (6).
    """
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = data
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} (only 8 supported)")
    if color_type != 3 and color_type not in _CHANNELS_BY_COLOR_TYPE:
        raise NotImplementedError(f"color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"unknown interlace method {interlace}")
    if color_type == 3:
        if plte is None or len(plte) % 3 != 0 or not plte:
            raise ValueError("palette PNG without a valid PLTE chunk")
        channels = 1  # 1-byte indices on disk; dereferenced below
    else:
        channels = _CHANNELS_BY_COLOR_TYPE[color_type]
    bpp = channels
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        stride = width * channels
        if len(raw) != (stride + 1) * height:
            raise ValueError(
                f"inflated size {len(raw)} != {(stride + 1) * height}"
            )
        out = _defilter(raw, width, height, channels)
    else:
        out = _deinterlace_adam7(raw, width, height, channels)
    if color_type == 3:
        n_colors = len(plte) // 3
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            if idx >= n_colors:
                raise ValueError(
                    f"palette index {idx} out of range ({n_colors})"
                )
            rgb[3 * i : 3 * i + 3] = plte[3 * idx : 3 * idx + 3]
        return {
            "width": width,
            "height": height,
            "channels": 3,
            "pixels": bytes(rgb),
            "palette_size": n_colors,
        }
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(out),
    }


def encode_wav(
    samples, sample_rate: int, channels: int = 1
) -> bytes:
    """Encode int16 PCM samples (iterable of Python ints) as a WAV."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(data)
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Decode a WAV: header parse + int16 PCM frame extraction.

    Returns ``{"n_frames", "sample_rate", "channels", "samples"}``
    with samples as a list of Python ints (interleaved if stereo).
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_frames = w.getnframes()
        rate = w.getframerate()
        channels = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(n_frames)
    if width != 2:
        raise NotImplementedError(
            f"sample width {width} bytes (only int16 PCM supported)"
        )
    count = len(frames) // 2
    samples = list(struct.unpack(f"<{count}h", frames))
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "channels": channels,
        "samples": samples,
    }


# ---------------------------------------------------------------------------
# BMP (Windows DIB, BITMAPINFOHEADER) — the simplest real raster format:
# no compression, bottom-up scanlines, each row padded to a 4-byte
# boundary, 24-bit pixels stored as little-endian BGR triples. Spec:
# the public Windows BMP file format documentation.

_BMP_HEADER_SIZE = 14
_BMP_INFO_SIZE = 40


def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """Encode interleaved top-down RGB bytes as a 24-bit BI_RGB BMP.

    ``pixels`` is ``height*width*3`` bytes in reading order (row 0 =
    top). The file stores rows BOTTOM-UP with BGR channel order and
    4-byte row padding — the three spec quirks a symmetric
    encoder/decoder bug pair could hide, which is why the tests also
    decode hand-built spec vectors.
    """
    if len(pixels) != width * height * 3:
        raise ValueError("pixels length != width*height*3")
    row_raw = width * 3
    pad = (-row_raw) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        base = y * row_raw
        for x in range(width):
            r, g, b = pixels[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * pad
        rows.append(bytes(row))
    data = b"".join(rows)
    off = _BMP_HEADER_SIZE + _BMP_INFO_SIZE
    import struct as _struct

    info = _struct.pack(
        "<IiiHHIIiiII",
        _BMP_INFO_SIZE, width, height, 1, 24, 0, len(data),
        2835, 2835, 0, 0,
    )
    header = _struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return header + info + data


def decode_bmp(payload: bytes) -> dict:
    """Decode a 24-bit uncompressed BMP to top-down RGB bytes.

    Returns ``{"width", "height", "pixels"}`` with pixels interleaved
    RGB in reading order. Validates the magic, header sizes, bit depth
    and BI_RGB compression; anything else raises loudly (the
    ``PSPD_MEDIA_DECODE=pil`` seam covers the long tail on a real
    cluster).
    """
    import struct as _struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    _, _fsize, _r1, _r2, off = _struct.unpack("<2sIHHI", payload[:14])
    (info_size, width, height, planes, bpp, compression, _isize,
     _xppm, _yppm, _clr, _clri) = _struct.unpack(
        "<IiiHHIIiiII", payload[14:54]
    )
    if info_size < _BMP_INFO_SIZE:
        raise NotImplementedError(f"BMP info header size {info_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"unsupported BMP shape: planes={planes} bpp={bpp} "
            f"compression={compression}"
        )
    bottom_up = height > 0
    height = abs(height)
    row_raw = width * 3
    stride = row_raw + ((-row_raw) % 4)
    out = bytearray(width * height * 3)
    for yy in range(height):
        src = off + yy * stride
        row = payload[src : src + row_raw]
        if len(row) != row_raw:
            raise ValueError("truncated BMP pixel data")
        y = (height - 1 - yy) if bottom_up else yy
        base = y * row_raw
        for x in range(width):
            b, g, r = row[3 * x : 3 * x + 3]
            out[base + 3 * x] = r
            out[base + 3 * x + 1] = g
            out[base + 3 * x + 2] = b
    return {"width": width, "height": height, "pixels": bytes(out)}


# ---------------------------------------------------------------------------
# PPM (Netpbm P6, binary RGB) — the simplest portable raster format:
# an ASCII header (magic, dims, maxval) followed by raw RGB bytes.
# Public spec: the Netpbm format documentation.


def encode_ppm(pixels: bytes, width: int, height: int) -> bytes:
    """Encode row-major RGB bytes as a binary P6 PPM (maxval 255)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels length != width*height*3")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + pixels


def decode_ppm(payload: bytes) -> dict:
    """Decode a binary P6 PPM: whitespace/comment-tolerant header parse
    (per the Netpbm spec: tokens separated by whitespace, '#' comments
    run to end of line, a single whitespace byte precedes the raster),
    then raw RGB extraction. Returns {"width", "height", "pixels"}."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (missing P6 magic)")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while payload[pos : pos + 1].isdigit():
                pos += 1
            tokens.append(int(payload[start:pos]))
        else:
            raise ValueError(f"unexpected header byte {c!r}")
    width, height, maxval = tokens
    if maxval != 255:
        raise NotImplementedError(f"maxval {maxval} (only 255 supported)")
    if not payload[pos : pos + 1].isspace():
        raise ValueError("missing single whitespace before raster")
    pos += 1
    raster = payload[pos : pos + width * height * 3]
    if len(raster) != width * height * 3:
        raise ValueError("truncated PPM raster")
    return {"width": width, "height": height, "pixels": raster}
