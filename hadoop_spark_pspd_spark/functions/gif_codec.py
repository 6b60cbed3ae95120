"""Pure-stdlib GIF87a/89a codec: real LZW in both directions.

Public-spec implementation (GIF89a specification, CompuServe 1990;
variable-width LZW codes, LSB-first bit packing, 255-byte data
sub-blocks). Encoder emits genuine dictionary-compressed streams
(clear-on-full); decoder implements the full table-based decode
including the KwKwK (code == next_index) case and the late width
change at next == 2^width. Reference parity note: the reference repo
(cluster/tools/run_fault_tests.py) has no media path — this extends
the driver-contract multimodal surface with a third-party-validated
format (see tests/test_gif_codec.py: idlelib icon GIFs).

Interlaced images are de-interlaced (4-pass row reorder) and animated
files decode frame-by-frame (decode_gif_frames). Truncated/corrupt
streams fail LOUDLY with ValueError — the jpeg_codec.py seam contract.
"""

from __future__ import annotations

import struct

_MAX_CODE_WIDTH = 12
_DICT_LIMIT = 1 << 12  # 4096


# --------------------------------------------------------------- LZW


class _BitWriter:
    """LSB-first bit accumulator (GIF's packing order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emit clear first, reset when the table fills."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def reset() -> tuple[dict, int, int]:
        return {}, eoi + 1, min_code_size + 1

    table, nxt, width = reset()
    bw.write(clear, width)
    w = -1
    for k in indices:
        if w < 0:
            w = k
            continue
        key = (w, k)
        code = table.get(key)
        if code is not None:
            w = code
            continue
        bw.write(w, width)
        table[key] = nxt
        nxt += 1
        # late width change: the decoder bumps at next_d == 2^width and
        # trails the encoder by exactly one add, so the encoder bumps
        # at next_e == 2^width + 1
        if nxt == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
            width += 1
        if nxt == _DICT_LIMIT:
            bw.write(clear, width)
            table, nxt, width = reset()
        w = k
    if w >= 0:
        bw.write(w, width)
    bw.write(eoi, width)
    return bw.flush()


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    nxt = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = dict(base)
            nxt = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError(f"corrupt GIF: first code {code} unknown")
            out += entry
            prev = entry
            continue
        if code in table:
            entry = table[code]
        elif code == nxt:  # KwKwK
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt GIF: code {code} > next {nxt}")
        out += entry
        if nxt < _DICT_LIMIT:
            table[nxt] = prev + entry[:1]
            nxt += 1
            if nxt == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry


# --------------------------------------------------------- container


def encode_gif(
    indices: bytes, width: int, height: int, palette: bytes
) -> bytes:
    """Single-frame GIF89a with a global color table.

    ``palette`` is RGB triples; its length is padded up to the next
    power of two (2..256 entries) as the spec requires.
    """
    if len(indices) != width * height:
        raise ValueError("indices length != width*height")
    n_colors = max(2, len(palette) // 3)
    gct_bits = max(1, (n_colors - 1).bit_length())
    gct_size = 1 << gct_bits
    if max(indices, default=0) >= gct_size:
        raise ValueError("index out of palette range")
    pal = palette + b"\x00" * (gct_size * 3 - len(palette))
    min_code_size = max(2, gct_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", width, height, 0x80 | ((gct_bits - 1) & 7), 0, 0
    )
    out += pal
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(min_code_size)
    stream = lzw_encode(indices, min_code_size)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> dict:
    """Decode the FIRST image of a GIF87a/89a file.

    Returns ``{"width", "height", "pixels" (palette indices, row-major),
    "palette" (RGB bytes of the table in effect)}``. Extensions are
    skipped; interlaced images are de-interlaced (4-pass row reorder).
    """
    try:
        if data[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF: bad signature")
        sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
        pos = 13
        gct = b""
        if packed & 0x80:
            n = 1 << ((packed & 7) + 1)
            gct = data[pos : pos + 3 * n]
            if len(gct) < 3 * n:
                raise ValueError("truncated GIF: short global color table")
            pos += 3 * n
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF: no image descriptor")
            b0 = data[pos]
            pos += 1
            if b0 == 0x3B:
                raise ValueError("GIF contains no image data")
            if b0 == 0x21:  # extension: label + sub-blocks
                pos += 1
                while True:
                    sz = data[pos]
                    pos += 1 + sz
                    if sz == 0:
                        break
                continue
            if b0 != 0x2C:
                raise ValueError(f"corrupt GIF: unexpected block 0x{b0:02x}")
            left, top, iw, ih, ipacked = struct.unpack(
                "<HHHHB", data[pos : pos + 9]
            )
            pos += 9
            interlaced = bool(ipacked & 0x40)
            pal = gct
            if ipacked & 0x80:
                n = 1 << ((ipacked & 7) + 1)
                pal = data[pos : pos + 3 * n]
                if len(pal) < 3 * n:
                    raise ValueError("truncated GIF: short local color table")
                pos += 3 * n
            if not pal:
                raise ValueError("GIF image has no color table")
            min_code_size = data[pos]
            pos += 1
            if not 2 <= min_code_size <= 11:
                raise ValueError(f"corrupt GIF: LZW size {min_code_size}")
            stream = bytearray()
            while True:
                sz = data[pos]
                pos += 1
                if sz == 0:
                    break
                stream += data[pos : pos + sz]
                if len(data[pos : pos + sz]) < sz:
                    raise ValueError("truncated GIF: short data sub-block")
                pos += sz
            pixels = lzw_decode(bytes(stream), min_code_size)
            if len(pixels) < iw * ih:
                raise ValueError(
                    f"truncated GIF: {len(pixels)} pixels for {iw}x{ih}"
                )
            pixels = pixels[: iw * ih]
            if interlaced:
                # 4-pass row interlace (spec appendix E): rows arrive
                # 0,8,16… / 4,12… / 2,6… / 1,3,5…
                order = (
                    list(range(0, ih, 8))
                    + list(range(4, ih, 8))
                    + list(range(2, ih, 4))
                    + list(range(1, ih, 2))
                )
                rows = [b""] * ih
                for i, r in enumerate(order):
                    rows[r] = pixels[i * iw : (i + 1) * iw]
                pixels = b"".join(rows)
            return {
                "width": iw,
                "height": ih,
                "screen_width": sw,
                "screen_height": sh,
                "pixels": pixels[: iw * ih],
                "palette": pal,
            }
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated GIF: {exc}") from exc


# ------------------------------------------------------ animated GIFs


def encode_gif_anim(
    frames: list[dict], screen_w: int, screen_h: int, palette: bytes
) -> bytes:
    """Multi-frame GIF89a: one Graphic Control Extension per frame
    (delay in centiseconds), each frame its own sub-rectangle, all
    sharing the global color table. ``frames`` entries:
    {left, top, width, height, delay_cs, pixels}."""
    n_colors = max(2, len(palette) // 3)
    gct_bits = max(1, (n_colors - 1).bit_length())
    gct_size = 1 << gct_bits
    pal = palette + b"\x00" * (gct_size * 3 - len(palette))
    min_code_size = max(2, gct_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", screen_w, screen_h, 0x80 | ((gct_bits - 1) & 7), 0, 0
    )
    out += pal
    # Netscape looping extension — real-world animated GIFs carry it,
    # so the decoder's application-extension skip path is exercised
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        w, h = fr["width"], fr["height"]
        if len(fr["pixels"]) != w * h:
            raise ValueError("frame pixels length != width*height")
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 0x04, fr["delay_cs"], 0
        ) + b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", fr["left"], fr["top"], w, h, 0
        )
        out.append(min_code_size)
        stream = lzw_encode(fr["pixels"], min_code_size)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(data: bytes) -> dict:
    """Decode EVERY frame of a GIF87a/89a file.

    Returns {"screen_width", "screen_height", "palette", "frames":
    [{left, top, width, height, delay_cs, transparent, pixels}]}.
    Graphic Control Extensions are attached to the following image;
    other extensions are skipped; interlaced frames de-interlaced.
    """
    try:
        if data[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF: bad signature")
        sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
        pos = 13
        gct = b""
        if packed & 0x80:
            n = 1 << ((packed & 7) + 1)
            gct = data[pos : pos + 3 * n]
            if len(gct) < 3 * n:
                raise ValueError("truncated GIF: short global color table")
            pos += 3 * n
        frames: list[dict] = []
        delay_cs = 0
        transparent: int | None = None
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF: no trailer")
            b0 = data[pos]
            pos += 1
            if b0 == 0x3B:
                break
            if b0 == 0x21:
                label = data[pos]
                pos += 1
                if label == 0xF9 and data[pos] == 4:
                    gpacked, delay_cs, tidx = struct.unpack(
                        "<BHB", data[pos + 1 : pos + 5]
                    )
                    transparent = tidx if gpacked & 1 else None
                while True:
                    sz = data[pos]
                    pos += 1 + sz
                    if sz == 0:
                        break
                continue
            if b0 != 0x2C:
                raise ValueError(f"corrupt GIF: unexpected block 0x{b0:02x}")
            left, top, iw, ih, ipacked = struct.unpack(
                "<HHHHB", data[pos : pos + 9]
            )
            pos += 9
            interlaced = bool(ipacked & 0x40)
            pal = gct
            if ipacked & 0x80:
                n = 1 << ((ipacked & 7) + 1)
                pal = data[pos : pos + 3 * n]
                pos += 3 * n
            min_code_size = data[pos]
            pos += 1
            stream = bytearray()
            while True:
                sz = data[pos]
                pos += 1
                if sz == 0:
                    break
                chunk = data[pos : pos + sz]
                if len(chunk) < sz:
                    raise ValueError("truncated GIF: short data sub-block")
                stream += chunk
                pos += sz
            pixels = lzw_decode(bytes(stream), min_code_size)
            if len(pixels) < iw * ih:
                raise ValueError(
                    f"truncated GIF frame: {len(pixels)} px for {iw}x{ih}"
                )
            pixels = pixels[: iw * ih]
            if interlaced:
                order = (
                    list(range(0, ih, 8))
                    + list(range(4, ih, 8))
                    + list(range(2, ih, 4))
                    + list(range(1, ih, 2))
                )
                rows = [b""] * ih
                for i, r in enumerate(order):
                    rows[r] = pixels[i * iw : (i + 1) * iw]
                pixels = b"".join(rows)
            frames.append(
                {
                    "left": left,
                    "top": top,
                    "width": iw,
                    "height": ih,
                    "delay_cs": delay_cs,
                    "transparent": transparent,
                    "pixels": pixels,
                }
            )
            delay_cs = 0
            transparent = None
        if not frames:
            raise ValueError("GIF contains no image data")
        return {
            "screen_width": sw,
            "screen_height": sh,
            "palette": gct,
            "frames": frames,
        }
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated GIF: {exc}") from exc
