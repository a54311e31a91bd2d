"""Pure-Python PNG codec on stdlib ``zlib`` — the real-decode path for
the multimodal operators (this container has no PIL, but PNG truecolor
is just zlib + per-scanline filters, both reimplementable from the
public spec, RFC 2083).

Scope: 8-bit truecolor (color type 2), no interlace — the common case a
training pipeline's image columns carry. The DECODER handles all five
scanline filter types (None/Sub/Up/Average/Paeth); the ENCODER can emit
any single filter type (default 0) so round-trip tests exercise every
unfilter branch. Anything outside scope raises, loudly.

Reference semantics being reproduced Spark-side: the image-open /
resize-and-pad preprocessing of `donut/util.py:113` and
`donut/model.py:188-218` — here as decode + nearest-neighbor resize
over raw RGB (deterministic, library-free).
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["encode_png", "decode_png", "resize_nearest", "PNG_SIGNATURE"]

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_SIG = PNG_SIGNATURE
_BPP = 3  # truecolor 8-bit: 3 bytes per pixel


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload))
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ftype: int, row: bytes, prev: bytes) -> bytearray:
    # the hot production paths (the encoder default is filter 0; Up has
    # no intra-row dependency) are O(1) Python ops / one numpy subtract —
    # a per-byte interpreter loop here costs tens of ms per 224×224
    # image inside executor UDFs. Sub/Average/Paeth keep the loop (they
    # exist so tests can exercise every decoder branch).
    if ftype == 0:
        return bytearray(row)
    if ftype == 2:
        import numpy as np

        r = np.frombuffer(row, dtype=np.uint8)
        p = np.frombuffer(prev, dtype=np.uint8)
        return bytearray((r - p).tobytes())  # uint8 wraps mod 256
    out = bytearray(len(row))
    for i, x in enumerate(row):
        left = row[i - _BPP] if i >= _BPP else 0
        up = prev[i]
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - left) & 0xFF
        elif ftype == 2:
            out[i] = (x - up) & 0xFF
        elif ftype == 3:
            out[i] = (x - ((left + up) >> 1)) & 0xFF
        elif ftype == 4:
            ul = prev[i - _BPP] if i >= _BPP else 0
            out[i] = (x - _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def _unfilter_row(ftype: int, row: bytearray, prev: bytes) -> bytearray:
    # vectorized fast paths first (see _filter_row): filter 0 is the
    # decode hot path for our own encoder's output
    if ftype == 0:
        return row
    if ftype == 2:
        import numpy as np

        r = np.frombuffer(bytes(row), dtype=np.uint8)
        p = np.frombuffer(prev, dtype=np.uint8)
        return bytearray((r + p).tobytes())
    # in place: reconstructed bytes feed the left/upper-left references
    for i in range(len(row)):
        left = row[i - _BPP] if i >= _BPP else 0
        up = prev[i]
        if ftype == 0:
            pass
        elif ftype == 1:
            row[i] = (row[i] + left) & 0xFF
        elif ftype == 2:
            row[i] = (row[i] + up) & 0xFF
        elif ftype == 3:
            row[i] = (row[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:
            ul = prev[i - _BPP] if i >= _BPP else 0
            row[i] = (row[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return row


def encode_png(
    rgb: bytes, width: int, height: int, filter_type: int = 0
) -> bytes:
    """RGB8 bytes (row-major, 3 bytes/pixel) → PNG file bytes."""
    stride = width * _BPP
    if len(rgb) != stride * height:
        raise ValueError(
            f"rgb length {len(rgb)} != {width}x{height}x3 = {stride * height}"
        )
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = rgb[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        raw += _filter_row(filter_type, row, prev)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


MAX_DECODE_PIXELS = 64 * 1024 * 1024  # 64 MP ⇒ ≤ ~192 MB RGB — poison-row bound


def decode_png(data: bytes, max_pixels: int = MAX_DECODE_PIXELS) -> tuple[int, int, bytes]:
    """PNG file bytes → (width, height, RGB8 bytes). CRCs are verified;
    non-truecolor / interlaced / 16-bit inputs raise.

    Decompression-bomb-guarded: a hostile PNG can declare huge IHDR dims
    and pack a tiny, highly compressible IDAT, so (a) width·height is
    bounded by ``max_pixels`` BEFORE any decompression, and (b) inflate
    runs through ``decompressobj`` with output capped at the expected
    scanline size — an executor never allocates more than the declared
    (bounded) image, and oversize/overflowing inputs raise ValueError so
    the multimodal operators' poison-row contract (catch ValueError /
    NotImplementedError → stub path, never die) holds."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos < len(data):
        # bounds before unpack: truncated/garbage chunk data must raise
        # a clean ValueError, not struct.error, so callers can guard the
        # decode with one exception class
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk payload")
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            if len(payload) != 13:
                raise ValueError("malformed PNG IHDR")
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG is supported "
                    f"(got depth={depth} colortype={ctype} interlace={interlace})"
                )
            if width == 0 or height == 0 or width * height > max_pixels:
                raise ValueError(
                    f"PNG dimensions {width}x{height} outside decode bound "
                    f"(max {max_pixels} pixels)"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    stride = width * _BPP
    expected = (stride + 1) * height
    try:
        # cap inflate output at the declared scanline size (+1 so an
        # oversize stream is distinguishable from an exact fit): a bomb
        # IDAT stops at the bound instead of materializing
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    if len(raw) != expected or d.unconsumed_tail:
        raise ValueError("PNG scanline data has wrong length")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = _unfilter_row(ftype, row, prev)
        out[y * stride : (y + 1) * stride] = prev
    return width, height, bytes(out)


def resize_nearest(
    rgb: bytes, width: int, height: int, new_width: int, new_height: int
) -> bytes:
    """Nearest-neighbor resize of RGB8 bytes (floor source mapping:
    src = (dst * src_dim) // dst_dim) — deterministic, numpy-vectorized."""
    import numpy as np

    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, _BPP)
    ys = (np.arange(new_height) * height) // new_height
    xs = (np.arange(new_width) * width) // new_width
    return arr[ys][:, xs].tobytes()
