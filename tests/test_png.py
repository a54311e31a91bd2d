"""Pure-Python PNG codec (core/png.py) — no Spark needed.

The codec is the real-decode path of the multimodal operators
(reference semantics: `donut/util.py:113` image open,
`donut/model.py:188-218` resize); q29's oracle checks it end-to-end
against closed-form pixel arithmetic, these tests pin the codec itself.
"""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from donut_spark.core.png import decode_png, encode_png, resize_nearest


def _pattern(w, h, num=0):
    return bytes(
        (7 * x + 13 * y + 29 * c + num) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(filter_type):
    """Every scanline unfilter branch (None/Sub/Up/Average/Paeth) must
    reconstruct the source bytes exactly."""
    w, h = 17, 11
    rgb = _pattern(w, h, num=3)
    assert decode_png(encode_png(rgb, w, h, filter_type)) == (w, h, rgb)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_random_pixels(w, h, ft, seed):
    import random

    rng = random.Random(seed)
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    assert decode_png(encode_png(rgb, w, h, ft)) == (w, h, rgb)


def test_decoder_rejects_corruption():
    data = bytearray(encode_png(_pattern(6, 4), 6, 4))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x00" + bytes(data[1:]))
    # flip one IDAT payload byte -> chunk CRC mismatch
    idat = bytes(data).find(b"IDAT")
    data[idat + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_decoder_rejects_truncation_with_valueerror():
    """Truncated / garbage-after-signature input must raise ValueError
    (ONE guardable class), never struct.error or zlib.error — the
    multimodal stub-fallback catches (ValueError, NotImplementedError)."""
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"garbage not chunks")
    whole = encode_png(_pattern(6, 4), 6, 4)
    for cut in (9, 20, len(whole) - 5):
        with pytest.raises(ValueError):
            decode_png(whole[:cut])


def test_decoder_rejects_out_of_scope_formats():
    """Grayscale/16-bit/interlaced inputs must raise loudly, not return
    garbage pixels."""
    import struct

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload))
        )

    gray_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)  # colortype 0
    raw = zlib.compress(bytes(5) * 4)
    bad = sig + chunk(b"IHDR", gray_ihdr) + chunk(b"IDAT", raw) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="truecolor"):
        decode_png(bad)


def test_encode_validates_length():
    with pytest.raises(ValueError, match="length"):
        encode_png(b"\x00" * 10, 4, 4)


def test_resize_nearest_semantics():
    """Floor source mapping: src = (dst * src_dim) // dst_dim — 2x
    upscale duplicates each pixel; identity resize is a no-op."""
    rgb = _pattern(3, 2)
    assert resize_nearest(rgb, 3, 2, 3, 2) == rgb
    up = resize_nearest(rgb, 3, 2, 6, 4)
    # pixel (x, y) of the upscale == pixel (x // 2, y // 2) of the source
    for y in range(4):
        for x in range(6):
            src = rgb[((y // 2) * 3 + (x // 2)) * 3 : ((y // 2) * 3 + (x // 2)) * 3 + 3]
            assert up[(y * 6 + x) * 3 : (y * 6 + x) * 3 + 3] == src


def test_decoder_rejects_decompression_bomb():
    """A hostile PNG declaring huge IHDR dims with a tiny, highly
    compressible IDAT must raise ValueError BEFORE materializing the
    declared image (the poison-row contract: multimodal operators catch
    ValueError and take the stub path; an OOM would kill the executor)."""
    import struct

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload))
        )

    # 1 GP declared (3 GB RGB), IDAT only a few KB of zeros
    ihdr = struct.pack(">IIBBBBB", 32768, 32768, 8, 2, 0, 0, 0)
    bomb = sig + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(bytes(1 << 16))
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="decode bound"):
        decode_png(bomb)

    # dims within a small max_pixels bound but IDAT inflating far past
    # the declared scanline size: the capped inflate must raise, not
    # materialize the stream
    ihdr2 = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    over = sig + chunk(b"IHDR", ihdr2) + chunk(
        b"IDAT", zlib.compress(bytes(10_000_000))
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="wrong length"):
        decode_png(over)

    # zero-dimension IHDR is rejected too
    ihdr3 = struct.pack(">IIBBBBB", 0, 4, 8, 2, 0, 0, 0)
    zero = sig + chunk(b"IHDR", ihdr3) + chunk(
        b"IDAT", zlib.compress(b"")
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="decode bound"):
        decode_png(zero)
