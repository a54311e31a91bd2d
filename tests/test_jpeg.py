"""core/jpeg.py — JPEG layer (ITU-T T.81 / JFIF): marker parsing,
scan-less header emission, and the COMPLETE baseline grayscale codec.

Covered here: SOF dims roundtrips, the full encode→decode pixel loop
(bit-exact for flat blocks, ±1 for arbitrary content, property-fuzzed),
the DHT/entropy/MCU edge cases, and the ValueError/NotImplementedError
contract on malformed or color streams (the multimodal poison-row
discipline)."""

import pytest

from donut_spark.core.jpeg import JPEG_SOI, encode_jpeg_header, jpeg_dims


@pytest.mark.parametrize(
    "w,h", [(1, 1), (64, 64), (575, 64), (64, 575), (65535, 65535), (320, 240)]
)
def test_header_roundtrip(w, h):
    data = encode_jpeg_header(w, h, comment=b"seeded payload")
    assert data.startswith(JPEG_SOI) and data.endswith(b"\xff\xd9")
    assert jpeg_dims(data) == (w, h)


def test_parser_skips_fill_and_standalone_markers():
    # fill bytes (0xFF padding) and RST markers before SOF are legal
    data = encode_jpeg_header(17, 23)
    padded = data[:2] + b"\xff" + b"\xff\xd0" + data[2:]
    assert jpeg_dims(padded) == (17, 23)


def test_parser_rejects_malformed():
    good = encode_jpeg_header(10, 10)
    with pytest.raises(ValueError, match="SOI"):
        jpeg_dims(b"not a jpeg")
    with pytest.raises(ValueError, match="desync"):
        jpeg_dims(JPEG_SOI + b"\x00\x00")
    # truncated mid-segment
    with pytest.raises(ValueError, match="truncated"):
        jpeg_dims(good[: len(good) - 10])
    # EOI before any SOF
    with pytest.raises(ValueError, match="missing SOF"):
        jpeg_dims(JPEG_SOI + b"\xff\xd9")
    # zero dims in SOF
    bad = encode_jpeg_header(10, 10)
    idx = bad.index(b"\xff\xc0")
    zeroed = bad[: idx + 5] + b"\x00\x00" + bad[idx + 7 :]
    with pytest.raises(ValueError, match="zero"):
        jpeg_dims(zeroed)


def test_encoder_validates_dims():
    with pytest.raises(ValueError, match="out of range"):
        encode_jpeg_header(0, 10)
    with pytest.raises(ValueError, match="out of range"):
        encode_jpeg_header(70000, 10)


def test_synth_jpeg_rows_decoded_for_real(spark):
    """synth_media_table's jpeg rows are COMPLETE baseline grayscale
    JPEGs: header dims match claimed metadata, the full decode
    reproduces the flat-block pixels bit-exactly, and
    decode_and_featurize's width/height/pix_sum come from the decoded
    bytes, not the meta struct."""
    import numpy as np
    from pyspark.sql import functions as F

    from donut_spark.core.jpeg import decode_jpeg_gray
    from donut_spark.operators.multimodal import (
        _jpeg_pixels,
        _ref_num,
        decode_and_featurize,
        synth_media_table,
    )
    from donut_spark.sources.fixtures import load_spans

    spans = load_spans(spark, "/root/testdata/sf0.001").filter(
        F.col("doc_id").cast("long") < 60
    )
    media = synth_media_table(spark, spans)
    jpegs = media.filter(F.col("meta.format") == "jpeg")
    rows = jpegs.collect()
    assert rows, "fixture contains no jpeg refs below doc 60"
    for r in rows:
        assert jpeg_dims(bytes(r.content)) == (r.meta.width, r.meta.height)
        w, h, gray = decode_jpeg_gray(bytes(r.content))
        assert (w, h) == (r.meta.width, r.meta.height)
        # bit-exact roundtrip of the flat-block generation arithmetic
        assert gray == _jpeg_pixels(_ref_num(r.media_ref), w, h)
    feats = (
        decode_and_featurize(media)
        .join(jpegs.select("media_ref", "meta"), "media_ref")
        .collect()
    )
    for r in feats:
        assert (r.width, r.height) == (r.meta.width, r.meta.height)
        expected = np.frombuffer(
            _jpeg_pixels(_ref_num(r.media_ref), r.width, r.height), dtype=np.uint8
        )
        assert r.pix_sum == int(expected.astype(np.int64).sum())


def test_gray_codec_roundtrip_flat_blocks_exact():
    """Unit quant + flat 8x8 blocks: encode→decode is BIT-exact (the
    property the q29 oracle leans on), including non-multiple-of-8 dims
    (MCU pad + crop)."""
    import numpy as np

    from donut_spark.core.jpeg import decode_jpeg_gray, encode_jpeg_gray

    for w, h in ((16, 16), (17, 23), (63, 19), (8, 8), (9, 9)):
        img = np.zeros((h, w), dtype=np.uint8)
        for by in range((h + 7) // 8):
            for bx in range((w + 7) // 8):
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    bx * 7 + by * 13 + 200
                ) % 256
        data = encode_jpeg_gray(img[:h, :w].tobytes(), w, h)
        W, H, gray = decode_jpeg_gray(data)
        assert (W, H) == (w, h)
        assert gray == img[:h, :w].tobytes()


def test_gray_codec_roundtrip_arbitrary_within_one():
    """Arbitrary content: unit quantization keeps the only loss at DCT
    float rounding — every pixel within ±1."""
    import numpy as np

    from donut_spark.core.jpeg import decode_jpeg_gray, encode_jpeg_gray

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (21, 34), dtype=np.uint8)
    _, _, gray = decode_jpeg_gray(encode_jpeg_gray(img.tobytes(), 34, 21))
    got = np.frombuffer(gray, dtype=np.uint8).reshape(21, 34).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 1


def test_gray_codec_rejects_malformed():
    import numpy as np

    from donut_spark.core.jpeg import decode_jpeg_gray, encode_jpeg_gray

    img = np.full((8, 8), 77, dtype=np.uint8)
    good = encode_jpeg_gray(img.tobytes(), 8, 8)
    # scan-less 3-component header (the resize fallback shape): the
    # color path is the one honest NotImplementedError left
    with pytest.raises(NotImplementedError, match="single-component"):
        decode_jpeg_gray(encode_jpeg_header(8, 8))
    # single-component but no scan: everything up to (not including) SOS
    with pytest.raises(ValueError, match="missing SOF or SOS"):
        decode_jpeg_gray(good[: good.index(b"\xff\xda")] + b"\xff\xd9")
    # truncated entropy stream
    with pytest.raises(ValueError):
        decode_jpeg_gray(good[: len(good) - 4] )
    # corrupt a scan byte: either an invalid Huffman code or a stream
    # error — always ValueError, never a crash
    bad = bytearray(good)
    bad[-5] ^= 0x5A
    try:
        decode_jpeg_gray(bytes(bad))
    except ValueError:
        pass
    with pytest.raises(ValueError, match="length"):
        encode_jpeg_gray(b"\x00" * 10, 8, 8)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_gray_codec_roundtrip_fuzz(w, h, seed):
    """Property fuzz over arbitrary images and dims (incl. 1-pixel and
    non-multiple-of-8 edges): decode(encode(img)) stays within ±1 of
    the source everywhere, and dims survive exactly."""
    import numpy as np

    from donut_spark.core.jpeg import decode_jpeg_gray, encode_jpeg_gray

    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    W, H, gray = decode_jpeg_gray(encode_jpeg_gray(img.tobytes(), w, h))
    assert (W, H) == (w, h)
    got = np.frombuffer(gray, dtype=np.uint8).reshape(h, w).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 1


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_gray_decoder_never_crashes_on_garbage(data):
    """Adversarial bytes (raw, and wrapped in a valid SOI) must always
    raise ValueError/NotImplementedError — never IndexError/struct
    errors/OverflowError — per the poison-row contract."""
    from donut_spark.core.jpeg import decode_jpeg_gray

    for blob in (data, b"\xff\xd8" + data):
        try:
            decode_jpeg_gray(blob)
        except (ValueError, NotImplementedError):
            pass
