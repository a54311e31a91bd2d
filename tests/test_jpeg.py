"""core/jpeg.py — JPEG marker-segment header codec (ITU-T T.81 / JFIF).

Header-only by design: the container has no entropy decoder, so the
codec's job is verifiable SOF dimensions (encode → parse roundtrip) and
a clean ValueError contract on malformed streams (the multimodal
poison-row discipline)."""

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


def test_synth_jpeg_rows_header_verified(spark):
    """synth_media_table's jpeg rows carry a real JFIF header whose SOF
    dims equal the claimed metadata — and decode_and_featurize's
    width/height come from the PARSED bytes, not the meta struct."""
    from pyspark.sql import functions as F

    from donut_spark.operators.multimodal import (
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
    feats = (
        decode_and_featurize(media)
        .join(jpegs.select("media_ref", "meta"), "media_ref")
        .collect()
    )
    for r in feats:
        assert (r.width, r.height) == (r.meta.width, r.meta.height)
        assert r.pix_sum is None  # pixels stay stubbed for jpeg
