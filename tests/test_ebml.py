"""core/ebml.py — EBML/Matroska-WebM header codec (RFC 8794 + the
public Matroska element registry). Header-only: the codec's job is
verifiable video-track dimensions (encode → parse roundtrip) and a
clean ValueError contract on malformed streams."""

import pytest

from donut_spark.core.ebml import EBML_MAGIC, encode_webm_header, webm_dims


@pytest.mark.parametrize(
    "w,h",
    [(1, 1), (64, 64), (575, 64), (320, 240), (1920, 1080), (70000, 70000)],
)
def test_header_roundtrip(w, h):
    data = encode_webm_header(w, h, payload=b"seeded payload bytes")
    assert data.startswith(EBML_MAGIC)
    assert webm_dims(data) == (w, h)


def test_multibyte_vint_sizes():
    # a payload long enough to force a 2-byte size vint on Segment/Void
    data = encode_webm_header(12, 34, payload=b"\xa5" * 500)
    assert webm_dims(data) == (12, 34)


def test_parser_rejects_malformed():
    good = encode_webm_header(10, 20)
    with pytest.raises(ValueError, match="magic"):
        webm_dims(b"not ebml at all")
    with pytest.raises(ValueError):
        webm_dims(good[: len(good) - 6])  # truncated inside Void/Tracks
    # no video track: EBML header only
    header_only = good[: good.index(b"\x18\x53\x80\x67")]
    with pytest.raises(ValueError, match="no video"):
        webm_dims(header_only)
    # element overrunning its parent
    bad = bytearray(good)
    idx = bad.index(b"\xb0")  # PixelWidth id
    bad[idx + 1] = 0xFF - 0x80 + 0x80  # keep 1-byte marker, huge size
    bad[idx + 1] = 0xFE
    with pytest.raises(ValueError):
        webm_dims(bytes(bad))


def test_encoder_validates_dims():
    with pytest.raises(ValueError, match="out of range"):
        encode_webm_header(0, 10)


def test_synth_webm_rows_header_verified(spark):
    """synth_media_table's webm rows carry a real EBML header whose
    video-track dims equal the claimed metadata — and
    decode_and_featurize's width/height come from the PARSED bytes."""
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
    webms = media.filter(F.col("meta.format") == "webm")
    rows = webms.collect()
    assert rows, "fixture contains no webm refs below doc 60"
    for r in rows:
        assert webm_dims(bytes(r.content)) == (r.meta.width, r.meta.height)
    feats = (
        decode_and_featurize(media)
        .join(webms.select("media_ref", "meta"), "media_ref")
        .collect()
    )
    for r in feats:
        assert (r.width, r.height) == (r.meta.width, r.meta.height)
        assert r.pix_sum is None  # frames/pixels stay stubbed for webm


def test_resize_keeps_headers_real(spark):
    """resize_media's jpeg/webm outputs carry a REAL header at the
    TARGET dims, so a chained featurize verifies dims from bytes."""
    from pyspark.sql import functions as F

    from donut_spark.core.jpeg import jpeg_dims
    from donut_spark.operators.multimodal import resize_media, synth_media_table
    from donut_spark.sources.fixtures import load_spans

    spans = load_spans(spark, "/root/testdata/sf0.001").filter(
        F.col("doc_id").cast("long") < 40
    )
    media = synth_media_table(spark, spans)
    resized = resize_media(media, width=96, height=72)
    fmt = media.select("media_ref", F.col("meta.format").alias("fmt"))
    for r in resized.join(fmt, "media_ref").collect():
        raw = bytes(r.content)
        if r.fmt == "jpeg":
            assert jpeg_dims(raw) == (96, 72)
        elif r.fmt == "webm":
            assert webm_dims(raw) == (96, 72)
        assert (r.width, r.height) == (96, 72)


def test_frames_roundtrip_multicluster():
    """SimpleBlock demux: 60 frames span 3 clusters (25/cluster); the
    parser returns every payload in order with absolute timestamps
    (cluster Timestamp + signed relative ts)."""
    from donut_spark.core.ebml import webm_frames

    frames = [bytes([i % 256]) * 5 for i in range(60)]
    data = encode_webm_header(32, 24, payload=b"x", frames=frames)
    got = webm_frames(data)
    assert [ts for ts, _ in got] == list(range(60))
    assert [p for _, p in got] == frames
    assert webm_dims(data) == (32, 24)  # dims parse unaffected by clusters


def test_sample_frames_demuxes_real_blocks(spark):
    """sample_frames walks the REAL Matroska container: the emitted
    payloads are the SimpleBlock contents (independently recomputable
    from the synth's frame function), timestamps are container-absolute,
    and the every_n stride holds."""
    import zlib

    from pyspark.sql import functions as F

    from donut_spark.core.vp8 import vp8_frame_is_key
    from donut_spark.operators.multimodal import (
        VP8_KEY_EVERY,
        _frame_payload,
        _ref_num,
        _webm_dims_for,
        sample_frames,
        synth_media_table,
    )
    from donut_spark.sources.fixtures import load_spans

    spans = load_spans(spark, "/root/testdata/sf0.001").filter(
        F.col("doc_id").cast("long") < 60
    )
    media = synth_media_table(spark, spans)
    webms = {
        r.media_ref: r.meta.n_frames
        for r in media.filter(F.col("meta.format") == "webm").collect()
    }
    assert webms
    out = sample_frames(media, every_n=7).collect()
    by_ref: dict = {}
    for r in out:
        by_ref.setdefault(r.media_ref, []).append(r)
    n_key = 0
    for ref, n_frames in webms.items():
        rows = sorted(by_ref[ref], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == list(range(0, n_frames, 7))
        seed, num = zlib.crc32(ref.encode()), _ref_num(ref)
        w, h, _n = _webm_dims_for(num)
        for r in rows:
            payload = bytes(r.content)
            assert payload == _frame_payload(seed, num, r.frame_idx, w, h)
            # key-frame cadence is observable from the frame tag alone
            assert vp8_frame_is_key(payload) == (
                r.frame_idx % VP8_KEY_EVERY == 0
            )
            n_key += r.frame_idx % VP8_KEY_EVERY == 0
    assert n_key > 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_ebml_parsers_never_crash_on_garbage(data):
    """Adversarial bytes (raw, and wrapped in valid EBML magic) must
    always raise ValueError from webm_dims/webm_frames — never an
    unguarded exception class — per the poison-row contract."""
    from donut_spark.core.ebml import EBML_MAGIC, webm_dims, webm_frames

    for blob in (data, EBML_MAGIC + data):
        for fn in (webm_dims, webm_frames):
            try:
                fn(blob)
            except ValueError:
                pass
