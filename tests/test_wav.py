"""RIFF/WAVE PCM codec + audio-modality tests.

Same discipline as test_png/test_jpeg/test_vp8: roundtrips across the
writer's parameter space, hand-built streams for chunk shapes the
writer doesn't emit, the poison-row contract for everything outside
the subset, hypothesis fuzz (garbage never mis-decodes), and the
Spark operator path (synth → featurize → resize → clip → decode)
verified over real bytes.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from donut_spark.core.wav import (
    MAX_WAV_BYTES,
    decode_wav,
    encode_wav,
    resample_nearest,
    wav_info,
)


def _frames(n, seed=7, width=2):
    vals = (np.arange(n, dtype=np.int64) * 31 + seed) % 65536
    return vals.astype("<u2").tobytes() if width == 2 else (
        (vals % 256).astype(np.uint8).tobytes()
    )


@pytest.mark.parametrize("channels,bits,rate", [
    (1, 16, 8000), (2, 16, 44100), (1, 8, 22050), (8, 16, 96000),
])
def test_roundtrip(channels, bits, rate):
    n_frames = 173
    data = _frames(n_frames * channels, width=bits // 8)
    b = encode_wav(data, rate, channels=channels, bits=bits, info=b"odd!!")
    assert wav_info(b) == (rate, channels, bits, n_frames)
    assert decode_wav(b) == (rate, channels, bits, data)


def test_unknown_chunks_are_skipped():
    """Real writers emit fact/cue/LIST chunks anywhere; the walk must
    skip them (with the odd-size pad byte) and still find fmt+data."""
    data = _frames(40)
    b = encode_wav(data, 16000, channels=1, bits=16)
    # splice a 5-byte (odd → padded) junk chunk between fmt and data
    fmt_end = b.index(b"data")
    junk = b"junk" + struct.pack("<I", 5) + b"abcde\x00"
    spliced = bytearray(b[:fmt_end] + junk + b[fmt_end:])
    spliced[4:8] = struct.pack("<I", len(spliced) - 8)
    assert decode_wav(bytes(spliced))[3] == data


def test_poison_paths():
    data = _frames(40)
    b = encode_wav(data, 16000, channels=2, bits=16)
    cases = {
        "magic": b"RIFX" + b[4:],
        "not wave": b[:8] + b"AVI " + b[12:],
        "truncated": b[:30],
        "float tag": b.replace(
            struct.pack("<HH", 1, 2), struct.pack("<HH", 3, 2), 1
        ),
        "declared overrun": b[:4]
        + struct.pack("<I", len(b) + 64)
        + b[8:],
    }
    for name, bad in cases.items():
        with pytest.raises(ValueError):
            decode_wav(bad)
        with pytest.raises(ValueError):
            wav_info(bad)
    # data chunk not whole frames (stereo 16-bit: block 4)
    odd = encode_wav(_frames(41)[: 41 * 2], 16000, channels=1, bits=16)
    odd = odd.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 1, 2), 1)
    with pytest.raises(ValueError):
        decode_wav(odd)  # block_align now inconsistent with fmt
    with pytest.raises(ValueError):
        encode_wav(b"abc", 8000, channels=2, bits=16)  # partial block
    with pytest.raises(ValueError):
        encode_wav(b"", 0, channels=1, bits=16)  # rate out of range


def test_bomb_guard():
    b = bytearray(encode_wav(_frames(8), 8000))
    i = b.index(b"data")
    b[i + 4 : i + 8] = struct.pack("<I", MAX_WAV_BYTES + 1)
    with pytest.raises(ValueError):
        decode_wav(bytes(b))


def test_resample_nearest_exact_indices():
    data = _frames(100 * 2)  # 100 stereo frames
    arr = np.frombuffer(data, "<u2").reshape(100, 2)
    for target in (1, 37, 100, 250):
        out = np.frombuffer(
            resample_nearest(data, 2, 16, target), "<u2"
        ).reshape(target, 2)
        want = arr[(np.arange(target) * 100) // target]
        assert np.array_equal(out, want)
    assert resample_nearest(b"", 1, 16, 0) == b""
    with pytest.raises(ValueError):
        resample_nearest(b"", 1, 16, 5)


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=120, deadline=None)
def test_garbage_never_misdecodes(blob):
    """Arbitrary bytes either raise ValueError or decode to a
    self-consistent PCM stream — never crash with another exception."""
    try:
        rate, ch, bits, frames = decode_wav(blob)
    except ValueError:
        return
    assert 1 <= rate <= 1_000_000 and 1 <= ch <= 8 and bits in (8, 16)
    assert len(frames) % (ch * bits // 8) == 0


def test_audio_modality_end_to_end(spark):
    """wav rows flow through synth → featurize → resize → clip →
    decode with REAL bytes at every hop: parsed rate/channels equal
    the claim, the clip checksums sum to the stream checksum, and a
    poison (float-PCM) row degrades to the stub path, never dies."""
    from donut_spark.operators.multimodal import (
        decode_and_featurize,
        decode_frames,
        sample_frames,
        synth_media_table,
    )
    from donut_spark.sources.fixtures import load_spans
    from tests.conftest import SF_SMALL
    from pyspark.sql import functions as F

    spans = load_spans(spark, SF_SMALL).filter(
        F.col("doc_id").cast("long") < 60
    )
    media = synth_media_table(spark, spans)
    wav_rows = media.filter(F.col("meta.format") == "wav").collect()
    assert wav_rows, "rotation must produce audio rows"
    from donut_spark.core.wav import decode_wav as _dec

    feats = {
        r.media_ref: r
        for r in decode_and_featurize(
            media.filter(F.col("meta.format") == "wav")
        ).collect()
    }
    for m in wav_rows:
        rate, ch, bits, frames = _dec(bytes(m.content))
        assert (rate, ch) == (m.meta.width, m.meta.height)
        f = feats[m.media_ref]
        assert (f.width, f.height) == (rate, ch)
        assert f.pix_sum == int(np.frombuffer(frames, "<u2").sum())
        assert len(f.features) == 8 and all(0 <= v <= 1 for v in f.features)

    clips = decode_frames(
        sample_frames(media.filter(F.col("meta.format") == "wav"), every_n=30)
    )
    agg = {
        r.media_ref: r
        for r in clips.groupBy("media_ref")
        .agg(F.sum("pix_sum").alias("s"), F.sum("is_key").alias("n"))
        .collect()
    }
    for m in wav_rows:
        a = agg[m.media_ref]
        assert a.s == feats[m.media_ref].pix_sum  # clips partition it
        assert a.n == -(-m.meta.n_frames // 30)  # ceil

    # poison: a float-PCM (format tag 3) WAV must take the stub path
    bad = bytearray(bytes(wav_rows[0].content))
    i = bad.index(b"fmt ")
    bad[i + 8 : i + 10] = struct.pack("<H", 3)
    poison = spark.createDataFrame(
        [(wav_rows[0].media_ref, bytes(bad), wav_rows[0].meta)],
        media.schema,
    )
    out = decode_and_featurize(poison).first()
    assert out.pix_sum is None  # stub path, no crash


def test_streaming_media_ingest_matches_batch(spark, tmp_path):
    """Media landing zone: decode_and_featurize is a stateless Arrow
    kernel, so it runs UNCHANGED over a file stream of binary media
    rows and produces exactly the batch rows — the audio/image twin of
    the PDF ingest stream."""
    import os

    from pyspark.sql import functions as F

    from donut_spark.operators.multimodal import (
        decode_and_featurize,
        synth_media_table,
    )
    from donut_spark.sources.fixtures import load_spans
    from tests.conftest import SF_SMALL

    spans = load_spans(spark, SF_SMALL).filter(
        F.col("doc_id").cast("long") < 40
    )
    media = synth_media_table(spark, spans)
    batch = {
        r.media_ref: (r.width, r.height, r.pix_sum)
        for r in decode_and_featurize(media).collect()
    }

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    media.coalesce(1).write.parquet(os.path.join(src, "b1"))
    stream = spark.readStream.schema(media.schema).parquet(src + "/*")
    q = (
        decode_and_featurize(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r.media_ref: (r.width, r.height, r.pix_sum)
        for r in spark.read.parquet(out).collect()
    }
    assert streamed == batch
    # all four modalities were actually present in the staged batch
    fmts = {r.meta.format for r in media.collect()}
    assert fmts == {"png", "jpeg", "webm", "wav"}


def test_duplicate_data_chunk_poisons():
    """ADVICE r5: a second data chunk (e.g. an empty trailer) must raise
    instead of silently replacing the first decode with silence."""
    import struct

    import pytest

    from donut_spark.core.wav import decode_wav, encode_wav

    b = bytearray(encode_wav(b"\x01\x00\x02\x00" * 10, 16000, channels=1, bits=16))
    b += b"data" + struct.pack("<I", 0)  # empty trailing data chunk
    b[4:8] = struct.pack("<I", len(b) - 8)  # fix RIFF size
    with pytest.raises(ValueError, match="duplicate data"):
        decode_wav(bytes(b))
