"""Multimodal column plumbing: opaque binary media + typed metadata.

The reference carries images as files on disk next to metadata.jsonl
(`donut/util.py:113`, S3/S8 in SURVEY.md §2.1); at 100 TB the Spark
shape is a media table ``(media_ref string, content binary,
meta struct<format,width,height,n_frames>)`` joined to span tables on
``media_ref``. The Spark-side plumbing here — schemas, partitioning,
``mapInPandas`` batch shape, join strategy — is real and tested.

Codecs: **all three formats are REAL end-to-end.** PNG rows carry
actual truecolor PNGs (``core/png.py``, pure zlib) and decode through
a real parse → unfilter → pixel pipeline; JPEG rows carry real
baseline grayscale JPEGs (``core/jpeg.py`` — full DCT/quant/Huffman);
webm rows carry real EBML/Matroska containers (``core/ebml.py``) whose
SimpleBlocks hold REAL VP8 key frames at the key-frame cadence
(``core/vp8.py`` — bool decoder, token decode, IWHT/IDCT, intra
prediction). Decoded dimensions and pixel checksums for every format
are verified against an independent SQL oracle (q29).
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "synth_media_table",
    "decode_and_featurize",
    "join_spans_with_media",
    "resize_media",
    "sample_frames",
    "decode_frames",
    "RESIZED_SCHEMA",
    "FRAME_SCHEMA",
    "FRAME_PIXELS_SCHEMA",
    "VP8_KEY_EVERY",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
        # real-decode audit channel: sum of decoded RGB bytes (null for
        # stub-codec formats) — what the q29 oracle recomputes from the
        # generation arithmetic without any PNG code
        StructField("pix_sum", LongType()),
    ]
)


def _have_pillow() -> bool:
    try:  # pragma: no cover - not installed in this container
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _ref_num(ref: str) -> int:
    """Deterministic per-ref integer from the ``img_<doc>_<idx>`` naming
    (fixtures.py): SQL-computable (split_part + cast), unlike a crc —
    which is what lets the q29 oracle re-derive format choice, PNG
    dimensions, and pixel values independently. Refs outside the
    canonical naming fall back to a crc-derived number (still
    deterministic; a malformed ref must not fail a corpus-scale job —
    only the SQL replayability is lost for that row)."""
    parts = ref.split("_")
    try:
        return int(parts[1]) * 1000 + int(parts[2])
    except (IndexError, ValueError):
        return zlib.crc32(ref.encode())


def _png_dims(num: int) -> tuple[int, int]:
    return 8 + (num * 7) % 24, 8 + (num * 13) % 24


def _jpeg_dims_for(num: int) -> tuple[int, int]:
    """Claimed-and-encoded jpeg dims — closed-form in the ref number so
    the q29 oracle recomputes them without any JPEG code. Small like the
    PNG dims (the decode runs per-block in Python), and deliberately NOT
    multiples of 8 for most refs so MCU padding + crop is exercised."""
    return 16 + (num * 11) % 48, 16 + (num * 17) % 48


def _jpeg_block_value(num: int, bx: int, by: int) -> int:
    """Gray level of 8x8 block (bx, by): flat blocks make the baseline
    encode→decode loop bit-exact (unit quant ⇒ AC quantizes to exactly
    0, DC path integer) — so pixel(x, y) = value(x//8, y//8) is
    closed-form arithmetic both the synth and the SQL oracle evaluate."""
    return (bx * 7 + by * 13 + num) % 256


def _jpeg_pixels(num: int, width: int, height: int) -> bytes:
    import numpy as np

    bx = (np.arange(width, dtype=np.int64) // 8) * 7
    by = (np.arange(height, dtype=np.int64) // 8) * 13
    return ((by[:, None] + bx[None, :] + num) % 256).astype(np.uint8).tobytes()


def _webm_dims_for(num: int) -> tuple[int, int, int]:
    """(width, height, n_frames) for webm rows — closed-form in the ref
    number so the q29 oracle recomputes them without any EBML code."""
    return 64 + (num * 23) % 512, 64 + (num * 29) % 512, 1 + (num * 7) % 120


#: key-frame cadence of the synth webm streams (a GOP of 10): frame
#: indices that are multiples of this carry REAL VP8 key frames.
VP8_KEY_EVERY = 10


def _vp8_mb_grid(num: int, idx: int, mb_w: int, mb_h: int) -> list:
    """Per-macroblock luma constants of frame ``idx`` — closed-form in
    the ref number so a SQL oracle recomputes decoded pixel sums with
    no VP8 code: ``v(mx, my) = (7·mx + 13·my + 31·idx + num) mod 256``."""
    return [
        [(7 * mx + 13 * my + 31 * idx + num) % 256 for mx in range(mb_w)]
        for my in range(mb_h)
    ]


def _frame_payload(seed: int, num: int, idx: int, w: int, h: int) -> bytes:
    """Codec payload for frame ``idx`` of a synth webm stream. Every
    ``VP8_KEY_EVERY``-th frame is a REAL VP8 key frame
    (``core/vp8.py`` — constant-per-MB luma, bit-exact roundtrip); the
    frames between them are inter-frame stand-ins whose 3-byte frame
    tag marks a non-key frame exactly as a real stream's delta frames
    would (the subset decoder routes them to quarantine)."""
    from ..core.vp8 import encode_vp8_key_frame

    if idx % VP8_KEY_EVERY == 0:
        grid = _vp8_mb_grid(num, idx, (w + 15) >> 4, (h + 15) >> 4)
        return encode_vp8_key_frame(grid, w, h)
    h32 = zlib.crc32(idx.to_bytes(4, "big"), seed)
    body = (h32.to_bytes(4, "big") * 8)[:32]
    # frame tag bit 0 set = inter frame (RFC 6386 §9.1)
    return bytes((body[0] | 1,)) + body[1:]


def _png_pixels(num: int, width: int, height: int) -> bytes:
    """pixel(x, y, c) = (7x + 13y + 29c + num) mod 256 — closed-form
    arithmetic both the Spark synth and the SQL oracle evaluate."""
    import numpy as np

    x = np.arange(width, dtype=np.int64) * 7
    y = np.arange(height, dtype=np.int64) * 13
    c = np.arange(3, dtype=np.int64) * 29
    grid = (y[:, None, None] + x[None, :, None] + c[None, None, :] + num) % 256
    return grid.astype(np.uint8).tobytes()


def _wav_params(num: int) -> tuple[int, int, int]:
    """(sample_rate, channels, n_frames) for wav rows — closed-form in
    the ref number so the q29 oracle recomputes them without any RIFF
    code. The MEDIA_SCHEMA meta fields are typed for images, so audio
    reuses them as documented: width = sample_rate, height = channels."""
    return 8000 + (num * 41) % 36000, 1 + num % 2, 64 + (num * 37) % 512


def _wav_sample_bytes(num: int, total: int) -> bytes:
    """Interleaved 16-bit PCM: value(i) = (31·i + 7·num) mod 65536 as
    little-endian uint16 (same bit pattern as the signed samples a
    player sees) — the unsigned sum is the SQL-recomputable checksum."""
    import numpy as np

    return (
        ((np.arange(total, dtype=np.int64) * 31 + num * 7) % 65536)
        .astype("<u2")
        .tobytes()
    )


def synth_media_table(spark: SparkSession, spans_df: DataFrame) -> DataFrame:
    """Deterministic media table for every media_ref in a spans table.

    PNG-format rows (``num % 4 == 1``) carry REAL truecolor PNG bytes
    (``core/png.py``) of small seed-derived dimensions, with metadata
    matching the true encoded dims — so downstream decode is a real
    codec exercise. jpeg rows (``num % 4 == 0``) carry REAL baseline
    grayscale JPEGs (``core/jpeg.py`` — flat 8×8 blocks, bit-exact
    lossy roundtrip) whose decoded dims and pixels the q29 oracle
    recomputes analytically. webm rows (``num % 4 == 2``) carry a REAL
    EBML/Matroska container (``core/ebml.py`` — DocType webm, video
    TrackEntry with PixelWidth/PixelHeight matching the claimed
    metadata) whose SimpleBlocks hold REAL VP8 key frames at the
    key-frame cadence (``core/vp8.py`` — constant-per-MB luma, exact
    roundtrip) and tag-marked inter-frame stand-ins between them.
    wav rows (``num % 4 == 3``, the AUDIO modality) carry REAL RIFF/WAVE
    16-bit PCM (``core/wav.py`` — fmt + LIST/INFO + data chunk walk)
    with ref-arithmetic samples, so the decoded sample checksum is
    SQL-recomputable; meta reuses width = sample_rate, height =
    channels. Everything is derived from the ref string — stable across
    runs, partitionings, and cluster sizes.
    """
    refs = (
        spans_df.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        from ..core.ebml import encode_webm_header
        from ..core.jpeg import encode_jpeg_gray
        from ..core.png import encode_png
        from ..core.wav import encode_wav

        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                num = _ref_num(ref)
                fmt = ["jpeg", "png", "webm", "wav"][num % 4]
                seed = zlib.crc32(ref.encode())
                if fmt == "png":
                    w, h = _png_dims(num)
                    content = encode_png(_png_pixels(num, w, h), w, h)
                    meta = {"format": fmt, "width": w, "height": h, "n_frames": 1}
                elif fmt == "jpeg":
                    # REAL baseline grayscale JPEG: flat 8x8 blocks with
                    # ref-arithmetic gray levels, so dims AND decoded
                    # pixels are SQL-recomputable (bit-exact roundtrip —
                    # see core/jpeg.py)
                    w, h = _jpeg_dims_for(num)
                    content = encode_jpeg_gray(
                        _jpeg_pixels(num, w, h),
                        w,
                        h,
                        comment=(seed.to_bytes(4, "big") * 16)[:64],
                    )
                    meta = {"format": fmt, "width": w, "height": h, "n_frames": 1}
                elif fmt == "wav":
                    rate, channels, n_frames = _wav_params(num)
                    content = encode_wav(
                        _wav_sample_bytes(num, channels * n_frames),
                        rate,
                        channels=channels,
                        bits=16,
                        info=(seed.to_bytes(4, "big") * 4)[:13],
                    )
                    meta = {
                        "format": fmt,
                        "width": rate,
                        "height": channels,
                        "n_frames": n_frames,
                    }
                else:
                    w, h, n_frames = _webm_dims_for(num)
                    # structurally real Matroska: one SimpleBlock per
                    # frame; every VP8_KEY_EVERY-th payload is a REAL
                    # VP8 key frame (core/vp8.py), the rest are
                    # tag-marked inter-frame stand-ins
                    content = encode_webm_header(
                        w,
                        h,
                        payload=(seed.to_bytes(4, "big") * 16)[:64],
                        frames=[
                            _frame_payload(seed, num, i, w, h)
                            for i in range(n_frames)
                        ],
                    )
                    meta = {
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "n_frames": n_frames,
                    }
                rows.append((ref, content, meta))
            yield pd.DataFrame(rows, columns=["media_ref", "content", "meta"])

    return refs.mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_and_featurize(media_df: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode media and emit fixed-size features, batch-wise.

    PNG rows run the REAL decode (``core/png.py``): width/height come
    from the parsed IHDR, ``pix_sum`` is the sum of decoded RGB bytes
    (the oracle-checkable pixel checksum), and features are per-band
    grayscale means over the actual pixels (``feat_dim`` horizontal
    bands, /255). jpeg rows run the REAL baseline grayscale decode
    (``core/jpeg.py``: Huffman, dequant, IDCT) — dims, ``pix_sum`` and
    band features come from the decoded pixels; scan-less/color streams
    degrade to SOF header dims, then to metadata. webm rows parse the
    REAL EBML video-track header (``core/ebml.py``) for dims at the
    container level (``pix_sum`` null here — per-frame pixel decode is
    :func:`decode_frames`' job over :func:`sample_frames`' output).
    The Arrow batch plumbing is exactly what a full codec stack would
    plug into.
    """
    use_real = _have_pillow()

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..core.ebml import EBML_MAGIC, webm_dims
        from ..core.jpeg import JPEG_SOI, decode_jpeg_gray, jpeg_dims
        from ..core.png import PNG_SIGNATURE, decode_png
        from ..core.wav import RIFF_MAGIC, decode_wav

        for pdf in batches:
            rows = []
            for ref, content, meta in zip(
                pdf["media_ref"], pdf["content"], pdf["meta"]
            ):
                # content-signature dispatch, decode guarded: a row whose
                # meta claims png but whose bytes aren't takes the stub
                # path via the signature check; a SIGNED but unsupported
                # or corrupt PNG (grayscale/16-bit/interlaced, truncated
                # IDAT, bad CRC) must ALSO fall through to the stub, not
                # kill a corpus-scale stage on one poison row
                decoded = None
                if bytes(content).startswith(PNG_SIGNATURE):
                    try:
                        decoded = decode_png(bytes(content))
                    except (ValueError, NotImplementedError):
                        decoded = None
                if decoded is not None:
                    w, h, rgb = decoded
                    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
                    gray = arr.mean(axis=2)
                    bands = np.array_split(gray, feat_dim, axis=0)
                    feats = [
                        float(b.mean() / 255.0) if b.size else 0.0
                        for b in bands
                    ]
                    rows.append((ref, w, h, feats, int(arr.sum())))
                    continue
                raw = bytes(content)
                # AUDIO: real RIFF/WAVE PCM decode — width carries the
                # parsed sample rate, height the channel count (the
                # MEDIA_SCHEMA reuse _wav_params documents), pix_sum the
                # unsigned-sample checksum the q29 oracle recomputes,
                # and features are per-band mean |amplitude| (feat_dim
                # time bands, /32768). Malformed/non-PCM streams fall
                # through to the stub path, never crash.
                if raw.startswith(RIFF_MAGIC):
                    try:
                        rate, channels, bits, frames = decode_wav(raw)
                        if bits == 16:
                            u = np.frombuffer(frames, dtype="<u2")
                            signed = u.astype(np.int32)
                            signed[signed >= 32768] -= 65536
                            amp = np.abs(signed) / 32768.0
                        else:  # 8-bit PCM is unsigned, midpoint 128
                            u = np.frombuffer(frames, dtype=np.uint8)
                            amp = np.abs(u.astype(np.int32) - 128) / 128.0
                        bands = np.array_split(amp, feat_dim)
                        feats = [
                            float(b.mean()) if b.size else 0.0
                            for b in bands
                        ]
                        rows.append(
                            (ref, rate, channels, feats, int(u.sum()))
                        )
                        continue
                    except (ValueError, NotImplementedError):
                        pass
                # JPEG: real baseline grayscale decode (pix_sum + band
                # features over decoded pixels); scan-less or color
                # streams degrade to SOF header dims, then to meta.
                if raw.startswith(JPEG_SOI):
                    try:
                        jw, jh, gray_bytes = decode_jpeg_gray(raw)
                        garr = np.frombuffer(gray_bytes, dtype=np.uint8).reshape(
                            jh, jw
                        )
                        bands = np.array_split(
                            garr.astype(np.float64), feat_dim, axis=0
                        )
                        feats = [
                            float(b.mean() / 255.0) if b.size else 0.0
                            for b in bands
                        ]
                        rows.append((ref, jw, jh, feats, int(garr.sum())))
                        continue
                    except (ValueError, NotImplementedError):
                        pass
                # webm: real EBML video-track dims (frame pixels are
                # decode_frames' job). Malformed streams fall to the
                # meta-dims stub path, never crash.
                jdims = None
                if raw.startswith(JPEG_SOI):
                    try:
                        jdims = jpeg_dims(raw)
                    except ValueError:
                        jdims = None
                elif raw.startswith(EBML_MAGIC):
                    try:
                        jdims = webm_dims(raw)
                    except ValueError:
                        jdims = None
                if use_real:  # pragma: no cover - container has no PIL
                    raise NotImplementedError(
                        "real jpeg/video decode: plug PIL.Image.open / "
                        "ffmpeg over content bytes here"
                    )
                hsh = zlib.crc32(bytes(content))
                feats = []
                for i in range(feat_dim):
                    hsh = zlib.crc32(i.to_bytes(2, "big"), hsh)
                    feats.append((hsh % 10_000) / 10_000.0)
                w, h = jdims if jdims is not None else (meta["width"], meta["height"])
                rows.append((ref, w, h, feats, None))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "width", "height", "features", "pix_sum"],
            )

    return media_df.mapInPandas(decode, schema=FEATURE_SCHEMA)


def join_spans_with_media(spans_df: DataFrame, media_df: DataFrame) -> DataFrame:
    """Attach media metadata to media spans.

    The media table at production scale is orders of magnitude smaller
    than the spans fact table after projection (refs + meta only), so we
    broadcast the projected dim side when it fits; Spark falls back to
    shuffle join automatically above the threshold.
    """
    dim = media_df.select("media_ref", "meta")
    exploded = spans_df.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "media")
    return exploded.join(F.broadcast(dim), exploded["s.media_ref"] == dim["media_ref"], "left").select(
        "doc_id", F.col("s.media_ref").alias("media_ref"), F.col("s.offset").alias("offset"), "meta"
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("content", BinaryType()),
    ]
)

FRAME_PIXELS_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pix_sum", LongType()),
        StructField("is_key", IntegerType()),
    ]
)


def resize_media(
    media_df: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Batch resize to a fixed target (the training-pipeline normalize
    step; reference `donut/model.py:188-218` resize/pad).

    PNG rows run a REAL decode → nearest-neighbor resize → re-encode
    (``core/png.py``); jpeg rows likewise run the REAL baseline
    grayscale transcode (``core/jpeg.py``: decode → nearest resample →
    re-encode) — the outputs are valid images of the target dimensions.
    webm rows re-emit a REAL EBML header at the TARGET dimensions with
    a seed-derived payload whose LENGTH scales with the target area
    (no VP8 transcode in this container), so chained operations
    (resize → featurize) still verify dims from bytes. The Spark
    plumbing — one Arrow batch in, one out, bounded rows per batch,
    binary column through — is the real contract either way."""
    use_real = _have_pillow()

    def rz(batches: Iterator) -> Iterator:
        import pandas as pd

        import numpy as np

        from ..core.ebml import EBML_MAGIC, encode_webm_header
        from ..core.jpeg import (
            JPEG_SOI,
            decode_jpeg_gray,
            encode_jpeg_gray,
            encode_jpeg_header,
        )
        from ..core.png import PNG_SIGNATURE, decode_png, encode_png, resize_nearest
        from ..core.wav import RIFF_MAGIC, decode_wav, encode_wav
        from ..core.wav import resample_nearest as wav_resample

        for pdf in batches:
            rows = []
            # dispatch on the CONTENT signature, not a meta column: the
            # output of resize_media itself (RESIZED_SCHEMA) has no
            # meta, and chained resizes must keep working
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                raw = bytes(content)
                decoded = None
                if raw.startswith(PNG_SIGNATURE):
                    try:  # unsupported/corrupt PNG -> stub, never a crash
                        decoded = decode_png(raw)
                    except (ValueError, NotImplementedError):
                        decoded = None
                if decoded is not None:
                    w, h, rgb = decoded
                    resized = resize_nearest(rgb, w, h, width, height)
                    rows.append(
                        (ref, encode_png(resized, width, height), width, height)
                    )
                    continue
                if raw.startswith(RIFF_MAGIC):
                    # AUDIO resize = nearest resample to width*height
                    # FRAMES (the fixed-size-model-input analog of a
                    # spatial resize); output is a real WAV at the same
                    # rate, so chained featurize still parses it
                    try:
                        rate, channels, bits, frames = decode_wav(raw)
                        resampled = wav_resample(
                            frames, channels, bits, width * height
                        )
                        rows.append(
                            (
                                ref,
                                encode_wav(resampled, rate, channels, bits),
                                width,
                                height,
                            )
                        )
                        continue
                    except (ValueError, NotImplementedError):
                        pass
                if raw.startswith(JPEG_SOI):
                    # REAL grayscale transcode: decode → nearest → encode
                    try:
                        jw, jh, gray = decode_jpeg_gray(raw)
                        arr = np.frombuffer(gray, dtype=np.uint8).reshape(jh, jw)
                        ys = (np.arange(height) * jh) // height
                        xs = (np.arange(width) * jw) // width
                        resized_g = arr[ys][:, xs]
                        rows.append(
                            (
                                ref,
                                encode_jpeg_gray(
                                    resized_g.tobytes(), width, height
                                ),
                                width,
                                height,
                            )
                        )
                        continue
                    except (ValueError, NotImplementedError):
                        pass  # scan-less/color jpeg: header-real fallback
                if use_real:  # pragma: no cover - container has no PIL
                    raise NotImplementedError(
                        "real jpeg/video resize: PIL.Image.open(content)"
                        ".resize((w, h)) here"
                    )
                seed = zlib.crc32(raw)
                n = max(16, (width * height) // 512)
                payload = (seed.to_bytes(4, "big") * ((n + 3) // 4))[:n]
                # keep the output header-real at the TARGET dims so a
                # chained featurize still verifies dims from bytes
                if raw.startswith(JPEG_SOI):
                    payload = encode_jpeg_header(width, height, comment=payload)
                elif raw.startswith(EBML_MAGIC):
                    payload = encode_webm_header(width, height, payload=payload)
                rows.append((ref, payload, width, height))
            yield pd.DataFrame(
                rows, columns=["media_ref", "content", "width", "height"]
            )

    return media_df.mapInPandas(rz, schema=RESIZED_SCHEMA)


def sample_frames(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video media: one OUTPUT row per sampled frame
    (row-expanding mapInPandas — the batch shape a real ffmpeg-style
    extractor needs). Still images (PNG/JPEG) emit their single frame
    — the content itself. webm rows run the REAL Matroska demux
    (``core/ebml.py::webm_frames`` walks Cluster/SimpleBlock elements)
    and emit every ``every_n``-th block's codec payload keyed by its
    container timestamp; the synth's payloads at the key-frame cadence
    are REAL VP8 key frames that :func:`decode_frames` pixel-decodes
    (``core/vp8.py``). Malformed streams fall back to the meta-count
    fake path, never crash."""
    use_real = _have_pillow()

    def frames(batches: Iterator) -> Iterator:
        import pandas as pd

        from ..core.ebml import EBML_MAGIC, webm_frames
        from ..core.jpeg import JPEG_SOI
        from ..core.png import PNG_SIGNATURE
        from ..core.wav import RIFF_MAGIC, decode_wav, encode_wav

        for pdf in batches:
            rows = []
            for ref, content, meta in zip(
                pdf["media_ref"], pdf["content"], pdf["meta"]
            ):
                raw = bytes(content)
                if raw.startswith(PNG_SIGNATURE) or raw.startswith(JPEG_SOI):
                    # a still image IS its single frame — pass the real
                    # content through
                    rows.append((ref, 0, raw))
                    continue
                if raw.startswith(RIFF_MAGIC):
                    # AUDIO frame sampling = segmentation: one output
                    # row per every_n-frame CHUNK (clips partition the
                    # stream), each a self-describing real WAV so
                    # decode_frames can verify it from bytes alone
                    try:
                        rate, channels, bits, frames = decode_wav(raw)
                        block = channels * (bits // 8)
                        n = len(frames) // block if block else 0
                        for start in range(0, max(n, 1), every_n):
                            chunk = frames[
                                start * block : (start + every_n) * block
                            ]
                            rows.append(
                                (
                                    ref,
                                    start,
                                    encode_wav(chunk, rate, channels, bits),
                                )
                            )
                        continue
                    except (ValueError, NotImplementedError):
                        pass
                if raw.startswith(EBML_MAGIC):
                    try:
                        demuxed = webm_frames(raw)
                    except ValueError:
                        demuxed = None
                    if demuxed is not None:
                        for ts, payload in demuxed[::every_n]:
                            rows.append((ref, int(ts), bytes(payload)))
                        continue
                if use_real:  # pragma: no cover - no ffmpeg in container
                    raise NotImplementedError(
                        "real frame sampling: decode content, step by every_n"
                    )
                n_frames = int(meta["n_frames"]) or 1
                for idx in range(0, n_frames, every_n):
                    h = zlib.crc32(idx.to_bytes(4, "big"), zlib.crc32(raw))
                    rows.append((ref, idx, (h.to_bytes(4, "big") * 8)[:32]))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "content"])

    return media_df.mapInPandas(frames, schema=FRAME_SCHEMA)


def decode_frames(frames_df: DataFrame) -> DataFrame:
    """Pixel-decode sampled frame payloads (the step after
    :func:`sample_frames`): VP8 key frames through the full
    ``core/vp8.py`` decode (bool decoder → header → token/dequant →
    IWHT/IDCT → intra prediction → reconstruction), PNG stills through
    ``core/png.py``, JPEG stills through ``core/jpeg.py``. ``pix_sum``
    is the decoded-pixel checksum (luma for VP8/JPEG, RGB for PNG) a
    SQL oracle recomputes from the synth arithmetic. Payloads outside
    the decodable subset — VP8 inter frames, truncated or corrupt
    streams — yield a null-dims row with ``is_key = 0`` (the poison-row
    contract: quarantine, never die)."""

    def dec(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from ..core.jpeg import JPEG_SOI, decode_jpeg_gray
        from ..core.png import PNG_SIGNATURE, decode_png
        from ..core.vp8 import VP8_KEY_START, decode_vp8_key_frame
        from ..core.wav import RIFF_MAGIC, decode_wav

        for pdf in batches:
            rows = []
            for ref, idx, content in zip(
                pdf["media_ref"], pdf["frame_idx"], pdf["content"]
            ):
                raw, idx = bytes(content), int(idx)
                try:
                    if raw.startswith(PNG_SIGNATURE):
                        w, h, rgb = decode_png(raw)
                        s = int(np.frombuffer(rgb, np.uint8).sum())
                    elif raw.startswith(JPEG_SOI):
                        w, h, gray = decode_jpeg_gray(raw)
                        s = int(np.frombuffer(gray, np.uint8).sum())
                    elif raw.startswith(RIFF_MAGIC):
                        # audio clip: width = sample rate, height =
                        # frames in the clip, pix_sum = unsigned-sample
                        # checksum (the q29 oracle's wav arithmetic)
                        rate, channels, bits, frames = decode_wav(raw)
                        block = channels * (bits // 8)
                        w, h = rate, len(frames) // block if block else 0
                        dt = "<u2" if bits == 16 else np.uint8
                        s = int(np.frombuffer(frames, dtype=dt).sum())
                    elif len(raw) >= 10 and raw[3:6] == VP8_KEY_START:
                        w, h, luma = decode_vp8_key_frame(raw)
                        s = int(np.frombuffer(luma, np.uint8).sum())
                    else:
                        raise ValueError("undecodable frame payload")
                    rows.append((ref, idx, w, h, s, 1))
                except (ValueError, NotImplementedError):
                    rows.append((ref, idx, None, None, None, 0))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "frame_idx", "width", "height",
                    "pix_sum", "is_key",
                ],
            )

    return frames_df.mapInPandas(dec, schema=FRAME_PIXELS_SCHEMA)
