"""Multimodal column plumbing: opaque binary media + typed metadata.

The reference carries images as files on disk next to metadata.jsonl
(`donut/util.py:113`, S3/S8 in SURVEY.md §2.1); at 100 TB the Spark
shape is a media table ``(media_ref string, content binary,
meta struct<format,width,height,n_frames>)`` joined to span tables on
``media_ref``. The Spark-side plumbing here — schemas, partitioning,
``mapInPandas`` batch shape, join strategy — is real and tested; the
actual codec work (PIL/ffmpeg-style decode) is NOT available in this
container and is stubbed behind ``try: import`` with a deterministic
fake, clearly marked.
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
    "RESIZED_SCHEMA",
    "FRAME_SCHEMA",
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
    ]
)


def _have_pillow() -> bool:
    try:  # pragma: no cover - not installed in this container
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def synth_media_table(spark: SparkSession, spans_df: DataFrame) -> DataFrame:
    """Deterministic media table for every media_ref in a spans table.

    Content bytes are a seeded pseudo-payload (crc-chained), metadata is
    derived from the ref hash — stable across runs and cluster sizes.
    """
    refs = (
        spans_df.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                seed = zlib.crc32(ref.encode())
                payload = (seed.to_bytes(4, "big") * 16)[:64]
                rows.append(
                    (
                        ref,
                        payload,
                        {
                            "format": ["jpeg", "png", "webm"][seed % 3],
                            "width": 64 + seed % 512,
                            "height": 64 + (seed >> 8) % 512,
                            "n_frames": 1 if seed % 3 < 2 else 1 + seed % 120,
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=["media_ref", "content", "meta"])

    return refs.mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_and_featurize(media_df: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode media and emit fixed-size features, batch-wise.

    Real codec path requires PIL/ffmpeg (absent here); the deterministic
    fake derives width/height from metadata and features from a crc hash
    chain over the bytes — the Spark plumbing (Arrow batch iteration,
    schema, memory-bounded batches) is exactly what the real decoder
    plugs into.
    """
    use_real = _have_pillow()

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if use_real:  # pragma: no cover - container has no PIL
                raise NotImplementedError(
                    "real image decode: plug PIL.Image.open over content bytes here"
                )
            rows = []
            for ref, content, meta in zip(
                pdf["media_ref"], pdf["content"], pdf["meta"]
            ):
                h = zlib.crc32(bytes(content))
                feats = []
                for i in range(feat_dim):
                    h = zlib.crc32(i.to_bytes(2, "big"), h)
                    feats.append((h % 10_000) / 10_000.0)
                rows.append((ref, meta["width"], meta["height"], feats))
            yield pd.DataFrame(
                rows, columns=["media_ref", "width", "height", "features"]
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


def resize_media(
    media_df: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Batch resize to a fixed target (the training-pipeline normalize
    step). Real path is PIL ``Image.resize`` over ``content`` (absent in
    this container); the deterministic fake emits a seed-derived payload
    whose LENGTH scales with the target area, so batch-shape and memory
    behavior track a real resize. The Spark plumbing — one Arrow batch
    in, one out, bounded rows per batch, binary column through — is the
    real contract."""
    use_real = _have_pillow()

    def rz(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if use_real:  # pragma: no cover - container has no PIL
                raise NotImplementedError(
                    "real resize: PIL.Image.open(content).resize((w, h)) here"
                )
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                seed = zlib.crc32(bytes(content))
                n = max(16, (width * height) // 512)
                payload = (seed.to_bytes(4, "big") * ((n + 3) // 4))[:n]
                rows.append((ref, payload, width, height))
            yield pd.DataFrame(
                rows, columns=["media_ref", "content", "width", "height"]
            )

    return media_df.mapInPandas(rz, schema=RESIZED_SCHEMA)


def sample_frames(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video media: one OUTPUT row per sampled frame
    (row-expanding mapInPandas — the batch shape a real ffmpeg-style
    extractor needs). Images (n_frames == 1) emit their single frame;
    videos emit frames 0, every_n, 2·every_n, … Deterministic fake
    frame payloads (crc-chained on ref + frame index); real path plugs
    a decoder into the same iterator."""
    use_real = _have_pillow()

    def frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if use_real:  # pragma: no cover - container has no PIL/ffmpeg
                raise NotImplementedError(
                    "real frame sampling: decode content, step by every_n"
                )
            rows = []
            for ref, content, meta in zip(
                pdf["media_ref"], pdf["content"], pdf["meta"]
            ):
                n_frames = int(meta["n_frames"]) or 1
                for idx in range(0, n_frames, every_n):
                    h = zlib.crc32(idx.to_bytes(4, "big"), zlib.crc32(bytes(content)))
                    rows.append((ref, idx, (h.to_bytes(4, "big") * 8)[:32]))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "content"])

    return media_df.mapInPandas(frames, schema=FRAME_SCHEMA)
