"""From-scratch RIFF/WAVE PCM codec (the audio modality's core layer).

The builder brief treats image/AUDIO/video as first-class multimodal
columns; this is the audio twin of ``core/png.py``/``core/jpeg.py``:
a real decoder for the subset the synth writer emits, built from the
public RIFF/WAVE layout (the 1991 IBM/Microsoft "Multimedia Programming
Interface and Data Specifications" chunk format), with the same
poison-row contract — anything outside the subset raises ``ValueError``
and the operator layer routes the row to quarantine.

Scope:

* RIFF container walk: word-aligned chunks with pad bytes, unknown
  chunks skipped (real writers emit LIST/INFO, fact, cue …), ``fmt ``
  required before ``data``;
* integer PCM only (wFormatTag = 1), 8-bit unsigned / 16-bit signed
  little-endian, 1..8 channels; IEEE-float (3), ADPCM, extensible
  (0xFFFE) and anything else is poison;
* decompression-bomb guard (declared sizes are checked against the
  actual byte count and an absolute cap before any allocation);
* nearest-neighbor resampling — the audio analog of the image layer's
  ``resize_nearest`` (fixed-size model inputs).
"""

from __future__ import annotations

import struct
from typing import Tuple

__all__ = [
    "RIFF_MAGIC",
    "MAX_WAV_BYTES",
    "encode_wav",
    "wav_info",
    "decode_wav",
    "resample_nearest",
]

RIFF_MAGIC = b"RIFF"
MAX_WAV_BYTES = 1 << 26  # 64 MiB of PCM per row is already absurd


def encode_wav(
    frames: bytes,
    sample_rate: int,
    channels: int = 1,
    bits: int = 16,
    info: bytes | None = None,
) -> bytes:
    """Interleaved little-endian PCM ``frames`` → a real WAV file.

    ``info`` (optional) is wrapped in a LIST/INFO ICMT chunk placed
    BEFORE ``data`` — real writers emit metadata chunks there, so the
    decoder's chunk walk is exercised by every synth row that passes
    one. Odd-length chunks get the spec's pad byte.
    """
    if bits not in (8, 16):
        raise ValueError("wav: only 8/16-bit PCM encode supported")
    if not 1 <= channels <= 8:
        raise ValueError("wav: channels out of range")
    if not 1 <= sample_rate <= 1_000_000:
        raise ValueError("wav: sample rate out of range")
    block_align = channels * (bits // 8)
    if len(frames) % block_align:
        raise ValueError("wav: frames not a whole number of blocks")
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if info is not None:
        icmt = b"ICMT" + struct.pack("<I", len(info)) + info
        if len(info) % 2:
            icmt += b"\x00"  # word-alignment pad byte
        body = b"INFO" + icmt
        chunks.append(b"LIST" + struct.pack("<I", len(body)) + body)
    data = b"data" + struct.pack("<I", len(frames)) + frames
    if len(frames) % 2:
        data += b"\x00"
    chunks.append(data)
    payload = b"WAVE" + b"".join(chunks)
    return RIFF_MAGIC + struct.pack("<I", len(payload)) + payload


def _walk(data: bytes) -> Tuple[bytes, bytes]:
    """RIFF walk → (fmt chunk bytes, data chunk bytes)."""
    if len(data) < 12 or data[:4] != RIFF_MAGIC or data[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE stream")
    declared = struct.unpack("<I", data[4:8])[0]
    if declared + 8 > len(data) or declared > MAX_WAV_BYTES:
        raise ValueError("wav: RIFF size overruns the buffer")
    i, end = 12, 8 + declared
    fmt = raw = None
    while i + 8 <= end:
        cid = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        if size > MAX_WAV_BYTES or i + 8 + size > end:
            raise ValueError("wav: chunk overruns the RIFF payload")
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            if fmt is None:
                raise ValueError("wav: data chunk before fmt")
            if raw is not None:
                # a duplicate data chunk would silently overwrite the
                # first (e.g. an empty trailer decoding as silence) —
                # poison-row contract: malformed files raise
                raise ValueError("wav: duplicate data chunk")
            raw = body
        # unknown chunks (LIST, fact, cue …) are skipped
        i += 8 + size + (size & 1)  # pad byte on odd sizes
    if fmt is None or raw is None:
        raise ValueError("wav: missing fmt or data chunk")
    return fmt, raw


def _parse_fmt(fmt: bytes) -> Tuple[int, int, int]:
    if len(fmt) < 16:
        raise ValueError("wav: fmt chunk too short")
    tag, channels, rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if tag != 1:
        raise ValueError(f"wav: non-PCM format tag {tag} unsupported")
    if bits not in (8, 16):
        raise ValueError(f"wav: {bits}-bit PCM unsupported")
    if not 1 <= channels <= 8:
        raise ValueError("wav: channel count out of range")
    if not 1 <= rate <= 1_000_000:
        raise ValueError("wav: sample rate out of range")
    if block_align != channels * (bits // 8):
        raise ValueError("wav: block alignment inconsistent with fmt")
    return rate, channels, bits


def wav_info(data: bytes) -> Tuple[int, int, int, int]:
    """(sample_rate, channels, bits, n_frames) from the headers."""
    fmt, raw = _walk(data)
    rate, channels, bits = _parse_fmt(fmt)
    block = channels * (bits // 8)
    if len(raw) % block:
        raise ValueError("wav: data chunk is not whole frames")
    return rate, channels, bits, len(raw) // block


def decode_wav(data: bytes) -> Tuple[int, int, int, bytes]:
    """(sample_rate, channels, bits, interleaved PCM frame bytes)."""
    fmt, raw = _walk(data)
    rate, channels, bits = _parse_fmt(fmt)
    block = channels * (bits // 8)
    if len(raw) % block:
        raise ValueError("wav: data chunk is not whole frames")
    return rate, channels, bits, raw


def resample_nearest(
    frames: bytes, channels: int, bits: int, n_target: int
) -> bytes:
    """Nearest-neighbor resample to exactly ``n_target`` frames — the
    audio analog of the image layer's ``resize_nearest`` (fixed-size
    model inputs). Duration semantics are the caller's business; frame
    i of the output copies input frame ``i * n_in // n_target``."""
    import numpy as np

    block = channels * (bits // 8)
    if len(frames) % block:
        raise ValueError("wav: frames not a whole number of blocks")
    n_in = len(frames) // block
    if n_target < 0:
        raise ValueError("wav: negative target length")
    if n_in == 0:
        if n_target:
            raise ValueError("wav: cannot resample empty input upward")
        return b""
    arr = np.frombuffer(frames, dtype=np.uint8).reshape(n_in, block)
    idx = (np.arange(n_target, dtype=np.int64) * n_in) // max(n_target, 1)
    return arr[idx].tobytes()
