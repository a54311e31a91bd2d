"""Minimal JPEG (ITU-T T.81 / JFIF, public spec) marker-segment layer —
HEADER ONLY, by design.

The container has no JPEG entropy decoder (no PIL/libjpeg), and a pure-
Python baseline IDCT would be slow theater; what the pipeline actually
needs from JPEG rows is *verifiable dimensions*: the reference opens
JPEGs for their image payload (reference `donut/util.py:113`), and our
media path carries dims in the metadata struct. Parsing the SOF frame
header lets the featurizer verify claimed metadata against real bytes,
shrinking the jpeg stub surface to pixels-only.

* :func:`jpeg_dims` walks the marker stream (fill bytes, standalone
  markers, length-prefixed segments) and returns the (width, height) of
  the first SOF0-SOF15 frame header. Malformed/truncated streams raise
  ValueError — the multimodal operators' poison-row contract.
* :func:`encode_jpeg_header` emits a well-formed SOI/APP0/COM/SOF0/EOI
  stream (no scan data) — the deterministic synth's jpeg payload, real
  enough that any header parser extracts the same dims.
"""

from __future__ import annotations

__all__ = ["JPEG_SOI", "jpeg_dims", "encode_jpeg_header"]

JPEG_SOI = b"\xff\xd8"

# standalone markers carry no length field: TEM (0x01) and RST0-7
_STANDALONE = frozenset([0x01]) | frozenset(range(0xD0, 0xD8))
# SOF family is 0xC0-0xCF minus DHT (0xC4), JPG (0xC8), DAC (0xCC)
_NOT_SOF = frozenset([0xC4, 0xC8, 0xCC])


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF frame header. Raises
    ValueError on anything malformed (bad SOI, marker desync, truncated
    segment, zero dims, or no SOF before EOI/SOS) so callers guard the
    whole parse with one exception class."""
    b = bytes(data)
    if b[:2] != JPEG_SOI:
        raise ValueError("not a JPEG (bad SOI marker)")
    i = 2
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"JPEG marker desync at offset {i}")
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            i += 1
            continue
        if marker in _STANDALONE:
            i += 2
            continue
        if marker == 0xD9:  # EOI with no SOF seen
            break
        if i + 4 > len(b):
            raise ValueError("truncated JPEG segment header")
        length = int.from_bytes(b[i + 2 : i + 4], "big")
        if length < 2 or i + 2 + length > len(b):
            raise ValueError("truncated JPEG segment payload")
        if 0xC0 <= marker <= 0xCF and marker not in _NOT_SOF:
            if length < 7:
                raise ValueError("malformed JPEG SOF segment")
            height = int.from_bytes(b[i + 5 : i + 7], "big")
            width = int.from_bytes(b[i + 7 : i + 9], "big")
            if width == 0 or height == 0:
                raise ValueError("zero JPEG dimensions in SOF")
            return width, height
        if marker == 0xDA:  # SOS: entropy data follows, SOF had to precede
            break
        i += 2 + length
    raise ValueError("JPEG missing SOF dimensions")


def _segment(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg_header(width: int, height: int, comment: bytes = b"") -> bytes:
    """SOI + APP0(JFIF) [+ COM] + SOF0(3-component) + EOI — a
    header-complete, scan-less JPEG carrying the given dims. The synth's
    seeded payload rides in the COM segment so two refs never produce
    identical bytes."""
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"JPEG dims {width}x{height} out of range")
    if len(comment) > 0xFFFF - 2:
        raise ValueError("JPEG COM payload exceeds the 2-byte segment length")
    app0 = b"JFIF\x00" + bytes([1, 2, 0]) + (1).to_bytes(2, "big") * 2 + b"\x00\x00"
    sof0 = (
        bytes([8])  # precision
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])  # 3 components
    )
    out = JPEG_SOI + _segment(0xE0, app0)
    if comment:
        out += _segment(0xFE, comment)
    return out + _segment(0xC0, sof0) + b"\xff\xd9"
