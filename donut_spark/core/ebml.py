"""Minimal EBML / Matroska-WebM header layer (RFC 8794 + the public
Matroska element registry) — HEADER ONLY, by design.

Same contract as :mod:`donut_spark.core.jpeg`: the container has no VP8/
VP9 decoder, so webm's stub surface is pixels/frames; what the media
pipeline needs from a webm payload is *verifiable dimensions*. This
module walks the EBML element tree (variable-length ids and sizes) to
the ``Segment → Tracks → TrackEntry → Video`` master elements and
returns ``PixelWidth``/``PixelHeight``, and emits a well-formed
scan-less header stream (EBML header with DocType ``webm`` + Segment
holding one video TrackEntry and a Void element carrying the seeded
payload) for the deterministic synth. Malformed/truncated streams raise
ValueError — the multimodal poison-row contract.
"""

from __future__ import annotations

__all__ = ["EBML_MAGIC", "webm_dims", "webm_frames", "encode_webm_header"]

EBML_MAGIC = b"\x1a\x45\xdf\xa3"

# element ids (with their marker bits, as registered)
_SEGMENT = 0x18538067
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
# master elements the parser recurses into on the way to Video
_RECURSE = {_SEGMENT, _TRACKS, _TRACK_ENTRY, _VIDEO}


def _read_id(b: bytes, i: int) -> tuple[int, int]:
    """EBML element id: length from the leading-zero count of the first
    byte (1-4 bytes), value kept WITH the marker bit (registry form)."""
    if i >= len(b):
        raise ValueError("truncated EBML id")
    first = b[i]
    if first == 0:
        raise ValueError("invalid EBML id (first byte 0)")
    length = 1
    mask = 0x80
    while not first & mask:
        mask >>= 1
        length += 1
        if length > 4:
            raise ValueError("invalid EBML id length")
    if i + length > len(b):
        raise ValueError("truncated EBML id")
    return int.from_bytes(b[i : i + length], "big"), length


def _read_size(b: bytes, i: int) -> tuple[int, int]:
    """EBML data size: vint with the marker bit STRIPPED (1-8 bytes).
    The all-ones 'unknown size' form is rejected (a header emitter
    always knows its sizes)."""
    if i >= len(b):
        raise ValueError("truncated EBML size")
    first = b[i]
    if first == 0:
        raise ValueError("invalid EBML size (first byte 0)")
    length = 1
    mask = 0x80
    while not first & mask:
        mask >>= 1
        length += 1
        if length > 8:
            raise ValueError("invalid EBML size length")
    if i + length > len(b):
        raise ValueError("truncated EBML size")
    raw = int.from_bytes(b[i : i + length], "big")
    value = raw - (1 << (7 * length))  # strip the marker bit
    if value == (1 << (7 * length)) - 1:
        raise ValueError("unknown-size EBML element unsupported")
    return value, length


def _find_video_dims(b: bytes, start: int, end: int) -> tuple[int | None, int | None]:
    """Depth-first walk over [start, end): recurse into the master
    elements on the Video path, read PixelWidth/PixelHeight uints."""
    width = height = None
    i = start
    while i < end:
        eid, n = _read_id(b, i)
        i += n
        size, n = _read_size(b, i)
        i += n
        if i + size > end:
            raise ValueError("EBML element overruns its parent")
        if eid in (_PIXEL_W, _PIXEL_H):
            if size == 0 or size > 8:
                raise ValueError("malformed EBML pixel dimension")
            val = int.from_bytes(b[i : i + size], "big")
            if eid == _PIXEL_W:
                width = val
            else:
                height = val
        elif eid in _RECURSE:
            w, h = _find_video_dims(b, i, i + size)
            width = w if w is not None else width
            height = h if h is not None else height
        i += size
        if width is not None and height is not None:
            return width, height
    return width, height


def webm_dims(data: bytes) -> tuple[int, int]:
    """(PixelWidth, PixelHeight) of the first video TrackEntry. Raises
    ValueError on anything malformed (bad magic, truncated vints,
    overrunning elements, zero dims, or no video track)."""
    b = bytes(data)
    if b[: len(EBML_MAGIC)] != EBML_MAGIC:
        raise ValueError("not an EBML/webm stream (bad magic)")
    width, height = _find_video_dims(b, 0, len(b))
    if width is None or height is None:
        raise ValueError("EBML stream has no video PixelWidth/PixelHeight")
    if width == 0 or height == 0:
        raise ValueError("zero webm dimensions")
    return width, height


def webm_frames(data: bytes) -> list:
    """Codec frame payloads of every SimpleBlock, in container order:
    ``[(timestamp, payload_bytes), ...]`` with timestamp = cluster
    Timestamp + the block's signed 16-bit relative timestamp. This is
    the REAL Matroska demux step of frame sampling — only the codec
    payload itself (VP8/VP9 bitstream in a true webm) stays opaque.
    Raises ValueError on malformed streams."""
    b = bytes(data)
    if b[: len(EBML_MAGIC)] != EBML_MAGIC:
        raise ValueError("not an EBML/webm stream (bad magic)")
    frames: list = []

    def walk(start: int, end: int, cluster_ts: int) -> None:
        i = start
        ts = cluster_ts
        while i < end:
            eid, n = _read_id(b, i)
            i += n
            size, n = _read_size(b, i)
            i += n
            if i + size > end:
                raise ValueError("EBML element overruns its parent")
            if eid == _TIMESTAMP:
                ts = int.from_bytes(b[i : i + size], "big")
            elif eid == _SIMPLE_BLOCK:
                # vint track number, int16 relative timestamp, flags
                _, tn = _read_size(b, i)  # track number is a plain vint
                if size < tn + 3:
                    raise ValueError("malformed SimpleBlock header")
                flags = b[i + tn + 2]
                if flags & 0x06:
                    # EBML/Xiph/fixed lacing packs several laced frames
                    # into one block; mis-reporting them as one payload
                    # would be a silent wrong answer — take the
                    # poison-row fallback instead (round-4 advice)
                    raise ValueError("laced SimpleBlock unsupported")
                rel = int.from_bytes(b[i + tn : i + tn + 2], "big", signed=True)
                frames.append((ts + rel, b[i + tn + 3 : i + size]))
            elif eid in (_SEGMENT, _CLUSTER):
                walk(i, i + size, ts)
            i += size

    walk(0, len(b), 0)
    return frames


def _vsize(n: int) -> bytes:
    """Encode a data size as the shortest EBML vint."""
    if n < 0:
        raise ValueError("negative EBML size")
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:  # avoid the all-ones reserved form
            return (n + (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _elem(eid: bytes, content: bytes) -> bytes:
    return eid + _vsize(len(content)) + content


def _uint(v: int) -> bytes:
    return v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")


def encode_webm_header(
    width: int,
    height: int,
    payload: bytes = b"",
    frames: "list[bytes] | None" = None,
) -> bytes:
    """EBML header (DocType webm) + Segment(Tracks(TrackEntry(video,
    PixelWidth, PixelHeight)) + Void(payload) [+ Clusters]).

    With ``frames``, each payload becomes a SimpleBlock (track 1,
    keyframe flag) inside Clusters of up to 25 blocks with absolute
    cluster Timestamps — a structurally real Matroska stream that
    :func:`webm_frames` (or any demuxer) walks; the codec payloads are
    whatever the caller supplies (the synth's deterministic stubs here,
    VP8 bitstreams in a real file). ``payload`` rides in the Void
    element so two refs never produce identical bytes."""
    if width <= 0 or height <= 0:
        raise ValueError(f"webm dims {width}x{height} out of range")
    ebml = _elem(EBML_MAGIC, _elem(b"\x42\x82", b"webm"))
    video = _elem(b"\xe0", _elem(b"\xb0", _uint(width)) + _elem(b"\xba", _uint(height)))
    track = _elem(b"\xae", _elem(b"\x83", b"\x01") + video)  # TrackType 1 = video
    tracks = _elem(b"\x16\x54\xae\x6b", track)
    void = _elem(b"\xec", payload)
    clusters = b""
    for c0 in range(0, len(frames or []), 25):
        body = _elem(b"\xe7", _uint(c0))  # cluster Timestamp = frame idx
        for rel, fr in enumerate(frames[c0 : c0 + 25]):
            # SimpleBlock: track vint 0x81 (=1), int16 rel ts, flags 0x80
            body += _elem(
                b"\xa3",
                b"\x81" + rel.to_bytes(2, "big") + b"\x80" + fr,
            )
        clusters += _elem(b"\x1f\x43\xb6\x75", body)
    return ebml + _elem(b"\x18\x53\x80\x67", tracks + void + clusters)
