"""JPEG (ITU-T T.81 / JFIF, public spec) layer: marker parsing, header
emission, and a REAL baseline codec for the grayscale subset.

* :func:`jpeg_dims` walks the marker stream (fill bytes, standalone
  markers, length-prefixed segments) and returns the (width, height) of
  the first SOF0-SOF15 frame header. Malformed/truncated streams raise
  ValueError — the multimodal operators' poison-row contract.
* :func:`encode_jpeg_header` emits a well-formed SOI/APP0/COM/SOF0/EOI
  stream (no scan data) — used where only verifiable dims are needed
  (e.g. resize outputs).
* :func:`encode_jpeg_gray` / :func:`decode_jpeg_gray` are a COMPLETE
  baseline sequential codec for single-component (grayscale) images:
  forward/inverse 8×8 DCT (float64), quantization, zigzag, DC
  prediction, canonical Huffman entropy coding with the tables emitted
  in DHT segments, 0xFF byte stuffing, MCU padding + crop. The
  deterministic media synth writes images whose 8×8 blocks are FLAT —
  for flat blocks with unit quantization the AC coefficients quantize
  to exactly zero and the DC path is integer-exact, so encode→decode is
  bit-exact and the SQL oracle can recompute decoded pixels from first
  principles (the PNG discipline, applied to JPEG). Arbitrary content
  also round-trips (within the ±1 float/rounding tolerance inherent to
  the DCT); 3-component color (the YCbCr transform) raises
  NotImplementedError and takes the stub path.
"""

from __future__ import annotations

__all__ = [
    "JPEG_SOI",
    "jpeg_dims",
    "encode_jpeg_header",
    "encode_jpeg_gray",
    "decode_jpeg_gray",
]

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


# ---------------------------------------------------------------------------
# Baseline sequential grayscale codec (T.81 §A/F; single component, no
# subsampling, 8-bit precision). numpy float64 DCT; canonical Huffman
# tables built per image and shipped in DHT, so encoder and decoder
# share no hidden state beyond the spec.
# ---------------------------------------------------------------------------


def _zigzag_order():
    """The 64 (row, col) positions in JPEG zigzag order (T.81 fig. 5):
    anti-diagonals; even diagonals run bottom-left to top-right."""
    pos = [(r, c) for r in range(8) for c in range(8)]
    return sorted(pos, key=lambda p: (p[0] + p[1],
                                      p[0] if (p[0] + p[1]) % 2 else -p[0]))


_ZIGZAG = _zigzag_order()


def _dct_matrix():
    import math

    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / 2 ** 0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return a


def _magnitude_category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 §F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, length: int) -> int:
        while self.nbits < length:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker inside entropy stream")
                self.pos += 1  # skip the stuffed 0x00
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        self.nbits -= length
        v = (self.acc >> self.nbits) & ((1 << length) - 1)
        return v


def _canonical_codes(symbols):
    """Assign canonical Huffman codes: all symbols at one fixed length L
    (smallest L with 2^L > len(symbols), so the all-ones code stays
    unused as T.81 §C requires). Returns (bits16, ordered_symbols,
    code_map symbol -> (code, L))."""
    n = len(symbols)
    length = max(1, (n + 1 - 1).bit_length())
    while (1 << length) <= n:  # need strictly more codes than symbols
        length += 1
    ordered = sorted(symbols)
    bits = [0] * 16
    if length > 16:
        raise ValueError("too many Huffman symbols for a JPEG table")
    bits[length - 1] = n
    codes = {sym: (i, length) for i, sym in enumerate(ordered)}
    return bits, ordered, codes


def _extend(v: int, size: int) -> int:
    return v - ((1 << size) - 1) if v < (1 << (size - 1)) else v


def encode_jpeg_gray(
    pixels: bytes, width: int, height: int, comment: bytes = b""
) -> bytes:
    """Grayscale 8-bit row-major ``pixels`` → complete baseline JPEG
    (unit quantization table: lossless for flat 8×8 blocks, ±1 for
    arbitrary content)."""
    import numpy as np

    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"JPEG dims {width}x{height} out of range")
    if len(pixels) != width * height:
        raise ValueError(f"pixel length {len(pixels)} != {width}x{height}")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:height, :width] = img
    padded[height:, :width] = img[height - 1 : height, :]  # edge replicate
    padded[:, width:] = padded[:, width - 1 : width]

    a = _dct_matrix()
    # DCT + quantize (q=1) every block; collect entropy symbols first so
    # the Huffman tables cover exactly the symbols used
    blocks = []
    prev_dc = 0
    dc_syms, ac_syms = set(), {0x00}
    for by in range(bh):
        for bx in range(bw):
            f = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.rint(a @ f @ a.T).astype(np.int64)
            zz = [int(coef[r, c]) for r, c in _ZIGZAG]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            dc_syms.add(_magnitude_category(diff))
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms.add(0xF0)
                    run -= 16
                ac_syms.add((run << 4) | _magnitude_category(v))
                run = 0
            blocks.append((diff, zz[1:]))

    dc_bits, dc_vals, dc_codes = _canonical_codes(dc_syms)
    ac_bits, ac_vals, ac_codes = _canonical_codes(ac_syms)

    w = _BitWriter()
    for diff, acs in blocks:
        cat = _magnitude_category(diff)
        code, length = dc_codes[cat]
        w.write(code, length)
        if cat:
            w.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
        run = 0
        last_nz = max((i for i, v in enumerate(acs) if v), default=-1)
        for i, v in enumerate(acs):
            if i > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]
                w.write(code, length)
                run -= 16
            size = _magnitude_category(v)
            code, length = ac_codes[(run << 4) | size]
            w.write(code, length)
            w.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if last_nz < 63 - 1 or last_nz == -1:
            code, length = ac_codes[0x00]  # EOB
            w.write(code, length)
    scan = w.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    app0 = b"JFIF\x00" + bytes([1, 2, 0]) + (1).to_bytes(2, "big") * 2 + b"\x00\x00"
    dqt = seg(0xDB, bytes([0]) + bytes([1] * 64))  # table 0, all-ones
    sof = seg(
        0xC0,
        bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out = JPEG_SOI + seg(0xE0, app0)
    if comment:
        out += seg(0xFE, comment)
    out += dqt + sof + dht(0, 0, dc_bits, dc_vals) + dht(1, 0, ac_bits, ac_vals)
    return out + sos + scan + b"\xff\xd9"


def _parse_dht(payload: bytes, tables: dict) -> None:
    i = 0
    while i < len(payload):
        if i + 17 > len(payload):
            raise ValueError("malformed DHT segment")
        tc_th = payload[i]
        bits = payload[i + 1 : i + 17]
        n = sum(bits)
        vals = payload[i + 17 : i + 17 + n]
        if len(vals) != n:
            raise ValueError("malformed DHT segment")
        # canonical code reconstruction (T.81 §C.2)
        lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        tables[tc_th] = lut
        i += 17 + n


def _huff_decode(reader: _BitReader, lut: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        if (length, code) in lut:
            return lut[(length, code)]
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """Complete baseline JPEG bytes → (width, height, grayscale bytes).
    Single-component (grayscale) only — color raises NotImplementedError
    (no YCbCr path in this container); malformed streams raise
    ValueError (the poison-row contract)."""
    import numpy as np

    b = bytes(data)
    if b[:2] != JPEG_SOI:
        raise ValueError("not a JPEG (bad SOI marker)")
    i = 2
    qtables: dict = {}
    htables: dict = {}
    width = height = None
    scan_start = None
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"JPEG marker desync at offset {i}")
        marker = b[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in _STANDALONE:
            i += 2
            continue
        if marker == 0xD9:
            break
        if i + 4 > len(b):
            raise ValueError("truncated JPEG segment header")
        length = int.from_bytes(b[i + 2 : i + 4], "big")
        if length < 2 or i + 2 + length > len(b):
            raise ValueError("truncated JPEG segment payload")
        payload = b[i + 4 : i + 2 + length]
        if marker == 0xDB:
            j = 0
            while j < len(payload):
                pq_tq = payload[j]
                if pq_tq >> 4:
                    raise NotImplementedError("16-bit quantization tables")
                if j + 65 > len(payload):
                    raise ValueError("malformed DQT segment")
                qtables[pq_tq & 0xF] = list(payload[j + 1 : j + 65])
                j += 65
        elif marker == 0xC4:
            _parse_dht(payload, htables)
        elif 0xC0 <= marker <= 0xCF and marker not in _NOT_SOF:
            if marker != 0xC0:
                raise NotImplementedError("only baseline sequential JPEG")
            if len(payload) < 8:
                raise ValueError("malformed SOF segment")
            height = int.from_bytes(payload[1:3], "big")
            width = int.from_bytes(payload[3:5], "big")
            if payload[5] != 1:
                raise NotImplementedError(
                    "only single-component (grayscale) JPEG decode"
                )
            if width == 0 or height == 0:
                raise ValueError("zero JPEG dimensions in SOF")
            sof_q = payload[8]
        elif marker == 0xDA:
            if len(payload) < 6:
                raise ValueError("malformed SOS segment")
            sos_tables = payload[2]
            scan_start = i + 2 + length
            break
        i += 2 + length
    if width is None or scan_start is None:
        raise ValueError("JPEG missing SOF or SOS")
    # locate EOI (scan may contain stuffed 0xFF00 which is not a marker)
    scan_end = len(b)
    j = scan_start
    while j + 1 < len(b):
        if b[j] == 0xFF and b[j + 1] not in (0x00,):
            scan_end = j
            break
        j += 1 if b[j] != 0xFF else 2
    dc_lut = htables.get(sos_tables >> 4)
    ac_lut = htables.get(0x10 | (sos_tables & 0xF))
    quant = qtables.get(sof_q)
    if dc_lut is None or ac_lut is None or quant is None:
        raise ValueError("JPEG scan references missing Huffman/quant table")

    reader = _BitReader(b[scan_start:scan_end])
    a = _dct_matrix()
    bw, bh = (width + 7) // 8, (height + 7) // 8
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = [0] * 64
            cat = _huff_decode(reader, dc_lut)
            diff = _extend(reader.read(cat), cat) if cat else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _huff_decode(reader, ac_lut)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63 or size == 0:
                    raise ValueError("corrupt JPEG AC coefficient run")
                zz[k] = _extend(reader.read(size), size)
                k += 1
            coef = np.zeros((8, 8))
            for idx, (r, c) in enumerate(_ZIGZAG):
                coef[r, c] = zz[idx] * quant[idx]
            f = a.T @ coef @ a + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = f
    cropped = np.clip(np.rint(out[:height, :width]), 0, 255).astype(np.uint8)
    return width, height, cropped.tobytes()
