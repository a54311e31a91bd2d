"""VP8 key-frame codec tests (core/vp8.py) — the round-5 closure of the
last media stub. Discipline mirrors test_jpeg/test_png: exact roundtrip
properties, spec-edge decodes pinned by hand, adversarial garbage under
the poison-row contract, and the Spark decode_frames operator over real
demuxed SimpleBlocks.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from donut_spark.core.vp8 import (
    _CAT_EXTRA,
    _DEFAULT_COEFF_PROBS,
    _KF_UV_MODE_PROB,
    _KF_YMODE_PATHS,
    _KF_YMODE_PROB,
    _UV_MODE_PATHS,
    _UV_MODE_TREE,
    _KF_YMODE_TREE,
    _PLANE_UV,
    _PLANE_Y2,
    _PLANE_Y_NO_DC,
    _BoolDec,
    _BoolEnc,
    _COEFF_UPDATE_PROBS,
    _encode_block,
    _idct4x4,
    B_PRED,
    DC_PRED,
    H_PRED,
    TM_PRED,
    V_PRED,
    VP8_KEY_START,
    decode_vp8_key_frame,
    encode_vp8_key_frame,
    vp8_frame_is_key,
)


def _expand(grid, w, h):
    g = np.asarray(grid, dtype=np.uint8)
    return g[np.arange(h) // 16][:, np.arange(w) // 16]


# ---------------------------------------------------------------------------
# boolean coder
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 254), st.integers(0, 1)), max_size=600))
def test_bool_coder_roundtrip(seq):
    enc = _BoolEnc()
    for p, b in seq:
        enc.put(p, b)
    dec = _BoolDec(enc.finish())
    assert [dec.get(p) for p, _ in seq] == [b for _, b in seq]


# ---------------------------------------------------------------------------
# frame roundtrip (the bit-exactness the q29 oracle leans on)
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 130),
    h=st.integers(1, 130),
    seed=st.integers(0, 2**32 - 1),
)
def test_frame_roundtrip_exact(w, h, seed):
    rng = random.Random(seed)
    mbw, mbh = (w + 15) >> 4, (h + 15) >> 4
    grid = [[rng.randint(0, 255) for _ in range(mbw)] for _ in range(mbh)]
    data = encode_vp8_key_frame(grid, w, h)
    assert data[3:6] == VP8_KEY_START
    assert vp8_frame_is_key(data)
    dw, dh, luma = decode_vp8_key_frame(data)
    assert (dw, dh) == (w, h)
    got = np.frombuffer(luma, np.uint8).reshape(h, w)
    assert (got == _expand(grid, w, h)).all()


def test_synth_formula_roundtrip():
    """The exact content regime the media synth emits."""
    for num, idx in ((5, 0), (17, 10), (901, 120)):
        w, h = 64 + (num * 23) % 512, 64 + (num * 29) % 512
        mbw, mbh = (w + 15) >> 4, (h + 15) >> 4
        grid = [
            [(7 * mx + 13 * my + 31 * idx + num) % 256 for mx in range(mbw)]
            for my in range(mbh)
        ]
        _, _, luma = decode_vp8_key_frame(encode_vp8_key_frame(grid, w, h))
        got = np.frombuffer(luma, np.uint8).reshape(h, w)
        assert (got == _expand(grid, w, h)).all()


# ---------------------------------------------------------------------------
# crafted-stream decodes: non-DC modes and AC coefficients
# ---------------------------------------------------------------------------


def _craft_frame(width, height, mb_modes, y2_dc_levels=None, y_ac=None):
    """Test-local generalized encoder: arbitrary 16x16 luma modes,
    optional Y2 DC levels, optional single Y AC coefficient
    ``(mb_index, subblock, scan_pos, level)`` entries — exercises the
    decoder paths the production encoder (DC_PRED-only) never emits."""
    mb_w, mb_h = (width + 15) >> 4, (height + 15) >> 4
    n = mb_w * mb_h
    y2_dc_levels = y2_dc_levels or [0] * n
    y_ac = {(e[0], e[1]): (e[2], e[3]) for e in (y_ac or [])}

    head = _BoolEnc()
    head.put(128, 0)  # color_space
    head.put(128, 0)  # clamping
    head.put(128, 0)  # segmentation
    head.put(128, 0)  # filter_type
    head.literal(6, 0)  # filter level 0
    head.literal(3, 0)  # sharpness
    head.put(128, 0)  # lf adj
    head.literal(2, 0)  # one token partition
    head.literal(7, 0)  # qindex 0
    for _ in range(5):
        head.put(128, 0)
    head.put(128, 1)  # refresh entropy
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    head.put(_COEFF_UPDATE_PROBS[i][j][k][l], 0)
    head.put(128, 0)  # mb_no_coeff_skip
    for m in mb_modes:
        head.tree(_KF_YMODE_TREE, _KF_YMODE_PROB, m, _KF_YMODE_PATHS)
        head.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB, DC_PRED, _UV_MODE_PATHS)

    tok = _BoolEnc()
    probs_y = _DEFAULT_COEFF_PROBS[_PLANE_Y_NO_DC]
    probs_y2 = _DEFAULT_COEFF_PROBS[_PLANE_Y2]
    probs_uv = _DEFAULT_COEFF_PROBS[_PLANE_UV]
    above_nz = [[0] * 9 for _ in range(mb_w)]
    for my in range(mb_h):
        left_nz = [0] * 9
        for mx in range(mb_w):
            mi = my * mb_w + mx
            anz = above_nz[mx]
            lv = [0] * 16
            lv[0] = y2_dc_levels[mi]
            nz = _encode_block(tok, probs_y2, 0, anz[8] + left_nz[8], lv)
            anz[8] = left_nz[8] = nz
            nzg = [[0] * 4 for _ in range(4)]
            for sb in range(16):
                sbx, sby = sb & 3, sb >> 2
                up = anz[sbx] if sby == 0 else nzg[sby - 1][sbx]
                lf = left_nz[sby] if sbx == 0 else nzg[sby][sbx - 1]
                lv = [0] * 16
                if (mi, sb) in y_ac:
                    pos, level = y_ac[(mi, sb)]
                    lv[pos] = level
                nzg[sby][sbx] = _encode_block(tok, probs_y, 1, up + lf, lv)
            for sbx in range(4):
                anz[sbx] = nzg[3][sbx]
            for sby in range(4):
                left_nz[sby] = nzg[sby][3]
            for off in (4, 6):
                for sb in range(4):
                    sbx, sby = sb & 1, sb >> 1
                    up = anz[off + sbx] if sby == 0 else 0
                    lf = left_nz[off + sby] if sbx == 0 else 0
                    _encode_block(tok, probs_uv, 0, up + lf, [0] * 16)
                anz[off] = anz[off + 1] = 0
                left_nz[off] = left_nz[off + 1] = 0

    hb = head.finish()
    tag = (len(hb) << 5) | (1 << 4)
    out = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    out += VP8_KEY_START
    out += bytes((width & 0xFF, (width >> 8) & 0x3F))
    out += bytes((height & 0xFF, (height >> 8) & 0x3F))
    return out + hb + tok.finish()


def test_decode_v_h_tm_edge_predictors():
    """Single-MB frames with V/H/TM modes and no residual reconstruct
    to the spec's edge fallbacks (above=127, left=129, TM al=127)."""
    for mode, expect in ((V_PRED, 127), (H_PRED, 129), (TM_PRED, 129)):
        data = _craft_frame(16, 16, [mode])
        w, h, luma = decode_vp8_key_frame(data)
        arr = np.frombuffer(luma, np.uint8)
        assert (arr == expect).all(), f"mode {mode}"


def test_decode_v_h_propagate_neighbours():
    """2x2-MB frame: top-left DC_PRED with a Y2 residual, the others
    V/H/TM — the predictors must copy the reconstructed neighbour
    edges (constant 128 + r), not the raw fallbacks."""
    r = 40  # top-left MB reconstructs to 128 + 40 = 168
    data = _craft_frame(
        32, 32, [DC_PRED, H_PRED, V_PRED, TM_PRED], y2_dc_levels=[8 * r, 0, 0, 0]
    )
    w, h, luma = decode_vp8_key_frame(data)
    arr = np.frombuffer(luma, np.uint8).reshape(32, 32)
    assert (arr[:16, :16] == 168).all()  # DC + residual
    assert (arr[:16, 16:] == 168).all()  # H copies left edge
    assert (arr[16:, :16] == 168).all()  # V copies above edge
    # TM: left(168) - above_left(168) + above(168) = 168
    assert (arr[16:, 16:] == 168).all()


def test_decode_y_ac_coefficient():
    """A nonzero Y AC coefficient exercises token decode + dequant +
    the full IDCT path; expectation from the module's own idct run on
    the dequantized coefficients (plumbing check, DC case proves the
    transform itself)."""
    level, pos = 7, 1  # scan position 1, quantized level 7 (y1ac=4 → 28)
    data = _craft_frame(16, 16, [DC_PRED], y_ac=[(0, 5, pos, level)])
    w, h, luma = decode_vp8_key_frame(data)
    arr = np.frombuffer(luma, np.uint8).reshape(16, 16).astype(int)
    coeffs = [0] * 16
    coeffs[1] = level * 4  # zigzag[1] == raster 1
    res = np.asarray(_idct4x4(coeffs)).reshape(4, 4)
    exp = np.full((16, 16), 128, int)
    exp[4:8, 4:8] = np.clip(128 + res, 0, 255)  # subblock 5 = (row 1, col 1)
    assert (arr == exp).all()


def test_cat6_extreme_levels():
    """±2040 Y2 DC levels (the residual extremes ±255) ride the cat6
    token with 11 extra bits — the widest token path."""
    grid = [[0, 255], [255, 0]]
    data = encode_vp8_key_frame(grid, 32, 32)
    _, _, luma = decode_vp8_key_frame(data)
    arr = np.frombuffer(luma, np.uint8).reshape(32, 32)
    assert (arr == _expand(grid, 32, 32)).all()
    assert _CAT_EXTRA[10][0] == 67  # cat6 base per RFC 6386 §13.2


# ---------------------------------------------------------------------------
# poison rows
# ---------------------------------------------------------------------------


def test_inter_frame_rejected():
    data = bytearray(encode_vp8_key_frame([[7]], 16, 16))
    data[0] |= 1  # frame tag bit 0 = inter frame
    assert not vp8_frame_is_key(bytes(data))
    with pytest.raises(ValueError):
        decode_vp8_key_frame(bytes(data))


def test_bad_start_code_rejected():
    data = bytearray(encode_vp8_key_frame([[7]], 16, 16))
    data[4] ^= 0xFF
    with pytest.raises(ValueError):
        decode_vp8_key_frame(bytes(data))


def test_truncated_rejected():
    data = encode_vp8_key_frame([[7, 8], [9, 10]], 32, 32)
    with pytest.raises(ValueError):
        decode_vp8_key_frame(data[:9])
    with pytest.raises(ValueError):
        decode_vp8_key_frame(data[:12])  # first partition overruns


def test_b_pred_rejected():
    data = _craft_frame(16, 16, [B_PRED])
    with pytest.raises(ValueError):
        decode_vp8_key_frame(data)


def test_out_of_range_encode_rejected():
    with pytest.raises(ValueError):
        encode_vp8_key_frame([[300]], 16, 16)
    with pytest.raises(ValueError):
        encode_vp8_key_frame([[1, 2]], 16, 16)  # grid/dims mismatch


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_garbage_never_crashes(data):
    """Adversarial bytes — raw and with a forged key-frame preamble —
    must raise ValueError, never any other exception class."""
    for blob in (data, b"\x00\x00\x00" + VP8_KEY_START + data):
        try:
            decode_vp8_key_frame(blob)
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# Spark operator: sample_frames → decode_frames
# ---------------------------------------------------------------------------


def test_decode_frames_operator(spark):
    """End-to-end over the synth: demuxed SimpleBlock payloads decode
    to the closed-form MB constants (pix_sum recomputed independently
    here with numpy from the formula); inter-frame stand-ins land in
    the is_key=0 quarantine rows."""
    from pyspark.sql import functions as F

    from donut_spark.operators.multimodal import (
        VP8_KEY_EVERY,
        _ref_num,
        _webm_dims_for,
        decode_frames,
        sample_frames,
        synth_media_table,
    )
    from donut_spark.sources.fixtures import load_spans

    spans = load_spans(spark, "/root/testdata/sf0.001").filter(
        F.col("doc_id").cast("long") < 40
    )
    media = synth_media_table(spark, spans)
    webm_refs = {
        r.media_ref
        for r in media.filter(F.col("meta.format") == "webm")
        .select("media_ref")
        .collect()
    }
    assert webm_refs
    # stride 5: hits both key frames (idx % 10 == 0) and inter frames
    dec = decode_frames(sample_frames(media, every_n=5)).collect()
    n_key = n_inter = 0
    for r in dec:
        if r.media_ref not in webm_refs:
            assert r.is_key == 1  # stills decode via their own codecs
            continue
        num = _ref_num(r.media_ref)
        w, h, _nf = _webm_dims_for(num)
        if r.frame_idx % VP8_KEY_EVERY:
            assert r.is_key == 0 and r.pix_sum is None  # quarantined
            n_inter += 1
            continue
        n_key += 1
        assert (r.width, r.height, r.is_key) == (w, h, 1)
        mbw, mbh = (w + 15) >> 4, (h + 15) >> 4
        mx = np.arange(mbw)
        my = np.arange(mbh)
        v = (7 * mx[None, :] + 13 * my[:, None] + 31 * r.frame_idx + num) % 256
        cw = np.minimum(16, w - 16 * mx)
        ch = np.minimum(16, h - 16 * my)
        exp = int((v * cw[None, :] * ch[:, None]).sum())
        assert r.pix_sum == exp
    assert n_key > 0 and n_inter > 0
