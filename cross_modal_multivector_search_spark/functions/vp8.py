"""Pure-NumPy lossy VP8 (keyframe) decoder — RFC 6386.

Closes the last in-container codec seam for the multimodal pipeline:
the reference's data prep decodes real LAION/WebVid media before
embedding (reference prepare_for_clip_webvid.py:1-54,
prepare_data.sh:23-79), and lossy WebP (a VP8 keyframe in a RIFF
container) is the dominant real-world WebP flavor. Every standalone
lossy .webp is a single keyframe, so keyframe-only coverage is full
coverage for the still-image pipeline; interframes raise.

Implemented from the public bitstream spec (RFC 6386): boolean
arithmetic decoder (§7), frame/segment/filter/quant headers (§9),
keyframe intra-mode trees (§11), DCT token decoding with per-band
contexts (§13), dequantization (§14.1), inverse WHT/DCT (§14.3-4),
all intra predictors (§12), and the normal + simple in-loop
deblocking filters (§15). Normative constant tables live in
vp8_tables.py. Correctness is pinned bit-for-bit against the
container's libwebp via a ctypes oracle in tests/test_vp8.py (YUV
planes compared exactly on encoder-generated streams across sizes,
qualities, and segment configurations).

Output is the reconstructed YUV 4:2:0 frame; ``vp8_to_rgb`` applies
libwebp's fixed-point BT.601 conversion (yuv.h constants) with
nearest-neighbor chroma upsampling.
"""

from __future__ import annotations

import struct

import numpy as np

from .vp8_tables import (AC_QLOOKUP, COEFF_PROBS, COEFF_UPDATE_PROBS,
                         DC_QLOOKUP, KF_BMODE_PROBS)

# ------------------------------------------------------ bool decoder


class _BoolDecoder:
    """RFC 6386 §7.3 boolean arithmetic decoder (reads past end as 0)."""

    __slots__ = ("buf", "pos", "end", "value", "range", "bit_count")

    def __init__(self, buf: bytes, start: int = 0, end: int | None = None):
        self.buf = buf
        self.end = len(buf) if end is None else end
        self.pos = start
        v = 0
        for _ in range(2):
            v = (v << 8) | (self.buf[self.pos] if self.pos < self.end else 0)
            self.pos += 1
        self.value = v
        self.range = 255
        self.bit_count = 0

    def decode(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= (self.buf[self.pos]
                               if self.pos < self.end else 0)
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.decode(128) else v

    def flag_signed(self, n: int) -> int:
        """An update flag; when set, an n-bit magnitude + sign (§9.3)."""
        return self.signed_literal(n) if self.decode(128) else 0

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = tree[start + self.decode(probs[start >> 1])]
        while i > 0:
            i = tree[i + self.decode(probs[i >> 1])]
        return -i


# --------------------------------------------------- normative trees

# Intra mode numbering (RFC 6386 §8.2): DC, V, H, TM, B_PRED for
# 16x16; B_DC..B_HU for 4x4 submodes.
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
(B_DC, B_TM, B_VE, B_HE, B_LD, B_RD, B_VR, B_VL, B_HD, B_HU) = range(10)

_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROB = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_MODE_PROB = (142, 114, 183)
_BMODE_TREE = (-B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10,
               -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU)
_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# 16x16 mode -> the fixed 4x4 submode used as B_PRED context (§11.3)
_MODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# Token decoding (§13.2): tree over {EOB, 0, 1, 2, 3, 4, cat1..cat6}.
_COEFF_TREE = (-11, 2, -0, 4, -1, 6, 8, 12, -2, 10, -3, -4,
               14, 16, -5, -6, 18, 20, -7, -8, -9, -10)
_TOKEN_EOB = 11
_CAT_BASE = {5: 5, 6: 7, 7: 11, 8: 19, 9: 35, 10: 67}
_CAT_PROBS = {5: (159,), 6: (165, 145), 7: (173, 148, 140),
              8: (176, 155, 140, 135), 9: (180, 157, 141, 134, 130),
              10: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)}
_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


# ------------------------------------------------------- transforms


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """RFC 6386 §14.4 inverse DCT over (n, 16) int32 coefficient rows
    (row-major 4x4); returns (n, 4, 4) int32 residuals. NumPy's >> is
    an arithmetic shift, matching the spec's C."""
    c = blocks.astype(np.int64).reshape(-1, 4, 4)
    # pass 1: columns
    i0, i1, i2, i3 = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    a1 = i0 + i2
    b1 = i0 - i2
    t1 = (i1 * 35468) >> 16
    t2 = i3 + ((i3 * 20091) >> 16)
    c1 = t1 - t2
    t1 = i1 + ((i1 * 20091) >> 16)
    t2 = (i3 * 35468) >> 16
    d1 = t1 + t2
    p = np.stack([a1 + d1, b1 + c1, b1 - c1, a1 - d1], axis=1)
    # pass 2: rows, with final rounding shift
    i0, i1, i2, i3 = p[:, :, 0], p[:, :, 1], p[:, :, 2], p[:, :, 3]
    a1 = i0 + i2
    b1 = i0 - i2
    t1 = (i1 * 35468) >> 16
    t2 = i3 + ((i3 * 20091) >> 16)
    c1 = t1 - t2
    t1 = i1 + ((i1 * 20091) >> 16)
    t2 = (i3 * 35468) >> 16
    d1 = t1 + t2
    out = np.stack([(a1 + d1 + 4) >> 3, (b1 + c1 + 4) >> 3,
                    (b1 - c1 + 4) >> 3, (a1 - d1 + 4) >> 3], axis=2)
    return out.astype(np.int32)


def _iwht(block: list[int]) -> list[int]:
    """RFC 6386 §14.3 inverse Walsh-Hadamard: Y2 block -> 16 luma DCs
    in raster subblock order."""
    t = [0] * 16
    for i in range(4):
        a1 = block[i] + block[12 + i]
        b1 = block[4 + i] + block[8 + i]
        c1 = block[4 + i] - block[8 + i]
        d1 = block[i] - block[12 + i]
        t[i] = a1 + b1
        t[4 + i] = c1 + d1
        t[8 + i] = a1 - b1
        t[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = t[r] + t[r + 3]
        b1 = t[r + 1] + t[r + 2]
        c1 = t[r + 1] - t[r + 2]
        d1 = t[r] - t[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


# ------------------------------------------------- token decoding


def _decode_coeffs(bd: _BoolDecoder, probs, first: int, ctx: int,
                   dq_dc: int, dq_ac: int, out: np.ndarray) -> int:
    """Decode one 4x4 block's tokens (§13.3) into ``out`` (16 int32,
    natural order, dequantized). Returns 1 if any coeff nonzero.

    The bool decoder is inlined with its state held in locals — this
    is the decoder's hottest loop (one call per DCT token bool), and
    the attribute-access-free form measures ~2.5x faster end-to-end.
    """
    n = first
    nnz = 0
    tree = _COEFF_TREE
    start = 0
    buf, end = bd.buf, bd.end
    pos, value, rng, bits = bd.pos, bd.value, bd.range, bd.bit_count
    bands, zig = _BANDS, _ZIGZAG
    while n < 16:
        p = probs[bands[n]][ctx]
        i = start
        while True:
            prob = p[i >> 1]
            split = 1 + (((rng - 1) * prob) >> 8)
            big = split << 8
            if value >= big:
                value -= big
                rng -= split
                i = tree[i + 1]
            else:
                rng = split
                i = tree[i]
            while rng < 128:
                value <<= 1
                rng <<= 1
                bits += 1
                if bits == 8:
                    bits = 0
                    if pos < end:
                        value |= buf[pos]
                    pos += 1
            if i <= 0:
                break
        token = -i
        if token == _TOKEN_EOB:
            break
        if token == 0:
            ctx = 0
            n += 1
            start = 2          # after a zero, EOB cannot follow (§13.3)
            continue
        if token <= 4:
            v = token
        else:
            extra = 0
            for prob in _CAT_PROBS[token]:
                split = 1 + (((rng - 1) * prob) >> 8)
                big = split << 8
                if value >= big:
                    value -= big
                    rng -= split
                    extra = (extra << 1) | 1
                else:
                    rng = split
                    extra <<= 1
                while rng < 128:
                    value <<= 1
                    rng <<= 1
                    bits += 1
                    if bits == 8:
                        bits = 0
                        if pos < end:
                            value |= buf[pos]
                        pos += 1
            v = _CAT_BASE[token] + extra
        ctx = 2 if v > 1 else 1
        # sign bit at prob 128
        split = 1 + (((rng - 1) * 128) >> 8)
        big = split << 8
        if value >= big:
            value -= big
            rng -= split
            v = -v
        else:
            rng = split
        while rng < 128:
            value <<= 1
            rng <<= 1
            bits += 1
            if bits == 8:
                bits = 0
                if pos < end:
                    value |= buf[pos]
                pos += 1
        out[zig[n]] = v * (dq_dc if n == 0 else dq_ac)
        nnz = 1
        n += 1
        start = 0
    bd.pos, bd.value, bd.range, bd.bit_count = pos, value, rng, bits
    return nnz


# ------------------------------------------------- intra predictors


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred_dc(top, left, have_top, have_left, size):
    if have_top and have_left:
        s = int(np.sum(top[:size])) + int(np.sum(left[:size]))
        shift = 5 if size == 16 else 4
        return (s + size) >> shift
    if have_top:
        return (int(np.sum(top[:size])) + (size >> 1)) >> (4 if size == 16
                                                           else 3)
    if have_left:
        return (int(np.sum(left[:size])) + (size >> 1)) >> (4 if size == 16
                                                            else 3)
    return 128


def _pred_block(mode, top, left, tl, size):
    """16x16 / 8x8 whole-block intra prediction (§12.2). ``top`` /
    ``left`` are int arrays already filled with 127/129 defaults when
    off-frame; DC availability is handled by the caller via mode
    selection of _pred_dc."""
    if mode == V_PRED:
        return np.tile(top[:size], (size, 1))
    if mode == H_PRED:
        return np.tile(left[:size, None], (1, size))
    if mode == TM_PRED:
        p = left[:size, None].astype(np.int32) + top[:size][None, :] - tl
        return np.clip(p, 0, 255)
    raise AssertionError(mode)


def _pred_b(mode, a, left, p):
    """4x4 subblock predictors (§12.3). ``a``: 8 above pixels incl.
    above-right; ``left``: 4; ``p``: above-left. Returns 4x4 int."""
    d = np.empty((4, 4), np.int32)
    if mode == B_DC:
        d[:] = (int(a[0] + a[1] + a[2] + a[3]) +
                int(left[0] + left[1] + left[2] + left[3]) + 4) >> 3
    elif mode == B_TM:
        d[:] = np.clip(left[:, None].astype(np.int32) + a[None, :4] - p,
                       0, 255)
    elif mode == B_VE:
        e = [_avg3(p, a[0], a[1]), _avg3(a[0], a[1], a[2]),
             _avg3(a[1], a[2], a[3]), _avg3(a[2], a[3], a[4])]
        d[:] = np.array(e, np.int32)[None, :]
    elif mode == B_HE:
        e = [_avg3(p, left[0], left[1]), _avg3(left[0], left[1], left[2]),
             _avg3(left[1], left[2], left[3]),
             _avg3(left[2], left[3], left[3])]
        d[:] = np.array(e, np.int32)[:, None]
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                d[r, c] = (_avg3(a[6], a[7], a[7]) if i == 6
                           else _avg3(a[i], a[i + 1], a[i + 2]))
    elif mode == B_RD:
        e = [left[3], left[2], left[1], left[0], p, a[0], a[1], a[2], a[3]]
        for r in range(4):
            for c in range(4):
                i = c - r + 3
                d[r, c] = _avg3(e[i], e[i + 1], e[i + 2])
    elif mode == B_VR:
        e = [left[3], left[2], left[1], left[0], p, a[0], a[1], a[2], a[3]]
        d[3, 0] = _avg3(e[1], e[2], e[3])
        d[2, 0] = _avg3(e[2], e[3], e[4])
        d[3, 1] = d[1, 0] = _avg3(e[3], e[4], e[5])
        d[2, 1] = d[0, 0] = _avg2(e[4], e[5])
        d[3, 2] = d[1, 1] = _avg3(e[4], e[5], e[6])
        d[2, 2] = d[0, 1] = _avg2(e[5], e[6])
        d[3, 3] = d[1, 2] = _avg3(e[5], e[6], e[7])
        d[2, 3] = d[0, 2] = _avg2(e[6], e[7])
        d[1, 3] = _avg3(e[6], e[7], e[8])
        d[0, 3] = _avg2(e[7], e[8])
    elif mode == B_VL:
        d[0, 0] = _avg2(a[0], a[1])
        d[1, 0] = _avg3(a[0], a[1], a[2])
        d[2, 0] = d[0, 1] = _avg2(a[1], a[2])
        d[3, 0] = d[1, 1] = _avg3(a[1], a[2], a[3])
        d[2, 1] = d[0, 2] = _avg2(a[2], a[3])
        d[3, 1] = d[1, 2] = _avg3(a[2], a[3], a[4])
        d[2, 2] = d[0, 3] = _avg2(a[3], a[4])
        d[3, 2] = d[1, 3] = _avg3(a[3], a[4], a[5])
        d[2, 3] = _avg3(a[4], a[5], a[6])
        d[3, 3] = _avg3(a[5], a[6], a[7])
    elif mode == B_HD:
        e = [left[3], left[2], left[1], left[0], p, a[0], a[1], a[2], a[3]]
        d[3, 0] = _avg2(e[0], e[1])
        d[3, 1] = _avg3(e[0], e[1], e[2])
        d[2, 0] = d[3, 2] = _avg2(e[1], e[2])
        d[2, 1] = d[3, 3] = _avg3(e[1], e[2], e[3])
        d[2, 2] = d[1, 0] = _avg2(e[2], e[3])
        d[2, 3] = d[1, 1] = _avg3(e[2], e[3], e[4])
        d[1, 2] = d[0, 0] = _avg2(e[3], e[4])
        d[1, 3] = d[0, 1] = _avg3(e[3], e[4], e[5])
        d[0, 2] = _avg3(e[4], e[5], e[6])
        d[0, 3] = _avg3(e[5], e[6], e[7])
    elif mode == B_HU:
        ll = left
        d[0, 0] = _avg2(ll[0], ll[1])
        d[0, 1] = _avg3(ll[0], ll[1], ll[2])
        d[0, 2] = d[1, 0] = _avg2(ll[1], ll[2])
        d[0, 3] = d[1, 1] = _avg3(ll[1], ll[2], ll[3])
        d[1, 2] = d[2, 0] = _avg2(ll[2], ll[3])
        d[1, 3] = d[2, 1] = _avg3(ll[2], ll[3], ll[3])
        d[2, 2] = d[2, 3] = ll[3]
        d[3, :] = ll[3]
    else:
        raise AssertionError(mode)
    return d


# ----------------------------------------------------- frame headers


class _FrameHeader:
    """Parsed keyframe header state (RFC 6386 §9)."""

    __slots__ = ("width", "height", "part0_size", "version",
                 "seg_enabled", "seg_update_map", "seg_abs",
                 "seg_quant", "seg_lf", "seg_tree_probs",
                 "filter_simple", "filter_level", "sharpness",
                 "lf_delta_enabled", "ref_lf_delta", "mode_lf_delta",
                 "y_ac_qi", "y_dc_delta", "y2_dc_delta", "y2_ac_delta",
                 "uv_dc_delta", "uv_ac_delta",
                 "skip_enabled", "prob_skip", "coeff_probs")


def _parse_header(data: bytes) -> tuple[_FrameHeader, _BoolDecoder, int]:
    if len(data) < 10:
        raise ValueError("VP8 payload too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError(
            "VP8 interframe: only keyframes are decodable (every "
            "standalone lossy .webp is a single keyframe)")
    h = _FrameHeader()
    h.version = (tag >> 1) & 7
    h.part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w16, h16 = struct.unpack("<HH", data[6:10])
    h.width = w16 & 0x3FFF
    h.height = h16 & 0x3FFF
    if h.width == 0 or h.height == 0:
        raise ValueError("bad VP8 dimensions")
    bd = _BoolDecoder(data, 10, 10 + h.part0_size)
    bd.literal(1)                               # color space (must be 0)
    bd.literal(1)                               # clamping type
    # --- segmentation (§9.3)
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    h.seg_abs = False
    h.seg_update_map = False
    h.seg_enabled = bool(bd.decode(128))
    if h.seg_enabled:
        h.seg_update_map = bool(bd.decode(128))
        update_data = bd.decode(128)
        if update_data:
            h.seg_abs = bool(bd.decode(128))
            h.seg_quant = [bd.flag_signed(7) for _ in range(4)]
            h.seg_lf = [bd.flag_signed(6) for _ in range(4)]
        if h.seg_update_map:
            h.seg_tree_probs = [bd.literal(8) if bd.decode(128) else 255
                                for _ in range(3)]
    # --- loop filter (§9.4)
    h.filter_simple = bool(bd.decode(128))
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta_enabled = bool(bd.decode(128))
    h.ref_lf_delta = [0, 0, 0, 0]
    h.mode_lf_delta = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.decode(128):                      # mode_ref_lf_delta_update
            h.ref_lf_delta = [bd.flag_signed(6) for _ in range(4)]
            h.mode_lf_delta = [bd.flag_signed(6) for _ in range(4)]
    # --- token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    # --- quantizers (§9.6)
    h.y_ac_qi = bd.literal(7)
    h.y_dc_delta = bd.flag_signed(4)
    h.y2_dc_delta = bd.flag_signed(4)
    h.y2_ac_delta = bd.flag_signed(4)
    h.uv_dc_delta = bd.flag_signed(4)
    h.uv_ac_delta = bd.flag_signed(4)
    bd.literal(1)                               # refresh entropy (keyframe)
    # --- coefficient probability updates (§13.4)
    cp = COEFF_PROBS.reshape(4, 8, 3, 11).copy()
    up = COEFF_UPDATE_PROBS.reshape(4, 8, 3, 11)
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    if bd.decode(int(up[i, j, k, m])):
                        cp[i, j, k, m] = bd.literal(8)
    h.coeff_probs = cp
    # --- per-MB skip flag (§9.10)
    h.skip_enabled = bool(bd.decode(128))
    h.prob_skip = bd.literal(8) if h.skip_enabled else 0
    return h, bd, n_parts


def _dequant_factors(h: _FrameHeader) -> list[tuple[int, ...]]:
    """Per-segment (y1dc, y1ac, y2dc, y2ac, uvdc, uvac) (§14.1)."""
    out = []
    for s in range(4):
        if h.seg_enabled:
            q = h.seg_quant[s] if h.seg_abs else h.y_ac_qi + h.seg_quant[s]
        else:
            q = h.y_ac_qi
        q = _clamp_q(q)
        y1dc = int(DC_QLOOKUP[_clamp_q(q + h.y_dc_delta)])
        y1ac = int(AC_QLOOKUP[_clamp_q(q)])
        y2dc = int(DC_QLOOKUP[_clamp_q(q + h.y2_dc_delta)]) * 2
        y2ac = int(AC_QLOOKUP[_clamp_q(q + h.y2_ac_delta)]) * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uv_dc_i = q + h.uv_dc_delta
        uvdc = int(DC_QLOOKUP[min(_clamp_q(uv_dc_i), 117)])
        uvac = int(AC_QLOOKUP[_clamp_q(q + h.uv_ac_delta)])
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


def _nested(probs: np.ndarray):
    """Token probs as nested tuples for fast Python-level indexing."""
    return tuple(tuple(tuple(tuple(int(x) for x in ctx) for ctx in band)
                       for band in plane) for plane in probs)


# ------------------------------------------------------- frame decode


def decode_vp8_frame(data: bytes, _trace=None):
    """Decode a VP8 keyframe to reconstructed, loop-filtered YUV 4:2:0
    planes (cropped uint8 arrays y (H,W), u, v ((H+1)//2, (W+1)//2))."""
    h, bd0, n_parts = _parse_header(data)
    w, ht = h.width, h.height
    mb_w, mb_h = (w + 15) >> 4, (ht + 15) >> 4
    # token partitions: sizes after partition 0, last runs to the end
    off = 10 + h.part0_size
    sizes = []
    for _ in range(n_parts - 1):
        sizes.append(data[off] | (data[off + 1] << 8) | (data[off + 2] << 16))
        off += 3
    parts = []
    for i in range(n_parts):
        end = off + sizes[i] if i < n_parts - 1 else len(data)
        parts.append(_BoolDecoder(data, off, min(end, len(data))))
        off = end
    dq = _dequant_factors(h)
    probs = _nested(h.coeff_probs)
    yplane = np.empty((mb_h * 16, mb_w * 16), np.uint8)
    uplane = np.empty((mb_h * 8, mb_w * 8), np.uint8)
    vplane = np.empty((mb_h * 8, mb_w * 8), np.uint8)
    # nonzero contexts (§13.3): above per MB column, left per row
    above_y_nz = np.zeros((mb_w, 4), np.uint8)
    above_u_nz = np.zeros((mb_w, 2), np.uint8)
    above_v_nz = np.zeros((mb_w, 2), np.uint8)
    above_y2_nz = np.zeros(mb_w, np.uint8)
    above_bmodes = np.zeros((mb_w, 4), np.uint8)  # B_DC off-frame
    # loop-filter bookkeeping
    lf_level = np.zeros((mb_h, mb_w), np.uint8)
    lf_inner = np.zeros((mb_h, mb_w), bool)
    seg_tp = h.seg_tree_probs
    for mby in range(mb_h):
        left_y_nz = [0, 0, 0, 0]
        left_u_nz = [0, 0]
        left_v_nz = [0, 0]
        left_y2_nz = 0
        left_bmodes = [B_DC] * 4
        tbd = parts[mby % n_parts]
        for mbx in range(mb_w):
            # ---- modes (partition 0, §11)
            segment = 0
            if h.seg_enabled and h.seg_update_map:
                segment = bd0.tree(_SEGMENT_TREE, seg_tp)
            skip = bool(bd0.decode(h.prob_skip)) if h.skip_enabled else False
            ymode = bd0.tree(_KF_YMODE_TREE, _KF_YMODE_PROB)
            if ymode == B_PRED:
                bmodes = []
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    above_m = (above_bmodes[mbx][c] if r == 0
                               else bmodes[sb - 4])
                    left_m = (left_bmodes[r] if c == 0 else bmodes[sb - 1])
                    bmodes.append(bd0.tree(
                        _BMODE_TREE, KF_BMODE_PROBS[above_m][left_m]))
            else:
                bmodes = [_MODE_TO_B[ymode]] * 16
            uvmode = bd0.tree(_UV_MODE_TREE, _KF_UV_MODE_PROB)
            above_bmodes[mbx] = bmodes[12:16]
            left_bmodes = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            # ---- residual tokens (§13)
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq[segment]
            has_y2 = ymode != B_PRED
            ycoef = np.zeros((16, 16), np.int32)
            ucoef = np.zeros((4, 16), np.int32)
            vcoef = np.zeros((4, 16), np.int32)
            mb_nz = 0
            if skip:
                left_y_nz = [0, 0, 0, 0]
                above_y_nz[mbx] = 0
                left_u_nz = [0, 0]
                above_u_nz[mbx] = 0
                left_v_nz = [0, 0]
                above_v_nz[mbx] = 0
                if has_y2:
                    left_y2_nz = 0
                    above_y2_nz[mbx] = 0
            else:
                if has_y2:
                    y2 = np.zeros(16, np.int32)
                    ctx = left_y2_nz + above_y2_nz[mbx]
                    nz = _decode_coeffs(tbd, probs[1], 0, ctx,
                                        y2dc, y2ac, y2)
                    left_y2_nz = above_y2_nz[mbx] = nz
                    mb_nz |= nz
                    dcs = _iwht(y2.tolist())
                    first, yprobs = 1, probs[0]
                else:
                    dcs = None
                    first, yprobs = 0, probs[3]
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    ctx = ((left_y_nz[r] if c == 0 else last_nz) +
                           (above_y_nz[mbx][c] if r == 0 else col_nz[c]))
                    nz = _decode_coeffs(tbd, yprobs, first, ctx,
                                        y1dc, y1ac, ycoef[sb])
                    last_nz = nz
                    if c == 0:
                        col_nz = [0, 0, 0, 0] if r == 0 else col_nz
                    col_nz[c] = nz
                    if c == 3:
                        left_y_nz[r] = nz
                    mb_nz |= nz
                above_y_nz[mbx] = col_nz
                for plane, coef, lnz, anz, pi in (
                        (0, ucoef, left_u_nz, above_u_nz, 2),
                        (1, vcoef, left_v_nz, above_v_nz, 2)):
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        ctx = ((lnz[r] if c == 0 else last_nz) +
                               (anz[mbx][c] if r == 0 else bot_nz[c]))
                        nz = _decode_coeffs(tbd, probs[pi], 0, ctx,
                                            uvdc, uvac, coef[sb])
                        last_nz = nz
                        if c == 0:
                            bot_nz = [0, 0] if r == 0 else bot_nz
                        bot_nz[c] = nz
                        if c == 1:
                            lnz[r] = nz
                        mb_nz |= nz
                    anz[mbx] = bot_nz
                if has_y2:
                    for sb in range(16):
                        ycoef[sb][0] = dcs[sb]
            # ---- reconstruction (§12, §14)
            _reconstruct_mb(yplane, uplane, vplane, mby, mbx, mb_w,
                            ymode, bmodes, uvmode, ycoef, ucoef, vcoef)
            # ---- loop-filter bookkeeping (§15.1)
            if h.seg_enabled:
                lvl = (h.seg_lf[segment] if h.seg_abs
                       else h.filter_level + h.seg_lf[segment])
            else:
                lvl = h.filter_level
            if h.lf_delta_enabled:
                lvl += h.ref_lf_delta[0]        # keyframe MBs are intra
                if ymode == B_PRED:
                    lvl += h.mode_lf_delta[0]
            lf_level[mby, mbx] = min(max(lvl, 0), 63)
            lf_inner[mby, mbx] = (ymode == B_PRED) or bool(mb_nz)
            if _trace is not None:
                _trace.setdefault("mbs", []).append(
                    (mby, mbx, segment, skip, ymode, tuple(bmodes),
                     uvmode, mb_nz))
                _trace.setdefault("ycoef", []).append(ycoef.copy())
    if _trace is not None:
        _trace["header"] = h
        _trace["levels"] = lf_level.copy()
        _trace["inner"] = lf_inner.copy()
        _trace["unfiltered"] = (yplane.copy(), uplane.copy(),
                                vplane.copy())
    if h.filter_level and h.version < 2:
        simple = h.filter_simple or h.version == 1
        _loop_filter(yplane, uplane, vplane, lf_level, lf_inner,
                     h.sharpness, simple)
    return (yplane[:ht, :w], uplane[:(ht + 1) >> 1, :(w + 1) >> 1],
            vplane[:(ht + 1) >> 1, :(w + 1) >> 1])


# ---------------------------------------------------- reconstruction


def _mb_context(plane, mby, mbx, size):
    """Prediction edges for a whole-MB plane block, with the spec's
    off-frame defaults (top=127, left=129, §12.2)."""
    y0, x0 = mby * size, mbx * size
    have_top, have_left = mby > 0, mbx > 0
    top = (plane[y0 - 1, x0:x0 + size].astype(np.int32) if have_top
           else np.full(size, 127, np.int32))
    left = (plane[y0:y0 + size, x0 - 1].astype(np.int32) if have_left
            else np.full(size, 129, np.int32))
    tl = (127 if not have_top
          else (129 if not have_left else int(plane[y0 - 1, x0 - 1])))
    return top, left, tl, have_top, have_left


def _tile_blocks(res: np.ndarray, n: int) -> np.ndarray:
    """(n*n, 4, 4) subblock residuals -> (4n, 4n) plane layout."""
    return res.reshape(n, n, 4, 4).transpose(0, 2, 1, 3).reshape(4 * n,
                                                                 4 * n)


def _reconstruct_mb(yplane, uplane, vplane, mby, mbx, mb_w,
                    ymode, bmodes, uvmode, ycoef, ucoef, vcoef):
    y0, x0 = mby * 16, mbx * 16
    yres = _idct_blocks(ycoef)
    top, left, tl, have_top, have_left = _mb_context(yplane, mby, mbx, 16)
    if ymode == B_PRED:
        cv = np.empty((17, 21), np.int32)
        cv[0, 0] = tl
        cv[0, 1:17] = top
        cv[1:17, 0] = left
        if not have_top:
            cv[0, 17:21] = 127
        elif mbx >= mb_w - 1:
            cv[0, 17:21] = top[15]
        else:
            cv[0, 17:21] = yplane[y0 - 1, x0 + 16:x0 + 20]
        # the above-right of right-column subblocks below the first row
        # reads the MB top-right (libwebp replicates it the same way)
        cv[4, 17:21] = cv[8, 17:21] = cv[12, 17:21] = cv[0, 17:21]
        for sb in range(16):
            r, c = (sb >> 2) * 4, (sb & 3) * 4
            a = cv[r, 1 + c:9 + c]
            left4 = cv[1 + r:5 + r, c]
            p = int(cv[r, c])
            blk = _pred_b(bmodes[sb], a, left4, p) + yres[sb]
            cv[1 + r:5 + r, 1 + c:5 + c] = np.clip(blk, 0, 255)
        yplane[y0:y0 + 16, x0:x0 + 16] = cv[1:17, 1:17]
    else:
        if ymode == DC_PRED:
            pred = np.full((16, 16),
                           _pred_dc(top, left, have_top, have_left, 16),
                           np.int32)
        else:
            pred = _pred_block(ymode, top, left, tl, 16)
        out = np.clip(pred + _tile_blocks(yres, 4), 0, 255)
        yplane[y0:y0 + 16, x0:x0 + 16] = out
    cy0, cx0 = mby * 8, mbx * 8
    for plane, coef in ((uplane, ucoef), (vplane, vcoef)):
        res = _idct_blocks(coef)
        top, left, tl, have_top, have_left = _mb_context(plane, mby,
                                                         mbx, 8)
        if uvmode == DC_PRED:
            pred = np.full((8, 8),
                           _pred_dc(top, left, have_top, have_left, 8),
                           np.int32)
        else:
            pred = _pred_block(uvmode, top, left, tl, 8)
        out = np.clip(pred + _tile_blocks(res, 2), 0, 255)
        plane[cy0:cy0 + 8, cx0:cx0 + 8] = out


# ------------------------------------------------------- loop filter


def _c128(v):
    # direct ufuncs: np.clip's dispatch overhead dominates the filter
    # at ~200k small-array calls per frame
    return np.maximum(np.minimum(v, 127), -128)


def _filter_common(p1, p0, q0, q1, use_outer):
    """§15.3 common_adjust on int32 arrays (values already -128..127);
    returns (new_p0, new_q0, a) with a = the clamped (x+4)>>3 term."""
    a = _c128(np.where(use_outer, _c128(p1 - q1), 0) + 3 * (q0 - p0))
    f = _c128(a + 4) >> 3
    e = _c128(a + 3) >> 3
    return _c128(p0 + e), _c128(q0 - f), f


def _normal_edge(px, mb_edge, interior, edge_lim, hev_t, row_mask=None):
    """§15.2/15.3 normal filter for one edge. ``px`` is an int32 array
    (n, 8) of [p3 p2 p1 p0 q0 q1 q2 q3]; returns the filtered copy.
    ``interior``/``edge_lim``/``hev_t`` may be scalars or per-row
    arrays; ``row_mask`` (bool per row) gates rows that belong to
    unfiltered/inner-skipped macroblocks in batched calls."""
    u = px
    d = np.abs(np.diff(u, axis=1))
    mask = ((d[:, 0] <= interior) & (d[:, 1] <= interior) &
            (d[:, 2] <= interior) & (d[:, 4] <= interior) &
            (d[:, 5] <= interior) & (d[:, 6] <= interior) &
            (np.abs(u[:, 3] - u[:, 4]) * 2 +
             (np.abs(u[:, 2] - u[:, 5]) >> 1) <= edge_lim))
    if row_mask is not None:
        mask &= row_mask
    hev = ((np.abs(u[:, 2] - u[:, 3]) > hev_t) |
           (np.abs(u[:, 5] - u[:, 4]) > hev_t))
    s = u - 128
    p3, p2, p1, p0 = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
    q0, q1, q2, q3 = s[:, 4], s[:, 5], s[:, 6], s[:, 7]
    if mb_edge:
        # hev rows: adjust p0/q0 with outer taps only
        np0, nq0, _ = _filter_common(p1, p0, q0, q1, True)
        w = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
        a0 = _c128((27 * w + 63) >> 7)
        a1 = _c128((18 * w + 63) >> 7)
        a2 = _c128((9 * w + 63) >> 7)
        sel = mask & hev
        p0 = np.where(sel, np0, p0)
        q0 = np.where(sel, nq0, q0)
        sel = mask & ~hev
        p0 = np.where(sel, _c128(p0 + a0), p0)
        q0 = np.where(sel, _c128(q0 - a0), q0)
        p1 = np.where(sel, _c128(p1 + a1), p1)
        q1 = np.where(sel, _c128(q1 - a1), q1)
        p2 = np.where(sel, _c128(p2 + a2), p2)
        q2 = np.where(sel, _c128(q2 - a2), q2)
    else:
        np0, nq0, f = _filter_common(p1, p0, q0, q1, hev)
        p0 = np.where(mask, np0, p0)
        q0 = np.where(mask, nq0, q0)
        a = (f + 1) >> 1
        sel = mask & ~hev
        p1 = np.where(sel, _c128(p1 + a), p1)
        q1 = np.where(sel, _c128(q1 - a), q1)
    out = np.stack([p3, p2, p1, p0, q0, q1, q2, q3], axis=1) + 128
    return out


def _simple_edge(px, edge_lim, row_mask=None):
    """§15.1 simple filter (luma only)."""
    u = px
    mask = (np.abs(u[:, 3] - u[:, 4]) * 2 +
            (np.abs(u[:, 2] - u[:, 5]) >> 1) <= edge_lim)
    if row_mask is not None:
        mask &= row_mask
    s = u - 128
    p1, p0, q0, q1 = s[:, 2], s[:, 3], s[:, 4], s[:, 5]
    np0, nq0, _ = _filter_common(p1, p0, q0, q1, True)
    s[:, 3] = np.where(mask, np0, p0)
    s[:, 4] = np.where(mask, nq0, q0)
    return s + 128


def _apply_v(plane, y0, x, n, fn):
    """Filter the vertical edge at column ``x`` over rows y0..y0+n."""
    px = plane[y0:y0 + n, x - 4:x + 4].astype(np.int32)
    plane[y0:y0 + n, x - 4:x + 4] = fn(px)


def _apply_h(plane, x0, y, n, fn):
    """Filter the horizontal edge at row ``y`` over cols x0..x0+n."""
    px = plane[y - 4:y + 4, x0:x0 + n].T.astype(np.int32)
    plane[y - 4:y + 4, x0:x0 + n] = fn(px).T


def _loop_filter(yp, up, vp, levels, inner, sharpness, simple):
    """§15 in-loop deblocking, bit-equivalent to MB raster order (left
    MB edge, inner vertical, top MB edge, inner horizontal — libwebp's
    order; filters compound in-place).

    Executed as an anti-diagonal WAVEFRONT for speed: all MBs with the
    same r+c run their vertical edges in one batched kernel call per
    edge position, then their horizontal edges likewise. This is the
    exact dependency closure of raster order: V(r,c) needs H(r,c-1)
    (left margin) and H(r-1,c) never writes below its MB's bottom-3
    rows; H(r,c) needs V(r,c) and H(r-1,c); and V(r-1,c+1) must precede
    H(r,c) because the top MB-edge filter writes 3 rows UP into MB
    (r-1,c), whose right margin V(r-1,c+1) reads. Scheduling V at
    wave 2(r+c) and H at 2(r+c)+1 satisfies every one of these, and
    same-wave cells touch disjoint pixels. Pinned bit-for-bit against
    libwebp by tests/test_vp8.py across filter configs and MB-grid
    shapes (incl. single-row, single-column, and square grids)."""
    mb_h, mb_w = levels.shape
    fl = levels.astype(np.int32)
    il = fl.copy()
    if sharpness:
        il >>= 2 if sharpness > 4 else 1
        np.minimum(il, 9 - sharpness, out=il)
    np.maximum(il, 1, out=il)
    mb_lim = (fl + 2) * 2 + il
    sb_lim = fl * 2 + il
    hev_t = np.where(fl >= 40, 2, np.where(fl >= 15, 1, 0))
    active = fl > 0
    inner_act = active & inner

    def batch_v(plane, items, n, mb_edge):
        # items: (mb_r, x, il, lim, hev); one kernel call for them all
        if not items:
            return
        slabs = np.concatenate(
            [plane[r * n:(r + 1) * n, x - 4:x + 4]
             for r, x, _, _, _ in items]).astype(np.int32)
        lim = np.repeat([t[3] for t in items], n)
        if simple:
            out = _simple_edge(slabs, lim)
        else:
            ila = np.repeat([t[2] for t in items], n)
            hva = np.repeat([t[4] for t in items], n)
            out = _normal_edge(slabs, mb_edge, ila, lim, hva)
        for i, (r, x, _, _, _) in enumerate(items):
            plane[r * n:(r + 1) * n, x - 4:x + 4] = out[i * n:(i + 1) * n]

    def batch_h(plane, items, n, mb_edge):
        # items: (mb_c, y, il, lim, hev); slabs transposed to (n, 8)
        if not items:
            return
        slabs = np.concatenate(
            [plane[y - 4:y + 4, c * n:(c + 1) * n].T
             for c, y, _, _, _ in items]).astype(np.int32)
        lim = np.repeat([t[3] for t in items], n)
        if simple:
            out = _simple_edge(slabs, lim)
        else:
            ila = np.repeat([t[2] for t in items], n)
            hva = np.repeat([t[4] for t in items], n)
            out = _normal_edge(slabs, mb_edge, ila, lim, hva)
        for i, (c, y, _, _, _) in enumerate(items):
            plane[y - 4:y + 4, c * n:(c + 1) * n] = \
                out[i * n:(i + 1) * n].T

    for d in range(mb_h + mb_w - 1):
        cells = [(r, d - r) for r in range(max(0, d - mb_w + 1),
                                           min(mb_h, d + 1))]
        act = [(r, c) for r, c in cells if active[r, c]]
        if not act:
            continue
        inn = [(r, c) for r, c in act if inner_act[r, c]]

        # ---- vertical phase
        mbv = [(r, c * 16, int(il[r, c]), int(mb_lim[r, c]),
                int(hev_t[r, c])) for r, c in act if c > 0]
        batch_v(yp, mbv, 16, True)
        for dx in (4, 8, 12):
            sbv = [(r, c * 16 + dx, int(il[r, c]), int(sb_lim[r, c]),
                    int(hev_t[r, c])) for r, c in inn]
            batch_v(yp, sbv, 16, False)
        if not simple:
            cmb = [(r, c * 8, int(il[r, c]), int(mb_lim[r, c]),
                    int(hev_t[r, c])) for r, c in act if c > 0]
            batch_v(up, cmb, 8, True)
            batch_v(vp, cmb, 8, True)
            csb = [(r, c * 8 + 4, int(il[r, c]), int(sb_lim[r, c]),
                    int(hev_t[r, c])) for r, c in inn]
            batch_v(up, csb, 8, False)
            batch_v(vp, csb, 8, False)
        # ---- horizontal phase
        mbh = [(c, r * 16, int(il[r, c]), int(mb_lim[r, c]),
                int(hev_t[r, c])) for r, c in act if r > 0]
        batch_h(yp, mbh, 16, True)
        if not simple:
            cmbh = [(c, r * 8, int(il[r, c]), int(mb_lim[r, c]),
                     int(hev_t[r, c])) for r, c in act if r > 0]
            batch_h(up, cmbh, 8, True)
            batch_h(vp, cmbh, 8, True)
        for dy in (4, 8, 12):
            sbh = [(c, r * 16 + dy, int(il[r, c]), int(sb_lim[r, c]),
                    int(hev_t[r, c])) for r, c in inn]
            batch_h(yp, sbh, 16, False)
        if not simple:
            csbh = [(c, r * 8 + 4, int(il[r, c]), int(sb_lim[r, c]),
                     int(hev_t[r, c])) for r, c in inn]
            batch_h(up, csbh, 8, False)
            batch_h(vp, csbh, 8, False)


# ------------------------------------------------------- RGB output


def vp8_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Fixed-point BT.601 limited-range YUV -> RGB using libwebp's
    yuv.h constants ((v*coeff)>>8, final >>6, clip), with nearest
    2x2 chroma upsampling (upsampler-independent on flat chroma)."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w].astype(np.int32)
    vv = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w].astype(np.int32)
    yy = y.astype(np.int32)
    ys = (yy * 19077) >> 8
    r = (ys + ((vv * 26149) >> 8) - 14234) >> 6
    g = (ys - ((uu * 6419) >> 8) - ((vv * 13320) >> 8) + 8708) >> 6
    b = (ys + ((uu * 33050) >> 8) - 17685) >> 6
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def decode_vp8_rgb(data: bytes) -> np.ndarray:
    """VP8 keyframe payload -> uint8 (H, W, 3) RGB."""
    return vp8_to_rgb(*decode_vp8_frame(data))
