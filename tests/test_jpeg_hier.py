"""Hierarchical JPEG (T.81 Annex J): DHP + EXP + differential frames.

No third-party Annex-J codec exists (libjpeg never implemented
hierarchical coding), so parity is pinned the way VP8L started: an
in-repo encoder twin whose decoder-tracking reconstruction makes the
coded difference exact, plus hand-computed EXP filter values, exact
DC-only fixtures, an independent composition cross-check built from
the module's primitive kernels, and the progressive/sequential
entropy-twin equality (lossless entropy => identical pixels)."""

import numpy as np
import pytest

from cross_modal_multivector_search_spark.functions import jpeg as J


def _gray(shape, seed=0, smooth=True):
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, int(np.prod(shape))).reshape(shape)
    return np.clip(base + rng.integers(-10, 10, shape), 0,
                   255).astype(np.uint8)


def _markers(d: bytes) -> list[int]:
    return [b for a, b in zip(d, d[1:]) if a == 0xFF and b not in (0, 0xFF)]


def test_exp_expand_literal():
    """J.1.1.2 filter: out(2x)=in(x), out(2x+1)=(in(x)+in(x+1)+1)>>1,
    last column/row replicated — pinned on hand-computed values."""
    p = np.array([[0.0, 10.0, 255.0]])
    out = J._exp_expand(p, 1, 0)
    assert out.tolist() == [[0, 5, 10, 133, 255, 255]]
    out2 = J._exp_expand(np.array([[0.0], [9.0]]), 0, 1)
    assert out2.tolist() == [[0], [5], [9], [9]]
    both = J._exp_expand(np.array([[1.0, 2.0]]), 1, 1)
    assert both.tolist() == [[1, 2, 2, 2], [1, 2, 2, 2]]


def test_marker_structure():
    img = _gray((32, 24), 1)
    d = J.encode_jpeg_hierarchical(img, 90, levels=3)
    ms = _markers(d)
    assert ms.count(0xDE) == 1                  # one DHP
    assert ms.count(0xC0) == 1                  # one initial frame
    assert ms.count(0xC5) == 2                  # levels-1 differential
    assert ms.count(0xDF) == 2                  # EXP before each diff
    assert ms.index(0xDE) < ms.index(0xC0) < ms.index(0xC5)


def test_constant_image_exact():
    """DC-only at quality 100: every frame codes exactly, the diff is
    identically zero, and the decode is bit-exact."""
    for shape in ((16, 16), (24, 40), (17, 13)):
        img = np.full(shape, 100, dtype=np.uint8)
        for lv in (1, 2, 3):
            out = J.decode_jpeg(J.encode_jpeg_hierarchical(img, 100, lv))
            assert np.array_equal(out, img), (shape, lv)


def test_q100_roundtrip_within_rounding():
    """The final differential frame corrects the upsampled reference
    with quant=1 tables, so the only residual is float DCT/YCbCr
    rounding (+-2)."""
    img = _gray((31, 27), 1)
    out = J.decode_jpeg(J.encode_jpeg_hierarchical(img, 100, 3))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (20, 22, 3), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_hierarchical(rgb, 100, 2))
    # YCbCr forward/backward rounding stacks on the DCT rounding
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_progressive_equals_sequential_twin():
    """SOF2/SOF6 with the simple scan script reconstructs the same
    quantized coefficients as SOF0/SOF5 — identical pixels (the
    in-repo analog of the arithmetic entropy-twin pin)."""
    cases = [((31, 27), 90, 2), ((16, 16), 75, 3), ((20, 22, 3), 85, 2)]
    for shape, q, lv in cases:
        img = _gray(shape, hash((shape, q)) & 0xFF)
        seq = J.decode_jpeg(J.encode_jpeg_hierarchical(
            img, q, lv, progressive=False))
        pro = J.decode_jpeg(J.encode_jpeg_hierarchical(
            img, q, lv, progressive=True))
        np.testing.assert_array_equal(seq, pro)
        d = J.encode_jpeg_hierarchical(img, q, lv, progressive=True)
        ms = _markers(d)
        assert 0xC2 in ms and 0xC6 in ms


def test_independent_composition_cross_check():
    """Compose the expected pixels OUTSIDE decode_jpeg: standalone
    decode of the base level, the module's EXP filter, and a direct
    dequant+IDCT of the diff blocks — the hierarchical decode must
    match EXACTLY (pins the scan + fold plumbing, not just encoder/
    decoder agreement)."""
    img = _gray((24, 20), 5)
    q = 90
    d = J.encode_jpeg_hierarchical(img, q, 2)
    got = J.decode_jpeg(d)

    ql = J._scale_quant(J.QUANT_LUM, q)
    lvl1 = J._downsample2(img.astype(np.float64))
    ref0 = J.decode_jpeg(J.encode_jpeg(
        np.clip(np.round(lvl1), 0, 255).astype(np.uint8), q))
    # encoder feeds the float pyramid plane; the standalone encode
    # above quantizes the rounded-uint8 plane instead, so recompute
    # the blocks the hierarchical encoder actually coded:
    b0 = J._plane_to_blocks(J._pad_to(lvl1, 16, 16), ql, 128.0)
    rec0 = _deq_idct(b0, ql) + 128.0
    ref0 = np.clip(np.round(rec0[:12, :10]), 0, 255)
    exp_ref = J._exp_expand(ref0, 1, 1)[:24, :20]
    diff = img.astype(np.float64) - exp_ref
    bd = J._plane_to_blocks(J._pad_to(diff, 24, 24), ql, 0.0)
    rec_d = _deq_idct(bd, ql)[:24, :20]
    expected = np.clip(np.round(exp_ref + rec_d), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, expected)


def _deq_idct(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    by, bx = blocks.shape[:2]
    zz = blocks.reshape(-1, 64)
    coef = np.zeros_like(zz, dtype=np.float64)
    coef[:, J.ZIGZAG] = zz * q.reshape(64)[J.ZIGZAG][None, :]
    pix = J._idct2_batch(coef.reshape(-1, 8, 8))
    return pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
              .reshape(by * 8, bx * 8)


def test_malformed_hierarchical_raises():
    img = _gray((16, 16), 7)
    d = J.encode_jpeg_hierarchical(img, 90, 2)
    # strip the EXP segment -> reference too small for the diff frame
    i = d.index(b"\xff\xdf")
    ln = int.from_bytes(d[i + 2:i + 4], "big")
    no_exp = d[:i] + d[i + 2 + ln:]
    with pytest.raises(ValueError, match="missing EXP"):
        J.decode_jpeg(no_exp)
    # EXP outside hierarchical mode
    plain = bytearray(J.encode_jpeg(img, 90))
    j = bytes(plain).index(b"\xff\xc0")
    bad = bytes(plain[:j]) + b"\xff\xdf\x00\x03\x11" + bytes(plain[j:])
    with pytest.raises(ValueError, match="EXP segment outside"):
        J.decode_jpeg(bad)


def test_decode_image_dispatches_hierarchical():
    from cross_modal_multivector_search_spark.operators import (
        multimodal as M,
    )
    img = _gray((16, 16), 9)
    d = J.encode_jpeg_hierarchical(img, 100, 2)
    np.testing.assert_array_equal(M.decode_image(d), J.decode_jpeg(d))


def test_final_lossless_refinement_bit_exact():
    """SOF7 differential lossless refinement (Annex J's documented
    lossless-pyramid use): a lossy DCT base + one modulo-2^16
    correction frame reproduces the gray input BIT-EXACTLY at any
    quality."""
    rng = np.random.default_rng(31)
    for q, lv in ((50, 2), (85, 3)):
        img = rng.integers(0, 256, (21, 33), dtype=np.uint8)
        d = J.encode_jpeg_hierarchical(img, q, lv, final_lossless=True)
        ms = _markers(d)
        assert 0xC7 in ms and ms.count(0xC5) == lv - 1
        np.testing.assert_array_equal(J.decode_jpeg(d), img)
    # RGB: exact in the coded YCbCr domain; RGB output differs only by
    # the color transform's own rounding
    rgb = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_hierarchical(
        rgb, 50, 2, final_lossless=True))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1


def test_differential_lossless_scan_guards():
    """Predictor 0 is differential-only; nonzero predictors are
    rejected inside differential lossless frames (Table H.1)."""
    img = np.full((8, 8), 50, dtype=np.uint8)
    d = bytearray(J.encode_jpeg_lossless(img, 1))
    # flip SOF3 -> SOF7 without a DHP: malformed hierarchy
    i = bytes(d).index(b"\xff\xc3")
    d[i + 1] = 0xC7
    with pytest.raises(ValueError, match="missing DHP"):
        J.decode_jpeg(bytes(d))
    # predictor 0 in a NON-differential lossless frame is invalid
    d2 = bytearray(J.encode_jpeg_lossless(img, 1))
    j = bytes(d2).index(b"\xff\xda")
    ln = int.from_bytes(d2[j + 2:j + 4], "big")
    d2[j + 2 + ln - 3] = 0                 # Ss (predictor) -> 0
    with pytest.raises(ValueError, match="differential-frame-only"):
        J.decode_jpeg(bytes(d2))


def test_dqt_between_frames_does_not_retroact():
    """B.2.4.1: a DQT redefinition applies to subsequent scans only.
    The hierarchical fold dequantizes a frame at the NEXT SOF/EOI, so
    it must use the table snapshotted at the frame's own scans — a
    hostile DQT inserted after the first frame's scan must not change
    the decode (r9 review finding, verified failing before the fix)."""
    img = _gray((16, 16), 13)
    d = J.encode_jpeg_hierarchical(img, 90, 2)
    base = J.decode_jpeg(d)
    # inject DQT(tid=0, all 255) after the LAST frame's entropy data
    # (before EOI): no subsequent scan uses it, so the decode must not
    # change — yet the final fold happens at EOI, after the DQT parsed
    hostile = (b"\xff\xdb" + (2 + 65).to_bytes(2, "big") + b"\x00"
               + b"\xff" * 64)
    i = d.rindex(b"\xff\xd9")
    mangled = d[:i] + hostile + d[i:]
    np.testing.assert_array_equal(J.decode_jpeg(mangled), base)


# ---- arithmetic differential frames (SOF13/14/15, r11) --------------
#
# The r10 seam: no third-party encoder anywhere emits Annex-J frames
# with arithmetic coding, so these were NotImplementedError until the
# in-repo arith scan encoders (`_enc_arith_sequential` etc.) composed
# the existing QM coder (oracle-pinned by libjpeg SOF9/10 streams,
# tests/test_jpeg_arith.py) with the existing hierarchical structure.
# The entropy layer is lossless, so each arith stream must decode to
# EXACTLY the pixels of its Huffman twin — the same twin-equality pin
# the progressive/sequential and SOF11 paths use.


def test_sof13_sequential_differential_equals_huffman_twin():
    for seed, shape in ((3, (37, 53)), (4, (16, 16))):
        img = _gray(shape, seed)
        dh = J.encode_jpeg_hierarchical(img, 90, levels=3)
        da = J.encode_jpeg_hierarchical(img, 90, levels=3, arith=True)
        ms = _markers(da)
        assert ms.count(0xC9) == 1              # arith initial frame
        assert ms.count(0xCD) == 2              # arith differential x2
        assert 0xC4 not in ms and 0xCC in ms    # DAC, no DHT
        np.testing.assert_array_equal(J.decode_jpeg(da),
                                      J.decode_jpeg(dh))


def test_sof13_rgb_equals_huffman_twin():
    g = _gray((24, 31), 9)
    img = np.stack([g, np.roll(g, 3, 0), np.roll(g, 5, 1)], axis=2)
    dh = J.encode_jpeg_hierarchical(img, 85, levels=2)
    da = J.encode_jpeg_hierarchical(img, 85, levels=2, arith=True)
    assert 0xCD in _markers(da)
    np.testing.assert_array_equal(J.decode_jpeg(da), J.decode_jpeg(dh))


def test_sof14_progressive_differential_equals_huffman_twin():
    img = _gray((33, 41), 5)
    dh = J.encode_jpeg_hierarchical(img, 90, levels=2, progressive=True)
    da = J.encode_jpeg_hierarchical(img, 90, levels=2, progressive=True,
                                    arith=True)
    ms = _markers(da)
    assert ms.count(0xCA) == 1                  # arith progressive init
    assert ms.count(0xCE) == 1                  # arith prog differential
    np.testing.assert_array_equal(J.decode_jpeg(da), J.decode_jpeg(dh))


def test_sof15_final_lossless_bit_exact():
    """SOF15 refinement reproduces the coded samples exactly (gray:
    bit-exact against the input image), like the SOF7 twin."""
    img = _gray((29, 35), 11)
    da = J.encode_jpeg_hierarchical(img, 80, levels=2,
                                    final_lossless=True, arith=True)
    ms = _markers(da)
    assert ms.count(0xCF) == 1
    np.testing.assert_array_equal(J.decode_jpeg(da), img)


def test_sof15_rgb_matches_huffman_final_lossless():
    g = _gray((18, 22), 12)
    img = np.stack([g, np.roll(g, 2, 0), np.roll(g, 4, 1)], axis=2)
    dh = J.encode_jpeg_hierarchical(img, 80, levels=2,
                                    final_lossless=True)
    da = J.encode_jpeg_hierarchical(img, 80, levels=2,
                                    final_lossless=True, arith=True)
    np.testing.assert_array_equal(J.decode_jpeg(da), J.decode_jpeg(dh))


def test_arith_differential_outside_hierarchy_rejected():
    """A SOF13/14/15 frame without DHP must still be rejected — the
    differential guard applies to the arithmetic types identically."""
    img = _gray((16, 16), 6)
    d = bytearray(J.encode_jpeg_hierarchical(img, 85, levels=1,
                                             final_lossless=True,
                                             arith=True))
    # levels=1: one SOF9 frame + SOF15 refinement; strip the DHP
    i = bytes(d).index(b"\xff\xde")
    ln = int.from_bytes(d[i + 2:i + 4], "big")
    del d[i:i + 2 + ln]
    with pytest.raises(ValueError, match="missing DHP"):
        J.decode_jpeg(bytes(d))
