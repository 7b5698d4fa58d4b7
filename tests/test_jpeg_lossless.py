"""Lossless JPEG (SOF3, T.81 Annex H): prediction + Huffman difference
coding, no DCT. The verification property is absolute: encode(decode)
must be BIT-EXACT for every predictor, precision, and shape — no
tolerance, no oracle needed (libjpeg62 never implemented Annex H
either, so the in-repo encoder twin is the only encoder available)."""

import numpy as np
import pytest

from cross_modal_multivector_search_spark.functions import jpeg as J


def _markers(d: bytes) -> list[int]:
    return [b for a, b in zip(d, d[1:]) if a == 0xFF and b not in (0, 0xFF)]


@pytest.mark.parametrize("pred", range(1, 8))
def test_exact_roundtrip_every_predictor(pred):
    rng = np.random.default_rng(pred)
    img = rng.integers(0, 256, (19, 23), dtype=np.uint8)
    d = J.encode_jpeg_lossless(img, predictor=pred)
    assert 0xC3 in _markers(d)
    np.testing.assert_array_equal(J.decode_jpeg(d), img)


def test_exact_roundtrip_rgb_and_gradient():
    rng = np.random.default_rng(42)
    rgb = rng.integers(0, 256, (12, 17, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(rgb, 4)), rgb)
    # smooth content: predictors make diffs tiny, still exact
    grad = np.add.outer(np.arange(30), np.arange(40)) % 256
    grad = grad.astype(np.uint8)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(grad, 7)), grad)


def test_exact_roundtrip_16bit():
    """P=16 exercises the full modulo-2^16 arithmetic incl. the
    SSSS=16 no-extra-bits escape (H.1.2.2)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, (9, 11)).astype(np.uint16)
    out = J.decode_jpeg(J.encode_jpeg_lossless(img, 7))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)
    # adversarial: alternating extremes force +-32768-class diffs
    ext = np.zeros((4, 8), dtype=np.uint16)
    ext[:, 1::2] = 65535
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(ext, 1)), ext)


def test_point_transform():
    """Pt > 0 codes samples at precision P-Pt; decode returns
    (x >> Pt) << Pt (A.4 point transform)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (10, 14), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_lossless(img, 2,
                                               point_transform=3))
    np.testing.assert_array_equal(out, (img >> 3) << 3)


def test_predictor_edges_literal():
    """H.1.2.1 edge rules, pinned directly: first sample = default,
    first row = Ra, first column = Rb, interior = selected."""
    plane = np.array([[10, 20], [30, 40]], dtype=np.int64)
    assert J._lossless_predict(plane, 0, 0, 4, 128) == 128
    assert J._lossless_predict(plane, 0, 1, 4, 128) == 10   # Ra
    assert J._lossless_predict(plane, 1, 0, 4, 128) == 10   # Rb
    # interior: Ra=left=30, Rb=above=20, Rc=above-left=10
    assert J._lossless_predict(plane, 1, 1, 4, 128) == 30 + 20 - 10
    assert J._lossless_predict(plane, 1, 1, 7, 128) == (30 + 20) >> 1
    with pytest.raises(ValueError, match="invalid lossless predictor"):
        J._lossless_predict(plane, 1, 1, 8, 128)


def test_arith_differential_frames_decode_but_need_hierarchy():
    """SOF13/14/15 decode in-repo since r11 (pinned by the hierarchical
    encoder twin, tests/test_jpeg_hier.py); outside a DHP sequence
    they are malformed differential frames and must be rejected like
    their Huffman siblings."""
    img = np.zeros((8, 8), dtype=np.uint8)
    d = bytearray(J.encode_jpeg_lossless(img, 1))
    i = bytes(d).index(b"\xff\xc3")
    for sof in (0xCD, 0xCE, 0xCF):
        d[i + 1] = sof
        with pytest.raises(ValueError, match="missing DHP"):
            J.decode_jpeg(bytes(d))


# ---- SOF11: arithmetic lossless (Annex D QM coder + H.2 model) ------


@pytest.mark.parametrize("pred", range(1, 8))
def test_arith_exact_roundtrip_every_predictor(pred):
    """The entropy-twin property for SOF11: the SAME pixels coded with
    Huffman (SOF3, oracle-pinned above) and with the QM coder must
    both decode bit-exactly — entropy coding is lossless, so any model
    or coder defect shows up as a pixel mismatch."""
    rng = np.random.default_rng(100 + pred)
    img = rng.integers(0, 256, (19, 23), dtype=np.uint8)
    d = J.encode_jpeg_lossless(img, predictor=pred, arith=True)
    assert 0xCB in _markers(d) and 0xCC in _markers(d)  # SOF11 + DAC
    assert 0xC4 not in _markers(d)                      # no DHT
    np.testing.assert_array_equal(J.decode_jpeg(d), img)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(img, predictor=pred)),
        J.decode_jpeg(d))


def test_arith_roundtrip_rgb_16bit_and_point_transform():
    rng = np.random.default_rng(77)
    rgb = rng.integers(0, 256, (12, 17, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(rgb, 4, arith=True)), rgb)
    img16 = rng.integers(0, 65536, (9, 11)).astype(np.uint16)
    out = J.decode_jpeg(J.encode_jpeg_lossless(img16, 7, arith=True))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img16)
    # alternating extremes force the +-32768 fold through the X15 bank
    ext = np.zeros((4, 8), dtype=np.uint16)
    ext[:, 1::2] = 65535
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(ext, 1, arith=True)), ext)
    img = rng.integers(0, 256, (10, 14), dtype=np.uint8)
    np.testing.assert_array_equal(
        J.decode_jpeg(J.encode_jpeg_lossless(img, 2, point_transform=3,
                                             arith=True)),
        (img >> 3) << 3)


def test_arith_nondefault_dac_conditioning():
    """A non-default (L, U) changes the H.2 classification thresholds
    on BOTH sides; the DAC segment must carry it to the decoder."""
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    for lu in ((1, 2), (2, 4), (0, 15)):
        d = J.encode_jpeg_lossless(img, 6, arith=True,
                                   dc_conditioning=lu)
        np.testing.assert_array_equal(J.decode_jpeg(d), img)


def test_arith_adapts_on_smooth_content():
    """Sanity that the QM state machine is genuinely adapting (not a
    degenerate self-consistent identity): smooth content must compress
    far below the Huffman twin (whose table floor is ~1 byte/sample)."""
    grad = np.add.outer(np.arange(30), np.arange(40)) % 256
    grad = grad.astype(np.uint8)
    da = J.encode_jpeg_lossless(grad, 7, arith=True)
    dh = J.encode_jpeg_lossless(grad, 7)
    np.testing.assert_array_equal(J.decode_jpeg(da), grad)
    assert len(da) < len(dh) // 2


def test_decode_image_dispatches_lossless():
    from cross_modal_multivector_search_spark.operators import (
        multimodal as M,
    )
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (8, 9), dtype=np.uint8)
    d = J.encode_jpeg_lossless(img, 5)
    np.testing.assert_array_equal(M.decode_image(d), img)


def test_hand_assembled_spec_literal_stream():
    """Decode-only pin independent of the encoder twin: a 2x2 gray
    lossless stream assembled byte-by-byte from the spec.

    Flat DHT: 17 symbols (categories 0..16) all at 5 bits -> canonical
    code of category k is k. Image [[100,102],[101,103]], predictor 1:
      (0,0) pred=default 128, diff=-28 -> cat 5, code -28+31=3
      (0,1) first line, Ra=100, diff=+2 -> cat 2, code 2
      (1,0) first column, Rb=100, diff=+1 -> cat 1, code 1
      (1,1) Ra=101, diff=+2 -> cat 2, code 2
    bits: 00101 00011 | 00010 10 | 00001 1 | 00010 10 + 11 padding
        = 0x28 0xC5 0x06 0x2B
    """
    dht = bytes([0xFF, 0xC4, 0x00, 0x24, 0x00]) \
        + bytes([0, 0, 0, 0, 17] + [0] * 11) + bytes(range(17))
    sof = bytes([0xFF, 0xC3, 0x00, 0x0B, 8, 0, 2, 0, 2, 1,
                 1, 0x11, 0])
    sos = bytes([0xFF, 0xDA, 0x00, 0x08, 1, 1, 0x00, 1, 0, 0])
    ent = bytes([0x28, 0xC5, 0x06, 0x2B])
    d = b"\xff\xd8" + dht + sof + sos + ent + b"\xff\xd9"
    np.testing.assert_array_equal(
        J.decode_jpeg(d),
        np.array([[100, 102], [101, 103]], dtype=np.uint8))
