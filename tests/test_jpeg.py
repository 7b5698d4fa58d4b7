"""Round-trip tests for the pure-NumPy JPEG codec (baseline +
progressive).

The codec is self-contained (stdlib + NumPy), so correctness is pinned
by encode->decode round trips at several shapes/modes: the decoder
exercises real Huffman streams, MCU interleave, subsampled chroma,
restart markers, and the quantization/IDCT pipeline end-to-end. The
progressive tests pin BIT-equality against the baseline decode — the
scan script (DC/AC first + refinement, EOB runs, ZRL interleaving)
reconstructs the identical quantized coefficients by construction.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cross_modal_multivector_search_spark.functions import jpeg
from cross_modal_multivector_search_spark.operators import multimodal


def _smooth_rgb(h: int, w: int, seed: int = 7) -> np.ndarray:
    """Low-frequency test image: quantization error stays small."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 90 * np.sin(2 * np.pi * xx / w)
    g = 128 + 90 * np.cos(2 * np.pi * yy / h)
    b = 128 + 60 * np.sin(2 * np.pi * (xx + yy) / (h + w))
    return np.clip(np.round(np.stack([r, g, b], -1)), 0, 255) \
        .astype(np.uint8)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_gray_roundtrip_nonmultiple_of_8():
    img = (_smooth_rgb(41, 57)[:, :, 0]).copy()
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert _psnr(img, out) > 40


def test_rgb_444_roundtrip():
    img = _smooth_rgb(48, 64)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert _psnr(img, out) > 35


def test_rgb_420_roundtrip_odd_dims():
    img = _smooth_rgb(33, 50)
    out = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=90, subsampling="4:2:0"))
    assert out.shape == img.shape
    assert _psnr(img, out) > 30


def test_flat_image_near_exact():
    img = np.full((24, 24, 3), 77, dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75))
    assert int(np.abs(out.astype(int) - 77).max()) <= 2


def test_restart_interval_identical_pixels():
    img = _smooth_rgb(40, 40)
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
    with_ri = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=85, restart_interval=3))
    # restart markers change the byte stream, not the coefficients
    assert np.array_equal(plain, with_ri)


def test_missing_trailing_eoi_still_decodes():
    """A complete scan whose trailing EOI marker was truncated — a
    common real-world corruption — must decode to the same pixels, not
    raise (ADVICE r5). A payload truncated MID-scan must still fail."""
    img = _smooth_rgb(32, 40)
    payload = jpeg.encode_jpeg(img, quality=90)
    assert payload[-2:] == b"\xff\xd9"
    full = jpeg.decode_jpeg(payload)
    clipped = jpeg.decode_jpeg(payload[:-2])
    assert np.array_equal(full, clipped)
    # also via the dispatcher (it re-raises ValueError unrouted)
    assert np.array_equal(multimodal.decode_image(payload[:-2]), full)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(payload[: len(payload) // 3])


def test_quality_monotonic():
    img = _smooth_rgb(48, 48)
    p_lo = _psnr(img, jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=30)))
    p_hi = _psnr(img, jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95)))
    assert p_hi > p_lo


def test_bare_differential_frames_rejected():
    """Every differential frame type — Huffman SOF5 AND (since r11)
    the in-repo-decoded arithmetic SOF13 — is malformed outside a
    hierarchical (DHP) sequence and must say so, not decode
    garbage."""
    img = _smooth_rgb(16, 16)
    data = bytearray(jpeg.encode_jpeg(img))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xCD                      # SOF13: arith differential
    with pytest.raises(ValueError, match="missing DHP"):
        jpeg.decode_jpeg(bytes(data))
    data[i + 1] = 0xC5                      # differential without DHP
    with pytest.raises(ValueError, match="missing DHP"):
        jpeg.decode_jpeg(bytes(data))


def test_progressive_roundtrip_matches_baseline():
    """The progressive scan script reconstructs the SAME quantized
    coefficients as the sequential encoding, so progressive decode must
    be bit-identical to baseline decode at the same quality."""
    rng = np.random.default_rng(3)
    for shape, sub in [((17, 23, 3), "4:4:4"), ((40, 56, 3), "4:2:0"),
                       ((33, 41, 3), "4:2:0"), ((16, 24), "4:4:4")]:
        base = np.linspace(0, 255, num=int(np.prod(shape))).reshape(shape)
        img = np.clip(base + rng.integers(-20, 20, shape), 0,
                      255).astype(np.uint8)
        for q in (85, 50):
            seq = jpeg.decode_jpeg(jpeg.encode_jpeg(
                img, quality=q, subsampling=sub))
            prog = jpeg.decode_jpeg(jpeg.encode_jpeg(
                img, quality=q, subsampling=sub, progressive=True))
            assert np.array_equal(seq, prog), (shape, sub, q)


def test_progressive_flat_image_long_eob_runs():
    """A near-flat image makes every AC block empty: the encoder emits
    batched EOBn runs (r > 0, the appended-bits path) and the decoder's
    eobrun fast path must skip whole blocks in both AC scan types."""
    img = np.full((64, 64), 128, dtype=np.uint8)
    img[0, 0] = 140                         # one non-flat corner block
    seq = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85,
                                             progressive=True))
    assert np.array_equal(seq, prog)


def test_progressive_sparse_highfreq_exercises_zrl_paths():
    """Isolated saturated pixels produce large sparse AC coefficients:
    long zero runs inside blocks force ZRL symbols in both the AC first
    scan and (with already-significant neighbors) the refinement scan's
    correction-bit interleaving."""
    rng = np.random.default_rng(11)
    img = np.full((48, 48, 3), 127, dtype=np.uint8)
    xs = rng.integers(0, 48, 40)
    ys = rng.integers(0, 48, 40)
    img[ys, xs] = rng.integers(0, 256, (40, 3))
    for q in (92, 40):
        seq = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q))
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q,
                                                 progressive=True))
        assert np.array_equal(seq, prog)


def test_progressive_rejects_restart_interval():
    with pytest.raises(ValueError, match="restart_interval"):
        jpeg.encode_jpeg(_smooth_rgb(16, 16), progressive=True,
                         restart_interval=4)


def test_decode_image_dispatches_progressive():
    img = _smooth_rgb(24, 24)
    payload = jpeg.encode_jpeg(img, quality=95, progressive=True)
    out = multimodal.decode_image(payload)
    assert out.shape == img.shape
    assert _psnr(img, out) > 35


def test_malformed_raises_value_error():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"not a jpeg at all")


def test_decode_image_dispatches_to_pure_codec():
    """operators.multimodal.decode_image handles baseline JPEG
    in-container now — no PIL/cv2 needed."""
    img = _smooth_rgb(32, 32)
    out = multimodal.decode_image(jpeg.encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert _psnr(img, out) > 35


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40),
       color=st.booleans(), sub420=st.booleans(),
       base=st.integers(20, 235))
def test_roundtrip_shape_and_error_invariants(h, w, color, sub420, base):
    """Any dimensions (including < 8: pure padding/crop territory) must
    round-trip with the exact input shape and, for near-flat content,
    tightly bounded pixel error."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    grad = (yy + xx) / max(h + w - 2, 1) * 16 - 8     # gentle ramp
    if color:
        img = np.clip(np.round(
            np.stack([base + grad, base - grad, base + 0.5 * grad], -1)),
            0, 255).astype(np.uint8)
        sub = "4:2:0" if sub420 else "4:4:4"
    else:
        img = np.clip(np.round(base + grad), 0, 255).astype(np.uint8)
        sub = "4:4:4"
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=92,
                                            subsampling=sub))
    assert out.shape == img.shape and out.dtype == np.uint8
    # smooth, low-amplitude content: error stays within a few levels
    # (4:2:0 chroma averaging adds a little on the color channels)
    tol = 14 if (color and sub == "4:2:0") else 8
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= tol


@settings(max_examples=15, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40),
       color=st.booleans(), sub420=st.booleans(), seed=st.integers(0, 99))
def test_progressive_equals_baseline_property(h, w, color, sub420, seed):
    """Property form of the bit-equality invariant: for ANY dims (incl.
    < 8), color mode, and subsampling, progressive decode == baseline
    decode at the same quality."""
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    sub = "4:2:0" if (color and sub420) else "4:4:4"
    seq = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75,
                                            subsampling=sub))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75,
                                             subsampling=sub,
                                             progressive=True))
    assert np.array_equal(seq, prog)


# ----------------------------------------------------- 12-bit precision


def test_12bit_roundtrip_gray_and_color():
    """precision=12 round trip: uint16 output, errors bounded at the
    x16-scaled-quantizer equivalent of the 8-bit case (PSNR computed
    against the 4095 peak)."""
    xx, yy = np.meshgrid(np.arange(48), np.arange(40))
    gray = np.clip(2000 + 600 * np.sin(xx / 6.0)
                   + 500 * np.cos(yy / 8.0), 0, 4095).astype(np.uint16)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(gray, quality=95,
                                            precision=12))
    assert out.dtype == np.uint16 and out.shape == gray.shape
    mse = float(np.mean((out.astype(np.float64) - gray) ** 2))
    assert 10 * np.log10(4095.0 ** 2 / mse) > 40
    col = np.stack([gray, np.roll(gray, 3, axis=1) // 2,
                    (4095 - gray)], axis=-1).astype(np.uint16)
    outc = jpeg.decode_jpeg(jpeg.encode_jpeg(col, quality=90,
                                             precision=12))
    assert outc.dtype == np.uint16 and outc.shape == col.shape
    msec = float(np.mean((outc.astype(np.float64) - col) ** 2))
    assert 10 * np.log10(4095.0 ** 2 / msec) > 35
    # the stream is an extended-sequential SOF1 frame with Pq=1 DQTs
    enc = jpeg.encode_jpeg(gray, quality=95, precision=12)
    assert b"\xff\xc1" in enc and b"\xff\xc0" not in enc
    dqt_off = enc.index(b"\xff\xdb") + 4
    assert enc[dqt_off] >> 4 == 1


def test_12bit_progressive_equals_sequential():
    """The progressive scan script reconstructs the same quantized
    coefficients at 12-bit too: bit-identical decodes."""
    rng = np.random.default_rng(8)
    base = np.linspace(0, 4095, num=24 * 40 * 3).reshape(24, 40, 3)
    img = np.clip(base + rng.integers(-300, 300, (24, 40, 3)), 0,
                  4095).astype(np.uint16)
    seq = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85,
                                            precision=12))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85,
                                             precision=12,
                                             progressive=True))
    assert np.array_equal(seq, prog)


def test_12bit_flat_near_exact():
    img = np.full((16, 16), 3000, dtype=np.uint16)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75,
                                            precision=12))
    assert int(np.abs(out.astype(int) - 3000).max()) <= 32


def test_12bit_handassembled_dc_only_stream():
    """A hand-assembled single-block 12-bit SOF1 stream, independent of
    the in-repo encoder: Pq=1 DQT with q[0]=4, a one-code DC Huffman
    table (code '0' -> category 10), entropy data coding DC diff +800.
    Dequantized DC = 3200, IDCT of a DC-only block adds 3200/8 = 400 to
    the 2048 level shift: every sample must be exactly 2448."""
    def seg(m, body):
        return bytes((0xFF, m)) + (len(body) + 2).to_bytes(2, "big") + body

    qtbl = np.ones(64, dtype=">u2")
    qtbl[0] = 4
    dqt = seg(0xDB, b"\x10" + qtbl.tobytes())
    bits = [0] * 16
    bits[0] = 1                       # one code, length 1
    dht = seg(0xC4, bytes([0x00] + bits + [10]))     # value: category 10
    dht += seg(0xC4, bytes([0x10] + bits + [0x00]))  # AC: '0' -> EOB
    sof = seg(0xC1, bytes([12, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # entropy bits: DC code '0', 10 magnitude bits of +800
    # (0b1100100000), AC EOB code '0', padded with 1s -> 0x64 0x0F
    payload = (b"\xff\xd8" + dqt + dht + sof + sos + b"\x64\x0f"
               + b"\xff\xd9")
    out = jpeg.decode_jpeg(payload)
    assert out.dtype == np.uint16 and out.shape == (8, 8)
    assert (out == 2448).all()


def test_12bit_rejects_wrong_inputs():
    img8 = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="uint16"):
        jpeg.encode_jpeg(img8, precision=12)
    with pytest.raises(ValueError, match="precision"):
        jpeg.encode_jpeg(img8, precision=10)
    img16 = np.full((8, 8), 5000, dtype=np.uint16)
    with pytest.raises(ValueError, match="4095"):
        jpeg.encode_jpeg(img16, precision=12)
    # 12-bit in a BASELINE SOF0 frame is malformed (T.81 Table B.2)
    good = bytearray(jpeg.encode_jpeg(
        np.full((8, 8), 100, dtype=np.uint16) * 10, precision=12))
    i = bytes(good).find(b"\xff\xc1")
    good[i + 1] = 0xC0
    good[i + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit"):
        jpeg.decode_jpeg(bytes(good))
