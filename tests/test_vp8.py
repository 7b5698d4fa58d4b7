"""Bit-exact oracle tests for the pure-NumPy VP8 keyframe decoder.

The container's libwebp (a third-party reference codec, loaded via
ctypes) is used ONLY as a test oracle: it encodes fixture images into
lossy VP8 streams with controlled settings (quality, segmentation,
simple/normal loop filter, sharpness, token partitions, alpha) and its
decoder's YUV reconstruction is compared bit-for-bit against
``functions/vp8.py``. This is the same third-party-fixture standard
tests/test_external_fixtures.py applies to the other codecs: nothing
here round-trips the repo's own encoder.

Reference parity anchor: the reference's data prep decodes real
media before embedding (reference prepare_for_clip_webvid.py:1-54).
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from cross_modal_multivector_search_spark.functions import vp8

_LIBPATH = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"


def _load_lib():
    import ctypes.util
    try:
        return ctypes.CDLL(_LIBPATH)
    except OSError:
        name = ctypes.util.find_library("webp")
        if name:
            try:
                return ctypes.CDLL(name)
            except OSError:
                pass
    return None


LIB = _load_lib()
pytestmark = pytest.mark.skipif(
    LIB is None, reason="libwebp oracle not available in this container")


# ------------------------------------------------- ctypes oracle rig

class _Config(ctypes.Structure):
    _fields_ = [("lossless", ctypes.c_int), ("quality", ctypes.c_float),
                ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
                ("target_size", ctypes.c_int),
                ("target_PSNR", ctypes.c_float),
                ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
                ("filter_strength", ctypes.c_int),
                ("filter_sharpness", ctypes.c_int),
                ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
                ("alpha_compression", ctypes.c_int),
                ("alpha_filtering", ctypes.c_int),
                ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
                ("show_compressed", ctypes.c_int),
                ("preprocessing", ctypes.c_int),
                ("partitions", ctypes.c_int),
                ("partition_limit", ctypes.c_int),
                ("emulate_jpeg_size", ctypes.c_int),
                ("thread_level", ctypes.c_int),
                ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
                ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
                ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
                ("qmax", ctypes.c_int), ("tail", ctypes.c_uint8 * 64)]


_WriterFn = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                             ctypes.c_size_t, ctypes.c_void_p)


class _Picture(ctypes.Structure):
    _fields_ = [("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
                ("width", ctypes.c_int), ("height", ctypes.c_int),
                ("y", ctypes.c_void_p), ("u", ctypes.c_void_p),
                ("v", ctypes.c_void_p),
                ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
                ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
                ("pad1", ctypes.c_uint32 * 2),
                ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
                ("pad2", ctypes.c_uint32 * 3),
                ("writer", _WriterFn), ("custom_ptr", ctypes.c_void_p),
                ("extra_info_type", ctypes.c_int),
                ("extra_info", ctypes.c_void_p),
                ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
                ("progress_hook", ctypes.c_void_p),
                ("user_data", ctypes.c_void_p),
                ("pad3", ctypes.c_uint32 * 3),
                ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
                ("pad6", ctypes.c_uint32 * 8),
                ("memory_", ctypes.c_void_p),
                ("memory_argb_", ctypes.c_void_p),
                ("pad7", ctypes.c_void_p * 2),
                ("tail", ctypes.c_uint8 * 256)]


class _Features(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int), ("height", ctypes.c_int),
                ("has_alpha", ctypes.c_int), ("has_animation", ctypes.c_int),
                ("format", ctypes.c_int), ("pad", ctypes.c_uint32 * 5)]


class _YUVA(ctypes.Structure):
    _fields_ = [("y", ctypes.POINTER(ctypes.c_uint8)),
                ("u", ctypes.POINTER(ctypes.c_uint8)),
                ("v", ctypes.POINTER(ctypes.c_uint8)),
                ("a", ctypes.POINTER(ctypes.c_uint8)),
                ("y_stride", ctypes.c_int), ("u_stride", ctypes.c_int),
                ("v_stride", ctypes.c_int), ("a_stride", ctypes.c_int),
                ("y_size", ctypes.c_size_t), ("u_size", ctypes.c_size_t),
                ("v_size", ctypes.c_size_t), ("a_size", ctypes.c_size_t)]


class _RGBA(ctypes.Structure):
    _fields_ = [("rgba", ctypes.POINTER(ctypes.c_uint8)),
                ("stride", ctypes.c_int), ("size", ctypes.c_size_t)]


class _BufUnion(ctypes.Union):
    _fields_ = [("RGBA", _RGBA), ("YUVA", _YUVA)]


class _DecBuffer(ctypes.Structure):
    _fields_ = [("colorspace", ctypes.c_int), ("width", ctypes.c_int),
                ("height", ctypes.c_int),
                ("is_external_memory", ctypes.c_int),
                ("u", _BufUnion), ("pad", ctypes.c_uint32 * 4),
                ("private_memory", ctypes.POINTER(ctypes.c_uint8))]


class _DecOptions(ctypes.Structure):
    _fields_ = [("bypass_filtering", ctypes.c_int),
                ("no_fancy_upsampling", ctypes.c_int),
                ("use_cropping", ctypes.c_int), ("crop_left", ctypes.c_int),
                ("crop_top", ctypes.c_int), ("crop_width", ctypes.c_int),
                ("crop_height", ctypes.c_int), ("use_scaling", ctypes.c_int),
                ("scaled_width", ctypes.c_int),
                ("scaled_height", ctypes.c_int),
                ("use_threads", ctypes.c_int),
                ("dithering_strength", ctypes.c_int),
                ("flip", ctypes.c_int),
                ("alpha_dithering_strength", ctypes.c_int),
                ("pad", ctypes.c_uint32 * 5)]


class _DecConfig(ctypes.Structure):
    _fields_ = [("input", _Features), ("output", _DecBuffer),
                ("options", _DecOptions)]


def _enc_abi():
    for abi in (0x020F, 0x020E, 0x0210, 0x020D, 0x020C):
        cfg = _Config()
        if LIB.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(75.0), abi):
            return abi
    pytest.skip("no libwebp encoder ABI matched")


def _dec_abi():
    for abi in (0x0209, 0x0208, 0x020A, 0x0207):
        cfg = _DecConfig()
        if LIB.WebPInitDecoderConfigInternal(ctypes.byref(cfg), abi):
            return abi
    pytest.skip("no libwebp decoder ABI matched")


_STATE: dict = {}


def _encode(img: np.ndarray, quality: float = 75.0, **cfg_over) -> bytes:
    """Encode uint8 RGB/RGBA via libwebp's advanced API -> .webp bytes."""
    if "abi" not in _STATE:
        _STATE["abi"] = _enc_abi()
        _STATE["buf"] = ctypes.create_string_buffer(1 << 22)
        _STATE["len"] = [0]

        def _write(data, size, _pic):
            ctypes.memmove(ctypes.byref(_STATE["buf"], _STATE["len"][0]),
                           data, size)
            _STATE["len"][0] += size
            return 1

        _STATE["writer"] = _WriterFn(_write)
    h, w = img.shape[:2]
    cfg = _Config()
    assert LIB.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(quality),
                                      _STATE["abi"])
    for k, v in cfg_over.items():
        setattr(cfg, k, v)
    assert LIB.WebPValidateConfig(ctypes.byref(cfg)), cfg_over
    pic = _Picture()
    assert LIB.WebPPictureInitInternal(ctypes.byref(pic), _STATE["abi"])
    pic.width, pic.height, pic.use_argb = w, h, 0
    buf = np.ascontiguousarray(img)
    ptr = buf.ctypes.data_as(ctypes.c_void_p)
    if img.shape[2] == 3:
        assert LIB.WebPPictureImportRGB(ctypes.byref(pic), ptr, w * 3)
    else:
        assert LIB.WebPPictureImportRGBA(ctypes.byref(pic), ptr, w * 4)
    _STATE["len"][0] = 0
    pic.writer = _STATE["writer"]
    pic.custom_ptr = None
    ok = LIB.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    err = int(pic.error_code)
    LIB.WebPPictureFree(ctypes.byref(pic))
    assert ok, f"libwebp encode failed ({err}) for {cfg_over}"
    return _STATE["buf"].raw[:_STATE["len"][0]]


def _oracle_yuva(data: bytes):
    """libwebp reconstruction (loop filter on) as YUV(+A) planes."""
    cfg = _DecConfig()
    assert LIB.WebPInitDecoderConfigInternal(ctypes.byref(cfg), _dec_abi())
    cfg.output.colorspace = 12                       # MODE_YUVA
    assert LIB.WebPDecode(data, len(data), ctypes.byref(cfg)) == 0
    yb = cfg.output.u.YUVA
    H, W = cfg.output.height, cfg.output.width
    ch, cw = (H + 1) // 2, (W + 1) // 2

    def grab(ptr, stride, rows, cols):
        raw = ctypes.string_at(ptr, stride * rows)
        return np.frombuffer(raw, np.uint8).reshape(rows,
                                                    stride)[:, :cols].copy()

    y = grab(yb.y, yb.y_stride, H, W)
    u = grab(yb.u, yb.u_stride, ch, cw)
    v = grab(yb.v, yb.v_stride, ch, cw)
    a = grab(yb.a, yb.a_stride, H, W) if yb.a else None
    LIB.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return y, u, v, a


def _vp8_payload(data: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if tag == b"VP8 ":
            return data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk in oracle output")


def _img(w, h, seed=7, kind="mixed"):
    rng = np.random.default_rng(seed)
    gy, gx = np.mgrid[0:h, 0:w]
    if kind == "noise":
        return rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    if kind == "flat":
        out = np.full((h, w, 3), 200, np.uint8)
        out[h // 2:, :] = 31
        return out
    base = (gx * 3 + gy * 2) % 256
    block = rng.integers(0, 60, (h // 4 + 1, w // 4 + 1, 3))
    block = np.kron(block, np.ones((4, 4, 1)))[:h, :w]
    return np.clip(base[..., None] + block, 0, 255).astype(np.uint8)


def _assert_bitexact(data: bytes):
    ey, eu, ev, _ = _oracle_yuva(data)
    y, u, v = vp8.decode_vp8_frame(_vp8_payload(data))
    np.testing.assert_array_equal(ey, y)
    np.testing.assert_array_equal(eu, u)
    np.testing.assert_array_equal(ev, v)


# ------------------------------------------------------------- tests


@pytest.mark.parametrize("w,h", [(16, 16), (33, 31), (64, 48), (80, 96)])
@pytest.mark.parametrize("q", [20.0, 75.0, 95.0])
def test_default_encodes_bitexact(w, h, q):
    """All reconstruction paths at default settings: intra modes, token
    contexts, Y2/IWHT, normal loop filter, odd dimensions."""
    _assert_bitexact(_encode(_img(w, h, seed=w * h + int(q)), q))


def test_noise_and_flat_content_bitexact():
    """Noise maxes out token categories; flat content maxes out skips."""
    _assert_bitexact(_encode(_img(64, 64, 3, "noise"), 90.0))
    _assert_bitexact(_encode(_img(64, 64, 4, "flat"), 50.0))


def test_segmentation_bitexact():
    """Per-segment quantizers + segment-id tree decode (§9.3, §10)."""
    img = np.zeros((96, 80, 3), np.uint8)
    img[:48] = 200
    img[48:] = _img(80, 48, 5, "noise")
    data = _encode(img, 60.0, sns_strength=100, segments=4)
    h, _, _ = vp8._parse_header(_vp8_payload(data))
    assert h.seg_enabled, "oracle did not segment; test needs new content"
    _assert_bitexact(data)


@pytest.mark.parametrize("parts", [1, 2, 3])
def test_multi_partition_bitexact(parts):
    """Token partition interleave: row i reads partition i%n (§9.5)."""
    data = _encode(_img(80, 96, 11), 60.0, low_memory=1, partitions=parts)
    _, _, n = vp8._parse_header(_vp8_payload(data))
    assert n == 1 << parts
    _assert_bitexact(data)


def test_simple_filter_and_sharpness_bitexact():
    """filter_type=0 selects the simple (luma-only) loop filter;
    sharpness reshapes the interior limit (§15.1-15.2)."""
    img = _img(64, 48, 13)
    d1 = _encode(img, 40.0, filter_type=0, filter_strength=80)
    h1, _, _ = vp8._parse_header(_vp8_payload(d1))
    assert h1.filter_simple and h1.filter_level > 0
    _assert_bitexact(d1)
    d2 = _encode(img, 40.0, filter_sharpness=5, filter_strength=90)
    h2, _, _ = vp8._parse_header(_vp8_payload(d2))
    assert h2.sharpness == 5
    _assert_bitexact(d2)
    d3 = _encode(img, 40.0, filter_strength=0)
    h3, _, _ = vp8._parse_header(_vp8_payload(d3))
    assert h3.filter_level == 0
    _assert_bitexact(d3)


def test_alpha_plane_bitexact_and_rgba_shape():
    """RGBA encode -> VP8X container with ALPH chunk: the alpha plane
    (VP8L-compressed, filtered) must match libwebp exactly and
    decode_webp must emit RGBA."""
    from cross_modal_multivector_search_spark.functions import webp as W
    rng = np.random.default_rng(17)
    img = _img(48, 32, 9)
    alpha = np.clip(rng.integers(0, 300, (32, 48)), 0, 255).astype(np.uint8)
    rgba = np.dstack([img, alpha])
    data = _encode(rgba, 75.0)
    ey, eu, ev, ea = _oracle_yuva(data)
    assert ea is not None
    y, u, v = vp8.decode_vp8_frame(_vp8_payload(data))
    np.testing.assert_array_equal(ey, y)
    np.testing.assert_array_equal(eu, u)
    np.testing.assert_array_equal(ev, v)
    out = W.decode_webp(data)
    assert out.shape == (32, 48, 4)
    np.testing.assert_array_equal(ea, out[:, :, 3])


@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_alpha_filter_methods_bitexact(filt):
    """All four ALPH prediction filters (none/horizontal/vertical/
    gradient) against libwebp's own plane."""
    from cross_modal_multivector_search_spark.functions import webp as W
    rng = np.random.default_rng(100 + filt)
    img = _img(32, 32, filt)
    grad = np.linspace(10, 240, 32).astype(np.uint8)
    alpha = np.minimum.outer(grad, grad) + rng.integers(0, 8, (32, 32))
    rgba = np.dstack([img, np.clip(alpha, 0, 255).astype(np.uint8)])
    data = _encode(rgba, 75.0, alpha_filtering=filt if filt < 3 else 2,
                   alpha_quality=50 if filt == 0 else 100,
                   alpha_compression=0 if filt == 0 else 1)
    _, _, _, ea = _oracle_yuva(data)
    out = W.decode_webp(data)
    assert out.shape[2] == 4
    np.testing.assert_array_equal(ea, out[:, :, 3])


def test_grayscale_rgb_matches_oracle_within_one():
    """Flat chroma makes the fancy upsampler constant, so the RGB
    output isolates the fixed-point YUV->RGB conversion."""
    from cross_modal_multivector_search_spark.functions import webp as W
    gray = np.repeat(_img(48, 48, 21)[:, :, :1], 3, axis=2)
    data = _encode(gray, 80.0)
    # oracle RGB
    wq = ctypes.c_int()
    hq = ctypes.c_int()
    LIB.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    ptr = LIB.WebPDecodeRGB(data, len(data), ctypes.byref(wq),
                            ctypes.byref(hq))
    exp = np.frombuffer(ctypes.string_at(ptr, wq.value * hq.value * 3),
                        np.uint8).reshape(hq.value, wq.value, 3).copy()
    LIB.WebPFree(ptr)
    out = W.decode_webp(data)
    assert int(np.abs(out.astype(int) - exp.astype(int)).max()) <= 1


def test_interframe_and_garbage_raise():
    data = _encode(_img(16, 16), 75.0)
    payload = bytearray(_vp8_payload(data))
    payload[0] |= 1                              # frame_type -> interframe
    with pytest.raises(NotImplementedError, match="interframe"):
        vp8.decode_vp8_frame(bytes(payload))
    bad = bytearray(_vp8_payload(data))
    bad[3] = 0x00                                # break start code
    with pytest.raises(ValueError, match="start code"):
        vp8.decode_vp8_frame(bytes(bad))
    with pytest.raises(ValueError, match="too short"):
        vp8.decode_vp8_frame(b"\x00\x01")


def test_truncated_stream_decodes_without_crash():
    """The bool decoder reads past-end bytes as zero (spec behavior);
    a truncated stream must not raise IndexError."""
    data = _vp8_payload(_encode(_img(32, 32, 2), 75.0))
    cut = vp8.decode_vp8_frame(data[:len(data) * 2 // 3])
    assert cut[0].shape == (32, 32)


def test_lossy_frame_inside_animation():
    """An ANMF frame whose data is a lossy still (optional ALPH + VP8)
    must decode through the animation path to exactly the pixels the
    standalone still decodes to — cross-checking the ANMF chunk-walk
    against the libwebp-encoded (not in-repo-encoded) payload."""
    import struct

    from cross_modal_multivector_search_spark.functions import webp

    rng = np.random.default_rng(41)
    img = np.clip(rng.normal(128, 40, (16, 16, 3)), 0,
                  255).astype(np.uint8)
    still = _encode(img, quality=80.0)
    # the standalone still (already pinned vs libwebp elsewhere)
    still_px = webp.decode_webp(still)
    if still_px.shape[2] == 3:
        still_px = np.dstack([still_px,
                              np.full((16, 16), 255, np.uint8)])
    # strip RIFF/WEBP and re-wrap the image chunks as one ANMF frame
    frame_data = still[12:]

    def chunk(tag, body):
        return (tag + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))

    head = (0).to_bytes(3, "little") * 2 \
        + (15).to_bytes(3, "little") + (15).to_bytes(3, "little") \
        + (40).to_bytes(3, "little") + bytes([0x02])   # no blend
    vp8x = bytes([0x12, 0, 0, 0]) + (15).to_bytes(3, "little") \
        + (15).to_bytes(3, "little")
    anim = bytes([0, 0, 0, 0]) + (0).to_bytes(2, "little")
    body = b"WEBP" + chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim) \
        + chunk(b"ANMF", head + frame_data)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    frames = webp.decode_webp_frames(payload)
    assert len(frames) == 1 and frames[0][:2] == (0, 40)
    assert np.array_equal(frames[0][2], still_px)
