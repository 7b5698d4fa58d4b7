"""Arithmetic-coded JPEG (SOF9/SOF10) decode, pinned via entropy-twin
equivalence.

Entropy coding is lossless over the quantized coefficients, so
encoding the SAME pixels with the SAME settings once with Huffman
coding and once with arithmetic coding must decode to IDENTICAL
pixels. The container's libjpeg (ctypes, third-party encoder — same
standard as the VP8 oracle in tests/test_vp8.py) produces both
streams; the repo's already-oracle-pinned Huffman decode is therefore
an exact pixel oracle for the arithmetic decode.

Covers: sequential SOF9 (gray/color, 4:2:0, odd dims, quality 10..95,
restart intervals) and progressive SOF10 (DC first/refine, AC
first/refine band scans, restarts), plus DAC conditioning parsing.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys

import numpy as np
import pytest

from cross_modal_multivector_search_spark.functions import jpeg as J

_LIBPATH = "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"


def _load():
    try:
        return ctypes.CDLL(_LIBPATH), ctypes.CDLL("libc.so.6")
    except OSError:
        return None, None


LIB, LIBC = _load()
pytestmark = pytest.mark.skipif(
    LIB is None, reason="libjpeg oracle not available in this container")

_STATE: dict = {}


def _structsize() -> int:
    """Probe sizeof(jpeg_compress_struct) in a sacrificial subprocess:
    jpeg_CreateCompress's size check error-exits with a message that
    names the library's expected size."""
    if "size" in _STATE:
        return _STATE["size"]
    code = (
        "import ctypes\n"
        f"lib = ctypes.CDLL({_LIBPATH!r})\n"
        "err = ctypes.create_string_buffer(1024)\n"
        "lib.jpeg_std_error.restype = ctypes.c_void_p\n"
        "e = lib.jpeg_std_error(err)\n"
        "buf = ctypes.create_string_buffer(8192)\n"
        "ctypes.memmove(buf, e.to_bytes(8, 'little'), 8)\n"
        "lib.jpeg_CreateCompress(buf, 62, 1)\n")
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True)
    import re
    m = re.search(r"library thinks size is (\d+)", r.stderr)
    if not m:
        pytest.skip(f"could not probe jpeg struct size: {r.stderr[-200:]}")
    _STATE["size"] = int(m.group(1))
    return _STATE["size"]


def _encode(img: np.ndarray, quality: int = 75, arith: bool = False,
            restart: int = 0, progressive: bool = False,
            optimize: bool = False) -> bytes:
    """uint8 (H,W) gray or (H,W,3) RGB -> JPEG bytes via libjpeg.
    Field offsets follow the libjpeg62 (v6b) ABI, self-validated by
    test_harness_offsets_sane before any parity assertion."""
    size = _structsize()
    h, w = img.shape[:2]
    gray = img.ndim == 2
    cin = ctypes.create_string_buffer(size + 64)
    LIB.jpeg_std_error.restype = ctypes.c_void_p
    eptr = LIB.jpeg_std_error(ctypes.create_string_buffer(1024))
    ctypes.memmove(cin, eptr.to_bytes(8, "little"), 8)
    LIB.jpeg_CreateCompress(cin, 62, size)
    out_ptr = ctypes.c_void_p()
    out_size = ctypes.c_ulong()
    LIB.jpeg_mem_dest(cin, ctypes.byref(out_ptr), ctypes.byref(out_size))

    def poke(off, val, typ=ctypes.c_int):
        ctypes.memmove(ctypes.byref(cin, off),
                       ctypes.byref(typ(val)), ctypes.sizeof(typ))

    poke(48, w, ctypes.c_uint)              # image_width
    poke(52, h, ctypes.c_uint)              # image_height
    poke(56, 1 if gray else 3)              # input_components
    poke(60, 1 if gray else 2)              # in_color_space (GRAY/RGB)
    LIB.jpeg_set_defaults(cin)
    LIB.jpeg_set_quality(cin, quality, 1)
    if arith:
        poke(260, 1)                        # arith_code
    if optimize:
        poke(264, 1)                        # optimize_coding
    if restart:
        poke(280, restart, ctypes.c_uint)   # restart_interval
    if progressive:
        LIB.jpeg_simple_progression(cin)
    LIB.jpeg_start_compress(cin, 1)
    row = np.ascontiguousarray(img.reshape(h, -1))
    ptrs = (ctypes.c_void_p * 1)()
    for y in range(h):
        ptrs[0] = row[y:y + 1].ctypes.data
        LIB.jpeg_write_scanlines(cin, ptrs, 1)
    LIB.jpeg_finish_compress(cin)
    data = ctypes.string_at(out_ptr, out_size.value)
    LIB.jpeg_destroy_compress(cin)
    LIBC.free(out_ptr)
    return data


def _markers(d: bytes) -> list[int]:
    return [b for a, b in zip(d, d[1:]) if a == 0xFF and b not in (0, 0xFF)]


def _img(shape, seed=0, smooth=False):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, shape).astype(np.uint8)
    if smooth:
        img = (img.astype(np.float32) + np.roll(img, 1, 0)
               + np.roll(img, 1, 1)) / 3
    return img.astype(np.uint8)


def test_harness_offsets_sane():
    """Self-validation of the ctypes field offsets: the Huffman encode
    must produce SOF0+DHT, decode with the repo decoder to the right
    shape, and flipping arith_code must switch the stream to SOF9+DAC
    with no DHT."""
    img = _img((16, 24, 3), 1)
    dh = _encode(img, 75)
    mh = _markers(dh)
    assert 0xC0 in mh and 0xC4 in mh and 0xC9 not in mh
    assert J.decode_jpeg(dh).shape == (16, 24, 3)
    da = _encode(img, 75, arith=True)
    ma = _markers(da)
    assert 0xC9 in ma and 0xCC in ma and 0xC4 not in ma


SEQ_CASES = [
    ("gray-flat", (8, 8), dict(), True),
    ("gray-noise", (64, 48), dict(), False),
    ("rgb-noise", (32, 24, 3), dict(), False),
    ("rgb-smooth", (40, 56, 3), dict(), True),
    ("rgb-q95", (24, 40, 3), dict(quality=95), False),
    ("rgb-q10", (24, 40, 3), dict(quality=10), False),
    ("gray-restart", (48, 64), dict(restart=2), False),
    ("rgb-restart", (48, 64, 3), dict(restart=1), False),
    ("rgb-odd", (17, 19, 3), dict(), False),
]


@pytest.mark.parametrize("name,shape,kw,smooth", SEQ_CASES,
                         ids=[c[0] for c in SEQ_CASES])
def test_sequential_arith_equals_huffman_twin(name, shape, kw, smooth):
    img = _img(shape, hash(name) & 0xFFFF, smooth)
    q = kw.get("quality", 75)
    r = kw.get("restart", 0)
    dh = _encode(img, q, arith=False, restart=r)
    da = _encode(img, q, arith=True, restart=r)
    assert 0xC9 in _markers(da)
    np.testing.assert_array_equal(J.decode_jpeg(dh), J.decode_jpeg(da))


PROG_CASES = [
    ("prog-gray", (32, 32), dict(), False),
    ("prog-rgb", (40, 56, 3), dict(), False),
    ("prog-smooth", (40, 56, 3), dict(), True),
    ("prog-q92", (24, 33, 3), dict(quality=92), False),
    ("prog-gray-restart", (48, 64), dict(restart=3), False),
    ("prog-rgb-restart", (32, 48, 3), dict(restart=2), False),
]


@pytest.mark.parametrize("name,shape,kw,smooth", PROG_CASES,
                         ids=[c[0] for c in PROG_CASES])
def test_progressive_arith_equals_huffman_twin(name, shape, kw, smooth):
    """SOF10: DC first/refine + per-band AC first/refine scans (the
    jpeg_simple_progression script), vs the progressive Huffman twin."""
    img = _img(shape, hash(name) & 0xFFFF, smooth)
    q = kw.get("quality", 75)
    r = kw.get("restart", 0)
    dh = _encode(img, q, arith=False, restart=r, progressive=True,
                 optimize=True)
    da = _encode(img, q, arith=True, restart=r, progressive=True)
    assert 0xCA in _markers(da)
    np.testing.assert_array_equal(J.decode_jpeg(dh), J.decode_jpeg(da))


def test_arith_through_multimodal_dispatch():
    """decode_image routes arithmetic JPEGs to the in-repo decoder."""
    from cross_modal_multivector_search_spark.operators import (
        multimodal as M,
    )
    img = _img((16, 16, 3), 3)
    da = _encode(img, 75, arith=True)
    out = M.decode_image(da)
    np.testing.assert_array_equal(out, J.decode_jpeg(da))


def test_truncated_arith_raises_or_degrades():
    """A truncated arithmetic scan must not crash: the decoder stuffs
    zeros past the end (T.81 semantics) and still yields the frame."""
    img = _img((32, 32), 4)
    da = _encode(img, 75, arith=True)
    out = J.decode_jpeg(da[:len(da) * 3 // 4])
    assert out.shape == (32, 32)


def test_arith_restart_tolerates_fill_bytes():
    """T.81 B.1.1.2: 0xFF fill bytes may precede any marker. The
    restart scanner must skip a run of fills and classify the first
    non-0xFF byte as the marker code (r8 advice)."""
    d = b"\x12\x34\xFF\xFF\xFF\xD1\xAB"
    ad = J._ArithDecoder(d, 0)
    out = J._arith_restart(ad, d, 1)
    assert out.i == 6                      # positioned after FFD1
    with pytest.raises(ValueError, match="out of sequence"):
        J._arith_restart(J._ArithDecoder(d, 0), d, 3)
    # a run of fills hitting EOF is a truncated stream, not a marker
    with pytest.raises(ValueError, match="expected restart"):
        J._arith_restart(J._ArithDecoder(b"\x01\xFF\xFF", 0),
                         b"\x01\xFF\xFF", 0)


def test_arith_decode_with_injected_fill_bytes():
    """End-to-end: inserting a fill 0xFF before every RSTn in an
    arithmetic scan must decode identically (conformant per B.1.1.2)."""
    img = _img((32, 48, 3), 7)
    da = _encode(img, 75, arith=True, restart=2)
    base = J.decode_jpeg(da)
    out = bytearray()
    i = 0
    while i < len(da):
        if (da[i] == 0xFF and i + 1 < len(da)
                and 0xD0 <= da[i + 1] <= 0xD7):
            out += b"\xFF"
        out.append(da[i])
        i += 1
    filled = bytes(out)
    assert len(filled) > len(da)
    np.testing.assert_array_equal(J.decode_jpeg(filled), base)


def test_arith_frame_inside_hierarchy():
    """Arithmetic (SOF9) as the initial frame of a hierarchical stream:
    transplant a libjpeg arith file under a DHP — the Annex-J fold of a
    single non-differential arith frame must reproduce the plain decode
    exactly (pins the arith+hierarchy plumbing against a THIRD-PARTY
    stream; the differential arith frames SOF13/14/15 are pinned by
    the in-repo encoder twin in tests/test_jpeg_hier.py since r11)."""
    def transplant(d: bytes) -> bytes:
        i = d.index(b"\xff\xc9")
        ln = int.from_bytes(d[i + 2:i + 4], "big")
        return d[:i] + b"\xff\xde" + d[i + 2:i + 2 + ln] + d[i:]

    # gray: the fold's per-frame integer rounding commutes with the
    # plain path's final rounding -> bit-exact
    g = _img((24, 32), 11)
    dg = _encode(g, 80, arith=True)
    np.testing.assert_array_equal(J.decode_jpeg(transplant(dg)),
                                  J.decode_jpeg(dg))
    # color: the fold rounds component planes BEFORE the chroma
    # upsample + color convert (Annex-J references are integer
    # samples), so only that rounding may differ
    c = _img((24, 32, 3), 12)
    dc = _encode(c, 80, arith=True)
    diff = np.abs(J.decode_jpeg(transplant(dc)).astype(int)
                  - J.decode_jpeg(dc).astype(int))
    assert diff.max() <= 2
