"""Pure-NumPy VP8L (lossless WebP) codec — stdlib + NumPy only.

Implements the public WebP Lossless Bitstream Specification: RIFF
container parse, LSB-first bit I/O, canonical prefix codes (simple and
code-length-coded forms, including the single-symbol zero-bit case),
meta-prefix (entropy image) groups, color cache, LZ77 backward
references with the 2D distance mapping, and all four transforms
(predictor with its 14 modes, color transform, subtract-green, color
indexing with sub-byte pixel bundling) inverted in reverse read order.

The encoder is a restricted-but-conformant writer used as the
round-trip fixture: literal pixels + distance-1 LZ77 runs with direct
distance codes, an optional subtract-green transform, canonical
length-capped Huffman codes emitted through the code-length code. It
exists so the decoder is pinned by exact (lossless) round trips without
any external codec in the container.

Role parity: the reference's data prep decodes real imagery before
embedding (`/root/reference/prepare_for_clip_webvid.py:1-54`,
`/root/reference/prepare_data.sh:23-79` pulls LAION/WebVid media, much
of it WebP) — this module closes that seam for lossless WebP; lossy
VP8 still routes to the import-guarded library dispatch.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- bits


class _LsbReader:
    """LSB-first bit reader (DEFLATE/VP8L bit order)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.byte = pos
        self.bit = 0

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.d):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.d[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class _LsbWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def bytes(self) -> bytes:
        out = bytes(self.buf)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


# ------------------------------------------------------- prefix codes

#: order in which the code-length code's own lengths are stored
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
             13, 14, 15)


def _canonical_table(lengths: list[int]):
    """Decoder view of a canonical prefix code.

    Returns ``("zero", sym)`` for a single-used-symbol code (VP8L reads
    zero bits for it) or a dict (length, code) -> symbol where codes
    are assigned in canonical (length, symbol) order and read MSB-of-
    code-first, exactly the DEFLATE convention VP8L shares."""
    used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise ValueError("prefix code with no symbols")
    if len(used) == 1:
        return ("zero", used[0][1])
    used.sort()
    table: dict[tuple[int, int], int] = {}
    code, prev_len = 0, used[0][0]
    for ln, sym in used:
        code <<= (ln - prev_len)
        prev_len = ln
        if code >= (1 << ln):
            raise ValueError("over-subscribed prefix code")
        table[(ln, code)] = sym
        code += 1
    return table


def _read_symbol(r: _LsbReader, table) -> int:
    if isinstance(table, tuple):          # single-symbol, zero bits
        return table[1]
    code = 0
    for ln in range(1, 16):
        code = (code << 1) | r.bits(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid prefix code in VP8L stream")


def _read_code_lengths(r: _LsbReader, n_symbols: int) -> list[int]:
    """The non-simple ('normal') code: 3-bit code-length-code lengths
    in _CL_ORDER, then symbol lengths via that code with 16/17/18
    repeat semantics and the optional max_symbol budget."""
    num_codes = 4 + r.bits(4)
    if num_codes > 19:
        raise ValueError("VP8L: more than 19 code length codes")
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = r.bits(3)
    cl_table = _canonical_table(cl_lengths)
    if r.bits(1):                          # optional symbol budget
        length_nbits = 2 + 2 * r.bits(3)
        max_symbol = 2 + r.bits(length_nbits)
    else:
        max_symbol = n_symbols
    lengths = [0] * n_symbols
    sym, prev = 0, 8
    while sym < n_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = _read_symbol(r, cl_table)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + r.bits(2)
            for _ in range(rep):
                if sym >= n_symbols:
                    raise ValueError("VP8L code length repeat overflow")
                lengths[sym] = prev
                sym += 1
        else:
            rep = (3 + r.bits(3)) if cl == 17 else (11 + r.bits(7))
            sym += rep
            if sym > n_symbols:
                raise ValueError("VP8L code length repeat overflow")
    return lengths


def _read_prefix_code(r: _LsbReader, n_symbols: int):
    if r.bits(1):                          # simple code
        num = r.bits(1) + 1
        if r.bits(1):
            sym0 = r.bits(8)
        else:
            sym0 = r.bits(1)
        if num == 1:
            if sym0 >= n_symbols:
                raise ValueError("VP8L simple code symbol out of range")
            return ("zero", sym0)
        sym1 = r.bits(8)
        if sym0 >= n_symbols or sym1 >= n_symbols:
            raise ValueError("VP8L simple code symbol out of range")
        # the FIRST-listed symbol takes code 0 (stream order, not
        # canonical symbol order)
        return {(1, 0): sym0, (1, 1): sym1}
    return _canonical_table(_read_code_lengths(r, n_symbols))


# -------------------------------------------------- LZ77 prefix values


def _prefix_decode_value(code: int, r: _LsbReader) -> int:
    """Length/distance prefix decode: codes 0..3 are the values 1..4;
    above that each code pair doubles the range with extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    base = (2 + (code & 1)) << extra
    return base + r.bits(extra) + 1


def _prefix_encode_value(v: int) -> tuple[int, int, int]:
    """(code, n_extra_bits, extra_value) — exact inverse of
    ``_prefix_decode_value``."""
    if v < 1:
        raise ValueError("prefix values start at 1")
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    n = x.bit_length() - 1
    code = 2 * n + ((x >> (n - 1)) & 1)
    extra = (code - 2) >> 1
    base = (2 + (code & 1)) << extra
    return code, extra, v - base - 1


def _make_distance_map() -> list[tuple[int, int]]:
    """The 120 short-distance 2D codes: every (dx, dy) neighborhood
    offset with dy in 0..7 (dx 1..8 when dy=0, else dx -7..8), ordered
    by squared distance then |dx| then sign — the spec's published
    table reproduced by its generation rule."""
    pts = [(dx, 0) for dx in range(1, 9)]
    pts += [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    pts.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]),
                            0 if p[0] >= 0 else 1))
    return pts


_DISTANCE_MAP = _make_distance_map()


def _plane_code_to_distance(width: int, v: int) -> int:
    if v > 120:
        return v - 120
    dx, dy = _DISTANCE_MAP[v - 1]
    return max(1, dy * width + dx)


# ------------------------------------------------------------ decoder


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


_HASH_MUL = 0x1E35A7BD


def _decode_entropy_coded(r: _LsbReader, w: int, h: int,
                          allow_meta: bool) -> np.ndarray:
    """The spatially-coded ARGB image: color cache, prefix groups
    (meta-prefix image when present), literals / LZ77 / cache refs.
    Returns uint32 ARGB, shape (h, w)."""
    cache_bits = r.bits(4) if r.bits(1) else 0
    if cache_bits > 11:
        raise ValueError(f"VP8L color cache bits {cache_bits} > 11")
    cache = np.zeros(1 << cache_bits, dtype=np.uint64) if cache_bits \
        else None

    hbits, group_idx, gw = 0, None, 0
    n_groups = 1
    if allow_meta and r.bits(1):
        hbits = r.bits(3) + 2
        gw, gh = _subsample(w, hbits), _subsample(h, hbits)
        himg = _decode_image_stream(r, gw, gh, level0=False)
        group_idx = ((himg >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(group_idx.max()) + 1

    n_green = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append([_read_prefix_code(r, n)
                       for n in (n_green, 256, 256, 256, 40)])

    out = np.zeros(w * h, dtype=np.uint64)
    pos, total = 0, w * h
    g = groups[0]
    while pos < total:
        if group_idx is not None:
            y, x = pos // w, pos % w
            g = groups[int(group_idx[y >> hbits, x >> hbits])]
        s = _read_symbol(r, g[0])
        if s < 256:
            red = _read_symbol(r, g[1])
            blue = _read_symbol(r, g[2])
            alpha = _read_symbol(r, g[3])
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((_HASH_MUL * px) & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = px
        elif s < 280:
            length = _prefix_decode_value(s - 256, r)
            dist = _plane_code_to_distance(
                w, _prefix_decode_value(_read_symbol(r, g[4]), r))
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backward reference out of range")
            for i in range(length):
                px = out[pos + i - dist]
                out[pos + i] = px
                if cache is not None:
                    cache[((_HASH_MUL * int(px)) & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
            pos += length
        else:
            out[pos] = cache[s - 280]
            pos += 1
    return out.reshape(h, w)


def _apply_inverse_transform(t, argb: np.ndarray) -> np.ndarray:
    ttype = t[0]
    if ttype == 2:                              # subtract green
        green = (argb >> 8) & 0xFF
        red = (((argb >> 16) & 0xFF) + green) & 0xFF
        blue = ((argb & 0xFF) + green) & 0xFF
        return (argb & np.uint64(0xFF00FF00)) | (red << 16) | blue
    if ttype == 0:                              # predictor
        return _inverse_predictor(argb, t[1], t[2])
    if ttype == 1:                              # color transform
        return _inverse_color_transform(argb, t[1], t[2])
    # color indexing
    _, width_bits, palette, full_w = t
    h, packed_w = argb.shape
    idx = (argb >> 8) & 0xFF
    if width_bits:
        per = 1 << width_bits
        bits = 8 >> width_bits
        mask = (1 << bits) - 1
        cols = []
        for i in range(per):
            cols.append((idx >> (i * bits)) & mask)
        idx = np.stack(cols, axis=2).reshape(h, packed_w * per)
        idx = idx[:, :full_w]
    idx = idx.astype(np.int64)
    safe = np.where(idx < len(palette), idx, 0)
    out = palette[safe]
    out[idx >= len(palette)] = 0
    return out


def _inverse_predictor(argb: np.ndarray, size_bits: int,
                       modes: np.ndarray) -> np.ndarray:
    h, w = argb.shape
    out = argb.astype(np.int64)

    def chans(px):
        return np.array([(px >> 24) & 0xFF, (px >> 16) & 0xFF,
                         (px >> 8) & 0xFF, px & 0xFF], dtype=np.int64)

    def pack(c):
        return (int(c[0]) << 24) | (int(c[1]) << 16) \
            | (int(c[2]) << 8) | int(c[3])

    def avg2(a, b):
        return (a + b) >> 1

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
            elif y == 0:
                pred = chans(out[0, x - 1])
            elif x == 0:
                pred = chans(out[y - 1, 0])
            else:
                mode = (int(modes[y >> size_bits, x >> size_bits])
                        >> 8) & 0xFF
                L = chans(out[y, x - 1])
                T = chans(out[y - 1, x])
                TL = chans(out[y - 1, x - 1])
                # rightmost column: TR is this row's first pixel (the
                # contiguous-buffer addressing the spec defines)
                TR = chans(out[y - 1, x + 1]) if x + 1 < w \
                    else chans(out[y, 0])
                if mode == 0:
                    pred = np.array([0xFF, 0, 0, 0], dtype=np.int64)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = avg2(avg2(L, TR), T)
                elif mode == 6:
                    pred = avg2(L, TL)
                elif mode == 7:
                    pred = avg2(L, T)
                elif mode == 8:
                    pred = avg2(TL, T)
                elif mode == 9:
                    pred = avg2(T, TR)
                elif mode == 10:
                    pred = avg2(avg2(L, TL), avg2(T, TR))
                elif mode == 11:
                    pa_minus_pb = int(np.sum(np.abs(L - TL))
                                      - np.sum(np.abs(T - TL)))
                    pred = T if pa_minus_pb <= 0 else L
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:
                    ave = avg2(L, T)
                    d = ave - TL
                    half = np.where(d >= 0, d // 2, -((-d) // 2))
                    pred = np.clip(ave + half, 0, 255)
                else:
                    raise ValueError(f"VP8L predictor mode {mode}")
            res = chans(out[y, x])
            out[y, x] = pack((res + pred) & 0xFF)
    return out.astype(np.uint64)


def _inverse_color_transform(argb: np.ndarray, size_bits: int,
                             elements: np.ndarray) -> np.ndarray:
    h, w = argb.shape
    out = argb.astype(np.int64)

    def s8(v):
        return v - 256 if v >= 128 else v

    for y in range(h):
        for x in range(w):
            el = int(elements[y >> size_bits, x >> size_bits])
            g2r = s8(el & 0xFF)
            g2b = s8((el >> 8) & 0xFF)
            r2b = s8((el >> 16) & 0xFF)
            px = int(out[y, x])
            green = s8((px >> 8) & 0xFF)
            red = ((px >> 16) & 0xFF) + ((g2r * green) >> 5)
            red &= 0xFF
            blue = (px & 0xFF) + ((g2b * green) >> 5)
            blue = (blue + ((r2b * s8(red)) >> 5)) & 0xFF
            out[y, x] = (px & 0xFF000000) | (px & 0xFF00) \
                | (red << 16) | blue
    return out.astype(np.uint64)


def _decode_image_stream(r: _LsbReader, w: int, h: int,
                         level0: bool) -> np.ndarray:
    """General entropy-coded image; at level0 also reads transforms and
    applies their inverses in reverse read order."""
    transforms = []
    cur_w = w
    if level0:
        seen = set()
        while r.bits(1):
            ttype = r.bits(2)
            if ttype in seen:
                raise ValueError("VP8L transform repeated")
            seen.add(ttype)
            if ttype in (0, 1):                 # predictor / color
                size_bits = r.bits(3) + 2
                sub = _decode_image_stream(
                    r, _subsample(cur_w, size_bits),
                    _subsample(h, size_bits), level0=False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:                    # subtract green
                transforms.append((2,))
            else:                               # color indexing
                psize = r.bits(8) + 1
                raw = _decode_image_stream(r, psize, 1, level0=False)
                pal = raw.reshape(-1).astype(np.uint64)
                # palette entries are per-channel delta coded
                acc = np.uint64(0)
                entries = []
                for p in pal:
                    a = ((acc >> np.uint64(24)) + (p >> np.uint64(24))) \
                        & np.uint64(0xFF)
                    rr = (((acc >> np.uint64(16)) & np.uint64(0xFF))
                          + ((p >> np.uint64(16)) & np.uint64(0xFF))) \
                        & np.uint64(0xFF)
                    gg = (((acc >> np.uint64(8)) & np.uint64(0xFF))
                          + ((p >> np.uint64(8)) & np.uint64(0xFF))) \
                        & np.uint64(0xFF)
                    bb = ((acc & np.uint64(0xFF)) + (p & np.uint64(0xFF))) \
                        & np.uint64(0xFF)
                    acc = (a << np.uint64(24)) | (rr << np.uint64(16)) \
                        | (gg << np.uint64(8)) | bb
                    entries.append(acc)
                pal = np.array(entries, dtype=np.uint64)
                width_bits = (3 if psize <= 2 else 2 if psize <= 4
                              else 1 if psize <= 16 else 0)
                transforms.append((3, width_bits, pal, cur_w))
                cur_w = _subsample(cur_w, width_bits)
    argb = _decode_entropy_coded(r, cur_w, h, allow_meta=level0)
    for t in reversed(transforms):
        argb = _apply_inverse_transform(t, argb)
    return argb


def _unfilter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    """ALPH chunk prediction filters (WebP container spec §Alpha):
    0 none, 1 horizontal, 2 vertical, 3 gradient. Matches libwebp
    utils/filters.c: the first pixel of each non-first row predicts
    from the pixel above; row 0 unfilters horizontally."""
    if method == 0:
        return plane
    h, w = plane.shape
    out = np.empty_like(plane)
    if method == 2:                       # vertical: row 0 horizontal
        out[0, 0] = plane[0, 0]
        for x in range(1, w):
            out[0, x] = (int(out[0, x - 1]) + int(plane[0, x])) & 0xFF
        prev = out[0].astype(np.int64)
        for y in range(1, h):
            prev = (prev + plane[y]) & 0xFF
            out[y] = prev
        return out.astype(np.uint8)
    for y in range(h):
        if method == 1:                   # horizontal
            pred = 0 if y == 0 else int(out[y - 1, 0])
            for x in range(w):
                pred = (pred + int(plane[y, x])) & 0xFF
                out[y, x] = pred
        else:                             # gradient
            if y == 0:
                pred = 0
                for x in range(w):
                    pred = (pred + int(plane[y, x])) & 0xFF
                    out[y, x] = pred
                continue
            left = int(out[y - 1, 0])
            top_left = left
            for x in range(w):
                top = int(out[y - 1, x])
                g = left + top - top_left
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = (g + int(plane[y, x])) & 0xFF
                out[y, x] = left
                top_left = top
    return out


def _decode_alpha(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> uint8 (h, w) alpha plane. Compression 0 is a raw
    plane; 1 is a header-less VP8L stream whose green channel carries
    the alpha values (libwebp dec/alpha_dec.c layout)."""
    if not body:
        raise ValueError("empty ALPH chunk")
    head = body[0]
    method = head & 3
    filt = (head >> 2) & 3
    if method == 0:
        need = w * h
        raw = np.frombuffer(body, np.uint8, count=need, offset=1)
        plane = raw.reshape(h, w).copy()
    elif method == 1:
        r = _LsbReader(body, 1)
        argb = _decode_image_stream(r, w, h, level0=True)
        plane = ((argb >> np.uint64(8)) & np.uint64(0xFF)).astype(np.uint8)
    else:
        raise ValueError(f"bad ALPH compression method {method}")
    return _unfilter_alpha(plane, filt)


def _iter_chunks(buf: bytes, pos: int = 0):
    """Yield (tag, body) over a RIFF chunk sequence (chunks are padded
    to even sizes per RIFF; the pad byte is not part of the body)."""
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        yield tag, buf[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)


def _decode_vp8l_rgba(vp8l: bytes) -> np.ndarray:
    """VP8L chunk body -> uint8 (H, W, 4) RGBA."""
    if not vp8l or vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    r = _LsbReader(vp8l, 1)
    w = r.bits(14) + 1
    h = r.bits(14) + 1
    r.bits(1)                                   # alpha hint
    if r.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    argb = _decode_image_stream(r, w, h, level0=True)
    a = ((argb >> np.uint64(24)) & np.uint64(0xFF)).astype(np.uint8)
    red = ((argb >> np.uint64(16)) & np.uint64(0xFF)).astype(np.uint8)
    g = ((argb >> np.uint64(8)) & np.uint64(0xFF)).astype(np.uint8)
    b = (argb & np.uint64(0xFF)).astype(np.uint8)
    return np.stack([red, g, b, a], axis=-1)


def _decode_frame_rgba(data: bytes) -> np.ndarray:
    """Decode a still-image chunk sequence (optional ALPH + VP8, or
    VP8L) to uint8 (H, W, 4) RGBA. This is the payload layout both of
    a whole simple/extended WebP file after the header chunks and of
    an ANMF animation frame's Frame Data (container spec §Animation).
    """
    vp8l = vp8_chunk = alph = None
    for tag, body in _iter_chunks(data):
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            vp8_chunk = body
            break
        if tag == b"ALPH":
            alph = body
    if vp8_chunk is not None:
        from . import vp8 as _vp8
        y, u, v = _vp8.decode_vp8_frame(vp8_chunk)
        rgb = _vp8.vp8_to_rgb(y, u, v)
        if alph is not None:
            a = _decode_alpha(alph, rgb.shape[1], rgb.shape[0])
        else:
            a = np.full(rgb.shape[:2], 255, dtype=np.uint8)
        return np.dstack([rgb, a])
    if vp8l is None:
        raise NotImplementedError(
            "no VP8/VP8L chunk found in WebP container")
    return _decode_vp8l_rgba(vp8l)


def _rgb_unless_alpha(rgba: np.ndarray) -> np.ndarray:
    return rgba if (rgba[:, :, 3] != 255).any() else rgba[:, :, :3]


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a WebP payload in pure NumPy: lossless (VP8L), lossy
    (VP8 keyframe, RFC 6386 — see vp8.py), and extended (VP8X) files
    including an ALPH alpha plane over lossy and animations (the first
    composed frame, matching common still-decoder behavior).
    Returns uint8 (H, W, 3) RGB, or (H, W, 4) RGBA when any alpha < 255.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload (missing RIFF/WEBP)")
    for tag, _ in _iter_chunks(payload, 12):
        if tag == b"ANMF":
            # still-decode of an animation: compose ONLY frame 0 —
            # O(1) decodes regardless of animation length
            first = decode_webp_frames(payload, max_frames=1)[0][2]
            return _rgb_unless_alpha(first)
    return _rgb_unless_alpha(_decode_frame_rgba(payload[12:]))


def _blend_rgba(canvas: np.ndarray, frame: np.ndarray) -> np.ndarray:
    """Straight-alpha 'over' composite of ``frame`` onto ``canvas``
    (both uint8 RGBA), per the container spec's blending pseudocode:
    blend.A = frame.A + canvas.A*(1-frame.A); blend.RGB is the
    alpha-weighted average. Float64 arithmetic, round-half-even."""
    fa = frame[:, :, 3:].astype(np.float64) / 255.0
    ca = canvas[:, :, 3:].astype(np.float64) / 255.0
    oa = fa + ca * (1.0 - fa)
    rgb = (frame[:, :, :3] * fa + canvas[:, :, :3] * ca * (1.0 - fa))
    out = np.zeros_like(canvas)
    np.divide(rgb, oa, out=rgb, where=oa > 0)
    out[:, :, :3] = np.rint(rgb).astype(np.uint8)
    out[:, :, 3] = np.rint(oa[:, :, 0] * 255.0).astype(np.uint8)
    return out


def decode_webp_frames(
        payload: bytes,
        max_frames: int | None = None) -> list[tuple[int, int, np.ndarray]]:
    """Decode a WebP payload to [(start_ms, duration_ms, RGBA canvas)].

    ``max_frames`` stops composing after that many frames (the
    still-decode path passes 1 so a long animation costs one decode).

    Animated WebP (VP8X with the Animation flag + ANIM/ANMF chunks,
    container spec §Animation) composes each frame onto the canvas:
    frames are independent VP8/VP8L stills placed at (2*Frame X,
    2*Frame Y); Blending method 0 alpha-blends the frame over the
    canvas, 1 overwrites the rectangle; Disposal method 1 fills the
    frame's rectangle with the ANIM background color (stored BGRA)
    before the next frame renders. The canvas starts fully transparent.
    Each returned array is an independent (canvas_h, canvas_w, 4)
    snapshot. Non-animated payloads return one frame, (0, 0, rgba) —
    so video-style frame sampling treats every WebP uniformly.

    Reference parity: the reference's data prep feeds real scraped
    imagery to frame-level embedding (prepare_for_clip_webvid.py:1-54);
    animated WebP is the one video-like format fully decodable with
    the in-repo VP8/VP8L codecs.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload (missing RIFF/WEBP)")
    canvas_w = canvas_h = None
    bg = np.zeros(4, dtype=np.uint8)
    anmf = []
    has_anim = False
    for tag, body in _iter_chunks(payload, 12):
        if tag == b"VP8X":
            if len(body) < 10:
                raise ValueError("truncated VP8X chunk")
            canvas_w = int.from_bytes(body[4:7], "little") + 1
            canvas_h = int.from_bytes(body[7:10], "little") + 1
        elif tag == b"ANIM":
            if len(body) < 6:
                raise ValueError("truncated ANIM chunk")
            has_anim = True
            b_, g_, r_, a_ = body[0], body[1], body[2], body[3]
            bg = np.array([r_, g_, b_, a_], dtype=np.uint8)
        elif tag == b"ANMF":
            anmf.append(body)
    if not anmf:
        rgba = _decode_frame_rgba(payload[12:])
        return [(0, 0, rgba)]
    if not has_anim or canvas_w is None:
        raise ValueError("ANMF frames without VP8X/ANIM headers")
    canvas = np.zeros((canvas_h, canvas_w, 4), dtype=np.uint8)
    frames: list[tuple[int, int, np.ndarray]] = []
    t = 0
    for body in anmf:
        if len(body) < 16:
            raise ValueError("truncated ANMF chunk")
        fx = int.from_bytes(body[0:3], "little") * 2
        fy = int.from_bytes(body[3:6], "little") * 2
        fw = int.from_bytes(body[6:9], "little") + 1
        fh = int.from_bytes(body[9:12], "little") + 1
        dur = int.from_bytes(body[12:15], "little")
        flags = body[15]
        no_blend = bool(flags & 0x02)
        dispose_bg = bool(flags & 0x01)
        if fx + fw > canvas_w or fy + fh > canvas_h:
            raise ValueError("ANMF frame rectangle exceeds canvas")
        rgba = _decode_frame_rgba(body[16:])
        if rgba.shape[:2] != (fh, fw):
            raise ValueError(
                f"ANMF declared {fw}x{fh} but frame data decodes to "
                f"{rgba.shape[1]}x{rgba.shape[0]}")
        rect = canvas[fy:fy + fh, fx:fx + fw]
        canvas[fy:fy + fh, fx:fx + fw] = (
            rgba if no_blend else _blend_rgba(rect, rgba))
        frames.append((t, dur, canvas.copy()))
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if dispose_bg:
            canvas[fy:fy + fh, fx:fx + fw] = bg
        t += dur
    return frames


def encode_webp_anim(frames, canvas_size=None,
                     bg: tuple = (0, 0, 0, 0), loop: int = 0) -> bytes:
    """Animated-WebP writer (fixture partner for decode_webp_frames,
    the same role encode_webp_lossless plays for the still decoder).

    ``frames`` is a list of (img, duration_ms, x, y, blend, dispose)
    with uint8 gray/(H,W,3)/(H,W,4) ``img``; x/y must be even (the
    container stores them in 2-pixel units). Each frame is encoded
    losslessly (VP8L) and wrapped in an ANMF chunk under a VP8X+ANIM
    header. ``bg`` is RGBA; stored BGRA per the spec.
    """
    def chunk(tag: bytes, body: bytes) -> bytes:
        return (tag + struct.pack("<I", len(body)) + body
                + (b"\x00" if len(body) & 1 else b""))

    payloads = []
    max_w = max_h = 0
    for img, dur, x, y, blend, dispose in frames:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        h, w = img.shape[:2]
        if x % 2 or y % 2:
            raise ValueError("frame x/y must be even (2-pixel units)")
        still = encode_webp_lossless(img)
        vp8l = next(b for t, b in _iter_chunks(still, 12)
                    if t == b"VP8L")
        # spec flag semantics: bit 1 SET means "do not blend"; the
        # writer takes blend=True to mean alpha-blend (bit clear)
        head = (x // 2).to_bytes(3, "little") \
            + (y // 2).to_bytes(3, "little") \
            + (w - 1).to_bytes(3, "little") \
            + (h - 1).to_bytes(3, "little") \
            + int(dur).to_bytes(3, "little") \
            + bytes([(0 if blend else 0x02)
                     | (0x01 if dispose else 0)])
        payloads.append(chunk(b"ANMF", head + chunk(b"VP8L", vp8l)))
        max_w = max(max_w, x + w)
        max_h = max(max_h, y + h)
    cw, ch = canvas_size if canvas_size else (max_w, max_h)
    vp8x = bytes([0x12, 0, 0, 0]) \
        + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    r_, g_, b_, a_ = bg
    anim = bytes([b_, g_, r_, a_]) + int(loop).to_bytes(2, "little")
    body = b"WEBP" + chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim) \
        + b"".join(payloads)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------ encoder


def _huffman_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Canonical code lengths from frequencies, capped at ``max_len``
    (falls back to the balanced complete code over used symbols — valid
    by Kraft — when the Huffman tree is too deep). Deterministic."""
    import heapq

    used = [s for s, f in enumerate(freqs) if f > 0]
    n = len(used)
    lengths = [0] * len(freqs)
    if n == 0:
        return lengths
    if n == 1:
        lengths[used[0]] = 1
        return lengths
    heap = [(freqs[s], s, ("leaf", s)) for s in used]
    heapq.heapify(heap)
    uid = len(freqs)
    while len(heap) > 1:
        f1, _, t1 = heapq.heappop(heap)
        f2, _, t2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, uid, ("node", t1, t2)))
        uid += 1

    def walk(t, depth):
        if t[0] == "leaf":
            lengths[t[1]] = max(1, depth)
        else:
            walk(t[1], depth + 1)
            walk(t[2], depth + 1)

    walk(heap[0][2], 0)
    if max(lengths) <= max_len:
        return lengths
    # balanced complete code: 2^(k+1)-n symbols at k bits, rest at k+1
    k = (n - 1).bit_length() - 1 if n > 1 else 0
    while (1 << (k + 1)) < n:
        k += 1
    n_short = (1 << (k + 1)) - n
    by_freq = sorted(used, key=lambda s: (-freqs[s], s))
    lengths = [0] * len(freqs)
    for i, s in enumerate(by_freq):
        lengths[s] = k if i < n_short else k + 1
    if max(lengths) > max_len:
        raise ValueError("alphabet too large for the length cap")
    return lengths


def _canonical_encoder(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length); same canonical assignment the decoder
    reconstructs (a single-used-symbol code is ZERO bits on both
    sides)."""
    used = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    if len(used) == 1:
        return {used[0][1]: (0, 0)}
    out: dict[int, tuple[int, int]] = {}
    code, prev = 0, used[0][0] if used else 0
    for ln, sym in used:
        code <<= (ln - prev)
        prev = ln
        out[sym] = (code, ln)
        code += 1
    return out


def _write_code_msb(w: _LsbWriter, code: int, length: int) -> None:
    for i in range(length - 1, -1, -1):
        w.write((code >> i) & 1, 1)


def _write_prefix_code(w: _LsbWriter, lengths: list[int]):
    """Emit one prefix code; returns the symbol->(code, len) encoder.
    Uses the simple form for <=2 used symbols, else the code-length
    code (every length emitted literally — no 16/17/18 repeats)."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(used) == 0:
        # never-read code (e.g. distances in a literal-only image):
        # cheapest valid emission is a single-symbol simple code
        w.write(1, 1)
        w.write(0, 1)          # num_symbols - 1 = 0
        w.write(0, 1)          # 1-bit first symbol
        w.write(0, 1)          # symbol 0
        return {0: (0, 0)}
    if len(used) <= 2 and max(used) < 256:
        w.write(1, 1)                       # simple
        w.write(len(used) - 1, 1)
        w.write(1, 1)                       # 8-bit first symbol
        w.write(used[0], 8)
        if len(used) == 2:
            w.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}
    w.write(0, 1)                           # normal code
    cl_freq = [0] * 19
    for ln in lengths:
        cl_freq[ln] += 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    w.write(19 - 4, 4)
    for sym in _CL_ORDER:
        w.write(cl_lengths[sym], 3)
    w.write(0, 1)                           # no max_symbol budget
    cl_enc = _canonical_encoder(cl_lengths)
    single_cl = len([x for x in cl_lengths if x > 0]) == 1
    for ln in lengths:
        if not single_cl:                   # single-symbol: zero bits
            c, cl = cl_enc[ln]
            _write_code_msb(w, c, cl)
    return _canonical_encoder(lengths)


def encode_webp_lossless(img: np.ndarray, subtract_green: bool = True,
                         use_lz77: bool = True, cache_bits: int = 0,
                         two_d_codes: bool = False) -> bytes:
    """VP8L writer: losslessly encodes uint8 gray/(H,W,3)/(H,W,4)
    pixels. Distance-1 runs become LZ77 copies — with DIRECT distance
    codes (value = distance + 120) by default, or the 2D plane code
    (1, 0) when ``two_d_codes`` is set; ``subtract_green`` exercises
    the transform path and ``cache_bits`` > 0 the color-cache path
    end-to-end (the encoder maintains the same hash-insert state the
    decoder does, emitting cache references whenever they hit)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w, nch = img.shape
    if nch == 3:
        alpha = np.full((h, w), 255, dtype=np.int64)
    elif nch == 4:
        alpha = img[:, :, 3].astype(np.int64)
    else:
        raise ValueError(f"{nch}-channel input")
    red = img[:, :, 0].astype(np.int64)
    green = img[:, :, 1].astype(np.int64)
    blue = img[:, :, 2].astype(np.int64)
    if subtract_green:
        red = (red - green) & 0xFF
        blue = (blue - green) & 0xFF
    argb = ((alpha << 24) | (red << 16) | (green << 8) | blue).reshape(-1)

    if not 0 <= cache_bits <= 11:
        raise ValueError(f"cache_bits {cache_bits} outside 0..11")
    cache = ([0] * (1 << cache_bits), [False] * (1 << cache_bits)) \
        if cache_bits else None

    def cache_key(px: int) -> int:
        return ((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)

    def cache_insert(px: int) -> None:
        if cache is not None:
            k = cache_key(px)
            cache[0][k], cache[1][k] = px, True

    # tokenize: literals + distance-1 runs + cache references
    tokens: list[tuple] = []
    i, n = 0, len(argb)
    while i < n:
        if use_lz77 and i > 0 and argb[i] == argb[i - 1]:
            run = 1
            while i + run < n and argb[i + run] == argb[i - 1] \
                    and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("copy", run, 1))
                cache_insert(int(argb[i - 1]))
                i += run
                continue
        px = int(argb[i])
        if cache is not None and cache[1][cache_key(px)] \
                and cache[0][cache_key(px)] == px:
            tokens.append(("cache", cache_key(px)))
        else:
            tokens.append(("lit", (px >> 24) & 0xFF, (px >> 16) & 0xFF,
                           (px >> 8) & 0xFF, px & 0xFF))
            cache_insert(px)
        i += 1

    dist_value = 2 if two_d_codes else 121      # plane (1,0) vs direct
    n_green = 280 + ((1 << cache_bits) if cache_bits else 0)
    fg, fr, fb, fa, fd = ([0] * n_green, [0] * 256, [0] * 256,
                          [0] * 256, [0] * 40)
    for t in tokens:
        if t[0] == "lit":
            fa[t[1]] += 1
            fr[t[2]] += 1
            fg[t[3]] += 1
            fb[t[4]] += 1
        elif t[0] == "cache":
            fg[280 + t[1]] += 1
        else:
            lc, _, _ = _prefix_encode_value(t[1])
            fg[256 + lc] += 1
            dc, _, _ = _prefix_encode_value(dist_value)
            fd[dc] += 1

    bw = _LsbWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if nch == 4 else 0, 1)       # alpha hint
    bw.write(0, 3)                          # version
    if subtract_green:
        bw.write(1, 1)                      # transform present
        bw.write(2, 2)                      # SUBTRACT_GREEN
    bw.write(0, 1)                          # no more transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)                      # no color cache
    bw.write(0, 1)                          # no meta-prefix image
    enc_g = _write_prefix_code(bw, _huffman_lengths(fg, 15))
    enc_r = _write_prefix_code(bw, _huffman_lengths(fr, 15))
    enc_b = _write_prefix_code(bw, _huffman_lengths(fb, 15))
    enc_a = _write_prefix_code(bw, _huffman_lengths(fa, 15))
    enc_d = _write_prefix_code(bw, _huffman_lengths(fd, 15))
    for t in tokens:
        if t[0] == "lit":
            for enc, sym in ((enc_g, t[3]), (enc_r, t[2]),
                             (enc_b, t[4]), (enc_a, t[1])):
                c, ln = enc[sym]
                _write_code_msb(bw, c, ln)
        elif t[0] == "cache":
            c, ln = enc_g[280 + t[1]]
            _write_code_msb(bw, c, ln)
        else:
            lc, lnb, lev = _prefix_encode_value(t[1])
            c, ln = enc_g[256 + lc]
            _write_code_msb(bw, c, ln)
            bw.write(lev, lnb)
            dc, dnb, dev = _prefix_encode_value(dist_value)
            c, ln = enc_d[dc]
            _write_code_msb(bw, c, ln)
            bw.write(dev, dnb)
    body = b"\x2f" + bw.bytes()
    if len(body) & 1:
        padded = body + b"\x00"
    else:
        padded = body
    riff = (b"WEBP" + b"VP8L" + struct.pack("<I", len(body)) + padded)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
