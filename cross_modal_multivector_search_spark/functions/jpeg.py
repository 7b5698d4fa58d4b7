"""Pure-NumPy JPEG codec (ITU-T T.81): baseline AND progressive Huffman.

In-container REAL compressed-image decode with no external codec
library: the decoder handles 8-bit JPEG — Huffman baseline (SOF0/SOF1,
single- or multi-scan) and PROGRESSIVE (SOF2: spectral selection +
successive approximation, DC/AC first and refinement scans, EOB runs)
— gray or YCbCr, arbitrary integer sampling factors (4:4:4, 4:2:0,
4:2:2, ...), restart intervals, AND ARITHMETIC entropy coding
(SOF9 sequential + SOF10 progressive: the T.81 Annex D/G QM-family
coder with DAC conditioning, pinned bit-for-bit against libjpeg via
the Huffman-twin equivalence in tests/test_jpeg_arith.py — the two
entropy codings carry identical coefficients, so the proven Huffman
decode is an exact pixel oracle), plus 12-BIT sample precision
(SOF1/SOF2 extended frames, Pq=1 16-bit quantization tables, level
shift 2048, uint16 output). It raises ``NotImplementedError`` only for
the modes that genuinely need a richer codec (hierarchical), which
``operators.multimodal`` then routes through the import-guarded
PIL/cv2 seam.

The encoder is the fixture/round-trip partner: Annex-K quantization +
Huffman tables (scaled by the libjpeg quality formula), 4:4:4 or 4:2:0
chroma subsampling, optional restart intervals, and a progressive mode
(``encode_jpeg(..., progressive=True)``) emitting the standard
DC-first/AC-first/AC-refine/DC-refine scan script so every progressive
decode path is round-trip-tested in-container. Both sides batch the
8x8 DCT/IDCT as one einsum over all blocks — the per-symbol Huffman
loop is the only scalar part.

Reference analog: the reference's data prep decodes real media before
CLIP embedding (`/root/reference/prepare_for_clip_webvid.py`);
this module makes that stage real for JPEG inside the Spark
`mapInPandas` decode UDFs (operators/multimodal.py).
"""

from __future__ import annotations

import numpy as np

# --- constants (ITU-T T.81 Annex K — public standard tables) ---------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))

AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II basis: block_coeffs = D @ block @ D.T
_K = np.arange(8, dtype=np.float64)
_D = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) / 2.0
_D[0, :] /= np.sqrt(2.0)


def _dct2_batch(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,njk,lk->nil", _D, blocks, _D, optimize=True)


def _idct2_batch(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _D, coefs, _D, optimize=True)


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int],
                     vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a T.81 BITS/HUFFVAL table."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int],
                  vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder-side view."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# --- bit I/O ---------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)

    def raw_marker(self, marker: int) -> None:
        self.pad_to_byte()
        self.buf += bytes((0xFF, marker))


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.i = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.i >= len(self.d):
            raise ValueError("JPEG entropy stream truncated")
        b = self.d[self.i]
        if b == 0xFF:
            nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) else None
            if nxt != 0x00:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                    if nxt is not None else "JPEG entropy stream truncated")
            self.i += 2
        else:
            self.i += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.acc = 0
        self.n = 0


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category s, s-bit code) per T.81 F.1.2.1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1)


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG entropy stream")


# --- encoder ---------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray,
                  mid: float = 128.0) -> tuple[np.ndarray, ...]:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + mid
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + mid
    return y, cb, cr


def _plane_to_blocks(plane: np.ndarray, q: np.ndarray,
                     mid: float = 128.0) -> np.ndarray:
    """(H8, W8) plane -> (by, bx, 64) quantized zigzag coefficients."""
    h8, w8 = plane.shape
    by, bx = h8 // 8, w8 // 8
    blocks = (plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
              .reshape(by * bx, 8, 8) - mid)
    coefs = _dct2_batch(blocks)
    quant = np.round(coefs / q[None]).astype(np.int64)
    return quant.reshape(by, bx, 64)[:, :, ZIGZAG]


def _pad_to(plane: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return np.pad(plane, ((0, h8 - plane.shape[0]),
                          (0, w8 - plane.shape[1])), mode="edge")


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    s, code = _magnitude(dc - pred)
    hc, hl = dc_codes[s]
    w.write(hc, hl)
    w.write(code, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_codes[0xF0]      # ZRL
            w.write(hc, hl)
            run -= 16
        s, code = _magnitude(v)
        hc, hl = ac_codes[(run << 4) | s]
        w.write(hc, hl)
        w.write(code, s)
        run = 0
    if last < 63:
        hc, hl = ac_codes[0x00]          # EOB
        w.write(hc, hl)
    return dc


# Progressive AC scans need EOBn symbols (0x10..0xE0) that the Annex-K
# sequential AC tables do not contain. A flat canonical table carrying
# every RRRRSSSS symbol (255 codes at 9 bits + 1 at 10) is valid for
# any progressive AC scan; compression is slightly worse than a tuned
# table, which is irrelevant for the fixture/round-trip role.
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
AC_PROG_VALS = list(range(256))


def _emit_eobrun(bw: _BitWriter, actab: dict, eobrun: int,
                 pending_bits: list) -> int:
    """Flush a pending EOBn run (plus the correction bits buffered for
    its blocks, AC refinement only). Returns 0 for caller reset."""
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        hc, hl = actab[r << 4]
        bw.write(hc, hl)
        if r:
            bw.write(eobrun - (1 << r), r)
    for b in pending_bits:
        bw.write(b, 1)
    pending_bits.clear()
    return 0


def _comp_zz_iter(blocks: np.ndarray, ch: int, cw: int):
    """Raster iterator over a component's ACTUAL blocks (the padded MCU
    grid's extra blocks are not entropy-coded in non-interleaved
    scans)."""
    for by in range(ch):
        for bx in range(cw):
            yield blocks[by, bx]


def _enc_dc_scan(bw: _BitWriter, comp_blocks: list, samp: list,
                 dc_tabs: list, tabsel: list, mcus_y: int, mcus_x: int,
                 al: int, refine: bool) -> None:
    preds = [0] * len(comp_blocks)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(comp_blocks[ci][my * sv + by,
                                                 mx * sh + bx][0])
                        if refine:
                            bw.write((dc >> al) & 1, 1)
                            continue
                        v = dc >> al          # DC point transform is an
                        s, code = _magnitude(v - preds[ci])  # arith shift
                        preds[ci] = v
                        hc, hl = dc_tabs[tabsel[ci]][s]
                        bw.write(hc, hl)
                        bw.write(code, s)


def _enc_ac_first(bw: _BitWriter, zzs, actab: dict, ss: int, se: int,
                  al: int) -> None:
    """AC first scan: point transform is integer division toward zero
    (T.81 G.1.2.1 — unlike DC's arithmetic shift), EOBn batching."""
    eobrun = 0
    for zz in zzs:
        band = [int(v) for v in zz[ss:se + 1]]
        vals = [(v >> al) if v >= 0 else -((-v) >> al) for v in band]
        nz = [idx for idx, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 32767:
                eobrun = _emit_eobrun(bw, actab, eobrun, [])
            continue
        eobrun = _emit_eobrun(bw, actab, eobrun, [])
        run = 0
        for idx in range(nz[-1] + 1):
            v = vals[idx]
            if v == 0:
                run += 1
                continue
            while run > 15:
                hc, hl = actab[0xF0]
                bw.write(hc, hl)
                run -= 16
            s, code = _magnitude(v)
            hc, hl = actab[(run << 4) | s]
            bw.write(hc, hl)
            bw.write(code, s)
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 32767:
                eobrun = _emit_eobrun(bw, actab, eobrun, [])
    _emit_eobrun(bw, actab, eobrun, [])


def _enc_ac_refine(bw: _BitWriter, zzs, actab: dict, ss: int, se: int,
                   al: int) -> None:
    """AC refinement scan (libjpeg jcphuff encode_mcu_AC_refine shape):
    zero-history runs + ±1 for newly significant coefficients, one
    buffered correction bit per already-nonzero coefficient crossed,
    EOB runs carrying their blocks' buffered bits."""
    eobrun = 0
    pend: list = []            # correction bits owed to the pending run
    for zz in zzs:
        band = [int(v) for v in zz[ss:se + 1]]
        temp = [(abs(v) >> al) for v in band]
        eobpos = -1
        for idx, t in enumerate(temp):
            if t == 1:
                eobpos = idx   # last newly-significant position
        run, cur = 0, []
        for idx, t in enumerate(temp):
            if t == 0:
                run += 1
                continue
            while run > 15 and idx <= eobpos:
                eobrun = _emit_eobrun(bw, actab, eobrun, pend)
                hc, hl = actab[0xF0]
                bw.write(hc, hl)
                run -= 16
                for b in cur:
                    bw.write(b, 1)
                cur = []
            if t > 1:          # previously significant: correction bit
                cur.append(t & 1)
                continue
            eobrun = _emit_eobrun(bw, actab, eobrun, pend)
            hc, hl = actab[(run << 4) | 1]
            bw.write(hc, hl)
            bw.write(1 if band[idx] > 0 else 0, 1)
            for b in cur:
                bw.write(b, 1)
            cur = []
            run = 0
        if run > 0 or cur:
            eobrun += 1
            pend.extend(cur)
            if eobrun == 32767:
                eobrun = _emit_eobrun(bw, actab, eobrun, pend)
    _emit_eobrun(bw, actab, eobrun, pend)


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "4:4:4",
                restart_interval: int = 0,
                progressive: bool = False,
                precision: int = 8) -> bytes:
    """Encode a uint8 gray (H,W) or RGB (H,W,3) array as JPEG.

    ``progressive=True`` emits an SOF2 frame with the standard simple
    scan script — DC first (Al=1), per-component AC first (Ss=1..63,
    Al=1), per-component AC refinement (Ah=1, Al=0), DC refinement —
    exercising every progressive decode path; restart intervals apply
    to baseline mode only.

    ``precision=12`` takes uint16 pixels in [0, 4095] and emits an
    extended-sequential SOF1 (or progressive SOF2) frame with 16-bit
    Pq=1 quantization tables — the base tables scaled x16 so quantized
    coefficients (and hence Huffman categories) match the 8-bit case
    and stay within the Annex-K tables' coded range."""
    img = np.asarray(img)
    if precision == 8:
        if img.dtype != np.uint8:
            raise ValueError("encode_jpeg expects uint8 pixels")
        mid = 128.0
    elif precision == 12:
        if img.dtype != np.uint16:
            raise ValueError("12-bit encode_jpeg expects uint16 pixels")
        if img.max(initial=0) > 4095:
            raise ValueError("12-bit pixels must be in [0, 4095]")
        mid = 2048.0
    else:
        raise ValueError("precision must be 8 or 12")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _scale_quant(QUANT_LUM, quality)
    qc = _scale_quant(QUANT_CHROM, quality)
    if precision == 12:
        ql = np.minimum(ql.astype(np.int64) * 16, 65535)
        qc = np.minimum(qc.astype(np.int64) * 16, 65535)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        y, cb, cr = _rgb_to_ycbcr(img, mid)
        if subsampling == "4:4:4":
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "4:2:0":
            he, we = h + (h & 1), w + (w & 1)
            cbp = _pad_to(cb, he, we).reshape(he // 2, 2, we // 2, 2) \
                                     .mean(axis=(1, 3))
            crp = _pad_to(cr, he, we).reshape(he // 2, 2, we // 2, 2) \
                                     .mean(axis=(1, 3))
            planes, samp = [y, cbp, crp], [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qtabs = [ql, qc]
    comp_blocks = []
    for plane, (sh, sv), qi in zip(planes, samp, qsel):
        comp_blocks.append(_plane_to_blocks(
            _pad_to(plane, mcus_y * sv * 8, mcus_x * sh * 8), qtabs[qi],
            mid))

    dc_tabs = [_canonical_codes(DC_LUM_BITS, DC_LUM_VALS),
               _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)]
    ac_tabs = [_canonical_codes(AC_LUM_BITS, AC_LUM_VALS),
               _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)]
    ncomp = len(planes)
    tabsel = [0] + [1] * (ncomp - 1)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + (len(body) + 2).to_bytes(2, "big") \
            + body

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        zzvals = tbl.reshape(64)[ZIGZAG]
        if precision == 12:                  # Pq=1: 16-bit big-endian
            return seg(0xDB, bytes((0x10 | tid,))
                       + zzvals.astype(">u2").tobytes())
        return seg(0xDB, bytes((tid,)) + bytes(zzvals.tolist()))

    out = bytearray(b"\xff\xd8")                      # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)
    sof = bytearray((precision).to_bytes(1, "big"))
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes((ci + 1, (sh << 4) | sv, qsel[ci]))
    # 12-bit sequential is an extended SOF1 frame (baseline SOF0 is
    # 8-bit by definition, T.81 Table B.2)
    seq_marker = 0xC1 if precision == 12 else 0xC0
    out += seg(0xC2 if progressive else seq_marker, bytes(sof))

    if progressive:
        if restart_interval:
            raise ValueError(
                "restart_interval is not supported with progressive=True")
        for cls, tid, bits, vals in (
                (0, 0, DC_LUM_BITS, DC_LUM_VALS),
                (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
                (1, 0, AC_PROG_BITS, AC_PROG_VALS)):
            if gray and tid == 1:
                continue
            out += seg(0xC4, bytes(((cls << 4) | tid,)) + bytes(bits)
                       + bytes(vals))
        ac_prog = _canonical_codes(AC_PROG_BITS, AC_PROG_VALS)
        # actual per-component block dims (non-interleaved AC scans
        # code only these, not the MCU-padded grid)
        dims = []
        for sh, sv in samp:
            comp_w = -(-w * sh // hmax)
            comp_h = -(-h * sv // vmax)
            dims.append((-(-comp_h // 8), -(-comp_w // 8)))

        def sos_hdr(comp_ids: list, ss: int, se: int, ah: int,
                    al: int) -> bytes:
            body = bytearray([len(comp_ids)])
            for ci in comp_ids:
                body += bytes((ci + 1, (tabsel[ci] << 4) | 0))
            body += bytes((ss, se, (ah << 4) | al))
            return seg(0xDA, bytes(body))

        def entropy(fn, *args) -> bytes:
            bw = _BitWriter()
            fn(bw, *args)
            bw.pad_to_byte()
            return bytes(bw.buf)

        all_ids = list(range(ncomp))
        out += sos_hdr(all_ids, 0, 0, 0, 1)
        out += entropy(_enc_dc_scan, comp_blocks, samp, dc_tabs, tabsel,
                       mcus_y, mcus_x, 1, False)
        for ci in all_ids:
            ch_, cw_ = dims[ci]
            out += sos_hdr([ci], 1, 63, 0, 1)
            out += entropy(_enc_ac_first,
                           _comp_zz_iter(comp_blocks[ci], ch_, cw_),
                           ac_prog, 1, 63, 1)
        for ci in all_ids:
            ch_, cw_ = dims[ci]
            out += sos_hdr([ci], 1, 63, 1, 0)
            out += entropy(_enc_ac_refine,
                           _comp_zz_iter(comp_blocks[ci], ch_, cw_),
                           ac_prog, 1, 63, 0)
        out += sos_hdr(all_ids, 0, 0, 1, 0)
        out += entropy(_enc_dc_scan, comp_blocks, samp, dc_tabs, tabsel,
                       mcus_y, mcus_x, 0, True)
        out += b"\xff\xd9"                             # EOI
        return bytes(out)

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_i = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                hsel = tabsel[ci]
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_blocks[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci],
                            dc_tabs[hsel], ac_tabs[hsel])
            mcu_i += 1
            if (restart_interval and mcu_i % restart_interval == 0
                    and mcu_i < mcus_x * mcus_y):
                bw.raw_marker(0xD0 + rst)
                rst = (rst + 1) & 7
                preds = [0] * len(planes)
    bw.pad_to_byte()

    for cls, tid, bits, vals in (
            (0, 0, DC_LUM_BITS, DC_LUM_VALS),
            (1, 0, AC_LUM_BITS, AC_LUM_VALS),
            (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
            (1, 1, AC_CHROM_BITS, AC_CHROM_VALS)):
        if gray and tid == 1:
            continue
        out += seg(0xC4, bytes(((cls << 4) | tid,)) + bytes(bits)
                   + bytes(vals))
    if restart_interval:
        out += seg(0xDD, int(restart_interval).to_bytes(2, "big"))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        tsel = tabsel[ci]
        sos += bytes((ci + 1, (tsel << 4) | tsel))
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += bw.buf
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# Lossless (Annex H) difference categories run 0..16; the Annex-K DC
# tables stop at 11. A flat canonical table carrying all 17 symbols at
# 5 bits is valid for any lossless scan (17/32 < 1 Kraft slack).
LL_DC_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
LL_DC_VALS = list(range(17))


def _lossless_predict(plane: np.ndarray, y: int, x: int, sel: int,
                      default: int) -> int:
    """T.81 H.1.2.1 sample prediction: first sample uses the default
    (2^(P-Pt-1)), the rest of the first line predictor 1 (Ra), the
    first column predictor 2 (Rb), everything else the scan's selected
    predictor over Ra=left, Rb=above, Rc=above-left."""
    if sel == 0:
        return 0        # differential frames: no prediction (Table H.1)
    if y == 0:
        return default if x == 0 else int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    ra, rb, rc = (int(plane[y, x - 1]), int(plane[y - 1, x]),
                  int(plane[y - 1, x - 1]))
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {sel}")


def _scan_lossless(br: _BitReader, frame: dict, comps: list,
                   hdc: dict, sel: int, pt: int) -> None:
    """Lossless sequential scan (T.81 Annex H): per-sample Huffman
    difference category from the DC table, EXTEND, prediction add
    modulo 2^16 (H.1.2.3). Interleaved raster over 1x1-sampled
    components (lossless MCU = one sample per component)."""
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError(
            "lossless scan supports 1x1 sampling factors only")
    if frame.get("diff"):
        if sel != 0:
            raise ValueError(
                "differential lossless scans require predictor 0 "
                "(Table H.1)")
    elif sel == 0:
        raise ValueError("predictor 0 is differential-frame-only")
    default = 1 << (frame["prec"] - pt - 1)
    h, w = frame["h"], frame["w"]
    tabs = []
    for c in comps:
        t = hdc.get(c["dc"])
        if t is None:
            raise ValueError("scan uses undefined Huffman table")
        tabs.append(t)
    planes = [c["plane"] for c in comps]
    for y in range(h):
        for x in range(w):
            for c, tab, plane in zip(comps, tabs, planes):
                s = _decode_huff(br, tab)
                if s == 16:
                    diff = 32768       # SSSS=16: no extra bits (H.1.2.2)
                else:
                    diff = _extend(br.bits(s), s)
                pred = _lossless_predict(plane, y, x, sel, default)
                plane[y, x] = (pred + diff) & 0xFFFF


def _write_lossless_diff(bw: _BitWriter, tab: dict, raw: int) -> None:
    """Code one Annex-H difference: fold to [-32768, 32767] (mod-2^16
    arithmetic, H.1.2.3), with the SSSS=16 no-extra-bits escape for
    -32768 (H.1.2.2)."""
    dv = raw & 0xFFFF
    if dv >= 32768:
        dv -= 65536
    if dv == -32768:
        hc, hl = tab[16]
        bw.write(hc, hl)
        return
    s, code = _magnitude(dv)
    hc, hl = tab[s]
    bw.write(hc, hl)
    bw.write(code, s)


def encode_jpeg_lossless(img: np.ndarray, predictor: int = 1,
                         point_transform: int = 0,
                         arith: bool = False,
                         dc_conditioning: tuple[int, int] = (0, 1)
                         ) -> bytes:
    """Lossless JPEG (T.81 Annex H) encoder — fixture partner of the
    lossless decode path. uint8 (P=8) or uint16 (P=16) gray (H,W)
    or 3-channel (H,W,3); 3-channel payloads code the channels as
    three 1x1 components directly (no color transform — lossless must
    roundtrip bit-exactly). With ``point_transform`` Pt > 0, samples
    are coded at precision P-Pt and decode to ``(x >> Pt) << Pt``.

    ``arith=True`` emits SOF11 (arithmetic-coded, Annex D QM coder +
    H.2 statistical model) with a DAC segment carrying
    ``dc_conditioning`` = (L, U); otherwise SOF3 (Huffman)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        prec = 8
    elif img.dtype == np.uint16:
        prec = 16
    else:
        raise ValueError("encode_jpeg_lossless expects uint8/uint16")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be in 1..7")
    h, w = img.shape[:2]
    chans = [img] if img.ndim == 2 else \
        [img[:, :, i] for i in range(img.shape[2])]
    ncomp = len(chans)
    tab = _canonical_codes(LL_DC_BITS, LL_DC_VALS)
    default = 1 << (prec - point_transform - 1)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + (len(body) + 2).to_bytes(2, "big") \
            + body

    out = bytearray(b"\xff\xd8")
    if arith:
        dcL, dcU = dc_conditioning
        if not (0 <= dcL <= 15 and 0 <= dcU <= 15):
            raise ValueError("DAC conditioning values must be 0..15")
        out += seg(0xCC, bytes((0x00, (dcU << 4) | dcL)))
    else:
        out += seg(0xC4, bytes((0x00,)) + bytes(LL_DC_BITS)
                   + bytes(LL_DC_VALS))
    sof = bytearray([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes((ci + 1, 0x11, 0))
    out += seg(0xCB if arith else 0xC3, bytes(sof))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes((ci + 1, 0x00))
    sos += bytes((predictor, 0, point_transform))
    out += seg(0xDA, bytes(sos))

    planes = [(c.astype(np.int64) >> point_transform) for c in chans]
    if arith:
        enc = _ArithEncoder()
        st = bytearray(_LL_STATS_BINS)     # one DAC table -> shared bins
        above = [bytearray(w) for _ in planes]
        left = [0] * len(planes)
        for y in range(h):
            for ci in range(len(planes)):
                left[ci] = 0
            for x in range(w):
                for ci, plane in enumerate(planes):
                    pred = _lossless_predict(plane, y, x, predictor,
                                             default)
                    kb = above[ci][x]
                    cls = _arith_write_diff(
                        enc, st, 4 * (5 * left[ci] + kb),
                        100 + (29 if kb > 2 else 0),
                        int(plane[y, x]) - pred, dcL, dcU)
                    above[ci][x] = cls
                    left[ci] = cls
        out += enc.flush()
        out += b"\xff\xd9"
        return bytes(out)
    bw = _BitWriter()
    for y in range(h):
        for x in range(w):
            for plane in planes:
                pred = _lossless_predict(plane, y, x, predictor, default)
                _write_lossless_diff(bw, tab, int(plane[y, x]) - pred)
    bw.pad_to_byte()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """Encoder-side pyramid reduction: 2x2 mean with edge-replicated
    odd rows/columns (the downsampling filter is an encoder choice,
    T.81 J.1.1.1 note — only EXP's upsampler is normative)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h & 1), (0, w & 1)), mode="edge")
    return p.reshape((h + (h & 1)) // 2, 2, (w + (w & 1)) // 2, 2) \
            .mean(axis=(1, 3))


def encode_jpeg_hierarchical(img: np.ndarray, quality: int = 85,
                             levels: int = 2,
                             progressive: bool = False,
                             final_lossless: bool = False,
                             arith: bool = False) -> bytes:
    """Hierarchical (T.81 Annex J) encoder — the fixture partner of the
    Annex-J decode path, the role `encode_webp_lossless` plays for
    VP8L (no third-party hierarchical codec exists: libjpeg never
    implemented Annex J).

    Emits DHP, then a non-differential SOF0 frame at 1/2^(levels-1)
    resolution, then per level an EXP(1,1) segment and a differential
    SOF5 frame coding `level_image - EXP(reference)` with no level
    shift (scan coding itself is the unchanged sequential Huffman
    procedure, DC prediction included). The encoder tracks the
    decoder's reconstruction exactly (same IDCT, same EXP filter, same
    round+clamp), so the coded difference is against what the decoder
    will actually hold. 8-bit gray or RGB (4:4:4).

    ``progressive=True`` emits SOF2/SOF6 frames with the standard
    simple scan script instead, exercising the progressive-differential
    decode path (the scripts reconstruct the exact quantized
    coefficients, so the pixel results are identical to the sequential
    twin — the same lossless-entropy argument tests/test_jpeg.py pins
    for non-hierarchical progressive).

    ``final_lossless=True`` appends a SOF7 differential LOSSLESS frame
    (predictor 0, modulo-2^16 correction — Annex J's documented
    "lossless refinement of a lossy pyramid" use): the decode then
    reproduces the coded component samples EXACTLY — bit-exact for
    gray; for RGB exact in the coded YCbCr domain (the color transform
    itself rounds +-1 each way).

    ``arith=True`` swaps every frame's entropy coding for the Annex-D
    QM coder: SOF9 initial + SOF13 differential (sequential), SOF10 +
    SOF14 (progressive), SOF15 for the final lossless refinement —
    the three arithmetic-differential frame types no third-party
    encoder anywhere emits (the r10 seam this twin closes). Scan
    structure, DCT pipeline, EXP folds, and the decoder-tracking
    reconstruction are IDENTICAL to the Huffman path — only the
    entropy layer changes, so the Huffman twin's pixel pins carry
    over verbatim."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg_hierarchical expects uint8 pixels")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _scale_quant(QUANT_LUM, quality)
    qc = _scale_quant(QUANT_CHROM, quality)
    if gray:
        full_planes = [img.astype(np.float64)]
        qsel = [0]
    else:
        y, cb, cr = _rgb_to_ycbcr(img, 128.0)
        full_planes = [y, cb, cr]
        qsel = [0, 1, 1]
    ncomp = len(full_planes)
    qtabs = [ql, qc]
    tabsel = [0] + [1] * (ncomp - 1)
    dc_tabs = [_canonical_codes(DC_LUM_BITS, DC_LUM_VALS),
               _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)]
    ac_tabs = [_canonical_codes(AC_LUM_BITS, AC_LUM_VALS),
               _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)]

    # image pyramid, full resolution first
    pyramids = [[p] for p in full_planes]
    for _ in range(levels - 1):
        for pyr in pyramids:
            pyr.append(_downsample2(pyr[-1]))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + (len(body) + 2).to_bytes(2, "big") \
            + body

    def frame_hdr(marker: int, fh: int, fw: int) -> bytes:
        body = bytearray([8]) + fh.to_bytes(2, "big") \
            + fw.to_bytes(2, "big") + bytes([ncomp])
        for ci in range(ncomp):
            body += bytes((ci + 1, 0x11, qsel[ci]))
        return seg(marker, bytes(body))

    ac_prog = _canonical_codes(AC_PROG_BITS, AC_PROG_VALS)

    def sos_hdr(comp_ids: list, ss: int, se: int, ah: int,
                al: int) -> bytes:
        body = bytearray([len(comp_ids)])
        for ci in comp_ids:
            t = tabsel[ci]
            body += bytes((ci + 1, (t << 4) | (t if not progressive
                                               else 0)))
        body += bytes((ss, se, (ah << 4) | al))
        return seg(0xDA, bytes(body))

    def entropy(fn, *args) -> bytes:
        bw = _BitWriter()
        fn(bw, *args)
        bw.pad_to_byte()
        return bytes(bw.buf)

    def encode_frame(planes_lvl: list, fh: int, fw: int,
                     diff: bool) -> tuple[bytes, list]:
        """Scans over 4:4:4 components (sequential single scan, or the
        simple progressive script); returns scan-header+entropy bytes
        and each component's quantized blocks (for the encoder's
        decoder-tracking reconstruction)."""
        mcus_x, mcus_y = -(-fw // 8), -(-fh // 8)
        comp_blocks = [
            _plane_to_blocks(_pad_to(p, mcus_y * 8, mcus_x * 8),
                             qtabs[qi], 0.0 if diff else 128.0)
            for p, qi in zip(planes_lvl, qsel)]
        data = bytearray()
        if progressive:
            samp = [(1, 1)] * ncomp
            dims = [(mcus_y, mcus_x)] * ncomp
            all_ids = list(range(ncomp))

            def ari(fn, *args) -> bytes:
                enc = _ArithEncoder()
                fn(enc, *args)
                return enc.flush()

            data += sos_hdr(all_ids, 0, 0, 0, 1)
            if arith:
                data += ari(_enc_arith_dc_scan, comp_blocks, tabsel,
                            ARI_CONDS, mcus_y, mcus_x, 1, False)
            else:
                data += entropy(_enc_dc_scan, comp_blocks, samp, dc_tabs,
                                tabsel, mcus_y, mcus_x, 1, False)
            for ci in all_ids:
                ch_, cw_ = dims[ci]
                data += sos_hdr([ci], 1, 63, 0, 1)
                if arith:              # Ta=0 -> conditioning table 0
                    data += ari(_enc_arith_ac_first,
                                _comp_zz_iter(comp_blocks[ci], ch_, cw_),
                                1, 63, 1, ARI_CONDS[0][2])
                else:
                    data += entropy(
                        _enc_ac_first,
                        _comp_zz_iter(comp_blocks[ci], ch_, cw_),
                        ac_prog, 1, 63, 1)
            for ci in all_ids:
                ch_, cw_ = dims[ci]
                data += sos_hdr([ci], 1, 63, 1, 0)
                if arith:
                    data += ari(_enc_arith_ac_refine,
                                _comp_zz_iter(comp_blocks[ci], ch_, cw_),
                                1, 63, 0)
                else:
                    data += entropy(
                        _enc_ac_refine,
                        _comp_zz_iter(comp_blocks[ci], ch_, cw_),
                        ac_prog, 1, 63, 0)
            data += sos_hdr(all_ids, 0, 0, 1, 0)
            if arith:
                data += ari(_enc_arith_dc_scan, comp_blocks, tabsel,
                            ARI_CONDS, mcus_y, mcus_x, 0, True)
            else:
                data += entropy(_enc_dc_scan, comp_blocks, samp, dc_tabs,
                                tabsel, mcus_y, mcus_x, 0, True)
            return bytes(data), comp_blocks
        data += sos_hdr(list(range(ncomp)), 0, 63, 0, 0)
        if arith:
            enc = _ArithEncoder()
            _enc_arith_sequential(enc, comp_blocks, tabsel, ARI_CONDS,
                                  mcus_y, mcus_x)
            data += enc.flush()
            return bytes(data), comp_blocks
        bw = _BitWriter()
        preds = [0] * ncomp
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    preds[ci] = _encode_block(
                        bw, comp_blocks[ci][my, mx], preds[ci],
                        dc_tabs[tabsel[ci]], ac_tabs[tabsel[ci]])
        bw.pad_to_byte()
        data += bytes(bw.buf)
        return bytes(data), comp_blocks

    def reconstruct(comp_blocks: list, fh: int, fw: int,
                    diff: bool) -> list:
        """Exactly the decoder's `_frame_planes`: dequant + IDCT (+128
        for non-differential), cropped to frame dims."""
        out = []
        for blocks, qi in zip(comp_blocks, qsel):
            zz = blocks.reshape(-1, 64)
            coef = np.zeros_like(zz, dtype=np.float64)
            coef[:, ZIGZAG] = zz * qtabs[qi].reshape(64)[ZIGZAG][None, :]
            pix = _idct2_batch(coef.reshape(-1, 8, 8))
            if not diff:
                pix = pix + 128.0
            by, bx = blocks.shape[:2]
            plane = (pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
                     .reshape(by * 8, bx * 8))
            out.append(plane[:fh, :fw])
        return out

    out = bytearray(b"\xff\xd8")                      # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid in range(2 if not gray else 1):
        zzvals = qtabs[tid].reshape(64)[ZIGZAG]
        out += seg(0xDB, bytes((tid,)) + bytes(zzvals.tolist()))
    if arith:
        # DAC: DC conditioning (L, U) = ARI_CONDS[t][:2], AC Kx per
        # conditioning table (decoder default values, stated explicitly)
        dac = bytearray()
        for tid in range(2 if not gray else 1):
            dcL, dcU, acK = ARI_CONDS[tid]
            dac += bytes((0x00 | tid, (dcU << 4) | dcL))
            dac += bytes((0x10 | tid, acK))
        out += seg(0xCC, bytes(dac))
    else:
        if progressive:
            tables = [(0, 0, DC_LUM_BITS, DC_LUM_VALS),
                      (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
                      (1, 0, AC_PROG_BITS, AC_PROG_VALS)]
        else:
            tables = [(0, 0, DC_LUM_BITS, DC_LUM_VALS),
                      (1, 0, AC_LUM_BITS, AC_LUM_VALS),
                      (0, 1, DC_CHROM_BITS, DC_CHROM_VALS),
                      (1, 1, AC_CHROM_BITS, AC_CHROM_VALS)]
        for cls, tid, bits, vals in tables:
            if gray and tid == 1:
                continue
            out += seg(0xC4, bytes(((cls << 4) | tid,)) + bytes(bits)
                       + bytes(vals))
    out += frame_hdr(0xDE, h, w)                      # DHP

    if arith:
        first_marker = 0xCA if progressive else 0xC9
        diff_marker = 0xCE if progressive else 0xCD
    else:
        first_marker = 0xC2 if progressive else 0xC0
        diff_marker = 0xC6 if progressive else 0xC5
    refs = None
    for lvl in range(levels - 1, -1, -1):
        planes_lvl = [pyr[lvl] for pyr in pyramids]
        fh, fw = planes_lvl[0].shape
        if refs is None:                              # initial frame
            out += frame_hdr(first_marker, fh, fw)
            data, blocks = encode_frame(planes_lvl, fh, fw, diff=False)
            out += data
            refs = [np.clip(np.round(p), 0, 255)
                    for p in reconstruct(blocks, fh, fw, diff=False)]
        else:                                         # differential
            out += seg(0xDF, b"\x11")                 # EXP(1, 1)
            refs = [_exp_expand(r, 1, 1)[:fh, :fw] for r in refs]
            diffs = [p - r for p, r in zip(planes_lvl, refs)]
            out += frame_hdr(diff_marker, fh, fw)
            data, blocks = encode_frame(diffs, fh, fw, diff=True)
            out += data
            refs = [np.clip(np.round(r + d), 0, 255) for r, d in
                    zip(refs, reconstruct(blocks, fh, fw, diff=True))]
    if final_lossless:
        # SOF7/SOF15 lossless refinement: code (target - reference)
        # mod 2^16 per sample with predictor 0 — the decoder's fold
        # reproduces the targets exactly
        targets = [np.clip(np.round(p), 0, 255).astype(np.int64)
                   for p in full_planes]
        refs_i = [np.round(r).astype(np.int64) for r in refs]
        if arith:
            out += frame_hdr(0xCF, h, w)
            sosll = bytearray([ncomp])
            for ci in range(ncomp):
                sosll += bytes((ci + 1, 0x00))        # cond table 0
            sosll += bytes((0, 0, 0))                 # Ss=0 (pred 0)
            out += seg(0xDA, bytes(sosll))
            # H.2 model, prediction 0: same interleave / context /
            # bank layout as `_scan_arith_lossless` (all components
            # select conditioning table 0 -> ONE shared stats bank)
            dcL, dcU, _ = ARI_CONDS[0]
            enc = _ArithEncoder()
            st = bytearray(_LL_STATS_BINS)
            above = [bytearray(w) for _ in targets]
            left = [0] * len(targets)
            for y in range(h):
                for ci in range(len(targets)):
                    left[ci] = 0
                for x in range(w):
                    for ci, (t, r) in enumerate(zip(targets, refs_i)):
                        kb = above[ci][x]
                        cls = _arith_write_diff(
                            enc, st, 4 * (5 * left[ci] + kb),
                            100 + (29 if kb > 2 else 0),
                            int(t[y, x]) - int(r[y, x]), dcL, dcU)
                        above[ci][x] = cls
                        left[ci] = cls
            out += enc.flush()
        else:
            out += seg(0xC4, bytes((0x02,)) + bytes(LL_DC_BITS)
                       + bytes(LL_DC_VALS))
            out += frame_hdr(0xC7, h, w)
            sos7 = bytearray([ncomp])
            for ci in range(ncomp):
                sos7 += bytes((ci + 1, 0x20))         # Td=2, Ta=0
            sos7 += bytes((0, 0, 0))                  # Ss=0 (pred 0)
            out += seg(0xDA, bytes(sos7))
            lltab = _canonical_codes(LL_DC_BITS, LL_DC_VALS)
            bw = _BitWriter()
            for y in range(h):
                for x in range(w):
                    for t, r in zip(targets, refs_i):
                        _write_lossless_diff(bw, lltab,
                                             int(t[y, x]) - int(r[y, x]))
            bw.pad_to_byte()
            out += bw.buf
    out += b"\xff\xd9"                                # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------


def _expect_restart(br: _BitReader) -> None:
    """Byte-align and consume one RSTn marker (optional fill FFs)."""
    d = br.d
    br.align()
    while (br.i + 1 < len(d) and d[br.i] == 0xFF
           and d[br.i + 1] == 0xFF):
        br.i += 1
    if not (br.i + 1 < len(d) and d[br.i] == 0xFF
            and 0xD0 <= d[br.i + 1] <= 0xD7):
        raise ValueError("expected restart marker")
    br.i += 2


def _skip_to_marker(d: bytes, i: int) -> int:
    """Advance past entropy pad bytes/stuffing to the next marker; at
    end-of-data returns len(d) (decode_jpeg treats exhausted input
    after a complete scan as an implicit EOI)."""
    while i + 1 < len(d):
        if d[i] == 0xFF and d[i + 1] != 0x00:
            return i
        i += 1
    return len(d)


def _scan_units(frame: dict, comps: list):
    """Yield entropy-coded units: interleaved MCUs when the scan has
    several components (each unit = every component's v*h blocks), one
    block per unit in component raster order (ACTUAL block dims cw*ch,
    not the MCU-padded grid) for single-component scans — T.81 A.2."""
    if len(comps) > 1:
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                unit = []
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit.append((c, my * c["v"] + by,
                                         mx * c["h"] + bx))
                yield unit
    else:
        c = comps[0]
        for by in range(c["ch"]):
            for bx in range(c["cw"]):
                yield [(c, by, bx)]


def _scan_sequential(br: _BitReader, frame: dict, comps: list,
                     hdc: dict, hac: dict, ri: int) -> None:
    """One baseline (DC+AC full-band) scan, interleaved or not."""
    preds = {c["id"]: 0 for c in comps}
    for u_i, unit in enumerate(_scan_units(frame, comps)):
        if ri and u_i and u_i % ri == 0:
            _expect_restart(br)
            preds = {c["id"]: 0 for c in comps}
        for c, by, bx in unit:
            dctab, actab = hdc.get(c["dc"]), hac.get(c["ac"])
            if dctab is None or actab is None:
                raise ValueError("scan uses undefined Huffman table")
            zz = c["zz"][by, bx]
            s = _decode_huff(br, dctab)
            diff = _extend(br.bits(s), s)
            preds[c["id"]] += diff
            zz[0] = preds[c["id"]]
            k = 1
            while k < 64:
                rs = _decode_huff(br, actab)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break                             # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _extend(br.bits(s), s)
                k += 1


def _scan_dc_first(br: _BitReader, frame: dict, comps: list,
                   hdc: dict, ri: int, al: int) -> None:
    """Progressive DC first scan: diffs of the point-transformed
    (arithmetic-shifted) DC values, stored pre-shifted back by Al."""
    preds = {c["id"]: 0 for c in comps}
    for u_i, unit in enumerate(_scan_units(frame, comps)):
        if ri and u_i and u_i % ri == 0:
            _expect_restart(br)
            preds = {c["id"]: 0 for c in comps}
        for c, by, bx in unit:
            dctab = hdc.get(c["dc"])
            if dctab is None:
                raise ValueError("scan uses undefined Huffman table")
            s = _decode_huff(br, dctab)
            preds[c["id"]] += _extend(br.bits(s), s)
            c["zz"][by, bx][0] = preds[c["id"]] << al


def _scan_dc_refine(br: _BitReader, frame: dict, comps: list,
                    ri: int, al: int) -> None:
    """Progressive DC refinement: one appended bit per block (no
    Huffman coding), ORed in at position Al — exact for negative DCs
    under two's complement."""
    p1 = 1 << al
    for u_i, unit in enumerate(_scan_units(frame, comps)):
        if ri and u_i and u_i % ri == 0:
            _expect_restart(br)
        for c, by, bx in unit:
            if br.bit():
                c["zz"][by, bx][0] |= p1


def _scan_ac_first(br: _BitReader, c: dict, hac: dict, ri: int,
                   ss: int, se: int, al: int) -> None:
    """Progressive AC first scan over one component's band [Ss, Se]:
    run/size symbols with EOBn run-length codes (T.81 G.1.2.2)."""
    actab = hac.get(c["ac"])
    if actab is None:
        raise ValueError("scan uses undefined Huffman table")
    eobrun = 0
    u_i = 0
    for by in range(c["ch"]):
        for bx in range(c["cw"]):
            if ri and u_i and u_i % ri == 0:
                _expect_restart(br)
                eobrun = 0
            u_i += 1
            if eobrun:
                eobrun -= 1
                continue
            zz = c["zz"][by, bx]
            k = ss
            while k <= se:
                rs = _decode_huff(br, actab)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r < 15:                        # EOBn
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += 16                           # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run past band end")
                zz[k] = _extend(br.bits(s), s) << al
                k += 1


def _scan_ac_refine(br: _BitReader, c: dict, hac: dict, ri: int,
                    ss: int, se: int, al: int) -> None:
    """Progressive AC refinement (T.81 G.1.2.3 / figure G.7): newly
    significant coefficients arrive as ±1<<Al with zero-history run
    lengths; every already-nonzero coefficient crossed appends one
    correction bit; EOBn runs carry the correction bits for the
    remainder of each block in the run."""
    actab = hac.get(c["ac"])
    if actab is None:
        raise ValueError("scan uses undefined Huffman table")
    p1, m1 = 1 << al, -1 << al
    eobrun = 0
    u_i = 0
    for by in range(c["ch"]):
        for bx in range(c["cw"]):
            if ri and u_i and u_i % ri == 0:
                _expect_restart(br)
                eobrun = 0
            u_i += 1
            zz = c["zz"][by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_huff(br, actab)
                    r, s = rs >> 4, rs & 15
                    val = 0
                    if s == 0:
                        if r < 15:                    # EOBn (this block
                            eobrun = 1 << r           # included in run)
                            if r:
                                eobrun += br.bits(r)
                            break
                        # r == 15: ZRL — skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid magnitude in AC refinement")
                        val = p1 if br.bit() else m1
                    # advance over r zero-history coefficients,
                    # correcting already-nonzero ones along the way
                    while k <= se:
                        if zz[k] != 0:
                            if br.bit() and (int(zz[k]) & p1) == 0:
                                zz[k] += p1 if zz[k] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        zz[k] = val
                    k += 1
            if eobrun > 0:
                # within an EOB run only correction bits appear
                while k <= se:
                    if zz[k] != 0:
                        if br.bit() and (int(zz[k]) & p1) == 0:
                            zz[k] += p1 if zz[k] > 0 else m1
                    k += 1
                eobrun -= 1


# ---------------------------------------------- arithmetic decoding


def _load_aritab():
    """(qe, next_mps, next_lps, switch) int arrays from the packed
    Table D.3 module (see tools/extract_jpeg_aritab.py)."""
    from .jpeg_aritab import JPEG_ARITAB as t
    qe = (t >> 16).astype(int).tolist()
    nm = ((t >> 8) & 0xFF).astype(int).tolist()
    nl = (t & 0x7F).astype(int).tolist()
    sw = ((t >> 7) & 1).astype(int).tolist()
    return qe, nm, nl, sw


_ARI_QE, _ARI_NM, _ARI_NL, _ARI_SW = _load_aritab()


class _ArithDecoder:
    """ITU T.81 Annex G / F.2.2 arithmetic decoder over a JPEG
    entropy-coded segment (libjpeg register convention: 32-bit C
    register fed bytewise under a bit counter, A renormalized to
    >= 0x8000, Qe compared against (A - Qe) << ct).

    Statistics bins are bytearrays of (mps << 7) | state_index.
    0xFF-stuffing is undone; a real marker ends the segment (further
    reads stuff zero bytes) and its position is left in ``marker``.
    """

    __slots__ = ("d", "i", "end", "marker", "c", "a", "ct")

    def __init__(self, d: bytes, i: int):
        self.d = d
        self.i = i
        self.end = len(d)
        self.marker = None
        self.c = 0
        self.a = 0
        self.ct = -16

    def _byte(self) -> int:
        if self.marker is not None:
            return 0
        d, i = self.d, self.i
        if i >= self.end:
            self.marker = self.end
            return 0
        b = d[i]
        i += 1
        if b == 0xFF:
            j = i
            while j < self.end and d[j] == 0xFF:
                j += 1
            if j < self.end and d[j] == 0x00:
                self.i = j + 1                 # stuffed zero: data 0xFF
                return 0xFF
            self.marker = i - 1                # marker terminates data
            return 0
        self.i = i
        return b

    def decode(self, st: bytearray, k: int) -> int:
        a, c, ct = self.a, self.c, self.ct
        # renormalization & data feeding (F.2.2.4)
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                c = ((c << 8) | self._byte()) & 0xFFFFFFFF
                ct += 8
                if ct < 0:
                    ct += 1
                    if ct == 0:
                        a = 0x10000
                        continue
            a <<= 1
        sv = st[k]
        idx = sv & 0x7F
        qe = _ARI_QE[idx]
        temp = a - qe
        a = temp
        temp = (temp << ct) & 0xFFFFFFFF
        if c >= temp:
            c -= temp
            # conditional LPS exchange
            if a < qe:
                st[k] = (sv & 0x80) | _ARI_NM[idx]
            else:
                st[k] = ((sv & 0x80) ^ (0x80 if _ARI_SW[idx] else 0)) \
                    | _ARI_NL[idx]
                sv ^= 0x80
            a = qe
        elif a < 0x8000:
            # conditional MPS exchange
            if a < qe:
                st[k] = ((sv & 0x80) ^ (0x80 if _ARI_SW[idx] else 0)) \
                    | _ARI_NL[idx]
                sv ^= 0x80
            else:
                st[k] = (sv & 0x80) | _ARI_NM[idx]
        self.a, self.c, self.ct = a, c, ct
        return sv >> 7


class _ArithEncoder:
    """ITU T.81 Annex D arithmetic ENCODER — the fixture partner of
    `_ArithDecoder` (same packed Table D.3 state machine, same libjpeg
    register convention: CT=11 spacer bits, byte-out at C>>19, 0x00
    stuffing after data 0xFF, carry propagated over stacked 0xFF
    bytes, D.1.8 termination picking the trailing-zero-richest code
    point). Exists so arithmetic modes with no third-party encoder in
    this container (lossless SOF11 — libjpeg62 has no Annex-H support)
    can still be pinned by entropy-twin tests."""

    __slots__ = ("a", "c", "ct", "buffer", "sc", "zc", "out")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1        # pending byte (may still take a carry)
        self.sc = 0             # stacked 0xFF bytes (carry-convertible)
        self.zc = 0             # pending 0x00 bytes
        self.out = bytearray()

    def _pending(self):
        while self.zc:
            self.out.append(0)
            self.zc -= 1

    def encode(self, st: bytearray, k: int, val: int) -> None:
        sv = st[k]
        idx = sv & 0x7F
        qe = _ARI_QE[idx]
        self.a -= qe
        if val != (sv >> 7):
            # LPS path (conditional exchange, Figure D.4)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            st[k] = ((sv & 0x80) ^ (0x80 if _ARI_SW[idx] else 0)) \
                | _ARI_NL[idx]
        else:
            # MPS path: state moves only when renormalization happens
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[k] = (sv & 0x80) | _ARI_NM[idx]
        while True:                       # Renorm_e + Byteout (D.1.6)
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                temp = self.c >> 19
                if temp > 0xFF:           # carry over the buffered run
                    if self.buffer >= 0:
                        self._pending()
                        self.out.append(self.buffer + 1)
                        if self.buffer + 1 == 0xFF:
                            self.out.append(0)
                    self.zc += self.sc    # carry turns 0xFFs into 0x00s
                    self.sc = 0
                    self.buffer = temp & 0xFF
                elif temp == 0xFF:
                    self.sc += 1          # stack: may still carry
                else:
                    if self.buffer == 0:
                        self.zc += 1
                    elif self.buffer >= 0:
                        self._pending()
                        self.out.append(self.buffer)
                    if self.sc:
                        self._pending()
                        while self.sc:
                            self.out += b"\xff\x00"
                            self.sc -= 1
                    self.buffer = temp
                self.c &= 0x7FFFF
                self.ct += 8
            if self.a >= 0x8000:
                break

    def flush(self) -> bytes:
        """D.1.8 termination: clear final bits, drain the buffer, and
        return the entropy-coded bytes (0xFF00-stuffed)."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:           # final carry
            if self.buffer >= 0:
                self._pending()
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._pending()
                self.out.append(self.buffer)
            if self.sc:
                self._pending()
                while self.sc:
                    self.out += b"\xff\x00"
                    self.sc -= 1
        if self.c & 0x7FFF800:            # final bytes, unless zero
            self._pending()
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0)
        return bytes(self.out)


def _arith_restart(ad: "_ArithDecoder", d: bytes, expected: int):
    """Find and consume the RSTn marker terminating the current
    interval; returns a fresh decoder positioned after it."""
    i = ad.marker if ad.marker is not None else ad.i
    while i + 1 < len(d) and not (d[i] == 0xFF and d[i + 1] != 0x00):
        i += 1
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    # skip the run so the marker code byte itself gets classified.
    while i + 2 < len(d) and d[i + 1] == 0xFF:
        i += 1
    if not (i + 1 < len(d) and d[i] == 0xFF
            and 0xD0 <= d[i + 1] <= 0xD7):
        raise ValueError("expected restart marker in arithmetic scan")
    if d[i + 1] != 0xD0 + expected:
        raise ValueError("restart marker out of sequence")
    return _ArithDecoder(d, i + 2)


def _scan_arith_sequential(ad: "_ArithDecoder", frame: dict,
                           comps: list, cond: dict, ri: int):
    """Sequential DC+AC arithmetic scan (T.81 §F.2.4 decode procedures
    with the Annex G statistical model; bin layout and control flow
    mirror the spec figures F.21-F.24 as realized in the public
    jdarith reference)."""
    dc_stats = {c["dc"]: bytearray(64) for c in comps}
    ac_stats = {c["ac"]: bytearray(256) for c in comps}
    fixed = bytearray([113])
    dc_ctx = {c["id"]: 0 for c in comps}
    last_dc = {c["id"]: 0 for c in comps}
    n_restart = 0
    for u_i, unit in enumerate(_scan_units(frame, comps)):
        if ri and u_i and u_i % ri == 0:
            ad = _arith_restart(ad, ad.d, n_restart & 7)
            n_restart += 1
            for b in dc_stats.values():
                b[:] = bytes(len(b))
            for b in ac_stats.values():
                b[:] = bytes(len(b))
            dc_ctx = {c["id"]: 0 for c in comps}
            last_dc = {c["id"]: 0 for c in comps}
        for c, by, bx in unit:
            zz = c["zz"][by, bx]
            cid = c["id"]
            dcL, dcU = cond["dc"].get(c["dc"], (0, 1))
            acK = cond["ac"].get(c["ac"], 5)
            dst = dc_stats[c["dc"]]
            ast = ac_stats[c["ac"]]
            # ---- DC (F.21/F.23/F.24 with G.1.3.2 conditioning)
            s0 = dc_ctx[cid]
            if ad.decode(dst, s0) == 0:
                dc_ctx[cid] = 0
            else:
                sign = ad.decode(dst, s0 + 1)
                stk = s0 + 2 + sign
                m = ad.decode(dst, stk)
                if m:
                    stk = 20                      # X1 bin (Table F.4)
                    while ad.decode(dst, stk):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError(
                                "arithmetic DC magnitude overflow")
                        stk += 1
                if m < (1 << dcL) >> 1:
                    dc_ctx[cid] = 0
                elif m > (1 << dcU) >> 1:
                    dc_ctx[cid] = 12 + sign * 4
                else:
                    dc_ctx[cid] = 4 + sign * 4
                v = m
                stk += 14                         # M bins follow X bins
                m >>= 1
                while m:
                    if ad.decode(dst, stk):
                        v |= m
                    m >>= 1
                v += 1
                last_dc[cid] += -v if sign else v
            zz[0] = last_dc[cid]
            # ---- AC (F.21/F.22/F.23/F.24)
            k = 1
            while k <= 63:
                stk = 3 * (k - 1)
                if ad.decode(ast, stk):           # EOB
                    break
                while ad.decode(ast, stk + 1) == 0:
                    stk += 3
                    k += 1
                    if k > 63:
                        raise ValueError(
                            "arithmetic AC run past end of block")
                sign = ad.decode(fixed, 0)
                stk += 2
                m = ad.decode(ast, stk)
                if m:
                    if ad.decode(ast, stk):
                        m = 2
                        stk = 189 if k <= acK else 217
                        while ad.decode(ast, stk):
                            m <<= 1
                            if m == 0x8000:
                                raise ValueError(
                                    "arithmetic AC magnitude overflow")
                            stk += 1
                v = m
                stk += 14
                m >>= 1
                while m:
                    if ad.decode(ast, stk):
                        v |= m
                    m >>= 1
                v += 1
                zz[k] = -v if sign else v
                k += 1
    return ad


def _scan_arith_dc_first(ad, frame, comps, cond, ri, al):
    """Progressive arithmetic DC-first scan (F.2.4.1; value << Al)."""
    dc_stats = {c["dc"]: bytearray(64) for c in comps}
    dc_ctx = {c["id"]: 0 for c in comps}
    last_dc = {c["id"]: 0 for c in comps}
    n_restart = 0
    for u_i, unit in enumerate(_scan_units(frame, comps)):
        if ri and u_i and u_i % ri == 0:
            ad = _arith_restart(ad, ad.d, n_restart & 7)
            n_restart += 1
            for b in dc_stats.values():
                b[:] = bytes(len(b))
            dc_ctx = {c["id"]: 0 for c in comps}
            last_dc = {c["id"]: 0 for c in comps}
        for c, by, bx in unit:
            cid = c["id"]
            dcL, dcU = cond["dc"].get(c["dc"], (0, 1))
            dst = dc_stats[c["dc"]]
            s0 = dc_ctx[cid]
            if ad.decode(dst, s0) == 0:
                dc_ctx[cid] = 0
            else:
                sign = ad.decode(dst, s0 + 1)
                stk = s0 + 2 + sign
                m = ad.decode(dst, stk)
                if m:
                    stk = 20
                    while ad.decode(dst, stk):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError(
                                "arithmetic DC magnitude overflow")
                        stk += 1
                if m < (1 << dcL) >> 1:
                    dc_ctx[cid] = 0
                elif m > (1 << dcU) >> 1:
                    dc_ctx[cid] = 12 + sign * 4
                else:
                    dc_ctx[cid] = 4 + sign * 4
                v = m
                stk += 14
                m >>= 1
                while m:
                    if ad.decode(dst, stk):
                        v |= m
                    m >>= 1
                v += 1
                last_dc[cid] += -v if sign else v
            c["zz"][by, bx][0] = last_dc[cid] << al
    return ad


def _scan_arith_dc_refine(ad, frame, comps, ri, al):
    """Progressive arithmetic DC-refinement: one fixed-probability
    decision per block (F.2.4.1, successive approximation)."""
    fixed = bytearray([113])
    p1 = 1 << al
    n_restart = 0
    for u_i, unit in enumerate(_scan_units(frame, comps)):
        if ri and u_i and u_i % ri == 0:
            ad = _arith_restart(ad, ad.d, n_restart & 7)
            n_restart += 1
            fixed = bytearray([113])
        for c, by, bx in unit:
            if ad.decode(fixed, 0):
                c["zz"][by, bx][0] |= p1
    return ad


def _scan_arith_ac_first(ad, c, cond, ri, ss, se, al):
    """Progressive arithmetic AC-first scan over band Ss..Se."""
    ac_stats = bytearray(256)
    fixed = bytearray([113])
    acK = cond["ac"].get(c["ac"], 5)
    n_restart = 0
    for u_i, unit in enumerate(_scan_units(
            {"mcus_y": 1, "mcus_x": 1}, [c])):
        if ri and u_i and u_i % ri == 0:
            ad = _arith_restart(ad, ad.d, n_restart & 7)
            n_restart += 1
            ac_stats = bytearray(256)
        (c_, by, bx), = unit
        zz = c_["zz"][by, bx]
        k = ss
        while k <= se:
            stk = 3 * (k - 1)
            if ad.decode(ac_stats, stk):
                break
            while ad.decode(ac_stats, stk + 1) == 0:
                stk += 3
                k += 1
                if k > se:
                    raise ValueError(
                        "arithmetic AC run past end of band")
            sign = ad.decode(fixed, 0)
            stk += 2
            m = ad.decode(ac_stats, stk)
            if m:
                if ad.decode(ac_stats, stk):
                    m = 2
                    stk = 189 if k <= acK else 217
                    while ad.decode(ac_stats, stk):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError(
                                "arithmetic AC magnitude overflow")
                        stk += 1
            v = m
            stk += 14
            m >>= 1
            while m:
                if ad.decode(ac_stats, stk):
                    v |= m
                m >>= 1
            v += 1
            zz[k] = (-v if sign else v) << al
            k += 1
    return ad


def _scan_arith_ac_refine(ad, c, ri, ss, se, al):
    """Progressive arithmetic AC-refinement (F.2.4.2 correction bits)."""
    ac_stats = bytearray(256)
    fixed = bytearray([113])
    p1 = 1 << al
    m1 = -1 << al
    n_restart = 0
    for u_i, unit in enumerate(_scan_units(
            {"mcus_y": 1, "mcus_x": 1}, [c])):
        if ri and u_i and u_i % ri == 0:
            ad = _arith_restart(ad, ad.d, n_restart & 7)
            n_restart += 1
            ac_stats = bytearray(256)
        (c_, by, bx), = unit
        zz = c_["zz"][by, bx]
        kex = se
        while kex > 0 and zz[kex] == 0:
            kex -= 1
        k = ss
        while k <= se:
            stk = 3 * (k - 1)
            if k > kex and ad.decode(ac_stats, stk):
                break
            while True:
                if zz[k]:
                    if ad.decode(ac_stats, stk + 2):
                        zz[k] += m1 if zz[k] < 0 else p1
                    break
                if ad.decode(ac_stats, stk + 1):
                    zz[k] = m1 if ad.decode(fixed, 0) else p1
                    break
                stk += 3
                k += 1
                if k > se:
                    raise ValueError(
                        "arithmetic AC refine past end of band")
            k += 1
    return ad


# ---- lossless arithmetic coding (SOF11, T.81 Annex H.2) -------------
#
# Each difference is coded with the DC decision tree of F.2.4.1, but
# conditioned on the 5x5 classification (zero / small+ / small- /
# large+ / large-, F.1.4.4.1.1 thresholds from the DAC (L, U) pair) of
# the differences already coded at the LEFT (Da) and ABOVE (Db)
# positions: 25 contexts x 4 decision bins, plus TWO banks of
# magnitude-category / magnitude-bit bins (X1..X15 + shared M), the
# second bank used when Db is in a large category (H.2.1). Statistics
# layout: decisions at 4*(5*ka + kb), banks at 100 and 129 (29 bins
# each: 15 X + the M bin 14 past the final X) -> 158 bins total.
#
# No SOF11 codec exists in this container (libjpeg62 implements
# neither Annex H nor D-for-H), so parity is pinned by the in-repo
# Annex-D encoder twin (`encode_jpeg_lossless(arith=True)`) plus the
# QM coder itself being oracle-pinned by libjpeg SOF9/SOF10 streams
# (tests/test_jpeg_arith.py) — the same fixture strategy the Annex-J
# hierarchical path started with.

_LL_STATS_BINS = 158

#: (dcL, dcU, acK) per arithmetic conditioning table id used by the
#: in-repo arithmetic encoders — the T.81 default values, emitted
#: explicitly in a DAC segment.
ARI_CONDS = ((0, 1, 5), (0, 1, 5))


def _ll_class(m: int, sign: int, L: int, U: int) -> int:
    """F.1.4.4.1.1 difference classification from the magnitude
    category top bit ``m`` (0 also covers |diff| == 1)."""
    if m < (1 << L) >> 1:
        return 0                       # zero category
    if m > (1 << U) >> 1:
        return 3 + sign                # large +/-
    return 1 + sign                    # small +/-


def _scan_arith_lossless(ad: "_ArithDecoder", frame: dict, comps: list,
                         cond: dict, sel: int, pt: int):
    """Lossless arithmetic scan (SOF11): Annex H.2 statistical model
    over the Annex-H prediction/reconstruction loop shared with the
    Huffman path (`_scan_lossless`)."""
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise NotImplementedError(
            "lossless scan supports 1x1 sampling factors only")
    if frame.get("diff"):
        if sel != 0:
            raise ValueError(
                "differential lossless scans require predictor 0 "
                "(Table H.1)")
    elif sel == 0:
        raise ValueError("predictor 0 is differential-frame-only")
    default = 1 << (frame["prec"] - pt - 1)
    h, w = frame["h"], frame["w"]
    stats = {c["dc"]: bytearray(_LL_STATS_BINS) for c in comps}
    conds = [cond["dc"].get(c["dc"], (0, 1)) for c in comps]
    planes = [c["plane"] for c in comps]
    above = [bytearray(w) for _ in comps]    # class of diff at (y-1, x)
    left = [0] * len(comps)                  # class of diff at (y, x-1)
    for y in range(h):
        for ci in range(len(comps)):
            left[ci] = 0
        for x in range(w):
            for ci, c in enumerate(comps):
                st = stats[c["dc"]]
                L, U = conds[ci]
                kb = above[ci][x]
                ctx = 4 * (5 * left[ci] + kb)
                if ad.decode(st, ctx) == 0:
                    diff = 0
                    cls = 0
                else:
                    sign = ad.decode(st, ctx + 1)
                    m = ad.decode(st, ctx + 2 + sign)
                    stk = 100 + (29 if kb > 2 else 0)
                    if m:
                        while ad.decode(st, stk):
                            m <<= 1
                            if m == 0x8000:
                                raise ValueError(
                                    "arithmetic lossless magnitude "
                                    "overflow")
                            stk += 1
                    cls = _ll_class(m, sign, L, U)
                    v = m
                    stk += 14
                    m >>= 1
                    while m:
                        if ad.decode(st, stk):
                            v |= m
                        m >>= 1
                    v += 1
                    diff = -v if sign else v
                pred = _lossless_predict(planes[ci], y, x, sel, default)
                planes[ci][y, x] = (pred + diff) & 0xFFFF
                above[ci][x] = cls
                left[ci] = cls
    return ad


def _arith_write_diff(enc: "_ArithEncoder", st: bytearray, ctx: int,
                      bank: int, raw: int, L: int, U: int) -> int:
    """Encode one Annex-H difference under the H.2 model; returns the
    classification the decoder will derive for this position."""
    dv = raw & 0xFFFF
    if dv >= 32768:
        dv -= 65536                    # mod-2^16 fold (H.1.2.3)
    if dv == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if dv < 0 else 0
    enc.encode(st, ctx + 1, sign)
    sz = (-dv if sign else dv) - 1
    stk = bank
    if sz == 0:
        enc.encode(st, ctx + 2 + sign, 0)
        m = 0
    else:
        enc.encode(st, ctx + 2 + sign, 1)
        m = 1
        while (m << 1) <= sz:
            enc.encode(st, stk, 1)
            m <<= 1
            stk += 1
        enc.encode(st, stk, 0)
    cls = _ll_class(m, sign, L, U)
    stk += 14
    mm = m >> 1
    while mm:
        enc.encode(st, stk, 1 if sz & mm else 0)
        mm >>= 1
    return cls


# ---- arithmetic DCT scan ENCODERS -----------------------------------
#
# Exact mirrors of the F.2.4 decode procedures above, built on the
# Annex-D `_ArithEncoder`. They exist as the fixture partners for the
# arithmetic DIFFERENTIAL frame types (SOF13/14/15): no third-party
# encoder implements Annex J with arithmetic coding (libjpeg62 has
# neither), so — exactly like the Huffman hierarchical path and the
# SOF11 lossless path before them — parity is pinned by in-repo
# encoder twins plus the QM coder itself being oracle-pinned by
# libjpeg SOF9/SOF10 streams (tests/test_jpeg_arith.py).

def _arith_enc_dc(enc: "_ArithEncoder", dst: bytearray, s0: int,
                  diff: int, dcL: int, dcU: int) -> int:
    """Encode one DC difference under G.1.3.2 conditioning (context
    ``s0`` from the previous diff's classification); returns the next
    block's context — the exact inverse of the DC tree in
    `_scan_arith_sequential` / `_scan_arith_dc_first`."""
    if diff == 0:
        enc.encode(dst, s0, 0)
        return 0
    enc.encode(dst, s0, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(dst, s0 + 1, sign)
    sz = (-diff if sign else diff) - 1
    m = 0
    stk = s0 + 2 + sign
    if sz == 0:
        enc.encode(dst, stk, 0)
    else:
        enc.encode(dst, stk, 1)
        m = 1
        stk = 20                              # X1 bin (Table F.4)
        while (m << 1) <= sz:
            enc.encode(dst, stk, 1)
            m <<= 1
            stk += 1
        enc.encode(dst, stk, 0)
    if m < (1 << dcL) >> 1:
        ctx = 0
    elif m > (1 << dcU) >> 1:
        ctx = 12 + sign * 4
    else:
        ctx = 4 + sign * 4
    stk += 14                                 # M bins follow X bins
    mm = m >> 1
    while mm:
        enc.encode(dst, stk, 1 if sz & mm else 0)
        mm >>= 1
    return ctx


def _arith_enc_ac(enc: "_ArithEncoder", ast: bytearray, fixed: bytearray,
                  vals: list, ss: int, se: int, acK: int) -> None:
    """Encode one block's (point-transformed, signed) AC band
    ``vals[0..se-ss]`` — the exact inverse of the AC tree shared by
    `_scan_arith_sequential` and `_scan_arith_ac_first`."""
    kend = ss - 1
    for j in range(se - ss, -1, -1):
        if vals[j]:
            kend = ss + j
            break
    k = ss
    while k <= se:
        stk = 3 * (k - 1)
        if k > kend:
            enc.encode(ast, stk, 1)           # EOB
            return
        enc.encode(ast, stk, 0)
        while vals[k - ss] == 0:
            enc.encode(ast, stk + 1, 0)
            stk += 3
            k += 1
        enc.encode(ast, stk + 1, 1)
        v = int(vals[k - ss])
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        sz = (-v if sign else v) - 1
        stk += 2
        m = 0
        if sz == 0:
            enc.encode(ast, stk, 0)
        else:
            enc.encode(ast, stk, 1)
            if sz == 1:
                enc.encode(ast, stk, 0)       # second decision, same bin
                m = 1
            else:
                enc.encode(ast, stk, 1)
                m = 2
                stk = 189 if k <= acK else 217
                while (m << 1) <= sz:
                    enc.encode(ast, stk, 1)
                    m <<= 1
                    stk += 1
                enc.encode(ast, stk, 0)
        stk += 14
        mm = m >> 1
        while mm:
            enc.encode(ast, stk, 1 if sz & mm else 0)
            mm >>= 1
        k += 1


def _enc_arith_sequential(enc: "_ArithEncoder", comp_blocks: list,
                          tabsel: list, conds: list, mcus_y: int,
                          mcus_x: int) -> None:
    """Sequential DC+AC arithmetic scan over 1x1-sampled interleaved
    components (`_scan_arith_sequential`'s inverse, no restarts).
    ``conds[t]`` = (dcL, dcU, acK) for conditioning table t."""
    dc_stats = {t: bytearray(64) for t in set(tabsel)}
    ac_stats = {t: bytearray(256) for t in set(tabsel)}
    fixed = bytearray([113])
    dc_ctx = [0] * len(comp_blocks)
    last_dc = [0] * len(comp_blocks)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, blocks in enumerate(comp_blocks):
                t = tabsel[ci]
                dcL, dcU, acK = conds[t]
                zz = blocks[my, mx]
                dc = int(zz[0])
                dc_ctx[ci] = _arith_enc_dc(
                    enc, dc_stats[t], dc_ctx[ci], dc - last_dc[ci],
                    dcL, dcU)
                last_dc[ci] = dc
                _arith_enc_ac(enc, ac_stats[t], fixed,
                              [int(x) for x in zz[1:64]], 1, 63, acK)


def _enc_arith_dc_scan(enc: "_ArithEncoder", comp_blocks: list,
                       tabsel: list, conds: list, mcus_y: int,
                       mcus_x: int, al: int, refine: bool) -> None:
    """Progressive arithmetic DC scan (first or refinement), 1x1
    sampling — inverse of `_scan_arith_dc_first` / `_dc_refine`."""
    if refine:
        fixed = bytearray([113])
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for blocks in comp_blocks:
                    enc.encode(fixed, 0,
                               (int(blocks[my, mx][0]) >> al) & 1)
        return
    dc_stats = {t: bytearray(64) for t in set(tabsel)}
    dc_ctx = [0] * len(comp_blocks)
    last_dc = [0] * len(comp_blocks)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, blocks in enumerate(comp_blocks):
                t = tabsel[ci]
                dcL, dcU, _ = conds[t]
                v = int(blocks[my, mx][0]) >> al   # arithmetic shift
                dc_ctx[ci] = _arith_enc_dc(
                    enc, dc_stats[t], dc_ctx[ci], v - last_dc[ci],
                    dcL, dcU)
                last_dc[ci] = v


def _enc_arith_ac_first(enc: "_ArithEncoder", zzs, ss: int, se: int,
                        al: int, acK: int) -> None:
    """Progressive arithmetic AC-first scan over one component's band
    (inverse of `_scan_arith_ac_first`; point transform is integer
    division toward zero, G.1.2.1)."""
    ast = bytearray(256)
    fixed = bytearray([113])
    for zz in zzs:
        vals = [(int(v) >> al) if v >= 0 else -((-int(v)) >> al)
                for v in zz[ss:se + 1]]
        _arith_enc_ac(enc, ast, fixed, vals, ss, se, acK)


def _enc_arith_ac_refine(enc: "_ArithEncoder", zzs, ss: int, se: int,
                         al: int) -> None:
    """Progressive arithmetic AC-refinement scan — inverse of
    `_scan_arith_ac_refine`: the decoder's pre-scan coefficient state
    (history = |v| >> (al+1)) drives the same decision sequence."""
    ast = bytearray(256)
    fixed = bytearray([113])
    for zz in zzs:
        band = [int(v) for v in zz[ss:se + 1]]
        temp = [abs(v) >> al for v in band]        # this-stage magnitude
        hist = [abs(v) >> (al + 1) for v in band]  # decoder pre-scan state
        kex = se
        while kex >= ss and hist[kex - ss] == 0:
            kex -= 1
        kend = ss - 1
        for j in range(se - ss, -1, -1):
            if temp[j]:
                kend = ss + j
                break
        k = ss
        while k <= se:
            stk = 3 * (k - 1)
            if k > kex:
                eob = k > kend
                enc.encode(ast, stk, 1 if eob else 0)
                if eob:
                    break
            while True:
                if hist[k - ss]:                   # previously significant
                    enc.encode(ast, stk + 2, temp[k - ss] & 1)
                    break
                if temp[k - ss]:                   # newly significant
                    enc.encode(ast, stk + 1, 1)
                    enc.encode(fixed, 0, 1 if band[k - ss] < 0 else 0)
                    break
                enc.encode(ast, stk + 1, 0)
                stk += 3
                k += 1
            k += 1


def _exp_expand(plane: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """EXP reference upsample (T.81 J.1.1.2 / figure J.4): double the
    resolution with out(2x) = in(x), out(2x+1) = (in(x) + in(x+1) + 1)
    >> 1, the final output column/row replicating the last input
    sample. ``eh``/``ev`` are the EXP segment's expand-horizontally /
    expand-vertically flags."""
    p = plane
    if eh:
        out = np.empty((p.shape[0], p.shape[1] * 2), dtype=np.float64)
        out[:, 0::2] = p
        out[:, 1:-1:2] = np.floor((p[:, :-1] + p[:, 1:] + 1) / 2)
        out[:, -1] = p[:, -1]
        p = out
    if ev:
        out = np.empty((p.shape[0] * 2, p.shape[1]), dtype=np.float64)
        out[0::2, :] = p
        out[1:-1:2, :] = np.floor((p[:-1, :] + p[1:, :] + 1) / 2)
        out[-1, :] = p[-1, :]
        p = out
    return p


def _frame_planes(frame: dict, qt: dict) -> list[np.ndarray]:
    """Dequantize + IDCT a decoded frame's components to spatial
    planes at COMPONENT resolution (cropped to the actual, non-padded
    component dims). Level shift applies to non-differential frames
    only (T.81 J.1: differential frames code the difference signal,
    which is not shifted)."""
    mid = 0.0 if frame.get("diff") else float(1 << (frame["prec"] - 1))
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in frame["comps"]:
        # the table snapshotted at the component's first scan (SOS
        # handler), NOT the live DQT state — a between-frames DQT
        # redefinition applies to subsequent scans only (B.2.4.1)
        q = c.get("qtab", qt.get(c["tq"]))
        if q is None:
            raise ValueError("component references undefined quant table")
        zz = c["zz"].reshape(-1, 64)
        coef = np.zeros_like(zz, dtype=np.float64)
        coef[:, ZIGZAG] = zz * q.reshape(64)[ZIGZAG][None, :]
        pix = _idct2_batch(coef.reshape(-1, 8, 8)) + mid
        plane = (pix.reshape(c["by"], c["bx"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["by"] * 8, c["bx"] * 8))
        comp_w = -(-frame["w"] * c["h"] // hmax)
        comp_h = -(-frame["h"] * c["v"] // vmax)
        planes.append(plane[:comp_h, :comp_w])
    return planes


def _hier_fold(hier: dict, frame: dict, qt: dict) -> None:
    """Fold a completed hierarchical frame into the reference
    components (T.81 Annex J): apply any pending EXP expansion to the
    references, then either replace (non-differential frame) or add
    the decoded difference signal (differential frame), rounding and
    clamping to the sample range — the reference for the NEXT frame is
    the reconstructed output of this one (J.1.1.3)."""
    maxv = (1 << frame["prec"]) - 1
    exp = frame.pop("_exp_before", None)   # EXP seen before THIS frame
    if exp is not None:
        eh, ev = exp
        for cid in hier["ref"]:
            hier["ref"][cid] = _exp_expand(hier["ref"][cid], eh, ev)
    if frame.get("lossless"):
        planes = [c["plane"].astype(np.float64) for c in frame["comps"]]
    else:
        planes = _frame_planes(frame, qt)
    for c, plane in zip(frame["comps"], planes):
        if frame.get("diff"):
            ref = hier["ref"].get(c["id"])
            if ref is None:
                raise ValueError(
                    "differential frame without a reference component")
            ph, pw = plane.shape
            if ref.shape[0] < ph or ref.shape[1] < pw:
                raise ValueError(
                    "reference component smaller than differential "
                    "frame (missing EXP segment?)")
            if frame.get("lossless"):
                # SOF7: modulo-2^16 correction (H.1.2.3) — a final
                # lossless differential frame makes the pyramid exact
                plane = ((np.round(ref[:ph, :pw]).astype(np.int64)
                          + plane.astype(np.int64)) & 0xFFFF)                     .astype(np.float64)
            else:
                plane = ref[:ph, :pw] + plane
        hier["ref"][c["id"]] = np.clip(np.round(plane), 0, maxv)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode Huffman JPEG bytes to uint8 (H,W) gray or (H,W,3) RGB.

    Handles baseline (SOF0/SOF1, single- or multi-scan), progressive
    (SOF2), ARITHMETIC-coded (SOF9/SOF10 sequential/progressive and
    SOF11 lossless — Annex D QM coder; SOF11 uses the Annex H.2
    statistical model, pinned by the in-repo encoder twin since no
    third-party Annex-H arithmetic codec exists in this container),
    HIERARCHICAL (T.81 Annex J: DHP + EXP, differential frames
    SOF5/SOF6 — Huffman sequential/progressive, pinned by the encoder
    twin), and LOSSLESS Huffman (SOF3 + differential SOF7, Annex H:
    prediction + difference coding, precisions 2-16, point transform,
    modulo-2^16 differential correction; 3-channel payloads return the
    components directly, no color transform) streams. Raises
    NotImplementedError for the arithmetic DIFFERENTIAL frame types
    (SOF13/14/15) — nothing in-container can pin those combinations,
    so they stay on decode_image's external-codec dispatch seam —
    and malformed data raises ValueError.

    Hierarchical semantics: scans of a differential frame decode with
    the UNCHANGED entropy procedures (DC prediction runs as usual over
    the differential coefficients); the frame's IDCT output skips the
    level shift and adds to the (possibly EXP-expanded) reference
    component, rounded and clamped (`_hier_fold`). NOTE no independent
    hierarchical codec exists in this container (libjpeg62 does not
    implement Annex J), so parity is pinned by the in-repo encoder
    twin + hand-computable fixtures (tests/test_jpeg_hier.py), the
    same fixture-writer strategy the VP8L decoder started with.
    """
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, dict] = {}
    hac: dict[int, dict] = {}
    ri = 0
    frame = None
    progressive = False
    arith = False
    cond = {"dc": {}, "ac": {}}
    saw_scan = False
    hier = None                 # Annex J state: {"ref": {cid: plane}}
    while True:
        if i + 1 >= len(d):
            # scan data complete but trailing EOI missing — a common
            # real-world truncation. With ≥1 decoded scan the frame is
            # whole; degrade to returning it instead of raising.
            if saw_scan:
                break
            raise ValueError("JPEG truncated before EOI")
        if d[i] != 0xFF:
            raise ValueError(f"expected marker at byte {i}")
        # optional 0xFF fill bytes before any marker (T.81 B.1.1.2)
        while i + 1 < len(d) and d[i + 1] == 0xFF:
            i += 1
        if i + 1 >= len(d):
            if saw_scan:
                break
            raise ValueError("JPEG truncated before EOI")
        m = d[i + 1]
        i += 2
        if m == 0xD9:                                  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD8:
            continue
        if i + 2 > len(d):
            raise ValueError("JPEG segment truncated")
        ln = int.from_bytes(d[i:i + 2], "big")
        if ln < 2:
            raise ValueError(f"invalid JPEG segment length {ln}")
        body = d[i + 2:i + ln]
        i += ln
        if m == 0xDB:                                  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                tbl = np.zeros(64, dtype=np.int64)
                if pq:                       # Pq=1: 16-bit big-endian
                    tbl[ZIGZAG] = np.frombuffer(
                        body[j + 1:j + 129], dtype=">u2").astype(np.int64)
                    j += 129
                else:
                    tbl[ZIGZAG] = np.frombuffer(
                        body[j + 1:j + 65], dtype=np.uint8).astype(np.int64)
                    j += 65
                qt[tq] = tbl.reshape(8, 8)
        elif m == 0xC4:                                # DHT
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1:j + 17])
                nv = sum(bits)
                vals = list(body[j + 17:j + 17 + nv])
                if len(bits) < 16 or len(vals) < nv:
                    raise ValueError("JPEG DHT segment truncated")
                tab = _decode_table(bits, vals)
                (hdc if cls == 0 else hac)[tid] = tab
                j += 17 + nv
        elif m == 0xDD:                                # DRI
            ri = int.from_bytes(body[:2], "big")
        elif m == 0xCC:                                # DAC (T.81 B.2.4.3)
            j = 0
            while j + 1 < len(body):
                cls, tid = body[j] >> 4, body[j] & 15
                if cls == 0:
                    cond["dc"][tid] = (body[j + 1] & 15,
                                       body[j + 1] >> 4)   # (L, U)
                else:
                    cond["ac"][tid] = body[j + 1]           # Kx
                j += 2
        elif m == 0xDE:                                # DHP (Annex J)
            hier = {"prec": body[0],
                    "h": int.from_bytes(body[1:3], "big"),
                    "w": int.from_bytes(body[3:5], "big"),
                    "ref": {}}
        elif m == 0xDF:                                # EXP (Annex J)
            if hier is None:
                raise ValueError("EXP segment outside hierarchical mode")
            # applies to the references when the NEXT frame folds
            hier["_exp"] = (body[0] >> 4, body[0] & 15)
        elif m in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA,       # SOF0/1/2/9/10
                   0xC5, 0xC6,                         # diff SOF5/6
                   0xCD, 0xCE,                         # arith diff SOF13/14
                   0xC3, 0xC7, 0xCB, 0xCF):   # lossless SOF3/7/11/15
            diff = m in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF)
            lossless = m in (0xC3, 0xC7, 0xCB, 0xCF)
            if diff and hier is None:
                raise ValueError(
                    "differential frame outside hierarchical mode "
                    "(missing DHP)")
            if (hier is not None and frame is not None
                    and frame.get("scanned")):
                _hier_fold(hier, frame, qt)   # previous frame completed
            progressive = m in (0xC2, 0xCA, 0xC6, 0xCE)
            arith = m in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
            # 12-bit is legal for extended/progressive frames (T.81
            # Table B.2); baseline SOF0 is 8-bit by definition;
            # lossless allows 2..16 (Table B.2 column "lossless")
            if lossless:
                if not 2 <= body[0] <= 16:
                    raise ValueError(
                        f"bad lossless precision {body[0]}")
            elif not (body[0] == 8 or (body[0] == 12 and m != 0xC0)):
                raise NotImplementedError(f"{body[0]}-bit JPEG precision")
            prec = body[0]
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, sf, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 15,
                              "tq": tq})
            if nc == 1:
                comps[0]["h"] = comps[0]["v"] = 1
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame = {"h": fh, "w": fw, "comps": comps, "prec": prec,
                     "hmax": hmax, "vmax": vmax, "diff": diff,
                     "lossless": lossless,
                     "mcus_x": -(-fw // (8 * hmax)),
                     "mcus_y": -(-fh // (8 * vmax))}
            if hier is not None:
                # an EXP between the previous frame and this header
                # expands the references when THIS frame folds
                frame["_exp_before"] = hier.pop("_exp", None)
            for c in comps:
                c["bx"] = frame["mcus_x"] * c["h"]
                c["by"] = frame["mcus_y"] * c["v"]
                # actual (non-padded) block dims, for non-interleaved
                # scans (T.81 A.1.1): ceil(ceil(dim * sf / sfmax) / 8)
                comp_w = -(-fw * c["h"] // hmax)
                comp_h = -(-fh * c["v"] // vmax)
                c["cw"] = -(-comp_w // 8)
                c["ch"] = -(-comp_h // 8)
                if lossless:
                    c["plane"] = np.zeros((comp_h, comp_w),
                                          dtype=np.int64)
                else:
                    c["zz"] = np.zeros((c["by"], c["bx"], 64),
                                       dtype=np.int64)
        elif m == 0xDA:                                # SOS
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            nc = body[0]
            by_id = {c["id"]: c for c in frame["comps"]}
            scan_comps = []
            for c in range(nc):
                cid, tsel = body[1 + 2 * c:3 + 2 * c]
                if cid not in by_id:
                    raise ValueError("scan references unknown component")
                by_id[cid].update(dc=tsel >> 4, ac=tsel & 15)
                # snapshot the quant table IN EFFECT at this component's
                # first scan: a DQT between frames (legal, B.2.4.1 —
                # redefinitions apply to subsequent scans only) must not
                # retroactively change a deferred dequantization
                # (hierarchical folds happen at the NEXT SOF/EOI)
                if not frame.get("lossless") and \
                        "qtab" not in by_id[cid]:
                    by_id[cid]["qtab"] = qt.get(by_id[cid]["tq"])
                scan_comps.append(by_id[cid])
            ss, se, ahal = body[1 + 2 * nc:4 + 2 * nc]
            ah, al = ahal >> 4, ahal & 15
            if frame.get("lossless"):
                if ri:
                    raise NotImplementedError(
                        "restart intervals in lossless scans")
                if hier is not None and al:
                    raise NotImplementedError(
                        "point transform in hierarchical lossless")
                if arith:
                    ad = _scan_arith_lossless(
                        _ArithDecoder(d, i), frame, scan_comps, cond,
                        ss, al)
                    frame["pt"] = al
                    saw_scan = True
                    frame["scanned"] = True
                    i = _skip_to_marker(
                        d, ad.marker if ad.marker is not None else ad.i)
                    continue
                br = _BitReader(d, i)
                _scan_lossless(br, frame, scan_comps, hdc, ss, al)
                frame["pt"] = al
                saw_scan = True
                frame["scanned"] = True
                i = _skip_to_marker(d, br.i)
                continue
            if arith:
                ad = _ArithDecoder(d, i)
                if not progressive:
                    ad = _scan_arith_sequential(ad, frame, scan_comps,
                                                cond, ri)
                elif ss == 0:
                    if ah == 0:
                        ad = _scan_arith_dc_first(ad, frame,
                                                  scan_comps, cond,
                                                  ri, al)
                    else:
                        ad = _scan_arith_dc_refine(ad, frame,
                                                   scan_comps, ri, al)
                else:
                    if len(scan_comps) != 1:
                        raise ValueError(
                            "progressive AC scan with several "
                            "components")
                    if ah == 0:
                        ad = _scan_arith_ac_first(ad, scan_comps[0],
                                                  cond, ri, ss, se, al)
                    else:
                        ad = _scan_arith_ac_refine(ad, scan_comps[0],
                                                   ri, ss, se, al)
                saw_scan = True
                frame["scanned"] = True
                i = _skip_to_marker(
                    d, ad.marker if ad.marker is not None else ad.i)
                continue
            br = _BitReader(d, i)
            if not progressive:
                _scan_sequential(br, frame, scan_comps, hdc, hac, ri)
            elif ss == 0:
                if se != 0:
                    raise ValueError("progressive DC scan with Se != 0")
                if ah == 0:
                    _scan_dc_first(br, frame, scan_comps, hdc, ri, al)
                else:
                    _scan_dc_refine(br, frame, scan_comps, ri, al)
            else:
                if len(scan_comps) != 1:
                    raise ValueError(
                        "progressive AC scan with several components")
                if ah == 0:
                    _scan_ac_first(br, scan_comps[0], hac, ri, ss, se, al)
                else:
                    _scan_ac_refine(br, scan_comps[0], hac, ri, ss, se,
                                    al)
            saw_scan = True
            frame["scanned"] = True
            i = _skip_to_marker(d, br.i)
        # APPn / COM / others: skipped
    if frame is None or not saw_scan:
        raise ValueError("JPEG has no frame/scan")
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    h, w = frame["h"], frame["w"]
    # sample precision: level shift 2^(P-1), clamp to 2^P - 1 (T.81
    # A.3.1); 12-bit output is uint16
    mid = float(1 << (frame["prec"] - 1))
    maxv = (1 << frame["prec"]) - 1
    out_dtype = np.uint8 if frame["prec"] <= 8 else np.uint16

    if frame.get("lossless") and hier is None:
        # Annex H output: decoded samples << Pt; components are stored
        # DIRECTLY (no color transform — lossless 3-channel payloads
        # carry the channels as-is, e.g. RGB in DNG-style files)
        pt = frame.get("pt", 0)
        planes = [np.clip(c["plane"] << pt, 0, maxv).astype(out_dtype)
                  for c in comps]
        if len(planes) == 1:
            return planes[0]
        return np.stack(planes, axis=-1)

    if hier is not None:
        if frame.get("scanned"):
            _hier_fold(hier, frame, qt)    # the last frame of the stream
        base_planes = []
        for c in comps:
            ref = hier["ref"].get(c["id"])
            if ref is None:
                raise ValueError(
                    "hierarchical stream ended without a reconstructed "
                    f"component {c['id']}")
            base_planes.append(ref)
    else:
        base_planes = _frame_planes(frame, qt)

    planes = []
    for c, plane in zip(comps, base_planes):
        fh, fw = hmax // c["h"], vmax // c["v"]
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError("non-integer sampling ratio")
        if fh > 1:
            plane = np.repeat(plane, fh, axis=1)
        if fw > 1:
            plane = np.repeat(plane, fw, axis=0)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, maxv).astype(out_dtype)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    y, cb, cr = planes
    r = y + 1.402 * (cr - mid)
    g = y - 0.344136 * (cb - mid) - 0.714136 * (cr - mid)
    b = y + 1.772 * (cb - mid)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   maxv).astype(out_dtype)
