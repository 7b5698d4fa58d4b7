"""Recover RFC 6386 normative constant tables from the system libwebp.

VP8's bitstream spec (RFC 6386 — public, normative) fixes several large
constant tables: default token probabilities (§13.5), token-probability
update flags (§13.4), keyframe B-mode probabilities (§11.5), and the
quantizer lookup tables (§14.1). Writing 3,000+ spec constants from
memory is error-prone, so this tool locates them in the read-only data
of the container's libwebp (they are plain spec constants, not code)
using distinctive spec-published anchor rows, validates their
structure, and emits them as a Python module.

The emitted module is then verified FUNCTIONALLY: the pure-NumPy VP8
decoder built on it must reproduce libwebp's own YUV reconstruction
bit-for-bit on encoder-generated streams (tests/test_vp8.py) — a wrong
byte anywhere derails the arithmetic decoder immediately.

Usage: python tools/extract_vp8_tables.py [libwebp.so path] [out.py]
"""

from __future__ import annotations

import sys

import numpy as np

DEFAULT_LIB = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
DEFAULT_OUT = ("cross_modal_multivector_search_spark/functions/"
               "vp8_tables.py")

# Anchor rows published in RFC 6386 (distinctive enough to be unique):
#   §13.5 coeff_probs[0][1][0]   -> locates the default token probs
#     (the table STARTS one band earlier with 33 dummy 128s, [0][0])
#   §13.4 coeff_update_probs[0][1][0] starts 255,176,246 -> update probs
#   §11.5 kf_bmode_prob[0][0]    -> locates the 10x10x9 B-mode probs
#   §14.1 dc_qlookup starts 4,5,6,7,8,9,10,10 (uint8 here);
#         ac_qlookup starts 4..11 and ends at 284 (uint16)
_COEFF_ANCHOR = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128,
                       128, 128])
_UPDATE_ANCHOR = bytes([176, 246, 255])  # [0][1][0] tail; walk back
_BMODE_ANCHOR = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
_DC_ANCHOR = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16,
                    17, 17, 18])


def _find_unique(hay: bytes, needle: bytes, what: str) -> int:
    i = hay.find(needle)
    if i < 0:
        raise SystemExit(f"anchor for {what} not found")
    return i


def extract(lib_path: str) -> dict[str, np.ndarray]:
    import ctypes.util
    import os
    if not os.path.exists(lib_path):
        # follow the loader's idea of the real file
        found = ctypes.util.find_library("webp")
        if found:
            lib_path = "/usr/lib/x86_64-linux-gnu/" + found
    raw = open(lib_path, "rb").read()
    b = np.frombuffer(raw, np.uint8)

    cp_at = _find_unique(raw, _COEFF_ANCHOR, "coeff probs") - 33
    coeff = b[cp_at:cp_at + 1056].reshape(4, 8, 3, 11).copy()
    if not (coeff[0, 0] == 128).all():
        raise SystemExit("coeff probs: band-0 dummy rows missing")

    # update probs: [0][0] is 33 x 255; [0][1][0] holds the
    # distinctive (176, 246) pair — anchor there, walk back to the
    # first of the preceding run of 255s
    t = _find_unique(raw, _UPDATE_ANCHOR, "update probs")
    up_at = t - 33                       # [0][0] is exactly 33 x 255
    if raw[up_at:t] != bytes([255] * 33):
        raise SystemExit("update probs: dummy band-0 rows missing")
    update = b[up_at:up_at + 1056].reshape(4, 8, 3, 11).copy()
    if update.min() < 10:
        raise SystemExit("update probs: implausible low byte")

    bm_at = _find_unique(raw, _BMODE_ANCHOR, "kf bmode probs")
    bmode = b[bm_at:bm_at + 900].reshape(10, 10, 9).copy()
    if bmode.min() == 0:
        raise SystemExit("bmode probs: zero probability byte")
    # libwebp's B-mode enum orders the diagonal modes RD, VR, LD
    # (indices 4, 5, 6); RFC 6386 orders them LD, RD, VR. The [above]
    # [left] axes of the in-memory table follow libwebp's order, so
    # permute both axes into RFC numbering (the 9 per-entry probs are
    # tree-positional and unaffected).
    perm = np.array([0, 1, 2, 3, 6, 4, 5, 7, 8, 9])
    bmode = bmode[perm][:, perm]

    dc_at = _find_unique(raw, _DC_ANCHOR, "dc qlookup")
    dc = b[dc_at:dc_at + 128].astype(np.int64).copy()
    ac_anchor = np.arange(4, 12, dtype="<u2").tobytes()
    ac_at = _find_unique(raw, ac_anchor, "ac qlookup")
    ac = np.frombuffer(raw, "<u2", count=128,
                       offset=ac_at).astype(np.int64).copy()
    for name, t, last in (("dc", dc, 157), ("ac", ac, 284)):
        if not ((np.diff(t) >= 0).all() and t[0] == 4 and t[-1] == last):
            raise SystemExit(f"{name} qlookup failed validation")
    return {"COEFF_PROBS": coeff, "COEFF_UPDATE_PROBS": update,
            "KF_BMODE_PROBS": bmode, "DC_QLOOKUP": dc, "AC_QLOOKUP": ac}


def emit(tables: dict[str, np.ndarray], out_path: str) -> None:
    lines = ['"""RFC 6386 normative constant tables for the VP8 '
             'decoder.\n',
             "Default token probabilities (RFC 6386 §13.5), token-"
             "probability\nupdate flags (§13.4), keyframe B-mode "
             "probabilities (§11.5), and the\nquantizer lookup "
             "tables (§14.1). These are fixed constants of the\n"
             "public VP8 bitstream specification; the arrays were "
             "recovered from\nthe read-only data of the container's "
             "libwebp by tools/extract_vp8_tables.py\n(anchored on "
             "spec-published rows, structurally validated) and are\n"
             "verified functionally by tests/test_vp8.py: the decoder "
             "built on them\nmust match libwebp's reconstruction "
             "bit-for-bit.\n\"\"\"\n",
             "import numpy as np\n"]
    for name, arr in tables.items():
        flat = ", ".join(str(int(v)) for v in arr.ravel())
        body = ""
        while flat:
            cut = flat.rfind(", ", 0, 68)
            if cut < 0 or len(flat) <= 68:
                body += "    " + flat + "\n"
                break
            body += "    " + flat[:cut + 1] + "\n"
            flat = flat[cut + 2:]
        shape = arr.shape
        lines.append(
            f"{name} = np.array([\n{body}], dtype=np.int64)"
            + (f".reshape{shape}" if len(shape) > 1 else "") + "\n")
    open(out_path, "w").write("\n".join(lines))


if __name__ == "__main__":
    lib = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_LIB
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    tables = extract(lib)
    emit(tables, out)
    print(f"wrote {out}: " + ", ".join(
        f"{k}{tuple(v.shape)}" for k, v in tables.items()))
