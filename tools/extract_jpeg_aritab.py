"""Recover the ITU T.81 Table D.3 arithmetic-coder state table from
the system libjpeg.

JPEG arithmetic entropy coding (T.81 Annex D/G, SOF9/SOF10) fixes a
113-state Qe probability-estimation machine plus one non-adaptive
"fixed 0.5" state. Writing 114 x (Qe, NextMPS, NextLPS, Switch) rows
from memory is error-prone, so — exactly like tools/extract_vp8_tables
does for RFC 6386 — this locates libjpeg's packed ``jpeg_aritab``
(jaricom.c: ``(Qe << 16) | (NextMPS << 8) | (Switch << 7) | NextLPS``,
stored as 8-byte longs on LP64) in read-only data via the famous first
entry V(0x5A1D, 1, 1, 1), validates its structure, and emits a Python
module. The decoder built on it is verified functionally: arithmetic
and Huffman encodes of the same image carry identical coefficients, so
tests/test_jpeg_arith.py pins the arithmetic decode bit-for-bit
against the (already libjpeg-pinned) Huffman decode.

Usage: python tools/extract_jpeg_aritab.py [libjpeg.so path] [out.py]
"""

from __future__ import annotations

import struct
import sys

import numpy as np

DEFAULT_LIB = "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"
DEFAULT_OUT = ("cross_modal_multivector_search_spark/functions/"
               "jpeg_aritab.py")


def extract(lib_path: str) -> np.ndarray:
    raw = open(lib_path, "rb").read()
    at = raw.find(struct.pack("<Q", 0x5A1D0181))
    if at < 0:
        raise SystemExit("jpeg_aritab anchor V(0x5A1D,1,1,1) not found")
    tab = np.frombuffer(raw, "<u8", count=114, offset=at).astype(np.int64)
    qe = tab >> 16
    nm = (tab >> 8) & 0xFF
    nl = tab & 0x7F
    sw = (tab >> 7) & 1
    # structural validation against T.81 Table D.3 invariants
    if int(qe[0]) != 0x5A1D or int(qe[113]) != 0x5A1D:
        raise SystemExit("aritab: first/fixed state Qe != 0x5A1D")
    if not ((qe[:114] < 0x8000).all() and (nm < 114).all()
            and (nl < 114).all()):
        raise SystemExit("aritab: out-of-range entry")
    if int(sw.sum()) < 5 or int(sw[0]) != 1:
        raise SystemExit("aritab: switch flags implausible")
    if int(nm[113]) != 113 or int(nl[113]) != 113 or int(sw[113]) != 0:
        raise SystemExit("aritab: state 113 must be the fixed state")
    return tab


def emit(tab: np.ndarray, out_path: str) -> None:
    flat = ", ".join(str(int(v)) for v in tab)
    body = ""
    while flat:
        cut = flat.rfind(", ", 0, 68)
        if cut < 0 or len(flat) <= 68:
            body += "    " + flat + "\n"
            break
        body += "    " + flat[:cut + 1] + "\n"
        flat = flat[cut + 2:]
    open(out_path, "w").write(
        '"""ITU T.81 Table D.3 / libjpeg jaricom.c packed arithmetic-'
        'coder state\ntable: (Qe << 16) | (NextMPS << 8) | (Switch << '
        '7) | NextLPS, 114 states\n(113 adaptive + the fixed 0.5 state'
        ' used for AC sign decisions).\nRecovered from the container\''
        's libjpeg read-only data by\ntools/extract_jpeg_aritab.py ('
        'anchored on the published first row\nV(0x5A1D, 1, 1, 1), '
        'structurally validated); verified functionally by\ntests/'
        'test_jpeg_arith.py.\n"""\n\nimport numpy as np\n\n'
        f"JPEG_ARITAB = np.array([\n{body}], dtype=np.int64)\n")


if __name__ == "__main__":
    lib = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_LIB
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    emit(extract(lib), out)
    print(f"wrote {out}")
