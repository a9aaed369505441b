#!/usr/bin/env python3
"""Derive the ITU-T T.4 run-length code tables from the system
libtiff's own Modified-Huffman encoder (COMPRESSION_CCITTRLE) — the
same extract-normative-constants-from-the-canonical-library approach
as tools/extract_brotli_tables.py.

Method: MH codes each row independently as alternating white/black
runs starting with a (possibly zero-length) white run, byte-aligned
per row. Single-row images with chosen run structures let us isolate
each code:

* black(b): row = [black b][white 7]; bits = white(0) + black(b) +
  white(7); white(7) = 1111 ends at the LAST set bit, white(0) is the
  fixed 8-bit prefix -> black(b) = bits[8 : last_one - 3].
* white(w): row = [white w][black 1]; black(1) = 010 (verified from
  the black extraction) -> white(w) = bits[: last_one - 1].
* atomic makeups: makeup(64k) = composite(64k + 1) - term(1);
  term checks: composite(64k) == makeup(64k) + term(0).

Writes jsoup_spark/operators/t4_tables.py with WHITE_CODES /
BLACK_CODES: run -> bitstring for terminating codes 0..63, makeups
64..1728 (per color) and the shared extended makeups 1792..2560.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import libtiff_ref as L  # noqa: E402


def strip_bits(data: bytes) -> str:
    import struct
    from jsoup_spark.operators.tiff import _read_ifd
    off = struct.unpack("<I", data[4:8])[0]
    ifd = _read_ifd(data, off, "<")
    s = data[ifd[273][0]:ifd[273][0] + ifd[279][0]]
    return "".join(f"{b:08b}" for b in s)


def mh_bits(row: np.ndarray) -> str:
    data = L.encode_bilevel(row[None, :], compression=2)
    return strip_bits(data)


def extract():
    # ---- black codes: [black b][white 7]
    black = {}
    for b in range(1, 2562):
        row = np.zeros(b + 7, np.uint8)
        row[:b] = 1
        bits = mh_bits(row)
        last1 = bits.rfind("1")
        w0 = bits[:8]
        assert w0 == "00110101", (b, w0)          # white(0), T.4 table
        assert bits[last1 - 3:last1 + 1] == "1111", (b, bits)
        black[b] = bits[8:last1 - 3]
    # ---- white codes: [white w][black 1]
    white = {}
    for w in range(1, 2562):
        row = np.zeros(w + 1, np.uint8)
        row[w] = 1
        bits = mh_bits(row)
        last1 = bits.rfind("1")
        code = bits[:last1 - 1]
        assert bits[last1 - 1:last1 + 2].startswith("010"[:len(bits) - last1 + 1]), (w, bits)
        white[w] = code
    assert black[1] == "010", black[1]
    # white(0) from the black-run extraction above
    white[0] = "00110101"
    # black(0): composite(64) = makeup_b(64)+term_b(0);
    # makeup_b(64) = composite(65) - term_b(1)
    out_w, out_b = {}, {}
    for tbl, comp in ((out_w, white), (out_b, black)):
        for r in range(0, 64):
            if r in comp:
                tbl[r] = comp[r]
        for k in range(1, 41):                   # 64..2560 makeups
            run = 64 * k
            term1 = tbl[1]
            comp_p1 = comp[run + 1]
            assert comp_p1.endswith(term1), (run,)
            mk = comp_p1[:-len(term1)]
            tbl[run] = mk
    # black term(0): composite(64) - makeup(64)
    mk64_b = out_b[64]
    assert black[64].startswith(mk64_b)
    out_b[0] = black[64][len(mk64_b):]
    # verify every composite reconstructs from atoms
    def encode_run(run, tbl):
        bits = ""
        while run >= 64:
            chunk = min((run // 64) * 64, 2560)
            if run - chunk < 0 or (run - chunk) > 2560:
                chunk = 2560
            # largest makeup <= run
            chunk = min(2560, (run // 64) * 64)
            bits += tbl[chunk]
            run -= chunk
        bits += tbl[run]
        return bits

    for r in range(0, 2561):
        if r in white:
            assert encode_run(r, out_w) == white[r], ("w", r)
        if r in black:
            assert encode_run(r, out_b) == black[r], ("b", r)
    # extended makeups 1792..2560 must be color-shared
    for run in range(1792, 2561, 64):
        assert out_w[run] == out_b[run], run
    return out_w, out_b


def main():
    out_w, out_b = extract()
    path = os.path.join(os.path.dirname(__file__), "..",
                        "jsoup_spark", "operators", "t4_tables.py")
    with open(path, "w") as f:
        f.write('"""ITU-T T.4 run-length code tables (normative public\n'
                'constants), derived from the system libtiff MH encoder by\n'
                'tools/extract_t4_tables.py and verified atomically\n'
                '(terminating 0..63, makeups 64..1728 per color, shared\n'
                'extended makeups 1792..2560). run -> bitstring."""\n\n')
        for name, tbl in (("WHITE_CODES", out_w), ("BLACK_CODES", out_b)):
            f.write(f"{name} = {{\n")
            for run in sorted(tbl):
                f.write(f"    {run}: \"{tbl[run]}\",\n")
            f.write("}\n\n")
    print(f"wrote {path}: {len(out_w)} white, {len(out_b)} black codes")


if __name__ == "__main__":
    main()
