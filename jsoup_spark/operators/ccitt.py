"""CCITT Group 3/4 fax codecs (ITU-T T.4 / T.6) — the bilevel
compression of scanned-document TIFFs and PDF CCITTFaxDecode.

Implemented from the public recommendations:

* **MH** (Modified Huffman, TIFF COMPRESSION_CCITTRLE 2): each row
  codes independently as alternating white/black run lengths
  (starting with a possibly-zero white run), rows byte-aligned;
* **G4 / MMR** (T.6 two-dimensional, TIFF COMPRESSION_CCITTFAX4 4,
  PDF CCITTFaxDecode K<0): vertical (V0, VR/VL 1-3), horizontal
  (001 + two T.4 run codes) and pass (0001) modes against the
  previous row's changing elements; optional EOFB terminator.

Run-length code tables (t4_tables.py) are the normative T.4
constants, derived from the system libtiff's own MH encoder by
tools/extract_t4_tables.py (the brotli_data.npz precedent) and
spot-verified against the published table values; both directions of
THIS codec are differentially validated against libtiff in
tests/test_ccitt.py (our encoder -> libtiff reader, libtiff writer
-> our decoder, exhaustive run-length sweeps covering every code).

Convention: images are (h, w) uint8 arrays with 1 = black (the fax
sense; TIFF Photometric MinIsWhite renders 0 as white).
"""

from __future__ import annotations

import numpy as np

from .t4_tables import BLACK_CODES, WHITE_CODES

__all__ = ["encode_mh", "decode_mh", "encode_g4", "decode_g4"]

_DEC_WHITE = {v: k for k, v in WHITE_CODES.items()}
_DEC_BLACK = {v: k for k, v in BLACK_CODES.items()}
_MAXLEN = max(max(len(v) for v in WHITE_CODES.values()),
              max(len(v) for v in BLACK_CODES.values()))
EOFB = "000000000001" * 2


class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("CCITT: bitstream exhausted")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def peek_str(self, k: int) -> str:
        out = []
        p = self.pos
        for _ in range(min(k, self.n - p)):
            out.append(str((self.data[p >> 3] >> (7 - (p & 7))) & 1))
            p += 1
        return "".join(out)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, bits: str) -> None:
        for ch in bits:
            self.acc = (self.acc << 1) | (ch == "1")
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        if self.nbits:
            self.out.append(self.acc << (8 - self.nbits))
            self.acc = 0
            self.nbits = 0

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


def _encode_run(run: int, table: dict) -> str:
    bits = []
    while run > 2560 + 63:
        bits.append(table[2560])
        run -= 2560
    if run >= 64:
        mk = (run // 64) * 64
        bits.append(table[mk])
        run -= mk
    bits.append(table[run])
    return "".join(bits)


def _decode_run(br: _BitReader, table: dict) -> int:
    total = 0
    while True:
        code = ""
        for _ in range(_MAXLEN):
            code += str(br.bit())
            run = table.get(code)
            if run is not None:
                break
        else:
            raise ValueError(f"CCITT: bad run code {code!r}")
        total += run
        if run < 64:
            return total


def _row_transitions(row: np.ndarray) -> list[int]:
    return (np.flatnonzero(np.diff(row.astype(np.int8))) + 1).tolist()


# ------------------------------------------------------------------- MH

def encode_mh(img: np.ndarray) -> bytes:
    """Modified Huffman (TIFF compression 2): byte-aligned rows."""
    bw = _BitWriter()
    for row in np.asarray(img, np.uint8):
        pos = 0
        color = 0                                 # white first
        w = len(row)
        while pos < w:
            if color == 0:
                run = int(np.argmax(row[pos:] != 0)) \
                    if (row[pos:] != 0).any() else w - pos
            else:
                run = int(np.argmax(row[pos:] == 0)) \
                    if (row[pos:] == 0).any() else w - pos
            bw.put(_encode_run(
                run, WHITE_CODES if color == 0 else BLACK_CODES))
            pos += run
            color ^= 1
        bw.align()
    return bw.bytes()


def _exhausted(br: _BitReader) -> bool:
    """Nothing but zero fill remains (< one byte of 0s)."""
    rem = br.n - br.pos
    return rem <= 0 or (rem < 8 and "1" not in br.peek_str(rem))


def decode_mh(data: bytes, width: int,
              rows: int | None) -> np.ndarray:
    br = _BitReader(data)
    lines = []
    y = 0
    while rows is None or y < rows:
        if rows is None and _exhausted(br):
            break
        row = np.zeros(width, np.uint8)
        pos = 0
        color = 0
        while pos < width:
            run = _decode_run(
                br, _DEC_WHITE if color == 0 else _DEC_BLACK)
            if color:
                row[pos:pos + run] = 1
            pos += run
            color ^= 1
        if pos != width:
            raise ValueError(f"CCITT MH: row {y} overrun to {pos}")
        br.align()
        lines.append(row)
        y += 1
    return np.stack(lines) if lines else np.zeros((0, width), np.uint8)


# ------------------------------------------------------------------- G4

_V_CODES = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
            3: "0000011", -3: "0000010"}


def _find_b1(ref: list[int], a0: int, color: int, width: int) -> int:
    """First changing element in ref > a0 whose pixel colour is
    opposite to `color` (even transition indices are white->black)."""
    # binary search for first transition > a0
    import bisect
    i = bisect.bisect_right(ref, a0)
    # transitions at even index mark a black pixel start (W->B)
    want_parity = 0 if color == 0 else 1
    if i % 2 != want_parity:
        i += 1
    return ref[i] if i < len(ref) else width


def encode_g4(img: np.ndarray, *, eofb: bool = True) -> bytes:
    img = np.asarray(img, np.uint8)
    h, w = img.shape
    bw = _BitWriter()
    ref: list[int] = []                           # all-white reference
    for y in range(h):
        cur = _row_transitions(img[y])
        if w and img[y, 0]:                       # row starts black
            cur = [0] + cur
        a0, color = -1, 0
        ci = 0                                    # index into cur > a0
        while a0 < w:
            while ci < len(cur) and cur[ci] <= a0:
                ci += 1                           # pass mode moved a0
            a1 = cur[ci] if ci < len(cur) else w
            b1 = _find_b1(ref, a0, color, w)
            b2 = _find_b1(ref, b1, color ^ 1, w) if b1 < w else w
            if b2 < a1:
                bw.put("0001")                    # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:
                bw.put(_V_CODES[a1 - b1])
                a0 = a1
                ci += 1
                color ^= 1
            else:                                 # horizontal
                a2 = cur[ci + 1] if ci + 1 < len(cur) else w
                start = max(a0, 0)
                bw.put("001")
                bw.put(_encode_run(
                    a1 - start,
                    WHITE_CODES if color == 0 else BLACK_CODES))
                bw.put(_encode_run(
                    a2 - a1,
                    BLACK_CODES if color == 0 else WHITE_CODES))
                a0 = a2
                ci += 2
            if a0 >= w:
                break
        ref = cur
    if eofb:
        bw.put(EOFB)
    return bw.bytes()


def decode_g4(data: bytes, width: int,
              rows: int | None) -> np.ndarray:
    br = _BitReader(data)
    nrows = rows if rows is not None else 1 << 20
    lines: list[np.ndarray] = []
    ref: list[int] = []
    for y in range(nrows):
        if rows is None and (br.peek_str(24) == EOFB
                             or _exhausted(br)):
            break
        out = np.zeros((1, width), np.uint8)
        cur: list[int] = []
        a0, color = -1, 0
        while a0 < width:
            # mode code: read up to 7 bits
            code = ""
            mode = None
            for _ in range(7):
                code += str(br.bit())
                if code == "1":
                    mode = ("v", 0)
                elif code == "011":
                    mode = ("v", 1)
                elif code == "010":
                    mode = ("v", -1)
                elif code == "001":
                    mode = ("h", None)
                elif code == "0001":
                    mode = ("p", None)
                elif code == "000011":
                    mode = ("v", 2)
                elif code == "000010":
                    mode = ("v", -2)
                elif code == "0000011":
                    mode = ("v", 3)
                elif code == "0000010":
                    mode = ("v", -3)
                else:
                    continue
                break
            if mode is None:
                raise ValueError(f"CCITT G4: bad mode code {code!r}")
            b1 = _find_b1(ref, a0, color, width)
            b2 = _find_b1(ref, b1, color ^ 1, width) if b1 < width \
                else width
            kind, arg = mode
            if kind == "p":
                if color:
                    out[0, max(a0, 0):b2] = 1
                a0 = b2
            elif kind == "h":
                start = max(a0, 0)
                r1 = _decode_run(
                    br, _DEC_WHITE if color == 0 else _DEC_BLACK)
                r2 = _decode_run(
                    br, _DEC_BLACK if color == 0 else _DEC_WHITE)
                a1 = start + r1
                a2 = a1 + r2
                if color:
                    out[0, start:a1] = 1
                else:
                    out[0, a1:a2] = 1
                cur.append(min(a1, width))
                cur.append(min(a2, width))
                a0 = a2
            else:                                 # vertical
                a1 = b1 + arg
                if color:
                    out[0, max(a0, 0):a1] = 1
                cur.append(min(max(a1, 0), width))
                a0 = a1
                color ^= 1
            if a0 >= width:
                break
        # changing elements beyond the row edge don't exist (T.6)
        ref = [t for t in cur if t < width]
        lines.append(out[0])
    return np.stack(lines) if lines else np.zeros((0, width), np.uint8)


# -------------------------------------------------------------- G3 (T.4)

EOL = "000000000001"


def _read_eol(br: _BitReader) -> None:
    """Consume fill zeros + the T.4 EOL (11+ zeros then a 1)."""
    zeros = 0
    while True:
        b = br.bit()
        if b == 1:
            if zeros < 11:
                raise ValueError("CCITT G3: malformed EOL")
            return
        zeros += 1


def _decode_row_1d(br: _BitReader, width: int) -> np.ndarray:
    row = np.zeros(width, np.uint8)
    pos = 0
    color = 0
    while pos < width:
        run = _decode_run(br, _DEC_WHITE if color == 0 else _DEC_BLACK)
        if color:
            row[pos:pos + run] = 1
        pos += run
        color ^= 1
    if pos != width:
        raise ValueError(f"CCITT G3 1D: row overrun to {pos}")
    return row


def decode_g3(data: bytes, width: int, rows: int | None, *,
              two_d: bool = False) -> np.ndarray:
    """T.4 Group 3: EOL before every row; in 2-D mode a tag bit after
    each EOL says whether the row is 1-D (MH) or 2-D (the G4 modes
    against the previous row). Fill bits before EOLs (including the
    EncodedByteAlign case) are absorbed by the EOL scan."""
    br = _BitReader(data)
    lines: list[np.ndarray] = []
    ref: list[int] = []
    y = 0
    while rows is None or y < rows:
        if rows is None and _exhausted(br):
            break
        try:
            _read_eol(br)
        except ValueError:
            if rows is None:
                break
            raise
        is_1d = True
        if two_d:
            is_1d = br.bit() == 1
        # RTC: the next thing after EOL(+tag) is another EOL — no
        # run code starts with 11 zeros, so the peek is unambiguous
        if rows is None and br.peek_str(12) == EOL:
            break
        if is_1d:
            row = _decode_row_1d(br, width)
            t = _row_transitions(row)
            if width and row[0]:
                t = [0] + t
            ref = [x for x in t if x < width]
        else:
            # one 2-D row via the shared G4 row machinery
            row, ref = _decode_2d_row(br, width, ref)
        lines.append(row)
        y += 1
    return np.stack(lines) if lines else np.zeros((0, width), np.uint8)


def _decode_2d_row(br: _BitReader, width: int,
                   ref: list[int]) -> tuple:
    out = np.zeros(width, np.uint8)
    cur: list[int] = []
    a0, color = -1, 0
    while a0 < width:
        code = ""
        mode = None
        for _ in range(7):
            code += str(br.bit())
            if code == "1":
                mode = ("v", 0)
            elif code == "011":
                mode = ("v", 1)
            elif code == "010":
                mode = ("v", -1)
            elif code == "001":
                mode = ("h", None)
            elif code == "0001":
                mode = ("p", None)
            elif code == "000011":
                mode = ("v", 2)
            elif code == "000010":
                mode = ("v", -2)
            elif code == "0000011":
                mode = ("v", 3)
            elif code == "0000010":
                mode = ("v", -3)
            else:
                continue
            break
        if mode is None:
            raise ValueError(f"CCITT 2D: bad mode code {code!r}")
        b1 = _find_b1(ref, a0, color, width)
        b2 = _find_b1(ref, b1, color ^ 1, width) if b1 < width else width
        kind, arg = mode
        if kind == "p":
            if color:
                out[max(a0, 0):b2] = 1
            a0 = b2
        elif kind == "h":
            start = max(a0, 0)
            r1 = _decode_run(br, _DEC_WHITE if color == 0 else _DEC_BLACK)
            r2 = _decode_run(br, _DEC_BLACK if color == 0 else _DEC_WHITE)
            a1, a2 = start + r1, start + r1 + r2
            if color:
                out[start:a1] = 1
            else:
                out[a1:a2] = 1
            cur.append(min(a1, width))
            cur.append(min(a2, width))
            a0 = a2
        else:
            a1 = b1 + arg
            if color:
                out[max(a0, 0):a1] = 1
            cur.append(min(max(a1, 0), width))
            a0 = a1
            color ^= 1
        if a0 >= width:
            break
    return out, [t for t in cur if t < width]


def encode_g3(img: np.ndarray, *, two_d: bool = False,
              k: int = 0, byte_align: bool = False,
              rtc: bool = True) -> bytes:
    """T.4 Group 3 encoder. 1-D mode: EOL + MH per row. 2-D mode:
    a 1-D row every `k` rows (k=0: only the first row is 1-D, the
    rest 2-D — maximum compression, legal per spec)."""
    bw = _BitWriter()
    img = np.asarray(img, np.uint8)
    h, w = img.shape
    ref: list[int] = []
    for y in range(h):
        if byte_align:
            bw.align()
        bw.put(EOL)
        use_1d = (not two_d) or y == 0 or (k > 0 and y % k == 0)
        if two_d:
            bw.put("1" if use_1d else "0")
        cur = _row_transitions(img[y])
        if w and img[y, 0]:
            cur = [0] + cur
        if use_1d:
            pos = 0
            color = 0
            row = img[y]
            while pos < w:
                if color == 0:
                    run = int(np.argmax(row[pos:] != 0)) \
                        if (row[pos:] != 0).any() else w - pos
                else:
                    run = int(np.argmax(row[pos:] == 0)) \
                        if (row[pos:] == 0).any() else w - pos
                bw.put(_encode_run(
                    run, WHITE_CODES if color == 0 else BLACK_CODES))
                pos += run
                color ^= 1
        else:
            _encode_2d_row(bw, img[y], cur, ref, w)
        ref = [t for t in cur if t < w]
    if rtc:
        for _ in range(6):
            bw.put(EOL + ("1" if two_d else ""))
    return bw.bytes()


def _encode_2d_row(bw: _BitWriter, row: np.ndarray, cur: list[int],
                   ref: list[int], w: int) -> None:
    a0, color = -1, 0
    ci = 0
    while a0 < w:
        while ci < len(cur) and cur[ci] <= a0:
            ci += 1
        a1 = cur[ci] if ci < len(cur) else w
        b1 = _find_b1(ref, a0, color, w)
        b2 = _find_b1(ref, b1, color ^ 1, w) if b1 < w else w
        if b2 < a1:
            bw.put("0001")
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.put(_V_CODES[a1 - b1])
            a0 = a1
            ci += 1
            color ^= 1
        else:
            a2 = cur[ci + 1] if ci + 1 < len(cur) else w
            start = max(a0, 0)
            bw.put("001")
            bw.put(_encode_run(
                a1 - start, WHITE_CODES if color == 0 else BLACK_CODES))
            bw.put(_encode_run(
                a2 - a1, BLACK_CODES if color == 0 else WHITE_CODES))
            a0 = a2
            ci += 2
        if a0 >= w:
            break
