"""Full-matrix PNG decode (operators/codecs.py decode_png) validated
pixel-exactly against the system libpng16 simplified API
(tests/libpng_ref.py) over streams from the native test encoder
(encode_png_ex) — every legal color-type x bit-depth combination,
Adam7 interlacing, per-row filter cycling, PLTE/tRNS transparency.

16-bit files carry gAMA 45455 so libpng renders them with pure
accurate 16->8 scaling (its simplified API otherwise assumes 16-bit
files are LINEAR light and gamma-encodes on 8-bit output — the
calibration test below pins the mapping over all 65536 values).

libpng-dependent tests skip cleanly when the library is absent; the
round-trip and contract suites still gate the codec without it.

Reference parity anchor: jsoup (the reference engine) never decodes
images; this codec tier backs the multimodal pipeline operators
(SURVEY.md LLM-pipeline section), reference-free by design.
"""

import struct
import zlib

import numpy as np
import pytest

from jsoup_spark.operators.codecs import (
    _scale16, decode_png, encode_png, encode_png_ex)

import libpng_ref as ref

_rng = np.random.default_rng(20260817)

needs_libpng = pytest.mark.skipif(
    not ref.available(), reason="system libpng not present")

SHAPES = [(1, 1), (3, 5), (8, 8), (13, 17), (40, 33)]
# every legal color-type x depth combination
COMBOS = [(0, d) for d in (1, 2, 4, 8, 16)] \
    + [(2, 8), (2, 16), (3, 1), (3, 2), (3, 4), (3, 8),
       (4, 8), (4, 16), (6, 8), (6, 16)]


def _samples(h, w, color_type, depth):
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    hi = (1 << depth) if color_type != 3 else min(1 << depth, 13)
    s = _rng.integers(0, hi, (h, w, ch), dtype=np.int64)
    return s[:, :, 0] if ch == 1 else s


def _palette(n=13):
    return _rng.integers(0, 256, (n, 3), dtype=np.uint8)


def _to_rgba(arr):
    if arr.shape[2] == 1:
        g = arr[:, :, 0]
        return np.dstack([g, g, g, np.full_like(g, 255)])
    if arr.shape[2] == 2:
        g = arr[:, :, 0]
        return np.dstack([g, g, g, arr[:, :, 1]])
    if arr.shape[2] == 3:
        return np.dstack([arr, np.full(arr.shape[:2], 255, np.uint8)])
    return arr


def _encode(s, ct, d, **kw):
    pal = _palette() if ct == 3 else None
    gama = 45455 if d == 16 else None
    return encode_png_ex(s, ct, d, palette=pal, gama=gama, **kw), pal


def _expect(s, ct, d, pal):
    """Independent numpy rendering of the encoder input -> RGBA8."""
    if ct == 3:
        return _to_rgba(pal[s])
    v = _scale16(s) if d == 16 else \
        (s * (255 // ((1 << d) - 1)) if d < 8 else s)
    v = np.asarray(v, np.uint8)
    return _to_rgba(v if v.ndim == 3 else v[:, :, None])


# --------------------------------------------------- decode matrix

@pytest.mark.parametrize("combo", COMBOS)
@pytest.mark.parametrize("interlace", [False, True])
def test_decode_matrix_vs_source(combo, interlace):
    ct, d = combo
    for h, w in SHAPES:
        s = _samples(h, w, ct, d)
        data, pal = _encode(s, ct, d, interlace=interlace)
        mine = decode_png(data)
        assert np.array_equal(_to_rgba(mine), _expect(s, ct, d, pal)), \
            (combo, interlace, (h, w))


@needs_libpng
@pytest.mark.parametrize("combo", COMBOS)
@pytest.mark.parametrize("interlace", [False, True])
def test_decode_matrix_vs_libpng(combo, interlace):
    ct, d = combo
    if interlace and d == 16:
        # libpng16's SIMPLIFIED API mishandles 16-bit interlaced reads:
        # the direct path ignores the Adam7 row mapping (writes pass
        # rows sequentially at doubled stride) and overruns the output
        # buffer — reproduced with a pure-libpng 8x8 16-bit gray
        # passthrough read (FORMAT_LINEAR_GRAY), which segfaults.
        # 8-bit interlace (all color types) and 16-bit non-interlaced
        # (all 65536 values) are oracle-verified; the 16-bit interlaced
        # composition is pinned by the hand-built spec stream below.
        pytest.skip("libpng simplified API defect: 16-bit interlaced")
    for h, w in SHAPES:
        s = _samples(h, w, ct, d)
        data, _pal = _encode(s, ct, d, interlace=interlace)
        mine = _to_rgba(decode_png(data))
        theirs = ref.decode(data, ref.FORMAT_RGBA)
        assert mine.shape == theirs.shape \
            and np.array_equal(mine, theirs), (combo, interlace, (h, w))


@needs_libpng
def test_scale16_calibration_all_values():
    """_scale16 == libpng's 16->8 under a declared encoding gamma, for
    ALL 65536 sample values."""
    vals = np.arange(65536, dtype=np.int64).reshape(256, 256)
    data = encode_png_ex(vals, 0, 16, gama=45455, filters=(0,))
    theirs = ref.decode(data, ref.FORMAT_GRAY)[:, :, 0].astype(np.int64)
    assert np.array_equal(_scale16(vals), theirs)


def test_interlaced_handbuilt_stream():
    """Decode an Adam7 stream built BY HAND from the spec's pass tables
    (no shared encoder code): breaks the encoder/decoder symmetry that
    the matrix tests above can't, for both 8- and 16-bit."""
    h, w = 3, 5
    # spec pass geometry for a 3x5 image: pass -> list of (y, x)
    coords = [[(0, 0)], [(0, 4)], [], [(0, 2)],
              [(2, 0), (2, 2), (2, 4)],
              [(0, 1), (0, 3), (2, 1), (2, 3)],
              [(1, 0), (1, 1), (1, 2), (1, 3), (1, 4)]]
    # group each pass's pixels into rows (consecutive same-y runs)
    for depth in (8, 16):
        vals = _rng.integers(0, 1 << depth, (h, w), dtype=np.int64)
        body = bytearray()
        for cs in coords:
            rows = {}
            for y, x in cs:
                rows.setdefault(y, []).append(int(vals[y, x]))
            for y in sorted(rows):
                body.append(0)          # filter None
                for v in rows[y]:
                    body += struct.pack(">H" if depth == 16 else ">B", v)
        png = bytearray(b"\x89PNG\r\n\x1a\n")

        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", zlib.crc32(t + d) & 0xFFFFFFFF)

        png += chunk(b"IHDR", struct.pack(
            ">IIBBBBB", w, h, depth, 0, 0, 0, 1))
        png += chunk(b"IDAT", zlib.compress(bytes(body)))
        png += chunk(b"IEND", b"")
        out = decode_png(bytes(png))[:, :, 0].astype(np.int64)
        expect = _scale16(vals) if depth == 16 else vals
        assert np.array_equal(out, expect), depth


# --------------------------------------------------- tRNS transparency

@needs_libpng
def test_trns_palette():
    idx = _rng.integers(0, 7, (9, 11), dtype=np.int64)
    pal = _palette(7)
    trns = bytes([255, 0, 128, 255, 7])       # alphas for indices 0-4
    data = encode_png_ex(idx, 3, 8, palette=pal, trns=trns)
    mine = decode_png(data)
    assert mine.shape == (9, 11, 4)
    alpha = np.array([255, 0, 128, 255, 7, 255, 255], np.uint8)
    assert np.array_equal(mine[:, :, 3], alpha[idx])
    assert np.array_equal(mine[:, :, :3], pal[idx])
    assert np.array_equal(_to_rgba(mine), ref.decode(data))


@needs_libpng
@pytest.mark.parametrize("depth", [4, 8, 16])
def test_trns_gray_key(depth):
    s = _rng.integers(0, 1 << depth, (8, 8), dtype=np.int64)
    key = int(s[0, 0])
    gama = 45455 if depth == 16 else None
    data = encode_png_ex(s, 0, depth, trns=struct.pack(">H", key),
                         gama=gama)
    mine = decode_png(data)
    assert mine.shape == (8, 8, 2)
    assert np.array_equal(mine[:, :, 1] == 0, s == key)
    assert np.array_equal(_to_rgba(mine), ref.decode(data))


@needs_libpng
@pytest.mark.parametrize("depth", [8, 16])
def test_trns_rgb_key(depth):
    s = _rng.integers(0, 1 << depth, (6, 7, 3), dtype=np.int64)
    key = s[0, 0]
    gama = 45455 if depth == 16 else None
    data = encode_png_ex(
        s, 2, depth, gama=gama,
        trns=struct.pack(">HHH", *[int(k) for k in key]))
    mine = decode_png(data)
    assert mine.shape == (6, 7, 4)
    assert np.array_equal(mine[:, :, 3] == 0, (s == key).all(axis=2))
    assert np.array_equal(_to_rgba(mine), ref.decode(data))


# --------------------------------------------------- legacy + contracts

def test_encode_png_roundtrip_unchanged():
    # the production fast-path encoder still round-trips through the
    # rewritten decoder
    for ch in (1, 2, 3, 4):
        img = _rng.integers(0, 256, (15, 9, ch), dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert np.array_equal(out, img)


@needs_libpng
def test_encode_png_vs_libpng():
    img = _rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    assert np.array_equal(ref.decode(encode_png(img), ref.FORMAT_RGB), img)


def test_truncation_and_garbage():
    s = _samples(9, 9, 2, 8)
    data, _ = _encode(s, 2, 8)
    with pytest.raises(ValueError):
        decode_png(data[:20])
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30)
    # truncated IDAT payload -> length mismatch, not a crash
    bad = bytearray(data)
    # corrupt the zlib stream tail
    bad[-20] ^= 0xFF
    try:
        decode_png(bytes(bad))
    except (ValueError, zlib.error):
        pass


def test_illegal_combos_rejected():
    with pytest.raises(ValueError):
        encode_png_ex(np.zeros((4, 4), np.int64), 3, 16)
    # depth-16 palette stream crafted by hand must be rejected on decode
    s = np.zeros((4, 4), np.int64)
    data = bytearray(encode_png_ex(s, 0, 16, gama=45455))
    # patch IHDR color type to 3 (palette) keeping depth 16: illegal
    data[8 + 4 + 4 + 9] = 3
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_palette_index_out_of_range():
    idx = np.full((4, 4), 9, np.int64)
    data = encode_png_ex(idx, 3, 8, palette=_palette(5))
    with pytest.raises(ValueError):
        decode_png(data)
