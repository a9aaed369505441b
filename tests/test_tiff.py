"""Native TIFF codec (operators/tiff.py), validated against the system
libtiff in BOTH directions (tests/libtiff_ref.py ctypes bindings):

* our ENCODER's output rendered by TIFFReadRGBAImageOriented across the
  full knob matrix (compression x predictor x layout x endian x depth x
  photometric);
* our DECODER reading libtiff's OWN writer output (LZW / Deflate /
  PackBits, with and without predictor, multi-strip) — the direction
  that catches decoder-side spec misreadings symmetric round trips
  can't.

16-bit test samples use v = k*257 so libtiff's chop (>>8) and our
accurate rounding scale agree (see libtiff_ref docstring).  Tests skip
cleanly when libtiff is absent; round trips and contracts still run.

Reference parity anchor: jsoup (the reference engine) never decodes
images; this codec tier backs the multimodal pipeline operators
(SURVEY.md LLM-pipeline section), reference-free by design.
"""

import numpy as np
import pytest

from jsoup_spark.operators.tiff import decode_tiff, encode_tiff

import libtiff_ref as ref

_rng = np.random.default_rng(20260817)

needs_libtiff = pytest.mark.skipif(
    not ref.available(), reason="system libtiff not present")

COMPS = [1, 5, 8, 32773]
SHAPES = [(1, 1), (5, 3), (16, 16), (33, 47), (70, 61)]


def _img(h, w, spp):
    a = _rng.integers(0, 256, (h, w, spp), dtype=np.int64)
    return a[:, :, 0] if spp == 1 else a


def _to_rgba(arr, photo_gray=False):
    if arr.ndim == 2:
        arr = arr[:, :, None]
    c = arr.shape[2]
    a255 = np.full(arr.shape[:2], 255, np.uint8)
    if c == 1:
        g = arr[:, :, 0]
        return np.dstack([g, g, g, a255])
    if c == 2:
        g = arr[:, :, 0]
        return np.dstack([g, g, g, arr[:, :, 1]])
    if c == 3:
        return np.dstack([arr, a255])
    return arr


# ----------------------------------------------------- self round trips

@pytest.mark.parametrize("comp", COMPS)
@pytest.mark.parametrize("pred", [1, 2])
def test_roundtrip_rgb(comp, pred):
    if pred == 2 and comp not in (5, 8):
        pytest.skip("predictor needs LZW/Deflate")
    for h, w in SHAPES:
        img = _img(h, w, 3)
        data = encode_tiff(img, compression=comp, predictor=pred)
        assert np.array_equal(decode_tiff(data), img.astype(np.uint8))


@pytest.mark.parametrize("bo", [False, True])
@pytest.mark.parametrize("depth", [1, 2, 4, 8, 16])
def test_roundtrip_gray_depths(bo, depth):
    h, w = 21, 13
    vals = _rng.integers(0, 1 << depth, (h, w), dtype=np.int64)
    data = encode_tiff(vals, photometric=1, bit_depth=depth,
                       big_endian=bo)
    out = decode_tiff(data)[:, :, 0].astype(np.int64)
    if depth == 16:
        expect = (vals * 255 + 32767) // 65535
    elif depth < 8:
        expect = vals * (255 // ((1 << depth) - 1))
    else:
        expect = vals
    assert np.array_equal(out, expect), (bo, depth)


def test_roundtrip_layouts():
    img = _img(50, 37, 3)
    for kw in (dict(rows_per_strip=7), dict(tile=(16, 16)),
               dict(planar=True), dict(planar=True, tile=(16, 32)),
               dict(planar=True, rows_per_strip=11, compression=5),
               dict(tile=(16, 16), compression=8, predictor=2)):
        data = encode_tiff(img, **kw)
        assert np.array_equal(decode_tiff(data),
                              img.astype(np.uint8)), kw


def test_roundtrip_palette_and_whitezero():
    idx = _rng.integers(0, 11, (9, 14), dtype=np.int64)
    cmap = _rng.integers(0, 256, (16, 3), dtype=np.int64) * 257
    data = encode_tiff(idx, photometric=3, bit_depth=4, colormap=cmap)
    out = decode_tiff(data)
    assert np.array_equal(out, (cmap[idx] // 257).astype(np.uint8))
    g = _rng.integers(0, 256, (8, 8), dtype=np.int64)
    data = encode_tiff(g, photometric=0)
    assert np.array_equal(decode_tiff(data)[:, :, 0],
                          (255 - g).astype(np.uint8))


def test_roundtrip_rgba():
    img = _img(12, 19, 4)
    data = encode_tiff(img, extra_alpha=True)
    assert np.array_equal(decode_tiff(data), img.astype(np.uint8))


# ----------------------------------------------------- libtiff oracle

@needs_libtiff
@pytest.mark.parametrize("comp", COMPS)
def test_encoder_vs_libtiff_matrix(comp):
    for h, w in SHAPES:
        for spp in (1, 3, 4):
            for kw in (dict(), dict(predictor=2),
                       dict(rows_per_strip=7), dict(tile=(16, 16)),
                       dict(planar=True), dict(big_endian=True)):
                if comp not in (5, 8) and kw.get("predictor"):
                    continue            # predictor needs LZW/Deflate
                img = _img(h, w, spp)
                data = encode_tiff(
                    img, compression=comp,
                    photometric=1 if spp == 1 else 2,
                    extra_alpha=spp == 4, **kw)
                theirs = ref.decode_rgba(data)
                assert np.array_equal(theirs, _to_rgba(
                    img.astype(np.uint8))), (comp, spp, (h, w), kw)


@needs_libtiff
def test_encoder_vs_libtiff_palette():
    idx = _rng.integers(0, 13, (22, 17), dtype=np.int64)
    cmap = _rng.integers(0, 256, (16, 3), dtype=np.int64) * 257
    data = encode_tiff(idx, photometric=3, bit_depth=4, colormap=cmap,
                       compression=5)
    theirs = ref.decode_rgba(data)
    assert np.array_equal(theirs, _to_rgba(
        (cmap[idx] // 257).astype(np.uint8)))


@needs_libtiff
def test_encoder_vs_libtiff_subbyte_gray():
    for depth in (1, 2, 4):
        vals = _rng.integers(0, 1 << depth, (15, 26), dtype=np.int64)
        data = encode_tiff(vals, photometric=1, bit_depth=depth,
                           compression=32773)
        theirs = ref.decode_rgba(data)
        expect = (vals * (255 // ((1 << depth) - 1))).astype(np.uint8)
        assert np.array_equal(theirs, _to_rgba(expect)), depth


@needs_libtiff
def test_encoder_vs_libtiff_16bit():
    # k*257 values: libtiff's chop and our rounding scale agree
    vals = _rng.integers(0, 256, (18, 9), dtype=np.int64) * 257
    for bo in (False, True):
        data = encode_tiff(vals, photometric=1, bit_depth=16,
                           big_endian=bo, compression=8)
        theirs = ref.decode_rgba(data)
        assert np.array_equal(theirs,
                              _to_rgba((vals // 257).astype(np.uint8)))
        assert np.array_equal(decode_tiff(data)[:, :, 0],
                              (vals // 257).astype(np.uint8))


@needs_libtiff
@pytest.mark.parametrize("comp", COMPS)
def test_decoder_vs_libtiff_writer(comp):
    """Our decoder on libtiff's own encoder output."""
    for spp in (1, 3, 4):
        for pred in ([None, 2] if comp in (5, 8) else [None]):
            img = _img(70, 61, spp)
            data = ref.encode(img.astype(np.uint8), compression=comp,
                              predictor=pred, rows_per_strip=16)
            mine = decode_tiff(data)
            src = img if img.ndim == 3 else img[:, :, None]
            assert np.array_equal(mine, src.astype(np.uint8)), \
                (comp, spp, pred)


# ----------------------------------------------------- contracts

def test_truncation_raises():
    img = _img(12, 12, 3)
    data = encode_tiff(img, compression=5)
    for cut in (3, 7, 20, len(data) // 2):
        with pytest.raises(ValueError):
            decode_tiff(data[:cut])
    with pytest.raises(ValueError):
        decode_tiff(b"II*\x00" + b"\xff" * 20)


def test_not_a_tiff():
    with pytest.raises(ValueError):
        decode_tiff(b"NOTATIFF" * 4)


def test_unsupported_compression():
    img = _img(4, 4, 3)
    data = bytearray(encode_tiff(img))
    # patch the Compression tag value (type SHORT, inline) to JPEG (7)
    import struct
    ifd_off = struct.unpack("<I", data[4:8])[0]
    n = struct.unpack("<H", data[ifd_off:ifd_off + 2])[0]
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag = struct.unpack("<H", data[base:base + 2])[0]
        if tag == 259:
            data[base + 8:base + 10] = struct.pack("<H", 7)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(data))
