"""Lossy VP8 + VP8L WebP decode, validated byte-exactly against the
system libwebp (tests/libwebp_ref.py ctypes bindings).

Every comparison target is libwebp's OWN decode of the same bitstream
(`WebPDecodeRGB[A]` / `WebPDecodeYUV`), never the pre-encode source:
lossy coding changes pixels, and even lossless RGBA is rewritten under
fully-transparent pixels by libwebp's default `exact=0` encoder. The
suites skip cleanly when libwebp is absent (the self-round-trip suites
in test_codecs.py still gate the VP8L decoder there).

Reference parity anchor: jsoup (the reference engine) never decodes
images; this codec tier backs the multimodal pipeline operators
(SURVEY.md LLM-pipeline section), reference-free by design.
"""

import numpy as np
import pytest

from jsoup_spark.operators import codecs
from jsoup_spark.operators.vp8 import decode_vp8, yuv_to_rgb

import libwebp_ref as ref

pytestmark = pytest.mark.skipif(
    not ref.available(), reason="system libwebp not present")

_rng = np.random.default_rng(20260817)


def _img(h, w, kind):
    if kind == "noise":
        return _rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "grad":
        y, x = np.mgrid[0:h, 0:w]
        return np.stack(
            [x * 255 // max(w - 1, 1), y * 255 // max(h - 1, 1),
             (x + y) % 256], -1).astype(np.uint8)
    if kind == "flat":
        return np.full((h, w, 3), 137, np.uint8)
    if kind == "pal":
        pal = _rng.integers(0, 256, (7, 3), dtype=np.uint8)
        return pal[_rng.integers(0, 7, (h, w))]
    # "photo": blocky base + mild noise — realistic DCT content
    base = _rng.integers(
        0, 256, ((h + 7) // 8, (w + 7) // 8, 3), np.uint8).astype(np.float32)
    img = np.kron(base, np.ones((8, 8, 1), np.float32))[:h, :w]
    img += _rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


# Odd/even, sub-macroblock, non-multiple-of-16, wide/tall: exercises
# edge clamping in prediction, upsampling and the frame crop.
SHAPES = [(1, 1), (3, 5), (16, 16), (17, 31), (64, 48), (7, 120), (120, 7)]
KINDS = ["noise", "grad", "flat", "pal", "photo"]


@pytest.mark.parametrize("shape", SHAPES)
def test_lossless_vs_libwebp(shape):
    h, w = shape
    for kind in KINDS:
        img = _img(h, w, kind)
        data = ref.encode_lossless_rgb(img)
        mine = codecs.decode_webp(data)
        theirs = ref.decode_rgb(data)
        assert mine.shape == theirs.shape and np.array_equal(mine, theirs), \
            ("lossless", shape, kind)
        # lossless RGB must also equal the source exactly
        assert np.array_equal(mine, img)


@pytest.mark.parametrize("shape", SHAPES)
def test_lossless_rgba_vs_libwebp(shape):
    h, w = shape
    img = _img(h, w, "pal")
    a = _rng.integers(0, 256, (h, w, 1), dtype=np.uint8)
    data = ref.encode_lossless_rgba(np.concatenate([img, a], -1))
    mine = codecs.decode_webp(data)
    theirs = ref.decode_rgba(data)
    assert mine.shape == theirs.shape and np.array_equal(mine, theirs)


@pytest.mark.parametrize("shape", SHAPES)
def test_lossy_vs_libwebp(shape):
    h, w = shape
    for kind in KINDS:
        for q in (20.0, 75.0, 95.0):
            img = _img(h, w, kind)
            data = ref.encode_rgb(img, q)
            mine = codecs.decode_webp(data)
            theirs = ref.decode_rgb(data)
            assert mine.shape == theirs.shape \
                and np.array_equal(mine, theirs), ("lossy", shape, kind, q)


def test_lossy_quality_extremes():
    # q=0 drives maximal quantizers + strongest loop filtering; q=100
    # minimal — both ends of the dequant tables and filter strengths.
    img = _img(48, 33, "photo")
    for q in (0.0, 100.0):
        data = ref.encode_rgb(img, q)
        assert np.array_equal(codecs.decode_webp(data), ref.decode_rgb(data))


def test_lossy_alpha_vs_libwebp():
    # ALPH chunk (VP8X container): lossless-compressed alpha plane +
    # optional per-pixel filter, over the lossy VP8 color stream.
    for h, w in ((16, 16), (23, 41)):
        img = _img(h, w, "photo")
        # structured alpha (compresses with filtering), plus some noise
        a = (np.mgrid[0:h, 0:w][0] * 255 // max(h - 1, 1)).astype(np.uint8)
        a = np.clip(
            a.astype(np.int32)
            + _rng.integers(-9, 10, (h, w)), 0, 255).astype(np.uint8)
        rgba = np.concatenate([img, a[:, :, None]], -1)
        data = ref.encode_rgba(rgba, 75.0)
        mine = codecs.decode_webp(data)
        theirs = ref.decode_rgba(data)
        assert mine.shape == theirs.shape and np.array_equal(mine, theirs)
        # alpha survives the lossless side channel exactly
        assert np.array_equal(mine[:, :, 3], a)


def test_yuv_planes_vs_libwebp():
    # Validates decode_vp8 BEFORE the RGB conversion: reconstruction +
    # loop filter output planes must equal WebPDecodeYUV's.
    img = _img(64, 48, "photo")
    data = ref.encode_rgb(img, 75.0)
    y, u, v = decode_vp8(_vp8_chunk(data))
    ry, ru, rv = ref.decode_yuv(data)
    assert np.array_equal(y, ry)
    assert np.array_equal(u, ru)
    assert np.array_equal(v, rv)
    # and the fancy upsampler + matrix reproduces WebPDecodeRGB
    assert np.array_equal(yuv_to_rgb(y, u, v), ref.decode_rgb(data))


def _vp8_chunk(data: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        if tag == b"VP8 ":
            return data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def test_error_contracts():
    img = _img(32, 32, "photo")
    data = ref.encode_rgb(img, 75.0)
    chunk = _vp8_chunk(data)
    with pytest.raises(ValueError):
        decode_vp8(chunk[:8])                     # truncated
    bad = bytearray(chunk)
    bad[0] |= 1                                   # interframe bit
    with pytest.raises(ValueError):
        decode_vp8(bytes(bad))
    bad = bytearray(chunk)
    bad[3] ^= 0xFF                                # start code
    with pytest.raises(ValueError):
        decode_vp8(bytes(bad))
    # container-level truncation degrades with ValueError, never crashes
    for cut in (16, len(data) // 2, len(data) - 2):
        with pytest.raises(ValueError):
            codecs.decode_webp(data[:cut])


@pytest.mark.parametrize("kw", [
    dict(), dict(subtract_green=True), dict(predictor=True),
    dict(color_transform=True), dict(palette=True), dict(cache_bits=5),
    dict(meta_bits=2),
    dict(predictor=True, subtract_green=True, cache_bits=6),
])
def test_own_encoder_accepted_by_libwebp(kw):
    # The spec-conformance cross-check the r7 notes called
    # unverifiable without a reference implementation: every feature
    # our test encoder can emit (all four transforms, color cache,
    # meta groups, the 2D LZ77 distance mapping) must decode
    # pixel-exactly in libwebp itself.
    rng = np.random.RandomState(99)
    for shape in ((1, 1, 3), (9, 13, 3), (16, 16, 4), (37, 21, 3)):
        if kw.get("palette"):
            pal = rng.randint(0, 256, (6, shape[2]), dtype=np.uint8)
            img = pal[rng.randint(0, 6, shape[:2])]
        else:
            img = rng.randint(0, 256, shape, dtype=np.uint8)
        data = codecs.encode_webp_lossless(img, **kw)
        out = ref.decode_rgba(data) if shape[2] == 4 else ref.decode_rgb(data)
        assert out.shape[:2] == img.shape[:2]
        assert np.array_equal(out[:, :, :shape[2]], img), (kw, shape)


def test_multimodal_dispatch_lossy():
    # decode_image_array routes lossy WebP through the native decoder
    from jsoup_spark.operators import multimodal
    img = _img(24, 17, "photo")
    data = ref.encode_rgb(img, 75.0)
    arr = multimodal.decode_image_array(data)
    assert arr is not None and np.array_equal(arr, ref.decode_rgb(data))
    assert multimodal.decode_image(data) == (17, 24)
