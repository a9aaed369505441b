"""Native GIF codec (operators/gif.py), validated against the system
giflib (tests/libgif_ref.py ctypes bindings) plus self-contained
composition/contract tests.

Three independent directions:
* our DECODER vs giflib's DGifSlurp on the same bitstreams (raw index
  rasters, palettes, GCE state) — catches decoder-side LZW/interlace
  misreadings that symmetric round trips can't;
* our ENCODER's output decoded by giflib and composited back to the
  source — catches encoder-side bit-packing bugs the same way;
* canvas composition (offsets, transparency, disposal 0-3) against
  naive numpy recomputations in the tests themselves.

giflib-dependent tests skip cleanly when libgif.so is absent; the
round-trip and composition suites still gate the codec without it.

Reference parity anchor: jsoup (the reference engine) never decodes
images; this codec tier backs the multimodal pipeline operators
(SURVEY.md LLM-pipeline section), reference-free by design.
"""

import numpy as np
import pytest

from jsoup_spark.operators import codecs
from jsoup_spark.operators.gif import (
    _deinterlace, decode_gif, encode_gif, encode_gif_frames, gif_frames,
    parse_gif)

import libgif_ref as ref

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
    # "pal": few distinct colors — the single-strip fast path
    pal = _rng.integers(0, 256, (7, 3), dtype=np.uint8)
    return pal[_rng.integers(0, 7, (h, w))]


SHAPES = [(1, 1), (3, 5), (16, 16), (17, 31), (64, 48), (2, 300), (300, 2)]
KINDS = ["noise", "grad", "flat", "pal"]


def _frames(n, h, w, ncolors=5):
    """n deterministic (indices, palette) frames."""
    out = []
    for i in range(n):
        pal = _rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
        idx = _rng.integers(0, ncolors, (h, w), dtype=np.uint8)
        out.append((idx, pal))
    return out


# --------------------------------------------------- self round trips

@pytest.mark.parametrize("shape", SHAPES)
def test_truecolor_roundtrip(shape):
    h, w = shape
    for kind in KINDS:
        img = _img(h, w, kind)
        data = encode_gif(img)
        out = decode_gif(data)
        assert out.shape == img.shape and np.array_equal(out, img), \
            (shape, kind)


def test_wide_noise_row_splits_columns():
    # a single row with > 256 distinct colors forces the column-split
    # path: one image descriptor per 256-pixel chunk
    img = _rng.integers(0, 256, (1, 700, 3), dtype=np.uint8)
    data = encode_gif(img)
    gif = parse_gif(data)
    assert len(gif.images) >= 3
    assert np.array_equal(decode_gif(data), img)


def test_lzw_dictionary_overflow_roundtrip():
    # enough pixels that the LZW table hits 4096 and the encoder emits a
    # mid-stream clear code
    img = _rng.integers(0, 256, (300, 300, 3), dtype=np.uint8)
    img[:, :, 0] = img[:, :, 1] = 0        # <= 256 colors, big raster
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_interlace_roundtrip():
    (idx, pal), = _frames(1, 37, 23)
    data = encode_gif_frames([(idx, pal)], interlace=True)
    gif = parse_gif(data)
    assert gif.images[0].interlace
    assert np.array_equal(_deinterlace(gif.images[0].indices), idx)
    assert np.array_equal(decode_gif(data)[:, :, :3], pal[idx])


def test_deinterlace_permutation():
    # deinterlacing is exactly the inverse of the encoder's row
    # reordering for every height, including heights < 8
    for h in (1, 2, 3, 4, 5, 7, 8, 9, 16, 33):
        idx = np.arange(h, dtype=np.uint8).reshape(h, 1)
        order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for y in range(start, h, step)]
        assert np.array_equal(_deinterlace(idx[order]), idx), h


# --------------------------------------------------- canvas composition

def test_transparency_leaves_canvas():
    base = np.zeros((4, 4), np.uint8)
    pal = np.array([[10, 20, 30], [200, 0, 0]], np.uint8)
    over = np.zeros((4, 4), np.uint8)
    over[1:3, 1:3] = 1
    data = encode_gif_frames(
        [(base, pal), (over, pal)], transparents=[None, 0])
    frames = list(gif_frames(data))
    assert len(frames) == 2
    canvas, alpha, _ = frames[1]
    expect = np.tile(pal[0], (4, 4, 1))
    expect[1:3, 1:3] = pal[1]
    assert np.array_equal(canvas, expect) and alpha.all()


def test_offsets_and_partial_paint_rgba():
    # a 2x2 frame at (1,1) on a 4x4 canvas: unpainted pixels surface as
    # alpha=0 in decode_gif's RGBA output
    idx = np.ones((2, 2), np.uint8)
    pal = np.array([[0, 0, 0], [9, 9, 9]], np.uint8)
    data = encode_gif_frames([(idx, pal)], offsets=[(1, 1)],
                             canvas_size=(4, 4))
    out = decode_gif(data)
    assert out.shape == (4, 4, 4)
    assert (out[1:3, 1:3, :3] == 9).all() and (out[1:3, 1:3, 3] == 255).all()
    assert out[0, 0, 3] == 0 and out[3, 3, 3] == 0


def test_disposal_restore_background():
    pal = np.array([[1, 1, 1], [2, 2, 2]], np.uint8)
    full = np.zeros((3, 3), np.uint8)
    patch = np.ones((1, 1), np.uint8)
    data = encode_gif_frames(
        [(full, pal), (patch, pal), (full, pal)],
        offsets=[(0, 0), (1, 1), (0, 0)],
        disposals=[0, 2, 0], transparents=[None, None, 0])
    frames = list(gif_frames(data))
    # frame 2 paints the patch; disposal 2 then clears that region to
    # transparent, and frame 3 (all-transparent) leaves it cleared
    canvas, alpha, _ = frames[2]
    assert not alpha[1, 1]
    assert alpha.sum() == 8


def test_disposal_restore_previous():
    pal = np.array([[1, 1, 1], [2, 2, 2]], np.uint8)
    full = np.zeros((3, 3), np.uint8)
    patch = np.ones((1, 1), np.uint8)
    data = encode_gif_frames(
        [(full, pal), (patch, pal), (patch, pal)],
        offsets=[(0, 0), (1, 1), (1, 1)],
        disposals=[0, 3, 0], transparents=[None, None, 1])
    frames = list(gif_frames(data))
    assert np.array_equal(frames[1][0][1, 1], pal[1])
    # disposal 3 restored pal[0] under the patch; frame 3's transparent
    # index leaves it visible
    assert np.array_equal(frames[2][0][1, 1], pal[0])


def test_netscape_loop_and_delays():
    fr = _frames(2, 3, 3)
    data = encode_gif_frames(fr, delays_cs=[10, 250], loop=7)
    gif = parse_gif(data)
    assert gif.loop_count == 7
    assert [i.delay_cs for i in gif.images] == [10, 250]
    assert [d for _, _, d in gif_frames(data)] == [10, 250]


# --------------------------------------------------- error contracts

def test_truncation_raises_everywhere():
    img = _img(13, 17, "grad")
    data = encode_gif(img)
    for cut in sorted({1, 5, 12, 14, len(data) // 2, len(data) - 1}):
        with pytest.raises(ValueError):
            parse_gif(data[:cut])


def test_corruption_never_hangs():
    img = _img(9, 11, "pal")
    data = bytearray(encode_gif(img))
    for i in range(13, len(data), 7):
        mutated = bytes(data[:i]) + bytes([data[i] ^ 0xFF]) \
            + bytes(data[i + 1:])
        try:
            decode_gif(mutated)
        except ValueError:
            pass


def test_not_a_gif():
    with pytest.raises(ValueError):
        parse_gif(b"NOTGIF" + b"\x00" * 40)
    with pytest.raises(ValueError):
        parse_gif(b"GIF89a")          # truncated header


# --------------------------------------------------- giflib oracle

needs_giflib = pytest.mark.skipif(
    not ref.available(), reason="system giflib not present")


@needs_giflib
@pytest.mark.parametrize("shape", SHAPES)
def test_encoder_vs_giflib(shape):
    """giflib decodes our encoder's output; compositing its rasters
    reproduces the source exactly."""
    h, w = shape
    for kind in KINDS:
        img = _img(h, w, kind)
        g = ref.slurp(encode_gif(img))
        assert (g["width"], g["height"]) == (w, h)
        canvas = np.zeros((h, w, 3), np.uint8)
        for im in g["images"]:
            pal = im["palette"] if im["palette"] is not None \
                else g["global_palette"]
            canvas[im["top"]:im["top"] + im["height"],
                   im["left"]:im["left"] + im["width"]] = pal[im["indices"]]
        assert np.array_equal(canvas, img), (shape, kind)


@needs_giflib
def test_decoder_vs_giflib_animation():
    """parse_gif's rasters/palettes/GCE state match DGifSlurp field by
    field across disposal/transparency/offset/interlace combinations."""
    cases = [
        dict(frames=_frames(3, 21, 17), delays_cs=[0, 5, 500],
             disposals=[0, 1, 2], transparents=[None, 2, 0],
             offsets=[(0, 0), (3, 2), (1, 5)], canvas_size=(30, 30)),
        dict(frames=_frames(2, 40, 9), interlace=True),
        dict(frames=_frames(1, 8, 8, ncolors=256)),
        dict(frames=_frames(4, 5, 5), disposals=[3, 3, 2, 0],
             transparents=[1, None, 1, None]),
    ]
    for case in cases:
        data = encode_gif_frames(**case)
        mine = parse_gif(data)
        theirs = ref.slurp(data)
        assert len(mine.images) == len(theirs["images"])
        assert (mine.width, mine.height) == \
            (theirs["width"], theirs["height"])
        for m, t in zip(mine.images, theirs["images"]):
            assert (m.left, m.top, m.width, m.height, m.interlace) == \
                (t["left"], t["top"], t["width"], t["height"],
                 t["interlace"])
            midx = _deinterlace(m.indices) if m.interlace else m.indices
            assert np.array_equal(midx, t["indices"])
            assert np.array_equal(m.palette, t["palette"])
            assert m.disposal == t["disposal"]
            assert m.delay_cs == t["delay_cs"]
            assert m.transparent == t["transparent"]


@needs_giflib
def test_decoder_vs_giflib_big_lzw():
    """dictionary-overflow streams (mid-stream clear) agree with giflib
    index for index."""
    img = _rng.integers(0, 256, (300, 300, 3), dtype=np.uint8)
    img[:, :, 0] = img[:, :, 1] = 77
    data = encode_gif(img)
    mine = parse_gif(data)
    theirs = ref.slurp(data)
    assert len(mine.images) == len(theirs["images"])
    for m, t in zip(mine.images, theirs["images"]):
        assert np.array_equal(m.indices, t["indices"])
        assert np.array_equal(m.palette, t["palette"])


# --------------------------------------------------- multimodal wiring

def test_sniff_and_decode_image_array():
    from jsoup_spark.operators.multimodal import decode_image_array
    img = _img(20, 14, "grad")
    data = encode_gif(img)
    assert codecs.sniff_format(data) == "gif"
    out = decode_image_array(data)
    assert out is not None and np.array_equal(out, img)
