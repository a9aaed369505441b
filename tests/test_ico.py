"""ICO/CUR codec (operators/ico.py): container framing round trips
(the payloads inside are the oracle-validated PNG/BMP machinery),
hand-built palettized/24-bpp DIB entries, selection rule, contracts."""

import struct

import numpy as np
import pytest

from jsoup_spark.operators.ico import (
    decode_ico, encode_ico, ico_frames)

_rng = np.random.default_rng(20260817)


def _rgba(h, w):
    return _rng.integers(0, 256, (h, w, 4), dtype=np.uint8)


def test_roundtrip_dib_and_png_entries():
    small = _rgba(16, 16)
    big = _rgba(64, 64)
    data = encode_ico([small, big])          # DIB + PNG by convention
    frames = [img for img, _ in ico_frames(data)]
    assert len(frames) == 2
    assert np.array_equal(frames[0], small)
    assert np.array_equal(frames[1], big)
    assert np.array_equal(decode_ico(data), big)   # largest wins


def test_vista_alpha_rule():
    # 32bpp with all-zero alpha: AND mask supplies transparency
    img = _rgba(8, 8)
    img[:, :, 3] = 0
    data = bytearray(encode_ico([img], as_png=[False]))
    out = decode_ico(bytes(data))
    # encoder's AND mask marks alpha==0 as transparent -> all pixels
    assert (out[:, :, 3] == 0).all()
    assert np.array_equal(out[:, :, :3], img[:, :, :3])


def test_hand_built_24bpp_and_palette_dib():
    # 24-bpp DIB with checkerboard AND mask
    h = w = 8
    rgb = _rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    transparent = ((yy + xx) % 2).astype(np.uint8)
    bgr = rgb[:, :, ::-1][::-1]
    hdr = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 24, 0,
                      0, 0, 0, 0, 0)
    xor_stride = (w * 3 + 3) & ~3
    xor = b"".join(bgr[y].tobytes().ljust(xor_stride, b"\0")
                   for y in range(h))
    mask = np.zeros((h, 32), np.uint8)
    mask[:, :w] = transparent[::-1]
    blob = hdr + xor + np.packbits(mask, axis=1).tobytes()
    ico = struct.pack("<HHH", 0, 1, 1) + struct.pack(
        "<BBBBHHII", w, h, 0, 0, 1, 24, len(blob), 22) + blob
    out = decode_ico(ico)
    assert np.array_equal(out[:, :, :3], rgb)
    assert np.array_equal(out[:, :, 3] == 0, transparent.astype(bool))

    # 4-bit palettized DIB
    pal = np.zeros((16, 4), np.uint8)
    pal[:, 0] = np.arange(16) * 17          # blue channel
    idx = _rng.integers(0, 16, (h, w), dtype=np.uint8)
    hdr = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 4, 0,
                      0, 0, 0, 16, 0)
    rows = []
    for y in range(h - 1, -1, -1):
        packed = np.packbits(
            ((idx[y][:, None] >> np.array([3, 2, 1, 0])) & 1)
            .astype(np.uint8).reshape(-1))
        rows.append(packed.tobytes().ljust((w * 4 + 31) // 32 * 4,
                                           b"\0"))
    mask = np.zeros((h, 32), np.uint8)
    blob = hdr + pal.tobytes() + b"".join(rows) \
        + np.packbits(mask, axis=1).tobytes()
    ico = struct.pack("<HHH", 0, 1, 1) + struct.pack(
        "<BBBBHHII", w, h, 16, 0, 1, 4, len(blob), 22) + blob
    out = decode_ico(ico)
    assert np.array_equal(out[:, :, 2], (idx * 17).astype(np.uint8))
    assert (out[:, :, 3] == 255).all()


def test_contracts():
    with pytest.raises(ValueError):
        decode_ico(b"\x00\x00\x03\x00\x01\x00" + b"\0" * 20)
    data = encode_ico([_rgba(16, 16)])
    for cut in (3, 10, 30):
        with pytest.raises(ValueError):
            decode_ico(data[:cut])
