"""ICO/CUR (favicon) codec: the container every website's
/favicon.ico ships. A directory of images, each either an embedded
PNG (modern) or a headerless DIB — a BITMAPINFOHEADER with DOUBLED
height whose lower half is the XOR (color) image and upper half a
1-bit AND (transparency) mask.

Decoder covers PNG entries (via codecs.decode_png, oracle-validated
vs libpng), 32-bpp DIBs (alpha channel; the AND mask applies only
when the alpha plane is entirely zero — the Vista rule), 24-bpp DIBs
+ AND mask, and 1/4/8-bit palettized DIBs. `decode_ico` returns the
"best" image (largest area, then highest bpp — what browsers pick);
`ico_frames` yields all of them.

The encoder builds both entry kinds for the round-trip tests (the
container framing is ours to test; the pixel payloads inside are the
already-oracle-validated PNG/BMP machinery).

Reference parity anchor (semantic, not a port): favicons are the
media column of every crawl; the reference never decodes images.
"""

from __future__ import annotations

import struct

import numpy as np

from . import codecs


def _dib_image(data: bytes) -> np.ndarray:
    """Headerless DIB (doubled-height BITMAPINFOHEADER) -> RGBA."""
    if len(data) < 40:
        raise ValueError("ICO: truncated DIB header")
    (hdr_size, w, h2, _planes, bpp, comp) = struct.unpack(
        "<IiiHHI", data[:20])
    if hdr_size != 40 or comp != 0:
        raise ValueError("ICO: unsupported DIB variant")
    h = h2 // 2
    if w <= 0 or h <= 0:
        raise ValueError("ICO: bad DIB dimensions")
    pos = hdr_size
    if bpp <= 8:
        ncolors = struct.unpack("<I", data[32:36])[0] or (1 << bpp)
        pal = np.frombuffer(data, np.uint8, count=4 * ncolors,
                            offset=pos).reshape(ncolors, 4)
        pos += 4 * ncolors
    xor_stride = (w * bpp + 31) // 32 * 4
    and_stride = (w + 31) // 32 * 4
    need = pos + h * xor_stride + h * and_stride
    if len(data) < need:
        raise ValueError("ICO: truncated DIB pixel data")
    xor = np.frombuffer(data, np.uint8, count=h * xor_stride,
                        offset=pos).reshape(h, xor_stride)
    mask_raw = np.frombuffer(
        data, np.uint8, count=h * and_stride,
        offset=pos + h * xor_stride).reshape(h, and_stride)
    mask = np.unpackbits(mask_raw, axis=1)[:, :w][::-1]  # 1 = transparent
    if bpp == 32:
        px = xor[:, :w * 4].reshape(h, w, 4)[::-1]
        rgba = px[:, :, [2, 1, 0, 3]].copy()
        if (rgba[:, :, 3] == 0).all():      # Vista rule: fall back to
            rgba[:, :, 3] = (1 - mask) * 255  # the AND mask
        return rgba
    if bpp == 24:
        px = xor[:, :w * 3].reshape(h, w, 3)[::-1]
        rgb = px[:, :, ::-1]
        alpha = ((1 - mask) * 255).astype(np.uint8)
        return np.dstack([rgb, alpha])
    if bpp in (1, 4, 8):
        bits = np.unpackbits(xor, axis=1)
        idx = bits[:, :w * bpp].reshape(h, w, bpp)
        weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
        indices = (idx * weights).sum(axis=2)[::-1]
        if (indices >= len(pal)).any():
            raise ValueError("ICO: palette index out of range")
        bgr = pal[indices][:, :, :3]
        alpha = ((1 - mask) * 255).astype(np.uint8)
        return np.dstack([bgr[:, :, ::-1], alpha])
    raise ValueError(f"ICO: unsupported DIB bpp {bpp}")


def ico_frames(payload: bytes):
    """Yield (rgba, bpp_hint) per directory entry."""
    if len(payload) < 6:
        raise ValueError("not an ICO")
    rsv, typ, count = struct.unpack("<HHH", payload[:6])
    if rsv != 0 or typ not in (1, 2) or count == 0:
        raise ValueError("not an ICO")
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(payload):
            raise ValueError("ICO: truncated directory")
        (_w, _h, _nc, _rsv, _p1, bpp, size, data_off) = struct.unpack(
            "<BBBBHHII", payload[off:off + 16])
        if data_off + size > len(payload):
            raise ValueError("ICO: entry outside file")
        blob = payload[data_off:data_off + size]
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            img = codecs.decode_png(blob)
            if img.shape[2] == 3:
                img = np.dstack([img, np.full(img.shape[:2], 255,
                                              np.uint8)])
            elif img.shape[2] < 3:
                g = img[:, :, 0]
                a = img[:, :, 1] if img.shape[2] == 2 else \
                    np.full(g.shape, 255, np.uint8)
                img = np.dstack([g, g, g, a])
            yield img, bpp
        else:
            yield _dib_image(blob), bpp


def decode_ico(payload: bytes) -> np.ndarray:
    """ICO -> uint8 (H, W, 4): the best image (largest area, then
    highest bpp) — the browser selection rule."""
    best = None
    best_key = None
    for img, bpp in ico_frames(payload):
        key = (img.shape[0] * img.shape[1], bpp)
        if best_key is None or key > best_key:
            best, best_key = img, key
    return best


# ------------------------------------------------------------ encoder

def _and_mask(alpha: np.ndarray) -> bytes:
    h, w = alpha.shape
    mask = (alpha == 0).astype(np.uint8)[::-1]
    stride_bits = (w + 31) // 32 * 32
    padded = np.zeros((h, stride_bits), np.uint8)
    padded[:, :w] = mask
    return np.packbits(padded, axis=1).tobytes()


def encode_ico(images, *, as_png=None) -> bytes:
    """RGBA images -> ICO. `as_png`: per-image bools (default: PNG for
    sides > 48, the convention); DIB entries are 32-bpp + AND mask."""
    images = list(images)
    if as_png is None:
        as_png = [img.shape[0] > 48 or img.shape[1] > 48
                  for img in images]
    blobs = []
    for img, png in zip(images, as_png):
        if img.ndim != 3 or img.shape[2] != 4:
            raise ValueError("encode_ico expects RGBA")
        h, w = img.shape[:2]
        if png:
            blobs.append(codecs.encode_png(img))
            continue
        hdr = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0,
                          0, 0, 0, 0, 0)
        bgra = img[:, :, [2, 1, 0, 3]][::-1]
        blobs.append(hdr + bgra.tobytes() + _and_mask(img[:, :, 3]))
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    data_off = 6 + 16 * len(images)
    for img, blob in zip(images, blobs):
        h, w = img.shape[:2]
        out += struct.pack(
            "<BBBBHHII", w if w < 256 else 0, h if h < 256 else 0,
            0, 0, 1, 32, len(blob), data_off)
        data_off += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)
