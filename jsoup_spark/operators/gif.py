"""Native GIF87a/89a codec (pure stdlib + numpy) for the multimodal
pipeline.

Decoder: header + logical screen descriptor, global/local color
tables, the variable-width LZW scheme (clear/EOI codes, KwKwK case,
4096-entry dictionary, 12-bit cap), 4-pass interlacing, and the GIF89a
extension blocks — graphic control (disposal methods none / keep /
restore-background / restore-previous, transparency index), comment,
plain-text, application (NETSCAPE looping).  Composition follows the
canvas model every renderer implements: images draw at their
(left, top) offsets, transparent indices leave the underlying canvas
pixel, disposal is applied before the next frame.

Encoder: a spec-conformant test encoder in the encode_png /
encode_webp_lossless zero-fixtures tradition.  `encode_gif` emits a
true-color single-canvas GIF by splitting the image into row strips of
<= 256 distinct colors, one image descriptor + local color table per
strip (multi-image composition predates animation and is plain GIF87a
semantics) — LOSSLESS for arbitrary RGB input, so the driver oracle
can reuse the full symbolic feature check.  `encode_gif_frames` builds
animations (GCE delays, disposal, transparency, optional interlace)
for decoder coverage.

Raw index planes (pre-composition, file row order) are exposed for the
giflib byte-level oracle in tests/libgif_ref.py / tests/test_gif.py.

Reference parity anchor (semantic, not a port): the reference engine
(/root/reference, jsoup) has no image codecs; like codecs.py this
serves the interleaved text+media contract's media columns.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE = 0x2C
_EXTENSION = 0x21


class _GifImage:
    """One image descriptor: raw index raster in FILE row order plus
    the graphic-control state active when it was read."""

    __slots__ = ("left", "top", "width", "height", "interlace",
                 "palette", "indices", "transparent", "disposal",
                 "delay_cs")

    def __init__(self, left, top, width, height, interlace, palette,
                 indices, transparent, disposal, delay_cs):
        self.left = left
        self.top = top
        self.width = width
        self.height = height
        self.interlace = interlace
        self.palette = palette          # (n, 3) uint8
        self.indices = indices          # (height, width) uint8, file order
        self.transparent = transparent  # index or None
        self.disposal = disposal        # 0..3
        self.delay_cs = delay_cs


class _GifFile:
    __slots__ = ("width", "height", "background", "global_palette",
                 "images", "loop_count")

    def __init__(self, width, height, background, global_palette):
        self.width = width
        self.height = height
        self.background = background
        self.global_palette = global_palette
        self.images = []
        self.loop_count = None


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """Variable-width LZW per GIF89a appendix; stops after `expected`
    pixels (trailing junk is tolerated, truncation raises)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("GIF bad LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary as (prefix_code, suffix_byte); roots are implicit.
    # plain lists, not numpy arrays: per-code scalar indexing in the
    # expand loop was the decode hot spot (numpy scalar boxing, r9)
    prefix = [0] * 4096
    suffix = bytearray(4096)
    width = min_code_size + 1
    next_free = eoi + 1
    prev = -1
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    first_char = 0

    def expand(code: int) -> bytes:
        chunk = bytearray()
        while code >= eoi + 1:
            chunk.append(suffix[code])
            code = prefix[code]
        chunk.append(code)
        chunk.reverse()
        return chunk

    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = min_code_size + 1
            next_free = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("GIF bad first LZW code")
            out.append(code)
            first_char = code
            prev = code
            continue
        if code < next_free and code != eoi:
            chunk = expand(code)
        elif code == next_free:
            chunk = expand(prev) + bytes([first_char])
        else:
            raise ValueError("GIF LZW code out of range")
        first_char = chunk[0]
        out += chunk
        if next_free < 4096:
            prefix[next_free] = prev
            suffix[next_free] = first_char
            next_free += 1
            if next_free == (1 << width) and width < 12:
                width += 1
        prev = code
    return out


def _read_subblocks(payload: bytes, pos: int):
    parts = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF truncated sub-blocks")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > n:
            raise ValueError("GIF truncated sub-block")
        parts.append(payload[pos:pos + size])
        pos += size


def parse_gif(payload: bytes) -> _GifFile:
    """Parse the full stream -> _GifFile with raw (pre-composition)
    index rasters."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("GIF truncated header")
    w, h = struct.unpack("<HH", payload[6:10])
    packed, bg, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    gpal = None
    if packed & 0x80:
        gsize = 2 << (packed & 0x7)
        end = pos + 3 * gsize
        if end > len(payload):
            raise ValueError("GIF truncated global color table")
        gpal = np.frombuffer(payload[pos:end], np.uint8).reshape(gsize, 3)
        pos = end
    gif = _GifFile(w, h, bg, gpal)
    transparent = None
    disposal = 0
    delay_cs = 0
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF truncated: missing trailer")
        block = payload[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            if pos >= n:
                raise ValueError("GIF truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:   # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x7
                delay_cs = struct.unpack("<H", data[1:3])[0]
                transparent = data[3] if flags & 1 else None
            elif label == 0xFF and data[:11] == b"NETSCAPE2.0" \
                    and len(data) >= 14:
                gif.loop_count = struct.unpack("<H", data[12:14])[0]
            # comment (0xFE) / plain text (0x01): skipped
        elif block == _IMAGE:
            if pos + 9 > n:
                raise ValueError("GIF truncated image descriptor")
            left, top, iw, ih = struct.unpack("<HHHH", payload[pos:pos + 8])
            ipacked = payload[pos + 8]
            pos += 9
            pal = gif.global_palette
            if ipacked & 0x80:
                lsize = 2 << (ipacked & 0x7)
                end = pos + 3 * lsize
                if end > n:
                    raise ValueError("GIF truncated local color table")
                pal = np.frombuffer(payload[pos:end],
                                    np.uint8).reshape(lsize, 3)
                pos = end
            if pal is None:
                raise ValueError("GIF image with no color table")
            if iw == 0 or ih == 0:
                raise ValueError("GIF empty image descriptor")
            if pos >= n:
                raise ValueError("GIF truncated before LZW data")
            min_code = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            idx = _lzw_decode(min_code, data, iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("GIF LZW underrun")
            indices = np.frombuffer(bytes(idx[:iw * ih]),
                                    np.uint8).reshape(ih, iw)
            if (indices >= len(pal)).any():
                raise ValueError("GIF index outside color table")
            gif.images.append(_GifImage(
                left, top, iw, ih, bool(ipacked & 0x40), pal, indices,
                transparent, disposal, delay_cs))
            transparent = None
            disposal = 0
            delay_cs = 0
        else:
            raise ValueError(f"GIF unknown block 0x{block:02x}")
    if not gif.images:
        raise ValueError("GIF contains no image")
    return gif


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(indices: np.ndarray) -> np.ndarray:
    h = indices.shape[0]
    out = np.empty_like(indices)
    row = 0
    for start, step in _INTERLACE_PASSES:
        targets = range(start, h, step)
        for y in targets:
            out[y] = indices[row]
            row += 1
    return out


def gif_frames(payload: bytes):
    """Yield (canvas_rgb, canvas_alpha, delay_cs) per image, fully
    composited with offsets, transparency and disposal (canvas model;
    restore-to-background clears to transparent as every modern
    renderer does)."""
    gif = parse_gif(payload)
    h, w = gif.height, gif.width
    canvas = np.zeros((h, w, 3), np.uint8)
    alpha = np.zeros((h, w), bool)
    for img in gif.images:
        idx = _deinterlace(img.indices) if img.interlace else img.indices
        y0, x0 = img.top, img.left
        y1 = min(y0 + img.height, h)
        x1 = min(x0 + img.width, w)
        if y0 >= h or x0 >= w:
            yield canvas.copy(), alpha.copy(), img.delay_cs
            continue
        if img.disposal == 3:
            saved = (canvas[y0:y1, x0:x1].copy(),
                     alpha[y0:y1, x0:x1].copy())
        sub = idx[:y1 - y0, :x1 - x0]
        rgb = img.palette[sub]
        if img.transparent is not None:
            opaque = sub != img.transparent
            region_c = canvas[y0:y1, x0:x1]
            region_a = alpha[y0:y1, x0:x1]
            region_c[opaque] = rgb[opaque]
            region_a[opaque] = True
        else:
            canvas[y0:y1, x0:x1] = rgb
            alpha[y0:y1, x0:x1] = True
        yield canvas.copy(), alpha.copy(), img.delay_cs
        if img.disposal == 2:       # restore to background (transparent)
            canvas[y0:y1, x0:x1] = 0
            alpha[y0:y1, x0:x1] = False
        elif img.disposal == 3:     # restore to previous
            canvas[y0:y1, x0:x1] = saved[0]
            alpha[y0:y1, x0:x1] = saved[1]


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF -> uint8 (H, W, 3) or (H, W, 4): the final composited
    canvas (all images applied — single-frame GIFs, multi-image
    true-color GIFs and the last state of animations alike).  RGBA only
    when some canvas pixel was never painted."""
    last = None
    for canvas, alpha, _delay in gif_frames(payload):
        last = (canvas, alpha)
    canvas, alpha = last
    if alpha.all():
        return canvas
    return np.dstack([canvas, alpha.astype(np.uint8) * 255])


# ------------------------------------------------------------ encoder

def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table = {}
    next_free = eoi + 1
    put(clear, width)
    prev = -1
    for b in indices:
        if prev < 0:
            prev = b
            continue
        key = (prev << 8) | b
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        put(prev, width)
        table[key] = next_free
        next_free += 1
        if next_free - 1 == (1 << width) and width < 12:
            width += 1
        if next_free == 4096:
            put(clear, width)
            table.clear()
            width = min_code_size + 1
            next_free = eoi + 1
        prev = b
    if prev >= 0:
        put(prev, width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _palette_block(pal: np.ndarray):
    """Pad palette to a power-of-two size >= 2; returns (bytes, size
    exponent-1 field, padded length)."""
    n = len(pal)
    size = 2
    exp = 0
    while size < n:
        size <<= 1
        exp += 1
    padded = np.zeros((size, 3), np.uint8)
    padded[:n] = pal
    return padded.tobytes(), exp, size


def _image_block(indices: np.ndarray, pal: np.ndarray, left: int,
                 top: int, *, interlace: bool = False) -> bytes:
    h, w = indices.shape
    pal_bytes, exp, size = _palette_block(pal)
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES
                 for y in range(start, h, step)]
        indices = indices[order]
    out = bytearray()
    out += struct.pack("<BHHHHB", _IMAGE, left, top, w, h,
                       0x80 | (0x40 if interlace else 0) | exp)
    out += pal_bytes
    min_code = max(2, (size - 1).bit_length())
    out.append(min_code)
    out += _subblocks(_lzw_encode(min_code, indices.tobytes()))
    return bytes(out)


def _screen_header(w: int, h: int) -> bytes:
    # no global color table; background 0
    return b"GIF89a" + struct.pack("<HHBBB", w, h, 0x00, 0, 0)


def encode_gif(img: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB -> LOSSLESS true-color GIF: row strips of
    <= 256 distinct colors, one image descriptor + local color table
    each, composited back onto the canvas by any conformant decoder."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_gif expects (H, W, 3) RGB")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_gif: empty image")
    packed = (img[:, :, 0].astype(np.uint32) << 16) \
        | (img[:, :, 1].astype(np.uint32) << 8) | img[:, :, 2]
    out = bytearray(_screen_header(w, h))
    y = 0
    while y < h:
        # grow the strip while the running distinct-color count fits
        y2 = y
        seen = np.zeros(0, np.uint32)
        while y2 < h:
            cand = np.union1d(seen, np.unique(packed[y2]))
            if len(cand) > 256:
                break
            seen = cand
            y2 += 1
        if y2 == y:     # single row with > 256 colors: split columns
            # (a 256-pixel chunk can never exceed 256 distinct colors)
            row = packed[y]
            x = 0
            while x < w:
                x2 = min(x + 256, w)
                pal_packed, inv = np.unique(row[x:x2], return_inverse=True)
                pal = np.stack([(pal_packed >> 16) & 0xFF,
                                (pal_packed >> 8) & 0xFF,
                                pal_packed & 0xFF], -1).astype(np.uint8)
                out += _image_block(
                    inv.astype(np.uint8).reshape(1, x2 - x), pal, x, y)
                x = x2
            y += 1
            continue
        strip = packed[y:y2]
        pal_packed, inv = np.unique(strip, return_inverse=True)
        pal = np.stack([(pal_packed >> 16) & 0xFF,
                        (pal_packed >> 8) & 0xFF,
                        pal_packed & 0xFF], -1).astype(np.uint8)
        out += _image_block(inv.astype(np.uint8).reshape(strip.shape),
                            pal, 0, y)
        y = y2
    out.append(_TRAILER)
    return bytes(out)


def encode_gif_frames(frames, *, delays_cs=None, disposals=None,
                      transparents=None, offsets=None,
                      interlace: bool = False,
                      canvas_size=None, loop: int | None = 0) -> bytes:
    """Animation test encoder: each frame an (indices (H, W) uint8,
    palette (n, 3) uint8) pair drawn at its offset with its GCE
    (delay, disposal, transparency)."""
    frames = list(frames)
    if not frames:
        raise ValueError("encode_gif_frames: no frames")
    if canvas_size is None:
        cw = max(f[0].shape[1] + (offsets[i][0] if offsets else 0)
                 for i, f in enumerate(frames))
        ch = max(f[0].shape[0] + (offsets[i][1] if offsets else 0)
                 for i, f in enumerate(frames))
    else:
        cw, ch = canvas_size
    out = bytearray(_screen_header(cw, ch))
    if loop is not None:
        out += bytes([_EXTENSION, 0xFF, 11]) + b"NETSCAPE2.0" \
            + bytes([3, 1]) + struct.pack("<H", loop) + b"\x00"
    for i, (indices, pal) in enumerate(frames):
        delay = delays_cs[i] if delays_cs else 0
        disposal = disposals[i] if disposals else 0
        trans = transparents[i] if transparents else None
        left, top = offsets[i] if offsets else (0, 0)
        flags = (disposal & 0x7) << 2
        tidx = 0
        if trans is not None:
            flags |= 1
            tidx = trans
        out += bytes([_EXTENSION, 0xF9, 4, flags]) \
            + struct.pack("<H", delay) + bytes([tidx, 0])
        out += _image_block(np.asarray(indices, np.uint8),
                            np.asarray(pal, np.uint8), left, top,
                            interlace=interlace)
    out.append(_TRAILER)
    return bytes(out)
