"""Pure-stdlib + numpy media codecs for the multimodal pipeline.

Real decoders for the formats that need no external codec library:

* PNG  — zlib inflate + scanline unfilter (filters 0-4) via numpy;
         8-bit gray/gray+alpha/RGB/RGBA, non-interlaced.
* BMP  — uncompressed 24/32-bit BI_RGB, bottom-up or top-down.
* PPM/PGM — binary netpbm (P5/P6), maxval <= 255.
* WAV  — stdlib `wave` (PCM 8/16/32-bit), samples as float32 in [-1, 1].

Formats that require external codecs (JPEG, WebP, MP3, H.264, ...)
remain stubbed in operators/multimodal.py per the environment contract —
`sniff_format` returns None for them and the caller decides
(fake-decode for plumbing tests, NotImplementedError otherwise).

Encoders for the same formats (PNG filter-0, BMP 24-bit, P6, PCM16 WAV)
exist so tests and `synthesize_media` can round-trip REAL payloads
through the real decoders with zero fixtures on disk.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ------------------------------------------------------------------ sniff

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_format(payload: bytes) -> str | None:
    """Magic-byte detection for the natively-decodable formats."""
    if payload.startswith(_PNG_MAGIC):
        return "png"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload[:2] in (b"P5", b"P6"):
        return "ppm"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    return None


# -------------------------------------------------------------------- PNG

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> uint8 array (H, W, C). Supports bit depth 8, color types
    gray/gray+alpha/RGB/RGBA, non-interlaced (the overwhelming majority
    of real-world PNGs). Raises ValueError on anything else."""
    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG depth/color "
                         f"({bit_depth}/{color_type})")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:].astype(np.int32)  # headroom for the filter math
    out = np.empty((height, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(height):
        f = filters[y]
        line = lines[y]
        if f == 0:                      # None
            cur = line.copy()
        elif f == 1:                    # Sub (serial in x: per-pixel loop
            cur = line.copy()           #  over pixels, vector over channels)
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif f == 2:                    # Up
            cur = (line + prev) & 0xFF
        elif f == 3:                    # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:                    # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(height, width, ch)


def encode_png(img: np.ndarray) -> bytes:
    """uint8 (H, W, C in {1,2,3,4}) -> PNG, filter 0 every scanline."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# -------------------------------------------------------------------- BMP

def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP -> uint8 (H, W, 3|4) in RGB(A)
    order, handling bottom-up (positive height) and top-down rows."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError("BMP core header unsupported")
    w, h = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (compression={compression}, "
                         f"bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    px = np.frombuffer(payload, np.uint8,
                       count=stride * h, offset=data_off)
    px = px.reshape(h, stride)[:, :w * ch].reshape(h, w, ch)
    if not top_down:
        px = px[::-1]
    # BGR(A) -> RGB(A)
    if ch == 3:
        return px[:, :, ::-1].copy()
    return px[:, :, [2, 1, 0, 3]].copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB -> 24-bit bottom-up BMP."""
    h, w, ch = img.shape
    assert ch == 3
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):
        rows += img[y, :, ::-1].tobytes() + pad
    pix = bytes(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0,
                           14 + 40)
    return file_hdr + info + pix


# ---------------------------------------------------------------- netpbm

def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 RGB), maxval <= 255 -> uint8 array."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm")
    # header tokens: magic, width, height, maxval (comments start with #)
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        c = payload[pos:pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < n and payload[pos:pos + 1] != b"\n":
                pos += 1
        else:
            start = pos
            while pos < n and not payload[pos:pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(payload, np.uint8, count=w * h * ch, offset=pos)
    return px.reshape(h, w, ch)


def encode_ppm(img: np.ndarray) -> bytes:
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    magic = b"P6" if ch == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


# -------------------------------------------------------------------- WAV

def decode_wav(payload: bytes):
    """PCM WAV via stdlib wave -> (sample_rate, n_frames, mono float32
    samples in [-1, 1])."""
    with wave.open(io.BytesIO(payload)) as wf:
        rate = wf.getframerate()
        n_frames = wf.getnframes()
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(n_frames)
    if width == 2:
        s = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        s = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128) / 128.0
    elif width == 4:
        s = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        s = s.reshape(-1, n_ch).mean(axis=1)
    return rate, n_frames, s


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono float32 [-1, 1] -> PCM16 WAV."""
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------- resize

def resize_area(img: np.ndarray, max_side: int) -> np.ndarray:
    """Box-filter (area-average) downscale so max(H, W) <= max_side;
    upscaling never happens (returns the input). Pure numpy: pixels are
    binned by integer target index and averaged with bincount — exact
    area average when the ratio is integral, a stable approximation
    otherwise. Deterministic, no external resampling library."""
    h, w = img.shape[:2]
    scale = max(h, w) / max_side
    if scale <= 1.0:
        return img
    nh, nw = max(1, int(round(h / scale))), max(1, int(round(w / scale)))
    yi = np.minimum((np.arange(h) * nh // h), nh - 1)
    xi = np.minimum((np.arange(w) * nw // w), nw - 1)
    ch = img.shape[2] if img.ndim == 3 else 1
    flat = img.reshape(h, w, ch).astype(np.float64)
    # bin index per source pixel -> (nh*nw) cells
    cell = (yi[:, None] * nw + xi[None, :]).ravel()
    counts = np.bincount(cell, minlength=nh * nw)
    out = np.empty((nh * nw, ch), np.float64)
    for c in range(ch):
        sums = np.bincount(cell, weights=flat[:, :, c].ravel(),
                           minlength=nh * nw)
        out[:, c] = sums / np.maximum(counts, 1)
    return np.rint(out).astype(np.uint8).reshape(nh, nw, ch)
