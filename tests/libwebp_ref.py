"""ctypes bindings for the system libwebp, used ONLY as a test oracle.

The engine's WebP decode (operators/codecs.py + operators/vp8.py) is
native Python/numpy; these bindings let the test suite validate it
pixel-exactly against the canonical implementation when libwebp is
present (tests skip otherwise), and generate real encoder output as
fixtures (this container has no Pillow/ffmpeg).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB = None


def libwebp():
    global _LIB
    if _LIB is None:
        for name in ("libwebp.so.7", "libwebp.so",
                     ctypes.util.find_library("webp")):
            if not name:
                continue
            try:
                _LIB = ctypes.CDLL(name)
                break
            except OSError:
                continue
        if _LIB is None:
            raise OSError("libwebp not found")
        _LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        _LIB.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
        _LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        _LIB.WebPEncodeRGB.restype = ctypes.c_size_t
        _LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
        _LIB.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
        _LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    return _LIB


def available() -> bool:
    try:
        libwebp()
        return True
    except OSError:
        return False


def decode_rgba(data: bytes) -> np.ndarray:
    lib = libwebp()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                             ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp: decode failed")
    arr = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 4)).copy()
    lib.WebPFree(ptr)
    return arr


def decode_rgb(data: bytes) -> np.ndarray:
    lib = libwebp()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGB(data, len(data), ctypes.byref(w),
                            ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp: decode failed")
    arr = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 3)).copy()
    lib.WebPFree(ptr)
    return arr


def decode_yuv(data: bytes) -> tuple:
    """Returns (y, u, v) planes as uint8 arrays."""
    lib = libwebp()
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    ptr = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w),
                            ctypes.byref(h), ctypes.byref(u),
                            ctypes.byref(v), ctypes.byref(stride),
                            ctypes.byref(uv_stride))
    if not ptr:
        raise ValueError("libwebp: YUV decode failed")
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yp = np.ctypeslib.as_array(ptr, shape=(H, stride.value))[:, :W].copy()
    up = np.ctypeslib.as_array(u, shape=(ch, uv_stride.value))[:, :cw].copy()
    vp = np.ctypeslib.as_array(v, shape=(ch, uv_stride.value))[:, :cw].copy()
    lib.WebPFree(ptr)
    return yp, up, vp


def _encode(fn, img: np.ndarray, quality) -> bytes:
    h, w = img.shape[:2]
    buf = np.ascontiguousarray(img, dtype=np.uint8)
    out = ctypes.POINTER(ctypes.c_uint8)()
    args = [buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h, buf.strides[0]]
    if quality is not None:
        args.append(ctypes.c_float(quality))
    size = fn(*args, ctypes.byref(out))
    if not size:
        raise ValueError("libwebp: encode failed")
    data = ctypes.string_at(out, size)
    libwebp().WebPFree(out)
    return data


def encode_rgb(img: np.ndarray, quality: float = 75.0) -> bytes:
    return _encode(libwebp().WebPEncodeRGB, img, quality)


def encode_rgba(img: np.ndarray, quality: float = 75.0) -> bytes:
    return _encode(libwebp().WebPEncodeRGBA, img, quality)


def encode_lossless_rgb(img: np.ndarray) -> bytes:
    return _encode(libwebp().WebPEncodeLosslessRGB, img, None)


def encode_lossless_rgba(img: np.ndarray) -> bytes:
    return _encode(libwebp().WebPEncodeLosslessRGBA, img, None)
