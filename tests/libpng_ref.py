"""ctypes bindings for the system libpng16 simplified API, used ONLY
as a test oracle.

The engine's PNG codec (operators/codecs.py) is native Python/numpy;
this module lets the test suite validate it pixel-exactly against the
canonical libpng (`png_image_begin_read_from_memory` /
`png_image_finish_read`) when libpng16.so is present — tests skip
otherwise.  The simplified API performs the same expansions the native
decoder implements (palette -> RGB(A), tRNS -> alpha, sub-byte gray
scaling, accurate 16 -> 8 scaling), so requesting PNG_FORMAT_RGBA gives
a canonical RGBA8 rendering of any PNG variant to compare against.
"""

from __future__ import annotations

import ctypes

import numpy as np

PNG_IMAGE_VERSION = 1
FORMAT_GRAY = 0
FORMAT_GA = 1
FORMAT_RGB = 2
FORMAT_RGBA = 3

_LIB = None


class _PngImage(ctypes.Structure):
    _fields_ = [("opaque", ctypes.c_void_p),
                ("version", ctypes.c_uint32),
                ("width", ctypes.c_uint32),
                ("height", ctypes.c_uint32),
                ("format", ctypes.c_uint32),
                ("flags", ctypes.c_uint32),
                ("colormap_entries", ctypes.c_uint32),
                ("warning_or_error", ctypes.c_uint32),
                ("message", ctypes.c_char * 64)]


def libpng():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL("libpng16.so.16")
        lib.png_image_begin_read_from_memory.restype = ctypes.c_int
        lib.png_image_begin_read_from_memory.argtypes = [
            ctypes.POINTER(_PngImage), ctypes.c_char_p, ctypes.c_size_t]
        lib.png_image_finish_read.restype = ctypes.c_int
        lib.png_image_finish_read.argtypes = [
            ctypes.POINTER(_PngImage), ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_void_p]
        lib.png_image_free.restype = None
        lib.png_image_free.argtypes = [ctypes.POINTER(_PngImage)]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        libpng()
        return True
    except OSError:
        return False


_CHANNELS = {FORMAT_GRAY: 1, FORMAT_GA: 2, FORMAT_RGB: 3, FORMAT_RGBA: 4}


def decode(data: bytes, fmt: int = FORMAT_RGBA) -> np.ndarray:
    """Decode via the simplified API in the requested 8-bit format ->
    uint8 (H, W, C).  Raises ValueError on libpng errors."""
    lib = libpng()
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    if lib.png_image_begin_read_from_memory(
            ctypes.byref(img), data, len(data)) == 0:
        raise ValueError(f"libpng: {img.message.decode(errors='replace')}")
    img.format = fmt
    ch = _CHANNELS[fmt]
    buf = (ctypes.c_uint8 * (img.width * img.height * ch))()
    if lib.png_image_finish_read(
            ctypes.byref(img), None, buf, img.width * ch, None) == 0:
        msg = img.message.decode(errors="replace")
        lib.png_image_free(ctypes.byref(img))
        raise ValueError(f"libpng: {msg}")
    out = np.frombuffer(bytes(buf), np.uint8).reshape(
        img.height, img.width, ch)
    return out
