"""Compile-on-demand ctypes binding for the libjpeg test-oracle shim.

The engine's JPEG decoders (operators/codecs.py, operators/jpeg_arith.py)
are native Python/numpy; this module builds tests/jpeg_ref.c against the
system libjpeg(-turbo) and exposes it as a TEST ORACLE:

  decode(data)                      -> np.ndarray (H, W, ch)
  transcode(data, arith, progressive) -> bytes (lossless coefficient
                                        transcode: same quantized
                                        coefficients, new entropy coding)
  encode(img, quality, arith, progressive) -> bytes

Tests skip when gcc / jpeglib.h / libjpeg are unavailable.  The shim is
cached under /tmp keyed on the source mtime so the suite pays one gcc
invocation per source change.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jpeg_ref.c")
_LIB = None
_FAILED = None


def _build() -> str:
    cache = os.path.join(tempfile.gettempdir(), "jsoup_spark_jref")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "jpeg_ref.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(_SRC)):
        tmp = so + f".{os.getpid()}.tmp"
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", _SRC, "-o", tmp, "-ljpeg"],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
    return so


def libjpeg_ref():
    global _LIB, _FAILED
    if _LIB is not None:
        return _LIB
    if _FAILED is not None:
        raise OSError(_FAILED)
    try:
        lib = ctypes.CDLL(_build())
    except (OSError, subprocess.SubprocessError, FileNotFoundError) as ex:
        _FAILED = f"libjpeg oracle shim unavailable: {ex}"
        raise OSError(_FAILED) from ex
    lib.jref_decode.restype = ctypes.c_int
    lib.jref_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.jref_transcode.restype = ctypes.c_int
    lib.jref_transcode.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_ulong)]
    lib.jref_encode.restype = ctypes.c_int
    lib.jref_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_ulong)]
    lib.jref_free.restype = None
    lib.jref_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return _LIB


def available() -> bool:
    try:
        libjpeg_ref()
        return True
    except OSError:
        return False


def decode(data: bytes) -> np.ndarray:
    lib = libjpeg_ref()
    out = ctypes.POINTER(ctypes.c_uint8)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    if lib.jref_decode(data, len(data), ctypes.byref(out),
                       ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch)):
        raise ValueError("libjpeg: decode failed")
    try:
        arr = np.ctypeslib.as_array(
            out, shape=(h.value, w.value, ch.value)).copy()
    finally:
        lib.jref_free(out)
    return arr


def transcode(data: bytes, *, arith: bool, progressive: bool = False) -> bytes:
    """Lossless entropy transcode (identical quantized coefficients)."""
    lib = libjpeg_ref()
    out = ctypes.POINTER(ctypes.c_uint8)()
    outn = ctypes.c_ulong()
    if lib.jref_transcode(data, len(data), int(arith), int(progressive),
                          ctypes.byref(out), ctypes.byref(outn)):
        raise ValueError("libjpeg: transcode failed")
    try:
        res = ctypes.string_at(out, outn.value)
    finally:
        lib.jref_free(out)
    return res


def encode(img: np.ndarray, quality: int = 90, *, arith: bool = False,
           progressive: bool = False, restart_interval: int = 0) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    lib = libjpeg_ref()
    out = ctypes.POINTER(ctypes.c_uint8)()
    outn = ctypes.c_ulong()
    if lib.jref_encode(img.tobytes(), w, h, ch, quality, int(arith),
                       int(progressive), restart_interval,
                       ctypes.byref(out), ctypes.byref(outn)):
        raise ValueError("libjpeg: encode failed")
    try:
        res = ctypes.string_at(out, outn.value)
    finally:
        lib.jref_free(out)
    return res
