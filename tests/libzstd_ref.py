"""ctypes bindings for the system libzstd, used ONLY as a test oracle
(its encoder generates the streams operators/zstd.py must decode)."""

from __future__ import annotations

import ctypes

_LIB = None


def libzstd():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL("libzstd.so.1")
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_size_t, ctypes.c_int]
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_decompress.restype = ctypes.c_size_t
        lib.ZSTD_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_size_t]
        # advanced one-shot with parameters (checksum, window log, ...)
        lib.ZSTD_createCCtx.restype = ctypes.c_void_p
        lib.ZSTD_freeCCtx.restype = ctypes.c_size_t
        lib.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
        lib.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
        lib.ZSTD_CCtx_setParameter.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.ZSTD_compress2.restype = ctypes.c_size_t
        lib.ZSTD_compress2.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        libzstd()
        return True
    except OSError:
        return False


# ZSTD_cParameter ids (zstd.h, stable API)
_C_LEVEL = 100
_C_WINDOWLOG = 101
_C_CONTENTSIZE = 200
_C_CHECKSUM = 201


def compress(data: bytes, level: int = 3, *,
             checksum: bool = False, window_log: int = 0,
             content_size: bool = True) -> bytes:
    lib = libzstd()
    cap = lib.ZSTD_compressBound(len(data))
    buf = ctypes.create_string_buffer(cap)
    cctx = lib.ZSTD_createCCtx()
    try:
        for param, val in ((_C_LEVEL, level),
                           (_C_CHECKSUM, 1 if checksum else 0),
                           (_C_CONTENTSIZE, 1 if content_size else 0),
                           (_C_WINDOWLOG, window_log)):
            if lib.ZSTD_isError(
                    lib.ZSTD_CCtx_setParameter(cctx, param, val)):
                raise ValueError(f"zstd param {param}={val} rejected")
        n = lib.ZSTD_compress2(cctx, buf, cap, data, len(data))
        if lib.ZSTD_isError(n):
            raise ValueError("libzstd compress failed")
        return buf.raw[:n]
    finally:
        lib.ZSTD_freeCCtx(cctx)


def decompress(data: bytes, max_out: int = 1 << 26) -> bytes:
    lib = libzstd()
    buf = ctypes.create_string_buffer(max_out)
    n = lib.ZSTD_decompress(buf, max_out, data, len(data))
    if lib.ZSTD_isError(n):
        raise ValueError("libzstd decompress failed")
    return buf.raw[:n]
