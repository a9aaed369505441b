"""ctypes bindings for the system liblz4, used ONLY as a test oracle
(its encoder generates the streams operators/lz4.py must decode)."""

from __future__ import annotations

import ctypes

_LIB = None


class _FramePrefs(ctypes.Structure):
    _fields_ = [("blockSizeID", ctypes.c_int),
                ("blockMode", ctypes.c_int),          # 0=linked 1=indep
                ("contentChecksumFlag", ctypes.c_int),
                ("frameType", ctypes.c_int),
                ("contentSize", ctypes.c_ulonglong),
                ("dictID", ctypes.c_uint),
                ("blockChecksumFlag", ctypes.c_int),
                ("compressionLevel", ctypes.c_int),
                ("autoFlush", ctypes.c_uint),
                ("favorDecSpeed", ctypes.c_uint),
                ("reserved", ctypes.c_uint * 3)]


def liblz4():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL("liblz4.so.1")
        lib.LZ4_compress_default.restype = ctypes.c_int
        lib.LZ4_compress_default.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.LZ4_compressBound.restype = ctypes.c_int
        lib.LZ4_compressBound.argtypes = [ctypes.c_int]
        lib.LZ4F_compressFrame.restype = ctypes.c_size_t
        lib.LZ4F_compressFrame.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
            ctypes.c_size_t, ctypes.POINTER(_FramePrefs)]
        lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
        lib.LZ4F_compressFrameBound.argtypes = [
            ctypes.c_size_t, ctypes.POINTER(_FramePrefs)]
        lib.LZ4F_isError.restype = ctypes.c_uint
        lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        liblz4()
        return True
    except OSError:
        return False


def compress_block(data: bytes) -> bytes:
    lib = liblz4()
    cap = lib.LZ4_compressBound(len(data))
    buf = ctypes.create_string_buffer(cap)
    n = lib.LZ4_compress_default(data, buf, len(data), cap)
    if n <= 0:
        raise ValueError("LZ4 block compress failed")
    return buf.raw[:n]


def compress_frame(data: bytes, *, block_size_id: int = 4,
                   indep: bool = True, content_checksum: bool = False,
                   block_checksum: bool = False,
                   content_size: bool = False,
                   level: int = 0) -> bytes:
    lib = liblz4()
    prefs = _FramePrefs()
    prefs.blockSizeID = block_size_id
    prefs.blockMode = 1 if indep else 0
    prefs.contentChecksumFlag = 1 if content_checksum else 0
    prefs.blockChecksumFlag = 1 if block_checksum else 0
    prefs.contentSize = len(data) if content_size else 0
    prefs.compressionLevel = level
    cap = lib.LZ4F_compressFrameBound(len(data), ctypes.byref(prefs))
    buf = ctypes.create_string_buffer(cap)
    n = lib.LZ4F_compressFrame(buf, cap, data, len(data),
                               ctypes.byref(prefs))
    if lib.LZ4F_isError(n):
        raise ValueError("LZ4 frame compress failed")
    return buf.raw[:n]


def decompress_block(data: bytes, expected: int) -> bytes:
    """LZ4_decompress_safe — the cross-direction oracle for OUR
    block encoder."""
    lib = liblz4()
    lib.LZ4_decompress_safe.restype = ctypes.c_int
    lib.LZ4_decompress_safe.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    out = ctypes.create_string_buffer(max(expected, 1))
    n = lib.LZ4_decompress_safe(data, out, len(data), expected)
    if n < 0:
        raise ValueError(f"LZ4_decompress_safe error {n}")
    return out.raw[:n]
