"""ctypes bindings for the system libbrotli, used ONLY as a test
oracle for the native decoder (operators/brotli.py).

encode(): libbrotlienc at any quality 0-11 / lgwin — generates real
streams exercising every stream feature tier (q0-1: fast one-pass
format subset; q2-9: context modeling + block splitting; q10-11:
full optimal parse with static-dictionary references).
decode(): libbrotlidec one-shot, for behavioral comparison on
malformed inputs.
transform_word(): BrotliTransformDictionaryWord — replays our
transform engine word-for-word.
"""

from __future__ import annotations

import ctypes

_ENC = _DEC = _COM = None


def _libs():
    global _ENC, _DEC, _COM
    if _ENC is None:
        enc = ctypes.CDLL("libbrotlienc.so.1")
        dec = ctypes.CDLL("libbrotlidec.so.1")
        com = ctypes.CDLL("libbrotlicommon.so.1")
        enc.BrotliEncoderCompress.restype = ctypes.c_int
        enc.BrotliEncoderCompress.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_char_p]
        enc.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
        enc.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]
        dec.BrotliDecoderDecompress.restype = ctypes.c_int
        dec.BrotliDecoderDecompress.argtypes = [
            ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
        com.BrotliGetTransforms.restype = ctypes.c_void_p
        com.BrotliTransformDictionaryWord.restype = ctypes.c_int
        com.BrotliTransformDictionaryWord.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int]
        _ENC, _DEC, _COM = enc, dec, com
    return _ENC, _DEC, _COM


def available() -> bool:
    try:
        _libs()
        return True
    except OSError:
        return False


def encode(data: bytes, quality: int = 11, lgwin: int = 22,
           mode: int = 0) -> bytes:
    enc, _, _ = _libs()
    cap = ctypes.c_size_t(enc.BrotliEncoderMaxCompressedSize(len(data))
                          or len(data) + 1024)
    buf = ctypes.create_string_buffer(cap.value)
    if not enc.BrotliEncoderCompress(quality, lgwin, mode, len(data),
                                     data, ctypes.byref(cap), buf):
        raise ValueError("libbrotli encode failed")
    return buf.raw[:cap.value]


def decode(data: bytes, max_out: int = 1 << 26) -> bytes:
    _, dec, _ = _libs()
    n = ctypes.c_size_t(max_out)
    buf = ctypes.create_string_buffer(max_out)
    if dec.BrotliDecoderDecompress(len(data), data,
                                   ctypes.byref(n), buf) != 1:
        raise ValueError("libbrotli decode failed")
    return buf.raw[:n.value]


def transform_word(word: bytes, transform_id: int) -> bytes:
    _, _, com = _libs()
    transforms = com.BrotliGetTransforms()
    buf = ctypes.create_string_buffer(len(word) + 64)
    n = com.BrotliTransformDictionaryWord(
        buf, word, len(word), transforms, transform_id)
    return buf.raw[:n]
