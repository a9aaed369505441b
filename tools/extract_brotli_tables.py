#!/usr/bin/env python3
"""Extract the RFC 7932 static tables from the system libbrotli into a
committed fixture (jsoup_spark/operators/brotli_data.npz).

The static dictionary (122,784 bytes), the 121 word transforms with
their prefix/suffix pool, and the literal context lookup table are
normative PUBLIC data from RFC 7932 (Appendices A & B and §7.1); the
reference C implementation ships them compiled into libbrotlicommon.
This tool reads them out via ctypes once so the native decoder
(operators/brotli.py) needs no shared library at runtime. Re-run only
to regenerate the fixture; tests/test_brotli.py verifies the extracted
tables against the library behaviorally (word transforms replayed
through BrotliTransformDictionaryWord, full streams through
BrotliDecoderDecompress).
"""

import ctypes

import numpy as np


class _Dictionary(ctypes.Structure):
    _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                ("offsets_by_length", ctypes.c_uint32 * 32),
                ("data_size", ctypes.c_size_t),
                ("data", ctypes.c_void_p)]


class _Transforms(ctypes.Structure):
    _fields_ = [("prefix_suffix_size", ctypes.c_uint16),
                ("prefix_suffix", ctypes.c_void_p),
                ("prefix_suffix_map", ctypes.c_void_p),
                ("num_transforms", ctypes.c_uint32),
                ("transforms", ctypes.c_void_p),
                ("params", ctypes.c_void_p),
                ("cutOffTransforms", ctypes.c_int16 * 10)]


def main():
    lib = ctypes.CDLL("libbrotlicommon.so.1")
    lib.BrotliGetDictionary.restype = ctypes.POINTER(_Dictionary)
    lib.BrotliGetTransforms.restype = ctypes.POINTER(_Transforms)

    d = lib.BrotliGetDictionary().contents
    assert d.data_size == 122784, d.data_size
    dict_data = np.frombuffer(
        ctypes.string_at(d.data, d.data_size), np.uint8)
    size_bits = np.array(list(d.size_bits_by_length), np.uint8)
    offsets = np.array(list(d.offsets_by_length), np.uint32)

    t = lib.BrotliGetTransforms().contents
    assert t.num_transforms == 121, t.num_transforms
    prefix_suffix = np.frombuffer(
        ctypes.string_at(t.prefix_suffix, t.prefix_suffix_size), np.uint8)
    n_map = int(prefix_suffix[:0].size)  # placeholder; map length below
    # the map has one entry per distinct prefix/suffix id referenced by
    # the triplets; triplets are 3*num_transforms uint8s
    triplets = np.frombuffer(
        ctypes.string_at(t.transforms, 3 * t.num_transforms), np.uint8)
    max_id = int(triplets.reshape(-1, 3)[:, [0, 2]].max())
    ps_map = np.frombuffer(
        ctypes.string_at(t.prefix_suffix_map, 2 * (max_id + 1)),
        np.uint16)

    ctx = (ctypes.c_uint8 * 2048).in_dll(
        lib, "_kBrotliContextLookupTable")
    context_lut = np.frombuffer(bytes(ctx), np.uint8)

    np.savez_compressed(
        "jsoup_spark/operators/brotli_data.npz",
        dict_data=dict_data, size_bits=size_bits, offsets=offsets,
        prefix_suffix=prefix_suffix, ps_map=ps_map, triplets=triplets,
        context_lut=context_lut)
    print("dict", d.data_size, "bytes; transforms", t.num_transforms,
          "; prefix/suffix pool", t.prefix_suffix_size,
          "bytes; map", max_id + 1, "entries")


if __name__ == "__main__":
    main()
