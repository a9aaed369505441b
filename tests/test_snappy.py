"""Snappy codec (operators/snappy.py) vs the canonical C++ snappy
bundled in pyarrow — BOTH directions — plus the framed stream format
and its CRC32C (published check value)."""

import random

import pyarrow as pa
import pytest

from jsoup_spark.operators.snappy import (
    compress, compress_framed, crc32c, decompress, decompress_framed)

CASES = None


def _cases():
    rng = random.Random(7)
    return [b"", b"a", b"hello hello hello world" * 10,
            bytes(rng.randrange(256) for _ in range(5000)),
            bytes(rng.choice(b"ab") for _ in range(70000)),
            (b"abcd" * 100 + b"Z") * 50,
            b"A" * 200000]


def test_crc32c_check_value():
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_raw_vs_canonical_both_directions():
    for d in _cases():
        canonical = pa.compress(d, codec="snappy", asbytes=True)
        assert decompress(canonical) == d
        mine = compress(d)
        assert pa.decompress(mine, len(d), codec="snappy",
                             asbytes=True) == d
        assert decompress(mine) == d


def test_raw_fuzz_vs_canonical():
    rng = random.Random(20260817)
    for t in range(200):
        n = rng.randrange(0, 4000)
        if t % 3 == 0:
            d = bytes(rng.randrange(256) for _ in range(n))
        elif t % 3 == 1:
            d = bytes(rng.choice(b"abcde") for _ in range(n))
        else:
            u = bytes(rng.randrange(256)
                      for _ in range(rng.randrange(1, 9)))
            d = (u * (n // max(1, len(u)) + 1))[:n]
        assert decompress(
            pa.compress(d, codec="snappy", asbytes=True)) == d
        assert pa.decompress(compress(d), n, codec="snappy",
                             asbytes=True) == d


def test_framed_roundtrip_and_chunking():
    for d in _cases():
        f = compress_framed(d)
        assert decompress_framed(f) == d
    big = b"ab" * 100_000                     # > one 64 KiB chunk
    assert decompress_framed(compress_framed(big)) == big


def test_framed_crc_detects_corruption():
    # incompressible data -> uncompressed chunk, so a payload flip
    # reaches the CRC check rather than breaking the snappy stream
    rng = random.Random(3)
    data = bytes(rng.randrange(256) for _ in range(1000))
    f = bytearray(compress_framed(data))
    assert f[len(b"\xff\x06\x00\x00sNaPpY")] == 0x01
    f[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decompress_framed(bytes(f))
    # corrupting a compressed chunk fails loudly too (either the
    # stream structure or the CRC)
    f2 = bytearray(compress_framed(b"payload " * 100))
    f2[-1] ^= 0xFF
    with pytest.raises(ValueError):
        decompress_framed(bytes(f2))


def test_framed_padding_and_stream_id_chunks():
    d = b"content bytes here"
    f = bytearray(compress_framed(d))
    f += b"\xfe\x04\x00\x00abcd"             # padding chunk: skipped
    assert decompress_framed(bytes(f)) == d


def test_ingest_sniffs_framed_snappy():
    from jsoup_spark.sources.ingest import decode_html_bytes
    html = "<p>snappy framed payload</p>"
    payload = compress_framed(html.encode())
    assert decode_html_bytes(payload) == html
