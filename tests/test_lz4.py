"""Native LZ4 decoder (operators/lz4.py) validated against the system
liblz4 (tests/liblz4_ref.py): its encoder generates every stream —
raw blocks (LZ4_compress_default) and frames (LZ4F_compressFrame)
across block sizes, linked/independent block modes, and all checksum
flag combinations. The frame checksums double as the xxHash32 oracle:
a wrong hash fails every checksummed frame. Skips cleanly without the
library; the xxh32 spec vector and error contracts still run.
"""

import numpy as np
import pytest

from jsoup_spark.operators.lz4 import (
    decompress_block, decompress_frame, xxh32)

import liblz4_ref as ref

_rng = np.random.default_rng(20260817)

needs_lib = pytest.mark.skipif(
    not ref.available(), reason="system liblz4 not present")


def _mk(kind, n):
    if kind == "text":
        return (b"the quick brown fox jumps over the lazy dog "
                * (n // 45 + 1))[:n]
    if kind == "rand":
        return _rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    return b"\0" * n


def test_xxh32_spec_vector():
    assert xxh32(b"") == 0x02CC5D05


@needs_lib
def test_blocks_vs_liblz4():
    for kind in ("text", "rand", "zeros"):
        for n in (1, 20, 5000, 100_000):
            src = _mk(kind, n)
            assert decompress_block(ref.compress_block(src)) == src


@needs_lib
@pytest.mark.parametrize("indep", [True, False])
def test_frames_vs_liblz4(indep):
    for kind in ("text", "rand", "zeros"):
        for n in (0, 1, 20, 5000, 300_000):
            src = _mk(kind, n)
            for bsid in (4, 7):
                for cc, bc, cs in ((False, False, False),
                                   (True, False, False),
                                   (False, True, False),
                                   (True, True, True)):
                    data = ref.compress_frame(
                        src, block_size_id=bsid, indep=indep,
                        content_checksum=cc, block_checksum=bc,
                        content_size=cs)
                    assert decompress_frame(data) == src, \
                        (kind, n, bsid, cc, bc, cs)


@needs_lib
def test_checksum_detection():
    src = _mk("text", 10_000)
    data = bytearray(ref.compress_frame(src, content_checksum=True))
    data[-2] ^= 0xFF                     # flip a content-checksum byte
    with pytest.raises(ValueError, match="checksum"):
        decompress_frame(bytes(data))


@needs_lib
def test_truncation_raises():
    src = _mk("text", 10_000)
    data = ref.compress_frame(src)
    for cut in (2, 5, 8, len(data) // 2, len(data) - 1):
        with pytest.raises(ValueError):
            decompress_frame(data[:cut])


def test_bad_magic_and_offsets():
    with pytest.raises(ValueError):
        decompress_frame(b"\x00\x11\x22\x33" + b"\x00" * 16)
    # offset 0 is invalid in the block format
    with pytest.raises(ValueError):
        decompress_block(b"\x14" + b"x" + b"\x00\x00")


@needs_lib
def test_ingest_sniffs_lz4_bz2_xz():
    from jsoup_spark.sources.ingest import decode_html_bytes
    import bz2
    import lzma
    html = "<html><head><title>T</title></head><body>zipped</body></html>"
    raw = html.encode()
    assert decode_html_bytes(ref.compress_frame(raw)) == html
    assert decode_html_bytes(bz2.compress(raw)) == html
    assert decode_html_bytes(lzma.compress(raw)) == html


# --------------------------------------------------------------- encoder

def test_block_encoder_vs_liblz4_decoder():
    """OUR compress_block -> liblz4's LZ4_decompress_safe (the
    cross-direction oracle) + our own decoder; covers empty/short
    inputs (pure literals per the 12-byte end condition), 4-byte
    minimum matches, long matches and >255 length ladders."""
    import random
    rng = random.Random(7)
    from jsoup_spark.operators.lz4 import (
        compress_block, decompress_block)
    cases = [b"", b"a", b"hello", b"x" * 1000,
             bytes(rng.randrange(256) for _ in range(5000)),
             (b"abcd" * 100 + b"Z") * 50,
             bytes(rng.choice(b"ab") for _ in range(70000)),
             b"short12bytes", b"A" * 13, b"A" * 17,
             bytes(range(256)) * 300]
    for d in cases:
        c = compress_block(d)
        assert decompress_block(c) == d
        if ref.available() and d:
            assert ref.decompress_block(c, len(d)) == d


def test_block_encoder_fuzz():
    import random
    rng = random.Random(20260817)
    from jsoup_spark.operators.lz4 import (
        compress_block, decompress_block)
    for t in range(200):
        n = rng.randrange(0, 3000)
        if t % 3 == 0:
            d = bytes(rng.randrange(256) for _ in range(n))
        elif t % 3 == 1:
            d = bytes(rng.choice(b"abc") for _ in range(n))
        else:
            unit = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(1, 9)))
            d = (unit * (n // max(1, len(unit)) + 1))[:n]
        c = compress_block(d)
        assert decompress_block(c) == d
        if ref.available() and n:
            assert ref.decompress_block(c, n) == d


def test_frame_encoder_roundtrip_checksums():
    import random
    rng = random.Random(5)
    from jsoup_spark.operators.lz4 import (
        compress_frame, decompress_frame)
    data = bytes(rng.choice(b"abcdef") for _ in range(200_000))
    for cc in (False, True):
        for bc in (False, True):
            f = compress_frame(data, content_checksum=cc,
                               block_checksum=bc)
            assert decompress_frame(f) == data
    # incompressible chunks store raw (high bit of the block size)
    rnd = bytes(rng.randrange(256) for _ in range(70000))
    f = compress_frame(rnd)
    assert decompress_frame(f) == rnd
