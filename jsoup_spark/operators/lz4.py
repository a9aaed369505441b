"""Native LZ4 decoder (block + frame formats) and xxHash32 — pure
Python, no external dependency.

LZ4 is the default codec of half the data-lake stack (Kafka, Parquet
pages, RocksDB, Arrow IPC); the frame format is what `.lz4` files and
HTTP payloads carry. Implemented from the public specs
(lz4_Block_format.md / lz4_Frame_format.md, Yann Collet):

* block: token nibbles, 255-continuation lengths, 16-bit offsets,
  overlap-capable match copy;
* frame: magic, FLG/BD descriptor (version 01, block independence,
  block/content checksums, content size, dict id), header-checksum
  byte, per-block uncompressed marker bit, EndMark, and all three
  xxHash32 checks (header, per-block, content);
* xxh32: the full avalanche/merge-round algorithm (needed for the
  checksums; also exposed — it is the hash Parquet/Kafka use for
  integrity).

Validated against the system liblz4 in tests/test_lz4.py (its encoder
generates the streams: LZ4_compress_default blocks and
LZ4F_compressFrame frames at several block sizes / flag sets).

Reference parity anchor (semantic, not a port): extends the transport
decodings of helper/DataUtil.java (gzip) to the LZ4 frame ecosystem,
reference-free by design.
"""

from __future__ import annotations

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M = 0xFFFFFFFF


def _rotl(x, r):
    return ((x << r) | (x >> (32 - r))) & _M


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 of `data` (public algorithm, xxhash.c)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 16 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[i + 4 * j:i + 4 * j + 4],
                                      "little")
                v = (v + lane * _P2) & _M
                v = (_rotl(v, 13) * _P1) & _M
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 4 <= n:
        h = (h + int.from_bytes(data[i:i + 4], "little") * _P3) & _M
        h = (_rotl(h, 17) * _P4) & _M
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M
    h ^= h >> 13
    h = (h * _P3) & _M
    h ^= h >> 16
    return h


def decompress_block(data: bytes, max_output: int = 1 << 30,
                     prefix: bytes = b"") -> bytes:
    """LZ4 block format -> bytes. `prefix` seeds the match window for
    dependent blocks."""
    out = bytearray(prefix)
    base = len(prefix)
    i = 0
    n = len(data)
    while True:
        if i >= n:
            raise ValueError("lz4: truncated block")
        token = data[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated literal length")
                b = data[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("lz4: truncated literals")
        out += data[i:i + lit]
        i += lit
        if len(out) - base > max_output:
            raise ValueError("lz4: output limit exceeded")
        if i == n:
            break                       # last sequence: literals only
        if i + 2 > n:
            raise ValueError("lz4: truncated offset")
        offset = data[i] | (data[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: invalid offset")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if i >= n:
                    raise ValueError("lz4: truncated match length")
                b = data[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        if len(out) - base + mlen > max_output:
            raise ValueError("lz4: output limit exceeded")
        if offset >= mlen:
            out += out[-offset:len(out) - offset + mlen]
        else:
            for _ in range(mlen):
                out.append(out[-offset])
    return bytes(out[base:])


def decompress_frame(data: bytes, max_output: int = 1 << 30) -> bytes:
    """LZ4 frame format -> bytes, verifying every xxHash32 the frame
    carries (header, optional per-block, optional content)."""
    if data[:4] != b"\x04\x22\x4d\x18":
        raise ValueError("lz4: bad frame magic")
    if len(data) < 7:
        raise ValueError("lz4: truncated frame header")
    flg = data[4]
    bd = data[5]
    if (flg >> 6) != 1:
        raise ValueError("lz4: unsupported frame version")
    b_indep = (flg >> 5) & 1
    b_checksum = (flg >> 4) & 1
    c_size = (flg >> 3) & 1
    c_checksum = (flg >> 2) & 1
    if (flg >> 1) & 1:
        raise ValueError("lz4: reserved FLG bit set")
    dict_id = flg & 1
    if bd & 0x8F:
        raise ValueError("lz4: reserved BD bits set")
    if not 4 <= (bd >> 4) <= 7:
        raise ValueError("lz4: invalid block max size")
    pos = 6
    content_size = None
    if c_size:
        content_size = int.from_bytes(data[pos:pos + 8], "little")
        pos += 8
    if dict_id:
        pos += 4                         # external dictionary: id only
    if pos >= len(data):
        raise ValueError("lz4: truncated frame header")
    hc = data[pos]
    if (xxh32(data[4:pos]) >> 8) & 0xFF != hc:
        raise ValueError("lz4: header checksum mismatch")
    pos += 1

    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated block size")
        bsize = int.from_bytes(data[pos:pos + 4], "little")
        pos += 4
        if bsize == 0:                   # EndMark
            break
        uncompressed = bsize >> 31
        bsize &= 0x7FFFFFFF
        if pos + bsize > len(data):
            raise ValueError("lz4: truncated block")
        block = data[pos:pos + bsize]
        pos += bsize
        if b_checksum:
            if pos + 4 > len(data):
                raise ValueError("lz4: truncated block checksum")
            if int.from_bytes(data[pos:pos + 4], "little") \
                    != xxh32(block):
                raise ValueError("lz4: block checksum mismatch")
            pos += 4
        if uncompressed:
            out += block
        else:
            prefix = b"" if b_indep else bytes(out[-65536:])
            out += decompress_block(
                block, max_output=max_output - len(out), prefix=prefix)
        if len(out) > max_output:
            raise ValueError("lz4: output limit exceeded")
    if c_checksum:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated content checksum")
        if int.from_bytes(data[pos:pos + 4], "little") != xxh32(out):
            raise ValueError("lz4: content checksum mismatch")
        pos += 4
    if content_size is not None and len(out) != content_size:
        raise ValueError("lz4: content size mismatch")
    return bytes(out)


# --------------------------------------------------------------- encoder

def compress_block(data: bytes) -> bytes:
    """LZ4 block ENCODER (greedy hash-chain match finder). Spec end
    conditions honoured: the last match must start at least 12 bytes
    before the end and the block ends with >= 5 literal bytes; inputs
    shorter than 13 bytes emit pure literals. Validated against
    liblz4's own LZ4_decompress_safe (tests/test_lz4.py)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        return b"\x00"

    def put_seq(lit_start: int, lit_len: int, match_extra: int,
                offset: int) -> None:
        """match_extra = match_len - 4 (the token bias); offset == 0
        means a literals-only tail (no match field at all)."""
        lit_tok = min(lit_len, 15)
        mat_tok = min(match_extra, 15) if offset else 0
        out.append((lit_tok << 4) | mat_tok)
        rem = lit_len - 15
        while rem >= 0:
            out.append(min(rem, 255))
            if rem < 255:
                break
            rem -= 255
        out.extend(data[lit_start:lit_start + lit_len])
        if offset:
            out.append(offset & 0xFF)
            out.append(offset >> 8)
            rem = match_extra - 15
            while rem >= 0:
                out.append(min(rem, 255))
                if rem < 255:
                    break
                rem -= 255

    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    # matches may not extend into the last 5 bytes, and must START
    # at least 12 bytes from the end (mflimit)
    limit = n - 12
    while pos <= limit:
        key = data[pos:pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand > 65535 or \
                data[cand:cand + 4] != key:
            pos += 1
            continue
        # extend the match (not into the final 5 bytes)
        end_cap = n - 5
        m = pos + 4
        c = cand + 4
        while m < end_cap and data[m] == data[c]:
            m += 1
            c += 1
        match_len = m - pos
        put_seq(anchor, pos - anchor, match_len - 4, pos - cand)
        pos = m
        anchor = m
    # trailing literals
    lit_len = n - anchor
    lit_tok = min(lit_len, 15)
    out.append(lit_tok << 4)
    rem = lit_len - 15
    while rem >= 0:
        out.append(min(rem, 255))
        if rem < 255:
            break
        rem -= 255
    out.extend(data[anchor:])
    return bytes(out)


def compress_frame(data: bytes, *, block_size: int = 1 << 16,
                   content_checksum: bool = True,
                   block_checksum: bool = False) -> bytes:
    """LZ4 frame ENCODER (independent blocks): magic, FLG/BD with
    version 01, per-block [size|raw-flag] payloads (stored raw when
    compression does not win), EndMark, optional xxh32 checksums
    (the module's own spec-vector-validated xxh32)."""
    import struct as _st
    out = bytearray(_st.pack("<I", 0x184D2204))
    flg = (1 << 6) | (1 << 5)                     # v01, block indep
    if block_checksum:
        flg |= 1 << 4
    if content_checksum:
        flg |= 1 << 2
    bd_id = {1 << 16: 4, 1 << 18: 5, 1 << 20: 6, 1 << 22: 7}.get(
        block_size)
    if bd_id is None:
        raise ValueError("block_size must be 64KB/256KB/1MB/4MB")
    bd = bd_id << 4
    hdr = bytes((flg, bd))
    out += hdr
    out.append((xxh32(hdr) >> 8) & 0xFF)          # HC: byte 1 of xxh32
    for i in range(0, max(len(data), 1), block_size):
        chunk = data[i:i + block_size]
        if not chunk:
            break
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            out += _st.pack("<I", len(comp))
            body = comp
        else:
            out += _st.pack("<I", len(chunk) | 0x80000000)
            body = chunk
        out += body
        if block_checksum:
            out += _st.pack("<I", xxh32(body))
    out += _st.pack("<I", 0)                      # EndMark
    if content_checksum:
        out += _st.pack("<I", xxh32(data))
    return bytes(out)
