"""Snappy codec (raw block format + the framed stream format) —
the default codec of the Hadoop/parquet world.

Raw format (public spec, google/snappy format_description.txt):
uvarint uncompressed length, then tagged elements — literals (tag 00,
lengths 61-63 escape to 1-4 LE size bytes), copy-1 (tag 01: 4-11 byte
matches, 11-bit offset), copy-2 (tag 10: 1-64 byte matches, 16-bit LE
offset), copy-4 (tag 11: 32-bit LE offset).

Framed format (framing_format.txt): magic chunk
\\xff\\x06\\x00\\x00sNaPpY, compressed (0x00) / uncompressed (0x01)
chunks of <=64 KiB source data, each with a masked CRC32C
(Castagnoli; the mask rotation constant 0xa282ead8), padding (0xfe)
and reserved-skippable chunks.

Oracle: pyarrow bundles the canonical C++ snappy —
`pa.compress/decompress(codec='snappy')` validates BOTH directions of
the raw codec in tests/test_snappy.py; CRC32C is pinned on the
published check value ("123456789" -> 0xE3069283).
"""

from __future__ import annotations

import struct

__all__ = ["compress", "decompress", "compress_framed",
           "decompress_framed", "crc32c"]


# ------------------------------------------------------------- raw block

def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint overflow")


def decompress(data: bytes) -> bytes:
    if not data:
        raise ValueError("snappy: empty input")
    n, pos = _uvarint(data, 0)
    out = bytearray()
    ln = len(data)
    while pos < ln:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:                             # literal
            size = tag >> 2
            if size >= 60:
                nbytes = size - 59
                size = int.from_bytes(data[pos:pos + nbytes], "little")
                pos += nbytes
            size += 1
            out += data[pos:pos + size]
            pos += size
        else:
            if kind == 1:                         # copy-1
                length = ((tag >> 2) & 7) + 4
                offset = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:                       # copy-2
                length = (tag >> 2) + 1
                offset = data[pos] | (data[pos + 1] << 8)
                pos += 2
            else:                                 # copy-4
                length = (tag >> 2) + 1
                offset = int.from_bytes(data[pos:pos + 4], "little")
                pos += 4
            if offset == 0 or offset > len(out):
                raise ValueError("snappy: bad copy offset")
            if offset >= length:
                out += out[len(out) - offset:len(out) - offset + length]
            else:
                for _ in range(length):
                    out.append(out[-offset])
    if len(out) != n:
        raise ValueError(f"snappy: length mismatch {len(out)} != {n}")
    return bytes(out)


def compress(data: bytes) -> bytes:
    """Greedy raw-format encoder (copy-2 elements, 64-byte match
    chunks); decoded by the canonical implementation byte-for-value."""
    n = len(data)
    out = bytearray()
    # uvarint length
    v = n
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break

    def emit_literal(start: int, end: int) -> None:
        nonlocal out
        i = start
        while i < end:
            size = min(end - i, 1 << 16)
            s = size - 1
            if s < 60:
                out.append(s << 2)
            elif s < 256:
                out.append(60 << 2)
                out.append(s)
            else:
                out.append(61 << 2)
                out += s.to_bytes(2, "little")
            out += data[i:i + size]
            i += size

    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    limit = n - 4
    while pos <= limit:
        key = data[pos:pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is None or pos - cand > 0xFFFF or \
                data[cand:cand + 4] != key:
            pos += 1
            continue
        m = pos + 4
        c = cand + 4
        while m < n and data[m] == data[c]:
            m += 1
            c += 1
        emit_literal(anchor, pos)
        offset = pos - cand
        length = m - pos
        while length > 0:                         # copy-2: 1..64 bytes
            chunk = min(length, 64)
            out.append(((chunk - 1) << 2) | 2)
            out += offset.to_bytes(2, "little")
            length -= chunk
        pos = m
        anchor = m
    emit_literal(anchor, n)
    return bytes(out)


# --------------------------------------------------------------- crc32c

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli); check value crc32c(b'123456789') ==
    0xE3069283."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------- framed

_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"


def compress_framed(data: bytes, *, chunk: int = 65536) -> bytes:
    out = bytearray(_STREAM_ID)
    for i in range(0, max(len(data), 1), chunk):
        part = data[i:i + chunk]
        if not part and i:
            break
        comp = compress(part)
        if len(comp) < len(part):
            body = struct.pack("<I", _masked_crc(part)) + comp
            out.append(0x00)
        else:
            body = struct.pack("<I", _masked_crc(part)) + part
            out.append(0x01)
        out += len(body).to_bytes(3, "little")
        out += body
    return bytes(out)


def decompress_framed(data: bytes) -> bytes:
    if not data.startswith(_STREAM_ID):
        raise ValueError("snappy: missing stream identifier")
    pos = len(_STREAM_ID)
    out = bytearray()
    while pos < len(data):
        kind = data[pos]
        size = int.from_bytes(data[pos + 1:pos + 4], "little")
        body = data[pos + 4:pos + 4 + size]
        pos += 4 + size
        if kind == 0x00:
            crc = struct.unpack("<I", body[:4])[0]
            part = decompress(body[4:])
            if _masked_crc(part) != crc:
                raise ValueError("snappy: chunk CRC mismatch")
            out += part
        elif kind == 0x01:
            crc = struct.unpack("<I", body[:4])[0]
            part = body[4:]
            if _masked_crc(part) != crc:
                raise ValueError("snappy: chunk CRC mismatch")
            out += part
        elif kind == 0xFE or 0x80 <= kind <= 0xFD:
            continue                              # padding / skippable
        elif kind == 0xFF:
            if body != _STREAM_ID[4:]:
                raise ValueError("snappy: bad repeated stream id")
        else:
            raise ValueError(f"snappy: unskippable chunk {kind:#x}")
    return bytes(out)
