"""Crypto primitives for the PDF standard security handler: RC4 and
AES-128/192/256 (ECB block + CBC mode), implemented from the public
specifications (FIPS-197 for AES, the well-known RC4 KSA/PRGA).

No crypto library exists in this sandbox (no pycryptodome/cryptography
— verified by import sweep), so these are from-scratch and pinned
against the INDEPENDENT published known-answer vectors in
tests/test_crypto.py: FIPS-197 Appendix C (AES block), NIST SP
800-38A F.2 (AES-CBC), RFC 6229 + the classic "Plaintext" vector
(RC4). Pure Python; PDF encryption payloads are small (streams and
strings), and the work runs Arrow-batched inside executors.
"""

from __future__ import annotations

__all__ = ["rc4", "AES", "aes_cbc_decrypt", "aes_cbc_encrypt"]


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 (symmetric): KSA + PRGA."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ------------------------------------------------------------------ AES

def _build_sbox():
    # multiplicative inverse in GF(2^8) + affine transform (FIPS-197 §5.1.1)
    p, q = 1, 1
    sbox = [0] * 256
    # generate via the 3/0xf6 generator walk (public technique)
    for _ in range(255):
        # p *= 3
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # q /= 3
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ ((q << 1) | (q >> 7)) & 0xFF
        x ^= ((q << 2) | (q >> 6)) & 0xFF
        x ^= ((q << 3) | (q >> 5)) & 0xFF
        x ^= ((q << 4) | (q >> 4)) & 0xFF
        sbox[p] = x ^ 0x63
    sbox[0] = 0x63
    return sbox


_SBOX = _build_sbox()
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


_RCON = [0x01]
for _ in range(13):
    _RCON.append(_xtime(_RCON[-1]))


class AES:
    """AES block cipher (FIPS-197): 128/192/256-bit keys."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError("AES key must be 16/24/32 bytes")
        nk = len(key) // 4
        self.nr = nk + 6
        # key expansion into words
        w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
        for i in range(nk, 4 * (self.nr + 1)):
            temp = list(w[i - 1])
            if i % nk == 0:
                temp = temp[1:] + temp[:1]                   # RotWord
                temp = [_SBOX[b] for b in temp]              # SubWord
                temp[0] ^= _RCON[i // nk - 1]
            elif nk > 6 and i % nk == 4:
                temp = [_SBOX[b] for b in temp]
            w.append([w[i - nk][j] ^ temp[j] for j in range(4)])
        # round keys as flat 16-byte blocks (column-major state order)
        self.round_keys = [
            bytes(b for word in w[4 * r:4 * r + 4] for b in word)
            for r in range(self.nr + 1)]

    # state: list of 16 bytes, column-major (s[r + 4c])

    def encrypt_block(self, block: bytes) -> bytes:
        s = list(block)
        self._add_rk(s, 0)
        for rnd in range(1, self.nr):
            s = [_SBOX[b] for b in s]
            s = self._shift_rows(s)
            s = self._mix_columns(s)
            self._add_rk(s, rnd)
        s = [_SBOX[b] for b in s]
        s = self._shift_rows(s)
        self._add_rk(s, self.nr)
        return bytes(s)

    def decrypt_block(self, block: bytes) -> bytes:
        s = list(block)
        self._add_rk(s, self.nr)
        for rnd in range(self.nr - 1, 0, -1):
            s = self._inv_shift_rows(s)
            s = [_INV_SBOX[b] for b in s]
            self._add_rk(s, rnd)
            s = self._inv_mix_columns(s)
        s = self._inv_shift_rows(s)
        s = [_INV_SBOX[b] for b in s]
        self._add_rk(s, 0)
        return bytes(s)

    def _add_rk(self, s: list, rnd: int) -> None:
        rk = self.round_keys[rnd]
        for i in range(16):
            s[i] ^= rk[i]

    @staticmethod
    def _shift_rows(s: list) -> list:
        # bytes laid out block-order b0..b15; state col c = b[4c+r]
        return [s[0], s[5], s[10], s[15],
                s[4], s[9], s[14], s[3],
                s[8], s[13], s[2], s[7],
                s[12], s[1], s[6], s[11]]

    @staticmethod
    def _inv_shift_rows(s: list) -> list:
        return [s[0], s[13], s[10], s[7],
                s[4], s[1], s[14], s[11],
                s[8], s[5], s[2], s[15],
                s[12], s[9], s[6], s[3]]

    @staticmethod
    def _mix_columns(s: list) -> list:
        out = [0] * 16
        for c in range(4):
            a = s[4 * c:4 * c + 4]
            out[4 * c + 0] = _mul(a[0], 2) ^ _mul(a[1], 3) ^ a[2] ^ a[3]
            out[4 * c + 1] = a[0] ^ _mul(a[1], 2) ^ _mul(a[2], 3) ^ a[3]
            out[4 * c + 2] = a[0] ^ a[1] ^ _mul(a[2], 2) ^ _mul(a[3], 3)
            out[4 * c + 3] = _mul(a[0], 3) ^ a[1] ^ a[2] ^ _mul(a[3], 2)
        return out

    @staticmethod
    def _inv_mix_columns(s: list) -> list:
        out = [0] * 16
        for c in range(4):
            a = s[4 * c:4 * c + 4]
            out[4 * c + 0] = (_mul(a[0], 14) ^ _mul(a[1], 11)
                              ^ _mul(a[2], 13) ^ _mul(a[3], 9))
            out[4 * c + 1] = (_mul(a[0], 9) ^ _mul(a[1], 14)
                              ^ _mul(a[2], 11) ^ _mul(a[3], 13))
            out[4 * c + 2] = (_mul(a[0], 13) ^ _mul(a[1], 9)
                              ^ _mul(a[2], 14) ^ _mul(a[3], 11))
            out[4 * c + 3] = (_mul(a[0], 11) ^ _mul(a[1], 13)
                              ^ _mul(a[2], 9) ^ _mul(a[3], 14))
        return out


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes,
                    pad: bool = True) -> bytes:
    """AES-CBC; PKCS#7 padding when pad (the PDF AESV2/V3 contract)."""
    aes = AES(key)
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    elif len(data) % 16:
        raise ValueError("CBC without padding needs 16-byte multiple")
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(x ^ y for x, y in zip(data[i:i + 16], prev))
        prev = aes.encrypt_block(block)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes,
                    unpad: bool = True) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC ciphertext not a 16-byte multiple")
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i:i + 16]
        out += bytes(x ^ y for x, y in
                     zip(aes.decrypt_block(block), prev))
        prev = block
    if unpad and out:
        n = out[-1]
        if 1 <= n <= 16:
            out = out[:-n]
    return bytes(out)
