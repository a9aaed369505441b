"""Crypto primitives (helper/crypto.py) vs the PUBLISHED known-answer
vectors — independent oracles: FIPS-197 Appendix C (AES block), NIST
SP 800-38A F.2 (AES-CBC), RFC 6229 / classic vectors (RC4)."""

from jsoup_spark.helper.crypto import (
    AES, aes_cbc_decrypt, aes_cbc_encrypt, rc4)


def test_rc4_classic_vectors():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert rc4(b"Secret", b"Attack at dawn").hex() == \
        "45a01f645fc35b383552544b9bf5"
    # symmetric
    assert rc4(b"Key", rc4(b"Key", b"round trip")) == b"round trip"


def test_aes_fips197_appendix_c():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key, want in cases:
        a = AES(key)
        ct = a.encrypt_block(pt)
        assert ct.hex() == want, len(key)
        assert a.decrypt_block(ct) == pt


def test_aes_cbc_sp800_38a():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    p = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a"
                      "ae2d8a571e03ac9c9eb76fac45af8e51")
    want = ("7649abac8119b246cee98e9b12e9197d"
            "5086cb9b507219ee95db113a917678b2")
    ct = aes_cbc_encrypt(key, iv, p, pad=False)
    assert ct.hex() == want
    assert aes_cbc_decrypt(key, iv, ct, unpad=False) == p


def test_aes_cbc_pkcs7_roundtrip():
    key = bytes(range(16))
    iv = bytes(range(16, 32))
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes((i * 7) & 0xFF for i in range(n))
        ct = aes_cbc_encrypt(key, iv, data)
        assert len(ct) % 16 == 0 and len(ct) > len(data)
        assert aes_cbc_decrypt(key, iv, ct) == data
