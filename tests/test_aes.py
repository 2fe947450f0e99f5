"""AES core + modes (functions/aes.py) against public test vectors,
plus the Bloblang encrypt_aes/decrypt_aes methods."""

from __future__ import annotations

import pytest

from connect_spark.functions.aes import (
    _encrypt_block,
    _decrypt_block,
    _expand_key,
    decrypt_aes,
    encrypt_aes,
)


def test_fips197_block_vectors():
    # FIPS-197 Appendix C.1/C.2/C.3
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    assert _encrypt_block(pt, _expand_key(k128)).hex() == (
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    k192 = bytes.fromhex("000102030405060708090a0b0c0d0e0f1011121314151617")
    assert _encrypt_block(pt, _expand_key(k192)).hex() == (
        "dda97ca4864cdfe06eaf70a0ec0d7191"
    )
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f"
    )
    assert _encrypt_block(pt, _expand_key(k256)).hex() == (
        "8ea2b7ca516745bfeafc49904b496089"
    )
    # inverse cipher
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert _decrypt_block(ct, _expand_key(k128)) == pt


def test_ctr_sp800_38a_vector():
    # SP 800-38A F.5.1 (AES-128 CTR)
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    pt = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
    )
    ct = encrypt_aes(pt, "ctr", key, iv)
    assert ct.hex() == (
        "874d6191b620e3261bef6864990db6ce"
        "9806f66b7970fdff8617187bb9fffdff"
    )
    assert decrypt_aes(ct, "ctr", key, iv) == pt


def test_methods_adoc_ctr_example():
    # the exact example from methods.adoc:3843-3847
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    assert encrypt_aes(b"hello world!", "ctr", key, iv).hex() == (
        "84e9b31ff7400bdf80be7254"
    )


def test_ofb_sp800_38a_vector():
    # SP 800-38A F.4.1 (AES-128 OFB)
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    assert encrypt_aes(pt, "ofb", key, iv).hex() == (
        "3b3fd92eb72dad20333449f8e83cfb4a"
    )


def test_cbc_roundtrip_and_padding():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    # SP 800-38A F.2.1 first block (no padding check — spec vector is
    # block-aligned; our CBC adds PKCS#7, so compare the first block)
    pt = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    ct = encrypt_aes(pt, "cbc", key, iv)
    assert ct[:16].hex() == "7649abac8119b246cee98e9b12e9197d"
    assert decrypt_aes(ct, "cbc", key, iv) == pt
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes(range(256))[:n]
        assert decrypt_aes(encrypt_aes(data, "cbc", key, iv), "cbc", key, iv) == data
    with pytest.raises(ValueError, match="padding|block"):
        decrypt_aes(b"\x00" * 15, "cbc", key, iv)


def test_gcm_nist_vector_and_tamper():
    # NIST GCM test case 3 (AES-128, 12-byte IV)
    key = bytes.fromhex("feffe9928665731c6d6a8f9467308308")
    iv = bytes.fromhex("cafebabefacedbaddecaf888")
    pt = bytes.fromhex(
        "d9313225f88406e5a55909c5aff5269a"
        "86a7a9531534f7da2e4c303d8a318a72"
        "1c3c0c95956809532fcf0e2449a6b525"
        "b16aedf5aa0de657ba637b391aafd255"
    )
    ct = encrypt_aes(pt, "gcm", key, iv)
    assert ct[:-16].hex() == (
        "42831ec2217774244b7221b784d0d49c"
        "e3aa212f2c02a4e035c17e2329aca12e"
        "21d514b25466931c7d8f6a5aac84aa05"
        "1ba30b396a0aac973d58e091473f5985"
    )
    assert ct[-16:].hex() == "4d5c2af327cd64a62cf35abd2ba6fab4"
    assert decrypt_aes(ct, "gcm", key, iv) == pt
    tampered = bytes([ct[0] ^ 1]) + ct[1:]
    with pytest.raises(ValueError, match="authentication"):
        decrypt_aes(tampered, "gcm", key, iv)


def test_bloblang_encrypt_decrypt_methods(spark):
    from connect_spark.bloblang.compiler import compile_mapping

    df = spark.createDataFrame([("hello world!",)], ["value"])
    src = """
let key = "2b7e151628aed2a6abf7158809cf4f3c".decode("hex")
let vector = "f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff".decode("hex")
root.encrypted = this.value.encrypt_aes("ctr", $key, $vector).encode("hex")
"""
    row = compile_mapping(df, src).collect()[0]
    assert row["encrypted"] == "84e9b31ff7400bdf80be7254"
    back = """
let key = "2b7e151628aed2a6abf7158809cf4f3c".decode("hex")
let vector = "f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff".decode("hex")
root.decrypted = this.encrypted.decode("hex").decrypt_aes("ctr", $key, $vector).string()
"""
    df2 = compile_mapping(df, src)
    out = compile_mapping(df2, back).collect()[0]
    assert out["decrypted"] == "hello world!"


def test_gcm_matches_jdk_for_all_nonce_lengths(spark):
    """GCM's counter is inc32 (wrap only the low 32 bits, SP 800-38D
    §6.2) — a full-128-bit increment diverges for non-12-byte nonces
    whose GHASH-derived J0 sits near a 2^32 low-word boundary. Pin
    bit-exactness against the JVM's AES/GCM (independent oracle, same
    implementation family Go's AEAD uses) across nonce lengths."""
    from connect_spark.functions.aes import decrypt_aes, encrypt_aes

    jvm = spark.sparkContext._jvm
    Cipher = jvm.javax.crypto.Cipher
    SecretKeySpec = jvm.javax.crypto.spec.SecretKeySpec
    GCMParameterSpec = jvm.javax.crypto.spec.GCMParameterSpec

    key = bytes(range(16))
    for nlen in (8, 12, 13, 16, 60):
        nonce = bytes((i * 37 + 5) % 256 for i in range(nlen))
        pt = bytes((i * 11) % 256 for i in range(100))
        c = Cipher.getInstance("AES/GCM/NoPadding")
        c.init(
            1,
            SecretKeySpec(bytearray(key), "AES"),
            GCMParameterSpec(128, bytearray(nonce)),
        )
        theirs = bytes(c.doFinal(bytearray(pt)))
        ours = encrypt_aes(pt, "gcm", key, nonce)
        assert ours == theirs, f"nonce len {nlen}"
        assert decrypt_aes(ours, "gcm", key, nonce) == pt


def test_ttable_vectorized_matches_scalar_core():
    """The numpy T-table path must agree byte-for-byte with the scalar
    FIPS-197 reference for every key size, across both counter modes
    and their wrap boundaries."""
    import os
    import random

    import numpy as np

    import connect_spark.functions.aes as A

    rng = random.Random(1234)
    for keylen in (16, 24, 32):
        key = bytes(rng.randrange(256) for _ in range(keylen))
        rk = A._expand_key(key)
        blocks = [bytes(rng.randrange(256) for _ in range(16))
                  for _ in range(37)]
        arr = (np.frombuffer(b"".join(blocks), dtype=">u4")
               .astype(np.uint32).reshape(-1, 4))
        got = A._encrypt_blocks_np(arr, rk).astype(">u4").tobytes()
        want = b"".join(A._encrypt_block(b, rk) for b in blocks)
        assert got == want

    key = bytes(range(32))
    data = os.urandom(1111)  # non-multiple of 16
    saved = A._np
    try:
        # full-128-bit CTR across the 2^64 low-word carry
        iv = bytes(8) + (2**64 - 3).to_bytes(8, "big")
        fast = A._ctr_stream(data, key, iv)
        A._np = None
        assert A._ctr_stream(data, key, iv) == fast
        A._np = saved
        # GCM inc32 across the 2^32 wrap
        icb = bytes(12) + (2**32 - 2).to_bytes(4, "big")
        fast = A._gctr_stream(data, key, icb)
        A._np = None
        assert A._gctr_stream(data, key, icb) == fast
    finally:
        A._np = saved
