"""Pure-Python AES (FIPS-197) + CTR / OFB / CBC / GCM modes.

Backs the Bloblang ``encrypt_aes`` / ``decrypt_aes`` methods
(`docs/modules/guides/pages/bloblang/methods.adoc:3827-3896`: schemes
ctr, gcm, ofb, cbc; key + iv/nonce). No crypto library ships in this
container, so the cipher is implemented from the public FIPS-197
specification (S-box constants, key schedule, (Inv)SubBytes/ShiftRows/
MixColumns) and modes from NIST SP 800-38A/D; test vectors from those
documents — plus the methods.adoc CTR example itself — are pinned in
tests/test_aes.py.

The block cipher has two implementations behind one interface: the
scalar FIPS-197 reference below, and a numpy-vectorized T-table
formulation (the standard 32-bit-word optimization described in the
Rijndael proposal §5.2 — four 256-entry tables fusing
SubBytes+ShiftRows+MixColumns, final round via the plain S-box) that
processes all counter blocks of a CTR/GCTR keystream in one batch.
The scalar path remains the oracle: the vectorized path is
cross-checked against it vector-for-vector in tests/test_aes.py, and
payloads under 256 bytes (the Bloblang config-sized case) stay
scalar.  The T-table path moves MB-scale payloads (Snowpipe bdec
blobs, sinks/snowflake_ingest.py) at ~100 MB/s instead of ~0.06.
"""

from __future__ import annotations

try:
    import numpy as _np
except ImportError:  # pragma: no cover
    _np = None

# --- AES core (FIPS-197) --------------------------------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytes(256)
_INV_SBOX = bytearray(256)
for i, v in enumerate(_SBOX):
    _INV_SBOX[v] = i
_INV_SBOX = bytes(_INV_SBOX)

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key(key: bytes) -> list[bytes]:
    if len(key) not in (16, 24, 32):
        raise ValueError("AES key must be 16, 24, or 32 bytes")
    nk = len(key) // 4
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        temp = words[i - 1]
        if i % nk == 0:
            temp = bytes(
                _SBOX[b] for b in temp[1:] + temp[:1]
            )
            temp = bytes(
                (temp[0] ^ _RCON[i // nk - 1],) + tuple(temp[1:])
            )
        elif nk > 6 and i % nk == 4:
            temp = bytes(_SBOX[b] for b in temp)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], temp)))
    return [
        b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)
    ]


def _encrypt_block(block: bytes, round_keys: list[bytes]) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, round_keys[0]))
    nr = len(round_keys) - 1
    for rnd in range(1, nr):
        # SubBytes + ShiftRows
        s = bytearray(
            _SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)
        )
        # MixColumns
        t = bytearray(16)
        for c in range(4):
            col = s[4 * c : 4 * c + 4]
            t[4 * c + 0] = _mul(col[0], 2) ^ _mul(col[1], 3) ^ col[2] ^ col[3]
            t[4 * c + 1] = col[0] ^ _mul(col[1], 2) ^ _mul(col[2], 3) ^ col[3]
            t[4 * c + 2] = col[0] ^ col[1] ^ _mul(col[2], 2) ^ _mul(col[3], 3)
            t[4 * c + 3] = _mul(col[0], 3) ^ col[1] ^ col[2] ^ _mul(col[3], 2)
        s = bytearray(a ^ b for a, b in zip(t, round_keys[rnd]))
    s = bytearray(
        _SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)
    )
    return bytes(a ^ b for a, b in zip(s, round_keys[nr]))


def _decrypt_block(block: bytes, round_keys: list[bytes]) -> bytes:
    nr = len(round_keys) - 1
    s = bytearray(a ^ b for a, b in zip(block, round_keys[nr]))
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes
        s = bytearray(
            _INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16)
        )
        s = bytearray(a ^ b for a, b in zip(s, round_keys[rnd]))
        # InvMixColumns
        t = bytearray(16)
        for c in range(4):
            col = s[4 * c : 4 * c + 4]
            t[4 * c + 0] = (
                _mul(col[0], 14) ^ _mul(col[1], 11)
                ^ _mul(col[2], 13) ^ _mul(col[3], 9)
            )
            t[4 * c + 1] = (
                _mul(col[0], 9) ^ _mul(col[1], 14)
                ^ _mul(col[2], 11) ^ _mul(col[3], 13)
            )
            t[4 * c + 2] = (
                _mul(col[0], 13) ^ _mul(col[1], 9)
                ^ _mul(col[2], 14) ^ _mul(col[3], 11)
            )
            t[4 * c + 3] = (
                _mul(col[0], 11) ^ _mul(col[1], 13)
                ^ _mul(col[2], 9) ^ _mul(col[3], 14)
            )
        s = t
    s = bytearray(
        _INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16)
    )
    return bytes(a ^ b for a, b in zip(s, round_keys[0]))


# --- vectorized T-table core (Rijndael proposal §5.2) ---------------

_TT = None  # (T0, T1, T2, T3, SBOX) as numpy uint32 arrays


def _tables():
    global _TT
    if _TT is None:
        s = _np.frombuffer(_SBOX, dtype=_np.uint8).astype(_np.uint32)
        m2 = _np.array([_xtime(x) for x in _SBOX], dtype=_np.uint32)
        m3 = m2 ^ s
        _TT = (
            (m2 << 24) | (s << 16) | (s << 8) | m3,
            (m3 << 24) | (m2 << 16) | (s << 8) | s,
            (s << 24) | (m3 << 16) | (m2 << 8) | s,
            (s << 24) | (s << 16) | (m3 << 8) | m2,
            s,
        )
    return _TT


def _encrypt_blocks_np(blocks, round_keys: list[bytes]):
    """Encrypt an (n, 4) uint32 array of big-endian state words, all
    blocks at once.  Same state layout as `_encrypt_block` (words are
    state columns); the rotating column indices implement ShiftRows,
    the tables fuse SubBytes+MixColumns."""
    t0, t1, t2, t3, sbox = _tables()
    rk = [_np.frombuffer(k, dtype=">u4").astype(_np.uint32)
          for k in round_keys]
    w = [blocks[:, c] ^ rk[0][c] for c in range(4)]
    nr = len(round_keys) - 1
    for r in range(1, nr):
        k = rk[r]
        w = [t0[w[c] >> 24]
             ^ t1[(w[(c + 1) % 4] >> 16) & 0xFF]
             ^ t2[(w[(c + 2) % 4] >> 8) & 0xFF]
             ^ t3[w[(c + 3) % 4] & 0xFF]
             ^ k[c]
             for c in range(4)]
    k = rk[nr]
    w = [((sbox[w[c] >> 24] << 24)
          | (sbox[(w[(c + 1) % 4] >> 16) & 0xFF] << 16)
          | (sbox[(w[(c + 2) % 4] >> 8) & 0xFF] << 8)
          | sbox[w[(c + 3) % 4] & 0xFF])
         ^ k[c]
         for c in range(4)]
    return _np.stack(w, axis=1)


def _counter_blocks_np(iv: bytes, n: int, inc32_only: bool):
    """n successive counter blocks from `iv`: full-128-bit increment
    (CTR) or low-32-bit wrap (GCM inc32, SP 800-38D)."""
    blocks = _np.empty((n, 4), dtype=_np.uint32)
    idx = _np.arange(n, dtype=_np.uint64)
    if inc32_only:
        for c in range(3):
            blocks[:, c] = int.from_bytes(iv[4 * c: 4 * c + 4], "big")
        low = (_np.uint64(int.from_bytes(iv[12:], "big")) + idx)
        blocks[:, 3] = (low & _np.uint64(0xFFFFFFFF)).astype(_np.uint32)
    else:
        hi0 = _np.uint64(int.from_bytes(iv[:8], "big"))
        lo0 = _np.uint64(int.from_bytes(iv[8:], "big"))
        lo = lo0 + idx  # wraps mod 2^64
        hi = hi0 + (lo < lo0).astype(_np.uint64)
        blocks[:, 0] = (hi >> _np.uint64(32)).astype(_np.uint32)
        blocks[:, 1] = (hi & _np.uint64(0xFFFFFFFF)).astype(_np.uint32)
        blocks[:, 2] = (lo >> _np.uint64(32)).astype(_np.uint32)
        blocks[:, 3] = (lo & _np.uint64(0xFFFFFFFF)).astype(_np.uint32)
    return blocks


def _xor_keystream_np(data: bytes, key: bytes, iv: bytes,
                      inc32_only: bool) -> bytes:
    n = (len(data) + 15) // 16
    ks = _encrypt_blocks_np(
        _counter_blocks_np(iv, n, inc32_only), _expand_key(key))
    ks_bytes = ks.astype(">u4").tobytes()[: len(data)]
    out = (_np.frombuffer(data, dtype=_np.uint8)
           ^ _np.frombuffer(ks_bytes, dtype=_np.uint8))
    return out.tobytes()


# --- modes (NIST SP 800-38A / 800-38D) ------------------------------


def _ctr_stream(data: bytes, key: bytes, iv: bytes) -> bytes:
    if _np is not None and len(data) >= 256:
        return _xor_keystream_np(data, key, iv, inc32_only=False)
    rk = _expand_key(key)
    counter = int.from_bytes(iv, "big")
    out = bytearray()
    for off in range(0, len(data), 16):
        ks = _encrypt_block(counter.to_bytes(16, "big"), rk)
        chunk = data[off : off + 16]
        out += bytes(a ^ b for a, b in zip(chunk, ks))
        counter = (counter + 1) % (1 << 128)
    return bytes(out)


def _inc32(block: bytes) -> bytes:
    """SP 800-38D inc32: increment only the low 32 bits, wrapping
    modulo 2^32 — GCM's counter function (full-128-bit increment
    diverges from spec when the low word crosses a 2^32 boundary,
    reachable with non-12-byte nonces or >64 GiB payloads)."""
    fixed, low = block[:12], int.from_bytes(block[12:], "big")
    return fixed + ((low + 1) & 0xFFFFFFFF).to_bytes(4, "big")


def _gctr_stream(data: bytes, key: bytes, icb: bytes) -> bytes:
    """GCTR keystream XOR with the inc32 counter (SP 800-38D §6.5)."""
    if _np is not None and len(data) >= 256:
        return _xor_keystream_np(data, key, icb, inc32_only=True)
    rk = _expand_key(key)
    cb = icb
    out = bytearray()
    for off in range(0, len(data), 16):
        ks = _encrypt_block(cb, rk)
        chunk = data[off : off + 16]
        out += bytes(a ^ b for a, b in zip(chunk, ks))
        cb = _inc32(cb)
    return bytes(out)


def _ofb_stream(data: bytes, key: bytes, iv: bytes) -> bytes:
    rk = _expand_key(key)
    feedback = iv
    out = bytearray()
    for off in range(0, len(data), 16):
        feedback = _encrypt_block(feedback, rk)
        chunk = data[off : off + 16]
        out += bytes(a ^ b for a, b in zip(chunk, feedback))
    return bytes(out)


def _cbc_encrypt(data: bytes, key: bytes, iv: bytes) -> bytes:
    rk = _expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad  # PKCS#7, matching Go's CBC usage
    prev = iv
    out = bytearray()
    for off in range(0, len(data), 16):
        block = bytes(
            a ^ b for a, b in zip(data[off : off + 16], prev)
        )
        prev = _encrypt_block(block, rk)
        out += prev
    return bytes(out)


def _cbc_decrypt(data: bytes, key: bytes, iv: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC ciphertext length must be a block multiple")
    rk = _expand_key(key)
    prev = iv
    out = bytearray()
    for off in range(0, len(data), 16):
        block = data[off : off + 16]
        out += bytes(
            a ^ b for a, b in zip(_decrypt_block(block, rk), prev)
        )
        prev = block
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("invalid CBC padding")
    return bytes(out[:-pad])


def _gf128_mul(x: int, y: int) -> int:
    # GF(2^128) multiply, GCM's bit-reflected polynomial (SP 800-38D)
    r = 0xE1 << 120
    z = 0
    v = x
    for i in range(127, -1, -1):
        if (y >> i) & 1:
            z ^= v
        if v & 1:
            v = (v >> 1) ^ r
        else:
            v >>= 1
    return z


def _ghash(h: int, aad: bytes, ct: bytes) -> bytes:
    def blocks(b: bytes):
        for off in range(0, len(b), 16):
            yield b[off : off + 16].ljust(16, b"\x00")

    y = 0
    for blk in blocks(aad):
        y = _gf128_mul(y ^ int.from_bytes(blk, "big"), h)
    for blk in blocks(ct):
        y = _gf128_mul(y ^ int.from_bytes(blk, "big"), h)
    lens = (len(aad) * 8).to_bytes(8, "big") + (len(ct) * 8).to_bytes(8, "big")
    y = _gf128_mul(y ^ int.from_bytes(lens, "big"), h)
    return y.to_bytes(16, "big")


def _gcm_encrypt(data: bytes, key: bytes, nonce: bytes) -> bytes:
    rk = _expand_key(key)
    h = int.from_bytes(_encrypt_block(b"\x00" * 16, rk), "big")
    if len(nonce) == 12:
        j0 = nonce + b"\x00\x00\x00\x01"
    else:
        j0 = _ghash(h, b"", nonce)
    ct = _gctr_stream(data, key, _inc32(j0))
    tag = bytes(
        a ^ b
        for a, b in zip(_ghash(h, b"", ct), _encrypt_block(j0, rk))
    )
    return ct + tag  # ciphertext || 16-byte tag (Go AEAD Seal layout)


def _gcm_decrypt(data: bytes, key: bytes, nonce: bytes) -> bytes:
    if len(data) < 16:
        raise ValueError("GCM ciphertext shorter than its tag")
    ct, tag = data[:-16], data[-16:]
    rk = _expand_key(key)
    h = int.from_bytes(_encrypt_block(b"\x00" * 16, rk), "big")
    if len(nonce) == 12:
        j0 = nonce + b"\x00\x00\x00\x01"
    else:
        j0 = _ghash(h, b"", nonce)
    expect = bytes(
        a ^ b
        for a, b in zip(_ghash(h, b"", ct), _encrypt_block(j0, rk))
    )
    import hmac as _hmac

    if not _hmac.compare_digest(expect, tag):
        raise ValueError("GCM authentication failed")
    return _gctr_stream(ct, key, _inc32(j0))


def encrypt_aes(data: bytes, scheme: str, key: bytes, iv: bytes) -> bytes:
    scheme = scheme.lower()
    if scheme == "ctr":
        return _ctr_stream(data, key, iv)
    if scheme == "ofb":
        return _ofb_stream(data, key, iv)
    if scheme == "cbc":
        return _cbc_encrypt(data, key, iv)
    if scheme == "gcm":
        return _gcm_encrypt(data, key, iv)
    raise ValueError(f"scheme must be ctr|gcm|ofb|cbc, got {scheme!r}")


def decrypt_aes(data: bytes, scheme: str, key: bytes, iv: bytes) -> bytes:
    scheme = scheme.lower()
    if scheme == "ctr":
        return _ctr_stream(data, key, iv)
    if scheme == "ofb":
        return _ofb_stream(data, key, iv)
    if scheme == "cbc":
        return _cbc_decrypt(data, key, iv)
    if scheme == "gcm":
        return _gcm_decrypt(data, key, iv)
    raise ValueError(f"scheme must be ctr|gcm|ofb|cbc, got {scheme!r}")
