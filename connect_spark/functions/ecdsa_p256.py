"""ECDSA P-256 (ES256) sign/verify, stdlib-only.

Completes the reference's JWT surface (internal/impl/crypto/
jwt_{parse,sign}.go: ES256 alongside HS*/RS*) without an EC library.
Curve arithmetic is plain affine point math over GF(p) with
`pow(x, -1, p)` inversions; nonces are deterministic per RFC 6979
(HMAC-SHA256 DRBG), validated against the RFC's A.2.5 P-256 test
vector in tests — no RNG anywhere, so signatures are reproducible.
"""

from __future__ import annotations

import hashlib
import hmac

# NIST P-256 domain parameters
P = 0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF
A = P - 3
B = 0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B
N = 0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551
GX = 0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296
GY = 0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5


def _inv(x: int, m: int) -> int:
    return pow(x, -1, m)


def _add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and (y1 + y2) % P == 0:
        return None
    if p1 == p2:
        lam = (3 * x1 * x1 + A) * _inv(2 * y1, P) % P
    else:
        lam = (y2 - y1) * _inv(x2 - x1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return x3, (lam * (x1 - x3) - y1) % P


def _mul(k: int, point):
    acc = None
    addend = point
    while k:
        if k & 1:
            acc = _add(acc, addend)
        addend = _add(addend, addend)
        k >>= 1
    return acc


def public_key(d: int) -> tuple[int, int]:
    return _mul(d, (GX, GY))


def _bits2int(data: bytes) -> int:
    v = int.from_bytes(data, "big")
    excess = len(data) * 8 - N.bit_length()
    return v >> excess if excess > 0 else v


def _rfc6979_k(h1: bytes, d: int) -> int:
    """Deterministic nonce (RFC 6979 §3.2) for SHA-256/P-256."""
    qlen_bytes = 32
    x = d.to_bytes(qlen_bytes, "big")
    h = _bits2int(h1) % N
    hb = h.to_bytes(qlen_bytes, "big")
    v = b"\x01" * 32
    k = b"\x00" * 32
    k = hmac.new(k, v + b"\x00" + x + hb, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    k = hmac.new(k, v + b"\x01" + x + hb, hashlib.sha256).digest()
    v = hmac.new(k, v, hashlib.sha256).digest()
    while True:
        v = hmac.new(k, v, hashlib.sha256).digest()
        cand = _bits2int(v)
        if 1 <= cand < N:
            return cand
        k = hmac.new(k, v + b"\x00", hashlib.sha256).digest()
        v = hmac.new(k, v, hashlib.sha256).digest()


def sign(msg: bytes, d: int) -> tuple[int, int]:
    h1 = hashlib.sha256(msg).digest()
    z = _bits2int(h1) % N
    k = _rfc6979_k(h1, d)
    x, _ = _mul(k, (GX, GY))
    r = x % N
    s = _inv(k, N) * (z + r * d) % N
    return r, s


def verify(msg: bytes, sig: tuple[int, int], q: tuple[int, int]) -> bool:
    r, s = sig
    if not (1 <= r < N and 1 <= s < N):
        return False
    z = _bits2int(hashlib.sha256(msg).digest()) % N
    w = _inv(s, N)
    u1 = z * w % N
    u2 = r * w % N
    pt = _add(_mul(u1, (GX, GY)), _mul(u2, q))
    if pt is None:
        return False
    return pt[0] % N == r
