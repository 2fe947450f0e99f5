"""ECDSA over the NIST prime curves P-256 / P-384 / P-521,
stdlib-only (completes the reference's ES256/ES384/ES512 JWT matrix —
internal/impl/crypto/jwt_{parse,sign}.go; methods.adoc:3982-4491).

Affine point math over GF(p) with `pow(x, -1, p)` inversions;
deterministic RFC 6979 nonces (HMAC DRBG parametrized by the curve's
hash), so signatures are reproducible — the P-256 path is pinned to
the RFC's A.2.5 test vector in tests.
"""

from __future__ import annotations

import hashlib
import hmac
from dataclasses import dataclass


@dataclass(frozen=True)
class Curve:
    name: str
    p: int
    a: int
    b: int
    n: int
    gx: int
    gy: int
    hash_name: str  # JOSE pairing: ES256→SHA-256, ES384→384, ES512→512

    @property
    def qlen_bytes(self) -> int:
        return (self.n.bit_length() + 7) // 8

    def hash(self, msg: bytes) -> bytes:
        return hashlib.new(self.hash_name, msg).digest()


P256 = Curve(
    name="P-256",
    p=0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF,
    a=0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFC,
    b=0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B,
    n=0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551,
    gx=0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
    gy=0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
    hash_name="sha256",
)

P384 = Curve(
    name="P-384",
    p=int(
        "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFE"
        "FFFFFFFF0000000000000000FFFFFFFF",
        16,
    ),
    a=int(
        "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFE"
        "FFFFFFFF0000000000000000FFFFFFFC",
        16,
    ),
    b=int(
        "B3312FA7E23EE7E4988E056BE3F82D19181D9C6EFE8141120314088F5013875A"
        "C656398D8A2ED19D2A85C8EDD3EC2AEF",
        16,
    ),
    n=int(
        "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFC7634D81F4372DDF"
        "581A0DB248B0A77AECEC196ACCC52973",
        16,
    ),
    gx=int(
        "AA87CA22BE8B05378EB1C71EF320AD746E1D3B628BA79B9859F741E082542A38"
        "5502F25DBF55296C3A545E3872760AB7",
        16,
    ),
    gy=int(
        "3617DE4A96262C6F5D9E98BF9292DC29F8F41DBD289A147CE9DA3113B5F0B8C0"
        "0A60B1CE1D7E819D7A431D7C90EA0E5F",
        16,
    ),
    hash_name="sha384",
)

P521 = Curve(
    name="P-521",
    p=(1 << 521) - 1,
    a=(1 << 521) - 4,
    b=int(
        "0051953EB9618E1C9A1F929A21A0B68540EEA2DA725B99B315F3B8B489918EF1"
        "09E156193951EC7E937B1652C0BD3BB1BF073573DF883D2C34F1EF451FD46B50"
        "3F00",
        16,
    ),
    n=int(
        "01" + "F" * 65
        + "A51868783BF2F966B7FCC0148F709A5D03BB5C9B8899C47AEBB6FB71E9138"
        + "6409",
        16,
    ),
    gx=int(
        "00C6858E06B70404E9CD9E3ECB662395B4429C648139053FB521F828AF606B4D"
        "3DBAA14B5E77EFE75928FE1DC127A2FFA8DE3348B3C1856A429BF97E7E31C2E5"
        "BD66",
        16,
    ),
    gy=int(
        "011839296A789A3BC0045C8A5FB42C7D1BD998F54449579B446817AFBD17273E"
        "662C97EE72995EF42640C550B9013FAD0761353C7086A272C24088BE94769FD1"
        "6650",
        16,
    ),
    hash_name="sha512",
)

CURVES: dict[str, Curve] = {c.name: c for c in (P256, P384, P521)}

# JOSE alg → curve (RFC 7518 §3.4)
ALG_CURVES: dict[str, Curve] = {"ES256": P256, "ES384": P384, "ES512": P521}


def _add(p1, p2, c: Curve):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and (y1 + y2) % c.p == 0:
        return None
    if p1 == p2:
        lam = (3 * x1 * x1 + c.a) * pow(2 * y1, -1, c.p) % c.p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, c.p) % c.p
    x3 = (lam * lam - x1 - x2) % c.p
    return x3, (lam * (x1 - x3) - y1) % c.p


def _mul(k: int, point, c: Curve):
    acc = None
    addend = point
    while k:
        if k & 1:
            acc = _add(acc, addend, c)
        addend = _add(addend, addend, c)
        k >>= 1
    return acc


def public_key(d: int, curve: Curve = P256) -> tuple[int, int]:
    return _mul(d, (curve.gx, curve.gy), curve)


def on_curve(q: tuple[int, int], curve: Curve) -> bool:
    x, y = q
    return (y * y - (x * x * x + curve.a * x + curve.b)) % curve.p == 0


def _bits2int(data: bytes, curve: Curve) -> int:
    v = int.from_bytes(data, "big")
    excess = len(data) * 8 - curve.n.bit_length()
    return v >> excess if excess > 0 else v


def _rfc6979_k(h1: bytes, d: int, curve: Curve) -> int:
    """Deterministic nonce (RFC 6979 §3.2), HMAC with the curve's
    paired hash."""
    hlen = len(h1)
    x = d.to_bytes(curve.qlen_bytes, "big")
    h = _bits2int(h1, curve) % curve.n
    hb = h.to_bytes(curve.qlen_bytes, "big")
    v = b"\x01" * hlen
    k = b"\x00" * hlen
    k = hmac.new(k, v + b"\x00" + x + hb, curve.hash_name).digest()
    v = hmac.new(k, v, curve.hash_name).digest()
    k = hmac.new(k, v + b"\x01" + x + hb, curve.hash_name).digest()
    v = hmac.new(k, v, curve.hash_name).digest()
    while True:
        t = b""
        while len(t) * 8 < curve.n.bit_length():
            v = hmac.new(k, v, curve.hash_name).digest()
            t += v
        cand = _bits2int(t, curve)
        if 1 <= cand < curve.n:
            return cand
        k = hmac.new(k, v + b"\x00", curve.hash_name).digest()
        v = hmac.new(k, v, curve.hash_name).digest()


def sign(msg: bytes, d: int, curve: Curve = P256) -> tuple[int, int]:
    h1 = curve.hash(msg)
    z = _bits2int(h1, curve) % curve.n
    k = _rfc6979_k(h1, d, curve)
    x, _ = _mul(k, (curve.gx, curve.gy), curve)
    r = x % curve.n
    s = pow(k, -1, curve.n) * (z + r * d) % curve.n
    return r, s


def verify(
    msg: bytes, sig: tuple[int, int], q: tuple[int, int], curve: Curve = P256
) -> bool:
    r, s = sig
    if not (1 <= r < curve.n and 1 <= s < curve.n):
        return False
    z = _bits2int(curve.hash(msg), curve) % curve.n
    w = pow(s, -1, curve.n)
    u1 = z * w % curve.n
    u2 = r * w % curve.n
    pt = _add(
        _mul(u1, (curve.gx, curve.gy), curve), _mul(u2, q, curve), curve
    )
    if pt is None:
        return False
    return pt[0] % curve.n == r
