"""ECDSA P-256 (ES256) sign/verify, stdlib-only — thin delegation to
the multi-curve module (functions/ecdsa.py) kept for API stability;
RFC 6979 A.2.5 vector pinned in tests.
"""

from __future__ import annotations

from connect_spark.functions import ecdsa as _E

P = _E.P256.p
A = _E.P256.a
B = _E.P256.b
N = _E.P256.n
GX = _E.P256.gx
GY = _E.P256.gy


def public_key(d: int) -> tuple[int, int]:
    return _E.public_key(d, _E.P256)


def sign(msg: bytes, d: int) -> tuple[int, int]:
    return _E.sign(msg, d, _E.P256)


def verify(msg: bytes, sig: tuple[int, int], q: tuple[int, int]) -> bool:
    return _E.verify(msg, sig, q, _E.P256)
