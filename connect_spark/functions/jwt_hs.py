"""JWT HS256 sign/parse (methods.adoc:3982-4491 parse_jwt_hs*/
sign_jwt_hs* — reference internal/impl/crypto/jwt_{parse,sign}.go).

HS256 is HMAC-SHA256 over base64url segments — implementable with the
Python stdlib (no pyjwt needed), Arrow-batched. RS/ES variants need
asymmetric-crypto libs not present in this container and raise a clear
error."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def sign_jwt_hs256(claims_json: Column, secret: str) -> Column:
    """Sign a JSON-string claims column → compact JWT."""

    header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"},
                                separators=(",", ":")).encode())

    @pandas_udf("string")
    def _sign(s: pd.Series) -> pd.Series:
        def one(claims: str | None) -> str | None:
            if claims is None:
                return None
            payload = _b64url(
                json.dumps(json.loads(claims), separators=(",", ":"),
                           sort_keys=True).encode()
            )
            signing_input = f"{header}.{payload}".encode()
            sig = hmac.new(secret.encode(), signing_input,
                           hashlib.sha256).digest()
            return f"{header}.{payload}.{_b64url(sig)}"

        return s.map(one)

    return _sign(claims_json)


def parse_jwt_hs256(token: Column, secret: str) -> Column:
    """Verify + decode → claims JSON string; invalid signature/shape →
    null (pair with flag_error for the reference's error contract)."""

    @pandas_udf("string")
    def _parse(s: pd.Series) -> pd.Series:
        def one(tok: str | None) -> str | None:
            if tok is None:
                return None
            try:
                header_b64, payload_b64, sig_b64 = tok.split(".")
                signing_input = f"{header_b64}.{payload_b64}".encode()
                expect = hmac.new(secret.encode(), signing_input,
                                  hashlib.sha256).digest()
                if not hmac.compare_digest(expect, _b64url_decode(sig_b64)):
                    return None
                return _b64url_decode(payload_b64).decode()
            except Exception:  # noqa: BLE001 — malformed token → null
                return None

        return s.map(one)

    return _parse(token)


# --------------------------------------------------------------- RS256
# RSASSA-PKCS1-v1_5 with SHA-256, stdlib-only: signing is
# pow(EM, d, n); verification is pow(sig, e, n) == EM. EM = 0x00 0x01
# PS(0xFF..) 0x00 || DigestInfo(SHA-256) || hash per RFC 8017 §9.2.

_SHA256_DIGEST_INFO = bytes.fromhex(
    "3031300d060960864801650304020105000420"
)


def _emsa_pkcs1_v15(msg: bytes, em_len: int) -> bytes:
    h = hashlib.sha256(msg).digest()
    t = _SHA256_DIGEST_INFO + h
    ps = b"\xff" * (em_len - len(t) - 3)
    return b"\x00\x01" + ps + b"\x00" + t


def rsa_sign_pkcs1_sha256(msg: bytes, n: int, d: int) -> bytes:
    k = (n.bit_length() + 7) // 8
    em = int.from_bytes(_emsa_pkcs1_v15(msg, k), "big")
    return pow(em, d, n).to_bytes(k, "big")


def rsa_verify_pkcs1_sha256(msg: bytes, sig: bytes, n: int, e: int) -> bool:
    k = (n.bit_length() + 7) // 8
    if len(sig) != k:
        return False
    em = pow(int.from_bytes(sig, "big"), e, n).to_bytes(k, "big")
    return hmac.compare_digest(em, _emsa_pkcs1_v15(msg, k))


# Minimal DER walk for RSA public keys (PKCS#1 RSAPublicKey or X.509
# SubjectPublicKeyInfo) so PEM-published keys verify directly.

def _der_read(data: bytes, pos: int) -> tuple[int, bytes, int]:
    tag = data[pos]
    length = data[pos + 1]
    pos += 2
    if length & 0x80:
        n_bytes = length & 0x7F
        length = int.from_bytes(data[pos:pos + n_bytes], "big")
        pos += n_bytes
    return tag, data[pos:pos + length], pos + length


def rsa_public_from_pem(pem: str) -> tuple[int, int]:
    """PEM (PKCS#1 'RSA PUBLIC KEY' or SPKI 'PUBLIC KEY') → (n, e)."""
    body = "".join(
        l for l in pem.strip().splitlines() if not l.startswith("-")
    )
    der = base64.b64decode(body)
    tag, seq, _ = _der_read(der, 0)
    # SPKI: SEQUENCE { SEQUENCE{oid,null}, BIT STRING { RSAPublicKey } }
    t1, first, after = _der_read(seq, 0)
    if t1 == 0x30:  # algorithm identifier → SPKI
        t2, bitstr, _ = _der_read(seq, after)
        inner = bitstr[1:]  # skip unused-bits octet
        _, seq, _ = _der_read(inner, 0)
        t1, first, after = _der_read(seq, 0)
    _, e_bytes, _ = _der_read(seq, after)
    return int.from_bytes(first, "big"), int.from_bytes(e_bytes, "big")


def sign_jwt_rs256(claims_json: Column, n: int, d: int) -> Column:
    """Sign a JSON-string claims column → compact RS256 JWT
    (sign_jwt_rs256 method, internal/impl/crypto/jwt_sign.go)."""
    header = _b64url(
        json.dumps({"alg": "RS256", "typ": "JWT"},
                   separators=(",", ":")).encode()
    )

    @pandas_udf("string")
    def _sign(s: pd.Series) -> pd.Series:
        def one(claims: str | None) -> str | None:
            if claims is None:
                return None
            payload = _b64url(
                json.dumps(json.loads(claims), separators=(",", ":"),
                           sort_keys=True).encode()
            )
            signing_input = f"{header}.{payload}".encode()
            sig = rsa_sign_pkcs1_sha256(signing_input, n, d)
            return f"{header}.{payload}.{_b64url(sig)}"

        return s.map(one)

    return _sign(claims_json)


# --------------------------------------------------------------- ES256


def sign_jwt_es256(claims_json: Column, d: int) -> Column:
    """ES256 JWT: ECDSA P-256 + SHA-256, raw r||s signature (RFC
    7518 §3.4), deterministic RFC 6979 nonces."""
    from connect_spark.functions import ecdsa_p256 as ec

    header = _b64url(
        json.dumps({"alg": "ES256", "typ": "JWT"},
                   separators=(",", ":")).encode()
    )

    @pandas_udf("string")
    def _sign(s: pd.Series) -> pd.Series:
        def one(claims: str | None) -> str | None:
            if claims is None:
                return None
            payload = _b64url(
                json.dumps(json.loads(claims), separators=(",", ":"),
                           sort_keys=True).encode()
            )
            r, sv = ec.sign(f"{header}.{payload}".encode(), d)
            sig = r.to_bytes(32, "big") + sv.to_bytes(32, "big")
            return f"{header}.{payload}.{_b64url(sig)}"

        return s.map(one)

    return _sign(claims_json)


def parse_jwt_es256(token: Column, public_point: tuple[int, int]) -> Column:
    """Verify + decode an ES256 JWT; bad signature/shape → null."""
    from connect_spark.functions import ecdsa_p256 as ec

    qx, qy = public_point

    @pandas_udf("string")
    def _parse(s: pd.Series) -> pd.Series:
        def one(tok: str | None) -> str | None:
            if tok is None:
                return None
            try:
                header_b64, payload_b64, sig_b64 = tok.split(".")
                if json.loads(_b64url_decode(header_b64))["alg"] != "ES256":
                    return None
                raw = _b64url_decode(sig_b64)
                if len(raw) != 64:
                    return None
                sig = (
                    int.from_bytes(raw[:32], "big"),
                    int.from_bytes(raw[32:], "big"),
                )
                ok = ec.verify(
                    f"{header_b64}.{payload_b64}".encode(), sig, (qx, qy)
                )
                return _b64url_decode(payload_b64).decode() if ok else None
            except Exception:  # noqa: BLE001 — malformed token → null
                return None

        return s.map(one)

    return _parse(token)


def parse_jwt_rs256(token: Column, public_key: tuple[int, int] | str) -> Column:
    """Verify + decode an RS256 JWT → claims JSON; bad signature/shape
    → null. `public_key` is (n, e) or a PEM string."""
    if isinstance(public_key, str):
        n, e = rsa_public_from_pem(public_key)
    else:
        n, e = public_key

    @pandas_udf("string")
    def _parse(s: pd.Series) -> pd.Series:
        def one(tok: str | None) -> str | None:
            if tok is None:
                return None
            try:
                header_b64, payload_b64, sig_b64 = tok.split(".")
                if json.loads(_b64url_decode(header_b64))["alg"] != "RS256":
                    return None
                ok = rsa_verify_pkcs1_sha256(
                    f"{header_b64}.{payload_b64}".encode(),
                    _b64url_decode(sig_b64),
                    n,
                    e,
                )
                return _b64url_decode(payload_b64).decode() if ok else None
            except Exception:  # noqa: BLE001 — malformed token → null
                return None

        return s.map(one)

    return _parse(token)
