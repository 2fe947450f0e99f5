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


def sign_jwt_rs256(*_a, **_k):  # pragma: no cover
    raise NotImplementedError(
        "RS/ES JWT variants need an asymmetric-crypto library not "
        "present in this container; HS256 is fully supported"
    )
