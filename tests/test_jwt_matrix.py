"""Full JWT matrix (HS/RS/ES × 256/384/512) + EC/RSA PEM parsing
(methods.adoc:3982-4491; internal/impl/crypto/jwt_{parse,sign}.go).

ECDSA curves are pinned to RFC 6979 deterministic-signature vectors
(A.2.5 P-256, A.2.6 P-384) plus structural group checks for P-521,
and the whole stack is cross-validated against openssl where present:
openssl-generated keys parse, and our signatures verify under
`openssl dgst -verify`.
"""

from __future__ import annotations

import base64
import json
import shutil
import subprocess

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_spark.functions import ecdsa as E
from connect_spark.functions.jwt_hs import (
    _b64url_decode,
    ec_private_from_pem,
    ec_private_to_pem,
    ec_public_from_pem,
    ec_public_to_pem,
    parse_jwt_es,
    parse_jwt_hs,
    parse_jwt_rs,
    rsa_private_from_pem,
    rsa_sign_pkcs1,
    sign_jwt_es,
    sign_jwt_hs,
    sign_jwt_rs,
)

HAVE_OPENSSL = shutil.which("openssl") is not None


def test_rfc6979_p256_vector():
    x = 0xC9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721
    r, s = E.sign(b"sample", x, E.P256)
    assert r == int(
        "EFD48B2AACB6A8FD1140DD9CD45E81D69D2C877B56AAF991C34D0EA84EAF3716",
        16,
    )
    assert s == int(
        "F7CB1C942D657C41D436C7A1B6E29F65F3E900DBB9AFF4064DC4AB2F843ACDA8",
        16,
    )


def test_rfc6979_p384_vector():
    x = int(
        "6B9D3DAD2E1B8C1C05B19875B6659F4DE23C3B667BF297BA9AA47740787137D8"
        "96D5724E4C70A825F872C9EA60D2EDF5",
        16,
    )
    r, s = E.sign(b"sample", x, E.P384)
    assert r == int(
        "94EDBB92A5ECB8AAD4736E56C691916B3F88140666CE9FA73D64C4EA95AD133C"
        "81A648152E44ACF96E36DD1E80FABE46",
        16,
    )
    assert s == int(
        "99EF4AEB15F178CEA1FE40DB2603138F130E740A19624526203B6351D0A3A94F"
        "A329C145786E679E7B82C71A38628AC8",
        16,
    )


def test_p521_structure_and_roundtrip():
    c = E.P521
    assert E.on_curve((c.gx, c.gy), c)
    assert E._mul(c.n, (c.gx, c.gy), c) is None
    d = 0xDEADBEEF1234567890
    q = E.public_key(d, c)
    assert E.on_curve(q, c)
    sig = E.sign(b"msg", d, c)
    assert E.verify(b"msg", sig, q, c)
    assert not E.verify(b"other", sig, q, c)


@pytest.mark.parametrize("alg", ["HS256", "HS384", "HS512"])
def test_hs_matrix_sign_parse(spark, alg):
    df = spark.createDataFrame([Row(claims='{"sub": "u1", "n": 7}')])
    tok = df.select(
        sign_jwt_hs(F.col("claims"), "s3cret", alg).alias("t")
    )
    out = tok.select(
        parse_jwt_hs(F.col("t"), "s3cret", alg).alias("ok"),
        parse_jwt_hs(F.col("t"), "wrong", alg).alias("bad"),
    ).collect()[0]
    assert json.loads(out.ok) == {"sub": "u1", "n": 7}
    assert out.bad is None
    # alg header pinned: an HS256 token doesn't parse as HS384
    other = "HS384" if alg != "HS384" else "HS512"
    cross = tok.select(
        parse_jwt_hs(F.col("t"), "s3cret", other).alias("x")
    ).collect()[0]
    assert cross.x is None


@pytest.fixture(scope="module")
def rsa_key_full():
    # deterministic 1024-bit key (test-sized; see test_jwt_rs.py for
    # the generator) — regenerate via the same Miller-Rabin code
    import random

    from tests.test_jwt_rs import _gen_prime

    rng = random.Random(20260813)
    p = _gen_prime(512, rng)
    q = _gen_prime(512, rng)
    n, e = p * q, 65537
    d = pow(e, -1, (p - 1) * (q - 1))
    return n, e, d, p, q


@pytest.fixture(scope="module")
def rsa_key(rsa_key_full):
    n, e, d, _p, _q = rsa_key_full
    return n, e, d


@pytest.mark.parametrize("alg", ["RS256", "RS384", "RS512"])
def test_rs_matrix_sign_parse(spark, rsa_key, alg):
    n, e, d = rsa_key
    df = spark.createDataFrame([Row(claims='{"iss": "me"}')])
    tok = df.select(sign_jwt_rs(F.col("claims"), (n, d), alg).alias("t"))
    out = tok.select(
        parse_jwt_rs(F.col("t"), (n, e), alg).alias("ok"),
        parse_jwt_rs(F.col("t"), (n, e + 2), alg).alias("bad"),
    ).collect()[0]
    assert json.loads(out.ok) == {"iss": "me"}
    assert out.bad is None


@pytest.mark.parametrize("alg", ["ES256", "ES384", "ES512"])
def test_es_matrix_sign_parse_with_pem_keys(spark, alg):
    curve = E.ALG_CURVES[alg]
    d = 0x1337C0DE + 17
    q = E.public_key(d, curve)
    priv_pem = ec_private_to_pem(curve, d)
    pub_pem = ec_public_to_pem(curve, q)
    df = spark.createDataFrame([Row(claims='{"scope": "x"}')])
    tok = df.select(sign_jwt_es(F.col("claims"), priv_pem, alg).alias("t"))
    row = tok.select(
        parse_jwt_es(F.col("t"), pub_pem, alg).alias("ok"),
        F.col("t"),
    ).collect()[0]
    assert json.loads(row.ok) == {"scope": "x"}
    # signature octet width per RFC 7518 §3.4
    octets = {"ES256": 32, "ES384": 48, "ES512": 66}[alg]
    sig = _b64url_decode(row.t.split(".")[2])
    assert len(sig) == 2 * octets
    # tampered payload fails
    h, p, s = row.t.split(".")
    forged = f"{h}.{base64.urlsafe_b64encode(b'{}').rstrip(b'=').decode()}.{s}"
    bad = (
        spark.createDataFrame([Row(t=forged)])
        .select(parse_jwt_es(F.col("t"), pub_pem, alg).alias("r"))
        .collect()[0]
    )
    assert bad.r is None


def test_es_pem_curve_alg_mismatch_raises(spark):
    pem = ec_private_to_pem(E.P256, 7)
    df = spark.createDataFrame([Row(claims="{}")])
    with pytest.raises(ValueError, match="P-384"):
        df.select(sign_jwt_es(F.col("claims"), pem, "ES384"))


@pytest.mark.skipif(not HAVE_OPENSSL, reason="openssl not on PATH")
@pytest.mark.parametrize(
    "ossl_curve,name", [("prime256v1", "P-256"), ("secp384r1", "P-384"),
                        ("secp521r1", "P-521")]
)
def test_openssl_generated_ec_keys_parse(tmp_path, ossl_curve, name):
    key = tmp_path / "k.pem"
    pub = tmp_path / "p.pem"
    subprocess.run(
        ["openssl", "ecparam", "-genkey", "-name", ossl_curve,
         "-noout", "-out", str(key)],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["openssl", "ec", "-in", str(key), "-pubout", "-out", str(pub)],
        check=True, capture_output=True,
    )
    curve, d = ec_private_from_pem(key.read_text())
    assert curve.name == name
    pcurve, q = ec_public_from_pem(pub.read_text())
    assert pcurve.name == name
    # the private scalar reproduces openssl's public point
    assert E.public_key(d, curve) == q


def _rsa_private_pem(n, e, d, p, q) -> str:
    """Hand-built PKCS#1 'RSA PRIVATE KEY' PEM with CRT params."""
    from connect_spark.functions.jwt_hs import _der_int, _der_tlv, _pem_wrap

    dp = d % (p - 1)
    dq = d % (q - 1)
    qinv = pow(q, -1, p)
    body = b"".join(
        _der_int(v) for v in (0, n, e, d, p, q, dp, dq, qinv)
    )
    return _pem_wrap(_der_tlv(0x30, body), "RSA PRIVATE KEY")


def test_rsa_private_pem_roundtrip(rsa_key_full):
    n, e, d, p, q = rsa_key_full
    pem = _rsa_private_pem(n, e, d, p, q)
    assert rsa_private_from_pem(pem) == (n, e, d)


@pytest.mark.skipif(not HAVE_OPENSSL, reason="openssl not on PATH")
@pytest.mark.parametrize("bits,md", [("256", "sha256"), ("384", "sha384"),
                                     ("512", "sha512")])
def test_openssl_verifies_our_rsa_signature(
    tmp_path, rsa_key_full, bits, md
):
    n, e, d, p, q = rsa_key_full
    key = tmp_path / "rsa.pem"
    key.write_text(_rsa_private_pem(n, e, d, p, q))
    pub = tmp_path / "rsa_pub.pem"
    res = subprocess.run(
        ["openssl", "rsa", "-in", str(key), "-pubout", "-out", str(pub)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr  # openssl accepts our PEM
    msg = tmp_path / "msg"
    msg.write_bytes(b"cross-validated payload")
    sig = rsa_sign_pkcs1(b"cross-validated payload", n, d, bits)
    sigf = tmp_path / "sig"
    sigf.write_bytes(sig)
    res = subprocess.run(
        ["openssl", "dgst", f"-{md}", "-verify", str(pub),
         "-signature", str(sigf), str(msg)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stdout + res.stderr


@pytest.mark.skipif(not HAVE_OPENSSL, reason="openssl not on PATH")
@pytest.mark.parametrize("alg,md", [("ES256", "sha256"), ("ES384", "sha384"),
                                    ("ES512", "sha512")])
def test_openssl_verifies_our_ecdsa_signature(tmp_path, alg, md):
    curve = E.ALG_CURVES[alg]
    d = 0xA5A5A5A5
    q = E.public_key(d, curve)
    pub = tmp_path / "pub.pem"
    pub.write_text(ec_public_to_pem(curve, q))
    msg = tmp_path / "msg"
    msg.write_bytes(b"cross-validated payload")
    r, s = E.sign(b"cross-validated payload", d, curve)
    # wrap raw (r, s) into the DER ECDSA-Sig-Value openssl expects
    from connect_spark.functions.jwt_hs import _der_int, _der_tlv

    der_sig = _der_tlv(0x30, _der_int(r) + _der_int(s))
    sigf = tmp_path / "sig.der"
    sigf.write_bytes(der_sig)
    res = subprocess.run(
        ["openssl", "dgst", f"-{md}", "-verify", str(pub),
         "-signature", str(sigf), str(msg)],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stdout + res.stderr
