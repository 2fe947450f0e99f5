"""compare_bcrypt / compare_argon2 (functions/{bcrypt_py,argon2_py}.py;
reference internal/impl/crypto/{bcrypt,argon2}.go).

bcrypt correctness chain: the Blowfish core is cross-checked against
the cryptography package's cipher, then full bcrypt is pinned on
public test vectors (the jBCrypt suite) AND the reference doc's own
compare_bcrypt example. argon2 is pinned bit-exact against the
cryptography package's Rust Argon2{i,d,id} across a parameter grid.
"""

from __future__ import annotations

import pytest

from connect_spark.functions.argon2_py import (
    argon2_phc_hash,
    argon2_tag,
    compare_argon2,
)
from connect_spark.functions.bcrypt_py import (
    _Blowfish,
    bcrypt_hash,
    compare_bcrypt,
)

# public bcrypt vectors (jBCrypt test suite), cost 6
BCRYPT_VECTORS = [
    ("", "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s."),
    ("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe"),
    ("abc", "$2a$06$If6bvum7DFjUnE9p2uDeDu0YHzrHM6tf.iqN8.yx.jNN1ILEf7h0i"),
    (
        "abcdefghijklmnopqrstuvwxyz",
        "$2a$06$.rCVZVOThsIa97pEDOxvGuRRgzG64bvtJ0938xuqzv18d3ZpQhstC",
    ),
]


def test_blowfish_core_matches_cryptography():
    from cryptography.hazmat.decrepit.ciphers.algorithms import Blowfish
    from cryptography.hazmat.primitives.ciphers import Cipher, modes

    for key in (b"TESTKEY", bytes(range(1, 17)), b"k" * 56):
        bf = _Blowfish()
        bf.expand_key(key)
        pt = bytes(range(8))
        l, r = (
            int.from_bytes(pt[:4], "big"),
            int.from_bytes(pt[4:], "big"),
        )
        l2, r2 = bf.encrypt_block(l, r)
        ours = l2.to_bytes(4, "big") + r2.to_bytes(4, "big")
        enc = Cipher(Blowfish(key), modes.ECB()).encryptor()
        assert ours == enc.update(pt) + enc.finalize()


@pytest.mark.parametrize("password,hashed", BCRYPT_VECTORS)
def test_bcrypt_public_vectors(password, hashed):
    assert bcrypt_hash(password, hashed) == hashed
    assert compare_bcrypt(password, hashed) is True
    assert compare_bcrypt(password + "x", hashed) is False


def test_bcrypt_malformed_hash_raises():
    with pytest.raises(ValueError):
        compare_bcrypt("x", "$9z$06$invalid")
    with pytest.raises(ValueError):
        compare_bcrypt("x", "not-a-hash")


def test_argon2_matches_rust_oracle_grid():
    from cryptography.hazmat.primitives.kdf.argon2 import (
        Argon2d,
        Argon2i,
        Argon2id,
    )

    grid = [(2, 32, 4), (2, 64, 1), (1, 8, 1), (4, 96, 3)]
    for cls, var in (
        (Argon2id, "argon2id"),
        (Argon2i, "argon2i"),
        (Argon2d, "argon2d"),
    ):
        for t, m, p in grid:
            pw = b"password-%d" % m
            salt = bytes(range(16))
            want = cls(
                salt=salt, length=32, iterations=t, lanes=p, memory_cost=m
            ).derive(pw)
            got = argon2_tag(
                pw,
                salt,
                time_cost=t,
                memory_cost=m,
                parallelism=p,
                variant=var,
            )
            assert got == want, (var, t, m, p)


def test_argon2_phc_roundtrip_and_reject():
    salt = bytes(range(16))
    for variant in ("argon2i", "argon2id"):
        h = argon2_phc_hash(
            "s3cret",
            salt,
            variant=variant,
            memory_cost=32,
            time_cost=2,
            parallelism=4,
        )
        assert compare_argon2("s3cret", h) is True
        assert compare_argon2("nope", h) is False
    with pytest.raises(ValueError):
        compare_argon2("x", "$argon2x$v=19$m=32,t=2,p=4$AAAA$BBBB")
    with pytest.raises(ValueError):
        compare_argon2("x", "$argon2id$v=19$m=32,t=2$AAAA$BBBB")


def test_bloblang_methods(spark):
    """Both methods through the Bloblang compiler (the registration
    surface the reference exposes)."""
    from connect_spark.bloblang.compiler import compile_mapping

    salt = bytes(range(16))
    argon_hash = argon2_phc_hash(
        "blob-secret", salt, memory_cost=32, time_cost=1, parallelism=4
    )
    bc_hash = BCRYPT_VECTORS[1][1]  # "a"
    df = spark.createDataFrame(
        [("a", "blob-secret"), ("wrong", "wrong")], ["bc", "ar"]
    )
    import json

    src = f"""
root.bc_ok = this.bc.compare_bcrypt({json.dumps(bc_hash)})
root.ar_ok = this.ar.compare_argon2({json.dumps(argon_hash)})
"""
    rows = {
        r["bc_ok"]: r["ar_ok"]
        for r in compile_mapping(df, src).collect()
    }
    assert rows == {True: True, False: False}


def test_reference_doc_example_cost10():
    """The compare_bcrypt doc example (bcrypt.go:30-37) verbatim —
    cost 10, ~9 s in pure Python, kept as the single slow pin."""
    h = "$2y$10$Dtnt5NNzVtMCOZONT705tOcS8It6krJX8bEjnDJnwxiFKsz1C.3Ay"
    assert compare_bcrypt("there-are-many-blobs-in-the-sea", h) is True
