"""Pure-Python bcrypt verification for the Bloblang `compare_bcrypt`
method (reference: internal/impl/crypto/bcrypt.go — wraps
golang.org/x/crypto/bcrypt's CompareHashAndPassword).

Implemented from the public algorithm (Provos & Mazières, "A
Future-Adaptable Password Scheme", USENIX 1999) and the OpenBSD
`$2a$/$2b$/$2y$` modular-crypt format:

- Blowfish P-array/S-boxes are the hexadecimal digits of pi — computed
  here at import with a Machin-formula big-int expansion instead of
  vendoring 4 KiB of constants.
- EksBlowfishSetup: key schedule with cost-parameter 2^cost alternating
  password/salt expansions.
- bcrypt hash: ECB-encrypt "OrpheanBeholderScryDoubt" 64 times, emit
  the first 23 bytes in bcrypt's base64 alphabet (./A-Za-z0-9).

Performance note: pure Python runs the 2^cost key schedule in
~0.2 s at cost 4 and ~12 s at cost 10 — correct but slow; this engine
treats password verification as an edge operation, not a hot path.
"""

from __future__ import annotations

import hmac

__all__ = ["bcrypt_hash", "compare_bcrypt"]

# --- pi hex digits → Blowfish constants -----------------------------

_N_WORDS = 18 + 4 * 256


def _pi_words(n_words: int = _N_WORDS) -> list[int]:
    """First n_words 32-bit words of the fractional hex digits of pi,
    via Machin's formula with guarded integer arithmetic."""
    bits = 32 * n_words + 64  # guard bits

    def atan_inv(x: int) -> int:
        # arctan(1/x) * 2^bits, alternating series
        one = 1 << bits
        total = term = one // x
        x2 = x * x
        k = 1
        while term:
            term //= x2
            if term == 0:
                break
            total += -term // (2 * k + 1) if k % 2 else term // (2 * k + 1)
            k += 1
        return total

    pi = 16 * atan_inv(5) - 4 * atan_inv(239)  # pi * 2^bits
    frac = pi - (3 << bits)  # fractional part * 2^bits
    words = []
    for i in range(n_words):
        shift = bits - 32 * (i + 1)
        words.append((frac >> shift) & 0xFFFFFFFF)
    return words


_PI = _pi_words()
_P_INIT = _PI[:18]
_S_INIT = [
    _PI[18 + 256 * i : 18 + 256 * (i + 1)] for i in range(4)
]


class _Blowfish:
    def __init__(self):
        self.p = list(_P_INIT)
        self.s = [list(box) for box in _S_INIT]

    def encrypt_block(self, xl: int, xr: int) -> tuple[int, int]:
        p = self.p
        s0, s1, s2, s3 = self.s
        for i in range(16):
            xl ^= p[i]
            xl &= 0xFFFFFFFF
            f = (
                (s0[xl >> 24] + s1[(xl >> 16) & 0xFF]) & 0xFFFFFFFF
                ^ s2[(xl >> 8) & 0xFF]
            ) + s3[xl & 0xFF]
            xr ^= f & 0xFFFFFFFF
            xl, xr = xr, xl
        xl, xr = xr, xl
        xr ^= p[16]
        xl ^= p[17]
        return xl & 0xFFFFFFFF, xr & 0xFFFFFFFF

    def _cyclic_words(self, data: bytes):
        """Infinite cyclic 32-bit big-endian word stream over data."""
        i = 0
        n = len(data)
        while True:
            w = 0
            for _ in range(4):
                w = ((w << 8) | data[i % n]) & 0xFFFFFFFF
                i += 1
            yield w

    def expand_key(self, key: bytes, salt: bytes | None = None) -> None:
        """Standard Blowfish key expansion; with `salt`, the
        salted variant from EksBlowfishSetup (bcrypt paper fig. 2)."""
        words = self._cyclic_words(key if key else b"\x00")
        for i in range(18):
            self.p[i] = (self.p[i] ^ next(words)) & 0xFFFFFFFF
        if salt is None:
            l = r = 0
            for i in range(0, 18, 2):
                l, r = self.encrypt_block(l, r)
                self.p[i], self.p[i + 1] = l, r
            for box in self.s:
                for i in range(0, 256, 2):
                    l, r = self.encrypt_block(l, r)
                    box[i], box[i + 1] = l, r
        else:
            sw = self._cyclic_words(salt)
            l = r = 0
            for i in range(0, 18, 2):
                l ^= next(sw)
                r ^= next(sw)
                l, r = self.encrypt_block(l, r)
                self.p[i], self.p[i + 1] = l, r
            for box in self.s:
                for i in range(0, 256, 2):
                    l ^= next(sw)
                    r ^= next(sw)
                    l, r = self.encrypt_block(l, r)
                    box[i], box[i + 1] = l, r


# --- bcrypt base64 (./A-Za-z0-9 alphabet) ---------------------------

_B64 = "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
_B64_INV = {c: i for i, c in enumerate(_B64)}


def _b64_decode(s: str) -> bytes:
    bits = 0
    acc = 0
    out = bytearray()
    for c in s:
        if c not in _B64_INV:
            raise ValueError(f"invalid bcrypt base64 char {c!r}")
        acc = (acc << 6) | _B64_INV[c]
        bits += 6
        if bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)
    return bytes(out)


def _b64_encode(b: bytes) -> str:
    bits = 0
    acc = 0
    out = []
    for byte in b:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= 6:
            bits -= 6
            out.append(_B64[(acc >> bits) & 0x3F])
    if bits:
        out.append(_B64[(acc << (6 - bits)) & 0x3F])
    return "".join(out)


# --- bcrypt ---------------------------------------------------------

_MAGIC = b"OrpheanBeholderScryDoubt"


def _eks_setup(password: bytes, salt: bytes, cost: int) -> _Blowfish:
    bf = _Blowfish()
    bf.expand_key(password, salt)
    for _ in range(1 << cost):
        bf.expand_key(password)
        bf.expand_key(salt)
    return bf


def bcrypt_hash(password: str | bytes, salt_spec: str) -> str:
    """Compute the bcrypt hash for `password` under a `$2?$NN$<salt>`
    prefix (22 base64 salt chars); returns the full 60-char string."""
    if isinstance(password, str):
        password = password.encode("utf-8")
    parts = salt_spec.split("$")
    if len(parts) < 4 or parts[1] not in ("2a", "2b", "2x", "2y"):
        raise ValueError("invalid bcrypt hash format")
    version = parts[1]
    cost = int(parts[2])
    if not 4 <= cost <= 31:
        raise ValueError("bcrypt cost out of range")
    salt_b64 = parts[3][:22]
    salt = _b64_decode(salt_b64)[:16]
    if len(salt) != 16:
        raise ValueError("bcrypt salt must decode to 16 bytes")
    # $2a/$2b/$2y append a trailing NUL; the reference
    # (x/crypto/bcrypt) errors above 72 bytes rather than truncating,
    # and a 72-byte password legitimately uses a 73-byte cyclic key
    if len(password) > 72:
        raise ValueError("bcrypt: password longer than 72 bytes")
    key = password + b"\x00"
    bf = _eks_setup(key, salt, cost)
    words = [
        int.from_bytes(_MAGIC[i : i + 4], "big") for i in range(0, 24, 4)
    ]
    for _ in range(64):
        for j in range(0, 6, 2):
            words[j], words[j + 1] = bf.encrypt_block(
                words[j], words[j + 1]
            )
    ct = b"".join(w.to_bytes(4, "big") for w in words)[:23]
    return f"${version}${cost:02d}${salt_b64}{_b64_encode(ct)}"


def compare_bcrypt(password: str | bytes, hashed: str) -> bool:
    """CompareHashAndPassword semantics (bcrypt.go:49-56): True on
    match, False on mismatch; raises on malformed hashes."""
    expected = bcrypt_hash(password, hashed)
    return hmac.compare_digest(expected[-31:], hashed[-31:])
