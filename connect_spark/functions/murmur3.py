"""MurmurHash3 x86 32-bit and the Iceberg bucket transform.

Independent pure-Python implementation of the PUBLIC MurmurHash3
algorithm (Austin Appleby, public domain) plus the Iceberg spec's
bucket-transform value serialization (Iceberg Table Spec, Appendix B
"32-bit Hash Requirements"):

- int / long / date / time / timestamp / timestamptz hash as the
  64-bit little-endian representation of their widened long value
  (days since epoch for date, micros for time/timestamps),
- string hashes its UTF-8 bytes,
- binary / fixed hash raw bytes,
- decimal hashes the minimal two's-complement big-endian bytes of its
  unscaled value,
- uuid hashes its 16 big-endian bytes.

``bucket N`` partition value = ``(hash(v) & Integer.MAX_VALUE) % N``.

Reference parity: redpanda-data/connect consumes the same transform
through apache/iceberg-go (`internal/impl/iceberg/icebergx/
partition_key.go:238-241` parses ``bucket(n, col)``); this module
re-derives it from the public spec — the spec's own Appendix B test
vectors are pinned in tests/test_iceberg_partition_transforms.py.

Scale shape: the per-row hash runs as an Arrow-batched pandas_udf with
a numpy-vectorized kernel for the fixed 8-byte integer layouts (the
hot case — bucketing a high-cardinality int key at 100 TB) and a
per-row fallback only for variable-length inputs (strings/binary).
"""

from __future__ import annotations

import struct

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3_x86_32 over ``data`` → UNSIGNED 32-bit int."""
    h = seed & _M32
    n = len(data)
    nblocks = n >> 2
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i:4 * i + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    # tail
    tail = data[nblocks * 4:]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    # finalization
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def _signed32(u: int) -> int:
    return u - (1 << 32) if u >= (1 << 31) else u


def iceberg_hash_long(v: int) -> int:
    """Spec hash of an int/long/date/time/timestamp value (all widen
    to long; little-endian 8 bytes) → SIGNED 32-bit int."""
    return _signed32(murmur3_x86_32(struct.pack("<q", v)))


def iceberg_hash_bytes(b: bytes) -> int:
    """Spec hash of string (UTF-8) / binary / fixed bytes → signed."""
    return _signed32(murmur3_x86_32(b))


def iceberg_hash_decimal(unscaled: int) -> int:
    """Spec hash of a decimal: minimal big-endian two's-complement
    bytes of the unscaled value."""
    nbytes = max(1, (unscaled.bit_length() + 8) // 8)
    return _signed32(
        murmur3_x86_32(unscaled.to_bytes(nbytes, "big", signed=True)))


def iceberg_bucket(hash_signed: int, n: int) -> int:
    """(hash & Integer.MAX_VALUE) % N — the spec's bucket index."""
    return (hash_signed & 0x7FFFFFFF) % n


def bucket_long(v: int, n: int) -> int:
    return iceberg_bucket(iceberg_hash_long(v), n)


def bucket_bytes(b: bytes, n: int) -> int:
    return iceberg_bucket(iceberg_hash_bytes(b), n)


def murmur3_x86_32_longs_np(values, seed: int = 0):
    """numpy-vectorized MurmurHash3_x86_32 over an int64 array, each
    element hashed as its 8-byte little-endian layout (two 4-byte
    blocks) — bit-identical to
    ``murmur3_x86_32(struct.pack('<q', v))`` elementwise.  Returns an
    int32 (signed) array.

    All arithmetic runs in uint32 with C wraparound semantics, which
    numpy guarantees for unsigned dtypes.
    """
    import numpy as np

    # negative longs reinterpret as their two's-complement bit
    # pattern (a view, not a value cast — value casts of negative
    # ints to uint64 are deprecated in numpy)
    v = np.ascontiguousarray(values, dtype=np.int64).view(np.uint64)
    k1 = (v & np.uint64(_M32)).astype(np.uint32)
    k2 = (v >> np.uint64(32)).astype(np.uint32)
    h = np.full(v.shape, seed & _M32, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for k in (k1, k2):
            k = k * np.uint32(_C1)
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * np.uint32(_C2)
            h = h ^ k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h = h ^ np.uint32(8)  # len(data) == 8
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
    return h.view(np.int32)


def bucket_longs_np(values, n: int):
    """Vectorized iceberg bucket index over an int64 array."""
    import numpy as np

    h = murmur3_x86_32_longs_np(values).astype(np.int64)
    return ((h & 0x7FFFFFFF) % n).astype(np.int32)
