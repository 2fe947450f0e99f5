"""Shared zigzag-varint codec (bytes + index shape).

One implementation for every format that speaks zigzag varints —
Confluent protobuf message indexes (functions/schema_registry.py),
Kafka RecordBatch v2 records (functions/kafka_records.py); the
Avro binary codec keeps its stream-based variant internally."""

from __future__ import annotations


def zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(data: bytes, i: int) -> tuple[int, int]:
    """data[i:] → (value, next index)."""
    shift = acc = 0
    while True:
        b = data[i]
        i += 1
        acc |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
    return (acc >> 1) ^ -(acc & 1), i
