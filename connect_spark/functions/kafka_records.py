"""Kafka RecordBatch v2 (magic 2) wire/log-segment codec.

The reference's entire Kafka family (kafka, kafka_franz, redpanda_*,
the redpanda_migrator) moves this exact byte format — it is both the
Produce/Fetch wire payload and the broker's on-disk .log segment
format (public Kafka protocol documentation, "Record Batch"; KIP-98).
This module is an independent pure-Python implementation so recorded
log segments / fetched batches decode (and batches encode) without a
broker or client library — the same recorded-bytes depth contract as
sources/pgoutput.py and sources/binlog.py.

Layout (big-endian, as on the wire):

  RecordBatch:
    baseOffset           int64
    batchLength          int32   (bytes after this field)
    partitionLeaderEpoch int32
    magic                int8    (= 2)
    crc                  uint32  (CRC32C over attributes..end)
    attributes           int16   (bits 0-2 codec: 0 none / 1 gzip /
                                  2 snappy / 3 lz4 / 4 zstd; bit 3
                                  timestampType; bit 4 transactional;
                                  bit 5 control)
    lastOffsetDelta      int32
    baseTimestamp        int64
    maxTimestamp         int64
    producerId           int64
    producerEpoch        int16
    baseSequence         int32
    recordCount          int32
    records              (compressed per attributes)

  Record (all varints ZIGZAG):
    length attributes(int8) timestampDelta offsetDelta
    keyLen key valueLen value headerCount
    [headerKeyLen headerKey headerValLen headerVal]*

CRC32C is the Castagnoli polynomial (reflected 0x82F63B78),
table-driven. Compression: gzip via zlib; snappy + lz4(frame) via the
repo's pure-Python codecs (functions/{snappy,lz4}_codec.py — the
framings Kafka v2 uses); zstd via pyarrow's bundled libzstd
(functions/zstd_codec.py, RFC 8878 frame-header size parse) — all
five Kafka codecs are real.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from typing import Iterator

_CRC32C_TABLE: list[int] = []


def _crc32c_table() -> list[int]:
    global _CRC32C_TABLE
    if not _CRC32C_TABLE:
        poly = 0x82F63B78
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    tbl = _crc32c_table()
    c = 0xFFFFFFFF
    for b in data:
        c = tbl[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


from connect_spark.functions.varints import (
    zigzag_decode as _zz_dec,
    zigzag_encode as _zz_enc,
)


CODEC_NONE = 0
CODEC_GZIP = 1
CODEC_SNAPPY = 2
CODEC_LZ4 = 3
CODEC_ZSTD = 4


def _compress(data: bytes, codec: int) -> bytes:
    if codec == CODEC_NONE:
        return data
    if codec == CODEC_GZIP:
        # real gzip framing (magic 1f 8b) — a Java GZIPInputStream
        # consumer rejects bare zlib streams
        import gzip as _gzip

        return _gzip.compress(data, 6)
    if codec == CODEC_SNAPPY:
        from connect_spark.functions.snappy_codec import compress

        return compress(data)
    if codec == CODEC_LZ4:
        from connect_spark.functions.lz4_codec import compress

        return compress(data)
    if codec == CODEC_ZSTD:
        from connect_spark.functions.zstd_codec import compress

        return compress(data)
    raise ValueError(f"kafka: unsupported compression codec {codec}")


def _decompress(data: bytes, codec: int) -> bytes:
    if codec == CODEC_NONE:
        return data
    if codec == CODEC_GZIP:
        return zlib.decompress(data, zlib.MAX_WBITS | 32)
    if codec == CODEC_SNAPPY:
        from connect_spark.functions.snappy_codec import decompress

        return decompress(data)
    if codec == CODEC_LZ4:
        from connect_spark.functions.lz4_codec import decompress

        return decompress(data)
    if codec == CODEC_ZSTD:
        from connect_spark.functions.zstd_codec import decompress

        return decompress(data)
    raise ValueError(f"kafka: unknown compression codec {codec}")


@dataclass
class KafkaRecord:
    offset: int
    timestamp_ms: int
    key: bytes | None
    value: bytes | None
    headers: list[tuple[str, bytes]] = field(default_factory=list)


def _encode_record(rec: KafkaRecord, base_offset: int,
                   base_ts: int) -> bytes:
    body = bytearray()
    body += b"\x00"  # record attributes (unused)
    body += _zz_enc(rec.timestamp_ms - base_ts)
    body += _zz_enc(rec.offset - base_offset)
    if rec.key is None:
        body += _zz_enc(-1)
    else:
        body += _zz_enc(len(rec.key)) + rec.key
    if rec.value is None:
        body += _zz_enc(-1)
    else:
        body += _zz_enc(len(rec.value)) + rec.value
    body += _zz_enc(len(rec.headers))
    for hk, hv in rec.headers:
        kb = hk.encode("utf-8")
        body += _zz_enc(len(kb)) + kb
        if hv is None:
            body += _zz_enc(-1)
        else:
            body += _zz_enc(len(hv)) + hv
    return _zz_enc(len(body)) + bytes(body)


def _decode_record(data: bytes, i: int, base_offset: int,
                   base_ts: int) -> tuple[KafkaRecord, int]:
    length, i = _zz_dec(data, i)
    end = i + length
    i += 1  # record attributes
    ts_delta, i = _zz_dec(data, i)
    off_delta, i = _zz_dec(data, i)
    klen, i = _zz_dec(data, i)
    key = None
    if klen >= 0:
        key = data[i:i + klen]
        i += klen
    vlen, i = _zz_dec(data, i)
    value = None
    if vlen >= 0:
        value = data[i:i + vlen]
        i += vlen
    nh, i = _zz_dec(data, i)
    headers = []
    for _ in range(nh):
        hkl, i = _zz_dec(data, i)
        hk = data[i:i + hkl].decode("utf-8")
        i += hkl
        hvl, i = _zz_dec(data, i)
        hv = None
        if hvl >= 0:
            hv = data[i:i + hvl]
            i += hvl
        headers.append((hk, hv))
    if i != end:
        raise ValueError("kafka: record length mismatch")
    return KafkaRecord(base_offset + off_delta, base_ts + ts_delta,
                       key, value, headers), i


def encode_batch(records: list[KafkaRecord], base_offset: int = 0,
                 codec: int = CODEC_NONE, producer_id: int = -1,
                 transactional: bool = False) -> bytes:
    """records → one RecordBatch v2 (CRC32C stamped)."""
    if not records:
        raise ValueError("kafka: empty batch")
    base_ts = min(r.timestamp_ms for r in records)
    max_ts = max(r.timestamp_ms for r in records)
    payload = b"".join(
        _encode_record(r, base_offset, base_ts) for r in records
    )
    payload = _compress(payload, codec)
    attributes = codec | (0x10 if transactional else 0)
    last_delta = max(r.offset for r in records) - base_offset
    after_crc = (
        struct.pack(">hiqqqhii", attributes, last_delta, base_ts,
                    max_ts, producer_id, -1, -1, len(records))
        + payload
    )
    crc = crc32c(after_crc)
    body = (
        struct.pack(">iB", 0, 2)  # partitionLeaderEpoch, magic
        + struct.pack(">I", crc)
        + after_crc
    )
    return struct.pack(">qi", base_offset, len(body)) + body


def decode_batch(data: bytes, i: int = 0,
                 verify_crc: bool = True) -> tuple[dict, int]:
    """One RecordBatch at offset i → (batch dict, next offset).
    Batch dict: base_offset, attributes, codec, control, records."""
    base_offset, batch_len = struct.unpack_from(">qi", data, i)
    body = data[i + 12:i + 12 + batch_len]
    nxt = i + 12 + batch_len
    _leader_epoch, magic = struct.unpack_from(">iB", body, 0)
    if magic != 2:
        raise ValueError(
            f"kafka: unsupported magic {magic} (only RecordBatch v2)"
        )
    (crc,) = struct.unpack_from(">I", body, 5)
    after_crc = body[9:]
    if verify_crc and crc32c(after_crc) != crc:
        raise ValueError("kafka: CRC32C mismatch (corrupt batch)")
    (attributes, last_delta, base_ts, _max_ts, producer_id,
     _producer_epoch, _base_seq, n) = struct.unpack_from(
        ">hiqqqhii", after_crc, 0)
    codec = attributes & 0x07
    control = bool(attributes & 0x20)
    payload = _decompress(after_crc[40:], codec)
    records = []
    j = 0
    for _ in range(n):
        rec, j = _decode_record(payload, j, base_offset, base_ts)
        records.append(rec)
    return {
        "base_offset": base_offset,
        "attributes": attributes,
        "codec": codec,
        "control": control,
        "producer_id": producer_id,
        "last_offset_delta": last_delta,
        "records": records,
    }, nxt


def decode_segment(data: bytes, skip_control: bool = True,
                   verify_crc: bool = True) -> Iterator[KafkaRecord]:
    """A .log segment (concatenated RecordBatches — the on-disk and
    Fetch-response layout) → records in offset order.  Control batches
    (transaction markers) are skipped by default, as consumers do.
    This is read_uncommitted: aborted-transaction records ARE yielded;
    use `decode_segment_read_committed` for read_committed."""
    i = 0
    n = len(data)
    while i + 12 <= n:
        batch, i = decode_batch(data, i, verify_crc=verify_crc)
        if batch["control"] and skip_control:
            continue
        yield from batch["records"]


# --- transactions (KIP-98: control records + read_committed) ---

CONTROL_ABORT = 0
CONTROL_COMMIT = 1


def encode_control_batch(base_offset: int, producer_id: int,
                         commit: bool, timestamp_ms: int = 0,
                         coordinator_epoch: int = 0) -> bytes:
    """One transaction-marker control batch (KIP-98).  The single
    control record's key is version int16 (0) + type int16 (0 abort /
    1 commit); the value is version int16 + coordinator-epoch int32.
    Batch attributes set both the transactional (bit 4) and control
    (bit 5) flags."""
    key = struct.pack(">hh", 0, CONTROL_COMMIT if commit
                      else CONTROL_ABORT)
    value = struct.pack(">hi", 0, coordinator_epoch)
    rec = KafkaRecord(offset=base_offset, timestamp_ms=timestamp_ms,
                      key=key, value=value)
    payload = _encode_record(rec, base_offset, timestamp_ms)
    attributes = 0x10 | 0x20  # transactional + control
    after_crc = (
        struct.pack(">hiqqqhii", attributes, 0, timestamp_ms,
                    timestamp_ms, producer_id, 0, -1, 1)
        + payload
    )
    crc = crc32c(after_crc)
    body = struct.pack(">iB", 0, 2) + struct.pack(">I", crc) + after_crc
    return struct.pack(">qi", base_offset, len(body)) + body


def parse_control_record(rec: KafkaRecord) -> int:
    """Control-record key → marker type (CONTROL_ABORT/COMMIT)."""
    if rec.key is None or len(rec.key) < 4:
        raise ValueError("kafka: malformed control record key")
    version, ctype = struct.unpack_from(">hh", rec.key, 0)
    if version != 0 or ctype not in (CONTROL_ABORT, CONTROL_COMMIT):
        raise ValueError(
            f"kafka: unknown control record v{version} type {ctype}")
    return ctype


def decode_segment_read_committed(
    data: bytes, verify_crc: bool = True
) -> list[KafkaRecord]:
    """read_committed consumption of a .log segment (the reference's
    franz-go reader honors `isolation_level: read_committed` on every
    kafka input): transactional batches buffer per producerId until
    that producer's control marker arrives — COMMIT releases them,
    ABORT drops them (exactly the records of that producer since its
    previous marker).  Records of a transaction still open at the end
    of the segment sit past the last stable offset and are withheld.
    Returns committed records in offset order."""
    committed: list[KafkaRecord] = []
    pending: dict[int, list[KafkaRecord]] = {}
    i = 0
    n = len(data)
    while i + 12 <= n:
        batch, i = decode_batch(data, i, verify_crc=verify_crc)
        pid = batch["producer_id"]
        transactional = bool(batch["attributes"] & 0x10)
        if batch["control"]:
            marker = parse_control_record(batch["records"][0])
            buffered = pending.pop(pid, [])
            if marker == CONTROL_COMMIT:
                committed.extend(buffered)
            continue
        if transactional and pid >= 0:
            pending.setdefault(pid, []).extend(batch["records"])
        else:
            committed.extend(batch["records"])
    committed.sort(key=lambda r: r.offset)
    return committed
