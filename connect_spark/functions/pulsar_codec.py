"""Pulsar binary protocol codec over recorded sessions.

The reference's pulsar input/output (internal/impl/pulsar/,
inputs/pulsar.adoc) consumes from Pulsar brokers over the PUBLIC
Pulsar binary protocol (pulsar.apache.org "Binary protocol
specification" + the PulsarApi.proto shipped with Apache Pulsar):

  simple command frame:   [totalSize u32][commandSize u32][BaseCommand]
  payload command frame:  ... BaseCommand ... [magic 0x0e01][checksum
                          u32][metadataSize u32][MessageMetadata]
                          [payload]

The checksum is CRC32C over every byte AFTER the checksum field
(metadataSize + metadata + payload) — the same Castagnoli CRC Kafka
batches use (functions/kafka_records.py::crc32c).  BaseCommand is a
protobuf whose field numbers mirror its Type enum values (CONNECT=2
… MESSAGE=9); MessageMetadata carries producer_name(1),
sequence_id(2), publish_time(3), properties(4: KeyValue key=1
value=2), partition_key(6).  Command/metadata protobufs ride the
repo's pure-Python wire codec (functions/protobuf_codec.py) with
hand-written dict descriptors of the public .proto — no generated
code, no client library.
"""

from __future__ import annotations

import struct
from typing import Iterator

from connect_spark.functions.kafka_records import crc32c
from connect_spark.functions.protobuf_codec import decode as pb_decode
from connect_spark.functions.protobuf_codec import encode as pb_encode

_MAGIC = b"\x0e\x01"

# BaseCommand.Type values (PulsarApi.proto; field numbers match)
TYPE_CONNECT = 2
TYPE_CONNECTED = 3
TYPE_SUBSCRIBE = 4
TYPE_MESSAGE = 9
TYPE_FLOW = 11
TYPE_PING = 18
TYPE_PONG = 19

MESSAGE_ID_DESC = {
    "fields": {
        1: {"name": "ledger_id", "type": "uint64"},
        2: {"name": "entry_id", "type": "uint64"},
        3: {"name": "partition", "type": "int32"},
        4: {"name": "batch_index", "type": "int32"},
    }
}

COMMAND_MESSAGE_DESC = {
    "fields": {
        1: {"name": "consumer_id", "type": "uint64"},
        2: {"name": "message_id", "type": "message",
            "message": MESSAGE_ID_DESC},
        3: {"name": "redelivery_count", "type": "uint32"},
    }
}

BASE_COMMAND_DESC = {
    "fields": {
        1: {"name": "type", "type": "enum"},
        9: {"name": "message", "type": "message",
            "message": COMMAND_MESSAGE_DESC},
    }
}

KEY_VALUE_DESC = {
    "fields": {
        1: {"name": "key", "type": "string"},
        2: {"name": "value", "type": "string"},
    }
}

MESSAGE_METADATA_DESC = {
    "fields": {
        1: {"name": "producer_name", "type": "string"},
        2: {"name": "sequence_id", "type": "uint64"},
        3: {"name": "publish_time", "type": "uint64"},
        4: {"name": "properties", "type": "message",
            "message": KEY_VALUE_DESC, "repeated": True},
        6: {"name": "partition_key", "type": "string"},
    }
}


def encode_simple_command(cmd: dict) -> bytes:
    raw = pb_encode(cmd, BASE_COMMAND_DESC)
    return struct.pack(">II", 4 + len(raw), len(raw)) + raw


def encode_message_frame(
    *,
    consumer_id: int,
    ledger_id: int,
    entry_id: int,
    producer_name: str,
    sequence_id: int,
    publish_time_ms: int,
    payload: bytes,
    partition_key: str | None = None,
    properties: dict[str, str] | None = None,
    corrupt_checksum: bool = False,
) -> bytes:
    """One MESSAGE payload-command frame (broker → consumer)."""
    cmd = pb_encode(
        {"type": TYPE_MESSAGE,
         "message": {"consumer_id": consumer_id,
                     "message_id": {"ledger_id": ledger_id,
                                    "entry_id": entry_id}}},
        BASE_COMMAND_DESC)
    meta: dict = {"producer_name": producer_name,
                  "sequence_id": sequence_id,
                  "publish_time": publish_time_ms}
    if partition_key is not None:
        meta["partition_key"] = partition_key
    if properties:
        meta["properties"] = [{"key": k, "value": v}
                              for k, v in properties.items()]
    meta_raw = pb_encode(meta, MESSAGE_METADATA_DESC)
    checked = struct.pack(">I", len(meta_raw)) + meta_raw + payload
    crc = crc32c(checked)
    if corrupt_checksum:
        crc ^= 0xDEAD
    body = (struct.pack(">I", len(cmd)) + cmd + _MAGIC
            + struct.pack(">I", crc) + checked)
    return struct.pack(">I", len(body)) + body


def decode_stream(data: bytes) -> Iterator[dict]:
    """Recorded broker→consumer stream → MESSAGE dicts (other
    commands — connected/ping/pong/flow-ack plumbing — are skipped).
    Yields consumer_id, ledger_id, entry_id, producer_name,
    sequence_id, publish_time_ms, partition_key, properties,
    payload.  CRC32C verified when the frame carries the 0x0e01
    checksum magic."""
    i = 0
    n = len(data)
    while i < n:
        if i + 8 > n:
            raise ValueError("pulsar: truncated frame header")
        total, cmd_size = struct.unpack_from(">II", data, i)
        if total < 4 + cmd_size or i + 4 + total > n:
            raise ValueError("pulsar: truncated frame")
        frame_end = i + 4 + total
        j = i + 8
        cmd = pb_decode(data[j:j + cmd_size], BASE_COMMAND_DESC)
        j += cmd_size
        i = frame_end
        if cmd.get("type") != TYPE_MESSAGE:
            continue
        rest = data[j:frame_end]
        if rest[:2] == _MAGIC:
            (crc,) = struct.unpack_from(">I", rest, 2)
            checked = rest[6:]
            if crc32c(checked) != crc:
                raise ValueError("pulsar: CRC32C mismatch")
            rest = checked
        (meta_size,) = struct.unpack_from(">I", rest, 0)
        meta = pb_decode(rest[4:4 + meta_size], MESSAGE_METADATA_DESC)
        payload = rest[4 + meta_size:]
        msg = cmd.get("message") or {}
        mid = msg.get("message_id") or {}
        yield {
            "consumer_id": msg.get("consumer_id", 0),
            "ledger_id": mid.get("ledger_id", 0),
            "entry_id": mid.get("entry_id", 0),
            "producer_name": meta.get("producer_name", ""),
            "sequence_id": meta.get("sequence_id", 0),
            "publish_time_ms": meta.get("publish_time", 0),
            "partition_key": meta.get("partition_key") or None,
            "properties": {
                kv["key"]: kv["value"]
                for kv in meta.get("properties", [])},
            "payload": payload,
        }
