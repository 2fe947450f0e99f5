"""AMQP 0-9-1 frame codec over recorded sessions.

The reference's amqp_0_9 input consumes deliveries from an AMQP 0-9-1
broker (inputs/amqp_0_9.adoc — urls/queue/consumer_tag metadata).
This module independently implements the PUBLIC framing (AMQP 0-9-1
specification §2.3 / §4.2) so recorded broker→client byte streams
decode without a broker:

  frame:  type u8 | channel u16 | size u32 | payload[size] | 0xCE
  types:  1 method, 2 content header, 3 content body, 8 heartbeat

  method payload: class-id u16, method-id u16, arguments
    basic.deliver (60, 60): consumer-tag shortstr, delivery-tag u64,
      redelivered bit, exchange shortstr, routing-key shortstr
  content header: class-id u16, weight u16, body-size u64,
    property-flags u16, properties (shortstr/table/u8/u64 by flag —
    content-type, headers table, delivery-mode, priority, timestamp
    supported here)
  content body: raw chunk(s), concatenated until body-size is met

A delivery = basic.deliver method frame + content header + body
frames on the same channel.  All integers big-endian (network order).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Iterator

FRAME_METHOD = 1
FRAME_HEADER = 2
FRAME_BODY = 3
FRAME_HEARTBEAT = 8
FRAME_END = 0xCE

CLASS_BASIC = 60
METHOD_DELIVER = 60

# basic-properties flags (spec §4.2.6.1), high bit first
FLAG_CONTENT_TYPE = 1 << 15
FLAG_CONTENT_ENCODING = 1 << 14
FLAG_HEADERS = 1 << 13
FLAG_DELIVERY_MODE = 1 << 12
FLAG_PRIORITY = 1 << 11
FLAG_CORRELATION_ID = 1 << 10
FLAG_REPLY_TO = 1 << 9
FLAG_EXPIRATION = 1 << 8
FLAG_MESSAGE_ID = 1 << 7
FLAG_TIMESTAMP = 1 << 6
FLAG_TYPE = 1 << 5
FLAG_USER_ID = 1 << 4
FLAG_APP_ID = 1 << 3
FLAG_CLUSTER_ID = 1 << 2

# the COMPLETE basic-class property list in flag order: (flag, name,
# kind) where kind is shortstr | table | u8 | u64 — decoding walks
# this list so every set flag advances the cursor correctly
_BASIC_PROPS = (
    (FLAG_CONTENT_TYPE, "content_type", "shortstr"),
    (FLAG_CONTENT_ENCODING, "content_encoding", "shortstr"),
    (FLAG_HEADERS, "headers", "table"),
    (FLAG_DELIVERY_MODE, "delivery_mode", "u8"),
    (FLAG_PRIORITY, "priority", "u8"),
    (FLAG_CORRELATION_ID, "correlation_id", "shortstr"),
    (FLAG_REPLY_TO, "reply_to", "shortstr"),
    (FLAG_EXPIRATION, "expiration", "shortstr"),
    (FLAG_MESSAGE_ID, "message_id", "shortstr"),
    (FLAG_TIMESTAMP, "timestamp", "u64"),
    (FLAG_TYPE, "type", "shortstr"),
    (FLAG_USER_ID, "user_id", "shortstr"),
    (FLAG_APP_ID, "app_id", "shortstr"),
    (FLAG_CLUSTER_ID, "cluster_id", "shortstr"),
)


def _shortstr(s: str) -> bytes:
    raw = s.encode("utf-8")
    return bytes([len(raw)]) + raw


def _read_shortstr(data: bytes, i: int) -> tuple[str, int]:
    n = data[i]
    return data[i + 1:i + 1 + n].decode("utf-8"), i + 1 + n


def _longstr(raw: bytes) -> bytes:
    return struct.pack(">I", len(raw)) + raw


def _field_table(d: dict[str, Any]) -> bytes:
    body = bytearray()
    for k, v in d.items():
        body += _shortstr(k)
        if isinstance(v, bool):
            body += b"t" + bytes([int(v)])
        elif isinstance(v, int):
            body += b"l" + struct.pack(">q", v)
        elif isinstance(v, str):
            body += b"S" + _longstr(v.encode("utf-8"))
        else:
            raise ValueError(f"amqp: unsupported table value {v!r}")
    return _longstr(bytes(body))


def _read_field_table(data: bytes, i: int) -> tuple[dict, int]:
    (n,) = struct.unpack_from(">I", data, i)
    end = i + 4 + n
    i += 4
    out: dict[str, Any] = {}
    while i < end:
        k, i = _read_shortstr(data, i)
        tag = data[i:i + 1]
        i += 1
        if tag == b"t":
            out[k] = bool(data[i])
            i += 1
        elif tag == b"l":
            (out[k],) = struct.unpack_from(">q", data, i)
            i += 8
        elif tag == b"I":
            (out[k],) = struct.unpack_from(">i", data, i)
            i += 4
        elif tag == b"S":
            (m,) = struct.unpack_from(">I", data, i)
            out[k] = data[i + 4:i + 4 + m].decode("utf-8")
            i += 4 + m
        else:
            raise ValueError(f"amqp: unsupported table field {tag!r}")
    return out, end


@dataclass
class AmqpDelivery:
    consumer_tag: str
    delivery_tag: int
    redelivered: bool
    exchange: str
    routing_key: str
    body: bytes
    content_type: str | None = None
    headers: dict[str, Any] = field(default_factory=dict)
    delivery_mode: int | None = None
    priority: int | None = None
    timestamp: int | None = None
    correlation_id: str | None = None
    reply_to: str | None = None
    message_id: str | None = None


def decode_session(data: bytes) -> Iterator[AmqpDelivery]:
    """Recorded frames → deliveries (method + header + body
    reassembled per channel; heartbeats skipped)."""
    i = 0
    n = len(data)
    pending: dict[int, dict] = {}  # channel -> partial delivery
    while i + 8 <= n:
        ftype, channel, size = struct.unpack_from(">BHI", data, i)
        payload = data[i + 7:i + 7 + size]
        if data[i + 7 + size] != FRAME_END:
            raise ValueError("amqp: missing frame-end octet")
        i += 8 + size
        if ftype == FRAME_HEARTBEAT:
            continue
        if ftype == FRAME_METHOD:
            cls, mth = struct.unpack_from(">HH", payload, 0)
            if (cls, mth) != (CLASS_BASIC, METHOD_DELIVER):
                continue  # connection/channel plumbing methods
            k = 4
            ctag, k = _read_shortstr(payload, k)
            (dtag,) = struct.unpack_from(">Q", payload, k)
            k += 8
            redelivered = bool(payload[k])
            k += 1
            exchange, k = _read_shortstr(payload, k)
            rkey, k = _read_shortstr(payload, k)
            pending[channel] = {
                "m": (ctag, dtag, redelivered, exchange, rkey),
                "props": {}, "body": bytearray(), "need": None,
            }
        elif ftype == FRAME_HEADER:
            p = pending.get(channel)
            if p is None:
                raise ValueError("amqp: content header without deliver")
            _cls, _w, body_size, flags = struct.unpack_from(
                ">HHQH", payload, 0)
            k = 14
            props: dict[str, Any] = {}
            # walk EVERY flag in spec order so any combination of set
            # properties advances the cursor correctly
            for flag, name, kind in _BASIC_PROPS:
                if not flags & flag:
                    continue
                if kind == "shortstr":
                    props[name], k = _read_shortstr(payload, k)
                elif kind == "table":
                    props[name], k = _read_field_table(payload, k)
                elif kind == "u8":
                    props[name] = payload[k]
                    k += 1
                else:  # u64
                    (props[name],) = struct.unpack_from(
                        ">Q", payload, k)
                    k += 8
            p["props"] = props
            p["need"] = body_size
            if body_size == 0:
                yield _finish(pending.pop(channel))
        elif ftype == FRAME_BODY:
            p = pending.get(channel)
            if p is None or p["need"] is None:
                raise ValueError("amqp: body frame without header")
            p["body"] += payload
            if len(p["body"]) >= p["need"]:
                yield _finish(pending.pop(channel))
        else:
            raise ValueError(f"amqp: unknown frame type {ftype}")


def _finish(p: dict) -> AmqpDelivery:
    ctag, dtag, redelivered, exchange, rkey = p["m"]
    props = p["props"]
    return AmqpDelivery(
        consumer_tag=ctag, delivery_tag=dtag, redelivered=redelivered,
        exchange=exchange, routing_key=rkey, body=bytes(p["body"]),
        content_type=props.get("content_type"),
        headers=props.get("headers", {}),
        delivery_mode=props.get("delivery_mode"),
        priority=props.get("priority"),
        timestamp=props.get("timestamp"),
        correlation_id=props.get("correlation_id"),
        reply_to=props.get("reply_to"),
        message_id=props.get("message_id"),
    )


class AmqpFixtureWriter:
    """Encodes the same frame format for recorded-session fixtures."""

    def __init__(self, frame_max: int = 4096):
        self.buf = bytearray()
        self.frame_max = frame_max

    def _frame(self, ftype: int, channel: int, payload: bytes) -> None:
        self.buf += struct.pack(">BHI", ftype, channel, len(payload))
        self.buf += payload + bytes([FRAME_END])

    def heartbeat(self) -> None:
        self._frame(FRAME_HEARTBEAT, 0, b"")

    def deliver(self, body: bytes, routing_key: str,
                exchange: str = "", consumer_tag: str = "ctag-1",
                delivery_tag: int = 1, redelivered: bool = False,
                channel: int = 1, content_type: str | None = None,
                headers: dict | None = None,
                delivery_mode: int | None = None,
                timestamp: int | None = None,
                correlation_id: str | None = None,
                reply_to: str | None = None,
                message_id: str | None = None) -> None:
        method = (
            struct.pack(">HH", CLASS_BASIC, METHOD_DELIVER)
            + _shortstr(consumer_tag)
            + struct.pack(">Q", delivery_tag)
            + bytes([int(redelivered)])
            + _shortstr(exchange) + _shortstr(routing_key)
        )
        self._frame(FRAME_METHOD, channel, method)
        flags = 0
        props = b""
        if content_type is not None:
            flags |= FLAG_CONTENT_TYPE
            props += _shortstr(content_type)
        if headers:
            flags |= FLAG_HEADERS
            props += _field_table(headers)
        if delivery_mode is not None:
            flags |= FLAG_DELIVERY_MODE
            props += bytes([delivery_mode])
        if correlation_id is not None:
            flags |= FLAG_CORRELATION_ID
            props += _shortstr(correlation_id)
        if reply_to is not None:
            flags |= FLAG_REPLY_TO
            props += _shortstr(reply_to)
        if message_id is not None:
            flags |= FLAG_MESSAGE_ID
            props += _shortstr(message_id)
        if timestamp is not None:
            flags |= FLAG_TIMESTAMP
            props += struct.pack(">Q", timestamp)
        header = struct.pack(
            ">HHQH", CLASS_BASIC, 0, len(body), flags) + props
        self._frame(FRAME_HEADER, channel, header)
        # zero-size body: the header alone completes the delivery
        for j in range(0, len(body), self.frame_max):
            self._frame(FRAME_BODY, channel,
                        body[j:j + self.frame_max])

    def getvalue(self) -> bytes:
        return bytes(self.buf)
