"""AMQP 1.0 wire codec over recorded sessions.

The reference's amqp_1 input/output (internal/impl/amqp1/,
docs inputs/amqp_1.adoc) consumes messages from AMQP 1.0 brokers
(Azure Service Bus, ActiveMQ, Qpid).  This module independently
implements the PUBLIC protocol (OASIS AMQP v1.0 / ISO/IEC 19464):

Part 1 (types): every value is prefixed by a constructor octet —
fixed-width primitives (null 0x40, booleans, u/ints in 8/16/32/64-bit
and "small" compact forms, float/double, timestamp 0x83, uuid 0x98),
variable-width (binary 0xA0/0xB0, utf8 string 0xA1/0xB1, symbol
0xA3/0xB3), compounds (list0 0x45, list8 0xC0, list32 0xD0, map8
0xC1, map32 0xD1) and described types (constructor 0x00 + descriptor
value + described value).

Part 2 (transport): frame = size u32 | doff u8 | type u8 (0x00 AMQP) |
channel u16 | extended-header | performative (a described list) |
payload.  The transfer performative (descriptor 0x14) carries message
bytes; its `more` field splits one message across several transfer
frames — reassembly concatenates payloads per (channel, handle) until
a frame with more=false.

Part 3 (messaging): the payload is a bare message — a sequence of
described sections: header 0x70, delivery-annotations 0x71,
message-annotations 0x72, properties 0x73 (a list: message-id, user-id,
to, subject, reply-to, correlation-id, content-type, ...),
application-properties 0x74 (a map), data 0x75 (binary),
amqp-sequence 0x76, amqp-value 0x77, footer 0x78.

All integers are network byte order.  The writer emits the same
format for fixtures so decode is testable without a broker (the
only permanently sandbox-gated piece is a live TCP SASL handshake).
"""

from __future__ import annotations

import struct
import uuid as _uuid
from dataclasses import dataclass, field
from typing import Any, Iterator

# constructor octets (OASIS AMQP 1.0 Part 1 §1.6)
_NULL = 0x40
_TRUE = 0x41
_FALSE = 0x42
_BOOL = 0x56
_UBYTE = 0x50
_USHORT = 0x60
_UINT = 0x70
_SMALLUINT = 0x52
_UINT0 = 0x43
_ULONG = 0x80
_SMALLULONG = 0x53
_ULONG0 = 0x44
_BYTE = 0x51
_SHORT = 0x61
_INT = 0x71
_SMALLINT = 0x54
_LONG = 0x81
_SMALLLONG = 0x55
_FLOAT = 0x72
_DOUBLE = 0x82
_TIMESTAMP = 0x83
_UUID = 0x98
_VBIN8 = 0xA0
_VBIN32 = 0xB0
_STR8 = 0xA1
_STR32 = 0xB1
_SYM8 = 0xA3
_SYM32 = 0xB3
_LIST0 = 0x45
_LIST8 = 0xC0
_LIST32 = 0xD0
_MAP8 = 0xC1
_MAP32 = 0xD1
_DESCRIBED = 0x00

# section / performative descriptors (Part 2 §2.7, Part 3 §3.2)
DESC_OPEN = 0x10
DESC_BEGIN = 0x11
DESC_ATTACH = 0x12
DESC_FLOW = 0x13
DESC_TRANSFER = 0x14
DESC_DISPOSITION = 0x15
DESC_DETACH = 0x16
DESC_END = 0x17
DESC_CLOSE = 0x18
SEC_HEADER = 0x70
SEC_DELIVERY_ANNOTATIONS = 0x71
SEC_MESSAGE_ANNOTATIONS = 0x72
SEC_PROPERTIES = 0x73
SEC_APPLICATION_PROPERTIES = 0x74
SEC_DATA = 0x75
SEC_AMQP_SEQUENCE = 0x76
SEC_AMQP_VALUE = 0x77
SEC_FOOTER = 0x78

FRAME_TYPE_AMQP = 0x00


class Symbol(str):
    """AMQP symbol (ASCII token) — distinct type so encode/decode
    roundtrips symbols as symbols, not strings."""


class _ULongDescriptor(int):
    """Marks an int as a descriptor code so it encodes as ulong (the
    compact numeric descriptor form brokers emit)."""


def encode_descriptor(code: int) -> _ULongDescriptor:
    return _ULongDescriptor(code)


@dataclass
class Described:
    descriptor: Any
    value: Any


# --- encoding ---


def encode_value(v: Any) -> bytes:
    if v is None:
        return bytes([_NULL])
    if isinstance(v, _ULongDescriptor):
        return encode_ulong(int(v))
    if isinstance(v, Described):
        return bytes([_DESCRIBED]) + encode_value(v.descriptor) \
            + encode_value(v.value)
    if isinstance(v, bool):
        return bytes([_TRUE if v else _FALSE])
    if isinstance(v, Symbol):
        raw = v.encode("ascii")
        if len(raw) < 256:
            return bytes([_SYM8, len(raw)]) + raw
        return bytes([_SYM32]) + struct.pack(">I", len(raw)) + raw
    if isinstance(v, str):
        raw = v.encode("utf-8")
        if len(raw) < 256:
            return bytes([_STR8, len(raw)]) + raw
        return bytes([_STR32]) + struct.pack(">I", len(raw)) + raw
    if isinstance(v, (bytes, bytearray)):
        raw = bytes(v)
        if len(raw) < 256:
            return bytes([_VBIN8, len(raw)]) + raw
        return bytes([_VBIN32]) + struct.pack(">I", len(raw)) + raw
    if isinstance(v, _uuid.UUID):
        return bytes([_UUID]) + v.bytes
    if isinstance(v, float):
        return bytes([_DOUBLE]) + struct.pack(">d", v)
    if isinstance(v, int):
        # signed long family (the common app-property integer); the
        # explicit wrappers below pick unsigned forms
        if 0 <= v <= 255:
            return bytes([_SMALLULONG, v])
        if -128 <= v <= 127:
            return bytes([_SMALLLONG, v & 0xFF])
        if -(1 << 31) <= v < (1 << 31):
            return bytes([_INT]) + struct.pack(">i", v)
        return bytes([_LONG]) + struct.pack(">q", v)
    if isinstance(v, Timestamp):
        return bytes([_TIMESTAMP]) + struct.pack(">q", v.millis)
    if isinstance(v, (list, tuple)):
        items = b"".join(encode_value(x) for x in v)
        count = len(v)
        if count == 0:
            return bytes([_LIST0])
        if len(items) + 1 < 256 and count < 256:
            return bytes([_LIST8, len(items) + 1, count]) + items
        return bytes([_LIST32]) + struct.pack(
            ">II", len(items) + 4, count) + items
    if isinstance(v, dict):
        items = b"".join(
            encode_value(k) + encode_value(x) for k, x in v.items())
        count = 2 * len(v)
        if len(items) + 1 < 256 and count < 256:
            return bytes([_MAP8, len(items) + 1, count]) + items
        return bytes([_MAP32]) + struct.pack(
            ">II", len(items) + 4, count) + items
    raise TypeError(f"amqp1: cannot encode {type(v).__name__}")


@dataclass(frozen=True)
class Timestamp:
    """AMQP timestamp: ms since the unix epoch (constructor 0x83)."""

    millis: int


def encode_uint(v: int) -> bytes:
    if v == 0:
        return bytes([_UINT0])
    if v < 256:
        return bytes([_SMALLUINT, v])
    return bytes([_UINT]) + struct.pack(">I", v)


def encode_ulong(v: int) -> bytes:
    if v == 0:
        return bytes([_ULONG0])
    if v < 256:
        return bytes([_SMALLULONG, v])
    return bytes([_ULONG]) + struct.pack(">Q", v)


# --- decoding ---


def decode_value(data: bytes, i: int = 0) -> tuple[Any, int]:
    """Decode one constructor-prefixed value; returns (value, next)."""
    c = data[i]
    i += 1
    if c == _NULL:
        return None, i
    if c == _TRUE:
        return True, i
    if c == _FALSE:
        return False, i
    if c == _BOOL:
        return data[i] != 0, i + 1
    if c == _UBYTE:
        return data[i], i + 1
    if c == _USHORT:
        return struct.unpack_from(">H", data, i)[0], i + 2
    if c == _UINT:
        return struct.unpack_from(">I", data, i)[0], i + 4
    if c == _SMALLUINT:
        return data[i], i + 1
    if c == _UINT0 or c == _ULONG0:
        return 0, i
    if c == _ULONG:
        return struct.unpack_from(">Q", data, i)[0], i + 8
    if c == _SMALLULONG:
        return data[i], i + 1
    if c == _BYTE:
        return struct.unpack_from(">b", data, i)[0], i + 1
    if c == _SHORT:
        return struct.unpack_from(">h", data, i)[0], i + 2
    if c == _INT:
        return struct.unpack_from(">i", data, i)[0], i + 4
    if c == _SMALLINT:
        return struct.unpack_from(">b", data, i)[0], i + 1
    if c == _LONG:
        return struct.unpack_from(">q", data, i)[0], i + 8
    if c == _SMALLLONG:
        return struct.unpack_from(">b", data, i)[0], i + 1
    if c == _FLOAT:
        return struct.unpack_from(">f", data, i)[0], i + 4
    if c == _DOUBLE:
        return struct.unpack_from(">d", data, i)[0], i + 8
    if c == _TIMESTAMP:
        return Timestamp(struct.unpack_from(">q", data, i)[0]), i + 8
    if c == _UUID:
        return _uuid.UUID(bytes=data[i:i + 16]), i + 16
    if c in (_VBIN8, _STR8, _SYM8):
        n = data[i]
        raw = data[i + 1:i + 1 + n]
        if len(raw) != n:
            raise ValueError("amqp1: truncated variable-width value")
        i += 1 + n
    elif c in (_VBIN32, _STR32, _SYM32):
        n = struct.unpack_from(">I", data, i)[0]
        raw = data[i + 4:i + 4 + n]
        if len(raw) != n:
            raise ValueError("amqp1: truncated variable-width value")
        i += 4 + n
    else:
        raw = None
    if raw is not None:
        if c in (_VBIN8, _VBIN32):
            return bytes(raw), i
        if c in (_STR8, _STR32):
            return raw.decode("utf-8"), i
        return Symbol(raw.decode("ascii")), i
    if c == _LIST0:
        return [], i
    if c in (_LIST8, _LIST32, _MAP8, _MAP32):
        if c in (_LIST8, _MAP8):
            size, count = data[i], data[i + 1]
            j = i + 2
            end = i + 1 + size
        else:
            size, count = struct.unpack_from(">II", data, i)
            j = i + 8
            end = i + 4 + size
        items = []
        for _ in range(count):
            v, j = decode_value(data, j)
            items.append(v)
        if j != end:
            raise ValueError("amqp1: compound size mismatch")
        if c in (_MAP8, _MAP32):
            if count % 2:
                raise ValueError("amqp1: map with odd item count")
            return dict(zip(items[::2], items[1::2])), j
        return items, j
    if c == _DESCRIBED:
        desc, i = decode_value(data, i)
        val, i = decode_value(data, i)
        return Described(desc, val), i
    raise ValueError(f"amqp1: unknown constructor 0x{c:02x}")


# --- messages (Part 3) ---


@dataclass
class Amqp1Message:
    """A decoded bare message plus its transfer context."""

    channel: int
    handle: int
    delivery_id: int
    delivery_tag: bytes
    settled: bool
    header: list = field(default_factory=list)
    properties: list = field(default_factory=list)
    message_annotations: dict = field(default_factory=dict)
    application_properties: dict = field(default_factory=dict)
    data: bytes = b""
    value: Any = None

    @property
    def message_id(self):
        return self.properties[0] if self.properties else None

    @property
    def to(self):
        return self.properties[2] if len(self.properties) > 2 else None

    @property
    def subject(self):
        return self.properties[3] if len(self.properties) > 3 else None

    @property
    def content_type(self):
        p = self.properties
        return p[6] if len(p) > 6 else None


def encode_message(
    *,
    message_id: Any = None,
    to: str | None = None,
    subject: str | None = None,
    content_type: str | None = None,
    application_properties: dict | None = None,
    data: bytes | None = None,
    value: Any = None,
) -> bytes:
    """Encode a bare message: properties + application-properties +
    one body section (data or amqp-value)."""
    props = [message_id, None, to, subject, None, None,
             Symbol(content_type) if content_type else None]
    while props and props[-1] is None:
        props.pop()
    out = bytearray()
    if props:
        out += encode_value(
            Described(encode_descriptor(SEC_PROPERTIES), props))
    if application_properties:
        out += encode_value(
            Described(encode_descriptor(SEC_APPLICATION_PROPERTIES),
                      application_properties))
    if data is not None:
        out += encode_value(
            Described(encode_descriptor(SEC_DATA), data))
    elif value is not None:
        out += encode_value(
            Described(encode_descriptor(SEC_AMQP_VALUE), value))
    return bytes(out)


def _descr_code(d: Any) -> int | None:
    if isinstance(d, int):
        return int(d)
    return None


def decode_message_sections(payload: bytes) -> dict[str, Any]:
    """Bare-message bytes → dict of sections."""
    out: dict[str, Any] = {
        "header": [], "properties": [], "message_annotations": {},
        "application_properties": {}, "data": b"", "value": None,
    }
    i = 0
    while i < len(payload):
        v, i = decode_value(payload, i)
        if not isinstance(v, Described):
            raise ValueError("amqp1: message section not described")
        code = _descr_code(v.descriptor)
        if code == SEC_HEADER:
            out["header"] = v.value
        elif code == SEC_PROPERTIES:
            out["properties"] = v.value
        elif code == SEC_MESSAGE_ANNOTATIONS:
            out["message_annotations"] = v.value
        elif code == SEC_APPLICATION_PROPERTIES:
            out["application_properties"] = v.value
        elif code == SEC_DATA:
            out["data"] += v.value
        elif code == SEC_AMQP_VALUE:
            out["value"] = v.value
        elif code in (SEC_DELIVERY_ANNOTATIONS, SEC_AMQP_SEQUENCE,
                      SEC_FOOTER):
            pass
        else:
            raise ValueError(f"amqp1: unknown section {code}")
    return out


# --- transport (Part 2) ---


def encode_frame(channel: int, performative: bytes,
                 payload: bytes = b"") -> bytes:
    body = performative + payload
    size = 8 + len(body)
    return struct.pack(">IBBH", size, 2, FRAME_TYPE_AMQP, channel) + body


def encode_transfer(
    channel: int,
    handle: int,
    delivery_id: int,
    delivery_tag: bytes,
    message: bytes,
    *,
    settled: bool = True,
    max_frame_payload: int = 512,
) -> bytes:
    """One message as one-or-more transfer frames; when the message
    exceeds max_frame_payload the continuation frames set more=true on
    all but the last (Part 2 §2.7.5 transfer: handle, delivery-id,
    delivery-tag, message-format, settled, more)."""
    chunks = [
        message[j:j + max_frame_payload]
        for j in range(0, max(len(message), 1), max_frame_payload)
    ]
    out = bytearray()
    for k, chunk in enumerate(chunks):
        more = k < len(chunks) - 1
        fields = [
            encode_uint(handle),
            encode_uint(delivery_id) if k == 0 else bytes([_NULL]),
            encode_value(delivery_tag) if k == 0 else bytes([_NULL]),
            encode_uint(0),  # message-format
            bytes([_TRUE if settled else _FALSE]),
            bytes([_TRUE if more else _FALSE]),
        ]
        items = b"".join(fields)
        perf = bytes([_DESCRIBED]) + encode_ulong(DESC_TRANSFER)
        if len(items) + 1 < 256:
            perf += bytes([_LIST8, len(items) + 1, len(fields)]) + items
        else:
            perf += bytes([_LIST32]) + struct.pack(
                ">II", len(items) + 4, len(fields)) + items
        out += encode_frame(channel, perf, chunk)
    return bytes(out)


def decode_session(data: bytes) -> Iterator[Amqp1Message]:
    """Recorded frame stream → messages, reassembling multi-transfer
    deliveries per (channel, handle).  Non-transfer performatives
    (open/begin/attach/flow/disposition/detach/end/close) are session
    plumbing and are skipped; an AMQP protocol header ("AMQP\\x00\\x01
    \\x00\\x00") at the front is accepted."""
    i = 0
    n = len(data)
    if data[:4] == b"AMQP":
        i = 8
    pending: dict[tuple[int, int], dict] = {}
    while i < n:
        if i + 8 > n:
            raise ValueError("amqp1: truncated frame header")
        size, doff, ftype, channel = struct.unpack_from(">IBBH", data, i)
        if size < 8 or i + size > n:
            raise ValueError("amqp1: truncated frame")
        if ftype != FRAME_TYPE_AMQP:
            i += size
            continue
        body = data[i + 4 * doff:i + size]
        i += size
        if not body:  # empty frame = keepalive
            continue
        perf, j = decode_value(body, 0)
        payload = body[j:]
        if not isinstance(perf, Described):
            raise ValueError("amqp1: performative not described")
        code = _descr_code(perf.descriptor)
        if code != DESC_TRANSFER:
            continue
        f = list(perf.value) + [None] * (6 - len(perf.value))
        handle = f[0]
        key = (channel, handle)
        p = pending.get(key)
        if p is None:
            p = pending[key] = {
                "delivery_id": f[1],
                "delivery_tag": f[2] if f[2] is not None else b"",
                "settled": bool(f[4]),
                "buf": bytearray(),
            }
        p["buf"] += payload
        if bool(f[5]):  # more
            continue
        done = pending.pop(key)
        sections = decode_message_sections(bytes(done["buf"]))
        yield Amqp1Message(
            channel=channel,
            handle=handle,
            delivery_id=done["delivery_id"],
            delivery_tag=done["delivery_tag"],
            settled=done["settled"],
            header=sections["header"],
            properties=sections["properties"],
            message_annotations=sections["message_annotations"],
            application_properties=sections["application_properties"],
            data=sections["data"],
            value=sections["value"],
        )
    if pending:
        raise ValueError("amqp1: session ended mid-delivery")
