"""MQTT 3.1.1 control-packet codec over recorded sessions.

The reference's mqtt input/output speak the OASIS MQTT 3.1.1 protocol
(inputs/mqtt.adoc — urls/topics/qos/client_id).  This module
independently implements the PUBLIC packet format so *recorded*
broker↔client byte streams decode (and fixture sessions encode)
without a broker — the same recorded-bytes contract as the CDC and
Kafka codecs.

Packet layout (MQTT 3.1.1 spec §2):
  fixed header: byte 1 = packet type (high nibble) | flags (low);
  remaining length = 1-4 byte varint (7 bits/byte, MSB continuation)
  PUBLISH (type 3): flags = dup(bit3) qos(bits2-1) retain(bit0);
    variable header: topic (u16-len UTF-8) [+ packet id u16 if qos>0];
    payload = rest of the packet.
  CONNECT (1): protocol name "MQTT", level 4, connect flags,
    keepalive u16, client id [+ will topic/message] [+ user] [+ pass].
  SUBSCRIBE (8): packet id u16, then (topic filter, qos) pairs.
  CONNACK/PUBACK/SUBACK/PINGREQ/PINGRESP/DISCONNECT: parsed and
  surfaced as control entries.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Iterator

CONNECT = 1
CONNACK = 2
PUBLISH = 3
PUBACK = 4
SUBSCRIBE = 8
SUBACK = 9
PINGREQ = 12
PINGRESP = 13
DISCONNECT = 14

_TYPE_NAMES = {
    CONNECT: "connect", CONNACK: "connack", PUBLISH: "publish",
    PUBACK: "puback", SUBSCRIBE: "subscribe", SUBACK: "suback",
    PINGREQ: "pingreq", PINGRESP: "pingresp",
    DISCONNECT: "disconnect",
}


def _enc_remaining(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_remaining(data: bytes, i: int) -> tuple[int, int]:
    mult = 1
    val = 0
    for _ in range(4):
        b = data[i]
        i += 1
        val += (b & 0x7F) * mult
        if not b & 0x80:
            return val, i
        mult *= 128
    raise ValueError("mqtt: malformed remaining length")


def _utf8(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">H", len(raw)) + raw


def _read_utf8(data: bytes, i: int) -> tuple[str, int]:
    (n,) = struct.unpack_from(">H", data, i)
    return data[i + 2:i + 2 + n].decode("utf-8"), i + 2 + n


@dataclass
class MqttPacket:
    type_name: str
    topic: str | None = None
    payload: bytes | None = None
    qos: int = 0
    retain: bool = False
    dup: bool = False
    packet_id: int | None = None
    client_id: str | None = None
    topics: list[tuple[str, int]] = field(default_factory=list)
    # MQTT 5 variable-header properties (OASIS MQTT 5.0 §2.2.2 /
    # §3.3.2.3) — empty for 3.1.1 sessions
    properties: dict = field(default_factory=dict)


# MQTT 5 property identifiers relevant to PUBLISH (§2.2.2.2)
_PROP_PAYLOAD_FORMAT = 0x01
_PROP_MESSAGE_EXPIRY = 0x02
_PROP_CONTENT_TYPE = 0x03
_PROP_RESPONSE_TOPIC = 0x08
_PROP_CORRELATION_DATA = 0x09
_PROP_SUBSCRIPTION_ID = 0x0B
_PROP_TOPIC_ALIAS = 0x23
_PROP_USER_PROPERTY = 0x26


def _read_props(body: bytes, k: int) -> tuple[dict, int]:
    """One MQTT 5 property block (varint length + properties)."""
    plen, k = _dec_remaining(body, k)
    end = k + plen
    props: dict = {}
    user: list[tuple[str, str]] = []
    while k < end:
        pid = body[k]
        k += 1
        if pid == _PROP_PAYLOAD_FORMAT:
            props["payload_format"] = body[k]
            k += 1
        elif pid == _PROP_MESSAGE_EXPIRY:
            (props["message_expiry"],) = struct.unpack_from(
                ">I", body, k)
            k += 4
        elif pid == _PROP_TOPIC_ALIAS:
            (props["topic_alias"],) = struct.unpack_from(">H", body, k)
            k += 2
        elif pid in (_PROP_CONTENT_TYPE, _PROP_RESPONSE_TOPIC):
            v, k = _read_utf8(body, k)
            props["content_type" if pid == _PROP_CONTENT_TYPE
                  else "response_topic"] = v
        elif pid == _PROP_CORRELATION_DATA:
            (n,) = struct.unpack_from(">H", body, k)
            props["correlation_data"] = body[k + 2:k + 2 + n]
            k += 2 + n
        elif pid == _PROP_SUBSCRIPTION_ID:
            v, k = _dec_remaining(body, k)
            props["subscription_id"] = v
        elif pid == _PROP_USER_PROPERTY:
            uk, k = _read_utf8(body, k)
            uv, k = _read_utf8(body, k)
            user.append((uk, uv))
        else:
            raise ValueError(f"mqtt5: unknown property id {pid:#x}")
    if user:
        props["user"] = user
    return props, end


def decode_session(data: bytes) -> Iterator[MqttPacket]:
    """Recorded wire bytes → packets in stream order.  The CONNECT
    packet's protocol level selects 3.1.1 or 5 parsing for the rest
    of the session (v5 adds property blocks to CONNECT and
    PUBLISH)."""
    i = 0
    n = len(data)
    level = 4
    while i < n:
        b1 = data[i]
        ptype = b1 >> 4
        flags = b1 & 0x0F
        length, j = _dec_remaining(data, i + 1)
        body = data[j:j + length]
        i = j + length
        name = _TYPE_NAMES.get(ptype)
        if name is None:
            raise ValueError(f"mqtt: unknown packet type {ptype}")
        if ptype == PUBLISH:
            qos = (flags >> 1) & 0x3
            topic, k = _read_utf8(body, 0)
            pid = None
            if qos > 0:
                (pid,) = struct.unpack_from(">H", body, k)
                k += 2
            props: dict = {}
            if level >= 5:
                props, k = _read_props(body, k)
            yield MqttPacket(
                "publish", topic=topic, payload=body[k:], qos=qos,
                retain=bool(flags & 1), dup=bool(flags & 8),
                packet_id=pid, properties=props)
        elif ptype == CONNECT:
            proto, k = _read_utf8(body, 0)
            level = body[k]
            cflags = body[k + 1]
            k += 4  # level + flags + keepalive
            if level >= 5:
                _cprops, k = _read_props(body, k)
            client_id, k = _read_utf8(body, k)
            if proto not in ("MQTT", "MQIsdp"):
                raise ValueError(f"mqtt: bad protocol name {proto!r}")
            yield MqttPacket("connect", client_id=client_id)
        elif ptype == SUBSCRIBE:
            (pid,) = struct.unpack_from(">H", body, 0)
            k = 2
            topics = []
            while k < len(body):
                t, k = _read_utf8(body, k)
                topics.append((t, body[k]))
                k += 1
            yield MqttPacket("subscribe", packet_id=pid, topics=topics)
        elif ptype in (PUBACK, SUBACK):
            (pid,) = struct.unpack_from(">H", body, 0)
            yield MqttPacket(_TYPE_NAMES[ptype], packet_id=pid)
        else:
            yield MqttPacket(name)


class MqttFixtureWriter:
    """Encodes the same wire format for recorded-session fixtures."""

    def __init__(self):
        self.buf = bytearray()
        self._level = 4

    def _packet(self, b1: int, body: bytes) -> None:
        self.buf += bytes([b1]) + _enc_remaining(len(body)) + body

    def connect(self, client_id: str, keepalive: int = 60,
                level: int = 4) -> None:
        self._level = level
        body = (_utf8("MQTT") + bytes([level, 2])
                + struct.pack(">H", keepalive))
        if level >= 5:
            body += _enc_remaining(0)  # empty CONNECT properties
        body += _utf8(client_id)
        self._packet(CONNECT << 4, body)

    def connack(self) -> None:
        self._packet(CONNACK << 4, bytes([0, 0]))

    def publish(self, topic: str, payload: bytes, qos: int = 0,
                retain: bool = False, dup: bool = False,
                packet_id: int | None = None,
                properties: dict | None = None) -> None:
        flags = (qos << 1) | (1 if retain else 0) | (8 if dup else 0)
        body = _utf8(topic)
        if qos > 0:
            body += struct.pack(">H", packet_id or 1)
        if self._level >= 5:
            pb = bytearray()
            p = properties or {}
            if "payload_format" in p:
                pb += bytes([_PROP_PAYLOAD_FORMAT, p["payload_format"]])
            if "message_expiry" in p:
                pb += bytes([_PROP_MESSAGE_EXPIRY]) + struct.pack(
                    ">I", p["message_expiry"])
            if "content_type" in p:
                pb += bytes([_PROP_CONTENT_TYPE]) + _utf8(
                    p["content_type"])
            if "response_topic" in p:
                pb += bytes([_PROP_RESPONSE_TOPIC]) + _utf8(
                    p["response_topic"])
            if "correlation_data" in p:
                pb += bytes([_PROP_CORRELATION_DATA]) + struct.pack(
                    ">H", len(p["correlation_data"])
                ) + p["correlation_data"]
            if "topic_alias" in p:
                pb += bytes([_PROP_TOPIC_ALIAS]) + struct.pack(
                    ">H", p["topic_alias"])
            for uk, uv in p.get("user", []):
                pb += bytes([_PROP_USER_PROPERTY]) + _utf8(uk) + _utf8(uv)
            body += _enc_remaining(len(pb)) + bytes(pb)
        body += payload
        self._packet((PUBLISH << 4) | flags, body)

    def puback(self, packet_id: int) -> None:
        self._packet(PUBACK << 4, struct.pack(">H", packet_id))

    def subscribe(self, packet_id: int,
                  topics: list[tuple[str, int]]) -> None:
        body = struct.pack(">H", packet_id)
        for t, q in topics:
            body += _utf8(t) + bytes([q])
        self._packet((SUBSCRIBE << 4) | 2, body)

    def pingreq(self) -> None:
        self._packet(PINGREQ << 4, b"")

    def disconnect(self) -> None:
        self._packet(DISCONNECT << 4, b"")

    def getvalue(self) -> bytes:
        return bytes(self.buf)


# --------------------------------------------------------------------
# NATS text protocol (recorded server→client stream)
# --------------------------------------------------------------------

def decode_nats_stream(data: bytes) -> Iterator[dict]:
    """Recorded NATS server output → delivered messages.  The NATS
    client protocol is PUBLIC plain text: ``MSG <subject> <sid>
    [reply-to] <#bytes>\\r\\n<payload>\\r\\n`` plus INFO/PING/PONG/+OK
    lines (nats.io protocol docs), which are consumed silently."""
    i = 0
    n = len(data)
    while i < n:
        eol = data.find(b"\r\n", i)
        if eol < 0:
            return
        line = data[i:eol].decode("utf-8", "replace")
        i = eol + 2
        if line.startswith("MSG "):
            parts = line.split(" ")
            if len(parts) == 4:
                _, subject, sid, nbytes = parts
                reply = None
            elif len(parts) == 5:
                _, subject, sid, reply, nbytes = parts
            else:
                raise ValueError(f"nats: malformed MSG line {line!r}")
            size = int(nbytes)
            payload = data[i:i + size]
            i += size + 2  # payload + trailing CRLF
            yield {"subject": subject, "sid": sid, "reply": reply,
                   "payload": payload}
        elif line.startswith("HMSG "):
            # headers-enabled delivery: HMSG <subject> <sid>
            # [reply-to] <hdr_len> <total_len>; the first hdr_len
            # payload bytes are the header block (NATS/1.0 + fields)
            parts = line.split(" ")
            if len(parts) == 5:
                _, subject, sid, hdr_len_s, total_s = parts
                reply = None
            elif len(parts) == 6:
                _, subject, sid, reply, hdr_len_s, total_s = parts
            else:
                raise ValueError(f"nats: malformed HMSG line {line!r}")
            hdr_len = int(hdr_len_s)
            total = int(total_s)
            block = data[i:i + total]
            i += total + 2
            headers: dict[str, str] = {}
            for hline in block[:hdr_len].split(b"\r\n"):
                if b":" in hline:
                    hk, _, hv = hline.partition(b":")
                    headers[hk.decode().strip()] = hv.decode().strip()
            yield {"subject": subject, "sid": sid, "reply": reply,
                   "payload": block[hdr_len:], "headers": headers}
        # INFO {...} / PING / PONG / +OK / -ERR lines carry no message
