"""Wire codecs for the remaining recorded-session broker inputs:
NSQ, beanstalkd, ZeroMQ (ZMTP 3.x), nanomsg (SP-over-TCP).

Each implements the PUBLIC protocol from its published specification
so recorded broker→client byte streams decode without the broker —
the same recorded-bytes depth contract as functions/amqp_codec.py
(AMQP 0-9-1), functions/mqtt_codec.py and functions/amqp1_codec.py.

- NSQ (nsq.io/clients/tcp_protocol_spec, V2; reference input
  internal/impl/nsq/, inputs/nsq.adoc): server frames are
  [size u32][frameType u32][data]; frameType 0 response ("OK",
  "_heartbeat_"), 1 error, 2 message.  A message is
  [timestamp_ns i64][attempts u16][message_id 16 ascii bytes][body].

- beanstalkd (the protocol.txt shipped with beanstalkd; reference
  input internal/impl/beanstalkd/, inputs/beanstalkd.adoc): a text
  protocol.  Reserved jobs arrive as "RESERVED <id> <bytes>\\r\\n"
  followed by <bytes> of body and a trailing CRLF; other replies
  (OK/USING/WATCHING/TIMED_OUT/DEADLINE_SOON/...) are control chatter.

- ZMTP 3.x (rfc.zeromq.org/spec/23; reference input
  internal/impl/zeromq/, inputs/zmq4.adoc): an optional 64-byte
  greeting (signature ff ... 7f, version, mechanism), then frames of
  [flags u8][size u8 | u64 if LONG][body]; flags bit0 MORE chains
  multi-part messages, bit2 COMMAND marks session commands (READY,
  SUBSCRIBE) which carry no application data.

- nanomsg SP over TCP (rfc 'SP protocol mappings', nanomsg.org;
  reference input internal/impl/nanomsg/, inputs/nanomsg.adoc): an
  8-byte handshake 00 53 50 00 | protocol u16 | reserved u16, then
  messages of [size u64][payload].
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

# --- NSQ ---

NSQ_FRAME_RESPONSE = 0
NSQ_FRAME_ERROR = 1
NSQ_FRAME_MESSAGE = 2


def encode_nsq_message(timestamp_ns: int, attempts: int,
                       message_id: str, body: bytes) -> bytes:
    mid = message_id.encode("ascii")
    if len(mid) != 16:
        raise ValueError("nsq: message id must be 16 ascii bytes")
    data = struct.pack(">qH", timestamp_ns, attempts) + mid + body
    return struct.pack(">iI", len(data) + 4, NSQ_FRAME_MESSAGE) + data


def encode_nsq_response(text: bytes = b"OK") -> bytes:
    return struct.pack(">iI", len(text) + 4, NSQ_FRAME_RESPONSE) + text


def decode_nsq_stream(data: bytes) -> Iterator[dict]:
    """Recorded nsqd→client stream → message dicts (responses and
    heartbeats skipped; error frames raise)."""
    i = 0
    n = len(data)
    if data[:4] == b"  V2":  # client magic, if the recording kept it
        i = 4
    while i < n:
        if i + 8 > n:
            raise ValueError("nsq: truncated frame header")
        size, ftype = struct.unpack_from(">iI", data, i)
        if size < 4 or i + 4 + size > n:
            raise ValueError("nsq: truncated frame")
        payload = data[i + 8:i + 4 + size]
        i += 4 + size
        if ftype == NSQ_FRAME_RESPONSE:
            continue
        if ftype == NSQ_FRAME_ERROR:
            raise ValueError(
                f"nsq: error frame {payload.decode('ascii', 'replace')}")
        if ftype != NSQ_FRAME_MESSAGE:
            raise ValueError(f"nsq: unknown frame type {ftype}")
        if len(payload) < 26:
            raise ValueError("nsq: short message frame")
        ts, attempts = struct.unpack_from(">qH", payload, 0)
        yield {
            "timestamp_ns": ts,
            "attempts": attempts,
            "message_id": payload[10:26].decode("ascii"),
            "body": payload[26:],
        }


# --- beanstalkd ---


def encode_beanstalkd_reserved(job_id: int, body: bytes) -> bytes:
    return b"RESERVED %d %d\r\n%s\r\n" % (job_id, len(body), body)


def encode_beanstalkd_reply(line: str) -> bytes:
    return line.encode("ascii") + b"\r\n"


_BEANSTALK_CONTROL = (
    b"OK", b"USING", b"WATCHING", b"TIMED_OUT", b"DEADLINE_SOON",
    b"INSERTED", b"RELEASED", b"DELETED", b"BURIED", b"TOUCHED",
    b"KICKED", b"PAUSED", b"FOUND", b"NOT_FOUND",
)


def decode_beanstalkd_stream(data: bytes) -> Iterator[dict]:
    """Recorded beanstalkd→client stream → reserved jobs.  "OK <n>"
    replies carry an <n>-byte YAML body which is skipped as a unit;
    other control replies are single lines."""
    i = 0
    n = len(data)
    while i < n:
        eol = data.find(b"\r\n", i)
        if eol < 0:
            raise ValueError("beanstalkd: truncated reply line")
        line = data[i:eol]
        i = eol + 2
        parts = line.split(b" ")
        word = parts[0]
        if word == b"RESERVED":
            if len(parts) != 3:
                raise ValueError(
                    f"beanstalkd: malformed RESERVED {line!r}")
            job_id, nbytes = int(parts[1]), int(parts[2])
            if i + nbytes + 2 > n:
                raise ValueError("beanstalkd: truncated job body")
            body = data[i:i + nbytes]
            if data[i + nbytes:i + nbytes + 2] != b"\r\n":
                raise ValueError("beanstalkd: job body missing CRLF")
            i += nbytes + 2
            yield {"job_id": job_id, "body": body}
        elif word == b"OK" and len(parts) == 2:
            nbytes = int(parts[1])
            if i + nbytes + 2 > n:
                raise ValueError("beanstalkd: truncated OK body")
            i += nbytes + 2
        elif word in _BEANSTALK_CONTROL:
            continue
        else:
            raise ValueError(
                f"beanstalkd: unknown reply {word.decode('ascii', 'replace')}")


# --- ZMTP 3.x (zeromq) ---

_ZMTP_FLAG_MORE = 0x01
_ZMTP_FLAG_LONG = 0x02
_ZMTP_FLAG_COMMAND = 0x04


def encode_zmtp_greeting(mechanism: str = "NULL") -> bytes:
    sig = b"\xff" + b"\x00" * 8 + b"\x7f"
    mech = mechanism.encode("ascii").ljust(20, b"\x00")
    return sig + bytes([3, 0]) + mech + b"\x00" + b"\x00" * 31


def encode_zmtp_frame(body: bytes, more: bool = False,
                      command: bool = False) -> bytes:
    flags = (_ZMTP_FLAG_MORE if more else 0) \
        | (_ZMTP_FLAG_COMMAND if command else 0)
    if len(body) <= 255:
        return bytes([flags, len(body)]) + body
    return bytes([flags | _ZMTP_FLAG_LONG]) \
        + struct.pack(">Q", len(body)) + body


def encode_zmtp_message(parts: list[bytes]) -> bytes:
    out = bytearray()
    for k, p in enumerate(parts):
        out += encode_zmtp_frame(p, more=k < len(parts) - 1)
    return bytes(out)


def decode_zmtp_stream(data: bytes) -> Iterator[list[bytes]]:
    """Recorded ZMTP stream → messages as frame-part lists (greeting
    and command frames skipped)."""
    i = 0
    n = len(data)
    if n >= 64 and data[0] == 0xFF and data[9] == 0x7F:
        i = 64  # greeting
    parts: list[bytes] = []
    while i < n:
        flags = data[i]
        i += 1
        if flags & _ZMTP_FLAG_LONG:
            if i + 8 > n:
                raise ValueError("zmtp: truncated long frame size")
            (size,) = struct.unpack_from(">Q", data, i)
            i += 8
        else:
            if i >= n:
                raise ValueError("zmtp: truncated frame size")
            size = data[i]
            i += 1
        if i + size > n:
            raise ValueError("zmtp: truncated frame body")
        body = data[i:i + size]
        i += size
        if flags & _ZMTP_FLAG_COMMAND:
            if parts:
                raise ValueError("zmtp: command inside a message")
            continue
        parts.append(body)
        if not flags & _ZMTP_FLAG_MORE:
            yield parts
            parts = []
    if parts:
        raise ValueError("zmtp: stream ended mid-message")


# --- nanomsg SP over TCP ---


def encode_sp_handshake(protocol: int = 0x0010) -> bytes:
    # 0x0010 = Pub (the numeric SP protocol id goes on the wire)
    return b"\x00SP\x00" + struct.pack(">HH", protocol, 0)


def encode_sp_message(payload: bytes) -> bytes:
    return struct.pack(">Q", len(payload)) + payload


def decode_sp_stream(data: bytes) -> Iterator[bytes]:
    """Recorded SP-over-TCP stream → message payloads."""
    i = 0
    n = len(data)
    if data[:4] == b"\x00SP\x00":
        if n < 8:
            raise ValueError("sp: truncated handshake")
        i = 8
    while i < n:
        if i + 8 > n:
            raise ValueError("sp: truncated message size")
        (size,) = struct.unpack_from(">Q", data, i)
        i += 8
        if i + size > n:
            raise ValueError("sp: truncated message payload")
        yield data[i:i + size]
        i += size
