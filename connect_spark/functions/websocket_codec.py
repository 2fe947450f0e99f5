"""WebSocket (RFC 6455) wire codec over recorded sessions.

The reference's websocket input/output (inputs/websocket.adoc,
internal/impl/io/) consumes message frames from a websocket server.
This module independently implements the PUBLIC framing so recorded
socket byte streams decode without a connection:

  frame:  b0 = FIN(0x80) | RSV | opcode(0x0F)
          b1 = MASK(0x80) | len7; len7=126 → u16 length,
               len7=127 → u64 length
          [masking-key u32 when MASK] payload (XOR key cyclically)
  opcodes: 0x0 continuation, 0x1 text, 0x2 binary, 0x8 close,
           0x9 ping, 0xA pong
  fragmentation: first frame carries the opcode, continuations carry
  0x0; FIN closes the message; CONTROL frames may interleave
  fragments but may not themselves fragment (RFC 6455 §5.4-5.5).

The HTTP/1.1 upgrade handshake at the front of a recording is
consumed up to its blank line; `accept_key` computes the
Sec-WebSocket-Accept value (SHA-1 of key + the RFC's fixed GUID,
base64) so handshake validation is testable too.
"""

from __future__ import annotations

import base64
import hashlib
import struct
from dataclasses import dataclass
from typing import Iterator

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def accept_key(sec_websocket_key: str) -> str:
    """RFC 6455 §4.2.2: the Sec-WebSocket-Accept a server must echo."""
    digest = hashlib.sha1(
        (sec_websocket_key + _WS_GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def encode_frame(payload: bytes, opcode: int = OP_TEXT, *,
                 fin: bool = True, mask: bytes | None = None) -> bytes:
    b0 = (0x80 if fin else 0) | (opcode & 0x0F)
    out = bytearray([b0])
    n = len(payload)
    mask_bit = 0x80 if mask is not None else 0
    if n < 126:
        out.append(mask_bit | n)
    elif n < (1 << 16):
        out.append(mask_bit | 126)
        out += struct.pack(">H", n)
    else:
        out.append(mask_bit | 127)
        out += struct.pack(">Q", n)
    if mask is not None:
        if len(mask) != 4:
            raise ValueError("websocket: masking key must be 4 bytes")
        out += mask
        out += bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    else:
        out += payload
    return bytes(out)


def encode_message(payload: bytes, opcode: int = OP_TEXT, *,
                   mask: bytes | None = None,
                   max_fragment: int | None = None) -> bytes:
    """One message, optionally split into continuation frames."""
    if max_fragment is None or len(payload) <= max_fragment:
        return encode_frame(payload, opcode, mask=mask)
    chunks = [payload[i:i + max_fragment]
              for i in range(0, len(payload), max_fragment)]
    out = bytearray()
    for k, chunk in enumerate(chunks):
        out += encode_frame(
            chunk,
            opcode if k == 0 else OP_CONT,
            fin=k == len(chunks) - 1,
            mask=mask,
        )
    return bytes(out)


@dataclass
class WsMessage:
    opcode: int  # OP_TEXT or OP_BINARY
    payload: bytes

    @property
    def text(self) -> str:
        return self.payload.decode("utf-8")


def decode_session(data: bytes) -> Iterator[WsMessage]:
    """Recorded byte stream → data messages.  An HTTP upgrade
    handshake at the front is consumed to its blank line; ping/pong
    are skipped; close ends the stream; fragmented messages
    reassemble (control frames may interleave)."""
    i = 0
    n = len(data)
    if data[:4] in (b"GET ", b"HTTP"):
        end = data.find(b"\r\n\r\n")
        if end < 0:
            raise ValueError("websocket: unterminated HTTP handshake")
        i = end + 4
    frag_op: int | None = None
    frag_buf = bytearray()
    while i < n:
        if i + 2 > n:
            raise ValueError("websocket: truncated frame header")
        b0, b1 = data[i], data[i + 1]
        i += 2
        fin = bool(b0 & 0x80)
        opcode = b0 & 0x0F
        masked = bool(b1 & 0x80)
        ln = b1 & 0x7F
        if ln == 126:
            if i + 2 > n:
                raise ValueError("websocket: truncated extended length")
            (ln,) = struct.unpack_from(">H", data, i)
            i += 2
        elif ln == 127:
            if i + 8 > n:
                raise ValueError("websocket: truncated extended length")
            (ln,) = struct.unpack_from(">Q", data, i)
            i += 8
        key = b""
        if masked:
            if i + 4 > n:
                raise ValueError("websocket: truncated masking key")
            key = data[i:i + 4]
            i += 4
        if i + ln > n:
            raise ValueError("websocket: truncated payload")
        payload = data[i:i + ln]
        i += ln
        if masked:
            payload = bytes(
                b ^ key[j % 4] for j, b in enumerate(payload))
        if opcode in (OP_PING, OP_PONG):
            if not fin:
                raise ValueError(
                    "websocket: fragmented control frame")
            continue
        if opcode == OP_CLOSE:
            return
        if opcode == OP_CONT:
            if frag_op is None:
                raise ValueError(
                    "websocket: continuation with no message open")
            frag_buf += payload
            if fin:
                yield WsMessage(frag_op, bytes(frag_buf))
                frag_op = None
                frag_buf = bytearray()
            continue
        if opcode not in (OP_TEXT, OP_BINARY):
            raise ValueError(f"websocket: unknown opcode {opcode:#x}")
        if frag_op is not None:
            raise ValueError(
                "websocket: new data frame inside a fragmented message")
        if fin:
            yield WsMessage(opcode, payload)
        else:
            frag_op = opcode
            frag_buf = bytearray(payload)
    if frag_op is not None:
        raise ValueError("websocket: stream ended mid-message")
