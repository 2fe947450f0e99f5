"""Redis RESP2 protocol codec over recorded sessions.

The reference's redis kinds (redis_list, redis_pubsub, redis_streams,
redis_scan + the redis caches) speak the PUBLIC RESP protocol
(redis.io "Redis serialization protocol spec").  This module decodes
*recorded* server→client byte streams so the redis inputs can consume
real protocol traffic without a server:

  +<simple string>\\r\\n      -<error>\\r\\n       :<integer>\\r\\n
  $<len>\\r\\n<bytes>\\r\\n     ($-1 = null bulk)
  *<count>\\r\\n<elements>     (*-1 = null array)

Helpers shape the two delivery forms the inputs consume:
- pub/sub pushes: ``*3 [$7 message, $<channel>, $<payload>]`` (and
  ``*4 pmessage`` with the pattern) → (channel, payload) messages.
- XREAD/XREADGROUP replies: ``*N [stream, [[id, [k, v, ...]], ...]]``
  → (stream, entry id, field map) entries.
"""

from __future__ import annotations

from typing import Any, Iterator


def decode_resp(data: bytes, i: int = 0) -> tuple[Any, int]:
    """One RESP value at offset i → (value, next offset).  Bulk
    strings come back as bytes; simple strings/errors as str;
    integers as int; arrays as lists (None for null)."""
    t = data[i:i + 1]
    eol = data.index(b"\r\n", i)
    line = data[i + 1:eol]
    i = eol + 2
    if t == b"+":
        return line.decode("utf-8", "replace"), i
    if t == b"-":
        return RespError(line.decode("utf-8", "replace")), i
    if t == b":":
        return int(line), i
    if t == b"$":
        n = int(line)
        if n < 0:
            return None, i
        if i + n + 2 > len(data):
            raise ValueError(
                f"resp: truncated bulk string at {i} "
                f"(need {n + 2} bytes, have {len(data) - i})")
        if data[i + n:i + n + 2] != b"\r\n":
            raise ValueError(
                f"resp: bulk string at {i} missing CRLF terminator")
        val = data[i:i + n]
        return val, i + n + 2
    if t == b"*" or t == b">":
        # array — and the RESP3 push type (>), which frames pub/sub
        # deliveries when the client has sent HELLO 3
        n = int(line)
        if n < 0:
            return None, i
        out = []
        for _ in range(n):
            v, i = decode_resp(data, i)
            out.append(v)
        return RespPush(out) if t == b">" else out, i
    # --- RESP3 types (redis.io "RESP3 specification") ---
    if t == b"_":  # null
        return None, i
    if t == b"#":  # boolean: #t / #f
        return line == b"t", i
    if t == b",":  # double
        return float(line), i
    if t == b"(":  # big number
        return int(line), i
    if t == b"%":  # map: n key-value PAIRS follow
        n = int(line)
        out_m: dict = {}
        for _ in range(n):
            k, i = decode_resp(data, i)
            v, i = decode_resp(data, i)
            out_m[k if not isinstance(k, bytes)
                  else k.decode("utf-8", "replace")] = v
        return out_m, i
    if t == b"~":  # set → list (order preserved from the wire)
        n = int(line)
        out_s = []
        for _ in range(n):
            v, i = decode_resp(data, i)
            out_s.append(v)
        return out_s, i
    if t == b"=":  # verbatim string: <len>\r\ntxt:<payload>\r\n
        n = int(line)
        if i + n + 2 > len(data) or data[i + n:i + n + 2] != b"\r\n":
            raise ValueError(f"resp: truncated verbatim string at {i}")
        val = data[i:i + n]
        # the 3-char format prefix + ':' is framing, not payload
        return val[4:] if len(val) >= 4 and val[3:4] == b":" else val, \
            i + n + 2
    raise ValueError(f"resp: unknown type byte {t!r} at {i}")


class RespError(str):
    """A RESP -ERR reply (kept distinct from simple strings)."""


class RespPush(list):
    """A RESP3 push frame (>): out-of-band server-initiated data —
    pub/sub deliveries under HELLO 3.  A list subclass, so the
    pub/sub helpers consume RESP2 arrays and RESP3 pushes alike."""


def decode_stream(data: bytes) -> Iterator[Any]:
    """All top-level RESP values in a recorded stream."""
    i = 0
    n = len(data)
    while i < n:
        v, i = decode_resp(data, i)
        yield v


def pubsub_messages(data: bytes) -> Iterator[dict]:
    """Recorded SUBSCRIBE-session replies → delivered messages.
    subscribe/unsubscribe confirmations and errors are skipped."""
    for v in decode_stream(data):
        if not isinstance(v, list) or not v:
            continue
        kind = v[0].decode() if isinstance(v[0], bytes) else str(v[0])
        if kind == "message" and len(v) == 3:
            yield {"channel": _s(v[1]), "pattern": None,
                   "payload": v[2]}
        elif kind == "pmessage" and len(v) == 4:
            yield {"channel": _s(v[2]), "pattern": _s(v[1]),
                   "payload": v[3]}


def xread_entries(data: bytes) -> Iterator[dict]:
    """Recorded XREAD/XREADGROUP replies → stream entries with their
    ids and field maps."""
    for v in decode_stream(data):
        if not isinstance(v, list):
            continue
        for stream_block in v:
            if not isinstance(stream_block, list) or len(stream_block) != 2:
                continue
            stream, entries = stream_block
            for entry in entries or []:
                if not isinstance(entry, list) or len(entry) != 2:
                    continue
                eid, kv = entry
                fields = {}
                for j in range(0, len(kv or []) - 1, 2):
                    fields[_s(kv[j])] = _s(kv[j + 1])
                yield {"stream": _s(stream), "id": _s(eid),
                       "fields": fields}


def _s(v: Any) -> str:
    return v.decode("utf-8", "replace") if isinstance(v, bytes) else str(v)


def encode_resp(value: Any) -> bytes:
    """Fixture encoder for the same wire format."""
    if isinstance(value, RespError):
        return b"-" + str(value).encode() + b"\r\n"
    if isinstance(value, str):
        return b"+" + value.encode() + b"\r\n"
    if isinstance(value, bool):
        return b":" + (b"1" if value else b"0") + b"\r\n"
    if isinstance(value, int):
        return b":" + str(value).encode() + b"\r\n"
    if value is None:
        return b"$-1\r\n"
    if isinstance(value, bytes):
        return (b"$" + str(len(value)).encode() + b"\r\n"
                + value + b"\r\n")
    if isinstance(value, (list, tuple)):
        out = b"*" + str(len(value)).encode() + b"\r\n"
        for v in value:
            out += encode_resp(v)
        return out
    raise ValueError(f"resp: cannot encode {type(value)}")
