"""pgoutput logical-replication wire decoder (recorded byte streams).

The reference's flagship CDC connector speaks PostgreSQL's pgoutput
logical-decoding protocol over a replication slot
(internal/impl/postgresql/pglogicalstream/replication_message.go —
Begin/Commit/Origin/Relation/Type/Insert/Update/Delete/Truncate
decoders; logical_stream.go drives the COPY-BOTH loop) and normalizes
column values per internal/impl/postgresql/TYPES.md:25-43.  This
module is an independent Python implementation of the same PUBLIC
protocol (PostgreSQL docs, "Logical Replication Message Formats" +
"Streaming Replication Protocol"), decoding *recorded* wire bytes —
the byte-for-byte stream a server sends during START_REPLICATION —
into the repo's Debezium-shaped CDC envelope
(sources/cdc_stream.py::CDC_ENVELOPE).

Recorded stream format (exactly the server→client wire bytes):
  repeated CopyData frames: 'd' + Int32 len(incl itself) + body
  where body is either
    XLogData  'w' + Int64 walStart + Int64 walEnd + Int64 clock +
              <one pgoutput message>
    Keepalive 'k' + Int64 walEnd + Int64 clock + Byte replyRequested
  CopyDone ('c' + Int32 4) ends a recording cleanly.

pgoutput messages (all integers big-endian, strings NUL-terminated):
  Begin    'B' finalLSN i64, commitTs i64 (µs since 2000-01-01), xid i32
  Message  'M' flags i8, lsn i64, prefix cstr, len i32, content bytes
  Commit   'C' flags i8, commitLSN i64, endLSN i64, commitTs i64
  Origin   'O' originLSN i64, name cstr
  Relation 'R' oid i32, namespace cstr, relname cstr, replicaIdent i8,
               ncols i16, then per column: flags i8, name cstr,
               typeOid i32, typmod i32
  Type     'Y' oid i32, namespace cstr, name cstr
  Insert   'I' relOid i32, 'N', TupleData
  Update   'U' relOid i32, ['K'|'O' TupleData,] 'N' TupleData
  Delete   'D' relOid i32, 'K'|'O', TupleData
  Truncate 'T' nrels i32, options i8, relOid i32 × n
  TupleData: ncols i16, per column: 'n' (null) | 'u' (unchanged
             TOAST) | 't' len i32 + text bytes | 'b' len i32 + binary

Value normalization mirrors TYPES.md: int2/int4 → int, int8 → int,
float4/float8 → float, numeric/text/uuid/time/timetz → string,
bool → bool, bytea (\\x hex) → base64 string (the JSON shape Go's
[]byte marshals to), date/timestamp(tz) → ISO strings, json/jsonb →
parsed value.  Unchanged-TOAST columns decode to the sentinel
``UNCHANGED_TOAST`` so the apply layer can fall back to the previous
row image (the reference surfaces the same marker semantics).
"""

from __future__ import annotations

import base64
import json
import struct
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

PG_EPOCH_US = 946_684_800_000_000  # 2000-01-01T00:00:00Z in unix µs

UNCHANGED_TOAST = "__unchanged_toast__"

# standard PostgreSQL type OIDs (pg_type.dat — public catalog)
OID_BOOL = 16
OID_BYTEA = 17
OID_INT8 = 20
OID_INT2 = 21
OID_INT4 = 23
OID_TEXT = 25
OID_JSON = 114
OID_FLOAT4 = 700
OID_FLOAT8 = 701
OID_BPCHAR = 1042
OID_VARCHAR = 1043
OID_DATE = 1082
OID_TIME = 1083
OID_TIMESTAMP = 1114
OID_TIMESTAMPTZ = 1184
OID_TIMETZ = 1266
OID_NUMERIC = 1700
OID_UUID = 2950
OID_JSONB = 3802


def _dec_bool(s: str) -> bool:
    return s == "t"


def _dec_bytea(s: str) -> str:
    # PG text output is \x<hex>; JSON-marshal like Go []byte → base64
    if s.startswith("\\x"):
        return base64.b64encode(bytes.fromhex(s[2:])).decode()
    return base64.b64encode(s.encode("latin-1")).decode()


def _dec_json(s: str) -> Any:
    return json.loads(s)


def _dec_date(s: str) -> Any:
    # ±infinity dates → nil (TYPES.md:52)
    return None if s in ("infinity", "-infinity") else s


# OID → text-format value normalizer (TYPES.md type map)
_DECODERS: dict[int, Callable[[str], Any]] = {
    OID_BOOL: _dec_bool,
    OID_BYTEA: _dec_bytea,
    OID_INT2: int,
    OID_INT4: int,
    OID_INT8: int,
    OID_FLOAT4: float,
    OID_FLOAT8: float,
    OID_JSON: _dec_json,
    OID_JSONB: _dec_json,
    OID_DATE: _dec_date,
    OID_TIMESTAMP: _dec_date,
    OID_TIMESTAMPTZ: _dec_date,
    # numeric / text / char / varchar / uuid / time / timetz stay str
}


@dataclass
class Relation:
    oid: int
    namespace: str
    name: str
    replica_identity: int
    columns: list[tuple[int, str, int, int]]  # (flags, name, type_oid, typmod)

    @property
    def key_columns(self) -> list[str]:
        return [c[1] for c in self.columns if c[0] & 1]


class _Buf:
    """Big-endian cursor over one message's bytes."""

    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0

    def u8(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def i16(self) -> int:
        (v,) = struct.unpack_from(">h", self.b, self.i)
        self.i += 2
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from(">i", self.b, self.i)
        self.i += 4
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from(">q", self.b, self.i)
        self.i += 8
        return v

    def cstr(self) -> str:
        j = self.b.index(0, self.i)
        v = self.b[self.i:j].decode("utf-8")
        self.i = j + 1
        return v

    def take(self, n: int) -> bytes:
        v = self.b[self.i:self.i + n]
        self.i += n
        return v

    def byte(self) -> str:
        return chr(self.u8())


@dataclass
class PgoutputDecoder:
    """Stateful pgoutput message decoder.

    Feed it XLogData payloads (one pgoutput message each) in stream
    order; Relation messages update the schema registry, Begin/Commit
    bracket transactions, and DML messages yield envelope dicts shaped
    exactly like ``CdcWal.records()`` rows: lsn, operation, table,
    commit_ts_ms, before, after (row images as dicts).
    """

    relations: dict[int, Relation] = field(default_factory=dict)
    # current transaction context from Begin
    _tx_commit_ts_ms: int = 0
    _tx_xid: int = 0
    # protocol v2 streamed-transaction state (PG 14 streaming of
    # in-progress large transactions): between StreamStart and
    # StreamStop every R/I/U/D/T/M message carries an int32
    # (sub)transaction-id prefix; changes buffer per top-level xid
    # until StreamCommit emits them (StreamAbort drops one
    # subtransaction's changes)
    _stream_xid: int | None = None
    _stream_buf: dict[int, list] = field(default_factory=dict)

    # -- tuple decoding -------------------------------------------------
    def _tuple(self, buf: _Buf, rel: Relation) -> dict[str, Any]:
        ncols = buf.i16()
        row: dict[str, Any] = {}
        for idx in range(ncols):
            name = rel.columns[idx][1] if idx < len(rel.columns) else f"c{idx}"
            oid = rel.columns[idx][2] if idx < len(rel.columns) else OID_TEXT
            cat = buf.byte()
            if cat == "n":
                row[name] = None
            elif cat == "u":
                row[name] = UNCHANGED_TOAST
            elif cat == "t":
                n = buf.i32()
                text = buf.take(n).decode("utf-8")
                dec = _DECODERS.get(oid)
                row[name] = dec(text) if dec else text
            elif cat == "b":
                n = buf.i32()
                row[name] = base64.b64encode(buf.take(n)).decode()
            else:
                raise ValueError(
                    f"pgoutput: unknown tuple column category {cat!r}"
                )
        return row

    # -- message decoding -----------------------------------------------
    def decode_message(self, lsn: int, payload: bytes) -> Iterator[dict]:
        """Decode ONE pgoutput message; yield 0+ envelope records.
        Protocol v2 stream messages (S/E/c/A) manage the streamed-
        transaction buffers; everything else defers to the per-tag
        parser (with the v2 xid prefix consumed inside streams)."""
        buf = _Buf(payload)
        tag = buf.byte()
        if tag == "S":  # Stream Start: xid, first-segment flag
            self._stream_xid = buf.i32()
            buf.u8()
            return
        if tag == "E":  # Stream Stop
            self._stream_xid = None
            return
        if tag == "c":  # Stream Commit
            xid = buf.i32()
            buf.u8()   # flags
            buf.i64()  # commit LSN
            buf.i64()  # end LSN
            commit_ts_us = buf.i64()
            ts_ms = (commit_ts_us + PG_EPOCH_US) // 1000
            yield {
                "lsn": lsn, "operation": "begin", "table": "",
                "commit_ts_ms": ts_ms, "before": None, "after": None,
            }
            for _sub, rec in self._stream_buf.pop(xid, []):
                yield dict(rec, commit_ts_ms=ts_ms)
            yield {
                "lsn": lsn, "operation": "commit", "table": "",
                "commit_ts_ms": ts_ms, "before": None, "after": None,
            }
            return
        if tag == "A":  # Stream Abort: top xid + subtransaction xid
            xid = buf.i32()
            sub = buf.i32()
            if xid == sub:  # whole-transaction abort
                self._stream_buf.pop(xid, None)
            else:
                self._stream_buf[xid] = [
                    (s, r) for s, r in self._stream_buf.get(xid, [])
                    if s != sub
                ]
            return
        if self._stream_xid is not None and tag in "RIUDTM":
            sub_xid = buf.i32()
            recs = list(self._decode_tagged(tag, buf, lsn))
            self._stream_buf.setdefault(self._stream_xid, []).extend(
                (sub_xid, r) for r in recs)
            return
        yield from self._decode_tagged(tag, buf, lsn)

    def _decode_tagged(self, tag: str, buf: _Buf,
                       lsn: int) -> Iterator[dict]:
        if tag == "B":  # Begin
            buf.i64()  # final LSN of tx
            commit_ts_us = buf.i64()
            self._tx_commit_ts_ms = (commit_ts_us + PG_EPOCH_US) // 1000
            self._tx_xid = buf.i32()
            yield {
                "lsn": lsn, "operation": "begin", "table": "",
                "commit_ts_ms": self._tx_commit_ts_ms,
                "before": None, "after": None,
            }
        elif tag == "C":  # Commit
            buf.u8()   # flags
            buf.i64()  # commit LSN
            buf.i64()  # end LSN
            commit_ts_us = buf.i64()
            yield {
                "lsn": lsn, "operation": "commit", "table": "",
                "commit_ts_ms": (commit_ts_us + PG_EPOCH_US) // 1000,
                "before": None, "after": None,
            }
        elif tag == "O":  # Origin — positional only, no envelope row
            buf.i64()
            buf.cstr()
        elif tag == "R":  # Relation
            oid = buf.i32()
            ns = buf.cstr()
            name = buf.cstr()
            ident = buf.u8()
            ncols = buf.i16()
            cols = []
            for _ in range(ncols):
                flags = buf.u8()
                cname = buf.cstr()
                toid = buf.i32()
                typmod = buf.i32()
                cols.append((flags, cname, toid, typmod))
            self.relations[oid] = Relation(oid, ns, name, ident, cols)
        elif tag == "Y":  # Type — custom type metadata, no envelope row
            buf.i32()
            buf.cstr()
            buf.cstr()
        elif tag == "I":  # Insert
            rel = self._rel(buf.i32())
            if buf.byte() != "N":
                raise ValueError("pgoutput: Insert without new tuple")
            after = self._tuple(buf, rel)
            yield self._dml(lsn, "insert", rel, None, after)
        elif tag == "U":  # Update
            rel = self._rel(buf.i32())
            before = None
            part = buf.byte()
            if part in ("K", "O"):
                before = self._tuple(buf, rel)
                part = buf.byte()
            if part != "N":
                raise ValueError("pgoutput: Update without new tuple")
            after = self._tuple(buf, rel)
            yield self._dml(lsn, "update", rel, before, after)
        elif tag == "D":  # Delete
            rel = self._rel(buf.i32())
            part = buf.byte()
            if part not in ("K", "O"):
                raise ValueError("pgoutput: Delete without old tuple")
            before = self._tuple(buf, rel)
            yield self._dml(lsn, "delete", rel, before, None)
        elif tag == "T":  # Truncate
            nrels = buf.i32()
            buf.u8()  # options
            for _ in range(nrels):
                rel = self._rel(buf.i32())
                yield self._dml(lsn, "truncate", rel, None, None)
        elif tag == "M":  # logical decoding message
            buf.u8()   # flags
            buf.i64()  # message LSN
            prefix = buf.cstr()
            n = buf.i32()
            content = buf.take(n)
            yield {
                "lsn": lsn, "operation": "message", "table": prefix,
                "commit_ts_ms": self._tx_commit_ts_ms,
                "before": None,
                "after": {"content": content.decode("utf-8", "replace")},
            }
        else:
            raise ValueError(f"pgoutput: unknown message type {tag!r}")

    def _rel(self, oid: int) -> Relation:
        rel = self.relations.get(oid)
        if rel is None:
            raise ValueError(
                f"pgoutput: DML for unknown relation oid {oid} "
                "(no prior Relation message — stream decoded out of order?)"
            )
        return rel

    def _dml(self, lsn, op, rel, before, after) -> dict:
        return {
            "lsn": lsn, "operation": op, "table": rel.name,
            "commit_ts_ms": self._tx_commit_ts_ms,
            "before": before, "after": after,
        }


def decode_copy_stream(data: bytes) -> Iterator[tuple[int, bytes]]:
    """Recorded COPY-BOTH wire bytes → (walStart, pgoutput payload)
    per XLogData; keepalives and CopyDone are consumed silently."""
    i = 0
    n = len(data)
    while i < n:
        kind = data[i:i + 1]
        if not kind:
            return
        (length,) = struct.unpack_from(">i", data, i + 1)
        body = data[i + 5:i + 1 + length]
        i += 1 + length
        if kind == b"d":  # CopyData
            sub = body[0:1]
            if sub == b"w":  # XLogData
                (wal_start,) = struct.unpack_from(">q", body, 1)
                # walEnd i64 + clock i64 then payload
                yield wal_start, body[25:]
            elif sub == b"k":  # keepalive
                continue
            else:
                raise ValueError(
                    f"pgoutput: unknown CopyData sub-message {sub!r}"
                )
        elif kind == b"c":  # CopyDone
            return
        else:
            raise ValueError(f"pgoutput: unknown frame {kind!r}")


def decode_pgoutput_bytes(data: bytes,
                          decoder: PgoutputDecoder | None = None
                          ) -> Iterator[dict]:
    """Full pipeline: recorded wire bytes → envelope records."""
    dec = decoder or PgoutputDecoder()
    for wal_start, payload in decode_copy_stream(data):
        yield from dec.decode_message(wal_start, payload)


def decode_pgoutput_file(path: str,
                         decoder: PgoutputDecoder | None = None
                         ) -> Iterator[dict]:
    with open(path, "rb") as fh:
        yield from decode_pgoutput_bytes(fh.read(), decoder)


# ---------------------------------------------------------------------
# fixture recorder — encodes the SAME public wire format, so tests and
# offline users can synthesize recorded streams a real server would
# produce (protocol round-trip: encode here, decode above)
# ---------------------------------------------------------------------


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\0"


def _text_value(v: Any) -> bytes | None:
    """Python value → PG text-format bytes for the fixture stream."""
    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, bytes):
        return b"\\x" + v.hex().encode()
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":")).encode()
    return str(v).encode("utf-8")


def _tuple_data(rel_cols: list[tuple], row: dict | None) -> bytes:
    out = struct.pack(">h", len(rel_cols))
    for _flags, name, _oid, _typmod in rel_cols:
        v = (row or {}).get(name)
        if v is UNCHANGED_TOAST or v == UNCHANGED_TOAST:
            out += b"u"
        elif v is None:
            out += b"n"
        else:
            tv = _text_value(v)
            out += b"t" + struct.pack(">i", len(tv)) + tv
    return out


class PgoutputFixtureWriter:
    """Builds a recorded COPY-BOTH byte stream (the exact wire format
    decode_copy_stream consumes).  LSNs advance by one per message;
    commit timestamps are PG-epoch µs."""

    def __init__(self, start_lsn: int = 1):
        self.frames = bytearray()
        self.lsn = start_lsn
        self._wstream_sub: int | None = None

    def _xlog(self, payload: bytes) -> None:
        # protocol v2: inside a stream segment, content messages carry
        # the (sub)transaction xid right after the tag byte
        if self._wstream_sub is not None and payload[:1] in (
                b"R", b"I", b"U", b"D", b"T", b"M"):
            payload = (payload[:1]
                       + struct.pack(">i", self._wstream_sub)
                       + payload[1:])
        body = (
            b"w"
            + struct.pack(">qqq", self.lsn, self.lsn, 0)
            + payload
        )
        self.frames += b"d" + struct.pack(">i", 4 + len(body)) + body
        self.lsn += 1

    # -- protocol v2 streamed transactions -----------------------------

    def stream_start(self, xid: int, first_segment: bool = True,
                     sub_xid: int | None = None) -> None:
        self._wstream_sub = None  # the S message itself is unprefixed
        self._xlog(b"S" + struct.pack(">i", xid)
                   + bytes([1 if first_segment else 0]))
        self._wstream_sub = sub_xid if sub_xid is not None else xid

    def stream_sub(self, sub_xid: int) -> None:
        """Switch the xid prefix mid-segment (a subtransaction)."""
        self._wstream_sub = sub_xid

    def stream_stop(self) -> None:
        self._wstream_sub = None
        self._xlog(b"E")

    def stream_commit(self, xid: int, commit_ts_us: int) -> None:
        self._xlog(b"c" + struct.pack(">i", xid) + bytes([0])
                   + struct.pack(">qqq", self.lsn, self.lsn,
                                 commit_ts_us))

    def stream_abort(self, xid: int, sub_xid: int | None = None) -> None:
        self._xlog(b"A" + struct.pack(
            ">ii", xid, sub_xid if sub_xid is not None else xid))

    def relation(self, oid: int, name: str,
                 columns: list[tuple[str, int]],
                 namespace: str = "public",
                 key_flags: list[int] | None = None) -> None:
        flags = key_flags or [1] + [0] * (len(columns) - 1)
        payload = (
            b"R" + struct.pack(">i", oid) + _cstr(namespace) + _cstr(name)
            + bytes([ord("d")]) + struct.pack(">h", len(columns))
        )
        for (cname, toid), fl in zip(columns, flags):
            payload += bytes([fl]) + _cstr(cname) + struct.pack(
                ">ii", toid, -1)
        self._xlog(payload)
        self._cols = [(fl, cname, toid, -1)
                      for (cname, toid), fl in zip(columns, flags)]
        self._oid = oid

    def use_relation(self, oid: int, columns: list[tuple[str, int]],
                     key_flags: list[int] | None = None) -> None:
        """Point subsequent DML at a relation declared in an EARLIER
        recording segment (no Relation message re-emitted)."""
        flags = key_flags or [1] + [0] * (len(columns) - 1)
        self._cols = [(fl, cname, toid, -1)
                      for (cname, toid), fl in zip(columns, flags)]
        self._oid = oid

    def begin(self, commit_ts_us: int, xid: int = 1) -> None:
        self._xlog(b"B" + struct.pack(">qqi", self.lsn, commit_ts_us, xid))

    def commit(self, commit_ts_us: int) -> None:
        self._xlog(
            b"C" + bytes([0]) + struct.pack(">qqq", self.lsn, self.lsn,
                                            commit_ts_us))

    def insert(self, row: dict) -> None:
        self._xlog(b"I" + struct.pack(">i", self._oid) + b"N"
                   + _tuple_data(self._cols, row))

    def update(self, after: dict, before: dict | None = None,
               key_only: bool = True) -> None:
        payload = b"U" + struct.pack(">i", self._oid)
        if before is not None:
            payload += (b"K" if key_only else b"O") + _tuple_data(
                self._cols, before)
        payload += b"N" + _tuple_data(self._cols, after)
        self._xlog(payload)

    def delete(self, before: dict, key_only: bool = True) -> None:
        self._xlog(b"D" + struct.pack(">i", self._oid)
                   + (b"K" if key_only else b"O")
                   + _tuple_data(self._cols, before))

    def truncate(self, oids: list[int], options: int = 0) -> None:
        payload = b"T" + struct.pack(">i", len(oids)) + bytes([options])
        for oid in oids:
            payload += struct.pack(">i", oid)
        self._xlog(payload)

    def keepalive(self) -> None:
        body = b"k" + struct.pack(">qq", self.lsn, 0) + bytes([0])
        self.frames += b"d" + struct.pack(">i", 4 + len(body)) + body

    def message(self, prefix: str, content: bytes) -> None:
        self._xlog(b"M" + bytes([0]) + struct.pack(">q", self.lsn)
                   + _cstr(prefix) + struct.pack(">i", len(content))
                   + content)

    def copy_done(self) -> None:
        self.frames += b"c" + struct.pack(">i", 4)

    def getvalue(self) -> bytes:
        return bytes(self.frames)
