"""MySQL binlog (ROW format) decoder over recorded binlog files.

The reference's mysql_cdc input consumes the server's binary log in
ROW mode (internal/impl/mysql/input_mysql_stream.go:48-50,202 —
snapshot then binlog tail, position/GTID checkpointed in a cache).
This module independently implements the PUBLIC binlog file format
(MySQL Internals manual, "Binary log file format" / "ROW-based
replication events") for *recorded* binlog files — the bytes
``mysqlbinlog --read-from-remote-server --raw`` saves:

  4-byte magic 0xFE 'bin', then v4 events, each:
    header (19 bytes, little-endian):
      timestamp u32, event_type u8, server_id u32,
      event_size u32 (incl header), log_pos u32, flags u16
    followed by the event body.

Decoded events:
  FORMAT_DESCRIPTION (15)  binlog version + server version (consumed)
  ROTATE (4)               next file name (consumed)
  GTID (33)                flags u8, SID 16B, GNO u64 — tracked so the
                           offset layer can expose GTID positions
  QUERY (2)                BEGIN markers → operation "begin"
  XID (16)                 commit marker → operation "commit"
  TABLE_MAP (19)           table_id 6B, flags u16; schema + table
                           name, column count, column types, per-type
                           metadata, null bitmap
  WRITE/UPDATE/DELETE_ROWS v2 (30/31/32)
                           table_id 6B, flags u16, extra-len u16;
                           ncols lenenc, present bitmap(s), rows:
                           null bitmap + packed values
                           (update: before image + after image)

Column-type codecs (MySQL wire "Type" codes): TINY/SHORT/INT24/LONG/
LONGLONG (signed LE), FLOAT/DOUBLE, VARCHAR & VAR_STRING (1/2-byte
length by metadata max), BLOB (metadata length-bytes), DATE (3B
packed), DATETIME2 (5B big-endian packed + fsp fractional),
NEWDECIMAL (packed 9-digit groups, sign-bit in MSB, negatives
bit-inverted) → decimal STRING (arbitrary precision preserved, the
same normalization the postgres path applies to numeric), and JSON —
MySQL binary JSON (small/large objects and arrays, inlined literals
and int16/uint16, varlen strings, all numeric scalars) decoded to the
structural value, as the reference's go-mysql decoder surfaces it.

The envelope matches sources/cdc_stream.py::CDC_ENVELOPE; the LSN is
the canonical binlog position packed as (file_seq << 32) | log_pos so
resume filters on real replication coordinates.
"""

from __future__ import annotations

import base64
import struct
from dataclasses import dataclass, field
from typing import Any, Iterator

BINLOG_MAGIC = b"\xfebin"

# event type codes (public constants)
EV_QUERY = 2
EV_ROTATE = 4
EV_FORMAT_DESCRIPTION = 15
EV_XID = 16
EV_TABLE_MAP = 19
EV_WRITE_ROWS_V2 = 30
EV_UPDATE_ROWS_V2 = 31
EV_DELETE_ROWS_V2 = 32
EV_GTID = 33

# column type codes
T_DECIMAL = 0
T_TINY = 1
T_SHORT = 2
T_LONG = 3
T_FLOAT = 4
T_DOUBLE = 5
T_NULL = 6
T_TIMESTAMP = 7
T_LONGLONG = 8
T_INT24 = 9
T_DATE = 10
T_TIME = 11
T_DATETIME = 12
T_YEAR = 13
T_VARCHAR = 15
T_BIT = 16
T_TIMESTAMP2 = 17
T_DATETIME2 = 18
T_TIME2 = 19
T_JSON = 245
T_NEWDECIMAL = 246
T_BLOB = 252
T_VAR_STRING = 253
T_STRING = 254

_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


class _Cur:
    """Little-endian cursor (MySQL wire order)."""

    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0):
        self.b = b
        self.i = i

    def u8(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def u16(self) -> int:
        (v,) = struct.unpack_from("<H", self.b, self.i)
        self.i += 2
        return v

    def u24(self) -> int:
        b = self.b[self.i:self.i + 3]
        self.i += 3
        return b[0] | (b[1] << 8) | (b[2] << 16)

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.b, self.i)
        self.i += 4
        return v

    def u48(self) -> int:
        b = self.b[self.i:self.i + 6]
        self.i += 6
        return int.from_bytes(b, "little")

    def u64(self) -> int:
        (v,) = struct.unpack_from("<Q", self.b, self.i)
        self.i += 8
        return v

    def lenenc(self) -> int:
        v = self.u8()
        if v < 0xFB:
            return v
        if v == 0xFC:
            return self.u16()
        if v == 0xFD:
            return self.u24()
        if v == 0xFE:
            return self.u64()
        raise ValueError(f"binlog: bad length-encoded int prefix {v:#x}")

    def take(self, n: int) -> bytes:
        v = self.b[self.i:self.i + n]
        self.i += n
        return v


def _bitmap_get(bm: bytes, idx: int) -> bool:
    return bool(bm[idx // 8] & (1 << (idx % 8)))


def _decode_decimal(data: bytes, precision: int, scale: int) -> str:
    """NEWDECIMAL packed format → decimal string (MySQL Internals,
    "DECIMAL binary storage"): big-endian 9-digit groups of 4 bytes
    with a compressed leading group; MSB of the first byte is the sign
    (1 = non-negative); negative values are stored bit-inverted."""
    intg = precision - scale
    intg_full, intg_part = divmod(intg, 9)
    frac_full, frac_part = divmod(scale, 9)
    raw = bytearray(data)
    positive = bool(raw[0] & 0x80)
    raw[0] ^= 0x80
    if not positive:
        raw = bytearray(b ^ 0xFF for b in raw)
    cur = 0
    digits = ""
    if intg_part:
        n = _DIG2BYTES[intg_part]
        digits += str(int.from_bytes(raw[cur:cur + n], "big"))
        cur += n
    for _ in range(intg_full):
        digits += str(int.from_bytes(raw[cur:cur + 4], "big")).zfill(9)
        cur += 4
    int_str = digits.lstrip("0") or "0"
    frac = ""
    for _ in range(frac_full):
        frac += str(int.from_bytes(raw[cur:cur + 4], "big")).zfill(9)
        cur += 4
    if frac_part:
        n = _DIG2BYTES[frac_part]
        frac += str(
            int.from_bytes(raw[cur:cur + n], "big")
        ).zfill(frac_part)
        cur += n
    out = int_str + ("." + frac if scale else "")
    return ("-" if not positive else "") + out


def _decode_datetime2(data: bytes, fsp: int) -> str:
    """DATETIME2: 5 bytes big-endian packed (sign 1b, yearmonth 17b,
    day 5b, hour 5b, minute 6b, second 6b) + fsp fractional bytes."""
    packed = int.from_bytes(data[:5], "big")
    second = packed & 0x3F
    minute = (packed >> 6) & 0x3F
    hour = (packed >> 12) & 0x1F
    day = (packed >> 17) & 0x1F
    yearmonth = (packed >> 22) & 0x1FFFF
    year, month = divmod(yearmonth, 13)
    out = f"{year:04d}-{month:02d}-{day:02d} {hour:02d}:{minute:02d}:{second:02d}"
    if fsp:
        # fractional storage is 2*ceil(fsp/2) digits; display = fsp
        nbytes = (fsp + 1) // 2
        frac = int.from_bytes(data[5:5 + nbytes], "big")
        out += "." + str(frac).zfill(2 * nbytes)[:fsp]
    return out


def _decode_date(v: int) -> str:
    day = v & 0x1F
    month = (v >> 5) & 0x0F
    year = v >> 9
    return f"{year:04d}-{month:02d}-{day:02d}"


@dataclass
class TableMap:
    table_id: int
    schema: str
    name: str
    col_types: list[int]
    col_meta: list[int]  # packed metadata value per column
    col_names: list[str]  # optional (from options); else c0..cN


@dataclass
class BinlogDecoder:
    """Stateful v4 binlog event decoder → CDC envelope records."""

    column_names: dict[str, list[str]] = field(default_factory=dict)
    tables: dict[int, TableMap] = field(default_factory=dict)
    last_gtid: tuple[str, int] | None = None
    _ts_ms: int = 0
    # binlog_checksum algorithm from the FDE (0 = off, 1 = CRC32).
    # Real servers default to CRC32 since 5.6.6: every event then
    # carries a 4-byte CRC32 trailer inside event_size that must be
    # stripped (and can be verified) before body parsing.
    checksum_alg: int = 0

    # -- value decoding -------------------------------------------------
    def _value(self, cur: _Cur, ctype: int, meta: int) -> Any:
        if ctype == T_TINY:
            v = cur.u8()
            return v - 256 if v >= 128 else v
        if ctype == T_SHORT:
            (v,) = struct.unpack_from("<h", cur.b, cur.i)
            cur.i += 2
            return v
        if ctype == T_INT24:
            v = cur.u24()
            return v - (1 << 24) if v >= (1 << 23) else v
        if ctype == T_LONG:
            (v,) = struct.unpack_from("<i", cur.b, cur.i)
            cur.i += 4
            return v
        if ctype == T_LONGLONG:
            (v,) = struct.unpack_from("<q", cur.b, cur.i)
            cur.i += 8
            return v
        if ctype == T_FLOAT:
            (v,) = struct.unpack_from("<f", cur.b, cur.i)
            cur.i += 4
            return v
        if ctype == T_DOUBLE:
            (v,) = struct.unpack_from("<d", cur.b, cur.i)
            cur.i += 8
            return v
        if ctype == T_YEAR:
            return 1900 + cur.u8()
        if ctype in (T_VARCHAR, T_VAR_STRING):
            n = cur.u16() if meta > 255 else cur.u8()
            return cur.take(n).decode("utf-8")
        if ctype == T_STRING:
            # short CHAR(n): meta low byte is max length (subset; the
            # dual-byte packed form for >255 is not produced by the
            # supported fixture surface)
            maxlen = meta & 0xFF
            n = cur.u16() if maxlen > 255 else cur.u8()
            return cur.take(n).decode("utf-8")
        if ctype in (T_BLOB, T_JSON):
            nbytes = meta or 2
            n = int.from_bytes(cur.take(nbytes), "little")
            raw = cur.take(n)
            if ctype == T_BLOB:
                return base64.b64encode(raw).decode()
            # JSON columns carry MySQL binary JSON — decode to the
            # structural value (decode_mysql_json below)
            return decode_mysql_json(raw)
        if ctype == T_DATE:
            return _decode_date(cur.u24())
        if ctype == T_DATETIME2:
            fsp = meta
            n = 5 + (fsp + 1) // 2
            return _decode_datetime2(cur.take(n), fsp)
        if ctype == T_TIMESTAMP2:
            fsp = meta
            secs = int.from_bytes(cur.take(4), "big")
            out = str(secs)
            if fsp:
                # same storage rule as DATETIME2: 2*ceil(fsp/2) digits
                nbytes = (fsp + 1) // 2
                frac = int.from_bytes(cur.take(nbytes), "big")
                out += "." + str(frac).zfill(2 * nbytes)[:fsp]
            return out
        if ctype == T_NEWDECIMAL:
            precision = meta >> 8
            scale = meta & 0xFF
            intg = precision - scale
            nbytes = (
                (intg // 9) * 4 + _DIG2BYTES[intg % 9]
                + (scale // 9) * 4 + _DIG2BYTES[scale % 9]
            )
            return _decode_decimal(cur.take(nbytes), precision, scale)
        raise ValueError(f"binlog: unsupported column type {ctype}")

    def _meta_len(self, ctype: int) -> int:
        if ctype in (T_VARCHAR, T_VAR_STRING, T_STRING, T_NEWDECIMAL,
                     T_BIT):
            return 2
        if ctype in (T_BLOB, T_JSON, T_FLOAT, T_DOUBLE, T_DATETIME2,
                     T_TIMESTAMP2, T_TIME2):
            return 1
        return 0

    def _row_image(self, cur: _Cur, tm: TableMap,
                   present: bytes) -> dict[str, Any]:
        ncols = len(tm.col_types)
        used = [i for i in range(ncols) if _bitmap_get(present, i)]
        nullbm = cur.take((len(used) + 7) // 8)
        row: dict[str, Any] = {}
        for j, i in enumerate(used):
            name = (tm.col_names[i] if i < len(tm.col_names)
                    else f"c{i}")
            if _bitmap_get(nullbm, j):
                row[name] = None
            else:
                row[name] = self._value(cur, tm.col_types[i],
                                        tm.col_meta[i])
        return row

    # -- event decoding -------------------------------------------------
    def decode_event(self, etype: int, ts: int, log_pos: int,
                     body: bytes, lsn: int) -> Iterator[dict]:
        self._ts_ms = ts * 1000
        if etype in (EV_FORMAT_DESCRIPTION, EV_ROTATE):
            return
        if etype == EV_GTID:
            cur = _Cur(body)
            cur.u8()  # flags
            sid = cur.take(16)
            gno = cur.u64()
            self.last_gtid = (sid.hex(), gno)
            return
        if etype == EV_QUERY:
            cur = _Cur(body)
            cur.u32()  # thread id
            cur.u32()  # exec time
            db_len = cur.u8()
            cur.u16()  # error code
            status_len = cur.u16()
            cur.take(status_len)
            cur.take(db_len + 1)
            sql = body[cur.i:].decode("utf-8", "replace")
            if sql.strip().upper() == "BEGIN":
                yield self._marker("begin", lsn)
            return
        if etype == EV_XID:
            yield self._marker("commit", lsn)
            return
        if etype == EV_TABLE_MAP:
            cur = _Cur(body)
            table_id = cur.u48()
            cur.u16()  # flags
            slen = cur.u8()
            schema = cur.take(slen).decode()
            cur.u8()  # nul
            tlen = cur.u8()
            name = cur.take(tlen).decode()
            cur.u8()  # nul
            ncols = cur.lenenc()
            ctypes = list(cur.take(ncols))
            meta_len = cur.lenenc()
            meta_raw = _Cur(cur.take(meta_len))
            metas: list[int] = []
            for t in ctypes:
                ml = self._meta_len(t)
                if ml == 0:
                    metas.append(0)
                elif ml == 1:
                    metas.append(meta_raw.u8())
                else:
                    if t in (T_VARCHAR, T_VAR_STRING):
                        metas.append(meta_raw.u16())
                    elif t == T_NEWDECIMAL:
                        metas.append(
                            (meta_raw.u8() << 8) | meta_raw.u8())
                    else:  # STRING/BIT: two meta bytes, packed
                        metas.append(
                            (meta_raw.u8() << 8) | meta_raw.u8())
            names = self.column_names.get(
                f"{schema}.{name}", self.column_names.get(name, []))
            # MySQL 8.0 optional metadata (binlog_row_metadata=FULL):
            # after the null-allowed bitmap the event may carry TLV
            # blocks; COLUMN_NAME (type 4) makes the log
            # self-describing — embedded names beat the external map
            if len(cur.b) - cur.i >= (ncols + 7) // 8:
                cur.take((ncols + 7) // 8)  # null-allowed bitmap
            embedded: list[str] = []
            while len(cur.b) - cur.i >= 2:
                tlv_type = cur.u8()
                tlv_len = cur.lenenc()
                tlv = _Cur(cur.take(tlv_len))
                if tlv_type == 4:  # COLUMN_NAME
                    while tlv.i < len(tlv.b):
                        n = tlv.lenenc()
                        embedded.append(tlv.take(n).decode())
                # SIGNEDNESS/charset/enum TLVs carry no info the
                # envelope needs — skipped by the length field
            if embedded:
                names = embedded
            self.tables[table_id] = TableMap(
                table_id, schema, name, ctypes, metas, names)
            return
        if etype in (EV_WRITE_ROWS_V2, EV_UPDATE_ROWS_V2,
                     EV_DELETE_ROWS_V2):
            cur = _Cur(body)
            table_id = cur.u48()
            cur.u16()  # flags
            extra_len = cur.u16()
            cur.take(extra_len - 2)
            tm = self.tables.get(table_id)
            if tm is None:
                raise ValueError(
                    f"binlog: row event for unmapped table id {table_id}"
                )
            ncols = cur.lenenc()
            present1 = cur.take((ncols + 7) // 8)
            present2 = (cur.take((ncols + 7) // 8)
                        if etype == EV_UPDATE_ROWS_V2 else present1)
            # all rows of one event share the event's log_pos in the
            # real log; sub-number them in the envelope LSN's low bits
            # so last-writer-wins ordering is total (decode_binlog_
            # bytes left 16 bits of room)
            row_idx = 0
            while cur.i < len(cur.b):
                if etype == EV_WRITE_ROWS_V2:
                    after = self._row_image(cur, tm, present1)
                    yield self._dml("insert", tm, None, after,
                                    lsn + row_idx)
                elif etype == EV_DELETE_ROWS_V2:
                    before = self._row_image(cur, tm, present1)
                    yield self._dml("delete", tm, before, None,
                                    lsn + row_idx)
                else:
                    before = self._row_image(cur, tm, present1)
                    after = self._row_image(cur, tm, present2)
                    yield self._dml("update", tm, before, after,
                                    lsn + row_idx)
                row_idx += 1
            return
        # unknown/ignorable event types are skipped (the format is
        # forward-extensible; unknown events carry their own size)

    def _marker(self, op: str, lsn: int) -> dict:
        return {"lsn": lsn, "operation": op, "table": "",
                "commit_ts_ms": self._ts_ms, "before": None,
                "after": None}

    def _dml(self, op, tm: TableMap, before, after, lsn) -> dict:
        return {"lsn": lsn, "operation": op,
                "table": tm.name, "commit_ts_ms": self._ts_ms,
                "before": before, "after": after}


def decode_binlog_bytes(data: bytes, decoder: BinlogDecoder,
                        file_seq: int = 0,
                        verify_checksum: bool = True) -> Iterator[dict]:
    """One binlog FILE (magic + events) → envelope records with
    lsn = ((file_seq << 32) | log_pos) << 16 | row_index — the
    canonical binlog coordinates in the high bits (so resume filters
    on real replication position) with within-event row order in the
    low 16 (a multi-row event shares one log_pos in the real log).

    The FDE's checksum-algorithm byte is honored: with
    binlog_checksum=CRC32 (the server default since 5.6.6) every
    event's 4-byte trailer is stripped before body parsing and
    verified with zlib.crc32 unless verify_checksum=False."""
    import zlib as _zlib

    if data[:4] != BINLOG_MAGIC:
        raise ValueError("binlog: missing magic bytes")
    i = 4
    n = len(data)
    while i + 19 <= n:
        ts, etype = struct.unpack_from("<IB", data, i)
        event_size, log_pos = struct.unpack_from("<II", data, i + 9)
        body = data[i + 19:i + event_size]
        if etype == EV_FORMAT_DESCRIPTION and len(body) >= 57:
            # servers >= 5.6.1 append checksum_alg(1) + own_crc(4) to
            # the FDE (0 off / 1 CRC32); older versions have neither,
            # so gate on the embedded server-version string
            ver = body[2:52].split(b"\0", 1)[0].decode(
                "latin-1", "replace")
            parts = ver.split("-")[0].split(".")
            try:
                vtup = tuple(int(x) for x in parts[:3])
            except ValueError:
                vtup = (0,)
            if vtup >= (5, 6, 1) and len(body) >= 5:
                decoder.checksum_alg = body[-5] if body[-5] == 1 else 0
        if decoder.checksum_alg == 1:
            trailer = body[-4:]
            body = body[:-4]
            if verify_checksum:
                crc = _zlib.crc32(data[i:i + event_size - 4])
                if crc != struct.unpack("<I", trailer)[0]:
                    raise ValueError(
                        f"binlog: CRC32 mismatch on event at {i} "
                        f"(type {etype})"
                    )
        lsn = ((file_seq << 32) | log_pos) << 16
        yield from decoder.decode_event(etype, ts, log_pos, body, lsn)
        i += event_size


def decode_binlog_file(path: str, decoder: BinlogDecoder,
                       file_seq: int = 0) -> Iterator[dict]:
    with open(path, "rb") as fh:
        yield from decode_binlog_bytes(fh.read(), decoder, file_seq)


# ---------------------------------------------------------------------
# fixture recorder — encodes the same public file format
# ---------------------------------------------------------------------


class BinlogFixtureWriter:
    """Builds a v4 binlog file byte-for-byte (magic, FDE, then
    events) so tests and offline users can synthesize recorded logs.
    Column values encode through the same public type formats the
    decoder reads."""

    def __init__(self, server_id: int = 1, ts: int = 1_700_000_000,
                 checksum: bool = False):
        self.buf = bytearray(BINLOG_MAGIC)
        self.server_id = server_id
        self.ts = ts
        self.checksum = checksum
        self._fde()

    # -- low level ------------------------------------------------------
    def _event(self, etype: int, body: bytes, flags: int = 0) -> None:
        import zlib as _zlib

        trailer = 4 if self.checksum else 0
        size = 19 + len(body) + trailer
        log_pos = len(self.buf) + size
        header = struct.pack(
            "<IBIIIH", self.ts, etype, self.server_id, size, log_pos,
            flags)
        self.buf += header + body
        if self.checksum:
            crc = _zlib.crc32(header + body)
            self.buf += struct.pack("<I", crc)

    def _fde(self) -> None:
        body = struct.pack("<H", 4) + b"8.0.30".ljust(50, b"\0") \
            + struct.pack("<I", self.ts) + bytes([19]) \
            + bytes(39) + bytes([1 if self.checksum else 0])
        self._event(EV_FORMAT_DESCRIPTION, body)

    # -- events ---------------------------------------------------------
    def gtid(self, sid_hex: str, gno: int) -> None:
        body = bytes([0]) + bytes.fromhex(sid_hex) + struct.pack(
            "<Q", gno)
        self._event(EV_GTID, body)

    def begin(self) -> None:
        body = struct.pack("<IIBHH", 1, 0, 0, 0, 0) + b"\0" + b"BEGIN"
        self._event(EV_QUERY, body)

    def xid(self, xid: int = 1) -> None:
        self._event(EV_XID, struct.pack("<Q", xid))

    def table_map(self, table_id: int, schema: str, name: str,
                  columns: list[tuple[str, int, int]],
                  embed_names: bool = False) -> None:
        """columns: (name, type_code, metadata). Metadata per type:
        VARCHAR max byte length; NEWDECIMAL (precision<<8)|scale;
        BLOB/JSON length-bytes; DATETIME2/TIMESTAMP2 fsp."""
        self._tm_cols = columns
        self._tm_id = table_id
        body = (
            int(table_id).to_bytes(6, "little") + struct.pack("<H", 1)
            + bytes([len(schema)]) + schema.encode() + b"\0"
            + bytes([len(name)]) + name.encode() + b"\0"
            + bytes([len(columns)])
            + bytes(t for _n, t, _m in columns)
        )
        meta = bytearray()
        for _n, t, m in columns:
            if t in (T_VARCHAR, T_VAR_STRING):
                meta += struct.pack("<H", m)
            elif t == T_NEWDECIMAL:
                meta += bytes([m >> 8, m & 0xFF])
            elif t in (T_STRING, T_BIT):
                meta += bytes([m >> 8, m & 0xFF])
            elif t in (T_BLOB, T_JSON, T_FLOAT, T_DOUBLE,
                       T_DATETIME2, T_TIMESTAMP2, T_TIME2):
                meta += bytes([m])
        body += bytes([len(meta)]) + bytes(meta)
        body += bytes((len(columns) + 7) // 8)  # null-allowed bitmap
        if embed_names:
            # binlog_row_metadata=FULL COLUMN_NAME TLV: the log names
            # its own columns, no external mapping needed
            blob = b"".join(
                bytes([len(n.encode())]) + n.encode()
                for n, _t, _m in columns)
            body += bytes([4, len(blob)]) + blob
        self._event(EV_TABLE_MAP, body)

    def _encode_value(self, v: Any, ctype: int, meta: int) -> bytes:
        if ctype == T_TINY:
            return struct.pack("<b", v)
        if ctype == T_SHORT:
            return struct.pack("<h", v)
        if ctype == T_INT24:
            return int(v & 0xFFFFFF).to_bytes(3, "little")
        if ctype == T_LONG:
            return struct.pack("<i", v)
        if ctype == T_LONGLONG:
            return struct.pack("<q", v)
        if ctype == T_FLOAT:
            return struct.pack("<f", v)
        if ctype == T_DOUBLE:
            return struct.pack("<d", v)
        if ctype == T_YEAR:
            return bytes([v - 1900])
        if ctype in (T_VARCHAR, T_VAR_STRING, T_STRING):
            raw = str(v).encode("utf-8")
            if (meta & 0xFF if ctype == T_STRING else meta) > 255:
                return struct.pack("<H", len(raw)) + raw
            return bytes([len(raw)]) + raw
        if ctype == T_JSON:
            raw = v if isinstance(v, bytes) else encode_mysql_json(v)
            nbytes = meta or 2
            return len(raw).to_bytes(nbytes, "little") + raw
        if ctype == T_BLOB:
            raw = v if isinstance(v, bytes) else str(v).encode()
            nbytes = meta or 2
            return len(raw).to_bytes(nbytes, "little") + raw
        if ctype == T_DATE:
            y, m, d = (int(x) for x in str(v).split("-"))
            return ((y << 9) | (m << 5) | d).to_bytes(3, "little")
        if ctype == T_DATETIME2:
            date, time = str(v).split(" ")
            y, mo, d = (int(x) for x in date.split("-"))
            hh, mm, ss = (int(float(x)) for x in time.split(":"))
            packed = ((((y * 13 + mo) & 0x1FFFF) << 22)
                      | (d << 17) | (hh << 12) | (mm << 6) | ss)
            out = packed.to_bytes(5, "big")
            fsp = meta
            if fsp:
                frac = 0
                if "." in time:
                    fs = time.split(".")[-1].ljust(6, "0")[:6]
                    frac = int(fs) // 10 ** (6 - 2 * ((fsp + 1) // 2))
                out += frac.to_bytes((fsp + 1) // 2, "big")
            return out
        if ctype == T_NEWDECIMAL:
            precision = meta >> 8
            scale = meta & 0xFF
            return _encode_decimal(str(v), precision, scale)
        raise ValueError(f"fixture: unsupported type {ctype}")

    def _row_bytes(self, row: dict) -> bytes:
        cols = self._tm_cols
        nullbm = bytearray((len(cols) + 7) // 8)
        vals = bytearray()
        for i, (name, t, m) in enumerate(cols):
            v = row.get(name)
            if v is None:
                nullbm[i // 8] |= 1 << (i % 8)
            else:
                vals += self._encode_value(v, t, m)
        return bytes(nullbm) + bytes(vals)

    def _rows_event(self, etype: int, images: list[bytes]) -> None:
        ncols = len(self._tm_cols)
        present = bytes([0xFF] * ((ncols + 7) // 8))
        body = (
            int(self._tm_id).to_bytes(6, "little")
            + struct.pack("<H", 0) + struct.pack("<H", 2)
            + bytes([ncols]) + present
        )
        if etype == EV_UPDATE_ROWS_V2:
            body += present
        for img in images:
            body += img
        self._event(etype, body)

    def write_rows(self, rows: list[dict]) -> None:
        self._rows_event(
            EV_WRITE_ROWS_V2, [self._row_bytes(r) for r in rows])

    def update_rows(self, pairs: list[tuple[dict, dict]]) -> None:
        imgs = []
        for before, after in pairs:
            imgs.append(self._row_bytes(before) + self._row_bytes(after))
        self._rows_event(EV_UPDATE_ROWS_V2, imgs)

    def delete_rows(self, rows: list[dict]) -> None:
        self._rows_event(
            EV_DELETE_ROWS_V2, [self._row_bytes(r) for r in rows])

    def getvalue(self) -> bytes:
        return bytes(self.buf)


def _encode_decimal(s: str, precision: int, scale: int) -> bytes:
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    if "." in s:
        int_s, frac_s = s.split(".")
    else:
        int_s, frac_s = s, ""
    frac_s = frac_s.ljust(scale, "0")[:scale]
    intg = precision - scale
    int_s = int_s.zfill(intg)[-intg:] if intg else ""
    out = bytearray()
    intg_full, intg_part = divmod(intg, 9)
    pos = 0
    if intg_part:
        n = _DIG2BYTES[intg_part]
        out += int(int_s[:intg_part] or "0").to_bytes(n, "big")
        pos = intg_part
    for _ in range(intg_full):
        out += int(int_s[pos:pos + 9] or "0").to_bytes(4, "big")
        pos += 9
    frac_full, frac_part = divmod(scale, 9)
    pos = 0
    for _ in range(frac_full):
        out += int(frac_s[pos:pos + 9] or "0").to_bytes(4, "big")
        pos += 9
    if frac_part:
        n = _DIG2BYTES[frac_part]
        out += int(frac_s[pos:pos + frac_part] or "0").to_bytes(n, "big")
    if neg:
        out = bytearray(b ^ 0xFF for b in out)
        out[0] &= 0x7F
    else:
        out[0] |= 0x80
    return bytes(out)


# ---------------------------------------------------------------------
# MySQL binary JSON (the T_JSON column payload; public format docs —
# MySQL Internals "JSON binary format"). Decoded to Python values so
# JSON columns surface structurally, as the reference's go-mysql
# decoder does, instead of as opaque blobs.
# ---------------------------------------------------------------------

_JB_SMALL_OBJECT = 0x00
_JB_LARGE_OBJECT = 0x01
_JB_SMALL_ARRAY = 0x02
_JB_LARGE_ARRAY = 0x03
_JB_LITERAL = 0x04
_JB_INT16 = 0x05
_JB_UINT16 = 0x06
_JB_INT32 = 0x07
_JB_UINT32 = 0x08
_JB_INT64 = 0x09
_JB_UINT64 = 0x0A
_JB_DOUBLE = 0x0B
_JB_STRING = 0x0C


def _jb_varlen(data: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = data[i]
        i += 1
        n |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return n, i


def _jb_value(data: bytes, jtype: int) -> Any:
    """Decode one value whose payload starts at data[0]."""
    if jtype in (_JB_SMALL_OBJECT, _JB_LARGE_OBJECT,
                 _JB_SMALL_ARRAY, _JB_LARGE_ARRAY):
        large = jtype in (_JB_LARGE_OBJECT, _JB_LARGE_ARRAY)
        is_obj = jtype in (_JB_SMALL_OBJECT, _JB_LARGE_OBJECT)
        w = 4 if large else 2

        def rd(off):
            return int.from_bytes(data[off:off + w], "little")

        count = rd(0)
        pos = 2 * w  # count + size
        keys = []
        if is_obj:
            for k in range(count):
                koff = rd(pos)
                klen = int.from_bytes(
                    data[pos + w:pos + w + 2], "little")
                keys.append(data[koff:koff + klen].decode("utf-8"))
                pos += w + 2
        vals = []
        for _ in range(count):
            vtype = data[pos]
            inlined_types = (_JB_LITERAL, _JB_INT16, _JB_UINT16)
            if large:
                inlined_types += (_JB_INT32, _JB_UINT32)
            if vtype in inlined_types:
                raw = data[pos + 1:pos + 1 + w]
                if vtype == _JB_LITERAL:
                    vals.append({0: None, 1: True, 2: False}[raw[0]])
                elif vtype == _JB_INT16:
                    vals.append(int.from_bytes(
                        raw[:2], "little", signed=True))
                elif vtype == _JB_UINT16:
                    vals.append(int.from_bytes(raw[:2], "little"))
                elif vtype == _JB_INT32:
                    vals.append(int.from_bytes(
                        raw[:4], "little", signed=True))
                else:
                    vals.append(int.from_bytes(raw[:4], "little"))
            else:
                voff = int.from_bytes(
                    data[pos + 1:pos + 1 + w], "little")
                vals.append(_jb_value(data[voff:], vtype))
            pos += 1 + w
        return dict(zip(keys, vals)) if is_obj else vals
    if jtype == _JB_LITERAL:
        return {0: None, 1: True, 2: False}[data[0]]
    if jtype == _JB_INT16:
        return int.from_bytes(data[:2], "little", signed=True)
    if jtype == _JB_UINT16:
        return int.from_bytes(data[:2], "little")
    if jtype == _JB_INT32:
        return int.from_bytes(data[:4], "little", signed=True)
    if jtype == _JB_UINT32:
        return int.from_bytes(data[:4], "little")
    if jtype == _JB_INT64:
        return int.from_bytes(data[:8], "little", signed=True)
    if jtype == _JB_UINT64:
        return int.from_bytes(data[:8], "little")
    if jtype == _JB_DOUBLE:
        return struct.unpack("<d", data[:8])[0]
    if jtype == _JB_STRING:
        n, i = _jb_varlen(data, 0)
        return data[i:i + n].decode("utf-8")
    raise ValueError(f"binlog json: unsupported type byte {jtype:#x}")


def decode_mysql_json(data: bytes) -> Any:
    """Full binary-JSON document (leading type byte) → Python value."""
    if not data:
        return None
    return _jb_value(data[1:], data[0])


def encode_mysql_json(value: Any) -> bytes:
    """Python value → binary JSON (for fixture recording)."""
    jtype, payload = _jb_encode_value(value)
    return bytes([jtype]) + payload


def _jb_encode_value(value: Any) -> tuple[int, bytes]:
    if value is None:
        return _JB_LITERAL, b"\x00"
    if value is True:
        return _JB_LITERAL, b"\x01"
    if value is False:
        return _JB_LITERAL, b"\x02"
    if isinstance(value, int):
        if -(1 << 15) <= value < (1 << 15):
            return _JB_INT16, value.to_bytes(2, "little", signed=True)
        if -(1 << 31) <= value < (1 << 31):
            return _JB_INT32, value.to_bytes(4, "little", signed=True)
        return _JB_INT64, value.to_bytes(8, "little", signed=True)
    if isinstance(value, float):
        return _JB_DOUBLE, struct.pack("<d", value)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        n = len(raw)
        varlen = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                varlen.append(b | 0x80)
            else:
                varlen.append(b)
                break
        return _JB_STRING, bytes(varlen) + raw
    if isinstance(value, (list, dict)):
        is_obj = isinstance(value, dict)
        items = (sorted(value.items(), key=lambda kv: (len(kv[0]), kv[0]))
                 if is_obj else [(None, v) for v in value])
        count = len(items)
        w = 2  # small form (fixture surface)
        header = 2 * w + (w + 2) * count * (1 if is_obj else 0) \
            + (1 + w) * count
        body = bytearray()
        key_entries = bytearray()
        val_entries = bytearray()
        key_blob = bytearray()
        # keys first (after the entry tables), then values
        key_base = header
        for k, _v in items:
            if is_obj:
                kb = k.encode("utf-8")
                key_entries += (key_base + len(key_blob)).to_bytes(
                    2, "little")
                key_entries += len(kb).to_bytes(2, "little")
                key_blob += kb
        val_base = key_base + len(key_blob)
        val_blob = bytearray()
        for _k, v in items:
            jt, payload = _jb_encode_value(v)
            if jt in (_JB_LITERAL, _JB_INT16, _JB_UINT16):
                val_entries += bytes([jt]) + payload.ljust(w, b"\0")
            else:
                val_entries += bytes([jt]) + (
                    val_base + len(val_blob)).to_bytes(2, "little")
                val_blob += payload
        total = val_base + len(val_blob)
        out = count.to_bytes(2, "little") + total.to_bytes(2, "little") \
            + bytes(key_entries) + bytes(val_entries) \
            + bytes(key_blob) + bytes(val_blob)
        return (_JB_SMALL_OBJECT if is_obj else _JB_SMALL_ARRAY), out
    raise ValueError(f"binlog json: cannot encode {type(value)}")
