"""Native change-record formats for the non-wire CDC kinds.

pgoutput (sources/pgoutput.py), binlog (sources/binlog.py) and
LogMiner redo SQL (sources/sqlredo.py) cover the three byte/SQL-level
connectors.  The remaining reference CDC inputs consume *structured*
change representations — a SQL resultset or a JSON event stream the
upstream service itself defines.  This module decodes RECORDINGS of
each service's own documented representation into the engine's CDC
envelope, replacing the generic JSONL bridge for these kinds:

- microsoft_sql_server_cdc → rows of
  ``cdc.fn_cdc_get_all_changes_<instance>`` (public SQL Server CDC
  docs): ``__$start_lsn`` (10-byte LSN as vlf:block:slot hex),
  ``__$seqval``, ``__$operation`` (1 delete / 2 insert / 3 update
  before-image / 4 update after-image) + captured columns; 3/4 pairs
  merge into one update record, mirroring
  internal/impl/mssqlserver's polling loop.
- mongodb_cdc → change stream events (operationType, documentKey,
  fullDocument, updateDescription, clusterTime BSON-timestamp,
  ns.coll).
- aws_dynamodb_cdc → DynamoDB Streams records (eventName INSERT/
  MODIFY/REMOVE, dynamodb.{Keys,NewImage,OldImage} with typed
  AttributeValues {"S": ...}/{"N": ...}/...).
- gcp_spanner_cdc → change stream DataChangeRecords
  (commit_timestamp, record_sequence, table_name, mod_type, mods[]).
- cockroachdb_changefeed → wrapped changefeed envelopes
  ({"after": ...|null, "before": ..., "key": [...], "updated":
  "sec.logical"}).
- salesforce_cdc → Change Data Capture events
  (payload.ChangeEventHeader.{entityName, changeType, recordIds,
  commitTimestamp} + field values).

Recordings are JSONL, one upstream record per line — exactly what the
service API returns after client-library decoding (these protocols
ARE structured; there are no further wire bytes to decode).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Iterator


class JsonlEnvelopeWal:
    """Directory of ``*.{suffix}`` JSONL recordings → envelope records
    via a per-kind translator.  The translator receives the parsed
    upstream record and an ordinal and yields envelope dicts; records
    with lsn <= after_lsn are filtered for checkpointed resume."""

    def __init__(self, path: str, suffix: str,
                 translate: Callable[[dict, int], Iterator[dict]]):
        self.path = path
        self.suffix = suffix
        self.translate = translate

    def _segments(self) -> list[str]:
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return []
        return sorted(f for f in names if f.endswith(self.suffix))

    def _raw(self) -> Iterator[dict]:
        for seg in self._segments():
            with open(os.path.join(self.path, seg),
                      encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        yield json.loads(line)

    def records(self, after_lsn: int) -> Iterator[dict]:
        ordinal = 0
        for row in self._raw():
            ordinal += 1
            for rec in self.translate(row, ordinal):
                if rec["lsn"] > after_lsn:
                    yield rec

    def last_lsn(self) -> int:
        last = 0
        for rec in self.records(after_lsn=0):
            last = max(last, rec["lsn"])
        return last


# --- microsoft_sql_server_cdc ----------------------------------------

def parse_mssql_lsn(text: str) -> int:
    """'vlf:block:slot' hex (the 10-byte __$start_lsn) → ordered int.
    Packed (vlf & 0x3FFF) << 50 | block << 18 | slot << 6, leaving the
    LOW 6 BITS free for a __$seqval ordinal (all changes of one
    transaction share __$start_lsn and order by __$seqval — SQL Server
    cdc.fn_cdc_get_all_changes).  VLF sequence numbers beyond 14 bits
    would need the full 80-bit token (which the reference also carries
    opaquely); recordings stay ordered."""
    vlf, block, slot = (int(x, 16) for x in text.split(":"))
    return ((vlf & 0x3FFF) << 50) | ((block & 0xFFFFFFFF) << 18) \
        | ((slot & 0xFFF) << 6)


# Low-bit budget for the per-transaction __$seqval ordinal; ordinals
# saturate at the cap (changes 63+ of one transaction tie — strictly
# better than the pre-fix behavior where ALL of them tied).
_MSSQL_SEQ_BITS = 6
_MSSQL_SEQ_MAX = (1 << _MSSQL_SEQ_BITS) - 1


class MssqlCdcWal(JsonlEnvelopeWal):
    SUFFIX = ".mssqlcdc.jsonl"

    def __init__(self, path: str, table: str = ""):
        self._pending: dict | None = None
        self._seq_state: tuple[int, str, int] | None = None
        self.table = table
        super().__init__(path, self.SUFFIX, self._translate)

    def records(self, after_lsn: int) -> Iterator[dict]:
        self._pending = None  # fresh pairing state per scan
        self._seq_state = None
        yield from super().records(after_lsn)

    def _seq_ordinal(self, start_lsn: int, seqval: str) -> int:
        """Deterministic per-transaction ordinal: the change table is
        scanned in (start_lsn, seqval) order, so each NEW seqval under
        the same start_lsn bumps the ordinal (op 3/4 update pairs
        share a seqval and must share the ordinal)."""
        if self._seq_state is None or self._seq_state[0] != start_lsn:
            self._seq_state = (start_lsn, seqval, 0)
        elif self._seq_state[1] != seqval:
            self._seq_state = (
                start_lsn, seqval,
                min(self._seq_state[2] + 1, _MSSQL_SEQ_MAX))
        return self._seq_state[2]

    def _translate(self, row: dict, ordinal: int) -> Iterator[dict]:
        op = int(row["__$operation"])
        seq = row.get("__$seqval", "")
        start = parse_mssql_lsn(row["__$start_lsn"])
        lsn = start | self._seq_ordinal(start, seq)
        cols = {k: v for k, v in row.items()
                if not k.startswith("__$")}
        table = row.get("__$table", self.table)
        ts = int(row.get("__$commit_ts_ms", 0))
        if op == 3:  # update before-image: hold for the 4 row
            self._pending = {"lsn": lsn, "seq": seq, "cols": cols}
            return
        if op == 4:  # update after-image
            before = None
            if self._pending and self._pending["seq"] == seq:
                before = self._pending["cols"]
            self._pending = None
            yield {"lsn": lsn, "operation": "update", "table": table,
                   "commit_ts_ms": ts, "before": before, "after": cols}
            return
        if op == 2:
            yield {"lsn": lsn, "operation": "insert", "table": table,
                   "commit_ts_ms": ts, "before": None, "after": cols}
        elif op == 1:
            yield {"lsn": lsn, "operation": "delete", "table": table,
                   "commit_ts_ms": ts, "before": cols, "after": None}
        else:
            raise ValueError(
                f"mssql cdc: unknown __$operation {op}"
            )


# --- mongodb_cdc ------------------------------------------------------

_MONGO_OPS = {"insert": "insert", "replace": "update",
              "update": "update", "delete": "delete"}


def _mongo_translate(row: dict, ordinal: int) -> Iterator[dict]:
    op = _MONGO_OPS.get(row.get("operationType", ""))
    if op is None:  # drop/rename/invalidate — no row image
        return
    ct = row.get("clusterTime", {})
    if isinstance(ct, dict):  # BSON Timestamp {t: sec, i: increment}
        lsn = (int(ct.get("t", 0)) << 32) | int(ct.get("i", 0))
        ts_ms = int(ct.get("t", 0)) * 1000
    else:
        lsn = int(ct)
        ts_ms = 0
    table = (row.get("ns") or {}).get("coll", "")
    after = row.get("fullDocument")
    if op == "update" and after is None:
        # partial update event: surface the updateDescription the way
        # the reference's change-stream consumer does
        ud = row.get("updateDescription") or {}
        after = {
            **(ud.get("updatedFields") or {}),
            **{k: None for k in ud.get("removedFields") or []},
            **(row.get("documentKey") or {}),
        }
    yield {"lsn": lsn, "operation": op, "table": table,
           "commit_ts_ms": ts_ms,
           "before": row.get("fullDocumentBeforeChange")
           or (row.get("documentKey") if op != "insert" else None),
           "after": after}


# --- aws_dynamodb_cdc -------------------------------------------------

def decode_dynamo_attr(v: dict) -> Any:
    """Typed AttributeValue → Python value (public DynamoDB API)."""
    (t, x), = v.items()
    if t == "S":
        return x
    if t == "N":
        return float(x) if "." in str(x) else int(x)
    if t == "BOOL":
        return bool(x)
    if t == "NULL":
        return None
    if t == "L":
        return [decode_dynamo_attr(e) for e in x]
    if t == "M":
        return {k: decode_dynamo_attr(e) for k, e in x.items()}
    if t in ("SS", "NS"):
        return list(x)
    if t == "B":
        return x  # already base64 text in JSON recordings
    raise ValueError(f"dynamodb: unknown attribute type {t!r}")


def _dynamo_image(img: dict | None) -> dict | None:
    if img is None:
        return None
    return {k: decode_dynamo_attr(v) for k, v in img.items()}


_DYNAMO_OPS = {"INSERT": "insert", "MODIFY": "update",
               "REMOVE": "delete"}


def _dynamo_translate(row: dict, ordinal: int) -> Iterator[dict]:
    op = _DYNAMO_OPS[row["eventName"]]
    d = row.get("dynamodb") or {}
    ts_ms = int(float(d.get("ApproximateCreationDateTime", 0)) * 1000)
    # stream SequenceNumbers exceed int64 — the recording ordinal is
    # the local resume coordinate (the real token is opaque upstream)
    yield {"lsn": ordinal, "operation": op,
           "table": row.get("eventSourceTable", ""),
           "commit_ts_ms": ts_ms,
           "before": _dynamo_image(d.get("OldImage")),
           "after": _dynamo_image(d.get("NewImage"))
           or (None if op == "delete"
               else _dynamo_image(d.get("Keys")))}


# --- gcp_spanner_cdc --------------------------------------------------

def _spanner_translate(row: dict, ordinal: int) -> Iterator[dict]:
    ts_us = int(row.get("commit_timestamp_us", 0))
    seq = int(row.get("record_sequence", 0))
    base = (ts_us << 10) | (seq & 0x3FF)
    op = row["mod_type"].lower()
    table = row.get("table_name", "")
    for i, mod in enumerate(row.get("mods", [])):
        keys = mod.get("keys") or {}
        new = mod.get("new_values")
        old = mod.get("old_values")
        yield {
            "lsn": base + i, "operation": op, "table": table,
            "commit_ts_ms": ts_us // 1000,
            "before": ({**keys, **old} if old is not None
                       else (keys if op == "delete" else None)),
            "after": ({**keys, **new} if new is not None
                      else (None if op == "delete" else keys)),
        }


# --- cockroachdb_changefeed ------------------------------------------

def _cockroach_translate(row: dict, ordinal: int) -> Iterator[dict]:
    # hlc timestamp "nanos.logical" (the `updated` option's format)
    updated = str(row.get("updated") or "0.0")
    nanos_s, _, logical = updated.partition(".")
    nanos = int(nanos_s or 0)
    # microsecond wall clock shifted left 10 bits with the HLC logical
    # counter (saturated) in the low bits: the tie-break bits never
    # overlap real >=1µs time deltas, and adding logical to raw nanos
    # (the pre-fix scheme) could invert events <256ns apart.  Fits
    # int64 until year ~2255.
    lsn = ((nanos // 1000) << 10) | min(int(logical or 0), 0x3FF)
    after = row.get("after")
    before = row.get("before")
    if after is None:
        op = "delete"
    elif before is None:
        op = "insert"
    else:
        op = "update"
    key = row.get("key")
    yield {"lsn": lsn,
           "operation": op,
           "table": row.get("table", ""),
           "commit_ts_ms": nanos // 1_000_000,
           "before": before or ({"key": key} if op == "delete" else None),
           "after": after}


# --- salesforce_cdc ---------------------------------------------------

_SF_OPS = {"CREATE": "insert", "UPDATE": "update", "DELETE": "delete",
           "UNDELETE": "insert", "GAP_CREATE": "insert"}


def _salesforce_translate(row: dict, ordinal: int) -> Iterator[dict]:
    payload = row.get("payload") or row
    header = payload.get("ChangeEventHeader") or {}
    op = _SF_OPS.get(header.get("changeType", ""), "update")
    fields = {k: v for k, v in payload.items()
              if k != "ChangeEventHeader"}
    ts = int(header.get("commitTimestamp", 0))
    replay = int(row.get("replayId", ordinal))
    for rid in header.get("recordIds") or [None]:
        img = dict(fields)
        if rid is not None:
            img["Id"] = rid
        yield {"lsn": replay, "operation": op,
               "table": header.get("entityName", ""),
               "commit_ts_ms": ts,
               "before": ({"Id": rid} if op == "delete" else None),
               "after": None if op == "delete" else img}


# --- tigerbeetle_cdc --------------------------------------------------

def _tigerbeetle_translate(row: dict, ordinal: int) -> Iterator[dict]:
    """TigerBeetle change events (inputs/tigerbeetle_cdc.adoc:49-92 —
    {timestamp ns, type single_phase/two_phase_*, ledger, transfer,
    debit_account, credit_account}).  Transfers are immutable ledger
    entries, so every event is an insert of the transfer image; the
    nanosecond cluster timestamp is the position."""
    ts_ns = int(row.get("timestamp", 0))
    transfer = row.get("transfer") or {}
    after = {
        "type": row.get("type"),
        "ledger": row.get("ledger"),
        **{f"transfer_{k}": v for k, v in transfer.items()},
        "debit_account_id": (row.get("debit_account") or {}).get("id"),
        "credit_account_id": (row.get("credit_account") or {}).get("id"),
    }
    yield {"lsn": ts_ns, "operation": "insert", "table": "transfers",
           "commit_ts_ms": ts_ns // 1_000_000,
           "before": None, "after": after}


# --- registry ---------------------------------------------------------

def open_format_wal(kind: str, path: str):
    """kind → Wal instance if a native-format recording exists."""
    table = {
        "microsoft_sql_server_cdc":
            (MssqlCdcWal.SUFFIX, lambda p: MssqlCdcWal(p)),
        "mongodb_cdc": (".changestream.jsonl", lambda p:
                        JsonlEnvelopeWal(p, ".changestream.jsonl",
                                         _mongo_translate)),
        "aws_dynamodb_cdc": (".ddbstream.jsonl", lambda p:
                             JsonlEnvelopeWal(p, ".ddbstream.jsonl",
                                              _dynamo_translate)),
        "gcp_spanner_cdc": (".spannercs.jsonl", lambda p:
                            JsonlEnvelopeWal(p, ".spannercs.jsonl",
                                             _spanner_translate)),
        "cockroachdb_changefeed": (".changefeed.jsonl", lambda p:
                                   JsonlEnvelopeWal(
                                       p, ".changefeed.jsonl",
                                       _cockroach_translate)),
        "salesforce_cdc": (".sfcdc.jsonl", lambda p:
                           JsonlEnvelopeWal(p, ".sfcdc.jsonl",
                                            _salesforce_translate)),
        "tigerbeetle_cdc": (".tbcdc.jsonl", lambda p:
                            JsonlEnvelopeWal(p, ".tbcdc.jsonl",
                                             _tigerbeetle_translate)),
    }
    entry = table.get(kind)
    if entry is None:
        return None
    suffix, factory = entry
    try:
        names = os.listdir(path)
    except FileNotFoundError:
        return None
    if any(f.endswith(suffix) for f in names):
        return factory(path)
    return None
