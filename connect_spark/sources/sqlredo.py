"""Oracle LogMiner SQL_REDO statement parser.

The reference's oracledb_cdc input reads V$LOGMNR_CONTENTS and
extracts row images by parsing each SQL_REDO statement
(internal/impl/oracledb/logminer/sqlredo/ — scanner + parser; the
behavioral contract is pinned by its public test matrix).  This is an
independent Python implementation of the same PUBLIC statement
grammar LogMiner documents for redo SQL:

  insert into "S"."T" ("C1","C2") values ('v1',NULL)
  update "S"."T" [alias] set "C1" = 'v' [where "C2" = 'w' and ...]
  delete from "S"."T" [alias] [where ...]

Semantics (mirroring the reference's matrix):
- ``''`` escapes inside string literals; a quote inside a
  double-quoted identifier never toggles string state.
- ``NULL`` and the bare ``Unsupported Type`` marker → None.
- Oracle function expressions (TO_DATE(...), TO_TIMESTAMP(...)) are
  kept as their raw SQL text.
- UPDATE: new values from SET, old values from WHERE; DELETE: old
  values from WHERE; INSERT: new values only.
- ``ROWID = '...'`` in WHERE surfaces under the key "ROWID" (tables
  without PK/supplemental logging).
- ``IS NULL`` / ``IS NOT NULL`` predicates are excluded.
- ``alias."COL"`` prefixes are stripped; identifiers may contain
  spaces and special characters.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class RedoStatement:
    operation: str  # insert | update | delete
    schema: str
    table: str
    new_values: dict[str, Any] = field(default_factory=dict)
    old_values: dict[str, Any] = field(default_factory=dict)


class _Scan:
    __slots__ = ("s", "i", "n")

    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.n = len(s)

    def ws(self) -> None:
        while self.i < self.n and self.s[self.i] in " \t\r\n":
            self.i += 1

    def peek_kw(self, kw: str) -> bool:
        self.ws()
        j = self.i + len(kw)
        if self.s[self.i:j].lower() != kw.lower():
            return False
        return j >= self.n or not (self.s[j].isalnum() or self.s[j] == "_")

    def kw(self, kw: str) -> bool:
        if self.peek_kw(kw):
            self.ws()
            self.i += len(kw)
            return True
        return False

    def expect(self, kw: str) -> None:
        if not self.kw(kw):
            raise ValueError(
                f"sqlredo: expected {kw!r} at offset {self.i}: "
                f"...{self.s[self.i:self.i + 30]!r}"
            )

    def char(self, c: str) -> bool:
        self.ws()
        if self.i < self.n and self.s[self.i] == c:
            self.i += 1
            return True
        return False

    def identifier(self) -> str:
        """Quoted ("may contain anything but a double-quote") or bare
        identifier."""
        self.ws()
        if self.i < self.n and self.s[self.i] == '"':
            j = self.s.index('"', self.i + 1)
            out = self.s[self.i + 1:j]
            self.i = j + 1
            return out
        j = self.i
        while j < self.n and (self.s[j].isalnum() or self.s[j] in "_$#"):
            j += 1
        out = self.s[self.i:j]
        self.i = j
        return out

    def string_literal(self) -> str:
        # at opening quote
        assert self.s[self.i] == "'"
        self.i += 1
        out = []
        while self.i < self.n:
            c = self.s[self.i]
            if c == "'":
                if self.i + 1 < self.n and self.s[self.i + 1] == "'":
                    out.append("'")
                    self.i += 2
                    continue
                self.i += 1
                return "".join(out)
            out.append(c)
            self.i += 1
        raise ValueError("sqlredo: unterminated string literal")

    def value(self) -> Any:
        """One value expression: string / NULL / Unsupported Type /
        raw expression (function call etc., kept as text)."""
        self.ws()
        if self.i < self.n and self.s[self.i] == "'":
            return self.string_literal()
        if self.kw("null"):
            return None
        if self.peek_kw("unsupported"):
            self.kw("unsupported")
            self.kw("type")
            return None
        # raw expression: scan to a top-level ',' / ')' / keyword
        # boundary, tracking nesting and strings
        start = self.i
        depth = 0
        while self.i < self.n:
            c = self.s[self.i]
            if c == "'":
                self.string_literal()
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            elif depth == 0 and c in " \t\r\n":
                # keyword boundary (where / and) ends a raw value
                save = self.i
                if self.peek_kw("where") or self.peek_kw("and"):
                    self.i = save
                    break
                self.i = save
            self.i += 1
        return self.s[start:self.i].strip()


def _column_ref(scan: _Scan) -> str:
    """[alias.]"COL" or bare name; returns the column name."""
    name = scan.identifier()
    if scan.char("."):
        name = scan.identifier()
    return name


def parse_redo(sql: str) -> RedoStatement:
    scan = _Scan(sql)
    if scan.kw("insert"):
        scan.expect("into")
        schema = scan.identifier()
        table = scan.identifier() if scan.char(".") else ""
        if not table:
            schema, table = "", schema
        cols = []
        scan.ws()
        if not scan.char("("):
            raise ValueError("sqlredo: INSERT without column list")
        while True:
            cols.append(_column_ref(scan))
            if scan.char(")"):
                break
            if not scan.char(","):
                raise ValueError("sqlredo: bad INSERT column list")
        scan.expect("values")
        if not scan.char("("):
            raise ValueError("sqlredo: INSERT without VALUES list")
        vals = []
        while True:
            vals.append(scan.value())
            if scan.char(")"):
                break
            if not scan.char(","):
                raise ValueError("sqlredo: bad VALUES list")
        if len(vals) != len(cols):
            raise ValueError(
                f"sqlredo: {len(cols)} columns but {len(vals)} values"
            )
        return RedoStatement("insert", schema, table,
                             new_values=dict(zip(cols, vals)))
    if scan.kw("update"):
        schema = scan.identifier()
        table = scan.identifier() if scan.char(".") else ""
        if not table:
            schema, table = "", schema
        # optional alias before SET
        scan.ws()
        if not scan.peek_kw("set"):
            scan.identifier()
        scan.expect("set")
        new = {}
        while True:
            col = _column_ref(scan)
            if not scan.char("="):
                raise ValueError("sqlredo: SET without '='")
            new[col] = scan.value()
            if not scan.char(","):
                break
        old = _parse_where(scan)
        return RedoStatement("update", schema, table,
                             new_values=new, old_values=old)
    if scan.kw("delete"):
        scan.expect("from")
        schema = scan.identifier()
        table = scan.identifier() if scan.char(".") else ""
        if not table:
            schema, table = "", schema
        scan.ws()
        if not (scan.peek_kw("where") or scan.i >= scan.n):
            scan.identifier()  # alias
        old = _parse_where(scan)
        return RedoStatement("delete", schema, table, old_values=old)
    raise ValueError(
        f"sqlredo: unsupported statement: {sql[:40]!r}..."
    )


def _parse_where(scan: _Scan) -> dict[str, Any]:
    out: dict[str, Any] = {}
    if not scan.kw("where"):
        return out
    while True:
        col = _column_ref(scan)
        if scan.kw("is"):
            # IS NULL / IS NOT NULL predicates are excluded
            scan.kw("not")
            scan.expect("null")
        elif scan.char("="):
            out[col] = scan.value()
        else:
            raise ValueError(
                f"sqlredo: unsupported predicate on {col!r}"
            )
        if not scan.kw("and"):
            break
    return out
