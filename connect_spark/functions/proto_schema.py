"""`.proto` source importer + proto3 JSON mapping.

The reference's protobuf processor compiles `.proto` sources named by
`import_paths` and converts messages between the wire format and
proto3 JSON (internal/impl/protobuf/processor_protobuf.go). This
module parses the proto3 subset those schemas use — packages,
imports, nested messages/enums, repeated and map fields, well-known
Timestamp/Any — into the plain-dict descriptors of
functions/protobuf_codec.py, and implements the proto3 JSON mapping
rules (camelCase names, defaults omitted, enum names, 64-bit ints as
strings, bytes as base64, Timestamp as RFC 3339, strict unknown-field
errors) over that codec.

Verified against the reference's own test schemas
(config/test/protobuf/schema/*.proto) by tests/test_reference_corpus.py.
"""

from __future__ import annotations

import base64
import os
import re
from typing import Any

_SCALARS = {
    "double", "float", "int32", "int64", "uint32", "uint64",
    "sint32", "sint64", "fixed32", "fixed64", "sfixed32", "sfixed64",
    "bool", "string", "bytes",
}

_WELL_KNOWN = {
    "google.protobuf.Timestamp": "timestamp",
    "google.protobuf.Any": "any",
}

# built-in descriptors for the well-known types the corpus imports
_TIMESTAMP_DESC = {
    "fields": {
        1: {"name": "seconds", "type": "int64"},
        2: {"name": "nanos", "type": "int32"},
    }
}
_ANY_DESC = {
    "fields": {
        1: {"name": "type_url", "type": "string"},
        2: {"name": "value", "type": "bytes"},
    }
}


def _strip_comments(text: str) -> str:
    text = re.sub(r"//[^\n]*", "", text)
    return re.sub(r"/\*.*?\*/", "", text, flags=re.S)


_TOKEN_RE = re.compile(r'"[^"]*"|[A-Za-z_][\w.]*|<|>|[{}=;,]|-?\d+')


def _tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(_strip_comments(text))


class _ProtoFile:
    def __init__(self, text: str):
        self.package = ""
        self.imports: list[str] = []
        # fq message name -> raw field list; raw fields carry
        # unresolved type names for a second resolution pass
        self.messages: dict[str, list[dict]] = {}
        self.enums: dict[str, dict] = {}  # fq enum -> {name: num}
        self._toks = _tokenize(text)
        self._i = 0
        self._parse()

    def _next(self) -> str:
        t = self._toks[self._i]
        self._i += 1
        return t

    def _peek(self) -> str:
        return self._toks[self._i] if self._i < len(self._toks) else ""

    def _skip_statement(self) -> None:
        depth = 0
        while self._i < len(self._toks):
            t = self._next()
            if t == "{":
                depth += 1
            elif t == "}":
                depth -= 1
                if depth <= 0:
                    return
            elif t == ";" and depth == 0:
                return

    def _parse(self) -> None:
        while self._i < len(self._toks):
            t = self._next()
            if t == "syntax":
                self._skip_statement()
            elif t == "package":
                self.package = self._next()
                self._skip_statement()
            elif t == "import":
                self.imports.append(self._next().strip('"'))
                self._skip_statement()
            elif t == "option":
                self._skip_statement()
            elif t == "message":
                self._parse_message(self._next(), self.package)
            elif t == "enum":
                self._parse_enum(self._next(), self.package)
            # stray tokens (;) skip silently

    def _fq(self, scope: str, name: str) -> str:
        return f"{scope}.{name}" if scope else name

    def _parse_enum(self, name: str, scope: str) -> None:
        fq = self._fq(scope, name)
        values: dict[str, int] = {}
        assert self._next() == "{"
        while self._peek() != "}":
            vname = self._next()
            if vname == "option":
                self._skip_statement()
                continue
            if self._next() != "=":
                continue
            values[vname] = int(self._next())
            if self._peek() == ";":
                self._next()
        self._next()  # }
        self.enums[fq] = values

    def _parse_message(self, name: str, scope: str) -> None:
        fq = self._fq(scope, name)
        fields: list[dict] = []
        self.messages[fq] = fields
        assert self._next() == "{"
        while self._peek() != "}":
            t = self._next()
            if t == "message":
                self._parse_message(self._next(), fq)
                continue
            if t == "enum":
                self._parse_enum(self._next(), fq)
                continue
            if t in ("option", "reserved", "oneof", "extensions"):
                self._skip_statement()
                continue
            if t == ";":
                continue
            repeated = False
            is_map = False
            map_key = None
            if t == "repeated":
                repeated = True
                t = self._next()
            if t == "map":
                is_map = True
                assert self._next() == "<"
                map_key = self._next()
                assert self._next() == ","
                t = self._next()
                assert self._next() == ">"
            fname = self._next()
            assert self._next() == "="
            num = int(self._next())
            # options like [deprecated=true] / trailing ;
            while self._peek() not in (";", "}", "") and (
                self._peek() != ";"
            ):
                if self._next() == ";":
                    break
            if self._peek() == ";":
                self._next()
            fields.append({
                "num": num,
                "name": fname,
                "type_name": t,
                "repeated": repeated or is_map,
                "map": is_map,
                "map_key": map_key,
                "scope": fq,
            })
        self._next()  # }


def _json_name(name: str) -> str:
    parts = name.split("_")
    return parts[0] + "".join(p.capitalize() for p in parts[1:])


def load_registry(
    import_paths: list[str], base_dir: str | None = None
) -> dict[str, dict]:
    """Parse every `.proto` under the import path directories into a
    registry of fq message name → codec descriptor. Relative paths
    resolve against cwd, then walk UP from `base_dir` (the reference
    corpus names paths relative to its repo root; the suite file
    tells us where to start looking)."""
    dirs: list[str] = []
    for p in import_paths:
        cand = [p]
        if not os.path.isabs(p) and base_dir:
            d = base_dir
            for _ in range(6):
                cand.append(os.path.join(d, p))
                d = os.path.dirname(d)
        hit = next((c for c in cand if os.path.isdir(c)), None)
        if hit is None:
            raise FileNotFoundError(
                f"protobuf import path {p!r} not found"
            )
        dirs.append(hit)
    files: list[_ProtoFile] = []
    for d in dirs:
        for root, _sub, names in os.walk(d):
            for fn in sorted(names):
                if fn.endswith(".proto"):
                    with open(os.path.join(root, fn),
                              encoding="utf-8") as fh:
                        files.append(_ProtoFile(fh.read()))
    messages: dict[str, list[dict]] = {}
    enums: dict[str, dict] = {}
    for f in files:
        messages.update(f.messages)
        enums.update(f.enums)

    descs: dict[str, dict] = {
        name: {"fields": {}} for name in messages
    }

    def resolve(type_name: str, scope: str) -> tuple[str, Any]:
        """(kind, payload): scalar / enum / message / well-known."""
        if type_name in _SCALARS:
            return "scalar", type_name
        if type_name in _WELL_KNOWN:
            return "well_known", _WELL_KNOWN[type_name]
        # scoping: innermost enclosing scope outward, then as-is
        parts = scope.split(".") if scope else []
        for i in range(len(parts), -1, -1):
            fq = ".".join(parts[:i] + [type_name])
            if fq in enums:
                return "enum", enums[fq]
            if fq in descs:
                return "message", descs[fq]
        raise KeyError(
            f"unresolved protobuf type {type_name!r} in {scope!r}"
        )

    for name, raw_fields in messages.items():
        fields = descs[name]["fields"]
        for rf in raw_fields:
            if rf["map"]:
                # map<K,V> == repeated message {1: key, 2: value}
                kkind, kpayload = resolve(rf["map_key"], rf["scope"])
                vkind, vpayload = resolve(rf["type_name"], rf["scope"])
                vfield: dict = {"name": "value"}
                if vkind == "scalar":
                    vfield["type"] = vpayload
                elif vkind == "enum":
                    vfield["type"] = "enum"
                    vfield["enum"] = vpayload
                else:
                    vfield["type"] = "message"
                    vfield["message"] = (
                        _TIMESTAMP_DESC
                        if vpayload == "timestamp" else vpayload
                    )
                entry = {
                    "fields": {
                        1: {"name": "key", "type": (
                            kpayload if kkind == "scalar" else "string"
                        )},
                        2: vfield,
                    }
                }
                fields[rf["num"]] = {
                    "name": rf["name"],
                    "json_name": _json_name(rf["name"]),
                    "type": "message",
                    "message": entry,
                    "repeated": True,
                    "map": True,
                }
                continue
            kind, payload = resolve(rf["type_name"], rf["scope"])
            f: dict = {
                "name": rf["name"],
                "json_name": _json_name(rf["name"]),
                "repeated": rf["repeated"],
            }
            if kind == "scalar":
                f["type"] = payload
            elif kind == "enum":
                f["type"] = "enum"
                f["enum"] = payload
            elif kind == "well_known":
                f["type"] = "message"
                f["well_known"] = payload
                f["message"] = (
                    _TIMESTAMP_DESC if payload == "timestamp"
                    else _ANY_DESC
                )
            else:
                f["type"] = "message"
                f["message"] = payload
            fields[rf["num"]] = f
    return descs


# ------------------------------------------------------- proto3 JSON


def _rfc3339(seconds: int, nanos: int) -> str:
    import datetime

    dt = datetime.datetime.fromtimestamp(
        seconds, tz=datetime.timezone.utc
    )
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if nanos:
        frac = f"{nanos:09d}".rstrip("0")
        return f"{base}.{frac}Z"
    return f"{base}Z"


def _parse_rfc3339(s: str) -> tuple[int, int]:
    import datetime

    m = re.fullmatch(
        r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})(\.\d+)?"
        r"(Z|[+-]\d{2}:\d{2})", s,
    )
    if not m:
        raise ValueError(f"invalid Timestamp {s!r}")
    dt = datetime.datetime.fromisoformat(
        m.group(1) + (m.group(3) if m.group(3) != "Z" else "+00:00")
    )
    nanos = 0
    if m.group(2):
        nanos = int(round(float(m.group(2)) * 1_000_000_000))
    return int(dt.timestamp()), nanos


_INT_DEFAULTS = {0, 0.0, False, "", b""}


def _is_default(f: dict, v: Any) -> bool:
    if f.get("repeated"):
        return not v
    t = f["type"]
    if t == "message":
        return v is None
    if t == "enum":
        return v == 0 or v is None
    if t == "bool":
        return v is False
    if t in ("double", "float"):
        return v == 0.0
    if t == "string":
        return v == ""
    if t == "bytes":
        return v in (b"", "")
    return v == 0


def to_json_value(decoded: dict, desc: dict) -> dict:
    """Codec-decoded dict (original names, defaults filled) →
    proto3 JSON document (camelCase, defaults omitted, enum names,
    64-bit ints as strings, bytes base64, Timestamp RFC 3339)."""
    out: dict = {}
    for _num, f in desc["fields"].items():
        v = decoded.get(f["name"])
        if _is_default(f, v):
            continue
        jname = f.get("json_name", f["name"])

        def conv(x, f=f):
            t = f["type"]
            if t == "message":
                if f.get("well_known") == "timestamp":
                    return _rfc3339(
                        x.get("seconds", 0), x.get("nanos", 0))
                return to_json_value(x, f["message"])
            if t == "enum":
                names = {n: k for k, n in f["enum"].items()}
                return names.get(x, x)
            if t in ("int64", "uint64", "sint64", "fixed64",
                     "sfixed64"):
                return str(x)
            if t == "bytes":
                raw = x if isinstance(x, bytes) else str(x).encode(
                    "latin-1")
                return base64.b64encode(raw).decode("ascii")
            if t in ("double", "float"):
                import math

                if math.isnan(x):
                    return "NaN"
                if math.isinf(x):
                    return "Infinity" if x > 0 else "-Infinity"
                return x
            return x

        if f.get("map"):
            out[jname] = {
                e["key"]: conv(e["value"], f["message"]["fields"][2])
                if f["message"]["fields"][2]["type"] != "message"
                else to_json_value(
                    e["value"], f["message"]["fields"][2]["message"])
                for e in v
            }
        elif f.get("repeated"):
            out[jname] = [conv(x) for x in v]
        else:
            out[jname] = conv(v)
    return out


def from_json_value(doc: dict, desc: dict) -> dict:
    """Proto3 JSON document → codec-level dict (original names).
    Unknown fields are a hard error, the reference's from_json
    contract (`unknown field "x"`)."""
    by_name: dict[str, dict] = {}
    for _num, f in desc["fields"].items():
        by_name[f["name"]] = f
        by_name[f.get("json_name", f["name"])] = f
    out: dict = {}
    for k, v in doc.items():
        f = by_name.get(k)
        if f is None:
            raise ValueError(f'unknown field "{k}"')
        if v is None:
            continue

        def conv(x, f=f):
            t = f["type"]
            if t == "message":
                if f.get("well_known") == "timestamp":
                    s, n = _parse_rfc3339(str(x))
                    return {"seconds": s, "nanos": n}
                return from_json_value(x, f["message"])
            if t == "enum":
                if isinstance(x, str):
                    if x not in f["enum"]:
                        raise ValueError(
                            f'unknown enum value "{x}" for {f["name"]}')
                    return f["enum"][x]
                return int(x)
            if t == "bytes":
                return base64.b64decode(x) if isinstance(x, str) else x
            if t in ("double", "float"):
                if x == "NaN":
                    return float("nan")
                if x == "Infinity":
                    return float("inf")
                if x == "-Infinity":
                    return float("-inf")
                return float(x)
            if t in _SCALARS - {"string", "bool"}:
                return int(x) if not isinstance(x, bool) else x
            return x

        if f.get("map"):
            out[f["name"]] = [
                {"key": mk, "value": conv(mv, f["message"]["fields"][2])
                 if f["message"]["fields"][2]["type"] != "message"
                 else from_json_value(
                     mv, f["message"]["fields"][2]["message"])}
                for mk, mv in v.items()
            ]
        elif f.get("repeated"):
            out[f["name"]] = [conv(x) for x in v]
        else:
            out[f["name"]] = conv(v)
    return out
