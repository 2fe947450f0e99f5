#!/usr/bin/env python
"""A/B: agent wire framing at volume (r13 verdict task #6).

Two runtime arms hosting equivalent REAL agent children (transform:
upper-case + char count, no tools) over the same replica volumes:

  ndjson — the default agent protocol (per-message JSON, generic
           (content, metadata) seam + typed projection)
  arrow  — protocol: arrow (one-row Arrow-IPC body per invoke_agent;
           semantics stay message-at-a-time per agent_plugin.go)

Unlike the rpcplugin A/B (whole partitions per RPC, where arrow won
−30% at 640K rows), the agent wire is strictly ONE message per RPC —
the Arrow stream overhead (schema + framing per 1-row table) is paid
per message.  This script measures whether that ever wins.

Usage: python scripts/ab_agent_arrow.py [base_rows] [runs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from connect_spark.plans.pipeline import PROCESSORS  # noqa: E402
from connect_spark.session import get_spark  # noqa: E402

_NDJSON_AGENT = '''\
import json, sys
for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    res = {}
    if m == "invoke_agent":
        doc = (p.get("message") or {}).get("structured") or {}
        text = doc.get("content") or ""
        res = {"message": {"structured": {
            "content": text.upper(), "n_chars": len(text)},
            "metadata": {}}}
    sys.stdout.write(json.dumps(
        {"id": rid, "result": res, "error": None}) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
'''

_ARROW_AGENT = '''\
import json, sys
import pyarrow as pa

stdin, stdout = sys.stdin.buffer, sys.stdout.buffer


def reply(rid, result=None, body=None):
    hdr = {"id": rid, "result": result, "error": None}
    payload = b""
    if body is not None:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, body.schema) as w:
            w.write_table(body)
        payload = sink.getvalue().to_pybytes()
        hdr["body_len"] = len(payload)
    stdout.write(json.dumps(hdr).encode() + b"\\n")
    if payload:
        stdout.write(payload)
    stdout.flush()


while True:
    line = stdin.readline()
    if not line:
        break
    hdr = json.loads(line)
    rid, m = hdr["id"], hdr["method"]
    body = None
    n = int(hdr.get("body_len") or 0)
    if n:
        body = pa.ipc.open_stream(stdin.read(n)).read_all()
    if m == "invoke_agent":
        rec = body.to_pylist()[0]
        text = rec.get("content") or ""
        out = pa.table({
            "content": pa.array([text.upper()], pa.string()),
            "n_chars": pa.array([len(text)], pa.int64()),
        })
        reply(rid, result={}, body=out)
    else:
        reply(rid, result={})
        if m == "close":
            break
'''

_SCHEMA = "content STRING, n_chars BIGINT"


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _run(spark, script, n_rows, protocol) -> float:
    df = spark.range(n_rows).selectExpr(
        "repeat(concat('msg ', id, ' '), 8) AS content"
    ).repartition(32)
    t0 = time.perf_counter()
    out = PROCESSORS["redpanda_agent_runtime"](df, {
        "command": [sys.executable, script],
        "protocol": protocol,
        "output_schema": _SCHEMA,
    })
    n = out.count()
    assert n == n_rows, (n, n_rows)
    return time.perf_counter() - t0


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_agent_arrow")
    out: dict = {"base_rows": base, "runs": runs}
    with tempfile.TemporaryDirectory() as td:
        scripts = {}
        for proto, src in (("ndjson", _NDJSON_AGENT),
                           ("arrow", _ARROW_AGENT)):
            path = os.path.join(td, f"agent_{proto}.py")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(src)
            scripts[proto] = path
        # warm both arms
        for proto in ("ndjson", "arrow"):
            _run(spark, scripts[proto], 64, proto)
        for mult in (1, 4, 16):
            n = base * mult
            for proto in ("ndjson", "arrow"):
                ts = [_run(spark, scripts[proto], n, proto)
                      for _ in range(runs)]
                out[f"{proto}_{mult}x_sec"] = round(_median(ts), 2)
    out["verdict"] = (
        "arrow wins at 16x" if out["arrow_16x_sec"]
        < out["ndjson_16x_sec"] else "ndjson stays default")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
