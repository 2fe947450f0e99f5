"""Example out-of-process processor plugin: upper-cases `content`
and appends a configurable suffix (the reference's catshout fixture
shape).  Speaks the engine's NDJSON-stdio plugin protocol with zero
dependencies."""

import json
import sys

CFG = {}

for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    res = {}
    if m == "init":
        CFG.update(p.get("config") or {})
    elif m == "process_batch":
        out = []
        for msg in (p.get("batch") or {}).get("messages") or []:
            doc = msg["structured"]
            doc["content"] = (str(doc.get("content", "")).upper()
                              + CFG.get("suffix", ""))
            out.append({"structured": doc, "metadata": {}})
        res = {"batches": [{"messages": out}]}
    sys.stdout.write(json.dumps(
        {"id": rid, "result": res, "error": None}) + "\n")
    sys.stdout.flush()
    if m == "close":
        break
