"""Example agent: deterministic two-tool loop — shouts the content,
counts its words, and composes a final answer.  Swap `plan()` for an
LLM tool-call loop; the MCP surface is identical either way."""

import json
import os
import sys
import urllib.request

BASE = os.environ["CONNECT_SPARK_AGENT_MCP_SERVER"].rstrip(
    "/").rsplit("/tools", 1)[0]


def call(path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(BASE + path, data=data,
                                 method="POST" if data else "GET")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def plan(content):
    shouted = call("/tools/shout", {"content": content})["content"]
    words = call("/tools/word_count", {"content": content})["content"]
    return f"{shouted} [{words} words]"


for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    res = {}
    if m == "invoke_agent":
        doc = (p.get("message") or {}).get("structured") or {}
        res = {"message": {"structured": {
            "content": plan(doc.get("content", ""))}, "metadata": {}}}
    sys.stdout.write(json.dumps(
        {"id": rid, "result": res, "error": None}) + "\n")
    sys.stdout.flush()
    if m == "close":
        break
