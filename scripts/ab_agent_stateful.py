#!/usr/bin/env python
"""r13 verdict task #2 measurement — stateful-tool dispatch topology.

"Stateful" in the r12/r13 sense = any non-mapping tool chain; the
common case is an http tool (call an external API per message).
Before r14 those proxied to the ONE driver-side registry, whose
general path runs a one-row Spark job per call — the topology behind
the r12 11s→34s→186s super-linear curve.  r14 ships inline-safe
chains (mapping / default-transport http / command) to the partition
shim, so the call is an executor-local urllib request.

Two measurements:
  A. per-call cost probe at small N: central registry vs partition
     shim, same http tool, same local echo server.
  B. 1x/4x/16x replica spot on the NEW inline path — the verdict's
     done-criterion (≤linear scaling with volume).

Usage: python scripts/ab_agent_stateful.py [base_rows]
Prints one JSON line.
"""

from __future__ import annotations

import http.server
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from connect_spark.agent_mode import AgentToolRegistry  # noqa: E402
from connect_spark.plans.pipeline import PROCESSORS  # noqa: E402
from connect_spark.session import get_spark  # noqa: E402

_AGENT = '''\
import json, os, sys, urllib.request

MCP = os.environ["CONNECT_SPARK_AGENT_MCP_SERVER"]
BASE = MCP.rstrip("/").rsplit("/tools", 1)[0]

def call(path, body):
    req = urllib.request.Request(
        BASE + path, data=json.dumps(body).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())

for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    res = {}
    if m == "invoke_agent":
        doc = (p.get("message") or {}).get("structured") or {}
        content = doc.get("content", "")
        answer = call("/tools/api", {"content": content})["content"]
        res = {"message": {"structured": {"content": answer},
                           "metadata": {}}}
    sys.stdout.write(json.dumps(
        {"id": rid, "result": res, "error": None}) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
'''


def _echo_server():
    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode()
            out = body.upper().encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def _run(spark, script, n_rows, conf, parts: int = 32) -> float:
    df = spark.range(n_rows).selectExpr(
        "concat('msg-', id) AS content").repartition(parts)
    t0 = time.perf_counter()
    out = PROCESSORS["redpanda_agent_runtime"](df, {
        "command": [sys.executable, script],
        "output_schema": "content STRING",
        **conf,
    })
    n = out.count()
    assert n == n_rows, (n, n_rows)
    return time.perf_counter() - t0


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    spark = get_spark("ab_agent_stateful")
    echo, eport = _echo_server()
    tool_specs = [{"http": {"url": f"http://127.0.0.1:{eport}/t"}}]
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "agent.py")
        with open(script, "w", encoding="utf-8") as fh:
            fh.write(_AGENT)

        # warm the JVM/codegen with a tiny inline pass
        _run(spark, script, 64,
             {"tools_inline": {"api": {"processors": tool_specs,
                                       "description": "api"}}})

        out: dict = {"base_rows": base}

        # A. per-call probe, central registry (the pre-r14 path for
        # a non-mapping tool: one-row Spark job per call) — tiny N
        # at 8 partitions: at 32 the topology DEADLOCKS local[32]
        # outright (every call needs a free task slot while all 32
        # slots host agents; resolved only by socket timeouts) —
        # which is why the runtime now refuses past cores/2.
        reg = AgentToolRegistry(spark)
        reg._tools["api"] = {"processors": tool_specs,
                             "description": "api"}
        srv, port = reg.serve(0)
        try:
            n_probe = 100
            dt = _run(spark, script, n_probe, {
                "mcp_server": f"http://127.0.0.1:{port}/tools",
                "central_tool_names": ["api"],
            }, parts=8)
            out["central_ms_per_call"] = round(dt / n_probe * 1e3, 2)
        finally:
            srv.shutdown()
            srv.server_close()

        # B. inline path: per-call probe + 1x/4x/16x replica spot
        inline_conf = {"tools_inline": {
            "api": {"processors": tool_specs, "description": "api"}}}
        dt = _run(spark, script, 100, inline_conf)
        out["inline_ms_per_call"] = round(dt / 100 * 1e3, 2)
        spot = {}
        for mult in (1, 4, 16):
            dt = _run(spark, script, base * mult, inline_conf)
            spot[f"{mult}x"] = round(dt, 2)
        out["inline_replica_spot_sec"] = spot
        out["linear_ratio_16x_over_1x"] = round(
            spot["16x"] / spot["1x"], 2)

    echo.shutdown()
    echo.server_close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
