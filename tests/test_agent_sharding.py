"""r13 verdict task #2 — stateful-tool scale topology.

Three dispatch tiers for agent MCP tools:
  1. inline-safe chains (mapping / default-transport http / command)
     evaluate IN the partition worker — per-core scaling, no central
     hop (this was previously mapping-only; http tools — the common
     agent tool — were serializing on the central server).
  2. central tools (shared state: cache, sql_select, custom
     transports) keep the per-agent driver-side server, and the
     runtime processor now warns on every bulk run and REFUSES above
     `central_tools_max_partitions` — a loud, documented threshold
     instead of the silent r12 super-linear curve.
  3. mapping-only tools additionally export to the agent child for
     fully in-process dispatch (unchanged).
"""

from __future__ import annotations

import http.server
import json
import sys
import threading

import pytest

from connect_spark.agent_mode import (
    AgentToolRegistry,
    _eval_inline_chain,
    _inline_safe_spec,
    _serve_partition_shim,
)
from connect_spark.plans.pipeline import (
    PROCESSORS,
    PipelineConfigError,
)


# ------------------------------------------------------------------
# helpers
# ------------------------------------------------------------------


def _echo_server(transform):
    """A local HTTP server standing in for an external tool API."""

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode()
            out = transform(body).encode()
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


# ------------------------------------------------------------------
# classification
# ------------------------------------------------------------------


def test_inline_safe_classification():
    assert _inline_safe_spec({"mapping": "root = this"})
    assert _inline_safe_spec(
        {"http": {"url": "http://127.0.0.1:1/x", "verb": "POST"}})
    assert _inline_safe_spec(
        {"command": {"name": "cat", "args": []}, "label": "c"})
    # custom transport = driver-side registration → central
    assert not _inline_safe_spec(
        {"http": {"url": "http://x", "transport": "fake"}})
    # interpolated url needs the full Bloblang env → central
    assert not _inline_safe_spec(
        {"http": {"url": "http://x/${! this.id }"}})
    # shared state → central
    assert not _inline_safe_spec(
        {"cache": {"resource": "c", "operator": "get"}})
    assert not _inline_safe_spec({"sql_select": {"query": "..."}})


def test_registry_inline_vs_central_split():
    reg = AgentToolRegistry()
    reg._tools["pure"] = {
        "processors": [{"mapping": "root = this.uppercase()"}],
        "description": "pure"}
    reg._tools["webhook"] = {
        "processors": [{"mapping": "root = this"},
                       {"http": {"url": "http://127.0.0.1:9/t"}}],
        "description": "calls an api"}
    reg._tools["lookup"] = {
        "processors": [{"cache": {"resource": "c",
                                  "operator": "get"}}],
        "description": "shared state"}
    inline = reg.inline_tools()
    assert set(inline) == {"pure", "webhook"}
    assert reg.central_tools() == ["lookup"]
    # back-compat alias + mapping subset keep their shapes
    assert reg.stateful_tools() == ["lookup"]
    assert list(reg.mapping_tools()) == ["pure"]


# ------------------------------------------------------------------
# scalar chain evaluation
# ------------------------------------------------------------------


def test_eval_inline_chain_mapping_http_command():
    srv, port = _echo_server(lambda b: b[::-1])
    try:
        out = _eval_inline_chain(
            [
                {"mapping": "root = this.uppercase()"},
                {"http": {"url": f"http://127.0.0.1:{port}/t"}},
                {"command": {"name": "tr", "args": ["B", "X"]}},
            ],
            "abc",
        )
        # upper -> ABC, reversed by the api -> CBA, tr B->X -> CXA
        assert out == "CXA"
    finally:
        srv.shutdown()
        srv.server_close()


def test_shim_serves_processor_chain_tool():
    import urllib.request

    srv, port = _echo_server(lambda b: json.dumps({"echoed": b}))
    shim, sport = _serve_partition_shim(
        {"api": {"processors": [
            {"mapping": "root = this.lowercase()"},
            {"http": {"url": f"http://127.0.0.1:{port}/t"}},
        ], "description": "chain"}},
        central="",
    )
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{sport}/tools/api",
            data=json.dumps({"content": "HeLLo"}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=10) as resp:
            doc = json.loads(resp.read())
        assert json.loads(doc["content"]) == {"echoed": "hello"}
    finally:
        shim.shutdown()
        shim.server_close()
        srv.shutdown()
        srv.server_close()


# ------------------------------------------------------------------
# runtime processor: http tool chain dispatches in the partitions
# ------------------------------------------------------------------

_HTTP_TOOL_AGENT = '''\
import json, os, sys, urllib.request

MCP = os.environ["CONNECT_SPARK_AGENT_MCP_SERVER"]
BASE = MCP.rstrip("/").rsplit("/tools", 1)[0]


def call(path, body):
    req = urllib.request.Request(
        BASE + path, data=json.dumps(body).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
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


def test_runtime_http_tool_inline_no_central(tmp_path, spark):
    """An http tool ships as an inline chain: the agent child's tool
    call is served by the partition shim (which makes the outbound
    request itself) — mcp_server stays EMPTY, proving no central
    registry participates."""
    srv, port = _echo_server(lambda b: b.upper())
    script = tmp_path / "agent.py"
    script.write_text(_HTTP_TOOL_AGENT)
    try:
        df = spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",)],
            "content STRING").repartition(3)
        out = PROCESSORS["redpanda_agent_runtime"](df, {
            "command": [sys.executable, str(script)],
            "tools_inline": {"api": {"processors": [
                {"http": {"url": f"http://127.0.0.1:{port}/t"}},
            ], "description": "external api"}},
            "output_schema": "content STRING",
        })
        got = sorted(r["content"] for r in out.collect())
        assert got == ["ALPHA", "BETA", "GAMMA"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_runtime_rejects_non_inline_safe_chain(spark):
    df = spark.createDataFrame([("x",)], "content STRING")
    with pytest.raises(PipelineConfigError, match="inline-safe"):
        PROCESSORS["redpanda_agent_runtime"](df, {
            "command": [sys.executable, "-c", "pass"],
            "tools_inline": {"bad": {"processors": [
                {"cache": {"resource": "c", "operator": "get"}},
            ], "description": "shared state"}},
        })


# ------------------------------------------------------------------
# the central-tool bulk gate
# ------------------------------------------------------------------


def test_central_tools_refuse_above_partition_limit(spark):
    df = spark.createDataFrame(
        [(str(i),) for i in range(8)], "content STRING").repartition(4)
    with pytest.raises(PipelineConfigError,
                       match="central_tools_max_partitions"):
        PROCESSORS["redpanda_agent_runtime"](df, {
            "command": [sys.executable, "-c", "pass"],
            "mcp_server": "http://127.0.0.1:9/tools",
            "central_tool_names": ["lookup"],
            "central_tools_max_partitions": 2,
        })


def test_central_tools_warn_below_partition_limit(spark):
    df = spark.createDataFrame(
        [("x",)], "content STRING").coalesce(1)
    with pytest.warns(UserWarning, match="serialize on one driver"):
        # plan-build only — the warning fires at config time, no
        # child needs to run
        PROCESSORS["redpanda_agent_runtime"](df, {
            "command": [sys.executable, "-c", "pass"],
            "mcp_server": "http://127.0.0.1:9/tools",
            "central_tool_names": ["lookup"],
        })
