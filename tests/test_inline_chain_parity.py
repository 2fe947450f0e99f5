"""Dispatch-tier parity: a tool chain must compute the SAME answer
whether it runs through the partition shim's scalar evaluator
(`_eval_inline_chain`, r14) or the central registry's paths (scalar
Bloblang for mapping-only chains; the one-row-DataFrame processor
path for mixed chains).  A divergence would make an agent's tool
results depend on WHERE the call was served — silent and
user-visible — so every inline-safe kind is cross-checked against
its authoritative implementation."""

from __future__ import annotations

import http.server
import json
import threading

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from connect_spark.agent_mode import (
    AgentToolRegistry,
    _eval_inline_chain,
)

# representative Bloblang mapping pool (the dynamic evaluator is
# already matrix-tested; here we need CHAIN parity, not coverage)
_MAPPINGS = [
    "root = this.uppercase()",
    "root = this.lowercase()",
    "root = this.reverse()",
    'root = "[" + this + "]"',
    "root = this.slice(0, 5)",
    "root = this.length().string()",
    "root = this.replace_all(\"a\", \"@\")",
    "root = this.trim()",
]


def _echo_server(transform):
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


def _outcome(fn):
    """(ok, value) or (err, exception type) — a tool call that fails
    identically on both tiers is parity too (content like '0' parses
    as a JSON number, so string methods raise on either path)."""
    try:
        return ("ok", fn())
    except Exception as exc:  # noqa: BLE001 — parity of failures
        return ("err", type(exc).__name__)


@settings(max_examples=40, deadline=None)
@given(
    idx=st.lists(st.integers(0, len(_MAPPINGS) - 1), min_size=1,
                 max_size=4),
    content=st.text(max_size=60),
)
def test_mapping_chain_parity_vs_registry_scalar(idx, content):
    """mapping-only chains: the shim evaluator must equal the
    central registry's scalar Bloblang path byte-for-byte."""
    specs = [{"mapping": _MAPPINGS[i]} for i in idx]
    reg = AgentToolRegistry()
    reg._tools["t"] = {"processors": specs, "description": ""}
    assert _outcome(lambda: _eval_inline_chain(specs, content)) == \
        _outcome(lambda: reg.invoke("t", content))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    content=st.text(
        alphabet=st.characters(codec="utf-8",
                               blacklist_categories=("Cs",),
                               blacklist_characters="\x00"),
        max_size=40),
    pre=st.integers(0, len(_MAPPINGS) - 1),
)
def test_http_chain_parity_vs_processor_path(spark, content, pre):
    """mapping→http chains: the shim's urllib call must produce the
    same content the real `http` processor produces for the same
    one-row frame (the central registry's general path).
    NUL is excluded: Spark's JVM-side UTF-8 string round-trip is the
    authoritative seam and the processor path would carry it, but
    HTTP header-framed echo bodies are compared as decoded text."""
    srv, port = _echo_server(lambda b: json.dumps(
        {"echo": b, "n": len(b)}))
    try:
        specs = [{"mapping": _MAPPINGS[pre]},
                 {"http": {"url": f"http://127.0.0.1:{port}/t"}}]
        inline = _eval_inline_chain(specs, content)
        reg = AgentToolRegistry(spark)
        reg._tools["t"] = {"processors": specs, "description": ""}
        central = reg.invoke("t", content)
        assert inline == central
    finally:
        srv.shutdown()
        srv.server_close()


def test_command_chain_parity_vs_processor_path(spark):
    """mapping→command chains: the shim's subprocess line contract
    equals the central registry's subprocess processor path."""
    specs = [{"mapping": "root = this.uppercase()"},
             {"command": {"name": "tr", "args": ["A-Z", "a-z"]}}]
    reg = AgentToolRegistry(spark)
    reg._tools["t"] = {"processors": specs, "description": ""}
    for content in ("Hello World", "MiXeD", "x"):
        assert _eval_inline_chain(specs, content) == reg.invoke(
            "t", content)


def test_structured_json_doc_parity():
    """JSON-document content: the shim evaluator and the registry's
    scalar path must agree on dict-shaped messages and compact-JSON
    stringification."""
    specs = [{"mapping": "root.total = this.a + this.b"},
             {"mapping": "root = this.total.string()"}]
    reg = AgentToolRegistry()
    reg._tools["t"] = {"processors": specs, "description": ""}
    content = json.dumps({"a": 2, "b": 40})
    assert _eval_inline_chain(specs, content) == reg.invoke(
        "t", content) == "42"


# --- forced-general-path parity (r14 ADVICE #2: the tests above
# became tautological when http/command turned inline-safe — the
# registry routed them through the same evaluator under test; these
# force the one-row DataFrame processor path and cross-check it) ---


def _force_general(monkeypatch):
    import connect_spark.agent_mode as am

    monkeypatch.setattr(am, "_inline_safe_spec", lambda s: False)


def test_http_parity_general_path_forced(spark, monkeypatch):
    """The real `http` processor on a one-row frame must produce the
    same result as the inline urllib evaluation — shared transport
    (processors_ext._urllib_transport) incl. timeout/body semantics."""
    srv, port = _echo_server(lambda b: json.dumps(
        {"echo": b, "n": len(b)}))
    try:
        specs = [{"http": {"url": f"http://127.0.0.1:{port}/t",
                           "timeout": 5}}]
        inline = _eval_inline_chain(specs, "payload-x")
        _force_general(monkeypatch)
        reg = AgentToolRegistry(spark)
        reg._tools["t"] = {"processors": specs, "description": ""}
        assert reg.invoke("t", "payload-x") == inline
    finally:
        srv.shutdown()
        srv.server_close()


def test_command_parity_general_path_forced(spark, monkeypatch):
    """The real subprocess processor writes a separate `piped` column;
    the registry's general path must return THAT (the transformed
    output), matching the inline evaluator — not the untouched input
    column (the first-column read bug)."""
    specs = [{"command": {"name": "tr", "args": ["a-z", "A-Z"]}}]
    inline = _eval_inline_chain(specs, "hello world")
    assert inline == "HELLO WORLD"
    _force_general(monkeypatch)
    reg = AgentToolRegistry(spark)
    reg._tools["t"] = {"processors": specs, "description": ""}
    assert reg.invoke("t", "hello world") == inline


def test_mapping_parity_general_path_forced(spark, monkeypatch):
    """Even a mapping, forced onto the one-row-frame path, must hand
    `this` the MESSAGE content — not the {content: ...} row envelope
    (the d6fd1df defect class, now pinned on the general path too)."""
    specs = [{"mapping": "root = this.uppercase()"}]
    inline = _eval_inline_chain(specs, "abc")
    _force_general(monkeypatch)
    reg = AgentToolRegistry(spark)
    reg._tools["t"] = {"processors": specs, "description": ""}
    assert reg.invoke("t", "abc") == inline == "ABC"


def test_command_spec_with_field_not_inline_safe():
    """A command spec carrying field/out config is NOT inline-safe
    (the scalar evaluator would silently drop those options —
    r14 ADVICE #1)."""
    from connect_spark.agent_mode import _inline_safe_spec

    assert _inline_safe_spec(
        {"command": {"name": "tr", "args": ["a", "b"]}})
    assert not _inline_safe_spec(
        {"command": {"name": "tr", "args": ["a", "b"],
                     "field": "doc"}})
    assert not _inline_safe_spec(
        {"command": {"name": "tr", "out": "piped"}})
    # http `field` is likewise a column the scalar chain cannot honor
    assert not _inline_safe_spec(
        {"http": {"url": "http://x/", "field": "doc"}})
    assert _inline_safe_spec(
        {"http": {"url": "http://x/", "timeout": 5}})
