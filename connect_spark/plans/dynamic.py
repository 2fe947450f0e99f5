"""``dynamic`` input/output: a labeled broker whose component set is
mutable at runtime through a REST surface.

Reference: `docs/modules/components/pages/inputs/dynamic.adoc` and
`outputs/dynamic.adoc` — inputs/outputs are identified by unique
labels, statically seeded from the config's ``inputs``/``outputs``
maps, then created/updated/removed at runtime via HTTP endpoints
(``GET /inputs``, ``GET|POST|DELETE /inputs/{id}``,
``GET /inputs/{id}/uptime``; same for ``/outputs``). The output broker
pattern is always ``fan_out``.

Spark mapping. A compiled plan is immutable once a query starts, so
"runtime" here means *plan-build boundaries*: every `Pipeline.
dataframe()` / micro-batch rebuild consults the registry, which is
exactly the reference's semantics of new inputs taking effect on their
next read. The registry is addressed by the config's ``prefix`` so
multiple pipelines can share (or isolate) a control plane. The REST
surface is a transport-free ``handle(method, path, body)`` dispatcher
plus an optional real HTTP server (stdlib ``http.server``) bound to it
— the driver process owns the control plane, mutation never touches
executors.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass, field
from typing import Any


def _go_duration(seconds: float) -> str:
    """Format like Go's ``time.Duration.String()``: ``72h3m0.5s``."""
    if seconds < 0:
        seconds = 0.0
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    out = ""
    if h:
        out += f"{int(h)}h"
    if m or h:
        out += f"{int(m)}m"
    s_str = f"{s:.9f}".rstrip("0").rstrip(".")
    return out + f"{s_str or '0'}s"


@dataclass
class _Entry:
    config: dict[str, Any]
    created: float = field(default_factory=time.monotonic)


class DynamicSet:
    """One labeled component map (the inputs side or the outputs side)."""

    def __init__(self) -> None:
        self._entries: dict[str, _Entry] = {}
        self._tombstones: set[str] = set()
        self._lock = threading.Lock()

    def seed(self, statics: dict[str, dict[str, Any]]) -> None:
        """Statically create configured components (dynamic.adoc
        ``inputs``/``outputs`` field). Runtime state wins: a label the
        user updated or deleted is not re-seeded on plan rebuild."""
        with self._lock:
            for label, conf in (statics or {}).items():
                if label not in self._entries and label not in self._tombstones:
                    self._entries[label] = _Entry(dict(conf))

    def set(self, label: str, conf: dict[str, Any]) -> None:
        with self._lock:
            self._tombstones.discard(label)
            self._entries[label] = _Entry(dict(conf))

    def delete(self, label: str) -> bool:
        with self._lock:
            if label in self._entries:
                del self._entries[label]
                self._tombstones.add(label)
                return True
            return False

    def get(self, label: str) -> dict[str, Any] | None:
        with self._lock:
            e = self._entries.get(label)
            return dict(e.config) if e else None

    def uptime(self, label: str) -> str:
        with self._lock:
            e = self._entries.get(label)
            if e is None:
                return "stopped"
            return _go_duration(time.monotonic() - e.created)

    def items(self) -> list[tuple[str, dict[str, Any]]]:
        with self._lock:
            return [(k, dict(e.config)) for k, e in sorted(self._entries.items())]

    def describe(self) -> dict[str, Any]:
        with self._lock:
            return {
                label: {
                    "uptime": _go_duration(time.monotonic() - e.created),
                    "config": dict(e.config),
                }
                for label, e in sorted(self._entries.items())
            }


class DynamicRegistry:
    """The control plane for one ``prefix``: an inputs set, an outputs
    set, and the REST dispatcher over both."""

    def __init__(self) -> None:
        self.inputs = DynamicSet()
        self.outputs = DynamicSet()

    def _side(self, name: str) -> DynamicSet:
        if name == "inputs":
            return self.inputs
        if name == "outputs":
            return self.outputs
        raise KeyError(name)

    def handle(
        self, method: str, path: str, body: str | bytes | None = None
    ) -> tuple[int, Any]:
        """Transport-free REST dispatch (dynamic.adoc Endpoints).

        Returns ``(status, payload)``; payload is JSON-able or a plain
        string (uptime endpoint)."""
        parts = [p for p in path.strip("/").split("/") if p]
        if not parts or parts[0] not in ("inputs", "outputs"):
            return 404, {"error": f"unknown path {path!r}"}
        side = self._side(parts[0])
        method = method.upper()
        if len(parts) == 1:
            if method == "GET":
                return 200, side.describe()
            return 405, {"error": "method not allowed"}
        label = parts[1]
        if len(parts) == 3 and parts[2] == "uptime":
            if method == "GET":
                return 200, side.uptime(label)
            return 405, {"error": "method not allowed"}
        if len(parts) != 2:
            return 404, {"error": f"unknown path {path!r}"}
        if method == "GET":
            conf = side.get(label)
            if conf is None:
                return 404, {"error": f"{label!r} not found"}
            return 200, conf
        if method == "POST":
            if isinstance(body, bytes):
                body = body.decode("utf-8")
            try:
                conf = _parse_body(body or "")
            except Exception as ex:
                return 400, {"error": f"unparseable body: {ex}"}
            if not isinstance(conf, dict) or len(conf) != 1:
                return 400, {"error": "body must be one {component: config}"}
            side.set(label, conf)
            return 200, {"status": "created"}
        if method == "DELETE":
            if side.delete(label):
                return 200, {"status": "deleted"}
            return 404, {"error": f"{label!r} not found"}
        return 405, {"error": "method not allowed"}

    def serve(self, port: int = 0):
        """Bind the dispatcher to a real HTTP server (stdlib) on
        ``port`` (0 = ephemeral) in a daemon thread. Returns the
        ``HTTPServer``; ``.server_address[1]`` is the bound port and
        ``.shutdown()`` stops it."""
        import http.server

        registry = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def _respond(self) -> None:
                length = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(length) if length else None
                status, payload = registry.handle(
                    self.command, self.path, body
                )
                data = (
                    payload.encode()
                    if isinstance(payload, str)
                    else json.dumps(payload).encode()
                )
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            do_GET = do_POST = do_DELETE = _respond

            def log_message(self, *a: Any) -> None:  # quiet tests
                pass

        server = http.server.HTTPServer(("127.0.0.1", port), Handler)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server


def _parse_body(body: str) -> Any:
    """Accept YAML or JSON (dynamic.adoc: 'in YAML or JSON format')."""
    try:
        return json.loads(body)
    except json.JSONDecodeError:
        import yaml

        return yaml.safe_load(body)


_REGISTRIES: dict[str, DynamicRegistry] = {}
_REG_LOCK = threading.Lock()


def dynamic_registry(prefix: str = "") -> DynamicRegistry:
    with _REG_LOCK:
        if prefix not in _REGISTRIES:
            _REGISTRIES[prefix] = DynamicRegistry()
        return _REGISTRIES[prefix]


def reset_registry(prefix: str = "") -> None:
    """Test/seam hook: drop a prefix's control-plane state."""
    with _REG_LOCK:
        _REGISTRIES.pop(prefix, None)


def build_dynamic_input(spark, conf: dict[str, Any]):
    """`input: dynamic:` — union (broker merge) of the registry's
    current input set; raises if the set is empty."""
    from connect_spark.plans.pipeline import PipelineConfigError, _build_input

    reg = dynamic_registry(conf.get("prefix", ""))
    reg.inputs.seed(conf.get("inputs") or {})
    items = reg.inputs.items()
    if not items:
        raise PipelineConfigError("dynamic input has no components")
    children = [_build_input(spark, c) for _, c in items]
    out = children[0]
    for child in children[1:]:
        out = out.unionByName(child, allowMissingColumns=True)
    return out


def run_dynamic_output(df, conf: dict[str, Any]):
    """`output: dynamic:` — fan_out: every message is delivered to each
    component in the registry's current output set (dynamic.adoc: 'The
    broker pattern used is always fan_out')."""
    from connect_spark.plans.pipeline import PipelineConfigError, _run_output

    reg = dynamic_registry(conf.get("prefix", ""))
    reg.outputs.seed(conf.get("outputs") or {})
    items = reg.outputs.items()
    if not items:
        raise PipelineConfigError("dynamic output has no components")
    # fan_out must deliver the SAME rows to every output: with >1
    # output, pin the plan's result before the per-output actions —
    # otherwise each action recomputes the plan, and non-deterministic
    # inputs (http polls, rand/uuid columns) diverge across outputs.
    pinned = len(items) > 1 and not df.isStreaming
    if pinned:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()  # materialize once before any output reads it
    try:
        last = None
        for _, c in items:
            last = _run_output(df, c)
        return last
    finally:
        if pinned:
            df.unpersist()
