"""Pipelines as callable tools — the reference's MCP-server mode
(SURVEY.md §3.3; internal/mcp/run.go:28-65 serves a repository of
component configs as tools over stdio/HTTP).

The engine analog is a thin service layer over the pipeline builder:
a repository of named pipeline configs becomes a tool list; invoking
a tool runs the pipeline (with optional per-call `env` overlaying
`${VAR}` interpolations — the parameterization seam) and returns the
result rows. Protocol endpoints:

    GET  /tools              → {"tools": [{name, description}]}
    POST /tools/<name>       → {"rows": [...], "count": N}
         body: {"env": {...}, "limit": N}

`ToolServer.serve()` binds a local HTTP endpoint (stdlib, same
pattern as the dynamic control plane); `handle()` is the transport-
free core the tests and an MCP adapter drive directly.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession


class ToolServer:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tools: dict[str, dict[str, Any]] = {}

    def register(self, name: str, config: dict | str,
                 description: str = "") -> None:
        """Register a pipeline config (dict or YAML text/path) as a
        callable tool."""
        self._tools[name] = {
            "config": config, "description": description,
        }

    def register_dir(self, path: str) -> int:
        """Register every *.yaml in a directory (the reference's
        config-repository mode); returns how many were added."""
        import glob
        import os

        n = 0
        for p in sorted(glob.glob(os.path.join(path, "*.yaml"))):
            with open(p, encoding="utf-8") as fh:
                head = fh.readline().strip()
            self.register(
                os.path.splitext(os.path.basename(p))[0],
                p,
                description=head.lstrip("# ").strip(),
            )
            n += 1
        return n

    # ---- transport-free protocol core -------------------------------

    def handle(self, verb: str, path: str, body: str = "") -> tuple[int, dict]:
        if verb == "GET" and path == "/tools":
            return 200, {"tools": [
                {"name": name, "description": t["description"]}
                for name, t in sorted(self._tools.items())
            ]}
        if verb == "POST" and path.startswith("/tools/"):
            name = path[len("/tools/"):]
            tool = self._tools.get(name)
            if tool is None:
                return 404, {"error": f"unknown tool {name!r}"}
            try:
                args = json.loads(body) if body else {}
            except ValueError as exc:
                return 400, {"error": f"invalid JSON body: {exc}"}
            from connect_spark.plans.pipeline import (
                PipelineConfigError,
                build_pipeline,
            )

            try:
                pipeline = build_pipeline(
                    self.spark, tool["config"],
                    env=args.get("env"),
                )
                result = pipeline.run()
                if result is None:
                    return 200, {"rows": [], "count": 0}
                limit = int(args.get("limit", 100))
                rows = [
                    json.loads(r)
                    for r in result.limit(limit).toJSON().collect()
                ]
            except PipelineConfigError as exc:
                return 400, {"error": str(exc)}
            except Exception as exc:  # noqa: BLE001 — the HTTP
                # boundary must answer, never drop the connection
                return 500, {"error": f"{type(exc).__name__}: {exc}"}
            return 200, {"rows": rows, "count": len(rows)}
        return 404, {"error": f"unhandled {verb} {path}"}

    # ---- HTTP endpoint ----------------------------------------------

    def serve(self, port: int = 0):
        """Serve the protocol on a local stdlib endpoint; returns
        (server, bound_port). Caller shuts the server down."""
        import http.server
        import threading

        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def _respond(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode() if length else ""
                status, doc = outer.handle(
                    self.command, self.path, body
                )
                payload = json.dumps(doc).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            do_GET = do_POST = _respond  # noqa: N815 — stdlib API

            def log_message(self, *a):  # quiet
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
        srv.daemon_threads = True
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, srv.server_address[1]
