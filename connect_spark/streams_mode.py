"""Streams mode — N isolated stream topologies managed in one engine
process over a REST control plane (the reference's streams mode,
cited from inputs/inproc.adoc:34's guides xref; API shape: GET
/streams listing, POST/GET/DELETE /streams/{id}).

Each stream is its own pipeline config. Streaming inputs run
CONTINUOUSLY — every micro-batch delivers through the stream's output
via foreachBatch (Pipeline.start()) — while batch inputs execute once
and report `completed`. Streams are isolated the way the reference
isolates them: connect two streams deliberately via the inproc
input/output pair, not implicitly.
"""

from __future__ import annotations

import json
import time
from typing import Any

from pyspark.sql import SparkSession


class StreamsServer:
    def __init__(self, spark: SparkSession):
        import threading

        self.spark = spark
        self._streams: dict[str, dict[str, Any]] = {}
        self._lock = threading.Lock()  # ThreadingHTTPServer races

    # ---- lifecycle --------------------------------------------------

    def create(self, stream_id: str, config: dict | str,
               checkpoint: str | None = None) -> dict:
        # reserve the id under the lock BEFORE building — concurrent
        # creates with the same id must not each start a query (the
        # loser's StreamingQuery would leak unreachable forever)
        with self._lock:
            if stream_id in self._streams:
                raise ValueError(f"stream {stream_id!r} already exists")
            entry: dict[str, Any] = {
                "pipeline": None,
                "created": time.time(),
                "query": None,
                "status": "starting",
            }
            self._streams[stream_id] = entry
        try:
            from connect_spark.plans.pipeline import build_pipeline

            pipeline = build_pipeline(self.spark, config)
            entry["pipeline"] = pipeline
            df = pipeline.dataframe()
            if df.isStreaming:
                entry["query"] = pipeline.start(checkpoint=checkpoint)
                entry["status"] = "running"
            else:
                pipeline.run()
                entry["status"] = "completed"
        except Exception:
            with self._lock:
                self._streams.pop(stream_id, None)
            raise
        return self.status(stream_id)

    def status(self, stream_id: str) -> dict:
        entry = self._streams.get(stream_id)
        if entry is None:
            raise KeyError(stream_id)
        q = entry["query"]
        active = bool(q and q.isActive)
        return {
            "id": stream_id,
            "active": active,
            "status": (
                "running" if active else entry["status"]
                if entry["status"] == "completed" else "stopped"
            ),
            "uptime_s": round(time.time() - entry["created"], 3),
            "streaming": q is not None,
        }

    def list(self) -> list[dict]:
        return [self.status(sid) for sid in sorted(self._streams)]

    def process_available(self, stream_id: str) -> None:
        """Drain everything currently available (tests / bounded
        sources); the reference's streams run until deleted."""
        q = self._streams[stream_id]["query"]
        if q is not None:
            q.processAllAvailable()

    def delete(self, stream_id: str) -> bool:
        with self._lock:
            entry = self._streams.pop(stream_id, None)
        if entry is None:
            return False
        q = entry["query"]
        if q is not None and q.isActive:
            q.stop()
        return True

    def shutdown(self) -> None:
        for sid in list(self._streams):
            self.delete(sid)

    # ---- REST protocol ----------------------------------------------

    def handle(self, verb: str, path: str, body: str = "") -> tuple[int, dict]:
        if verb == "GET" and path == "/streams":
            return 200, {"streams": self.list()}
        if path.startswith("/streams/"):
            sid = path[len("/streams/"):]
            if verb == "POST":
                try:
                    config = (
                        json.loads(body) if body.lstrip().startswith("{")
                        else body
                    )
                    return 200, self.create(sid, config)
                except ValueError as exc:
                    return 400, {"error": str(exc)}
                except Exception as exc:  # noqa: BLE001 — REST boundary
                    return 400, {"error": f"{type(exc).__name__}: {exc}"}
            if verb == "GET":
                try:
                    return 200, self.status(sid)
                except KeyError:
                    return 404, {"error": f"unknown stream {sid!r}"}
            if verb == "DELETE":
                if self.delete(sid):
                    return 200, {"deleted": sid}
                return 404, {"error": f"unknown stream {sid!r}"}
        return 404, {"error": f"unhandled {verb} {path}"}

    def serve(self, port: int = 0):
        """Local stdlib endpoint for the protocol; returns
        (server, bound_port)."""
        import http.server
        import threading

        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def _respond(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode() if length else ""
                status, doc = outer.handle(self.command, self.path, body)
                payload = json.dumps(doc).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            do_GET = do_POST = do_DELETE = _respond  # noqa: N815

            def log_message(self, *a):  # quiet
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
        srv.daemon_threads = True
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, srv.server_address[1]
