"""`http_server` / `gateway` inputs — push delivery over HTTP
(docs/modules/components/pages/inputs/{http_server,gateway}.adoc:26).

The reference runs an HTTP endpoint whose POST bodies become messages.
Here a stdlib ThreadingHTTPServer accepts POSTs and appends each body
as one line in a spool directory; the input reads the spool as the
message stream — batch builds see everything delivered so far, and
`streaming=true` tails the directory with a file stream (new spool
files become new micro-batches).

This is the same land-then-read shape the survey prescribes for
server-push sources ("server-push → land in Kafka first", SURVEY.md
§2.D) with the landing zone being a local spool instead of a broker.
"""

from __future__ import annotations

import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SERVERS: dict[str, tuple[ThreadingHTTPServer, int, str]] = {}
_LOCK = threading.Lock()


def start_http_server(
    label: str, spool_dir: str, port: int = 0, endpoint: str = "/post"
) -> int:
    """Start (or return) the labeled push endpoint; returns its port."""
    with _LOCK:
        if label in _SERVERS:
            existing = _SERVERS[label]
            if existing[2] != spool_dir:
                raise ValueError(
                    f"http_server label {label!r} already running with "
                    f"spool_dir {existing[2]!r}; use a distinct label "
                    "per endpoint"
                )
            return existing[1]
        os.makedirs(spool_dir, exist_ok=True)

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 — stdlib API
                if self.path != endpoint:
                    self.send_response(404)
                    self.end_headers()
                    return
                size = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(size)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/x-protobuf") or \
                        ctype.startswith("application/octet-stream"):
                    # binary bodies (e.g. OTLP protobuf) spool as a
                    # base64 JSON wrapper LINE so the same .jsonl
                    # spool (and the streaming text tail) carries
                    # them — consumers unwrap __binary_b64__
                    import base64 as _b64
                    import json as _json

                    body = _json.dumps({
                        "__binary_b64__": _b64.b64encode(body).decode()
                    }).encode()
                fname = os.path.join(
                    spool_dir, f"msg-{time.time_ns():020d}.jsonl"
                )
                with open(fname + ".tmp", "wb") as fh:
                    fh.write(body)
                    if not body.endswith(b"\n"):
                        fh.write(b"\n")
                os.rename(fname + ".tmp", fname)  # atomic publish
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):  # quiet
                pass

        server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        _SERVERS[label] = (server, server.server_address[1], spool_dir)
        return server.server_address[1]


def stop_http_server(label: str) -> None:
    with _LOCK:
        entry = _SERVERS.pop(label, None)
    if entry:
        entry[0].shutdown()


def http_server_port(label: str) -> int:
    return _SERVERS[label][1]


def http_server_input(spark: SparkSession, conf: dict) -> DataFrame:
    """Input builder: ensures the labeled server runs and returns the
    delivered messages (content column; empty frame before the first
    delivery). `streaming: true` returns a readStream over the spool."""
    label = conf.get("label", "default")
    spool_dir = conf["spool_dir"]
    start_http_server(
        label,
        spool_dir,
        port=int(conf.get("port", 0)),
        endpoint=conf.get("endpoint", "/post"),
    )
    if conf.get("streaming"):
        return (
            spark.readStream.format("text")
            .schema("content string")
            .option("maxFilesPerTrigger", int(conf.get("max_files", 16)))
            # in-flight .tmp files must never be listed: the atomic
            # rename would race the read task (missing-file failure or
            # duplicate delivery)
            .option("pathGlobFilter", "*.jsonl")
            .load(spool_dir)
            .withColumnRenamed("value", "content")
        )
    if not any(f.endswith(".jsonl") for f in os.listdir(spool_dir)):
        return spark.createDataFrame([], "content string")
    return spark.read.text(spool_dir + "/*.jsonl").withColumnRenamed(
        "value", "content"
    )
