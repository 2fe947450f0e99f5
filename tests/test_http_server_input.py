"""http_server / gateway push inputs (sources/http_server.py)."""

from __future__ import annotations

import json
import urllib.request
import uuid

from connect_spark.plans.pipeline import build_pipeline
from connect_spark.sources.http_server import (
    http_server_port,
    stop_http_server,
)


def _post(port, body, endpoint="/post"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{endpoint}",
        data=body.encode(),
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=5).status


def test_push_messages_become_input_rows(spark, tmp_path):
    label = "t-" + uuid.uuid4().hex[:8]
    cfg = {
        "input": {
            "http_server": {
                "label": label,
                "spool_dir": str(tmp_path / "spool"),
            }
        }
    }
    try:
        # build once: server starts, no messages yet
        assert build_pipeline(spark, cfg).dataframe().count() == 0
        port = http_server_port(label)
        assert _post(port, json.dumps({"n": 1})) == 200
        assert _post(port, json.dumps({"n": 2})) == 200
        rows = build_pipeline(spark, cfg).dataframe().collect()
        got = sorted(json.loads(r["content"])["n"] for r in rows)
        assert got == [1, 2]
    finally:
        stop_http_server(label)


def test_streaming_tail_of_pushes(spark, tmp_path):
    label = "t-" + uuid.uuid4().hex[:8]
    cfg = {
        "input": {
            "http_server": {
                "label": label,
                "spool_dir": str(tmp_path / "spool"),
                "streaming": True,
            }
        }
    }
    import uuid as _uuid

    # build starts the server as a side effect of dataframe()
    df = build_pipeline(spark, cfg).dataframe()
    assert df.isStreaming
    port = http_server_port(label)
    _post(port, "hello-a")
    _post(port, "hello-b")
    name = "hs_" + _uuid.uuid4().hex[:8]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["content"] for r in spark.table(name).collect()}
        assert got == {"hello-a", "hello-b"}
        _post(port, "hello-c")
        q.processAllAvailable()
        assert spark.table(name).count() == 3
    finally:
        q.stop()
        stop_http_server(label)
