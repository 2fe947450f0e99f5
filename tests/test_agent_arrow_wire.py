"""`protocol: arrow` on the agent wire (r13 verdict task #6):
invoke_agent stays strictly message-at-a-time, but each call carries
a one-row Arrow-IPC body instead of a JSON message.  NOT the default
protocol — per-message Arrow framing loses to compact JSON at 1-row
granularity (scripts/ab_agent_arrow.py, SCALE.md) — but the wire
must work end-to-end and validate its config."""

from __future__ import annotations

import sys

import pytest

from connect_spark.plans.pipeline import (
    PROCESSORS,
    PipelineConfigError,
)

_ARROW_AGENT = '''\
import json, sys
import pyarrow as pa

stdin, stdout = sys.stdin.buffer, sys.stdout.buffer


def reply(rid, result=None, body=None):
    hdr = {"id": rid, "result": result, "error": None}
    payload = b""
    if body is not None:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, body.schema) as w:
            w.write_table(body)
        payload = sink.getvalue().to_pybytes()
        hdr["body_len"] = len(payload)
    stdout.write(json.dumps(hdr).encode() + b"\\n")
    if payload:
        stdout.write(payload)
    stdout.flush()


while True:
    line = stdin.readline()
    if not line:
        break
    hdr = json.loads(line)
    rid, m = hdr["id"], hdr["method"]
    body = None
    n = int(hdr.get("body_len") or 0)
    if n:
        body = pa.ipc.open_stream(stdin.read(n)).read_all()
    if m == "invoke_agent":
        assert body is not None and body.num_rows == 1, \\
            "agent wire is message-at-a-time"
        rec = body.to_pylist()[0]
        text = rec.get("content") or ""
        out = pa.table({
            "content": pa.array([text.upper()], pa.string()),
            "n_chars": pa.array([len(text)], pa.int64()),
        })
        reply(rid, result={}, body=out)
    else:
        reply(rid, result={})
        if m == "close":
            break
'''


def test_agent_arrow_wire_end_to_end(tmp_path, spark):
    script = tmp_path / "agent.py"
    script.write_text(_ARROW_AGENT)
    df = spark.createDataFrame(
        [("hello",), ("arrow wire",), ("",)],
        "content STRING").repartition(2)
    out = PROCESSORS["redpanda_agent_runtime"](df, {
        "command": [sys.executable, str(script)],
        "protocol": "arrow",
        "output_schema": "content STRING, n_chars BIGINT",
    })
    rows = sorted((r.content, r.n_chars) for r in out.collect())
    assert rows == [("", 0), ("ARROW WIRE", 10), ("HELLO", 5)]
    # typed end-to-end: the child's int64 IS the output type
    assert [f.dataType.simpleString() for f in out.schema.fields] \
        == ["string", "bigint"]


def test_agent_arrow_requires_output_schema(spark):
    df = spark.createDataFrame([("x",)], "content STRING")
    with pytest.raises(PipelineConfigError, match="output_schema"):
        PROCESSORS["redpanda_agent_runtime"](df, {
            "command": [sys.executable, "-c", "pass"],
            "protocol": "arrow",
        })


def test_agent_unknown_protocol_rejected(spark):
    df = spark.createDataFrame([("x",)], "content STRING")
    with pytest.raises(PipelineConfigError, match="protocol"):
        PROCESSORS["redpanda_agent_runtime"](df, {
            "command": [sys.executable, "-c", "pass"],
            "protocol": "grpc",
        })
