"""SaaS connectors, AI modality shims, RPC processors (plans/saas_ext.py)."""

from __future__ import annotations

import json

import pytest

from connect_spark.plans.pipeline import (
    INPUT_KINDS,
    OUTPUT_KINDS,
    PROCESSORS,
    Pipeline,
    PipelineConfigError,
)
from connect_spark.plans.processors_ext import register_http_transport
from connect_spark.plans.saas_ext import _SAAS_INPUTS


_SAAS_CONF = {
    "discord": {"channel_id": "c1", "bot_token": "t"},
    "slack": {"channel_id": "c1", "bot_token": "t"},
    "slack_users": {"bot_token": "t"},
    "twitter_search": {"query": "spark"},
    "jira": {"base_url": "https://j", "jql": "project=X"},
    "salesforce": {"instance_url": "https://sf", "query": "SELECT Id"},
    "salesforce_graphql": {"instance_url": "https://sf", "query": "{}"},
    "splunk": {"url": "https://sp", "query": "search *"},
    "aws_cloudwatch_logs": {"log_group": "g"},
    "spicedb_watch": {"endpoint": "https://sdb"},
}

_SAAS_BODY = {
    "discord": json.dumps([{"id": "1", "content": "hi"},
                           {"id": "2", "content": "yo"}]),
    "slack": json.dumps({"messages": [{"ts": "1"}, {"ts": "2"}]}),
    "slack_users": json.dumps({"members": [{"id": "U1"}, {"id": "U2"}]}),
    "twitter_search": json.dumps({"data": [{"id": "1"}, {"id": "2"}]}),
    "jira": json.dumps({"issues": [{"key": "X-1"}, {"key": "X-2"}]}),
    "salesforce": json.dumps({"records": [{"Id": "a"}, {"Id": "b"}]}),
    "salesforce_graphql": json.dumps({"data": [{"n": 1}, {"n": 2}]}),
    "splunk": json.dumps({"results": [{"raw": "r1"}, {"raw": "r2"}]}),
    "aws_cloudwatch_logs": json.dumps(
        {"events": [{"message": "m1"}, {"message": "m2"}]}),
    "spicedb_watch": '{"update": 1}\n{"update": 2}',
}


@pytest.mark.parametrize("kind", sorted(_SAAS_INPUTS))
def test_saas_input_polls_items(spark, kind):
    register_http_transport(
        f"fake_{kind}", lambda url, verb, headers, body,
        _k=kind: _SAAS_BODY[_k])
    conf = {**_SAAS_CONF[kind], "transport": f"fake_{kind}"}
    df = Pipeline(spark, {"input": {kind: conf}}).dataframe()
    rows = df.collect()
    assert len(rows) == 2, kind
    assert all(json.loads(r.content) for r in rows)


def test_saas_input_requires_identity(spark):
    with pytest.raises(PipelineConfigError, match="channel_id"):
        Pipeline(spark, {"input": {"discord": {"bot_token": "t"}}}
                 ).dataframe()


def test_git_input_reads_repo(spark, tmp_path):
    import subprocess as sp

    repo = str(tmp_path / "repo")
    sp.run(["git", "init", "-q", repo], check=True)
    (tmp_path / "repo" / "a.txt").write_text("alpha")
    (tmp_path / "repo" / "b.md").write_text("beta")
    sp.run(["git", "-C", repo, "add", "."], check=True)
    sp.run(["git", "-C", repo, "-c", "user.email=t@t", "-c",
            "user.name=t", "commit", "-qm", "init"], check=True)
    df = Pipeline(spark, {"input": {"git": {
        "repository": repo, "include_patterns": ["*.txt"]}}}).dataframe()
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].git_file_path == "a.txt"
    assert bytes(rows[0].content) == b"alpha"
    assert len(rows[0].git_commit) == 40


def test_otlp_http_output_and_gate(spark):
    bodies = []
    register_http_transport(
        "cap_otlp", lambda url, verb, headers, body:
        bodies.append((url, body)) or "")
    df = spark.createDataFrame(
        [("s1", 5)], "name string, dur int").coalesce(1)
    OUTPUT_KINDS["otlp_http"](
        df, {"url": "http://col", "transport": "cap_otlp"})
    url, body = bodies[0]
    assert url.endswith("/v1/traces")
    doc = json.loads(body)
    span = doc["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
    assert span == {"name": "s1", "dur": 5}
    with pytest.raises(PipelineConfigError, match="gRPC"):
        INPUT_KINDS["otlp_grpc"](spark, {})


def test_otlp_http_input_flattens_spans(spark, tmp_path):
    import urllib.request

    from connect_spark.sources.http_server import (
        http_server_port,
        stop_http_server,
    )

    spool = str(tmp_path / "otlp_spool")
    conf = {"label": "otlp_test", "spool_dir": spool}
    try:
        Pipeline(spark, {"input": {"otlp_http": conf}}).dataframe()
        port = http_server_port("otlp_test")
        envelope = json.dumps({"resourceSpans": [{"scopeSpans": [{
            "spans": [{"name": "a"}, {"name": "b"}]}]}]})
        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/post", data=envelope.encode(),
            method="POST"))
        df = Pipeline(spark, {"input": {"otlp_http": conf}}).dataframe()
        names = sorted(json.loads(r.content)["name"] for r in df.collect())
        assert names == ["a", "b"]
    finally:
        stop_http_server("otlp_test")


def test_slack_discord_outputs_post(spark):
    calls = []
    register_http_transport(
        "cap_chat", lambda url, verb, headers, body:
        calls.append((url, json.loads(body))) or "")
    df = spark.createDataFrame([("hello",)], "content string")
    OUTPUT_KINDS["slack_post"](
        df, {"channel_id": "C1", "transport": "cap_chat"})
    OUTPUT_KINDS["discord"](
        df, {"channel_id": "D1", "transport": "cap_chat"})
    assert calls[0][0].endswith("chat.postMessage")
    assert calls[0][1] == {"channel": "C1", "text": "hello"}
    assert "/channels/D1/messages" in calls[1][0]
    assert calls[1][1] == {"content": "hello"}


def test_http_server_output_serves_spool(spark, tmp_path):
    import urllib.request

    spool = str(tmp_path / "served")
    port_file = str(tmp_path / "port")
    df = spark.createDataFrame([(1, "x")], "id int, v string")
    OUTPUT_KINDS["http_server"](
        df, {"spool_dir": spool, "port_file": port_file})
    port = int(open(port_file).read())
    body = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/get").read().decode()
    assert json.loads(body.strip()) == {"id": 1, "v": "x"}


def test_subprocess_output_pipes_lines(spark, tmp_path):
    sink = str(tmp_path / "sink.txt")
    df = spark.createDataFrame([("l1",), ("l2",)], "content string")
    OUTPUT_KINDS["subprocess"](
        df, {"name": "tee", "args": [sink]})
    got = sorted(open(sink).read().splitlines())
    assert got == ["l1", "l2"]


def test_aws_lambda_processor(spark):
    register_http_transport(
        "fake_lambda", lambda url, verb, headers, body:
        json.dumps({"echo": json.loads(body)["n"] * 10}))
    df = spark.createDataFrame([(1,), (2,)], "n int")
    out = PROCESSORS["aws_lambda"](df, {
        "function": "f", "transport": "fake_lambda"})
    got = sorted(json.loads(r.content)["echo"] for r in out.collect())
    assert got == [10, 20]
    out2 = PROCESSORS["aws_lambda"](df, {
        "function": "f", "transport": "fake_lambda",
        "result_field": "lambda_reply"})
    assert set(out2.columns) == {"n", "lambda_reply"}


def test_redis_processor_commands(spark, tmp_path):
    store = str(tmp_path / "redis")
    seed = spark.createDataFrame(
        [("k1", "v1")], "key string, value string")
    PROCESSORS["redis"](seed, {
        "store_path": store, "command": "set", "value_columns": ["value"]})
    df = spark.createDataFrame([("k1",)], "key string")
    got = PROCESSORS["redis"](df, {"store_path": store, "command": "get"})
    assert got.collect()[0].value == "v1"
    # incrby twice accumulates
    inc = spark.createDataFrame([("c1", 2), ("c1", 3)],
                                "key string, amt int")
    PROCESSORS["redis"](inc, {
        "store_path": str(tmp_path / "ctr"), "command": "incrby",
        "by_column": "amt"})
    again = PROCESSORS["redis"](
        spark.createDataFrame([("c1", 5)], "key string, amt int"),
        {"store_path": str(tmp_path / "ctr"), "command": "incrby",
         "by_column": "amt"})
    assert again.collect()[0].value == 10
    with pytest.raises(PipelineConfigError, match="Lua"):
        PROCESSORS["redis_script"](df, {})


def test_sentry_and_slack_thread_processors(spark):
    events = []
    register_http_transport(
        "cap_sentry", lambda url, verb, headers, body:
        events.append(json.loads(body)) or json.dumps({"ok": True}))
    df = spark.createDataFrame([("boom",)], "content string")
    out = PROCESSORS["sentry_capture"](df, {
        "transport": "cap_sentry", "level": "error"})
    assert out.count() == 1  # pass-through
    assert events[0] == {"level": "error", "message": "boom"}
    out2 = PROCESSORS["slack_thread"](df, {
        "transport": "cap_sentry", "channel_id": "C1"})
    row = out2.collect()[0]
    assert json.loads(row.slack_ts) == {"ok": True}


def test_google_drive_processors(spark):
    register_http_transport(
        "fake_drive", lambda url, verb, headers, body:
        "FILE:" + url.rsplit("/", 1)[-1].split("?")[0])
    df = spark.createDataFrame([("f1",), ("f2",)], "file_id string")
    out = PROCESSORS["google_drive_download"](
        df, {"transport": "fake_drive"})
    got = dict((r.file_id, r.content) for r in out.collect())
    assert got == {"f1": "FILE:f1", "f2": "FILE:f2"}
    out2 = PROCESSORS["google_drive_list_labels"](
        df, {"transport": "fake_drive"})
    assert out2.collect()[0].labels.startswith("FILE:")


def test_google_drive_lookup_bound_trips(spark):
    register_http_transport(
        "fake_drive_b", lambda url, verb, headers, body: "x")
    df = spark.createDataFrame(
        [(f"f{i}",) for i in range(5)], "file_id string")
    with pytest.raises(PipelineConfigError, match="max_unique_payloads"):
        PROCESSORS["google_drive_download"](
            df, {"transport": "fake_drive_b", "max_unique_payloads": 3})


def test_ai_aliases_and_modalities(spark):
    df = spark.createDataFrame(
        [("summarize the quarterly report",)], "content string")
    out = PROCESSORS["aws_bedrock_chat"](df, {"prompt": "this.content"})
    assert out.collect()[0].reply.startswith("SUMMARY(")
    emb = PROCESSORS["gcp_vertex_ai_embeddings"](
        df, {"field": "content", "dimensions": 8})
    assert len(emb.collect()[0].embedding) == 8

    img = PROCESSORS["openai_image_generation"](
        df, {"prompt": "content", "size": "8x8"})
    png = bytes(img.collect()[0].image)
    assert png.startswith(b"\x89PNG\r\n\x1a\n") and png.endswith(
        b"IEND\xae B`\x82".replace(b" ", b""))
    img2 = PROCESSORS["openai_image_generation"](
        df, {"prompt": "content", "size": "8x8"})
    assert bytes(img2.collect()[0].image) == png  # deterministic

    sp_out = PROCESSORS["openai_speech"](df, {})
    wav = bytes(sp_out.collect()[0].audio)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"

    tr = PROCESSORS["openai_transcription"](sp_out, {})
    assert tr.collect()[0].transcript.startswith("transcript-")

    tl = PROCESSORS["openai_translation"](df, {})
    assert tl.collect()[0].translated.startswith("[en] summarize")


def test_sync_response_processor_stages_frame(spark):
    from connect_spark.plans.io_ext import _INPROC

    df = spark.createDataFrame([(1,)], "id int")
    out = PROCESSORS["sync_response"](df, {})
    assert out is df
    assert "sync_response" in _INPROC


def test_nats_request_reply(spark, tmp_path):
    from connect_spark.sources.mq import MessageBus

    bus_path = str(tmp_path / "bus")
    bus = MessageBus(bus_path)
    bus.publish("svc.reply", ["pong"])
    df = spark.createDataFrame([("ping",)], "content string")
    out = PROCESSORS["nats_request_reply"](df, {
        "bus_path": bus_path, "subject": "svc"})
    assert json.loads(out.collect()[0].reply) == "pong"
    # the request landed on the bus
    reqs = bus.subscribe(spark, "svc", streaming=False).collect()
    assert len(reqs) == 1


def test_aws_lambda_payload_bound(spark):
    register_http_transport("fake_l2", lambda *a: "{}")
    df = spark.createDataFrame([(i,) for i in range(5)], "n int")
    with pytest.raises(PipelineConfigError, match="distinct payloads"):
        PROCESSORS["aws_lambda"](df, {
            "function": "f", "transport": "fake_l2",
            "max_unique_payloads": 3})


def test_saas_url_query_is_percent_encoded(spark):
    """Round-4 ADVICE #5: user config interpolated into URL query
    strings must be percent-encoded — a jql like `project = X AND
    status = "Open"` has to survive the real urllib transport."""
    urls: list[str] = []
    register_http_transport(
        "cap_url", lambda url, verb, headers, body:
        urls.append(url) or json.dumps({"issues": [{"k": 1}]}))
    Pipeline(spark, {"input": {"jira": {
        "base_url": "https://j", "jql": 'project = X AND s = "Open"',
        "transport": "cap_url"}}}).dataframe().collect()
    assert urls[0] == (
        "https://j/rest/api/3/search?jql="
        "project%20%3D%20X%20AND%20s%20%3D%20%22Open%22"
    )
    # the encoded URL must parse as a valid http URL
    import urllib.parse

    parsed = urllib.parse.urlsplit(urls[0])
    assert " " not in urls[0] and parsed.query.startswith("jql=")

    urls.clear()
    register_http_transport(
        "cap_url2", lambda url, verb, headers, body:
        urls.append(url) or json.dumps({"records": [{"Id": "a"}]}))
    Pipeline(spark, {"input": {"salesforce": {
        "instance_url": "https://sf",
        "query": "SELECT Id FROM Account WHERE Name = 'x y'",
        "transport": "cap_url2"}}}).dataframe().collect()
    assert " " not in urls[0] and "%20" in urls[0]


def test_otlp_proto_roundtrip_unit():
    """Vendored OTLP trace descriptors: encode a request, decode it
    back — ids hexed per the OTLP/JSON special-case, attributes and
    fixed64 timestamps intact."""
    from connect_spark.functions.otlp_proto import (
        decode_traces_request,
        encode_traces_request,
    )

    doc = {
        "resourceSpans": [{
            "resource": {"attributes": [
                {"key": "service.name",
                 "value": {"stringValue": "checkout"}},
            ]},
            "scopeSpans": [{
                "scope": {"name": "lib", "version": "1.2"},
                "spans": [{
                    "traceId": "0af7651916cd43dd8448eb211c80319c",
                    "spanId": "b7ad6b7169203331",
                    "name": "GET /cart",
                    "kind": 2,
                    "startTimeUnixNano": 1_700_000_000_000_000_000,
                    "endTimeUnixNano": 1_700_000_000_100_000_000,
                    "attributes": [
                        {"key": "http.status",
                         "value": {"intValue": 200}},
                        {"key": "latency",
                         "value": {"doubleValue": 0.125}},
                    ],
                }],
            }],
        }],
    }
    raw = encode_traces_request(doc)
    back = decode_traces_request(raw)
    span = back["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
    assert span["traceId"] == "0af7651916cd43dd8448eb211c80319c"
    assert span["spanId"] == "b7ad6b7169203331"
    assert span["name"] == "GET /cart"
    assert span["kind"] == 2
    assert span["startTimeUnixNano"] == 1_700_000_000_000_000_000
    attrs = {a["key"]: a["value"] for a in span["attributes"]}
    assert attrs["http.status"]["intValue"] == 200
    assert attrs["latency"]["doubleValue"] == 0.125
    res_attrs = back["resourceSpans"][0]["resource"]["attributes"]
    assert res_attrs[0]["key"] == "service.name"
    assert res_attrs[0]["value"]["stringValue"] == "checkout"


def test_otlp_http_input_accepts_binary_protobuf(spark, tmp_path):
    """otlp_http accepts BINARY OTLP protobuf request bodies
    (Content-Type: application/x-protobuf) alongside OTLP/JSON —
    the otlp_grpc payload surface without a gRPC runtime (round-4
    verdict task #9)."""
    import urllib.request

    from connect_spark.functions.otlp_proto import encode_traces_request
    from connect_spark.sources.http_server import (
        http_server_port,
        stop_http_server,
    )

    spool = str(tmp_path / "otlp_pb_spool")
    conf = {"label": "otlp_pb_test", "spool_dir": spool}
    try:
        Pipeline(spark, {"input": {"otlp_http": conf}}).dataframe()
        port = http_server_port("otlp_pb_test")
        # one JSON body and one protobuf body
        envelope = json.dumps({"resourceSpans": [{"scopeSpans": [{
            "spans": [{"name": "json-span"}]}]}]})
        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/post", data=envelope.encode(),
            method="POST"))
        pb = encode_traces_request({"resourceSpans": [{"scopeSpans": [{
            "spans": [{
                "traceId": "00" * 15 + "01",
                "spanId": "00" * 7 + "02",
                "name": "pb-span",
                "kind": 1,
            }]}]}]})
        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/post", data=pb,
            headers={"Content-Type": "application/x-protobuf"},
            method="POST"))
        df = Pipeline(spark, {"input": {"otlp_http": conf}}).dataframe()
        spans = [json.loads(r.content) for r in df.collect()]
        names = sorted(s["name"] for s in spans)
        assert names == ["json-span", "pb-span"]
        pb_span = next(s for s in spans if s["name"] == "pb-span")
        assert pb_span["traceId"] == "00" * 15 + "01"
        assert pb_span["spanId"] == "00" * 7 + "02"
        assert pb_span["kind"] == 1
    finally:
        stop_http_server("otlp_pb_test")
