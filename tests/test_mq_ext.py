"""MQ connector YAML kinds (plans/mq_ext.py): every broker family's
input kind consumes from the replayable bus with its documented
metadata envelope; output kinds publish per partition."""

from __future__ import annotations

import json

import pytest

from connect_spark.plans import build_pipeline
from connect_spark.plans.mq_ext import _INPUT_SPECS, _OUTPUT_SUBJECT_KEYS
from connect_spark.sources.mq import MessageBus


def _pipeline(spark, config):
    from connect_spark.plans.pipeline import Pipeline

    return Pipeline(spark, config)


@pytest.fixture()
def bus(tmp_path):
    return MessageBus(str(tmp_path / "bus"))


# (kind, config, expected metadata keys present)
_INPUT_CASES = [
    ("amqp_0_9", {"queue": "orders"},
     {"amqp_routing_key", "amqp_delivery_tag", "amqp_timestamp"}),
    ("mqtt", {"topics": ["orders"], "qos": 1},
     {"mqtt_topic", "mqtt_message_id", "mqtt_qos", "mqtt_retained"}),
    ("nats_jetstream", {"subject": "orders"},
     {"nats_subject", "nats_sequence_stream", "nats_timestamp_unix_nano"}),
    ("nats_stream", {"subject": "orders"},
     {"nats_stream_subject", "nats_stream_sequence"}),
    ("nsq", {"topic": "orders"}, {"nsq_id", "nsq_attempts", "nsq_timestamp"}),
    ("pulsar", {"topics": ["orders"]},
     {"pulsar_topic", "pulsar_message_id", "pulsar_publish_time_unix"}),
    ("aws_sqs", {"queue": "orders"},
     {"sqs_message_id", "sqs_receipt_handle",
      "sqs_approximate_receive_count"}),
    ("gcp_pubsub", {"subscription": "orders"},
     {"gcp_pubsub_message_id", "gcp_pubsub_publish_time_unix",
      "gcp_pubsub_ordering_key"}),
    ("azure_queue_storage", {"queue_name": "orders"},
     {"queue_storage_queue_name", "queue_storage_insertion_time"}),
    ("aws_kinesis", {"streams": ["orders"]},
     {"kinesis_shard", "kinesis_partition_key", "kinesis_sequence_number"}),
    ("redis_pubsub", {"channels": ["orders"]}, {"redis_pubsub_channel"}),
    ("redis_scan", {"match": "orders"}, {"redis_key"}),
    ("amqp_1", {"source_address": "orders"}, {"amqp_creation_time"}),
    ("beanstalkd", {"tube": "orders"}, set()),
    ("nanomsg", {"topic": "orders"}, set()),
    ("zmq4", {"topic": "orders"}, set()),
    ("redis_list", {"key": "orders"}, set()),
]


@pytest.mark.parametrize(
    "kind,conf,meta_keys", _INPUT_CASES, ids=[c[0] for c in _INPUT_CASES]
)
def test_mq_input_kind_envelope(spark, bus, kind, conf, meta_keys):
    bus.publish("orders", ["m1", "m2"])
    bus.publish("other", ["x"])  # filtered out by the subject
    config = {"input": {kind: {**conf, "bus_path": bus.path}}}
    df = _pipeline(spark, config).dataframe()
    rows = df.collect()
    assert sorted(r.content for r in rows) == ["m1", "m2"]
    if meta_keys:
        assert meta_keys <= set(rows[0]._meta.keys()), (
            kind, rows[0]._meta)
    else:
        assert "_meta" not in df.columns


def test_mq_input_structured_payload(spark, bus):
    bus.publish("orders", [{"id": 7, "status": "NEW"}])
    df = _pipeline(
        spark,
        {"input": {"nats_jetstream": {
            "subject": "orders", "bus_path": bus.path}}},
    ).dataframe()
    row = df.collect()[0]
    assert json.loads(row.content) == {"id": 7, "status": "NEW"}


def test_redis_streams_body_key_and_meta(spark, bus):
    bus.publish("tickets", [
        {"body": "hello", "user": "ada", "prio": "1"},
        {"body": "there", "user": "lin", "prio": "2"},
    ])
    df = _pipeline(
        spark,
        {"input": {"redis_streams": {
            "streams": ["tickets"], "body_key": "body",
            "bus_path": bus.path}}},
    ).dataframe()
    rows = sorted(df.collect(), key=lambda r: r.content)
    assert [r.content for r in rows] == ["hello", "there"]
    # every non-body field is metadata (the adoc contract)
    assert rows[0]._meta["user"] == "ada"
    assert rows[0]._meta["prio"] == "1"
    assert rows[0]._meta["redis_stream"] == "tickets"
    assert "body" not in rows[0]._meta


@pytest.mark.parametrize("kind", sorted(_OUTPUT_SUBJECT_KEYS))
def test_mq_output_kind_publishes(spark, bus, kind, tmp_path):
    keys = _OUTPUT_SUBJECT_KEYS[kind]
    src = spark.createDataFrame(
        [("a",), ("b",)], "content string")
    from connect_spark.plans.pipeline import OUTPUT_KINDS

    OUTPUT_KINDS[kind](src, {keys[0]: "subj.one", "bus_path": bus.path})
    got = bus.subscribe(spark, "subj.one", streaming=False)
    vals = sorted(json.loads(r.after) for r in got.collect())
    assert vals == ["a", "b"]


def test_mq_output_missing_subject_errors(spark, bus):
    from connect_spark.plans.pipeline import (
        OUTPUT_KINDS,
        PipelineConfigError,
    )

    src = spark.createDataFrame([("a",)], "content string")
    with pytest.raises(PipelineConfigError):
        OUTPUT_KINDS["nats"](src, {"bus_path": bus.path})


def test_mq_output_structured_rows(spark, bus):
    src = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    from connect_spark.plans.pipeline import OUTPUT_KINDS

    OUTPUT_KINDS["gcp_pubsub"](src, {"topic": "t", "bus_path": bus.path})
    got = sorted(
        (json.loads(r.after)
         for r in bus.subscribe(spark, "t", streaming=False).collect()),
        key=lambda o: o["id"],
    )
    assert got == [{"id": 1, "v": "x"}, {"id": 2, "v": "y"}]


def test_socket_input_and_output_roundtrip(spark):
    import socket
    import socketserver
    import threading

    received: list[bytes] = []

    class EchoBack(socketserver.StreamRequestHandler):
        def handle(self):
            for raw in self.rfile:
                received.append(raw.rstrip(b"\n"))

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), EchoBack)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        src = spark.createDataFrame([("s1",), ("s2",)], "content string")
        from connect_spark.plans.pipeline import OUTPUT_KINDS

        OUTPUT_KINDS["socket"](src, {"address": f"127.0.0.1:{port}"})
        import time

        for _ in range(50):
            if len(received) >= 2:
                break
            time.sleep(0.05)
        assert sorted(received) == [b"s1", b"s2"]
    finally:
        srv.shutdown()

    # input side: a server that writes two lines then closes
    class Feeder(socketserver.StreamRequestHandler):
        def handle(self):
            self.wfile.write(b"in1\nin2\n")

    srv2 = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Feeder)
    srv2.daemon_threads = True
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    try:
        df = _pipeline(
            spark,
            {"input": {"socket": {
                "address": f"127.0.0.1:{srv2.server_address[1]}"}}},
        ).dataframe()
        assert sorted(r.content for r in df.collect()) == ["in1", "in2"]
    finally:
        srv2.shutdown()


def test_websocket_roundtrip_via_transport(spark):
    from connect_spark.plans.processors_ext import register_http_transport

    frames: list[str] = []

    def fake_ws(url, verb, headers, body):
        if verb == "POST":
            frames.append(body)
            return ""
        return "\n".join(frames)

    register_http_transport("fake_ws", fake_ws)
    from connect_spark.plans.pipeline import OUTPUT_KINDS

    src = spark.createDataFrame([("f1",), ("f2",)], "content string")
    OUTPUT_KINDS["websocket"](
        src, {"url": "ws://x", "transport": "fake_ws"})
    df = _pipeline(
        spark,
        {"input": {"websocket": {"url": "ws://x", "transport": "fake_ws"}}},
    ).dataframe()
    assert sorted(r.content for r in df.collect()) == ["f1", "f2"]


def test_mq_kind_through_full_pipeline_yaml(spark, bus, tmp_path):
    """End-to-end: publish → mqtt input kind → mapping → parquet out."""
    bus.publish("sensors", ["3", "5"])
    out = str(tmp_path / "out")
    config = {
        "input": {"mqtt": {"topics": ["sensors"], "bus_path": bus.path}},
        "pipeline": {"processors": [
            {"mapping": "root.doubled = this.content.number() * 2"},
        ]},
        "output": {"parquet": {"path": out}},
    }
    _pipeline(spark, config).run()
    got = sorted(r.doubled for r in spark.read.parquet(out).collect())
    assert got == [6, 10]


def test_publish_df_null_content(spark, bus):
    from connect_spark.plans.mq_ext import publish_df

    df = spark.createDataFrame([("a",), (None,)], "content string")
    publish_df(df, bus.path, "nulls")
    got = sorted(
        (r.after if r.after is None else r.after)
        for r in bus.subscribe(spark, "nulls", streaming=False).collect()
        if r.after is not None
    )
    rows = bus.subscribe(spark, "nulls", streaming=False).collect()
    assert len(rows) == 2  # the null row publishes a tombstone
    assert sorted((r.after is None) for r in rows) == [False, True]


def test_socket_address_validation(spark):
    from connect_spark.plans.pipeline import (
        INPUT_KINDS,
        PipelineConfigError,
    )

    with pytest.raises(PipelineConfigError, match="host:port"):
        INPUT_KINDS["socket"](spark, {"address": "no-port-here"})


def test_socket_input_idle_timeout_returns_partial(spark):
    import socketserver
    import threading
    import time

    class SlowFeeder(socketserver.StreamRequestHandler):
        def handle(self):
            self.wfile.write(b"early\n")
            self.wfile.flush()
            time.sleep(3)  # stay open past the client timeout

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), SlowFeeder)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from connect_spark.plans.pipeline import INPUT_KINDS

        df = INPUT_KINDS["socket"](spark, {
            "address": f"127.0.0.1:{srv.server_address[1]}",
            "timeout": 0.5})
        assert [r.content for r in df.collect()] == ["early"]
    finally:
        srv.shutdown()


def test_mq_output_interpolated_subject(spark, bus):
    from connect_spark.plans.pipeline import OUTPUT_KINDS

    src = spark.createDataFrame(
        [("click", "a"), ("view", "b"), ("click", "c")],
        "event_type string, content string")
    OUTPUT_KINDS["nats"](src, {
        "subject": "events.${! this.event_type }",
        "bus_path": bus.path})
    clicks = bus.subscribe(spark, "events.click", streaming=False)
    views = bus.subscribe(spark, "events.view", streaming=False)
    click_rows = sorted(
        json.loads(r.after)["content"] for r in clicks.collect())
    assert click_rows == ["a", "c"]
    assert [json.loads(r.after)["content"]
            for r in views.collect()] == ["b"]


def test_mq_input_streaming_mode(spark, bus):
    bus.publish("live", ["s1", "s2", "s3"])
    config = {
        "input": {"gcp_pubsub": {
            "subscription": "live", "bus_path": bus.path,
            "streaming": True}},
        "output": {"memory": {}},
    }
    from connect_spark.plans.pipeline import Pipeline

    out = Pipeline(spark, config).run()
    assert sorted(r.content for r in out.collect()) == ["s1", "s2", "s3"]


def test_publish_null_subject_errors(spark, bus):
    from connect_spark.plans.pipeline import OUTPUT_KINDS

    src = spark.createDataFrame(
        [(None, "x")], "event_type string, content string")
    with pytest.raises(Exception, match="subject interpolated to null"):
        OUTPUT_KINDS["nats"](src, {
            "subject": "e.${! this.event_type }", "bus_path": bus.path})


def test_mq_bus_output_delegates_shared_publish(spark, tmp_path):
    """mq_bus and the MQ kinds share one publish implementation."""
    from connect_spark.plans.pipeline import _run_output
    from connect_spark.sources.mq import MessageBus

    df = spark.createDataFrame([("s.a", 1), ("s.b", 2)],
                               "subject string, n int")
    _run_output(df, {"mq_bus": {
        "path": str(tmp_path / "b2"), "subject_column": "subject"}})
    bus2 = MessageBus(str(tmp_path / "b2"))
    rows = bus2.subscribe(spark, "s.>", streaming=False).collect()
    got = sorted((r.table, json.loads(r.after)["n"]) for r in rows)
    assert got == [("s.a", 1), ("s.b", 2)]
