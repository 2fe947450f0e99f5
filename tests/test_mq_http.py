"""MQ + HTTP adapters: config mappings, subject matching, replayable
bus end-to-end (publish → checkpointed subscribe → envelope), HTTP
poll retry/error semantics, HTTP batch output."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_spark.sources.http_client import (
    http_client_options,
    http_output_batches,
    http_poll,
)
from connect_spark.sources.mq import (
    MessageBus,
    amqp09_reader_options,
    mqtt_reader_options,
    nats_envelope,
    nats_reader_options,
    subject_matches,
)


def test_reader_option_mappings():
    nats = nats_reader_options(
        {"urls": ["nats://a:4222", "nats://b:4222"], "subject": "orders.>",
         "queue": "workers", "durable": "d1", "max_ack_pending": 512}
    )
    assert nats == {
        "servers": "nats://a:4222,nats://b:4222",
        "subject": "orders.>",
        "deliver": "all",
        "queue_group": "workers",
        "durable_name": "d1",
        "max_in_flight": "512",
    }
    amqp = amqp09_reader_options(
        {"urls": ["amqp://x"], "queue": "q1", "prefetch_count": 64}
    )
    assert amqp["max_records_per_batch"] == "64"
    mqtt = mqtt_reader_options({"urls": ["tcp://m:1883"], "topics": ["t/#"]})
    assert mqtt["qos"] == "1" and mqtt["clean_session"] == "true"


def test_subject_matching_semantics(spark):
    df = spark.createDataFrame(
        [Row(s=s) for s in [
            "orders.us.new", "orders.eu.new", "orders.us",
            "orders.us.new.rush", "billing.us.new",
        ]]
    )

    def got(pattern):
        return sorted(
            r.s for r in df.filter(subject_matches(F.col("s"), pattern)).collect()
        )

    assert got("orders.us.new") == ["orders.us.new"]
    assert got("orders.*.new") == ["orders.eu.new", "orders.us.new"]
    assert got("orders.>") == [
        "orders.eu.new", "orders.us", "orders.us.new", "orders.us.new.rush"
    ]
    assert got("orders.*") == ["orders.us"]
    assert got("*.us.new") == ["billing.us.new", "orders.us.new"]


def test_message_bus_publish_subscribe_checkpointed(spark, tmp_path):
    bus = MessageBus(str(tmp_path / "bus"))
    bus.publish("orders.us", [{"id": 1}, {"id": 2}])
    bus.publish("orders.eu", [{"id": 3}])
    bus.publish("billing.us", [{"id": 4}])

    stream = bus.subscribe(spark, subject_pattern="orders.>")
    env = nats_envelope(stream)
    import uuid

    name = "mq" + uuid.uuid4().hex[:10]
    q = (
        env.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert len(rows) == 3
    subjects = sorted(r["_meta"]["nats_subject"] for r in rows)
    assert subjects == ["orders.eu", "orders.us", "orders.us"]
    ids = sorted(
        json.loads(bytes(r.content).decode())["id"] for r in rows
    )
    assert ids == [1, 2, 3]


def test_http_poll_retry_and_error(spark):
    calls = []

    def flaky(req):
        calls.append(req["attempt"])
        if len(calls) < 3:
            return {"status": 503, "headers": {}, "body": "unavailable"}
        return {"status": 200, "headers": {}, "body": '{"ok": true}'}

    df = http_poll(
        spark, {"url": "http://svc/data", "retries": 3}, flaky, n_polls=1
    )
    row = df.collect()[0]
    assert row.http_status == 200 and row._error is None
    assert len(calls) == 3  # two 503s then success

    def always_403(req):
        return {"status": 403, "headers": {}, "body": "denied"}

    df2 = http_poll(
        spark,
        {"url": "http://svc/data", "retries": 2, "drop_on": [403]},
        always_403,
        sleep_fn=lambda s: None,
    )
    # drop_on statuses DROP the message (http_client.adoc drop_on) —
    # no errored row flows to the DLQ
    assert df2.count() == 0

    def always_500(req):
        return {"status": 500, "headers": {}, "body": "boom"}

    df3 = http_poll(
        spark,
        {"url": "http://svc/data", "retries": 1},
        always_500,
        sleep_fn=lambda s: None,
    )
    row3 = df3.collect()[0]
    assert row3._error == "http_client: status 500"


def test_http_output_batches(spark):
    sent = []

    def sink(req):
        sent.append(req["body"])
        return {"status": 200, "headers": {}, "body": ""}

    df = spark.createDataFrame(
        [Row(a=i) for i in range(10)]
    ).repartition(3)
    n = http_output_batches(df, {"url": "http://svc/in"}, sink)
    assert n == len(sent) == 3
    all_rows = [json.loads(line) for body in sent for line in body.split("\n")]
    assert sorted(r["a"] for r in all_rows) == list(range(10))
