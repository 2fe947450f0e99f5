"""Streams mode (connect_spark/streams_mode.py): continuous
foreachBatch delivery per stream, lifecycle + REST protocol."""

from __future__ import annotations

import json

import pytest

from connect_spark.sources.mq import MessageBus
from connect_spark.streams_mode import StreamsServer


def test_streaming_stream_delivers_continuously(spark, tmp_path):
    bus = MessageBus(str(tmp_path / "bus"))
    bus.publish("t", [{"n": 1}, {"n": 2}])
    out = str(tmp_path / "out")
    server = StreamsServer(spark)
    try:
        st = server.create("s1", {
            "input": {"mq_bus": {"path": bus.path, "subject": "t",
                                 "streaming": True}},
            "output": {"parquet": {"path": out, "mode": "append"}},
        }, checkpoint=str(tmp_path / "ckpt"))
        assert st["streaming"] and st["status"] == "running"
        server.process_available("s1")
        got1 = spark.read.parquet(out).count()
        assert got1 == 2
        # new messages arrive → the SAME running stream delivers them
        bus.publish("t", [{"n": 3}])
        server.process_available("s1")
        assert spark.read.parquet(out).count() == 3
    finally:
        server.shutdown()


def test_batch_stream_completes(spark, tmp_path):
    out = str(tmp_path / "b")
    server = StreamsServer(spark)
    st = server.create("batch1", {
        "input": {"generate": {"count": 2, "mapping": "root.n = 1"}},
        "output": {"parquet": {"path": out}},
    })
    assert st["status"] == "completed" and not st["streaming"]
    assert spark.read.parquet(out).count() == 2


def test_rest_protocol(spark, tmp_path):
    import urllib.request

    server = StreamsServer(spark)
    srv, port = server.serve()
    base = f"http://127.0.0.1:{port}"
    try:
        cfg = json.dumps({
            "input": {"generate": {"count": 1, "mapping": "root.n = 1"}},
            "output": {"parquet": {"path": str(tmp_path / "r")}},
        })
        created = json.loads(urllib.request.urlopen(
            urllib.request.Request(f"{base}/streams/one",
                                   data=cfg.encode(), method="POST")
        ).read())
        assert created["id"] == "one"
        listing = json.loads(urllib.request.urlopen(
            f"{base}/streams").read())
        assert [s["id"] for s in listing["streams"]] == ["one"]
        # duplicate id → 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/streams/one", data=cfg.encode(),
                method="POST"))
        assert e.value.code == 400
        # delete then 404
        deleted = json.loads(urllib.request.urlopen(
            urllib.request.Request(f"{base}/streams/one",
                                   method="DELETE")).read())
        assert deleted == {"deleted": "one"}
        with pytest.raises(urllib.error.HTTPError) as e2:
            urllib.request.urlopen(f"{base}/streams/one")
        assert e2.value.code == 404
    finally:
        srv.shutdown()
        server.shutdown()


def test_start_defaults_append_and_rejects_memory(spark, tmp_path):
    from connect_spark.plans.pipeline import Pipeline, PipelineConfigError

    bus = MessageBus(str(tmp_path / "bus2"))
    bus.publish("a", [{"n": 1}])
    out = str(tmp_path / "accum")
    p = Pipeline(spark, {
        "input": {"mq_bus": {"path": bus.path, "subject": "a",
                             "streaming": True}},
        "output": {"parquet": {"path": out}},  # no explicit mode
    })
    q = p.start(checkpoint=str(tmp_path / "ck2"))
    try:
        q.processAllAvailable()
        bus.publish("a", [{"n": 2}])
        q.processAllAvailable()
        # both micro-batches survive (append default in start())
        assert spark.read.parquet(out).count() == 2
    finally:
        q.stop()
    with pytest.raises(PipelineConfigError, match="memory"):
        Pipeline(spark, {
            "input": {"mq_bus": {"path": bus.path, "subject": "a",
                                 "streaming": True}},
            "output": {"memory": {}},
        }).start()


def test_create_duplicate_never_leaks_query(spark, tmp_path):
    server = StreamsServer(spark)
    bus = MessageBus(str(tmp_path / "bus3"))
    bus.publish("x", [{"n": 1}])
    cfg = {
        "input": {"mq_bus": {"path": bus.path, "subject": "x",
                             "streaming": True}},
        "output": {"parquet": {"path": str(tmp_path / "o3")}},
    }
    try:
        server.create("dup", cfg, checkpoint=str(tmp_path / "c3"))
        with pytest.raises(ValueError, match="already exists"):
            server.create("dup", cfg)
        assert len(server.list()) == 1
    finally:
        server.shutdown()
    assert not any(q.isActive for q in spark.streams.active)


def test_start_append_default_recurses_into_broker(spark, tmp_path):
    from connect_spark.plans.pipeline import _streaming_safe_output

    rewritten = _streaming_safe_output({"broker": {
        "pattern": "fan_out",
        "outputs": [
            {"parquet": {"path": "/tmp/a"}},
            {"fallback": [
                {"parquet": {"path": "/tmp/b"}},
                {"drop": {}},
            ]},
        ],
    }})
    outs = rewritten["broker"]["outputs"]
    assert outs[0]["parquet"]["mode"] == "append"
    assert outs[1]["fallback"][0]["parquet"]["mode"] == "append"
    import pytest

    from connect_spark.plans.pipeline import PipelineConfigError

    with pytest.raises(PipelineConfigError, match="memory"):
        _streaming_safe_output({"broker": {
            "outputs": [{"memory": {}}]}})
