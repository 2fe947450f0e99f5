"""Cache-resource kinds, buffer section, metrics/tracer exporters
(plans/state_ext.py)."""

from __future__ import annotations

import json

import pytest

from connect_spark.plans.pipeline import Pipeline, PipelineConfigError
from connect_spark.plans.state_ext import (
    _SERVICE_CACHE_KINDS,
    DuckKVCache,
    MemoryKVCache,
    NoopCache,
    apply_buffer,
    build_cache,
    emit_trace_span,
    export_metrics,
)


def test_memory_cache_ops(spark):
    c = MemoryKVCache(spark, cap=10)
    rows = spark.createDataFrame([("a", 1), ("b", 2)],
                                 "key string, n int")
    c.set(rows)
    c.add(spark.createDataFrame([("a", 99), ("c", 3)],
                                "key string, n int"))
    df = spark.createDataFrame([("a",), ("c",), ("zz",)], "key string")
    got = {r.key: r.n for r in c.get(df).collect()}
    assert got == {"a": 1, "c": 3, "zz": None}  # add never overwrites
    c.delete(spark.createDataFrame([("a",)], "key string"))
    assert "a" not in {r.key for r in c.read().collect()}


def test_memory_cache_cap_enforced(spark):
    c = MemoryKVCache(spark, cap=1)
    with pytest.raises(PipelineConfigError, match="cap"):
        c.set(spark.createDataFrame([("a", 1), ("b", 2)],
                                    "key string, n int"))


def test_noop_cache(spark):
    c = NoopCache()
    df = spark.createDataFrame([("a",)], "key string")
    c.set(df)
    assert c.read() is None
    assert c.get(df) is df


def test_duckdb_sql_cache(spark, tmp_path):
    db = str(tmp_path / "cache.duckdb")
    c = DuckKVCache(spark, db)
    c.set(spark.createDataFrame([("a", "v1")], "key string, v string"))
    c.add(spark.createDataFrame([("a", "IGNORED"), ("b", "v2")],
                                "key string, v string"))
    got = {r.key: r.v for r in c.read().collect()}
    assert got == {"a": "v1", "b": "v2"}
    # survives a new instance (real storage file)
    c2 = DuckKVCache(spark, db)
    df = spark.createDataFrame([("b",)], "key string")
    assert c2.get(df).collect()[0].v == "v2"
    c2.delete(df)
    assert {r.key for r in c2.read().collect()} == {"a"}


@pytest.mark.parametrize("kind", sorted(_SERVICE_CACHE_KINDS))
def test_service_cache_kinds_build(spark, tmp_path, kind):
    identity = {
        "bucket": "b", "table": "t", "url": "x://h",
        "addresses": ["h"], "database": "db", "collection": "c",
        "topic": "t",
    }
    conf = {k: identity[k] for k in _SERVICE_CACHE_KINDS[kind]}
    conf["store_path"] = str(tmp_path / kind)
    cache = build_cache(spark, {kind: conf})
    cache.set(spark.createDataFrame([("k", "v")],
                                    "key string, val string"))
    assert cache.read().collect()[0].val == "v"


def test_lru_ttlru_bounds(spark, tmp_path):
    lru = build_cache(spark, {"lru": {
        "path": str(tmp_path / "lru"), "cap": 2}})
    assert lru.max_items == 2
    ttlru = build_cache(spark, {"ttlru": {
        "path": str(tmp_path / "ttlru"), "cap": 3, "default_ttl": 60}})
    assert ttlru.max_items == 3 and ttlru.ttl == 60


def test_cache_resource_in_pipeline(spark, tmp_path):
    out = str(tmp_path / "enriched")
    seed_cfg = {
        "cache_resources": [
            {"label": "names", "sql": {
                "database": str(tmp_path / "c.duckdb")}},
        ],
        "input": {"generate": {"count": 2,
                               "mapping": "root.key = \"k\" + counter().string()\nroot.name = \"user\" + counter().string()"}},
        "pipeline": {"processors": [
            {"cache": {"resource": "names", "operator": "set",
                       "on": "key", "value_columns": ["name"]}},
        ]},
    }
    Pipeline(spark, seed_cfg).run()
    read_cfg = {
        "cache_resources": seed_cfg["cache_resources"],
        "input": {"generate": {"count": 2,
                               "mapping": "root.key = \"k\" + counter().string()"}},
        "pipeline": {"processors": [
            {"cache": {"resource": "names", "operator": "get",
                       "on": "key"}},
        ]},
        "output": {"parquet": {"path": out}},
    }
    Pipeline(spark, read_cfg).run()
    got = sorted((r.key, r.name)
                 for r in spark.read.parquet(out).collect())
    assert got == [("k0", "user0"), ("k1", "user1")]


def test_buffer_kinds(spark, tmp_path):
    df = spark.createDataFrame([(1,), (2,)], "n int")
    assert apply_buffer(df, None) is df
    assert apply_buffer(df, "none") is df
    mem = apply_buffer(df, {"memory": {}})
    assert mem.count() == 2
    mem.unpersist()
    spooled = apply_buffer(df, {"sqlite": {
        "path": str(tmp_path / "spool")}})
    assert sorted(r.n for r in spooled.select("n").collect()) == [1, 2]


def test_system_window_buffer(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:10:00",), ("2024-01-01 01:20:00",)],
        "ts string",
    ).selectExpr("cast(ts as timestamp) ts")
    out = apply_buffer(df, {"system_window": {
        "timestamp_field": "ts", "size": "1 hour"}})
    assert "window_end_timestamp" in out.columns
    ends = sorted(str(r.window_end_timestamp) for r in out.collect())
    assert ends == ["2024-01-01 01:00:00", "2024-01-01 02:00:00"]


def test_metrics_exporters(spark):
    from connect_spark.observability import clear_metrics, metric_observe

    clear_metrics()
    df = spark.createDataFrame([(1,), (2,)], "n int")
    observed = metric_observe(df, "rows_seen", "counter")
    observed.count()  # run the observing action
    prom = export_metrics("prometheus")
    assert prom is not None and "rows_seen" in prom
    stats = json.loads(export_metrics({"json_api": {}}))
    assert isinstance(stats, dict)
    # statsd sends real UDP datagrams
    import socket
    import threading

    got: list[bytes] = []
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", 0))
    sock.settimeout(2)
    port = sock.getsockname()[1]

    def recv():
        try:
            while True:
                got.append(sock.recvfrom(65536)[0])
        except OSError:
            pass

    t = threading.Thread(target=recv, daemon=True)
    t.start()
    lines = export_metrics({"statsd": {
        "address": f"127.0.0.1:{port}", "prefix": "cs"}})
    import time

    for _ in range(40):
        if len(got) >= len(lines.split("\n")) and lines:
            break
        time.sleep(0.05)
    sock.close()
    if lines:
        assert any(b"|g" in g for g in got)
    influx = export_metrics({"influxdb": {"prefix": "cs"}})
    assert influx is not None
    cw = json.loads(export_metrics({"aws_cloudwatch": {}}))
    assert cw["Namespace"] == "connect_spark"
    otlp = json.loads(export_metrics({"open_telemetry_collector": {}}))
    assert "resourceMetrics" in otlp
    assert export_metrics("none") is None
    with pytest.raises(PipelineConfigError):
        export_metrics({"bogus": {}})


def test_tracer_span_exports(spark, tmp_path):
    from connect_spark.plans.processors_ext import register_http_transport

    posted = []
    register_http_transport(
        "cap_trace", lambda url, verb, headers, body:
        posted.append((url, json.loads(body))) or "")
    span = emit_trace_span(
        {"open_telemetry_collector": {
            "url": "http://col", "transport": "cap_trace"}},
        "p1", 100.0, 101.5)
    assert span["name"] == "p1"
    assert posted[0][0].endswith("/v1/traces")
    assert len(span["traceId"]) == 32 and len(span["spanId"]) == 16
    # deterministic ids
    span2 = emit_trace_span({"jaeger": {}}, "p1", 100.0, 101.5)
    assert span2["traceId"] == span["traceId"]
    # redpanda tracer publishes to the bus
    from connect_spark.sources.mq import MessageBus

    bus_path = str(tmp_path / "tracebus")
    emit_trace_span({"redpanda": {"bus_path": bus_path}},
                    "p2", 1.0, 2.0)
    got = MessageBus(bus_path).subscribe(
        spark, "_connect_traces", streaming=False).collect()
    assert json.loads(got[0].after)["name"] == "p2"
    assert emit_trace_span("none", "x", 0, 1) is None


def test_pipeline_metrics_tracer_sections(spark, tmp_path):
    bus_path = str(tmp_path / "tb")
    cfg = {
        "input": {"generate": {"count": 1, "mapping": "root.n = 1"}},
        "metrics": "prometheus",
        "tracer": {"redpanda": {"bus_path": bus_path}},
        "label": "traced_run",
        "output": {"memory": {}},
    }
    out = Pipeline(spark, cfg).run()
    assert out.count() == 1
    from connect_spark.sources.mq import MessageBus

    spans = MessageBus(bus_path).subscribe(
        spark, "_connect_traces", streaming=False).collect()
    assert json.loads(spans[0].after)["name"] == "traced_run"


def test_buffer_rejects_streaming_materialization(spark, tmp_path):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with pytest.raises(PipelineConfigError, match="streaming"):
        apply_buffer(stream, {"memory": {}})
    with pytest.raises(PipelineConfigError, match="streaming"):
        apply_buffer(stream, {"sqlite": {"path": str(tmp_path / "s")}})
    # window stamping stays legal on streams
    stamped = apply_buffer(stream.withColumnRenamed(
        "timestamp", "ts"), {"system_window": {"size": "1 minute"}})
    assert stamped.isStreaming


def test_statsd_address_forms():
    # bare host defaults to :8125 (no crash); bare colon errors
    out = export_metrics({"statsd": {"address": "127.0.0.1"}})
    assert out is not None
    with pytest.raises(PipelineConfigError, match="host"):
        export_metrics({"statsd": {"address": ":8125"}})


def test_output_batching_policy(spark, tmp_path):
    out = str(tmp_path / "batched_out")
    cfg = {
        "input": {"generate": {"count": 7,
                               "mapping": "root.n = counter()"}},
        "output": {"parquet": {
            "path": out,
            "batching": {"count": 3, "order_by": ["n"],
                         "keep_batch_id": True},
        }},
    }
    Pipeline(spark, cfg).run()
    got = spark.read.parquet(out)
    batches = {}
    for r in got.collect():
        batches.setdefault(r.batch_id, []).append(r.n)
    sizes = sorted(len(v) for v in batches.values())
    assert sizes == [1, 3, 3]


def test_output_batching_post_processors(spark, tmp_path):
    out = str(tmp_path / "archived_out")
    cfg = {
        "input": {"generate": {"count": 4,
                               "mapping": 'root.content = "m" + counter().string()'}},
        "output": {"parquet": {
            "path": out,
            "batching": {
                "count": 2, "order_by": ["content"],
                "processors": [
                    {"mapping":
                     'root.tagged = this.content.uppercase()'},
                ],
            },
        }},
    }
    Pipeline(spark, cfg).run()
    got = sorted(r.tagged for r in spark.read.parquet(out).collect())
    assert got == ["M0", "M1", "M2", "M3"]


def test_input_and_output_attached_processors(spark, tmp_path):
    out = str(tmp_path / "attached")
    cfg = {
        "input": {"generate": {
            "count": 3, "mapping": "root.n = counter()",
            "processors": [
                {"mapping": "root.n = this.n\nroot.doubled = this.n * 2"},
            ]}},
        "pipeline": {"threads": 2},
        "output": {"parquet": {
            "path": out,
            "processors": [
                {"filter": "this.doubled >= 2"},
            ]}},
    }
    Pipeline(spark, cfg).run()
    got = sorted(r.doubled for r in spark.read.parquet(out).collect())
    assert got == [2, 4]  # n=0 filtered at the output


def test_output_batching_without_order_by(spark, tmp_path):
    out = str(tmp_path / "no_order")
    cfg = {
        "input": {"generate": {"count": 5,
                               "mapping": "root.n = counter()"}},
        "output": {"parquet": {
            "path": out,
            "batching": {"count": 2, "keep_batch_id": True}}},
    }
    Pipeline(spark, cfg).run()
    got = spark.read.parquet(out)
    batches = {}
    for r in got.collect():
        batches.setdefault(r.batch_id, []).append(r.n)
    assert sorted(len(v) for v in batches.values()) == [1, 2, 2]


def test_output_batching_config_errors(spark, tmp_path):
    base = {
        "input": {"generate": {"count": 2, "mapping": "root.n = 1"}},
    }
    with pytest.raises(PipelineConfigError, match="ts"):
        Pipeline(spark, {**base, "output": {"parquet": {
            "path": str(tmp_path / "x"),
            "batching": {"period": "10s"}}}}).run()
    # an empty batching block is "no batching" (the reference default
    # count: 0), not an error
    Pipeline(spark, {**base, "output": {"parquet": {
        "path": str(tmp_path / "y"),
        "batching": {}}}}).run()
    assert spark.read.parquet(str(tmp_path / "y")).count() == 2
    # a batching block with only non-trigger fields errors clearly
    with pytest.raises(PipelineConfigError, match="no trigger"):
        Pipeline(spark, {**base, "output": {"parquet": {
            "path": str(tmp_path / "z"),
            "batching": {"order_by": ["n"]}}}}).run()


def test_template_emitted_input_processors(spark):
    from connect_spark.plans.templates import register_template

    register_template({
        "name": "seeded_numbers",
        "type": "input",
        "fields": [{"name": "count", "default": 3}],
        "mapping": """
root.generate.count = this.count
root.generate.mapping = "root.n = counter()"
root.generate.processors = [ {"mapping": "root.n = this.n + 100"} ]
""",
    })
    df = Pipeline(spark, {
        "input": {"seeded_numbers": {"count": 2}},
    }).dataframe()
    assert sorted(r.n for r in df.collect()) == [100, 101]


def test_output_batching_archive_folds_per_batch(spark, tmp_path):
    out = str(tmp_path / "arch_batches")
    cfg = {
        "input": {"generate": {"count": 6,
                               "mapping": 'root.content = "m" + counter().string()'}},
        "output": {"parquet": {
            "path": out,
            "batching": {
                "count": 3, "order_by": ["content"],
                "processors": [
                    {"archive": {"format": "json_array",
                                 "value": "this.content"}},
                ],
            },
        }},
    }
    Pipeline(spark, cfg).run()
    import json

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2  # one archived doc PER batch
    sizes = sorted(len(json.loads(r.archived)) for r in rows)
    assert sizes == [3, 3]
