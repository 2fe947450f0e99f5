"""Metrics exporters (observability.py: prometheus / json_api / logger
adapters + the /metrics //stats endpoint) and the tracing functions
(functions.adoc:659,681)."""

from __future__ import annotations

import json
import re
import urllib.request

from pyspark.sql import functions as F

from connect_spark.observability import (
    clear_metrics,
    json_api_stats,
    logger_lines,
    metric_observe,
    prometheus_exposition,
    serve_metrics,
)


def test_prometheus_json_logger_exports(spark):
    clear_metrics()
    df = spark.range(10).withColumn("v", F.col("id") * 2.0)
    observed = metric_observe(df, "rows_seen", "counter")
    observed = metric_observe(observed, "v_total", "counter_by", F.col("v"))
    observed.count()  # the action that resolves the observations

    text = prometheus_exposition()
    assert "# TYPE connect_spark_rows_seen gauge" in text
    assert re.search(r"connect_spark_rows_seen 10\.0", text)
    assert re.search(r"connect_spark_v_total 90\.0", text)

    stats = json_api_stats()
    assert stats["metrics"]["rows_seen"] == 10.0
    assert stats["metrics"]["v_total"] == 90.0

    lines = logger_lines()
    assert any("rows_seen=10.0" in ln for ln in lines)


def test_metrics_http_endpoints(spark):
    clear_metrics()
    df = spark.range(3)
    metric_observe(df, "endpoint_rows", "counter").count()
    server, port = serve_metrics()
    try:
        text = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=5
        ).read().decode()
        assert "connect_spark_endpoint_rows 3.0" in text
        stats = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=5
            ).read()
        )
        assert stats["metrics"]["endpoint_rows"] == 3.0
    finally:
        server.shutdown()


def test_tracing_functions(spark):
    from connect_spark.bloblang.compiler import compile_mapping

    df = spark.createDataFrame([("a",), ("b",)], ["x"])
    src = """
root.x = this.x
root.trace_id = tracing_id()
root.traceparent = tracing_span().traceparent
"""
    rows = compile_mapping(df, src).collect()
    for r in rows:
        assert re.fullmatch(r"[0-9a-f]{32}", r["trace_id"])
        assert re.fullmatch(
            r"00-[0-9a-f]{32}-[0-9a-f]{16}-01", r["traceparent"]
        )
        assert r["traceparent"][3:35] == r["trace_id"]
    # distinct messages get distinct trace ids
    assert rows[0]["trace_id"] != rows[1]["trace_id"]
