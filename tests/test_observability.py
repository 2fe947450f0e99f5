from __future__ import annotations

import uuid

from connect_spark.catalog import load_table
from connect_spark.observability import Benchmark, StreamingMetrics

SF = "/root/testdata/sf0.001"


def test_batch_benchmark(spark):
    df = load_table(spark, SF, "events")
    with Benchmark() as b:
        b.rows = df.count()
    assert b.result.rows == 1000
    assert b.result.rows_per_sec > 0


def test_streaming_metrics_listener(spark, tmp_path):
    batch = load_table(spark, SF, "events").select("event_id", "ts")
    src = str(tmp_path / "src")
    batch.coalesce(2).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    metrics = StreamingMetrics().attach(spark)
    name = "m" + uuid.uuid4().hex[:10]
    q = (
        stream.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # listener events are async; wait briefly for delivery
    import time

    for _ in range(40):
        if metrics.total_rows >= 1000:
            break
        time.sleep(0.25)
    metrics.detach(spark)
    assert metrics.total_rows == 1000
    assert all(b["numInputRows"] > 0 for b in metrics.batches if b["numInputRows"])


# --- metric processor via Observation (metric.adoc) -----------------

def test_metric_counter_and_counter_by(spark, sf_dir):
    from connect_spark.observability import clear_metrics, get_metric
    from connect_spark.plans.pipeline import build_pipeline

    clear_metrics()
    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "nation"}},
        "pipeline": {"processors": [
            {"metric": {"type": "counter", "name": "nations_seen"}},
            {"metric": {"type": "counter_by", "name": "region_sum",
                        "value": "this.n_regionkey"}},
        ]},
    }
    df = build_pipeline(spark, config).dataframe()
    df.write.format("noop").mode("overwrite").save()
    assert get_metric("nations_seen") == 25
    assert get_metric("region_sum") == 50  # 5 regions x 5 nations x avg 2


def test_metric_gauge_and_timing(spark, sf_dir):
    from connect_spark.observability import clear_metrics, get_metric
    from connect_spark.plans.pipeline import build_pipeline

    clear_metrics()
    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
        "pipeline": {"processors": [
            {"metric": {"type": "gauge", "name": "max_key",
                        "value": "this.r_regionkey"}},
            {"metric": {"type": "timing", "name": "avg_key",
                        "value": "this.r_regionkey"}},
        ]},
    }
    build_pipeline(spark, config).dataframe().write.format("noop").mode(
        "overwrite"
    ).save()
    assert get_metric("max_key") == 4
    assert get_metric("avg_key") == 2.0


def test_metric_bad_type(spark, sf_dir):
    import pytest

    from connect_spark.plans.pipeline import build_pipeline

    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
        "pipeline": {"processors": [
            {"metric": {"type": "histogram", "name": "x"}},
        ]},
    }
    with pytest.raises(ValueError, match="metric type"):
        build_pipeline(spark, config).dataframe()
