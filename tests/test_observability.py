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
