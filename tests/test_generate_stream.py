"""Custom Python DataSource (generate_stream): offset progression,
bounded generation, downstream Bloblang shaping."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from connect_spark.bloblang import compile_mapping
from connect_spark.sources.generate_stream import GenerateDataSource


def test_generate_stream_bounded(spark):
    spark.dataSource.register(GenerateDataSource)
    stream = (
        spark.readStream.format("generate_stream")
        .option("rows_per_batch", 40)
        .option("max_rows", 100)
        .load()
    )
    shaped = compile_mapping(
        stream,
        """
        root.n = this.n
        root.square = this.n * this.n
        root.label = "gen-" + this.n.string()
        """,
    )
    name = "g" + uuid.uuid4().hex[:10]
    q = (
        shaped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert len(rows) == 100
    assert {r["n"] for r in rows} == set(range(100))
    assert all(r["square"] == r["n"] ** 2 for r in rows)
    assert all(r["label"] == f"gen-{r['n']}" for r in rows)
