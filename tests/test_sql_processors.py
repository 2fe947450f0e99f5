"""sql_raw / sql_insert processors (plans/pipeline.py)."""

from __future__ import annotations

from connect_spark.plans.pipeline import build_pipeline


def test_sql_raw_query_over_batch(spark, sf_dir):
    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
        "pipeline": {"processors": [
            {"sql_raw": {
                "query": "SELECT r_name, r_regionkey * 10 AS k "
                         "FROM batch WHERE r_regionkey < 2",
            }},
        ]},
    }
    rows = build_pipeline(spark, config).dataframe().collect()
    assert sorted((r["r_name"], r["k"]) for r in rows) == [
        ("AFRICA", 0), ("AMERICA", 10),
    ]


def test_sql_raw_positional_args_and_view_name(spark, sf_dir):
    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "nation"}},
        "pipeline": {"processors": [
            {"sql_raw": {
                "view": "nations",
                "query": "SELECT count(*) AS n FROM nations "
                         "WHERE n_regionkey = ?",
                "args": [2],
            }},
        ]},
    }
    rows = build_pipeline(spark, config).dataframe().collect()
    assert rows[0]["n"] == 5


def test_sql_raw_exec_only_passthrough(spark, sf_dir, tmp_path):
    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
        "pipeline": {"processors": [
            {"sql_raw": {"query": "SELECT 1", "exec_only": True}},
        ]},
    }
    df = build_pipeline(spark, config).dataframe()
    assert df.count() == 5 and "r_name" in df.columns


def test_sql_insert_appends_and_passes_through(spark, sf_dir, tmp_path):
    path = str(tmp_path / "sink")
    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
        "pipeline": {"processors": [
            {"sql_insert": {"path": path, "columns": ["r_regionkey", "r_name"]}},
        ]},
    }
    # plan build alone must NOT write (re-builds would duplicate rows)
    import os

    pipe = build_pipeline(spark, config)
    df = pipe.dataframe()
    assert df.count() == 5  # passthrough keeps all columns flowing
    assert not os.path.exists(path)
    assert pipe.flush_writes() == 1
    assert spark.read.parquet(path).count() == 5
    # flush is once-per-build: a second flush has nothing pending
    assert pipe.flush_writes() == 0
    assert spark.read.parquet(path).count() == 5
    # append mode: a full run() appends again, table doubles
    build_pipeline(spark, config).run()
    assert spark.read.parquet(path).count() == 10


# --- split (split.adoc count/byte_size) -----------------------------

def test_split_count_partitions(spark, sf_dir):
    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "nation"}},
        "pipeline": {"processors": [{"split": {"count": 10}}]},
    }
    df = build_pipeline(spark, config).dataframe()
    # 25 nations at <=10 per batch -> 3 partitions
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 25


def test_split_byte_size_partitions(spark, sf_dir):
    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
        "pipeline": {"processors": [
            {"split": {"byte_size": 60, "size": "this.r_name.length()"}},
        ]},
    }
    df = build_pipeline(spark, config).dataframe()
    # total name bytes ~= 34 -> 1 partition; shrink budget -> more
    assert df.rdd.getNumPartitions() == 1
    config["pipeline"]["processors"] = [
        {"split": {"byte_size": 10, "size": "this.r_name.length()"}},
    ]
    df2 = build_pipeline(spark, config).dataframe()
    assert df2.rdd.getNumPartitions() == 4  # ceil(34/10)


def test_split_requires_a_trigger(spark, sf_dir):
    import pytest

    from connect_spark.plans.pipeline import PipelineConfigError

    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
        "pipeline": {"processors": [{"split": {}}]},
    }
    with pytest.raises(PipelineConfigError):
        build_pipeline(spark, config).dataframe()


def test_sleep_processor_delays_batches(spark, sf_dir):
    import time

    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "region"}},
        "pipeline": {"processors": [{"sleep": {"duration": "300ms"}}]},
    }
    df = build_pipeline(spark, config).dataframe().coalesce(1)
    t0 = time.monotonic()
    assert df.count() == 5
    assert time.monotonic() - t0 >= 0.25
    # zero / missing duration stays a no-op
    config["pipeline"]["processors"] = [{"sleep": {}}]
    assert build_pipeline(spark, config).dataframe().count() == 5
