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
    df = build_pipeline(spark, config).dataframe()
    assert df.count() == 5  # passthrough keeps all columns flowing
    assert spark.read.parquet(path).count() == 5
    # append mode: run again, table doubles
    build_pipeline(spark, config).dataframe().count()
    assert spark.read.parquet(path).count() == 10
