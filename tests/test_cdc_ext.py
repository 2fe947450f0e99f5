"""CDC-suite input kinds + resource/inproc/sftp kinds (plans/cdc_ext.py)."""

from __future__ import annotations

import json

import pytest

from connect_spark.plans.cdc_ext import _CDC_SPECS
from connect_spark.plans.pipeline import Pipeline, PipelineConfigError
from connect_spark.sources.cdc_stream import CdcWal


@pytest.fixture()
def wal(tmp_path):
    w = CdcWal(str(tmp_path / "wal"))
    w.append(
        [
            {"op": "insert", "after": {"id": 1, "v": "a"}},
            {"op": "insert", "after": {"id": 2, "v": "b"}},
        ],
        table="orders",
    )
    w.append(
        [{"op": "insert", "after": {"id": 9, "v": "z"}}],
        table="audit",
    )
    return w


_IDENTITY_CONF = {
    "postgres_cdc": {"dsn": "postgres://u@h/db", "slot_name": "s"},
    "pg_stream": {"dsn": "postgres://u@h/db"},
    "mysql_cdc": {"dsn": "mysql://u@h/db", "flavor": "mysql"},
    "microsoft_sql_server_cdc": {"dsn": "sqlserver://u@h/db"},
    "oracledb_cdc": {"dsn": "oracle://u@h/db"},
    "mongodb_cdc": {"url": "mongodb://h", "database": "db"},
    "aws_dynamodb_cdc": {},
    "gcp_spanner_cdc": {
        "project_id": "p", "instance_id": "i",
        "database_id": "d", "stream_id": "s"},
    "cockroachdb_changefeed": {"dsn": "postgres://u@h/db"},
    "tigerbeetle_cdc": {"cluster_id": "0"},
    "salesforce_cdc": {"instance_url": "https://x"},
}


@pytest.mark.parametrize("kind", sorted(_CDC_SPECS))
def test_cdc_kind_streams_wal(spark, wal, kind):
    spec = _CDC_SPECS[kind]
    conf = dict(_IDENTITY_CONF[kind])
    conf["wal_path"] = wal.path
    conf[spec.tables_key] = ["public.orders"]
    out = Pipeline(spark, {"input": {kind: conf}}).run()
    rows = sorted(out.collect(), key=lambda r: r.lsn)
    assert [json.loads(r.after)["id"] for r in rows] == [1, 2]
    assert all(r.table == "orders" for r in rows)
    assert {r.operation for r in rows} == {"insert"}


def test_cdc_kind_requires_identity(spark, wal):
    with pytest.raises(PipelineConfigError, match="dsn"):
        Pipeline(
            spark,
            {"input": {"postgres_cdc": {"wal_path": wal.path}}},
        ).dataframe()


def test_cdc_kind_requires_wal_bridge(spark):
    with pytest.raises(PipelineConfigError, match="wal_path"):
        Pipeline(
            spark,
            {"input": {"postgres_cdc": {"dsn": "postgres://u@h/db"}}},
        ).dataframe()


def test_postgres_cdc_filters_transaction_markers(spark, tmp_path):
    w = CdcWal(str(tmp_path / "wal2"))
    w.append(
        [
            {"op": "begin", "after": None},
            {"op": "insert", "after": {"id": 1}},
            {"op": "commit", "after": None},
        ],
        table="orders",
    )
    base = {"dsn": "postgres://u@h/db", "wal_path": w.path}
    out = Pipeline(spark, {"input": {"postgres_cdc": base}}).run()
    assert [r.operation for r in out.collect()] == ["insert"]
    out2 = Pipeline(
        spark,
        {"input": {"postgres_cdc": {
            **base, "include_transaction_markers": True}}},
    ).run()
    assert sorted(r.operation for r in out2.collect()) == [
        "begin", "commit", "insert"]


def test_postgres_cdc_snapshot_phase(spark, wal, tmp_path):
    snap = str(tmp_path / "snap.parquet")
    spark.createDataFrame(
        [(0, "seed")], "id int, v string"
    ).toPandas().to_parquet(snap)
    out = Pipeline(
        spark,
        {"input": {"postgres_cdc": {
            "dsn": "postgres://u@h/db", "wal_path": wal.path,
            "stream_snapshot": True, "snapshot_path": snap}}},
    ).run()
    ops = [r.operation for r in out.collect()]
    assert ops.count("read") == 1  # Debezium snapshot op
    assert ops.count("insert") == 3


def test_resource_input_and_output(spark, tmp_path):
    out_dir = str(tmp_path / "routed")
    cfg = {
        "input_resources": [
            {"label": "src", "generate": {"count": 3, "mapping":
                "root.n = counter()"}},
        ],
        "output_resources": [
            {"label": "dst", "parquet": {"path": out_dir}},
        ],
        "input": {"resource": "src"},
        "output": {"resource": "dst"},
    }
    Pipeline(spark, cfg).run()
    assert sorted(
        r.n for r in spark.read.parquet(out_dir).collect()) == [0, 1, 2]


def test_resource_unknown_errors(spark):
    with pytest.raises(PipelineConfigError, match="unknown input resource"):
        Pipeline(spark, {"input": {"resource": "nope"}}).dataframe()


def test_inproc_output_feeds_next_pipeline(spark):
    src = Pipeline(
        spark,
        {
            "input": {"generate": {"count": 2, "mapping":
                "root.n = counter()"}},
            "output": {"inproc": "handoff"},
        },
    )
    src.run()
    got = Pipeline(spark, {"input": {"inproc": "handoff"}}).run()
    assert sorted(r.n for r in got.collect()) == [0, 1]


def test_sftp_roundtrip(spark, tmp_path):
    out = str(tmp_path / "sftp_out")
    src = spark.createDataFrame([("l1",), ("l2",)], "content string")
    from connect_spark.plans.pipeline import OUTPUT_KINDS

    OUTPUT_KINDS["sftp"](src, {"path": out})
    df = Pipeline(
        spark, {"input": {"sftp": {"path": out + "/*.txt"}}}
    ).dataframe()
    assert sorted(r.content for r in df.collect()) == ["l1", "l2"]


def test_adls_output_local_path(spark, tmp_path):
    out = str(tmp_path / "adls")
    src = spark.createDataFrame([(1,)], "id int")
    from connect_spark.plans.pipeline import OUTPUT_KINDS

    OUTPUT_KINDS["azure_data_lake_gen2"](src, {"path": out})
    assert spark.read.parquet(out).count() == 1


def test_migrator_alias_registered():
    from connect_spark.plans.pipeline import INPUT_KINDS, OUTPUT_KINDS

    assert "redpanda_migrator" in INPUT_KINDS
    assert "redpanda_migrator" in OUTPUT_KINDS
    assert "ockam_kafka" in INPUT_KINDS
    assert "kafka_franz" in OUTPUT_KINDS
