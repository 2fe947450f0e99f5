"""mysql_cdc over RECORDED binlog files: the streaming DataSource
consumes .binlog files (real v4 event bytes), carries TABLE_MAP state
across file rotation, resumes from checkpointed binlog coordinates,
and surfaces transaction markers (internal/impl/mysql/
input_mysql_stream.go:202,313)."""

from __future__ import annotations

import json

from connect_spark.plans.pipeline import Pipeline
from connect_spark.sources.binlog import (
    BinlogFixtureWriter,
    T_LONG,
    T_LONGLONG,
    T_NEWDECIMAL,
    T_VARCHAR,
)
from connect_spark.sources.cdc_stream import BinlogWal

COLS = [("id", T_LONGLONG, 0), ("status", T_VARCHAR, 16),
        ("amount", T_NEWDECIMAL, (12 << 8) | 2)]
NAMES = {"shop.accounts": ["id", "status", "amount"]}


def _record_files(wal_dir):
    wal_dir.mkdir(exist_ok=True)
    w1 = BinlogFixtureWriter(ts=1_700_000_000)
    w1.gtid("aa" * 16, 1)
    w1.begin()
    w1.table_map(42, "shop", "accounts", COLS)
    w1.write_rows([{"id": i, "status": "open", "amount": f"{i}.50"}
                   for i in range(1, 5)])
    w1.xid(1)
    (wal_dir / "bin-000001.binlog").write_bytes(w1.getvalue())

    w2 = BinlogFixtureWriter(ts=1_700_000_100)
    w2.gtid("aa" * 16, 2)
    w2.begin()
    w2._tm_cols = COLS
    w2._tm_id = 42
    w2.update_rows([({"id": 2, "status": "open", "amount": "2.50"},
                     {"id": 2, "status": "closed", "amount": "2.50"})])
    w2.delete_rows([{"id": 3, "status": "open", "amount": "3.50"}])
    w2.xid(2)
    (wal_dir / "bin-000002.binlog").write_bytes(w2.getvalue())


def test_binlog_wal_reader(tmp_path):
    wal_dir = tmp_path / "binwal"
    _record_files(wal_dir)
    recs = list(BinlogWal(str(wal_dir), NAMES).records(after_lsn=0))
    ops = [r["operation"] for r in recs]
    assert ops == (["begin"] + ["insert"] * 4 + ["commit"]
                   + ["begin", "update", "delete", "commit"])
    assert recs[1]["after"] == {"id": 1, "status": "open",
                                "amount": "1.50"}
    # resume from the first file's end re-reads only file 2
    cut = max(r["lsn"] for r in recs[:6])
    tail = list(BinlogWal(str(wal_dir), NAMES).records(after_lsn=cut))
    assert [r["operation"] for r in tail] == [
        "begin", "update", "delete", "commit"]


def test_mysql_cdc_input_consumes_binlog(spark, tmp_path):
    wal_dir = tmp_path / "binwal"
    _record_files(wal_dir)
    df = Pipeline(spark, {"input": {"mysql_cdc": {
        "dsn": "mysql://u@h/shop", "wal_path": str(wal_dir),
        "column_names": NAMES,
    }}}).dataframe()
    assert df.isStreaming
    import uuid

    name = "binlog_" + uuid.uuid4().hex[:8]
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    by_op: dict = {}
    for r in rows:
        by_op.setdefault(r.operation, []).append(r)
    assert len(by_op["insert"]) == 4
    assert len(by_op["update"]) == 1
    upd = json.loads(by_op["update"][0].after)
    assert upd == {"id": 2, "status": "closed", "amount": "2.50"}
    assert by_op["update"][0].table == "accounts"
    # event-header timestamps (s → ms)
    assert by_op["insert"][0].commit_ts_ms == 1_700_000_000_000
    assert by_op["update"][0].commit_ts_ms == 1_700_000_100_000


def test_mysql_cdc_filters_transaction_markers(spark, tmp_path):
    """QUERY-BEGIN/XID markers from binlog recordings are filtered by
    default (the reference's mysql_cdc emits data rows only);
    include_transaction_markers: true surfaces them."""
    wal_dir = tmp_path / "binwal"
    _record_files(wal_dir)
    for flag, expect_markers in ((False, False), (True, True)):
        df = Pipeline(spark, {"input": {"mysql_cdc": {
            "dsn": "mysql://u@h/shop", "wal_path": str(wal_dir),
            "column_names": NAMES,
            "include_transaction_markers": flag,
        }}}).dataframe()
        import uuid

        name = "bm_" + uuid.uuid4().hex[:8]
        q = (df.writeStream.format("memory").queryName(name)
             .outputMode("append").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        ops = {r.operation for r in spark.table(name).collect()}
        assert ("begin" in ops) == expect_markers
        assert ("commit" in ops) == expect_markers
        assert "insert" in ops
