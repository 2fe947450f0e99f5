"""Native change-representation decoders for the structured CDC kinds
(sources/cdc_formats.py): SQL Server change tables, Mongo change
streams, DynamoDB Streams, Spanner change streams, CockroachDB
changefeeds, Salesforce CDC events — each consumed in the service's
own documented format, with end-to-end input-kind tests."""

from __future__ import annotations

import json

import pytest

from connect_spark.sources.cdc_formats import (
    JsonlEnvelopeWal,
    MssqlCdcWal,
    decode_dynamo_attr,
    open_format_wal,
    parse_mssql_lsn,
)


def _write(path, name, rows):
    path.mkdir(exist_ok=True)
    (path / name).write_text("\n".join(json.dumps(r) for r in rows))


# --- SQL Server -------------------------------------------------------

def test_mssql_lsn_ordering():
    a = parse_mssql_lsn("0000003a:00000150:0003")
    b = parse_mssql_lsn("0000003a:00000150:0004")
    c = parse_mssql_lsn("0000003b:00000001:0001")
    assert a < b < c


def test_mssql_change_table_rows(tmp_path):
    rows = [
        {"__$start_lsn": "0000003a:00000100:0001", "__$seqval": "s1",
         "__$operation": 2, "__$table": "ACCT",
         "__$commit_ts_ms": 5000, "id": 1, "st": "open"},
        {"__$start_lsn": "0000003a:00000200:0001", "__$seqval": "s2",
         "__$operation": 3, "__$table": "ACCT",
         "__$commit_ts_ms": 6000, "id": 1, "st": "open"},
        {"__$start_lsn": "0000003a:00000200:0002", "__$seqval": "s2",
         "__$operation": 4, "__$table": "ACCT",
         "__$commit_ts_ms": 6000, "id": 1, "st": "closed"},
        {"__$start_lsn": "0000003a:00000300:0001", "__$seqval": "s3",
         "__$operation": 1, "__$table": "ACCT",
         "__$commit_ts_ms": 7000, "id": 1, "st": "closed"},
    ]
    _write(tmp_path / "w", "c.mssqlcdc.jsonl", rows)
    recs = list(MssqlCdcWal(str(tmp_path / "w")).records(0))
    assert [r["operation"] for r in recs] == [
        "insert", "update", "delete"]
    upd = recs[1]
    # 3/4 pair merged: before from op-3, after from op-4
    assert upd["before"] == {"id": 1, "st": "open"}
    assert upd["after"] == {"id": 1, "st": "closed"}
    assert upd["table"] == "ACCT" and upd["commit_ts_ms"] == 6000
    # resume past the update re-reads only the delete
    tail = list(MssqlCdcWal(str(tmp_path / "w")).records(upd["lsn"]))
    assert [r["operation"] for r in tail] == ["delete"]


def test_mssql_same_transaction_seqval_ordering(tmp_path):
    # two changes to the same key inside ONE transaction: identical
    # __$start_lsn, ordered by __$seqval.  Pre-fix both got the same
    # lsn (nondeterministic last-writer-wins; resume could drop or
    # replay half the transaction).
    rows = [
        {"__$start_lsn": "0000003a:00000100:0001", "__$seqval": "q1",
         "__$operation": 2, "__$table": "ACCT",
         "__$commit_ts_ms": 5000, "id": 1, "st": "open"},
        {"__$start_lsn": "0000003a:00000100:0001", "__$seqval": "q2",
         "__$operation": 3, "__$table": "ACCT",
         "__$commit_ts_ms": 5000, "id": 1, "st": "open"},
        {"__$start_lsn": "0000003a:00000100:0001", "__$seqval": "q2",
         "__$operation": 4, "__$table": "ACCT",
         "__$commit_ts_ms": 5000, "id": 1, "st": "closed"},
    ]
    _write(tmp_path / "w", "c.mssqlcdc.jsonl", rows)
    recs = list(MssqlCdcWal(str(tmp_path / "w")).records(0))
    assert [r["operation"] for r in recs] == ["insert", "update"]
    assert recs[0]["lsn"] < recs[1]["lsn"]
    # resume at the insert's lsn replays exactly the update — the
    # second half of the transaction is neither dropped nor duplicated
    tail = list(MssqlCdcWal(str(tmp_path / "w")).records(recs[0]["lsn"]))
    assert [r["operation"] for r in tail] == ["update"]
    assert tail[0]["after"] == {"id": 1, "st": "closed"}


# --- Mongo ------------------------------------------------------------

def test_mongo_change_stream_events(tmp_path):
    rows = [
        {"operationType": "insert", "clusterTime": {"t": 100, "i": 1},
         "ns": {"db": "d", "coll": "users"},
         "documentKey": {"_id": "u1"},
         "fullDocument": {"_id": "u1", "name": "ann"}},
        {"operationType": "update", "clusterTime": {"t": 101, "i": 1},
         "ns": {"db": "d", "coll": "users"},
         "documentKey": {"_id": "u1"},
         "updateDescription": {"updatedFields": {"name": "bea"},
                               "removedFields": ["tmp"]}},
        {"operationType": "delete", "clusterTime": {"t": 102, "i": 1},
         "ns": {"db": "d", "coll": "users"},
         "documentKey": {"_id": "u1"}},
        {"operationType": "drop", "clusterTime": {"t": 103, "i": 1},
         "ns": {"db": "d", "coll": "users"}},
    ]
    _write(tmp_path / "w", "r.changestream.jsonl", rows)
    wal = open_format_wal("mongodb_cdc", str(tmp_path / "w"))
    recs = list(wal.records(0))
    assert [r["operation"] for r in recs] == [
        "insert", "update", "delete"]  # drop has no row image
    assert recs[0]["after"] == {"_id": "u1", "name": "ann"}
    # partial update surfaces updated+removed fields + key
    assert recs[1]["after"] == {"name": "bea", "tmp": None,
                                "_id": "u1"}
    assert recs[2]["before"] == {"_id": "u1"}
    assert recs[0]["lsn"] == (100 << 32) | 1
    assert recs[0]["table"] == "users"


# --- DynamoDB ---------------------------------------------------------

def test_dynamo_attribute_values():
    assert decode_dynamo_attr({"S": "x"}) == "x"
    assert decode_dynamo_attr({"N": "42"}) == 42
    assert decode_dynamo_attr({"N": "4.5"}) == 4.5
    assert decode_dynamo_attr({"BOOL": True}) is True
    assert decode_dynamo_attr({"NULL": True}) is None
    assert decode_dynamo_attr(
        {"L": [{"N": "1"}, {"S": "a"}]}) == [1, "a"]
    assert decode_dynamo_attr(
        {"M": {"k": {"S": "v"}}}) == {"k": "v"}
    assert decode_dynamo_attr({"SS": ["a", "b"]}) == ["a", "b"]


def test_dynamo_stream_records(tmp_path):
    rows = [
        {"eventName": "INSERT", "eventSourceTable": "items",
         "dynamodb": {"Keys": {"id": {"N": "1"}},
                      "NewImage": {"id": {"N": "1"},
                                   "name": {"S": "ann"}},
                      "ApproximateCreationDateTime": 1700000000}},
        {"eventName": "MODIFY", "eventSourceTable": "items",
         "dynamodb": {"Keys": {"id": {"N": "1"}},
                      "OldImage": {"id": {"N": "1"},
                                   "name": {"S": "ann"}},
                      "NewImage": {"id": {"N": "1"},
                                   "name": {"S": "bea"}},
                      "ApproximateCreationDateTime": 1700000100}},
        {"eventName": "REMOVE", "eventSourceTable": "items",
         "dynamodb": {"Keys": {"id": {"N": "1"}},
                      "OldImage": {"id": {"N": "1"},
                                   "name": {"S": "bea"}},
                      "ApproximateCreationDateTime": 1700000200}},
    ]
    _write(tmp_path / "w", "r.ddbstream.jsonl", rows)
    wal = open_format_wal("aws_dynamodb_cdc", str(tmp_path / "w"))
    recs = list(wal.records(0))
    assert [r["operation"] for r in recs] == [
        "insert", "update", "delete"]
    assert recs[0]["after"] == {"id": 1, "name": "ann"}
    assert recs[1]["before"] == {"id": 1, "name": "ann"}
    assert recs[1]["after"] == {"id": 1, "name": "bea"}
    assert recs[2]["after"] is None
    assert recs[0]["commit_ts_ms"] == 1700000000000


# --- Spanner ----------------------------------------------------------

def test_spanner_data_change_records(tmp_path):
    rows = [
        {"commit_timestamp_us": 1_700_000_000_000_000,
         "record_sequence": 0, "table_name": "accounts",
         "mod_type": "INSERT",
         "mods": [{"keys": {"id": 1},
                   "new_values": {"bal": 10}},
                  {"keys": {"id": 2},
                   "new_values": {"bal": 20}}]},
        {"commit_timestamp_us": 1_700_000_000_000_500,
         "record_sequence": 1, "table_name": "accounts",
         "mod_type": "DELETE",
         "mods": [{"keys": {"id": 2}}]},
    ]
    _write(tmp_path / "w", "r.spannercs.jsonl", rows)
    wal = open_format_wal("gcp_spanner_cdc", str(tmp_path / "w"))
    recs = list(wal.records(0))
    assert [r["operation"] for r in recs] == [
        "insert", "insert", "delete"]
    assert recs[0]["after"] == {"id": 1, "bal": 10}
    assert recs[1]["after"] == {"id": 2, "bal": 20}
    assert recs[2]["before"] == {"id": 2}
    assert recs[0]["lsn"] < recs[1]["lsn"] < recs[2]["lsn"]


# --- Cockroach --------------------------------------------------------

def test_cockroach_changefeed_envelopes(tmp_path):
    rows = [
        {"after": {"id": 1, "v": "a"}, "key": [1], "table": "t",
         "updated": "1700000000000000000.0000000001"},
        {"after": {"id": 1, "v": "b"}, "before": {"id": 1, "v": "a"},
         "key": [1], "table": "t",
         "updated": "1700000000000000000.0000000002"},
        {"after": None, "before": {"id": 1, "v": "b"}, "key": [1],
         "table": "t", "updated": "1700000000000002000.0000000001"},
    ]
    _write(tmp_path / "w", "r.changefeed.jsonl", rows)
    wal = open_format_wal("cockroachdb_changefeed", str(tmp_path / "w"))
    recs = list(wal.records(0))
    assert [r["operation"] for r in recs] == [
        "insert", "update", "delete"]
    assert recs[1]["before"] == {"id": 1, "v": "a"}
    assert recs[0]["commit_ts_ms"] == 1_700_000_000_000
    # same-instant events order by the HLC logical counter (rows 0/1
    # share wall nanos, logical 1 vs 2); later wall time dominates
    # regardless of a smaller logical (row 2)
    assert recs[0]["lsn"] < recs[1]["lsn"] < recs[2]["lsn"]
    # the logical counter only occupies tie-break bits: a 2µs wall
    # delta beats any logical value (the pre-fix nanos+logical scheme
    # inverted events <256ns apart)
    assert recs[2]["lsn"] - recs[1]["lsn"] > 0x3FF


# --- Salesforce -------------------------------------------------------

def test_salesforce_cdc_events(tmp_path):
    rows = [
        {"replayId": 10, "payload": {
            "ChangeEventHeader": {
                "entityName": "Account", "changeType": "CREATE",
                "recordIds": ["001A", "001B"],
                "commitTimestamp": 1700000000000},
            "Name": "Acme"}},
        {"replayId": 11, "payload": {
            "ChangeEventHeader": {
                "entityName": "Account", "changeType": "DELETE",
                "recordIds": ["001A"],
                "commitTimestamp": 1700000001000}}},
    ]
    _write(tmp_path / "w", "r.sfcdc.jsonl", rows)
    wal = open_format_wal("salesforce_cdc", str(tmp_path / "w"))
    recs = list(wal.records(0))
    # multi-record CREATE fans out per recordId
    assert [r["operation"] for r in recs] == [
        "insert", "insert", "delete"]
    assert recs[0]["after"] == {"Name": "Acme", "Id": "001A"}
    assert recs[1]["after"] == {"Name": "Acme", "Id": "001B"}
    assert recs[2]["before"] == {"Id": "001A"}
    assert recs[0]["table"] == "Account"


# --- end-to-end through the input kinds ------------------------------

def test_mssql_cdc_input_consumes_change_table(spark, tmp_path):
    from connect_spark.plans.pipeline import Pipeline

    rows = [
        {"__$start_lsn": "00000001:00000010:0001", "__$seqval": "a",
         "__$operation": 2, "__$table": "t", "__$commit_ts_ms": 1,
         "id": 1, "v": "x"},
        {"__$start_lsn": "00000001:00000020:0001", "__$seqval": "b",
         "__$operation": 3, "__$table": "t", "__$commit_ts_ms": 2,
         "id": 1, "v": "x"},
        {"__$start_lsn": "00000001:00000020:0002", "__$seqval": "b",
         "__$operation": 4, "__$table": "t", "__$commit_ts_ms": 2,
         "id": 1, "v": "y"},
    ]
    wal = tmp_path / "mw"
    _write(wal, "c.mssqlcdc.jsonl", rows)
    df = Pipeline(spark, {"input": {"microsoft_sql_server_cdc": {
        "dsn": "sqlserver://u@h/db", "wal_path": str(wal),
    }}}).dataframe()
    import uuid

    name = "ms_" + uuid.uuid4().hex[:8]
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(spark.table(name).collect(), key=lambda r: r.lsn)
    assert [r.operation for r in got] == ["insert", "update"]
    assert json.loads(got[1].after) == {"id": 1, "v": "y"}
    assert json.loads(got[1].before) == {"id": 1, "v": "x"}


def test_mongodb_cdc_input_consumes_change_stream(spark, tmp_path):
    from connect_spark.plans.pipeline import Pipeline

    rows = [
        {"operationType": "insert", "clusterTime": {"t": 9, "i": 1},
         "ns": {"db": "d", "coll": "c"},
         "documentKey": {"_id": "k"},
         "fullDocument": {"_id": "k", "n": 5}},
    ]
    wal = tmp_path / "mg"
    _write(wal, "r.changestream.jsonl", rows)
    df = Pipeline(spark, {"input": {"mongodb_cdc": {
        "url": "mongodb://h", "database": "d", "wal_path": str(wal),
    }}}).dataframe()
    import uuid

    name = "mg_" + uuid.uuid4().hex[:8]
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows_out = spark.table(name).collect()
    assert len(rows_out) == 1
    assert rows_out[0].operation == "insert"
    assert json.loads(rows_out[0].after) == {"_id": "k", "n": 5}


def test_tigerbeetle_cdc_events(tmp_path):
    rows = [
        {"timestamp": "1745328372758695656", "type": "single_phase",
         "ledger": 2,
         "transfer": {"id": "9082709", "amount": "3794", "code": 20295},
         "debit_account": {"id": "3750"},
         "credit_account": {"id": "6765"}},
    ]
    _write(tmp_path / "w", "r.tbcdc.jsonl", rows)
    wal = open_format_wal("tigerbeetle_cdc", str(tmp_path / "w"))
    recs = list(wal.records(0))
    assert len(recs) == 1
    r = recs[0]
    assert r["operation"] == "insert" and r["table"] == "transfers"
    assert r["after"]["transfer_id"] == "9082709"
    assert r["after"]["transfer_amount"] == "3794"
    assert r["after"]["debit_account_id"] == "3750"
    assert r["after"]["ledger"] == 2
    assert r["lsn"] == 1745328372758695656
    assert r["commit_ts_ms"] == 1745328372758
