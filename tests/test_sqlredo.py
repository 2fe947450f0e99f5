"""Oracle LogMiner SQL_REDO parser matrix — the documented behavioral
contract of internal/impl/oracledb/logminer/sqlredo (quoting, escapes,
NULL/Unsupported Type, function expressions, aliases, ROWID, IS NULL
exclusion, identifiers with spaces)."""

from __future__ import annotations

import pytest

from connect_spark.sources.sqlredo import parse_redo


def test_insert_basic():
    st = parse_redo(
        'insert into "APP"."USERS" ("ID","NAME","MAIL") '
        "values ('7','Ada Lovelace','ada@host')")
    assert st.operation == "insert"
    assert (st.schema, st.table) == ("APP", "USERS")
    assert st.new_values == {"ID": "7", "NAME": "Ada Lovelace",
                             "MAIL": "ada@host"}
    assert st.old_values == {}


def test_update_set_and_where():
    st = parse_redo(
        'update "APP"."USERS" set "NAME" = \'Grace\', "MAIL" = NULL '
        'where "ID" = \'7\' and "NAME" = \'Ada\'')
    assert st.operation == "update"
    assert st.new_values == {"NAME": "Grace", "MAIL": None}
    assert st.old_values == {"ID": "7", "NAME": "Ada"}


def test_delete_where():
    st = parse_redo(
        'delete from "APP"."USERS" where "ID" = \'7\'')
    assert st.operation == "delete"
    assert st.old_values == {"ID": "7"}
    assert st.new_values == {}


def test_escaped_single_quotes_and_double_quotes_in_strings():
    st = parse_redo(
        'insert into "A"."M" ("ID","TXT","QT") '
        "values ('1','it''s fine','say \"hi\"')")
    assert st.new_values == {"ID": "1", "TXT": "it's fine",
                             "QT": 'say "hi"'}


def test_oracle_function_values_kept_raw():
    st = parse_redo(
        'insert into "A"."ORDERS" ("ID","D","TS") values '
        "('9',TO_DATE('2020-01-15','YYYY-MM-DD'),"
        "TO_TIMESTAMP('2020-02-01 00:00:00.'))")
    assert st.new_values["D"] == "TO_DATE('2020-01-15','YYYY-MM-DD')"
    assert st.new_values["TS"] == "TO_TIMESTAMP('2020-02-01 00:00:00.')"


def test_quote_inside_double_quoted_identifier():
    st = parse_redo(
        'insert into "A"."O\'Hara" ("ID","NAME") values (\'1\',\'Bea\')')
    assert st.table == "O'Hara"
    assert st.new_values == {"ID": "1", "NAME": "Bea"}


def test_null_and_unsupported_type():
    st = parse_redo(
        'insert into "A"."T" ("ID","N","U","V") values '
        "('1',NULL,Unsupported Type,NULL)")
    assert st.new_values == {"ID": "1", "N": None, "U": None, "V": None}


def test_update_without_where_and_aliases():
    st = parse_redo(
        'update "A"."T" x set x."C1" = \'1\', x."C2" = NULL')
    assert st.new_values == {"C1": "1", "C2": None}
    assert st.old_values == {}
    st2 = parse_redo(
        'delete from "A"."T" x where x."C1" = \'1\' and x."C2" = \'2\'')
    assert st2.old_values == {"C1": "1", "C2": "2"}


def test_delete_without_where():
    st = parse_redo('delete from "A"."T"')
    assert st.old_values == {}


def test_rowid_where():
    st = parse_redo(
        'update "APP"."EQ" set "STATUS" = \'UP\' '
        "where ROWID = 'AAAQzzExample00'")
    assert st.new_values == {"STATUS": "UP"}
    assert st.old_values == {"ROWID": "AAAQzzExample00"}


def test_is_null_predicates_excluded():
    st = parse_redo(
        'delete from "A"."T" where "C1" = \'1\' and "C2" IS NULL '
        'and "C3" IS NOT NULL')
    assert st.old_values == {"C1": "1"}


def test_literal_double_pipe_not_concat():
    st = parse_redo(
        'insert into "U"."T" ("C1","C2") values (\'a||b\',\'c||d\')')
    assert st.new_values == {"C1": "a||b", "C2": "c||d"}


def test_identifiers_with_spaces_and_specials():
    st = parse_redo(
        'insert into "U"."OBJ# 123"("COL 1","COL 2") '
        "values ('1','two')")
    assert st.table == "OBJ# 123"
    assert st.new_values == {"COL 1": "1", "COL 2": "two"}


def test_malformed_statements_raise_cleanly():
    for bad in [
        "truncate table x",
        'insert into "A"."T" values',
        'update "A"."T" set',
        "",
        'insert into "A"."T" ("C1") values (\'a\', \'b\')',
    ]:
        with pytest.raises((ValueError, AssertionError, IndexError)):
            parse_redo(bad)


def test_oracledb_cdc_consumes_logminer_recording(spark, tmp_path):
    """oracledb_cdc over a recorded V$LOGMNR_CONTENTS resultset:
    SQL_REDO statements parse into row images, SCN becomes the
    resume offset."""
    import json

    from connect_spark.plans.pipeline import Pipeline

    wal = tmp_path / "lmwal"
    wal.mkdir()
    rows = [
        {"scn": 101, "timestamp_ms": 5000, "operation": "INSERT",
         "sql_redo": 'insert into "APP"."ACCT" ("ID","ST","BAL") '
                     "values ('1','open','10.50')"},
        {"scn": 102, "timestamp_ms": 5000, "operation": "INSERT",
         "sql_redo": 'insert into "APP"."ACCT" ("ID","ST","BAL") '
                     "values ('2','open','20.00')"},
        {"scn": 110, "timestamp_ms": 6000, "operation": "UPDATE",
         "sql_redo": 'update "APP"."ACCT" set "ST" = \'closed\' '
                     "where \"ID\" = '1' and \"ST\" = 'open'"},
        {"scn": 111, "timestamp_ms": 6000, "operation": "DELETE",
         "sql_redo": 'delete from "APP"."ACCT" where "ID" = \'2\''},
    ]
    (wal / "win-000.logmnr.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows))
    df = Pipeline(spark, {"input": {"oracledb_cdc": {
        "dsn": "oracle://u@h/db", "wal_path": str(wal),
    }}}).dataframe()
    import uuid

    name = "lm_" + uuid.uuid4().hex[:8]
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.lsn: r for r in spark.table(name).collect()}
    assert sorted(got) == [101, 102, 110, 111]
    assert got[101].operation == "insert"
    assert json.loads(got[101].after) == {
        "ID": "1", "ST": "open", "BAL": "10.50"}
    assert got[110].operation == "update"
    assert json.loads(got[110].after) == {"ST": "closed"}
    assert json.loads(got[110].before) == {"ID": "1", "ST": "open"}
    assert got[111].operation == "delete"
    assert got[111].table == "ACCT"
    assert got[110].commit_ts_ms == 6000
