"""Round-5 ADVICE findings, each pinned by a regression test:

1. MssqlCdcWal orders same-transaction changes by __$seqval
   (tests/test_cdc_formats.py::test_mssql_same_transaction_seqval_ordering)
2. cockroachdb_changefeed lsn keeps HLC logical bits out of real time
   deltas (tests/test_cdc_formats.py::test_cockroach_changefeed_envelopes)
3. parse_logfmt: repeated keys keep the last value; standard escapes
   (here)
4. session_path error message lists every supported kind (here)
5. decode_resp validates bulk-string length + CRLF (here)
"""
from __future__ import annotations

import pytest
from pyspark.sql import Row

from tests.test_bloblang import run_mapping


def test_parse_logfmt_repeated_keys_last_wins(spark):
    # real logfmt output repeats keys; Spark's default
    # mapKeyDedupPolicy=EXCEPTION used to make this line throw
    rows = [Row(l='a=1 b=2 a=3 a=4 c=5')]
    got = run_mapping(
        spark,
        rows,
        """
        root.a = this.l.parse_logfmt().get("a")
        root.b = this.l.parse_logfmt().get("b")
        root.c = this.l.parse_logfmt().get("c")
        """,
    )
    assert got[0]["a"] == "4"
    assert got[0]["b"] == "2" and got[0]["c"] == "5"


def test_parse_logfmt_standard_escapes(spark):
    # \n / \t decode to control chars; \\n stays backslash + n
    rows = [Row(l=r'm="line1\nline2" t="a\tb" lit="not\\nnewline"')]
    got = run_mapping(
        spark,
        rows,
        """
        root.m = this.l.parse_logfmt().get("m")
        root.t = this.l.parse_logfmt().get("t")
        root.lit = this.l.parse_logfmt().get("lit")
        """,
    )
    assert got[0]["m"] == "line1\nline2"
    assert got[0]["t"] == "a\tb"
    assert got[0]["lit"] == "not\\nnewline"


def test_session_path_error_lists_all_supported_kinds(spark):
    from connect_spark.plans.pipeline import (
        PipelineConfigError,
        _build_input,
    )

    with pytest.raises(PipelineConfigError) as exc:
        _build_input(spark, {"gcp_pubsub": {"session_path": "/nope",
                                            "subscription": "s"}})
    msg = str(exc.value)
    for kind in ("amqp_0_9", "amqp_1", "mqtt", "nats", "redis_pubsub",
                 "redis_streams", "nsq", "beanstalkd", "pulsar",
                 "zmq4", "nanomsg"):
        assert kind in msg


def test_resp_truncated_bulk_string_raises():
    from connect_spark.functions.resp_codec import decode_resp

    full = b"$5\r\nhello\r\n"
    v, i = decode_resp(full, 0)
    assert v == b"hello" and i == len(full)
    with pytest.raises(ValueError, match="truncated"):
        decode_resp(b"$5\r\nhel", 0)
    with pytest.raises(ValueError, match="CRLF"):
        decode_resp(b"$5\r\nhelloXX", 0)
