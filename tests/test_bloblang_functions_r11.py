"""Round-11 Bloblang function additions (the three source-registered
plugin functions the inventory diff surfaced): ulid (lang/bloblang.go:
315-380), snowflake_id (lang/bloblang.go:162-190),
with_schema_registry_header (confluent/bloblang.go:30-46)."""

from __future__ import annotations

import struct
import time

import pytest

from connect_spark.bloblang import compile_mapping
from connect_spark.bloblang.pyeval import eval_mapping_value

CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"


def test_ulid_column_path(spark):
    df = spark.createDataFrame([(i,) for i in range(64)], "x long")
    rows = compile_mapping(df, '''
root.u = ulid()
root.uh = ulid("hex")
root.x = this.x
''').collect()
    assert len({r.u for r in rows}) == 64  # unique
    for r in rows:
        assert len(r.u) == 26 and all(c in CROCKFORD for c in r.u)
        assert len(r.uh) == 32
        # the 10-char time prefix decodes to ~now (ms)
        t = 0
        for c in r.u[:10]:
            t = t * 32 + CROCKFORD.index(c)
        assert abs(t / 1000 - time.time()) < 600
        assert abs(int(r.uh[:12], 16) / 1000 - time.time()) < 600


def test_snowflake_id_column_path(spark):
    df = spark.createDataFrame([(i,) for i in range(64)], "x long")
    rows = compile_mapping(
        df, "root.sid = snowflake_id(42)\nroot.x = this.x").collect()
    ids = [int(r.sid) for r in rows]
    assert len(set(ids)) == 64  # unique across partitions
    for v in ids:
        ms = (v >> 22) + 1288834974657
        assert abs(ms / 1000 - time.time()) < 600
        # node bits = (42 + partition) mod 1024 — always >= nothing
        assert 0 <= (v >> 12) & 0x3FF <= 1023


def test_with_schema_registry_header_column_path(spark):
    df = spark.createDataFrame([("payload",)], "content string")
    row = compile_mapping(df, '''
root.hdr = with_schema_registry_header(123, this.content)
root.hdr2 = with_schema_registry_header(4294967295, "m")
''').collect()[0]
    assert bytes(row.hdr) == b"\x00" + struct.pack(">I", 123) + b"payload"
    assert bytes(row.hdr2) == b"\x00\xff\xff\xff\xff" + b"m"


def test_invalid_args_raise(spark):
    from connect_spark.bloblang.compiler import BloblangError

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(BloblangError, match="encoding"):
        compile_mapping(df, 'root.u = ulid("base64")')
    with pytest.raises(BloblangError, match="node_id"):
        compile_mapping(df, "root.s = snowflake_id(5000)")
    with pytest.raises(BloblangError, match="schema_id"):
        compile_mapping(
            df,
            "root.h = with_schema_registry_header(4294967296, \"m\")")


def test_pyeval_versions():
    out = eval_mapping_value(
        'root.u = ulid()\n'
        'root.uh = ulid("hex")\n'
        'root.s = snowflake_id(7)\n'
        'root.h = with_schema_registry_header(9, "xy")', {})
    assert len(out["u"]) == 26 and all(c in CROCKFORD for c in out["u"])
    assert len(out["uh"]) == 32
    v = int(out["s"])
    assert (v >> 12) & 0x3FF == 7
    assert out["h"] == b"\x00" + struct.pack(">I", 9) + b"xy"
    # sequence increments within a process
    a = int(eval_mapping_value("root = snowflake_id(7)", {}))
    b = int(eval_mapping_value("root = snowflake_id(7)", {}))
    assert a != b


def test_snowflake_id_unique_past_sequence_wrap(spark):
    """Round-11 ADVICE #1: >4096 rows per partition must not collide —
    the row counter's overflow folds into the millisecond field (the
    batch analogue of the reference's block-until-next-ms)."""
    df = spark.range(0, 10000, 1, 2)  # 5000 rows/partition > 4096
    rows = compile_mapping(
        df, "root.sid = snowflake_id(3)\nroot.x = this.id").collect()
    ids = [int(r.sid) for r in rows]
    assert len(set(ids)) == 10000
    # rows k and k+4096 of one partition differ by exactly 1 virtual ms
    by_ms = {}
    for v in ids:
        by_ms.setdefault(v >> 22, 0)
        by_ms[v >> 22] += 1
    assert all(c <= 4096 * 1024 for c in by_ms.values())


def test_snowflake_id_unique_across_node_alias_partitions(spark):
    """Partitions 1024 apart share node bits; the partition_id>>10
    group folds into the virtual counter so they cannot collide."""
    df = spark.range(0, 4200, 1, 1050)  # partitions 0..1049, 4 rows each
    rows = compile_mapping(
        df, "root.sid = snowflake_id(0)\nroot.x = this.id").collect()
    ids = [int(r.sid) for r in rows]
    assert len(set(ids)) == 4200


def test_sr_header_column_path_range_checked(spark):
    """Round-11 ADVICE #3: a Column-typed schema_id out of uint32
    range fails loudly instead of silently truncating."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame([(4294967296,)], "sid long")
    bad = compile_mapping(
        df, 'root.h = with_schema_registry_header(this.sid, "m")')
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="schema_id|USER_RAISED"):
        bad.collect()
    # in-range Column values still encode correctly
    ok = compile_mapping(
        spark.createDataFrame([(123,)], "sid long"),
        'root.h = with_schema_registry_header(this.sid, "m")').collect()
    assert bytes(ok[0].h) == b"\x00" + struct.pack(">I", 123) + b"m"
