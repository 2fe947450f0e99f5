"""Iceberg partition-transform surface (round-11): bucket / year /
month / hour / void + alias syntax, matching the reference parser
`internal/impl/iceberg/icebergx/partition_key.go:238-241` and the
Iceberg Table Spec's transform + Appendix B hash semantics."""

from __future__ import annotations

import datetime

import pytest

from connect_spark.sinks.iceberg_meta import (
    IcebergTable, _parse_partition_term,
)


# ---- Appendix B hash vectors (straight from the Iceberg spec) -------

def test_spec_hash_vectors():
    from connect_spark.functions.murmur3 import (
        iceberg_hash_bytes, iceberg_hash_decimal, iceberg_hash_long,
    )

    assert iceberg_hash_long(34) == 2017239379  # int and long
    days = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert iceberg_hash_long(days) == -653330422  # date
    micros_t = ((22 * 60 + 31) * 60 + 8) * 1_000_000
    assert iceberg_hash_long(micros_t) == -662762989  # time
    ts = int(datetime.datetime(
        2017, 11, 16, 22, 31, 8,
        tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
    assert iceberg_hash_long(ts) == -2047944441  # timestamp micros
    assert iceberg_hash_bytes(b"iceberg") == 1210000089  # string utf-8
    assert iceberg_hash_bytes(bytes([0, 1, 2, 3])) == -188683207
    assert iceberg_hash_decimal(1420) == -500754589  # decimal 14.20
    import uuid as _uuid

    u = _uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    assert iceberg_hash_bytes(u.bytes) == 1488055340


def test_numpy_kernel_matches_scalar_murmur3():
    import random
    import struct

    from connect_spark.functions.murmur3 import (
        murmur3_x86_32, murmur3_x86_32_longs_np,
    )

    rng = random.Random(11)
    vals = ([0, 1, -1, 2**31, -2**31, 2**62, -2**63, 2**63 - 1]
            + [rng.randint(-2**63, 2**63 - 1) for _ in range(200)])

    def signed(u):
        return u - (1 << 32) if u >= (1 << 31) else u

    ref = [signed(murmur3_x86_32(struct.pack("<q", v))) for v in vals]
    assert murmur3_x86_32_longs_np(vals).tolist() == ref


# ---- term parser ------------------------------------------------------

def test_parse_partition_term_grammar():
    assert _parse_partition_term("col") == ("col", "identity", "col")
    assert _parse_partition_term("identity(col)") == (
        "col", "identity", "col")
    assert _parse_partition_term("year(d)") == ("d", "year", "d_year")
    assert _parse_partition_term("month(d)") == ("d", "month", "d_month")
    assert _parse_partition_term("day(ts)") == ("ts", "day", "ts_day")
    assert _parse_partition_term("hour(ts)") == ("ts", "hour", "ts_hour")
    assert _parse_partition_term("void(x)") == ("x", "void", "x_null")
    # reference arg order (n, col) AND Spark DDL order (col, n)
    assert _parse_partition_term("bucket(16, k)") == (
        "k", "bucket[16]", "k_bucket")
    assert _parse_partition_term("bucket(k, 16)") == (
        "k", "bucket[16]", "k_bucket")
    assert _parse_partition_term("truncate(4, name)") == (
        "name", "truncate[4]", "name_trunc")
    assert _parse_partition_term("truncate(name, 4)") == (
        "name", "truncate[4]", "name_trunc")
    # alias + backticks
    assert _parse_partition_term("bucket(8, `user id`) as shard") == (
        "user id", "bucket[8]", "shard")
    assert _parse_partition_term("`weird col`") == (
        "weird col", "identity", "weird col")
    assert _parse_partition_term("day(ts) AS event_day") == (
        "ts", "day", "event_day")
    with pytest.raises(ValueError, match="unsupported"):
        _parse_partition_term("md5(col)")
    with pytest.raises(ValueError, match="integer"):
        _parse_partition_term("bucket(a, b)")
    with pytest.raises(ValueError, match="> 0"):
        _parse_partition_term("bucket(0, k)")


# ---- bucket transform end-to-end -------------------------------------

def test_bucket_partitioned_long_keys(spark, tmp_path):
    from connect_spark.functions.murmur3 import bucket_long

    t = IcebergTable(spark, str(tmp_path / "bucketed"))
    rows = [(i, f"v{i}") for i in range(40)]
    meta = t.append(
        spark.createDataFrame(rows, "k long, v string").coalesce(1),
        partition_by=["bucket(4, k)"],
    )
    spec = meta["partition-specs"][0]["fields"][0]
    assert spec["name"] == "k_bucket"
    assert spec["transform"] == "bucket[4]"
    # manifest partition values are the spec's bucket indices
    by_file = t.current_files()
    seen = {d["partition"]["k_bucket"] for d in by_file}
    assert seen == {bucket_long(i, 4) for i in range(40)}
    # equality filters on the SOURCE column prune to one bucket
    got = t.scan([("k", "=", 7)])
    assert t._last_scan_file_count < len(by_file)
    matched = [d for d in by_file
               if d["partition"]["k_bucket"] == bucket_long(7, 4)]
    assert t._last_scan_file_count == len(matched)
    assert [(r.k, r.v) for r in got.collect()] == [(7, "v7")]
    # range filters must NOT prune through the (non-monotone) hash:
    # every row with k >= 35 survives
    got2 = t.scan([("k", ">=", 35)])
    assert sorted(r.k for r in got2.collect()) == list(range(35, 40))
    # table schema carries only source columns; derived column gone
    assert set(got.columns) == {"k", "v"}
    # consistent re-append, then read back everything
    t.append(
        spark.createDataFrame([(100, "x")], "k long, v string"),
        partition_by=["bucket(4, k)"],
    )
    assert t.read().count() == 41
    # spec mismatch (different n) rejected
    with pytest.raises(ValueError, match="consistent"):
        t.append(
            spark.createDataFrame([(5, "y")], "k long, v string"),
            partition_by=["bucket(8, k)"],
        )


def test_bucket_partitioned_string_keys(spark, tmp_path):
    from connect_spark.functions.murmur3 import bucket_bytes

    t = IcebergTable(spark, str(tmp_path / "bucketed_s"))
    names = ["iceberg", "spark", "duck", "arrow", "parquet"]
    t.append(
        spark.createDataFrame(
            [(n, len(n)) for n in names], "name string, ln long"
        ).coalesce(1),
        partition_by=["bucket(3, name)"],
    )
    want = {n: bucket_bytes(n.encode(), 3) for n in names}
    parts = {d["partition"]["name_bucket"] for d in t.current_files()}
    assert parts == set(want.values())
    got = t.scan([("name", "=", "iceberg")])
    assert [r.ln for r in got.collect()] == [7]
    kept = t._last_scan_file_count
    assert kept == sum(
        1 for d in t.current_files()
        if d["partition"]["name_bucket"] == want["iceberg"])


def test_bucket_null_keys_land_in_null_partition(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "bucketed_n"))
    t.append(
        spark.createDataFrame(
            [(None, "a"), (3, "b")], "k long, v string").coalesce(1),
        partition_by=["bucket(4, k)"],
    )
    parts = sorted(
        (d["partition"]["k_bucket"] for d in t.current_files()),
        key=lambda x: (x is not None, x))
    assert parts[0] is None
    assert {r.v for r in t.read().collect()} == {"a", "b"}


# ---- time family ------------------------------------------------------

def test_year_month_partition_transforms(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "yearly"))
    rows = [
        (1, datetime.date(2023, 12, 30)),
        (2, datetime.date(2024, 1, 2)),
        (3, datetime.date(2024, 7, 15)),
    ]
    meta = t.append(
        spark.createDataFrame(rows, "id long, d date").coalesce(1),
        partition_by=["year(d)"],
    )
    spec = meta["partition-specs"][0]["fields"][0]
    assert (spec["name"], spec["transform"]) == ("d_year", "year")
    # spec domain: years since 1970
    assert {d["partition"]["d_year"] for d in t.current_files()} == {
        53, 54}
    got = t.scan([("d", ">=", datetime.date(2024, 1, 1))])
    assert t._last_scan_file_count == 1
    assert sorted(r.id for r in got.collect()) == [2, 3]

    t2 = IcebergTable(spark, str(tmp_path / "monthly"))
    t2.append(
        spark.createDataFrame(rows, "id long, d date").coalesce(1),
        partition_by=["month(d)"],
    )
    # months since 1970-01: 2023-12 → 647, 2024-01 → 648, 2024-07 → 654
    assert {d["partition"]["d_month"] for d in t2.current_files()} == {
        647, 648, 654}
    got2 = t2.scan([("d", "<", datetime.date(2024, 2, 1))])
    assert t2._last_scan_file_count == 2
    assert sorted(r.id for r in got2.collect()) == [1, 2]


def test_hour_partition_transform(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "hourly"))
    rows = [
        (1, datetime.datetime(2024, 1, 1, 3, 10)),
        (2, datetime.datetime(2024, 1, 1, 3, 50)),
        (3, datetime.datetime(2024, 1, 1, 9, 5)),
    ]
    t.append(
        spark.createDataFrame(rows, "id long, ts timestamp").coalesce(1),
        partition_by=["hour(ts)"],
    )
    epoch_h = lambda dt: int(dt.replace(
        tzinfo=datetime.timezone.utc).timestamp()) // 3600  # noqa: E731
    assert {d["partition"]["ts_hour"] for d in t.current_files()} == {
        epoch_h(datetime.datetime(2024, 1, 1, 3)),
        epoch_h(datetime.datetime(2024, 1, 1, 9))}
    got = t.scan([("ts", ">", datetime.datetime(2024, 1, 1, 4))])
    assert t._last_scan_file_count == 1
    assert [r.id for r in got.collect()] == [3]
    # hour on a non-timestamp column is a hard error
    t_bad = IcebergTable(spark, str(tmp_path / "hourly_bad"))
    with pytest.raises(ValueError, match="hour transform"):
        t_bad.append(
            spark.createDataFrame([(1, 5)], "id long, n long"),
            partition_by=["hour(n)"],
        )


def test_void_partition_transform(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "voided"))
    meta = t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string").coalesce(1),
        partition_by=["void(id)"],
    )
    spec = meta["partition-specs"][0]["fields"][0]
    assert (spec["name"], spec["transform"]) == ("id_null", "void")
    # every file lands in the single null partition
    assert all(d["partition"]["id_null"] is None
               for d in t.current_files())
    # filters on the source column still work (bounds path), never
    # wrongly pruned by the void transform
    got = t.scan([("id", "=", 2)])
    assert [r.v for r in got.collect()] == ["b"]
    assert t.read().count() == 2


def test_alias_and_reference_arg_order_end_to_end(spark, tmp_path):
    t = IcebergTable(spark, str(tmp_path / "aliased"))
    meta = t.append(
        spark.createDataFrame(
            [(i, datetime.date(2024, 1 + i % 3, 1)) for i in range(6)],
            "k long, d date").coalesce(1),
        partition_by=["bucket(2, k) as shard", "month(d) as mo"],
    )
    fields = meta["partition-specs"][0]["fields"]
    assert [(f["name"], f["transform"]) for f in fields] == [
        ("shard", "bucket[2]"), ("mo", "month")]
    assert t.read().count() == 6
    got = t.scan([("d", "=", datetime.date(2024, 2, 1))])
    assert sorted(r.k for r in got.collect()) == [1, 4]


def test_update_where_and_rewrite_on_bucketed_table(spark, tmp_path):
    """Row-level DML and compaction preserve DERIVED partition specs:
    the spec's terms are reconstructed from table metadata (round-11
    lift of the identity-only restriction)."""
    t = IcebergTable(spark, str(tmp_path / "dml_bucketed"))
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}", 10.0 * i) for i in range(20)],
            "k long, v string, amt double").coalesce(1),
        partition_by=["bucket(4, k)"],
    )
    # UPDATE ... WHERE k = 7
    t.update_where([("k", "=", 7)], {"amt": 777.0})
    got = {r.k: r.amt for r in t.read().collect()}
    assert got[7] == 777.0 and got[6] == 60.0 and len(got) == 20
    # spec survived the delete+append round trip
    spec = t._current_partition_spec()
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("k_bucket", "bucket[4]")]
    # compaction on the bucketed table drops tombstones, keeps rows
    t.rewrite_data_files()
    assert t.current_delete_files() == []
    got2 = {r.k: r.amt for r in t.read().collect()}
    assert got2 == got
    spec2 = t._current_partition_spec()
    assert [(f["name"], f["transform"]) for f in spec2] == [
        ("k_bucket", "bucket[4]")]
    # bucket pruning still works post-compaction
    out = t.scan([("k", "=", 7)])
    assert [r.amt for r in out.collect()] == [777.0]
    assert t._last_scan_file_count < len(t.current_files())


def test_terms_roundtrip_with_alias(spark, tmp_path):
    import datetime

    t = IcebergTable(spark, str(tmp_path / "alias_terms"))
    t.append(
        spark.createDataFrame(
            [(i, datetime.date(2024, 1 + i % 3, 5)) for i in range(9)],
            "k long, d date").coalesce(1),
        partition_by=["bucket(2, k) as shard", "month(d)"],
    )
    assert t._current_partition_terms() == [
        "bucket(2, k) as shard", "month(d)"]
    t.update_where([("k", "=", 3)], {"k": 103})
    spec = t._current_partition_spec()
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("shard", "bucket[2]"), ("d_month", "month")]
    assert sorted(r.k for r in t.read().collect()) == sorted(
        [0, 1, 2, 103, 4, 5, 6, 7, 8])
