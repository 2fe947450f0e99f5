"""Iceberg REST-catalog client protocol (sinks/iceberg_rest.py):
namespace/table lifecycle, snapshot-ref commits with the optimistic
requirement, conflict handling, and the YAML catalog route."""

from __future__ import annotations

import pytest

from connect_spark.sinks.iceberg_rest import (
    CatalogError,
    LocalCatalogHandler,
    RestCatalog,
)


@pytest.fixture()
def catalog(tmp_path):
    handler = LocalCatalogHandler(str(tmp_path / "warehouse"))
    return RestCatalog("http://catalog", handler)


def test_namespace_and_table_lifecycle(catalog):
    assert catalog.config() == {"defaults": {}, "overrides": {}}
    catalog.create_namespace("analytics")
    assert ["analytics"] in catalog.list_namespaces()
    catalog.create_table("analytics", "events", location=None)
    idents = catalog.list_tables("analytics")
    assert idents == [{"namespace": ["analytics"], "name": "events"}]
    loaded = catalog.load_table("analytics", "events")
    assert loaded["metadata"]["current-snapshot-id"] == -1


def test_create_errors(catalog):
    with pytest.raises(CatalogError) as e:
        catalog.create_table("missing_ns", "t", None)
    assert e.value.status == 404
    catalog.create_namespace("ns")
    catalog.create_table("ns", "t", None)
    with pytest.raises(CatalogError) as e2:
        catalog.create_table("ns", "t", None)
    assert e2.value.status == 409


def test_commit_append_moves_main(spark, catalog):
    catalog.create_namespace("ns")
    catalog.create_table("ns", "orders", None)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    result = catalog.commit_append(spark, "ns", "orders", df)
    snap1 = result["metadata"]["current-snapshot-id"]
    assert snap1 != -1
    # second commit advances the ref and both snapshots' rows read back
    catalog.commit_append(
        spark, "ns", "orders",
        spark.createDataFrame([(3, "c")], "id int, v string"))
    loaded = catalog.load_table("ns", "orders")
    assert loaded["metadata"]["current-snapshot-id"] != snap1
    from connect_spark.sinks.iceberg_meta import IcebergTable

    table = IcebergTable(spark, loaded["metadata"]["location"])
    got = sorted(r.id for r in table.read().collect())
    assert got == [1, 2, 3]


def test_commit_conflict_gets_409(spark, catalog, monkeypatch):
    catalog.create_namespace("ns")
    catalog.create_table("ns", "t", None)
    df = spark.createDataFrame([(1,)], "id int")

    real_load = catalog.load_table
    raced = []

    def racing_load(ns, name):
        loaded = real_load(ns, name)
        if not raced:
            raced.append(True)
            # another writer commits between our load and our POST
            catalog.commit_append(spark, ns, name, df)
        return loaded

    monkeypatch.setattr(catalog, "load_table", racing_load)
    with pytest.raises(CatalogError) as e:
        catalog.commit_append(spark, "ns", "t", df)
    assert e.value.status == 409
    assert "requirement failed" in str(e.value)


def test_yaml_iceberg_output_via_catalog(spark, tmp_path):
    from connect_spark.plans.pipeline import OUTPUT_KINDS
    from connect_spark.plans.processors_ext import register_http_transport
    from connect_spark.sinks.iceberg_meta import IcebergTable

    handler = LocalCatalogHandler(str(tmp_path / "wh"))
    register_http_transport("local_catalog", handler)
    cat = RestCatalog("http://c", handler)
    cat.create_namespace("lake")
    cat.create_table("lake", "docs", None)
    df = spark.createDataFrame([("d1",)], "doc string")
    OUTPUT_KINDS["iceberg"](df, {
        "catalog_url": "http://c", "namespace": "lake",
        "table": "docs", "transport": "local_catalog"})
    loc = cat.load_table("lake", "docs")["metadata"]["location"]
    assert [r.doc for r in IcebergTable(spark, loc).read().collect()] == [
        "d1"]


def test_conflict_rolls_back_local_snapshot(spark, catalog):
    from connect_spark.sinks.iceberg_meta import IcebergTable

    catalog.create_namespace("ns")
    catalog.create_table("ns", "r", None)
    df1 = spark.createDataFrame([(1,)], "id int")
    catalog.commit_append(spark, "ns", "r", df1)
    loc = catalog.load_table("ns", "r")["metadata"]["location"]

    # force a conflict: move the catalog's main ref behind our back
    state = catalog.load_table("ns", "r")
    real_load = catalog.load_table
    stale = dict(state)
    stale["metadata"] = dict(state["metadata"], **{
        "current-snapshot-id": -999})
    raced = []

    def stale_load(ns, name):
        if not raced:
            raced.append(True)
            return stale
        return real_load(ns, name)

    catalog.load_table = stale_load
    with pytest.raises(CatalogError):
        catalog.commit_append(
            spark, "ns", "r",
            spark.createDataFrame([(2,)], "id int"))
    catalog.load_table = real_load
    # the rejected snapshot is NOT readable locally
    assert [r.id for r in IcebergTable(spark, loc).read().collect()] == [1]
    # and a retry lands exactly once
    catalog.commit_append(
        spark, "ns", "r", spark.createDataFrame([(2,)], "id int"))
    got = sorted(r.id for r in IcebergTable(spark, loc).read().collect())
    assert got == [1, 2]


def test_rest_commit_with_bucket_transform(spark, catalog):
    """The full partition-transform grammar flows through the REST
    catalog path (commit_append delegates to IcebergTable.append)."""
    from connect_spark.functions.murmur3 import bucket_long
    from connect_spark.sinks.iceberg_meta import IcebergTable

    catalog.create_namespace("ns")
    catalog.create_table("ns", "bkt", None)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(12)], "k long, v string")
    catalog.commit_append(spark, "ns", "bkt", df,
                          partition_by=["bucket(4, k)"])
    loc = catalog.load_table("ns", "bkt")["metadata"]["location"]
    t = IcebergTable(spark, loc)
    spec = t._current_partition_spec()
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("k_bucket", "bucket[4]")]
    got = t.scan([("k", "=", 5)])
    assert [r.v for r in got.collect()] == ["v5"]
    assert t._last_scan_file_count == sum(
        1 for d in t.current_files()
        if d["partition"]["k_bucket"] == bucket_long(5, 4))
