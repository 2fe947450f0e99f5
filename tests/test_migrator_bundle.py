"""Composed cluster migration (streaming/migrator_bundle.py) — the
four planes of migrator.go running together over a recorded cluster
directory, including the resume-after-partial-migration contract."""

from __future__ import annotations

import json
import os

from connect_spark.functions.schema_registry import parse_confluent_frame
from connect_spark.streaming.migrator_bundle import (
    RECORD_SCHEMA,
    load_registry,
    migrate_cluster,
)

AV = '{"type":"record","name":"%s","fields":[{"name":"a","type":"int"}]}'


def _frame(schema_id: int, payload: bytes) -> bytes:
    return bytes([0]) + schema_id.to_bytes(4, "big") + payload


def _build_source(spark, src_dir):
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, "topics.json"), "w") as f:
        json.dump({
            "orders": {"partitions": 2, "rf": 2,
                       "configs": {"cleanup.policy": "compact",
                                   "weird.key": "x"}},
            "events": {"partitions": 1, "rf": 1, "configs": {}},
        }, f)
    with open(os.path.join(src_dir, "acls.json"), "w") as f:
        json.dump([
            {"topic": "orders", "principal": "User:a", "host": "",
             "operation": "ALL", "permission": "ALLOW",
             "pattern": "LITERAL"},
            {"topic": "orders", "principal": "User:w", "host": "",
             "operation": "WRITE", "permission": "ALLOW",
             "pattern": "LITERAL"},
        ], f)
    with open(os.path.join(src_dir, "registry.json"), "w") as f:
        json.dump([
            {"subject": "orders-value", "version": 1, "id": 30,
             "schema": AV % "Ord", "type": "AVRO", "references": [],
             "compatibility": "BACKWARD"},
            {"subject": "events-value", "version": 1, "id": 31,
             "schema": AV % "Ev", "type": "AVRO", "references": [],
             "compatibility": None},
        ], f)
    # records: orders p0/p1 with framed ids, events p0 unframed
    rows = []
    for p in (0, 1):
        for o in range(6):
            rows.append(("orders", p, o, 1000 + 10 * o,
                         _frame(30, b"o%d" % o), None))
    for o in range(4):
        rows.append(("events", 0, o, 2000 + o, b"raw%d" % o, None))
    spark.createDataFrame(rows, RECORD_SCHEMA) \
        .write.mode("overwrite") \
        .parquet(os.path.join(src_dir, "records"))
    with open(os.path.join(src_dir, "groups.json"), "w") as f:
        json.dump([
            {"group": "g1", "state": "Stable", "topic": "orders",
             "partition": 0, "committed": 4},
            {"group": "g2", "state": "Empty", "topic": "orders",
             "partition": 1, "committed": 3},
            {"group": "gd", "state": "Dead", "topic": "orders",
             "partition": 0, "committed": 2},
        ], f)


def test_migrate_cluster_all_planes(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _build_source(spark, src)
    summary = migrate_cluster(
        spark, src, dst, topic_resolver=lambda t: "mig_" + t,
        subject_resolver=lambda s: "mig_" + s)
    assert summary["topics"] == 2 and summary["schemas"] == 2

    # topic plane: config subset, rf mirrored, ACL rules applied
    topics = json.load(open(os.path.join(dst, "topics.json")))
    assert topics["mig_orders"]["partitions"] == 2
    assert topics["mig_orders"]["rf"] == 2
    assert topics["mig_orders"]["configs"] == \
        {"cleanup.policy": "compact"}  # weird.key dropped
    acls = json.load(open(os.path.join(dst, "acls.json")))
    assert [(a["principal"], a["operation"]) for a in acls] == \
        [("User:a", "READ")]  # ALLOW ALL -> READ; ALLOW WRITE dropped

    # schema plane: translated ids in the destination registry
    reg = load_registry(dst)
    dst_id = reg.schema_by_version("mig_orders-value", 1).id
    assert dst_id != 30  # destination-assigned

    # record plane: frames rewritten, topics renamed, src_off stamped
    recs = spark.read.schema(RECORD_SCHEMA).parquet(
        os.path.join(dst, "records"))
    assert recs.count() == 16
    frame = parse_confluent_frame("value")
    orders = recs.filter("topic = 'mig_orders'") \
        .select("partition", "offset", "src_off",
                frame["schema_id"].alias("sid")).collect()
    assert all(r.sid == dst_id for r in orders)
    assert all(r.offset == r.src_off for r in orders)  # empty dst
    raw = recs.filter("topic = 'mig_events'").select("value").collect()
    assert {bytes(r.value)[:3] for r in raw} == {b"raw"}  # untouched

    # group plane: Dead dropped; empty-dst migration preserves offsets
    groups = json.load(open(os.path.join(dst, "groups.json")))
    assert groups == [
        {"group": "g1", "topic": "mig_orders", "partition": 0,
         "committed": 4},
        {"group": "g2", "topic": "mig_orders", "partition": 1,
         "committed": 3},
    ]


def test_migrate_cluster_resume_appends_only_tail(spark, tmp_path):
    """Re-running after a partial migration: only source offsets above
    the highest migrated src_off append; offsets stay contiguous."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _build_source(spark, src)
    migrate_cluster(spark, src, dst,
                    topic_resolver=lambda t: "mig_" + t)
    n1 = spark.read.parquet(os.path.join(dst, "records")).count()

    # grow the source log: two new records on orders p0
    extra = [("orders", 0, 6, 1070, _frame(30, b"o6"), None),
             ("orders", 0, 7, 1080, _frame(30, b"o7"), None)]
    spark.createDataFrame(extra, RECORD_SCHEMA).write.mode("append") \
        .parquet(os.path.join(src, "records"))

    migrate_cluster(spark, src, dst,
                    topic_resolver=lambda t: "mig_" + t)
    recs = spark.read.schema(RECORD_SCHEMA).parquet(
        os.path.join(dst, "records"))
    assert recs.count() == n1 + 2  # ONLY the tail appended
    p0 = sorted((r.offset, r.src_off) for r in recs.filter(
        "topic = 'mig_orders' AND partition = 0").collect())
    assert p0 == [(o, o) for o in range(8)]  # contiguous, no dupes
