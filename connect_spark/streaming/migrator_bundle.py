"""Composed cluster migration — the reference flagship's full run
(internal/impl/redpanda/migrator/migrator.go; README.md:3 "topics,
schemas, and consumer groups") over the recorded-cluster model every
plane already uses individually:

  <cluster_dir>/
    records/        parquet log: topic, partition, offset, ts, value
    registry.json   schema registry dump (subjects/versions/ids/refs)
    topics.json     {topic: {partitions, rf, configs}}
    acls.json       [{topic, principal, host, operation, permission,
                      pattern}]
    groups.json     [{group, state, topic, partition, committed}]

`migrate_cluster` runs the planes in the reference's order:

  1. topics + ACLs  (migrator_topic.go SyncOnce — creation with
     partition mirroring, config subsetting, MM2 ACL rules),
  2. schemas        (migrator_schema_registry.go Sync — refs-first
     DFS, translated ids),
  3. records        (the data plane: Confluent frame ids rewritten
     through the sync's id map, source offset stamped as the
     `src_off` header, offsets re-assigned contiguously after any
     records already in the destination log),
  4. consumer groups (migrator_groups.go Sync — translated against
     the MIGRATED log: exact header refinement for Empty groups, ts
     path otherwise).

Resume semantics: the record plane skips source records whose offset
is <= the highest `src_off` already migrated for that (topic,
partition) — re-running after a partial migration appends only the
tail, no duplicates (the recorded-directory analogue of the
checkpointed streaming path in streaming/migrator.py).

Scale shape: records move through one scan + one broadcast id-map
join + one per-partition window (the offset assignment any recorded
log needs); every control-plane file is admin-API-sized and the only
driver-side state is those files — same contract as the reference's
admin clients."""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connect_spark.streaming.migrator_control import (
    GroupsMigratorConfig,
    RecordedRegistry,
    SchemaMigratorConfig,
    SchemaRef,
    SchemaRegistryMigrator,
    SubjectSchema,
    translate_frame_ids,
    translate_group_offsets,
)
from connect_spark.streaming.migrator_topic import (
    RecordedAdmin,
    RecordedTopic,
    TopicACL,
    TopicMigrator,
    TopicMigratorConfig,
)

RECORD_SCHEMA = ("topic STRING, partition INT, offset LONG, ts LONG,"
                 " value BINARY, src_off LONG")


# --- control-plane (de)serialization --------------------------------


def _load_json(path: str, default):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return default


def load_admin(cluster_dir: str) -> RecordedAdmin:
    adm = RecordedAdmin()
    topics = _load_json(os.path.join(cluster_dir, "topics.json"), {})
    for name, t in topics.items():
        adm.add_topic(name, RecordedTopic(
            partitions=t["partitions"], rf=t.get("rf", 1),
            configs=t.get("configs", {})))
    for a in _load_json(os.path.join(cluster_dir, "acls.json"), []):
        adm.acls.append(TopicACL(
            a["topic"], a["principal"], a.get("host", ""),
            a["operation"], a["permission"],
            a.get("pattern", "LITERAL")))
    return adm


def save_admin(adm: RecordedAdmin, cluster_dir: str) -> None:
    os.makedirs(cluster_dir, exist_ok=True)
    with open(os.path.join(cluster_dir, "topics.json"), "w") as f:
        json.dump({n: {"partitions": t.partitions, "rf": t.rf,
                       "configs": t.configs}
                   for n, t in sorted(adm.topics.items())}, f, indent=1)
    with open(os.path.join(cluster_dir, "acls.json"), "w") as f:
        json.dump([{"topic": a.topic, "principal": a.principal,
                    "host": a.host, "operation": a.operation,
                    "permission": a.permission, "pattern": a.pattern}
                   for a in adm.acls], f, indent=1)


def load_registry(cluster_dir: str) -> RecordedRegistry:
    reg = RecordedRegistry()
    for e in _load_json(os.path.join(cluster_dir, "registry.json"), []):
        reg.add(SubjectSchema(
            e["subject"], e["version"], e["id"], e["schema"],
            e.get("type", "AVRO"),
            tuple(SchemaRef(r["name"], r["subject"], r["version"])
                  for r in e.get("references", []))),
            compatibility=e.get("compatibility"))
    return reg


def save_registry(reg: RecordedRegistry, cluster_dir: str) -> None:
    os.makedirs(cluster_dir, exist_ok=True)
    out = []
    for s in reg.subjects(show_deleted=True):
        for v in reg.versions(s, show_deleted=True):
            ss = reg.schema_by_version(s, v, show_deleted=True)
            out.append({
                "subject": ss.subject, "version": ss.version,
                "id": ss.id, "schema": ss.schema, "type": ss.type,
                "references": [
                    {"name": r.name, "subject": r.subject,
                     "version": r.version} for r in ss.references],
                "compatibility": reg.compatibility.get(s),
            })
    with open(os.path.join(cluster_dir, "registry.json"), "w") as f:
        json.dump(out, f, indent=1)


# --- the composed run ------------------------------------------------


def migrate_cluster(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    topic_resolver: Optional[Callable[[str], str]] = None,
    translate_ids: bool = True,
    serverless: bool = False,
    sync_acls: bool = True,
    subject_resolver: Optional[Callable[[str], str]] = None,
    groups_conf: GroupsMigratorConfig | None = None,
) -> dict:
    """Run all four planes src -> dst; returns a per-plane summary."""
    summary: dict = {}

    # 1. topics + ACLs (SyncOnce before any record moves,
    #    migrator.go's ordering)
    src_adm, dst_adm = load_admin(src_dir), load_admin(dst_dir)
    tm = TopicMigrator(TopicMigratorConfig(
        name_resolver=topic_resolver, sync_acls=sync_acls,
        serverless=serverless))
    tm.sync(src_adm, dst_adm, sorted(src_adm.topics))
    save_admin(dst_adm, dst_dir)
    topic_map = {m.src.topic: m.dst.topic for m in tm.topic_mapping()}
    summary["topics"] = len(topic_map)
    summary["acls"] = len(dst_adm.acls)

    # 2. schemas
    src_reg, dst_reg = load_registry(src_dir), load_registry(dst_dir)
    sm = SchemaRegistryMigrator(src_reg, dst_reg, SchemaMigratorConfig(
        translate_ids=translate_ids, subject_resolver=subject_resolver))
    synced = sm.sync()
    save_registry(dst_reg, dst_dir)
    summary["schemas"] = len(synced)

    # 3. records: id re-framing + topic rename + contiguous append
    #    after whatever the destination log already holds; resume skips
    #    already-migrated source offsets via the src_off header
    src_records = spark.read.schema(RECORD_SCHEMA).parquet(
        os.path.join(src_dir, "records"))
    dst_records_path = os.path.join(dst_dir, "records")
    have_dst = os.path.exists(dst_records_path)
    dst_existing = (spark.read.schema(RECORD_SCHEMA)
                    .parquet(dst_records_path) if have_dst else None)

    tmap_expr = F.create_map(*[F.lit(x) for kv in topic_map.items()
                               for x in kv]) if topic_map else None
    renamed = src_records.withColumn(
        "_dst_topic",
        F.coalesce(tmap_expr[F.col("topic")], F.col("topic"))
        if tmap_expr is not None else F.col("topic"))

    if dst_existing is not None:
        state = dst_existing.groupBy(
            F.col("topic").alias("_st"), F.col("partition").alias("_sp")
        ).agg(F.max("src_off").alias("_max_src"),
              (F.max("offset") + 1).alias("_base"))
        renamed = (renamed.join(
            F.broadcast(state),
            (renamed["_dst_topic"] == F.col("_st"))
            & (renamed["partition"] == F.col("_sp")), "left")
            .filter(F.col("_max_src").isNull()
                    | (F.col("offset") > F.col("_max_src")))
            .withColumn("_base", F.coalesce(F.col("_base"), F.lit(0))))
    else:
        renamed = renamed.withColumn("_base", F.lit(0))

    w = Window.partitionBy("_dst_topic", "partition").orderBy("offset")
    migrated = renamed.select(
        F.col("_dst_topic").alias("topic"), "partition",
        (F.col("_base") + F.row_number().over(w) - 1).alias("offset"),
        "ts",
        F.col("value"),
        F.col("offset").alias("src_off"))
    migrated = translate_frame_ids(
        migrated, "value", sm.id_map_df(spark)).persist()
    try:
        migrated.write.mode("append").parquet(dst_records_path)
        # the appended increment only — an incremental resume must not
        # pay a full destination-log scan (or a pipeline recompute)
        # for a summary number
        summary["records_appended"] = migrated.count()
    finally:
        migrated.unpersist()

    # 4. consumer groups against the migrated destination log
    groups = _load_json(os.path.join(src_dir, "groups.json"), [])
    if groups:
        import dataclasses

        if groups_conf is None:
            # bundle defaults: the migrated log always carries src_off
            gconf = GroupsMigratorConfig(
                offset_header_col="src_off", topic_map=topic_map,
                hint_broadcast=False)
        else:
            # caller config is authoritative for filtering, but the
            # bundle fills what the migration itself established: the
            # topic map from the topic plane and the src_off header the
            # migrated log ALWAYS carries (a caller passing a conf only
            # for only_empty/include must not silently lose exact
            # translation)
            gconf = dataclasses.replace(
                groups_conf,
                topic_map=groups_conf.topic_map or topic_map,
                offset_header_col=(groups_conf.offset_header_col
                                   or "src_off"))
        offsets = spark.createDataFrame(
            [(g["group"], g["state"], g["topic"], g["partition"],
              g["committed"]) for g in groups],
            "group STRING, state STRING, topic STRING, partition INT,"
            " committed LONG")
        dst_full = spark.read.schema(RECORD_SCHEMA).parquet(
            dst_records_path)
        commits = translate_group_offsets(
            offsets,
            src_records.select("topic", "partition", "offset", "ts"),
            dst_full.select("topic", "partition", "offset", "ts",
                            "src_off"),
            conf=gconf).collect()  # control-plane sized: one commit
        #                            per (group, topic, partition)
        rows = sorted(
            ({"group": r.group, "topic": r.dst_topic,
              "partition": r.partition, "committed": r.dst_offset}
             for r in commits),
            key=lambda d: (d["group"], d["topic"], d["partition"]))
        with open(os.path.join(dst_dir, "groups.json"), "w") as f:
            json.dump(rows, f, indent=1)
        summary["group_commits"] = len(commits)
    return summary
