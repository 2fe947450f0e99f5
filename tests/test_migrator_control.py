"""Migrator control plane: schema-registry sync + consumer-group
offset translation (reference internal/impl/redpanda/migrator/
migrator_schema_registry.go, migrator_groups.go — offline semantics
the reference itself tests without brokers in
migrator_groups_test.go / migrator_schema_registry_test.go)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from connect_spark.streaming.migrator_control import (
    GroupsMigratorConfig,
    MigratorError,
    RecordedRegistry,
    SchemaMigratorConfig,
    SchemaRef,
    SchemaRegistryMigrator,
    SubjectSchema,
    translate_frame_ids,
    translate_group_offsets,
)

AV = '{"type":"record","name":"%s","fields":[{"name":"a","type":"int"}]}'


def _src_registry() -> RecordedRegistry:
    src = RecordedRegistry()
    # base schema referenced by events v2
    src.add(SubjectSchema("base-value", 1, 50, AV % "Base"))
    src.add(SubjectSchema("events-value", 1, 10, AV % "EvV1"),
            compatibility="BACKWARD")
    src.add(SubjectSchema(
        "events-value", 2, 12, AV % "EvV2",
        references=(SchemaRef("Base", "base-value", 1),)))
    src.add(SubjectSchema("orders-value", 1, 11, AV % "Ord"))
    src.add(SubjectSchema("tmp-test", 1, 13, AV % "Tmp"))
    return src


def test_schema_sync_translated_ids_refs_first():
    src = _src_registry()
    dst = RecordedRegistry()
    m = SchemaRegistryMigrator(src, dst, SchemaMigratorConfig(
        translate_ids=True, exclude=(".*-test",)))
    synced = m.sync()
    # excluded subject never copied
    assert "tmp-test" not in dst.subjects()
    # references created before dependents: base-value exists and
    # events-value v2's reference resolves in the destination
    ev2 = dst.schema_by_version("events-value", 2)
    assert ev2.references[0].subject == "base-value"
    assert dst.schema_by_version("base-value", 1) is not None
    # translated ids are destination-assigned (dense from 1)
    dst_ids = sorted(s.dst_id for s in synced)
    assert dst_ids == [1, 2, 3, 4]
    # id map serves the data plane
    assert m.destination_schema_id(10) == \
        dst.schema_by_version("events-value", 1).id
    # compatibility copied per subject
    assert dst.compatibility["events-value"] == "BACKWARD"


def test_schema_sync_fixed_ids_and_conflict():
    src = _src_registry()
    dst = RecordedRegistry()
    m = SchemaRegistryMigrator(src, dst, SchemaMigratorConfig())
    m.sync()
    assert dst.schema_by_version("events-value", 2).id == 12
    # importing a DIFFERENT schema under an existing id fails with the
    # reference's translate-ids hint
    with pytest.raises(MigratorError, match="translate-ids"):
        dst.create_schema_with_id_and_version(
            "other-value", AV % "Other", 12, 1)
    # re-sync is idempotent: known subject-versions are skipped
    assert m.sync() == []


def test_schema_sync_subject_rename_and_latest_only():
    src = _src_registry()
    dst = RecordedRegistry()
    m = SchemaRegistryMigrator(src, dst, SchemaMigratorConfig(
        translate_ids=True, versions="latest",
        subject_resolver=lambda s: "mig_" + s))
    m.sync()
    subs = dst.subjects()
    assert all(s.startswith("mig_") for s in subs)
    # latest-only: events-value v1 is NOT copied unless referenced;
    # v2 lands as version 1 in the destination
    assert dst.versions("mig_events-value") == [1]
    # but its reference (base) was still pulled in by the DFS
    assert "mig_base-value" in subs


def test_schema_sync_strict_unknown_id():
    src = _src_registry()
    m = SchemaRegistryMigrator(src, RecordedRegistry(),
                               SchemaMigratorConfig(strict=True,
                                                    translate_ids=True))
    m.sync()
    with pytest.raises(MigratorError, match="not found"):
        m.destination_schema_id(999)
    # non-strict passes unknown ids through (mixed-format topics)
    m.conf.strict = False
    assert m.destination_schema_id(999) == 999


def test_schema_identical_text_shares_destination_id():
    src = RecordedRegistry()
    src.add(SubjectSchema("a-value", 1, 7, AV % "Same"))
    src.add(SubjectSchema("b-value", 1, 8, AV % "Same"))
    dst = RecordedRegistry()
    m = SchemaRegistryMigrator(src, dst,
                               SchemaMigratorConfig(translate_ids=True))
    synced = m.sync()
    # Confluent registries assign one global id per schema text
    assert synced[0].dst_id == synced[1].dst_id


def test_translate_frame_ids_spark(spark):
    src = _src_registry()
    dst = RecordedRegistry()
    m = SchemaRegistryMigrator(src, dst,
                               SchemaMigratorConfig(translate_ids=True))
    m.sync()
    id_map = m.id_map_df(spark)
    rows = [
        (1, bytes([0, 0, 0, 0, 10]) + b"payload-a"),   # known id 10
        (2, bytes([0, 0, 0, 0, 99]) + b"payload-b"),   # unknown id
        (3, b"\x01not-framed"),                         # bad magic
    ]
    df = spark.createDataFrame(rows, "i INT, rec BINARY")
    out = {r.i: bytes(r.rec) for r in
           translate_frame_ids(df, "rec", id_map).collect()}
    want_id = m.destination_schema_id(10)
    assert out[1] == bytes([0, 0, 0, 0, want_id]) + b"payload-a"
    assert out[2] == rows[1][1]  # unknown id passthrough
    assert out[3] == rows[2][1]  # unframed passthrough
    plan = translate_frame_ids(df, "rec", id_map)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _cluster_fixture(spark):
    # source log: topic t, partitions 0/1, offsets 0..9, ts = 1000+10*o
    src = spark.createDataFrame(
        [("t", p, o, 1000 + 10 * o) for p in (0, 1) for o in range(10)],
        "topic STRING, partition INT, offset LONG, ts LONG")
    # destination log: first 3 source records compacted away, offsets
    # restart at 0 -> dst offset = src offset - 3; carries the source
    # offset in a header column
    dst = spark.createDataFrame(
        [("t", p, o - 3, 1000 + 10 * o, o)
         for p in (0, 1) for o in range(3, 10)],
        "topic STRING, partition INT, offset LONG, ts LONG, src_off LONG")
    return src, dst


def test_group_offset_translation_timestamp(spark):
    src, dst = _cluster_fixture(spark)
    offsets = spark.createDataFrame(
        [("g1", "Stable", "t", 0, 7),   # in range -> ts path
         ("g1", "Stable", "t", 1, 10),  # == end -> allowed
         ("g2", "Dead", "t", 0, 5),     # Dead dropped
         ("g3", "Stable", "t", 0, 0),   # <= start dropped
         ("g4", "Stable", "t", 0, 11),  # > end dropped
         ("mig", "Stable", "t", 0, 5)],  # migrator's own group
        "group STRING, state STRING, topic STRING, partition INT,"
        " committed LONG")
    out = translate_group_offsets(
        offsets, src, dst,
        conf=GroupsMigratorConfig(skip_source_group="mig"))
    got = {(r.group, r.partition): r.dst_offset for r in out.collect()}
    # committed=7: prev record 6 has ts 1060; dst first ts>=1060 is
    # src-record 6 at dst offset 3, tie -> +1 = 4 (= 7-3)
    assert got == {("g1", 0): 4, ("g1", 1): 7}


def test_group_offset_translation_exact_header_and_no_rewind(spark):
    src, dst = _cluster_fixture(spark)
    offsets = spark.createDataFrame(
        [("e1", "Empty", "t", 0, 8),
         ("e2", "Empty", "t", 1, 6),
         ("s1", "Stable", "t", 0, 8)],
        "group STRING, state STRING, topic STRING, partition INT,"
        " committed LONG")
    cur = spark.createDataFrame(
        [("e2", "t", 1, 9)],  # destination already ahead -> skip
        "group STRING, topic STRING, partition INT, committed LONG")
    out = translate_group_offsets(
        offsets, src, dst, dst_committed=cur,
        conf=GroupsMigratorConfig(offset_header_col="src_off"))
    got = {(r.group, r.partition): r.dst_offset for r in out.collect()}
    # exact (tryFindExactOffset): dst record with src_off==committed==8
    # sits at dst offset 5 -> commit 5 directly
    assert got == {("e1", 0): 5, ("s1", 0): 5}


def test_group_offset_exact_survives_compacted_prev(spark):
    """tryFindExactOffset:805 joins header == committed (not
    committed-1): when the committed-1 record was compacted away in the
    destination but the committed record survives, the exact path still
    fires — and beats the ts path, which ties backwards here."""
    src = spark.createDataFrame(
        [("t", 0, o, 1000 + 10 * (o // 2)) for o in range(10)],
        "topic STRING, partition INT, offset LONG, ts LONG")
    # destination kept only EVEN source offsets (compaction), offsets
    # re-densified; source offset carried as a header
    dst = spark.createDataFrame(
        [("t", 0, i, 1000 + 10 * (o // 2), o)
         for i, o in enumerate(range(0, 10, 2))],
        "topic STRING, partition INT, offset LONG, ts LONG, src_off LONG")
    offsets = spark.createDataFrame(
        [("e", "Empty", "t", 0, 6)],  # committed-1=5 compacted, 6 kept
        "group STRING, state STRING, topic STRING, partition INT,"
        " committed LONG")
    out = translate_group_offsets(
        offsets, src, dst,
        conf=GroupsMigratorConfig(offset_header_col="src_off"))
    rows = out.collect()
    # exact: dst record with src_off==6 is at dst offset 3.  The ts
    # path would say: src ts at offset 5 is 1020; first dst ts >= 1020
    # is dst offset 2 (src 4), tie -> 3 — but only the header join is
    # GUARANTEED exact under compaction; assert it fired.
    assert [(r.group, r.dst_offset) for r in rows] == [("e", 3)]


def test_group_offset_exact_fully_consumed_commits_dst_end(spark):
    """tryFindExactOffset:816 — a fully-caught-up Empty group
    (committed == source end, so NO record carries that header) must
    commit the destination END offset, not rewind through the tied-ts
    path."""
    src = spark.createDataFrame(
        [("t", 0, o, 10) for o in range(5)],  # all timestamps tied
        "topic STRING, partition INT, offset LONG, ts LONG")
    dst = spark.createDataFrame(
        [("t", 0, o, 10, o) for o in range(5)],
        "topic STRING, partition INT, offset LONG, ts LONG, src_off LONG")
    offsets = spark.createDataFrame(
        [("e", "Empty", "t", 0, 5)],
        "group STRING, state STRING, topic STRING, partition INT,"
        " committed LONG")
    out = translate_group_offsets(
        offsets, src, dst,
        conf=GroupsMigratorConfig(offset_header_col="src_off"))
    # ts path alone would tie back to offset 1 (a 4-record rewind);
    # the end-offset branch must win
    assert [(r.group, r.dst_offset) for r in out.collect()] == [("e", 5)]


def test_group_offset_ts_failure_skips_exact_path(spark):
    """migrator_groups.go:438-442 — translateOffset returning
    unknownOffset (no destination record with ts >= src_ts) errors out
    BEFORE tryFindExactOffset is consulted, so a fully-consumed Empty
    group against a tail-compacted destination log is skipped — NOT
    resolved to the destination end via headers."""
    src = spark.createDataFrame(
        [("t", 0, 0, 10), ("t", 0, 1, 20), ("t", 0, 2, 30)],
        "topic STRING, partition INT, offset LONG, ts LONG")
    # destination kept only the first record: every dst ts < src_ts(=30)
    dst = spark.createDataFrame(
        [("t", 0, 0, 10, 0)],
        "topic STRING, partition INT, offset LONG, ts LONG, src_off LONG")
    offsets = spark.createDataFrame(
        [("e", "Empty", "t", 0, 3)],
        "group STRING, state STRING, topic STRING, partition INT,"
        " committed LONG")
    out = translate_group_offsets(
        offsets, src, dst,
        conf=GroupsMigratorConfig(offset_header_col="src_off"))
    assert out.collect() == []


def test_group_offset_translation_topic_rename_and_filters(spark):
    src, dst = _cluster_fixture(spark)
    dst2 = dst.withColumn("topic", F.lit("t2"))
    offsets = spark.createDataFrame(
        [("keep-a", "Empty", "t", 0, 5),
         ("keep-b", "Stable", "t", 0, 5),   # only_empty drops
         ("drop-x", "Empty", "t", 0, 5)],
        "group STRING, state STRING, topic STRING, partition INT,"
        " committed LONG")
    out = translate_group_offsets(
        offsets, src, dst2,
        conf=GroupsMigratorConfig(
            include=("keep-.*",), exclude=(".*-x",), only_empty=True,
            topic_map={"t": "t2"}))
    rows = out.collect()
    assert [r.group for r in rows] == ["keep-a"]
    assert rows[0].dst_topic == "t2" and rows[0].dst_offset == 2


# --- property-based pin vs a per-offset reference implementation -----


def _translate_reference(offsets, src, dst, conf):
    """Straightforward per-offset loop implementing
    migrator_groups.go's Sync semantics directly (the shape the Go
    code actually runs) — the oracle for the set-based Spark path."""
    import re as _re

    by_tp_src = {}
    for t, p, o, ts in src:
        by_tp_src.setdefault((t, p), {})[o] = ts
    by_tp_dst = {}
    for t, p, o, ts, hdr in dst:
        by_tp_dst.setdefault((t, p), []).append((o, ts, hdr))
    for v in by_tp_dst.values():
        v.sort()
    out = []
    for group, state, t, p, committed in offsets:
        if conf.include and not any(_re.search(x, group)
                                    for x in conf.include):
            continue
        if conf.exclude and any(_re.search(x, group)
                                for x in conf.exclude):
            continue
        if conf.skip_source_group and group == conf.skip_source_group:
            continue
        if conf.only_empty and state != "Empty":
            continue
        if not conf.only_empty and state == "Dead":
            continue
        offs = by_tp_src.get((t, p))
        if not offs:
            continue
        start, end = min(offs), max(offs) + 1
        if not (start < committed <= end):
            continue
        if committed - 1 not in offs:
            continue  # join semantics: record at committed-1 required
        src_ts = offs[committed - 1]
        dt = conf.topic_map.get(t, t)
        recs = by_tp_dst.get((dt, p), [])
        # ts translation FIRST — the exact refinement only runs when
        # translateOffset succeeded (migrator_groups.go:438-442: an
        # unknownOffset ts result errors out BEFORE tryFindExactOffset
        # is consulted, so a group whose src_ts is past every
        # destination timestamp is skipped even if headers could
        # resolve it)
        cands = [(ts, o) for o, ts, _ in recs if ts >= src_ts]
        if not cands:
            continue
        ts0, o0 = min(cands)
        o1 = o0 + 1 if ts0 == src_ts else o0
        # exact (tryFindExactOffset closed form): header == committed
        # -> that offset; committed beyond every header -> dst end;
        # compacted-away committed -> ts fallback
        exact = None
        if conf.offset_header_col and state == "Empty" and recs:
            for o, ts, hdr in recs:
                if hdr == committed:
                    exact = o
                    break
            headers = [hdr for _, _, hdr in recs if hdr is not None]
            if exact is None and headers and committed > max(headers):
                exact = max(o for o, _, _ in recs) + 1
        out.append((group, t, p, committed, dt,
                    exact if exact is not None else o1))
    return sorted(out)


def test_group_offset_translation_property(spark):
    """Randomized logs with duplicate timestamps, compaction gaps and
    out-of-range commits: the one-pass Spark translation must equal
    the per-offset reference loop on every draw."""
    import random

    rng = random.Random(42)
    for trial in range(4):
        topics = ["ta", "tb"]
        src_rows, dst_rows = [], []
        for t in topics:
            for p in range(2):
                n = rng.randint(3, 12)
                ts = 0
                for o in range(n):
                    ts += rng.choice([0, 0, 10])  # tied runs
                    src_rows.append((t, p, o, 1000 + ts))
        # destination: drop a random subset (compaction), re-densify,
        # stamp the source offset as header
        for (t, p) in {(r[0], r[1]) for r in src_rows}:
            part = sorted(r for r in src_rows if r[0] == t and r[1] == p)
            kept = [r for r in part if rng.random() > 0.3]
            for i, (tt, pp, o, ts) in enumerate(kept):
                dst_rows.append((tt, pp, i, ts, o))
        offsets = []
        gid = 0
        for t in topics:
            for p in range(2):
                n = len([r for r in src_rows
                         if r[0] == t and r[1] == p])
                for _ in range(3):
                    gid += 1
                    offsets.append(
                        (f"g{gid}",
                         rng.choice(["Stable", "Empty", "Dead"]),
                         t, p, rng.randint(0, n + 1)))
        conf = GroupsMigratorConfig(offset_header_col="src_off",
                                    hint_broadcast=False)
        want = _translate_reference(offsets, src_rows, dst_rows, conf)
        src_df = spark.createDataFrame(
            src_rows, "topic STRING, partition INT, offset LONG, ts LONG")
        dst_df = spark.createDataFrame(
            dst_rows, "topic STRING, partition INT, offset LONG,"
            " ts LONG, src_off LONG")
        off_df = spark.createDataFrame(
            offsets, "group STRING, state STRING, topic STRING,"
            " partition INT, committed LONG")
        got = sorted(
            (r.group, r.topic, r.partition, r.src_offset, r.dst_topic,
             r.dst_offset)
            for r in translate_group_offsets(
                off_df, src_df, dst_df, conf=conf).collect())
        assert got == want, f"trial {trial}: {got} != {want}"
