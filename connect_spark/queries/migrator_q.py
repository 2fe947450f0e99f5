"""Migrator control-plane semantics as oracle-checked queries
(reference internal/impl/redpanda/migrator/ — the flagship migrator's
schema and consumer-group planes; README.md:3 "topics, schemas, and
consumer groups").

- `migrator_schema_sync` — a recorded source registry derived from
  `nation` (one subject per nation, two versions, v2 referencing a
  shared base schema, an excluded test subject) synced with
  translate_ids + subject rename into an empty destination. The output
  is the full id-translation chain. Destination ids are
  creation-ordered, so the oracle reproduces them with a rank over
  subject sort order (references-first DFS pins the base schema to
  id 1).
- `migrator_id_translate` — the data plane of translate_ids: every
  `events` record framed with its source schema id (Confluent magic0 +
  BE32), header rewritten via a broadcast join against the sync's id
  map; unknown ids (event_id % 7 == 0 -> 999) pass through, per the
  non-strict contract (migrator_schema_registry.go:1156).
- `migrator_group_offsets` — timestamp-based offset translation
  (migrator_groups.go:741) for recorded source/destination logs derived
  from `events`: the destination is missing each partition's first five
  records (offsets restart at 0), timestamps TIE in pairs so the
  timestamp path is genuinely approximate (rewinds one record when a
  committed boundary splits a tie — the reference's monotonic-ts
  caveat), and the Empty group refines to the EXACT offset via the
  source-offset header (tryFindExactOffset:805). Dead groups, excluded
  groups and out-of-range commits are dropped (ListGroupOffsets,
  Sync:489-499).

Scale notes: sync output is control-plane-sized (registry entries,
constant in SF). The data-plane queries scan `events` once each; the
id map and the offset list broadcast; `translate_group_offsets`
aggregates min() map-side — no per-offset fetch loop, no global sort
(the fixture's row_number window partitions by (topic, partition), the
same keyed shuffle any offset-assignment recording has).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec

_AVRO = ('{"type":"record","name":"%s",'
         '"fields":[{"name":"a","type":"int"}]}')


def _synced_migrator(spark: SparkSession, sf_dir: str):
    """Build the recorded source registry from `nation` and run a full
    translated-id sync. nation is a constant 25-row dimension at every
    SF — collecting it is the control-plane analogue of broadcasting a
    dim table (the registry itself IS driver-side state, like the
    iceberg catalog client)."""
    from connect_spark.streaming.migrator_control import (
        RecordedRegistry,
        SchemaMigratorConfig,
        SchemaRef,
        SchemaRegistryMigrator,
        SubjectSchema,
    )

    nations = sorted(
        (int(r.n_nationkey), str(r.n_name))
        for r in load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name").collect())

    src = RecordedRegistry()
    src.add(SubjectSchema("aaa-base-value", 1, 990, _AVRO % "Base"))
    for k, name in nations:
        subj = f"evt-{name}-value"
        compat = "BACKWARD" if k % 2 == 0 else None
        src.add(SubjectSchema(subj, 1, 100 + 2 * k, _AVRO % f"Ev{k}V1"),
                compatibility=compat)
        src.add(SubjectSchema(
            subj, 2, 101 + 2 * k, _AVRO % f"Ev{k}V2",
            references=(SchemaRef("Base", "aaa-base-value", 1),)))
    src.add(SubjectSchema("zzz-test-value", 1, 980, _AVRO % "Tmp"))

    m = SchemaRegistryMigrator(
        src, RecordedRegistry(),
        SchemaMigratorConfig(translate_ids=True, exclude=(".*-test.*",),
                             subject_resolver=lambda s: "mig_" + s))
    m.sync()
    return m


def migrator_schema_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _synced_migrator(spark, sf_dir)
    rows = [
        (s.src_subject, s.src_version, s.src_id, s.dst_subject,
         s.dst_version, s.dst_id, s.compatibility)
        for s in m.known_schemas.values()
    ]
    return spark.createDataFrame(
        rows,
        "src_subject STRING, src_version INT, src_id INT,"
        " dst_subject STRING, dst_version INT, dst_id INT,"
        " compat STRING")


MIGRATOR_SCHEMA_SYNC_SQL = """
WITH r AS (
    SELECT n_nationkey AS k, n_name AS name,
           ROW_NUMBER() OVER (ORDER BY n_name) - 1 AS rnk
    FROM nation
)
SELECT 'aaa-base-value' AS src_subject, 1 AS src_version,
       990 AS src_id, 'mig_aaa-base-value' AS dst_subject,
       1 AS dst_version, 1 AS dst_id, CAST(NULL AS VARCHAR) AS compat
UNION ALL
SELECT 'evt-' || name || '-value' AS src_subject,
       v.v AS src_version,
       CAST(100 + 2 * k + (v.v - 1) AS INT) AS src_id,
       'mig_evt-' || name || '-value' AS dst_subject,
       v.v AS dst_version,
       CAST(2 * rnk + 1 + v.v AS INT) AS dst_id,
       CASE WHEN k % 2 = 0 THEN 'BACKWARD' END AS compat
FROM r CROSS JOIN (VALUES (1), (2)) AS v(v)
"""


def migrator_id_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from connect_spark.functions.schema_registry import (
        parse_confluent_frame,
    )
    from connect_spark.streaming.migrator_control import (
        encode_confluent_frame_col,
        translate_frame_ids,
    )

    m = _synced_migrator(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type")
    src_id = F.when(F.col("event_id") % 7 == 0, F.lit(999)).otherwise(
        (F.lit(100) + 2 * (F.col("event_id") % 25)).cast("int"))
    framed = ev.select(
        "event_id",
        src_id.alias("src_id"),
        encode_confluent_frame_col(
            F.col("event_type").cast("binary"), src_id).alias("rec"))
    out = translate_frame_ids(framed, "rec", m.id_map_df(spark))
    frame = parse_confluent_frame("rec")
    return out.select(
        "event_id", "src_id",
        frame["schema_id"].alias("dst_id"),
        frame["payload"].cast("string").alias("payload"))


MIGRATOR_ID_TRANSLATE_SQL = """
WITH r AS (
    SELECT n_nationkey AS k,
           ROW_NUMBER() OVER (ORDER BY n_name) - 1 AS rnk
    FROM nation
)
SELECT e.event_id,
       CASE WHEN e.event_id % 7 = 0 THEN 999
            ELSE CAST(100 + 2 * (e.event_id % 25) AS INT)
       END AS src_id,
       CASE WHEN e.event_id % 7 = 0 THEN 999
            ELSE CAST(2 * r.rnk + 2 AS INT)
       END AS dst_id,
       e.event_type AS payload
FROM events e JOIN r ON r.k = e.event_id % 25
"""


def migrator_group_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from connect_spark.streaming.migrator_control import (
        GroupsMigratorConfig,
        translate_group_offsets,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id")
    w = Window.partitionBy("event_type", (F.col("user_id") % 4)) \
        .orderBy("event_id")
    src = ev.select(
        F.col("event_type").alias("topic"),
        (F.col("user_id") % 4).cast("int").alias("partition"),
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
    ).withColumn(
        "ts", (F.lit(1000) + 10 * F.floor(F.col("offset") / 2))
        .cast("long"))
    # destination log: first five records per partition compacted away,
    # offsets restart at zero; source offset stamped as a header
    dst = src.filter(F.col("offset") >= 5).select(
        "topic", "partition",
        (F.col("offset") - 5).alias("offset"), "ts",
        F.col("offset").alias("src_off"))
    counts = src.groupBy("topic", "partition").agg(
        F.count("*").alias("n"))
    offsets = counts.select(
        "topic", "partition",
        F.explode(F.array(
            F.struct(F.lit("g-stable").alias("group"),
                     F.lit("Stable").alias("state"),
                     F.greatest(F.lit(7),
                                F.floor((2 * F.col("n")) / 3))
                     .cast("long").alias("committed")),
            F.struct(F.lit("g-empty").alias("group"),
                     F.lit("Empty").alias("state"),
                     F.greatest(F.lit(7), F.floor(F.col("n") / 2))
                     .cast("long").alias("committed")),
            F.struct(F.lit("g-dead").alias("group"),
                     F.lit("Dead").alias("state"),
                     F.floor(F.col("n") / 2).cast("long")
                     .alias("committed")),
            F.struct(F.lit("skip-grp").alias("group"),
                     F.lit("Stable").alias("state"),
                     F.floor(F.col("n") / 2).cast("long")
                     .alias("committed")),
            F.struct(F.lit("g-over").alias("group"),
                     F.lit("Stable").alias("state"),
                     (F.col("n") + 1).cast("long").alias("committed")),
        )).alias("g"),
    ).select("g.group", "g.state", "topic", "partition", "g.committed")
    out = translate_group_offsets(
        offsets, src, dst,
        conf=GroupsMigratorConfig(exclude=("skip-.*",),
                                  offset_header_col="src_off",
                                  # fixture sides derive from the
                                  # events scan: AQE owns the
                                  # broadcast decision at runtime
                                  hint_broadcast=False))
    return out.select("group", "topic", "partition", "src_offset",
                      "dst_topic", "dst_offset")


MIGRATOR_GROUP_OFFSETS_SQL = """
WITH src AS (
    SELECT event_type AS topic,
           CAST(user_id % 4 AS INT) AS partition,
           ROW_NUMBER() OVER (
               PARTITION BY event_type, user_id % 4
               ORDER BY event_id) - 1 AS off,
           1000 + 10 * ((ROW_NUMBER() OVER (
               PARTITION BY event_type, user_id % 4
               ORDER BY event_id) - 1) // 2) AS ts
    FROM events
),
dst AS (
    SELECT topic, partition, off - 5 AS off, ts, off AS src_off
    FROM src WHERE off >= 5
),
counts AS (
    SELECT topic, partition, COUNT(*) AS n FROM src
    GROUP BY topic, partition
),
offs AS (
    SELECT g.grp AS grp, g.state AS state, topic, partition,
           CASE g.grp
               WHEN 'g-stable' THEN GREATEST(7, 2 * n // 3)
               WHEN 'g-empty' THEN GREATEST(7, n // 2)
               WHEN 'g-dead' THEN n // 2
               WHEN 'skip-grp' THEN n // 2
               ELSE n + 1
           END AS committed
    FROM counts CROSS JOIN (VALUES
        ('g-stable', 'Stable'), ('g-empty', 'Empty'),
        ('g-dead', 'Dead'), ('skip-grp', 'Stable'),
        ('g-over', 'Stable')) AS g(grp, state)
),
kept AS (
    SELECT o.* FROM offs o
    JOIN (SELECT topic, partition, MIN(off) AS s, MAX(off) + 1 AS e
          FROM src GROUP BY topic, partition) b
      ON b.topic = o.topic AND b.partition = o.partition
     AND o.committed > b.s AND o.committed <= b.e
    WHERE o.state <> 'Dead' AND NOT regexp_matches(o.grp, 'skip-.*')
),
with_ts AS (
    SELECT k.*, s.ts AS src_ts FROM kept k
    JOIN src s ON s.topic = k.topic AND s.partition = k.partition
              AND s.off = k.committed - 1
),
tsed AS (
    SELECT t.grp, t.state, t.topic, t.partition, t.committed,
           t.src_ts,
           MIN({'ts': d.ts, 'off': d.off}) AS first_pair
    FROM with_ts t
    JOIN dst d ON d.topic = t.topic AND d.partition = t.partition
              AND d.ts >= t.src_ts
    GROUP BY ALL
),
approx AS (
    SELECT grp, state, topic, partition, committed,
           CASE WHEN first_pair.ts = src_ts
                THEN first_pair.off + 1 ELSE first_pair.off
           END AS ts_off
    FROM tsed
)
SELECT a.grp AS "group", a.topic, a.partition,
       a.committed AS src_offset, a.topic AS dst_topic,
       CASE WHEN a.state = 'Empty' AND h.off IS NOT NULL THEN h.off
            WHEN a.state = 'Empty' AND a.committed > e.hmax THEN e.eo
            ELSE a.ts_off
       END AS dst_offset
FROM approx a
LEFT JOIN dst h ON h.topic = a.topic AND h.partition = a.partition
               AND h.src_off = a.committed AND a.state = 'Empty'
LEFT JOIN (SELECT topic, partition, MAX(src_off) AS hmax,
                  MAX(off) + 1 AS eo
           FROM dst GROUP BY topic, partition) e
       ON e.topic = a.topic AND e.partition = a.partition
"""


def migrator_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three migrator planes composed — the reference flagship's
    actual run shape (internal/impl/redpanda/migrator/migrator.go;
    README.md:3 "topics, schemas, and consumer groups"):

      1. schema plane: `_synced_migrator` syncs the recorded registry
         with translated ids (migrator_schema_registry.go Sync),
      2. record plane: every source record's Confluent frame is
         rewritten to the destination id via the sync's id map
         (translate_frame_ids; unknown ids pass through non-strict,
         migrator_schema_registry.go:1156) and appended to a
         destination topic `mig_<topic>` that already holds 3
         unframed records per partition — so migrated offsets shift
         by +3, exactly the offset drift Sync() must absorb,
      3. group plane: committed offsets translate against the
         MIGRATED log (translate_group_offsets; ts path for the
         Stable group, exact source-offset-header refinement for the
         Empty group, tryFindExactOffset:805).

    The output joins each translated commit to the destination record
    AT that offset and exposes its re-framed schema id + payload — an
    id-map bug, an offset-translation bug, or a frame-rewrite bug each
    breaks the oracle match.

    Scale shape: records are scanned once per plane (Column algebra +
    one broadcast id-map join); the offsets side is control-plane
    sized; the only collects are the 25-row nation registry fixture
    and the ~5-entry topic-rename map (admin-API-sized, the same
    contract as the reference's nameConverter config)."""
    from connect_spark.functions.schema_registry import (
        parse_confluent_frame,
    )
    from connect_spark.streaming.migrator_control import (
        GroupsMigratorConfig,
        encode_confluent_frame_col,
        translate_frame_ids,
        translate_group_offsets,
    )

    m = _synced_migrator(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id")
    w = Window.partitionBy("event_type", (F.col("user_id") % 4)) \
        .orderBy("event_id")
    src_id = F.when(F.col("event_id") % 7 == 0, F.lit(999)).otherwise(
        (F.lit(100) + 2 * (F.col("event_id") % 25)).cast("int"))
    src = ev.select(
        F.col("event_type").alias("topic"),
        (F.col("user_id") % 4).cast("int").alias("partition"),
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        encode_confluent_frame_col(
            F.col("event_type").cast("binary"), src_id).alias("rec"),
    ).withColumn("ts", (F.lit(1000) + F.col("offset")).cast("long"))

    # record plane: re-frame ids, land at mig_<topic> offset+3 (three
    # pre-existing unframed records per destination partition)
    migrated = translate_frame_ids(src, "rec", m.id_map_df(spark)).select(
        F.concat(F.lit("mig_"), F.col("topic")).alias("topic"),
        "partition", (F.col("offset") + 3).alias("offset"), "ts",
        F.col("offset").alias("src_off"), "rec")
    pre = (src.groupBy("topic", "partition").agg(F.count("*").alias("n"))
           .select(F.concat(F.lit("mig_"), F.col("topic")).alias("topic"),
                   "partition",
                   F.explode(F.sequence(F.lit(0), F.lit(2))).alias("offset"))
           .select("topic", "partition", F.col("offset").cast("long"),
                   F.col("offset").cast("long").alias("ts"),
                   F.lit(None).cast("long").alias("src_off"),
                   F.lit(b"raw").alias("rec")))
    dst = pre.unionByName(migrated)

    # group plane against the migrated log
    counts = src.groupBy("topic", "partition").agg(F.count("*").alias("n"))
    offsets = counts.select(
        "topic", "partition",
        F.explode(F.array(
            F.struct(F.lit("g-stable").alias("group"),
                     F.lit("Stable").alias("state"),
                     F.floor((2 * F.col("n")) / 3).cast("long")
                     .alias("committed")),
            F.struct(F.lit("g-empty").alias("group"),
                     F.lit("Empty").alias("state"),
                     F.floor(F.col("n") / 2).cast("long")
                     .alias("committed")),
        )).alias("g"),
    ).select("g.group", "g.state", "topic", "partition", "g.committed")
    topic_map = {t: "mig_" + t for t in sorted(
        r.topic for r in src.select("topic").distinct().collect())}
    commits = translate_group_offsets(
        offsets, src.select("topic", "partition", "offset", "ts"),
        dst.select("topic", "partition", "offset", "ts", "src_off"),
        conf=GroupsMigratorConfig(topic_map=topic_map,
                                  offset_header_col="src_off",
                                  hint_broadcast=False))

    # integration check: the destination record AT the translated
    # offset, with its re-framed schema id
    recs = dst.select(
        F.col("topic").alias("_rt"), F.col("partition").alias("_rp"),
        F.col("offset").alias("_ro"), "rec")
    frame = parse_confluent_frame("rec")
    return (commits.join(
        recs,
        (F.col("dst_topic") == F.col("_rt"))
        & (F.col("partition") == F.col("_rp"))
        & (F.col("dst_offset") == F.col("_ro")))
        .select("group", "topic", "partition", "src_offset", "dst_topic",
                "dst_offset",
                frame["schema_id"].alias("dst_schema_id"),
                frame["payload"].cast("string").alias("payload")))


MIGRATOR_END_TO_END_SQL = """
WITH r AS (
    SELECT n_nationkey AS k,
           ROW_NUMBER() OVER (ORDER BY n_name) - 1 AS rnk
    FROM nation
),
src AS (
    SELECT event_id, event_type AS topic,
           CAST(user_id % 4 AS INT) AS partition,
           ROW_NUMBER() OVER (
               PARTITION BY event_type, user_id % 4
               ORDER BY event_id) - 1 AS off
    FROM events
),
counts AS (
    SELECT topic, partition, COUNT(*) AS n FROM src
    GROUP BY topic, partition
),
offs AS (
    SELECT 'g-stable' AS grp, topic, partition,
           2 * n // 3 AS committed FROM counts
    UNION ALL
    SELECT 'g-empty', topic, partition, n // 2 FROM counts
),
-- both the Stable ts path (monotonic ts, tie at committed-1 -> +1)
-- and the Empty exact-header path land on the record that was at the
-- source committed offset, shifted by the 3 pre-existing records
sel AS (
    -- committed must lie in (start, end]: a single-record partition
    -- yields committed = 0 on both synthetic groups, which the
    -- bounds filter drops on the Spark side
    SELECT o.grp, o.topic, o.partition, o.committed, s.event_id
    FROM offs o
    JOIN src s ON s.topic = o.topic AND s.partition = o.partition
              AND s.off = o.committed
    WHERE o.committed > 0
)
SELECT sel.grp AS "group", sel.topic, sel.partition,
       sel.committed AS src_offset,
       'mig_' || sel.topic AS dst_topic,
       sel.committed + 3 AS dst_offset,
       CASE WHEN sel.event_id % 7 = 0 THEN 999
            ELSE CAST(2 * r.rnk + 2 AS INT)
       END AS dst_schema_id,
       sel.topic AS payload
FROM sel JOIN r ON r.k = sel.event_id % 25
"""


def migrator_topic_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-plane sync (migrator_topic.go createTopicLocked:273-360 +
    SyncACLs:466-518) over a recorded source cluster derived from
    `nation`: one topic per nation with partitions/rf/configs keyed on
    the nation key (including an unsupported config key that must NOT
    be copied), five source ACLs per topic exercising every MM2 rule
    (ALLOW WRITE dropped, ALLOW ALL -> READ, DENY kept, PREFIXED not
    described), and two pre-existing destination topics pinning the
    already-exists branch — one needing an UPWARD partition increase,
    one whose larger count must be left alone but recorded in the
    mapping. Output: one row per (topic, replicated ACL) with the
    mapping's destination partition count, the destination rf, and the
    number of configs actually applied. Control-plane sized end to end
    (25 topics × 3 ACLs); the cluster-scale ACL path is
    `migrator_acl_translate`."""
    from connect_spark.streaming.migrator_topic import (
        RecordedAdmin,
        RecordedTopic,
        TopicACL,
        TopicMigrator,
        TopicMigratorConfig,
    )

    nations = sorted(
        (int(r.n_nationkey), str(r.n_name))
        for r in load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name").collect())

    src, dst = RecordedAdmin(), RecordedAdmin()
    for k, name in nations:
        t = f"top-{name}"
        src.add_topic(t, RecordedTopic(
            partitions=k % 4 + 1, rf=k % 3 + 1,
            configs={"cleanup.policy": "compact" if k % 2 else "delete",
                     "retention.ms": str(1000 * (k + 1)),
                     "segment.bytes": "4096",
                     "unsupported.key": "x"}))
        src.acls += [
            TopicACL(t, "User:alice", "*", "READ", "ALLOW"),
            TopicACL(t, "User:bob", "", "WRITE", "ALLOW"),
            TopicACL(t, "User:carol", "", "ALL", "ALLOW"),
            TopicACL(t, "User:dave", "10.0.0.1", "ALL", "DENY"),
            TopicACL(t, "User:eve", "", "READ", "ALLOW", "PREFIXED"),
        ]
    for k, name in nations[:2]:
        # k=0: src 1 partition < pre-existing 2 -> mapping records 2;
        # k=1: src 2 > pre-existing 1 -> increased to 2
        dst.add_topic(f"mig_top-{name}", RecordedTopic(
            partitions=2 - k, rf=1,
            configs={"cleanup.policy": "preexist"}))

    m = TopicMigrator(TopicMigratorConfig(
        name_resolver=lambda t: "mig_" + t))
    m.sync(src, dst, [f"top-{name}" for _, name in nations])

    acls_by_topic: dict = {}
    for a in dst.acls:
        acls_by_topic.setdefault(a.topic, []).append(a)
    rows = []
    for mp in m.topic_mapping():
        d = dst.topic_details(mp.dst.topic)
        for a in acls_by_topic[mp.dst.topic]:
            rows.append((mp.src.topic, mp.dst.topic, mp.dst.partitions,
                         d.rf, len(d.configs), a.principal, a.operation,
                         a.permission))
    return spark.createDataFrame(
        rows,
        "src_topic STRING, dst_topic STRING, dst_partitions INT,"
        " dst_rf INT, n_configs INT, principal STRING, operation STRING,"
        " permission STRING")


MIGRATOR_TOPIC_SYNC_SQL = """
WITH t AS (SELECT n_nationkey AS k, n_name AS name FROM nation)
SELECT 'top-' || name AS src_topic, 'mig_top-' || name AS dst_topic,
       CAST(CASE WHEN k <= 1 THEN 2 ELSE k % 4 + 1 END AS INT)
           AS dst_partitions,
       CAST(CASE WHEN k <= 1 THEN 1 ELSE k % 3 + 1 END AS INT)
           AS dst_rf,
       CAST(CASE WHEN k <= 1 THEN 1 ELSE 3 END AS INT) AS n_configs,
       a.principal, a.operation, a.permission
FROM t CROSS JOIN (VALUES
    ('User:alice', 'READ', 'ALLOW'),
    ('User:carol', 'READ', 'ALLOW'),
    ('User:dave', 'ALL', 'DENY')) AS a(principal, operation, permission)
"""


def migrator_acl_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACL sync rules (shouldReplicateACL:524 /
    transformACLForTarget:531 / LITERAL-only describe:539) as ONE
    Column-algebra scan over a cluster-scale ACL table derived from
    `events` (10k ACLs at sf0.01): LITERAL filter, ALLOW WRITE
    dropped, ALLOW ALL downgraded to READ, topic renamed through the
    broadcast topic map. The set-based form of the per-topic loop the
    reference runs — at a million ACLs this is still one scan + one
    broadcast join."""
    from connect_spark.streaming.migrator_topic import translate_acls

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id")
    acls = ev.select(
        F.col("event_type").alias("topic"),
        F.concat(F.lit("User:u"),
                 (F.col("user_id") % 50).cast("string")).alias("principal"),
        F.col("event_id").cast("string").alias("host"),
        F.element_at(
            F.array(F.lit("READ"), F.lit("WRITE"), F.lit("ALL"),
                    F.lit("DESCRIBE"), F.lit("CREATE")),
            (F.col("event_id") % 5 + 1).cast("int")).alias("operation"),
        F.when(F.col("event_id") % 3 == 0, F.lit("DENY"))
        .otherwise(F.lit("ALLOW")).alias("permission"),
        F.when(F.col("event_id") % 11 == 0, F.lit("PREFIXED"))
        .otherwise(F.lit("LITERAL")).alias("pattern"))
    tmap = spark.createDataFrame(
        [(t, "mig_" + t) for t in sorted(
            r.topic for r in acls.select("topic").distinct().collect())],
        "src_topic STRING, dst_topic STRING")
    return translate_acls(acls, tmap)


MIGRATOR_ACL_TRANSLATE_SQL = """
SELECT 'mig_' || event_type AS topic,
       'User:u' || CAST(user_id % 50 AS VARCHAR) AS principal,
       CAST(event_id AS VARCHAR) AS host,
       CASE WHEN event_id % 5 = 2 AND event_id % 3 <> 0 THEN 'READ'
            ELSE CASE event_id % 5
                     WHEN 0 THEN 'READ' WHEN 1 THEN 'WRITE'
                     WHEN 2 THEN 'ALL' WHEN 3 THEN 'DESCRIBE'
                     ELSE 'CREATE' END
       END AS operation,
       CASE WHEN event_id % 3 = 0 THEN 'DENY' ELSE 'ALLOW'
       END AS permission,
       'LITERAL' AS pattern
FROM events
WHERE event_id % 11 <> 0
  AND NOT (event_id % 5 = 1 AND event_id % 3 <> 0)
"""


_BUNDLE_SPLIT = 5  # pass-1 migrates source offsets < 5; pass 2 the tail


def migrator_bundle_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed RUN itself — `migrate_cluster`
    (streaming/migrator_bundle.py), the recorded-cluster analogue of
    the reference flagship's run loop (internal/impl/redpanda/migrator/
    migrator.go; README.md:3 "topics, schemas, and consumer groups") —
    driver-gated END TO END including the resume contract:

      1. a recorded source cluster is built from `events` (records:
         topic=event_type, partition=user_id%4, Confluent-framed
         values whose schema ids come from the nation-derived registry
         fixture; unknown id 999 for event_id%7==0) plus topics.json /
         acls.json / registry.json / groups.json,
      2. the destination log is PRE-POPULATED with 3 unframed records
         per partition, so migrated offsets must shift by +3,
      3. `migrate_cluster` runs TWICE: first over a partial source log
         (offsets < 5), then — after the source grows to the full
         log — again.  The second run's src_off tail-skip must append
         ONLY the tail (duplicates would break n_records/max_offset;
         a re-based offset would break contiguity),
      4. the output folds in the group plane's final commits from the
         destination groups.json: the Stable group travels the ts
         path (monotonic unique ts -> committed+3 exactly), the Empty
         group the exact src_off-header refinement
         (tryFindExactOffset:805) -> also committed+3, which the
         oracle reproduces in closed form.

    Output per destination (topic, partition): record count,
    max offset, tail-appended count, an id checksum over the
    re-framed schema ids (sum dst_id*(src_off+1) — any frame-rewrite
    or resume bug shifts it), and both groups' committed offsets.

    Scale shape: records move through migrate_cluster's one scan +
    broadcast id-map join + per-partition offset window per pass; the
    only collects are control-plane sized (per-partition counts for
    groups.json ~ topics*4 rows, the 25-row nation registry fixture,
    the destination groups.json)."""
    import json as _json
    import os
    import tempfile

    from connect_spark.functions.schema_registry import (
        parse_confluent_frame,
    )
    from connect_spark.streaming.migrator_bundle import (
        RECORD_SCHEMA,
        migrate_cluster,
        save_registry,
    )
    from connect_spark.streaming.migrator_control import (
        RecordedRegistry,
        SchemaRef,
        SubjectSchema,
        encode_confluent_frame_col,
    )

    base = tempfile.mkdtemp(prefix="mig_bundle_")
    src_dir = os.path.join(base, "src")
    dst_dir = os.path.join(base, "dst")
    os.makedirs(src_dir)
    os.makedirs(dst_dir)

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id")
    w = Window.partitionBy("event_type", (F.col("user_id") % 4)) \
        .orderBy("event_id")
    src_id = F.when(F.col("event_id") % 7 == 0, F.lit(999)).otherwise(
        (F.lit(100) + 2 * (F.col("event_id") % 25)).cast("int"))
    src = (ev.select(
        F.col("event_type").alias("topic"),
        (F.col("user_id") % 4).cast("int").alias("partition"),
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        encode_confluent_frame_col(
            F.col("event_type").cast("binary"), src_id).alias("value"))
        .withColumn("ts", (F.lit(1000) + F.col("offset")).cast("long"))
        .withColumn("src_off", F.lit(None).cast("long"))
        .select("topic", "partition", "offset", "ts", "value", "src_off"))

    counts = {(r.topic, int(r.partition)): int(r.n) for r in
              src.groupBy("topic", "partition")
              .agg(F.count("*").alias("n")).collect()}
    topics = sorted({t for t, _ in counts})

    with open(os.path.join(src_dir, "topics.json"), "w") as f:
        _json.dump({t: {"partitions": 4, "rf": 3,
                        "configs": {"cleanup.policy": "compact",
                                    "unsupported.key": "x"}}
                    for t in topics}, f)
    with open(os.path.join(src_dir, "acls.json"), "w") as f:
        _json.dump([{"topic": t, "principal": "User:svc", "host": "",
                     "operation": "ALL", "permission": "ALLOW",
                     "pattern": "LITERAL"} for t in topics], f)
    nations = sorted(
        (int(r.n_nationkey), str(r.n_name))
        for r in load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name").collect())
    reg = RecordedRegistry()
    reg.add(SubjectSchema("aaa-base-value", 1, 990, _AVRO % "Base"))
    for k, name in nations:
        subj = f"evt-{name}-value"
        reg.add(SubjectSchema(subj, 1, 100 + 2 * k, _AVRO % f"Ev{k}V1"))
        reg.add(SubjectSchema(
            subj, 2, 101 + 2 * k, _AVRO % f"Ev{k}V2",
            references=(SchemaRef("Base", "aaa-base-value", 1),)))
    save_registry(reg, src_dir)
    groups = []
    for (t, p), n in sorted(counts.items()):
        groups.append({"group": "g-stable", "state": "Stable",
                       "topic": t, "partition": p,
                       "committed": 2 * n // 3})
        groups.append({"group": "g-empty", "state": "Empty",
                       "topic": t, "partition": p, "committed": n // 2})
    with open(os.path.join(src_dir, "groups.json"), "w") as f:
        _json.dump(groups, f)

    # destination pre-populated: 3 unframed records per partition
    spark.createDataFrame(
        [("mig_" + t, p, o, o, b"raw", None)
         for (t, p) in sorted(counts) for o in range(3)],
        RECORD_SCHEMA).write.mode("overwrite").parquet(
            os.path.join(dst_dir, "records"))

    rec_path = os.path.join(src_dir, "records")
    src.filter(F.col("offset") < _BUNDLE_SPLIT) \
        .write.mode("overwrite").parquet(rec_path)
    migrate_cluster(spark, src_dir, dst_dir,
                    topic_resolver=lambda t: "mig_" + t,
                    subject_resolver=lambda s: "mig_" + s)
    src.filter(F.col("offset") >= _BUNDLE_SPLIT) \
        .write.mode("append").parquet(rec_path)
    migrate_cluster(spark, src_dir, dst_dir,
                    topic_resolver=lambda t: "mig_" + t,
                    subject_resolver=lambda s: "mig_" + s)

    recs = spark.read.schema(RECORD_SCHEMA).parquet(
        os.path.join(dst_dir, "records"))
    frame = parse_confluent_frame("value")
    agg = (recs.groupBy("topic", "partition")
           .agg(F.count("*").alias("n_records"),
                F.max("offset").alias("max_offset"),
                F.sum(F.when(F.col("src_off") >= _BUNDLE_SPLIT, 1)
                      .otherwise(0)).cast("long").alias("n_tail"),
                F.sum(F.when(
                    F.col("src_off").isNotNull(),
                    frame["schema_id"].cast("long")
                    * (F.col("src_off") + 1)).otherwise(0))
                .alias("id_checksum")))
    with open(os.path.join(dst_dir, "groups.json")) as fh:
        gj = _json.load(fh)
    commits = spark.createDataFrame(
        [(g["group"], g["topic"], int(g["partition"]),
          int(g["committed"])) for g in gj],
        "group STRING, topic STRING, partition INT, committed LONG")
    piv = (commits.groupBy("topic", "partition")
           .agg(F.max(F.when(F.col("group") == "g-stable",
                             F.col("committed")))
                .alias("stable_committed"),
                F.max(F.when(F.col("group") == "g-empty",
                             F.col("committed")))
                .alias("empty_committed")))
    return agg.join(piv, ["topic", "partition"], "left")


MIGRATOR_BUNDLE_RUN_SQL = f"""
WITH r AS (
    SELECT n_nationkey AS k,
           ROW_NUMBER() OVER (ORDER BY n_name) - 1 AS rnk
    FROM nation
),
src AS (
    SELECT event_id, event_type AS topic,
           CAST(user_id % 4 AS INT) AS partition,
           ROW_NUMBER() OVER (
               PARTITION BY event_type, user_id % 4
               ORDER BY event_id) - 1 AS off
    FROM events
),
ids AS (
    SELECT s.topic, s.partition, s.off,
           CASE WHEN s.event_id % 7 = 0 THEN 999
                ELSE 2 * r.rnk + 2 END AS dst_id
    FROM src s JOIN r ON r.k = s.event_id % 25
),
agg AS (
    SELECT topic, partition, COUNT(*) AS n_src,
           CAST(SUM(CASE WHEN off >= {_BUNDLE_SPLIT} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tail,
           CAST(SUM(dst_id * (off + 1)) AS BIGINT) AS id_checksum
    FROM ids GROUP BY topic, partition
)
SELECT 'mig_' || topic AS topic, partition,
       CAST(n_src + 3 AS BIGINT) AS n_records,
       CAST(n_src + 2 AS BIGINT) AS max_offset,
       n_tail, id_checksum,
       CASE WHEN 2 * n_src // 3 > 0
            THEN CAST(2 * n_src // 3 + 3 AS BIGINT) END
           AS stable_committed,
       CASE WHEN n_src // 2 > 0
            THEN CAST(n_src // 2 + 3 AS BIGINT) END AS empty_committed
FROM agg
"""


QUERIES = [
    QuerySpec("migrator_bundle_run", migrator_bundle_run,
              MIGRATOR_BUNDLE_RUN_SQL),
    QuerySpec("migrator_schema_sync", migrator_schema_sync,
              MIGRATOR_SCHEMA_SYNC_SQL),
    QuerySpec("migrator_id_translate", migrator_id_translate,
              MIGRATOR_ID_TRANSLATE_SQL),
    QuerySpec("migrator_group_offsets", migrator_group_offsets,
              MIGRATOR_GROUP_OFFSETS_SQL),
    QuerySpec("migrator_end_to_end", migrator_end_to_end,
              MIGRATOR_END_TO_END_SQL),
    QuerySpec("migrator_topic_sync", migrator_topic_sync,
              MIGRATOR_TOPIC_SYNC_SQL),
    QuerySpec("migrator_acl_translate", migrator_acl_translate,
              MIGRATOR_ACL_TRANSLATE_SQL),
]
