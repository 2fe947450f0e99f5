"""Migrator control plane: schema-registry sync with schema-ID
translation and consumer-group offset translation.

The reference's flagship ``redpanda_migrator`` coordinates three
planes — topics (records), schemas, and consumer groups (README.md:3).
The record plane lives in streaming/migrator.py; this module is the
other two thirds:

- Schema registry sync (reference
  internal/impl/redpanda/migrator/migrator_schema_registry.go):
  list + filter source subjects, walk schema REFERENCES depth-first so
  dependencies are created before dependents
  (dfsSubjectSchemasFunc:483), copy each subject-version to the
  destination either with its fixed source ID
  (CreateSchemaWithIDAndVersion, syncSubjectSchema:806) or with a
  destination-assigned TRANSLATED id (CreateSchema:796), detect
  conflicting id mappings (checkSchemaIDConflict:712), sync per-subject
  compatibility (syncSubjectCompatibility:891), and maintain the
  source-id -> destination-id map that message re-framing uses
  (DestinationSchemaID:1138, strict mode per the `strict` field).

- Consumer-group offset translation (migrator_groups.go): list + filter
  groups by regex and state (ListGroupOffsets:236 — Dead always
  excluded, `only_empty` restricts to Empty), bound each committed
  offset to the source partition's (start, end] range (Sync:489-499),
  translate by TIMESTAMP — read the timestamp of the record at
  ``offset-1`` in the source, find the first destination offset with
  timestamp >= it, +1 when the timestamps tie exactly
  (translateOffset:741-788) — refine to the EXACT offset via a
  source-offset header stamped on destination records when available
  (tryFindExactOffset:805), and never rewind a destination group that
  is already ahead (Sync:531-536).

Spark form: the registries are control-plane state (dict-sized — the
same data the reference's HTTP client caches), so sync runs
driver-side against recorded registries, exactly like the iceberg
catalog client. The DATA-plane pieces are DataFrames:

- ``translate_frame_ids`` rewrites the Confluent 5-byte wire header of
  every record via a broadcast join against the id map — pure Column
  algebra + one broadcast hash join, no UDF, scales with record count.
- ``translate_group_offsets`` translates ALL groups' offsets in one
  job: the (small) offset list broadcasts against the source records
  for the ``offset-1`` timestamp lookup (equality join), then against
  the destination records for the first-timestamp->= lookup (broadcast
  hash join on (topic, partition) with a ts-range residual, min()
  aggregated map-side) — one scan of each record set regardless of
  group count, where the reference issues one Fetch RPC per offset.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, replace
from typing import Callable, Iterable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class MigratorError(ValueError):
    pass


# --- recorded schema registry ---------------------------------------


@dataclass(frozen=True)
class SchemaRef:
    """A schema reference (name -> subject/version), per the Confluent
    /subjects API shape the reference's sr.SubjectSchema carries."""

    name: str
    subject: str
    version: int


@dataclass(frozen=True)
class SubjectSchema:
    subject: str
    version: int
    id: int
    schema: str
    type: str = "AVRO"  # AVRO | JSON | PROTOBUF
    references: tuple[SchemaRef, ...] = ()
    soft_deleted: bool = False


def _canonical(schema: str, schema_type: str) -> str:
    """Equality key for schema text: JSON-ish types compare as parsed
    JSON, protobuf ignores newlines/leading/trailing space — the
    reference's schemaStringEquals (migrator_schema_registry.go:863)."""
    if schema_type in ("AVRO", "JSON"):
        try:
            return json.dumps(json.loads(schema), sort_keys=True)
        except ValueError:
            return schema
    return " ".join(schema.split())


class RecordedRegistry:
    """An offline schema registry: the same subjects/versions/ids/
    compatibility state a live registry serves over HTTP. Used as both
    the recorded SOURCE fixture and the writable DESTINATION."""

    def __init__(self, mode: str = "READWRITE"):
        self.mode = mode
        self.subject_modes: dict[str, str] = {}
        self.compatibility: dict[str, str] = {}
        self._by_subject: dict[str, dict[int, SubjectSchema]] = {}
        self._by_id: dict[int, SubjectSchema] = {}
        self._next_id = 1

    # -- read side (the sr.Client surface the migrator consumes) --
    def subjects(self, show_deleted: bool = False) -> list[str]:
        out = []
        for s, vers in self._by_subject.items():
            if show_deleted or any(not v.soft_deleted for v in vers.values()):
                out.append(s)
        return sorted(out)

    def versions(self, subject: str, show_deleted: bool = False) -> list[int]:
        vers = self._by_subject.get(subject, {})
        return sorted(v for v, ss in vers.items()
                      if show_deleted or not ss.soft_deleted)

    def schema_by_version(self, subject: str, version: int,
                          show_deleted: bool = False) -> SubjectSchema:
        if version == -1:  # latest
            vers = self.versions(subject, show_deleted)
            if not vers:
                raise MigratorError(f"subject not found: {subject}")
            version = vers[-1]
        try:
            ss = self._by_subject[subject][version]
        except KeyError:
            raise MigratorError(
                f"schema not found: {subject} v{version}") from None
        if ss.soft_deleted and not show_deleted:
            raise MigratorError(f"schema deleted: {subject} v{version}")
        return ss

    def schema_by_id(self, schema_id: int) -> Optional[SubjectSchema]:
        return self._by_id.get(schema_id)

    # -- write side --
    def _check_refs(self, references: tuple[SchemaRef, ...]) -> None:
        for r in references:
            if r.version not in self._by_subject.get(r.subject, {}):
                raise MigratorError(
                    f"reference not found: {r.subject} v{r.version}")

    def _existing(self, subject: str, schema: str, schema_type: str,
                  references: tuple[SchemaRef, ...]
                  ) -> Optional[SubjectSchema]:
        key = (_canonical(schema, schema_type), schema_type, references)
        for ss in self._by_subject.get(subject, {}).values():
            if (_canonical(ss.schema, ss.type), ss.type,
                    ss.references) == key:
                return ss
        return None

    def create_schema(self, subject: str, schema: str,
                      schema_type: str = "AVRO",
                      references: tuple[SchemaRef, ...] = (),
                      ) -> SubjectSchema:
        """Register under `subject`, destination-assigned id. Identical
        schema text already registered ANYWHERE reuses its global id;
        identical under the same subject returns the existing version —
        Confluent semantics the reference's CreateSchema relies on
        ('If the schema already exists ... this returns the existing
        schema', migrator_schema_registry.go:794)."""
        self._check_refs(references)
        cur = self._existing(subject, schema, schema_type, references)
        if cur is not None:
            return cur
        sid = None
        key = (_canonical(schema, schema_type), schema_type, references)
        for ss in self._by_id.values():
            if (_canonical(ss.schema, ss.type), ss.type,
                    ss.references) == key:
                sid = ss.id  # same schema, other subject: shared id
                break
        if sid is None:
            sid = self._next_id
            self._next_id += 1
        vers = self._by_subject.setdefault(subject, {})
        version = max(vers, default=0) + 1
        ss = SubjectSchema(subject, version, sid, schema, schema_type,
                           references)
        vers[version] = ss
        self._by_id.setdefault(sid, ss)
        return ss

    def create_schema_with_id_and_version(
            self, subject: str, schema: str, schema_id: int, version: int,
            schema_type: str = "AVRO",
            references: tuple[SchemaRef, ...] = ()) -> SubjectSchema:
        """IMPORT-mode registration with fixed source id+version
        (CreateSchemaWithIDAndVersion). Rejects an id already bound to
        a DIFFERENT schema — the conflict the reference turns into
        'try enabling translate-ids' (syncSubjectSchema:808-811)."""
        self._check_refs(references)
        cur = self._by_id.get(schema_id)
        if cur is not None and _canonical(cur.schema, cur.type) != \
                _canonical(schema, schema_type):
            raise MigratorError(
                f"schema already registered with id {schema_id} - "
                "try enabling translate-ids")
        cur_sub = self._by_subject.get(subject, {}).get(version)
        if cur_sub is not None:
            if _canonical(cur_sub.schema, cur_sub.type) == \
                    _canonical(schema, schema_type):
                return cur_sub
            raise MigratorError(
                f"incompatible fixed-id import: {subject} v{version}")
        ss = SubjectSchema(subject, version, schema_id, schema,
                           schema_type, references)
        self._by_subject.setdefault(subject, {})[version] = ss
        self._by_id.setdefault(schema_id, ss)
        self._next_id = max(self._next_id, schema_id + 1)
        return ss

    def add(self, ss: SubjectSchema,
            compatibility: Optional[str] = None) -> None:
        """Fixture helper: record a source-registry entry verbatim."""
        self._by_subject.setdefault(ss.subject, {})[ss.version] = ss
        self._by_id.setdefault(ss.id, ss)
        self._next_id = max(self._next_id, ss.id + 1)
        if compatibility:
            self.compatibility[ss.subject] = compatibility


# --- schema registry migrator ---------------------------------------


@dataclass
class SchemaMigratorConfig:
    """migrator_schema_registry.go config surface (fields at :79-90)."""

    include: tuple[str, ...] = ()
    exclude: tuple[str, ...] = ()
    versions: str = "all"  # all | latest
    include_deleted: bool = False
    translate_ids: bool = False
    normalize: bool = False
    strict: bool = False
    # subject rename template (the interpolated `subject` field)
    subject_resolver: Optional[Callable[[str], str]] = None


@dataclass(frozen=True)
class SyncedSchema:
    src_subject: str
    src_version: int
    src_id: int
    dst_subject: str
    dst_version: int
    dst_id: int
    compatibility: Optional[str]


class SchemaRegistryMigrator:
    """Offline form of schemaRegistryMigrator: same filtering, DFS and
    id-mapping semantics against recorded registries."""

    def __init__(self, src: RecordedRegistry, dst: RecordedRegistry,
                 conf: SchemaMigratorConfig | None = None):
        self.src, self.dst = src, dst
        self.conf = conf or SchemaMigratorConfig()
        # source schema id -> destination (subject, version, id)
        self.known_schemas: dict[int, SyncedSchema] = {}
        self._known_subject_versions: set[tuple[str, int]] = set()

    # subject filtering, confx.RegexpFilter semantics: include empty =
    # all; exclude wins
    def _filtered(self, subjects: Iterable[str]) -> list[str]:
        out = []
        for s in subjects:
            if self.conf.include and not any(
                    re.search(p, s) for p in self.conf.include):
                continue
            if any(re.search(p, s) for p in self.conf.exclude):
                continue
            out.append(s)
        return out

    def _resolve_subject(self, subject: str) -> str:
        if self.conf.subject_resolver is None:
            return subject
        dst = self.conf.subject_resolver(subject)
        if not dst:
            raise MigratorError("resolved empty destination subject")
        return dst

    def _dfs(self, root: SubjectSchema) -> list[SubjectSchema]:
        """References-first, all-versions expansion: the iterative DFS
        of dfsSubjectSchemasFunc:483 — every schema a root transitively
        references is yielded before the root."""
        order: list[SubjectSchema] = []
        visiting: set[tuple[str, int]] = set()

        def visit(subject: str, version: int) -> None:
            key = (subject, version)
            if key in visiting or key in self._known_subject_versions:
                return
            visiting.add(key)
            ss = self.src.schema_by_version(
                subject, version, self.conf.include_deleted)
            if self.conf.versions == "all" and ss.version > 1:
                for v in self.src.versions(
                        subject, self.conf.include_deleted):
                    if v < ss.version:
                        visit(subject, v)
            for ref in ss.references:
                visit(ref.subject, ref.version)
            order.append(ss)

        visit(root.subject, root.version)
        return order

    def validate(self) -> None:
        if self.src is self.dst:
            raise MigratorError(
                "source and destination schema registries must differ")
        if self.dst.mode not in ("READWRITE", "IMPORT"):
            raise MigratorError(
                "schema registry instance mode must be READWRITE or "
                f"IMPORT, got {self.dst.mode!r}")

    def sync(self) -> list[SyncedSchema]:
        """One Sync() pass: roots are each filtered subject's latest
        version (Sync:655 'Always use latest for DFS roots'); the
        reference shuffles roots to spread parallel HTTP workers —
        offline we iterate sorted for determinism (same result set:
        the id map is order-independent, conflicts are errors)."""
        self.validate()
        synced: list[SyncedSchema] = []
        for subject in self._filtered(
                self.src.subjects(self.conf.include_deleted)):
            root = self.src.schema_by_version(
                subject, -1, self.conf.include_deleted)
            for ss in self._dfs(root):
                info = self._sync_one(ss)
                prev = self.known_schemas.get(ss.id)
                if prev is not None and prev.dst_id != info.dst_id:
                    raise MigratorError(
                        f"schema ID mapping conflict: source ID {ss.id}"
                        f" maps to both destination IDs {prev.dst_id} "
                        f"and {info.dst_id}")
                self.known_schemas[ss.id] = info
                self._known_subject_versions.add((ss.subject, ss.version))
                synced.append(info)
        return synced

    def _sync_one(self, ss: SubjectSchema) -> SyncedSchema:
        dst_subject = self._resolve_subject(ss.subject)
        # references must point at the DESTINATION subjects
        refs = tuple(
            replace(r, subject=self._resolve_subject(r.subject))
            for r in ss.references)
        schema = ss.schema
        if self.conf.normalize and ss.type in ("AVRO", "JSON"):
            schema = _canonical(schema, ss.type)
        if self.conf.translate_ids:
            dss = self.dst.create_schema(dst_subject, schema, ss.type, refs)
        else:
            dss = self.dst.create_schema_with_id_and_version(
                dst_subject, schema, ss.id, ss.version, ss.type, refs)
        compat = self._sync_compatibility(ss.subject, dst_subject)
        return SyncedSchema(ss.subject, ss.version, ss.id,
                            dss.subject, dss.version, dss.id, compat)

    def _sync_compatibility(self, src_subject: str,
                            dst_subject: str) -> Optional[str]:
        cl = self.src.compatibility.get(src_subject)
        if cl is None:
            return None  # no explicit level: leave destination default
        self.dst.compatibility[dst_subject] = cl
        return cl

    def destination_schema_id(self, schema_id: int) -> int:
        """DestinationSchemaID:1138 — mapped id, else strict error,
        else passthrough (mixed-format topics)."""
        info = self.known_schemas.get(schema_id)
        if info is not None:
            return info.dst_id
        if self.conf.strict:
            raise MigratorError(
                f"schema ID {schema_id} not found in registry")
        return schema_id

    def id_map_df(self, spark) -> DataFrame:
        """The id map as a (broadcastable) DataFrame for data-plane
        record re-framing."""
        rows = [(k, v.dst_id) for k, v in self.known_schemas.items()]
        return spark.createDataFrame(rows or [], "src_id INT, dst_id INT")


def translate_frame_ids(df: DataFrame, col: str, id_map: DataFrame,
                        strict: bool = False,
                        out: Optional[str] = None) -> DataFrame:
    """Rewrite the Confluent wire header (magic 0x00 + 4-byte BE schema
    id) of every record to the destination id — the data-plane half of
    translate_ids that the migrator applies to each migrated message.

    Column algebra + one broadcast hash join; payload bytes are never
    touched. Non-framed / unknown-id records pass through unchanged
    unless strict (strict + unknown -> _error column, the reference's
    per-message failure contract)."""
    from connect_spark.errors import flag_error
    from connect_spark.functions.schema_registry import (
        encode_confluent_frame,
        parse_confluent_frame,
    )

    out = out or col
    frame = parse_confluent_frame(col)
    df = df.withColumn("_frame", frame)
    joined = df.join(
        F.broadcast(id_map.withColumnRenamed("src_id", "_map_src")
                    .withColumnRenamed("dst_id", "_map_dst")),
        F.col("_frame.schema_id") == F.col("_map_src"), "left")
    known = F.col("_frame.magic_ok") & F.col("_map_dst").isNotNull()
    if strict:
        joined = flag_error(
            joined, F.col("_frame.magic_ok") & F.col("_map_dst").isNull(),
            "migrator: unknown schema id")
    reframed: Column = F.when(
        known,
        encode_confluent_frame_col(F.col("_frame.payload"),
                                   F.col("_map_dst")),
    ).otherwise(F.col(col).cast("binary"))
    return (joined.withColumn(out, reframed)
            .drop("_frame", "_map_src", "_map_dst"))


def encode_confluent_frame_col(payload: Column, schema_id: Column) -> Column:
    """encode_confluent_frame with a COLUMN id (schema_registry.py's
    helper takes a literal): magic 0x00 + 4-byte big-endian id."""
    sid = schema_id.cast("int")
    hex8 = F.lpad(F.conv(sid.cast("string"), 10, 16), 8, "0")
    return F.concat(F.unhex(F.concat(F.lit("00"), hex8)),
                    payload.cast("binary"))


# --- consumer group offset translation -------------------------------


@dataclass
class GroupsMigratorConfig:
    """migrator_groups.go config surface (fields at :40-46)."""

    include: tuple[str, ...] = ()
    exclude: tuple[str, ...] = ()
    only_empty: bool = False
    skip_source_group: Optional[str] = None
    # destination records carry the source offset in this header column
    # -> exact translation for Empty groups (tryFindExactOffset)
    offset_header_col: Optional[str] = None
    # src topic -> dst topic renames (nameConverter, conv.go:20)
    topic_map: dict[str, str] = field(default_factory=dict)
    # hint the offset/bounds sides broadcast. True fits the production
    # contract (admin-API-sized group lists); pass False when the
    # inputs derive from sf-scaled scans and AQE should own the choice
    # (it converts to broadcast at runtime when the shuffle stats come
    # in small)
    hint_broadcast: bool = True


def translate_group_offsets(
    offsets: DataFrame,
    src_records: DataFrame,
    dst_records: DataFrame,
    dst_committed: Optional[DataFrame] = None,
    conf: GroupsMigratorConfig | None = None,
) -> DataFrame:
    """Translate committed consumer-group offsets from a source cluster
    to a destination cluster, all groups in one DataFrame job.

    Inputs:
      offsets:       group, state, topic, partition, committed
      src_records:   topic, partition, offset, ts  (source cluster log)
      dst_records:   topic, partition, offset, ts [, <offset_header_col>]
      dst_committed: group, topic, partition, committed (existing
                     destination commits, for the no-rewind rule)

    Output: group, topic, partition, src_offset, dst_topic, dst_offset
    — exactly the commits Sync() would issue.

    Semantics (migrator_groups.go):
      - group filtering: include/exclude regex (ListGroupOffsets:249),
        state Dead always dropped, only_empty keeps Empty only
        (:258-270), the migrator's own group skipped (Sync:365)
      - bounds: committed must lie in (start, end] of the source
        partition (Sync:489-499); end = last offset + 1
      - translation: ts := timestamp(src record at committed-1); dst :=
        first destination offset with ts' >= ts; +1 if ts' == ts
        (translateOffset:770-787)
      - exact refinement: when destination records embed the source
        offset in a header, Empty groups translate exactly by locating
        the destination record whose header == committed; a committed
        offset beyond every migrated header commits the destination
        END offset; a compacted-away committed record falls back to
        the ts path (tryFindExactOffset:805-845 — the reference
        delta-chases live fetches; over recorded records the
        equality join + per-partition end aggregate is the closed
        form)
      - no-rewind: drop commits where the destination group is already
        at or past the translated offset (Sync:531-536)

    Scale shape: `offsets` is control-plane-sized (groups × partitions)
    and broadcast into both record scans; records are scanned ONCE each
    with map-side min() aggregation — no per-offset RPC loop."""
    conf = conf or GroupsMigratorConfig()
    hint = F.broadcast if conf.hint_broadcast else (lambda df: df)

    o = offsets
    if conf.include:
        o = o.filter(F.col("group").rlike("|".join(conf.include)))
    if conf.exclude:
        o = o.filter(~F.col("group").rlike("|".join(conf.exclude)))
    if conf.skip_source_group:
        o = o.filter(F.col("group") != conf.skip_source_group)
    if conf.only_empty:
        o = o.filter(F.col("state") == "Empty")
    else:
        o = o.filter(F.col("state") != "Dead")

    # source partition bounds: (start, end], end = max offset + 1
    bounds = src_records.groupBy("topic", "partition").agg(
        F.min("offset").alias("_start"),
        (F.max("offset") + 1).alias("_end"))
    o = (o.join(hint(bounds), ["topic", "partition"])
         .filter((F.col("committed") > F.col("_start"))
                 & (F.col("committed") <= F.col("_end")))
         .drop("_start", "_end"))

    # timestamp of the record at committed-1 (equality join; the small
    # offsets side broadcasts into the source-record scan). The source
    # side is renamed _st/_sp/_so so the join keys are unambiguous even
    # when offsets and src_records share lineage (self-join fixtures).
    src = src_records.select(
        F.col("topic").alias("_st"), F.col("partition").alias("_sp"),
        F.col("offset").alias("_so"), F.col("ts").alias("_src_ts"))
    want = hint(o.withColumn("_prev", F.col("committed") - 1))
    with_ts = want.join(
        src,
        (F.col("topic") == F.col("_st"))
        & (F.col("partition") == F.col("_sp"))
        & (F.col("_prev") == F.col("_so")),
    ).select("group", "state", "topic", "partition", "committed",
             "_prev", "_src_ts")

    # destination topic rename (nameConverter)
    if conf.topic_map:
        m = F.create_map(*[F.lit(x) for kv in conf.topic_map.items()
                           for x in kv])
        with_ts = with_ts.withColumn(
            "dst_topic", F.coalesce(m[F.col("topic")], F.col("topic")))
    else:
        with_ts = with_ts.withColumn("dst_topic", F.col("topic"))

    # first destination offset with ts >= src ts: broadcast the wanted
    # offsets over ONE scan of dst_records, min(struct(ts, offset))
    # keeps both the offset and its timestamp for the tie adjustment
    dst = dst_records.select(
        F.col("topic").alias("_dt"), F.col("partition").alias("_dp"),
        F.col("offset").alias("_do"), F.col("ts").alias("_dts"))
    w = hint(with_ts)
    cand = w.join(
        dst,
        (F.col("dst_topic") == F.col("_dt"))
        & (F.col("partition") == F.col("_dp"))
        & (F.col("_dts") >= F.col("_src_ts")),
    )
    first = (cand.groupBy("group", "state", "topic", "partition",
                          "committed", "_prev", "_src_ts", "dst_topic")
             .agg(F.min(F.struct("_dts", "_do")).alias("_first")))
    translated = first.withColumn(
        "dst_offset_ts",
        F.when(F.col("_first._dts") == F.col("_src_ts"),
               F.col("_first._do") + 1).otherwise(F.col("_first._do")))

    # exact refinement for Empty groups via the source-offset header —
    # the closed form of tryFindExactOffset's delta-chase (:805-845)
    # over recorded logs:
    #   1. a destination record whose header == committed exists ->
    #      commit that destination offset (committed = next-to-consume
    #      on both sides; surviving compaction of the committed-1
    #      record, which the old committed-1/+1 join did not),
    #   2. committed beyond EVERY migrated header (the group had
    #      consumed the whole partition) -> the chase ascends until
    #      o1 == eo and returns the destination END offset (:816),
    #   3. committed <= max header but absent (the committed record
    #      itself compacted away) -> the chase errors (negative
    #      delta / attempts) and the caller keeps the ts translation.
    if conf.offset_header_col:
        hdr = dst_records.select(
            F.col("topic").alias("_ht"), F.col("partition").alias("_hp"),
            F.col("offset").alias("_ho"),
            F.col(conf.offset_header_col).alias("_hsrc"))
        ends = (hdr.groupBy("_ht", "_hp")
                .agg(F.max("_hsrc").alias("_hmax"),
                     (F.max("_ho") + 1).alias("_eo"))
                .withColumnRenamed("_ht", "_et")
                .withColumnRenamed("_hp", "_ep"))
        t = hint(translated)
        translated = t.join(
            hdr,
            (F.col("dst_topic") == F.col("_ht"))
            & (F.col("partition") == F.col("_hp"))
            & (F.col("committed") == F.col("_hsrc"))
            & (F.col("state") == "Empty"),
            "left",
        ).join(
            hint(ends),
            (F.col("dst_topic") == F.col("_et"))
            & (F.col("partition") == F.col("_ep")),
            "left",
        ).withColumn(
            "dst_offset",
            F.coalesce(
                F.col("_ho"),
                F.when((F.col("state") == "Empty")
                       & (F.col("committed") > F.col("_hmax")),
                       F.col("_eo")),
                F.col("dst_offset_ts")),
        ).drop("_ht", "_hp", "_ho", "_hsrc", "_et", "_ep", "_hmax",
               "_eo")
    else:
        translated = translated.withColumn(
            "dst_offset", F.col("dst_offset_ts"))

    result = translated.select(
        "group", "topic", "partition",
        F.col("committed").alias("src_offset"), "dst_topic", "dst_offset")

    # no-rewind: destination group already at/past translated offset
    if dst_committed is not None:
        cur = dst_committed.select(
            F.col("group").alias("_cg"), F.col("topic").alias("_ct"),
            F.col("partition").alias("_cp"),
            F.col("committed").alias("_cur"))
        result = (result.join(
            hint(cur),
            (result["group"] == cur["_cg"])
            & (result["dst_topic"] == cur["_ct"])
            & (result["partition"] == cur["_cp"]), "left")
            .filter(F.col("_cur").isNull()
                    | (F.col("_cur") < F.col("dst_offset")))
            .drop("_cg", "_ct", "_cp", "_cur"))

    return result
