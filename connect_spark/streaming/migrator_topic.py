"""Migrator TOPIC plane — destination topic creation, partition
reconciliation, config subsetting and ACL synchronisation, mirroring
the reference's internal/impl/redpanda/migrator/migrator_topic.go
(641 lines) over recorded cluster metadata:

- `TopicMigrator.sync` / `create_topic_if_needed` reproduce
  createTopicLocked (:273-360): resolve the destination name, mirror
  the partition count (0 -> -1 cluster default), pick the replication
  factor (explicit conf > source rf; serverless -> -1), copy only the
  SUPPORTED config keys (supportedTopicConfigs :86-110 — the
  serverless subset vs the full redpanda topic-property list), and on
  TopicAlreadyExists reconcile partitions UPWARD only
  (CreatePartitions when src > dst, :324-344).
- ACL sync (:466-518) follows MM2 semantics: only LITERAL-pattern
  topic ACLs are described (:539-547), ALLOW WRITE is never
  replicated (shouldReplicateACL :524), ALLOW ALL downgrades to READ
  (transformACLForTarget :531), allow/deny host carried through
  (aclBuilderFromDescribed :552).
- `translate_acls` is the same filter+transform as a Spark Column
  pipeline for cluster-scale ACL tables: one scan, a broadcast
  topic-map join, no Python in the row path.

Control-plane state (topic lists, configs, ACLs) is admin-API-sized;
the recorded-admin model here is the same contract as
migrator_control.py's RecordedRegistry — a cluster swaps the client,
the semantics and the Spark data plane stay identical."""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TopicMigratorError(RuntimeError):
    pass


class TopicAlreadyExists(TopicMigratorError):
    pass


# supportedTopicConfigs (migrator_topic.go:86-110)
SERVERLESS_TOPIC_CONFIGS = (
    "cleanup.policy",
    "retention.ms",
    "max.message.bytes",
    "write.caching",
)
FULL_TOPIC_CONFIGS = (
    "cleanup.policy",
    "flush.bytes",
    "flush.ms",
    "initial.retention.local.target.ms",
    "retention.bytes",
    "retention.ms",
    "segment.ms",
    "segment.bytes",
    "compression.type",
    "message.timestamp.type",
    "max.message.bytes",
)


@dataclass(frozen=True)
class TopicACL:
    """kadm.DescribedACL surface used by the migrator."""

    topic: str
    principal: str
    host: str
    operation: str  # READ / WRITE / ALL / ...
    permission: str  # ALLOW / DENY
    pattern: str = "LITERAL"  # LITERAL / PREFIXED


@dataclass
class RecordedTopic:
    partitions: int
    rf: int = 1
    configs: dict = field(default_factory=dict)


class RecordedAdmin:
    """Recorded admin-plane of one cluster (kadm.Client surface)."""

    def __init__(self) -> None:
        self.topics: dict[str, RecordedTopic] = {}
        self.acls: list[TopicACL] = []

    def add_topic(self, name: str, info: RecordedTopic) -> None:
        self.topics[name] = info

    def topic_details(self, name: str) -> RecordedTopic:
        if name not in self.topics:
            raise TopicMigratorError(f"topic {name} not found")
        return self.topics[name]

    def create_topic(self, name: str, partitions: int, rf: int,
                     configs: dict) -> None:
        if name in self.topics:
            raise TopicAlreadyExists(name)
        self.topics[name] = RecordedTopic(
            partitions=partitions if partitions > 0 else 1,
            rf=rf if rf > 0 else 1, configs=dict(configs))

    def create_partitions(self, name: str, add: int) -> None:
        self.topic_details(name).partitions += add

    def describe_acls(self, topic: str) -> list[TopicACL]:
        # describeACLs (:539-547): topic resource, LITERAL pattern,
        # any operation, allow+deny any host
        return [a for a in self.acls
                if a.topic == topic and a.pattern == "LITERAL"]

    def create_acls(self, acls: list[TopicACL]) -> None:
        for a in acls:
            if a.permission not in ("ALLOW", "DENY"):
                raise TopicMigratorError(
                    f"unsupported permission {a.permission}")
            if a not in self.acls:
                self.acls.append(a)


def should_replicate_acl(operation: str, permission: str) -> bool:
    """shouldReplicateACL (:524) — MM2 rule: never replicate ALLOW
    WRITE (the destination's writers are the migrator's concern)."""
    return not (permission == "ALLOW" and operation == "WRITE")


def transform_acl_for_target(acl: TopicACL) -> TopicACL:
    """transformACLForTarget (:531) — MM2 rule: ALLOW ALL downgrades
    to READ on the destination."""
    if acl.permission == "ALLOW" and acl.operation == "ALL":
        return replace(acl, operation="READ")
    return acl


@dataclass
class TopicMigratorConfig:
    """TopicMigratorConfig (migrator_topic.go:35-51)."""

    name_resolver: Optional[Callable[[str], str]] = None
    rf: int = 0  # 0 = inherit from source
    sync_acls: bool = True
    serverless: bool = False

    def supported_topic_configs(self) -> tuple[str, ...]:
        return (SERVERLESS_TOPIC_CONFIGS if self.serverless
                else FULL_TOPIC_CONFIGS)


@dataclass(frozen=True)
class TopicInfo:
    topic: str
    partitions: int


@dataclass(frozen=True)
class TopicMapping:
    src: TopicInfo
    dst: TopicInfo


class TopicMigrator:
    """topicMigrator (:126-141): create destination topics mirroring
    partitions and selected rf, copy the supported config subset,
    optionally sync ACLs, cache known topics."""

    def __init__(self, conf: TopicMigratorConfig | None = None) -> None:
        self.conf = conf or TopicMigratorConfig()
        self.known_topics: dict[str, TopicMapping] = {}

    # Sync / SyncOnce (:144-156, :213-247)

    def sync_once(self, src: RecordedAdmin, dst: RecordedAdmin,
                  topics: list[str]) -> None:
        if self.known_topics:
            return
        self.sync(src, dst, topics)

    def sync(self, src: RecordedAdmin, dst: RecordedAdmin,
             topics: list[str]) -> None:
        for t in topics:
            if not t or t in self.known_topics:
                continue
            self._create_topic(src, dst, t)

    def create_topic_if_needed(self, src: RecordedAdmin,
                               dst: RecordedAdmin, topic: str) -> str:
        if not topic:
            raise TopicMigratorError("topic name cannot be empty")
        if topic in self.known_topics:
            return self.known_topics[topic].dst.topic
        self._create_topic(src, dst, topic)
        return self.known_topics[topic].dst.topic

    def topic_mapping(self) -> list[TopicMapping]:
        return sorted(self.known_topics.values(),
                      key=lambda m: m.src.topic)

    # createTopicLocked (:273-360)

    def _create_topic(self, src: RecordedAdmin, dst: RecordedAdmin,
                      topic: str) -> None:
        dst_topic = self._resolve(topic)
        info = src.topic_details(topic)
        partitions = info.partitions or -1
        rf = -1 if self.conf.serverless else (self.conf.rf or info.rf)
        conf = {k: v for k, v in info.configs.items()
                if k in self.conf.supported_topic_configs()}
        mapping = TopicMapping(
            src=TopicInfo(topic, info.partitions),
            dst=TopicInfo(dst_topic, info.partitions))
        try:
            dst.create_topic(dst_topic, partitions, rf, conf)
        except TopicAlreadyExists:
            dst_info = dst.topic_details(dst_topic)
            if info.partitions > dst_info.partitions:
                dst.create_partitions(
                    dst_topic, info.partitions - dst_info.partitions)
            else:
                mapping = replace(
                    mapping,
                    dst=TopicInfo(dst_topic, dst_info.partitions))
        if self.conf.sync_acls:
            self._sync_acls(src, dst, topic, dst_topic)
        self.known_topics[topic] = mapping

    def _resolve(self, topic: str) -> str:
        if self.conf.name_resolver is None:
            return topic
        resolved = self.conf.name_resolver(topic)
        if not resolved:
            raise TopicMigratorError("resolved empty destination topic")
        return resolved

    # SyncACLs (:466-518)

    def _sync_acls(self, src: RecordedAdmin, dst: RecordedAdmin,
                   src_topic: str, dst_topic: str) -> None:
        out = []
        for acl in src.describe_acls(src_topic):
            if not should_replicate_acl(acl.operation, acl.permission):
                continue
            t = transform_acl_for_target(acl)
            out.append(replace(t, topic=dst_topic))
        if out:
            dst.create_acls(out)


def translate_acls(acls: DataFrame, topic_map: DataFrame) -> DataFrame:
    """The ACL sync rules as one Column-algebra pass for cluster-scale
    ACL tables — identical semantics to `_sync_acls` but set-based:

      input:     topic, principal, host, operation, permission, pattern
      topic_map: src_topic, dst_topic  (admin-sized -> broadcast)
      output:    the ACLs to create on the destination

    LITERAL-only describe filter, ALLOW WRITE dropped, ALLOW ALL ->
    READ, topic renamed via the broadcast map. One scan, no shuffle
    beyond the broadcast."""
    kept = acls.filter(
        (F.col("pattern") == "LITERAL")
        & ~((F.col("permission") == "ALLOW")
            & (F.col("operation") == "WRITE")))
    renamed = kept.join(
        F.broadcast(topic_map),
        kept["topic"] == topic_map["src_topic"]).select(
        F.col("dst_topic").alias("topic"),
        "principal", "host",
        F.when((F.col("permission") == "ALLOW")
               & (F.col("operation") == "ALL"), F.lit("READ"))
        .otherwise(F.col("operation")).alias("operation"),
        "permission", "pattern")
    return renamed
