"""Topic-plane migrator semantics vs migrator_topic.go: creation with
partition/rf mirroring, serverless config subsetting, already-exists
partition reconciliation, MM2 ACL rules, and the set-based Spark ACL
translation parity."""

from __future__ import annotations

import pytest

from connect_spark.streaming.migrator_topic import (
    FULL_TOPIC_CONFIGS,
    RecordedAdmin,
    RecordedTopic,
    SERVERLESS_TOPIC_CONFIGS,
    TopicACL,
    TopicMigrator,
    TopicMigratorConfig,
    TopicMigratorError,
    should_replicate_acl,
    transform_acl_for_target,
    translate_acls,
)


def _src() -> RecordedAdmin:
    src = RecordedAdmin()
    src.add_topic("a", RecordedTopic(
        partitions=3, rf=2,
        configs={"cleanup.policy": "compact", "retention.ms": "1000",
                 "segment.bytes": "4096", "weird.key": "x"}))
    src.add_topic("b", RecordedTopic(partitions=1, rf=3, configs={}))
    return src


def test_create_mirrors_partitions_rf_and_config_subset():
    src, dst = _src(), RecordedAdmin()
    m = TopicMigrator(TopicMigratorConfig(sync_acls=False))
    m.sync(src, dst, ["a", "b"])
    a = dst.topic_details("a")
    assert (a.partitions, a.rf) == (3, 2)  # inherit source rf
    # only the supported keys copied (migrator_topic.go:86-110)
    assert a.configs == {"cleanup.policy": "compact",
                         "retention.ms": "1000",
                         "segment.bytes": "4096"}
    assert dst.topic_details("b").rf == 3
    assert [(x.src.topic, x.dst.partitions) for x in m.topic_mapping()] \
        == [("a", 3), ("b", 1)]


def test_serverless_subset_and_rf():
    src, dst = _src(), RecordedAdmin()
    m = TopicMigrator(TopicMigratorConfig(sync_acls=False,
                                          serverless=True))
    m.sync(src, dst, ["a"])
    a = dst.topic_details("a")
    assert set(a.configs) <= set(SERVERLESS_TOPIC_CONFIGS)
    assert "segment.bytes" not in a.configs
    assert a.rf == 1  # rf=-1 -> cluster default
    # write.caching is serverless-only; the lists overlap but neither
    # contains the other (migrator_topic.go:86-110)
    assert "write.caching" in SERVERLESS_TOPIC_CONFIGS
    assert "write.caching" not in FULL_TOPIC_CONFIGS


def test_explicit_rf_overrides_source():
    src, dst = _src(), RecordedAdmin()
    TopicMigrator(TopicMigratorConfig(rf=5, sync_acls=False)) \
        .sync(src, dst, ["a"])
    assert dst.topic_details("a").rf == 5


def test_already_exists_reconciles_partitions_upward_only():
    src, dst = _src(), RecordedAdmin()
    dst.add_topic("mig_a", RecordedTopic(partitions=1, rf=1))
    dst.add_topic("mig_b", RecordedTopic(partitions=7, rf=1))
    m = TopicMigrator(TopicMigratorConfig(
        name_resolver=lambda t: "mig_" + t, sync_acls=False))
    m.sync(src, dst, ["a", "b"])
    # src a=3 > dst 1 -> increased; src b=1 < dst 7 -> left alone,
    # mapping records the REAL destination count (:324-344)
    assert dst.topic_details("mig_a").partitions == 3
    assert dst.topic_details("mig_b").partitions == 7
    by_src = {x.src.topic: x.dst.partitions for x in m.topic_mapping()}
    assert by_src == {"a": 3, "b": 7}


def test_empty_resolution_and_sync_once():
    src, dst = _src(), RecordedAdmin()
    m = TopicMigrator(TopicMigratorConfig(name_resolver=lambda t: ""))
    with pytest.raises(TopicMigratorError):
        m.sync(src, dst, ["a"])
    m2 = TopicMigrator(TopicMigratorConfig(sync_acls=False))
    m2.sync_once(src, dst, ["a"])
    dst.topics["a"].partitions = 99  # mutate; sync_once must skip
    m2.sync_once(src, dst, ["a", "b"])
    assert "b" not in dst.topics  # second sync_once was a no-op


ACLS = [
    TopicACL("a", "User:alice", "*", "READ", "ALLOW"),
    TopicACL("a", "User:bob", "", "WRITE", "ALLOW"),      # dropped
    TopicACL("a", "User:carol", "", "ALL", "ALLOW"),      # -> READ
    TopicACL("a", "User:dave", "10.0.0.1", "ALL", "DENY"),  # kept
    TopicACL("a", "User:eve", "", "READ", "ALLOW", "PREFIXED"),  # drop
]


def test_acl_rules():
    assert not should_replicate_acl("WRITE", "ALLOW")
    assert should_replicate_acl("WRITE", "DENY")
    assert transform_acl_for_target(ACLS[2]).operation == "READ"
    assert transform_acl_for_target(ACLS[3]).operation == "ALL"


def test_sync_acls_end_to_end():
    src, dst = _src(), RecordedAdmin()
    src.acls = list(ACLS)
    m = TopicMigrator(TopicMigratorConfig(
        name_resolver=lambda t: "mig_" + t))
    m.sync(src, dst, ["a"])
    got = {(a.topic, a.principal, a.operation, a.permission, a.host)
           for a in dst.acls}
    assert got == {
        ("mig_a", "User:alice", "READ", "ALLOW", "*"),
        ("mig_a", "User:carol", "READ", "ALLOW", ""),
        ("mig_a", "User:dave", "ALL", "DENY", "10.0.0.1"),
    }


def test_translate_acls_matches_inprocess_rules(spark):
    rows = [(a.topic, a.principal, a.host, a.operation, a.permission,
             a.pattern) for a in ACLS] + \
        [("b", "User:x", "", "DESCRIBE", "ALLOW", "LITERAL")]
    df = spark.createDataFrame(
        rows, "topic STRING, principal STRING, host STRING,"
        " operation STRING, permission STRING, pattern STRING")
    tmap = spark.createDataFrame(
        [("a", "mig_a"), ("b", "mig_b")],
        "src_topic STRING, dst_topic STRING")
    got = {(r.topic, r.principal, r.operation, r.permission)
           for r in translate_acls(df, tmap).collect()}
    assert got == {
        ("mig_a", "User:alice", "READ", "ALLOW"),
        ("mig_a", "User:carol", "READ", "ALLOW"),
        ("mig_a", "User:dave", "ALL", "DENY"),
        ("mig_b", "User:x", "DESCRIBE", "ALLOW"),
    }
