"""Driver-gated queries that execute through the YAML pipeline loader
itself — so config parsing, Bloblang compilation inside configs, and
the processor registrations are all inside the correctness gate, not
just unit tests."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec


def pipeline_yaml_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A full YAML pipeline (table input → mapping → group_by) built by
    `build_pipeline` (plans/pipeline.py): revenue class per event via
    Bloblang in config, first-match group_by tagging
    (processors/group_by.adoc:34 — unmatched rows form their own
    untagged group). The oracle recomputes the same routing with CASE."""
    from connect_spark.plans.pipeline import build_pipeline

    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "events"}},
        "pipeline": {
            "processors": [
                {
                    "mapping": (
                        "root.event_id = this.event_id\n"
                        "root.value_cents = (this.value * 100).floor()\n"
                        "root.etype = this.event_type"
                    )
                },
                {
                    "group_by": [
                        {
                            "check": 'this.etype == "purchase"',
                            "processors": [
                                {"mutation": 'root.route = "billing"'}
                            ],
                        },
                        {
                            "check": "this.value_cents >= 20000",
                            "processors": [
                                {"mutation": 'root.route = "big"'}
                            ],
                        },
                    ]
                },
            ]
        },
    }
    df = build_pipeline(spark, config).dataframe()
    return df.select(
        "event_id",
        F.col("value_cents").cast("bigint").alias("value_cents"),
        "etype",
        "route",
    )


PIPELINE_ROUTE_SQL = """
SELECT event_id,
       CAST(floor(value * 100) AS BIGINT) AS value_cents,
       event_type AS etype,
       CASE WHEN event_type = 'purchase' THEN 'billing'
            WHEN floor(value * 100) >= 20000 THEN 'big'
            ELSE NULL END AS route
FROM events
"""


def parse_log_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`parse_log` (parse_log.adoc:26) in the gate: RFC3164 syslog
    lines synthesized from events, parsed back to structured fields by
    the grok-based parser (functions/formats.py parse_syslog); the
    oracle recomputes every field from the base columns, so a grok or
    pattern bug breaks the hash."""
    from connect_spark.functions.formats import parse_syslog

    ev = load_table(spark, sf_dir, "events")
    line = F.concat(
        F.lit("Jan  2 03:04:05 host"),
        F.col("user_id").cast("string"),
        F.lit(" "),
        F.col("event_type"),
        F.lit("["),
        F.col("event_id").cast("string"),
        F.lit("]: value="),
        F.col("value").cast("string"),
    )
    parsed = parse_syslog(line)
    return ev.select(
        "event_id",
        parsed["timestamp"].alias("log_ts"),
        parsed["hostname"].alias("log_host"),
        parsed["appname"].alias("log_app"),
        parsed["procid"].cast("bigint").alias("log_procid"),
        parsed["message"].alias("log_msg"),
    )


PARSE_LOG_SQL = """
SELECT event_id,
       'Jan  2 03:04:05' AS log_ts,
       'host' || CAST(user_id AS VARCHAR) AS log_host,
       event_type AS log_app,
       event_id AS log_procid,
       'value=' || CAST(value AS VARCHAR) AS log_msg
FROM events
"""


def iceberg_commit_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 commits in the gate (sinks/iceberg_meta.py): orders
    lands in a catalog-less table in TWO appends (status split), the
    read path resolves manifest-list → manifests → data files, and the
    aggregate over the round-tripped table must hash-equal the oracle
    computed directly on orders — so a bug anywhere in the metadata
    layout, manifest serde, or snapshot chain breaks the value hash."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from connect_spark.sinks.iceberg_meta import IcebergTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    loc = tempfile.mkdtemp(prefix="iceberg_gate_")
    try:
        t = IcebergTable(spark, loc)
        t.append(orders.filter(F.col("o_orderstatus") == "F"))
        t.append(orders.filter(F.col("o_orderstatus") != "F"))
        back = t.read()
        return (
            back.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            )
            # materialize before the table directory is removed
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(loc, ignore_errors=True)


ICEBERG_ROUNDTRIP_SQL = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_orderstatus
"""




def iceberg_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 POSITION deletes in the gate (merge-on-read,
    sinks/iceberg_meta.py::delete_where): orders commits once, then a
    row-level delete tombstones every '3-MEDIUM' priority row WITHOUT
    rewriting data files; the read applies the (file_path, pos)
    tombstones via the parquet metadata columns.  The aggregate over
    the post-delete table must hash-equal the oracle's plain filtered
    aggregate — a bug in delete-file layout, the deletes manifest, or
    the anti-join apply breaks the value hash."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from connect_spark.sinks.iceberg_meta import IcebergTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    loc = tempfile.mkdtemp(prefix="iceberg_del_")
    try:
        t = IcebergTable(spark, loc)
        t.append(orders)
        t.delete_where([("o_orderpriority", "=", "3-MEDIUM")])
        back = t.read()
        return (
            back.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(loc, ignore_errors=True)


ICEBERG_DELETE_SQL = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderpriority <> '3-MEDIUM'
GROUP BY o_orderstatus
"""


def iceberg_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 EQUALITY deletes + upsert in the gate
    (sinks/iceberg_meta.py::upsert — the CDC MERGE composition):
    orders commits once, then every 'F'-status order upserts again
    with its price doubled; sequence-number scoping must mask exactly
    the OLD versions (the re-appended rows survive their own
    tombstones).  The aggregate over the merged table hash-checks
    against the oracle computing the same merge arithmetically."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from connect_spark.sinks.iceberg_meta import IcebergTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    loc = tempfile.mkdtemp(prefix="iceberg_ups_")
    try:
        t = IcebergTable(spark, loc)
        t.append(orders)
        t.upsert(
            orders.filter(F.col("o_orderstatus") == "F").withColumn(
                "o_totalprice", F.col("o_totalprice") * 2),
            ["o_orderkey"],
        )
        back = t.read()
        return (
            back.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(loc, ignore_errors=True)


ICEBERG_UPSERT_SQL = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       round(sum(CASE WHEN o_orderstatus = 'F'
                      THEN o_totalprice * 2
                      ELSE o_totalprice END), 2) AS total_price
FROM orders
GROUP BY o_orderstatus
"""


def iceberg_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned Iceberg in the gate (identity spec + manifest
    pruning, sinks/iceberg_meta.py): orders commits partitioned by
    order status, then a pruned scan (partition equality + a column-
    bounds predicate) must value-hash the oracle's plain WHERE over
    orders — covering the partition layout, typed partition values,
    inference-off reads, and residual filtering end to end. The scan
    must actually prune (asserted: fewer files than the table)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from connect_spark.sinks.iceberg_meta import IcebergTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    loc = tempfile.mkdtemp(prefix="iceberg_part_gate_")
    try:
        t = IcebergTable(spark, loc)
        t.append(orders, partition_by=["o_orderstatus"])
        out = t.scan([
            ("o_orderstatus", "=", "F"),
            ("o_totalprice", ">=", 100000.0),
        ])
        n_total = len(t.current_files())
        if not t._last_scan_file_count < n_total:
            raise AssertionError(
                "partition pruning did not reduce the file set "
                f"({t._last_scan_file_count}/{n_total})"
            )
        return out.select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice"), 2).alias("price"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


ICEBERG_PARTITIONED_SQL = """
SELECT o_orderkey, o_orderstatus,
       round(o_totalprice, 2) AS price
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice >= 100000.0
"""


QUERIES = [
    QuerySpec("pipeline_yaml_route", pipeline_yaml_route, PIPELINE_ROUTE_SQL),
    QuerySpec("parse_log_events", parse_log_events, PARSE_LOG_SQL),
    QuerySpec(
        "iceberg_partitioned_scan",
        iceberg_partitioned_scan,
        ICEBERG_PARTITIONED_SQL,
    ),
    QuerySpec(
        "iceberg_commit_roundtrip",
        iceberg_commit_roundtrip,
        ICEBERG_ROUNDTRIP_SQL,
    ),
    QuerySpec(
        "iceberg_delete_roundtrip",
        iceberg_delete_roundtrip,
        ICEBERG_DELETE_SQL,
    ),
    QuerySpec(
        "iceberg_upsert_roundtrip",
        iceberg_upsert_roundtrip,
        ICEBERG_UPSERT_SQL,
    ),
]


def iceberg_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation — the lakehouse trick every engine
    (Spark/Trino/Dremio) plays: COUNT(*) GROUP BY partition answered
    ENTIRELY from manifest statistics (per-file record_count keyed by
    partition value), zero data-file reads.  Valid exactly when the
    current snapshot carries no delete files (asserted); with
    merge-on-read deletes present an engine must fall back to a scan.

    The table commits in TWO appends (odd/even order keys) so the
    count must merge record_counts across manifests through the
    manifest-list walk — a single-manifest shortcut would still pass a
    one-append test.  The manifest walk is driver-side by design: it
    is the same O(#files) planning metadata Spark's scan planner
    itself materializes on the driver; no row data moves."""
    import shutil
    import tempfile
    from collections import defaultdict

    from pyspark.sql import functions as F

    from connect_spark.sinks.iceberg_meta import IcebergTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    loc = tempfile.mkdtemp(prefix="iceberg_metacount_")
    try:
        t = IcebergTable(spark, loc)
        t.append(orders.filter(F.col("o_orderkey") % 2 == 0),
                 partition_by=["o_orderstatus"])
        t.append(orders.filter(F.col("o_orderkey") % 2 == 1),
                 partition_by=["o_orderstatus"])
        # explicit raises, not assert: this is the VALIDITY gate of the
        # optimization (python -O would strip an assert and silently
        # over-count deleted rows)
        if t.current_delete_files():
            raise ValueError(
                "metadata-only count requires a delete-free snapshot; "
                "fall back to a scan")
        sums: dict[str, int] = defaultdict(int)
        n_files = 0
        for f in t.current_files():
            sums[f["partition"]["o_orderstatus"]] += f["record_count"]
            n_files += 1
        if n_files < 2:
            raise ValueError("expected multiple data files")
        return spark.createDataFrame(
            [(k, int(v)) for k, v in sorted(sums.items())],
            "o_orderstatus string, n_orders long",
        )
    finally:
        shutil.rmtree(loc, ignore_errors=True)


ICEBERG_METACOUNT_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


QUERIES += [
    QuerySpec(
        "iceberg_metadata_count",
        iceberg_metadata_count,
        ICEBERG_METACOUNT_SQL,
    ),
]


def while_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `while` processor as a driver-gated fixpoint
    (processors/while.adoc:26 — child processors re-applied to rows
    matching `check` until none match): pointer-jumping root
    resolution on the implicit binary tree over v = event_id mod 1000
    + 1, where each iteration jumps v -> floor(v / 2) and counts the
    step.  Iteration count is DATA-DEPENDENT per row (depth of v =
    floor(log2 v), up to 9 here), so the loop's filter/union/
    checkpoint machinery is exercised on a genuinely ragged frontier;
    rows exit the loop as they individually reach the root.  The
    oracle closes the form: steps = floor(log2(v))."""
    from connect_spark.plans.pipeline import build_pipeline

    config = {
        "input": {"table": {"sf_dir": sf_dir, "name": "events"}},
        "pipeline": {
            "processors": [
                {
                    "mapping": (
                        "root.event_id = this.event_id\n"
                        "root.v = this.event_id % 1000 + 1\n"
                        "root.steps = 0"
                    )
                },
                {
                    "while": {
                        "check": "this.v > 1",
                        "max_loops": 12,
                        "processors": [
                            {
                                "mutation": (
                                    "root.v = (this.v / 2).floor()\n"
                                    "root.steps = this.steps + 1"
                                )
                            }
                        ],
                    }
                },
            ]
        },
    }
    df = build_pipeline(spark, config).dataframe()
    return df.select(
        "event_id",
        F.col("v").cast("bigint").alias("root_v"),
        F.col("steps").cast("bigint").alias("steps"),
    )


WHILE_FIXPOINT_SQL = """
SELECT event_id,
       CAST(1 AS BIGINT) AS root_v,
       CAST(FLOOR(LOG2(event_id % 1000 + 1)) AS BIGINT) AS steps
FROM events
"""


QUERIES += [
    QuerySpec("while_fixpoint", while_fixpoint, WHILE_FIXPOINT_SQL),
]


def iceberg_bucket_partition_roundtrip(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg BUCKET partition transform in the gate (round-11;
    reference grammar `internal/impl/iceberg/icebergx/
    partition_key.go:238-241`, hash per Iceberg spec Appendix B
    murmur3_x86_32): orders commits partitioned by
    ``bucket(8, o_custkey)``, then an equality scan on the SOURCE
    column must (a) prune to exactly the files of the matching bucket
    — verified against an independent recomputation of the spec hash
    — and (b) value-hash the oracle's plain WHERE.  Covers the parser,
    the vectorized hash kernel, hive-layout bucket directories, typed
    manifest partition values, and equality-only prune semantics end
    to end."""
    import shutil
    import tempfile

    from connect_spark.functions.murmur3 import bucket_long
    from connect_spark.sinks.iceberg_meta import IcebergTable

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    key = orders.agg(F.min("o_custkey")).collect()[0][0]
    loc = tempfile.mkdtemp(prefix="iceberg_bucket_gate_")
    try:
        t = IcebergTable(spark, loc)
        t.append(orders, partition_by=["bucket(8, o_custkey)"])
        out = t.scan([("o_custkey", "=", key)])
        files = t.current_files()
        want_bucket = bucket_long(int(key), 8)
        n_match = sum(1 for d in files
                      if d["partition"]["o_custkey_bucket"] == want_bucket)
        # explicit raises, not assert (python -O strips asserts)
        if t._last_scan_file_count != n_match:
            raise ValueError(
                "bucket prune kept the wrong file set "
                f"({t._last_scan_file_count} != {n_match})")
        if not t._last_scan_file_count < len(files):
            raise ValueError(
                "bucket pruning did not reduce the file set "
                f"({t._last_scan_file_count}/{len(files)})")
        return out.select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice"), 2).alias("price"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(loc, ignore_errors=True)


ICEBERG_BUCKET_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
FROM orders
WHERE o_custkey = (SELECT min(o_custkey) FROM orders)
"""


QUERIES += [
    QuerySpec(
        "iceberg_bucket_partition_roundtrip",
        iceberg_bucket_partition_roundtrip,
        ICEBERG_BUCKET_SQL,
    ),
]
