"""CDC-suite input kinds + resource/inproc/sftp/ADLS plumbing kinds.

The reference's flagship input family (SURVEY.md §2.D "CDC suite";
docs/modules/components/pages/inputs/{postgres_cdc,mysql_cdc,...}.adoc)
maps onto the repo's streaming CDC DataSource (sources/cdc_stream.py):
snapshot → WAL with composite {snap, lsn} offsets checkpointed through
Spark's offset log. The sandbox has no live databases, so each kind
reads the Debezium-shaped WAL bridge directory named by `wal_path` —
on a cluster the per-DB wire decoder (logical replication / binlog /
LogMiner client) writes that WAL; the Spark plan downstream of it is
exactly what runs here. Envelope metadata matches the reference's
(internal/impl/postgresql/input_pg_stream.go:521-533 — table,
operation, lsn, commit_ts_ms, before).

Config fidelity per kind: the connector's documented identity fields
are required (dsn/url/tables...), table filters apply as Column
predicates on the stream, `stream_snapshot` wires the snapshot phase,
and postgres's `include_transaction_markers: false` (the default)
filters BEGIN/COMMIT marker records exactly as the adoc describes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.plans.pipeline import (
    PipelineConfigError,
    input_kind,
    output_kind,
)


@dataclass(frozen=True)
class CdcKindSpec:
    """One CDC connector config surface."""

    required: tuple[str, ...]  # connector identity fields (dsn/url/…)
    tables_key: str = "tables"  # config key listing captured tables
    cite: str = ""


_CDC_SPECS: dict[str, CdcKindSpec] = {
    # inputs/postgres_cdc.adoc (dsn, slot_name, schema, tables,
    # stream_snapshot, include_transaction_markers)
    "postgres_cdc": CdcKindSpec(("dsn",), cite="inputs/postgres_cdc.adoc"),
    # pg_stream is the deprecated alias of postgres_cdc
    "pg_stream": CdcKindSpec(("dsn",), cite="inputs/pg_stream.adoc"),
    # inputs/mysql_cdc.adoc (flavor, dsn, tables, checkpoint_cache)
    "mysql_cdc": CdcKindSpec(("dsn",), cite="inputs/mysql_cdc.adoc"),
    # inputs/microsoft_sql_server_cdc.adoc
    "microsoft_sql_server_cdc": CdcKindSpec(
        ("dsn",), cite="inputs/microsoft_sql_server_cdc.adoc"),
    # inputs/oracledb_cdc.adoc (LogMiner)
    "oracledb_cdc": CdcKindSpec(("dsn",), cite="inputs/oracledb_cdc.adoc"),
    # inputs/mongodb_cdc.adoc (url, database, collections)
    "mongodb_cdc": CdcKindSpec(
        ("url", "database"), tables_key="collections",
        cite="inputs/mongodb_cdc.adoc"),
    # inputs/aws_dynamodb_cdc.adoc (tables, start_from)
    "aws_dynamodb_cdc": CdcKindSpec(
        (), cite="inputs/aws_dynamodb_cdc.adoc"),
    # inputs/gcp_spanner_cdc.adoc (change streams)
    "gcp_spanner_cdc": CdcKindSpec(
        ("project_id", "instance_id", "database_id", "stream_id"),
        cite="inputs/gcp_spanner_cdc.adoc"),
    # inputs/cockroachdb_changefeed.adoc (dsn, tables, cursor_cache)
    "cockroachdb_changefeed": CdcKindSpec(
        ("dsn",), cite="inputs/cockroachdb_changefeed.adoc"),
    # inputs/tigerbeetle_cdc.adoc
    "tigerbeetle_cdc": CdcKindSpec(
        ("cluster_id",), cite="inputs/tigerbeetle_cdc.adoc"),
    # inputs/salesforce_cdc.adoc (instance_url, change events)
    "salesforce_cdc": CdcKindSpec(
        ("instance_url",), tables_key="channels",
        cite="inputs/salesforce_cdc.adoc"),
}


def _cdc_input(kind: str, spec: CdcKindSpec):
    def build(spark: SparkSession, c: dict) -> DataFrame:
        for k in spec.required:
            if not c.get(k):
                raise PipelineConfigError(
                    f"{kind} input: {k!r} is required ({spec.cite})"
                )
        wal_path = c.get("wal_path")
        if not wal_path:
            raise PipelineConfigError(
                f"{kind} input: no live database connection is available "
                "in this environment; point `wal_path` at the WAL bridge "
                "directory the DB-side decoder writes (sources/"
                "cdc_stream.py documents the record shape)"
            )
        from connect_spark.sources.cdc_stream import register as _reg

        _reg(spark)
        reader = spark.readStream.format("cdc_wal").option("path", wal_path)
        # postgres kinds consume RECORDED pgoutput wire bytes when the
        # WAL directory holds .pgcopy segments (sources/pgoutput.py) —
        # the real logical-decoding format, not the JSONL bridge.
        wal_format = c.get("wal_format")
        if wal_format is None:
            import glob as _glob
            import os as _os

            if kind in ("postgres_cdc", "pg_stream") and _glob.glob(
                _os.path.join(wal_path, "*.pgcopy")
            ):
                wal_format = "pgoutput"
            elif kind == "mysql_cdc" and _glob.glob(
                _os.path.join(wal_path, "*.binlog")
            ):
                wal_format = "binlog"
            elif kind == "oracledb_cdc" and _glob.glob(
                _os.path.join(wal_path, "*.logmnr.jsonl")
            ):
                wal_format = "logminer"
            else:
                # structured-representation kinds: the service's own
                # documented change format (sources/cdc_formats.py)
                from connect_spark.sources.cdc_formats import (
                    open_format_wal,
                )

                if open_format_wal(kind, wal_path) is not None:
                    wal_format = "native"
        if wal_format:
            reader = reader.option("wal_format", wal_format)
            if wal_format == "native":
                reader = reader.option("cdc_kind", kind)
        if c.get("column_names"):
            # binlog TABLE_MAP carries no column names; the reference
            # resolves them from the live schema — offline recordings
            # supply them per table here
            import json as _json

            reader = reader.option(
                "column_names", _json.dumps(c["column_names"]))
        if c.get("stream_snapshot") and c.get("snapshot_path"):
            reader = reader.option("snapshot_path", c["snapshot_path"])
            if c.get("snapshot_lsn") is not None:
                reader = reader.option("snapshot_lsn", c["snapshot_lsn"])
        batch = (
            c.get("snapshot_batch_size")
            or c.get("snapshot_max_batch_size")
            or c.get("read_batch_size")
            or c.get("batch_size")
        )
        if batch:
            reader = reader.option("max_records_per_batch", int(batch))
        df = reader.load()
        tables = c.get(spec.tables_key)
        if tables:
            names = [t.split(".")[-1] for t in tables]
            df = df.filter(F.col("table").isin(names))
        if kind in ("postgres_cdc", "pg_stream", "mysql_cdc") and not c.get(
            "include_transaction_markers", False
        ):
            # binlog recordings also surface QUERY-BEGIN/XID markers;
            # the reference's mysql_cdc emits data rows only
            df = df.filter(~F.col("operation").isin("begin", "commit"))
        return df

    build.__name__ = f"_i_{kind}"
    build.__doc__ = f"{spec.cite} — CDC stream over the WAL bridge " \
        "(module docstring)."
    return build


for _kind, _spec in _CDC_SPECS.items():
    input_kind(_kind)(_cdc_input(_kind, _spec))


# --------------------------------------------------------------------
# named component resources (inputs/resource.adoc, outputs/resource.adoc)
# --------------------------------------------------------------------

# populated by Pipeline.dataframe() from config[input_resources] /
# config[output_resources] — the BUILD-TIME fallback namespace. A
# running stream must not depend on these module dicts (a second
# pipeline's build clears them mid-flight), so delivery-time lookups
# first consult the per-pipeline scope installed via
# resource_scope() around each foreachBatch delivery.
_INPUT_RESOURCES: dict[str, dict] = {}
_OUTPUT_RESOURCES: dict[str, dict] = {}

import contextvars as _contextvars

_RESOURCE_SCOPE: _contextvars.ContextVar = _contextvars.ContextVar(
    "connect_spark_resource_scope", default=None
)


class resource_scope:
    """Context manager pinning a pipeline's (input_resources,
    output_resources) snapshot for the duration of a delivery, so
    `resource` kinds resolve against THIS pipeline's namespace even if
    another Pipeline.dataframe() has since repopulated the module
    registries (round-4 ADVICE: registry wipe mid-stream)."""

    def __init__(self, inputs: dict[str, dict], outputs: dict[str, dict]):
        self._scope = (dict(inputs), dict(outputs))
        self._token = None

    def __enter__(self):
        self._token = _RESOURCE_SCOPE.set(self._scope)
        return self

    def __exit__(self, *exc):
        _RESOURCE_SCOPE.reset(self._token)
        return False


def lookup_input_resource(name: str) -> dict | None:
    scope = _RESOURCE_SCOPE.get()
    if scope is not None and name in scope[0]:
        return scope[0][name]
    return _INPUT_RESOURCES.get(name)


def lookup_output_resource(name: str) -> dict | None:
    scope = _RESOURCE_SCOPE.get()
    if scope is not None and name in scope[1]:
        return scope[1][name]
    return _OUTPUT_RESOURCES.get(name)


@input_kind("resource")
def _i_resource(spark: SparkSession, c) -> DataFrame:
    """inputs/resource.adoc:26 — consume from a named input declared
    under the config's `input_resources` list."""
    from connect_spark.plans.pipeline import _build_input

    name = c if isinstance(c, str) else c["name"]
    spec = lookup_input_resource(name)
    if spec is None:
        raise PipelineConfigError(
            f"unknown input resource {name!r}; known: "
            f"{sorted(_INPUT_RESOURCES)}"
        )
    return _build_input(spark, spec)


@output_kind("resource")
def _o_resource(df: DataFrame, c) -> DataFrame | None:
    """outputs/resource.adoc:26 — write to a named output declared
    under the config's `output_resources` list."""
    from connect_spark.plans.pipeline import _run_output

    name = c if isinstance(c, str) else c["name"]
    spec = lookup_output_resource(name)
    if spec is None:
        raise PipelineConfigError(
            f"unknown output resource {name!r}; known: "
            f"{sorted(_OUTPUT_RESOURCES)}"
        )
    return _run_output(df, spec)


@output_kind("inproc")
def _o_inproc(df: DataFrame, c) -> None:
    """outputs/inproc.adoc:26 — hand the frame to another pipeline by
    name (io_ext.register_inproc is the matching input side)."""
    from connect_spark.plans.io_ext import register_inproc

    name = c if isinstance(c, str) else c["name"]
    register_inproc(name, df)


# --------------------------------------------------------------------
# sftp + azure_data_lake_gen2 (path-scheme file connectors)
# --------------------------------------------------------------------


@input_kind("sftp")
def _i_sftp(spark: SparkSession, c: dict) -> DataFrame:
    """inputs/sftp.adoc:26 — file messages by path glob. Local/hadoop
    paths resolve directly; a true sftp:// remote needs an SFTP-mounted
    filesystem on the cluster (no SFTP client library in this
    environment — the scanner/codec surface is identical either way)."""
    from connect_spark.sources.files import read_file_messages

    paths = c.get("paths") or [c["path"]]
    if len(paths) != 1:
        raise PipelineConfigError("sftp input: exactly one path glob")
    return read_file_messages(
        spark,
        paths[0],
        scanner=c.get("scanner", "lines"),
        scanner_conf=c.get("scanner_conf"),
    )


@output_kind("sftp")
def _o_sftp(df: DataFrame, c: dict) -> None:
    """outputs/sftp.adoc:26 — text-line file output at `path` (same
    filesystem note as the input)."""
    field = c.get("field", "content")
    df.select(F.col(field).cast("string").alias("value")).write.mode(
        c.get("mode", "overwrite")
    ).text(c["path"])


def _register_adls():
    from connect_spark.plans.io_ext import _object_store_output

    output_kind("azure_data_lake_gen2")(_object_store_output("abfss"))


_register_adls()


def _register_kafka_aliases():
    """redpanda_migrator / ockam_kafka are kafka-config supersets
    (inputs/redpanda_migrator.adoc, inputs/ockam_kafka.adoc) — same
    reader plan; migrator-specific schema/ACL sync happens out of band
    (streaming/migrator.py holds the data-plane copy)."""
    from connect_spark.plans.io_ext import _i_kafka, _o_kafka
    from connect_spark.plans.pipeline import INPUT_KINDS, OUTPUT_KINDS

    for alias in ("redpanda_migrator", "ockam_kafka"):
        INPUT_KINDS[alias] = _i_kafka
        OUTPUT_KINDS[alias] = _o_kafka
    for alias in ("kafka_franz", "redpanda", "redpanda_common",
                  "redpanda_migrator", "ockam_kafka"):
        OUTPUT_KINDS.setdefault(alias, _o_kafka)


_register_kafka_aliases()
