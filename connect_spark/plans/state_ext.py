"""Cache-resource kinds, buffer section, metrics + tracer exporters.

Closes §2.I's component lists as YAML config surfaces
(docs/modules/components/pages/{caches,buffers,metrics,tracers}/):

- `cache_resources:` — all 17 documented cache backends resolve to a
  working local implementation: memory (driver map, broadcast-join
  reads), file/object-store kinds (the generational ParquetKVCache —
  the path scheme carries s3a://gs:// on a cluster), lru/ttlru
  (max_items / ttl+max_items bounds), multilevel (memory→parquet
  two-level), noop, and sql (a REAL external database: DuckDB storage
  file with its own transactions, mirroring cache_sql.go). The
  networked KV services (redis, memcached, mongodb, couchbase,
  nats_kv, redpanda, ristretto, aws_dynamodb, aws_s3,
  gcp_cloud_storage) share the ParquetKVCache store with their
  documented config fields validated — a cluster impl swaps the
  client behind the same `Cache` interface.
- `buffer:` — none (default), memory (persist the staged plan),
  spool/sqlite (decouple through the at-least-once parquet spool,
  buffer_sqlite.go:41-47 semantics), system_window (stamp
  window_start/window_end_timestamp columns per
  buffers/system_window.adoc:130-214 so downstream group-by-window
  aggregation matches the reference's windowed batches).
- `metrics:` exporters — prometheus / json_api / logger (existing
  observability.py formats), statsd (real UDP datagrams in the statsd
  wire format), influxdb (line protocol through the injectable
  transport), aws_cloudwatch + open_telemetry_collector (documented
  JSON bodies through the transport), none.
- `tracer:` — one span per pipeline run (name, trace/span ids,
  wall-clock) exported as OTLP/JSON through the transport
  (open_telemetry_collector, gcp_cloudtrace, jaeger — jaeger ingests
  OTLP natively), onto the local bus (redpanda), or dropped (none).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.plans.pipeline import PipelineConfigError
from connect_spark.state.cache import ParquetKVCache, TwoLevelKVCache


# --------------------------------------------------------------------
# cache backends
# --------------------------------------------------------------------


class MemoryKVCache:
    """caches/memory.adoc — per-instance in-process map. Reads join
    through a broadcast local frame; the entry cap bounds driver
    memory (the reference's memory cache is equally process-local)."""

    def __init__(self, spark: SparkSession, key: str = "key",
                 cap: int = 65536):
        self.spark = spark
        self.key = key
        self.cap = cap
        self._rows: dict[Any, dict] = {}

    def read(self) -> DataFrame | None:
        if not self._rows:
            return None
        return self.spark.createDataFrame(list(self._rows.values()))

    def _ingest(self, rows: DataFrame, only_absent: bool) -> None:
        new = [r.asDict() for r in rows.collect()]
        for r in new:
            k = r[self.key]
            if only_absent and k in self._rows:
                continue
            self._rows[k] = r
        if len(self._rows) > self.cap:
            raise PipelineConfigError(
                f"memory cache exceeded cap={self.cap} entries; use a "
                "path-backed cache kind for unbounded key spaces"
            )

    def set(self, rows: DataFrame, ttl: float | None = None) -> None:
        self._ingest(rows, only_absent=False)

    def add(self, rows: DataFrame, ttl: float | None = None) -> None:
        self._ingest(rows, only_absent=True)

    def get(self, df: DataFrame, on: str | None = None) -> DataFrame:
        on = on or self.key
        stored = self.read()
        if stored is None:
            return df
        lookup = stored.withColumnRenamed(self.key, on)
        return df.join(F.broadcast(lookup), on, "left")

    def delete(self, keys: DataFrame) -> None:
        for r in keys.collect():
            self._rows.pop(r[self.key], None)


class NoopCache:
    """caches/noop.adoc — accepts writes, returns nothing."""

    key = "key"

    def read(self):
        return None

    def set(self, rows, ttl=None):
        return None

    add = set

    def get(self, df, on=None):
        return df

    def delete(self, keys):
        return None


class DuckKVCache:
    """caches/sql.adoc (internal/impl/sql/cache_sql.go) — key/value
    table in a REAL external database (DuckDB storage file, its own
    transactions). Values are JSON documents; get() joins the decoded
    table back broadcast-style."""

    def __init__(self, spark: SparkSession, database: str,
                 table: str = "kv_cache", key: str = "key"):
        self.spark = spark
        self.database = database
        self.table = table
        self.key = key
        self._exec(
            f"CREATE TABLE IF NOT EXISTS {self.table} "
            "(k VARCHAR PRIMARY KEY, doc VARCHAR)"
        )

    def _exec(self, sql: str, args: list | None = None):
        import duckdb

        con = duckdb.connect(self.database)
        try:
            res = con.execute(sql, args or [])
            out = res.fetchall() if sql.lstrip().upper().startswith(
                "SELECT") else None
            con.commit()
            return out
        finally:
            con.close()

    def _exec_many(self, sql: str, rows: list[list]):
        """One connection + one transaction for a whole batch (a
        per-row connect against the storage file is pure overhead)."""
        if not rows:
            return
        import duckdb

        con = duckdb.connect(self.database)
        try:
            con.executemany(sql, rows)
            con.commit()
        finally:
            con.close()

    def read(self) -> DataFrame | None:
        rows = self._exec(f"SELECT k, doc FROM {self.table}")
        if not rows:
            return None
        docs = [dict(json.loads(doc), **{self.key: k}) for k, doc in rows]
        return self.spark.createDataFrame(docs)

    def _kv_rows(self, rows: DataFrame) -> list[list]:
        out = []
        for r in rows.collect():
            d = r.asDict()
            k = str(d.pop(self.key))
            out.append([k, json.dumps(d, default=str)])
        return out

    def set(self, rows: DataFrame, ttl: float | None = None) -> None:
        self._exec_many(
            f"INSERT OR REPLACE INTO {self.table} VALUES (?, ?)",
            self._kv_rows(rows),
        )

    def add(self, rows: DataFrame, ttl: float | None = None) -> None:
        self._exec_many(
            f"INSERT INTO {self.table} SELECT ?, ? WHERE NOT EXISTS "
            f"(SELECT 1 FROM {self.table} WHERE k = ?)",
            [[k, doc, k] for k, doc in self._kv_rows(rows)],
        )

    def get(self, df: DataFrame, on: str | None = None) -> DataFrame:
        on = on or self.key
        stored = self.read()
        if stored is None:
            return df
        lookup = stored.withColumnRenamed(self.key, on)
        return df.join(F.broadcast(lookup), on, "left")

    def delete(self, keys: DataFrame) -> None:
        self._exec_many(
            f"DELETE FROM {self.table} WHERE k = ?",
            [[str(r[self.key])] for r in keys.collect()],
        )


# label -> live cache instance, populated per plan build
_CACHE_RESOURCES: dict[str, Any] = {}

# path-backed service kinds: kind -> required identity fields
_SERVICE_CACHE_KINDS: dict[str, tuple[str, ...]] = {
    "file": (),
    "aws_s3": ("bucket",),
    "gcp_cloud_storage": ("bucket",),
    "aws_dynamodb": ("table",),
    "redis": ("url",),
    "memcached": ("addresses",),
    "mongodb": ("url", "database", "collection"),
    "couchbase": ("url", "bucket"),
    "nats_kv": ("bucket",),
    "redpanda": ("topic",),
    "ristretto": (),
}


def build_cache(spark: SparkSession, spec: dict) -> Any:
    """Build one cache backend from a `{kind: conf}` resource spec."""
    (kind, c), = spec.items()
    c = c or {}
    key = c.get("key_column", "key")
    if kind == "memory":
        return MemoryKVCache(spark, key=key,
                             cap=int(c.get("cap", 65536)))
    if kind == "noop":
        return NoopCache()
    if kind == "lru":
        # caches/lru.adoc — in-process LRU; `path` opts into the
        # parquet-backed spill variant, otherwise memory-resident
        # like the reference (`lru: {}` in its own test corpus)
        if "path" not in c:
            return MemoryKVCache(spark, key=key,
                                 cap=int(c.get("cap", 1024)))
        return ParquetKVCache(
            spark, c["path"], key=key, max_items=int(c.get("cap", 1024)))
    if kind == "ttlru":
        if "path" not in c:
            return MemoryKVCache(spark, key=key,
                                 cap=int(c.get("cap", 1024)))
        return ParquetKVCache(
            spark, c["path"], key=key,
            ttl=float(c.get("default_ttl", c.get("ttl", 300))),
            max_items=int(c.get("cap", 1024)))
    if kind == "multilevel":
        return TwoLevelKVCache(
            spark, c["path"], key=key, ttl=c.get("ttl"))
    if kind == "sql":
        return DuckKVCache(
            spark, c["database"], table=c.get("table", "kv_cache"),
            key=key)
    if kind in _SERVICE_CACHE_KINDS:
        for f in _SERVICE_CACHE_KINDS[kind]:
            if not c.get(f):
                raise PipelineConfigError(
                    f"{kind} cache: {f!r} is required (caches/{kind}.adoc)"
                )
        path = c.get("store_path") or c.get("path")
        if not path:
            raise PipelineConfigError(
                f"{kind} cache: `store_path` names the local store "
                "(a cluster impl swaps the service client)"
            )
        return ParquetKVCache(
            spark, path, key=key, ttl=c.get("ttl"),
            max_items=c.get("max_items"))
    raise PipelineConfigError(f"unknown cache kind {kind!r}")


def register_cache_resources(spark: SparkSession, config: dict) -> None:
    """Populate the label → cache-instance registry from
    `cache_resources:` (called by Pipeline.dataframe())."""
    _CACHE_RESOURCES.clear()
    for item in config.get("cache_resources", []):
        item = dict(item)
        label = item.pop("label")
        _CACHE_RESOURCES[label] = build_cache(spark, item)


def get_cache_resource(label: str) -> Any:
    cache = _CACHE_RESOURCES.get(label)
    if cache is None:
        raise PipelineConfigError(
            f"unknown cache resource {label!r}; known: "
            f"{sorted(_CACHE_RESOURCES)}"
        )
    return cache


# --------------------------------------------------------------------
# buffer section
# --------------------------------------------------------------------


def _window_duration(d: str) -> str:
    """Benthos duration (`1h`, `30m`, `500ms`) or Spark interval
    (`1 hour`) → Spark interval string for F.window."""
    from connect_spark.operators.batching import parse_period

    try:
        sec = parse_period(str(d))
    except ValueError:
        return str(d)  # already a Spark interval ("1 hour")
    if sec == int(sec):
        return f"{int(sec)} seconds"
    return f"{int(sec * 1000)} milliseconds"


def _system_window_ts(df: DataFrame, c: dict) -> "F.Column":
    """The window-allocation timestamp for the system_window buffer:
    `timestamp_mapping` (system_window.adoc:130-143 — a Bloblang
    mapping whose root is unix seconds or an ISO 8601 string), or the
    legacy `timestamp_field` shortcut. Coerced by the expression's
    actual type; unparseable values yield null (→ message dropped)."""
    from pyspark.sql import types as T

    from connect_spark.bloblang import ast as A
    from connect_spark.bloblang.compiler import Compiler
    from connect_spark.bloblang.parser import parse_mapping

    if "timestamp_mapping" in c:
        ast = parse_mapping(c["timestamp_mapping"])
        assigns = [
            st for st in ast.statements if isinstance(st, A.Assign)
        ]
        if len(assigns) != 1 or assigns[0].path:
            raise PipelineConfigError(
                "timestamp_mapping must be a single `root = <expr>`"
            )
        col = Compiler().col(assigns[0].expr)
    else:
        col = F.col(c.get("timestamp_field", "ts"))
    dtype = df.select(col.alias("_t")).schema[0].dataType
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType,
                          T.DateType)):
        return col.cast("timestamp")
    if isinstance(dtype, (T.LongType, T.IntegerType, T.DoubleType,
                          T.FloatType, T.DecimalType)):
        return F.timestamp_seconds(col.cast("double"))
    s = col.cast("string")
    return F.coalesce(
        F.try_to_timestamp(s),
        F.timestamp_seconds(s.try_cast("double")),
    )


def apply_buffer(df: DataFrame, spec: dict | str | None) -> DataFrame:
    """`buffer:` between input and pipeline (module docstring)."""
    if spec is None or spec == "none":
        return df
    if isinstance(spec, str):
        spec = {spec: {}}
    (kind, c), = spec.items()
    c = c or {}
    if kind == "none":
        return df
    if df.isStreaming and kind in ("memory", "sqlite", "spool"):
        raise PipelineConfigError(
            f"buffer {kind!r} materializes the frame, which a streaming "
            "plan cannot do mid-query — Structured Streaming's "
            "checkpoint+replay already provides the decoupling these "
            "buffers exist for (use buffer: none or system_window on "
            "streams)"
        )
    if kind == "memory":
        # buffers/memory.adoc — decouple input from processors by
        # materializing into executor memory
        return df.persist()
    if kind in ("sqlite", "spool"):
        # buffers/sqlite.adoc — at-least-once disk spool
        # (state/spool.py mirrors buffer_sqlite.go:41-47)
        from connect_spark.state.spool import ParquetSpool

        spool = ParquetSpool(df.sparkSession, c["path"])
        spool.enqueue(df)
        out = spool.read_pending()
        return df.limit(0) if out is None else out
    if kind == "system_window":
        # buffers/system_window.adoc — stamp each message with its
        # tumbling/sliding window. `timestamp_mapping` (adoc:130-143)
        # is a Bloblang mapping yielding unix seconds (decimals ok) or
        # an ISO 8601 string; an invalid/failed timestamp DROPS the
        # message (adoc:141 "the message will be dropped"). The window
        # bounds land both as columns (batch keys for batch_index/
        # from_all) and as the reference's `window_end_timestamp`
        # metadata field, an RFC3339 string (adoc:47).
        ts_col = _system_window_ts(df, c)
        size = _window_duration(c.get("size", "1 hour"))
        slide = c.get("slide")
        w = (
            F.window(ts_col, size, _window_duration(slide))
            if slide
            else F.window(ts_col, size)
        )
        out = df.filter(ts_col.isNotNull()).withColumn("_w", w)
        out = (
            out.withColumn("window_start", F.col("_w.start"))
            .withColumn("window_end_timestamp", F.col("_w.end"))
            .drop("_w")
        )
        end_rfc3339 = F.date_format(
            F.col("window_end_timestamp"), "yyyy-MM-dd'T'HH:mm:ssXXX"
        )
        from connect_spark.bloblang.compiler import META_COL

        if META_COL not in out.columns:
            out = out.withColumn(
                META_COL, F.create_map().cast("map<string,string>")
            )
        return out.withColumn(
            META_COL,
            F.map_concat(
                F.map_filter(
                    F.col(META_COL),
                    lambda k, _v: k != F.lit("window_end_timestamp"),
                ),
                F.create_map(
                    F.lit("window_end_timestamp"), end_rfc3339
                ),
            ),
        )
    raise PipelineConfigError(f"unknown buffer kind {kind!r}")


# --------------------------------------------------------------------
# metrics exporters
# --------------------------------------------------------------------


def export_metrics(spec: dict | str | None) -> str | None:
    """`metrics:` exporter dispatch; returns the exported text where
    the format has one (prometheus/logger/influxdb lines)."""
    if spec is None:
        return None
    if isinstance(spec, str):
        spec = {spec: {}}
    (kind, c), = spec.items()
    c = c or {}
    from connect_spark.observability import (
        _metric_snapshot,
        json_api_stats,
        logger_lines,
        prometheus_exposition,
    )

    if kind == "none":
        return None
    if kind == "prometheus":
        return prometheus_exposition(c.get("prefix", "connect_spark"))
    if kind == "json_api":
        return json.dumps(json_api_stats(), sort_keys=True)
    if kind == "logger":
        lines = logger_lines(c.get("level", "INFO"))
        for line in lines:
            print(line)
        return "\n".join(lines)
    if kind == "statsd":
        # metrics/statsd.adoc — gauge datagrams over UDP (real socket)
        import socket

        address = c.get("address", "127.0.0.1:8125")
        host, sep, port = address.rpartition(":")
        if not sep or not port.isdigit():
            host, port = address, "8125"  # statsd default port
        if not host:
            raise PipelineConfigError(
                f"statsd metrics: address must be host[:port], "
                f"got {address!r}"
            )
        prefix = c.get("prefix", "connect_spark")
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        lines = [
            f"{prefix}.{name}:{value}|g"
            for name, value in sorted(_metric_snapshot().items())
        ]
        try:
            for line in lines:
                sock.sendto(line.encode(), (host, int(port)))
        finally:
            sock.close()
        return "\n".join(lines)
    if kind == "influxdb":
        # metrics/influxdb.adoc — line protocol via the transport
        from connect_spark.plans.saas_ext import _row_transport

        prefix = c.get("prefix", "connect_spark")
        lines = [
            f"{prefix} {name}={value}"
            for name, value in sorted(_metric_snapshot().items())
        ]
        body = "\n".join(lines)
        if c.get("url"):
            t = _row_transport(c)
            t(c["url"].rstrip("/") + "/write", "POST", {}, body)
        return body
    if kind in ("aws_cloudwatch", "open_telemetry_collector"):
        # PutMetricData / OTLP-metrics JSON bodies via the transport
        from connect_spark.plans.saas_ext import _row_transport

        snapshot = _metric_snapshot()
        if kind == "aws_cloudwatch":
            body = json.dumps({
                "Namespace": c.get("namespace", "connect_spark"),
                "MetricData": [
                    {"MetricName": k, "Value": v}
                    for k, v in sorted(snapshot.items())
                ],
            })
        else:
            body = json.dumps({"resourceMetrics": [{"scopeMetrics": [{
                "metrics": [
                    {"name": k, "gauge": {"dataPoints": [
                        {"asDouble": v}]}}
                    for k, v in sorted(snapshot.items())
                ],
            }]}]})
        if c.get("url"):
            t = _row_transport(c)
            t(c["url"], "POST", {"Content-Type": "application/json"}, body)
        return body
    raise PipelineConfigError(f"unknown metrics kind {kind!r}")


# --------------------------------------------------------------------
# tracers
# --------------------------------------------------------------------


def emit_trace_span(spec: dict | str | None, name: str,
                    started: float, finished: float) -> dict | None:
    """`tracer:` — export one pipeline-run span (module docstring)."""
    if spec is None:
        return None
    if isinstance(spec, str):
        spec = {spec: {}}
    (kind, c), = spec.items()
    c = c or {}
    if kind == "none":
        return None
    import hashlib

    digest = hashlib.sha256(f"{name}:{started}".encode()).hexdigest()
    span = {
        "traceId": digest[:32],
        "spanId": digest[32:48],
        "name": name,
        "startTimeUnixNano": int(started * 1e9),
        "endTimeUnixNano": int(finished * 1e9),
    }
    envelope = json.dumps({"resourceSpans": [{"scopeSpans": [{
        "spans": [span]}]}]})
    if kind in ("open_telemetry_collector", "gcp_cloudtrace", "jaeger"):
        # all three ingest OTLP (jaeger natively since v1.35; cloud
        # trace via the otel exporter)
        if c.get("url"):
            from connect_spark.plans.saas_ext import _row_transport

            t = _row_transport(c)
            t(c["url"].rstrip("/") + "/v1/traces", "POST",
              {"Content-Type": "application/json"}, envelope)
        return span
    if kind == "redpanda":
        # tracer_redpanda.go — spans publish to a topic; local bus
        from connect_spark.sources.mq import MessageBus

        MessageBus(c["bus_path"]).publish(
            c.get("topic", "_connect_traces"), [span])
        return span
    raise PipelineConfigError(f"unknown tracer kind {kind!r}")


__all__ = [
    "MemoryKVCache", "NoopCache", "DuckKVCache", "build_cache",
    "register_cache_resources", "get_cache_resource", "apply_buffer",
    "export_metrics", "emit_trace_span",
]
