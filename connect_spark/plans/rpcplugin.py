"""Out-of-process plugin components (reference
`internal/rpcplugin/{config,input,processor,output}.go` +
`subprocess/subprocess.go`): users declare custom inputs, processors
and outputs in a `plugin.yaml` manifest — name, command, config field
specs — and the engine hosts the component as a child process,
registered as a first-class kind usable from any pipeline YAML.

Wire protocol: the reference speaks gRPC/protobuf over a unix socket
(`runtimepb/*.proto`, REDPANDA_CONNECT_PLUGIN_ADDRESS); this repo
speaks newline-delimited JSON over stdin/stdout — the same RPC
surface (init / connect / read_batch / ack / process_batch /
write_batch / close), the same message model (bytes OR structured
payload + metadata, `runtimepb/message.pb.go`), the same error model
(message + not_connected / end_of_input / backoff detail,
`runtimepb/error.go`), and the same crash-restart contract
(`processor.go:162-183`: up to 3 restart attempts per call) — chosen
so plugins need zero dependencies in ANY language.

Spark-first hosting:
- processor plugins run INSIDE ``mapInPandas`` — one child per
  executor-core partition stream, Arrow batches converted to message
  batches. At 100 TB each core streams its partition through its own
  child; no shuffle, no driver round-trip (the reference hosts ONE
  process for the whole stream — this scales out instead).
- output plugins likewise: one child per partition, `write_batch`
  per Arrow batch, a one-row-per-partition count collected as the
  commit record (the repo's standard distributed-sink shape).
- input plugins run on the driver like the reference's single plugin
  process (a source has no upstream partitioning to inherit); the
  read loop acks batch-by-batch and a declared `output_schema` turns
  structured payloads into typed columns.
"""

from __future__ import annotations

import base64
import glob as _glob
import json
import os
import subprocess
import sys
import time
from collections.abc import Iterator
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from connect_spark.plans.pipeline import PipelineConfigError

PROTOCOL_ENV = "CONNECT_SPARK_PLUGIN_PROTOCOL"
PROTOCOL_VERSION = "ndjson-stdio/1"

_FIELD_TYPES = ("string", "int", "float", "bool", "unknown")
_FIELD_KINDS = ("scalar", "list", "map")
_COMPONENT_TYPES = ("input", "processor", "output")
_RETRY_COUNT = 3  # processor.go `retryCount`
_BACKOFF_MAX_RETRIES = 64   # cap on consecutive backoff signals
_BACKOFF_CAP_S = 5.0        # per-sleep ceiling (defensive)

# (type, name) → realpath of the manifest that registered it; lets
# discover_and_register_plugins detect duplicate names while staying
# idempotent for re-discovery of the same file.
_REGISTERED_PLUGINS: dict[tuple, str] = {}


def _requested_backoff_s(exc: "PluginError"):
    """The backoff interval (seconds) a plugin requested via the
    runtimepb error detail {'backoff_ms': n}, else None."""
    d = exc.detail
    if isinstance(d, dict) and "backoff_ms" in d:
        try:
            return min(max(float(d["backoff_ms"]), 0.0) / 1000.0,
                       _BACKOFF_CAP_S)
        except (TypeError, ValueError):
            return None
    return None


def _call_with_backoff(client: "PluginClient", method: str, **kw):
    """Issue an RPC, honoring plugin-requested backoff (error.go's
    NewBackOffError): sleep the requested interval and retry, up to
    _BACKOFF_MAX_RETRIES consecutive signals."""
    for _ in range(_BACKOFF_MAX_RETRIES):
        try:
            return client.call(method, **kw)
        except PluginError as exc:
            delay = _requested_backoff_s(exc)
            if delay is None:
                raise
            time.sleep(delay)
    raise PluginError(
        f"plugin kept signaling backoff for {method!r} "
        f"({_BACKOFF_MAX_RETRIES} consecutive attempts)")


class PluginError(RuntimeError):
    """Error returned by a plugin over the wire (runtimepb/error.go):
    `detail` is None, 'not_connected', 'end_of_input', or
    {'backoff_ms': n}."""

    def __init__(self, message: str, detail: Any = None):
        super().__init__(message or "unknown error")
        self.detail = detail

    @property
    def end_of_input(self) -> bool:
        return self.detail == "end_of_input"

    @property
    def not_connected(self) -> bool:
        return self.detail == "not_connected"


class PluginCrashed(RuntimeError):
    """The child process died mid-call (triggers the restart path)."""


# --------------------------------------------------------------------
# manifest (config.go)
# --------------------------------------------------------------------


@dataclass(frozen=True)
class FieldSpec:
    """One `fields:` entry (config.go:72-79 FieldConfig)."""

    name: str
    description: str = ""
    type: str = "unknown"
    kind: str = "scalar"
    default: Any = None
    has_default: bool = False
    advanced: bool = False

    def validate(self) -> None:
        if not self.name:
            raise PipelineConfigError("field name is required")
        if self.type not in _FIELD_TYPES:
            raise PipelineConfigError(
                f"invalid field type: {self.type!r} "
                f"(valid: {_FIELD_TYPES})")
        if self.kind not in _FIELD_KINDS:
            raise PipelineConfigError(
                f"invalid field kind: {self.kind!r} "
                f"(valid: {_FIELD_KINDS})")

    def coerce(self, value: Any) -> Any:
        """Scalar type checks mirroring service.New*Field parsing."""
        def one(v: Any) -> Any:
            if self.type == "string":
                if not isinstance(v, str):
                    raise PipelineConfigError(
                        f"field {self.name!r} expects a string, "
                        f"got {v!r}")
                return v
            if self.type == "int":
                if isinstance(v, bool) or not isinstance(v, int):
                    raise PipelineConfigError(
                        f"field {self.name!r} expects an int, got {v!r}")
                return v
            if self.type == "float":
                if isinstance(v, bool) or not isinstance(
                        v, (int, float)):
                    raise PipelineConfigError(
                        f"field {self.name!r} expects a float, "
                        f"got {v!r}")
                return float(v)
            if self.type == "bool":
                if not isinstance(v, bool):
                    raise PipelineConfigError(
                        f"field {self.name!r} expects a bool, got {v!r}")
                return v
            return v  # unknown: any

        if self.kind == "list":
            if not isinstance(value, list):
                raise PipelineConfigError(
                    f"field {self.name!r} expects a list, got {value!r}")
            return [one(v) for v in value]
        if self.kind == "map":
            if not isinstance(value, dict):
                raise PipelineConfigError(
                    f"field {self.name!r} expects a map, got {value!r}")
            return {k: one(v) for k, v in value.items()}
        return one(value)


@dataclass(frozen=True)
class PluginManifest:
    """plugin.yaml (config.go:196-206 Config).  `output_schema` is a
    repo extension: a Spark DDL string typing the plugin's structured
    output (absent → `content` string + `metadata` map columns)."""

    name: str
    command: list[str]
    type: str
    summary: str = ""
    description: str = ""
    cwd: str = ""
    fields: list[FieldSpec] = field(default_factory=list)
    output_schema: str = ""
    protocol: str = "ndjson"

    def validate(self) -> None:
        if not self.name:
            raise PipelineConfigError("plugin name is required")
        if not self.command:
            raise PipelineConfigError("plugin command is required")
        if self.type not in _COMPONENT_TYPES:
            raise PipelineConfigError(
                f"unexpected plugin type, valid options "
                f"{list(_COMPONENT_TYPES)}, got: {self.type!r}")
        if self.protocol not in ("ndjson", "arrow"):
            raise PipelineConfigError(
                f"unexpected plugin protocol, valid options "
                f"['ndjson', 'arrow'], got: {self.protocol!r}")
        if (self.protocol == "arrow"
                and self.type in ("input", "processor")
                and not self.output_schema):
            raise PipelineConfigError(
                "protocol: arrow requires output_schema (the child "
                "returns typed Arrow batches, not generic JSON "
                "messages)")
        for f in self.fields:
            f.validate()

    def parse_config(self, conf: Any) -> dict[str, Any]:
        """Apply field specs to the YAML component config: defaults
        filled, required fields enforced, scalar types checked.  With
        no declared fields the raw mapping passes through (config.go
        falls back to a single any-typed object field)."""
        conf = dict(conf or {})
        if not self.fields:
            return conf
        out: dict[str, Any] = {}
        for f in self.fields:
            if f.name in conf:
                out[f.name] = f.coerce(conf.pop(f.name))
            elif f.has_default:
                out[f.name] = f.default
            else:
                raise PipelineConfigError(
                    f"plugin {self.name!r}: required field "
                    f"{f.name!r} is missing")
        if conf:
            raise PipelineConfigError(
                f"plugin {self.name!r}: unknown fields "
                f"{sorted(conf)}")
        return out


def parse_manifest(doc: dict[str, Any], path: str = "") -> PluginManifest:
    fields = []
    for fd in doc.get("fields") or []:
        fields.append(FieldSpec(
            name=fd.get("name", ""),
            description=fd.get("description", ""),
            type=fd.get("type") or "unknown",
            kind=fd.get("kind") or "scalar",
            default=fd.get("default"),
            has_default="default" in fd,
            advanced=bool(fd.get("advanced", False)),
        ))
    cwd = doc.get("cwd") or ""
    if path:
        # config.go setDefaultCWD: relative cwd resolves against the
        # manifest's directory; empty cwd IS the manifest's directory
        base = os.path.dirname(os.path.abspath(path))
        cwd = os.path.join(base, cwd) if cwd and not os.path.isabs(
            cwd) else (cwd or base)
    m = PluginManifest(
        name=doc.get("name", ""),
        command=list(doc.get("command") or []),
        type=doc.get("type", ""),
        summary=doc.get("summary", ""),
        description=doc.get("description", ""),
        cwd=cwd,
        fields=fields,
        output_schema=doc.get("output_schema", ""),
        protocol=doc.get("protocol", "ndjson"),
    )
    m.validate()
    return m


# --------------------------------------------------------------------
# wire client (subprocess/subprocess.go + the runtimepb services)
# --------------------------------------------------------------------


class PluginClient:
    """One child process speaking NDJSON-RPC on stdio.  Lives either
    on the driver (input plugins) or inside a mapInPandas partition
    stream (processor/output plugins)."""

    def __init__(self, command: list[str], cwd: str = "",
                 env: dict[str, str] | None = None):
        self.command = command
        self.cwd = cwd or None
        self.extra_env = env or {}
        self.proc: subprocess.Popen | None = None
        self._id = 0

    def start(self) -> None:
        if self.proc is not None and self.proc.poll() is None:
            return  # subprocess.go ErrProcessAlreadyStarted → no-op
        env = dict(os.environ)
        env[PROTOCOL_ENV] = PROTOCOL_VERSION
        env.update(self.extra_env)
        try:
            self.proc = subprocess.Popen(
                self.command,
                cwd=self.cwd,
                env=env,
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                stderr=sys.stderr.fileno() if hasattr(
                    sys.stderr, "fileno") else None,
                text=True,
            )
        except OSError as exc:
            raise PipelineConfigError(
                f"invalid subprocess {self.command!r}: {exc}") from exc

    @property
    def running(self) -> bool:
        return self.proc is not None and self.proc.poll() is None

    def call(self, method: str, **params: Any) -> dict[str, Any]:
        if self.proc is None:
            raise PluginCrashed("plugin process not started")
        self._id += 1
        req = {"id": self._id, "method": method, "params": params}
        try:
            self.proc.stdin.write(json.dumps(req) + "\n")
            self.proc.stdin.flush()
            line = self.proc.stdout.readline()
        except (BrokenPipeError, OSError) as exc:
            raise PluginCrashed(f"plugin pipe broke: {exc}") from exc
        if not line:
            raise PluginCrashed(
                f"plugin exited (rc={self.proc.poll()}) during "
                f"{method!r}")
        resp = json.loads(line)
        err = resp.get("error")
        if err:
            raise PluginError(err.get("message", ""), err.get("detail"))
        return resp.get("result") or {}

    def close(self, graceful: bool = True) -> None:
        if self.proc is None:
            return
        if graceful and self.running:
            try:
                self.call("close")
            except (PluginError, PluginCrashed):
                pass
        try:
            if self.proc.stdin:
                self.proc.stdin.close()
            self.proc.wait(timeout=10)
        except Exception:
            self.proc.kill()
        self.proc = None


class ArrowPluginClient(PluginClient):
    """`protocol: arrow` twin of PluginClient (r12 verdict task #5):
    each message is one JSON header line plus an optional binary
    Arrow-IPC stream body of exactly `body_len` bytes — no per-row
    JSON encode, no base64 inflation (the reference's own wire,
    runtimepb, is binary protobuf).  Batch-bearing calls ship the
    partition's Arrow data verbatim; control calls (init/connect/
    ack/close) are header-only."""

    def start(self) -> None:
        if self.proc is not None and self.proc.poll() is None:
            return
        env = dict(os.environ)
        env[PROTOCOL_ENV] = "arrow-stdio/1"
        env.update(self.extra_env)
        try:
            self.proc = subprocess.Popen(
                self.command,
                cwd=self.cwd,
                env=env,
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                stderr=sys.stderr.fileno() if hasattr(
                    sys.stderr, "fileno") else None,
            )  # binary pipes
        except OSError as exc:
            raise PipelineConfigError(
                f"invalid subprocess {self.command!r}: {exc}") from exc

    def call(self, method: str, **params: Any) -> dict[str, Any]:
        result, _ = self.call_arrow(method, body=None, **params)
        return result

    def call_arrow(self, method: str, body=None, **params: Any):
        """Returns (result dict, pyarrow.Table body or None)."""
        import pyarrow as pa

        if self.proc is None:
            raise PluginCrashed("plugin process not started")
        self._id += 1
        header: dict[str, Any] = {"id": self._id, "method": method,
                                  "params": params}
        payload = b""
        if body is not None:
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, body.schema) as writer:
                writer.write_table(body)
            payload = sink.getvalue().to_pybytes()
            header["body_len"] = len(payload)
        try:
            self.proc.stdin.write(
                json.dumps(header).encode() + b"\n")
            if payload:
                self.proc.stdin.write(payload)
            self.proc.stdin.flush()
            line = self.proc.stdout.readline()
        except (BrokenPipeError, OSError) as exc:
            raise PluginCrashed(f"plugin pipe broke: {exc}") from exc
        if not line:
            raise PluginCrashed(
                f"plugin exited (rc={self.proc.poll()}) during "
                f"{method!r}")
        resp = json.loads(line)
        out_body = None
        body_len = int(resp.get("body_len") or 0)
        if body_len:
            data = self.proc.stdout.read(body_len)
            if data is None or len(data) < body_len:
                raise PluginCrashed(
                    f"plugin truncated arrow body during {method!r}")
            out_body = pa.ipc.open_stream(data).read_all()
        err = resp.get("error")
        if err:
            raise PluginError(err.get("message", ""),
                              err.get("detail"))
        return resp.get("result") or {}, out_body


# --------------------------------------------------------------------
# message model (runtimepb/message.pb.go + convert.go)
# --------------------------------------------------------------------


def _rows_to_messages(pdf) -> list[dict[str, Any]]:
    """One structured message per DataFrame row (MessageToProto: the
    whole row object is the structured payload; bytes columns go
    base64 inside it)."""
    msgs = []
    for rec in pdf.to_dict(orient="records"):
        clean = {}
        for k, v in rec.items():
            if isinstance(v, (bytes, bytearray)):
                clean[k] = base64.b64encode(bytes(v)).decode()
            elif hasattr(v, "item"):  # numpy scalar
                v = v.item()
                clean[k] = None if v != v else v  # NaN → null
            else:
                clean[k] = v
        msgs.append({"structured": clean, "metadata": {}})
    return msgs


def _message_content(msg: dict[str, Any]) -> str:
    """Flatten one wire message to its string form: structured →
    compact JSON, bytes → utf-8 text (ProtoToMessage's two payload
    arms)."""
    if "bytes_b64" in msg:
        return base64.b64decode(msg["bytes_b64"]).decode(
            "utf-8", "replace")
    return json.dumps(msg.get("structured"), sort_keys=True,
                      separators=(",", ":"))


_GENERIC_SCHEMA = T.StructType([
    T.StructField("content", T.StringType()),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
])


def _messages_to_pdf(msgs: list[dict[str, Any]]):
    import pandas as pd

    return pd.DataFrame({
        "content": [_message_content(m) for m in msgs],
        "metadata": [
            {str(k): str(v) for k, v in (m.get("metadata") or {}).items()}
            for m in msgs
        ],
    })


def _typed_output(df: DataFrame, ddl: str) -> DataFrame:
    """Project the generic (content, metadata) frame through the
    manifest's output_schema DDL: typed columns, JSON parsed on the
    JVM side (from_json — no second Python hop)."""
    parsed = F.from_json(F.col("content"), ddl)
    names = [f.name for f in T._parse_datatype_string(ddl).fields]
    return df.select(
        *[parsed[n].alias(n) for n in names])


# --------------------------------------------------------------------
# hosts
# --------------------------------------------------------------------


def _start_and_init(client: PluginClient, cfg: dict[str, Any]) -> None:
    client.start()
    client.call("init", config=cfg)


def make_input_plugin(manifest: PluginManifest):
    """input.go: Init → Connect → ReadBatch/Ack loop → Close; the
    end_of_input error detail terminates the read (a bounded source,
    like the reference's plugin inputs driven to completion)."""

    def build(spark: SparkSession, conf: Any) -> DataFrame:
        cfg = manifest.parse_config(conf)
        if manifest.protocol == "arrow":
            return _arrow_input(spark, manifest, cfg)
        client = PluginClient(manifest.command, manifest.cwd)
        msgs: list[dict[str, Any]] = []
        try:
            _start_and_init(client, cfg)
            client.call("connect")
            while True:
                try:
                    resp = _call_with_backoff(client, "read_batch")
                except PluginError as exc:
                    if exc.end_of_input:
                        break
                    raise
                batch = (resp.get("batch") or {}).get("messages") or []
                msgs.extend(batch)
                client.call("ack", batch_id=resp.get("batch_id", 0),
                            error=None)
        finally:
            client.close()
        pdf = _messages_to_pdf(msgs)
        df = spark.createDataFrame(pdf, schema=_GENERIC_SCHEMA) \
            if len(pdf) else spark.createDataFrame([], _GENERIC_SCHEMA)
        if manifest.output_schema:
            df = _typed_output(df, manifest.output_schema)
        return df

    return build


def _arrow_input(spark: SparkSession, manifest: PluginManifest,
                 cfg: dict[str, Any]) -> DataFrame:
    """`protocol: arrow` input: each read_batch response carries an
    Arrow-IPC body already typed to output_schema."""
    import pyarrow as pa

    client = ArrowPluginClient(manifest.command, manifest.cwd)
    tables = []
    try:
        _start_and_init(client, cfg)
        client.call("connect")
        while True:
            try:
                for _b in range(_BACKOFF_MAX_RETRIES):
                    try:
                        resp, tbl = client.call_arrow("read_batch")
                        break
                    except PluginError as exc:
                        delay = _requested_backoff_s(exc)
                        if delay is None:
                            raise
                        time.sleep(delay)
                else:
                    raise PluginError(
                        "plugin kept signaling backoff for "
                        "'read_batch'")
            except PluginError as exc:
                if exc.end_of_input:
                    break
                raise
            if tbl is not None and tbl.num_rows:
                tables.append(tbl)
            client.call("ack", batch_id=resp.get("batch_id", 0),
                        error=None)
    finally:
        client.close()
    if not tables:
        return spark.createDataFrame([], manifest.output_schema)
    pdf = pa.concat_tables(tables).to_pandas()
    return spark.createDataFrame(pdf, schema=manifest.output_schema)


def _partition_runner(manifest: PluginManifest, cfg: dict[str, Any],
                      method: str):
    """Shared mapInPandas body: one child per partition stream, one
    RPC per Arrow batch, crash → restart+init up to _RETRY_COUNT
    times (processor.go ProcessBatch's restart loop)."""

    def run(batches: Iterator) -> Iterator:
        # Child start is lazy: an empty partition (ubiquitous both in
        # unit-scale frames and at the ragged tail of a production
        # scan) must not pay a subprocess spawn + init RPC + close.
        client: PluginClient | None = None
        try:
            for pdf in batches:
                if not len(pdf):
                    continue
                if client is None:
                    client = PluginClient(manifest.command,
                                          manifest.cwd)
                    _start_and_init(client, cfg)
                    if method == "write_batch":
                        client.call("connect")
                payload = {"messages": _rows_to_messages(pdf)}
                last: Exception | None = None
                for _ in range(_RETRY_COUNT):
                    try:
                        resp = _call_with_backoff(
                            client, method, batch=payload)
                        last = None
                        break
                    except PluginCrashed as exc:
                        last = exc
                        client.close(graceful=False)
                        _start_and_init(client, cfg)
                        if method == "write_batch":
                            client.call("connect")
                if last is not None:
                    raise last
                if method == "process_batch":
                    out: list[dict[str, Any]] = []
                    for b in resp.get("batches") or []:
                        out.extend(b.get("messages") or [])
                    yield _messages_to_pdf(out)
                else:
                    import pandas as pd

                    yield pd.DataFrame({"written": [len(payload[
                        "messages"])]})
        finally:
            if client is not None:
                client.close()

    return run


def _arrow_partition_runner(manifest: PluginManifest,
                            cfg: dict[str, Any], method: str):
    """`protocol: arrow` mapInPandas body: the partition's pandas
    batch ships to the child VERBATIM as one Arrow-IPC stream (no
    per-row JSON, no base64); a processor child returns an Arrow
    table already matching output_schema, so the host does zero
    row-wise work in either direction."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        import pyarrow as pa

        # lazy child start — empty partitions spawn nothing
        client: ArrowPluginClient | None = None
        try:
            for pdf in batches:
                if not len(pdf):
                    continue
                if client is None:
                    client = ArrowPluginClient(manifest.command,
                                               manifest.cwd)
                    _start_and_init(client, cfg)
                    if method == "write_batch":
                        client.call("connect")
                tbl = pa.Table.from_pandas(pdf, preserve_index=False)
                last: Exception | None = None
                for _ in range(_RETRY_COUNT):
                    try:
                        for _b in range(_BACKOFF_MAX_RETRIES):
                            try:
                                _res, out_tbl = client.call_arrow(
                                    method, body=tbl)
                                break
                            except PluginError as exc:
                                delay = _requested_backoff_s(exc)
                                if delay is None:
                                    raise
                                time.sleep(delay)
                        else:
                            raise PluginError(
                                f"plugin kept signaling backoff for "
                                f"{method!r}")
                        last = None
                        break
                    except PluginCrashed as exc:
                        last = exc
                        client.close(graceful=False)
                        _start_and_init(client, cfg)
                        if method == "write_batch":
                            client.call("connect")
                if last is not None:
                    raise last
                if method == "process_batch":
                    if out_tbl is not None and out_tbl.num_rows:
                        yield out_tbl.to_pandas()
                else:
                    yield pd.DataFrame({"written": [len(pdf)]})
        finally:
            if client is not None:
                client.close()

    return run


def make_processor_plugin(manifest: PluginManifest):
    """processor.go: distributed ProcessBatch — each partition's
    Arrow batches round-trip through that partition's own child."""

    def apply(df: DataFrame, conf: Any) -> DataFrame:
        cfg = manifest.parse_config(conf)
        if manifest.protocol == "arrow":
            # typed end-to-end: the child's Arrow table IS the
            # declared output schema — no generic seam, no JSON
            return df.mapInPandas(
                _arrow_partition_runner(manifest, cfg,
                                        "process_batch"),
                manifest.output_schema)
        out = df.mapInPandas(
            _partition_runner(manifest, cfg, "process_batch"),
            _GENERIC_SCHEMA)
        if manifest.output_schema:
            out = _typed_output(out, manifest.output_schema)
        return out

    return apply


def make_output_plugin(manifest: PluginManifest):
    """output.go: distributed WriteBatch; the action is driven here
    (an output IS a sink) and the one-row-per-partition written
    counts are the collected commit record."""

    def write(df: DataFrame, conf: Any) -> None:
        cfg = manifest.parse_config(conf)
        runner = (_arrow_partition_runner
                  if manifest.protocol == "arrow"
                  else _partition_runner)(manifest, cfg,
                                          "write_batch")
        counts = df.mapInPandas(
            runner,
            T.StructType([T.StructField("written", T.LongType())]))
        counts.agg(F.sum("written")).collect()

    return write


# --------------------------------------------------------------------
# discovery + registration (config.go DiscoverAndRegisterPlugins)
# --------------------------------------------------------------------


def discover_and_register_plugins(paths: list[str]) -> list[str]:
    """Resolve each path/glob to manifests and register every plugin
    as a pipeline kind.  Returns the registered names."""
    import yaml

    from connect_spark.plans.pipeline import (
        INPUT_KINDS, OUTPUT_KINDS, PROCESSORS)

    names: list[str] = []
    files: list[str] = []
    for p in paths:
        hits = sorted(_glob.glob(p))
        if not hits and not os.path.exists(p):
            raise PipelineConfigError(
                f"plugin config path matches nothing: {p}")
        files.extend(hits or [p])
    registries = {"input": INPUT_KINDS, "processor": PROCESSORS,
                  "output": OUTPUT_KINDS}
    for path in files:
        with open(path, encoding="utf-8") as fh:
            doc = yaml.safe_load(fh) or {}
        manifest = parse_manifest(doc, path)
        # MustRegister* semantics (service.go): a duplicate name —
        # whether shadowing a built-in or another plugin — is a
        # config error, not a silent overwrite.  Re-discovering the
        # SAME manifest file (run → dry_run in one process) stays
        # idempotent.
        target = registries[manifest.type]
        key = (manifest.type, manifest.name)
        prior = _REGISTERED_PLUGINS.get(key)
        rpath = os.path.realpath(path)
        if manifest.name in target and prior != rpath:
            origin = ("built-in component" if prior is None
                      else f"plugin at {prior}")
            raise PipelineConfigError(
                f"plugin {manifest.name!r} ({manifest.type}) from "
                f"{path} would shadow an existing {origin}; plugin "
                f"names must be unique")
        if manifest.type == "input":
            target[manifest.name] = make_input_plugin(manifest)
        elif manifest.type == "processor":
            fn = make_processor_plugin(manifest)
            target[manifest.name] = (
                lambda df, conf, _fn=fn: _fn(df, conf))
        else:
            target[manifest.name] = make_output_plugin(manifest)
        _REGISTERED_PLUGINS[key] = rpath
        names.append(manifest.name)
    return names
