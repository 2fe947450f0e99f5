"""Agent mode (reference `internal/agent/agent.go:40-110` RunAgent +
`agent_processor.go` `redpanda_agent_runtime` + `internal/cli/
agent.go` `agent init|run`): a repository directory holds
`redpanda_agents.yaml` (per-agent input / tools / output), python
agent entrypoints under `agents/`, and MCP tool resources under
`mcp/resources/processors/*.yaml` (label + processors +
meta.mcp.enabled).  `agent run` builds one pipeline per agent whose
processor hosts the agent script as a child process wired to an MCP
tool server restricted to that agent's `tools` list.

Spark-first mapping:
- the `redpanda_agent_runtime` PROCESSOR hosts the agent child over
  the same NDJSON-stdio wire as RPC plugins (plans/rpcplugin.py) with
  one extra method — `invoke_agent` (one message in, one out,
  mirroring agentruntimepb.InvokeAgentRequest/Response) — and the
  MCP server address in CONNECT_SPARK_AGENT_MCP_SERVER (reference:
  REDPANDA_CONNECT_AGENT_RUNTIME_MCP_SERVER, agent_processor.go:139).
  Hosting rides mapInPandas: one child per executor-core partition
  stream (the reference hosts ONE child; local-mode MCP on 127.0.0.1
  is reachable from every executor thread — on a multi-node cluster
  the tool server address must be cluster-reachable, same topology
  requirement as the reference's single-host design).
- the tool server reuses the §3.3 ToolServer HTTP surface
  (GET /tools, POST /tools/<name>) over the reference's RESOURCE
  shape: mapping-only tool chains evaluate scalar-fast through the
  Bloblang dynamic evaluator (a tool call is one message — a scalar
  evaluation, not a Spark job); other processor chains fall back to
  a one-row DataFrame through the real processor registry.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from connect_spark.plans.pipeline import (
    PipelineConfigError,
    processor,
)

AGENT_MCP_ENV = "CONNECT_SPARK_AGENT_MCP_SERVER"


# --------------------------------------------------------------------
# MCP tool registry over the reference's resource shape
# --------------------------------------------------------------------


class AgentToolRegistry:
    """Tools from `mcp/resources/**/*.yaml` files shaped like the
    reference's (template/mcp/resources/processors/
    check_weather_tool.yaml): `label`, `processors`, and
    `meta.mcp.{enabled,description}`; only enabled tools register,
    and an allow-list (the agent's `tools`) filters further
    (agent.go:97-99)."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark
        self._tools: dict[str, dict[str, Any]] = {}

    def load_dir(self, mcp_dir: str,
                 allowed: list[str] | None = None) -> int:
        import yaml

        n = 0
        pattern = os.path.join(mcp_dir, "resources", "**", "*.yaml")
        for p in sorted(glob.glob(pattern, recursive=True)):
            with open(p, encoding="utf-8") as fh:
                doc = yaml.safe_load(fh) or {}
            meta = (doc.get("meta") or {}).get("mcp") or {}
            label = doc.get("label")
            if not label or not meta.get("enabled"):
                continue
            if allowed is not None and label not in allowed:
                continue
            self._tools[label] = {
                "processors": doc.get("processors") or [],
                "description": meta.get("description", ""),
            }
            n += 1
        return n

    def list(self) -> list[dict[str, str]]:
        return [{"name": k, "description": v["description"]}
                for k, v in sorted(self._tools.items())]

    @staticmethod
    def _is_mapping_only(specs: list) -> bool:
        return all(isinstance(s, dict) and set(s) <= {"mapping",
                                                      "label"}
                   and "mapping" in s for s in specs)

    def mapping_tools(self) -> dict[str, dict[str, Any]]:
        """The pure (mapping-only) tools — the set that can be
        dispatched inside a partition without touching the central
        server: name → {mappings: [source, ...], description}."""
        return {
            k: {"mappings": [s["mapping"] for s in v["processors"]],
                "description": v["description"]}
            for k, v in self._tools.items()
            if self._is_mapping_only(v["processors"])
        }

    def inline_tools(self) -> dict[str, dict[str, Any]]:
        """Every tool whose chain is inline-safe (r13 verdict task
        #2: shard stateful tools) — mapping, default-transport http,
        and command/subprocess chains all evaluate message-at-a-time
        in the partition worker with zero shared state, so they ship
        to the executors: name → {processors, description}.  This is
        a superset of mapping_tools() (those additionally export to
        the agent child for fully in-process dispatch)."""
        return {
            k: {"processors": list(v["processors"]),
                "description": v["description"]}
            for k, v in self._tools.items()
            if all(_inline_safe_spec(s) for s in v["processors"])
        }

    def central_tools(self) -> list[str]:
        """Tools that genuinely need the driver-side server: chains
        with shared state or driver-local registrations (caches,
        sql_select, custom http transports, ...).  A bulk pipeline
        calling these serializes on one registry — the runtime
        processor warns, and refuses past
        `central_tools_max_partitions` (see _p_agent_runtime)."""
        inline = set(self.inline_tools())
        return [k for k in self._tools if k not in inline]

    def stateful_tools(self) -> list[str]:
        """Back-compat alias (pre-r14 name for central_tools)."""
        return self.central_tools()

    def invoke(self, name: str, content: str) -> str:
        """One tool call.  Inline-safe spec runs (mapping / default-
        transport http / command) evaluate through the SAME scalar
        chain evaluator the partition shim uses — dispatch-tier
        parity by shared code, and reference semantics (`this` in a
        tool mapping is the MESSAGE content, never a one-row frame's
        column envelope; tests/test_inline_chain_parity.py caught the
        old general path handing a mapping the {content: ...} row).
        Only genuinely non-inline-safe specs (cache, sql_select,
        custom transports, ...) drop to the one-row DataFrame path
        through the real processor registry."""
        tool = self._tools.get(name)
        if tool is None:
            raise PipelineConfigError(f"unknown tool {name!r}")
        specs = tool["processors"]

        doc = content
        run: list = []  # consecutive inline-safe specs

        def flush(doc: str) -> str:
            if not run:
                return doc
            out = _eval_inline_chain(run, doc)
            run.clear()
            return out

        for s in specs:
            if _inline_safe_spec(s):
                run.append(s)
                continue
            doc = flush(doc)
            if self.spark is None:
                raise PipelineConfigError(
                    f"tool {name!r} needs a SparkSession "
                    "(non-inline-safe processors)")
            from connect_spark.plans.pipeline import apply_processor

            df = self.spark.createDataFrame([(doc,)],
                                            "content STRING")
            before = set(df.columns)
            df = apply_processor(df, s)
            rows = df.limit(1).collect()
            if not rows:
                return ""
            row = rows[0]
            # the tool result is the processor's OUTPUT: processors
            # that write a separate column (subprocess/command →
            # `piped`, http with `out`, ...) put the answer THERE,
            # not in the untouched input field (r14 ADVICE #2: the
            # old first-column read returned the untransformed input
            # for out-writing processors)
            added = [c for c in df.columns
                     if c not in before and not c.startswith("_")]
            if added:
                val = row[added[-1]]
            elif "content" in df.columns:
                val = row["content"]
            else:
                val = row[0]
            if isinstance(val, str):
                # the dynamic-fallback envelope JSON-encodes scalar
                # results ('"ABC"'); message content is the RAW
                # string — unwrap exactly the quoted-string case
                # (objects/numbers keep their JSON text form)
                try:
                    parsed = json.loads(val)
                except ValueError:
                    parsed = val
                doc = parsed if isinstance(parsed, str) else val
            else:
                doc = json.dumps(val)
        return flush(doc)

    # ---- HTTP endpoint (same envelope as toolserver.py) -------------

    def handle(self, verb: str, path: str,
               body: str = "") -> tuple[int, dict]:
        if verb == "GET" and path == "/tools":
            return 200, {"tools": self.list()}
        if verb == "POST" and path.startswith("/tools/"):
            name = path[len("/tools/"):]
            try:
                args = json.loads(body) if body else {}
            except ValueError as exc:
                return 400, {"error": f"invalid JSON body: {exc}"}
            try:
                out = self.invoke(name, str(args.get("content", "")))
            except PipelineConfigError as exc:
                return 404, {"error": str(exc)}
            except Exception as exc:  # noqa: BLE001 — HTTP boundary
                return 500, {"error": f"{type(exc).__name__}: {exc}"}
            return 200, {"content": out}
        return 404, {"error": f"unhandled {verb} {path}"}

    def serve(self, port: int = 0):
        import http.server
        import threading

        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def _respond(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode() if length else ""
                status, doc = outer.handle(self.command, self.path, body)
                payload = json.dumps(doc).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            do_GET = do_POST = _respond  # noqa: N815 — stdlib API

            def log_message(self, *a):  # quiet
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", port),
                                              Handler)
        srv.daemon_threads = True
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, srv.server_address[1]


# --------------------------------------------------------------------
# per-partition tool shim (r12 verdict task #3: scale)
# --------------------------------------------------------------------

AGENT_TOOLS_INLINE_ENV = "CONNECT_SPARK_AGENT_TOOLS_INLINE"


def _eval_inline_tool(mappings: list[str], content: str) -> str:
    return _eval_inline_chain(
        [{"mapping": src} for src in mappings], content)


# conf keys the scalar http evaluator understands; anything else —
# transport, retries, AND `field` (the processor reads/writes a named
# column, which a scalar chain has no analog for; r14 ADVICE #1) —
# needs the real processor → central
_INLINE_HTTP_KEYS = {"url", "verb", "headers", "timeout"}

# conf keys the scalar command/subprocess evaluator understands; a
# spec carrying `field`/`out`/codec options must run through the real
# processor (it writes a separate piped column — r14 ADVICE #1)
_INLINE_CMD_KEYS = {"name", "args", "label"}


def _inline_safe_spec(spec: Any) -> bool:
    """True when one processor spec can evaluate message-at-a-time in
    a plain python worker — no SparkSession, no shared state, no
    driver-local registrations.  mapping: always.  http: only the
    default urllib transport with a literal url (a named transport is
    a driver-side registration — test fakes, custom clients — and an
    interpolated url needs the full Bloblang env).  command/
    subprocess: a plain argv.  Everything else (cache, sql_select,
    ...) carries shared state or a Spark plan and stays central."""
    if not isinstance(spec, dict):
        return False
    body = {k: v for k, v in spec.items() if k != "label"}
    if len(body) != 1:
        return False
    (kind, conf), = body.items()
    if kind == "mapping":
        return isinstance(conf, str)
    if kind == "http":
        return (isinstance(conf, dict)
                and isinstance(conf.get("url"), str)
                and "${!" not in conf["url"]
                and set(conf) <= _INLINE_HTTP_KEYS)
    if kind in ("command", "subprocess"):
        return (isinstance(conf, dict)
                and isinstance(conf.get("name"), str)
                and set(conf) <= _INLINE_CMD_KEYS
                and all(isinstance(a, str)
                        for a in conf.get("args", [])))
    return False


def _eval_inline_chain(specs: list, content: str) -> str:
    """Scalar evaluator for inline-safe tool chains (one message
    through mapping / http / command processors, mirroring what the
    one-row DataFrame path computes).  Runs in the partition worker —
    a pure tool call never leaves the executor."""
    import subprocess

    from connect_spark.bloblang.pyeval import eval_mapping_value

    def as_str(d: Any) -> str:
        return d if isinstance(d, str) else json.dumps(
            d, sort_keys=True, separators=(",", ":"))

    try:
        doc: Any = json.loads(content)
    except ValueError:
        doc = content
    for spec in specs:
        body = {k: v for k, v in spec.items() if k != "label"}
        (kind, conf), = body.items()
        if kind == "mapping":
            doc = eval_mapping_value(conf, doc)
        elif kind == "http":
            # the SAME default transport the pipeline http processor
            # uses (r14 ADVICE #3): shared body/timeout/error
            # semantics. A tool call RAISES on transport error (there
            # is no row to error-flag) — documented divergence from
            # the pipeline path, which flags and keeps the content.
            from connect_spark.plans.processors_ext import (
                _urllib_transport,
            )

            timeout = conf.get("timeout", 10)
            if isinstance(timeout, str):
                from connect_spark.operators.batching import (
                    parse_period,
                )

                timeout = parse_period(timeout)
            doc = _urllib_transport(
                conf["url"],
                conf.get("verb", "POST"),
                dict(conf.get("headers") or {}),
                as_str(doc),
                timeout=timeout,
            )
        elif kind in ("command", "subprocess"):
            proc = subprocess.run(
                [conf["name"], *conf.get("args", [])],
                input=as_str(doc) + "\n",
                capture_output=True, text=True, check=True,
            )
            lines = proc.stdout.splitlines()
            if len(lines) != 1:
                raise ValueError(
                    f"{kind} emitted {len(lines)} lines for 1 input")
            doc = lines[0]
        else:  # guarded by _inline_safe_spec at config time
            raise ValueError(
                f"processor {kind!r} is not inline-safe")
    return as_str(doc)


def _serve_partition_shim(tools_inline: dict[str, dict[str, Any]],
                          central: str):
    """An executor-local MCP endpoint: inline-safe tools — mapping
    chains (entry key `mappings`) and mixed mapping/http/command
    chains (entry key `processors`) — evaluate IN THIS python worker
    (scalar Bloblang / urllib / subprocess, no network beyond what
    the tool itself makes); anything else proxies to the central
    server.  One shim per partition stream means tool-call
    throughput scales with cores instead of serializing on the one
    driver-side registry (the 11s→186s super-linear curve in
    SCALE.md:923).  Returns (server, port)."""
    import http.server
    import threading
    import urllib.error
    import urllib.request

    listing = [{"name": k, "description": v.get("description", "")}
               for k, v in sorted(tools_inline.items())]

    def handle(verb: str, path: str, body: str) -> tuple[int, dict]:
        if verb == "GET" and path == "/tools":
            tools = list(listing)
            if central:
                base = central.rstrip("/").rsplit("/tools", 1)[0]
                # unreachable central server → degrade to the inline
                # listing plus a 200, never a crashed handler (r13
                # ADVICE: URLError propagating killed the connection)
                try:
                    with urllib.request.urlopen(
                            base + "/tools", timeout=30) as resp:
                        remote = json.loads(
                            resp.read()).get("tools", [])
                except (urllib.error.URLError, OSError,
                        ValueError) as exc:
                    return 200, {"tools": tools,
                                 "central_error":
                                 f"{type(exc).__name__}: {exc}"}
                have = {t["name"] for t in tools}
                tools += [t for t in remote
                          if t["name"] not in have]
            return 200, {"tools": tools}
        if verb == "POST" and path.startswith("/tools/"):
            name = path[len("/tools/"):]
            tool = tools_inline.get(name)
            if tool is not None:
                try:
                    args = json.loads(body) if body else {}
                except ValueError as exc:
                    return 400, {"error": f"invalid JSON body: {exc}"}
                try:
                    content = str(args.get("content", ""))
                    if "mappings" in tool:
                        out = _eval_inline_tool(tool["mappings"],
                                                content)
                    else:
                        out = _eval_inline_chain(tool["processors"],
                                                 content)
                except Exception as exc:  # noqa: BLE001 — boundary
                    return 500, {"error":
                                 f"{type(exc).__name__}: {exc}"}
                return 200, {"content": out}
            if central:  # stateful tool → central registry
                base = central.rstrip("/").rsplit("/tools", 1)[0]
                req = urllib.request.Request(
                    base + path, data=body.encode(), method="POST")
                try:
                    with urllib.request.urlopen(req,
                                                timeout=60) as resp:
                        return resp.status, json.loads(resp.read())
                except urllib.error.HTTPError as exc:
                    return exc.code, json.loads(exc.read() or b"{}")
                except (urllib.error.URLError, OSError,
                        ValueError) as exc:
                    # central server down/unreachable: the agent
                    # child gets a JSON 502, not a dropped socket
                    return 502, {"error":
                                 "central tool server unreachable: "
                                 f"{type(exc).__name__}: {exc}"}
            return 404, {"error": f"unknown tool {name!r}"}
        return 404, {"error": f"unhandled {verb} {path}"}

    class Handler(http.server.BaseHTTPRequestHandler):
        def _respond(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length).decode() if length else ""
            status, doc = handle(self.command, self.path, body)
            payload = json.dumps(doc).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        do_GET = do_POST = _respond  # noqa: N815 — stdlib API

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


# --------------------------------------------------------------------
# the redpanda_agent_runtime processor
# --------------------------------------------------------------------


@processor("redpanda_agent_runtime")
def _p_agent_runtime(df: DataFrame, conf: Any) -> DataFrame:
    """agent_processor.go:33-40 — fields `command`, `mcp_server`,
    `cwd`; hosts the agent child and round-trips each message through
    `invoke_agent`.  Distributed: one child per partition stream.

    Scale (r12 verdict task #3 + r13 task #2): `tools_inline` ships
    inline-safe tool chains to every partition — mapping entries
    ({mappings: [...]}) additionally export verbatim in
    CONNECT_SPARK_AGENT_TOOLS_INLINE for agents that dispatch fully
    in-process; mixed mapping/http/command chains ({processors:
    [...]}) evaluate in the partition shim — so those tool calls
    never reach the central server.  `mcp_server` remains the
    address for CENTRAL tools only (shared state: caches,
    sql_select, custom transports).  A bulk run against central
    tools serializes on one registry, so when `central_tool_names`
    is non-empty the processor warns, and REFUSES above
    `central_tools_max_partitions` (default 64) — bulk transforms
    belong in ordinary processors (a cache lookup over millions of
    messages is the `cache` processor's broadcast join, not a
    per-message agent tool call)."""
    if not isinstance(conf, dict) or not conf.get("command"):
        raise PipelineConfigError(
            "redpanda_agent_runtime: command must be specified")
    command = list(conf["command"])
    mcp_server = conf.get("mcp_server", "")
    tools_inline = conf.get("tools_inline") or {}
    if not isinstance(tools_inline, dict) or not all(
            isinstance(v, dict)
            and (isinstance(v.get("mappings"), list)
                 or isinstance(v.get("processors"), list))
            for v in tools_inline.values()):
        raise PipelineConfigError(
            "redpanda_agent_runtime: tools_inline must map tool name "
            "→ {mappings: [bloblang, ...]} or {processors: [spec, "
            "...]} (plus description)")
    bad_chain = [
        k for k, v in tools_inline.items()
        if "mappings" not in v
        and not all(_inline_safe_spec(s) for s in v["processors"])]
    if bad_chain:
        raise PipelineConfigError(
            f"redpanda_agent_runtime: tools_inline chains "
            f"{sorted(bad_chain)} contain processors that are not "
            "inline-safe (only mapping / default-transport http / "
            "command evaluate in the partition worker); route them "
            "through mcp_server instead")
    central_names = list(conf.get("central_tool_names") or [])
    if central_names and mcp_server:
        import warnings

        # Default threshold: HALF the task slots.  The central
        # registry's general path runs a one-row Spark job per tool
        # call, so every concurrent call needs a FREE slot while the
        # calling partition host occupies one — past cores/2 the
        # topology doesn't merely serialize, it deadlocks until
        # timeouts (measured: a 32-partition bulk run on local[32]
        # stalls outright, scripts/ab_agent_stateful.py).
        default_max = max(
            1, df.sparkSession.sparkContext.defaultParallelism // 2)
        max_parts = int(conf.get("central_tools_max_partitions",
                                 default_max))
        # APPROXIMATION (r14 ADVICE #4): this finalizes a pre-AQE
        # physical plan, while the partition count mapInPandas sees
        # at run time can differ after AQE coalescing/expansion — the
        # gate can over-refuse (AQE coalesces below the cap) or
        # under-protect (AQE expands above it). It is a config-time
        # fail-fast heuristic, deliberately cheap and loud; the
        # warning below fires regardless, and the true protection is
        # that central calls time out rather than hang forever. The
        # .rdd conversion itself is a plan-finalization side effect,
        # accepted here because the gate only runs when central tools
        # are configured.
        n_parts = df.rdd.getNumPartitions()
        if n_parts > max_parts:
            raise PipelineConfigError(
                f"redpanda_agent_runtime: input has {n_parts} "
                f"partitions but central tools "
                f"{sorted(central_names)} serialize on ONE driver-"
                f"side registry (> central_tools_max_partitions="
                f"{max_parts}, default cores/2 — each call runs a "
                "driver-side job needing a free task slot, so more "
                "agent hosts than that deadlocks).  Bulk transforms "
                "belong in ordinary processors (cache lookups are "
                "the `cache` processor's broadcast join); raise "
                "central_tools_max_partitions only if the tool-call "
                "volume is genuinely conversational")
        warnings.warn(
            f"redpanda_agent_runtime: central tools "
            f"{sorted(central_names)} serialize on one driver-side "
            f"registry across {n_parts} partitions — keep their "
            "call volume conversational (SCALE.md agent section)",
            stacklevel=2)
    cwd = conf.get("cwd", "")
    out_schema = conf.get("output_schema", "")
    protocol = conf.get("protocol", "ndjson")
    if protocol not in ("ndjson", "arrow"):
        raise PipelineConfigError(
            f"redpanda_agent_runtime: unexpected protocol, valid "
            f"options ['ndjson', 'arrow'], got: {protocol!r}")
    if protocol == "arrow" and not out_schema:
        raise PipelineConfigError(
            "redpanda_agent_runtime: protocol: arrow requires "
            "output_schema (the child returns typed Arrow rows, "
            "not generic JSON messages)")

    from connect_spark.plans.rpcplugin import (
        _GENERIC_SCHEMA,
        _messages_to_pdf,
        _rows_to_messages,
        _typed_output,
        ArrowPluginClient,
        PluginClient,
    )

    def _spawn():
        """shim + child setup shared by both wire protocols."""
        shim = None
        address = mcp_server
        env = {}
        if tools_inline:
            shim, port = _serve_partition_shim(tools_inline,
                                               mcp_server)
            address = f"http://127.0.0.1:{port}/tools"
            env[AGENT_TOOLS_INLINE_ENV] = json.dumps(
                {k: v["mappings"] for k, v in tools_inline.items()
                 if "mappings" in v},
                sort_keys=True)
        env[AGENT_MCP_ENV] = address
        cls = ArrowPluginClient if protocol == "arrow" \
            else PluginClient
        client = cls(command, cwd, env=env)
        client.start()
        client.call("init", config={"mcp_server": address})
        return client, shim

    def run(batches):
        client, shim = _spawn()
        try:
            for pdf in batches:
                if not len(pdf):
                    continue
                out = []
                # one InvokeAgent per message (agent_plugin.go:33 —
                # the agent protocol is strictly message-at-a-time)
                for msg in _rows_to_messages(pdf):
                    resp = client.call("invoke_agent", message=msg)
                    out.append(resp.get("message") or {})
                yield _messages_to_pdf(out)
        finally:
            client.close()
            if shim is not None:
                shim.shutdown()
                shim.server_close()  # release the listening fd

    def run_arrow(batches):
        # `protocol: arrow` agent wire (r13 verdict task #6): each
        # invoke_agent carries a ONE-ROW Arrow-IPC body in and out —
        # semantics stay strictly message-at-a-time, only the
        # framing changes.  NOT the default: per-message Arrow
        # stream overhead (schema + ~300B framing per 1-row table)
        # loses to compact JSON at this granularity — measured in
        # scripts/ab_agent_arrow.py; see SCALE.md.  It exists for
        # agent children that are already columnar (pyarrow-native)
        # or whose messages carry large binary payloads base64 would
        # inflate by 4/3.
        import pyarrow as pa

        client, shim = _spawn()
        try:
            for pdf in batches:
                if not len(pdf):
                    continue
                tbl = pa.Table.from_pandas(pdf,
                                           preserve_index=False)
                outs = []
                for i in range(tbl.num_rows):
                    _res, out_tbl = client.call_arrow(
                        "invoke_agent", body=tbl.slice(i, 1))
                    if out_tbl is not None and out_tbl.num_rows:
                        outs.append(out_tbl)
                if outs:
                    yield pa.concat_tables(outs).to_pandas()
        finally:
            client.close()
            if shim is not None:
                shim.shutdown()
                shim.server_close()

    if protocol == "arrow":
        # typed end-to-end: the child's Arrow rows ARE the declared
        # output schema (same contract as rpcplugin arrow)
        return df.mapInPandas(run_arrow, out_schema)
    result = df.mapInPandas(run, _GENERIC_SCHEMA)
    if out_schema:
        result = _typed_output(result, out_schema)
    return result


# --------------------------------------------------------------------
# agent run (agent.go RunAgent)
# --------------------------------------------------------------------


def run_agents(spark: SparkSession, repo_dir: str,
               agent_filter: list[str] | None = None,
               ) -> dict[str, DataFrame | None]:
    """Read `redpanda_agents.yaml`, then per agent: serve an MCP tool
    server restricted to the agent's `tools`, build input →
    redpanda_agent_runtime → output, and run it.  Returns each
    agent's result frame (memory outputs) by name.  Agents with
    bounded inputs run to completion sequentially — the CLI analog
    of the reference's errgroup of streams."""
    import sys

    import yaml

    from connect_spark.plans import build_pipeline

    cfg_path = os.path.join(repo_dir, "redpanda_agents.yaml")
    if not os.path.exists(cfg_path):
        raise PipelineConfigError(
            f"reading {cfg_path} (are you in the right directory?)")
    with open(cfg_path, encoding="utf-8") as fh:
        config = yaml.safe_load(fh) or {}
    agents = config.get("agents") or {}
    results: dict[str, DataFrame | None] = {}
    for name, agent in agents.items():
        if agent_filter is not None and name not in agent_filter:
            continue
        if not isinstance(agent, dict):
            raise PipelineConfigError(
                f"agent {name!r} in {cfg_path} must be a mapping "
                f"with an `input` section, got "
                f"{type(agent).__name__}")
        if not isinstance(agent.get("input"), dict):
            raise PipelineConfigError(
                f"agent {name!r} in {cfg_path} is missing its "
                f"`input` section (a mapping of input kind → "
                f"config)")
        registry = AgentToolRegistry(spark)
        registry.load_dir(os.path.join(repo_dir, "mcp"),
                          allowed=agent.get("tools"))
        # scale split (r12 task #3 + r13 task #2): every inline-safe
        # tool chain (mapping / default-transport http / command)
        # ships to the partitions — those calls never leave the
        # executor.  Each agent gets its OWN central server (sharded
        # per-agent by construction) and it starts ONLY when central
        # (shared-state) tools exist, serving only those; the runtime
        # processor gates bulk runs against them.
        inline = registry.inline_tools()
        # mapping-only entries keep the {mappings} shape so agent
        # children can keep dispatching them fully in-process
        inline.update(registry.mapping_tools())
        central = registry.central_tools()
        srv = None
        mcp_server = ""
        if central:
            srv, port = registry.serve(0)
            mcp_server = f"http://127.0.0.1:{port}/tools"
        try:
            # agent.go:161-168: the runtime processor is templated in
            # with $NAME / $PORT / $CWD
            runtime_conf: dict[str, Any] = {
                "command": [sys.executable,
                            os.path.join("agents", f"{name}.py")],
                "mcp_server": mcp_server,
                "cwd": repo_dir,
            }
            if inline:
                runtime_conf["tools_inline"] = inline
            if central:
                # names the runtime's bulk-volume gate checks
                runtime_conf["central_tool_names"] = central
            pipeline_cfg = {
                "input": agent["input"],
                "pipeline": {"processors": [
                    {"redpanda_agent_runtime": runtime_conf},
                ]},
                "output": agent.get("output") or {"memory": {}},
            }
            result = build_pipeline(spark, pipeline_cfg).run()
            if result is not None:
                # materialize NOW, while this agent's tool server is
                # still serving — memory outputs are lazy, and the
                # children dial the MCP address at execution time
                result = result.localCheckpoint(eager=True)
            results[name] = result
        finally:
            if srv is not None:
                srv.shutdown()
                srv.server_close()  # release the listening fd
    return results


# --------------------------------------------------------------------
# agent init (cli/agent.go + internal/agent/template/)
# --------------------------------------------------------------------

_AGENTS_YAML = """\
agents:
  # The key here determines where the agent entrypoint is found:
  # "agents/{name}.py"
  {name}:
    # Define how your agent receives input
    input:
      generate:
        count: 3
        mapping: 'root.content = "item " + counter().string()'
    # Define the tools your agent has access to
    tools:
      - shout
    # Define where the agent's output goes
    output:
      memory: {{}}
"""

_TOOL_YAML = """\
label: 'shout'
processors:
  - mapping: 'root = this.uppercase()'

meta:
  mcp:
    enabled: true
    description: 'A tool that upper-cases the value passed to it'
"""

_AGENT_PY = '''\
"""A connect_spark agent: for each input message, call MCP tools and
compose an answer.  The runtime host speaks NDJSON-RPC on stdio and
passes the MCP tool server address in CONNECT_SPARK_AGENT_MCP_SERVER.

This template is deterministic (no LLM required): it lists the tools
it was granted, calls the first one on the message content, and wraps
the result.  Swap `plan()` for an LLM tool-call loop to make it
smart — the MCP surface is the same either way."""

import json
import os
import sys
import urllib.request

MCP = os.environ.get("CONNECT_SPARK_AGENT_MCP_SERVER", "")
# Pure (mapping-only) tools arrive inline: {name: [bloblang, ...]}.
# Dispatching them here keeps tool calls fully in-process — no
# network at all — so agent throughput scales with partitions.
INLINE = json.loads(os.environ.get(
    "CONNECT_SPARK_AGENT_TOOLS_INLINE", "{}"))


def _mcp(path, body=None):
    url = MCP.rstrip("/").rsplit("/tools", 1)[0] + path
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method="POST"
                                 if data else "GET")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def _call_tool(name, content):
    mappings = INLINE.get(name)
    if mappings is not None:
        try:
            from connect_spark.bloblang.pyeval import (
                eval_mapping_value,
            )
        except ImportError:
            pass  # connect_spark not importable here → use HTTP
        else:
            try:
                doc = json.loads(content)
            except ValueError:
                doc = content
            for src in mappings:
                doc = eval_mapping_value(src, doc)
            return doc if isinstance(doc, str) else json.dumps(
                doc, sort_keys=True, separators=(",", ":"))
    return _mcp("/tools/" + name, {"content": content})["content"]


def _list_tools():
    if INLINE and not MCP:
        return [{"name": n, "description": ""} for n in
                sorted(INLINE)]
    return _mcp("/tools")["tools"]


def plan(content, tools):
    """Deterministic tool loop: call each granted tool in turn,
    feeding each result to the next."""
    for t in tools:
        content = _call_tool(t["name"], content)
    return content


def invoke_agent(msg):
    doc = msg.get("structured")
    content = (doc.get("content", "") if isinstance(doc, dict)
               else str(doc))
    tools = _list_tools()
    answer = plan(content, tools)
    return {"structured": {"content": answer,
                           "n_tools": len(tools)},
            "metadata": msg.get("metadata") or {}}


def serve():
    for line in sys.stdin:
        if not line.strip():
            continue
        req = json.loads(line)
        rid, m, p = req["id"], req["method"], req.get("params") or {}
        res = {}
        err = None
        try:
            if m == "invoke_agent":
                res = {"message": invoke_agent(p.get("message") or {})}
        except Exception as exc:
            err = {"message": str(exc)}
        sys.stdout.write(json.dumps(
            {"id": rid, "result": res, "error": err}) + "\\n")
        sys.stdout.flush()
        if m == "close":
            break


if __name__ == "__main__":
    serve()
'''

_AGENT_README = """\
# {name}

A connect_spark agent project (reference: Redpanda Connect's agentic
framework).  Define agents in `agents/` as python, wire them to
inputs and outputs in `redpanda_agents.yaml`, and grant them tools
from `mcp/resources/processors/*.yaml`.

Run with:

    python -m connect_spark agent run .
"""


def create_template(repo_dir: str, name: str | None = None) -> str:
    """cli/agent.go `agent init`: lay down the agent project."""
    abs_dir = os.path.abspath(repo_dir)
    if not name:
        name = os.path.basename(abs_dir) or "my_agent"
    name = name.replace("-", "_")
    os.makedirs(os.path.join(abs_dir, "agents"), exist_ok=True)
    os.makedirs(os.path.join(abs_dir, "mcp", "resources",
                             "processors"), exist_ok=True)
    with open(os.path.join(abs_dir, "redpanda_agents.yaml"), "w",
              encoding="utf-8") as fh:
        fh.write(_AGENTS_YAML.format(name=name))
    with open(os.path.join(abs_dir, "agents", f"{name}.py"), "w",
              encoding="utf-8") as fh:
        fh.write(_AGENT_PY)
    with open(os.path.join(abs_dir, "mcp", "resources", "processors",
                           "shout_tool.yaml"), "w",
              encoding="utf-8") as fh:
        fh.write(_TOOL_YAML)
    with open(os.path.join(abs_dir, "README.md"), "w",
              encoding="utf-8") as fh:
        fh.write(_AGENT_README.format(name=name))
    return abs_dir
