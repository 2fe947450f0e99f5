"""CLI — the reference's primary verbs (SURVEY.md §3.1:
`redpanda-connect run config.yaml`; §5.1: `rpk connect test`; plus the
benthos CLI's lint / list / echo / blobl / create):

    python -m connect_spark run examples/traffic_windows.yaml
    python -m connect_spark test examples/filtering_test.yaml
    python -m connect_spark lint my_config.yaml ...
    python -m connect_spark list [inputs|processors|outputs|...]
    python -m connect_spark echo my_config.yaml
    python -m connect_spark blobl 'root.out = this.n * 2'   # stdin JSON
    python -m connect_spark create kafka//mapping/parquet

`run` builds the pipeline and executes it (memory/stdout outputs
print); `test` executes a config unit-test suite and reports per-case
results, exit code 1 on any failure; `lint` statically validates
component kinds without executing; `blobl` evaluates a mapping over
stdin JSON documents (one per line) like `rpk connect blobl`.
"""

from __future__ import annotations

import argparse
import os
import sys


def _known_kinds():
    """Registered component names by section (lint / list verbs)."""
    from connect_spark.plans import pipeline as P
    from connect_spark.plans.state_ext import _SERVICE_CACHE_KINDS

    # inline dispatch kinds live in if-chains; keep these lists in
    # sync with _build_input/_run_output
    inline_inputs = {
        "read_until", "dynamic", "broker", "sequence", "parquet", "csv",
        "json_documents", "file", "generate", "table", "generate_stream",
        "cdc_wal", "subprocess", "mq_bus", "parquet_stream",
    }
    inline_outputs = {
        "memory", "parquet", "csv", "json_lines", "stdout", "drop",
        "reject", "dynamic", "mq_bus",
    }
    return {
        "inputs": sorted(inline_inputs | set(P.INPUT_KINDS)),
        "processors": sorted(P.PROCESSORS),
        "outputs": sorted(inline_outputs | set(P.OUTPUT_KINDS)),
        "caches": sorted(
            {"memory", "noop", "lru", "ttlru", "multilevel", "sql"}
            | set(_SERVICE_CACHE_KINDS)),
        "buffers": ["memory", "none", "spool", "sqlite", "system_window"],
        "rate_limits": ["local", "redis"],
        "metrics": ["aws_cloudwatch", "influxdb", "json_api", "logger",
                    "none", "open_telemetry_collector", "prometheus",
                    "statsd"],
        "tracers": ["gcp_cloudtrace", "jaeger", "none",
                    "open_telemetry_collector", "redpanda"],
        "scanners": ["avro", "chunker", "csv", "decompress",
                     "json_array", "json_documents", "lines", "re_match",
                     "skip_bom", "switch", "tar", "to_the_end"],
    }


def _required_fields() -> dict[str, dict[str, tuple[str, ...]]]:
    """Per-kind required config fields, sourced from the spec tables
    the builders themselves validate against (no drift: same data)."""
    from connect_spark.plans.cdc_ext import _CDC_SPECS
    from connect_spark.plans.db_ext import _KV_KINDS
    from connect_spark.plans.saas_ext import _SAAS_INPUTS

    inputs: dict[str, tuple[str, ...]] = {}
    for kind, spec in _CDC_SPECS.items():
        inputs[kind] = spec.required
    for kind, (required, _url, _verb, _items) in _SAAS_INPUTS.items():
        inputs[kind] = required
    outputs: dict[str, tuple[str, ...]] = {}
    for kind, (identity, _key) in _KV_KINDS.items():
        outputs[kind] = identity
    return {"inputs": inputs, "outputs": outputs, "processors": {}}


def lint_config(config: dict) -> list[str]:
    """Static component-kind validation (the `lint` verb): walk the
    config tree and report unknown input/processor/output/cache/
    buffer kinds. No component is constructed or executed. Kinds
    defined by templates — inline `templates:` or process-global
    registrations — are known under their declared type."""
    from connect_spark.plans.templates import _TEMPLATES

    kinds = {k: set(v) for k, v in _known_kinds().items()}
    tmpl_specs = list(_TEMPLATES.values()) + list(
        config.get("templates", []))
    for spec in tmpl_specs:
        section = {"processor": "processors", "input": "inputs",
                   "output": "outputs"}.get(spec.get("type"))
        if section and spec.get("name"):
            kinds[section].add(spec["name"])
    required = _required_fields()
    errors: list[str] = []

    def check(section: str, spec, where: str):
        if spec is None:
            return
        if isinstance(spec, dict) and "label" in spec:
            spec = {k: v for k, v in spec.items() if k != "label"}
        # inputs/outputs may carry an attached `processors` list
        # BESIDE the kind (inputs/<any>.adoc `processors`; the
        # reference's site_analytics / joining_streams /
        # stateful_polling examples use this shape)
        if (
            isinstance(spec, dict)
            and section in ("inputs", "outputs")
            and "processors" in spec
            and len(spec) > 1
        ):
            attached = spec["processors"]
            spec = {
                k: v for k, v in spec.items() if k != "processors"
            }
            if isinstance(attached, list):
                for j, child in enumerate(attached):
                    check("processors", child,
                          f"{where}.processors[{j}]")
        if not isinstance(spec, dict) or len(spec) != 1:
            errors.append(f"{where}: expected a single {{kind: conf}} "
                          f"mapping, got {type(spec).__name__}")
            return
        (kind, conf), = spec.items()
        if kind not in kinds[section]:
            errors.append(f"{where}: unknown {section[:-1]} kind {kind!r}")
            return
        # required identity fields (sourced from the builders' own
        # spec tables — see _required_fields)
        if section in required and kind in required[section]:
            present = conf if isinstance(conf, dict) else {}
            for f in required[section][kind]:
                if not present.get(f):
                    errors.append(
                        f"{where}: {kind} requires field {f!r}"
                    )
        # list-shaped confs (switch cases, try/catch blocks, fallback
        # outputs): recurse into each element's nested components
        if isinstance(conf, list):
            for i, item in enumerate(conf):
                if not isinstance(item, dict):
                    continue
                if "processors" in item and isinstance(
                        item["processors"], list):
                    for j, child in enumerate(item["processors"]):
                        check("processors", child,
                              f"{where}[{i}].processors[{j}]")
                if "output" in item and isinstance(item["output"], dict):
                    check("outputs", item["output"],
                          f"{where}[{i}].output")
                # a bare processor spec inside a try/catch-style list
                if len(item) == 1 and section == "processors":
                    (k2, _), = item.items()
                    if k2 not in ("check", "processors", "output",
                                  "fallthrough"):
                        check("processors", item, f"{where}[{i}]")
        # recurse into combinators
        if isinstance(conf, dict):
            for child_key in ("child", "input", "output"):
                if child_key in conf and isinstance(conf[child_key], dict):
                    sec = ("inputs" if section == "inputs"
                           or child_key in ("child", "input")
                           else "outputs")
                    if child_key == "output":
                        sec = "outputs"
                    check(sec, conf[child_key],
                          f"{where}.{child_key}")
            for list_key in ("inputs", "outputs"):
                if list_key in conf and isinstance(conf[list_key], list):
                    for i, child in enumerate(conf[list_key]):
                        check(list_key, child,
                              f"{where}.{list_key}[{i}]")
            if "cases" in conf and isinstance(conf["cases"], list):
                for i, case in enumerate(conf["cases"]):
                    if isinstance(case, dict) and "output" in case:
                        check("outputs", case["output"],
                              f"{where}.cases[{i}].output")
            if "processors" in conf and isinstance(
                    conf["processors"], list):
                for i, p in enumerate(conf["processors"]):
                    check("processors", p, f"{where}.processors[{i}]")

    check("inputs", config.get("input"), "input")
    for i, p in enumerate(config.get("pipeline", {}).get(
            "processors", [])):
        check("processors", p, f"pipeline.processors[{i}]")
    check("outputs", config.get("output"), "output")
    if config.get("buffer") and not isinstance(config["buffer"], str):
        check("buffers", config["buffer"], "buffer")
    for i, item in enumerate(config.get("cache_resources", [])):
        body = {k: v for k, v in item.items() if k != "label"}
        check("caches", body, f"cache_resources[{i}]")
    for section, where in (("inputs", "input_resources"),
                           ("outputs", "output_resources")):
        for i, item in enumerate(config.get(where, [])):
            body = {k: v for k, v in item.items() if k != "label"}
            check(section, body, f"{where}[{i}]")
    for i, item in enumerate(config.get("processor_resources", [])):
        body = {k: v for k, v in item.items() if k != "label"}
        check("processors", body, f"processor_resources[{i}]")
    return errors


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="connect_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    run_p = sub.add_parser("run", help="run a pipeline YAML")
    run_p.add_argument("config")
    run_p.add_argument("--limit", type=int, default=20)
    run_p.add_argument(
        "--rpcplugin", action="append", default=[], metavar="GLOB",
        help="plugin manifest path/glob to register before the run "
        "(repeatable; the reference's run --rpcplugin flag)")
    run_p.add_argument(
        "--plugins", default="", metavar="MOD[,MOD...]",
        help="comma-separated Python modules registering in-process "
        "components at import (also CONNECT_SPARK_PLUGINS)")
    run_p.add_argument(
        "--set", "-s", action="append", default=[], dest="overrides",
        metavar="PATH=VALUE",
        help="override a config field by dotted path "
        "(repeatable), e.g. -s input.generate.count=5")
    test_p = sub.add_parser("test", help="run a config unit-test suite YAML")
    test_p.add_argument("suite")
    lint_p = sub.add_parser("lint", help="validate configs statically")
    lint_p.add_argument("configs", nargs="+")
    lint_p.add_argument(
        "--rpcplugin", action="append", default=[], metavar="GLOB",
        help="plugin manifest path/glob to register before linting")
    lint_p.add_argument(
        "--plugins", default="", metavar="MOD[,MOD...]",
        help="Python plugin modules to import before linting")
    list_p = sub.add_parser("list", help="list registered components")
    list_p.add_argument("section", nargs="?", default=None)
    echo_p = sub.add_parser("echo", help="parse + re-emit a config")
    echo_p.add_argument("config")
    blobl_p = sub.add_parser(
        "blobl", help="evaluate a Bloblang mapping over stdin JSON lines")
    blobl_p.add_argument("mapping")
    create_p = sub.add_parser(
        "create", help="print a config template: input//proc1,proc2/output")
    create_p.add_argument("spec", nargs="?", default="file//mapping/parquet")
    tools_p = sub.add_parser(
        "tools",
        help="serve a directory of pipeline configs as callable tools "
        "(the mcp_server mode)")
    tools_p.add_argument("dir")
    tools_p.add_argument("--port", type=int, default=0)
    tools_p.add_argument("--port-file", default=None)
    streams_p = sub.add_parser(
        "streams",
        help="run a directory of pipeline configs as isolated streams "
        "with the /streams REST control plane")
    streams_p.add_argument("dir")
    streams_p.add_argument("--port", type=int, default=0)
    streams_p.add_argument("--port-file", default=None)
    plugin_p = sub.add_parser(
        "plugin",
        help="manage out-of-process plugin projects "
        "(the reference's `plugin init` verb)")
    plugin_sub = plugin_p.add_subparsers(dest="plugin_cmd",
                                         required=True)
    pinit_p = plugin_sub.add_parser(
        "init", help="create a plugin project in a directory")
    pinit_p.add_argument("directory")
    pinit_p.add_argument("--language", "-l", default="python")
    pinit_p.add_argument(
        "--component", "-c", default="processor",
        help="input, processor or output")
    pinit_p.add_argument(
        "--protocol", "-p", default="ndjson",
        help="ndjson (default) or arrow (binary Arrow-IPC framing; "
        "python-only, needs pyarrow)")
    agent_p = sub.add_parser(
        "agent",
        help="agent mode: python agents wired to inputs/outputs with "
        "MCP tools (the reference's `agent init|run` verbs)")
    agent_sub = agent_p.add_subparsers(dest="agent_cmd", required=True)
    ainit_p = agent_sub.add_parser(
        "init", help="initialize an agent project directory")
    ainit_p.add_argument("directory", nargs="?", default=".")
    ainit_p.add_argument("--name", default=None)
    arun_p = agent_sub.add_parser(
        "run", help="run every agent in a project directory")
    arun_p.add_argument("directory", nargs="?", default=".")
    arun_p.add_argument("--limit", type=int, default=20)
    dry_p = sub.add_parser(
        "dry_run",
        help="construct every component of each config without "
        "executing (deep build check, beyond lint)")
    dry_p.add_argument("configs", nargs="+")
    dry_p.add_argument(
        "--rpcplugin", action="append", default=[], metavar="GLOB",
        help="plugin manifest path/glob to register first")
    dry_p.add_argument(
        "--plugins", default="", metavar="MOD[,MOD...]",
        help="Python plugin modules to import first")
    args = parser.parse_args(argv)

    if args.cmd == "plugin":
        from connect_spark.plans.pipeline import PipelineConfigError
        from connect_spark.plans.rpcplugin_templates import (
            initialize_project,
        )

        try:
            path = initialize_project(
                args.language, args.component, args.directory,
                protocol=getattr(args, "protocol", "ndjson"))
        except PipelineConfigError as exc:
            print(f"plugin init: {exc}")
            return 1
        print(f"plugin `{os.path.basename(path)}` created at `{path}`")
        print("run the plugin using `python -m connect_spark run "
              "--rpcplugin=./plugin.yaml connect.yaml` in the plugin "
              "directory")
        return 0

    if args.cmd == "agent" and args.agent_cmd == "init":
        from connect_spark.agent_mode import create_template

        path = create_template(args.directory, args.name)
        print(f"agent project created at `{path}`")
        print("run it using `python -m connect_spark agent run "
              f"{args.directory}`")
        return 0

    if getattr(args, "rpcplugin", None):
        from connect_spark.plans.rpcplugin import (
            discover_and_register_plugins,
        )

        discover_and_register_plugins(args.rpcplugin)

    if getattr(args, "plugins", ""):
        from connect_spark.plans.pyplugins import load_plugin_modules

        load_plugin_modules(
            [m for m in args.plugins.split(",") if m.strip()])

    if args.cmd == "lint":
        import yaml

        ok = True
        for path in args.configs:
            with open(path, encoding="utf-8") as fh:
                config = yaml.safe_load(fh) or {}
            for err in lint_config(config):
                ok = False
                print(f"{path}: {err}")
        if ok:
            print("OK")
        return 0 if ok else 1

    if args.cmd == "list":
        kinds = _known_kinds()
        sections = [args.section] if args.section else sorted(kinds)
        for sec in sections:
            if sec not in kinds:
                print(f"unknown section {sec!r}; known: {sorted(kinds)}")
                return 1
            print(f"== {sec} ({len(kinds[sec])})")
            for name in kinds[sec]:
                print(f"  {name}")
        return 0

    if args.cmd == "echo":
        import yaml

        from connect_spark.plans.pipeline import interpolate_env_vars

        with open(args.config, encoding="utf-8") as fh:
            config = yaml.safe_load(
                interpolate_env_vars(fh.read())) or {}
        print(yaml.safe_dump(config, sort_keys=False).rstrip())
        return 0

    if args.cmd == "blobl":
        import json

        from connect_spark.bloblang.pyeval import eval_mapping_value

        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            doc = json.loads(line)
            out = eval_mapping_value(args.mapping, doc)
            print(json.dumps(out, sort_keys=True, default=str))
        return 0

    if args.cmd == "create":
        import yaml

        # input/processors/output, or input/buffer/processors/output
        # (the reference's `create` spec shape; an empty middle
        # segment means no buffer)
        parts = args.spec.split("/")
        if len(parts) == 3:
            inp, buf, procs_s, outp = parts[0], "", parts[1], parts[2]
        elif len(parts) == 4:
            inp, buf, procs_s, outp = parts
        else:
            print("create: spec must be input/processors/output or "
                  "input/buffer/processors/output")
            return 1
        procs = [p for p in procs_s.split(",") if p] or ["mapping"]
        template = {
            "input": {inp or "file": {}},
            "pipeline": {"processors": [{p: {}} for p in procs]},
            "output": {outp or "parquet": {}},
        }
        if buf:
            template["buffer"] = {buf: {}}
        print(yaml.safe_dump(template, sort_keys=False).rstrip())
        return 0

    from connect_spark.session import get_spark

    spark = get_spark("connect_spark_cli")

    if args.cmd == "agent":  # agent run (init returned above)
        from connect_spark.agent_mode import run_agents

        results = run_agents(spark, args.directory)
        for name, df in results.items():
            print(f"== agent {name}")
            if df is not None:
                df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "dry_run":
        # dry_run verb (reference internal/cli/enterprise.go:239):
        # deeper than lint — every component is CONSTRUCTED (resources
        # resolved, Bloblang compiled, the lazy input+processor plan
        # built) but nothing executes. Catches configs that lint
        # (known kinds, right shapes) yet cannot build (bad mapping
        # syntax, missing columns, unresolvable resources).
        import yaml

        from connect_spark.plans import build_pipeline
        from connect_spark.plans.pipeline import interpolate_env_vars

        ok = True
        for path in args.configs:
            with open(path, encoding="utf-8") as fh:
                config = yaml.safe_load(
                    interpolate_env_vars(fh.read())) or {}
            errs = lint_config(config)
            if errs:
                ok = False
                for err in errs:
                    print(f"{path}: lint: {err}")
                continue
            try:
                df = build_pipeline(spark, config).dataframe()
                df.schema  # force analysis of the lazy plan
            except Exception as exc:
                ok = False
                print(f"{path}: build: {exc}")
                continue
            print(f"{path}: OK "
                  f"({len(df.schema.fields)} output columns before "
                  f"the output component)")
        return 0 if ok else 1

    if args.cmd == "streams":
        import glob

        from connect_spark.streams_mode import StreamsServer

        server = StreamsServer(spark)
        for p in sorted(glob.glob(os.path.join(args.dir, "*.yaml"))):
            sid = os.path.splitext(os.path.basename(p))[0]
            server.create(sid, p)
        srv, port = server.serve(args.port)
        print(f"streams mode on http://127.0.0.1:{port}/streams "
              f"({len(server.list())} streams)")
        if args.port_file:
            with open(args.port_file, "w", encoding="utf-8") as fh:
                fh.write(str(port))
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            srv.shutdown()
            server.shutdown()
        return 0

    if args.cmd == "tools":
        from connect_spark.toolserver import ToolServer

        ts = ToolServer(spark)
        n = ts.register_dir(args.dir)
        srv, port = ts.serve(args.port)
        print(f"serving {n} tools on http://127.0.0.1:{port}/tools")
        if args.port_file:
            with open(args.port_file, "w", encoding="utf-8") as fh:
                fh.write(str(port))
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            srv.shutdown()
        return 0

    if args.cmd == "run":
        import yaml

        from connect_spark.plans import build_pipeline

        target = args.config
        if args.overrides:
            with open(args.config, encoding="utf-8") as fh:
                from connect_spark.plans.pipeline import (
                    interpolate_env_vars,
                )

                target = yaml.safe_load(interpolate_env_vars(fh.read()))
            target = target or {}
            for item in args.overrides:
                path, _, raw = item.partition("=")
                node = target
                parts = path.split(".")
                try:
                    for seg in parts[:-1]:
                        if isinstance(node, list):
                            node = node[int(seg)]
                        else:
                            node = node.setdefault(seg, {})
                    last = parts[-1]
                    if isinstance(node, list):
                        node[int(last)] = yaml.safe_load(raw)
                    else:
                        node[last] = yaml.safe_load(raw)
                except (AttributeError, IndexError, TypeError,
                        ValueError) as exc:
                    print(f"--set {item!r}: path does not resolve in "
                          f"the config ({exc})")
                    return 1
        result = build_pipeline(spark, target).run()
        if result is not None:
            result.show(args.limit, truncate=False)
        return 0

    from connect_spark.plans.testrunner import run_suite

    results = run_suite(spark, args.suite)
    ok = True
    for r in results:
        status = "PASS" if r.ok else "FAIL"
        print(f"[{status}] {r.name}")
        for f in r.failures:
            ok = False
            print(f"    {f}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
