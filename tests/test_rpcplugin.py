"""Out-of-process RPC plugins (plans/rpcplugin.py; reference
internal/rpcplugin/): manifest validation, field-spec parsing, and
REAL child processes driven end-to-end through YAML pipelines —
processor (distributed mapInPandas host), input (driver host),
output (per-partition writer), crash restart, and the `plugin init`
template projects run as-is."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from connect_spark.plans.pipeline import PipelineConfigError
from connect_spark.plans import build_pipeline
from connect_spark.plans.pipeline import (
    INPUT_KINDS,
    OUTPUT_KINDS,
    PROCESSORS,
)
from connect_spark.plans.rpcplugin import (
    FieldSpec,
    discover_and_register_plugins,
    parse_manifest,
)
from connect_spark.plans.rpcplugin_templates import initialize_project

# A minimal processor plugin: upper-cases `text`, adds its length,
# honors a `suffix` config field (the reference's catshout fixture
# shape: testdata/catshout).
_SHOUT_PLUGIN = """\
import json, sys
CFG = {}
for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    if m == "init":
        CFG.update(p.get("config") or {})
        out = {"id": rid, "result": {}, "error": None}
    elif m == "process_batch":
        msgs = []
        for msg in (p.get("batch") or {}).get("messages") or []:
            doc = msg["structured"]
            doc["text"] = doc["text"].upper() + CFG.get("suffix", "")
            doc["text_len"] = len(doc["text"])
            msgs.append({"structured": doc, "metadata": {}})
        out = {"id": rid, "result": {"batches": [{"messages": msgs}]},
               "error": None}
    elif m == "close":
        out = {"id": rid, "result": {}, "error": None}
    else:
        out = {"id": rid, "result": {}, "error": None}
    sys.stdout.write(json.dumps(out) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
"""

_COUNTER_INPUT = """\
import json, sys
CFG = {"count": 3}
sent = 0
for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    err = None
    res = {}
    if m == "init":
        CFG.update(p.get("config") or {})
    elif m == "read_batch":
        if sent >= int(CFG["count"]):
            err = {"message": "end of input", "detail": "end_of_input"}
        else:
            res = {"batch": {"messages": [
                {"structured": {"n": sent, "label": "row%d" % sent},
                 "metadata": {}}]}, "batch_id": sent}
            sent += 1
    sys.stdout.write(json.dumps(
        {"id": rid, "result": res, "error": err}) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
"""

_FILE_OUTPUT = """\
import json, os, sys
CFG = {}
fh = None
for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    if m == "init":
        CFG.update(p.get("config") or {})
    elif m == "connect":
        path = os.path.join(CFG["dir"], "part-%d.jsonl" % os.getpid())
        fh = open(path, "a", encoding="utf-8")
    elif m == "write_batch":
        for msg in (p.get("batch") or {}).get("messages") or []:
            fh.write(json.dumps(msg["structured"], sort_keys=True)
                     + "\\n")
        fh.flush()
    sys.stdout.write(json.dumps(
        {"id": rid, "result": {}, "error": None}) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
"""

# Crashes (exits) on the FIRST process_batch after each fresh init;
# succeeds on the second attempt per process lifetime. The host's
# restart loop must recover — a restarted instance crashes again,
# so this only passes if state resets per spawn AND the host
# re-inits. To make restart succeed we crash only when a marker
# file does not exist yet, creating it first.
_CRASHY_PLUGIN = """\
import json, os, sys
marker = sys.argv[1]
for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    if m == "process_batch":
        if not os.path.exists(marker):
            open(marker, "w").write("crashed once")
            sys.exit(1)
        msgs = [{"structured": {"ok": True}, "metadata": {}}]
        out = {"id": rid, "result": {"batches": [{"messages": msgs}]},
               "error": None}
    else:
        out = {"id": rid, "result": {}, "error": None}
    sys.stdout.write(json.dumps(out) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
"""


def _write_plugin(tmp_path, name, script, manifest_extra):
    pdir = tmp_path / name
    pdir.mkdir(exist_ok=True)
    (pdir / "main.py").write_text(script)
    manifest = {"name": name,
                "command": [sys.executable, "main.py"],
                **manifest_extra}
    import yaml

    (pdir / "plugin.yaml").write_text(yaml.safe_dump(manifest))
    return str(pdir / "plugin.yaml")


@pytest.fixture(autouse=True)
def _clean_kinds():
    from connect_spark.plans.rpcplugin import _REGISTERED_PLUGINS

    before = (set(INPUT_KINDS), set(PROCESSORS), set(OUTPUT_KINDS))
    origins = dict(_REGISTERED_PLUGINS)
    yield
    for reg, names in zip((INPUT_KINDS, PROCESSORS, OUTPUT_KINDS),
                          before):
        for k in set(reg) - names:
            del reg[k]
    _REGISTERED_PLUGINS.clear()
    _REGISTERED_PLUGINS.update(origins)


# ------------------------------------------------------------------
# manifest validation (config.go Validate paths)
# ------------------------------------------------------------------


def test_manifest_requires_name_command_type():
    with pytest.raises(PipelineConfigError, match="name is required"):
        parse_manifest({"command": ["x"], "type": "processor"})
    with pytest.raises(PipelineConfigError,
                       match="command is required"):
        parse_manifest({"name": "p", "type": "processor"})
    with pytest.raises(PipelineConfigError, match="plugin type"):
        parse_manifest({"name": "p", "command": ["x"],
                        "type": "widget"})


def test_manifest_field_validation():
    with pytest.raises(PipelineConfigError, match="field type"):
        parse_manifest({"name": "p", "command": ["x"],
                        "type": "processor",
                        "fields": [{"name": "f", "type": "uint128"}]})
    with pytest.raises(PipelineConfigError, match="field kind"):
        parse_manifest({"name": "p", "command": ["x"],
                        "type": "processor",
                        "fields": [{"name": "f", "kind": "tuple"}]})
    with pytest.raises(PipelineConfigError, match="name is required"):
        parse_manifest({"name": "p", "command": ["x"],
                        "type": "processor", "fields": [{}]})


def test_field_parse_defaults_required_types():
    m = parse_manifest({
        "name": "p", "command": ["x"], "type": "processor",
        "fields": [
            {"name": "suffix", "type": "string", "default": "!"},
            {"name": "n", "type": "int"},
            {"name": "tags", "type": "string", "kind": "list",
             "default": []},
        ]})
    cfg = m.parse_config({"n": 3})
    assert cfg == {"suffix": "!", "n": 3, "tags": []}
    with pytest.raises(PipelineConfigError, match="required field"):
        m.parse_config({})
    with pytest.raises(PipelineConfigError, match="expects an int"):
        m.parse_config({"n": "three"})
    with pytest.raises(PipelineConfigError, match="expects a list"):
        m.parse_config({"n": 1, "tags": "solo"})
    with pytest.raises(PipelineConfigError, match="unknown fields"):
        m.parse_config({"n": 1, "bogus": True})


def test_scalar_coercions():
    f = FieldSpec(name="x", type="float")
    assert f.coerce(2) == 2.0
    with pytest.raises(PipelineConfigError):
        f.coerce(True)  # bool is not a float
    b = FieldSpec(name="x", type="bool")
    with pytest.raises(PipelineConfigError):
        b.coerce(1)
    m = FieldSpec(name="x", type="int", kind="map")
    assert m.coerce({"a": 1}) == {"a": 1}


def test_discover_rejects_missing_path(tmp_path):
    with pytest.raises(PipelineConfigError, match="matches nothing"):
        discover_and_register_plugins(
            [str(tmp_path / "nope" / "*.yaml")])


# ------------------------------------------------------------------
# end-to-end hosts (real child processes)
# ------------------------------------------------------------------


def test_processor_plugin_end_to_end(spark, tmp_path):
    mpath = _write_plugin(
        tmp_path, "shout", _SHOUT_PLUGIN,
        {"type": "processor",
         "fields": [{"name": "suffix", "type": "string",
                     "default": ""}],
         "output_schema": "text STRING, text_len INT"})
    names = discover_and_register_plugins([mpath])
    assert names == ["shout"]
    df = spark.createDataFrame(
        [("hello world",), ("spark",)], "text STRING")
    out = PROCESSORS["shout"](df, {"suffix": ", meow"})
    rows = {r["text"]: r["text_len"] for r in out.collect()}
    assert rows == {"HELLO WORLD, meow": 17, "SPARK, meow": 11}


def test_processor_plugin_through_yaml_pipeline(spark, tmp_path):
    mpath = _write_plugin(
        tmp_path, "shout2", _SHOUT_PLUGIN,
        {"type": "processor",
         "fields": [{"name": "suffix", "type": "string",
                     "default": ""}],
         "output_schema": "text STRING, text_len INT"})
    discover_and_register_plugins([mpath])
    src = tmp_path / "rows.jsonl"
    src.write_text('{"text": "abc"}\n{"text": "de"}\n')
    config = {
        "input": {"json_documents": {"path": str(src)}},
        "pipeline": {"processors": [{"shout2": {"suffix": "!"}}]},
        "output": {"memory": {}},
    }
    result = build_pipeline(spark, config).run()
    got = sorted((r["text"], r["text_len"]) for r in result.collect())
    assert got == [("ABC!", 4), ("DE!", 3)]


def test_input_plugin_end_to_end(spark, tmp_path):
    mpath = _write_plugin(
        tmp_path, "counter_in", _COUNTER_INPUT,
        {"type": "input",
         "fields": [{"name": "count", "type": "int", "default": 3}],
         "output_schema": "n BIGINT, label STRING"})
    discover_and_register_plugins([mpath])
    df = INPUT_KINDS["counter_in"](spark, {"count": 4})
    rows = sorted((r["n"], r["label"]) for r in df.collect())
    assert rows == [(0, "row0"), (1, "row1"), (2, "row2"),
                    (3, "row3")]


def test_output_plugin_end_to_end(spark, tmp_path):
    outdir = tmp_path / "sinkdir"
    outdir.mkdir()
    mpath = _write_plugin(
        tmp_path, "file_out", _FILE_OUTPUT,
        {"type": "output",
         "fields": [{"name": "dir", "type": "string"}]})
    discover_and_register_plugins([mpath])
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k INT, v STRING"
    ).repartition(3)
    OUTPUT_KINDS["file_out"](df, {"dir": str(outdir)})
    got = []
    for f in os.listdir(outdir):
        with open(outdir / f, encoding="utf-8") as fh:
            got.extend(json.loads(line) for line in fh)
    assert sorted((r["k"], r["v"]) for r in got) == [
        (i, f"v{i}") for i in range(10)]


def test_processor_plugin_crash_restart(spark, tmp_path):
    pdir = tmp_path / "crashy"
    pdir.mkdir()
    (pdir / "main.py").write_text(_CRASHY_PLUGIN)
    marker = str(pdir / "crashed.marker")
    import yaml

    (pdir / "plugin.yaml").write_text(yaml.safe_dump({
        "name": "crashy",
        "command": [sys.executable, "main.py", marker],
        "type": "processor",
        "output_schema": "ok BOOLEAN"}))
    discover_and_register_plugins([str(pdir / "plugin.yaml")])
    df = spark.createDataFrame([("x",)], "text STRING").coalesce(1)
    out = PROCESSORS["crashy"](df, {})
    assert [r["ok"] for r in out.collect()] == [True]
    assert os.path.exists(marker)  # it really did die once


def test_plugin_error_propagates(spark, tmp_path):
    script = """\
import json, sys
for line in sys.stdin:
    req = json.loads(line)
    rid, m = req["id"], req["method"]
    if m == "process_batch":
        out = {"id": rid, "result": None,
               "error": {"message": "kaboom from plugin"}}
    else:
        out = {"id": rid, "result": {}, "error": None}
    sys.stdout.write(json.dumps(out) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
"""
    mpath = _write_plugin(tmp_path, "failing", script,
                          {"type": "processor"})
    discover_and_register_plugins([mpath])
    df = spark.createDataFrame([("x",)], "text STRING")
    out = PROCESSORS["failing"](df, {})
    with pytest.raises(Exception, match="kaboom from plugin"):
        out.collect()


# ------------------------------------------------------------------
# plugin init templates (init.go InitializeProject)
# ------------------------------------------------------------------


@pytest.mark.parametrize("comp", ["input", "processor", "output"])
def test_init_template_files(tmp_path, comp):
    proj = tmp_path / f"my_{comp}"
    initialize_project("python", comp, str(proj))
    assert (proj / "main.py").exists()
    assert (proj / "plugin.yaml").exists()
    assert (proj / "README.md").exists()
    m = parse_manifest(
        __import__("yaml").safe_load((proj / "plugin.yaml").read_text()),
        str(proj / "plugin.yaml"))
    assert m.name == f"my_{comp}" and m.type == comp
    # the emitted main.py is valid python
    subprocess.run([sys.executable, "-m", "py_compile",
                    str(proj / "main.py")], check=True)


def test_init_rejects_unknown_language(tmp_path):
    with pytest.raises(PipelineConfigError, match="language"):
        initialize_project("rust", "processor",
                           str(tmp_path / "x"))


def test_init_template_processor_runs(spark, tmp_path):
    """The generated processor project works UNMODIFIED end-to-end:
    default process() echoes the document through the child."""
    proj = tmp_path / "echoer"
    initialize_project("python", "processor", str(proj))
    # template command is ["python3", "main.py"]; pin the interpreter
    import yaml

    doc = yaml.safe_load((proj / "plugin.yaml").read_text())
    doc["command"] = [sys.executable, "main.py"]
    doc["output_schema"] = "text STRING"
    (proj / "plugin.yaml").write_text(yaml.safe_dump(doc))
    discover_and_register_plugins([str(proj / "plugin.yaml")])
    df = spark.createDataFrame([("keepme",)], "text STRING")
    out = PROCESSORS["echoer"](df, {})
    assert [r["text"] for r in out.collect()] == ["keepme"]


def test_init_template_input_runs(spark, tmp_path):
    proj = tmp_path / "gen3"
    initialize_project("python", "input", str(proj))
    import yaml

    doc = yaml.safe_load((proj / "plugin.yaml").read_text())
    doc["command"] = [sys.executable, "main.py"]
    doc["output_schema"] = "n BIGINT"
    doc["fields"] = [{"name": "count", "type": "int", "default": 3}]
    (proj / "plugin.yaml").write_text(yaml.safe_dump(doc))
    discover_and_register_plugins([str(proj / "plugin.yaml")])
    df = INPUT_KINDS["gen3"](spark, {"count": 2})
    assert sorted(r["n"] for r in df.collect()) == [0, 1]


# ------------------------------------------------------------------
# CLI verbs
# ------------------------------------------------------------------


def test_cli_plugin_init(tmp_path):
    from connect_spark.__main__ import main

    rc = main(["plugin", "init", str(tmp_path / "clip"),
               "--component", "output"])
    assert rc == 0
    assert (tmp_path / "clip" / "plugin.yaml").exists()


def test_cli_plugin_init_bad_component(tmp_path):
    from connect_spark.__main__ import main

    rc = main(["plugin", "init", str(tmp_path / "clip2"),
               "--component", "widget"])
    assert rc == 1


# ------------------------------------------------------------------
# r13 ADVICE regressions: duplicate registration + backoff honor
# ------------------------------------------------------------------


def test_duplicate_plugin_name_raises(tmp_path):
    """MustRegister* semantics: a second plugin with the same name
    is a config error, not a silent overwrite."""
    m1 = _write_plugin(
        tmp_path, "dupe", _SHOUT_PLUGIN,
        {"type": "processor", "fields": []})
    discover_and_register_plugins([m1])
    other = tmp_path / "other"
    other.mkdir()
    (other / "main.py").write_text(_SHOUT_PLUGIN)
    import yaml
    (other / "plugin.yaml").write_text(yaml.safe_dump(
        {"name": "dupe", "command": [sys.executable, "main.py"],
         "type": "processor", "fields": []}))
    with pytest.raises(PipelineConfigError, match="shadow"):
        discover_and_register_plugins([str(other / "plugin.yaml")])


def test_plugin_shadowing_builtin_raises(tmp_path):
    """A plugin named after a built-in processor (e.g. `mapping`)
    must be rejected."""
    before = PROCESSORS["mapping"]
    mpath = _write_plugin(
        tmp_path, "mapping", _SHOUT_PLUGIN,
        {"type": "processor", "fields": []})
    with pytest.raises(PipelineConfigError, match="built-in"):
        discover_and_register_plugins([mpath])
    assert PROCESSORS["mapping"] is before  # built-in untouched


def test_same_manifest_rediscovery_is_idempotent(tmp_path):
    """run → dry_run in one process re-discovers the same manifest
    file; that must not raise."""
    mpath = _write_plugin(
        tmp_path, "idem", _SHOUT_PLUGIN,
        {"type": "processor", "fields": []})
    assert discover_and_register_plugins([mpath]) == ["idem"]
    assert discover_and_register_plugins([mpath]) == ["idem"]


# A processor that signals backoff N times before succeeding — the
# host must sleep and retry rather than failing the task
# (runtimepb/error.go NewBackOffError).
_BACKOFF_PLUGIN = """\
import json, sys
remaining = 2
for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    err = None
    res = {}
    if m == "process_batch":
        if remaining > 0:
            remaining -= 1
            err = {"message": "try later",
                   "detail": {"backoff_ms": 10}}
        else:
            msgs = []
            for msg in (p.get("batch") or {}).get("messages") or []:
                doc = msg["structured"]
                doc["ok"] = True
                msgs.append({"structured": doc, "metadata": {}})
            res = {"batches": [{"messages": msgs}]}
    sys.stdout.write(json.dumps(
        {"id": rid, "result": res, "error": err}) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
"""


def test_backoff_detail_is_honored(spark, tmp_path):
    mpath = _write_plugin(
        tmp_path, "backoffy", _BACKOFF_PLUGIN,
        {"type": "processor", "fields": [],
         "output_schema": "text STRING, ok BOOLEAN"})
    discover_and_register_plugins([mpath])
    df = spark.createDataFrame([("a",)], "text STRING").coalesce(1)
    out = PROCESSORS["backoffy"](df, {})
    rows = [(r["text"], r["ok"]) for r in out.collect()]
    assert rows == [("a", True)]


def test_backoff_gives_up_after_cap():
    from connect_spark.plans.rpcplugin import (
        PluginError, _call_with_backoff)

    class _AlwaysBackoff:
        calls = 0

        def call(self, method, **kw):
            self.calls += 1
            raise PluginError("busy", {"backoff_ms": 0})

    c = _AlwaysBackoff()
    with pytest.raises(PluginError, match="consecutive"):
        _call_with_backoff(c, "process_batch")
    assert c.calls == 64


# ------------------------------------------------------------------
# golang plugin template (r13 verdict task #4; reference
# internal/rpcplugin/golangtemplate + generate_plugin.go)
# ------------------------------------------------------------------


@pytest.mark.parametrize("comp,hook", [("processor", "process"),
                                       ("input", "readBatch"),
                                       ("output", "write")])
def test_golang_template_tree(tmp_path, comp, hook):
    import yaml

    proj = tmp_path / f"go_{comp}_plug"
    initialize_project("golang", comp, str(proj))
    files = sorted(p.name for p in proj.iterdir())
    assert files == ["README.md", "go.mod", "main.go", "plugin.yaml"]
    # manifest parses through the real validator and carries the
    # compiled-binary command
    doc = yaml.safe_load((proj / "plugin.yaml").read_text())
    m = parse_manifest(doc, str(proj / "plugin.yaml"))
    assert m.name == f"go_{comp}_plug"
    assert m.type == comp
    assert m.command == ["./main"]
    gomod = (proj / "go.mod").read_text()
    assert gomod.startswith(f"module go_{comp}_plug\n")
    assert "go 1." in gomod
    readme = (proj / "README.md").read_text()
    assert "go build -o main ." in readme
    assert hook in readme
    src = (proj / "main.go").read_text()
    assert "package main" in src
    assert f"func {hook}(" in src or f"func {hook} (" in src
    # zero-dependency contract: stdlib imports only
    import re as _re
    imports = _re.findall(r'"([a-z/]+)"', src.split("func ")[0])
    assert set(imports) <= {"bufio", "bytes", "encoding/json",
                            "fmt", "os"}


def test_golang_template_protocol_surface(tmp_path):
    """The emitted Go source must speak the exact NDJSON method set
    the host drives (per component)."""
    proj = tmp_path / "surface"
    initialize_project("golang", "input", str(proj))
    src = (proj / "main.go").read_text()
    for method in ("init", "read_batch", "close"):
        assert f'case "{method}"' in src
    assert "end_of_input" in src
    proj2 = tmp_path / "surface2"
    initialize_project("golang", "output", str(proj2))
    src2 = (proj2 / "main.go").read_text()
    assert 'case "write_batch"' in src2


def test_unknown_language_rejected(tmp_path):
    with pytest.raises(PipelineConfigError,
                       match=r"\['golang', 'python'\]"):
        initialize_project("rust", "processor", str(tmp_path / "x"))


# ------------------------------------------------------------------
# protocol: arrow (r13 verdict task #5; binary Arrow-IPC framing)
# ------------------------------------------------------------------

_ARROW_PROC_PLUGIN = """\
import json, sys
import pyarrow as pa
import pyarrow.compute as pc

stdin = sys.stdin.buffer
stdout = sys.stdout.buffer
CFG = {}


def reply(rid, result=None, error=None, body=None):
    hdr = {"id": rid, "result": result, "error": error}
    payload = b""
    if body is not None:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, body.schema) as w:
            w.write_table(body)
        payload = sink.getvalue().to_pybytes()
        hdr["body_len"] = len(payload)
    stdout.write(json.dumps(hdr).encode() + b"\\n")
    if payload:
        stdout.write(payload)
    stdout.flush()


while True:
    line = stdin.readline()
    if not line:
        break
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    n = int(req.get("body_len") or 0)
    tbl = pa.ipc.open_stream(stdin.read(n)).read_all() if n else None
    if m == "init":
        CFG.update(p.get("config") or {})
        reply(rid, {})
    elif m == "process_batch":
        out = tbl.append_column(
            "text_upper", pc.utf8_upper(tbl.column("text")))
        out = out.append_column(
            "text_len", pc.cast(pc.utf8_length(tbl.column("text")),
                                pa.int32()))
        reply(rid, {}, None, out)
    elif m == "close":
        reply(rid, {})
        break
    else:
        reply(rid, {})
"""

_ARROW_INPUT_PLUGIN = """\
import json, sys
import pyarrow as pa

stdin = sys.stdin.buffer
stdout = sys.stdout.buffer
CFG = {"count": 3}
sent = 0


def reply(rid, result=None, error=None, body=None):
    hdr = {"id": rid, "result": result, "error": error}
    payload = b""
    if body is not None:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, body.schema) as w:
            w.write_table(body)
        payload = sink.getvalue().to_pybytes()
        hdr["body_len"] = len(payload)
    stdout.write(json.dumps(hdr).encode() + b"\\n")
    if payload:
        stdout.write(payload)
    stdout.flush()


while True:
    line = stdin.readline()
    if not line:
        break
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    if m == "init":
        CFG.update(p.get("config") or {})
        reply(rid, {})
    elif m == "read_batch":
        if sent >= int(CFG["count"]):
            reply(rid, None, {"message": "end of input",
                              "detail": "end_of_input"})
        else:
            tbl = pa.table({"n": pa.array([sent], pa.int64()),
                            "label": ["row%d" % sent]})
            reply(rid, {"batch_id": sent}, None, tbl)
            sent += 1
    elif m == "close":
        reply(rid, {})
        break
    else:
        reply(rid, {})
"""


def test_arrow_manifest_requires_output_schema():
    with pytest.raises(PipelineConfigError, match="output_schema"):
        parse_manifest({"name": "p", "command": ["x"],
                        "type": "processor", "protocol": "arrow"})
    with pytest.raises(PipelineConfigError, match="protocol"):
        parse_manifest({"name": "p", "command": ["x"],
                        "type": "processor", "protocol": "grpc"})
    # outputs consume batches, they don't emit them — no schema needed
    parse_manifest({"name": "p", "command": ["x"],
                    "type": "output", "protocol": "arrow"})


def test_arrow_processor_end_to_end(spark, tmp_path):
    mpath = _write_plugin(
        tmp_path, "arrow_shout", _ARROW_PROC_PLUGIN,
        {"type": "processor", "protocol": "arrow",
         "output_schema": ("doc_id BIGINT, text STRING, "
                           "text_upper STRING, text_len INT")})
    discover_and_register_plugins([mpath])
    df = spark.createDataFrame(
        [(1, "hello"), (2, "spark arrow")],
        "doc_id BIGINT, text STRING").repartition(2)
    out = PROCESSORS["arrow_shout"](df, {})
    rows = sorted((r["doc_id"], r["text_upper"], r["text_len"])
                  for r in out.collect())
    assert rows == [(1, "HELLO", 5), (2, "SPARK ARROW", 11)]


def test_arrow_input_end_to_end(spark, tmp_path):
    mpath = _write_plugin(
        tmp_path, "arrow_counter", _ARROW_INPUT_PLUGIN,
        {"type": "input", "protocol": "arrow",
         "fields": [{"name": "count", "type": "int", "default": 4}],
         "output_schema": "n BIGINT, label STRING"})
    discover_and_register_plugins([mpath])
    df = INPUT_KINDS["arrow_counter"](spark, {})
    rows = sorted((r["n"], r["label"]) for r in df.collect())
    assert rows == [(0, "row0"), (1, "row1"), (2, "row2"),
                    (3, "row3")]


def test_arrow_wire_roundtrip_binary(tmp_path):
    """Direct client-level check: the body crosses as raw Arrow IPC
    (no base64) and survives bit-exact."""
    import pyarrow as pa

    from connect_spark.plans.rpcplugin import ArrowPluginClient

    pdir = tmp_path / "echo"
    pdir.mkdir()
    (pdir / "main.py").write_text(_ARROW_PROC_PLUGIN)
    client = ArrowPluginClient([sys.executable, "main.py"],
                               str(pdir))
    client.start()
    try:
        client.call("init", config={})
        tbl = pa.table({"doc_id": pa.array([7], pa.int64()),
                        "text": ["abc"]})
        _res, out = client.call_arrow("process_batch", body=tbl)
        assert out.column("text_upper").to_pylist() == ["ABC"]
        assert out.column("doc_id").to_pylist() == [7]
    finally:
        client.close()


def test_arrow_template_projects_run_unmodified(spark, tmp_path):
    """`plugin init --protocol arrow`: the generated input and
    processor projects run END-TO-END as emitted — the input's
    (n BIGINT) batches flow through the echo processor."""
    inp = tmp_path / "arrow_in"
    initialize_project("python", "input", str(inp),
                       protocol="arrow")
    proc = tmp_path / "arrow_proc"
    initialize_project("python", "processor", str(proc),
                       protocol="arrow")
    for d in (inp, proc):
        assert sorted(p.name for p in d.iterdir()) == [
            "README.md", "main.py", "plugin.yaml"]
    discover_and_register_plugins([str(inp / "plugin.yaml"),
                                   str(proc / "plugin.yaml")])
    df = INPUT_KINDS["arrow_in"](spark, {"count": 5})
    out = PROCESSORS["arrow_proc"](df, {})
    assert sorted(r["n"] for r in out.collect()) == [0, 1, 2, 3, 4]


def test_arrow_template_output_runs(spark, tmp_path):
    proj = tmp_path / "arrow_out"
    initialize_project("python", "output", str(proj),
                       protocol="arrow")
    discover_and_register_plugins([str(proj / "plugin.yaml")])
    df = spark.createDataFrame([(1,), (2,)], "n BIGINT")
    OUTPUT_KINDS["arrow_out"](df, {})  # must not raise


def test_arrow_template_golang_rejected(tmp_path):
    with pytest.raises(PipelineConfigError, match="python-only"):
        initialize_project("golang", "processor",
                           str(tmp_path / "x"), protocol="arrow")
    with pytest.raises(PipelineConfigError, match="protocol"):
        initialize_project("python", "processor",
                           str(tmp_path / "y"), protocol="grpc")
