"""Agent mode (connect_spark/agent_mode.py; reference
internal/agent/): tool registry over the reference resource shape,
the redpanda_agent_runtime processor hosting a REAL child that walks
multiple MCP tool calls to a final answer, `agent init` + `agent run`
end-to-end on the emitted template project."""

from __future__ import annotations

import json
import sys
import urllib.request

import pytest

from connect_spark.agent_mode import (
    AgentToolRegistry,
    create_template,
    run_agents,
)
from connect_spark.plans.pipeline import (
    PipelineConfigError,
    PROCESSORS,
    build_pipeline,
)

_TOOL_UPPER = """\
label: 'upper'
processors:
  - mapping: 'root = this.uppercase()'
meta:
  mcp:
    enabled: true
    description: 'upper-case the value'
"""

_TOOL_WRAP = """\
label: 'wrap'
processors:
  - mapping: 'root = "[" + this + "]"'
meta:
  mcp:
    enabled: true
    description: 'wrap the value in brackets'
"""

_TOOL_DISABLED = """\
label: 'hidden'
processors:
  - mapping: 'root = this'
meta:
  mcp:
    enabled: false
"""

# An agent child that walks TWO tool calls per message: upper, then
# wrap, then composes the final answer with the tool count.
_TWO_TOOL_AGENT = '''\
import json, os, sys, urllib.request

MCP = os.environ["CONNECT_SPARK_AGENT_MCP_SERVER"]
BASE = MCP.rstrip("/").rsplit("/tools", 1)[0]


def call(path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(BASE + path, data=data,
                                 method="POST" if data else "GET")
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    res = {}
    err = None
    if m == "invoke_agent":
        doc = (p.get("message") or {}).get("structured") or {}
        content = doc.get("content", "")
        tools = call("/tools")["tools"]
        step1 = call("/tools/upper", {"content": content})["content"]
        step2 = call("/tools/wrap", {"content": step1})["content"]
        res = {"message": {"structured": {
            "content": step2, "n_tools": len(tools)},
            "metadata": {}}}
    sys.stdout.write(json.dumps(
        {"id": rid, "result": res, "error": err}) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
'''


def _mcp_dir(tmp_path, *tools):
    d = tmp_path / "mcp" / "resources" / "processors"
    d.mkdir(parents=True, exist_ok=True)
    for i, t in enumerate(tools):
        (d / f"tool_{i}.yaml").write_text(t)
    return str(tmp_path / "mcp")


# ------------------------------------------------------------------
# tool registry
# ------------------------------------------------------------------


def test_registry_loads_enabled_tools_only(tmp_path):
    reg = AgentToolRegistry()
    n = reg.load_dir(_mcp_dir(tmp_path, _TOOL_UPPER, _TOOL_WRAP,
                              _TOOL_DISABLED))
    assert n == 2
    assert [t["name"] for t in reg.list()] == ["upper", "wrap"]


def test_registry_allow_list_filters(tmp_path):
    reg = AgentToolRegistry()
    n = reg.load_dir(_mcp_dir(tmp_path, _TOOL_UPPER, _TOOL_WRAP),
                     allowed=["wrap"])
    assert n == 1
    assert [t["name"] for t in reg.list()] == ["wrap"]


def test_registry_invoke_mapping_fast_path(tmp_path):
    reg = AgentToolRegistry()
    reg.load_dir(_mcp_dir(tmp_path, _TOOL_UPPER))
    assert reg.invoke("upper", "hello") == "HELLO"
    with pytest.raises(PipelineConfigError, match="unknown tool"):
        reg.invoke("nope", "x")


def test_registry_http_surface(tmp_path):
    reg = AgentToolRegistry()
    reg.load_dir(_mcp_dir(tmp_path, _TOOL_UPPER, _TOOL_WRAP))
    srv, port = reg.serve(0)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/tools") as resp:
            doc = json.loads(resp.read())
        assert len(doc["tools"]) == 2
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tools/wrap",
            data=json.dumps({"content": "x"}).encode(),
            method="POST")
        with urllib.request.urlopen(req) as resp:
            assert json.loads(resp.read())["content"] == "[x]"
    finally:
        srv.shutdown()


def test_registry_spark_path_for_non_mapping(tmp_path, spark):
    """A tool whose chain isn't mapping-only routes through the real
    processor registry on a one-row frame."""
    d = tmp_path / "mcp" / "resources" / "processors"
    d.mkdir(parents=True)
    (d / "t.yaml").write_text(
        "label: 'chunk'\n"
        "processors:\n"
        "  - text_chunker:\n"
        "      strategy: recursive_character\n"
        "      chunk_size: 4\n"
        "      chunk_overlap: 0\n"
        "      field: content\n"
        "meta:\n  mcp:\n    enabled: true\n")
    reg = AgentToolRegistry(spark)
    reg.load_dir(str(tmp_path / "mcp"))
    assert reg.invoke("chunk", "abcdefgh") == "abcd"


# ------------------------------------------------------------------
# the runtime processor: a real child walking 2 tool calls
# ------------------------------------------------------------------


def test_agent_runtime_two_tool_loop(tmp_path, spark):
    agent_py = tmp_path / "agent.py"
    agent_py.write_text(_TWO_TOOL_AGENT)
    reg = AgentToolRegistry()
    reg.load_dir(_mcp_dir(tmp_path, _TOOL_UPPER, _TOOL_WRAP))
    srv, port = reg.serve(0)
    try:
        df = spark.createDataFrame(
            [("hello",), ("agent mode",)], "content STRING")
        out = PROCESSORS["redpanda_agent_runtime"](df, {
            "command": [sys.executable, str(agent_py)],
            "mcp_server": f"http://127.0.0.1:{port}/tools",
            "output_schema": "content STRING, n_tools INT",
        })
        rows = sorted((r["content"], r["n_tools"])
                      for r in out.collect())
        assert rows == [("[AGENT MODE]", 2), ("[HELLO]", 2)]
    finally:
        srv.shutdown()


def test_agent_runtime_requires_command(spark):
    df = spark.createDataFrame([("x",)], "content STRING")
    with pytest.raises(PipelineConfigError, match="command"):
        PROCESSORS["redpanda_agent_runtime"](df, {})


# ------------------------------------------------------------------
# agent init + agent run over the template project
# ------------------------------------------------------------------


def test_agent_init_files(tmp_path):
    proj = tmp_path / "myproj"
    create_template(str(proj))
    assert (proj / "redpanda_agents.yaml").exists()
    assert (proj / "agents" / "myproj.py").exists()
    assert (proj / "mcp" / "resources" / "processors" /
            "shout_tool.yaml").exists()
    assert (proj / "README.md").exists()


def test_agent_run_template_end_to_end(tmp_path, spark):
    """`agent run` on the UNMODIFIED init template: the deterministic
    template agent lists its granted tools and applies them; the
    shout tool upper-cases, so 3 generated rows come back shouted."""
    proj = tmp_path / "e2e_agent"
    create_template(str(proj))
    # pin the child interpreter (template uses sys.executable via
    # run_agents, which always launches agents with sys.executable)
    results = run_agents(spark, str(proj))
    assert list(results) == ["e2e_agent"]
    df = results["e2e_agent"]
    rows = sorted(json.loads(r["content"])["content"]
                  for r in df.collect())
    assert rows == ["ITEM 0", "ITEM 1", "ITEM 2"]


def test_agent_run_missing_config(tmp_path, spark):
    with pytest.raises(PipelineConfigError, match="right directory"):
        run_agents(spark, str(tmp_path))


def test_agent_runtime_through_yaml_pipeline(tmp_path, spark):
    """The processor is a first-class registered kind: a plain YAML
    pipeline can host an agent child."""
    agent_py = tmp_path / "agent.py"
    agent_py.write_text(_TWO_TOOL_AGENT)
    reg = AgentToolRegistry()
    reg.load_dir(_mcp_dir(tmp_path, _TOOL_UPPER, _TOOL_WRAP))
    srv, port = reg.serve(0)
    try:
        config = {
            "input": {"generate": {
                "count": 2,
                "mapping": 'root.content = "m" + counter().string()',
            }},
            "pipeline": {"processors": [
                {"redpanda_agent_runtime": {
                    "command": [sys.executable, str(agent_py)],
                    "mcp_server": f"http://127.0.0.1:{port}/tools",
                    "output_schema": "content STRING, n_tools INT",
                }},
            ]},
            "output": {"memory": {}},
        }
        result = build_pipeline(spark, config).run()
        rows = sorted(r["content"] for r in result.collect())
        assert rows == ["[M0]", "[M1]"]
    finally:
        srv.shutdown()


def test_agent_missing_input_is_config_error(tmp_path, spark):
    """r13 ADVICE: an agents.yaml entry without its `input` section
    must raise PipelineConfigError naming the agent, not KeyError."""
    (tmp_path / "redpanda_agents.yaml").write_text(
        "agents:\n  broken:\n    tools: []\n")
    with pytest.raises(PipelineConfigError, match="broken.*input"):
        run_agents(spark, str(tmp_path))


def test_agent_non_mapping_entry_is_config_error(tmp_path, spark):
    (tmp_path / "redpanda_agents.yaml").write_text(
        "agents:\n  scalar_agent: 42\n")
    with pytest.raises(PipelineConfigError,
                       match="scalar_agent.*mapping"):
        run_agents(spark, str(tmp_path))


# ------------------------------------------------------------------
# r13: partition-inline tool dispatch (verdict task #3)
# ------------------------------------------------------------------


def test_mapping_stateful_tool_split(tmp_path):
    reg = AgentToolRegistry()
    reg._tools["pure"] = {
        "processors": [{"mapping": "root = this.uppercase()"}],
        "description": "pure"}
    reg._tools["stateful"] = {
        "processors": [{"cache": {"resource": "c", "operator": "get",
                                  "key": "k"}}],
        "description": "needs server"}
    inline = reg.mapping_tools()
    assert list(inline) == ["pure"]
    assert inline["pure"]["mappings"] == ["root = this.uppercase()"]
    assert reg.stateful_tools() == ["stateful"]


def test_runtime_tools_inline_no_central_server(tmp_path, spark):
    """The processor with tools_inline and NO mcp_server: the child's
    HTTP tool calls hit the partition-local shim; the answer is
    correct with zero central infrastructure."""
    script = tmp_path / "agent.py"
    script.write_text(_TWO_TOOL_AGENT)
    df = spark.createDataFrame(
        [("hello",), ("world",)], "content STRING").repartition(2)
    out = PROCESSORS["redpanda_agent_runtime"](df, {
        "command": [sys.executable, str(script)],
        "tools_inline": {
            "upper": {"mappings": ["root = this.uppercase()"],
                      "description": "upper"},
            "wrap": {"mappings": ['root = "[" + this + "]"'],
                     "description": "wrap"},
        },
        "output_schema": "content STRING, n_tools INT",
    })
    rows = sorted((r["content"], r["n_tools"]) for r in out.collect())
    assert rows == [("[HELLO]", 2), ("[WORLD]", 2)]


def test_runtime_inline_env_reaches_child(tmp_path, spark):
    """CONNECT_SPARK_AGENT_TOOLS_INLINE carries the mapping sources
    verbatim so a capable agent can dispatch with zero HTTP."""
    script = tmp_path / "agent.py"
    script.write_text('''\
import json, os, sys
INLINE = json.loads(os.environ["CONNECT_SPARK_AGENT_TOOLS_INLINE"])
for line in sys.stdin:
    if not line.strip():
        continue
    req = json.loads(line)
    rid, m, p = req["id"], req["method"], req.get("params") or {}
    res = {}
    if m == "invoke_agent":
        res = {"message": {"structured": {
            "tools_csv": ",".join(sorted(INLINE))}, "metadata": {}}}
    sys.stdout.write(json.dumps(
        {"id": rid, "result": res, "error": None}) + "\\n")
    sys.stdout.flush()
    if m == "close":
        break
''')
    df = spark.createDataFrame([("x",)], "content STRING")
    out = PROCESSORS["redpanda_agent_runtime"](df, {
        "command": [sys.executable, str(script)],
        "tools_inline": {
            "a": {"mappings": ["root = this"], "description": ""},
            "b": {"mappings": ["root = this"], "description": ""},
        },
        "output_schema": "tools_csv STRING",
    })
    assert out.collect()[0]["tools_csv"] == "a,b"


def test_shim_proxies_stateful_to_central(tmp_path, spark):
    """Mixed tool set: mapping tools inline, a non-mapping tool on
    the central registry; the shim proxies by name."""
    reg = AgentToolRegistry(spark)
    reg._tools["suffix"] = {
        "processors": [{"mapping": 'root = this + "!"'}],
        "description": "inline"}
    reg._tools["lookup"] = {
        "processors": [{"mapping": 'root = "srv:" + this'},
                       {"label": "x",
                        "mapping": "root = this.uppercase()"}],
        "description": "central (two-step, kept central for the "
                       "test via direct registry use)"}
    # force `lookup` central by serving it from the registry and NOT
    # including it in tools_inline
    srv, port = reg.serve(0)
    try:
        script = tmp_path / "agent.py"
        script.write_text(_TWO_TOOL_AGENT.replace("upper", "suffix")
                          .replace("wrap", "lookup"))
        df = spark.createDataFrame([("hi",)], "content STRING")
        out = PROCESSORS["redpanda_agent_runtime"](df, {
            "command": [sys.executable, str(script)],
            "mcp_server": f"http://127.0.0.1:{port}/tools",
            "tools_inline": {
                "suffix": {"mappings": ['root = this + "!"'],
                           "description": "inline"},
            },
            "output_schema": "content STRING, n_tools INT",
        })
        rows = [(r["content"], r["n_tools"]) for r in out.collect()]
        # suffix inline → "hi!", lookup proxied → "SRV:HI!";
        # /tools listing merges shim (1) + central (2, deduped) = 2
        assert rows == [("SRV:HI!", 2)]
    finally:
        srv.shutdown()


def test_tools_inline_validation(spark):
    df = spark.createDataFrame([("x",)], "content STRING")
    with pytest.raises(PipelineConfigError, match="tools_inline"):
        PROCESSORS["redpanda_agent_runtime"](df, {
            "command": ["x"], "tools_inline": {"t": "not-a-dict"}})


def test_run_agents_template_uses_inline_path(tmp_path, spark,
                                              monkeypatch):
    """The init template's only tool is mapping-only, so run_agents
    must NOT start a central server — assert by making serve()
    explode if called."""
    proj = tmp_path / "inline_agent"
    create_template(str(proj))
    monkeypatch.setattr(
        AgentToolRegistry, "serve",
        lambda self, port=0: (_ for _ in ()).throw(
            AssertionError("central server started for a "
                           "mapping-only tool set")))
    results = run_agents(spark, str(proj))
    rows = sorted(json.loads(r["content"])["content"]
                  for r in results["inline_agent"].collect())
    assert rows == ["ITEM 0", "ITEM 1", "ITEM 2"]
