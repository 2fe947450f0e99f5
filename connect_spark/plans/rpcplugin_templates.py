"""`plugin init` project templates (reference
`internal/rpcplugin/init.go` + `pythontemplate/{input,processor,
output}/`): emit a runnable plugin project — main.py + plugin.yaml +
README — into a directory, named after it.

The reference's python template depends on an external
`redpanda_connect` package providing `processor_main` etc.; the
emitted main.py here inlines the ~50-line NDJSON-stdio loop instead,
so a generated plugin runs with a bare `python3` and no installs
(the sandbox has no uv/pip).

The golang language arm (reference `golangtemplate/{input,processor,
output}/` + init.go's PROJECT_NAME_HERE/GO_VERSION substitution)
emits main.go + go.mod + plugin.yaml + README.  Like the python arm
it inlines a zero-dependency NDJSON-stdio runtime (Go stdlib only —
the reference's template instead imports its rpcn SDK); unlike the
python arm the emitted project CANNOT be compiled or executed here
(no Go toolchain in this environment — honest gate), so tests
validate the manifest, the file tree and the README build
instructions, and the README tells the user to `go build -o main .`
before running."""

from __future__ import annotations

import os

from connect_spark.plans.pipeline import PipelineConfigError

_SDK = '''\
# --- plugin runtime (NDJSON-RPC over stdio; inlined so this file ---
# --- has zero dependencies; protocol: connect_spark rpcplugin)   ---
import json
import sys


def _reply(rid, result=None, error=None):
    sys.stdout.write(json.dumps(
        {"id": rid, "result": result, "error": error}) + "\\n")
    sys.stdout.flush()


def _err(message, detail=None):
    return {"message": message, "detail": detail}


def serve(init=None, connect=None, read_batch=None, ack=None,
          process=None, write=None, close=None):
    """Dispatch requests until stdin closes.  Handlers:
    init(config), connect(), read_batch() -> (messages, batch_id) or
    None at end of input, ack(batch_id, error), process(msg) -> msg /
    list-of-msgs, write(msg), close()."""
    for line in sys.stdin:
        if not line.strip():
            continue
        req = json.loads(line)
        rid, method = req.get("id"), req.get("method")
        params = req.get("params") or {}
        try:
            if method == "init":
                if init:
                    init(params.get("config") or {})
                _reply(rid, {})
            elif method == "connect":
                if connect:
                    connect()
                _reply(rid, {})
            elif method == "read_batch":
                out = read_batch() if read_batch else None
                if out is None:
                    _reply(rid, None, _err("end of input",
                                           "end_of_input"))
                else:
                    msgs, batch_id = out
                    _reply(rid, {"batch": {"messages": msgs},
                                 "batch_id": batch_id})
            elif method == "ack":
                if ack:
                    ack(params.get("batch_id"), params.get("error"))
                _reply(rid, {})
            elif method == "process_batch":
                msgs = (params.get("batch") or {}).get(
                    "messages") or []
                out = []
                for m in msgs:
                    r = process(m) if process else m
                    out.extend(r if isinstance(r, list) else [r])
                _reply(rid, {"batches": [{"messages": out}]})
            elif method == "write_batch":
                for m in (params.get("batch") or {}).get(
                        "messages") or []:
                    if write:
                        write(m)
                _reply(rid, {})
            elif method == "close":
                if close:
                    close()
                _reply(rid, {})
                break
            else:
                _reply(rid, None, _err("unknown method: %s" % method))
        except Exception as exc:  # surface, don't crash the host
            _reply(rid, None, _err(str(exc)))
# --- end plugin runtime ---
'''

_PROCESSOR_MAIN = '''\
"""A connect_spark processor plugin: transform each message."""

CONFIG = {}


def init(config):
    CONFIG.update(config)


def process(msg):
    """msg = {"structured": <any> | "bytes_b64": str,
    "metadata": {...}}.  Return one message or a list (empty list
    drops the message)."""
    doc = msg.get("structured")
    # TODO: your transformation here
    return {"structured": doc, "metadata": msg.get("metadata") or {}}


''' + _SDK + '''

if __name__ == "__main__":
    serve(init=init, process=process)
'''

_INPUT_MAIN = '''\
"""A connect_spark input plugin: emit message batches until done."""

CONFIG = {}
_STATE = {"sent": 0}


def init(config):
    CONFIG.update(config)


def read_batch():
    """Return (messages, batch_id) or None when the input is
    exhausted (the host sees end_of_input and stops)."""
    if _STATE["sent"] >= int(CONFIG.get("count", 3)):
        return None
    i = _STATE["sent"]
    _STATE["sent"] = i + 1
    # TODO: read your real source here
    return ([{"structured": {"n": i}, "metadata": {}}], i)


''' + _SDK + '''

if __name__ == "__main__":
    serve(init=init, read_batch=read_batch)
'''

_OUTPUT_MAIN = '''\
"""A connect_spark output plugin: receive messages to deliver."""

CONFIG = {}


def init(config):
    CONFIG.update(config)


def write(msg):
    # TODO: deliver the message to your real sink here
    import sys
    print("delivered:", msg.get("structured"), file=sys.stderr)


''' + _SDK + '''

if __name__ == "__main__":
    serve(init=init, write=write)
'''

_MANIFEST = '''\
name: {name}
summary: Add your summary here
command: ["python3", "main.py"]
type: {comp}
fields: []
# Example of how to add configuration fields:
# fields:
#   - name: foo
#     description: "The foo field"
#     type: string # options: string, int, float, bool, unknown
#     kind: scalar # or list or map
#     default: "fizzbuzz"
#   - name: bar
#     description: "The bar field"
#     type: int
#     kind: list
#     # omitting default means that it's a required field
#
# Optional typed output (a Spark DDL string); without it the
# plugin's output lands as (content STRING, metadata MAP):
# output_schema: "n BIGINT, label STRING"
'''

_README = '''\
# {name}

A connect_spark {comp} plugin.  Run a pipeline that uses it with:

    python -m connect_spark run --rpcplugin ./plugin.yaml config.yaml

The plugin speaks newline-delimited JSON-RPC on stdin/stdout; edit
main.py's `{hook}` function.
'''

_MAINS = {"input": (_INPUT_MAIN, "read_batch"),
          "processor": (_PROCESSOR_MAIN, "process"),
          "output": (_OUTPUT_MAIN, "write")}


# --------------------------------------------------------------------
# golang templates (reference golangtemplate/; Go stdlib only)
# --------------------------------------------------------------------

_GO_RUNTIME = '''\
// --- plugin runtime (NDJSON-RPC over stdio; Go stdlib only; ---
// --- protocol: connect_spark rpcplugin)                      ---

type rpcRequest struct {
	ID     any            `json:"id"`
	Method string         `json:"method"`
	Params map[string]any `json:"params"`
}

// Message is one pipeline message: "structured" (any JSON value) or
// "bytes_b64" (base64-encoded raw bytes), plus "metadata".
type Message = map[string]any

func reply(out *bufio.Writer, id any, result any, rpcErr any) {
	b, _ := json.Marshal(map[string]any{
		"id": id, "result": result, "error": rpcErr})
	out.Write(b)
	out.WriteByte('\\n')
	out.Flush()
}

func rpcError(message string, detail any) map[string]any {
	return map[string]any{"message": message, "detail": detail}
}

func batchMessages(params map[string]any) []Message {
	batch, _ := params["batch"].(map[string]any)
	raw, _ := batch["messages"].([]any)
	msgs := make([]Message, 0, len(raw))
	for _, m := range raw {
		if mm, ok := m.(map[string]any); ok {
			msgs = append(msgs, mm)
		}
	}
	return msgs
}

func scanner() *bufio.Scanner {
	in := bufio.NewScanner(os.Stdin)
	in.Buffer(make([]byte, 0, 64*1024), 64*1024*1024)
	return in
}

// --- end plugin runtime ---
'''

_GO_PROCESSOR_MAIN = '''\
// A connect_spark processor plugin: transform each message.
package main

import (
	"bufio"
	"bytes"
	"encoding/json"
	"os"
)

var config map[string]any

func initPlugin(cfg map[string]any) { config = cfg }

// process transforms one message.  Return zero or more messages;
// returning none drops the input.
func process(msg Message) []Message {
	// TODO: your transformation here
	return []Message{msg}
}

func main() {
	in := scanner()
	out := bufio.NewWriter(os.Stdout)
	for in.Scan() {
		line := in.Bytes()
		if len(bytes.TrimSpace(line)) == 0 {
			continue
		}
		var req rpcRequest
		if err := json.Unmarshal(line, &req); err != nil {
			continue
		}
		switch req.Method {
		case "init":
			cfg, _ := req.Params["config"].(map[string]any)
			initPlugin(cfg)
			reply(out, req.ID, map[string]any{}, nil)
		case "process_batch":
			outMsgs := []Message{}
			for _, m := range batchMessages(req.Params) {
				outMsgs = append(outMsgs, process(m)...)
			}
			reply(out, req.ID, map[string]any{
				"batches": []any{
					map[string]any{"messages": outMsgs}},
			}, nil)
		case "close":
			reply(out, req.ID, map[string]any{}, nil)
			return
		default:
			reply(out, req.ID, map[string]any{}, nil)
		}
	}
}

''' + _GO_RUNTIME

_GO_INPUT_MAIN = '''\
// A connect_spark input plugin: emit message batches until done.
package main

import (
	"bufio"
	"bytes"
	"encoding/json"
	"os"
)

var (
	config map[string]any
	sent   int
)

func initPlugin(cfg map[string]any) { config = cfg }

// readBatch returns (messages, batchID, ok); ok=false signals end
// of input (the host sees end_of_input and stops).
func readBatch() ([]Message, int, bool) {
	count := 3
	if v, ok := config["count"].(float64); ok {
		count = int(v)
	}
	if sent >= count {
		return nil, 0, false
	}
	i := sent
	sent++
	// TODO: read your real source here
	return []Message{{
		"structured": map[string]any{"n": i},
		"metadata":   map[string]any{},
	}}, i, true
}

func main() {
	in := scanner()
	out := bufio.NewWriter(os.Stdout)
	for in.Scan() {
		line := in.Bytes()
		if len(bytes.TrimSpace(line)) == 0 {
			continue
		}
		var req rpcRequest
		if err := json.Unmarshal(line, &req); err != nil {
			continue
		}
		switch req.Method {
		case "init":
			cfg, _ := req.Params["config"].(map[string]any)
			initPlugin(cfg)
			reply(out, req.ID, map[string]any{}, nil)
		case "read_batch":
			msgs, id, ok := readBatch()
			if !ok {
				reply(out, req.ID, nil,
					rpcError("end of input", "end_of_input"))
			} else {
				reply(out, req.ID, map[string]any{
					"batch": map[string]any{
						"messages": msgs},
					"batch_id": id,
				}, nil)
			}
		case "close":
			reply(out, req.ID, map[string]any{}, nil)
			return
		default: // connect, ack, ...
			reply(out, req.ID, map[string]any{}, nil)
		}
	}
}

''' + _GO_RUNTIME

_GO_OUTPUT_MAIN = '''\
// A connect_spark output plugin: receive messages to deliver.
package main

import (
	"bufio"
	"bytes"
	"encoding/json"
	"fmt"
	"os"
)

var config map[string]any

func initPlugin(cfg map[string]any) { config = cfg }

func write(msg Message) {
	// TODO: deliver the message to your real sink here
	fmt.Fprintln(os.Stderr, "delivered:", msg["structured"])
}

func main() {
	in := scanner()
	out := bufio.NewWriter(os.Stdout)
	for in.Scan() {
		line := in.Bytes()
		if len(bytes.TrimSpace(line)) == 0 {
			continue
		}
		var req rpcRequest
		if err := json.Unmarshal(line, &req); err != nil {
			continue
		}
		switch req.Method {
		case "init":
			cfg, _ := req.Params["config"].(map[string]any)
			initPlugin(cfg)
			reply(out, req.ID, map[string]any{}, nil)
		case "write_batch":
			for _, m := range batchMessages(req.Params) {
				write(m)
			}
			reply(out, req.ID, map[string]any{}, nil)
		case "close":
			reply(out, req.ID, map[string]any{}, nil)
			return
		default: // connect, ...
			reply(out, req.ID, map[string]any{}, nil)
		}
	}
}

''' + _GO_RUNTIME

_GO_MOD = """\
module {name}

go 1.22
"""

_GO_MANIFEST = '''\
name: {name}
summary: Add your summary here
command: ["./main"]
type: {comp}
fields: []
# Example of how to add configuration fields:
# fields:
#   - name: foo
#     description: "The foo field"
#     type: string # options: string, int, float, bool, unknown
#     kind: scalar # or list or map
#     default: "fizzbuzz"
#   - name: bar
#     description: "The bar field"
#     type: int
#     kind: list
#     # omitting default means that it's a required field
#
# Optional typed output (a Spark DDL string); without it the
# plugin's output lands as (content STRING, metadata MAP):
# output_schema: "n BIGINT, label STRING"
'''

_GO_README = '''\
# {name}

A connect_spark {comp} plugin in Go.  Build it first (any Go ≥ 1.18
toolchain; `go mod tidy` will align the go directive):

    go build -o main .

Then run a pipeline that uses it with:

    python -m connect_spark run --rpcplugin ./plugin.yaml config.yaml

The plugin speaks newline-delimited JSON-RPC on stdin/stdout with
zero dependencies (Go stdlib only); edit main.go's `{hook}`
function.
'''

_GO_MAINS = {"input": (_GO_INPUT_MAIN, "readBatch"),
             "processor": (_GO_PROCESSOR_MAIN, "process"),
             "output": (_GO_OUTPUT_MAIN, "write")}


# --------------------------------------------------------------------
# python templates for `protocol: arrow` (repo extension: binary
# Arrow-IPC framing — the volume path measured in SCALE.md r13)
# --------------------------------------------------------------------

_ARROW_SDK = '''\
# --- plugin runtime (protocol: arrow — one JSON header line + ---
# --- body_len bytes of raw Arrow-IPC stream per message)      ---
import json
import sys

import pyarrow as pa

_IN = sys.stdin.buffer
_OUT = sys.stdout.buffer


def _reply(rid, result=None, error=None, body=None):
    hdr = {"id": rid, "result": result, "error": error}
    payload = b""
    if body is not None:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, body.schema) as w:
            w.write_table(body)
        payload = sink.getvalue().to_pybytes()
        hdr["body_len"] = len(payload)
    _OUT.write(json.dumps(hdr).encode() + b"\\n")
    if payload:
        _OUT.write(payload)
    _OUT.flush()


def _err(message, detail=None):
    return {"message": message, "detail": detail}


def serve(init=None, connect=None, read_batch=None, ack=None,
          process=None, write=None, close=None):
    """Dispatch requests until stdin closes.  Handlers:
    init(config), connect(), read_batch() -> (table, batch_id) or
    None at end of input, ack(batch_id, error),
    process(table) -> table, write(table), close()."""
    while True:
        line = _IN.readline()
        if not line:
            break
        if not line.strip():
            continue
        req = json.loads(line)
        rid, method = req.get("id"), req.get("method")
        params = req.get("params") or {}
        n = int(req.get("body_len") or 0)
        tbl = pa.ipc.open_stream(_IN.read(n)).read_all() if n \
            else None
        try:
            if method == "init":
                if init:
                    init(params.get("config") or {})
                _reply(rid, {})
            elif method == "connect":
                if connect:
                    connect()
                _reply(rid, {})
            elif method == "read_batch":
                out = read_batch() if read_batch else None
                if out is None:
                    _reply(rid, None, _err("end of input",
                                           "end_of_input"))
                else:
                    table, batch_id = out
                    _reply(rid, {"batch_id": batch_id}, None, table)
            elif method == "ack":
                if ack:
                    ack(params.get("batch_id"), params.get("error"))
                _reply(rid, {})
            elif method == "process_batch":
                _reply(rid, {}, None,
                       process(tbl) if process else tbl)
            elif method == "write_batch":
                if write and tbl is not None:
                    write(tbl)
                _reply(rid, {})
            elif method == "close":
                if close:
                    close()
                _reply(rid, {})
                break
            else:
                _reply(rid, None,
                       _err("unknown method: %s" % method))
        except Exception as exc:  # surface, don't crash the host
            _reply(rid, None, _err(str(exc)))
# --- end plugin runtime ---
'''

_ARROW_PROCESSOR_MAIN = '''\
"""A connect_spark `protocol: arrow` processor plugin: transform
each COLUMNAR batch (a pyarrow.Table) — the returned table must
match the manifest's output_schema."""

CONFIG = {}


def init(config):
    CONFIG.update(config)


def process(table):
    # TODO: your vectorized transformation here (pyarrow.compute)
    return table


''' + _ARROW_SDK + '''

if __name__ == "__main__":
    serve(init=init, process=process)
'''

_ARROW_INPUT_MAIN = '''\
"""A connect_spark `protocol: arrow` input plugin: emit typed
columnar batches (pyarrow.Table matching output_schema)."""

import pyarrow as _pa

CONFIG = {}
_STATE = {"sent": 0}


def init(config):
    CONFIG.update(config)


def read_batch():
    """Return (table, batch_id) or None when exhausted."""
    if _STATE["sent"] >= int(CONFIG.get("count", 3)):
        return None
    i = _STATE["sent"]
    _STATE["sent"] = i + 1
    # TODO: read your real source here
    return _pa.table({"n": _pa.array([i], _pa.int64())}), i


''' + _ARROW_SDK + '''

if __name__ == "__main__":
    serve(init=init, read_batch=read_batch)
'''

_ARROW_OUTPUT_MAIN = '''\
"""A connect_spark `protocol: arrow` output plugin: receive
columnar batches to deliver."""

import sys as _sys

CONFIG = {}


def init(config):
    CONFIG.update(config)


def write(table):
    # TODO: deliver the batch to your real sink here
    print("delivered:", table.num_rows, "rows", file=_sys.stderr)


''' + _ARROW_SDK + '''

if __name__ == "__main__":
    serve(init=init, write=write)
'''

_ARROW_MANIFEST = '''\
name: {name}
summary: Add your summary here
command: ["python3", "main.py"]
type: {comp}
protocol: arrow
fields: []
# protocol: arrow — batches cross as binary Arrow-IPC streams (no
# per-row JSON, no base64); input/processor plugins MUST declare
# output_schema (the child returns typed columnar batches).
{schema_line}
# Example of how to add configuration fields:
# fields:
#   - name: foo
#     description: "The foo field"
#     type: string # options: string, int, float, bool, unknown
#     kind: scalar # or list or map
#     default: "fizzbuzz"
'''

_ARROW_README = '''\
# {name}

A connect_spark {comp} plugin speaking `protocol: arrow` (binary
Arrow-IPC framing — the volume path; requires pyarrow in the
plugin's python).  Run a pipeline that uses it with:

    python -m connect_spark run --rpcplugin ./plugin.yaml config.yaml

Each message is one JSON header line plus an optional raw Arrow-IPC
stream of `body_len` bytes; edit main.py's `{hook}` function.
'''

_ARROW_MAINS = {"input": (_ARROW_INPUT_MAIN, "read_batch"),
                "processor": (_ARROW_PROCESSOR_MAIN, "process"),
                "output": (_ARROW_OUTPUT_MAIN, "write")}


def initialize_project(lang: str, comp: str, directory: str,
                       protocol: str = "ndjson") -> str:
    """init.go InitializeProject: lay down the project files; the
    project name is the directory's basename.  Languages: python
    (runnable as-is) and golang (generate_plugin.go's other arm —
    emitted untested here, no Go toolchain in this environment; the
    README carries the build step).  `protocol` is the repo
    extension: 'arrow' emits the binary Arrow-IPC python template
    (pyarrow child; the volume path)."""
    if lang not in ("python", "golang"):
        raise PipelineConfigError(
            f"unsupported plugin language {lang!r} "
            "(valid: ['golang', 'python'])")
    if protocol not in ("ndjson", "arrow"):
        raise PipelineConfigError(
            f"unsupported plugin protocol {protocol!r} "
            "(valid: ['arrow', 'ndjson'])")
    if protocol == "arrow" and lang == "golang":
        raise PipelineConfigError(
            "protocol: arrow templates are python-only (the golang "
            "template is Go-stdlib-only and Arrow IPC needs the "
            "arrow module)")
    if comp not in _MAINS:
        raise PipelineConfigError(
            f"unexpected plugin component, valid options "
            f"['input', 'processor', 'output'], got: {comp!r}")
    abs_dir = os.path.abspath(directory)
    name = os.path.basename(abs_dir)
    os.makedirs(abs_dir, exist_ok=True)

    def emit(fname: str, content: str) -> None:
        with open(os.path.join(abs_dir, fname), "w",
                  encoding="utf-8") as fh:
            fh.write(content)

    if lang == "golang":
        main_src, hook = _GO_MAINS[comp]
        emit("main.go", main_src)
        emit("go.mod", _GO_MOD.format(name=name))
        emit("plugin.yaml", _GO_MANIFEST.format(name=name, comp=comp))
        emit("README.md", _GO_README.format(name=name, comp=comp,
                                            hook=hook))
        return abs_dir
    if protocol == "arrow":
        main_src, hook = _ARROW_MAINS[comp]
        # arrow inputs/processors must declare output_schema; both
        # templates default to the (n BIGINT) shape the input
        # template emits, so a generated input → processor chain
        # runs as-is (outputs consume, no schema needed)
        schema_line = ("# (outputs consume batches — no "
                       "output_schema needed)"
                       if comp == "output"
                       else 'output_schema: "n BIGINT"')
        emit("main.py", main_src)
        emit("plugin.yaml", _ARROW_MANIFEST.format(
            name=name, comp=comp, schema_line=schema_line))
        emit("README.md", _ARROW_README.format(name=name, comp=comp,
                                               hook=hook))
        return abs_dir
    main_src, hook = _MAINS[comp]
    emit("main.py", main_src)
    emit("plugin.yaml", _MANIFEST.format(name=name, comp=comp))
    emit("README.md", _README.format(name=name, comp=comp, hook=hook))
    return abs_dir
