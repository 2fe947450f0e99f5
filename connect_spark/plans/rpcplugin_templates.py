"""`plugin init` project templates (reference
`internal/rpcplugin/init.go` + `pythontemplate/{input,processor,
output}/`): emit a runnable plugin project — main.py + plugin.yaml +
README — into a directory, named after it.

The reference's python template depends on an external
`redpanda_connect` package providing `processor_main` etc.; the
emitted main.py here inlines the ~50-line NDJSON-stdio loop instead,
so a generated plugin runs with a bare `python3` and no installs
(the sandbox has no uv/pip).  Only the python language is supported:
there is no Go toolchain in this environment, and `init.go`'s Go arm
is a compile-time template for one."""

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


def initialize_project(lang: str, comp: str, directory: str) -> str:
    """init.go InitializeProject: lay down the project files; the
    project name is the directory's basename."""
    if lang != "python":
        raise PipelineConfigError(
            f"unsupported plugin language {lang!r} (this environment "
            "has no Go toolchain; valid: ['python'])")
    if comp not in _MAINS:
        raise PipelineConfigError(
            f"unexpected plugin component, valid options "
            f"['input', 'processor', 'output'], got: {comp!r}")
    abs_dir = os.path.abspath(directory)
    name = os.path.basename(abs_dir)
    os.makedirs(abs_dir, exist_ok=True)
    main_src, hook = _MAINS[comp]
    with open(os.path.join(abs_dir, "main.py"), "w",
              encoding="utf-8") as fh:
        fh.write(main_src)
    with open(os.path.join(abs_dir, "plugin.yaml"), "w",
              encoding="utf-8") as fh:
        fh.write(_MANIFEST.format(name=name, comp=comp))
    with open(os.path.join(abs_dir, "README.md"), "w",
              encoding="utf-8") as fh:
        fh.write(_README.format(name=name, comp=comp, hook=hook))
    return abs_dir
