"""`a2a_message` processor (SURVEY.md §2.H AI family).

Reference surface: `internal/impl/a2a/processor_message.go:35-60`
(fields `agent_card_url`, `prompt`, `final_message_only`) with the
JSON-RPC 2.0 HTTP transport of `internal/impl/a2a/transport_http.go`
— agent-card resolution (default path `/.well-known/agent.json`),
`message/send`, task polling via `tasks/get` until a terminal state,
and either final-agent-message text extraction (all text parts
joined) or the full structured Task object.

No live A2A agent is reachable from this sandbox, so — exactly like
the http processor (plans/processors_ext.py) — the transport is
INJECTABLE with the same `(url, verb, headers, body) -> str`
signature; production registers an HTTP-backed callable, tests and
the correctness gate use the deterministic fake agent below whose
replies are pure functions of the prompt (md5-derived, so a DuckDB
oracle recomputes them), which exercises the real card-resolution →
JSON-RPC → polling → extraction pipeline.

Scale shape: like the chat processors the call is a NARROW op
(mapInPandas, zero shuffle); the agent card resolves ONCE on the
driver at build time (the reference resolves it at processor
construction, processor_message.go:137-152), never per row.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TransportFn = Callable[[str, str, dict, str | None], str]

_TERMINAL_STATES = {"completed", "failed", "canceled", "rejected"}


def parse_agent_card_url(url: str) -> tuple[str, str]:
    """Split an agent-card URL into (base_url, card_path): a bare
    base URL defaults to the A2A well-known path, a URL with a path
    component uses that path (processor_message.go:144 semantics)."""
    from urllib.parse import urlsplit

    s = urlsplit(url)
    if not s.scheme or not s.netloc:
        raise ValueError(f"a2a_message: invalid agent_card_url {url!r}")
    base = f"{s.scheme}://{s.netloc}"
    path = s.path if s.path and s.path != "/" else "/.well-known/agent.json"
    return base, path


def fake_a2a_transport(url: str, verb: str, headers: dict,
                       body: str | None) -> str:
    """Deterministic stand-in for an A2A agent endpoint.

    - GET <card path> → an agent card whose `url` points at the
      JSON-RPC endpoint `<base>/a2a`.
    - POST message/send → a Task in state `working` (id/contextId are
      md5-derived from the prompt) — forcing the client down the real
      polling path.
    - POST tasks/get → the same Task `completed`, history carrying
      the user message and an agent reply whose text is
      ``A2A(<n_chars>):<md5(prompt)[:12]>`` — a pure function of the
      prompt a SQL oracle can recompute (md5 on both engines hashes
      the UTF-8 bytes, so the gate is unicode-safe).
    """
    if verb == "GET":
        from urllib.parse import urlsplit

        s = urlsplit(url)
        return json.dumps({
            "name": "fake-agent",
            "version": "1.0.0",
            "protocolVersion": "0.3.0",
            "url": f"{s.scheme}://{s.netloc}/a2a",
        })
    req = json.loads(body or "{}")
    method = req.get("method")
    if method == "message/send":
        prompt = ""
        for part in (req.get("params", {}).get("message", {})
                     .get("parts", [])):
            if "text" in part:
                prompt += part["text"]
        h = hashlib.md5(prompt.encode("utf-8")).hexdigest()
        task = {
            "id": f"task-{h}",
            "contextId": f"ctx-{h[:8]}",
            "status": {"state": "working"},
            "history": [
                {"role": "user", "parts": [{"text": prompt}]},
            ],
            # the fake carries the prompt forward so tasks/get can
            # stay a pure function of its request
            "metadata": {"prompt": prompt},
        }
        return json.dumps({"jsonrpc": "2.0", "id": req.get("id"),
                           "result": task})
    if method == "tasks/get":
        # deterministic completion: the task id IS md5(prompt), and
        # the prompt rides in metadata from the message/send response
        # the client echoes back (reference clients poll by id only —
        # the fake reconstructs from the id's metadata echo when
        # present, else replies from the id alone)
        params = req.get("params", {})
        task_id = params.get("id", "")
        prompt = params.get("metadata", {}).get("prompt", "")
        h = task_id[len("task-"):]
        reply = f"A2A({len(prompt)}):{h[:12]}"
        task = {
            "id": task_id,
            "contextId": f"ctx-{h[:8]}",
            "status": {"state": "completed"},
            "history": [
                {"role": "user", "parts": [{"text": prompt}]},
                {"role": "agent", "parts": [{"text": reply}]},
            ],
            "artifacts": [],
        }
        return json.dumps({"jsonrpc": "2.0", "id": req.get("id"),
                           "result": task})
    return json.dumps({
        "jsonrpc": "2.0", "id": req.get("id"),
        "error": {"code": -32601, "message": f"unknown method {method}"},
    })


def _rpc(transport: TransportFn, url: str, method: str,
         params: dict) -> dict:
    """One JSON-RPC 2.0 round trip (transport_http.go:73-110)."""
    body = json.dumps({"jsonrpc": "2.0", "method": method,
                       "params": params, "id": "1"})
    raw = transport(url, "POST", {"Content-Type": "application/json"},
                    body)
    resp = json.loads(raw)
    if resp.get("error"):
        e = resp["error"]
        raise ValueError(
            f"a2a_message: JSON-RPC error {e.get('code')}: "
            f"{e.get('message')}")
    return resp.get("result") or {}


def resolve_agent_card(agent_card_url: str,
                       transport: TransportFn) -> dict:
    """Fetch and validate the agent card (driver-side, once)."""
    base, path = parse_agent_card_url(agent_card_url)
    card = json.loads(transport(base + path, "GET", {}, None))
    if not card.get("url"):
        raise ValueError("a2a_message: agent card does not contain a URL")
    return card


def _final_text(task: dict) -> str:
    """Concatenated text parts of the LAST agent message
    (processor_message.go:284-316); error when none exist."""
    last_agent = None
    for msg in reversed(task.get("history", [])):
        if msg.get("role") == "agent":
            last_agent = msg
            break
    parts = [p["text"] for p in (last_agent or {}).get("parts", [])
             if "text" in p]
    if not parts:
        raise ValueError("a2a_message: agent response contained no text")
    return "\n".join(parts)


def a2a_message(
    df: DataFrame,
    agent_card_url: str,
    prompt: str | Column,
    *,
    final_message_only: bool = True,
    transport: TransportFn | None = None,
    poll_limit: int = 16,
    out: str = "reply",
) -> DataFrame:
    """Send each row's prompt to an A2A agent and append the response
    plus the reference's task metadata (`a2a_task_id`, `a2a_state`)
    as columns (the reference sets them as message metadata,
    processor_message.go:269-272)."""
    tp = transport or fake_a2a_transport
    card = resolve_agent_card(agent_card_url, tp)
    agent_url = card["url"]

    pcol = F.col(prompt) if isinstance(prompt, str) else prompt
    work = df.withColumn("_a2a_prompt", pcol.cast("string"))
    fields = work.schema.fields + [
        T.StructField(out, T.StringType()),
        T.StructField("a2a_task_id", T.StringType()),
        T.StructField("a2a_state", T.StringType()),
    ]
    schema = T.StructType(fields)

    def one(prompt_text: str) -> tuple[str, str, str]:
        message = {"role": "user",
                   "parts": [{"text": prompt_text or ""}]}
        result = _rpc(tp, agent_url, "message/send",
                      {"message": message})
        # message/send may answer with a bare Message (no status) or
        # a Task needing polling (processor_message.go:231-243)
        if "status" not in result:
            msg_like = {"history": [dict(result, role="agent")
                                    if "role" not in result
                                    else result]}
            text = (_final_text(msg_like) if final_message_only
                    else json.dumps(result, sort_keys=True,
                                    separators=(",", ":")))
            return text, result.get("taskId", ""), "message"
        task = result
        polls = 0
        while task["status"]["state"] not in _TERMINAL_STATES:
            if polls >= poll_limit:
                raise ValueError(
                    f"a2a_message: task {task.get('id')} did not "
                    f"reach a terminal state in {poll_limit} polls")
            polls += 1
            task = _rpc(tp, agent_url, "tasks/get", {
                "id": task["id"],
                "metadata": task.get("metadata", {}),
            })
        if task["status"]["state"] != "completed":
            raise ValueError(
                f"a2a_message: task {task.get('id')} ended in state "
                f"{task['status']['state']} (expected completed)")
        text = (_final_text(task) if final_message_only
                else json.dumps(task, sort_keys=True,
                                separators=(",", ":")))
        return text, task.get("id", ""), task["status"]["state"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            cols = [one(p) for p in pdf["_a2a_prompt"].tolist()]
            pdf[out] = [c[0] for c in cols]
            pdf["a2a_task_id"] = [c[1] for c in cols]
            pdf["a2a_state"] = [c[2] for c in cols]
            yield pdf

    return work.mapInPandas(run, schema).drop("_a2a_prompt")
