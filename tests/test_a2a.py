"""a2a_message processor (reference `internal/impl/a2a/
processor_message.go`, transport_http.go)."""

from __future__ import annotations

import hashlib
import json

import pytest

from connect_spark.text.a2a import (
    a2a_message,
    fake_a2a_transport,
    parse_agent_card_url,
    resolve_agent_card,
)


def test_parse_agent_card_url_default_and_explicit():
    # bare base URL → the A2A well-known default
    assert parse_agent_card_url("https://example.com") == (
        "https://example.com", "/.well-known/agent.json")
    assert parse_agent_card_url("https://example.com/") == (
        "https://example.com", "/.well-known/agent.json")
    # full path wins
    assert parse_agent_card_url(
        "https://example.com/custom/agent.json") == (
        "https://example.com", "/custom/agent.json")
    with pytest.raises(ValueError, match="invalid"):
        parse_agent_card_url("not-a-url")


def test_fake_agent_card_and_task_lifecycle():
    card = resolve_agent_card("https://agent.example",
                              fake_a2a_transport)
    assert card["url"] == "https://agent.example/a2a"
    assert card["protocolVersion"] == "0.3.0"
    # message/send answers a NON-terminal task (forces polling)
    resp = json.loads(fake_a2a_transport(
        card["url"], "POST", {},
        json.dumps({"jsonrpc": "2.0", "method": "message/send",
                    "params": {"message": {
                        "role": "user",
                        "parts": [{"text": "hello world"}]}},
                    "id": "1"})))
    task = resp["result"]
    h = hashlib.md5(b"hello world").hexdigest()
    assert task["id"] == f"task-{h}"
    assert task["status"]["state"] == "working"


def test_card_without_url_is_an_error():
    def cardless(url, verb, headers, body):
        return json.dumps({"name": "broken-agent"})

    with pytest.raises(ValueError, match="does not contain a URL"):
        resolve_agent_card("https://x.example", cardless)


def test_a2a_message_final_text(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "γάμμα")], "id long, text string")
    out = {r.id: r for r in a2a_message(
        df, "https://agent.example", "text").collect()}
    for rid, text in ((1, "alpha beta"), (2, "γάμμα")):
        h = hashlib.md5(text.encode("utf-8")).hexdigest()
        assert out[rid].reply == f"A2A({len(text)}):{h[:12]}"
        assert out[rid].a2a_task_id == f"task-{h}"
        assert out[rid].a2a_state == "completed"
    # original columns ride along; helper column dropped
    assert set(out[1].asDict()) == {
        "id", "text", "reply", "a2a_task_id", "a2a_state"}


def test_a2a_message_full_task_object(spark):
    df = spark.createDataFrame([(1, "hi")], "id long, text string")
    row = a2a_message(
        df, "https://agent.example", "text",
        final_message_only=False).collect()[0]
    task = json.loads(row.reply)
    assert task["status"]["state"] == "completed"
    roles = [m["role"] for m in task["history"]]
    assert roles == ["user", "agent"]
    assert task["history"][0]["parts"][0]["text"] == "hi"


def test_a2a_message_non_completed_terminal_raises(spark):
    """A task ending failed/canceled is a hard error, not silent
    output (processor_message.go:260-264)."""
    def failing(url, verb, headers, body):
        if verb == "GET":
            return fake_a2a_transport(url, verb, headers, body)
        req = json.loads(body)
        if req["method"] == "message/send":
            return json.dumps({"jsonrpc": "2.0", "id": "1", "result": {
                "id": "task-x", "status": {"state": "failed"},
                "history": []}})
        raise AssertionError("terminal task must not be polled")

    df = spark.createDataFrame([(1, "hi")], "id long, text string")
    with pytest.raises(Exception, match="failed"):
        a2a_message(df, "https://agent.example", "text",
                    transport=failing).collect()


def test_a2a_message_poll_limit(spark):
    """An agent stuck in `working` exhausts poll_limit loudly."""
    def stuck(url, verb, headers, body):
        if verb == "GET":
            return fake_a2a_transport(url, verb, headers, body)
        req = json.loads(body)
        return json.dumps({"jsonrpc": "2.0", "id": "1", "result": {
            "id": "task-x", "status": {"state": "working"},
            "history": []}})

    df = spark.createDataFrame([(1, "hi")], "id long, text string")
    with pytest.raises(Exception, match="terminal state"):
        a2a_message(df, "https://agent.example", "text",
                    transport=stuck, poll_limit=3).collect()


def test_a2a_message_bare_message_result(spark):
    """message/send may answer a bare Message (no Task status) —
    text extracts directly, no polling (processor_message.go:240)."""
    def instant(url, verb, headers, body):
        if verb == "GET":
            return fake_a2a_transport(url, verb, headers, body)
        return json.dumps({"jsonrpc": "2.0", "id": "1", "result": {
            "role": "agent", "messageId": "m1",
            "parts": [{"text": "direct"}, {"text": "answer"}]}})

    df = spark.createDataFrame([(1, "hi")], "id long, text string")
    row = a2a_message(df, "https://agent.example", "text",
                      transport=instant).collect()[0]
    assert row.reply == "direct\nanswer"
    assert row.a2a_state == "message"


def test_a2a_yaml_processor_kind(spark):
    from connect_spark.plans.pipeline import PROCESSORS

    df = spark.createDataFrame(
        [("ping",)], "content string")
    out = PROCESSORS["a2a_message"](df, {
        "agent_card_url": "https://agent.example",
        "prompt": "content",
        "result_field": "agent_reply",
    }).collect()[0]
    h = hashlib.md5(b"ping").hexdigest()
    assert out.agent_reply == f"A2A(4):{h[:12]}"
    # unknown transport fails fast, never a silent network fallback
    from connect_spark.plans.pipeline import PipelineConfigError

    with pytest.raises(PipelineConfigError, match="unknown transport"):
        PROCESSORS["a2a_message"](df, {
            "agent_card_url": "https://agent.example",
            "prompt": "content",
            "transport": "nope",
        })
