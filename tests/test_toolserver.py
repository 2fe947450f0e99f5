"""Pipelines-as-tools service layer (connect_spark/toolserver.py)."""

from __future__ import annotations

import json

from connect_spark.toolserver import ToolServer


def test_tool_list_and_invoke(spark):
    ts = ToolServer(spark)
    ts.register(
        "numbers",
        {
            "input": {"generate": {
                "count": 3, "mapping": "root.n = counter()"}},
            "pipeline": {"processors": [
                {"mapping": "root.n = this.n\nroot.sq = this.n * this.n"},
            ]},
        },
        description="squares",
    )
    status, doc = ts.handle("GET", "/tools")
    assert status == 200
    assert doc["tools"] == [{"name": "numbers", "description": "squares"}]
    status, doc = ts.handle("POST", "/tools/numbers")
    assert status == 200 and doc["count"] == 3
    assert sorted(r["sq"] for r in doc["rows"]) == [0, 1, 4]


def test_tool_env_parameterization(spark):
    ts = ToolServer(spark)
    ts.register(
        "param",
        "input:\n  generate:\n    count: ${N:1}\n"
        "    mapping: 'root.n = counter()'\n",
    )
    status, doc = ts.handle(
        "POST", "/tools/param", json.dumps({"env": {"N": "4"}}))
    assert status == 200 and doc["count"] == 4
    status, doc = ts.handle("POST", "/tools/param")
    assert doc["count"] == 1  # default


def test_tool_errors(spark):
    ts = ToolServer(spark)
    status, doc = ts.handle("POST", "/tools/missing")
    assert status == 404
    ts.register("bad", {"input": {"bogus_kind": {}}})
    status, doc = ts.handle("POST", "/tools/bad")
    assert status == 400 and "bogus_kind" in doc["error"]


def test_register_dir_and_http(spark, tmp_path):
    import urllib.request

    (tmp_path / "hello.yaml").write_text(
        "# says hello\n"
        "input:\n  generate:\n    count: 1\n"
        "    mapping: 'root.msg = \"hello\"'\n"
    )
    ts = ToolServer(spark)
    assert ts.register_dir(str(tmp_path)) == 1
    srv, port = ts.serve()
    try:
        listing = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/tools").read())
        assert listing["tools"][0] == {
            "name": "hello", "description": "says hello"}
        res = json.loads(urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/tools/hello", data=b"{}",
            method="POST")).read())
        assert res["rows"] == [{"msg": "hello"}]
    finally:
        srv.shutdown()


def test_tool_bad_json_and_runtime_errors(spark):
    ts = ToolServer(spark)
    ts.register("ok", {"input": {"generate": {
        "count": 1, "mapping": "root.n = 1"}}})
    status, doc = ts.handle("POST", "/tools/ok", "not json {")
    assert status == 400 and "invalid JSON" in doc["error"]
    ts.register("boom", {"input": {"generate": {
        "count": 1, "mapping": "root.n = 1"}},
        "pipeline": {"processors": [
            {"crash": {"message": "kaboom"}}]}})
    status, doc = ts.handle("POST", "/tools/boom")
    assert status == 500 and "kaboom" in doc["error"]
