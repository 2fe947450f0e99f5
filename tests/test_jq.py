"""jq filter interpreter vs jq's documented behaviors
(processors/jq.adoc)."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_spark.functions.jq import JqFilter


def jq(src, value):
    return JqFilter(src).run(value)


def test_paths_and_identity():
    doc = {"a": {"b": 2}, "c": [10, 20, 30]}
    assert jq(".", doc) == [doc]
    assert jq(".a.b", doc) == [2]
    assert jq(".missing", doc) == [None]
    assert jq(".c[1]", doc) == [20]
    assert jq(".c[-1]", doc) == [30]
    assert jq(".c[0:2]", doc) == [[10, 20]]


def test_iteration_pipe_comma():
    doc = {"xs": [{"v": 1}, {"v": 2}]}
    assert jq(".xs[]", doc) == [{"v": 1}, {"v": 2}]
    assert jq(".xs[] | .v", doc) == [1, 2]
    assert jq(".xs[0].v, .xs[1].v", doc) == [1, 2]


def test_select_and_map():
    doc = [1, 5, 3, 8]
    assert jq(".[] | select(. > 3)", doc) == [5, 8]
    assert jq("map(. * 2)", doc) == [[2, 10, 6, 16]]


def test_object_array_construction():
    doc = {"first": "ada", "last": "l"}
    assert jq('{name: .first, "fixed": 1}', doc) == [
        {"name": "ada", "fixed": 1}
    ]
    # shorthand {first} pulls the same key
    assert jq("{first}", doc) == [{"first": "ada"}]
    assert jq("[.first, .last]", doc) == [["ada", "l"]]


def test_arithmetic_jq_semantics():
    assert jq(". + 1", 2) == [3]
    assert jq('.a + .b', {"a": "x", "b": "y"}) == ["xy"]
    assert jq(".a + .b", {"a": [1], "b": [2]}) == [[1, 2]]
    assert jq(".a + .b", {"a": {"x": 1}, "b": {"y": 2}}) == [{"x": 1, "y": 2}]
    assert jq(".a - .b", {"a": [1, 2, 3], "b": [2]}) == [[1, 3]]


def test_builtins():
    assert jq("length", [1, 2, 3]) == [3]
    assert jq("length", "abcd") == [4]
    assert jq("keys", {"b": 1, "a": 2}) == [["a", "b"]]
    assert jq("add", [1, 2, 3]) == [6]
    assert jq('has("a")', {"a": 1}) == [True]
    assert jq("tostring", {"a": 1}) == ['{"a": 1}']
    assert jq("tonumber", "42") == [42]
    assert jq("type", [1]) == ["array"]
    assert jq('join("-")', ["a", "b"]) == ["a-b"]
    assert jq('del(.a)', {"a": 1, "b": 2}) == [{"b": 2}]


def test_alternative_and_optional():
    assert jq(".a // 5", {}) == [5]
    assert jq(".a // 5", {"a": 7}) == [7]
    assert jq(".a?.b?", {"a": None}) == [None]
    # iterating a non-array errors; with ? it yields nothing
    assert jq(".a[]?", {"a": 3}) == []


def test_comparisons_and_logic():
    assert jq(". == 3", 3) == [True]
    assert jq(".a < .b and .b < 10", {"a": 1, "b": 5}) == [True]
    assert jq("(. > 2) or (. < 0)", 1) == [False]
    assert jq(".[] | select(.x == \"k\") | .y", [{"x": "k", "y": 9}]) == [9]


def test_empty_and_multiple_outputs():
    assert jq("empty", 1) == []
    assert jq(".[], .[0]", [1, 2]) == [1, 2, 1]


def test_jq_pipeline_processor_expands_batch(spark):
    from connect_spark.plans import build_pipeline

    cfg = {
        "input": {
            "generate": {
                "count": 2,
                "mapping": (
                    'root.content = "{\\"id\\": " + counter().string() + '
                    '", \\"tags\\": [\\"a\\", \\"b\\"]}"'
                ),
            }
        },
        "pipeline": {
            "processors": [{"jq": {"query": ".tags[]"}}]
        },
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert sorted(json.loads(r.content) for r in rows) == ["a", "a", "b", "b"]
