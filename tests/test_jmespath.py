"""jmespath processor (functions/jmespath_eval.py, pipeline `jmespath`):
the reference doc's own example plus error-flag semantics
(docs/modules/components/pages/processors/jmespath.adoc)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from connect_spark.functions.jmespath_eval import jmespath_search, jmespath_udf
from connect_spark.plans.pipeline import build_pipeline

# the adoc's worked example (jmespath.adoc:59-86)
DOC = {
    "locations": [
        {"name": "Seattle", "state": "WA"},
        {"name": "New York", "state": "NY"},
        {"name": "Bellevue", "state": "WA"},
        {"name": "Olympia", "state": "WA"},
    ]
}
QUERY = "locations[?state == 'WA'].name | sort(@) | {Cities: join(', ', @)}"


def test_adoc_example_driver_side():
    assert jmespath_search(QUERY, DOC) == {
        "Cities": "Bellevue, Olympia, Seattle"
    }


def test_adoc_example_as_udf(spark):
    df = spark.createDataFrame([(json.dumps(DOC),)], ["content"])
    out = df.select(jmespath_udf(QUERY)(F.col("content")).alias("r"))
    assert json.loads(out.collect()[0]["r"]) == {
        "Cities": "Bellevue, Olympia, Seattle"
    }


def test_compliance_style_expressions():
    """A spread of JMESPath compliance-suite shapes: paths, indexes,
    slices, flatten, filters, functions, multiselect."""
    cases = [
        ("a.b.c", {"a": {"b": {"c": 3}}}, 3),
        ("a[1]", {"a": [1, 2, 3]}, 2),
        ("a[-1]", {"a": [1, 2, 3]}, 3),
        ("a[0:2]", {"a": [1, 2, 3]}, [1, 2]),
        ("a[].b", {"a": [{"b": 1}, {"b": 2}]}, [1, 2]),
        ("a[].b[]", {"a": [{"b": [1]}, {"b": [2, 3]}]}, [1, 2, 3]),
        ("length(a)", {"a": [1, 2, 3]}, 3),
        ("max(a)", {"a": [1, 9, 3]}, 9),
        ("sum(a)", {"a": [1.0, 2.0]}, 3.0),
        ("keys(a)", {"a": {"x": 1, "y": 2}}, ["x", "y"]),
        ("a[?b > `1`].b", {"a": [{"b": 1}, {"b": 2}]}, [2]),
        ("{x: a, y: b}", {"a": 1, "b": 2}, {"x": 1, "y": 2}),
        ("[a, b]", {"a": 1, "b": 2}, [1, 2]),
        ("a || b", {"b": 7}, 7),
        ("a && b", {"a": 1, "b": 7}, 7),
        ("!a", {"a": False}, True),
        ("a.*.b", {"a": {"x": {"b": 1}, "y": {"b": 2}}}, [1, 2]),
        ("to_string(`1`)", {}, "1"),
        ("contains(a, 'x')", {"a": ["x", "y"]}, True),
        ("starts_with(a, 'he')", {"a": "hello"}, True),
        ("reverse(a)", {"a": [1, 2]}, [2, 1]),
        ("merge(a, b)", {"a": {"x": 1}, "b": {"y": 2}}, {"x": 1, "y": 2}),
        ("missing.path", {"a": 1}, None),
    ]
    for query, doc, want in cases:
        got = jmespath_search(query, doc)
        if isinstance(got, list) and not isinstance(want, list):
            raise AssertionError((query, got, want))
        assert got == want, (query, got, want)


def test_pipeline_processor_replaces_document_and_flags_errors(spark):
    rows = [
        (json.dumps(DOC),),
        ("not json at all {",),  # parse failure -> unchanged + _error
    ]
    df = spark.createDataFrame(rows, ["content"])
    config = {
        "input": {"memory": None},
        "pipeline": {"processors": [{"jmespath": {"query": QUERY}}]},
    }
    # build the processor directly (memory input seam varies)
    from connect_spark.plans.pipeline import apply_processor

    out = apply_processor(df, {"jmespath": {"query": QUERY}}).collect()
    ok = [r for r in out if r["_error"] is None]
    bad = [r for r in out if r["_error"] is not None]
    assert len(ok) == 1 and len(bad) == 1
    assert json.loads(ok[0]["content"]) == {
        "Cities": "Bellevue, Olympia, Seattle"
    }
    # failed message passes through unchanged for DLQ routing
    assert bad[0]["content"] == "not json at all {"


def test_bad_query_fails_at_build_time(spark):
    import pytest

    df = spark.createDataFrame([("{}",)], ["content"])
    with pytest.raises(Exception):
        jmespath_udf("[invalid syntax ![")(F.col("content"))
