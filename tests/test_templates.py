"""Config templates (templating.adoc): field defaults, Bloblang
mapping expansion (incl. map_each over list fields), processor and
input templates, nesting, and error paths."""

from __future__ import annotations

import pytest

from connect_spark.bloblang.pyeval import eval_mapping_value
from connect_spark.plans import build_pipeline
from connect_spark.plans.templates import (
    TemplateError,
    clear_templates,
    register_template,
)


@pytest.fixture(autouse=True)
def _clean():
    clear_templates()
    yield
    clear_templates()


def test_value_evaluator_core():
    out = eval_mapping_value(
        """
        let n = this.xs.length()
        root.total = $n * 2
        root.names = this.xs.map_each(x -> x.name.uppercase())
        root.first = this.xs.index(0).name
        root.kind = if this.fast { "quick" } else { "slow" }
        """,
        {"xs": [{"name": "a"}, {"name": "b"}], "fast": True},
    )
    assert out == {
        "total": 4,
        "names": ["A", "B"],
        "first": "a",
        "kind": "quick",
    }


def test_processor_template_with_defaults(spark):
    cfg = {
        "templates": [
            {
                "name": "bucketize",
                "type": "processor",
                "fields": [
                    {"name": "field", "type": "string"},
                    {"name": "cutoff", "type": "int", "default": 10},
                ],
                "mapping": """
                root.mapping = "root.bucket = if this." + this.field +
                  " >= " + this.cutoff.string() + " { \\"big\\" } else { \\"small\\" }\\n" +
                  "root.v = this.v"
                """,
            }
        ],
        "input": {
            "generate": {"count": 3, "mapping": "root.v = counter() * 8"}
        },
        "pipeline": {
            "processors": [{"bucketize": {"field": "v"}}]
        },
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    got = {r.v: r.bucket for r in rows}
    assert got == {0: "small", 8: "small", 16: "big"}


def test_input_template_fanning_out_sources(spark):
    """The docs' aws_sqs_list shape: a list field expands into a broker
    of child inputs via map_each."""
    register_template(
        {
            "name": "multi_generate",
            "type": "input",
            "fields": [{"name": "counts", "type": "list"}],
            "mapping": """
            root.broker.inputs = this.counts.map_each(c -> {
              "generate": {"count": c, "mapping": "root.n = counter()"}
            })
            """,
        }
    )
    cfg = {
        "input": {"multi_generate": {"counts": [2, 3]}},
        "pipeline": {"processors": []},
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert len(rows) == 5


def test_template_errors():
    register_template(
        {
            "name": "t1",
            "type": "processor",
            "fields": [{"name": "req", "type": "string"}],
            "mapping": 'root.noop = {}',
        }
    )
    from connect_spark.plans.templates import expand_component

    with pytest.raises(TemplateError, match="missing required field"):
        expand_component("t1", {}, "processor")
    with pytest.raises(TemplateError, match="unknown fields"):
        expand_component("t1", {"req": "x", "extra": 1}, "processor")
    # non-template names pass through untouched
    assert expand_component("mapping", "root = this", "processor") == (
        "mapping",
        "root = this",
    )
