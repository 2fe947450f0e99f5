"""Upgraded config unit-test runner mechanics (unit_testing.adoc):
pointer/label targets, mocks, environment, target_mapping,
output_batches, and env interpolation in build_pipeline."""

from __future__ import annotations

import pytest

from connect_spark.plans.pipeline import build_pipeline, interpolate_env_vars
from connect_spark.plans.testrunner import run_suite


def test_env_interpolation():
    assert interpolate_env_vars(
        "path: ${MY_DIR:/tmp/default}") == "path: /tmp/default"
    assert interpolate_env_vars(
        "path: ${MY_DIR:/d}", {"MY_DIR": "/real"}) == "path: /real"
    assert interpolate_env_vars("x: ${UNSET_VAR_XYZ}") == "x: "
    # bloblang interpolations pass through
    assert interpolate_env_vars(
        "subject: e.${! this.t }") == "subject: e.${! this.t }"


def test_build_pipeline_env_interpolation(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("GEN_COUNT", "3")
    cfg = """
input:
  generate:
    count: ${GEN_COUNT:1}
    mapping: "root.n = counter()"
"""
    df = build_pipeline(spark, cfg).dataframe()
    assert df.count() == 3


def test_suite_pointer_target(spark):
    suite = {
        "pipeline": {"processors": [
            {"mapping": "root.n = this.n * 2"},
        ]},
        "tests": [{
            "name": "pointer",
            "target_processors": "/pipeline/processors",
            "input_batch": [{"json_content": {"n": 4}}],
            "output_batch": [{"json_equals": {"n": 8}}],
        }],
    }
    results = run_suite(spark, suite)
    assert results[0].ok, results[0].failures


def test_suite_label_target_and_mocks(spark):
    suite = {
        "pipeline": {"processors": [
            {"mapping": {"label": "enrich",
                         "query": "root.n = this.n + 1"}},
        ]},
        "tests": [
            {
                "name": "mocked",
                "target_processors": "enrich",
                "mocks": {"enrich": {"mapping": "root.n = 99"}},
                "input_batch": [{"json_content": {"n": 1}}],
                "output_batch": [{"json_equals": {"n": 99}}],
            },
        ],
    }
    results = run_suite(spark, suite)
    assert results[0].ok, results[0].failures


def test_suite_environment_and_output_batches(spark):
    suite = {
        "tests": [{
            "name": "env",
            "target_processors": [
                {"mapping": 'root.tag = "${TAG_VALUE:none}"'},
            ],
            "environment": {"TAG_VALUE": "prod"},
            "input_batch": [{"json_content": {"n": 1}},
                            {"json_content": {"n": 2}}],
            "output_batches": [
                [{"json_contains": {"tag": "prod"}}],
                [{"json_contains": {"tag": "prod"}}],
            ],
        }],
    }
    results = run_suite(spark, suite)
    assert results[0].ok, results[0].failures


def test_suite_target_mapping_inline_and_file(spark, tmp_path):
    blobl = tmp_path / "double.blobl"
    blobl.write_text("root.out = this.n * 2\n")
    suite_file = tmp_path / "suite.yaml"
    suite_file.write_text("""
tests:
  - name: file mapping
    target_mapping: double.blobl
    input_batch:
      - json_content: {n: 5}
    output_batch:
      - json_equals: {out: 10}
  - name: inline mapping
    target_mapping: 'root.out = this.n + 1'
    input_batch:
      - json_content: {n: 5}
    output_batch:
      - json_equals: {out: 6}
""")
    results = run_suite(spark, str(suite_file))
    assert all(r.ok for r in results), [r.failures for r in results]


def test_suite_unknown_label_errors(spark):
    suite = {"tests": [{
        "target_processors": "nope",
        "input_batch": [{"json_content": {"n": 1}}],
    }]}
    with pytest.raises(KeyError, match="nope"):
        run_suite(spark, suite)


def test_sibling_label_shape_runs_and_targets(spark):
    suite = {
        "pipeline": {"processors": [
            {"label": "dbl", "mapping": "root.n = this.n * 2"},
        ]},
        "tests": [
            {
                "name": "label finds sibling shape",
                "target_processors": "dbl",
                "input_batch": [{"json_content": {"n": 3}}],
                "output_batch": [{"json_equals": {"n": 6}}],
            },
            {
                "name": "mock replaces sibling shape",
                "target_processors": "dbl",
                "mocks": {"dbl": {"mapping": "root.n = 0"}},
                "input_batch": [{"json_content": {"n": 3}}],
                "output_batch": [{"json_equals": {"n": 0}}],
            },
        ],
    }
    results = run_suite(spark, suite)
    assert all(r.ok for r in results), [r.failures for r in results]


def test_sibling_label_in_pipeline_run(spark):
    from connect_spark.plans.pipeline import Pipeline

    df = Pipeline(spark, {
        "input": {"generate": {"count": 1, "mapping": "root.n = 5"}},
        "pipeline": {"processors": [
            {"label": "x", "mapping": "root.n = this.n + 1"},
        ]},
    }).dataframe()
    assert df.collect()[0].n == 6


def test_environment_with_yaml_significant_chars(spark):
    suite = {"tests": [{
        "target_processors": [
            {"mapping": 'root.tag = "${TRICKY:none}"'},
        ],
        # colon+hash+newline would corrupt a YAML re-serialization;
        # tree-walk interpolation leaves the spec structure intact
        # (quotes inside the value would break the Bloblang string
        # literal itself — that is interpolation-into-code, the same
        # hazard the reference has)
        "environment": {"TRICKY": "a: b #no comment"},
        "input_batch": [{"json_content": {"n": 1}}],
        "output_batch": [{"json_contains": {"tag": "a: b #no comment"}}],
    }]}
    results = run_suite(spark, suite)
    assert results[0].ok, results[0].failures


def test_list_suite_file_resolves_blobl_dir(spark, tmp_path):
    (tmp_path / "m.blobl").write_text("root.out = this.n * 3\n")
    suite_file = tmp_path / "list_suite.yaml"
    suite_file.write_text(
        "- name: listy\n"
        "  target_mapping: m.blobl\n"
        "  input_batch:\n"
        "    - json_content: {n: 2}\n"
        "  output_batch:\n"
        "    - json_equals: {out: 6}\n"
    )
    results = run_suite(spark, str(suite_file))
    assert results[0].ok, results[0].failures
