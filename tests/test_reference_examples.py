"""The reference's shipped example configs, linted VERBATIM.

`/root/reference/config/examples/*.yaml` (plus the RAG suite and the
template examples) are the configs the reference tells its users to
start from. They name live endpoints (Kafka brokers, Postgres DSNs,
Discord/Jira APIs), so they cannot EXECUTE here — but every one of
them must parse and lint clean against this engine's component
registry: every kind known, every required field understood, every
config shape (sibling `processors`, broker input lists, template
kinds) accepted. A user porting a reference config gets a lint
answer identical to the reference's.

The string_split example (stdin → string_split → stdout) has no live
endpoint, so its processor chain also runs end-to-end through the
testrunner.
"""

from __future__ import annotations

import glob
import os

import pytest
import yaml

REF = "/root/reference/config"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference configs not present"
)


def _load(path: str) -> dict:
    from connect_spark.plans.pipeline import interpolate_env_vars

    with open(path, encoding="utf-8") as fh:
        return yaml.safe_load(interpolate_env_vars(fh.read()))


@pytest.mark.parametrize(
    "path", sorted(glob.glob(f"{REF}/examples/*.yaml"))
)
def test_example_config_lints_clean(path):
    from connect_spark.__main__ import lint_config

    errs = lint_config(_load(path))
    assert not errs, f"{os.path.basename(path)}: {errs}"


@pytest.mark.parametrize(
    "path",
    sorted(
        glob.glob(f"{REF}/template_examples/*.yaml")
        + glob.glob(f"{REF}/rag/templates/*.yaml")
        + [f"{REF}/rag/eval.yaml", f"{REF}/rag/ingestion/redpanda-docs.yaml"]
    ),
)
def test_template_and_rag_support_configs_lint_clean(path):
    from connect_spark.__main__ import lint_config

    errs = lint_config(_load(path))
    assert not errs, f"{path}: {errs}"


def test_rag_pipelines_lint_with_their_templates():
    """The RAG indexing/retrieval configs use kinds DEFINED by the
    suite's own template files (rag_topics, *_embed, pgvector) —
    registering those templates first, every pipeline lints clean,
    matching `rpk connect lint -t templates/*.yaml`."""
    from connect_spark.__main__ import lint_config
    from connect_spark.plans.templates import (
        _TEMPLATES,
        register_template,
    )

    saved = dict(_TEMPLATES)
    try:
        for t in sorted(glob.glob(f"{REF}/rag/templates/*.yaml")):
            register_template(_load(t))
        for f in sorted(
            glob.glob(f"{REF}/rag/indexing/*.yaml")
            + glob.glob(f"{REF}/rag/retrieval/*.yaml")
        ):
            errs = lint_config(_load(f))
            assert not errs, f"{f}: {errs}"
    finally:
        _TEMPLATES.clear()
        _TEMPLATES.update(saved)


def test_string_split_example_runs(spark):
    """config/examples/string_split.yaml's processor chain, executed
    on an input batch through the testrunner."""
    from connect_spark.plans.testrunner import run_case

    cfg = _load(f"{REF}/examples/string_split.yaml")
    case = {
        "name": "string_split example",
        "input_batch": [{"content": "a,b,c"}],
        "output_batches": [[
            {"content_equals": "a"},
            {"content_equals": "b"},
            {"content_equals": "c"},
        ]],
    }
    res = run_case(spark, case, cfg)
    assert res.ok, res.failures
