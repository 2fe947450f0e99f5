"""The reference's OWN config-test corpus, run VERBATIM.

Every suite under `/root/reference/config/test/**` that carries a
`tests:` section (or a `_benthos_test.yaml` companion) executes
unmodified through the YAML testrunner (plans/testrunner.py) — the
reference's `rpk connect test` mechanism (unit_testing.adoc). This is
the strongest conformance evidence available: the reference project's
own assertions, including exact output documents, metadata, error
strings ("failed assignment (line 1): ..."), mock substitution, and
cross-batch cache dedupe, hold on this engine.

The corpus is read-only PUBLIC reference DATA (test inputs), not
code; nothing is copied into this repo.
"""

from __future__ import annotations

import os

import pytest

CORPUS = "/root/reference/config/test"

# every corpus suite with runnable tests
SUITES = [
    "protobuf/people.yaml",
    "protobuf/house.yaml",
    "awk_benthos_test.yaml",
    "deduplicate.yaml",
    "deduplicate_by_batch.yaml",
    "deduplicate_lru.yaml",
    "deduplicate_ttlru.yaml",
    "env_var_stuff.yaml",
    "files_for_content.yaml",
    "filters.yaml",
    "infile_resource_mock.yaml",
    "json_contains_predicate.yaml",
    "mock_http_proc.yaml",
    "mock_http_proc_path.yaml",
    "structured_metadata.yaml",
    "unit_test_example_benthos_test.yaml",
    "bloblang/also_tests_boolean_operands.yaml",
    "bloblang/boolean_operands.yaml",
    "bloblang/cities_test.yaml",
    "bloblang/csv.yaml",
    "bloblang/csv_formatter_test.yaml",
    "bloblang/env.yaml",
    "bloblang/fans.yaml",
    "bloblang/github_releases_test.yaml",
    "bloblang/literals.yaml",
    "bloblang/message_expansion.yaml",
    "bloblang/walk_json.yaml",
    "bloblang/windowed.yaml",
    "cookbooks/filtering_benthos_test.yaml",
    "resources/some_mappings.yaml",
    "resources/other_mappings_benthos_test.yaml",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS),
    reason="reference corpus not present",
)


@pytest.mark.parametrize("suite", SUITES)
def test_reference_suite(spark, suite):
    from connect_spark.plans.testrunner import run_suite

    results = run_suite(spark, os.path.join(CORPUS, suite))
    assert results, f"{suite}: no test cases ran"
    bad = [r for r in results if not r.ok]
    assert not bad, "\n".join(
        f"{suite} :: {r.name}: {r.failures}" for r in bad
    )


def test_corpus_coverage_is_complete():
    """Every corpus file with a tests: section is either in SUITES,
    a config whose companion suite covers it, or explicitly known
    (protobuf pending the .proto importer). A new file appearing in
    the reference corpus fails this test instead of silently going
    untested."""
    import yaml

    # configs exercised through their _benthos_test companion
    covered_via_companion = {
        "awk.yaml",
        "unit_test_example.yaml",
        "cookbooks/filtering.yaml",
        "resources/other_mappings.yaml",
    }
    have = set(SUITES) | covered_via_companion
    missing = []
    for root, _dirs, files in os.walk(CORPUS):
        for fn in files:
            if not fn.endswith(".yaml"):
                continue
            full = os.path.join(root, fn)
            rel = os.path.relpath(full, CORPUS)
            if rel in have:
                continue
            try:
                with open(full, encoding="utf-8") as fh:
                    doc = yaml.safe_load(fh)
            except Exception:  # noqa: BLE001 — non-suite yaml
                continue
            if isinstance(doc, dict) and doc.get("tests"):
                missing.append(rel)
    assert not missing, f"corpus files with untested suites: {missing}"
