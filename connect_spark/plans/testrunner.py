"""Config unit-test runner — the reference's signature test mechanism
(`rpk connect test`, docs/modules/configuration/pages/unit_testing.adoc:18-70)
re-expressed for DataFrame pipelines.

A test case names the processors under test, provides an input batch
(rows as JSON objects + optional metadata), and asserts on the output
batch with `json_equals` / `content_equals` / `metadata_equals`
conditions (unit_testing.adoc:42-57).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from connect_spark.bloblang.compiler import META_COL
from connect_spark.plans.pipeline import apply_processor


@dataclass
class CaseResult:
    name: str
    failures: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.failures


def _rows_from_batch(spark: SparkSession, batch: list[dict[str, Any]]):
    rows = []
    has_meta = any("metadata" in m for m in batch)
    for msg in batch:
        if "json_content" in msg:
            row = dict(msg["json_content"])
        elif "content" in msg:
            row = {"content": msg["content"]}
        else:
            raise ValueError(f"message needs json_content or content: {msg}")
        if has_meta:
            row[META_COL] = {
                str(k): str(v) for k, v in msg.get("metadata", {}).items()
            }
        rows.append(row)
    return spark.createDataFrame(rows)


def run_case(spark: SparkSession, case: dict[str, Any]) -> CaseResult:
    """Execute one test case: build the input batch, apply
    `target_processors` (inline processor specs), check conditions."""
    res = CaseResult(case.get("name", "<unnamed>"))
    df = _rows_from_batch(spark, case["input_batch"])
    for spec in case["target_processors"]:
        df = apply_processor(df, spec)
    got = [r.asDict(recursive=True) for r in df.collect()]
    expected = case.get("output_batch", [])
    if len(got) != len(expected):
        res.failures.append(
            f"row count: expected {len(expected)}, got {len(got)}: {got}"
        )
        return res
    for i, (g, exp) in enumerate(zip(got, expected)):
        meta = g.pop(META_COL, {}) or {}
        if "json_equals" in exp and g != exp["json_equals"]:
            res.failures.append(
                f"row {i} json_equals: expected {exp['json_equals']}, got {g}"
            )
        if "content_equals" in exp and g.get("content") != exp["content_equals"]:
            res.failures.append(
                f"row {i} content_equals: expected {exp['content_equals']!r},"
                f" got {g.get('content')!r}"
            )
        if "json_contains" in exp:
            for k, v in exp["json_contains"].items():
                if g.get(k) != v:
                    res.failures.append(
                        f"row {i} json_contains[{k}]: expected {v!r}, got {g.get(k)!r}"
                    )
        if "metadata_equals" in exp:
            want = {str(k): str(v) for k, v in exp["metadata_equals"].items()}
            if meta != want:
                res.failures.append(
                    f"row {i} metadata_equals: expected {want}, got {meta}"
                )
    return res


def run_suite(
    spark: SparkSession,
    suite: dict[str, Any] | list[dict[str, Any]] | str,
) -> list[CaseResult]:
    """Accepts a suite dict, a case list, or a YAML file path (the
    reference's `<name>_benthos_test.yaml` layout)."""
    if isinstance(suite, str):
        import yaml

        with open(suite) as fh:
            suite = yaml.safe_load(fh)
    cases = suite["tests"] if isinstance(suite, dict) else suite
    return [run_case(spark, c) for c in cases]
