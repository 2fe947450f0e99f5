"""Config unit-test runner — the reference's signature test mechanism
(`rpk connect test`, docs/modules/configuration/pages/unit_testing.adoc:18-70)
re-expressed for DataFrame pipelines.

A test case names the processors under test, provides an input batch
(rows as JSON objects + optional metadata), and asserts on the output
batch with `json_equals` / `content_equals` / `metadata_equals`
conditions (unit_testing.adoc:42-57). Full mechanism:

- `target_processors` — inline processor specs, a JSON pointer into
  the suite's config sections (``'/pipeline/processors'``), or a
  component label (a processor whose conf carries ``label: <name>``).
- `target_mapping` — a Bloblang mapping under test, inline or a
  ``.blobl`` file path (unit_testing.adoc:78-80).
- `environment` — env vars overlaid on ``${VAR}`` config
  interpolations for this case.
- `mocks` — label → replacement processor spec, substituted wherever
  the labeled processor appears in the resolved target (the
  reference's processor-mock mechanism for http etc.).
- `output_batches` (list of batches) is accepted alongside the
  single-batch `output_batch`; batches concatenate in order (batch
  boundaries are a delivery concern the set-based engine asserts via
  batch_id elsewhere).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from connect_spark.bloblang.compiler import META_COL
from connect_spark.plans.pipeline import apply_processor, interpolate_env_vars


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


def _json_pointer(config: dict, pointer: str):
    node: Any = config
    for seg in pointer.strip("/").split("/"):
        if isinstance(node, list):
            node = node[int(seg)]
        elif isinstance(node, dict):
            if seg not in node:
                raise KeyError(
                    f"pointer segment {seg!r} not found "
                    f"(at {sorted(node)})"
                )
            node = node[seg]
        else:
            raise KeyError(f"pointer {pointer!r} walks past a leaf")
    return node


def _find_labeled(node: Any, label: str):
    """Depth-first search for a labeled processor spec — either the
    reference's sibling shape (`{label: foo, mapping: ...}`) or a
    label inside the component conf; returns [spec] or []."""
    if isinstance(node, dict):
        if node.get("label") == label and len(node) == 2:
            return [node]
        for k, v in node.items():
            if isinstance(v, dict) and v.get("label") == label:
                return [{k: v}]
            found = _find_labeled(v, label)
            if found:
                return found
    elif isinstance(node, list):
        for item in node:
            found = _find_labeled(item, label)
            if found:
                return found
    return []


def _resolve_target(
    case: dict[str, Any], config: dict[str, Any]
) -> list[dict[str, Any]]:
    if "target_mapping" in case:
        mapping = case["target_mapping"]
        if isinstance(mapping, str) and mapping.endswith(".blobl"):
            base = config.get("__dir__", ".")
            with open(os.path.join(base, mapping), encoding="utf-8") as fh:
                mapping = fh.read()
        return [{"mapping": mapping}]
    target = case["target_processors"]
    if isinstance(target, list):
        return target
    if target.startswith("/"):
        specs = _json_pointer(config, target)
        return specs if isinstance(specs, list) else [specs]
    specs = _find_labeled(config, target)
    if not specs:
        raise KeyError(f"no processor labeled {target!r} in the config")
    return specs


def _apply_mocks(
    specs: list[dict[str, Any]], mocks: dict[str, Any]
) -> list[dict[str, Any]]:
    if not mocks:
        return specs
    out = []
    for spec in specs:
        label = None
        if isinstance(spec, dict) and "label" in spec and len(spec) == 2:
            label = spec["label"]  # sibling-label shape
        elif isinstance(spec, dict) and len(spec) == 1:
            (_, conf), = spec.items()
            if isinstance(conf, dict):
                label = conf.get("label")
        if label and label in mocks:
            out.append(mocks[label])
        else:
            out.append(spec)
    return out


def run_case(
    spark: SparkSession,
    case: dict[str, Any],
    config: dict[str, Any] | None = None,
) -> CaseResult:
    """Execute one test case: resolve the target (inline / pointer /
    label / mapping), substitute mocks, build the input batch, check
    conditions. `environment` values overlay `${VAR}` interpolations
    in the resolved specs."""
    res = CaseResult(case.get("name", "<unnamed>"))
    specs = _resolve_target(case, config or {})
    specs = _apply_mocks(specs, case.get("mocks", {}))
    if case.get("environment"):
        env = case["environment"]

        def interp(node):
            # interpolate string LEAVES in place — substituting into
            # re-serialized YAML would let env values containing
            # YAML-significant characters corrupt the specs
            if isinstance(node, str):
                return interpolate_env_vars(node, env)
            if isinstance(node, dict):
                return {k: interp(v) for k, v in node.items()}
            if isinstance(node, list):
                return [interp(v) for v in node]
            return node

        specs = interp(specs)
    df = _rows_from_batch(spark, case["input_batch"])
    for spec in specs:
        df = apply_processor(df, spec)
    got = [r.asDict(recursive=True) for r in df.collect()]
    if "output_batches" in case:
        expected = [m for batch in case["output_batches"] for m in batch]
    else:
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
    reference's `<name>_benthos_test.yaml` layout — or a config file
    with an inline `tests:` section; pointer/label targets resolve
    against the sibling config sections)."""
    config: dict[str, Any] = {}
    base_dir = None
    if isinstance(suite, str):
        import yaml

        base_dir = os.path.dirname(os.path.abspath(suite))
        with open(suite) as fh:
            suite = yaml.safe_load(fh)
    if isinstance(suite, dict):
        cases = suite["tests"]
        config = {k: v for k, v in suite.items() if k != "tests"}
    else:
        cases = suite
    if base_dir is not None:
        # .blobl target_mapping paths resolve against the suite file's
        # directory regardless of the suite's shape (dict or bare list)
        config["__dir__"] = base_dir
    return [run_case(spark, c, config) for c in cases]
