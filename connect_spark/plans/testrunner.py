"""Config unit-test runner — the reference's signature test mechanism
(`rpk connect test`, docs/modules/configuration/pages/unit_testing.adoc:18-70)
re-expressed for DataFrame pipelines, complete enough to run the
reference's OWN test corpus (`/root/reference/config/test/**`)
verbatim (tests/test_reference_corpus.py).

A test case names the processors under test, provides one input batch
(or several — `input_batches` — which run sequentially through the
same resolved processors sharing resource state, the cross-batch
dedupe shape), and asserts on the output batches. Full mechanism:

- `target_processors` — inline processor specs, a JSON pointer into
  the suite's config sections (``'/pipeline/processors'``, the
  DEFAULT when the case names no target), a pointer with an element
  index, a component label, or a cross-file ``./other.yaml#/ptr``
  reference. Companion suites named ``X_benthos_test.yaml`` resolve
  against the sibling ``X.yaml`` config.
- `target_mapping` — a Bloblang mapping under test, inline or a
  ``.blobl`` file path (unit_testing.adoc:78-80).
- `environment` — env vars overlaid for the case: on ``${VAR}`` /
  ``${VAR:default}`` config interpolations AND on the Bloblang
  ``env()`` function (os.environ is patched around the case build,
  where both resolve — config parse time, enterprise.go:234-236).
- `mocks` — label → replacement spec, or JSON-pointer keys into the
  config (``/pipeline/processors/1`` replaces, ``.../-`` appends),
  substituted on a deep copy of the config before target resolution
  (the reference's processor-mock mechanism for http etc.).
- input messages: `content`, `json_content`, or `file_content`
  (+ `metadata`); output conditions: `content_equals`,
  `content_matches` (regex), `json_equals`, `json_contains`
  (recursive subset), `metadata_equals` (structured values),
  `file_equals`, and `bloblang` (a predicate that must hold).
- a case with NO output assertion expects every message deleted
  (the reference's filters.yaml convention); empty output batches
  are omitted from the comparison, matching the reference runner.
"""

from __future__ import annotations

import copy
import json
import os
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from connect_spark.bloblang.compiler import META_COL
from connect_spark.plans.pipeline import (
    apply_processor,
    interpolate_env_vars,
)


@dataclass
class CaseResult:
    name: str
    failures: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.failures


def _meta_str(v: Any) -> str:
    from connect_spark.bloblang.pyeval import render_json

    return v if isinstance(v, str) else render_json(v)


def _load_file(base: str | None, path: str) -> str:
    full = os.path.join(base or ".", path)
    with open(full, encoding="utf-8") as fh:
        return fh.read()


def _frame_from_batch(
    spark: SparkSession,
    batch: list[dict[str, Any]],
    base_dir: str | None,
):
    """One input batch as a content-envelope frame: the reference's
    message model (payload bytes + metadata), with `_arrival_order`
    stamping the batch order so batch functions and first-wins
    dedupe are deterministic."""
    from pyspark.sql.types import (
        LongType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    rows = []
    for i, msg in enumerate(batch):
        if "json_content" in msg:
            from connect_spark.bloblang.pyeval import render_json

            content = render_json(msg["json_content"])
        elif "file_content" in msg:
            content = _load_file(base_dir, msg["file_content"])
        elif "content" in msg:
            content = str(msg["content"])
        else:
            raise ValueError(
                f"message needs content/json_content/file_content: {msg}"
            )
        meta = {
            str(k): _meta_str(v)
            for k, v in (msg.get("metadata") or {}).items()
        }
        rows.append((content, meta, i))
    schema = StructType([
        StructField("content", StringType()),
        StructField(META_COL, MapType(StringType(), StringType())),
        StructField("_arrival_order", LongType()),
    ])
    # unit-test batches are a handful of documents, but createDataFrame
    # slices them across defaultParallelism Python-RDD partitions — and
    # the try/catch + branch union chains downstream ADD partition
    # lists (no exchange, so AQE never coalesces): a one-document suite
    # was measured collecting through 384- and 416-task stages of
    # mostly-empty partitions, ~75 of its 81 seconds.  A single slice
    # at the source keeps every downstream branch one-partition (a
    # coalesce(1) instead would still pay one Python-worker round trip
    # per empty source slice inside the merged task — measured ~4s per
    # action).
    rdd = spark.sparkContext.parallelize(rows, 1)
    return spark.createDataFrame(rdd, schema)


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


def _pointer_set(config: dict, pointer: str, value: Any) -> None:
    """Set/append at a JSON pointer (mock keys like
    `/pipeline/processors/1` and the `/-` append form)."""
    segs = pointer.strip("/").split("/")
    node = _json_pointer(config, "/" + "/".join(segs[:-1])) if (
        len(segs) > 1
    ) else config
    last = segs[-1]
    if isinstance(node, list):
        if last == "-":
            node.append(value)
        else:
            node[int(last)] = value
    else:
        node[last] = value


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


def _replace_labeled(node: Any, label: str, repl: Any) -> bool:
    """Replace the labeled processor spec ANYWHERE in the config tree
    (resources included — the infile_resource_mock shape) with the
    mock spec. Returns True when a replacement happened."""
    if isinstance(node, list):
        for i, item in enumerate(node):
            if isinstance(item, dict):
                hit = (
                    ("label" in item and item.get("label") == label)
                    or (
                        len(item) == 1
                        and isinstance(next(iter(item.values())), dict)
                        and next(iter(item.values())).get("label")
                        == label
                    )
                )
                if hit:
                    # the mock replaces the IMPLEMENTATION; the label
                    # stays so resource lookups still resolve
                    # (infile_resource_mock.yaml mocks a
                    # processor_resources entry referenced by name)
                    node[i] = {"label": label, **repl}
                    return True
            if _replace_labeled(item, label, repl):
                return True
        return False
    if isinstance(node, dict):
        for v in node.values():
            if _replace_labeled(v, label, repl):
                return True
    return False


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
    target = case.get("target_processors", "/pipeline/processors")
    if isinstance(target, list):
        return target
    if "#" in target:
        # cross-file pointer: `./other.yaml#/pipeline/processors`
        # (the reference's also_tests_boolean_operands.yaml)
        import yaml

        fname, _, ptr = target.partition("#")
        base = config.get("__dir__", ".")
        with open(os.path.join(base, fname), encoding="utf-8") as fh:
            other = yaml.safe_load(fh)
        specs = _json_pointer(other, ptr)
        return specs if isinstance(specs, list) else [specs]
    if target.startswith("/"):
        specs = _json_pointer(config, target)
        return specs if isinstance(specs, list) else [specs]
    specs = _find_labeled(config, target)
    if not specs:
        raise KeyError(f"no processor labeled {target!r} in the config")
    return specs


def _apply_mocks(config: dict[str, Any], mocks: dict[str, Any]) -> None:
    """Apply mocks IN PLACE on a (deep-copied) config: pointer keys
    set/append, label keys replace the labeled spec wherever it
    lives (pipeline or resources)."""
    for key, repl in (mocks or {}).items():
        if key.startswith("/"):
            _pointer_set(config, key, repl)
        else:
            if not _replace_labeled(config, key, repl):
                raise KeyError(f"mock target {key!r} not found")


def _register_resources(spark: SparkSession, config: dict[str, Any]):
    """Named resources a case's processors may reference: caches
    (dedupe/cache processors) and processor resources (`resource`)."""
    from connect_spark.plans.pipeline import _RESOURCES
    from connect_spark.plans.state_ext import register_cache_resources

    register_cache_resources(spark, config)
    _RESOURCES.clear()
    for item in config.get("processor_resources", []) or []:
        item = dict(item)
        _RESOURCES[item.pop("label")] = item


def _collect_batch(df) -> list[dict[str, Any]]:
    """Collect an output frame back into messages: rows sorted by
    arrival order, envelope columns mapped to (content, meta, error),
    structured rows serialized as canonical JSON documents."""
    from connect_spark.bloblang.pyeval import render_json

    rows = [r.asDict(recursive=True) for r in df.collect()]
    if rows and "_arrival_order" in rows[0]:
        rows.sort(key=lambda r: (r.get("_arrival_order") or 0))
    out = []
    internal = {META_COL, "_error", "_error_source", "_arrival_order"}
    from connect_spark.bloblang.compiler import BATCH_KEY_COLS

    for r in rows:
        meta = r.get(META_COL) or {}
        doc = {
            k: v for k, v in r.items()
            if k not in internal and k not in BATCH_KEY_COLS
            and not k.startswith("_")
        }
        if set(doc) == {"content"}:
            content = doc["content"]
        else:
            content = render_json(doc)
        out.append({
            "content": content,
            "meta": meta,
            "error": r.get("_error"),
        })
    return out


def _json_contains(expected: Any, actual: Any) -> bool:
    """Recursive subset match (unit_testing.adoc json_contains): every
    expected key/element must appear in the actual value; extra actual
    keys are fine."""
    if isinstance(expected, dict):
        if not isinstance(actual, dict):
            return False
        return all(
            k in actual and _json_contains(v, actual[k])
            for k, v in expected.items()
        )
    if isinstance(expected, list):
        if not isinstance(actual, list) or len(expected) != len(actual):
            return False
        return all(
            _json_contains(e, a) for e, a in zip(expected, actual)
        )
    return expected == actual


def _norm_json(v: Any) -> Any:
    if isinstance(v, float) and v.is_integer():
        return int(v)
    if isinstance(v, dict):
        return {str(k): _norm_json(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm_json(x) for x in v]
    return v


def _check_message(
    i: int,
    got: dict[str, Any],
    exp: dict[str, Any],
    base_dir: str | None,
    failures: list[str],
) -> None:
    content = got["content"]
    if "content_equals" in exp:
        want = str(exp["content_equals"])
        # a YAML block scalar (|) carries a trailing newline the
        # reference runner does not require of the message itself
        if content != want and content != want.rstrip("\n"):
            failures.append(
                f"row {i} content_equals: expected {want!r}, "
                f"got {content!r}"
            )
    if "content_matches" in exp:
        if not re.search(str(exp["content_matches"]), str(content)):
            failures.append(
                f"row {i} content_matches: pattern "
                f"{exp['content_matches']!r} not in {content!r}"
            )
    if "file_equals" in exp:
        want = _load_file(base_dir, exp["file_equals"])
        if content != want and content != want.rstrip("\n"):
            failures.append(
                f"row {i} file_equals: expected {want!r}, got {content!r}"
            )
    if "json_equals" in exp or "json_contains" in exp:
        try:
            doc = _norm_json(json.loads(content))
        except Exception:  # noqa: BLE001 — non-JSON payload
            doc = None
        if "json_equals" in exp:
            want = exp["json_equals"]
            if isinstance(want, str):
                want = json.loads(want)
            want = _norm_json(want)
            if doc != want:
                failures.append(
                    f"row {i} json_equals: expected {want}, got {doc}"
                )
        if "json_contains" in exp:
            want = exp["json_contains"]
            if isinstance(want, str):
                want = json.loads(want)
            if not _json_contains(_norm_json(want), doc):
                failures.append(
                    f"row {i} json_contains: {want} not contained "
                    f"in {doc}"
                )
    if "metadata_equals" in exp:
        got_meta = got.get("meta") or {}
        want_meta = exp["metadata_equals"]
        for k, v in want_meta.items():
            stored = got_meta.get(str(k))
            if isinstance(v, str):
                ok = stored == v
            else:
                try:
                    ok = _norm_json(json.loads(stored)) == _norm_json(v)
                except Exception:  # noqa: BLE001 — unparsable stored
                    ok = False
            if not ok:
                failures.append(
                    f"row {i} metadata_equals[{k}]: expected {v!r}, "
                    f"got {stored!r}"
                )
        extra = set(got_meta) - {str(k) for k in want_meta}
        if extra:
            failures.append(
                f"row {i} metadata_equals: unexpected keys {sorted(extra)}"
            )
    if "bloblang" in exp:
        from connect_spark.bloblang.pyeval import eval_predicate

        try:
            ok = eval_predicate(
                exp["bloblang"], content,
                meta=got.get("meta"), error=got.get("error"),
            )
        except Exception as e:  # noqa: BLE001 — predicate failure
            ok = False
            failures.append(
                f"row {i} bloblang condition raised: {e}"
            )
            return
        if ok is not True:
            failures.append(
                f"row {i} bloblang condition {exp['bloblang']!r} "
                f"resolved {ok!r} (content={content!r}, "
                f"error={got.get('error')!r})"
            )


def run_case(
    spark: SparkSession,
    case: dict[str, Any],
    config: dict[str, Any] | None = None,
) -> CaseResult:
    """Execute one test case: resolve the target (inline / pointer /
    label / mapping / cross-file), substitute mocks on a config copy,
    run each input batch in sequence (shared resource state), check
    conditions. The case `environment` overlays `${VAR}`
    interpolations AND the plan-time env() function."""
    res = CaseResult(case.get("name", "<unnamed>"))
    config = copy.deepcopy(config or {})
    base_dir = config.get("__dir__")
    _apply_mocks(config, case.get("mocks", {}))
    env = {
        str(k): str(v)
        for k, v in (case.get("environment") or {}).items()
    }
    saved_env = dict(os.environ)
    from connect_spark.plans.pipeline import (
        reset_config_base_dir,
        set_config_base_dir,
    )

    base_tok = set_config_base_dir(base_dir)
    try:
        # env() resolves at plan-build (reference: config parse time);
        # the overlay must be visible there AND captured into the
        # dynamic path's executor snapshot
        os.environ.update(env)
        specs = _resolve_target(case, config)

        def interp(node):
            # interpolate string LEAVES in place — substituting
            # into re-serialized YAML would let env values
            # containing YAML-significant characters corrupt specs.
            # Runs even with an empty case environment: `${VAR:def}`
            # defaults must resolve (env_var_stuff.yaml)
            if isinstance(node, str):
                return interpolate_env_vars(node, env)
            if isinstance(node, dict):
                return {k: interp(v) for k, v in node.items()}
            if isinstance(node, list):
                return [interp(v) for v in node]
            return node

        specs = interp(specs)
        _register_resources(spark, config)
        batches = (
            case["input_batches"]
            if "input_batches" in case
            else [case["input_batch"]]
        )
        got_batches: list[list[dict[str, Any]]] = []
        for batch in batches:
            df = _frame_from_batch(spark, batch, base_dir)
            for spec in specs:
                df = apply_processor(df, spec)
            rows = _collect_batch(df)
            if rows:
                # an entirely-deleted batch is omitted, matching the
                # reference runner (filters.yaml / deduplicate.yaml)
                got_batches.append(rows)
    finally:
        reset_config_base_dir(base_tok)
        os.environ.clear()
        os.environ.update(saved_env)
    if "output_batches" in case:
        exp_batches = case["output_batches"]
    elif "output_batch" in case:
        exp_batches = [case["output_batch"]]
    else:
        exp_batches = []
    if "input_batches" not in case:
        # single input batch: all output rows form one logical batch
        # (split-producing processors are asserted flat)
        flat = [m for b in got_batches for m in b]
        got_batches = [flat] if flat else []
        flat_exp = [m for b in exp_batches for m in b]
        exp_batches = [flat_exp] if flat_exp else []
    if len(got_batches) != len(exp_batches):
        res.failures.append(
            f"batch count: expected {len(exp_batches)}, got "
            f"{len(got_batches)}: {got_batches}"
        )
        return res
    for bi, (got_b, exp_b) in enumerate(zip(got_batches, exp_batches)):
        if len(got_b) != len(exp_b):
            res.failures.append(
                f"batch {bi} row count: expected {len(exp_b)}, got "
                f"{len(got_b)}: {got_b}"
            )
            continue
        for i, (g, exp) in enumerate(zip(got_b, exp_b)):
            _check_message(i, g, exp, base_dir, res.failures)
    return res


def run_suite(
    spark: SparkSession,
    suite: dict[str, Any] | list[dict[str, Any]] | str,
) -> list[CaseResult]:
    """Accepts a suite dict, a case list, or a YAML file path — a
    config file with an inline `tests:` section, or the reference's
    companion layout `<name>_benthos_test.yaml` (targets resolve
    against the sibling `<name>.yaml` config)."""
    config: dict[str, Any] = {}
    base_dir = None
    if isinstance(suite, str):
        import yaml

        path = os.path.abspath(suite)
        base_dir = os.path.dirname(path)
        with open(path, encoding="utf-8") as fh:
            suite = yaml.safe_load(fh)
        if (
            isinstance(suite, dict)
            and set(suite) == {"tests"}
            and path.endswith("_benthos_test.yaml")
        ):
            sibling = path[: -len("_benthos_test.yaml")] + ".yaml"
            if os.path.exists(sibling):
                with open(sibling, encoding="utf-8") as fh:
                    cfg = yaml.safe_load(fh) or {}
                suite = {**cfg, "tests": suite["tests"]}
    if isinstance(suite, dict):
        # a config without a tests section runs zero tests, matching
        # `rpk connect test` on a plain config
        cases = suite.get("tests") or []
        config = {k: v for k, v in suite.items() if k != "tests"}
    else:
        cases = suite
    if base_dir is not None:
        # .blobl target_mapping / file_content / cross-file pointer
        # paths resolve against the suite file's directory
        config["__dir__"] = base_dir
    return [run_case(spark, c, config) for c in cases]
