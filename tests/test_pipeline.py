"""YAML pipeline loader + config unit-test runner tests, mirroring the
reference's config/test corpus style (SURVEY.md §5.1-5.2)."""

from __future__ import annotations

import pytest

from connect_spark.plans import build_pipeline
from connect_spark.plans.pipeline import PipelineConfigError
from connect_spark.plans.testrunner import run_case, run_suite

SF = "/root/testdata/sf0.001"


def test_yaml_pipeline_end_to_end(spark):
    cfg = f"""
input:
  table:
    name: events
    sf_dir: {SF}
pipeline:
  processors:
    - mutation: |
        root.day = this.ts.ts_format("yyyy-MM-dd")
        root.big = this.value > 30
    - filter: this.event_type != "error"
    - mapping: |
        root.event_id = this.event_id
        root.day = this.day
        root.big = this.big
output:
  memory: {{}}
"""
    out = build_pipeline(spark, cfg).run()
    rows = out.collect()
    assert out.columns == ["event_id", "day", "big"]
    assert len(rows) > 0
    assert all(r["day"].startswith("2024-") for r in rows[:20])


def test_generate_input(spark):
    cfg = """
input:
  generate:
    count: 5
    mapping: |
      root.n = counter()
      root.label = "msg"
"""
    df = build_pipeline(spark, cfg).dataframe()
    rows = df.collect()
    assert len(rows) == 5
    assert all(r["label"] == "msg" for r in rows)


def test_switch_processor_routing(spark):
    cfg = {
        "input": {"table": {"name": "events", "sf_dir": SF}},
        "pipeline": {
            "processors": [
                {
                    "switch": [
                        {
                            "check": 'this.event_type == "purchase"',
                            "processors": [
                                {"mutation": 'root.route = "billing"'}
                            ],
                        },
                        {
                            "check": 'this.event_type == "error"',
                            "processors": [{"mutation": 'root.route = "ops"'}],
                        },
                        {
                            "processors": [
                                {"mutation": 'root.route = "product"'}
                            ]
                        },
                    ]
                },
                {"mapping": "root.event_type = this.event_type\nroot.route = this.route"},
            ]
        },
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    routing = {(r["event_type"], r["route"]) for r in rows}
    assert ("purchase", "billing") in routing
    assert ("error", "ops") in routing
    assert ("view", "product") in routing
    assert len({r for r in routing if r[0] == "purchase"}) == 1


def test_archive_unarchive_roundtrip(spark):
    cfg = {
        "input": {"table": {"name": "documents", "sf_dir": SF}},
        "pipeline": {
            "processors": [
                {
                    "archive": {
                        "format": "json_array",
                        "group_by": ["this.lang"],
                        "value": "this.doc_id.string()",
                    }
                },
                {
                    "unarchive": {
                        "format": "json_array",
                        "field": "this.archived",
                        "out": "doc_id",
                    }
                },
            ]
        },
    }
    df = build_pipeline(spark, cfg).dataframe()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert df.count() == n_docs


def test_unknown_processor_raises(spark):
    cfg = {
        "input": {"table": {"name": "events", "sf_dir": SF}},
        "pipeline": {"processors": [{"frobnicate": {}}]},
    }
    with pytest.raises(PipelineConfigError, match="unknown processor"):
        build_pipeline(spark, cfg).dataframe()


# --- config unit-test runner (unit_testing.adoc:18-70 shape) ---


def test_runner_mapping_case(spark):
    case = {
        "name": "uppercase mapping",
        "target_processors": [
            {"mapping": "root.out = this.a.uppercase()\nroot.n = this.n + 1"}
        ],
        "input_batch": [
            {"json_content": {"a": "hello", "n": 1}},
            {"json_content": {"a": "world", "n": 2}},
        ],
        "output_batch": [
            {"json_equals": {"out": "HELLO", "n": 2}},
            {"json_equals": {"out": "WORLD", "n": 3}},
        ],
    }
    res = run_case(spark, case)
    assert res.ok, res.failures


def test_runner_metadata_case(spark):
    case = {
        "name": "meta propagation",
        "target_processors": [
            {"mutation": 'meta source = "unit"\nroot.b = this.a * 2'}
        ],
        "input_batch": [
            {"json_content": {"a": 21}, "metadata": {"orig": "x"}}
        ],
        "output_batch": [
            {
                "json_contains": {"b": 42},
                "metadata_equals": {"orig": "x", "source": "unit"},
            }
        ],
    }
    res = run_case(spark, case)
    assert res.ok, res.failures


def test_runner_detects_failure(spark):
    case = {
        "name": "should fail",
        "target_processors": [{"mapping": "root.out = this.a"}],
        "input_batch": [{"json_content": {"a": 1}}],
        "output_batch": [{"json_equals": {"out": 2}}],
    }
    res = run_case(spark, case)
    assert not res.ok


def test_runner_suite_with_filter(spark):
    suite = {
        "tests": [
            {
                "name": "filter drops",
                "target_processors": [{"filter": "this.v > 10"}],
                "input_batch": [
                    {"json_content": {"v": 5}},
                    {"json_content": {"v": 15}},
                ],
                "output_batch": [{"json_equals": {"v": 15}}],
            }
        ]
    }
    results = run_suite(spark, suite)
    assert all(r.ok for r in results), [r.failures for r in results]


def test_streaming_yaml_pipeline(spark):
    import uuid as _uuid

    cfg = {
        "input": {
            "generate_stream": {"rows_per_batch": 25, "max_rows": 50}
        },
        "pipeline": {
            "processors": [
                {"mutation": "root.double_n = this.n * 2"},
                {"filter": "this.n % 5 != 0"},
            ]
        },
    }
    p = build_pipeline(spark, cfg)
    name = "yp" + _uuid.uuid4().hex[:8]
    q = p.run_streaming_to_memory(name)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert len(rows) == 40  # 50 minus multiples of 5
    assert all(r["double_n"] == r["n"] * 2 for r in rows)


def test_broker_input_union(spark):
    cfg = {
        "input": {"broker": {"inputs": [
            {"generate": {"count": 3, "mapping": 'root.src = "a"\nroot.n = this._gen_index'}},
            {"generate": {"count": 2, "mapping": 'root.src = "b"\nroot.n = this._gen_index'}},
        ]}},
        "pipeline": {"processors": []},
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert len(rows) == 5
    assert {r["src"] for r in rows} == {"a", "b"}


def test_read_until_input(spark):
    cfg = {
        "input": {"read_until": {
            "input": {"generate": {"count": 10, "mapping": "root.n = this._gen_index"}},
            "order_by": "this.n",
            "check": "this.n == 6",
            "include_last": False,
        }},
        "pipeline": {"processors": []},
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert sorted(r["n"] for r in rows) == [0, 1, 2, 3, 4, 5]

    cfg["input"]["read_until"]["include_last"] = True
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert sorted(r["n"] for r in rows) == [0, 1, 2, 3, 4, 5, 6]

    # no match → everything passes
    cfg["input"]["read_until"]["check"] = "this.n == 999"
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert len(rows) == 10


def test_crash_processor_conditional(spark):
    import pytest

    from connect_spark.plans import build_pipeline

    base = {
        "input": {"generate": {"count": 5, "mapping": "root.n = counter()"}},
    }
    ok = dict(base, pipeline={"processors": [
        {"crash": {"when": "this.n > 100", "message": "too big"}}
    ]})
    rows = build_pipeline(spark, ok).dataframe().collect()
    assert len(rows) == 5  # condition never fires -> passthrough

    boom = dict(base, pipeline={"processors": [
        {"crash": {"when": "this.n > 3", "message": "deliberate abort"}}
    ]})
    with pytest.raises(Exception, match="deliberate abort"):
        build_pipeline(spark, boom).dataframe().collect()


def test_resource_processor_lookup(spark):
    from connect_spark.plans import build_pipeline

    cfg = {
        "processor_resources": [
            {"label": "double_it", "mutation": "root.n = this.n * 2"},
        ],
        "input": {"generate": {"count": 3, "mapping": "root.n = counter()"}},
        "pipeline": {"processors": [
            {"resource": "double_it"},
            {"resource": "double_it"},
        ]},
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert sorted(r.n for r in rows) == [0, 4, 8]


def test_cdc_wal_yaml_input(spark, tmp_path):
    """The streaming CDC source is reachable from plain YAML configs."""
    import json

    from connect_spark.plans import build_pipeline
    from connect_spark.sources.cdc_stream import CdcWal

    wal = CdcWal(str(tmp_path / "wal"))
    wal.append(
        [
            {"op": "insert", "after": {"id": 1, "v": "a"}},
            {"op": "delete", "before": {"id": 1, "v": "a"}},
            {"op": "insert", "after": {"id": 2, "v": "b"}},
        ]
    )
    cfg = {
        "input": {"cdc_wal": {"path": str(tmp_path / "wal")}},
        "pipeline": {"processors": []},
    }
    import uuid

    name = "cdcy" + uuid.uuid4().hex[:8]
    q = build_pipeline(spark, cfg).run_streaming_to_memory(name)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert [r.lsn for r in rows] == [1, 2, 3]
    assert [r.operation for r in rows] == ["insert", "delete", "insert"]
    assert json.loads(rows[2].after) == {"id": 2, "v": "b"}


def test_mq_bus_yaml_input(spark, tmp_path):
    from connect_spark.plans import build_pipeline
    from connect_spark.sources.mq import MessageBus

    bus = MessageBus(str(tmp_path / "bus"))
    bus.publish("orders.us", [{"n": 1}])
    bus.publish("billing.us", [{"n": 2}])
    cfg = {
        "input": {
            "mq_bus": {
                "path": str(tmp_path / "bus"),
                "subject": "orders.>",
                "streaming": False,
            }
        },
        "pipeline": {"processors": []},
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert len(rows) == 1 and rows[0].table == "orders.us"


def test_mq_bus_yaml_output_roundtrip(spark, tmp_path):
    """Pipeline publishes to the bus, a second pipeline consumes —
    the queue sink + source pair."""
    import json

    from connect_spark.plans import build_pipeline

    produce = {
        "input": {"generate": {"count": 4, "mapping": "root.n = counter()"}},
        "pipeline": {"processors": [
            {"mutation": 'root.subject = if this.n % 2 == 0 { "even.n" } else { "odd.n" }'}
        ]},
        "output": {"mq_bus": {"path": str(tmp_path / "bus"),
                              "subject_column": "subject"}},
    }
    build_pipeline(spark, produce).run()

    consume = {
        "input": {"mq_bus": {"path": str(tmp_path / "bus"),
                             "subject": "even.>", "streaming": False}},
        "pipeline": {"processors": []},
    }
    rows = build_pipeline(spark, consume).dataframe().collect()
    ns = sorted(json.loads(r.after)["n"] for r in rows)
    assert ns == [0, 2]
    assert all(r.table == "even.n" for r in rows)


def test_subprocess_input_and_drop_reject_outputs(spark):
    import pytest

    from connect_spark.plans import build_pipeline
    from connect_spark.plans.pipeline import PipelineConfigError

    cfg = {
        "input": {"subprocess": {"name": "printf", "args": ["a\\nb\\nc"]}},
        "pipeline": {"processors": [{"filter": 'this.content != "b"'}]},
        "output": {"drop": {}},
    }
    p = build_pipeline(spark, cfg)
    assert sorted(r.content for r in p.dataframe().collect()) == ["a", "c"]
    assert p.run() is None  # drop sink executes and discards

    ok = dict(cfg, output={"reject": {}},
              pipeline={"processors": [{"filter": "false"}]})
    assert build_pipeline(spark, ok).run() is None  # empty -> fine

    boom = dict(cfg, output={"reject": {}})
    with pytest.raises(PipelineConfigError, match="reject output received"):
        build_pipeline(spark, boom).run()


def test_mq_bus_output_publishes_per_partition(spark, tmp_path):
    """The mq_bus sink must not collect to the driver: publishing
    happens per executor partition, and concurrent partition appends
    (lock-serialized WAL segments) must preserve every message with
    unique LSNs."""
    import json

    from connect_spark.sources.mq import MessageBus

    df = spark.range(0, 200, 1, 8).selectExpr(
        "concat('shard.', cast(id % 4 as string)) as subject",
        "id as n",
    )
    from connect_spark.plans.pipeline import _run_output

    _run_output(
        df,
        {"mq_bus": {"path": str(tmp_path / "bus"),
                    "subject_column": "subject"}},
    )
    bus = MessageBus(str(tmp_path / "bus"))
    rows = bus.subscribe(spark, "shard.>", streaming=False).collect()
    assert len(rows) == 200
    lsns = sorted(r.lsn for r in rows)
    assert lsns == list(range(1, 201))  # unique, gap-free LSNs
    ns = sorted(json.loads(r.after)["n"] for r in rows)
    assert ns == list(range(200))
    # several distinct WAL segments prove per-partition appends
    import os

    segs = [f for f in os.listdir(tmp_path / "bus") if f.startswith("wal-")]
    assert len(segs) >= 2


def test_mapping_dynamic_fallback(spark):
    """A whole-document `root = <expr>` mapping (not Column-
    compilable) falls back to the dynamic evaluator, emitting the
    schemaless content envelope. On a RAW content frame `this` is the
    PARSED MESSAGE — reference semantics (bloblang/about.adoc: `this`
    is the structured document), not a {content: ...} column wrapper
    (r15: the d6fd1df envelope-defect class, fixed on this path)."""
    import json

    from connect_spark.plans import build_pipeline

    cfg = {
        "input": {"generate": {"count": 2, "mapping":
            'root.content = "{\\"v\\": " + counter().string() + "}"'}},
        "pipeline": {"processors": [
            # `this` == the parsed message {"v": N}
            {"mapping": "root = this.merge({})"},
        ]},
    }
    df = build_pipeline(spark, cfg).dataframe()
    # r15 contract: the dynamic path is a full message model — the
    # envelope carries metadata / error / arrival-order columns
    assert df.columns[0] == "content"
    assert {"_meta", "_error", "_arrival_order"} <= set(df.columns)
    vals = sorted(json.loads(r.content)["v"] for r in df.collect())
    assert vals == [0, 1]


def test_mapping_dynamic_fallback_structured(spark):
    """Structured frames serialize whole as `this` on the fallback."""
    import json

    from connect_spark.plans import build_pipeline

    cfg = {
        "input": {"generate": {"count": 2, "mapping":
            "root.v = counter()"}},
        "pipeline": {"processors": [
            {"mapping": "root = this.v * 10"},
        ]},
    }
    df = build_pipeline(spark, cfg).dataframe()
    assert df.columns[0] == "content"
    vals = sorted(json.loads(r.content) for r in df.collect())
    assert vals == [0, 10]


def test_mapping_syntax_error_still_raises(spark):
    import pytest

    from connect_spark.plans import build_pipeline

    cfg = {
        "input": {"generate": {"count": 1, "mapping": "root.n = 1"}},
        "pipeline": {"processors": [{"mapping": "root = = broken ("}]},
    }
    # syntax errors surface as Bloblang errors (ValueError family),
    # never silently fall back
    with pytest.raises(ValueError, match="unexpected|Bloblang|token"):
        build_pipeline(spark, cfg).dataframe()


def test_mutation_dynamic_fallback(spark):
    import json

    from connect_spark.plans import build_pipeline

    cfg = {
        "input": {"generate": {"count": 1, "mapping":
            "root.a = 1\nroot.b = 2\nroot.c = 3"}},
        "pipeline": {"processors": [
            # whole-document reshape: not Column-compilable
            {"mutation": "root = this.keys()"},
        ]},
    }
    df = build_pipeline(spark, cfg).dataframe()
    assert df.columns[0] == "content"
    assert sorted(json.loads(df.collect()[0].content)) == ["a", "b", "c"]


def test_dynamic_evaluator_method_set():
    from connect_spark.bloblang.pyeval import eval_mapping_value

    cases = [
        ('root = this.with("a")', {"a": 1, "b": 2}, {"a": 1}),
        ('root = this.without("a")', {"a": 1, "b": 2}, {"b": 2}),
        ('root = this.merge({"c": 3})', {"a": 1}, {"a": 1, "c": 3}),
        ("root = this.flatten()", [[1, 2], [3]], [1, 2, 3]),
        ("root = this.unique()", [1, 2, 1], [1, 2]),
        ("root = this.sort()", [3, 1, 2], [1, 2, 3]),
        ("root = this.reverse()", "abc", "cba"),
        ("root = this.enumerated()", ["x"], [{"index": 0, "value": "x"}]),
        ('root = this.get("a.b")', {"a": {"b": 7}}, 7),
        ('root = this.exists("a.z")', {"a": {"b": 7}}, False),
        ("root = this.type()", [1], "array"),
        ("root = this.abs()", -4, 4),
        ("root = this.floor()", 2.8, 2),
        ("root = this.max()", [3, 9, 1], 9),
        ("root = this.capitalize()", "hello", "Hello"),
        ('root = this.trim_prefix("ab")', "abcd", "cd"),
        ('root = this.index_of("c")', "abc", 2),
        ('root = this.re_replace_all("[0-9]+", "N")', "a1b22", "aNbN"),
        ('root = this.re_find_all("[a-z]+")', "a1b", ["a", "b"]),
        ('root = this.quote()', 'say "hi"', '"say \\"hi\\""'),
    ]
    for src, doc, want in cases:
        assert eval_mapping_value(src, doc) == want, src


def test_fallback_rejects_unknown_methods(spark):
    import pytest

    from connect_spark.plans import build_pipeline

    cfg = {
        "input": {"generate": {"count": 1, "mapping": "root.y = \"x\""}},
        "pipeline": {"processors": [
            {"mapping": "root = this.y.upperrcase()"},
        ]},
    }
    with pytest.raises(ValueError, match="upperrcase"):
        build_pipeline(spark, cfg).dataframe()


def test_pyeval_round_and_trim_suffix():
    from connect_spark.bloblang.pyeval import eval_mapping_value

    assert eval_mapping_value("root = this.round()", 2.5) == 3
    assert eval_mapping_value("root = this.round()", -2.5) == -3
    assert eval_mapping_value('root = this.trim_suffix("")', "abc") == "abc"


def test_pyeval_function_subset():
    from connect_spark.bloblang.pyeval import (
        eval_mapping_value,
        unsupported_methods,
    )

    assert eval_mapping_value('root = json("a.b")', {"a": {"b": 5}}) == 5
    assert eval_mapping_value("root = range(3)", {}) == [0, 1, 2]
    assert eval_mapping_value("root = range(1, 7, 2)", {}) == [1, 3, 5]
    assert abs(eval_mapping_value("root = pi()", {}) - 3.14159) < 1e-4
    v4 = eval_mapping_value("root = uuid_v4()", {})
    assert len(v4) == 36 and v4.count("-") == 4
    assert len(eval_mapping_value("root = ksuid()", {})) == 27
    assert len(eval_mapping_value("root = nanoid()", {})) == 21
    c1 = eval_mapping_value('root = counter("t_pyeval")', {})
    c2 = eval_mapping_value('root = counter("t_pyeval")', {})
    assert c2 == c1 + 1
    # the fallback gate flags unknown functions too (snowflake_id
    # was the example here until round 11 implemented it for real)
    assert unsupported_methods("root = totally_unknown_fn()") == {
        "totally_unknown_fn()"}
    assert unsupported_methods("root = snowflake_id()") == set()


def test_pyeval_catch_and_meta_gate():
    from connect_spark.bloblang.pyeval import (
        eval_mapping_value,
        unsupported_methods,
    )

    assert eval_mapping_value(
        'root = this.x.number().catch(-1)', {"x": "abc"}) == -1
    assert eval_mapping_value(
        'root = this.x.number().catch(-1)', {"x": "4"}) == 4
    # r15: meta assignments are SUPPORTED by the dynamic evaluator
    # (eval_batch's message model) — the gate no longer flags them
    gates = unsupported_methods('meta out = "t"\nroot.a = 1')
    assert not gates
    # a genuinely-unknown method still gates the fallback
    gates = unsupported_methods("root = this.definitely_not_a_method()")
    assert gates


def test_pyeval_catch_lambda_and_random_seed():
    from connect_spark.bloblang.pyeval import eval_mapping_value

    got = eval_mapping_value(
        "root = this.x.number().catch(e -> e)", {"x": "abc"})
    assert isinstance(got, str) and got  # the error message binds
    a = eval_mapping_value("root = random_int(42)", {})
    b = eval_mapping_value("root = random_int(42)", {})
    assert a == b  # seeded → deterministic
