"""The 11 Bloblang functions closed in round 15 (r14 verdict "What's
missing" #1; functions.adoc:33,446,463,523-583,733,759,919,962 +
uuid_v7 at :423): Column-compiler behavior, dynamic-evaluator (pyeval)
behavior, and COMPILER↔PYEVAL PARITY for the deterministic subset.
"""

from __future__ import annotations

import re

import pytest

from connect_spark.bloblang.pyeval import eval_mapping_value
from connect_spark.plans.pipeline import apply_processor


# ---------- pure pyeval (no Spark) ----------


def test_bytes_pyeval():
    assert eval_mapping_value("root.b = bytes(5)", {}) == {
        "b": b"\x00\x00\x00\x00\x00"}
    assert eval_mapping_value("root.b = bytes(0)", {}) == {"b": b""}


def test_count_pyeval_named_counters():
    out1 = eval_mapping_value('root.a = count("r15a")', {})
    out2 = eval_mapping_value('root.a = count("r15a")', {})
    other = eval_mapping_value('root.a = count("r15b")', {})
    assert out1["a"] == 1 and out2["a"] == 2 and other["a"] == 1


UUID7_RE = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}"
    r"-[0-9a-f]{12}$"
)


def test_uuid_v7_pyeval_format_and_ordering():
    a = eval_mapping_value("root.u = uuid_v7()", {})["u"]
    assert UUID7_RE.match(a)
    # custom timestamp pins the 48-bit millisecond prefix
    b = eval_mapping_value(
        'root.u = uuid_v7("2021-08-07T10:00:00Z")', {})["u"]
    ms = int(b.replace("-", "")[:12], 16)
    assert ms == 1628330400000
    # time-ordered: an earlier timestamp sorts before a later one
    c = eval_mapping_value(
        'root.u = uuid_v7("2031-01-01T00:00:00Z")', {})["u"]
    assert b < c


def test_batch_fns_pyeval_single_message_defaults():
    out = eval_mapping_value(
        "root.i = batch_index()\nroot.n = batch_size()", {})
    assert out == {"i": 0, "n": 1}


def test_error_source_fns_pyeval_null():
    out = eval_mapping_value(
        "root.a = error_source_label()\n"
        "root.b = error_source_name()\n"
        "root.c = error_source_path()", {})
    assert out == {"a": None, "b": None, "c": None}


def test_file_and_file_rel_pyeval(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text('{"k": 7}')
    out = eval_mapping_value(
        f'root.v = file("{p}").parse_json()', {})
    assert out == {"v": {"k": 7}}
    # no_cache named arg re-reads
    p.write_text('{"k": 8}')
    out = eval_mapping_value(
        f'root.v = file(path: "{p}", no_cache: true).parse_json()', {})
    assert out == {"v": {"k": 8}}


def test_root_meta_pyeval_scope():
    # the value evaluator exposes root_meta through scope context;
    # without one it degrades to null (no metadata model)
    assert eval_mapping_value('root.m = root_meta("k")', {}) == {
        "m": None}


def test_content_pyeval_structured_vs_envelope():
    # r14 "What's wrong" #1: structured docs serialize whole
    assert eval_mapping_value("root.x = content()", {"a": 1}) == {
        "x": '{"a":1}'}
    assert eval_mapping_value(
        "root.x = content()", {"content": "raw"}) == {"x": "raw"}
    assert eval_mapping_value("root.x = content()", "plain") == {
        "x": "plain"}


# ---------- Column compiler (Spark) ----------


@pytest.fixture(scope="module")
def four_rows(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id INT, tag STRING")
    return df.withColumn("_arrival_order", F.col("id"))


def test_batch_fns_whole_frame_batch(spark, four_rows):
    out = apply_processor(four_rows, {"mapping": (
        "root.id = this.id\n"
        "root.i = batch_index()\nroot.n = batch_size()")})
    rows = {r.id: (r.i, r.n) for r in out.collect()}
    assert rows == {1: (0, 4), 2: (1, 4), 3: (2, 4), 4: (3, 4)}


def test_batch_fns_grouped_batch(spark, four_rows):
    from pyspark.sql import functions as F

    grouped = four_rows.withColumn("group_key", F.col("id") % 2)
    out = apply_processor(grouped, {"mapping": (
        "root.id = this.id\n"
        "root.i = batch_index()\nroot.n = batch_size()")})
    rows = {r.id: (r.i, r.n) for r in out.collect()}
    assert rows == {1: (0, 2), 3: (1, 2), 2: (0, 2), 4: (1, 2)}


def test_batch_index_deleted_reduce(spark, four_rows):
    """The system_window reduce idiom: batch aggregates see the WHOLE
    batch even though deleted() filters to one row per batch."""
    from pyspark.sql import functions as F

    grouped = four_rows.withColumn("group_key", F.col("id") % 2)
    out = apply_processor(grouped, {"mapping": """
root = if batch_index() == 0 {
  { "g": this.group_key,
    "n_tags": json("tag").from_all().unique().length(),
    "total": json("id").from_all().sum() }
} else { deleted() }
"""})
    rows = {r.g: (r.n_tags, r.total) for r in out.collect()}
    assert rows == {0: (2, 6.0), 1: (2, 4.0)}


def test_from_index_method(spark, four_rows):
    out = apply_processor(four_rows, {"mapping": (
        'root.id = this.id\nroot.first_tag = json("tag").from(0)')})
    assert {r.first_tag for r in out.collect()} == {"a"}


def test_count_vs_counter_compiler(spark, four_rows):
    out = apply_processor(four_rows, {"mapping": (
        'root.id = this.id\nroot.seq = count("t15")')})
    rows = {r.id: r.seq for r in out.collect()}
    # count() is 1-based in arrival order (counter() is 0-based)
    assert rows == {1: 1, 2: 2, 3: 3, 4: 4}


def test_uuid_v7_compiler_format(spark, four_rows):
    out = apply_processor(four_rows, {"mapping": "root.u = uuid_v7()"})
    vals = [r.u for r in out.collect()]
    assert all(UUID7_RE.match(v) for v in vals)
    assert len(set(vals)) == len(vals)  # random bits differ per row


def test_bytes_compiler_column_length(spark, four_rows):
    out = apply_processor(four_rows, {"mapping": (
        "root.b = bytes(3)\nroot.bn = bytes(this.id).length()")})
    rows = out.collect()
    assert all(r.b == b"\x00\x00\x00" for r in rows)
    assert sorted(r.bn for r in rows) == [1, 2, 3, 4]


def test_root_meta_compiler(spark, four_rows):
    out = apply_processor(four_rows, {"mapping": (
        'meta k1 = "v1"\n'
        'root.m = root_meta("k1")\n'
        'root.missing = root_meta("nope")')})
    r = out.collect()[0]
    assert r.m == "v1" and r.missing is None


def test_file_rel_compiler(spark, four_rows, tmp_path):
    from connect_spark.bloblang.compiler import compile_mapping

    (tmp_path / "data.txt").write_text("rel-data")
    out = compile_mapping(
        four_rows, 'root.v = file_rel("data.txt")',
        mapping_dir=str(tmp_path))
    assert out.collect()[0].v == "rel-data"


def test_error_fns_compiler_no_error_col(spark, four_rows):
    out = apply_processor(four_rows, {"mapping": (
        "root.e = error()\nroot.ed = errored()\n"
        "root.l = error_source_label()")})
    r = out.collect()[0]
    assert r.e is None and r.ed is False and r.l is None


def test_named_args_compiler(spark, four_rows):
    out = apply_processor(four_rows, {"mapping": (
        "root.r = range(start: 0, stop: 6, step: 2)")})
    assert out.collect()[0].r == [0, 2, 4]


# ---------- compiler ↔ pyeval parity (deterministic subset) ----------


PARITY_MAPPINGS = [
    "root.a = bytes(4)",
    "root.a = bytes(4).length()",
    "root.a = batch_index()\nroot.b = batch_size()",
    "root.a = error()\nroot.b = errored()",
    ("root.a = error_source_label()\nroot.b = error_source_name()\n"
     "root.c = error_source_path()"),
    "root.a = range(start: 1, stop: 9, step: 3)",
]


@pytest.mark.parametrize("src", PARITY_MAPPINGS)
def test_compiler_pyeval_parity_single_row(spark, src):
    """On a ONE-ROW frame (a single-message batch), the Column
    compiler and the dynamic evaluator must agree — the same contract
    the inline tool chain relies on."""
    df = spark.createDataFrame([("x",)], "tag STRING")
    got = apply_processor(df, {"mapping": src}).collect()[0].asDict()
    got.pop("_meta", None)
    expected = eval_mapping_value(src, {"tag": "x"})
    for k, v in expected.items():
        g = got[k]
        if isinstance(g, bytearray):
            g = bytes(g)
        if isinstance(v, list):
            g = list(g)
        assert g == v, (k, g, v)


def test_uuid7_parity_shape(spark):
    df = spark.createDataFrame([("x",)], "tag STRING")
    g = apply_processor(
        df, {"mapping": "root.u = uuid_v7()"}).collect()[0].u
    p = eval_mapping_value("root.u = uuid_v7()", {})["u"]
    assert UUID7_RE.match(g) and UUID7_RE.match(p)
