"""Bloblang→Column compiler tests: mapping semantics, expression
algebra, methods, deleted() filtering, meta assignment, let-vars.
Mirrors the reference's bloblang test style (config/test/bloblang/)
as in-Python golden I/O."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from connect_spark.bloblang import BloblangError, compile_mapping
from connect_spark.bloblang.compiler import compile_expression


def _df(spark, rows):
    return spark.createDataFrame(rows)


def run_mapping(spark, rows, src, mode="mapping"):
    out = compile_mapping(_df(spark, rows), src, mode=mode)
    return [r.asDict() for r in out.collect()]


def test_basic_projection(spark):
    rows = [Row(a=1, b=2.5, name="abc")]
    got = run_mapping(
        spark,
        rows,
        """
        root.total = this.a + this.b * 2
        root.upper_name = this.name.uppercase()
        """,
    )
    assert got == [{"total": 6.0, "upper_name": "ABC"}]


def test_bare_field_refs_equal_this(spark):
    rows = [Row(x=3)]
    got = run_mapping(spark, rows, "root.y = x * x")
    assert got == [{"y": 9}]


def test_if_else_and_match(spark):
    rows = [Row(v=5.0), Row(v=25.0), Row(v=50.0)]
    got = run_mapping(
        spark,
        rows,
        """
        root.bucket = if this.v < 10 { "low" } else if this.v < 30 { "mid" } else { "high" }
        root.kind = match this.bucket {
          "low" => "small",
          "mid" => "medium",
          _ => "big"
        }
        """,
    )
    assert [g["kind"] for g in got] == ["small", "medium", "big"]


def test_deleted_filters_rows(spark):
    rows = [Row(v=1), Row(v=10), Row(v=3)]
    got = run_mapping(
        spark,
        rows,
        """
        root = if this.v > 5 { deleted() }
        root.v2 = this.v * 2
        """,
    )
    assert sorted(g["v2"] for g in got) == [2, 6]


def test_mutation_keeps_columns(spark):
    rows = [Row(a=1, b="x")]
    got = run_mapping(spark, rows, "root.c = this.a + 1", mode="mutation")
    assert got == [{"a": 1, "b": "x", "c": 2}]


def test_let_variables(spark):
    rows = [Row(p=100.0, d=0.2)]
    got = run_mapping(
        spark,
        rows,
        """
        let net = this.p * (1 - this.d)
        root.net = $net
        root.gross = $net * 1.1
        """,
    )
    assert got[0]["net"] == pytest.approx(80.0)
    assert got[0]["gross"] == pytest.approx(88.0)


def test_meta_assignment(spark):
    rows = [Row(a=7)]
    got = run_mapping(
        spark,
        rows,
        """
        meta kind = "demo"
        root.a2 = this.a
        """,
    )
    assert got == [{"a2": 7, "_meta": {"kind": "demo"}}]


def test_string_methods(spark):
    rows = [Row(s="  Hello World  ")]
    got = run_mapping(
        spark,
        rows,
        """
        root.t = this.s.trim()
        root.l = this.s.trim().lowercase()
        root.words = this.s.trim().split(" ").size()
        root.slug = this.s.trim().slug()
        root.has = this.s.contains("World")
        """,
    )
    assert got[0]["t"] == "Hello World"
    assert got[0]["l"] == "hello world"
    assert got[0]["words"] == 2
    assert got[0]["slug"] == "hello-world"
    assert got[0]["has"] is True


def test_array_lambda_methods(spark):
    rows = [Row(xs=[1, 2, 3, 4, 5])]
    got = run_mapping(
        spark,
        rows,
        """
        root.evens = this.xs.filter(x -> x % 2 == 0)
        root.doubled = this.xs.map_each(x -> x * 2)
        root.total = this.xs.sum()
        root.any_big = this.xs.any(x -> x > 4)
        root.first = this.xs.index(0)
        """,
    )
    assert got[0]["evens"] == [2, 4]
    assert got[0]["doubled"] == [2, 4, 6, 8, 10]
    assert got[0]["total"] == 15.0
    assert got[0]["any_big"] is True
    assert got[0]["first"] == 1


def test_hash_encode_parse_json(spark):
    rows = [Row(s="abc", j='{"k": 42}')]
    got = run_mapping(
        spark,
        rows,
        """
        root.h = this.s.hash("md5")
        root.b64 = this.s.encode("base64")
        root.k = this.j.json_path("$.k").number()
        """,
    )
    assert got[0]["h"] == "900150983cd24fb0d6963f7d28e17f72"
    assert got[0]["b64"] == "YWJj"
    assert got[0]["k"] == 42.0


def test_object_literal_and_struct_field(spark):
    rows = [Row(a=1)]
    got = run_mapping(
        spark,
        rows,
        """
        root.obj = { "x": this.a, "y": this.a + 1 }
        """,
    )
    assert got[0]["obj"].asDict() == {"x": 1, "y": 2}


def test_ts_methods(spark):
    rows = [Row(s="2024-03-05 06:07:08")]
    got = run_mapping(
        spark,
        rows,
        """
        root.t = this.s.ts_parse("yyyy-MM-dd HH:mm:ss").ts_format("yyyy/MM/dd")
        root.u = this.s.ts_parse("yyyy-MM-dd HH:mm:ss").ts_unix()
        """,
    )
    assert got[0]["t"] == "2024/03/05"
    assert got[0]["u"] == 1709618828


def test_unknown_method_raises(spark):
    rows = [Row(a=1)]
    with pytest.raises(BloblangError, match="unknown method"):
        run_mapping(spark, rows, "root.x = this.a.frobnicate()")


def test_expression_entry(spark):
    col = compile_expression('this.a * 2 + 1')
    df = spark.createDataFrame([Row(a=10)]).select(col.alias("out"))
    assert df.collect()[0]["out"] == 21


def test_coalesce_path_group(spark):
    rows = [Row(a=None, b="fallback"), Row(a="primary", b="x")]
    df = spark.createDataFrame(rows, "a string, b string")
    from connect_spark.bloblang import compile_mapping as cm

    out = cm(df, "root.v = this.(a | b)")
    assert sorted(r["v"] for r in out.collect()) == ["fallback", "primary"]


def test_nested_root_paths(spark):
    rows = [Row(x=1, y="s")]
    got = run_mapping(
        spark,
        rows,
        """
        root.doc.id = this.x
        root.doc.label = this.y.uppercase()
        root.doc.stats.double_x = this.x * 2
        root.flat = this.x + 10
        """,
    )
    doc = got[0]["doc"].asDict(recursive=True)
    assert doc == {"id": 1, "label": "S", "stats": {"double_x": 2}}
    assert got[0]["flat"] == 11


def test_interpolation_strings(spark):
    from connect_spark.bloblang.compiler import compile_interpolation

    df = spark.createDataFrame([Row(topic="orders", n=7)])
    col = compile_interpolation("out-${! this.topic }-${! this.n * 2 }")
    assert df.select(col.alias("t")).first()["t"] == "out-orders-14"
    lit = compile_interpolation("plain-string")
    assert df.select(lit.alias("t")).first()["t"] == "plain-string"


def test_duration_uuid_url_methods(spark):
    rows = [Row(d="3h2m1s", s="a b&c", u="a%20b")]
    got = run_mapping(
        spark,
        rows,
        """
        root.ns = this.d.parse_duration()
        root.esc = this.s.escape_url_query()
        root.unesc = this.u.unescape_url_query()
        root.u5 = this.s.uuid_v5("dns")
        """,
    )
    assert got[0]["ns"] == 3 * 3600_000_000_000 + 2 * 60_000_000_000 + 1_000_000_000
    assert got[0]["esc"] == "a+b%26c"
    assert got[0]["unesc"] == "a b"
    import uuid

    assert got[0]["u5"] == str(uuid.uuid5(uuid.NAMESPACE_DNS, "a b&c"))


def test_uuid_v5_rfc4122_vectors(spark):
    """uuid_v5 must produce REAL RFC 4122/9562 name-based UUIDs
    (methods.adoc:3931,3937): pinned against CPython's uuid.uuid5 over
    every predefined namespace, an explicit namespace UUID, and the
    nil-UUID default."""
    import uuid

    rows = [Row(s="example"), Row(s="www.widgets.com"), Row(s="")]
    explicit = "77f836b7-9f61-46c0-851e-9b6ca3535e69"
    got = run_mapping(
        spark,
        rows,
        """
        root.dns = this.s.uuid_v5("dns")
        root.url = this.s.uuid_v5("url")
        root.oid = this.s.uuid_v5("oid")
        root.x500 = this.s.uuid_v5("x500")
        root.nil = this.s.uuid_v5()
        root.expl = this.s.uuid_v5("77f836b7-9f61-46c0-851e-9b6ca3535e69")
        """,
    )
    for row, r in zip(rows, got):
        assert r["dns"] == str(uuid.uuid5(uuid.NAMESPACE_DNS, row.s))
        assert r["url"] == str(uuid.uuid5(uuid.NAMESPACE_URL, row.s))
        assert r["oid"] == str(uuid.uuid5(uuid.NAMESPACE_OID, row.s))
        assert r["x500"] == str(uuid.uuid5(uuid.NAMESPACE_X500, row.s))
        assert r["nil"] == str(uuid.uuid5(uuid.UUID(int=0), row.s))
        assert r["expl"] == str(uuid.uuid5(uuid.UUID(explicit), row.s))


def test_parse_logfmt_quoted_values(spark):
    """parse_logfmt honors double-quoted values with spaces and
    escapes — the reference doc's own example (methods.adoc:3609-3613):
    level=info msg="hello world" dur=1.5s."""
    rows = [Row(l='level=info msg="hello world" dur=1.5s')]
    got = run_mapping(
        spark,
        rows,
        """
        root.level = this.l.parse_logfmt().get("level")
        root.msg = this.l.parse_logfmt().get("msg")
        root.dur = this.l.parse_logfmt().get("dur")
        """,
    )
    assert got[0]["level"] == "info"
    assert got[0]["msg"] == "hello world"
    assert got[0]["dur"] == "1.5s"

    rows2 = [Row(l=r'k="quoted \" value" path=/var/log x=""')]
    got2 = run_mapping(
        spark,
        rows2,
        """
        root.k = this.l.parse_logfmt().get("k")
        root.path = this.l.parse_logfmt().get("path")
        root.x = this.l.parse_logfmt().get("x")
        """,
    )
    assert got2[0]["k"] == 'quoted " value'
    assert got2[0]["path"] == "/var/log"
    assert got2[0]["x"] == ""


def test_with_without_struct_methods(spark):
    rows = [Row(obj=Row(a=1, b=2, c=3))]
    got = run_mapping(
        spark,
        rows,
        """
        root.only_ab = this.obj.with("a", "b")
        root.no_b = this.obj.without("b")
        """,
    )
    assert got[0]["only_ab"].asDict() == {"a": 1, "b": 2}
    assert got[0]["no_b"].asDict() == {"a": 1, "c": 3}


def test_string_concat_chains_without_literal_breaks(spark):
    """`a + " " + b + c` must stay concatenation end-to-end — the
    string-ish marker propagates through the chain (a bare Column +
    Column after a concat used to fall back to arithmetic)."""
    rows = [Row(a="x", b="y", c="z")]
    got = run_mapping(spark, rows, 'root.s = this.a + " " + this.b + this.c')
    assert got == [{"s": "x yz"}]
    got2 = run_mapping(
        spark, rows, 'root.s = "pre-" + this.a + this.b + "-post"'
    )
    assert got2 == [{"s": "pre-xy-post"}]


def test_bloblang_eval_method_dynamic_mapping(spark):
    """methods.adoc:3321 — the mapping source comes from a COLUMN, so
    each row may run a different mapping."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(payload='{"v": 3}', m="root.out = this.v * 2"),
            Row(payload='{"v": 5}', m="root.out = this.v + 100"),
            Row(payload='{"v": 7}', m='root.out = this.v.string()'),
        ]
    )
    out = compile_mapping(df, 'root.r = this.payload.bloblang(this.m)')
    rows = out.select("r").collect()
    assert [r.r for r in rows] == [
        '{"out": 6}',
        '{"out": 105}',
        '{"out": "7"}',
    ]


def test_bloblang_eval_method_bad_inputs(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(payload="not json", m='root.echo = this'),
            Row(payload='{"v": 1}', m="root.x = this.nope.deeper"),
            Row(payload='{"v": 1}', m=None),
        ]
    )
    out = compile_mapping(df, 'root.r = this.payload.bloblang(this.m)')
    rows = out.select("r").collect()
    # raw-string target passes through as `this`
    assert rows[0].r == '{"echo": "not json"}'
    # null-safe path access maps missing to null
    assert rows[1].r == '{"x": null}'
    # null mapping source -> null result
    assert rows[2].r is None


def test_bloblang_compile_cache_reuse():
    from connect_spark.bloblang.pyeval import (
        compile_cached,
        eval_mapping_value,
    )

    compile_cached.cache_clear()
    for _ in range(50):
        eval_mapping_value("root.a = this.x + 1", {"x": 1})
        eval_mapping_value("root.a = this.x + 2", {"x": 1})
    info = compile_cached.cache_info()
    assert info.misses == 2
    assert info.hits == 98


# --- named maps (about.adoc maps; .apply) ---------------------------

def test_named_map_apply_on_struct(spark):
    from connect_spark.bloblang.compiler import compile_mapping
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 60.0, 0.5), (2, 100.0, 0.0)], ["id", "price", "discount"]
    ).select("id", F.struct("price", "discount").alias("item"))
    src = """
map net {
  root = this.price * (1 - this.discount)
}
root.id = this.id
root.net = this.item.apply("net")
"""
    out = {r["id"]: r["net"] for r in compile_mapping(df, src).collect()}
    assert out == {1: 30.0, 2: 100.0}


def test_named_map_multi_field_and_hoisting(spark):
    from connect_spark.bloblang.compiler import compile_mapping
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3, 4)], ["w", "h"]).select(
        F.struct("w", "h").alias("rect")
    )
    # map used BEFORE its definition: hoisted
    src = """
root.geom = this.rect.apply("geom")
map geom {
  let a = this.w * this.h
  root.area = $a
  root.perimeter = 2 * (this.w + this.h)
}
"""
    row = compile_mapping(df, src).collect()[0]["geom"]
    assert row["area"] == 12 and row["perimeter"] == 14


def test_named_map_errors(spark):
    import pytest
    from connect_spark.bloblang.compiler import BloblangError, compile_mapping
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,)], ["x"]).select(
        F.struct("x").alias("s")
    )
    with pytest.raises(BloblangError, match="unknown map"):
        compile_mapping(df, 'root.y = this.s.apply("nope")')
    rec = """
map a { root = this.apply("b") }
map b { root = this.apply("a") }
root.y = this.s.apply("a")
"""
    with pytest.raises(BloblangError, match="recursive"):
        compile_mapping(df, rec)


def test_named_map_pyeval_recursion():
    from connect_spark.bloblang.pyeval import eval_mapping_value

    # data-depth recursion is allowed in the dynamic evaluator
    src = """
map sum_tree {
  root = if this.kids.length() == 0 { this.v } else {
    this.v + this.kids.map_each(k -> k.apply("sum_tree")).sum()
  }
}
root = this.apply("sum_tree")
"""
    tree = {"v": 1, "kids": [{"v": 2, "kids": []}, {"v": 3, "kids": [{"v": 4, "kids": []}]}]}
    assert eval_mapping_value(src, tree) == 10


def test_hash_algorithm_matrix(spark):
    """hash() per methods.adoc: docs' own example values pinned."""
    from connect_spark.bloblang.compiler import compile_mapping

    df = spark.createDataFrame([("hello world",)], ["value"])
    src = """
root.h1 = this.value.hash("sha1")
root.h2 = this.value.hash("hmac_sha1", "static-key")
root.c1 = this.value.hash("crc32", "", "Castagnoli")
root.c2 = this.value.hash("crc32", "", "Koopman")
root.f = this.value.hash("fnv32")
root.s3 = this.value.hash("sha3_256")
"""
    row = compile_mapping(df, src).collect()[0]
    # methods.adoc:3920-3934 example outputs
    assert row["h1"] == "2aae6c35c94fcfb415dbe95f408b9ce91ee846ed"
    assert row["h2"] == "d87e5f068fa08fe90bb95bc7c8344cb809179d76"
    assert row["c1"] == "c99465aa"
    assert row["c2"] == "df373d3c"
    # FNV-1a("hello world") well-known value
    assert row["f"] == "d58b3fa7"
    import hashlib
    assert row["s3"] == hashlib.sha3_256(b"hello world").hexdigest()
