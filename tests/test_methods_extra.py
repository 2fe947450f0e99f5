"""Round-3 method batch: trig/bitwise/sized ints, replace family, html
and url-path escapes, map helpers, array search/sort_by, timestamp
aliases + ISO-8601 / strftime, jwt method family, forms and yaml."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from connect_spark.bloblang.compiler import compile_mapping


def _one(spark, src, data=None, cols=None):
    df = spark.createDataFrame(data or [(1,)], cols or ["x"])
    return compile_mapping(df, src).collect()[0]


def test_trig_bitwise_ints(spark):
    row = _one(spark, """
root.c = (0.0).cos()
root.band = (12).bitwise_and(10)
root.bor = (12).bitwise_or(3)
root.bxor = (12).bitwise_xor(10)
root.u8 = (300).uint8()
root.i8 = (127).int8()
root.f32 = (1.5).float32()
""")
    assert row["c"] == 1.0 and row["band"] == 8 and row["bor"] == 15
    assert row["bxor"] == 6 and row["u8"] == 44 and row["i8"] == 127
    assert row["f32"] == 1.5


def test_replace_family_and_escapes(spark):
    row = _one(spark, '''
root.r = "a-b-c".replace("-", "+")
root.m = "a-b_c".replace_many(["-", "+", "_", "="])
root.eh = "<a href='x'>& more</a>".escape_html()
root.uh = "&lt;p&gt;&amp;".unescape_html()
root.ep = "a b/c?d".escape_url_path()
root.up = "a%20b/c".unescape_url_path()
''')
    assert row["r"] == "a+b+c"
    assert row["m"] == "a+b=c"
    assert row["eh"] == "&lt;a href=&#39;x&#39;&gt;&amp; more&lt;/a&gt;"
    assert row["uh"] == "<p>&"
    assert row["ep"] == "a%20b/c%3Fd"
    assert row["up"] == "a b/c"


def test_map_helpers(spark):
    df = spark.createDataFrame([(1,)], ["x"]).select(
        "x",
        F.create_map(F.lit("a"), F.lit("1"), F.lit("b"), F.lit("2")).alias("m"),
        F.create_map(F.lit("b"), F.lit("9"), F.lit("c"), F.lit("3")).alias("m2"),
    )
    src = """
root.ex = this.m.exists("a")
root.nex = this.m.exists("z")
root.kv = this.m.key_values()
root.up = this.m.map_each_key(k -> k.uppercase())
root.mg = this.m.merge(this.m2)
"""
    row = compile_mapping(df, src).collect()[0]
    assert row["ex"] is True and row["nex"] is False
    assert sorted((e["key"], e["value"]) for e in row["kv"]) == [
        ("a", "1"), ("b", "2")
    ]
    assert dict(row["up"]) == {"A": "1", "B": "2"}
    merged = dict(row["mg"])
    assert merged["b"] == "9" and merged["a"] == "1" and merged["c"] == "3"


def test_squash(spark):
    df = spark.createDataFrame([(1,)], ["x"]).select(
        F.array(
            F.create_map(F.lit("a"), F.lit("1")),
            F.create_map(F.lit("a"), F.lit("7"), F.lit("b"), F.lit("2")),
        ).alias("arr")
    )
    row = compile_mapping(df, "root.s = this.arr.squash()").collect()[0]
    assert dict(row["s"]) == {"a": "7", "b": "2"}  # later wins


def test_array_search_and_sort_by(spark):
    row = _one(spark, """
root.f = [3, 5, 7, 5].find(5)
root.nf = [3].find(9)
root.fa = [3, 5, 7, 5].find_all(5)
root.fb = [3, 5, 7].find_by(v -> v > 4)
root.fab = [3, 5, 7].find_all_by(v -> v > 4)
root.sb = ["bbb", "a", "cc"].sort_by(s -> s.length())
""")
    assert row["f"] == 1 and row["nf"] == -1
    assert row["fa"] == [1, 3]
    assert row["fb"] == 5 and row["fab"] == [5, 7]
    assert row["sb"] == ["a", "cc", "bbb"]


def test_not_empty(spark):
    assert _one(spark, 'root.v = "x".not_empty()')["v"] == "x"
    with pytest.raises(Exception, match="not_empty"):
        _one(spark, 'root.v = "".not_empty()')


def test_timestamp_aliases_and_extensions(spark):
    df = spark.createDataFrame([("2024-03-01 12:30:45",)], ["t"])
    src = """
root.nano = this.t.ts_parse("yyyy-MM-dd HH:mm:ss").ts_unix_nano()
root.tz = this.t.ts_parse("yyyy-MM-dd HH:mm:ss").ts_tz("America/New_York").string()
root.plus = this.t.ts_parse("yyyy-MM-dd HH:mm:ss").ts_add_iso8601("PT2H30M").string()
root.minus = this.t.ts_parse("yyyy-MM-dd HH:mm:ss").ts_sub_iso8601("P1D").string()
root.sf = this.t.ts_parse("yyyy-MM-dd HH:mm:ss").ts_strftime("%Y/%m/%d %H:%M")
root.sp = "2024-03-01 07:00:00".ts_strptime("%Y-%m-%d %H:%M:%S").ts_unix()
"""
    row = compile_mapping(df, src).collect()[0]
    assert row["nano"] == 1709296245 * 1_000_000_000
    assert row["tz"].startswith("2024-03-01 07:30:45")
    assert row["plus"].startswith("2024-03-01 15:00:45")
    assert row["minus"].startswith("2024-02-29 12:30:45")
    assert row["sf"] == "2024/03/01 12:30"
    assert row["sp"] == 1709276400


def test_jwt_method_family(spark):
    df = spark.createDataFrame([('{"sub":"alice","n":7}',)], ["claims"])
    src = """
root.tok = this.claims.sign_jwt_hs384("top-secret")
"""
    tok = compile_mapping(df, src).collect()[0]["tok"]
    assert tok.count(".") == 2
    back = compile_mapping(
        spark.createDataFrame([(tok,)], ["tok"]),
        'root.claims = this.tok.parse_jwt_hs384("top-secret")',
    ).collect()[0]["claims"]
    assert json.loads(back) == {"sub": "alice", "n": 7}
    # wrong key -> null (error contract)
    bad = compile_mapping(
        spark.createDataFrame([(tok,)], ["tok"]),
        'root.claims = this.tok.parse_jwt_hs384("wrong")',
    ).collect()[0]["claims"]
    assert bad is None


def test_parse_form_and_format_yaml(spark):
    row = _one(spark, '''
root.form = "a=1&b=x%20y&a=2&empty=".parse_form_url_encoded()
root.yaml = "{\\"b\\": 2, \\"a\\": [1, 2]}".format_yaml()
''')
    assert json.loads(row["form"]) == {"a": ["1", "2"], "b": "x y", "empty": ""}
    assert row["yaml"] == "a:\n- 1\n- 2\nb: 2\n"


def test_codec_method_forms(spark):
    row = _one(spark, '''
root.rt = "hello hello hello".compress("snappy").decompress("snappy").string()
root.dur = "P1DT2H3M4.5S".parse_duration_iso8601()
root.neg = "-PT30S".parse_duration_iso8601()
root.arr = (5).array()
root.months = "P1M".parse_duration_iso8601()
root.weeks = "P2W".parse_duration_iso8601()
root.junk = "garbage".parse_duration_iso8601()
''')
    assert row["rt"] == "hello hello hello"
    assert row["dur"] == int((86400 + 7384.5) * 1e9)
    assert row["neg"] == -30 * 10**9
    assert row["arr"] == [5]
    # imprecise (months/weeks) and unparseable inputs are errors in the
    # reference -> NULL here, never a silent 0
    assert row["months"] is None
    assert row["weeks"] is None
    assert row["junk"] is None


def test_msgpack_method_forms(spark):
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    src = """
root.back = this.b.format_msgpack().parse_msgpack("b STRING")
"""
    # format_msgpack takes JSON strings; wrap the value
    df2 = df.select(F.to_json(F.struct("b")).alias("b"))
    row = compile_mapping(df2, src).collect()[0]
    assert row["back"]["b"] == "x"


def test_parse_parquet_method(spark):
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(pa.table({"k": [1, 2], "v": ["a", "b"]}), buf)
    df = spark.createDataFrame([(buf.getvalue(),)], "blob BINARY")
    row = compile_mapping(df, "root.rows = this.blob.parse_parquet()").collect()[0]
    assert [json.loads(r) for r in row["rows"]] == [
        {"k": 1, "v": "a"}, {"k": 2, "v": "b"},
    ]


def test_regex_object_methods(spark):
    row = _one(spark, '''
root.sm = "a=1 b=22".re_find_all_submatch("(\\\\w)=(\\\\d+)")
root.ob = "x=7".re_find_object("(?P<key>\\\\w+)=(?P<val>\\\\d+)")
''')
    assert row["sm"] == [["a=1", "a", "1"], ["b=22", "b", "22"]]
    assert row["ob"]["key"] == "x" and row["ob"]["val"] == "7"
    assert row["ob"]["0"] == "x=7"


def test_xml_method_forms(spark):
    df = spark.createDataFrame([("<r><a>1</a><b>two</b></r>",)], ["x"])
    src = 'root.p = this.x.parse_xml("a INT, b STRING")'
    row = compile_mapping(df, src).collect()[0]
    assert row["p"]["a"] == 1 and row["p"]["b"] == "two"


def test_collapse_and_re_aliases(spark):
    row = _one(spark, '''
root.c = "{\\"a\\": {\\"b\\": 1, \\"c\\": [\\"x\\", \\"y\\"]}}".collapse()
root.rr = "a1b2".re_replace("[0-9]", "#")
root.ao = "a=1 b=2".re_find_all_object("(?P<k>\\\\w+)=(?P<v>\\\\d)")
''')
    assert dict(row["c"]) == {"a.b": "1", "a.c.0": "x", "a.c.1": "y"}
    assert row["rr"] == "a#b#"
    assert [dict(d)["k"] for d in row["ao"]] == ["a", "b"]


def test_geoip_methods(spark, tmp_path):
    from connect_spark.functions.geoip import MmdbWriter

    w = MmdbWriter()
    w.insert("10.0.0.0/8", {"country": "XX", "city": {"name": "Testville"}})
    path = str(tmp_path / "test.mmdb")
    with open(path, "wb") as fh:
        fh.write(w.tobytes())
    df = spark.createDataFrame([("10.1.2.3",), ("192.168.0.1",)], ["ip"])
    src = f'''
root.ip = this.ip
root.city = this.ip.geoip_city("{path}")
root.country = this.ip.geoip_country("{path}")
'''
    rows = {r["ip"]: r for r in compile_mapping(df, src).collect()}
    assert json.loads(rows["10.1.2.3"]["city"])["country"] == "XX"
    assert rows["10.1.2.3"]["country"] == "XX"
    assert rows["192.168.0.1"]["city"] is None


def test_vector_and_explode(spark):
    row = _one(spark, '''
root.v = [0.25, 1.0, 2.5].vector()
root.e = "{\\"id\\": 1, \\"value\\": [\\"foo\\", \\"bar\\"]}".explode("value")
root.eo = "{\\"id\\": 1, \\"obj\\": {\\"a\\": 1, \\"b\\": 2}}".explode("obj")
''')
    assert row["v"] == "[0.25,1.0,2.5]"
    assert [json.loads(d) for d in row["e"]] == [
        {"id": 1, "value": "foo"}, {"id": 1, "value": "bar"},
    ]
    assert [json.loads(d) for d in row["eo"]] == [
        {"id": 1, "obj": {"a": 1}}, {"id": 1, "obj": {"b": 2}},
    ]


def test_diff_patch_roundtrip(spark):
    df = spark.createDataFrame(
        [(
            '{"name":"Alice","age":30,"tags":["x"]}',
            '{"name":"Alice","age":31,"city":"NYC","tags":["x","y"]}',
        )],
        ["before", "after"],
    )
    src = """
root.changes = this.before.diff(this.after)
root.rebuilt = this.before.patch(this.before.diff(this.after))
"""
    row = compile_mapping(df, src).collect()[0]
    changes = json.loads(row["changes"])
    # methods.adoc example shape: Type/Path/From/To entries
    assert {"Type": "update", "Path": ["age"], "From": 30, "To": 31} in changes
    assert {"Type": "create", "Path": ["city"], "From": None, "To": "NYC"} in changes
    assert {"Type": "create", "Path": ["tags", "1"], "From": None, "To": "y"} in changes
    assert json.loads(row["rebuilt"]) == json.loads(
        '{"age":31,"city":"NYC","name":"Alice","tags":["x","y"]}'
    )


def test_infer_schema(spark):
    row = _one(spark, '''
root.s = "{\\"a\\": 1, \\"b\\": [true], \\"c\\": {\\"d\\": 1.5}}".infer_schema()
''')
    assert json.loads(row["s"]) == {
        "type": "object",
        "properties": {
            "a": {"type": "integer"},
            "b": {"type": "array", "items": {"type": "boolean"}},
            "c": {"type": "object", "properties": {"d": {"type": "number"}}},
        },
    }


def test_json_schema_method(spark):
    schema = ('{"type": "object", "required": ["a"], '
              '"properties": {"a": {"type": "integer"}}}')
    df = spark.createDataFrame(
        [('{"a": 1}',), ('{"a": "no"}',), ('{"b": 2}',)], ["j"]
    )
    src = f"root.ok = this.j.json_schema('{schema}'.string())"
    # schema arg as literal string
    src = 'root.ok = this.j.json_schema("{\\"type\\": \\"object\\", \\"required\\": [\\"a\\"], \\"properties\\": {\\"a\\": {\\"type\\": \\"integer\\"}}}")'
    rows = [r["ok"] for r in compile_mapping(df, src).collect()]
    assert rows == ['{"a": 1}', None, None]


# --- review fixes ---------------------------------------------------

def test_patch_list_shrink_by_two(spark):
    df = spark.createDataFrame([("[1,2,3,4]", "[1,2]")], ["a", "b"])
    src = "root.p = this.a.patch(this.a.diff(this.b))"
    assert json.loads(compile_mapping(df, src).collect()[0]["p"]) == [1, 2]


def test_replace_many_single_pass(spark):
    row = _one(spark, 'root.v = "ab".replace_many(["a", "b", "b", "z"])')
    assert row["v"] == "bz"  # Go strings.Replacer single-pass semantics


def test_strftime_literal_letters_and_percent(spark):
    df = spark.createDataFrame([("2024-03-01 12:30:45",)], ["t"])
    src = '''
root.iso = this.t.ts_parse("yyyy-MM-dd HH:mm:ss").ts_strftime("%Y-%m-%dT%H:%M:%S")
root.pct = this.t.ts_parse("yyyy-MM-dd HH:mm:ss").ts_strftime("%%Y=%Y")
'''
    row = compile_mapping(df, src).collect()[0]
    assert row["iso"] == "2024-03-01T12:30:45"
    assert row["pct"] == "%Y=2024"


def test_hash_crc32_ieee_is_hex_and_numeric_inputs(spark):
    row = _one(spark, '''
root.c = "hello world".hash("crc32")
root.n = (5).hash("sha3_256")
''')
    assert row["c"] == "0d4a1185"
    import hashlib
    assert row["n"] == hashlib.sha3_256(
        (5).to_bytes(8, "big", signed=True)
    ).hexdigest()
