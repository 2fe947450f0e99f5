"""javascript processor (internal/impl/javascript/processor.go): the
ES5-subset interpreter + benthos.v0_msg_* API."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_spark.operators.javascript import (
    Interp,
    javascript_udf,
    run_js,
)


def ev(expr, globals_=None):
    from connect_spark.operators.javascript import _std_globals

    interp = Interp(f"var __r = ({expr});")
    env = interp.run({**_std_globals(), **(globals_ or {})})
    return env.get("__r")


def run_env(code, globals_=None):
    from connect_spark.operators.javascript import _std_globals

    return Interp(code).run({**_std_globals(), **(globals_ or {})})


def test_expressions_and_coercion():
    assert ev("1 + 2 * 3") == 7
    assert ev('"a" + 1') == "a1"
    assert ev('1 + "a"') == "1a"
    assert ev('"5" * "2"') == 10
    assert ev("10 / 4") == 2.5
    assert ev('1 == "1"') is True
    assert ev('1 === "1"') is False
    assert ev('"" || "x"') == "x"
    assert ev("0 && 1") == 0
    assert ev("!0") is True
    assert ev('typeof "s"') == "string"
    assert ev("typeof {}") == "object"
    assert ev("true ? 1 : 2") == 1


def test_variables_functions_closures():
    env = run_env(
        """
        var total = 0;
        function makeAdder(x) {
          return function(y) { return x + y; };
        }
        var add5 = makeAdder(5);
        total = add5(37);
        """
    )
    assert env.get("total") == 42


def test_control_flow_loops():
    env = run_env(
        """
        var s = 0;
        for (var i = 0; i < 10; i++) {
          if (i % 2 === 0) { continue; }
          if (i > 7) { break; }
          s += i;
        }
        var w = 1;
        while (w < 100) { w *= 3; }
        """
    )
    assert env.get("s") == 1 + 3 + 5 + 7
    assert env.get("w") == 243


def test_objects_arrays_methods():
    env = run_env(
        """
        var o = {a: 1, "b c": 2};
        o.d = o.a + o["b c"];
        var keys = Object.keys(o);
        var arr = [3, 1, 2];
        arr.push(9);
        var joined = arr.join("-");
        var up = "hello world".toUpperCase().split(" ")[0];
        var n = 0;
        for (var k in o) { n++; }
        """
    )
    assert env.get("o")["d"] == 3
    assert env.get("keys") == ["a", "b c", "d"]
    assert env.get("joined") == "3-1-2-9"
    assert env.get("up") == "HELLO"
    assert env.get("n") == 3


def test_json_and_math_builtins():
    env = run_env(
        """
        var v = JSON.parse('{"x": [1, 2, 3]}');
        var m = Math.max(Math.floor(2.9), Math.abs(-2), 1);
        var out = JSON.stringify({sum: v.x[0] + v.x[2], m: m});
        """
    )
    assert json.loads(env.get("out")) == {"sum": 4, "m": 2}


def test_benthos_message_api_roundtrip():
    code = """
    var doc = benthos.v0_msg_as_structured();
    doc.total = doc.a + doc.b;
    doc.tag = benthos.v0_msg_get_meta("source") + "!";
    benthos.v0_msg_set_meta("seen", "yes");
    benthos.v0_msg_set_structured(doc);
    """
    content, meta = run_js(
        code, '{"a": 2, "b": 3}', meta={"source": "kafka"}
    )
    assert json.loads(content) == {"a": 2, "b": 3, "total": 5,
                                   "tag": "kafka!"}
    assert meta["seen"] == "yes"


def test_javascript_udf_on_dataframe(spark):
    code = """
    var doc = benthos.v0_msg_as_structured();
    doc.norm = doc.name.toLowerCase().trim();
    doc.big = doc.v >= 10;
    benthos.v0_msg_set_structured(doc);
    """
    df = spark.createDataFrame(
        [Row(content='{"name": "  ADA ", "v": 12}'),
         Row(content='{"name": "Lin", "v": 3}')]
    )
    out = [
        json.loads(r.r)
        for r in df.select(
            javascript_udf(code)(F.col("content")).alias("r")
        ).collect()
    ]
    assert out[0]["norm"] == "ada" and out[0]["big"] is True
    assert out[1]["norm"] == "lin" and out[1]["big"] is False
