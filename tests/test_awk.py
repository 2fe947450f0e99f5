"""awk processor (internal/impl/awk): pattern-action semantics against
classic awk one-liners."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_spark.operators.awk import awk_udf, run_awk


def test_fields_and_default_print():
    assert run_awk("{ print $2, $1 }", "a b\nc d") == "b a\nd c"


def test_pattern_filter_and_bare_pattern():
    text = "1 keep\n2 drop\n3 keep"
    assert run_awk("/keep/ { print $1 }", text) == "1\n3"
    # bare pattern -> default action print $0
    assert run_awk("/keep/", text) == "1 keep\n3 keep"


def test_begin_end_and_accumulators():
    text = "3\n4\n5"
    got = run_awk(
        'BEGIN { s = 0 } { s += $1 } END { print "sum", s }', text
    )
    assert got == "sum 12"


def test_nr_nf_and_expressions():
    text = "a b c\nd e"
    assert run_awk("{ print NR, NF }", text) == "1 3\n2 2"
    assert run_awk("NF == 3 { print $3 }", text) == "c"


def test_field_assignment_rebuilds_record():
    assert run_awk('{ $2 = "X"; print $0 }', "a b c") == "a X c"
    assert (
        run_awk('BEGIN { OFS = "-" } { $2 = "X"; print $0 }', "a b c")
        == "a-X-c"
    )


def test_fs_and_ofs():
    assert (
        run_awk('BEGIN { FS = "," } { print $2 }', "x,y,z\n1,2,3")
        == "y\n2"
    )


def test_regex_match_operator_and_ternary():
    text = "err connect\nok fine"
    got = run_awk('{ print ($1 ~ /err/) ? "BAD" : "GOOD" }', text)
    assert got == "BAD\nGOOD"


def test_if_else_next_and_functions():
    text = "long-line-here\nhi"
    got = run_awk(
        """
        { if (length($0) > 5) { print toupper(substr($0, 1, 4)) }
          else { print "short" } }
        """,
        text,
    )
    assert got == "LONG\nshort"
    assert run_awk("/skip/ { next } { print $0 }", "skip me\nkeep") == "keep"


def test_printf_and_concat():
    assert run_awk('{ printf "%s=%d", $1, $2 }', "a 7") == "a=7"
    assert run_awk('{ print $1 "-" $2 }', "x y") == "x-y"


def test_numeric_vs_string_compare():
    # numeric-looking strings compare numerically (10 > 9)
    assert run_awk("$1 > $2 { print \"gt\" }", "10 9") == "gt"
    # string compare when non-numeric ("10a" < "9a" lexically)
    assert run_awk("$1 < $2 { print \"lt\" }", "10a 9a") == "lt"


def test_awk_udf_on_dataframe(spark):
    df = spark.createDataFrame(
        [Row(content="ERROR disk full\nINFO ok"), Row(content="INFO fine")]
    )
    meta = F.lit(None).cast("map<string,string>")
    out = df.select(
        awk_udf("/^ERROR/ { print $2 }")(
            F.col("content"), meta
        ).alias("r")
    ).collect()
    assert [r.r for r in out] == ["disk", ""]


def test_awk_pipeline_processor(spark):
    from connect_spark.plans import build_pipeline

    cfg = {
        "input": {
            "generate": {
                "count": 3,
                "mapping": 'root.content = "v " + counter().string()',
            }
        },
        "pipeline": {
            "processors": [
                {"awk": {"program": "{ print $2 * 10 }"}}
            ]
        },
    }
    rows = build_pipeline(spark, cfg).dataframe().collect()
    assert sorted(r.content for r in rows) == ["0", "10", "20"]
