"""Regression tests for the round-1 ADVICE.md findings."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from connect_spark.bloblang import compile_mapping
from connect_spark.operators.asof import asof_join
from connect_spark.operators.core import dedupe
from connect_spark.sinks.routing import switch_output


def test_dedupe_column_keys_without_order_by(spark):
    """ADVICE #1: dedupe() with Column keys and order_by=None must not
    stringify the Column into an unresolvable name."""
    df = spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=1, v="b"), Row(id=2, v="c")]
    )
    out = dedupe(df, [F.col("id")], order_by=None)
    assert out.count() == 2
    assert sorted(out.columns) == ["id", "v"]
    # expression keys work too
    out2 = dedupe(df, [F.col("id") % 2], order_by=None)
    assert out2.count() == 2
    assert sorted(out2.columns) == ["id", "v"]


def test_switch_output_null_condition_routes_to_default(spark):
    """ADVICE #2: rows whose case condition evaluates to NULL must fall
    through to the default writer, not vanish."""
    df = spark.createDataFrame(
        [Row(k="a", v=1), Row(k=None, v=2), Row(k="b", v=3)]
    )
    routed: dict[str, list] = {"case": [], "default": []}
    switch_output(
        df,
        cases=[(F.col("k") == "a", lambda d: routed["case"].extend(d.collect()))],
        default=lambda d: routed["default"].extend(d.collect()),
    )
    assert [r.v for r in routed["case"]] == [1]
    # NULL-cond row (k=None) lands in default alongside the k="b" row
    assert sorted(r.v for r in routed["default"]) == [2, 3]


def test_bloblang_escaped_backslash_before_n(spark):
    """ADVICE #3: source "a\\nb" (escaped backslash + n) decodes to a
    literal backslash + 'n', not a newline."""
    df = spark.createDataFrame([Row(x=1)])
    out = compile_mapping(df, 'root.s = "a\\\\nb"\nroot.t = "a\\nb"')
    row = out.collect()[0]
    assert row.s == "a\\nb"  # literal backslash + n
    assert row.t == "a\nb"  # real newline


def test_bloblang_match_default_short_circuits(spark):
    """ADVICE #4: a `_ =>` default stops case collection — cases after
    it are unreachable (first-matching-case semantics)."""
    df = spark.createDataFrame([Row(v="x")])
    out = compile_mapping(
        df,
        """
        root.r = match this.v {
          "y" => "is_y",
          _ => "fallback",
          "x" => "late_x"
        }
        """,
    )
    assert out.collect()[0].r == "fallback"


def test_asof_join_payload_from_single_right_row(spark):
    """ADVICE #5: when the most recent right row has NULL in one payload
    column, the output must carry that NULL — not stitch the value from
    an older right row."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame([Row(k="a", lts=ts(10))])
    right = spark.createDataFrame(
        [
            Row(k="a", rts=ts(1), p=100, q="old"),
            Row(k="a", rts=ts(5), p=None, q="new"),
        ]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["p", "q"],
    ).collect()[0]
    assert out.q_asof == "new"
    assert out.p_asof is None  # from the SAME row as q_asof, not ts(1)
