"""Property tests for the connector layer's pure logic: the MongoDB
filter translation agrees with a direct Python evaluation of the same
filter over arbitrary data, and publish/subscribe roundtrips preserve
arbitrary payloads."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from connect_spark.plans.db_ext import _mongo_filter_to_column

_FIELDS = ["a", "b"]

_leaf = st.one_of(
    st.integers(min_value=-5, max_value=5),
    st.sampled_from(["x", "y", "z"]),
)

_op_clause = st.one_of(
    _leaf.map(lambda v: v),  # implicit $eq
    st.fixed_dictionaries({"$gt": st.integers(-5, 5)}),
    st.fixed_dictionaries({"$gte": st.integers(-5, 5)}),
    st.fixed_dictionaries({"$lt": st.integers(-5, 5)}),
    st.fixed_dictionaries({"$lte": st.integers(-5, 5)}),
    st.fixed_dictionaries({"$ne": _leaf}),
    st.fixed_dictionaries({"$in": st.lists(_leaf, min_size=1, max_size=3)}),
)

_simple_filter = st.dictionaries(
    st.sampled_from(_FIELDS), _op_clause, min_size=1, max_size=2
)

_filter = st.one_of(
    _simple_filter,
    st.fixed_dictionaries(
        {"$or": st.lists(_simple_filter, min_size=1, max_size=2)}),
    st.fixed_dictionaries(
        {"$and": st.lists(_simple_filter, min_size=1, max_size=2)}),
)


def _py_cmp(op, lhs, rhs) -> bool:
    """Mirror SQL comparison semantics: cross-type compares are
    null/False, like Spark's typed columns."""
    if lhs is None:
        return False
    same_type = isinstance(lhs, str) == isinstance(rhs, str)
    if op == "$eq":
        return same_type and lhs == rhs
    if op == "$ne":
        return same_type and lhs != rhs
    if not same_type:
        return False
    return {
        "$gt": lhs > rhs, "$gte": lhs >= rhs,
        "$lt": lhs < rhs, "$lte": lhs <= rhs,
    }[op]


def _py_filter(query: dict, row: dict) -> bool:
    out = True
    for field, spec in query.items():
        if field == "$and":
            out = out and all(_py_filter(q, row) for q in spec)
            continue
        if field == "$or":
            out = out and any(_py_filter(q, row) for q in spec)
            continue
        val = row.get(field)
        if not isinstance(spec, dict):
            out = out and _py_cmp("$eq", val, spec)
            continue
        for op, rhs in spec.items():
            if op == "$in":
                out = out and any(
                    _py_cmp("$eq", val, x) for x in rhs)
            else:
                out = out and _py_cmp(op, val, rhs)
    return out


@pytest.fixture(scope="module")
def mixed_rows(spark):
    rows = [
        {"_id": str(i), "a": a, "b": b}
        for i, (a, b) in enumerate(
            (a, b)
            for a in [-3, 0, 2, 5, "x", "z", None]
            for b in [-5, 1, 4, "y", None]
        )
    ]
    df = spark.createDataFrame(
        [(r["_id"], r["a"], r["b"]) for r in rows],
        "_id string, a string, b string",
    )
    # string-typed frame: compare as strings on the python side too
    py_rows = [
        {"_id": r["_id"],
         "a": None if r["a"] is None else str(r["a"]),
         "b": None if r["b"] is None else str(r["b"])}
        for r in rows
    ]
    return df, py_rows


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(query=_filter)
def test_mongo_filter_matches_python_eval(mixed_rows, query):
    df, py_rows = mixed_rows
    # the frame is all-string, so stringify scalar comparisons the
    # same way Spark's implicit casts will
    q = json.loads(json.dumps(query), parse_int=str)
    got = {r._id for r in df.filter(_mongo_filter_to_column(q)).collect()}
    want = {r["_id"] for r in py_rows if _py_filter(q, r)}
    assert got == want, (q, got, want)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(payloads=st.lists(
    st.one_of(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"),
            max_size=40),
        st.dictionaries(
            st.sampled_from(["k1", "k2"]),
            st.one_of(st.integers(-1000, 1000), st.text(max_size=10)),
            max_size=2),
    ),
    min_size=1, max_size=5,
))
def test_bus_publish_subscribe_roundtrip(spark, tmp_path_factory, payloads):
    from connect_spark.sources.mq import MessageBus

    bus = MessageBus(str(tmp_path_factory.mktemp("pbus") / "bus"))
    bus.publish("subj", payloads)
    rows = sorted(
        bus.subscribe(spark, "subj", streaming=False).collect(),
        key=lambda r: r.lsn,
    )
    got = [json.loads(r.after) for r in rows]
    assert got == payloads
