"""Focused tests for the r15 batch-scope memo in pyeval's from/
from_all evaluation (the O(batch²) fix).

The memo may only serve values for targets that are independent of
the evaluating message ($var-free, no stateful/nondeterministic
functions), and hits are copied out so caller aliasing cannot
corrupt later messages' view of the batch.
"""

from __future__ import annotations

import json

from connect_spark.bloblang.parser import parse_mapping
from connect_spark.bloblang.pyeval import (
    Message,
    _batch_independent,
    _memo_copy,
    eval_batch,
)


def _msgs(n):
    return [
        Message(json.dumps({"i": i, "v": i * 3}), {}, None, None)
        for i in range(n)
    ]


def test_from_all_reduce_identical_across_messages():
    src = 'root = this\ntotal = json("v").from_all().sum()\n'
    out = eval_batch(src, _msgs(5))
    totals = {json.loads(m.content)["total"] for m in out}
    assert totals == {sum(i * 3 for i in range(5))}


def test_from_all_list_identical_and_batch_index_addresses_j():
    # batch_index() inside from_all binds to the ADDRESSED index j —
    # identical for every evaluating message, and memo-safe
    src = "root = this\nmarked = batch_index().from_all()\n"
    out = eval_batch(src, _msgs(3))
    marked = [json.loads(m.content)["marked"] for m in out]
    assert marked == [[0, 1, 2]] * 3


def test_memo_copy_isolates_containers():
    xs = [1, 2, 3]
    assert _memo_copy(xs) == xs and _memo_copy(xs) is not xs
    nested = [{"a": 1}]
    got = _memo_copy(nested)
    assert got == nested and got[0] is not nested[0]
    assert _memo_copy(7) == 7


def _expr(src: str):
    return parse_mapping(src).statements[0].expr


def test_safety_walk_classifies_nodes():
    assert _batch_independent(_expr('root = json("v")'))
    assert not _batch_independent(_expr("root = $x"))
    assert not _batch_independent(_expr("root = random_int()"))
    assert not _batch_independent(_expr("root = errored()"))
    assert not _batch_independent(_expr("root = counter()"))
    # lambda params bind through `this` (no Var nodes), so a pure
    # element-wise lambda stays memo-safe; a $var reference does not
    assert _batch_independent(
        _expr('root = json("xs").map_each(x -> x)'))
    assert not _batch_independent(
        _expr('root = json("xs").map_each(x -> $bias)'))


def test_error_functions_stay_per_message():
    # errored() reads the EVALUATING message's error flag — targets
    # containing it are classified unsafe, so each message
    # re-evaluates with its own error state in scope
    msgs = [
        Message('{"i": 0}', {}, "boom", None),
        Message('{"i": 1}', {}, None, None),
    ]
    src = "root = this\nhad = errored().from_all()\n"
    out = eval_batch(src, msgs)
    vals = [json.loads(m.content)["had"] for m in out]
    assert vals[0] == [True, True]
    assert vals[1] == [False, False]
