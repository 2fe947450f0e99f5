"""Registry-wide anti-pattern plan sweep (r14).

The per-query plan pinning lives in test_plan_shapes.py (headline
band).  This sweep asserts the two properties that must hold for
EVERY one of the registry queries, because either one silently
destroys the 100-TB posture:

  - no CartesianProduct: every cross join in the repo is a broadcast
    1-row scalar attach (plans as BroadcastNestedLoopJoin); a true
    cartesian pairing entering any query is quadratic at scale.
  - no BatchEvalPython: zero row-at-a-time Python UDFs — Python
    seams must be Arrow-batched (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas) or JVM-side.

Previously these were judge-session greps; now a plan regression
anywhere in the registry fails the suite.  The query construction is
shared with test_no_forced_broadcast via tests/_registry_artifacts.py
(r16: the two tests built all ~213 queries independently — 146s+110s,
the two slowest tests in the suite)."""

from __future__ import annotations

from tests._registry_artifacts import registry_artifacts


def test_no_cartesian_or_rowwise_python_anywhere(spark):
    offenders = []
    for name, art in registry_artifacts(spark).items():
        p = art["executed"]
        if "CartesianProduct" in p:
            offenders.append((name, "CartesianProduct"))
        if "BatchEvalPython" in p:
            offenders.append((name, "BatchEvalPython"))
    assert not offenders, (
        "scale anti-patterns entered the registry: "
        f"{offenders}")
