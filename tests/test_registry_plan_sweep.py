"""Registry-wide anti-pattern plan sweep (r14).

The per-query plan pinning lives in test_plan_shapes.py (headline
band).  This sweep asserts the two properties that must hold for
EVERY one of the 209 registry queries, because either one silently
destroys the 100-TB posture:

  - no CartesianProduct: every cross join in the repo is a broadcast
    1-row scalar attach (plans as BroadcastNestedLoopJoin); a true
    cartesian pairing entering any query is quadratic at scale.
  - no BatchEvalPython: zero row-at-a-time Python UDFs — Python
    seams must be Arrow-batched (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas) or JVM-side.

Previously these were judge-session greps; now a plan regression
anywhere in the registry fails the suite (~3 min for all 209 plans
at sf0.001)."""

from __future__ import annotations

from connect_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def test_no_cartesian_or_rowwise_python_anywhere(spark):
    spark.catalog.clearCache()
    offenders = []
    for s in all_queries():
        df = s.fn(spark, SF)
        p = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in p:
            offenders.append((s.name, "CartesianProduct"))
        if "BatchEvalPython" in p:
            offenders.append((s.name, "BatchEvalPython"))
    spark.catalog.clearCache()
    assert not offenders, (
        "scale anti-patterns entered the registry: "
        f"{offenders}")
