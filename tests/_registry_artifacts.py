"""Shared one-pass registry build for the whole-registry plan tests.

test_registry_plan_sweep (executed-plan anti-pattern sweep) and
test_no_forced_broadcast (ResolvedHint boundedness audit) each used to
build all ~213 registry DataFrames independently — the two most
expensive tests in the suite (146s + 110s), nearly all of it the
duplicated query construction (eager checkpoint materializations,
driver-side planning).  This module builds every query ONCE per session
and hands both tests the artifacts they assert on.
"""

from __future__ import annotations

from typing import Any

SF = "/root/testdata/sf0.001"

_CACHE: dict[str, dict[str, Any]] | None = None

# Leaf markers of tables whose cardinality does NOT grow with sf.
BOUNDED_LEAF_MARKERS = ("n_nationkey", "r_regionkey")


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _bounded(node) -> bool:
    """True iff this logical subtree's row count is O(1) in sf."""
    name = node.getClass().getSimpleName()
    kids = _children(node)
    if name in ("GlobalLimit", "LocalLimit", "LocalRelation",
                "OneRowRelation"):
        return True
    if name == "LogicalRDD":
        # createDataFrame over driver-local rows (control-plane state:
        # id maps, recorded registries) — driver-resident by
        # construction, cannot be an sf-scaled scan
        return True
    if name == "Aggregate":
        if node.groupingExpressions().isEmpty():
            return True  # 1-row scalar aggregate
        return all(_bounded(k) for k in kids)  # |out| <= |in|
    if name == "Filter":
        cond = node.condition().toString()
        if "vec_id" in cond and "<" in cond:
            return True  # fixed-prefix centroids / query set
        return all(_bounded(k) for k in kids)
    if not kids:
        # Leaf relation: bounded only if it is a true dim table.
        s = node.simpleString(1000)
        return any(m in s for m in BOUNDED_LEAF_MARKERS)
    if name == "Join":
        return all(_bounded(k) for k in kids)
    if name == "Union":
        return all(_bounded(k) for k in kids)
    # Project / SubqueryAlias / Sort / Distinct / Window: |out| <= |in|
    return all(_bounded(k) for k in kids)


def walk(node):
    yield node
    for k in _children(node):
        yield from walk(k)


def forced_broadcast_violations(df) -> list[str]:
    plan = df._jdf.queryExecution().analyzed()
    # Node-by-node traversal is a py4j round trip per node; only pay
    # it when the plan text shows a hint at all (most queries carry
    # none, and a hint always prints as "ResolvedHint").
    if "ResolvedHint" not in plan.toString():
        return []
    bad = []
    for node in walk(plan):
        if node.getClass().getSimpleName() == "ResolvedHint":
            child = _children(node)[0]
            if not _bounded(child):
                bad.append(child.simpleString(200))
    return bad


def registry_artifacts(spark) -> dict[str, dict[str, Any]]:
    """name -> {"df": the session-built DataFrame,
                "executed": physical-plan string,
                "hint_violations": [unbounded hinted subtrees]}."""
    global _CACHE
    if _CACHE is not None:
        return _CACHE
    from connect_spark.queries import all_queries

    spark.catalog.clearCache()
    out: dict[str, dict[str, Any]] = {}
    for s in all_queries():
        df = s.fn(spark, SF)
        out[s.name] = {
            "df": df,
            "executed": df._jdf.queryExecution().executedPlan().toString(),
            "hint_violations": forced_broadcast_violations(df),
        }
    spark.catalog.clearCache()
    _CACHE = out
    return out


def registry_df(spark, spec, sf_dir: str):
    """The shared one-pass DataFrame for ``spec`` when the build
    already ran at the same scale factor (full-suite file order puts
    test_no_forced_broadcast before test_oracle_parity, so the heavy
    constructions — streaming gates, iterative checkpoints — are paid
    once per session, not once per consumer test).  Standalone
    invocations and non-default SFs build just this query."""
    if sf_dir == SF and _CACHE is not None and spec.name in _CACHE:
        return _CACHE[spec.name]["df"]
    return spec.fn(spark, sf_dir)
