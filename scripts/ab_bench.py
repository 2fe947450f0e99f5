"""Interleaved A/B bench probe (the r5/r6 bench-drift protocol,
SCALE.md "Bench-drift A/B").

Runs the named registry queries in ONE warm session at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[32]: one untimed warmup
pass, then `--runs` timed passes interleaved across queries (a host
stall hits one pass of many queries, not all passes of one), printing
one JSON line with per-query medians and spreads.

Tree selection is by PYTHONPATH: point it at a checked-out worktree
of another round's tree to time that tree's `connect_spark` with the
same protocol, alternating sessions A/B/A/B to cancel slow host
drift.  This file reads the registry through whatever tree resolves
`connect_spark`.

Usage:
    python scripts/ab_bench.py q1_pricing_summary q18_large_volume \
        join_star_revenue_by_nation --runs 5 --label r11
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# PYTHONPATH (the A/B tree switch) must win over the script's repo —
# only fall back to this repo when the caller didn't set a tree
if not os.environ.get("PYTHONPATH"):
    sys.path.insert(
        0,
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from connect_spark.queries import all_queries  # noqa: E402
from connect_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    label = "ab"
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1]) if "=" in a else runs
        if a.startswith("--label"):
            label = a.split("=", 1)[1] if "=" in a else label
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    spark = get_spark("connect_spark_ab")
    specs = {s.name: s for s in all_queries()}
    names = args or ["q1_pricing_summary", "q18_large_volume",
                     "join_star_revenue_by_nation"]
    for n in names:
        if n not in specs:
            raise SystemExit(f"unknown query {n}")

    def materialize(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # warmup (JVM, codegen, parquet footers)
    for n in names:
        materialize(specs[n].fn(spark, sf_dir))
        spark.catalog.clearCache()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for n in names:
            t0 = time.perf_counter()
            materialize(specs[n].fn(spark, sf_dir))
            samples[n].append(time.perf_counter() - t0)
            spark.catalog.clearCache()

    out = {
        "label": label,
        "tree": os.environ.get("PYTHONPATH") or "repo",
        "runs": runs,
        "queries": {
            n: {
                "median": round(statistics.median(ts), 3),
                "min": round(min(ts), 3),
                "max": round(max(ts), 3),
            }
            for n, ts in samples.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
