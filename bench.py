#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries"
(per-query sec), "sf"}.

Each query is materialized through the noop sink (full computation,
all columns, no driver collect) — the closest local analogue to
writing results out on a cluster. A warmup pass initializes the JVM /
codegen so measured numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import re
import time

from connect_spark.queries import all_queries
from connect_spark.session import get_spark


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("connect_spark_bench")

    specs = [s for s in all_queries() if s.headline]

    # Warmup: JVM, codegen, parquet footer caches.
    warm = specs[0].fn(spark, sf_dir)
    materialize(warm)

    timings: dict[str, float] = {}
    for spec in specs:
        t0 = time.perf_counter()
        materialize(spec.fn(spark, sf_dir))
        timings[spec.name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
