"""CLI — the reference's two primary verbs (SURVEY.md §3.1:
`redpanda-connect run config.yaml`; §5.1: `rpk connect test`):

    python -m connect_spark run examples/traffic_windows.yaml
    python -m connect_spark test examples/filtering_test.yaml

`run` builds the pipeline and executes it (memory/stdout outputs
print); `test` executes a config unit-test suite and reports per-case
results, exit code 1 on any failure.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="connect_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    run_p = sub.add_parser("run", help="run a pipeline YAML")
    run_p.add_argument("config")
    run_p.add_argument("--limit", type=int, default=20)
    test_p = sub.add_parser("test", help="run a config unit-test suite YAML")
    test_p.add_argument("suite")
    args = parser.parse_args(argv)

    from connect_spark.session import get_spark

    spark = get_spark("connect_spark_cli")

    if args.cmd == "run":
        from connect_spark.plans import build_pipeline

        result = build_pipeline(spark, args.config).run()
        if result is not None:
            result.show(args.limit, truncate=False)
        return 0

    from connect_spark.plans.testrunner import run_suite

    results = run_suite(spark, args.suite)
    ok = True
    for r in results:
        status = "PASS" if r.ok else "FAIL"
        print(f"[{status}] {r.name}")
        for f in r.failures:
            ok = False
            print(f"    {f}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
