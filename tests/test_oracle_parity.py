"""The in-repo correctness gate: every QuerySpec with an oracle must
match DuckDB exactly (columns, row multiset) at sf0.001 — the same
compare the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from connect_spark.queries import all_queries
from tests._registry_artifacts import registry_df
from tests.oracle import compare, run_oracle

SPECS = all_queries()


@pytest.mark.parametrize(
    "spec", SPECS, ids=[s.name for s in SPECS]
)
def test_query_matches_oracle(spark, sf_dir, spec):
    # Reuses the session's one-pass registry build when it already ran
    # (same construction call, same lineage — the heavy streaming /
    # iterative builds stop being paid twice per suite run).
    df = registry_df(spark, spec, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check (driver does the same)
        return
    cols, rows = run_oracle(spec.oracle, sf_dir)
    problems = compare(df, cols, rows)
    assert not problems, f"{spec.name}:\n" + "\n".join(problems)


def test_entry_smoke(spark):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    assert df.count() > 0
    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20
