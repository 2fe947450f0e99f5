"""Pins the driver_sim comparator's typed strictness (round-9 verdict
task #2): a DuckDB column the engine promoted to HUGEINT must MISMATCH
a Spark BIGINT even when every value is numerically equal.  The
round-8 comparator stringified values, so exactly this bug class
passed "pre-verification" and then failed the real driver's typed
hash on three datamix queries."""

from __future__ import annotations

import importlib.util
import re

import duckdb
import pytest

from connect_spark.catalog import TABLES, table_path
from tests.conftest import SF_SMALL


def _driver_sim():
    spec = importlib.util.spec_from_file_location(
        "driver_sim", "/root/repo/scripts/driver_sim.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sim():
    return _driver_sim()


def test_uncast_hugeint_sum_mismatches_bigint(sim):
    """The exact round-8 failure shape: SUM(BIGINT) promotes to
    HUGEINT in DuckDB; the typed compare must flag it against an
    engine that emits BIGINT, even though 6 == 6."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM "
                "(VALUES (1::BIGINT), (2::BIGINT), (3::BIGINT)) v(x)")
    _, uncast = sim.oracle_typed(con, "SELECT SUM(x) AS s FROM t")
    _, cast = sim.oracle_typed(
        con, "SELECT CAST(SUM(x) AS BIGINT) AS s FROM t")
    spark_like = sim.typed_rows(["s"], [(6,)])
    assert uncast[0][0][0] == "decimal"
    assert cast == spark_like
    assert uncast != spark_like  # the r8 comparator said these matched


def test_prefix_datamix_sql_flags_red(sim):
    """Regression: the PRE-fix datamix oracles (casts stripped back
    out) must now read as decimal-typed — i.e. driver_sim would flag
    them RED instead of normalizing the difference away."""
    from connect_spark.queries.datamix import SHARD_MANIFEST_SQL

    uncast_sql = re.sub(
        r"CAST\((SUM\([^)]*(?:\)[^)]*)?\)) AS BIGINT\)", r"\1",
        SHARD_MANIFEST_SQL)
    assert uncast_sql != SHARD_MANIFEST_SQL, "cast pattern not found"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{table_path(SF_SMALL, t)}')")
    cols, rows = sim.oracle_typed(con, uncast_sql)
    tags = {tag for row in rows for tag, _ in row}
    assert "decimal" in tags  # pre-fix shape is caught
    _, fixed_rows = sim.oracle_typed(con, SHARD_MANIFEST_SQL)
    fixed_tags = {tag for row in fixed_rows for tag, _ in row}
    assert "decimal" not in fixed_tags


def test_registry_oracles_emit_no_decimal_columns(sim):
    """Sweep: no registered oracle may return a HUGEINT/DECIMAL column
    — the repo convention is CAST(... AS BIGINT) on every final SUM."""
    import pyarrow as pa

    from connect_spark.queries import all_queries

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{table_path(SF_SMALL, t)}')")
    offenders = []
    for q in all_queries():
        if not q.oracle:
            continue
        tbl = con.execute(q.oracle).fetch_arrow_table()
        for c in tbl.column_names:
            if pa.types.is_decimal(tbl.schema.field(c).type):
                offenders.append((q.name, c))
    assert offenders == []
