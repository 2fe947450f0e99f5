"""Driver simulation: the round driver's contract from a fresh process.

Comparator contract (tightened round 9, verdict task #2): the oracle
side is fetched through Arrow — which preserves DuckDB's result types
(HUGEINT -> decimal128, BIGINT -> int64) — and every cell is compared
as a (type_tag, rendered_value) pair.  An oracle column that DuckDB
silently promoted (SUM over BIGINT -> HUGEINT) therefore MISMATCHES a
Spark BIGINT column even when every value is numerically equal.  That
is exactly the bug class the round-8 comparator normalized away
(int-valued floats folded to ints), which let three datamix queries
"pre-verify" green and then fail the real driver's typed hash.

The typed compare lives in `typed_cell` / `typed_rows` so pytest can
pin the strictness (tests/test_driver_sim_strict.py).
"""
import datetime
import decimal
import math
import random
import sys

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def typed_cell(v):
    """(type_tag, rendered) for one cell.  Tags deliberately distinguish
    int / float / decimal so engine-level type promotion is a mismatch,
    mirroring the driver's typed value hash."""
    if v is None:
        return ("null", "")
    if isinstance(v, bool):
        return ("bool", str(v))
    if isinstance(v, int):
        return ("int", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("null", "")
        return ("float", repr(v + 0.0))  # collapse -0.0
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("ts", str(v))
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, (list, tuple)):
        return ("list", tuple(typed_cell(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, typed_cell(x))
                                    for k, x in v.items())))
    return (type(v).__name__, str(v))


def typed_rows(cols, rows):
    """Sorted multiset of typed rows with columns in name order."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(typed_cell(r[i]) for i in order) for r in rows)


def oracle_typed(con, sql):
    """Run oracle SQL and return (cols, typed_rows) via Arrow so DuckDB
    result types survive (fetchdf folds HUGEINT to float/object, which
    is the normalization that produced the round-8 false green)."""
    tbl = con.execute(sql).fetch_arrow_table()
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, typed_rows(cols, rows)


def main():
    import duckdb
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .appName("driver_sim").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    res = E.entry(spark)
    rows = res.collect()
    print(f"entry(): {len(rows)} rows, schema={[f.name for f in res.schema]}")
    assert len(rows) >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    names = sys.argv[1:] or random.sample(sorted(set(qs) & set(oracles)), 8)
    ok = True
    for name in names:
        try:
            sdf = qs[name](spark, SF)
            scols = sorted(sdf.columns)
            srows = typed_rows(sdf.columns,
                               [tuple(r) for r in sdf.collect()])
            if name not in oracles:
                print(f"[rows-only] {name}: {len(srows)} rows")
                continue
            ocols_raw, orows = oracle_typed(con, oracles[name])
            ocols = sorted(ocols_raw)
            match = scols == ocols and srows == orows
            print(f"[{'PASS' if match else 'FAIL'}] {name}: "
                  f"spark={len(srows)} oracle={len(orows)}")
            if not match:
                ok = False
                if scols != ocols:
                    print("   cols:", scols, "vs", ocols)
                else:
                    for a, b in zip(srows, orows):
                        if a != b:
                            print("   first diff:", a, "vs", b)
                            break
        except Exception as exc:
            ok = False
            print(f"[ERR ] {name}: {exc}")
        finally:
            # queries that persist() intermediates never see their
            # final action inside the registry call — drop their
            # cached plans so a long multi-query session doesn't
            # accumulate executor storage (round-10 ADVICE)
            spark.catalog.clearCache()
    print("RESULT:", "GREEN" if ok else "RED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
