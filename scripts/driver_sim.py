"""Driver simulation: the round driver's contract from a fresh process."""
import sys, random

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

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
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = E.queries()
oracles = E.oracle_sql()
names = sys.argv[1:] or random.sample(sorted(set(qs) & set(oracles)), 8)
ok = True
for name in names:
    try:
        def norm(v):
            # pandas renders ints from nullable columns as floats
            # ("3187.0") and nulls as nan — normalize both sides the
            # way the real driver's typed compare does
            if v is None:
                return "None"
            if isinstance(v, float):
                if v != v:  # nan
                    return "None"
                if v == int(v) and abs(v) < 1e15:
                    return str(int(v))
                return repr(v)
            return str(v)

        sdf = qs[name](spark, SF)
        scols = sorted(sdf.columns)
        srows = sorted(
            tuple(norm(r[c]) for c in scols) for r in sdf.collect())
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows")
            continue
        ores = con.execute(oracles[name]).fetchdf()
        ores = ores.astype(object).where(ores.notna(), None)
        ocols = sorted(ores.columns)
        orows = sorted(
            tuple(norm(ores[c].iloc[i]) for c in ocols)
            for i in range(len(ores)))
        match = scols == ocols and srows == orows
        print(f"[{'PASS' if match else 'FAIL'}] {name}: spark={len(srows)} oracle={len(orows)}")
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
print("RESULT:", "GREEN" if ok else "RED")
sys.exit(0 if ok else 1)
