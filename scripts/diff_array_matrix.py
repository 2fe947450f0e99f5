"""Debug: per-column diff of fn_array_matrix Spark vs DuckDB at sf0.1."""
import duckdb
import pandas as pd

from connect_spark.session import get_spark
from connect_spark.queries.functions import fn_array_matrix, ARRAY_SQL

SF = "/root/testdata/sf0.1"

spark = get_spark("diff_array_matrix")
sdf = fn_array_matrix(spark, SF).toPandas().sort_values("doc_id").reset_index(drop=True)

con = duckdb.connect()
for t in ["documents"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
odf = con.execute(ARRAY_SQL).fetchdf().sort_values("doc_id").reset_index(drop=True)

print("spark rows", len(sdf), "oracle rows", len(odf))
for col in sdf.columns:
    if col not in odf.columns:
        print("MISSING in oracle:", col)
        continue
    s = sdf[col].astype(str)
    o = odf[col].astype(str)
    bad = s != o
    if bad.any():
        print(f"COLUMN {col}: {bad.sum()} mismatches")
        idx = bad[bad].index[:5]
        for i in idx:
            print("  doc", sdf.loc[i, "doc_id"], "spark=", repr(sdf.loc[i, col]), "oracle=", repr(odf.loc[i, col]))
    else:
        print(f"column {col}: OK")
