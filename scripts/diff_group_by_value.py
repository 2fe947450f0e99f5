"""Debug: pandas-typed diff of group_by_value_agg Spark vs DuckDB at sf0.1."""
import duckdb

from connect_spark.session import get_spark
from connect_spark.queries.core import group_by_value_agg, GROUP_BY_VALUE_SQL

SF = "/root/testdata/sf0.1"

spark = get_spark("diff_gbv")
sdf = group_by_value_agg(spark, SF).toPandas().sort_values("group_key").reset_index(drop=True)

con = duckdb.connect()
con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')")
odf = con.execute(GROUP_BY_VALUE_SQL).fetchdf().sort_values("group_key").reset_index(drop=True)

print(sdf.dtypes)
print(odf.dtypes)
for col in sdf.columns:
    s = sdf[col].astype(str)
    o = odf[col].astype(str)
    bad = s != o
    print(col, "MISMATCH" if bad.any() else "OK")
    for i in bad[bad].index[:5]:
        print("  ", sdf.loc[i, "group_key"], "spark=", repr(sdf.loc[i, col]), "oracle=", repr(odf.loc[i, col]))
