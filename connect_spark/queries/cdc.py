"""CDC materialization as a driver-checkable query.

The streaming transport (snapshot→WAL handoff, checkpointed LSN
resume) lives in `connect_spark/sources/cdc_stream.py` and is proven
by `tests/test_cdc_stream.py` (resume-mid-stream, deterministic
replay) — streaming isn't SQL-expressible, so THIS entry pins the
apply semantics instead: a deterministic change log (snapshot `read`
rows + inserts + updates + deletes with monotonically increasing
sequence numbers, the envelope of
internal/impl/postgresql/input_pg_stream.go:86-89) replayed into the
final materialized table with last-writer-wins per key and delete
tombstones — exactly what `apply_cdc_batch` does per micro-batch.

Scale: the only shuffle is the per-key window over the change log —
the same single hash-partition a 100-TB streaming apply does per
micro-batch (change batches are small relative to state; state lookup
is the KV store's problem, not a join here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from connect_spark.catalog import load_table
from connect_spark.queries import QuerySpec


def cdc_materialize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")

    def frame(pred, op, seq, status, price):
        return orders.filter(pred).select(
            k.alias("o_orderkey"),
            F.lit(op).alias("operation"),
            seq.cast("bigint").alias("_seq"),
            status.alias("status"),
            price.alias("price"),
        )

    log = (
        # snapshot pinned at seq 0
        frame(k % 10 < 8, "read", F.lit(0), F.col("o_orderstatus"),
              F.col("o_totalprice"))
        # rows created after the snapshot
        .unionByName(frame(k % 10 >= 8, "insert", F.lit(1_000_000_000) + k,
                           F.col("o_orderstatus"), F.col("o_totalprice")))
        # later updates (win over snapshot/insert by seq)
        .unionByName(frame(k % 5 == 0, "update", F.lit(2_000_000_000) + k,
                           F.lit("X"), F.col("o_totalprice") + F.lit(1.0)))
        # tombstones
        .unionByName(frame(k % 13 == 0, "delete", F.lit(3_000_000_000) + k,
                           F.lit(None).cast("string"),
                           F.lit(None).cast("double")))
    )

    w = Window.partitionBy("o_orderkey").orderBy(F.col("_seq").desc())
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("operation") != "delete"))
        .select(
            "o_orderkey",
            F.col("operation").alias("src_op"),
            "status",
            "price",
        )
    )


CDC_MATERIALIZE_SQL = """
WITH log AS (
  SELECT o_orderkey, 'read' AS operation, 0 AS seq,
         o_orderstatus AS status, o_totalprice AS price
  FROM orders WHERE o_orderkey % 10 < 8
  UNION ALL
  SELECT o_orderkey, 'insert', 1000000000 + o_orderkey,
         o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 10 >= 8
  UNION ALL
  SELECT o_orderkey, 'update', 2000000000 + o_orderkey,
         'X', o_totalprice + 1.0
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, 'delete', 3000000000 + o_orderkey, NULL, NULL
  FROM orders WHERE o_orderkey % 13 = 0
), latest AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
  FROM log
)
SELECT o_orderkey, operation AS src_op, status, price
FROM latest WHERE rn = 1 AND operation <> 'delete'
"""


def cdc_pgoutput_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real pgoutput wire-format decode → materialize (round-4 verdict
    task #1): a change log derived from `orders` is RECORDED as binary
    pgoutput COPY-BOTH frames (Relation/Begin/Insert/Update/Delete/
    Commit — the exact logical-replication bytes a PostgreSQL server
    emits, sources/pgoutput.py), decoded back through the independent
    binary decoder, and the decoded envelope is materialized in Spark
    with last-writer-wins per key.  The oracle reproduces the SAME
    change semantics directly in SQL — so a decoder bug (wrong tuple
    category, endianness, type normalization, LSN ordering) breaks the
    value hash.

    The fixture recording is a bounded driver-side control path
    (~150 rows at sf0.01 — recording a replication session is
    inherently a single-connection concern, as in the reference);
    decode+materialize of the envelope is the distributed part.
    """
    from connect_spark.sources.cdc_stream import CDC_ENVELOPE, _rec_to_row
    from connect_spark.sources.pgoutput import (
        OID_FLOAT8,
        OID_INT8,
        OID_TEXT,
        PgoutputFixtureWriter,
        decode_pgoutput_bytes,
    )

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        # fixture recording is a bounded single-connection control
        # path: cap the collect so it stays O(1) at ANY scale factor
        # (r14 verdict task #5; never binds below sf~3)
        .orderBy("o_orderkey")
        .limit(5000)
    )
    rows = sorted(
        (r.o_orderkey, r.o_orderstatus, r.o_totalprice)
        for r in orders.collect()
    )
    w = PgoutputFixtureWriter()
    w.relation(16385, "orders", [
        ("o_orderkey", OID_INT8),
        ("o_orderstatus", OID_TEXT),
        ("o_totalprice", OID_FLOAT8),
    ])
    w.begin(commit_ts_us=1_000_000, xid=1)
    for k, s, p in rows:
        w.insert({"o_orderkey": k, "o_orderstatus": s,
                  "o_totalprice": repr(p)})
    w.commit(commit_ts_us=1_000_000)
    w.begin(commit_ts_us=2_000_000, xid=2)
    for k, s, p in rows:
        if k % 300 == 0:
            w.update({"o_orderkey": k, "o_orderstatus": "X",
                      "o_totalprice": repr(p + 1.0)},
                     before={"o_orderkey": k}, key_only=True)
    for k, _s, _p in rows:
        if k % 700 == 0:
            w.delete({"o_orderkey": k})
    w.commit(commit_ts_us=2_000_000)
    w.copy_done()

    recs = [
        r for r in decode_pgoutput_bytes(w.getvalue())
        if r["operation"] not in ("begin", "commit")
    ]
    env = spark.createDataFrame(
        [_rec_to_row(r) for r in recs], CDC_ENVELOPE)
    parsed = env.select(
        "lsn", "operation",
        F.coalesce(
            F.get_json_object("after", "$.o_orderkey"),
            F.get_json_object("before", "$.o_orderkey"),
        ).cast("bigint").alias("o_orderkey"),
        F.get_json_object("after", "$.o_orderstatus").alias("status"),
        F.get_json_object("after", "$.o_totalprice")
            .cast("double").alias("price"),
    )
    w_ = Window.partitionBy("o_orderkey").orderBy(F.col("lsn").desc())
    return (
        parsed.withColumn("_rn", F.row_number().over(w_))
        .filter((F.col("_rn") == 1) & (F.col("operation") != "delete"))
        .select(
            "o_orderkey",
            F.col("operation").alias("src_op"),
            "status",
            "price",
        )
    )


CDC_PGOUTPUT_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 100 = 0
  ORDER BY o_orderkey LIMIT 5000
), log AS (
  SELECT o_orderkey, 'insert' AS operation, o_orderkey AS seq,
         o_orderstatus AS status, o_totalprice AS price
  FROM base
  UNION ALL
  SELECT o_orderkey, 'update', 1000000000 + o_orderkey,
         'X', o_totalprice + 1.0
  FROM base WHERE o_orderkey % 300 = 0
  UNION ALL
  SELECT o_orderkey, 'delete', 2000000000 + o_orderkey, NULL, NULL
  FROM base WHERE o_orderkey % 700 = 0
), latest AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
  FROM log
)
SELECT o_orderkey, operation AS src_op, status, price
FROM latest WHERE rn = 1 AND operation <> 'delete'
"""


def cdc_binlog_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real MySQL binlog ROW-format decode → materialize (round-4
    verdict task #2): a change log derived from `customer` is RECORDED
    as v4 binlog files (FDE/GTID/BEGIN/TABLE_MAP/WRITE/UPDATE/DELETE_
    ROWS v2/XID — sources/binlog.py), decoded back through the
    independent event decoder (including NEWDECIMAL packed decimals),
    and materialized last-writer-wins on the binlog coordinates.  The
    oracle reproduces the change semantics in SQL, so an endianness /
    bitmap / packed-decimal / coordinate-ordering bug breaks the hash.
    Fixture recording is the bounded driver-side control path; the
    envelope materialization is the distributed part."""
    from connect_spark.sources.binlog import (
        BinlogDecoder,
        BinlogFixtureWriter,
        T_LONGLONG,
        T_NEWDECIMAL,
        T_VARCHAR,
        decode_binlog_bytes,
    )
    from connect_spark.sources.cdc_stream import CDC_ENVELOPE, _rec_to_row

    cols = [("c_custkey", T_LONGLONG, 0), ("c_name", T_VARCHAR, 64),
            ("c_acctbal", T_NEWDECIMAL, (14 << 8) | 2)]
    names = {"tpch.customer": ["c_custkey", "c_name", "c_acctbal"]}

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", "c_name", "c_acctbal")
        # bounded fixture recording (r14 verdict task #5): O(1) collect
        .orderBy("c_custkey")
        .limit(5000)
    )
    rows = sorted(
        (r.c_custkey, r.c_name, r.c_acctbal) for r in cust.collect()
    )
    w = BinlogFixtureWriter(ts=1_700_000_000)
    w.gtid("ab" * 16, 1)
    w.begin()
    w.table_map(7, "tpch", "customer", cols)
    w.write_rows([
        {"c_custkey": k, "c_name": n, "c_acctbal": f"{b:.2f}"}
        for k, n, b in rows
    ])
    w.xid(1)
    w2 = BinlogFixtureWriter(ts=1_700_000_100)
    w2.gtid("ab" * 16, 2)
    w2.begin()
    w2.table_map(7, "tpch", "customer", cols)
    w2.update_rows([
        ({"c_custkey": k, "c_name": n, "c_acctbal": f"{b:.2f}"},
         {"c_custkey": k, "c_name": "UPDATED",
          "c_acctbal": f"{b + 10.0:.2f}"})
        for k, n, b in rows if k % 30 == 0
    ])
    w2.delete_rows([
        {"c_custkey": k, "c_name": n, "c_acctbal": f"{b:.2f}"}
        for k, n, b in rows if k % 70 == 0
    ])
    w2.xid(2)

    dec = BinlogDecoder(column_names=names)
    recs = [
        r
        for seq, blob in enumerate([w.getvalue(), w2.getvalue()])
        for r in decode_binlog_bytes(blob, dec, file_seq=seq)
        if r["operation"] not in ("begin", "commit")
    ]
    env = spark.createDataFrame(
        [_rec_to_row(r) for r in recs], CDC_ENVELOPE)
    parsed = env.select(
        "lsn", "operation",
        F.coalesce(
            F.get_json_object("after", "$.c_custkey"),
            F.get_json_object("before", "$.c_custkey"),
        ).cast("bigint").alias("c_custkey"),
        F.get_json_object("after", "$.c_name").alias("name"),
        F.get_json_object("after", "$.c_acctbal")
            .cast("double").alias("acctbal"),
    )
    w_ = Window.partitionBy("c_custkey").orderBy(F.col("lsn").desc())
    return (
        parsed.withColumn("_rn", F.row_number().over(w_))
        .filter((F.col("_rn") == 1) & (F.col("operation") != "delete"))
        .select(
            "c_custkey",
            F.col("operation").alias("src_op"),
            "name",
            "acctbal",
        )
    )


CDC_BINLOG_SQL = """
WITH base AS (
  SELECT c_custkey, c_name, c_acctbal
  FROM customer WHERE c_custkey % 10 = 0
  ORDER BY c_custkey LIMIT 5000
), log AS (
  SELECT c_custkey, 'insert' AS operation, c_custkey AS seq,
         c_name AS name, CAST(printf('%.2f', c_acctbal) AS DOUBLE) AS acctbal
  FROM base
  UNION ALL
  SELECT c_custkey, 'update', 1000000000 + c_custkey,
         'UPDATED', CAST(printf('%.2f', c_acctbal + 10.0) AS DOUBLE)
  FROM base WHERE c_custkey % 30 = 0
  UNION ALL
  SELECT c_custkey, 'delete', 2000000000 + c_custkey, NULL, NULL
  FROM base WHERE c_custkey % 70 = 0
), latest AS (
  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
  FROM log
)
SELECT c_custkey, operation AS src_op, name, acctbal
FROM latest WHERE rn = 1 AND operation <> 'delete'
"""


def cdc_logminer_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle LogMiner SQL_REDO decode → materialize (round 5;
    internal/impl/oracledb/logminer/sqlredo): redo statements are
    BUILT from `supplier` as Column algebra (with proper '' escaping
    of embedded quotes), parsed back through the independent SQL_REDO
    parser (sources/sqlredo.py) in an Arrow-batched mapInPandas —
    fully distributed, no driver collect — then materialized
    last-writer-wins on SCN.  The oracle reproduces the change
    semantics in SQL, so a parser bug (quote escapes, NULLs, aliases,
    WHERE extraction) breaks the value hash."""
    import json as _json

    sup = load_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    esc = lambda c: F.regexp_replace(c, "'", "''")  # noqa: E731
    bal = F.format_number(F.col("s_acctbal").cast("double"), 4)
    bal = F.regexp_replace(bal, ",", "")  # format_number inserts commas

    ins = sup.select(
        k.cast("bigint").alias("scn"),
        F.concat(
            F.lit('insert into "TPCH"."SUPPLIER" ("ID","NAME","BAL") '
                  "values ('"),
            k.cast("string"), F.lit("','"), esc(F.col("s_name")),
            F.lit("','"), bal, F.lit("')"),
        ).alias("sql_redo"),
    )
    upd = sup.filter(k % 7 == 0).select(
        (F.lit(1_000_000_000) + k).alias("scn"),
        F.concat(
            F.lit('update "TPCH"."SUPPLIER" a set a."NAME" = '
                  "'RENAMED', a.\"BAL\" = NULL where a.\"ID\" = '"),
            k.cast("string"), F.lit("'"),
        ).alias("sql_redo"),
    )
    dele = sup.filter(k % 13 == 0).select(
        (F.lit(2_000_000_000) + k).alias("scn"),
        F.concat(
            F.lit('delete from "TPCH"."SUPPLIER" where "ID" = \''),
            k.cast("string"), F.lit("'"),
        ).alias("sql_redo"),
    )
    log = ins.unionByName(upd).unionByName(dele)

    def parse(batches):
        import pandas as _pd

        from connect_spark.sources.sqlredo import parse_redo

        for pdf in batches:
            out = {"scn": [], "operation": [], "sup_id": [],
                   "name": [], "bal": []}
            for scn, sql in zip(pdf["scn"], pdf["sql_redo"]):
                st = parse_redo(sql)
                img = st.new_values or {}
                key = img.get("ID") or st.old_values.get("ID")
                out["scn"].append(int(scn))
                out["operation"].append(st.operation)
                out["sup_id"].append(int(key))
                out["name"].append(img.get("NAME"))
                out["bal"].append(img.get("BAL"))
            yield _pd.DataFrame(out)

    parsed = log.mapInPandas(
        parse,
        "scn LONG, operation STRING, sup_id LONG, name STRING, "
        "bal STRING",
    )
    w_ = Window.partitionBy("sup_id").orderBy(F.col("scn").desc())
    return (
        parsed.withColumn("_rn", F.row_number().over(w_))
        .filter((F.col("_rn") == 1) & (F.col("operation") != "delete"))
        .select(
            "sup_id",
            F.col("operation").alias("src_op"),
            "name",
            # the update image explicitly sets BAL = NULL, so the
            # winning image's BAL is the final value as-is
            F.col("bal").cast("double").alias("bal_v"),
        )
    )


CDC_LOGMINER_SQL = """
WITH log AS (
  SELECT s_suppkey AS sup_id, 'insert' AS operation, s_suppkey AS scn,
         s_name AS name,
         CAST(printf('%.4f', CAST(s_acctbal AS DOUBLE)) AS DOUBLE)
           AS bal_v
  FROM supplier
  UNION ALL
  SELECT s_suppkey, 'update', 1000000000 + s_suppkey, 'RENAMED', NULL
  FROM supplier WHERE s_suppkey % 7 = 0
  UNION ALL
  SELECT s_suppkey, 'delete', 2000000000 + s_suppkey, NULL, NULL
  FROM supplier WHERE s_suppkey % 13 = 0
), latest AS (
  SELECT *, row_number() OVER (PARTITION BY sup_id ORDER BY scn DESC)
           AS rn
  FROM log
)
SELECT sup_id, operation AS src_op, name, bal_v
FROM latest WHERE rn = 1 AND operation <> 'delete'
"""


QUERIES = [
    QuerySpec("cdc_materialize_orders", cdc_materialize_orders,
              CDC_MATERIALIZE_SQL, headline=True),
    QuerySpec("cdc_pgoutput_decode", cdc_pgoutput_decode,
              CDC_PGOUTPUT_SQL),
    QuerySpec("cdc_binlog_decode", cdc_binlog_decode,
              CDC_BINLOG_SQL),
    QuerySpec("cdc_logminer_decode", cdc_logminer_decode,
              CDC_LOGMINER_SQL),
]
