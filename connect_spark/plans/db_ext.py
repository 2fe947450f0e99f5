"""Database / KV / warehouse / search connector kinds.

Covers the reference's §2.D "DB queries" inputs and §2.E "Databases",
"Lakehouse / warehouse" and "Search / vector" outputs
(docs/modules/components/pages/{inputs,outputs}/<name>.adoc) on the
backends this repo already proves out:

- document/KV stores (mongodb, couchbase, azure_cosmosdb,
  azure_table_storage, aws_dynamodb, redis_hash, nats_kv) →
  `state/cache.py::ParquetKVCache` — a real upsert/lookup store with
  TTL + generational compaction; a cluster swaps the client, the
  config surface and plan shape stay identical.
- SQL-speaking services (cassandra, gcp_bigquery(_select), timeplus,
  azure_cosmosdb queries, aws_dynamodb_partiql) → out-of-engine
  DuckDB execution against a storage file (the same REAL-external-DB
  contract as the `duckdb` kinds in plans/io_ext.py).
- warehouse file-staging sinks (snowflake_put/streaming, arc) → the
  stage-directory / Iceberg-append semantics they document.
- HTTP-protocol sinks (elasticsearch_v8/v9, opensearch, splunk_hec,
  doris_stream_load, questdb ILP, cypher, pusher) → request bodies
  built as Column algebra, shipped through the injectable transport
  registry (plans/processors_ext.register_http_transport) exactly
  like the audited es_bulk_write path.
- vector stores (pinecone, qdrant, cyborgdb) →
  `sinks/search.py::VectorSink`.

MongoDB find filters translate the documented query-operator subset
($eq implicit, $ne/$gt/$gte/$lt/$lte/$in, $and/$or) into Column
predicates so the filter pushes into the scan.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from connect_spark.plans.pipeline import (
    PipelineConfigError,
    input_kind,
    output_kind,
    processor,
)


# --------------------------------------------------------------------
# KV/document-store family
# --------------------------------------------------------------------

# kind -> (identity fields, store-path key fallbacks, default key col)
_KV_KINDS: dict[str, tuple[tuple[str, ...], str]] = {
    # outputs/mongodb.adoc (url, database, collection, operation)
    "mongodb": (("url", "database", "collection"), "_id"),
    # outputs/couchbase.adoc (url, bucket, id)
    "couchbase": (("url", "bucket"), "id"),
    # outputs/azure_cosmosdb.adoc (endpoint, database, container)
    "azure_cosmosdb": (("database", "container"), "id"),
    # outputs/azure_table_storage.adoc (table_name, partition_key)
    "azure_table_storage": (("table_name",), "row_key"),
    # outputs/aws_dynamodb.adoc (table, string_columns)
    "aws_dynamodb": (("table",), "id"),
    # outputs/redis_hash.adoc (url, key, fields)
    "redis_hash": (("key",), "key"),
    # outputs/nats_kv.adoc (bucket, key)
    "nats_kv": (("bucket",), "key"),
}


def _kv_store(df_or_spark, c: dict, default_key: str):
    from connect_spark.state.cache import ParquetKVCache

    spark = (
        df_or_spark
        if isinstance(df_or_spark, SparkSession)
        else df_or_spark.sparkSession
    )
    path = c.get("store_path") or c.get("path")
    if not path:
        raise PipelineConfigError(
            "no live store connection is available in this environment; "
            "`store_path` names the local store directory (a cluster "
            "impl swaps the client behind the same config)"
        )
    return ParquetKVCache(
        spark, path, key=c.get("key_column", default_key)
    )


def _kv_output(kind: str, identity: tuple[str, ...], default_key: str):
    def write(df: DataFrame, c: dict) -> None:
        for k in identity:
            if not c.get(k):
                raise PipelineConfigError(
                    f"{kind} output: {k!r} is required "
                    f"(outputs/{kind}.adoc)"
                )
        store = _kv_store(df, c, default_key)
        key = c.get("key_column", default_key)
        if key not in df.columns:
            raise PipelineConfigError(
                f"{kind} output: key column {key!r} not in "
                f"{df.columns} (set key_column)"
            )
        store.set(df, ttl=c.get("ttl"))

    write.__name__ = f"_o_{kind}"
    write.__doc__ = f"outputs/{kind}.adoc — document upsert keyed by " \
        "the configured key column (module docstring)."
    return write


for _kind, (_identity, _key) in _KV_KINDS.items():
    output_kind(_kind)(_kv_output(_kind, _identity, _key))


def _mongo_filter_to_column(query: dict) -> Column:
    """MongoDB find-filter subset → Column predicate (module doc)."""
    conds: list[Column] = []
    for field_name, spec in query.items():
        if field_name == "$and":
            sub = [_mongo_filter_to_column(q) for q in spec]
            c = sub[0]
            for s in sub[1:]:
                c = c & s
            conds.append(c)
            continue
        if field_name == "$or":
            sub = [_mongo_filter_to_column(q) for q in spec]
            c = sub[0]
            for s in sub[1:]:
                c = c | s
            conds.append(c)
            continue
        col = F.col(field_name)
        if not isinstance(spec, dict):
            conds.append(col == F.lit(spec))
            continue
        for op, val in spec.items():
            if op == "$eq":
                conds.append(col == F.lit(val))
            elif op == "$ne":
                conds.append(col != F.lit(val))
            elif op == "$gt":
                conds.append(col > F.lit(val))
            elif op == "$gte":
                conds.append(col >= F.lit(val))
            elif op == "$lt":
                conds.append(col < F.lit(val))
            elif op == "$lte":
                conds.append(col <= F.lit(val))
            elif op == "$in":
                conds.append(col.isin(list(val)))
            else:
                raise PipelineConfigError(
                    f"unsupported mongo operator {op!r}"
                )
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out


@input_kind("mongodb")
def _i_mongodb(spark: SparkSession, c: dict) -> DataFrame:
    """inputs/mongodb.adoc — find over a collection with the
    query-operator subset translated to pushed-down predicates."""
    for k in ("url", "database", "collection"):
        if not c.get(k):
            raise PipelineConfigError(f"mongodb input: {k!r} is required")
    store = _kv_store(spark, c, "_id")
    df = store.read()
    if df is None:
        raise PipelineConfigError(
            f"mongodb input: store at {c.get('store_path')!r} is empty"
        )
    q = c.get("query")
    if q:
        if isinstance(q, str):
            q = json.loads(q)
        df = df.filter(_mongo_filter_to_column(q))
    return df


@processor("mongodb")
def _p_mongodb(df: DataFrame, conf: dict) -> DataFrame:
    """processors/mongodb.adoc — operation find-one (enrichment
    lookup join on the key), insert-one (upsert side-effect, rows pass
    through) or delete-one."""
    op = conf.get("operation", "find-one")
    store = _kv_store(df, conf, "_id")
    key = conf.get("key_column", store.key)
    if op == "find-one":
        return store.get(df, on=key)
    if op == "insert-one":
        rows = df.select(
            F.col(key).alias(store.key),
            *[F.col(x) for x in conf.get("value_columns", [])],
        )
        store.set(rows)
        return df
    if op == "delete-one":
        store.delete(df.select(F.col(key).alias(store.key)))
        return df
    raise PipelineConfigError(f"mongodb processor: unknown op {op!r}")


@input_kind("azure_cosmosdb")
def _i_azure_cosmosdb(spark: SparkSession, c: dict) -> DataFrame:
    """inputs/azure_cosmosdb.adoc — Cosmos SQL-API query; the SQL
    statement executes out-of-engine against the storage database
    (module docstring)."""
    for k in ("database", "container"):
        if not c.get(k):
            raise PipelineConfigError(
                f"azure_cosmosdb input: {k!r} is required"
            )
    return _duck_query(spark, c.get("storage", ":memory:"), c["query"])


def _kv_processor(kind: str, default_key: str, ops: dict[str, str]):
    """KV-store processor family (processors/{couchbase,
    azure_cosmosdb,nats_kv}.adoc): per-operation dispatch onto the
    cache store — lookups are enrichment joins, mutations are
    pass-through side-effects (the mongodb processor shape)."""

    def run(df: DataFrame, conf: dict) -> DataFrame:
        op = conf.get("operation", next(iter(ops)))
        if op not in ops:
            raise PipelineConfigError(
                f"{kind} processor: unknown operation {op!r}; "
                f"known: {sorted(ops)}"
            )
        store = _kv_store(df, conf, default_key)
        key = conf.get("key_column", store.key)
        verb = ops[op]
        if verb == "get":
            return store.get(df, on=key)
        rows = df.select(
            F.col(key).alias(store.key),
            *[F.col(x) for x in conf.get("value_columns", [])],
        )
        if verb == "set":
            store.set(rows)
        elif verb == "add":
            store.add(rows)
        elif verb == "delete":
            store.delete(rows.select(store.key))
        return df

    run.__name__ = f"_p_{kind}"
    run.__doc__ = f"processors/{kind}.adoc — KV operations over the " \
        "store (module docstring)."
    return run


# processors/couchbase.adoc: get/insert/remove/replace/upsert
processor("couchbase")(_kv_processor("couchbase", "id", {
    "get": "get", "insert": "add", "upsert": "set",
    "replace": "set", "remove": "delete",
}))
# processors/azure_cosmosdb.adoc: create/read/replace/upsert/delete
processor("azure_cosmosdb")(_kv_processor("azure_cosmosdb", "id", {
    "read": "get", "create": "add", "upsert": "set",
    "replace": "set", "delete": "delete",
}))
# processors/nats_kv.adoc: get/create/put/delete
processor("nats_kv")(_kv_processor("nats_kv", "key", {
    "get": "get", "create": "add", "put": "set", "delete": "delete",
}))


@input_kind("nats_kv")
def _i_nats_kv(spark: SparkSession, c: dict) -> DataFrame:
    """inputs/nats_kv.adoc — watch a KV bucket: emit current entries."""
    store = _kv_store(spark, c, "key")
    df = store.read()
    if df is None:
        return spark.createDataFrame([], f"{store.key} string")
    return df


@input_kind("azure_table_storage")
def _i_azure_table(spark: SparkSession, c: dict) -> DataFrame:
    """inputs/azure_table_storage.adoc — table scan with an optional
    `filter` SQL expression."""
    store = _kv_store(spark, c, "row_key")
    df = store.read()
    if df is None:
        return spark.createDataFrame([], f"{store.key} string")
    if c.get("filter"):
        df = df.filter(c["filter"])
    return df


# --------------------------------------------------------------------
# SQL-speaking external services → DuckDB out-of-engine execution
# --------------------------------------------------------------------


def _duck_query(spark: SparkSession, database: str, query: str) -> DataFrame:
    import duckdb

    con = duckdb.connect(database or ":memory:")
    try:
        tbl = con.execute(query).fetch_arrow_table()
    finally:
        con.close()
    return spark.createDataFrame(tbl.to_pandas())


def _duck_insert(df: DataFrame, database: str, table: str) -> None:
    from connect_spark.plans.io_ext import _o_duckdb

    _o_duckdb(df, {"database": database, "table": table})


@input_kind("cassandra")
def _i_cassandra(spark: SparkSession, c: dict) -> DataFrame:
    """inputs/cassandra.adoc — execute a CQL SELECT. CQL's SELECT
    grammar is a SQL subset, so the statement runs out-of-engine
    against the configured storage database (module docstring)."""
    if not c.get("addresses"):
        raise PipelineConfigError("cassandra input: addresses required")
    return _duck_query(spark, c.get("database", ":memory:"), c["query"])


@input_kind("gcp_bigquery_select")
def _i_bq_select(spark: SparkSession, c: dict) -> DataFrame:
    """inputs/gcp_bigquery_select.adoc — project/table/columns/where
    compose the SELECT (the squirrel-builder shape the reference uses,
    internal/impl/sql/processor_sql_select.go:157)."""
    cols = ", ".join(c.get("columns", ["*"]))
    q = f"SELECT {cols} FROM {c['table'].split('.')[-1]}"
    if c.get("where"):
        q += f" WHERE {c['where']}"
    if c.get("suffix"):
        q += f" {c['suffix']}"
    return _duck_query(spark, c.get("database", ":memory:"), q)


@processor("gcp_bigquery_select")
def _p_bq_select(df: DataFrame, conf: dict) -> DataFrame:
    """processors/gcp_bigquery_select.adoc — enrichment join against
    the external table (set-based, like the sql_select processor)."""
    from connect_spark.operators.joins import enrichment_join

    lookup = _i_bq_select(df.sparkSession, conf)
    return enrichment_join(
        df, lookup, on=conf["on"], how=conf.get("how", "left")
    )


@input_kind("timeplus")
def _i_timeplus(spark: SparkSession, c: dict) -> DataFrame:
    """inputs/timeplus.adoc — streaming-SQL service query (batch
    table query here; same SELECT surface)."""
    return _duck_query(spark, c.get("database", ":memory:"), c["query"])


@processor("aws_dynamodb_partiql")
def _p_partiql(df: DataFrame, conf: dict) -> DataFrame:
    """processors/aws_dynamodb_partiql.adoc — PartiQL statements are
    SQL-compatible for SELECT/INSERT; execute per unique args against
    the storage database and join results back (set-based)."""
    q = conf["query"]
    res = _duck_query(df.sparkSession, conf.get("database", ":memory:"), q)
    if conf.get("on"):
        from connect_spark.operators.joins import enrichment_join

        return enrichment_join(df, res, on=conf["on"], how="left")
    return res


# warehouse inserts: kind -> table-name config keys
_WAREHOUSE_OUTPUTS = {
    # outputs/gcp_bigquery.adoc (project.dataset.table)
    "gcp_bigquery": ("table", "dataset"),
    # outputs/gcp_bigquery_write_api.adoc
    "gcp_bigquery_write_api": ("table", "dataset"),
    # outputs/cassandra.adoc (CQL INSERT via query)
    "cassandra": ("table", "keyspace"),
    # outputs/timeplus.adoc
    "timeplus": ("stream", "table"),
    # outputs/azure_cosmosdb.adoc handled by the KV family above
    # outputs/bigquery_cdc_migration.adoc (CDC rows into BQ)
    "bigquery_cdc_migration": ("table", "dataset"),
    # outputs/sql_insert.adoc / sql.adoc / sql_raw.adoc
    "sql_insert": ("table",),
    "sql": ("table",),
    "sql_raw": ("table",),
}


def _warehouse_output(kind: str, table_keys: tuple[str, ...]):
    def write(df: DataFrame, c: dict) -> None:
        table = None
        for k in table_keys:
            if c.get(k):
                table = str(c[k]).split(".")[-1]
                break
        if table is None:
            raise PipelineConfigError(
                f"{kind} output: one of {table_keys} is required"
            )
        if c.get("database"):
            _duck_insert(df, c["database"], table)
        elif c.get("path"):
            df.write.mode(c.get("mode", "append")).parquet(c["path"])
        else:
            raise PipelineConfigError(
                f"{kind} output: `database` (DuckDB file) or `path` "
                "(parquet table) names the destination"
            )

    write.__name__ = f"_o_{kind}"
    write.__doc__ = f"outputs/{kind}.adoc — batch insert into the " \
        "external database (module docstring)."
    return write


for _kind, _tkeys in _WAREHOUSE_OUTPUTS.items():
    output_kind(_kind)(_warehouse_output(_kind, _tkeys))


@output_kind("snowflake_put")
def _o_snowflake_put(df: DataFrame, c: dict) -> None:
    """outputs/snowflake_put.adoc — PUT files into a stage: the
    documented semantic is staged file upload, so rows land as files
    under `stage_path` in the configured file_format."""
    fmt = c.get("file_format", "parquet")
    path = c["stage_path"]
    if fmt == "parquet":
        df.write.mode("append").parquet(path)
    elif fmt == "json":
        df.write.mode("append").json(path)
    elif fmt == "csv":
        df.write.mode("append").options(header="true").csv(path)
    else:
        raise PipelineConfigError(f"unsupported file_format {fmt!r}")


@output_kind("snowflake_streaming")
def _o_snowflake_streaming(df: DataFrame, c: dict) -> None:
    """outputs/snowflake_streaming.adoc — Snowpipe Streaming channel
    appends built as REAL bdec blobs (streaming.go:462-545): each
    executor partition writes one zstd-parquet chunk encrypted with the
    path-diversified AES-256-CTR key (compat.go:55-87) under
    `<stage_path>/blobs/`, chunk-registration rows land as parquet
    under `<stage_path>/chunks/`, and the registerBlobRequest JSON
    (rest.go:222-236) — driver-assembled from the partition-count-sized
    chunk rows, the same control-plane shape as an iceberg commit —
    is written to `<stage_path>/register_<run_id>.json` (run-unique so
    repeated appends never clobber an earlier run's request). Live
    HTTPS registration is the one sandbox-gated step."""
    import base64
    import json as _json
    import os

    from connect_spark.sinks.snowflake_ingest import (
        bdec_chunks,
        blob_metadata,
        register_blob_request,
    )

    import time
    import uuid

    stage = c["stage_path"]
    key = c.get("encryption_key",
                base64.b64encode(bytes(32)).decode())
    channel = c.get("channel_name", "default")
    # blob paths must be unique PER INVOCATION (the reference threads
    # wall-clock + client prefix + counter, compat.go:100): a repeated
    # run on the same stage must add blobs, never overwrite ones whose
    # registration rows were already appended
    run_id = c.get("run_id") or f"{channel}-{uuid.uuid4().hex[:8]}"
    # run_id flows into file names (register_<run_id>.json and blob
    # paths): a channel name with '/' or other path chars must not
    # escape the stage dir
    run_id = "".join(ch if ch.isalnum() or ch in "-_." else "_"
                     for ch in run_id)
    chunks = bdec_chunks(df, key, client_prefix=run_id,
                         now_s=int(c.get("now_s", time.time())),
                         stage_dir=os.path.join(stage, "blobs"))
    meta = chunks.drop("blob").cache()
    meta.write.mode("append").parquet(os.path.join(stage, "chunks"))
    blobs = [
        blob_metadata(
            r.blob_path, b"", {
                "chunk_start_offset": 0,
                "chunk_length": r.chunk_length,
                "chunk_length_uncompressed": r.chunk_length_uncompressed,
                "chunk_md5": r.chunk_md5,
                "eps": _json.loads(r.eps_json),
            },
            database=c.get("database", "db"),
            schema=c.get("schema", "public"),
            table=c.get("table", "t"), channel=channel,
        ) | {"md5": r.blob_md5}
        for r in meta.collect()  # one row per partition: control plane
    ]
    # one registration request per invocation, named by the run id so
    # earlier runs' requests survive on the stage
    with open(os.path.join(stage, f"register_{run_id}.json"), "w") as f:
        f.write(register_blob_request(
            blobs, request_id=c.get("request_id", run_id),
            role=c.get("role", "ingest")))
    meta.unpersist()


@output_kind("arc")
def _o_arc(df: DataFrame, c: dict) -> None:
    """outputs/arc.adoc — managed-lakehouse append: Iceberg-v2 commit
    to the table location (sinks/iceberg_meta.py)."""
    from connect_spark.sinks.iceberg_meta import IcebergTable

    IcebergTable(df.sparkSession, c["location"]).append(df)


# --------------------------------------------------------------------
# HTTP-protocol sinks via the injectable transport
# --------------------------------------------------------------------


def _transport(c: dict):
    from connect_spark.plans.processors_ext import get_http_transport

    return get_http_transport(c)



def _payload_cols(df: DataFrame) -> list[str]:
    """Message columns only — reserved `_cs_*` plumbing columns (the
    batching split id) never enter a delivered payload."""
    return [x for x in df.columns if not x.startswith("_cs_")]

def _post_lines(df: DataFrame, line: Column, url: str, c: dict,
                batch_header: str | None = None) -> None:
    """One POST per partition, body = newline-joined lines — the
    bulk-request shape (sinks/search.py es_bulk_lines pattern).

    When an output batching policy formed batches, the reserved
    `_cs_batch_id` column rides along: hash repartitioning keeps each
    batch whole in one partition but may co-locate several batches, so
    requests split per batch id WITHIN the partition — one POST per
    formed batch, never a merged over-sized body (round-4 ADVICE #3).
    """
    t = _transport(c)
    headers = dict(c.get("headers", {}))
    has_batch = "_cs_batch_id" in df.columns
    if has_batch:
        rows = df.select(line.alias("_l"), F.col("_cs_batch_id").alias("_b"))
    else:
        rows = df.select(line.alias("_l"), F.lit(0).alias("_b"))
    # one request per partition, streamed through the driver one
    # partition at a time (the http_output_batches_raw pattern —
    # injectable transports are driver-resident; a cluster impl moves
    # the client into foreachPartition unchanged). `max_in_flight`
    # (every output's delivery-concurrency knob, e.g.
    # outputs/elasticsearch_v8.adoc) overlaps that many requests.
    max_in_flight = int(c.get("max_in_flight", 1))

    def bodies():
        for part in rows.rdd.map(tuple).glom().toLocalIterator():
            groups: dict = {}
            for val, bid in part:
                groups.setdefault(bid, []).append(val)
            for bid in sorted(groups, key=lambda x: (x is None, x)):
                body = "\n".join(x for x in groups[bid] if x is not None)
                if body:
                    yield (batch_header or "") + body + "\n"

    if max_in_flight <= 1:
        for body in bodies():
            t(url, "POST", headers, body)
        return
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=max_in_flight)
    futures = []
    try:
        for body in bodies():
            futures.append(pool.submit(t, url, "POST", headers, body))
            # bound in-flight futures so a huge frame doesn't buffer
            # every body in driver memory
            while len(futures) >= max_in_flight * 2:
                futures.pop(0).result()
        for f in futures:
            f.result()
    finally:
        # on failure, drop queued bodies instead of delivering them
        # after the error (keeps serial-path stop-at-first-error
        # semantics; requests already on the wire still finish)
        pool.shutdown(wait=True, cancel_futures=True)


def _dict_transport(c: dict):
    """Wrap a registered row transport (url, verb, headers, body) into
    the request-dict Transport shape sinks/search.py expects."""
    row_t = _transport(c)

    def transport(req: dict) -> dict:
        try:
            body = row_t(req["url"], req["verb"], req["headers"],
                         req["body"])
            return {"status": 200, "body": body}
        except Exception as exc:  # noqa: BLE001
            return {"status": 500, "body": str(exc)}

    return transport


@output_kind("elasticsearch_v8")
def _o_es8(df: DataFrame, c: dict) -> None:
    """outputs/elasticsearch_v8.adoc — _bulk NDJSON per partition
    (sinks/search.py::es_bulk_write); `max_in_flight` overlaps bulk
    requests through the shared _post_lines pool."""
    from connect_spark.sinks.search import es_bulk_lines, es_bulk_write

    url = c["urls"][0] if c.get("urls") else c["url"]
    if int(c.get("max_in_flight", 1)) > 1:
        id_col = c.get("id", "id")
        lines = es_bulk_lines(
            df, c["index"], id_col,
            [x for x in _payload_cols(df) if x != id_col],
            carry_cols=[x for x in df.columns if x.startswith("_cs_")],
        )
        _post_lines(lines, F.col("bulk"), url.rstrip("/") + "/_bulk", c)
        return
    es_bulk_write(
        df.drop(*[x for x in df.columns if x.startswith("_cs_")]),
        {"index": c["index"], "url": url}, _dict_transport(c),
        id_col=c.get("id", "id"),
    )


def _register_es_aliases():
    from connect_spark.plans.pipeline import OUTPUT_KINDS

    for alias in ("elasticsearch_v9", "opensearch"):
        OUTPUT_KINDS[alias] = _o_es8


_register_es_aliases()


@output_kind("splunk_hec")
def _o_splunk_hec(df: DataFrame, c: dict) -> None:
    """outputs/splunk_hec.adoc — HEC event envelopes
    ({"event": ..., "sourcetype": ..., "index": ...}) POSTed per
    partition batch."""
    event = F.to_json(F.struct(*_payload_cols(df)))
    envelope = F.to_json(
        F.struct(
            F.from_json(event, "map<string,string>").alias("event"),
            F.lit(c.get("sourcetype", "_json")).alias("sourcetype"),
            F.lit(c.get("index", "main")).alias("index"),
        )
    )
    _post_lines(df, envelope, c["url"], c)


@output_kind("questdb")
def _o_questdb(df: DataFrame, c: dict) -> None:
    """outputs/questdb.adoc — InfluxDB line protocol: one ILP line per
    row (measurement from `table`, every column as a field), POSTed
    per partition to /write."""
    table = c["table"]
    parts: list[Column] = [F.lit(table), F.lit(" ")]
    fields: list[Column] = []
    for name, dtype in df.dtypes:
        if name.startswith("_cs_"):
            continue
        key = F.lit(name + "=")
        if dtype in ("string",):
            val = F.concat(F.lit('"'), F.col(name).cast("string"), F.lit('"'))
        else:
            val = F.col(name).cast("string")
        fields.append(F.concat(key, val))
    parts.append(F.concat_ws(",", *fields))
    _post_lines(df, F.concat(*parts), c["url"].rstrip("/") + "/write", c)


@output_kind("doris_stream_load")
def _o_doris(df: DataFrame, c: dict) -> None:
    """outputs/doris_stream_load.adoc — stream-load PUT of JSON rows
    per partition batch."""
    _post_lines(
        df, F.to_json(F.struct(*_payload_cols(df))),
        f"{c['url'].rstrip('/')}/api/{c['database']}/{c['table']}"
        "/_stream_load", c,
    )


@output_kind("cypher")
def _o_cypher(df: DataFrame, c: dict) -> None:
    """outputs/cypher.adoc — per-row cypher statement with `args_
    mapping`-selected columns POSTed as the neo4j tx-API body."""
    stmt = c["query"]
    args = F.to_json(F.struct(*[F.col(x) for x in c.get("args", [])])) \
        if c.get("args") else F.lit("{}")
    body = F.to_json(F.struct(
        F.lit(stmt).alias("statement"), args.alias("parameters")))
    _post_lines(df, body, c["url"], c)


@output_kind("pusher")
def _o_pusher(df: DataFrame, c: dict) -> None:
    """outputs/pusher.adoc — trigger events on a channel; one event
    per message POSTed batch-wise."""
    body = F.to_json(F.struct(
        F.lit(c["channel"]).alias("channel"),
        F.lit(c["event"]).alias("name"),
        F.to_json(F.struct(*_payload_cols(df))).alias("data"),
    ))
    _post_lines(df, body, c.get("url", "https://api.pusherapp.com"), c)


# --------------------------------------------------------------------
# vector stores
# --------------------------------------------------------------------


def _vector_output(kind: str, id_key: str):
    def write(df: DataFrame, c: dict) -> None:
        from connect_spark.sinks.search import VectorSink

        path = c.get("store_path") or c.get("path")
        if not path:
            raise PipelineConfigError(
                f"{kind} output: `store_path` names the local vector "
                "store (a cluster impl swaps the client)"
            )
        VectorSink(
            df.sparkSession, path, id_col=c.get("id", id_key)
        ).upsert(df)

    write.__name__ = f"_o_{kind}"
    write.__doc__ = f"outputs/{kind}.adoc — vector upsert " \
        "(sinks/search.py::VectorSink; module docstring)."
    return write


for _kind, _idk in (("pinecone", "id"), ("qdrant", "id"),
                    ("cyborgdb", "id")):
    output_kind(_kind)(_vector_output(_kind, _idk))


@processor("qdrant")
def _p_qdrant(df: DataFrame, conf: dict) -> DataFrame:
    """processors/qdrant.adoc — point upsert as a pass-through
    side-effect (the processor form of the output)."""
    _vector_output("qdrant", "id")(df, conf)
    return df


# --------------------------------------------------------------------
# schema_registry input/output (subject sync over a local registry dir)
# --------------------------------------------------------------------


@output_kind("schema_registry")
def _o_schema_registry(df: DataFrame, c: dict) -> None:
    """outputs/schema_registry.adoc — register schemas: rows with
    (subject, schema) land as subject-versioned JSON documents."""
    import os

    os.makedirs(c["path"], exist_ok=True)
    for row in df.select("subject", "schema").toLocalIterator():
        subject, schema = row["subject"], row["schema"]
        existing = sorted(
            f for f in os.listdir(c["path"])
            if f.startswith(subject + "-v")
        )
        version = len(existing) + 1
        with open(
            os.path.join(c["path"], f"{subject}-v{version}.json"),
            "w", encoding="utf-8",
        ) as fh:
            json.dump(
                {"subject": subject, "version": version,
                 "schema": schema}, fh)


@input_kind("schema_registry")
def _i_schema_registry(spark: SparkSession, c: dict) -> DataFrame:
    """inputs/schema_registry.adoc — walk subjects and emit one
    message per schema version (the registry-sync input)."""
    import glob
    import os

    rows = []
    for p in sorted(glob.glob(os.path.join(c["path"], "*.json"))):
        with open(p, encoding="utf-8") as fh:
            doc = json.load(fh)
        rows.append((doc["subject"], int(doc["version"]), doc["schema"]))
    return spark.createDataFrame(
        rows or [], "subject string, version int, schema string"
    )


# partition-granular HTTP sinks that split requests per formed batch
# (_post_lines honors the reserved `_cs_batch_id` column) — registered
# so _run_output keeps the column for them and drops it for all others
def _register_batch_split_kinds():
    from connect_spark.plans.pipeline import BATCH_SPLIT_KINDS

    BATCH_SPLIT_KINDS.update({
        "elasticsearch_v8", "elasticsearch_v9", "opensearch",
        "splunk_hec", "questdb", "doris_stream_load", "cypher",
        "pusher",
    })


_register_batch_split_kinds()
