"""Search and vector-store sinks.

Reference surface: internal/impl/elasticsearch/ (es/opensearch bulk
outputs), plus the vector DB outputs (qdrant/pinecone family). No
search cluster runs in this sandbox, so the split is:

- **Bulk body construction is Column algebra** — the ES bulk NDJSON
  (action line + source line per doc) is built JVM-side per row; the
  POST goes through the injectable HTTP transport
  (sources/http_client.py), which is the real client call on a
  cluster. One bulk request per partition = the reference's batching
  boundary.
- **Vector upsert/delete** lands in a keyed store through the same
  generational ParquetKVCache the CDC sink uses; `search()` runs the
  exact cosine top-k of queries/vectors.py over the stored vectors.
  On a cluster the same `VectorSink` calls a qdrant/pinecone client in
  foreachPartition — the interface (upsert/delete/search) is the
  contract, the local store proves the pipeline.

Streaming: wrap either sink in foreachBatch — one micro-batch = one
bulk/upsert transaction, the reference's delivery unit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from connect_spark.sources.http_client import Transport, http_output_batches
from connect_spark.state.cache import ParquetKVCache


def es_bulk_lines(
    df: DataFrame,
    index: str,
    id_col: str,
    doc_cols: Sequence[str],
    op: str = "index",
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Each row → its two bulk-API lines (action + source) as one
    string column `bulk`; newline-joining a partition of these IS the
    bulk body (elasticsearch output semantics: one bulk per batch).
    `carry_cols` pass through untouched (e.g. the reserved batching
    split id) without entering the document source."""
    action = F.to_json(
        F.struct(
            F.struct(
                F.lit(index).alias("_index"),
                F.col(id_col).cast("string").alias("_id"),
            ).alias(op)
        )
    )
    extra = [F.col(x) for x in carry_cols]
    source = F.to_json(F.struct(*[F.col(c) for c in doc_cols]))
    if op == "delete":
        return df.select(action.alias("bulk"), *extra)
    return df.select(
        F.concat(action, F.lit("\n"), source).alias("bulk"), *extra
    )


def es_bulk_write(
    df: DataFrame,
    conf: dict,
    transport: Transport,
    id_col: str = "id",
    doc_cols: Sequence[str] | None = None,
) -> int:
    """POST one bulk request per partition; returns request count."""
    doc_cols = list(doc_cols or [c for c in df.columns if c != id_col])
    lines = es_bulk_lines(df, conf["index"], id_col, doc_cols)
    url = conf["url"].rstrip("/") + "/_bulk"
    # http_output_batches posts df.toJSON() — bulk lines are already
    # JSON strings, so post the raw column as text lines
    payload = lines.select(F.col("bulk").alias("value"))
    return http_output_batches_raw(payload, url, transport)


def http_output_batches_raw(df: DataFrame, url: str, transport: Transport) -> int:
    """Like http_output_batches but body = raw string column lines."""
    n = 0
    for part in df.rdd.map(lambda r: r[0]).glom().toLocalIterator():
        if not part:
            continue
        transport(
            {
                "url": url,
                "verb": "POST",
                "headers": {"Content-Type": "application/x-ndjson"},
                "body": "\n".join(part) + "\n",
                "attempt": 0,
            }
        )
        n += 1
    return n


class VectorSink:
    """Vector-store sink: upsert/delete/search over (id, vector,
    payload) rows. Local backing = generational parquet KV store;
    cluster backing = swap `cache` for a client-writing implementation
    with the same three methods."""

    def __init__(self, spark, path: str, id_col: str = "id"):
        self.spark = spark
        self.id_col = id_col
        self.cache = ParquetKVCache(spark, path, key=id_col)

    def upsert(self, df: DataFrame) -> None:
        self.cache.set(df)

    def delete(self, keys: DataFrame) -> None:
        self.cache.delete(keys)

    def _cosine(self, a: Column, b: Column) -> Column:
        from connect_spark.queries.vectors import cosine

        return cosine(a, b)

    def search(
        self, query_vector: list[float], k: int = 5, vector_col: str = "vector"
    ) -> DataFrame:
        """Exact cosine top-k over the stored vectors (the brute-force
        baseline; IVF bucketing applies unchanged if the store is
        written partitioned by centroid)."""
        stored = self.cache.read()
        if stored is None:
            # empty store: a top-k over nothing is an empty result,
            # not an AttributeError
            return self.spark.createDataFrame(
                [], f"{self.id_col} string, sim double"
            )
        q = F.array(*[F.lit(float(x)) for x in query_vector])
        sims = stored.withColumn(
            "sim",
            self._cosine(
                F.transform(F.col(vector_col), lambda x: x.cast("double")), q
            ),
        )
        # orderBy().limit(k) compiles to TakeOrderedAndProject — each
        # partition keeps its local top-k and only k rows ever cross to
        # the driver-side merge, vs a global row_number window that
        # forces the whole store through one sorting task. Rank is then
        # stamped over the k-row result (a k-row single partition is
        # the point, not a smell).
        topk = sims.orderBy(F.col("sim").desc(), F.col(self.id_col)).limit(k)
        w = Window.orderBy(F.col("sim").desc(), F.col(self.id_col))
        return topk.withColumn("rank", F.row_number().over(w)).drop("sim")
