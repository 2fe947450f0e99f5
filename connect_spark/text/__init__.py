"""Training-data operators beyond the reference surface: multimodal
column plumbing and enrichment helpers (the query implementations for
dedup/similarity/analysis live in connect_spark.queries.textops /
vectors)."""
