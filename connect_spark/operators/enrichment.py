"""Per-message enrichment processors (SURVEY.md §2.B RPC-join row,
§2.H AI processors, §2.I caches) re-expressed set-based.

- `cached` processor (docs/.../processors/cached.adoc:26): memoize an
  expensive per-key computation. Set-based: compute once per DISTINCT
  key, broadcast-join back — the cache hit-rate is 100% by
  construction and the expensive path runs |distinct keys| times, not
  |rows| times.
- `http` / AI processors (docs/.../processors/http.adoc:26,
  openai_*/ollama_* in internal/impl): batched enrichment through an
  injectable transport via mapInPandas — Arrow batches in/out, one
  request per BATCH not per row (the reference batches the same way).
  The transport is injected so tests (and offline runs) use fakes; a
  real deployment passes an HTTP/LLM client factory. No live network
  I/O is attempted by default.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cached_enrich(
    df: DataFrame,
    key: str,
    compute: Callable[[DataFrame], DataFrame],
    broadcast_result: bool = True,
) -> DataFrame:
    """`cached`: run `compute` on the distinct keys only, join back.
    `compute` takes a 1-column DataFrame of distinct keys and returns
    (key, ...result cols)."""
    keys = df.select(key).distinct()
    result = compute(keys)
    if broadcast_result:
        result = F.broadcast(result)
    return df.join(result, on=key, how="left")


def map_in_pandas_enrich(
    df: DataFrame,
    transport: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema,
) -> DataFrame:
    """Batched RPC-style enrichment: `transport` receives a pandas
    batch and returns the enriched batch (same row count/order). The
    http/openai/cohere/bedrock processor family all reduce to this
    shape; partitioning is preserved (narrow op)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = transport(pdf)
            if len(out) != len(pdf):
                raise ValueError(
                    "enrichment transport must return one row per input "
                    f"row (got {len(out)} for {len(pdf)})"
                )
            yield out

    return df.mapInPandas(run, output_schema)
