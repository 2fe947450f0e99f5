"""Embedding / AI-processor family (SURVEY.md §2.H: openai_*/ollama_*/
cohere_* embeddings, rerank) as batched column operators.

The model call is injectable (`model_fn` receives a list of texts and
returns a list of float vectors — one Arrow batch per call, exactly
the batched-API shape of the reference's AI processors). The default
is a deterministic hash-based embedder so pipelines are testable
offline: each of `dim` components is derived from md5(token) votes —
semantically naive but stable, unit-norm, and similar texts get
similar vectors (shared tokens → shared votes), which is enough to
exercise downstream ANN / dedup operators end-to-end.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _hash_embed(text: str, dim: int) -> list[float]:
    vec = [0.0] * dim
    for tok in text.split():
        h = hashlib.md5(tok.encode()).digest()
        idx = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if h[4] % 2 == 0 else -1.0
        vec[idx] += sign
    norm = math.sqrt(sum(x * x for x in vec)) or 1.0
    return [round(x / norm, 6) for x in vec]


def embed_text(
    df: DataFrame,
    text_col: str,
    dim: int = 64,
    model_fn: Callable[[list[str]], list[list[float]]] | None = None,
    out: str = "embedding",
) -> DataFrame:
    """Append an embedding column; one model call per Arrow batch.
    Narrow op — a 100 TB corpus embeds with zero shuffle and
    (batch-size × executors) concurrent model calls."""

    fn = model_fn or (lambda texts: [_hash_embed(t or "", dim) for t in texts])
    fields = df.schema.fields + [
        T.StructField(out, T.ArrayType(T.FloatType()))
    ]
    schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = fn(pdf[text_col].tolist())
            yield pdf

    return df.mapInPandas(run, schema)


def rerank_stub(
    df: DataFrame, query: str, text_col: str, out: str = "rerank_score"
) -> DataFrame:
    """Rerank processor shape (cohere_rerank): score = token overlap
    with the query (deterministic stand-in; a real deployment injects
    the cross-encoder call in the same batched form)."""
    from pyspark.sql import functions as F

    q_toks = [t for t in query.split() if t]
    toks = F.filter(F.split(text_col, " "), lambda t: t != "")
    overlap = F.size(
        F.array_intersect(F.array_distinct(toks), F.array([F.lit(t) for t in q_toks]))
    )
    return df.withColumn(out, overlap / F.lit(max(len(q_toks), 1)))
