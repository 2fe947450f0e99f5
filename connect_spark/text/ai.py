"""AI chat / moderation processor family (SURVEY.md §2.H).

Reference surface: `internal/impl/openai/chat_processor.go` (fields
`prompt`, `system_prompt`, `max_tokens`, `temperature`,
`response_format` text|json), `internal/impl/ollama/chat_processor.go`
(same prompt/system_prompt shape), and
`internal/impl/ollama/moderation_processor.go` (fields `prompt`,
`response`; emits a yes/no `safe` verdict).  Cohere chat/rerank share
the base-processor shape (`internal/impl/cohere/chat_processor.go`).

No model endpoint is reachable from this sandbox, so — exactly like
the HTTP transport (sources/http_client.py) — the model call is
INJECTABLE: any callable ``(requests: list[dict]) -> list[str]``
receiving one Arrow batch of request dicts and returning one reply
string per request.  A cluster deployment passes an HTTP-backed
callable with the same signature; tests and the correctness gate use
the deterministic fake below, so the batching/schema plumbing — the
part that has to be right at 100 TB — is exercised for real.

Scale shape: chat/moderation are NARROW ops (mapInPandas, zero
shuffle); a 1000-executor job issues (executors × batches) concurrent
model calls with Arrow-batched amortization, which is the reference's
batched-API shape as well.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ModelFn = Callable[[list[dict]], list[str]]


def fake_chat_model(requests: list[dict]) -> list[str]:
    """Deterministic stand-in for a chat completion endpoint.

    json mode → a structured "extraction" of the user prompt:
      {"n_chars": …, "n_words": …, "head": first-16-chars}
    text mode → "SUMMARY(<n_words> words): <first 8 words>".

    Both are pure functions of the prompt string, so a DuckDB oracle
    can recompute them — the correctness gate then covers the whole
    request-build → batch → reply → parse pipeline.
    """
    out = []
    for req in requests:
        p = req.get("prompt") or ""
        words = p.split()
        if req.get("response_format") == "json":
            out.append(
                json.dumps(
                    {
                        "n_chars": len(p),
                        "n_words": len(words),
                        "head": p[:16],
                    },
                    separators=(",", ":"),
                )
            )
        else:
            out.append(f"SUMMARY({len(words)} words): {' '.join(words[:8])}")
    return out


def fake_moderation_model(requests: list[dict]) -> list[str]:
    """Deterministic moderation verdict, reference-shaped (`safe` is
    the ollama moderation output, yes/no): unsafe iff any flag term
    appears case-insensitively in the checked response text."""
    out = []
    for req in requests:
        text = (req.get("response") or "").lower()
        terms = req.get("flag_terms") or ()
        out.append("no" if any(t in text for t in terms) else "yes")
    return out


def _batched_model_op(
    df: DataFrame,
    build_request: Callable[[pd.Series], list[dict]],
    model_fn: ModelFn,
    out: str,
    input_cols: list[str],
) -> DataFrame:
    """Shared mapInPandas plumbing: one model call per Arrow batch,
    reply appended as a string column."""
    fields = df.schema.fields + [T.StructField(out, T.StringType())]
    schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = model_fn(build_request(pdf))
            yield pdf

    return df.mapInPandas(run, schema)


def ai_chat(
    df: DataFrame,
    prompt: str | Column,
    *,
    model: str = "fake-chat",
    system_prompt: str | None = None,
    response_format: str = "text",
    max_tokens: int | None = None,
    temperature: float | None = None,
    model_fn: ModelFn | None = None,
    out: str = "reply",
) -> DataFrame:
    """Chat-completion processor (`openai_chat_completion` /
    `ollama_chat` config surface).  `prompt` is a column (the
    reference's interpolated-string prompt resolves per message the
    same way); static fields ride along in every request dict."""
    if response_format not in ("text", "json"):
        raise ValueError(f"response_format must be text|json, got {response_format!r}")
    fn = model_fn or fake_chat_model
    static = {
        "model": model,
        "system_prompt": system_prompt,
        "response_format": response_format,
        "max_tokens": max_tokens,
        "temperature": temperature,
    }
    pcol = F.col(prompt) if isinstance(prompt, str) else prompt
    work = df.withColumn("_ai_prompt", pcol.cast("string"))

    def build(pdf: pd.DataFrame) -> list[dict]:
        return [dict(static, prompt=p) for p in pdf["_ai_prompt"].tolist()]

    res = _batched_model_op(work, build, fn, out, ["_ai_prompt"])
    return res.drop("_ai_prompt")


def ai_moderation(
    df: DataFrame,
    response: str | Column,
    *,
    model: str = "fake-moderation",
    prompt: str | Column | None = None,
    flag_terms: tuple[str, ...] = (),
    model_fn: ModelFn | None = None,
    out: str = "safe",
) -> DataFrame:
    """Moderation processor (`ollama_moderation` fields `prompt` +
    `response`): verdict column `safe` ∈ {yes, no} per message."""
    fn = model_fn or fake_moderation_model
    rcol = F.col(response) if isinstance(response, str) else response
    work = df.withColumn("_ai_resp", rcol.cast("string"))
    if prompt is not None:
        pcol = F.col(prompt) if isinstance(prompt, str) else prompt
        work = work.withColumn("_ai_prompt", pcol.cast("string"))
    terms = tuple(t.lower() for t in flag_terms)

    def build(pdf: pd.DataFrame) -> list[dict]:
        prompts = (
            pdf["_ai_prompt"].tolist()
            if "_ai_prompt" in pdf.columns
            else [None] * len(pdf)
        )
        return [
            {
                "model": model,
                "prompt": p,
                "response": r,
                "flag_terms": terms,
            }
            for p, r in zip(prompts, pdf["_ai_resp"].tolist())
        ]

    res = _batched_model_op(work, build, fn, out, ["_ai_resp"])
    return res.drop("_ai_resp", "_ai_prompt")
