"""Serverless handler (reference: cmd/serverless/ →
internal/serverless/handler.go:33-60): each invocation injects the
event as the input message, runs the SAME pipeline config, and returns
the synchronous response — with the reference's default output
overrides (input becomes an inproc stub; errored messages are
rejected; the rest return as the sync response).

Proof of the batch/stream duality the survey calls out (§3.2): the
identical `build(config)` plan applies to a one-row DataFrame.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from connect_spark.errors import ERROR_COL, dead_letter_split
from connect_spark.plans.io_ext import register_inproc
from connect_spark.plans.pipeline import build_pipeline


def handle(
    spark: SparkSession,
    config: dict[str, Any],
    event: dict[str, Any] | list[dict[str, Any]],
) -> dict[str, Any]:
    """Run one serverless invocation.

    Returns {"response": [rows...], "rejected": [rows...]} — rows as
    plain dicts; errored messages land in `rejected` (handler.go:44-60
    default `switch` → reject errored / sync_response the rest).
    """
    rows = [event] if isinstance(event, dict) else list(event)
    df = spark.createDataFrame(rows)
    register_inproc("_serverless_event", df)
    cfg = dict(config)
    cfg["input"] = {"inproc": "_serverless_event"}
    # the DEFAULT output becomes the sync response, but an explicitly
    # configured output is still delivered (handler.go overrides only
    # the schema defaults)
    explicit_output = cfg.pop("output", None)
    pipe = build_pipeline(spark, cfg)
    out = pipe.dataframe()
    pipe.flush_writes()
    if explicit_output is not None:
        from connect_spark.plans.pipeline import _run_output

        _run_output(out, explicit_output)
    if ERROR_COL in out.columns:
        healthy, dead = dead_letter_split(out)
        return {
            "response": [
                r.asDict(recursive=True)
                for r in healthy.drop(ERROR_COL).collect()
            ],
            "rejected": [
                r.asDict(recursive=True) for r in dead.collect()
            ],
        }
    return {
        "response": [r.asDict(recursive=True) for r in out.collect()],
        "rejected": [],
    }
