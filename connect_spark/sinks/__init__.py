"""Output routing combinators (SURVEY.md §2.E routing row)."""

from connect_spark.sinks.routing import (
    broker_fanout,
    fallback_write,
    reject_errored_split,
    switch_output,
)

__all__ = [
    "broker_fanout",
    "switch_output",
    "fallback_write",
    "reject_errored_split",
]
