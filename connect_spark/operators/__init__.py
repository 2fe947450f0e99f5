"""Core dataflow operators (SURVEY.md §2.A/§2.B/§2.C) as
``DataFrame -> DataFrame`` transforms."""

from connect_spark.operators.core import (
    archive_concat,
    archive_json_array,
    bounds_check,
    dedupe,
    group_by_value,
    mapping,
    mutation,
    select_parts,
    switch,
    unarchive,
)
from connect_spark.operators.joins import (
    enrichment_join,
    semi_join,
    anti_join,
    sharded_join,
)
from connect_spark.operators.windows import (
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "mapping",
    "mutation",
    "switch",
    "group_by_value",
    "dedupe",
    "select_parts",
    "archive_concat",
    "archive_json_array",
    "unarchive",
    "bounds_check",
    "sharded_join",
    "enrichment_join",
    "semi_join",
    "anti_join",
    "tumbling_window_agg",
    "sliding_window_agg",
]
