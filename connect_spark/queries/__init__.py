"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where expressible) a
DuckDB oracle SQL string over the same parquet tables.

Contract notes (driver compare):
- Column names must match between Spark and oracle exactly; every
  computed column is aliased on both sides.
- The compare hashes values order-insensitively, so no ORDER BY needed.
- Double aggregates are rounded on BOTH sides (engine summation order
  differs at the 1e-12 level; rounding makes the hash stable).
- Timestamps are cast to strings on both sides (identical formatting in
  Spark-UTC and DuckDB-naive).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → non-SQL-expressible, rows-only check
    headline: bool = False  # included in bench.py


# The correctness driver verifies exactly the first 50 entries of the
# registry, in order.  Names listed here are floated to the front so
# queries that have never produced a driver CORRECTNESS row (or were
# added this round) fall inside that window; long-green queries rotate
# behind them (the in-repo oracle gate + pytest guard those against
# regression).
_DRIVER_PRIORITY: list[str] = [
    # round-2 tail that never got a driver row (VERDICT r2 task #1)
    "asof_attribution",
    "xml_roundtrip",
    "json_schema_events",
    "avro_roundtrip",
    "schema_registry_avro",
    "protobuf_roundtrip",
    "msgpack_roundtrip",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue",
    "range_join_view_purchase",
    "funnel_signup_view_purchase",
    "sketch_kmv_distinct",
    "percentiles_by_type",
    "histogram_values",
    "cdc_materialize_orders",
    "mq_subject_route",
    "jq_project_events",
    "awk_extract_events",
    "geoip_enrich_events",
    "js_transform_events",
    "window_tumbling_streamed",
    "streaming_dedupe_keys",
    "fn_window_matrix",
    # round-3 additions (also never driver-checked yet)
    "dedup_neardup_verified",
    "bloblang_eval_dynamic",
    "chunk_recursive_character",
    "chunk_markdown",
    "ai_chat_extract",
    "ai_embed_rerank",
    "jwt_sign_matrix",
    "batch_policy_events",
    "archive_tar_roundtrip",
    "multimodal_frames",
    "join_salted_skew",
    "branch_enrich_orders",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_classes",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_volume",
    "q19_disjunctive_revenue",
    "q22_sales_opportunity",
]


def all_queries() -> list[QuerySpec]:
    from connect_spark.queries import (
        analytics,
        asof,
        batching_q,
        cdc,
        core,
        engines,
        extended,
        formats,
        functions as fns,
        joins,
        mq,
        relational,
        streaming_q,
        textops,
        tpch,
        vectors,
        windows,
        winfns,
    )

    specs: list[QuerySpec] = []
    for mod in (
        core, joins, windows, fns, textops, vectors, extended, asof, formats,
        relational, analytics, batching_q, cdc, mq, engines, streaming_q,
        tpch, winfns,
    ):
        specs.extend(mod.QUERIES)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    prio = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}
    specs.sort(key=lambda s: (0, prio[s.name]) if s.name in prio else (1, 0))
    return specs
