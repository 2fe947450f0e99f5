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
# registry, in order.  Standing rotation policy (round-4 verdict task
# #2): every round, reorder so the front of the window holds (a) any
# query that has never produced a driver CORRECTNESS row, then (b) the
# queries whose latest driver green is OLDEST — so every registry
# query re-verifies at most every ceil(N/50) rounds even as code
# churns under it. Long-green queries rotate behind (the in-repo
# oracle gate + pytest still guard them against regression between
# driver rows).
_DRIVER_PRIORITY: list[str] = [
    # Round 5 rotation (standing policy: oldest driver verification
    # first). Order: (a) the 5 queries that have NEVER had a driver
    # row (all new this round — uuid_v5 vectors, logfmt, Confluent
    # protobuf, pgoutput + binlog wire decodes), (b) the 17 queries
    # whose latest green is r2, (c) the 50 whose latest green is r3,
    # registry-stable within each group. The 50-slot window verifies
    # the head; the 22 overflow entries rotate to the front next
    # round, keeping every query within two rounds of its last green.
    "uuid_v5_vectors",
    "parse_logfmt_events",
    "schema_registry_protobuf",
    "cdc_pgoutput_decode",
    "cdc_binlog_decode",
    "kafka_recordbatch_roundtrip",
    "cdc_logminer_decode",
    "text_pii_scrub",
    "quality_gopher_rules",
    "pack_sequences",
    "contamination_13gram",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "multimodal_meta",
    "ann_topk_bruteforce",
    "embedding_neardup_pairs",
    "ann_ivf_assign",
    "ann_ivf_probe",
    "pivot_status_by_priority",
    "rollup_lineitem",
    "setops_segments",
    "workflow_enrich_lineitem",
    "sql_select_orders",
    "grok_extract_events",
    "chunk_documents",
    "compress_roundtrip",
    "q1_pricing_summary",
    "join_salted_skew",
    "branch_enrich_orders",
    "dedup_neardup_verified",
    "multimodal_frames",
    "chunk_recursive_character",
    "chunk_markdown",
    "asof_attribution",
    "archive_tar_roundtrip",
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
    "batch_policy_events",
    "cdc_materialize_orders",
    "mq_subject_route",
    "ai_chat_extract",
    "ai_embed_rerank",
    "jq_project_events",
    "jwt_sign_matrix",
    "bloblang_eval_dynamic",
    "awk_extract_events",
    "geoip_enrich_events",
    "js_transform_events",
    "window_tumbling_streamed",
    "streaming_dedupe_keys",
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
    "fn_window_matrix",
]


def all_queries() -> list[QuerySpec]:
    from connect_spark.queries import (
        analytics,
        asof,
        batching_q,
        cdc,
        connectors_q,
        core,
        engines,
        extended,
        formats,
        functions as fns,
        joins,
        llmops,
        mq,
        pipeline_q,
        relational,
        streaming_q,
        textops,
        tpch,
        tpch_ps,
        vectors,
        windows,
        winfns,
    )

    specs: list[QuerySpec] = []
    for mod in (
        core, joins, windows, fns, textops, vectors, extended, asof, formats,
        relational, analytics, batching_q, cdc, mq, engines, streaming_q,
        tpch, winfns, pipeline_q, tpch_ps, connectors_q, llmops,
    ):
        specs.extend(mod.QUERIES)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    prio = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}
    specs.sort(key=lambda s: (0, prio[s.name]) if s.name in prio else (1, 0))
    return specs
