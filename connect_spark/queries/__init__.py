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
    # Round 6 rotation (standing policy: oldest driver verification
    # first). Order: (a) the queries with NO driver row —
    # pack_sequences leads (red r5, fixed this round: shard window +
    # oracle BIGINT cast) followed by the new round-6 rows (cluster
    # resolution + training-set dedup, BPE vectors, AMQP 1.0 /
    # Pulsar / broker wire decodes, Kafka read_committed); (b) the 28
    # queries whose latest green is r3; (c) the oldest r4-latest
    # remainder, registry-stable, filling the 50-slot window.  The
    # r4-latest overflow rotates to the front next round, keeping
    # every query ≤2 rounds from its last green.
    "pack_sequences",
    "dedup_cluster_resolve",
    "text_token_count_bpe",
    "amqp1_envelope_decode",
    "kafka_read_committed",
    "pulsar_envelope_decode",
    "broker_wire_roundtrip",
    "dedup_training_set",
    "ann_topk_quantized",
    "iceberg_delete_roundtrip",
    "sample_stratified",
    "schema_registry_evolution",
    "multimodal_wav_decode",
    "iceberg_upsert_roundtrip",
    "quality_repetition_rules",
    "quality_bigram_lm",
    "dedup_incremental",
    "html_extract_main",
    "q21_suppliers_kept_waiting",
    "retention_cohorts",
    "vocab_top_bigrams",
    "anomaly_event_spikes",
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
    "mapping_project",
    "mutation_enrich",
    "switch_route",
    "group_by_value_agg",
    "dedupe_first_per_user",
    "select_parts_topk",
    "archive_lines",
    "archive_json",
    "unarchive_explode",
    "bounds_check_filter",
    "error_model",
    # --- 50-slot window boundary (r4-latest remainder below rotates
    # to the front in round 7) ---
    "join_sharded_full_outer",
    "join_enrichment_lookup",
    "join_semi_big_spenders",
    "join_anti_no_orders",
    "join_star_revenue_by_nation",
    "window_tumbling_hourly",
    "window_sliding",
    "window_session",
    "window_daily_orders",
    "fn_string_matrix",
    "fn_map_matrix",
    "fn_regex_matrix",
    "fn_timestamp_matrix",
    "fn_number_matrix",
    "fn_encoding_matrix",
    "fn_array_matrix",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "unicode_segments_docs",
    "dedup_line_removal",
    "jmespath_project_events",
    "wasm_transform_events",
    "ffi_libc_events",
    "streaming_running_totals",
    "streaming_session_window",
    "pipeline_yaml_route",
    "parse_log_events",
    "iceberg_partitioned_scan",
    "iceberg_commit_roundtrip",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_parts_supplier",
    "q20_excess_stock",
    "amqp_envelope_events",
    "mongo_filter_orders",
    "buffer_window_stamp",
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
        migrator_q,
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
        migrator_q,
    ):
        specs.extend(mod.QUERIES)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    prio = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}
    specs.sort(key=lambda s: (0, prio[s.name]) if s.name in prio else (1, 0))
    return specs
