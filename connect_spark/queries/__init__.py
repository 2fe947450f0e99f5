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
    # Round 15 rotation (standing policy: never-verified first, then
    # oldest driver green).  Window = the TWO queries added this
    # round (fn_functions_matrix — the r14 verdict's headline gate
    # for the 11 newly-implemented Bloblang functions — and
    # system_window_traffic, the worked-example conformance query)
    # followed by the first 48 of the band pre-audited 50/50 GREEN in
    # two fresh driver_sim sessions at the r14 freeze (PROGRESS.md
    # r14 "r15 band pre-audit").  The old r14 window rotates to the
    # deepest queue position (freshest greens).
    # `bpe_train_distributed` (rows-only by design — iterative, not
    # SQL-expressible) stays PINNED to the very back so driver
    # windows remain 50/50 with zero `no_oracle` rows; its
    # value-level twin `bpe_train_parity` carries the oracle gate
    # whenever it rotates forward (r12 verdict "What's wrong" #3).
    "fn_functions_matrix",
    "system_window_traffic",
    # r15 continuation: the distributed dynamic-batch mapping path
    # (applyInPandas per group_by_value batch) and hybrid RRF
    # retrieval — never-verified, so front of the window per the
    # standing policy (the two displaced tail entries,
    # q19_disjunctive_revenue and q21_suppliers_kept_waiting, were
    # re-verified GREEN beyond-window in fresh driver_sim sessions
    # this round)
    "dynamic_batch_reduce",
    "hybrid_search_rrf",
    "text_fingerprint",
    "text_lang_id",
    "text_pii_scrub",
    "text_quality_score",
    "text_token_count",
    "uuid_v5_vectors",
    "while_fixpoint",
    "workflow_enrich_lineitem",
    "xml_roundtrip",
    "a2a_message_enrich",
    "ai_chat_extract",
    "ai_embed_rerank",
    "amqp1_envelope_decode",
    "ann_topk_quantized",
    "anomaly_event_spikes",
    "awk_extract_events",
    "batch_policy_events",
    "bloblang_eval_dynamic",
    "broker_wire_roundtrip",
    "cdc_materialize_orders",
    "contamination_13gram",
    "dedup_cluster_resolve",
    "dedup_incremental",
    "dedup_training_set",
    "fn_window_matrix",
    "geoip_enrich_events",
    "histogram_values",
    "html_extract_main",
    "iceberg_bucket_partition_roundtrip",
    "iceberg_delete_roundtrip",
    "iceberg_upsert_roundtrip",
    "jq_project_events",
    "js_transform_events",
    "jwt_sign_matrix",
    "kafka_read_committed",
    "mq_subject_route",
    "multimodal_jpeg_arith",
    "multimodal_wav_decode",
    "pack_sequences",
    "percentiles_by_type",
    "pulsar_envelope_decode",
    "q12_priority_classes",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_volume",
    "q19_disjunctive_revenue",
    "q21_suppliers_kept_waiting",
    # --- 50-slot window boundary (round 15) --- everything below
    # queues for round 16: the r15 pre-audit band remainder, then the
    # r11/r12-latest bands, deepest the old r14 window (freshest
    # greens); bpe_train_distributed pinned last.
    "q22_sales_opportunity",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "quality_bigram_lm",
    "quality_gopher_rules",
    "quality_repetition_rules",
    "retention_cohorts",
    "sample_stratified",
    "rpcplugin_processor_docs",
    "agent_runtime_tool_loop",
    "multimodal_jpeg_lossless",
    "multimodal_gif_animation",
    "fn_sr_header_roundtrip",
    "schema_registry_evolution",
    "streaming_dedupe_keys",
    "text_token_count_bpe",
    "vocab_top_bigrams",
    "window_tumbling_streamed",
    "archive_json",
    "archive_lines",
    "bounds_check_filter",
    "bpe_train_parity",
    "bucketed_join_revenue",
    "dedup_exact",
    "dedup_semantic_keep",
    "dedup_substring_spans",
    "dedupe_first_per_user",
    "error_model",
    "fn_array_matrix",
    "fn_encoding_matrix",
    "fn_map_matrix",
    "fn_number_matrix",
    "fn_regex_matrix",
    "fn_string_matrix",
    "fn_timestamp_matrix",
    "group_by_value_agg",
    "join_anti_no_orders",
    "join_enrichment_lookup",
    "join_semi_big_spenders",
    "join_sharded_full_outer",
    "join_star_revenue_by_nation",
    "mapping_project",
    "migrator_acl_translate",
    "migrator_end_to_end",
    "migrator_group_offsets",
    "migrator_id_translate",
    "migrator_schema_sync",
    "migrator_topic_sync",
    "mixture_interleave_blocks",
    "multimodal_audio_features",
    "multimodal_bmp_resize",
    "mutation_enrich",
    "pipeline_pretrain_corpus",
    "quality_stupid_backoff",
    "sample_temperature_rebalance",
    "select_parts_topk",
    "snowflake_bdec_roundtrip",
    "rpcplugin_arrow_protocol",
    "multimodal_jpeg_hierarchical",
    "streaming_join_hydration",
    "switch_route",
    "unarchive_explode",
    "window_daily_orders",
    "window_session",
    "window_sliding",
    "window_tumbling_hourly",
    "amqp_envelope_events",
    "ann_ivf_kmeans_probe",
    "bloom_membership_probe",
    "buffer_window_stamp",
    "contamination_embedding",
    "dataset_card_stats",
    "dedup_line_removal",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dsir_importance_resample",
    "ffi_libc_events",
    "grouping_sets_orders",
    "iceberg_commit_roundtrip",
    "iceberg_metadata_count",
    "iceberg_partitioned_scan",
    "jmespath_project_events",
    "join_salted_skew",
    "kmeans_lloyd_clusters",
    "kmeans_semdedup_keep",
    "migrator_bundle_run",
    "mongo_filter_orders",
    "multimodal_gif_framesample",
    "multimodal_mulaw_features",
    "multimodal_png_resize",
    "pagerank_purchase_graph",
    "parse_log_events",
    "pipeline_incremental_refresh",
    "pipeline_semantic_curation",
    "pipeline_yaml_route",
    "q11_important_stock",
    "q16_parts_supplier",
    "q1_pricing_summary",
    "q20_excess_stock",
    "q2_min_cost_supplier",
    "quality_ppl_buckets",
    "shard_shuffle_manifest",
    "sketch_binned_quantiles",
    "sketch_countmin_freq",
    "sketch_hll_distinct",
    # the old r14 window (freshest driver greens, r14):
    "sketch_hll_merged",
    "sketch_kmv_merged",
    "streaming_cdc_to_iceberg",
    "streaming_running_totals",
    "streaming_session_window",
    "timeseries_gapfill_locf",
    "triangles_copurchase",
    "unicode_segments_docs",
    "wasm_transform_events",
    "ann_ivf_assign",
    "ann_ivf_probe",
    "ann_topk_bruteforce",
    "archive_tar_roundtrip",
    "asof_attribution",
    "avro_roundtrip",
    "batch_policy_bytes",
    "branch_enrich_orders",
    "cdc_binlog_decode",
    "cdc_logminer_decode",
    "cdc_pgoutput_decode",
    "chunk_documents",
    "chunk_markdown",
    "chunk_recursive_character",
    "compress_roundtrip",
    "dedup_neardup_verified",
    "embedding_neardup_pairs",
    "funnel_signup_view_purchase",
    "grok_extract_events",
    "json_schema_events",
    "kafka_recordbatch_roundtrip",
    "msgpack_roundtrip",
    "multimodal_frames",
    "multimodal_jpeg_progressive",
    "multimodal_jpeg_resize",
    "multimodal_meta",
    "multimodal_video_framesample",
    "parse_logfmt_events",
    "pivot_status_by_priority",
    "protobuf_roundtrip",
    "q10_returned_items",
    "q14_promo_revenue",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "range_join_view_purchase",
    "rollup_lineitem",
    "schema_registry_avro",
    "schema_registry_protobuf",
    "setops_segments",
    "sketch_kmv_distinct",
    "sql_select_orders",
    "bpe_train_distributed",
]



def all_queries() -> list[QuerySpec]:
    from connect_spark.queries import (
        analytics,
        asof,
        batching_q,
        cdc,
        clustering,
        connectors_q,
        core,
        datamix,
        dataprep,
        engines,
        extended,
        formats,
        functions as fns,
        graph,
        joins,
        llmops,
        membership,
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
        migrator_q, dataprep, datamix, clustering, membership, graph,
    ):
        specs.extend(mod.QUERIES)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    prio = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}
    specs.sort(key=lambda s: (0, prio[s.name]) if s.name in prio else (1, 0))
    return specs
