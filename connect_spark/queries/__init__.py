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
    # Round 8 rotation (standing policy: oldest driver verification
    # first — the r7 failure-to-rotate left this window identical to
    # r6's, so r8 front-loads the backlog). Order: (a) the 5 round-7
    # queries that have NEVER had a driver row (migrator control
    # plane, stream-stream join, BPE training) plus the 6 new round-8
    # queries (snowflake bdec roundtrip, composed migrator
    # end-to-end, BPE train parity, topic-plane sync + ACL
    # translation, bucketed co-located join); (b) the 39 oldest
    # r4-latest entries.  The 11 r4-latest remainder + the 49
    # r5-latest queries queue below the boundary for round 9; the 50
    # r7-verified queries are unlisted and sort last (registry
    # order).
    "dedup_substring_spans",
    "quality_stupid_backoff",
    "sample_temperature_rebalance",
    "pipeline_pretrain_corpus",
    "dedup_semantic_keep",
    "shard_shuffle_manifest",
    "dsir_importance_resample",
    "mixture_interleave_blocks",
    "pipeline_incremental_refresh",
    "multimodal_bmp_resize",
    "multimodal_audio_features",
    "migrator_schema_sync",
    "migrator_id_translate",
    "migrator_group_offsets",
    "streaming_join_hydration",
    "bpe_train_distributed",
    "snowflake_bdec_roundtrip",
    "migrator_end_to_end",
    "bpe_train_parity",
    "migrator_topic_sync",
    "migrator_acl_translate",
    "bucketed_join_revenue",
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
    # --- 50-slot window boundary (session-3 additions above pushed
    # these 8 r4/r5-latest entries below the line; they front the
    # round-9 rotation queue together with everything under the older
    # marker below) ---
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
    # --- former (session-2) window boundary ---
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
    "q1_pricing_summary",
    "join_salted_skew",
    "branch_enrich_orders",
    "uuid_v5_vectors",
    "parse_logfmt_events",
    "dedup_neardup_verified",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "multimodal_meta",
    "multimodal_frames",
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
    "chunk_recursive_character",
    "chunk_markdown",
    "compress_roundtrip",
    "asof_attribution",
    "archive_tar_roundtrip",
    "xml_roundtrip",
    "json_schema_events",
    "avro_roundtrip",
    "schema_registry_avro",
    "schema_registry_protobuf",
    "protobuf_roundtrip",
    "msgpack_roundtrip",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue",
    "range_join_view_purchase",
    "funnel_signup_view_purchase",
    "sketch_kmv_distinct",
    "cdc_pgoutput_decode",
    "cdc_binlog_decode",
    "cdc_logminer_decode",
    "kafka_recordbatch_roundtrip",
    "text_pii_scrub",
    "quality_gopher_rules",
    "contamination_13gram",
]


def all_queries() -> list[QuerySpec]:
    from connect_spark.queries import (
        analytics,
        asof,
        batching_q,
        cdc,
        connectors_q,
        core,
        datamix,
        dataprep,
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
        migrator_q, dataprep, datamix,
    ):
        specs.extend(mod.QUERIES)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"
    prio = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}
    specs.sort(key=lambda s: (0, prio[s.name]) if s.name in prio else (1, 0))
    return specs
