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
    # Round 11 rotation (standing policy: never-verified first, then
    # oldest driver green).  Window: (a) the 3 new round-11 queries
    # with no driver row yet (Iceberg bucket partition transform,
    # a2a_message, arithmetic-JPEG decode); (b) the 2 r5-latest rows
    # — the oldest driver band, displaced from the r10 window and
    # twice re-verified green beyond-window since; (c) the first 45
    # of the 50 r7-latest rows (alphabetical within the band, the
    # r10-prepared queue order).  3 + 2 + 45 = 50; zero overlap with
    # the r10 window.  The 5 r7 rows the new queries displace
    # (schema_registry_evolution, streaming_dedupe_keys,
    # text_token_count_bpe, vocab_top_bigrams,
    # window_tumbling_streamed — end of the band) head the round-12
    # queue below and were re-verified GREEN beyond-window this
    # round (PROGRESS.md; schema_registry_evolution was additionally
    # judge-verified green in the round-10 session).
    "iceberg_bucket_partition_roundtrip",
    "a2a_message_enrich",
    "multimodal_jpeg_arith",
    "quality_gopher_rules",
    "contamination_13gram",
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
    "dedup_cluster_resolve",
    "dedup_incremental",
    "dedup_training_set",
    "fn_window_matrix",
    "geoip_enrich_events",
    "histogram_values",
    "html_extract_main",
    "iceberg_delete_roundtrip",
    "iceberg_upsert_roundtrip",
    "jq_project_events",
    "js_transform_events",
    "jwt_sign_matrix",
    "kafka_read_committed",
    "mq_subject_route",
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
    "q22_sales_opportunity",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "quality_bigram_lm",
    "quality_repetition_rules",
    "retention_cohorts",
    "sample_stratified",
    # --- 50-slot window boundary (round 11) --- everything below
    # queues for round 12: first the 5 displaced r7 rows (re-verified
    # green beyond-window this round), then the r8-latest band.
    "schema_registry_evolution",
    "streaming_dedupe_keys",
    "text_token_count_bpe",
    "vocab_top_bigrams",
    "window_tumbling_streamed",
    # r10 window (r10-latest rows, verified last round — deepest
    # queue position after the r8 band rotates in round 12/13)
    "multimodal_jpeg_resize",
    "while_fixpoint",
    "batch_policy_bytes",
    "multimodal_video_framesample",
    "multimodal_jpeg_progressive",
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
