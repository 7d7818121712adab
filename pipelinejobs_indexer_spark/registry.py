"""Query/oracle registry driving ``__spark_entry__.py``.

Operator modules register each query with an optional DuckDB oracle SQL
string. ``load_all()`` imports every operator module exactly once so the
registry is fully populated before the driver enumerates it.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Ordered so an external correctness sweep that enumerates the registry
# front-to-back reaches the least-recently-proven queries first: streaming,
# LLM-pipeline, sink, and composed-plan queries lead; the operator families
# with standing green evidence trail.
_MODULES = [
    "pipelinejobs_indexer_spark.streaming.queries",
    "pipelinejobs_indexer_spark.llm.dedup",
    "pipelinejobs_indexer_spark.llm.similarity",
    "pipelinejobs_indexer_spark.llm.text",
    "pipelinejobs_indexer_spark.llm.multimodal",
    "pipelinejobs_indexer_spark.plans.upsert",
    "pipelinejobs_indexer_spark.plans.indexing",
    "pipelinejobs_indexer_spark.plans.layout",
    "pipelinejobs_indexer_spark.functions.udfs",
    "pipelinejobs_indexer_spark.operators.aggregates",
    "pipelinejobs_indexer_spark.operators.sorts",
    "pipelinejobs_indexer_spark.operators.scans",
    "pipelinejobs_indexer_spark.operators.filters",
    "pipelinejobs_indexer_spark.operators.joins",
    "pipelinejobs_indexer_spark.operators.windows",
    "pipelinejobs_indexer_spark.operators.sets",
    "pipelinejobs_indexer_spark.functions.scalars",
]

# The 19 oracled queries that have never appeared in a driver CORRECTNESS
# sweep (rounds 1+2 covered 95 of 117 under the 50-query/round cap). They
# MUST land in even a tightly capped round-3 sweep, so they enumerate first;
# a 50-cap sweep then still has ~28 slots left for re-verification.
_RECHECK_FIRST = [
    "scan_csv_export",
    "sink_compact_small_files",
    "win_gapfill_states",
    "stream_sliding_rates",
    "udtf_expand_listing_py",
    "llm_dedup_exact",
    "llm_dedup_embedding",
    "llm_multimodal_features_arrow",
    "llm_text_stats",
    "llm_text_langid",
    "llm_text_langid_ngram",
    "llm_text_quality",
    "llm_text_tokens",
    "llm_text_fingerprint",
    "llm_corpus_sample",
    "llm_text_pii_scrub",
    "llm_token_ngram_topk",
    "llm_embedding_quantize",
    "llm_corpus_mix_weights",
]

# Rows-only by design (no value-hash oracle is possible); their driver row
# carries little information, so they cede sweep budget to oracled queries.
_ROWS_ONLY_BY_DESIGN = frozenset({"stream_fsm_state", "stream_late_data"})

# Queries whose only green driver row is from round 1 (they were not
# re-checked in round 2, so their evidence is the stalest). They re-verify
# ahead of round-2 greens once the never-checked tier is exhausted.
_VERIFIED_R1_ONLY = frozenset(
    {
        "agg_dedup_exact",
        "agg_distinct_entities",
        "agg_grouping_sets",
        "agg_last_event",
        "agg_state_rollup",
        "coalesce_params",
        "filter_level",
        "filter_regex",
        "filter_state",
        "fn_array_ops",
        "fn_json_extract",
        "fn_map_ops",
        "fn_math_elapsed",
        "fn_path_parts",
        "fn_session_name",
        "fn_slugify",
        "fn_string_format",
        "fn_timestamp_parse",
        "fn_token_hash",
        "fn_typed_uuid",
        "join_anti_orphans",
        "join_asof_state",
        "join_files_job_provenance",
        "join_job_pipeline",
        "join_outer_diff",
        "join_provenance_closure",
        "join_provenance_salted",
        "join_range_events_in_run",
        "join_self_provenance_hop",
        "join_semi_validate_uuid",
        "project_minify",
        "scan_json_messages",
        "scan_parquet",
        "set_except_unindexed",
        "set_intersect_verified",
        "set_union_batches",
        "sort_history",
        "topk_recent_jobs",
        "udf_regex_multi",
        "udtf_expand_listing",
        "url_decode_filters",
        "validate_schema",
        "win_latest_history",
        "win_running_counts",
        "win_transition_pairs",
    }
)

# Queries with a green hash_match row in CORRECTNESS_r02.json — the
# freshest evidence, so they re-verify last among oracled queries.
_VERIFIED_R2 = frozenset(
    {
        "agg_count_indexed",
        "agg_key_skew_profile",
        "agg_state_pivot",
        "agg_storage_percentiles",
        "agg_storage_stats",
        "fn_filetype_sniff",
        "join_bucketed_colocated",
        "llm_contamination_check",
        "llm_corpus_curate",
        "llm_corpus_curate_full",
        "llm_corpus_curate_v2",
        "llm_corpus_shuffle_shard",
        "llm_dedup_clusters",
        "llm_dedup_embedding_lsh",
        "llm_dedup_incremental",
        "llm_dedup_incremental_minhash",
        "llm_dedup_minhash",
        "llm_dedup_ngram_jaccard",
        "llm_dedup_normalized",
        "llm_dedup_simhash",
        "llm_embedding_knn_eval",
        "llm_multimodal_features",
        "llm_multimodal_frames",
        "llm_multimodal_thumbnail",
        "llm_quality_calibrate",
        "llm_sequence_pack",
        "llm_similarity_ann",
        "llm_similarity_ivf",
        "llm_similarity_topk",
        "llm_span_dedup_audit",
        "llm_text_repetition",
        "pipeline_index_job",
        "pipeline_reindex_batch",
        "scan_archive_listing",
        "scan_jsonl_export",
        "sink_catalog_upsert",
        "sink_event_emit",
        "sink_partitioned_catalog",
        "sink_sorted_layout",
        "sink_training_shards",
        "stream_enrich_static",
        "stream_event_forward",
        "stream_incremental_upsert",
        "stream_ingest_dedupe",
        "stream_session_windows",
        "stream_stream_pair_join",
        "stream_tumbling_counts",
        "udaf_history_fold",
        "udf_regex_python_only",
        "udf_validate_json",
    }
)

_loaded = False


def register(name: str, sql: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(mod)
    # Front-load queries without standing green evidence: tier 0 = the 19
    # oracled queries with no driver row ever, tier 1 = new round-3 queries
    # (anything not in a verified set — the default), tier 2 = round-1-only
    # greens (stalest standing evidence), tier 3 = round-2 greens (freshest),
    # tier 4 = by-design rows-only checks (no hash evidence to gain).
    def tier(n: str) -> int:
        if n in _RECHECK_FIRST:
            return 0
        if n in _ROWS_ONLY_BY_DESIGN:
            return 4
        if n in _VERIFIED_R2:
            return 3
        if n in _VERIFIED_R1_ONLY:
            return 2
        return 1

    ordered = sorted(QUERIES, key=tier)
    for mapping in (QUERIES, ORACLE):
        snapshot = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(snapshot)
    _loaded = True
