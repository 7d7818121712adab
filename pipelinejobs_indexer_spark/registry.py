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
    _loaded = True
