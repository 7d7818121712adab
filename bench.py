"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query runs N_RUNS times with the DataFrame cache cleared between
runs; "queries"/"value" report the best (steady-state) run — the number
that projects to sustained 100 TB throughput — while "cold_queries"/
"cold_value" report the first run, which additionally pays one-time
query planning, whole-stage-codegen compilation, and (for pandas stages)
Python-worker spin-up. Clearing the cache between runs means steady-state
still re-executes the full plan (scans, shuffles, hashing); only the
JIT/codegen caches stay warm, exactly as they would mid-job on a cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from pipelinejobs_indexer_spark import registry
from pipelinejobs_indexer_spark.session import default_sf_dir, get_spark

# Headline set: one-plus per operator family (SURVEY.md §2) — scans,
# filters, joins, aggs, windows, top-k, the composed indexing pipeline,
# streaming replay, and the LLM-pipeline extensions.
HEADLINE = [
    "scan_parquet",
    "scan_json_messages",
    "filter_regex",
    "validate_schema",
    "join_job_pipeline",
    "join_files_job_provenance",
    "join_asof_state",
    "join_range_events_in_run",
    "agg_state_rollup",
    "agg_storage_stats",
    "udaf_history_fold",
    "win_latest_history",
    "topk_recent_jobs",
    "pipeline_index_job",
    "stream_tumbling_counts",
    "llm_dedup_minhash",
    "llm_dedup_clusters",
    "llm_dedup_incremental_minhash",
    "llm_corpus_curate_full",
    "llm_similarity_topk",
    "llm_similarity_ann",
    "llm_text_stats",
    "llm_corpus_curate",
    "llm_multimodal_features",
]

N_RUNS = 2


def force_full_eval(df) -> int:
    """Run the query so EVERY output expression executes.

    A bare ``df.count()`` lets Catalyst prune unused projections — for
    projection-only queries the per-row work (md5, folds, sniffing) would
    never run and the measured time would be a lie. Hashing every output
    column into one xxhash64 and aggregating it makes each projection
    expression load-bearing while still returning a single row to the
    driver (no collect of the result set)."""
    row = (
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h"))
        .agg(F.count("h").alias("n"), F.bit_xor("h"))
        .collect()[0]
    )
    return row["n"]


def main() -> None:
    sf_dir = default_sf_dir()
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("pipelinejobs-indexer-bench")
    registry.load_all()
    names = [n for n in HEADLINE if n in registry.QUERIES]

    # Warm the JVM + parquet footer caches with a trivial action.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    best: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in names:
        times = []
        for _ in range(N_RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, sf_dir)
            force_full_eval(df)
            times.append(round(time.perf_counter() - t0, 4))
        cold[name] = times[0]
        best[name] = min(times)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(best.values()), 4),
                "unit": "sec",
                "queries": best,
                "sf": sf,
                "timing": (
                    f"best of {N_RUNS} runs per query, DataFrame cache cleared "
                    "between runs (steady-state execution; codegen/JIT warm)"
                ),
                "cold_value": round(sum(cold.values()), 4),
                "cold_queries": cold,
                "notes": (
                    "methodology frozen as of round 3 (full-output-hash via "
                    "xxhash64+bit_xor, best of 2, cache cleared between runs); "
                    "compare 1:1 against the pinned BENCH_BASE.json (= the "
                    "round-2 sf0.1 local[32] numbers). Not comparable to "
                    "BENCH_r01, whose df.count() let Catalyst prune "
                    "projection work."
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()


