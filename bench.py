"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count) after a warm-up of the
session; per-query wall time includes plan + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipelinejobs_indexer_spark import registry
from pipelinejobs_indexer_spark.session import default_sf_dir, get_spark

# Headline set: one per operator family — updated as waves land.
HEADLINE = [
    "scan_parquet",
    "scan_json_messages",
    "filter_regex",
    "validate_schema",
]


def main() -> None:
    sf_dir = default_sf_dir()
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("pipelinejobs-indexer-bench")
    registry.load_all()
    names = [n for n in HEADLINE if n in registry.QUERIES]

    # Warm the JVM + parquet footer caches with a trivial action.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    per_query: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        df.count()
        per_query[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
