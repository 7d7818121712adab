"""Heavy-tail sf1 scale probe (run after scripts/make_scale_probe.py).

Runs the four most expensive operators at sf0.1 (the bench scale) and at
the generated sf1 probe (10x documents/embeddings), and reports per-query
wall-clock, the scaling ratio, and the physical-plan Exchange count at
both scales. Pass criteria (recorded in BENCH_sf1.md):

  * no super-linear blowup — sf1 time < 10x sf0.1 time per query;
  * no new Exchange appears in any plan at the larger scale.

Tables the probe queries do not stress (everything except documents /
embeddings) are symlinked from sf0.1 so loaders resolve.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

PROBE = os.path.join(ROOT, ".scale_probe", "sf1")
SF01 = "/root/testdata/sf0.1"
QUERIES = [
    "llm_dedup_minhash",
    "llm_dedup_clusters",
    "llm_corpus_curate_v3",
    "llm_similarity_ann",
    # round-4 additions with corpus-shaped cost profiles
    "llm_dedup_substring",
    "llm_dedup_containment",
    "llm_bpe_train",
]


def _link_missing_tables() -> None:
    for f in os.listdir(SF01):
        dst = os.path.join(PROBE, f)
        if f.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(SF01, f), dst)


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def main() -> None:
    from pipelinejobs_indexer_spark import registry
    from pipelinejobs_indexer_spark.session import get_spark

    from bench import force_full_eval

    _link_missing_tables()
    spark = get_spark("scale-probe")
    registry.load_all()
    spark.read.parquet(f"{SF01}/nation.parquet").count()

    results: dict[str, dict] = {}
    for name in QUERIES:
        row: dict = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", PROBE)):
            spark.catalog.clearCache()
            df = registry.QUERIES[name](spark, sf_dir)
            row[f"{label}_exchanges"] = _exchanges(df)
            best = None
            for _ in range(2):  # best-of-2 warm, matching bench.py
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                df = registry.QUERIES[name](spark, sf_dir)
                n = force_full_eval(df)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            row[f"{label}_sec"] = round(best, 3)
            row[f"{label}_rows"] = n
        row["ratio"] = round(row["sf1_sec"] / row["sf0.1_sec"], 2)
        row["superlinear"] = row["ratio"] >= 10
        row["new_exchanges"] = row["sf1_exchanges"] > row["sf0.1_exchanges"]
        results[name] = row
        print(name, json.dumps(row))
    print(json.dumps({"probe": results}))
    spark.stop()


if __name__ == "__main__":
    main()
