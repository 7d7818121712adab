"""Round-14 optimization profiling harness (guide §1).

Per headline query: time plan construction (driver-side Python + analysis),
the bench action (force_full_eval — the frozen methodology), and a noop-sink
run (guide §1.4), and dump .explain("formatted") to plans/r14/<q>_before.txt
(or _after.txt with --after). Labels every job (guide §1.5).

Usage: python scripts/r14_profile.py [--after] [--sf DIR] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pipelinejobs_indexer_spark import registry
from pipelinejobs_indexer_spark.session import get_spark

import bench


def force_full_eval(df) -> int:
    return bench.force_full_eval(df)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = "after" if "--after" in sys.argv else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r14-profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    names = args or bench.HEADLINE
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(outdir, exist_ok=True)
    # Warm footer caches like bench does.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    results = {}
    for name in names:
        rec: dict = {}
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"r14:{name}:construct")
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        rec["construct"] = round(time.perf_counter() - t0, 4)

        # plan dump (formatted) — the judge-checkable evidence
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        rec["exchanges"] = plan.split("\n\n")[0].count("Exchange")

        # bench-protocol action, cold then warm (cache cleared like bench).
        # Each run also records hypervisor steal jiffies (this sandbox has
        # bursty host-side contention): a run with steal>0 is suspect.
        def _steal() -> int:
            try:
                with open("/proc/stat") as fh:
                    return int(fh.readline().split()[8])
            except (OSError, ValueError, IndexError):
                return 0

        n_runs = 5 if args else 3
        evals, steals = [], []
        for i in range(n_runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"r14:{name}:eval{i}")
            s0 = _steal()
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, sf_dir)
            force_full_eval(df)
            evals.append(round(time.perf_counter() - t0, 4))
            steals.append(_steal() - s0)
        rec["bench_runs"] = evals
        rec["steal_jiffies"] = steals

        # noop-sink run (computation only, no driver hash-agg collect)
        spark.catalog.clearCache()
        df = registry.QUERIES[name](spark, sf_dir)
        spark.sparkContext.setJobDescription(f"r14:{name}:noop")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        rec["noop_warm"] = round(time.perf_counter() - t0, 4)
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({"total_min_bench": round(sum(min(r["bench_runs"]) for r in results.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
