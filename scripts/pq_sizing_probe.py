"""PQ m/k sizing probe (round 8, VERDICT r7 item 3 — companion to
`ivf_sizing_probe.py` / `lsh_sizing_probe.py`).

`llm_pq_recall_eval` (L3l) exists to SIZE the pq_m/pq_k knobs, and its
own docstring notes the 4x4 default "deliberately measures LOW" — until
now the audit had no consumer. This probe measures the full fidelity /
cost surface at the sf1 probe's 20k x 64-dim vectors:

  * m sweep {4, 8, 16} x k sweep {4, 16, 64} (m must divide dim=64;
    k=64 is the codegen argmin-expression cap, config.py);
  * per cell: mean recall@10 over the probe set (llm_pq_recall_eval),
    mean/max exact-integer reconstruction error (llm_embedding_pq's
    err column), ADC search wall time (llm_similarity_pq, best of 2,
    bench.py's force_full_eval), training wall time, and the analytic
    memory ratio raw_float32_bits / (m * ceil(log2(k))) — the number PQ
    exists to shrink.

Each cell runs in a fresh subprocess with SPARK_GRAFT_PQ_M / _K
exported, exactly as a production run would set them — the registered
query code is byte-identical across cells (the CDC-gear-flip pattern,
r7 item 2, replayed for PQ). Results: BENCH_sf1.md round-8 addendum;
the measured knee decides the shipping defaults in config.py.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
SF1 = os.path.join(ROOT, ".scale_probe", "sf1")

_CELL = r"""
import json, sys, time
sys.path.insert(0, %(root)r)
from pipelinejobs_indexer_spark.session import get_spark
from pipelinejobs_indexer_spark.llm.train import (
    llm_embedding_pq, llm_pq_recall_eval, llm_similarity_pq,
)
from bench import force_full_eval
from pyspark.sql import functions as F

spark = get_spark("pq-cell")
sf = %(sf)r
t0 = time.perf_counter()
fit = llm_embedding_pq(spark, sf)
err = fit.agg(
    F.avg("err").alias("mean"), F.max("err").alias("max")
).first()
train_sec = time.perf_counter() - t0
rec = llm_pq_recall_eval(spark, sf)
recall = rec.agg(F.avg(rec.columns[-1]).alias("r")).first()["r"]
best = None
for _ in range(2):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    force_full_eval(llm_similarity_pq(spark, sf))
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print("CELL " + json.dumps({
    "recall_at_10": round(recall, 4),
    "mean_err": int(err["mean"]),
    "max_err": int(err["max"]),
    "search_sec": round(best, 3),
    "train_sec": round(train_sec, 3),
}))
spark.stop()
"""


def _run_cell(m: int, k: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_PQ_M=str(m),
        SPARK_GRAFT_PQ_K=str(k),
    )
    out = subprocess.run(
        [sys.executable, "-c", _CELL % {"root": ROOT, "sf": SF1}],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        cwd=ROOT,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CELL "):
            row = json.loads(line[5:])
            # raw = 64 coords x 32-bit float; code = m subspace ids of
            # ceil(log2(k)) bits each
            row["code_bits"] = m * math.ceil(math.log2(k))
            row["mem_ratio"] = round(64 * 32 / row["code_bits"], 1)
            return row
    raise RuntimeError(
        f"cell m={m} k={k} produced no result:\n"
        f"{out.stdout[-1000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    cells = [(m, k) for m in (4, 8, 16) for k in (4, 16, 64)]
    results = {}
    for m, k in cells:
        row = _run_cell(m, k)
        results[f"m{m}_k{k}"] = row
        print(f"m={m} k={k} {json.dumps(row)}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
