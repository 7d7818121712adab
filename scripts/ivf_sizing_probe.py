"""IVF nprobe/stride sizing probe (round 7, companion to
`lsh_sizing_probe.py`).

config.py's IVF guidance ("centroids ~ sqrt(n), probe more cells for
recall") was analytic-only. This probe measures the recall/cost surface
of `llm_similarity_ivf` at the sf1 probe's 20k vectors against the exact
brute-force top-k (`llm_similarity_topk`, the registered baseline):

  * nprobe sweep {1, 2, 4, 8} at the default stride 61 (~328 cells);
  * stride sweep {20, 61, 200} (1000 / 328 / 100 cells) at the default
    nprobe 2.

Both knobs are captured at import (config.CONFIG), exactly like a
production run would set them, so each cell runs in a fresh subprocess
with SPARK_GRAFT_IVF_NPROBE / SPARK_GRAFT_IVF_CENT_STRIDE exported —
the registered query code is byte-identical across cells. Recall@10 =
|ivf_pairs ∩ exact_pairs| / |exact_pairs| over the N_QUERIES query set.
Results: BENCH_sf1.md round-7 addendum.
"""

from __future__ import annotations

import json
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
from pipelinejobs_indexer_spark.llm.similarity import (
    llm_similarity_ivf, llm_similarity_topk,
)
from bench import force_full_eval

spark = get_spark("ivf-cell")
sf = %(sf)r
exact = {(r.qid, r.vec_id) for r in llm_similarity_topk(spark, sf).collect()}
best = None
for _ in range(2):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    force_full_eval(llm_similarity_ivf(spark, sf))
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
ivf = {(r.qid, r.vec_id) for r in llm_similarity_ivf(spark, sf).collect()}
print("CELL " + json.dumps({
    "sec": round(best, 3),
    "rows": len(ivf),
    "recall": round(len(ivf & exact) / len(exact), 4),
}))
spark.stop()
"""


def _run_cell(stride: int, nprobe: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_IVF_CENT_STRIDE=str(stride),
        SPARK_GRAFT_IVF_NPROBE=str(nprobe),
    )
    out = subprocess.run(
        [sys.executable, "-c", _CELL % {"root": ROOT, "sf": SF1}],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=ROOT,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CELL "):
            return json.loads(line[5:])
    raise RuntimeError(
        f"cell stride={stride} nprobe={nprobe} produced no result:\n"
        f"{out.stdout[-1000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    cells = [(61, 1), (61, 2), (61, 4), (61, 8), (20, 2), (200, 2)]
    results = {}
    for stride, nprobe in cells:
        row = _run_cell(stride, nprobe)
        results[f"stride{stride}_nprobe{nprobe}"] = row
        print(f"stride={stride} nprobe={nprobe} {json.dumps(row)}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
