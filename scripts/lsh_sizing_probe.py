"""LSH plane-count sizing probe (round 7, follow-up to `scale_probe.py
embed10`).

The embed10 probe flagged `llm_dedup_embedding_lsh` superlinear (14.7x
time for 10x vectors) at the FIXTURE default of 4 planes. That is the
documented fixed-knob failure mode, not a plan regression: 2^4 = 16
buckets means occupancy grows linearly with n and same-bucket candidate
pairs quadratically. config.py's sizing rule — planes ~
log2(n / desired_bucket_size) — was analytic-only; this probe measures
it. Matrix:

  * sf0.1 (2k vectors)  @ 4 planes — the bench point (125/bucket);
  * sf1   (20k vectors) @ 4 planes — the flagged point (1250/bucket);
  * sf1 @ 7 and 8 planes — the rule's prescription for 10x data
    (156 / 78 per bucket, bracketing the original occupancy);
  * sf1 @ (8 planes x 4 tables) and (10 planes x 8 tables) — the AND-OR
    amplified construction (lsh_tables knob): deep tables bound
    occupancy, table count restores the recall the depth costs
    (1-(1-p_r)^b), candidates linear in tables.

For each cell: wall-clock (best-of-2 warm, the scale_probe protocol),
candidate-pair count (the quantity the rule actually bounds), emitted
pairs, and recall vs the exact all-pairs ground truth
(`llm_dedup_embedding` — both scales sit under exact_pairs_max_rows, so
no cap override). LSH output is a subset of the exact output (identical
cosine expression and threshold on a candidate subset), so recall =
lsh_rows / exact_rows. Results: BENCH_sf1.md round-7 addendum.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, ".scale_probe", "sf1")


def _candidates(spark, sf_dir: str, n_planes: int, n_tables: int = 1) -> int:
    """Candidate-pair count of the LSH plan at (n_planes, n_tables) —
    the same bucket/probe expressions the registered query uses."""
    from pyspark.sql import functions as F

    from pipelinejobs_indexer_spark.llm.similarity import (
        _bucket_expr_spark,
        probes_spark,
    )
    from pipelinejobs_indexer_spark.tables import load_table, spread

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    hashed = emb
    for t in range(n_tables):
        hashed = hashed.withColumn(
            f"b{t}", _bucket_expr_spark("v", n_planes, plane_offset=t * n_planes)
        )
    probe_list = ", ".join(
        probes_spark(n_planes, col=f"b{t}", prefix=f"{t}:")
        for t in range(n_tables)
    )
    if n_tables > 1:
        probe_list = f"concat({probe_list})"
    probes = hashed.select(
        "vec_id", F.explode(F.expr(probe_list)).alias("pb")
    )
    own_keys = ", ".join(f"concat('{t}:', b{t})" for t in range(n_tables))
    right = hashed.select(
        F.col("vec_id").alias("vid_b"),
        F.explode(F.expr(f"array({own_keys})")).alias("hb"),
    )
    return (
        probes.join(
            right,
            (F.col("pb") == F.col("hb")) & (F.col("vec_id") < F.col("vid_b")),
        )
        .select("vec_id", "vid_b")
        .distinct()
        .count()
    )


def main() -> None:
    from pipelinejobs_indexer_spark import registry
    from pipelinejobs_indexer_spark.session import get_spark
    from pipelinejobs_indexer_spark.llm.dedup import (
        llm_dedup_embedding,
        llm_dedup_embedding_lsh,
    )

    from bench import force_full_eval

    spark = get_spark("lsh-sizing-probe")
    registry.load_all()
    spark.read.parquet(f"{SF01}/nation.parquet").count()

    exact: dict[str, int] = {}
    for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        exact[label] = force_full_eval(llm_dedup_embedding(spark, sf_dir))
        print(
            f"exact {label}: {exact[label]} pairs "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )

    cells = [
        ("sf0.1", SF01, 4, 1),
        ("sf1", SF1, 4, 1),
        ("sf1", SF1, 7, 1),
        ("sf1", SF1, 8, 1),
        ("sf1", SF1, 8, 4),
        ("sf1", SF1, 10, 8),
    ]
    results = {}
    for label, sf_dir, planes, tables in cells:
        best, rows = None, None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = force_full_eval(
                llm_dedup_embedding_lsh(
                    spark, sf_dir, n_planes=planes, n_tables=tables
                )
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        cand = _candidates(spark, sf_dir, planes, tables)
        row = {
            "sec": round(best, 3),
            "candidates": cand,
            "rows": rows,
            "recall": round(rows / exact[label], 4) if exact[label] else None,
        }
        key = f"{label}@p{planes}" + (f"x t{tables}" if tables > 1 else "")
        results[key] = row
        print(f"{key} {json.dumps(row)}", flush=True)

    print(json.dumps({"exact": exact, "lsh": results}))
    spark.stop()


if __name__ == "__main__":
    main()
