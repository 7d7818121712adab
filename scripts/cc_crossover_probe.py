"""Measure the connected-components window vs twophase min-strategy
crossover on planted power-law graphs (VERDICT r6 item 1).

The CC loop's per-vertex neighborhood minimum has two physical
strategies (llm/dedup._attach_neighborhood_min, knob
SPARK_GRAFT_CC_MIN_STRATEGY):

  * window   — one exchange per phase; a hub's WHOLE neighborhood is
               buffered/sorted inside one WindowExec task.
  * twophase — combiner groupBy (map-side partial mins, skew-proof) +
               shuffle-hash join-back; one more exchange per phase.

Until round 7 the crossover guidance in config.py was analytic only
("switch when max degree approaches the EDGES_PER_TASK budget"). This
probe MEASURES it: planted star-plus-background graphs at the
millions-of-edges design point (the 2M-edges-per-task sizing the loop
itself uses), hub degree swept through the task budget, both strategies
timed to full convergence on identical graphs, parity asserted.

Graph construction is pure Spark `range` arithmetic (no driver-side
edge lists): hub vertex 0 carries D spoke edges (0, 1..D); the
background is B edges in 8-vertex chains starting above the hub ids —
max background degree 2, so the hub is the ONLY skew source and the
measured delta isolates the strategy's skew behavior.

Run: `SPARK_GRAFT_CPUS=32 python scripts/cc_crossover_probe.py`
(prints one JSON line per (D, strategy) with best-of-2 wall-clock,
then a summary line; results recorded in BENCH_sf1.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

# Background: 4M edges in 8-vertex chains (max degree 2). Hub degree
# sweeps from well under to well past the 2M EDGES_PER_TASK budget.
BACKGROUND_EDGES = 4_000_000
CHAIN = 8
HUB_DEGREES = [50_000, 250_000, 1_000_000, 4_000_000]
REPS = 2

if "--smoke" in sys.argv:  # plumbing check only — not a measurement
    BACKGROUND_EDGES = 20_000
    HUB_DEGREES = [1_000, 10_000]
    REPS = 1


def planted_graph(spark, hub_degree: int, background_edges: int | None = None):
    """Star(0; 1..D) ∪ chains-of-8 over vertices above D — built from
    `range`, so the probe never materializes edges driver-side."""
    bg_edges = BACKGROUND_EDGES if background_edges is None else background_edges
    hub = spark.range(1, hub_degree + 1).select(
        F.lit(0).cast("long").alias("doc_a"), F.col("id").alias("doc_b")
    )
    base = hub_degree + 10
    # x -> x+1 within each aligned block of CHAIN vertices: drop the
    # last position of each block so components stay CHAIN-sized
    n_slots = bg_edges * CHAIN // (CHAIN - 1) + CHAIN
    bg = (
        spark.range(n_slots)
        .filter((F.col("id") % CHAIN) != (CHAIN - 1))
        .limit(bg_edges)
        .select(
            (F.col("id") + base).alias("doc_a"),
            (F.col("id") + base + 1).alias("doc_b"),
        )
    )
    return hub.unionByName(bg)


def main() -> None:
    from pipelinejobs_indexer_spark.llm.dedup import connected_components
    from pipelinejobs_indexer_spark.session import get_spark

    spark = get_spark("cc-crossover-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm codegen/JIT for BOTH strategies before any timed run, or the
    # first (D, strategy) cell eats the one-time compilation cost; a
    # tiny graph suffices — compilation is shape-, not size-, dependent
    for strategy in ("window", "twophase"):
        connected_components(
            planted_graph(spark, 1_000, background_edges=20_000),
            min_strategy=strategy,
        ).select("cluster_id").distinct().count()
    results = []
    for d in HUB_DEGREES:
        parity = {}
        for strategy in ("window", "twophase"):
            best = None
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                labels = connected_components(
                    planted_graph(spark, d), min_strategy=strategy
                )
                # converge + one cheap agg: component count AND an
                # order-free hash of the full (vertex, label) assignment
                row0 = labels.agg(
                    F.countDistinct("cluster_id").alias("n"),
                    # bit_xor: order-free and overflow-free (a sum of
                    # full-range xxhash64 longs trips ANSI overflow)
                    F.expr("bit_xor(xxhash64(doc_id, cluster_id))").alias("h"),
                ).collect()[0]
                n_comp, label_hash = row0["n"], row0["h"]
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            parity[strategy] = (n_comp, label_hash)
            row = {
                "hub_degree": d,
                "background_edges": BACKGROUND_EDGES,
                "strategy": strategy,
                "sec": round(best, 2),
                "components": n_comp,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        # parity: the full labeling (not just the component count) must
        # agree between strategies — raise, never assert (a -O run must
        # not silently drop the invariant the timings depend on)
        if parity["window"] != parity["twophase"]:
            raise RuntimeError(f"strategy divergence at D={d}: {parity}")
    by_d = {
        d: {
            r["strategy"]: r["sec"]
            for r in results
            if r["hub_degree"] == d
        }
        for d in HUB_DEGREES
    }
    crossover = None
    for d in HUB_DEGREES:
        if by_d[d]["twophase"] < by_d[d]["window"]:
            crossover = d
            break
    print(
        json.dumps(
            {
                "summary": by_d,
                "measured_crossover_hub_degree": crossover,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
