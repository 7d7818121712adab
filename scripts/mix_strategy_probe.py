"""Measure llm_corpus_mix_sample's two-phase prefix sum against the
naive per-source window under source skew (the claim in its docstring:
"the naive plan is a straggler factory when one source dominates").

The mixture selection needs, per source, a running token sum in
priority order. Two physical strategies:

  * naive    — ONE window partitioned by source: every row of a source
               flows through a single WindowExec task; a 90%-of-corpus
               source serializes 90% of the work.
  * twophase — mix_select's production plan: range-bucket the priority
               key's top 4 bits, combiner groupBy to a sources×16
               offsets frame, broadcast it back, window WITHIN
               (source, bucket) — 16 parallel tasks for that same
               source.

Token frames are built from pure Spark `range` arithmetic (no text, no
driver-side rows): doc i has n_tokens = 10 + i % 191 and the production
md5 priority key; sources follow a planted 90/10 skew (90% of docs in
one source, the rest uniform over 9). Both strategies run on identical
frames, parity is asserted via (count, sum(cum), xor-hash) signature,
and each is timed best-of-REPS to full materialization.

Run: `SPARK_GRAFT_CPUS=32 python scripts/mix_strategy_probe.py`
(one JSON line per (rows, strategy), then a summary; results recorded
in BENCH_sf1.md). `--smoke` shrinks it to a plumbing check.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from pipelinejobs_indexer_spark.llm.text import (  # noqa: E402
    _mix_key_spark,
    mix_select,
)
from pipelinejobs_indexer_spark.session import get_spark  # noqa: E402

ROW_COUNTS = [1_000_000, 4_000_000, 8_000_000]
REPS = 2
SKEW_PCT = 90  # % of docs in the single hot source

if "--smoke" in sys.argv:  # plumbing check only — not a measurement
    ROW_COUNTS = [50_000]
    REPS = 1


def skewed_tokens(spark, n_rows: int) -> DataFrame:
    """(doc_id, source, n_tokens, k) with SKEW_PCT% of docs in source
    'big' and the rest uniform over s0..s8 — pure range arithmetic."""
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 100 < SKEW_PCT, F.lit("big"))
            .otherwise(F.concat(F.lit("s"), (F.col("id") % 9).cast("string")))
            .alias("source"),
            (10 + F.col("id") % 191).cast("bigint").alias("n_tokens"),
            F.expr(_mix_key_spark()).alias("k"),
        )
    )


def naive_select(tok: DataFrame) -> DataFrame:
    """The oracle's formulation as a physical plan: one window per
    source — correct, and exactly what mix_select exists to avoid."""
    w = Window.partitionBy("source").orderBy("k", "doc_id")
    tot = tok.agg(
        F.sum("n_tokens").alias("total"),
        F.countDistinct("source").alias("ns"),
    )
    return (
        tok.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(F.broadcast(tot))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < F.expr("total div ns"))
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


def signature(df: DataFrame) -> tuple:
    row = df.agg(
        F.count("*").alias("n"),
        F.sum("cum_tokens").alias("s"),
        F.expr("bit_xor(xxhash64(doc_id, cum_tokens))").alias("x"),
    ).collect()[0]
    return (row.n, row.s, row.x)


def timed(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    spark = get_spark("mix-strategy-probe")
    spark.sparkContext.setLogLevel("ERROR")
    summary = []
    for n_rows in ROW_COUNTS:
        tok = skewed_tokens(spark, n_rows)
        two, naive = mix_select(tok), naive_select(tok)
        sig_two, sig_naive = signature(two), signature(naive)
        assert sig_two == sig_naive, (
            f"strategy divergence at {n_rows}: {sig_two} != {sig_naive}"
        )
        times = {}
        for name, df in [("twophase", two), ("naive", naive)]:
            secs = timed(lambda d=df: d.foreach(lambda r: None), REPS)
            times[name] = secs
            print(
                json.dumps(
                    {
                        "rows": n_rows,
                        "strategy": name,
                        "best_s": round(secs, 3),
                        "selected": sig_two[0],
                    }
                ),
                flush=True,
            )
        summary.append(
            {
                "rows": n_rows,
                "twophase_s": round(times["twophase"], 3),
                "naive_s": round(times["naive"], 3),
                "speedup": round(times["naive"] / times["twophase"], 2),
            }
        )
    print(json.dumps({"summary": summary, "skew_pct": SKEW_PCT}))


if __name__ == "__main__":
    main()
