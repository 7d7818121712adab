"""Streaming state-store backend probe at 10x keys/events (round 8,
VERDICT r7 item 5).

The ``state_store`` knob (config.py; hdfs in-heap vs RocksDB) landed
with a parity test and an sf0.1 overhead addendum, but no evidence at a
state size where the backend choice is load-bearing. This probe replays
the T5 job-FSM (``fsm_apply``, the package's applyInPandasWithState
pipeline — byte-identical code, only the provider conf differs) over a
generated 10x corpus:

  * 1,000,000 events over 15,000 keys (sf0.1: 100k / 1.5k), written as
    8 parquet files so ``maxFilesPerTrigger=1`` yields 8 micro-batches —
    per-batch latency is observable and state must persist ACROSS
    batches (the regime checkpoint/restore cost shows up in);
  * each backend runs in a fresh subprocess with SPARK_GRAFT_STATE_STORE
    exported (the pq_sizing_probe / CDC-gear-flip pattern);
  * reported per backend: total wall, per-batch durationMs, state
    operator metrics (numRowsTotal / numRowsUpdated / memoryUsedBytes /
    commit time), and a final-snapshot signature (count + xor of
    hash(job_uuid, state, n_events, last_seq)) asserted IDENTICAL across
    backends — the knob's results-never-change contract at probe scale.

Results: BENCH_sf1.md round-8 addendum. Generation is deterministic
(seed 43); outputs under .scale_probe/stream10/ are not committed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(ROOT, ".scale_probe", "stream10")

N_EVENTS = 1_000_000
N_KEYS = 15_000
N_FILES = 8


def _generate() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(OUT, exist_ok=True)
    done = os.path.join(OUT, ".generated")
    if os.path.exists(done):
        return
    rng = np.random.RandomState(43)
    per = N_EVENTS // N_FILES
    base_us = 1_700_000_000_000_000  # fixed epoch base, deterministic
    for f in range(N_FILES):
        event_id = np.arange(f * per, (f + 1) * per, dtype=np.int64)
        tbl = pa.table(
            {
                "event_id": event_id,
                "ts": (base_us + event_id * 1_000_000).astype(
                    "datetime64[us]"
                ),
                "user_id": rng.randint(0, N_KEYS, per).astype(np.int64),
                "event_type": np.where(
                    event_id % 3 == 0, "create",
                    np.where(event_id % 3 == 1, "run", "finish"),
                ),
                "value": rng.rand(per),
                "props": np.array(["{}"] * per),
            }
        )
        pq.write_table(tbl, os.path.join(OUT, f"events_{f:03d}.parquet"))
    open(done, "w").write("ok")


_CELL = r"""
import json, sys, time
sys.path.insert(0, %(root)r)
from pyspark.sql import functions as F
from pipelinejobs_indexer_spark.session import get_spark
from pipelinejobs_indexer_spark.streaming.core import state_store_conf
from pipelinejobs_indexer_spark.streaming.fsm import fsm_apply
import uuid as _uuid

spark = get_spark("state-store-cell")
spark.sparkContext.setLogLevel("ERROR")
schema = spark.read.parquet(%(out)r).schema
raw = (
    spark.readStream.format("parquet").schema(schema)
    .option("maxFilesPerTrigger", 1).load(%(out)r)
)
# the exact _job_events_stream projection (streaming/queries.py:51)
name = (
    F.when(F.col("event_id") %% 3 == 0, "create")
    .when(F.col("event_id") %% 3 == 1, "run")
    .otherwise("finish")
)
je = raw.select(
    F.col("event_id").alias("event_seq"),
    F.concat(F.lit("107"), F.sha2(F.col("user_id").cast("string"), 256)).alias("job_uuid"),
    F.col("ts").cast("timestamp").alias("date"),
    name.alias("name"),
    F.col("user_id").alias("job_key"),
)
qname = "probe_" + _uuid.uuid4().hex
t0 = time.perf_counter()
with state_store_conf(spark):
    q = (
        fsm_apply(je).writeStream.outputMode("update").format("memory")
        .queryName(qname).trigger(availableNow=True).start()
    )
    assert q.awaitTermination(1200), "probe replay timed out"
wall = time.perf_counter() - t0
batches = []
for p in q.recentProgress:
    so = (p.get("stateOperators") or [{}])[0]
    if p.get("numInputRows", 0) == 0 and not so:
        continue
    batches.append({
        "rows": p.get("numInputRows"),
        "batch_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        "state_rows": so.get("numRowsTotal"),
        "updated": so.get("numRowsUpdated"),
        "state_mem_bytes": so.get("memoryUsedBytes"),
        "commit_ms": so.get("allUpdatesTimeMs"),
    })
# final snapshot signature: fold update-mode emissions per key
snap = (
    spark.table(qname).groupBy("job_uuid").agg(
        F.expr("max_by(state, n_events)").alias("state"),
        F.max("n_events").alias("n_events"),
        F.expr("max_by(last_seq, n_events)").alias("last_seq"),
    )
)
sig = snap.agg(
    F.count("*").alias("n"),
    F.bit_xor(F.xxhash64("job_uuid", "state", "n_events", "last_seq")).alias("h"),
).first()
print("CELL " + json.dumps({
    "wall_sec": round(wall, 2),
    "n_batches": len(batches),
    "batches": batches,
    "snapshot": {"keys": sig["n"], "hash": int(sig["h"])},
}))
spark.stop()
"""


def _run_cell(backend: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_STATE_STORE=backend)
    out = subprocess.run(
        [sys.executable, "-c", _CELL % {"root": ROOT, "out": OUT}],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=ROOT,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CELL "):
            return json.loads(line[5:])
    raise RuntimeError(
        f"backend={backend} produced no result:\n"
        f"{out.stdout[-1000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    _generate()
    results = {}
    for backend in ("hdfs", "rocksdb"):
        row = _run_cell(backend)
        results[backend] = row
        print(backend, json.dumps(row), flush=True)
    h, r = results["hdfs"]["snapshot"], results["rocksdb"]["snapshot"]
    assert h == r, f"backend changed the answer: hdfs={h} rocksdb={r}"
    print(json.dumps({"probe": results, "parity": "identical snapshots"}))


if __name__ == "__main__":
    main()
