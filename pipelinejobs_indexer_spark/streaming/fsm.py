"""T5: the job state machine as a custom stateful streaming operator.

Reference semantics (transitions dep, requirements-dev.txt:7; two-message
INDEXING→FINISHED flow reactor.py:185-208; stuck-job recovery
README.rst:74-86):

  * events drive transitions create→CREATED, run→RUNNING, finish→FINISHED;
  * duplicate or late events must NOT regress state (the handler re-reads
    job state before acting, reactor.py:126-127,169-176);
  * illegal transitions are rejected and counted, never raised — a
    redelivered 'indexed' after FINISHED is tolerated.

Implementation: ``applyInPandasWithState`` keyed by job_uuid. Per key the
state tuple is (state, last_seq, n_events, n_rejected); within each
micro-batch rows are sorted by (date, event_seq) so replay order is
deterministic. Emits the current snapshot every batch (update mode).

Scale notes: state is O(1) per live job and partitioned by key in the
state store; watermark-based TTL (see stream_late_data) bounds it for
terminated jobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_TRANSITIONS = {
    ("INIT", "create"): "CREATED",
    ("CREATED", "run"): "RUNNING",
    ("RUNNING", "finish"): "FINISHED",
    # stuck-job recovery: a manual 'finish' while still CREATED is legal
    # (the reference's manual 'indexed' message advances stuck jobs)
    ("CREATED", "finish"): "FINISHED",
}

OUTPUT_SCHEMA = StructType(
    [
        StructField("job_uuid", StringType()),
        StructField("state", StringType()),
        StructField("n_events", LongType()),
        StructField("n_rejected", LongType()),
        StructField("last_seq", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("state", StringType()),
        StructField("n_events", LongType()),
        StructField("n_rejected", LongType()),
        StructField("last_seq", LongType()),
    ]
)


def _fsm(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (job_uuid,) = key
    if state.exists:
        cur, n_events, n_rejected, last_seq = state.get
    else:
        cur, n_events, n_rejected, last_seq = "INIT", 0, 0, -1
    for pdf in pdfs:
        pdf = pdf.sort_values(["date", "event_seq"])
        for name, seq in zip(pdf["name"], pdf["event_seq"]):
            n_events += 1
            if seq <= last_seq:  # duplicate / late redelivery: ignore
                n_rejected += 1
                continue
            nxt = _TRANSITIONS.get((cur, name))
            if nxt is None:  # illegal transition: reject, never regress
                n_rejected += 1
            else:
                cur = nxt
                last_seq = seq
    state.update((cur, n_events, n_rejected, last_seq))
    yield pd.DataFrame(
        {
            "job_uuid": [job_uuid],
            "state": [cur],
            "n_events": [n_events],
            "n_rejected": [n_rejected],
            "last_seq": [last_seq],
        }
    )


def fsm_apply(events: DataFrame) -> DataFrame:
    """Apply the job FSM to a (job_uuid, date, name, event_seq) stream."""
    return events.groupBy("job_uuid").applyInPandasWithState(
        _fsm,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
