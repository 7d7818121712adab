"""Sort / limit / top-k operators (SURVEY.md §2.6).

O1 sort_history    — chronological event ordering (init-job.json:38-102)
O2 topk_recent_jobs — most recently updated jobs (README.rst:76-79 triage)

Scale notes: O2 compiles to TakeOrderedAndProject — per-partition heaps of
size k, then a k-row merge on the driver; no global sort ever materializes.
O1 demonstrates a total order: Spark uses a range-partitioned sort
(sampled boundaries), so data stays distributed; the explicit global
row_number here exists for oracle comparability and is the one
intentionally non-scalable construct in this module (at 100 TB you'd keep
the range-sorted output and derive positions per partition + offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..oracle import with_fixtures
from ..registry import register
from ..tables import job_events, jobs


@register(
    "sort_history",
    sql=with_fixtures(
        """SELECT row_number() OVER (ORDER BY date, event_seq) AS pos,
                  job_uuid, name, date
           FROM job_events""",
        "job_events",
    ),
)
def sort_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: total chronological order over the event stream, with an explicit
    position column so order survives the driver's order-insensitive hash."""
    w = Window.orderBy("date", "event_seq")
    return job_events(spark, sf_dir).select(
        F.row_number().over(w).alias("pos"), "job_uuid", "name", "date"
    )


@register(
    "topk_recent_jobs",
    sql=with_fixtures(
        """SELECT uuid, state, updated FROM jobs
           ORDER BY updated DESC, uuid DESC LIMIT 25""",
        "jobs",
    ),
)
def topk_recent_jobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: the 25 most recently updated jobs (operational triage: find jobs
    stuck in INDEXING, README.rst:76-79). orderBy+limit → Spark's
    TakeOrderedAndProject (distributed top-k, no global sort). uuid
    tie-break makes the cut deterministic across engines."""
    return (
        jobs(spark, sf_dir)
        .select("uuid", "state", "updated")
        .orderBy(F.desc("updated"), F.desc("uuid"))
        .limit(25)
    )
