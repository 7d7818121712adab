"""Sort / limit / top-k operators (SURVEY.md §2.6).

O1 sort_history    — chronological event ordering (init-job.json:38-102)
O2 topk_recent_jobs — most recently updated jobs (README.rst:76-79 triage)

Scale notes: O2 compiles to TakeOrderedAndProject — per-partition heaps of
size k, then a k-row merge on the driver; no global sort ever materializes.
O1 derives the global position WITHOUT a global-window funnel: range
partition on the sort key (contiguous key ranges per partition), rank
locally inside each partition, count rows per partition (a partition-count
frame of `shuffle.partitions` rows), prefix-sum those counts, and
broadcast-join the offsets back — global pos = partition offset + local
rank. Every stage is distributed; the only single-task work is the prefix
sum over ~32 rows. This is the zipWithIndex shape expressed declaratively.
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
    position column so order survives the driver's order-insensitive hash.

    (date, event_seq) is a unique key, so local-rank + partition offsets
    over a range partitioning reproduces row_number() OVER (ORDER BY ...)
    exactly — with no Exchange SinglePartition in the plan (asserted in
    tests/test_plans.py)."""
    ranged = (
        job_events(spark, sf_dir)
        .select("event_seq", "job_uuid", "name", "date")
        .repartitionByRange("date", "event_seq")
        .withColumn("pid", F.spark_partition_id())
    )
    local = F.row_number().over(
        Window.partitionBy("pid").orderBy("date", "event_seq")
    )
    counts = ranged.groupBy("pid").agg(F.count("*").alias("cnt"))
    offsets = counts.select(
        "pid",
        (
            F.sum("cnt").over(
                Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("offset"),
    ).fillna({"offset": 0})
    return (
        ranged.withColumn("local_pos", local)
        .join(F.broadcast(offsets), "pid")
        .select(
            (F.col("offset") + F.col("local_pos")).cast("int").alias("pos"),
            "job_uuid",
            "name",
            "date",
        )
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
