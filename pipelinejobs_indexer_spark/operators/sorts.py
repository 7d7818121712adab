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

    (date, event_seq) is a unique key, so local-rank + bucket offsets
    reproduce row_number() OVER (ORDER BY ...) exactly with no Exchange
    SinglePartition funnel (asserted in tests/test_plans.py). The range
    bucket is derived FROM THE DATA (calendar day of `date`), never from
    spark_partition_id() over repartitionByRange: sampled range
    boundaries (and AQE coalescing) can differ between the two
    executions of the frame — the count pass and the rank pass — which
    silently misaligns physical partition ids; a data-derived bucket is
    identical in every execution by construction. Parallelism = day
    count; at 100 TB bucket by (day, hour) or finer — the shape is
    unchanged, only the bucket expression."""
    ev = (
        job_events(spark, sf_dir)
        .select("event_seq", "job_uuid", "name", "date")
        .withColumn("bucket", F.to_date("date"))
    )
    local = F.row_number().over(
        Window.partitionBy("bucket").orderBy("date", "event_seq")
    )
    counts = ev.groupBy("bucket").agg(F.count("*").alias("cnt"))
    offsets = counts.select(
        "bucket",
        (
            F.sum("cnt").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("offset"),
    ).fillna({"offset": 0})
    return (
        ev.withColumn("local_pos", local)
        .join(F.broadcast(offsets), "bucket")
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
