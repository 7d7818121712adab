"""S4: catalog upsert / MERGE on plain Parquet (SURVEY.md §4.3.1).

Reference semantics: ``add_update_document`` — insert-or-update keyed on
uuid, idempotent under message redelivery (tests/install_pipeline.py:22-23;
retryMaxAttempts=10 reactor.py:208). Vanilla Parquet has no MERGE, so the
engine provides it as a library composition:

    merged = latest_wins(old ∪ new, key, version)

written back with dynamic partition overwrite so only touched partitions
commit (the commit unit; concurrent writers are serialized upstream exactly
like the reference's message queue serializes store writes).

Scale notes: the union is shuffle-free; latest-wins is one hash aggregate
on the document key. Partitioning the catalog by a stable hash bucket of
the key means a re-index batch overwrites only the buckets it touched —
at 100 TB the merge cost is proportional to the delta, not the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import with_fixtures
from ..registry import register
from ..tables import jobs

N_BUCKETS = 64  # catalog partition buckets (pmod of key hash)


def latest_wins(old: DataFrame, new: DataFrame, key: list[str], version: str) -> DataFrame:
    """Merge two document snapshots keeping, per key, the row with the
    highest *version*. Ties go to `new` (its rows carry the higher
    source_rank). One union + one hash aggregate — no window, no sort."""
    tagged = old.withColumn("_src", F.lit(0)).unionByName(
        new.withColumn("_src", F.lit(1))
    )
    value_cols = [c for c in old.columns if c not in key]
    payload = F.struct(
        F.col(version).alias("_v"),
        F.col("_src").alias("_s"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_doc"),
    )
    return (
        tagged.groupBy(*key)
        .agg(F.max(payload).alias("_m"))
        .select(*key, "_m._doc.*")
    )


def write_catalog(df: DataFrame, path: str, key: str = "uuid") -> None:
    """Write a catalog snapshot partitioned by key hash-bucket, with
    dynamic partition overwrite as the commit unit."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.withColumn("bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(N_BUCKETS)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def read_catalog(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("bucket")


@register(
    "sink_catalog_upsert",
    sql=with_fixtures(
        """WITH old AS (SELECT uuid, state, session, 1 AS version FROM jobs),
                new AS (SELECT uuid, 'FINISHED' AS state, session, 2 AS version
                        FROM jobs WHERE job_key % 3 = 0)
           SELECT uuid,
                  arg_max(state, version) AS state,
                  arg_max(session, version) AS session,
                  max(version) AS version
           FROM (SELECT * FROM old UNION ALL SELECT * FROM new)
           GROUP BY uuid""",
        "jobs",
    ),
)
def sink_catalog_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 as a query: apply an update batch (every third job transitions to
    FINISHED at version 2) over the catalog snapshot; latest version wins
    per uuid. The write path (bucketed dynamic-partition overwrite) is
    exercised in tests/test_upsert.py including the apply-twice ≡
    apply-once idempotency property."""
    j = jobs(spark, sf_dir)
    old = j.select("uuid", "state", "session", F.lit(1).alias("version"))
    new = (
        j.filter(F.col("job_key") % 3 == 0)
        .select("uuid", F.lit("FINISHED").alias("state"), "session", F.lit(2).alias("version"))
    )
    return latest_wins(old, new, key=["uuid"], version="version").select(
        "uuid", "state", "session", "version"
    )


@register(
    "sink_event_emit",
    sql=with_fixtures(
        """SELECT uuid, 'indexed' AS name,
                  substr(sha256('emit:' || uuid), 1, 16) AS token,
                  last_event, state
           FROM jobs WHERE state = 'FINISHED'""",
        "jobs",
    ),
)
def sink_event_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: the outbox — downstream 'indexed' event messages for every job
    whose indexing completed (forward_event + send_message with retry,
    reactor.py:28-49,185-213). Batch shape: append rows to an outbox
    table; the streaming twin is streaming/queries.py stream_event_forward."""
    j = jobs(spark, sf_dir)
    return j.filter(F.col("state") == "FINISHED").select(
        "uuid",
        F.lit("indexed").alias("name"),
        F.substring(F.sha2(F.concat(F.lit("emit:"), F.col("uuid")), 256), 1, 16).alias("token"),
        "last_event",
        "state",
    )


# ------------------------------------------------- S6 bucketed co-location
BUCKETS_COLOCATED = 8


@register(
    "join_bucketed_colocated",
    sql=with_fixtures(
        """SELECT j.uuid, j.state, count(*) AS n_files,
                  CAST(sum(f.length) AS BIGINT) AS bytes_total
           FROM jobs j JOIN archive_files f ON f.job_uuid = j.uuid
           GROUP BY j.uuid, j.state""",
        "jobs",
        "archive_files",
    ),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: the co-located catalog join — both sides of the jobs⋈files
    join are first written as bucketed tables on the join key
    (bucketBy(8) + sortBy), then joined and rolled up WITHOUT a single
    Exchange in the plan: the bucket layout satisfies the join's
    distribution requirement, and the post-join aggregate reuses the same
    partitioning (HashPartitioning(uuid) ⊆ cluster{uuid, state}).

    This is the 100 TB catalog strategy in miniature: pay the shuffle
    ONCE at ingest (the bucketed write), then every per-key join, merge,
    and rollup against the catalog is shuffle-free forever after — the
    same reason the reference keeps its catalog keyed by uuid in Mongo
    (reactor.py:162-167 store writes). tests/test_plans.py pins the
    no-Exchange property; the oracle checks the join itself.
    """
    import os as _os

    from ..session import scratch_path
    from ..tables import archive_files as _archive_files

    base = scratch_path(spark, "bucketed_catalog")
    # The bucketed scan needs this enabled AT EXECUTION time, and the
    # returned frame is lazy — a scoped save/restore here would silently
    # re-shuffle the join when the caller finally acts on it. It defaults
    # to true, so only touch the session when a foreign session disabled
    # it (the one case the sticky write is observable is also the one
    # case the query cannot honor its zero-Exchange contract without it).
    if spark.conf.get("spark.sql.sources.bucketing.enabled") != "true":
        spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    sides = [
        ("cat_jobs_bucketed", jobs(spark, sf_dir).select("uuid", "state"), "uuid"),
        (
            "cat_files_bucketed",
            _archive_files(spark, sf_dir).select("job_uuid", "length"),
            "job_uuid",
        ),
    ]
    for name, df, key in sides:
        (
            df.write.bucketBy(BUCKETS_COLOCATED, key)
            .sortBy(key)
            .option("path", _os.path.join(base, name))
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    bj = spark.table("cat_jobs_bucketed")
    bf = spark.table("cat_files_bucketed")
    return (
        bj.join(bf, bj["uuid"] == bf["job_uuid"])
        .groupBy("uuid", "state")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("length").alias("bytes_total"),
        )
    )
