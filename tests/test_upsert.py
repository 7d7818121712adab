"""S4 upsert properties: latest-wins merge + bucketed dynamic-partition
overwrite, and the reference's retry-safety invariant — applying the same
batch twice must equal applying it once (reactor.py:208 redelivery)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pipelinejobs_indexer_spark.plans.upsert import (  # noqa: E402
    latest_wins,
    read_catalog,
    write_catalog,
)
from pipelinejobs_indexer_spark.tables import jobs  # noqa: E402


def _snapshot(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_idempotent(spark, sf_dir, tmp_path):
    j = jobs(spark, sf_dir)
    old = j.select("uuid", "state", F.lit(1).alias("version"))
    new = (
        j.filter(F.col("job_key") % 3 == 0)
        .select("uuid", F.lit("FINISHED").alias("state"), F.lit(2).alias("version"))
    )
    once = latest_wins(old, new, ["uuid"], "version")
    twice = latest_wins(once, new, ["uuid"], "version")
    assert _snapshot(once) == _snapshot(twice)
    # updated rows actually won
    updated = once.filter(F.col("version") == 2)
    assert updated.count() == new.count()
    assert updated.filter(F.col("state") != "FINISHED").count() == 0


def test_write_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    path = str(tmp_path / "catalog")
    j = jobs(spark, sf_dir).select("uuid", "state", F.lit(1).alias("version"))
    write_catalog(j, path)
    first = read_catalog(spark, path)
    assert first.count() == j.count()

    # apply an update batch through merge + rewrite; reread must reflect it
    new = j.limit(50).select("uuid", F.lit("FINISHED").alias("state"), F.lit(2).alias("version"))
    merged = latest_wins(first, new, ["uuid"], "version")
    write_catalog(merged, path)
    after = read_catalog(spark, path)
    assert after.count() == j.count()
    assert after.filter(F.col("version") == 2).count() == 50
