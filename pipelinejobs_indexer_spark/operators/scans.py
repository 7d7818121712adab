"""Scan / source operators (SURVEY.md §2.1).

S1 scan_parquet         — typed parquet scan with column pruning.
S2 scan_json_messages   — free-form JSON payload parsing into typed columns
                          (reference: reactor.py:54-63 json.loads fallback).
S3 scan_archive_listing — recursive file listing as a DataFrame
                          (reference: store.index scan, reactor.py:162-167).

Scale notes: S1/S2 are pure scans — Catalyst pushes filters and prunes
columns down to the parquet reader (verify via .explain: PushedFilters /
ReadSchema). S3 uses Spark's binaryFile source which distributes the
listing across executors; at 100 TB the file-metadata-only projection
(path, length, modificationTime) never loads file contents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table


@register(
    "scan_parquet",
    sql="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: plain columnar scan; Catalyst prunes to the selected columns."""
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "scan_json_messages",
    sql=r"""
SELECT
  event_id,
  event_type,
  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
FROM events
""",
)
def scan_json_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: parse the free-form JSON payload column into typed fields.

    Reference analog: the reactor accepts a pre-parsed dict or falls back to
    json.loads(raw) (reactor.py:54-63); here the permissive path is
    get_json_object over a JSON string column — stays JVM-side (no UDF).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


@register("scan_archive_listing")  # no SQL oracle: filesystem source (rows-only check)
def scan_archive_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: recursive listing of an archive directory as a DataFrame.

    Reference analog: store.index lists a job's archive_path on a storage
    system (reactor.py:162-167, config.yml:11-13). Spark's binaryFile source
    distributes listing + metadata extraction; we project metadata only so
    file contents are never read into memory.
    """
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return df.select(
        F.substring_index("path", "/", -1).alias("filename"),
        F.col("length"),
    ).orderBy("filename")
