"""Set operators (SURVEY.md §2.7).

U1 set_union_batches     — combine index batches with differing schemas
                           (standalone batch re-index, config.yml:5-8)
U2 set_except_unindexed  — listed-but-not-indexed paths
U3 set_intersect_verified — paths present in both listing and catalog

Scale notes: UNION is a zero-shuffle concatenation of partitions; EXCEPT/
INTERSECT compile to aggregate+join shapes (one shuffle on the full row as
key) — at 100 TB prefer the anti/semi-join forms (J4/J3) on an explicit
key, which shuffle only that key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import with_fixtures
from ..registry import register
from ..tables import archive_files


@register(
    "set_union_batches",
    sql=with_fixtures(
        """SELECT file_uuid, path, length, NULL AS level
           FROM archive_files WHERE ext = 'bam'
           UNION ALL BY NAME
           SELECT file_uuid, path, NULL AS length, level
           FROM archive_files WHERE ext = 'txt'""",
        "archive_files",
    ),
)
def set_union_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union two index batches whose record schemas drifted —
    unionByName with allowMissingColumns fills the gaps with nulls
    (multi-batch re-indexing, config.yml:5-8; Makefile:43-46)."""
    af = archive_files(spark, sf_dir)
    batch1 = af.filter(F.col("ext") == "bam").select("file_uuid", "path", "length")
    batch2 = af.filter(F.col("ext") == "txt").select("file_uuid", "path", "level")
    return batch1.unionByName(batch2, allowMissingColumns=True)


@register(
    "set_except_unindexed",
    sql=with_fixtures(
        """SELECT path FROM archive_files
           EXCEPT ALL
           SELECT path FROM archive_files WHERE file_seq % 2 = 0""",
        "archive_files",
    ),
)
def set_except_unindexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: listed paths minus already-indexed paths — the set-op complement
    of the J4 anti join (re-index rationale, config.yml:5-8)."""
    af = archive_files(spark, sf_dir)
    listed = af.select("path")
    indexed = af.filter(F.col("file_seq") % 2 == 0).select("path")
    return listed.exceptAll(indexed)


@register(
    "set_intersect_verified",
    sql=with_fixtures(
        """SELECT path FROM archive_files WHERE level = '1'
           INTERSECT
           SELECT path FROM archive_files WHERE ext IN ('bam','sam')""",
        "archive_files",
    ),
)
def set_intersect_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: paths present in both the level-1 listing and the bam/sam
    catalog selection — catalog verification."""
    af = archive_files(spark, sf_dir)
    a = af.filter(F.col("level") == "1").select("path")
    b = af.filter(F.col("ext").isin("bam", "sam")).select("path")
    return a.intersect(b)
