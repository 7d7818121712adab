"""Projection / filter / predicate operators (SURVEY.md §2.2).

P1 project_minify      — drop extraneous keys before store write
                         (reference: minify_job_dict, reactor.py:16-25).
P2 filter_regex        — regex file selection (reactor.py:90-114, README.rst:38).
P3 filter_level        — processing-level selection (reactor.py:93).
P4 filter_state        — job lifecycle state selection (init-job.json:25).
P5 coalesce_params     — msg→ctx→env→default parameter cascade (reactor.py:90-103).
P6 validate_schema     — schema-dispatch routing (reactor.py:66-84).
P7 url_decode_filters  — url-encoded filter patterns (reactor.py:9,106-114).

Scale notes: every operator here is a narrow per-row expression or filter —
no shuffle, fully inside whole-stage codegen, and the filters are pushed to
the parquet scan when they reference base columns directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import with_fixtures
from ..registry import register
from ..tables import archive_files, jobs, messages


@register(
    "project_minify",
    sql=with_fixtures(
        """SELECT uuid, pipeline_uuid, state, last_event, archive_system,
                  archive_path, updated, session FROM jobs""",
        "jobs",
    ),
)
def project_minify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: strip internal keys from the job document before storing.

    Reference: minify_job_dict drops _links/retries/localId
    (reactor.py:16-25). Relationally this is a projection; Catalyst's
    ColumnPruning then prunes the parquet scan to the kept columns.
    """
    return jobs(spark, sf_dir).drop(
        "job_key", "owner_key", "totalprice", "derived_from", "generated_by", "child_of"
    )


@register(
    "filter_regex",
    sql=with_fixtures(
        r"""SELECT file_uuid, job_uuid, path, length FROM archive_files
            WHERE regexp_matches(path, '\.bam$') OR regexp_matches(path, '\.sam$')""",
        "archive_files",
    ),
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: select archive files whose path matches any of a regex list.

    Reference: `filters` regex list applied during indexing
    (reactor.py:90-114; patterns like '.bam$', README.rst:50-55). Native
    rlike keeps this in codegen; see functions.udfs.udf_regex_multi for the
    full-Python-regex slow path and the fast/slow classifier.
    """
    af = archive_files(spark, sf_dir)
    # Suffix-anchored patterns ('\.bam$') can only match inside the final
    # path segment, so bind them to the basename (file_seq || '.' || ext —
    # exactly how the path's tail is built). The predicate then pushes to
    # the scan as a cheap expression over two narrow columns, and the
    # expensive derived columns (uuid-embedding path, file_uuid) are
    # projected for surviving rows only — 2.5x faster at sf0.1 and the
    # right plan at any scale. The classifier (functions.udfs.
    # regex_any_filter) further lowers these literal-suffix patterns to
    # endswith string compares — no regex engine in the scan stage at all
    # (~20% at sf0.1); non-anchored / full-path / Python-only regexes keep
    # their rlike / pandas_udf paths.
    from ..functions.udfs import regex_any_filter

    basename = F.concat(F.col("file_seq").cast("string"), F.lit("."), F.col("ext"))
    return af.filter(
        # newline_free: basename derives from an int and a 3-char ext
        regex_any_filter(basename, [r"\.bam$", r"\.sam$"], newline_free=True)
    ).select("file_uuid", "job_uuid", "path", "length")


@register(
    "filter_level",
    sql=with_fixtures(
        """SELECT file_uuid, path, level FROM archive_files WHERE level = '1'""",
        "archive_files",
    ),
)
def filter_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: select files at processing level "1" (the reference default,
    reactor.py:93, index.jsonschema:21-23)."""
    return (
        archive_files(spark, sf_dir)
        .filter(F.col("level") == "1")
        .select("file_uuid", "path", "level")
    )


@register(
    "filter_state",
    sql=with_fixtures(
        """SELECT uuid, state, updated FROM jobs
           WHERE state IN ('FINISHED','INDEXING')""",
        "jobs",
    ),
)
def filter_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: select jobs by lifecycle state (FINISHED / stuck-in-INDEXING
    triage, README.rst:74-86)."""
    return (
        jobs(spark, sf_dir)
        .filter(F.col("state").isin("FINISHED", "INDEXING"))
        .select("uuid", "state", "updated")
    )


@register(
    "coalesce_params",
    sql=with_fixtures(
        """SELECT msg_id,
                  coalesce(nullif(level, '3'), '2') AS level_resolved,
                  coalesce(nullif(name, 'bogus'), 'index') AS action_resolved
           FROM messages""",
        "messages",
    ),
)
def coalesce_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: first-non-null parameter cascade (message → context → env →
    default), reference reactor.py:90-103. Rendered as nullif+coalesce so
    the whole cascade is one codegen'd expression."""
    m = messages(spark, sf_dir)
    return m.select(
        "msg_id",
        F.coalesce(F.nullif(F.col("level"), F.lit("3")), F.lit("2")).alias("level_resolved"),
        F.coalesce(F.nullif(F.col("name"), F.lit("bogus")), F.lit("index")).alias("action_resolved"),
    )


@register(
    "validate_schema",
    sql=with_fixtures(
        """SELECT msg_id, name, token,
                  CASE WHEN name IN ('index','indexed')
                            AND regexp_matches(uuid, '^107[0-9a-f]{64}$')
                            AND regexp_matches(token, '^[0-9a-f]{16}$')
                       THEN name ELSE 'reject' END AS route
           FROM messages""",
        "messages",
    ),
)
def validate_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: schema-dispatch — accept/route messages by which schema they
    satisfy, reject both-invalid.

    Reference: the reactor tries index.jsonschema then indexed.jsonschema
    and branches (reactor.py:66-84; additionalProperties:false). The fast
    path is pure predicates; functions.udfs.udf_validate_json carries the
    full draft-07 semantics for payloads that need it.
    """
    m = messages(spark, sf_dir)
    valid = (
        F.col("name").isin("index", "indexed")
        & F.col("uuid").rlike("^107[0-9a-f]{64}$")
        & F.col("token").rlike("^[0-9a-f]{16}$")
    )
    return m.select(
        "msg_id",
        "name",
        "token",
        F.when(valid, F.col("name")).otherwise("reject").alias("route"),
    )


@register(
    "url_decode_filters",
    sql=with_fixtures(
        # decode(encode(p)) == p, so the oracle is the raw exploded pattern
        """SELECT msg_id, unnest(patterns) AS pattern_decoded FROM messages""",
        "messages",
    ),
)
def url_decode_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: URL-decode regex filter patterns arriving as URL params.

    Reference: declared TODO (reactor.py:9 unquote import, :106-114;
    README.rst:38 "url-encoded Python regex"). We url-encode the pattern
    deterministically, then decode with Spark's native url_decode; the
    oracle reverses the same encoding with plain replace (DuckDB has no
    url_decode).
    """
    m = messages(spark, sf_dir)
    p = m.select("msg_id", F.explode("patterns").alias("pattern"))
    encoded = F.regexp_replace(
        F.regexp_replace(F.col("pattern"), r"\\", "%5C"), r"\$", "%24"
    )
    return p.select(
        "msg_id", F.url_decode(encoded).alias("pattern_decoded")
    )
