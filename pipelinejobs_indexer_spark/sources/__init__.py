"""Source layer — where rows enter the engine.

The concrete sources live in two places and are re-exported here so the
package structure mirrors the engine's logical layering:

  * ``tables``      — parquet catalog tables + reference-shaped fixture
                      views (S1 and every derived entity).
  * ``operators.scans`` — S2 JSON-message parsing and S3 the distributed
                      ``binaryFile`` archive listing.
  * ``streaming.core`` — the micro-batch events stream (T* input).

At 100 TB the source layer is where the cheapest wins live: partition
pruning via directory layout, predicate pushdown into parquet row groups,
and listing parallelism for archive trees — see each member's docstring.
"""

from ..operators.scans import scan_archive_listing, scan_json_messages, scan_parquet
from ..streaming.core import events_stream
from ..tables import (
    archive_files,
    job_events,
    jobs,
    load_table,
    load_tables,
    messages,
    pipelines,
)

__all__ = [
    "archive_files",
    "events_stream",
    "job_events",
    "jobs",
    "load_table",
    "load_tables",
    "messages",
    "pipelines",
    "scan_archive_listing",
    "scan_json_messages",
    "scan_parquet",
]
