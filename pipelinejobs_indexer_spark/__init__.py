"""pipelinejobs_indexer_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
pipeline-job indexing reactor (see /root/reference/reactor.py) as a
columnar, Catalyst-optimized Spark engine, plus the LLM-data-pipeline
operator suite (dedup, similarity search, multimodal columns, text
analysis) designed for 100 TB scale.

Layout:
    session.py    SparkSession factory + runtime tuning (safe on foreign sessions)
    tables.py     parquet loaders + reference-shaped fixture views (jobs,
                  archive_files, messages, job_events)
    oracle.py     DuckDB SQL mirrors of the fixture views (shared CTE text)
    registry.py   query/oracle registration (drives __spark_entry__.py)
    operators/    scans, filters, joins, aggregates, windows, sorts, sets
    functions/    scalar function library + pandas-UDF surface
    plans/        composed pipelines (catalog upsert/merge, batch indexing)
    streaming/    structured-streaming operators (dedupe, windows, FSM)
    llm/          dedup, similarity search, text analysis, multimodal columns
"""

__version__ = "0.1.0"
