"""Structured-streaming plumbing shared by the T* operators.

The reference IS a stream processor — one Abaco message per container
execution, state externalized (reactor.rc REACTOR_STATEFUL=0) — so its
whole loop maps onto Structured Streaming. For the driver contract the
stream is replayed deterministically: file source over the events parquet,
``availableNow`` trigger, memory sink, and the finished batch table is
returned as a normal DataFrame.

Scale notes: the same plans run unchanged against a real source (Kafka /
file drops) with ``trigger(processingTime=...)`` + checkpointing; state
(dedupe keys, windows, FSM) lives in the executor state store and is
bounded by the watermark.
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import tune

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # TIMESTAMP(NANOS) read as long
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a micro-batch stream with a proper event-time
    column (TimestampType — watermarks reject NTZ)."""
    tune(spark)
    raw = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_batch(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Drive a streaming DataFrame to completion (availableNow) into a
    memory sink and return the materialized batch table."""
    name = f"stream_out_{_uuid.uuid4().hex}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    spark = stream_df.sparkSession
    return spark.table(name)
