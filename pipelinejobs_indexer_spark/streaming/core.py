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
from pyspark.sql.types import StructType

from ..session import tune

def _events_schema(spark: SparkSession, sf_dir: str) -> StructType:
    """Streaming file sources need an explicit schema; probe it from the
    batch reader so both testdata generations work (TIMESTAMP(NANOS) read
    as long under nanosAsLong vs native TIMESTAMP(MICROS))."""
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a micro-batch stream with a proper event-time
    column (TimestampType — watermarks reject NTZ)."""
    tune(spark)
    raw = (
        spark.readStream.format("parquet")
        .schema(_events_schema(spark, sf_dir))
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if raw.schema["ts"].dataType.simpleString() == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


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
