"""Structured Streaming queries (§2.14).

The reference runs one always-on DataStream job with processing-time
semantics; Spark-side the equivalent is Structured Streaming. Here the
events table is replayed through a real streaming query
(readStream -> window agg -> memory sink, availableNow trigger) and the
final result is compared against a plain SQL oracle — the streaming
runtime must converge to the batch answer (the Structured Streaming
paper's core claim: prefix consistency).

events.ts arrives as BIGINT nanos (nanosAsLong); the stream derives a
micros-truncated event-time column for watermarks/windows — truncation
cannot move an event across a 5-minute window boundary.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # FileStreamSource wants a directory — expose the table file through one
    stream_dir = tempfile.mkdtemp(prefix="fcs_stream_src_")
    os.symlink(path, os.path.join(stream_dir, "events.parquet"))
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    return stream.withColumn("ts_t", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(agg: DataFrame, prefix: str) -> DataFrame:
    spark = agg.sparkSession
    name = prefix + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


from .base import register  # noqa: E402


@register(
    "stream_window_counts",
    oracle="""
SELECT epoch_ms(ts) // 300000 * 300000 AS window_start_ms,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling event-time windows per event_type, computed by an
    actual streaming query (availableNow), read back from the memory sink."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts_t", "10 minutes")
        .groupBy(F.window("ts_t", "5 minutes"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round("value", 6).cast("decimal(28,6)")).cast("double").alias("total_value"),
        )
    )
    out = _run_to_memory(agg, "stream_out_")
    return out.select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"),
        "event_type",
        "n",
        "total_value",
    )


@register("stream_rate_gauge")  # rows-only: sliding-window gauge, no single-SQL oracle
def stream_rate_gauge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch-rate gauge (TimedCounter, FetchUrlsFunction.java:169-224) as a
    streaming 30 s sliding count per event_type."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts_t", "1 minute")
        .groupBy(F.window("ts_t", "30 seconds", "10 seconds"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = _run_to_memory(agg, "stream_rate_")
    return out.select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"), "event_type", "n"
    )
