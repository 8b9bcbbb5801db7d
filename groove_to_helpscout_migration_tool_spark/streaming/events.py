"""Structured Streaming over the events table (SURVEY.md section 2.7).

The reference is a batch tool with streaming-shaped semantics
(micro-batch pages T5, resume tokens T2, dedup-on-merge T3). Here the
same aggregations run as real streams: parquet files in, watermarked
event-time windows, availableNow trigger for deterministic testing.
t01_tumbling_window_events in the catalog is the batch twin of
streaming_event_counts -- same groupBy(window(...)), same results.

Scale: watermark bounds state; the windowed agg shuffles on
(window, event_type) which is low-cardinality -- at 100 TB the
bottleneck is source file listing, solved with maxFilesPerTrigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),  # nanos-as-long (session.py note)
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _read_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file streaming source monitors a DIRECTORY; the test tables are
    # single files per table, so stream the dir with a glob filter
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn(
        "ts",
        F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")),
    )


def streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows with a 2-hour watermark (late-data bound)."""
    return (
        _read_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user -- the streaming twin of
    a02_sessionize_events, via Spark's built-in session_window."""
    return (
        _read_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events", "session_value")
    )


def run_to_memory(stream_df: DataFrame, name: str, timeout_sec: int = 120) -> DataFrame:
    """Execute a streaming DF with availableNow (process-everything-then-
    stop) into an in-memory sink; returns the result as a batch DF."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
