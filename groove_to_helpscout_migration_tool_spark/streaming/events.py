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

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])


def _read_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The physical ts type depends on which test-data generation wrote
    # the table (TIMESTAMP(NANOS) in early rounds, TIMESTAMP(MICROS)
    # now). A streaming source needs its schema declared up front, so
    # probe it batch-side (one footer read, no job) the same way
    # session.load_table adapts, and convert nanos -> micros only when
    # the file really is nanos-as-long.
    probe = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_is_long = dict(probe.dtypes).get("ts") == "bigint"
    ts_type = T.LongType() if ts_is_long else probe.schema["ts"].dataType
    # the file streaming source monitors a DIRECTORY; the test tables are
    # single files per table, so stream the dir with a glob filter
    raw = (
        spark.readStream.schema(_events_schema(ts_type))
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_is_long:
        raw = raw.withColumn(
            "ts",
            F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")),
        )
    # Watermarks demand TIMESTAMP (not NTZ). Session tz is pinned UTC,
    # so NTZ wall time -> TIMESTAMP -> (output side) back to NTZ is a
    # lossless round-trip independent of the host zone.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


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
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows hopping every 15 minutes with a 2-hour watermark --
    the streaming twin of t03_hopping_window_events (each event lands in
    4 overlapping windows; state is bounded by watermark x slide)."""
    return (
        _read_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
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
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


QUOTA_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_seen", T.LongType()),
    T.StructField("n_accepted", T.LongType()),
    T.StructField("n_rejected", T.LongType()),
])
QUOTA_STATE_SCHEMA = T.StructType([T.StructField("used", T.LongType())])


def streaming_user_quota(spark: SparkSession, sf_dir: str, quota: int = 50) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    admission quota -- the reference's token-bucket rate limiting (T1,
    SyncCommandBase.php:163-193) re-expressed as streaming state. Each
    user's cumulative admitted count lives in the state store; events
    beyond ``quota`` are rejected, and the op emits per-user running
    totals every micro-batch.

    Scale: state is one long per user, partitioned by the groupBy key;
    the state store shuffles only (user_id, used). Watermark-less
    NoTimeout state is fine here because the key space is bounded; an
    unbounded key space would use event-time timeout to expire keys."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def apply_quota(key, pdfs, state: "GroupState"):
        (user_id,) = key
        used = state.get[0] if state.exists else 0
        seen = 0
        for pdf in pdfs:
            seen += len(pdf)
        accepted = max(0, min(seen, quota - used))
        state.update((used + accepted,))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_seen": [seen],
                "n_accepted": [accepted],
                "n_rejected": [seen - accepted],
            }
        )

    return (
        _read_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            apply_quota,
            outputStructType=QUOTA_OUT_SCHEMA,
            stateStructType=QUOTA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_RUN_SEQ = [0]


def run_to_memory(
    stream_df: DataFrame, name: str, timeout_sec: int = 120, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DF with availableNow (process-everything-then-
    stop) into an in-memory sink; returns the result as a batch DF."""
    _RUN_SEQ[0] += 1
    name = f"{name}_{_RUN_SEQ[0]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming query {name!r} did not finish within {timeout_sec}s;"
            " refusing to return a partially-populated memory sink"
        )
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def streaming_merge_to_parquet(
    spark: SparkSession, sf_dir: str, sink_dir: str, checkpoint_dir: str
) -> int:
    """T3/T5 as a streaming sink: foreachBatch publish with dedup-on-merge.
    Each micro-batch anti-joins against the keys already in the sink
    before appending (TicketProcessor.php:353-372's duplicate check as
    merge logic), so re-running the stream -- or replaying a batch after
    a crash -- publishes zero duplicates. Returns rows written.

    Scale: the sink-state read is pruned to the key column only (column
    pruning makes this a 1-column parquet scan); a real deployment keys
    the sink table by event date so the anti-join prunes partitions too.
    """
    import os

    written = {"n": 0}

    def merge(batch: DataFrame, batch_id: int) -> None:
        out = batch
        if os.path.isdir(sink_dir) and any(
            f.endswith(".parquet") for f in os.listdir(sink_dir)
        ):
            existing = batch.sparkSession.read.parquet(sink_dir).select("event_id")
            out = batch.join(existing, "event_id", "left_anti")
        n = out.count()
        out.write.mode("append").parquet(sink_dir)
        written["n"] += n

    q = (
        _read_stream(spark, sf_dir)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(
            "streaming merge did not finish within 120s; sink may be partial"
        )
    return written["n"]


def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 idempotency as a STATE-STORE operator: duplicate every event
    in-stream (explode over a 2-element array -- the replayed-page
    scenario), then ``dropDuplicatesWithinWatermark`` on event_id keeps
    the first arrival and drops replays, bounded by the event-time
    watermark instead of unbounded key state. The per-type counts after
    dedup must equal the batch counts of the ORIGINAL table -- proving
    the replay died in the state store, not in a sink-side anti-join
    (that variant is streaming_merge_to_parquet).

    Scale: state is keyed by event_id and EXPIRES with the watermark --
    at 100 TB the state store holds one key per event inside the
    lateness window only, not the full corpus."""
    raw = _read_stream(spark, sf_dir)
    duplicated = raw.select(
        F.explode(F.array(F.lit(0), F.lit(1))).alias("_copy"), "*"
    ).drop("_copy")
    return (
        duplicated.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
