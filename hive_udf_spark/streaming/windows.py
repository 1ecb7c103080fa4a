"""Structured Streaming operators: windowed aggregation with sketch state.

The reference's sketches are ideal streaming state — constant-size,
mergeable, order-insensitive (SURVEY.md §2.3). Spark's windowed
``approx_count_distinct`` holds exactly that state per (window, key)
group; watermarks bound state retention for late data.

For tests/local runs the events parquet file drives the stream
(file source + ``processAllAvailable`` = deterministic, synchronous).
At scale the same plan reads Kafka: swap the source, keep the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# File-source schema: corpus parquet stores ts as TIMESTAMP(NANOS), which
# surfaces as long under nanosAsLong (see sources/tables.py).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a streaming source (ns→µs ts conversion applied)."""
    # File stream sources require a directory basePath; glob-filter to the
    # events file within the sf dir.
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_event_stats(events: DataFrame, window: str = "1 day", watermark: str = "1 hour") -> DataFrame:
    """Exact per-window/type counts and sums — works identically on a
    batch or streaming DataFrame (count/sum need no distinct state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def windowed_distinct_users(events: DataFrame, window: str = "1 day", watermark: str = "1 hour") -> DataFrame:
    """Approximate distinct users per tumbling window — HLL++ sketch state
    per (window, type) group, constant memory, watermark-bounded."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
        .select(F.col("w.start").alias("window_start"), "event_type", "approx_users")
    )


def run_stream_to_memory(result: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Drive a (bounded) streaming query to completion into a memory sink
    and return the materialized table. Synchronous and deterministic."""
    spark = result.sparkSession
    q = result.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def read_events_stream_with_flush(
    spark: SparkSession, sf_dir: str, flush_ts: str = "2030-01-01 00:00:00"
) -> DataFrame:
    """events.parquet as a stream plus a far-future sentinel row.

    Session windows (and any append-mode event-time agg) only emit once
    the watermark passes the window's END — so on a bounded replay the
    last session of every key would sit in state forever. The sentinel
    advances the global watermark past all real data, flushing every
    window: the streaming equivalent of an end-of-stream marker. Filter
    ``user_id >= 0`` downstream to drop the sentinel itself.
    """
    import os
    import tempfile

    stage = tempfile.mkdtemp(prefix="events_stream_flush_")
    os.symlink(os.path.join(sf_dir, "events.parquet"), os.path.join(stage, "a_events.parquet"))
    sentinel_ns = int(
        spark.sql(f"SELECT unix_micros(TIMESTAMP '{flush_ts}')").collect()[0][0]
    ) * 1000
    spark.createDataFrame(
        [(-1, sentinel_ns, -1, "__flush__", 0.0, "{}")],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "z_sentinel"))

    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")  # data batch first, sentinel after
        .option("recursiveFileLookup", "true")
        .load(stage)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def session_window_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (gap-based, merging) — counts and bounds
    per session. Works on a streaming DataFrame in append mode; state per
    in-flight session, closed and emitted when the watermark passes
    session end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
