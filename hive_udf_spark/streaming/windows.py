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

# File-source schema: corpus generations differ in how events.ts is
# stored — TIMESTAMP(NANOS) (surfaces as long under nanosAsLong; needs
# ns→µs conversion) or TIMESTAMP(MICROS, NTZ) (reads directly as a
# session-tz timestamp; session tz is UTC, matching DuckDB's naive
# values). Streaming sources require an explicit schema, so probe the
# batch-read schema of the same file once (driver-side, metadata-only)
# and build the matching stream schema + converter.
def _events_schema_and_cast(spark: SparkSession, sf_dir: str):
    import os

    ts_batch = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema["ts"].dataType
    )
    nanos_as_long = isinstance(ts_batch, T.LongType)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType() if nanos_as_long else T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def conv(df: DataFrame) -> DataFrame:
        if nanos_as_long:
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))

    return schema, conv, nanos_as_long


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a streaming source (ts normalized to µs
    timestamps regardless of the corpus generation's physical type)."""
    # File stream sources require a directory basePath; glob-filter to the
    # events file within the sf dir.
    schema, conv, _ = _events_schema_and_cast(spark, sf_dir)
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return conv(raw)


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
    import datetime as _dt
    import os
    import tempfile

    schema, conv, nanos_as_long = _events_schema_and_cast(spark, sf_dir)
    stage = tempfile.mkdtemp(prefix="events_stream_flush_")
    os.symlink(os.path.join(sf_dir, "events.parquet"), os.path.join(stage, "a_events.parquet"))
    if nanos_as_long:
        sentinel_ts = int(
            spark.sql(f"SELECT unix_micros(TIMESTAMP '{flush_ts}')").collect()[0][0]
        ) * 1000
        sentinel_schema = (
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
    else:
        sentinel_ts = _dt.datetime.strptime(flush_ts, "%Y-%m-%d %H:%M:%S")
        sentinel_schema = (
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
    spark.createDataFrame(
        [(-1, sentinel_ts, -1, "__flush__", 0.0, "{}")], sentinel_schema
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(stage, "z_sentinel"))

    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")  # data batch first, sentinel after
        .option("recursiveFileLookup", "true")
        .load(stage)
    )
    return conv(raw)


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
