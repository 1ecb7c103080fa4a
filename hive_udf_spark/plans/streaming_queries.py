"""Streaming queries, driven to completion synchronously for the gate.

Each queries() entry executes a REAL Structured Streaming job (file
source → watermark → windowed agg → memory sink) and returns the
materialized result; the oracle checks it like any batch query. Batch
equivalence (stream result ≡ batch query over the same data) is also
asserted directly in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_udf_spark.plans.registry import register
from hive_udf_spark.sources import load_table
from hive_udf_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    windowed_distinct_users,
    windowed_event_stats,
)


@register(
    "streaming_window_event_stats",
    oracle="""
    SELECT date_trunc('day', ts) AS window_start, event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_window_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows over the event stream: exact counts/sums.
    The oracle is the equivalent batch query — stream/batch equivalence is
    the correctness claim for Structured Streaming."""
    stream = read_events_stream(spark, sf_dir)
    return run_stream_to_memory(
        windowed_event_stats(stream), "stream_event_stats", mode="complete"
    )


@register(
    "streaming_stateful_running_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS within_bounds
    FROM events GROUP BY event_type
    """,
)
def streaming_stateful_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming op: per-key LC sketch state maintained
    across micro-batches via applyInPandasWithState. The cross-batch
    state itself is not SQL-expressible, but its END state is verdict-
    checkable (SURVEY.md §5.2): the final running estimate per key must
    land within 5% of the exact batch distinct count — hash-checked
    against the constant-true oracle. Per-batch accuracy is additionally
    asserted in tests/test_stateful_streaming.py."""
    from hive_udf_spark.streaming.stateful import running_distinct_users

    stream = read_events_stream(spark, sf_dir)
    updates = run_stream_to_memory(
        running_distinct_users(stream), "stream_stateful_distinct", mode="update"
    )
    # update mode may emit one row per (key, micro-batch): keep the final
    # state per key = the row with the highest batches_seen
    w_latest = updates.groupBy("event_type").agg(
        F.max_by("est_distinct_users", "batches_seen").alias("est")
    )
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_exact"))
    return w_latest.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("est").cast("double") - F.col("n_exact").cast("double"))
            <= F.lit(0.05) * F.col("n_exact").cast("double")
        ).alias("within_bounds"),
    )


@register(
    "streaming_window_distinct_users",
    oracle="""
    SELECT date_trunc('day', ts) AS window_start, event_type,
           count(DISTINCT user_id) AS n_exact, true AS within_bounds
    FROM events GROUP BY 1, 2
    """,
)
def streaming_window_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per window via streaming sketch state,
    verdict-checked against the batch exact count (SURVEY.md §5.2)."""
    stream = read_events_stream(spark, sf_dir)
    approx = run_stream_to_memory(
        windowed_distinct_users(stream), "stream_distinct_users", mode="complete"
    )
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy(
        F.date_trunc("day", "ts").alias("window_start"), "event_type"
    ).agg(F.count_distinct("user_id").alias("n_exact"))
    return approx.join(exact, ["window_start", "event_type"]).select(
        "window_start",
        "event_type",
        "n_exact",
        (
            F.abs(F.col("approx_users").cast("double") - F.col("n_exact").cast("double"))
            <= F.lit(0.05) * F.col("n_exact").cast("double")
        ).alias("within_bounds"),
    )


@register(
    "streaming_delta_ingest",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(user_id) AS BIGINT) AS sum_users
    FROM events GROUP BY event_type
    """,
)
def streaming_delta_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingestion into a TRANSACTIONAL Delta table (r11,
    streaming/delta_sink.py): the event stream arrives in 4 deterministic
    micro-batches; each becomes one Delta commit whose version is the
    batch id (protocol ``txn`` action included — the idempotent-writer
    marker), data files published atomically BY the commit JSON.  After
    the stream drains, the table is read back through the vendored
    ``read_delta`` log replay and aggregated — so the hash check proves
    the full circle: stream → commits → snapshot ≡ the batch SQL over
    the same events.  A foreachBatch RETRY is a no-op (the commit file
    is the idempotency check), which is what upgrades the parquet+swap
    sinks' hwm guards to real table semantics."""
    import tempfile

    from hive_udf_spark.sources.delta import read_delta
    from hive_udf_spark.streaming.delta_sink import delta_commit_sink

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        for b in range(4):  # sequential writes -> deterministic file order
            ev.filter(F.col("event_id") % 4 == b).coalesce(1).write.parquet(
                f"{src}/b{b}"
            )
        stream = (
            spark.readStream.schema("event_id long, user_id long, event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        table = f"{tmp}/table"
        q = delta_commit_sink(stream, table, f"{tmp}/ckpt", app_id="ingest")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            read_delta(spark, table)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("user_id").alias("sum_users"),
            )
            .localCheckpoint(eager=True)
        )
    return out


@register(
    "streaming_delta_checkpointed_ingest",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(user_id) AS BIGINT) AS sum_users
    FROM events GROUP BY event_type
    """,
)
def streaming_delta_checkpointed_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta sink with PERIODIC CHECKPOINTING (r13 — the protocol's
    reader fast-path): the event stream lands as 6 micro-batch commits
    with ``checkpoint_every=3``, so the sink writes the classic
    checkpoint parquet + ``_last_checkpoint`` at versions 2 and 5; the
    read-back DELETES every pre-checkpoint JSON commit first, proving
    the snapshot reconstructs from the checkpoint ALONE — at fleet age
    this is the difference between O(checkpoint_every) and O(stream
    lifetime) reader startup.  The oracle is the same batch SQL as the
    plain ingest entry: checkpointing must change nothing but the
    replay cost."""
    import tempfile

    from hive_udf_spark.sources.delta import read_delta
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    with tempfile.TemporaryDirectory() as tmp:
        table = f"{tmp}/table"
        for b in range(6):
            commit_batch_to_delta(
                ev.filter(F.col("event_id") % 6 == b).coalesce(1),
                b, table, checkpoint_every=3,
            )
        import os as _os

        log = f"{table}/_delta_log"
        for v in range(6):  # snapshot must come from the v5 checkpoint
            p = f"{log}/{v:020d}.json"
            if _os.path.exists(p):
                _os.remove(p)
        out = (
            read_delta(spark, table)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("user_id").alias("sum_users"),
            )
            .localCheckpoint(eager=True)
        )
    return out


@register(
    "streaming_hudi_upsert_ingest",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN doc_id % 14 = 0 THEN n_chars + 500
                WHEN doc_id % 5 = 0 THEN n_chars + 100
                ELSE n_chars END AS n_chars
    FROM documents
    WHERE doc_id % 7 <> 0 OR doc_id % 14 = 0
    """,
)
def streaming_hudi_upsert_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming UPSERT/DELETE ingestion into Hudi MERGE_ON_READ (r13,
    streaming/hudi_upsert_sink.py — the sink trio was append-only, but
    Hudi's reason to exist is the upsert workload and corpora mutate:
    revisions, dedup verdicts, takedown deletes).  Four micro-batches:
    INSERT all documents (base files, one per hash bucket), UPSERT
    every 5th key (n_chars+100), DELETE every 7th key (tombstone rows
    via the ``_deleted`` column → HoodieDeleteBlock v3 log blocks),
    REINSERT every 14th (n_chars+500).  The vendored reader merges the
    full layering newest-wins — the oracle is the same CASE arithmetic
    as ``source_hudi_mor_deletes``, now hash-checked through log files
    the SINK wrote from executors rather than the fixture twin.

    Scale shape: bucket-index routing (file group = xxhash64(key) %
    buckets) needs NO key-lookup index, so per-batch work is O(batch)
    at any table size; log bytes go executor → storage directly, only
    KB-scale commit stats cross the driver."""
    import tempfile

    from hive_udf_spark.sources.hudi import read_hudi
    from hive_udf_spark.streaming.hudi_upsert_sink import (
        upsert_batch_to_hudi,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    with tempfile.TemporaryDirectory() as tmp:
        table = f"{tmp}/table"
        upsert_batch_to_hudi(docs, 0, table, record_key="doc_id")
        upsert_batch_to_hudi(
            docs.filter(F.col("doc_id") % 5 == 0)
            .withColumn("n_chars", F.col("n_chars") + 100),
            1, table, record_key="doc_id",
        )
        dels = docs.filter(F.col("doc_id") % 7 == 0).select(
            "doc_id",
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("bigint").alias("n_chars"),
            F.lit(True).alias("_deleted"),
        )
        upsert_batch_to_hudi(dels, 2, table, record_key="doc_id")
        upsert_batch_to_hudi(
            docs.filter(F.col("doc_id") % 14 == 0)
            .withColumn("n_chars", F.col("n_chars") + 500),
            3, table, record_key="doc_id",
        )
        return read_hudi(spark, table).localCheckpoint(eager=True)


@register(
    "streaming_iceberg_upsert_ingest",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN doc_id % 14 = 0 THEN n_chars + 500
                WHEN doc_id % 5 = 0 THEN n_chars + 100
                ELSE n_chars END AS n_chars
    FROM documents
    WHERE doc_id % 7 <> 0 OR doc_id % 14 = 0
    """,
)
def streaming_iceberg_upsert_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming UPSERT/DELETE ingestion into Iceberg v2 (r13,
    streaming/iceberg_upsert_sink.py — the equality-delete pattern
    Flink's connector standardized): each micro-batch publishes one
    snapshot of data files at sequence N plus ONE equality-delete file
    naming every touched key; the spec's sequence gating (delete at N
    erases seq<N only) merges the layering with NO read-modify-write
    of existing files — per-batch cost stays O(batch) at any table
    size.  Four batches: insert all documents, upsert every 5th
    (n_chars+100), tombstone every 7th (``_deleted`` rows), reinsert
    every 14th (n_chars+500); the vendored reader's sequence-gated
    anti-joins produce the same CASE arithmetic the MOR-deletes oracle
    uses — the THIRD independent machinery to hash-check this layering
    (fixture logs, Hudi sink, now Iceberg equality deletes).

    Scale note: read amplification from accumulated delete files is
    the deliberate trade (write-fast); ``compact_iceberg_table`` folds
    them into plain data files (pytest covers the fold)."""
    import tempfile

    from hive_udf_spark.sources.iceberg import read_iceberg
    from hive_udf_spark.streaming.iceberg_upsert_sink import (
        upsert_batch_to_iceberg,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    with tempfile.TemporaryDirectory() as tmp:
        table = f"{tmp}/table"
        upsert_batch_to_iceberg(docs, 0, table)
        upsert_batch_to_iceberg(
            docs.filter(F.col("doc_id") % 5 == 0)
            .withColumn("n_chars", F.col("n_chars") + 100),
            1, table,
        )
        dels = docs.filter(F.col("doc_id") % 7 == 0).select(
            "doc_id",
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("bigint").alias("n_chars"),
            F.lit(True).alias("_deleted"),
        )
        upsert_batch_to_iceberg(dels, 2, table)
        upsert_batch_to_iceberg(
            docs.filter(F.col("doc_id") % 14 == 0)
            .withColumn("n_chars", F.col("n_chars") + 500),
            3, table,
        )
        return read_iceberg(spark, table).localCheckpoint(eager=True)


@register(
    "streaming_iceberg_ingest",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(user_id) AS BIGINT) AS sum_users
    FROM events GROUP BY event_type
    """,
)
def streaming_iceberg_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingestion into a TRANSACTIONAL Iceberg table (r12,
    streaming/iceberg_sink.py — the second lakehouse streaming sink):
    the event stream arrives in 4 deterministic micro-batches; each
    becomes one APPEND SNAPSHOT whose metadata version is batch_id+1,
    published atomically by the metadata.json rename, with the
    previous snapshot's MANIFESTS REUSED untouched (commit cost
    O(batch), never O(table)).  After the stream drains, the table
    reads back through the vendored ``read_iceberg`` metadata walk and
    aggregates — the hash check proves the full circle: stream →
    snapshots → scan ≡ the batch SQL over the same events.  A
    foreachBatch RETRY is a no-op (the metadata version is the
    idempotency check)."""
    import tempfile

    from hive_udf_spark.sources.iceberg import read_iceberg
    from hive_udf_spark.streaming.iceberg_sink import iceberg_commit_sink

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        for b in range(4):  # sequential writes -> deterministic file order
            ev.filter(F.col("event_id") % 4 == b).coalesce(1).write.parquet(
                f"{src}/b{b}"
            )
        stream = (
            spark.readStream.schema("event_id long, user_id long, event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        table = f"{tmp}/table"
        q = iceberg_commit_sink(stream, table, f"{tmp}/ckpt", app_id="ingest")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            read_iceberg(spark, table)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("user_id").alias("sum_users"),
            )
            .localCheckpoint(eager=True)
        )
    return out


@register(
    "streaming_hudi_ingest",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(user_id) AS BIGINT) AS sum_users
    FROM events GROUP BY event_type
    """,
)
def streaming_hudi_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingestion into a TRANSACTIONAL Hudi COW table (r12,
    streaming/hudi_sink.py — completing the lakehouse streaming-sink
    trio): the event stream arrives in 4 deterministic micro-batches;
    each becomes one COMPLETED commit on the ``.hoodie`` timeline
    (instant = batch id, the commit JSON the atomic publish), rows
    landing as new file groups.  After the stream drains, the table
    reads back through the vendored ``read_hudi`` timeline walk and
    aggregates — the hash check proves the full circle: stream →
    commits → file slices ≡ the batch SQL over the same events.  A
    foreachBatch RETRY is a no-op (the commit file is the idempotency
    check)."""
    import tempfile

    from hive_udf_spark.sources.hudi import read_hudi
    from hive_udf_spark.streaming.hudi_sink import hudi_commit_sink

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        for b in range(4):  # sequential writes -> deterministic file order
            ev.filter(F.col("event_id") % 4 == b).coalesce(1).write.parquet(
                f"{src}/b{b}"
            )
        stream = (
            spark.readStream.schema("event_id long, user_id long, event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        table = f"{tmp}/table"
        q = hudi_commit_sink(stream, table, f"{tmp}/ckpt")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            read_hudi(spark, table)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("user_id").alias("sum_users"),
            )
            .localCheckpoint(eager=True)
        )
    return out


@register(
    "streaming_dedup_exactly_once",
    oracle="""
    SELECT event_type, count(*) AS n_unique_events
    FROM events GROUP BY event_type
    """,
)
def streaming_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: the event stream duplicated 2x (at-least-once
    delivery), deduplicated by event_id with watermark-bounded state
    (dropDuplicatesWithinWatermark). Result counts equal the clean batch
    table exactly — the exactly-once claim, oracle-checked."""
    from hive_udf_spark.streaming.dedup import dedup_stream, duplicate_stream

    stream = read_events_stream(spark, sf_dir)
    deduped = dedup_stream(duplicate_stream(stream, copies=2), key="event_id")
    materialized = run_stream_to_memory(deduped, "stream_dedup", mode="append")
    return materialized.groupBy("event_type").agg(F.count("*").alias("n_unique_events"))


@register(
    "streaming_stream_stream_join",
    oracle="""
    SELECT a.event_id AS src_event, b.event_id AS dst_event, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (view → purchase funnel within 1 h per
    user): both sides watermarked, event-time bound in the join condition
    so state expires — the scalable stream-join shape. On the bounded
    replay the emitted pair set equals the batch join exactly (the
    oracle)."""
    from hive_udf_spark.streaming.joins import followup_join

    stream = read_events_stream(spark, sf_dir)
    joined = followup_join(stream, "view", "purchase", within="1 hour")
    out = run_stream_to_memory(joined, "stream_funnel_join", mode="append")
    return out.select("src_event", "dst_event", "user_id")


@register(
    "streaming_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min gap, merging state, append mode):
    per-user session count and event total. An end-of-stream sentinel
    advances the watermark so every session flushes; the oracle is the
    batch gaps-and-islands query with the same >=gap split convention
    session_window uses."""
    from hive_udf_spark.streaming.windows import (
        read_events_stream_with_flush,
        session_window_stats,
    )

    stream = read_events_stream_with_flush(spark, sf_dir)
    sessions = run_stream_to_memory(
        session_window_stats(stream), "stream_sessions", mode="append"
    ).filter(F.col("user_id") >= 0)
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events")
    )


@register(
    "streaming_incremental_sketch_table",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           count(DISTINCT user_id) AS n_exact, true AS within_bounds
    FROM events GROUP BY 1
    """,
)
def streaming_incremental_sketch_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch merge-on-write sketch table: the stream maintains one
    re-aggregable HLL row per day (raw events never stored); the final
    table's estimates are verdict-checked against the batch exact counts.
    Exercises the full sink path — per-batch reduction, associative merge
    into parquet, atomic swap (streaming/sketch_sink.py)."""
    import tempfile

    from hive_udf_spark.streaming.sketch_sink import daily_user_sketch_sink

    with tempfile.TemporaryDirectory() as tmp:
        table = f"{tmp}/daily_sketches"
        q = daily_user_sketch_sink(
            read_events_stream(spark, sf_dir), table, f"{tmp}/ckpt"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        est = (
            spark.read.parquet(table)
            .select("day", F.col("s.cardinality").alias("__est"))
            .localCheckpoint(eager=True)  # outlives the TemporaryDirectory
        )
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return est.join(exact, "day").select(
        "day",
        "n_exact",
        (
            F.abs(F.col("__est").cast("double") - F.col("n_exact").cast("double"))
            <= F.lit(0.05) * F.col("n_exact").cast("double")
        ).alias("within_bounds"),
    )


@register(
    "streaming_incremental_quantile_table",
    oracle="""
    WITH src AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(round(value * 100) AS BIGINT) AS v,
             ('0x' || substr(md5('5:' || event_id), 1, 15))::BIGINT AS h
      FROM events WHERE value IS NOT NULL
    ),
    rk AS (
      SELECT day, v, row_number() OVER (PARTITION BY day ORDER BY h, v) AS rn
      FROM src
    ),
    samp AS (
      SELECT day, list(v ORDER BY v) AS vs FROM rk WHERE rn <= 128 GROUP BY day
    ),
    n AS (SELECT day, count(*) AS n_rows FROM src GROUP BY day)
    SELECT samp.day,
           CAST(n.n_rows AS BIGINT) AS n_rows,
           vs[CAST(floor(0.5 * (len(vs) - 1)) AS INT) + 1] AS q50_cents,
           vs[CAST(floor(0.9 * (len(vs) - 1)) AS INT) + 1] AS q90_cents
    FROM samp JOIN n ON samp.day = n.day
    """,
)
def streaming_incremental_quantile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch merge-on-write QUANTILE state (r4 verdict item 7):
    the stream maintains one re-aggregable bottom-k quantile sketch per
    day (streaming/sketch_sink.py daily_value_quantile_sink). The
    bottom-k merge is lossless, so the streamed table is BIT-IDENTICAL
    to a direct batch build — with portable (md5) hashing the DuckDB
    oracle reproduces sample, count, and quantiles exactly (strongest
    §5.2 form; no error bound involved)."""
    import tempfile

    from hive_udf_spark.functions.qsketch import qsketch_quantile
    from hive_udf_spark.streaming.sketch_sink import daily_value_quantile_sink

    with tempfile.TemporaryDirectory() as tmp:
        table = f"{tmp}/daily_quantiles"
        q = daily_value_quantile_sink(
            read_events_stream(spark, sf_dir),
            table,
            f"{tmp}/ckpt",
            k=128,
            portable=True,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            spark.read.parquet(table)
            .select(
                "day",
                "n_rows",
                qsketch_quantile("qs", 0.5).alias("q50_cents"),
                qsketch_quantile("qs", 0.9).alias("q90_cents"),
            )
            .localCheckpoint(eager=True)  # outlives the TemporaryDirectory
        )
    return out


@register(
    "streaming_window_hopping",
    oracle="""
    WITH starts AS (
      SELECT event_type,
             unnest(generate_series(
               to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 21600) * 21600 - 64800)::TIMESTAMP,
               to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 21600) * 21600)::TIMESTAMP,
               INTERVAL 6 HOUR)) AS window_start
      FROM events
    )
    SELECT event_type, window_start, count(*) AS n_events
    FROM starts GROUP BY 1, 2
    """,
)
def streaming_window_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 1-day windows every 6 hours — each
    event lands in 4 overlapping windows. Streaming groupBy(window(ts,
    '1 day', '6 hours')) with watermark; the oracle re-derives each
    event's 4 window starts with generate_series over the 6-hour grid.
    Exact counts, so the hash match is exact (no verdict needed)."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    return run_stream_to_memory(agg, "stream_hopping", mode="complete").select(
        "event_type", "window_start", "n_events"
    )


_SCMS_DEPTH = 4
_SCMS_WIDTH = 64  # small enough that collisions occur and must match too


def _streaming_cms_oracle() -> str:
    from hive_udf_spark.functions.hashing import portable_hash60_sql

    m = 1 << 31
    h0 = f"({portable_hash60_sql('user_id', 0)} % {m})"
    h1 = f"({portable_hash60_sql('user_id', 1)} % {m})"
    return f"""
    WITH cells AS (
      SELECT d, ({h0} + d * {h1}) % {_SCMS_WIDTH} AS idx
      FROM events, unnest(generate_series(0, {_SCMS_DEPTH - 1})) AS s(d)
      WHERE user_id IS NOT NULL
    )
    SELECT CAST(d AS INT) AS d, CAST(idx AS BIGINT) AS idx,
           count(*) AS cnt
    FROM cells GROUP BY d, idx
    """


@register("streaming_incremental_cms_table", oracle=_streaming_cms_oracle())
def streaming_incremental_cms_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch merge-on-write FREQUENCY state: the stream maintains
    a Count-Min sketch over user_id (streaming/sketch_sink.py
    user_frequency_cms_sink), merged cell-additively across micro-
    batches under a retry-skipping high-water mark. The additive merge
    is lossless, so the streamed counter table is CELL-IDENTICAL to a
    batch build — the DuckDB oracle reproduces every (d, idx, cnt) cell
    of the deliberately small 4x64 portable-hash sketch, collisions
    included (the freq_cms_token_counts discipline, now as streaming
    state)."""
    import tempfile

    from hive_udf_spark.streaming.sketch_sink import user_frequency_cms_sink
    from hive_udf_spark.streaming.windows import read_events_stream

    with tempfile.TemporaryDirectory() as tmp:
        table = f"{tmp}/user_cms"
        q = user_frequency_cms_sink(
            read_events_stream(spark, sf_dir),
            table,
            f"{tmp}/ckpt",
            depth=_SCMS_DEPTH,
            width=_SCMS_WIDTH,
            portable=True,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            spark.read.parquet(table)
            .select(
                F.col("d").cast("int").alias("d"),
                F.col("idx").cast("long").alias("idx"),
                F.col("cnt").cast("long").alias("cnt"),
            )
            .localCheckpoint(eager=True)  # outlives the TemporaryDirectory
        )
    return out


@register(
    "streaming_funnel_state",
    oracle="""
    WITH base AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL
    ),
    s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT base.user_id,
           s1.t1 AS step_1_ts, s2.t2 AS step_2_ts, s3.t3 AS step_3_ts,
           coalesce(s3.t3 IS NOT NULL
                    AND CAST(floor(epoch(s3.t3)) AS BIGINT) - CAST(floor(epoch(s1.t1)) AS BIGINT) <= 72 * 3600,
                    false) AS completed
    FROM base
      LEFT JOIN s1 USING (user_id)
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)
    """,
)
def streaming_funnel_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT stateful streaming funnel (streaming/funnel.py): per-user
    step-timestamp state under applyInPandasWithState, arrival-order
    independent, whose END state equals the batch funnel computation
    row-for-row — so the oracle is the SAME nested strictly-after-min
    SQL as the batch events_funnel_conversion query (stream ≡ batch,
    hash-exact; stronger than a verdict bound)."""
    from hive_udf_spark.streaming.funnel import streaming_funnel

    stream = read_events_stream(spark, sf_dir)
    updates = run_stream_to_memory(
        streaming_funnel(stream, ["view", "click", "purchase"], within_hours=72),
        "stream_funnel",
        mode="update",
    )
    final = updates.groupBy("user_id").agg(
        F.max_by(
            F.struct("step_1_ts", "step_2_ts", "step_3_ts", "completed"),
            "batches_seen",
        ).alias("__f")
    )
    return final.select(
        "user_id",
        F.col("__f.step_1_ts").alias("step_1_ts"),
        F.col("__f.step_2_ts").alias("step_2_ts"),
        F.col("__f.step_3_ts").alias("step_3_ts"),
        F.col("__f.completed").alias("completed"),
    )


def _streaming_pcsa_oracle() -> str:
    from hive_udf_spark.functions.pcsa import pcsa_estimate_sql

    inner = pcsa_estimate_sql(
        "events", "date_trunc('day', ts)", "user_id", 64, 7, group_alias="day"
    )
    return f"SELECT day, s_sum, est_pcsa AS est_users FROM ({inner})"


@register("streaming_incremental_pcsa_table", oracle=_streaming_pcsa_oracle())
def streaming_incremental_pcsa_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch merge-on-write FM-BITMAP state: per-day PCSA
    sketches OR-merged across micro-batches — idempotent under
    retries with no high-water mark (the OR semilattice is the
    simplest streaming sketch state). Lossless merge ⇒ the streamed
    table's S sums and estimates are bit-identical to a batch build,
    which is what the DuckDB oracle computes."""
    import tempfile

    from hive_udf_spark.functions.pcsa import pcsa_estimate
    from hive_udf_spark.streaming.sketch_sink import daily_user_pcsa_sink
    from hive_udf_spark.streaming.windows import read_events_stream

    with tempfile.TemporaryDirectory() as tmp:
        table = f"{tmp}/daily_pcsa"
        q = daily_user_pcsa_sink(
            read_events_stream(spark, sf_dir), table, f"{tmp}/ckpt", m=64, seed=7
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            pcsa_estimate(spark.read.parquet(table), ["day"], m=64)
            .select("day", "s_sum", F.col("est_pcsa").alias("est_users"))
            .localCheckpoint(eager=True)  # outlives the TemporaryDirectory
        )
    return out


def _nb_stream_oracle() -> str:
    # the streamed model must be bit-identical to the batch fit, so the
    # oracle IS the batch classifier oracle
    from hive_udf_spark.plans.pipeline_queries import _nb_classifier_oracle

    return _nb_classifier_oracle()


@register("streaming_incremental_nb_model", oracle=_nb_stream_oracle())
def streaming_incremental_nb_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING model training (streaming/model_sink.py nb_model_sink):
    the labeled training split (doc_id % 5 != 0) arrives in 3
    deterministic micro-batches; each batch's Naive Bayes count cells
    merge additively into the stored model state under the retry-
    skipping high-water mark, and classifying the full corpus with
    tables derived from the STORED state (nb_tables_from_counts — the
    read-time smoothing/quantization split) returns EXACTLY the batch
    fit's predictions: the oracle is pipeline_nb_classifier's SQL
    verbatim. "Train the quality classifier as data arrives" without
    re-reading raw text."""
    import tempfile

    from hive_udf_spark.operators.importance import (
        nb_classify_with_tables,
        nb_tables_from_counts,
    )
    from hive_udf_spark.plans.pipeline_queries import _NB_B, _NB_SEED, _NB_TRAIN_MOD
    from hive_udf_spark.streaming.model_sink import nb_model_sink

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % _NB_TRAIN_MOD != 0)
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        for b in range(3):  # sequential writes -> deterministic file order
            train.filter(F.col("doc_id") % 3 == b).coalesce(1).write.parquet(
                f"{src}/b{b}"
            )
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = nb_model_sink(
            stream,
            f"{tmp}/nb_counts",
            f"{tmp}/ckpt",
            label_col="lang",
            buckets=_NB_B,
            portable=True,
            seed=_NB_SEED,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        tok, pri = nb_tables_from_counts(
            spark.read.parquet(f"{tmp}/nb_counts"), _NB_B
        )
        out = nb_classify_with_tables(
            docs, tok, pri, buckets=_NB_B, portable=True, seed=_NB_SEED
        ).localCheckpoint(eager=True)  # outlives the TemporaryDirectory
    return out


def _streaming_hllp_oracle() -> str:
    from hive_udf_spark.functions.hllp import hllp_estimate_sql

    inner = hllp_estimate_sql(
        "events", "date_trunc('day', ts)", "user_id", 256, 7, group_alias="day"
    )
    return f"SELECT day, n_zero, est_hllp AS est_users FROM ({inner})"


@register("streaming_incremental_hllp_table", oracle=_streaming_hllp_oracle())
def streaming_incremental_hllp_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch merge-on-write state with the reference's PRIMARY
    algorithm: the stream maintains per-day portable-HLL registers
    (streaming/sketch_sink.py daily_user_hllp_sink), max-merged across
    micro-batches — idempotent, so no high-water mark, like PCSA's OR
    and unlike the exact counters. The max merge is lossless: the
    streamed register table is bit-identical to a batch build, so the
    DuckDB oracle reproduces every estimate EXACTLY (the strongest
    check form, now on streaming HLL state)."""
    import tempfile

    from hive_udf_spark.functions.hllp import hllp_estimate
    from hive_udf_spark.streaming.sketch_sink import daily_user_hllp_sink
    from hive_udf_spark.streaming.windows import read_events_stream

    with tempfile.TemporaryDirectory() as tmp:
        table = f"{tmp}/daily_hllp"
        q = daily_user_hllp_sink(
            read_events_stream(spark, sf_dir), table, f"{tmp}/ckpt", m=256, seed=7
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            hllp_estimate(spark.read.parquet(table), ["day"], m=256)
            .select("day", "n_zero", F.col("est_hllp").alias("est_users"))
            .localCheckpoint(eager=True)  # outlives the TemporaryDirectory
        )
    return out


@register(
    "streaming_scd2_dimension",
    oracle="""
    WITH per_batch AS (
      SELECT o_custkey, o_orderkey % 3 AS i,
             arg_min(o_orderpriority, o_orderkey) AS v
      FROM orders WHERE o_custkey IS NOT NULL
      GROUP BY o_custkey, o_orderkey % 3
    ),
    vals AS (
      SELECT o_custkey, i, v,
             TIMESTAMP '2026-01-01 00:00:00' + to_days(CAST(i * 31 AS INT)) AS t
      FROM per_batch
    ),
    chg AS (
      SELECT *, lag(v) OVER (PARTITION BY o_custkey ORDER BY i) AS pv
      FROM vals
    ),
    opened AS (
      SELECT o_custkey, i, v, t FROM chg
      WHERE pv IS NULL OR v IS DISTINCT FROM pv
    )
    SELECT o_custkey, v AS o_orderpriority,
           t AS valid_from,
           lead(t) OVER (PARTITION BY o_custkey ORDER BY i) AS valid_to
    FROM opened
    """,
)
def streaming_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SCD2 maintenance (streaming/scd_sink.py
    scd2_dimension_sink): three change batches (per-customer priority
    of orderkey %% 3 == i orders, effective a month apart) stream into
    the stored dimension under the one-swap lineage-guarded state
    contract; the final dimension must equal the run-length fold of
    each customer's present-value sequence — consecutive equal values
    collapse to one interval, changes close and open rows at the
    batch's effective timestamp. The oracle derives that fold directly
    with lag()/lead(), so intervals, attributes, and multiplicity all
    hash-match."""
    import datetime
    import tempfile

    from hive_udf_spark.streaming.scd_sink import scd2_dimension_sink

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        for b in range(3):  # sequential writes -> deterministic file order
            eff = datetime.datetime(2026, 1, 1) + datetime.timedelta(days=31 * b)
            batch = (
                orders.filter(F.col("o_orderkey") % 3 == b)
                .groupBy("o_custkey")
                .agg(F.min_by("o_orderpriority", "o_orderkey").alias("o_orderpriority"))
                .select(
                    "o_custkey",
                    "o_orderpriority",
                    F.lit(eff).alias("effective_ts"),
                )
            )
            batch.coalesce(1).write.parquet(f"{src}/b{b}")
        schema = spark.read.parquet(f"{src}/b0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = scd2_dimension_sink(
            stream,
            f"{tmp}/dim_state",
            f"{tmp}/ckpt",
            ["o_custkey"],
            ["o_orderpriority"],
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = (
            spark.read.parquet(f"{tmp}/dim_state/dim")
            .select("o_custkey", "o_orderpriority", "valid_from", "valid_to")
            .localCheckpoint(eager=True)  # outlives the TemporaryDirectory
        )
    return out
