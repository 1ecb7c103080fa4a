"""Custom stateful streaming operator (LC sketch state) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_udf_spark.sources import load_table
from hive_udf_spark.streaming.stateful import running_distinct_users
from hive_udf_spark.streaming.windows import read_events_stream, run_stream_to_memory


def test_running_distinct_matches_exact_after_full_stream(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    out = run_stream_to_memory(
        running_distinct_users(stream), "t_stateful", mode="update"
    )
    # update mode: keep the latest row per key (highest batches_seen)
    latest = {}
    for r in out.collect():
        prev = latest.get(r.event_type)
        if prev is None or r.batches_seen > prev.batches_seen:
            latest[r.event_type] = r
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(latest) == set(exact)
    for et, row in latest.items():
        assert abs(row.est_distinct_users - exact[et]) <= max(1, 0.05 * exact[et]), (
            et,
            row.est_distinct_users,
            exact[et],
        )


# ---------------------------------------------------------------------------
# streaming funnel (r5)
# ---------------------------------------------------------------------------


def _final_rows(out):
    latest = {}
    for r in out.collect():
        prev = latest.get(r.user_id)
        if prev is None or r.batches_seen > prev.batches_seen:
            latest[r.user_id] = r
    return latest


def test_streaming_funnel_equals_batch(spark, sf_dir):
    from hive_udf_spark.operators.temporal import funnel_steps
    from hive_udf_spark.streaming.funnel import streaming_funnel

    stream = read_events_stream(spark, sf_dir)
    out = run_stream_to_memory(
        streaming_funnel(stream, ["view", "click", "purchase"], within_hours=72),
        "t_stream_funnel",
        mode="update",
    )
    got = {
        u: (r.step_1_ts, r.step_2_ts, r.step_3_ts, r.completed)
        for u, r in _final_rows(out).items()
    }
    want = {
        r.user_id: (r.step_1_ts, r.step_2_ts, r.step_3_ts, r.completed)
        for r in funnel_steps(
            load_table(spark, sf_dir, "events"),
            "user_id", "ts", "event_type",
            ["view", "click", "purchase"], within_hours=72,
        ).collect()
    }
    assert got == want


def test_streaming_funnel_order_independent(spark, tmp_path):
    """Adversarial batching: the purchase arrives in batch 1, the view
    that unlocks it only in batch 2 — per-step timestamp state must
    revive it (a chain-only state would lose the funnel)."""
    import datetime as dt

    from hive_udf_spark.streaming.funnel import streaming_funnel

    T = dt.datetime
    b1 = [(1, T(2024, 1, 1, 12), "purchase"), (1, T(2024, 1, 1, 11), "click")]
    b2 = [(1, T(2024, 1, 1, 10), "view")]
    schema = "user_id bigint, ts timestamp, event_type string"
    src = tmp_path / "src"
    src.mkdir()
    # one file per micro-batch (maxFilesPerTrigger=1 -> deterministic order)
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = run_stream_to_memory(
        streaming_funnel(stream, ["view", "click", "purchase"]),
        "t_funnel_order",
        mode="update",
    )
    final = _final_rows(out)[1]
    assert final.completed is True
    assert final.step_1_ts.hour == 10 and final.step_3_ts.hour == 12
