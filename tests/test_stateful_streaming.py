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
