"""Temporal join queries: as-of joins and range joins with exact oracles.

DuckDB's native ASOF JOIN is the oracle for ``asof_join`` (same semantics:
closest right row at-or-before the left timestamp per key); the range join
oracle is a plain inequality join. Our Spark implementations avoid the
range cross-product entirely (union+window / bucketed equi-join — see
operators/temporal.py scale notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_udf_spark.operators.temporal import asof_join, interval_join
from hive_udf_spark.plans.registry import register
from hive_udf_spark.sources import load_table


@register(
    "asof_latest_order_before_event",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderdate,
             max(o_orderkey)                    AS o_orderkey,
             arg_max(o_totalprice, o_orderkey)  AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts,
           r.o_orderkey, r.o_orderdate, r.o_totalprice
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.o_custkey AND r.o_orderdate <= e.ts
    """,
)
def asof_latest_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): each event matched to the user's most recent
    order at-or-before the event timestamp. Right side deduped to one row
    per (custkey, orderdate) with max-orderkey-wins, so the match is
    deterministic. One shuffle; no range cross-product."""
    events = load_table(spark, sf_dir, "events")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    return asof_join(
        events.select("event_id", "user_id", "ts"),
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        direction="backward",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate", "o_totalprice")


@register(
    "asof_prev_event_gap",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           p.event_id AS prev_event_id,
           CASE WHEN p.event_id IS NULL THEN NULL
                ELSE date_diff('microsecond', p.ts, e.ts) END AS gap_us
    FROM events e ASOF LEFT JOIN events p
      ON e.user_id = p.user_id
     AND p.ts <= e.ts - INTERVAL 1 MICROSECOND
    """,
)
def asof_prev_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self as-of join: time since the same user's previous event (strictly
    earlier, via a 1-microsecond left shift). event_id tiebreak makes
    equal-timestamp matches deterministic."""
    events = load_table(spark, sf_dir, "events")
    left = events.select(
        "event_id", "user_id", "ts", (F.col("ts") - F.expr("INTERVAL 1 MICROSECOND")).alias("__q")
    )
    right = events.select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("prev_event_id"),
        F.col("ts").alias("prev_ts"),
    )
    joined = asof_join(
        left,
        right,
        left_on="user_id",
        right_on="p_user",
        left_ts="__q",
        right_ts="prev_ts",
        direction="backward",
        right_tiebreak="prev_event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "prev_event_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))).alias("gap_us"),
    )


@register(
    "range_join_events_next_hour",
    oracle="""
    SELECT e.event_id,
           count(p.event_id)                          AS n_next_hour,
           round(coalesce(sum(p.value), 0), 2)        AS sum_value_next_hour
    FROM events e LEFT JOIN events p
      ON p.user_id = e.user_id AND p.event_id != e.event_id
     AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 1 HOUR
    GROUP BY e.event_id
    """,
)
def range_join_events_next_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per event, the same user's activity (count, value sum)
    in the following hour [ts, ts+1h). Bucketed equi-join (1h epochs,
    explode factor ≤ 2) instead of Spark's nested-loop range join."""
    events = load_table(spark, sf_dir, "events")
    anchors = events.select(
        F.col("event_id").alias("anchor_id"), F.col("user_id").alias("anchor_user"),
        F.col("ts").alias("anchor_ts"),
    )
    matches = interval_join(
        points=events.select("event_id", "user_id", "ts", "value"),
        intervals=anchors,
        point_key="user_id",
        interval_key="anchor_user",
        point_ts="ts",
        start_ts="anchor_ts",
        end_ts=F.col("anchor_ts") + F.expr("INTERVAL 1 HOUR"),
        bucket_width="1 hour",
    ).filter(F.col("event_id") != F.col("anchor_id"))
    agg = matches.groupBy("anchor_id").agg(
        F.count("event_id").alias("n_next_hour"),
        F.round(F.sum("value"), 2).alias("sum_value_next_hour"),
    )
    return (
        events.select(F.col("event_id"))
        .join(agg, events.event_id == agg.anchor_id, "left")
        .select(
            "event_id",
            F.coalesce(F.col("n_next_hour"), F.lit(0)).alias("n_next_hour"),
            F.coalesce(F.col("sum_value_next_hour"), F.lit(0.0)).alias("sum_value_next_hour"),
        )
    )


@register(
    "asof_next_event_within_hour",
    oracle="""
    WITH nxt AS (
      SELECT event_id, user_id, ts,
             lead(event_id) OVER w AS next_event_id,
             lead(ts)       OVER w AS next_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts,
           CASE WHEN next_ts <= ts + INTERVAL 1 HOUR THEN next_event_id END AS next_event_id,
           CASE WHEN next_ts <= ts + INTERVAL 1 HOUR
                THEN date_diff('microsecond', ts, next_ts) END AS gap_us
    FROM nxt
    """,
)
def asof_next_event_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: each event matched to the same
    user's NEXT event, but only if it arrives within 1 hour. Exercises
    direction='forward' + tolerance; oracle is the equivalent lead()
    window query ((user_id, ts) is unique in this corpus, so lead ==
    earliest strictly-later event)."""
    events = load_table(spark, sf_dir, "events")
    left = events.select(
        "event_id", "user_id", "ts",
        (F.col("ts") + F.expr("INTERVAL 1 MICROSECOND")).alias("__q"),
    )
    right = events.select(
        F.col("user_id").alias("n_user"), F.col("event_id").alias("next_event_id"),
        F.col("ts").alias("next_ts"),
    )
    joined = asof_join(
        left,
        right,
        left_on="user_id",
        right_on="n_user",
        left_ts="__q",
        right_ts="next_ts",
        direction="forward",
        # left ts is shifted +1us (strict-after); shrink the tolerance by
        # 1us so the match window is exactly (ts, ts + 1 hour]
        tolerance="3599999999 microseconds",
        right_tiebreak="next_event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "next_event_id",
        (F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))).alias("gap_us"),
    )


@register(
    "timeseries_gapfill_hourly",
    oracle="""
    WITH pb AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM pb GROUP BY 1
    ),
    axis AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM spans
    )
    SELECT a.event_type, a.bucket,
           coalesce(pb.n, 0) AS n,
           coalesce(pb.value_cents, 0) AS value_cents
    FROM axis a LEFT JOIN pb ON a.event_type = pb.event_type AND a.bucket = pb.bucket
    """,
)
def timeseries_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hourly rollup with gap-fill: every hour in each
    event type's active range appears, empty hours filled with zeros.
    The dense time axis is generated from the (tiny) aggregated side —
    never by scanning raw events — and left-joined back; the oracle
    rebuilds the same axis with generate_series."""
    from hive_udf_spark.operators.temporal import time_bucket_gapfill

    ev = load_table(spark, sf_dir, "events")
    out = time_bucket_gapfill(
        ev,
        "ts",
        ["event_type"],
        bucket="1 hour",
        agg_exprs={
            "n": F.count("*"),
            "value_cents": F.sum(F.round(F.col("value") * 100, 0).cast("long")),
        },
        fill={"n": 0, "value_cents": 0},
    )
    return out.select("event_type", "bucket", "n", "value_cents")


@register(
    "events_anomaly_mad",
    oracle="""
    WITH c AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n_events ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS cnt
      FROM c
    ),
    med AS (
      SELECT event_type, n_events AS med FROM r
      WHERE rn = CAST(floor(0.5 * (cnt - 1)) AS BIGINT) + 1
    ),
    d AS (
      SELECT c.event_type, c.day, c.n_events, m.med,
             abs(c.n_events - m.med) AS dd
      FROM c JOIN med m ON m.event_type = c.event_type
    ),
    r2 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dd ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS cnt
      FROM d
    ),
    mad AS (
      SELECT event_type, dd AS mad FROM r2
      WHERE rn = CAST(floor(0.5 * (cnt - 1)) AS BIGINT) + 1
    )
    SELECT d.event_type, d.day, d.n_events,
           CAST(d.med AS BIGINT) AS med, CAST(mad.mad AS BIGINT) AS mad,
           (1000 * abs(d.n_events - d.med) > 3500 * mad.mad) AS is_anomaly
    FROM d JOIN mad ON mad.event_type = d.event_type
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly detection
    (operators/temporal.py mad_anomalies): per event type, flag days
    whose event count deviates from the type's median by more than
    3.5× the MAD. Median/MAD use the deterministic nearest-lower rank
    rule and the flag is an integer comparison — every column exact.
    The heavy reduction (raw events → daily counts) is the partial-
    aggregated groupBy; the MAD windows run on the tiny series."""
    from hive_udf_spark.operators.temporal import mad_anomalies

    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return mad_anomalies(series, ["event_type"], "n_events", k_milli=3500)


@register(
    "events_attribution",
    oracle="""
    WITH conv AS (
      SELECT user_id AS u, event_id AS cid, ts AS cts FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL AND user_id IS NOT NULL
    ),
    touch AS (
      SELECT user_id AS u, ts AS tts, event_type AS tty FROM events
      WHERE event_type IN ('view', 'click') AND ts IS NOT NULL
        AND user_id IS NOT NULL
    ),
    qual AS (
      SELECT c.u, c.cid, c.cts, t.tts, t.tty
      FROM conv c JOIN touch t ON t.u = c.u
      WHERE t.tts < c.cts AND t.tts >= c.cts - INTERVAL 72 HOUR
    ),
    rk AS (
      SELECT *,
             row_number() OVER (PARTITION BY cid ORDER BY tts ASC, tty ASC) AS rf,
             row_number() OVER (PARTITION BY cid ORDER BY tts DESC, tty DESC) AS rl,
             count(*) OVER (PARTITION BY cid) AS nt
      FROM qual
    ),
    fl AS (
      SELECT cid,
             min(CASE WHEN rf = 1 THEN tty END) AS first_touch_type,
             min(CASE WHEN rf = 1 THEN tts END) AS first_touch_ts,
             min(CASE WHEN rl = 1 THEN tty END) AS last_touch_type,
             min(CASE WHEN rl = 1 THEN tts END) AS last_touch_ts,
             CAST(min(nt) AS BIGINT) AS n_touches
      FROM rk GROUP BY cid
    )
    SELECT c.u AS user_id, c.cid AS conversion_id, c.cts AS conversion_ts,
           fl.first_touch_type, fl.first_touch_ts,
           fl.last_touch_type, fl.last_touch_ts,
           coalesce(fl.n_touches, 0) AS n_touches
    FROM conv c LEFT JOIN fl ON fl.cid = c.cid
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch conversion attribution (operators/temporal.py
    attribution): every purchase gets its earliest and latest
    view/click within a 72-hour lookback, plus the touch count;
    touchless conversions survive as direct with NULLs. One
    (user)-keyed range join + one partial-aggregated struct min/max per
    conversion — no window over raw events. Tie-break (ts, type) is
    deterministic, so every column hash-matches."""
    from hive_udf_spark.operators.temporal import attribution

    ev = load_table(spark, sf_dir, "events")
    return attribution(
        ev, "purchase", ["view", "click"], lookback_hours=72
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH t AS (
      SELECT event_type AS y,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC) AS y2
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
    ),
    counts AS (
      SELECT y AS from_type, y2 AS to_type, CAST(count(*) AS BIGINT) AS n_transitions
      FROM t WHERE y2 IS NOT NULL GROUP BY 1, 2
    ),
    totals AS (
      SELECT from_type, sum(n_transitions) AS nf FROM counts GROUP BY 1
    )
    SELECT c.from_type, c.to_type, c.n_transitions,
           CAST((c.n_transitions * 1000) // t.nf AS BIGINT) AS p_milli
    FROM counts c JOIN totals t ON t.from_type = c.from_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov behavioral model (operators/temporal.py
    transition_matrix): per-user adjacent event-type pairs in (ts,
    event_id) order — ONE sorted fold per user (the funnel_steps
    discipline), then a partial-aggregated global count and integer
    milli-probabilities. The oracle forms the same pairs with lead()
    over the identical deterministic order."""
    from hive_udf_spark.operators.temporal import transition_matrix

    ev = load_table(spark, sf_dir, "events")
    return transition_matrix(ev)


@register(
    "events_ewma_level",
    oracle="""
    WITH q AS (
      SELECT user_id, ts, event_id, CAST(round(value * 1000) AS BIGINT) AS qv
      FROM events WHERE user_id IS NOT NULL
    ),
    s AS (
      SELECT user_id, list(qv ORDER BY ts, event_id) AS seq
      FROM q GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(seq) AS BIGINT) AS n_events,
           CAST(list_reduce(seq,
                (acc, x) -> acc + CAST(floor((x - acc) / 8.0) AS BIGINT))
                AS BIGINT) AS ewma_milli
    FROM s
    """,
)
def events_ewma_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA level (r6): the classic trend/anomaly baseline as
    ONE sorted integer fold per key (operators/temporal.py ewma_smooth —
    the funnel discipline applied to smoothing). α = 1/8 keeps the decay
    a dyadic operation, so quantized values + floor make every
    intermediate state engine-exact: DuckDB re-runs the identical fold
    with list_reduce over the identically-ordered sequence and must land
    on the same final level bit-for-bit."""
    from hive_udf_spark.operators.temporal import ewma_smooth

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return ewma_smooth(events, alpha_shift=3, scale=1000)
