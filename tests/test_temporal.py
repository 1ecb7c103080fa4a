"""As-of join and interval join operator semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hive_udf_spark.operators.temporal import asof_join, interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),
            (2, "a", _ts("2024-01-01 12:00:00")),
            (3, "b", _ts("2024-01-01 11:00:00")),
            (4, "c", _ts("2024-01-01 11:00:00")),  # key with no right rows
        ],
        "lid int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 09:00:00"), 90),
            ("a", _ts("2024-01-01 11:30:00"), 115),
            ("b", _ts("2024-01-01 11:00:00"), 110),  # exact tie with left ts
            ("b", _ts("2024-01-01 23:00:00"), 230),
        ],
        "k string, rts timestamp, val int",
    )
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "k", "ts", "rts", direction="backward")
    got = {r["lid"]: r["val"] for r in out.collect()}
    # lid=1: 09:00 row; lid=2: 11:30 row; lid=3: tie at 11:00 matches; lid=4: none
    assert got == {1: 90, 2: 115, 3: 110, 4: None}
    assert out.count() == left.count()  # left-outer: one row per left row


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "k", "ts", "rts", direction="forward")
    got = {r["lid"]: r["val"] for r in out.collect()}
    assert got == {1: 115, 2: None, 3: 110, 4: None}


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "k", "ts", "rts", direction="backward", tolerance="45 minutes")
    got = {r["lid"]: r["val"] for r in out.collect()}
    # lid=1's only earlier match (09:00) is 1h away -> nulled by tolerance
    assert got == {1: None, 2: 115, 3: 110, 4: None}


def test_asof_tiebreak_and_struct_consistency(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 12:00:00"))], "lid int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 11:00:00"), 7, "low"),
            ("a", _ts("2024-01-01 11:00:00"), 9, "high"),
        ],
        "k string, rts timestamp, seq int, tag string",
    )
    out = asof_join(
        left, right, "k", "k", "ts", "rts", direction="backward", right_tiebreak="seq"
    ).collect()[0]
    # greatest tiebreak wins, and all matched fields come from THAT row
    assert out["seq"] == 9 and out["tag"] == "high"


def test_asof_column_collision_suffix(spark):
    left, right = _frames(spark)
    right2 = right.withColumnRenamed("rts", "ts")  # collide with left's ts
    out = asof_join(left, right2, "k", "k", "ts", "ts", direction="backward")
    assert "ts_r" in out.columns and "ts" in out.columns


def test_interval_join_half_open(spark):
    points = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),
            (2, "a", _ts("2024-01-01 10:59:59")),
            (3, "a", _ts("2024-01-01 11:00:00")),  # == end -> excluded
            (4, "b", _ts("2024-01-01 10:30:00")),  # other key
        ],
        "pid int, k string, ts timestamp",
    )
    ivls = spark.createDataFrame(
        [(100, "a", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "iid int, ik string, s timestamp, e timestamp",
    )
    out = interval_join(points, ivls, "k", "ik", "ts", "s", "e", bucket_width="15 minutes")
    assert sorted(r["pid"] for r in out.collect()) == [1, 2]


def test_interval_join_bucket_width_invariance(spark):
    points = spark.createDataFrame(
        [(i, "a", _ts("2024-01-01 00:00:00") + dt.timedelta(minutes=17 * i)) for i in range(40)],
        "pid int, k string, ts timestamp",
    )
    ivls = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 01:00:00"), _ts("2024-01-01 04:00:00")),
            (2, "a", _ts("2024-01-01 06:30:00"), _ts("2024-01-01 06:45:00")),
        ],
        "iid int, ik string, s timestamp, e timestamp",
    )
    results = []
    for bw in ("7 minutes", "1 hour", "1 day"):
        out = interval_join(points, ivls, "k", "ik", "ts", "s", "e", bucket_width=bw)
        results.append(sorted((r["iid"], r["pid"]) for r in out.collect()))
    assert results[0] == results[1] == results[2] and len(results[0]) > 0


def test_gapfill_fills_missing_buckets(spark):
    from datetime import datetime

    from hive_udf_spark.operators.temporal import time_bucket_gapfill

    df = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 0, 30), 1.0),
            ("a", datetime(2024, 1, 1, 3, 10), 2.0),  # hours 1-2 are gaps
            ("b", datetime(2024, 1, 1, 5, 0), 3.0),   # single bucket
        ],
        "k string, ts timestamp, v double",
    )
    out = time_bucket_gapfill(
        df, "ts", ["k"], bucket="1 hour",
        agg_exprs={"n": F.count("*")}, fill={"n": 0},
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, {})[r.bucket.hour] = r.n
    assert by_key["a"] == {0: 1, 1: 0, 2: 0, 3: 1}  # gaps present, zero-filled
    assert by_key["b"] == {5: 1}
    # default fill is NULL (gap marker)
    out2 = time_bucket_gapfill(df, "ts", ["k"], bucket="1 hour").collect()
    nulls = [r for r in out2 if r.n is None]
    assert len(nulls) == 2


def test_gapfill_rejects_multi_unit_bucket(spark):
    import pytest as _pytest

    from hive_udf_spark.operators.temporal import time_bucket_gapfill

    df = spark.createDataFrame([("a",)], "k string").selectExpr(
        "k", "timestamp'2024-01-01' AS ts"
    )
    with _pytest.raises(ValueError):
        time_bucket_gapfill(df, "ts", ["k"], bucket="2 hours")


# ---------------------------------------------------------------------------
# funnel_steps / cohort_retention (r5)
# ---------------------------------------------------------------------------


def _funnel_fixture(spark):
    import datetime as dt

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 10), "view"), (1, T(2024, 1, 1, 11), "click"),
        (1, T(2024, 1, 2, 9), "purchase"),
        # purchase precedes click -> chain incomplete
        (2, T(2024, 1, 1, 10), "view"), (2, T(2024, 1, 1, 9), "purchase"),
        (2, T(2024, 1, 1, 11), "click"),
        # complete but outside the 24h window
        (3, T(2024, 1, 1, 0), "view"), (3, T(2024, 1, 1, 1), "click"),
        (3, T(2024, 1, 3, 2), "purchase"),
        (4, T(2024, 1, 5, 0), "view"),
        # simultaneous click: strictly-after never chains on ties
        (5, T(2024, 1, 1, 0), "view"), (5, T(2024, 1, 1, 0), "click"),
        (5, T(2024, 1, 1, 1), "purchase"),
    ]
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")


def test_funnel_earliest_chain_and_window(spark):
    from hive_udf_spark.operators.temporal import funnel_steps

    got = {
        r.user_id: (r.step_1_ts, r.step_2_ts, r.step_3_ts, r.completed)
        for r in funnel_steps(
            _funnel_fixture(spark), "user_id", "ts", "event_type",
            ["view", "click", "purchase"], within_hours=24,
        ).collect()
    }
    assert got[1][3] is True and got[1][2] is not None
    assert got[2][2] is None and got[2][3] is False  # purchase before click
    assert got[3][2] is not None and got[3][3] is False  # outside window
    assert got[4][1] is None and got[4][3] is False
    assert got[5][1] is None  # tie does not chain (strictly after)


def test_funnel_single_shuffle_plan(spark):
    from hive_udf_spark.operators.temporal import funnel_steps

    df = funnel_steps(
        _funnel_fixture(spark), "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one shuffle by user, no joins
    assert "Join" not in plan


def test_cohort_retention_counts(spark):
    import datetime as dt

    from hive_udf_spark.operators.temporal import cohort_retention

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 5)), (1, T(2024, 1, 9, 5)),   # w0 + w1
        (2, T(2024, 1, 2, 5)),                            # w0 only
        (3, T(2024, 1, 10, 5)), (3, T(2024, 1, 22, 5)),  # w1 cohort, back w3
    ]
    ev = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        (r.cohort.date().isoformat(), r.offset): r.n_users
        for r in cohort_retention(ev, "user_id", "ts", bucket="week").collect()
    }
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1
    assert got[("2024-01-08", 0)] == 1
    assert got[("2024-01-08", 2)] == 1
    assert len(got) == 4


def test_funnel_validation(spark):
    import pytest as _pytest

    from hive_udf_spark.operators.temporal import funnel_steps

    with _pytest.raises(ValueError):
        funnel_steps(_funnel_fixture(spark), "user_id", "ts", "event_type", [])


def test_cohort_retention_dst_safe(spark):
    """Offsets are calendar-bucket differences, immune to DST: a return
    2 days after first activity across the US spring-forward lands in
    day-offset 2, not 1."""
    import datetime as dt

    from hive_udf_spark.operators.temporal import cohort_retention

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        T = dt.datetime
        ev = spark.createDataFrame(
            [(1, T(2026, 3, 7, 12)), (1, T(2026, 3, 9, 12)),
             (2, T(2026, 3, 7, 12)), (2, T(2026, 3, 8, 12))],
            "user_id bigint, ts timestamp",
        )
        got = {
            (r.cohort.date().isoformat(), r.offset): r.n_users
            for r in cohort_retention(ev, "user_id", "ts", bucket="day").collect()
        }
        assert got[("2026-03-07", 0)] == 2
        assert got[("2026-03-07", 2)] == 1  # not offset 1
        assert got[("2026-03-07", 1)] == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_funnel_random_events_match_reference(spark):
    """Random event streams vs a brute-force nested-min reference."""
    import datetime as dt
    import random

    from hive_udf_spark.operators.temporal import funnel_steps

    def ref(events, steps, within_hours):
        by_user = {}
        for u, ts, et in events:
            by_user.setdefault(u, []).append((ts, et))
        out = {}
        for u, evs in by_user.items():
            if not any(et in steps for _, et in evs):
                continue
            chain, prev = [], None
            for s in steps:
                cands = [t for t, et in evs if et == s and (prev is None or t > prev)]
                nxt = min(cands) if cands else None
                chain.append(nxt)
                if nxt is None:
                    chain += [None] * (len(steps) - len(chain))
                    break
                prev = nxt
            done = chain[-1] is not None and (
                within_hours is None
                or (chain[-1] - chain[0]).total_seconds() <= within_hours * 3600
            )
            out[u] = (tuple(chain), done)
        return out

    rng = random.Random(17)
    steps = ["view", "click", "purchase"]
    base = dt.datetime(2024, 1, 1)
    events = [
        (
            rng.randint(1, 8),
            base + dt.timedelta(minutes=rng.randint(0, 5000)),
            rng.choice(steps + ["error", "signup"]),
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(events, "user_id bigint, ts timestamp, event_type string")
    got = {
        r.user_id: ((r.step_1_ts, r.step_2_ts, r.step_3_ts), r.completed)
        for r in funnel_steps(df, "user_id", "ts", "event_type", steps, within_hours=24).collect()
    }
    assert got == ref(events, steps, 24)


def test_mad_anomalies_planted_outlier(spark):
    """A single spike in an otherwise flat series is the only flag."""
    from pyspark.sql import functions as F

    from hive_udf_spark.operators.temporal import mad_anomalies

    rows = [("a", d, 100 + (d % 3)) for d in range(30)] + [("a", 30, 500)]
    df = spark.createDataFrame(rows, "g string, day int, n long")
    out = {r.day: r for r in mad_anomalies(df, ["g"], "n").collect()}
    assert out[30].is_anomaly
    flagged = [d for d, r in out.items() if r.is_anomaly]
    assert flagged == [30]
    assert out[30].med == 101  # median of 100/101/102 runs + spike
    assert out[30].mad == 1


def test_mad_anomalies_zero_mad_convention(spark):
    """Over half the points identical -> MAD 0: any deviation flags,
    identical points do not."""
    from hive_udf_spark.operators.temporal import mad_anomalies

    rows = [("a", i, 7) for i in range(10)] + [("a", 10, 8)]
    df = spark.createDataFrame(rows, "g string, day int, n long")
    out = {r.day: r.is_anomaly for r in mad_anomalies(df, ["g"], "n").collect()}
    assert out[10] is True and not any(out[d] for d in range(10))


def test_mad_anomalies_null_group_and_identity_cols(spark):
    """NULL group keys are real series (not dropped), and every input
    column survives to the output."""
    from hive_udf_spark.operators.temporal import mad_anomalies

    rows = [(None, i, 10) for i in range(5)] + [(None, 5, 99), ("b", 0, 1)]
    df = spark.createDataFrame(rows, "g string, day int, n long")
    out = mad_anomalies(df, ["g"], "n").collect()
    assert len(out) == 7
    assert set(out[0].asDict()) == {"g", "day", "n", "med", "mad", "is_anomaly"}
    null_rows = {r.day: r for r in out if r.g is None}
    assert len(null_rows) == 6 and null_rows[5].is_anomaly


def test_mad_anomalies_global_series(spark):
    """group_cols=[] treats the whole input as one series."""
    from hive_udf_spark.operators.temporal import mad_anomalies

    rows = [(i, 50) for i in range(9)] + [(9, 5000)]
    df = spark.createDataFrame(rows, "day int, n long")
    out = {r.day: r.is_anomaly for r in mad_anomalies(df, [], "n").collect()}
    assert out[9] is True and sum(out.values()) == 1


def test_mad_anomalies_validation(spark):
    import pytest as _pytest

    from hive_udf_spark.operators.temporal import mad_anomalies

    df = spark.createDataFrame([(1, 1)], "day int, n long")
    with _pytest.raises(ValueError):
        mad_anomalies(df, [], "n", k_milli=-1)


def test_mad_anomalies_null_values_dropped(spark):
    """NULL metric rows must not enter the rank windows (they sorted
    first and corrupted the whole group's median) — they are dropped."""
    from hive_udf_spark.operators.temporal import mad_anomalies

    rows = [("a", 0, None), ("a", 1, 100), ("a", 2, 101), ("a", 3, 102)]
    df = spark.createDataFrame(rows, "g string, day int, n long")
    out = {r.day: r for r in mad_anomalies(df, ["g"], "n").collect()}
    assert sorted(out) == [1, 2, 3]  # NULL row dropped, not scored
    assert out[2].med == 101 and out[2].mad == 1
    assert not any(r.is_anomaly for r in out.values())


def test_mad_anomalies_random_match_reference(spark):
    """Randomized series match a Python median/MAD mirror per seed."""
    import random

    from hive_udf_spark.operators.temporal import mad_anomalies

    def ref(rows, k_milli):
        from collections import defaultdict

        groups = defaultdict(list)
        for g, d, v in rows:
            if v is not None:
                groups[g].append((d, v))
        out = {}
        for g, pts in groups.items():
            vs = sorted(v for _, v in pts)
            med = vs[(len(vs) - 1) // 2]
            ds = sorted(abs(v - med) for _, v in pts)
            mad = ds[(len(ds) - 1) // 2]
            for d, v in pts:
                out[(g, d)] = (v, med, mad, 1000 * abs(v - med) > k_milli * mad)
        return out

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        rows = [
            (rng.choice(["a", "b", None]), i, rng.choice([None, rng.randint(-20, 20)]))
            for i in range(80)
        ]
        df = spark.createDataFrame(rows, "g string, day int, n long")
        got = {
            (r.g, r.day): (r.n, r.med, r.mad, r.is_anomaly)
            for r in mad_anomalies(df, ["g"], "n", k_milli=2500).collect()
        }
        assert got == ref(rows, 2500), seed


def test_attribution_semantics(spark):
    """First/last picks, lookback cut, touchless conversions survive,
    same-timestamp tie-break by type."""
    import datetime as dt

    from hive_udf_spark.operators.temporal import attribution

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, uid, ty, mins):
        return (eid, uid, ty, t0 + dt.timedelta(minutes=mins))

    rows = [
        ev(1, 1, "view", 0),
        ev(2, 1, "click", 30),
        ev(3, 1, "purchase", 60),       # first=view@0, last=click@30, n=2
        ev(4, 2, "view", -73 * 60),     # outside 72h lookback
        ev(5, 2, "purchase", 0),        # direct (no qualifying touch)
        ev(6, 3, "view", 10),
        ev(7, 3, "click", 10),          # tie ts: first=click (type asc), last=view (type desc)
        ev(8, 3, "purchase", 20),
        ev(9, 4, "purchase", 0),        # user with no touches at all
        ev(10, 5, "view", 100),         # touch AFTER conversion: not attributed
        ev(11, 5, "purchase", 50),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        r.conversion_id: (
            r.first_touch_type,
            r.last_touch_type,
            r.n_touches,
        )
        for r in attribution(
            df, "purchase", ["view", "click"], lookback_hours=72
        ).collect()
    }
    assert got[3] == ("view", "click", 2)
    assert got[5] == (None, None, 0)
    assert got[8] == ("click", "view", 2)
    assert got[9] == (None, None, 0)
    assert got[11] == (None, None, 0)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="touch_types"):
        attribution(df, "purchase", [])


def test_transition_matrix_matches_reference(spark):
    """Random event streams over seeds: counts and milli-probs equal a
    Python mirror following the same (ts, id) order."""
    import datetime as dt
    import random

    from hive_udf_spark.operators.temporal import transition_matrix

    t0 = dt.datetime(2026, 1, 1)
    for seed in (0, 1):
        rng = random.Random(seed)
        rows = []
        for eid in range(120):
            rows.append(
                (
                    eid,
                    rng.randrange(8),
                    rng.choice(["a", "b", "c"]),
                    t0 + dt.timedelta(minutes=rng.randrange(30)),  # ts ties happen
                )
            )
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        got = {
            (r.from_type, r.to_type): (r.n_transitions, r.p_milli)
            for r in transition_matrix(df).collect()
        }
        byu: dict = {}
        for eid, uid, ty, ts in rows:
            byu.setdefault(uid, []).append((ts, eid, ty))
        counts: dict = {}
        for seq in byu.values():
            seq.sort()
            for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        totals: dict = {}
        for (a, _), n in counts.items():
            totals[a] = totals.get(a, 0) + n
        want = {
            (a, b): (n, n * 1000 // totals[a]) for (a, b), n in counts.items()
        }
        assert got == want, seed


def test_transition_matrix_null_types_excluded(spark):
    """Review-caught: NULL event types are not states — excluded from
    both sides (previously counted into totals but dropped from output
    by the equi-join, asymmetrically)."""
    import datetime as dt

    from hive_udf_spark.operators.temporal import transition_matrix

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, 1, "a", t0),
        (2, 1, None, dt.datetime(2026, 1, 1, 1)),
        (3, 1, "b", dt.datetime(2026, 1, 1, 2)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.p_milli)
        for r in transition_matrix(df).collect()
    }
    # the NULL row is skipped entirely: a -> b is the one transition
    assert got == {("a", "b"): (1, 1000)}


def test_ewma_smooth_matches_python_fold_and_plan(spark):
    """Engine fold == pure-Python reference on random data (multi-seed),
    negative diffs floor correctly, and the plan is a single
    partial-aggregated groupBy with no Python or window stages."""
    import numpy as np

    from hive_udf_spark.operators.temporal import ewma_smooth

    rng = np.random.default_rng(11)
    rows = []
    for uid in range(20):
        for i in range(rng.integers(1, 40)):
            rows.append(
                (uid, 1_700_000_000_000_000 + int(rng.integers(0, 10**9)), uid * 1000 + i,
                 float(rng.normal(0, 50)))
            )
    df = spark.createDataFrame(
        rows, "user_id bigint, ts_us bigint, event_id bigint, value double"
    ).select(
        "user_id",
        (F.col("ts_us") / 1_000_000).cast("timestamp").alias("ts"),
        "event_id",
        "value",
    )
    out = {r.user_id: (r.n_events, r.ewma_milli) for r in ewma_smooth(df).collect()}

    import collections
    seqs = collections.defaultdict(list)
    for uid, ts_us, eid, v in rows:
        seqs[uid].append((ts_us, eid, v))
    import math
    for uid, seq in seqs.items():
        seq.sort()
        qs = [round(v * 1000) for _, _, v in seq]
        s = qs[0]
        for qv in qs[1:]:
            s += math.floor((qv - s) / 8.0)
        assert out[uid] == (len(seq), s), uid
    plan = ewma_smooth(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Window" not in plan
    assert plan.count("Exchange") == 1  # one shuffle: the groupBy
