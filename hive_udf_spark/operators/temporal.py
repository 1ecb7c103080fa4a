"""Temporal join operators: as-of join and range (interval) join.

The reference has no joins at all (SURVEY.md §2.2 — its host engine, Hive,
supplies them), and Spark itself has no native as-of join. These are the
two temporal operators a training-data/event pipeline needs constantly
(latest dimension state at event time; activity inside a time window), so
we provide them as first-class operators built from shuffle-friendly
primitives.

Scale design (100 TB):

- ``asof_join`` uses the union-and-window formulation: tag both sides,
  union, one window over (key, ts) carrying the last right-side payload
  forward. Exactly ONE shuffle (the window partitioning) regardless of
  match fan-out — never a range cross-product. This is the same plan shape
  Flink/kdb-style as-of joins lower to on a shared-nothing engine.
- ``interval_join`` buckets time into fixed-width epochs, explodes each
  interval onto the buckets it covers, and equi-joins on (key, bucket) so
  Catalyst can use a plain hash join; the exact range predicate then
  filters within the bucket matches. Choosing bucket_width ≈ the typical
  interval length keeps the explode factor ~2 and the join an equi-join —
  versus Spark's default nested-loop for pure range predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "time_bucket_gapfill", "funnel_steps", "cohort_retention", "mad_anomalies"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: str | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the closest right row at-or-before
    (backward) / at-or-after (forward) its timestamp, matching on key.

    Returns all left columns plus the matched right row's columns (null
    when no match) — left-outer semantics, exactly one output row per left
    row. ``tolerance`` is a SQL interval string (e.g. ``'7 days'``)
    bounding how far the match may be from the left timestamp.

    Right rows should be unique per (key, ts); if not, pass
    ``right_tiebreak`` (a right column name) — the row with the greatest
    tiebreak value at a given timestamp wins, deterministically.

    Implementation: union both sides with a source tag, then a single
    window partitioned by key and ordered by (ts, source, tiebreak) carries
    the last right-side payload (as ONE struct, so all matched fields come
    from the same right row) onto each left row. One shuffle, O(n log n)
    per partition, no range blow-up — the 100 TB-safe formulation.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    from pyspark.sql import Window

    right_payload = [c for c in right.columns]
    # avoid collisions: right columns that clash with left get an _r suffix
    rename = {c: (c + "_r" if c in left.columns else c) for c in right_payload}

    l_tagged = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lpay"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"`{rename[c]}`:{dict(right.dtypes)[c]}" for c in right_payload)
            + ">"
        )
        .alias("__rpay"),
    )
    tie = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0).cast("long")
    )
    r_tagged = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        tie.alias("__tie"),
        F.lit(None).cast(l_tagged.schema["__lpay"].dataType.simpleString()).alias("__lpay"),
        F.struct(*[F.col(c).alias(rename[c]) for c in right_payload]).alias("__rpay"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__tie").asc()]
    else:
        # __tie stays asc: last() picks the latest row in sort order, so the
        # greatest tiebreak wins in both directions
        order = [F.col("__ts").desc(), F.col("__is_left").asc(), F.col("__tie").asc()]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__rpay", ignorenulls=True).over(w)).filter(
        F.col("__is_left") == 1
    )

    if tolerance is not None:
        matched_ts = F.col(f"__match.{rename[right_ts]}")
        if direction == "backward":
            in_tol = matched_ts >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        else:
            in_tol = matched_ts <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
        matched = matched.withColumn(
            "__match", F.when(in_tol, F.col("__match")).otherwise(F.lit(None))
        )

    return matched.select(
        *[F.col(f"__lpay.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{rename[c]}").alias(rename[c]) for c in right_payload],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_ts: str,
    start_ts: str | Column,
    end_ts: str | Column,
    bucket_width: str = "1 hour",
) -> DataFrame:
    """Join each interval row to the point rows with the same key whose
    timestamp falls in [start_ts, end_ts) — half-open, like Flink's
    interval join. Returns interval columns + point columns (inner join;
    aggregate + left-join back for outer semantics).

    ``start_ts``/``end_ts`` may be column names or Column expressions over
    the intervals frame. ``bucket_width`` is a SQL interval literal; pick
    it near the typical interval length so each interval explodes onto ~2
    buckets and the join stays a hash equi-join on (key, bucket).
    """
    s = F.col(start_ts) if isinstance(start_ts, str) else start_ts
    e = F.col(end_ts) if isinstance(end_ts, str) else end_ts
    # Timezone-independent width: the 'Z'-suffixed epoch literal parses as
    # UTC regardless of spark.sql.session.timeZone, so unix_micros(epoch +
    # interval) equals the interval in microseconds under any session tz
    # (a bare epoch literal would shift the width by the session offset).
    bucket_us = F.lit(0).cast("long") + F.expr(
        f"unix_micros(timestamp'1970-01-01 00:00:00Z' + INTERVAL {bucket_width})"
    )

    ivl = intervals.select(
        "*",
        s.alias("__start"),
        e.alias("__end"),
    ).withColumn(
        "__b",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col("__start")) / bucket_us).cast("long"),
                # end is exclusive: last covered bucket holds end - 1us
                ((F.unix_micros(F.col("__end")) - F.lit(1)) / bucket_us).cast("long"),
            )
        ),
    )
    pts = points.withColumn("__b", (F.unix_micros(F.col(point_ts)) / bucket_us).cast("long"))

    cond = (
        (F.col(f"i.{interval_key}") == F.col(f"p.{point_key}"))
        & (F.col("i.__b") == F.col("p.__b"))
        & (F.col(f"p.{point_ts}") >= F.col("i.__start"))
        & (F.col(f"p.{point_ts}") < F.col("i.__end"))
    )
    out_cols = [F.col(f"i.{c}") for c in intervals.columns] + [
        F.col(f"p.{c}").alias(c + "_p" if c in intervals.columns else c)
        for c in points.columns
    ]
    return ivl.alias("i").join(pts.alias("p"), cond, "inner").select(*out_cols)


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    bucket: str = "1 hour",
    agg_exprs: dict[str, Column] | None = None,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Hypertable-style resample: aggregate into fixed time buckets and
    emit EVERY bucket in each key's [min, max] range, filling buckets
    with no rows (the gap-fill every time-series rollup needs — Spark's
    groupBy(window(...)) emits only non-empty windows).

    Plan: one hash-aggregate into buckets, then a per-key min/max
    aggregate (tiny: key-count rows) whose bucket range is expanded with
    ``sequence``/``explode`` — the dense axis is generated from the
    SMALL aggregated side, never by scanning raw rows — and left-joined
    back. ``fill`` maps output columns to constants for empty buckets
    (default: NULL, the gap marker).

    agg_exprs: output name -> aggregate Column; default counts rows as
    ``n``. Buckets are ``date_trunc`` epochs of width ``bucket``
    (calendar-stable: '1 hour'/'1 day'/'1 week').
    """
    unit = bucket.strip().split()[-1].rstrip("s")  # '1 hour' -> 'hour'
    if bucket.strip().split()[0] != "1":
        raise ValueError("only unit-width buckets supported ('1 hour', '1 day', ...)")
    aggs = agg_exprs if agg_exprs is not None else {"n": F.count("*")}
    b = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    per_bucket = df.groupBy(*key_cols, b).agg(
        *[e.alias(name) for name, e in aggs.items()]
    )
    spans = per_bucket.groupBy(*key_cols).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    axis = spans.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {bucket}"))
        ).alias("bucket"),
    )
    out = axis.join(per_bucket, [*key_cols, "bucket"], "left")
    if fill:
        out = out.select(
            *key_cols,
            "bucket",
            *[
                F.coalesce(F.col(name), F.lit(fill[name])).alias(name)
                if name in fill
                else F.col(name)
                for name in aggs
            ],
        )
    return out


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_hours: int | None = None,
) -> DataFrame:
    """Ordered funnel analysis: per user, the earliest chain of
    ``steps`` events with strictly increasing timestamps, plus a
    ``completed`` flag (all steps present, and — when ``within_hours``
    is set — last minus first inside the window).

    Earliest-chain semantics: step i's timestamp is the minimum ts of a
    ``steps[i]`` event after step i−1's timestamp. This equals a greedy
    left-to-right scan, so the whole funnel is ONE pass per user: sort
    the user's events once, fold them through a k-slot state. One
    shuffle by user (partial collect_list map-side), no joins, no
    window — the plan that holds when users × events is 100 TB but each
    user's history fits a task (the same per-key contract as
    sessionization). Equivalent nested-min SQL is what the oracle runs.

    Output: (user, step_1_ts .. step_k_ts, completed).
    """
    k = len(steps)
    if k < 1:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__et"),
    ).filter(F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull())
    sorted_evs = F.sort_array(
        F.collect_list(F.struct(F.col("__ts").alias("t"), F.col("__et").alias("e")))
    )
    zero = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    def step_fold(st: Column, ev_: Column) -> Column:
        # fill the first empty slot whose step type matches and whose
        # predecessor slot is already filled (first match wins). The
        # slot write is concat(prefix, [t], suffix) — NOT a nested
        # transform lambda, which cannot reference the outer fold
        # variables reliably
        upd = None
        for i in reversed(range(k)):
            fillable = (
                F.element_at(st, i + 1).isNull()
                & (ev_["e"] == F.lit(steps[i]))
                & (
                    F.lit(i == 0)
                    # strictly after the previous step (ties never chain
                    # — identical to the oracle's nested ts > prev mins,
                    # independent of how sort_array breaks ts ties)
                    | (ev_["t"] > F.element_at(st, i))
                )
            )
            slot_set = F.concat(
                F.slice(st, 1, i),
                F.array(ev_["t"]),
                F.slice(st, i + 2, k - i - 1),
            )
            upd = F.when(fillable, slot_set) if upd is None else F.when(
                fillable, slot_set
            ).otherwise(upd)
        return F.coalesce(upd, st)

    folded = F.aggregate(sorted_evs, zero, step_fold)
    agg = ev.groupBy(F.col("__u").alias(user_col)).agg(folded.alias("__slots"))
    cols = [
        F.element_at("__slots", i + 1).alias(f"step_{i + 1}_ts") for i in range(k)
    ]
    done = F.element_at("__slots", k).isNotNull()
    if within_hours is not None:
        done = done & (
            F.element_at("__slots", k).cast("long")
            - F.element_at("__slots", 1).cast("long")
            <= within_hours * 3600
        )
    return agg.select(user_col, *cols, done.alias("completed"))


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    bucket: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity bucket,
    counted in every later bucket they return in.

    One pass: per user, (first bucket, distinct activity buckets) —
    single shuffle by user with map-side partial collect_set over the
    (bounded) bucket domain — then explode to (cohort, offset) and a
    second small aggregate. Output: (cohort, offset, n_users) where
    offset counts buckets since the cohort's start (0 = the cohort
    bucket itself, so offset 0 row = cohort size).
    """
    days_per = {"day": 1, "week": 7}
    if bucket not in days_per:
        raise ValueError("bucket must be 'day' or 'week'")
    per_user = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            F.date_trunc(bucket, F.col(ts_col)).alias("__b"),
        )
        .groupBy("__u")
        .agg(
            F.min("__b").alias("__first"),
            F.collect_set("__b").alias("__active"),
        )
    )
    # CALENDAR day difference, not epoch seconds: bucket starts are
    # local-time truncations, so a DST transition makes their epoch gap
    # a non-multiple of 86400 and integer-truncated division would shift
    # users into the wrong retention cell; datediff on dates is
    # DST-immune (bucket starts are exact multiples of 1/7 days apart)
    offset = (
        F.datediff(F.to_date("__a"), F.to_date("__first")) / days_per[bucket]
    ).cast("long")
    return (
        per_user.select("__u", "__first", F.explode("__active").alias("__a"))
        .select(
            F.col("__first").alias("cohort"),
            offset.alias("offset"),
            "__u",
        )
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def mad_anomalies(
    series: DataFrame,
    group_cols: list[str],
    value_col: str,
    k_milli: int = 3500,
) -> DataFrame:
    """Robust time-series anomaly detection: flag points whose deviation
    from their group's MEDIAN exceeds ``k_milli/1000`` times the group's
    MAD (median absolute deviation) — the standard outlier rule that,
    unlike mean/stddev z-scores, is not dragged by the outliers it is
    trying to find (breakdown point 50% vs 0%).

    ``series`` is an already-aggregated metric relation (e.g. per-day
    event counts): one row per point, integral ``value_col``. The input
    to this operator is SMALL by construction — the heavy reduction
    (raw rows → series) happens upstream in a partial-aggregated
    groupBy; the two window passes here run per group in parallel, never
    a global single partition.

    Exactness: medians use the deterministic nearest-lower rank
    floor(0.5·(n−1)) of the ascending order (the skew_report quantile
    rule) and the flag is the integer comparison
    1000·|x − med| > k_milli·MAD, so every output column is
    engine-exact. With MAD = 0 (over half the points identical) any
    deviation flags, matching the rule's convention.

    Output: every input column + (med, mad, is_anomaly); rows with NULL
    ``value_col`` are dropped (no deviation information).
    """
    if k_milli < 0:
        raise ValueError("k_milli must be >= 0")
    from pyspark.sql import Window

    keep = list(series.columns)
    # NULL values carry no deviation information and would otherwise sort
    # first, occupying the low ranks and corrupting the group's median
    # (the percentile_band_filter convention: drop them)
    base = series.filter(F.col(value_col).isNotNull()).select(
        *keep, F.col(value_col).cast("long").alias("__x")
    )

    def med_of(df: DataFrame, col: str, out: str) -> DataFrame:
        """Attach each group's deterministic median of ``col`` as ``out``."""
        w = Window.partitionBy(*group_cols).orderBy(F.col(col).asc())
        wn = Window.partitionBy(*group_cols)
        ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__n", F.count(F.lit(1)).over(wn)
        )
        pick = ranked.filter(
            F.col("__rn") == F.floor(F.lit(0.5) * (F.col("__n") - 1)).cast("long") + 1
        ).select(*group_cols, F.col(col).alias(out))
        if not group_cols:
            return df.crossJoin(pick)
        from hive_udf_spark.operators.util import null_safe_cond

        return df.join(pick, null_safe_cond(df, pick, group_cols)).select(
            df["*"], pick[out]
        )

    with_med = med_of(base, "__x", "med")
    dev = with_med.withColumn("__d", F.abs(F.col("__x") - F.col("med")))
    with_mad = med_of(dev, "__d", "mad")
    return with_mad.select(
        *keep,
        F.col("med").cast("long").alias("med"),
        F.col("mad").cast("long").alias("mad"),
        (
            F.lit(1000).cast("long") * F.abs(F.col("__x") - F.col("med"))
            > F.lit(int(k_milli)).cast("long") * F.col("mad")
        ).alias("is_anomaly"),
    )


def attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
    lookback_hours: int | None = None,
) -> DataFrame:
    """Conversion attribution: for each conversion event, the FIRST and
    LAST qualifying touch strictly before it (the classic first-touch /
    last-touch marketing models), optionally within a lookback window.
    One row per conversion: (user, conversion ts, first/last touch type
    + ts, n_touches). Conversions with no prior touch keep NULL touch
    columns (they still count — "direct" conversions).

    Plan shape: touches and conversions are two filtered projections of
    ONE scan-shaped source; the match is a single (user)-keyed join
    with a range predicate, then one partial-aggregated min/max_by per
    conversion — no window over raw events, no per-user collect. Skewed
    users bound the join fan-out by their own touch counts (the range
    join contract); at 100 TB add the usual time-bucket banding.
    Determinism: ties on the same timestamp resolve by (ts, type) via
    min/max of a struct, so both engines agree.
    """
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    conv = events.filter(
        (F.col(type_col) == conversion_type)
        & F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
    ).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__cts"),
        F.col(event_id_col).alias("__cid"),
    )
    touch = events.filter(
        F.col(type_col).isin(*touch_types)
        & F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
    ).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__tts"),
        F.col(type_col).alias("__tty"),
    )
    cond = F.col("__tts") < F.col("__cts")
    if lookback_hours is not None:
        cond = cond & (
            F.col("__tts") >= F.col("__cts") - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
        )
    qual = conv.join(touch, "__u").filter(cond)
    agg = qual.groupBy("__u", "__cid", "__cts").agg(
        F.min(F.struct("__tts", "__tty")).alias("__first"),
        F.max(F.struct("__tts", "__tty")).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("__nt"),
    )
    # conversions with zero qualifying touches survive via the left
    # join back onto the conversion stream ("direct" conversions)
    agg = conv.join(agg, ["__u", "__cid", "__cts"], "left").select(
        "__u",
        "__cid",
        "__cts",
        "__first",
        "__last",
        F.coalesce("__nt", F.lit(0)).cast("long").alias("n_touches"),
    )
    return agg.select(
        F.col("__u").alias(user_col),
        F.col("__cid").alias("conversion_id"),
        F.col("__cts").alias("conversion_ts"),
        F.col("__first.__tty").alias("first_touch_type"),
        F.col("__first.__tts").alias("first_touch_ts"),
        F.col("__last.__tty").alias("last_touch_type"),
        F.col("__last.__tts").alias("last_touch_ts"),
        "n_touches",
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Per-user event-type transition counts and probabilities — the
    first-order Markov behavioral model over the event stream:
    (from_type, to_type, n_transitions, p_milli) with p_milli =
    (n·1000) div n_from, integer-exact. Adjacent pairs are formed
    per user in timestamp order (ties broken by event id, so the
    sequence — and therefore every count — is deterministic).

    Plan shape: ONE sorted fold per user (collect the (ts, id, type)
    structs, sort, pairwise zip — the funnel_steps discipline: a single
    shuffle keyed by user, state bounded by per-user event counts),
    then a partial-aggregated global pair count. No window over the
    raw stream.
    """
    # NULL event types are not states: they are excluded up front so the
    # matrix covers exactly the typed transitions (a NULL from_type would
    # otherwise be counted into totals yet silently dropped by the
    # equi-join on from_type — asymmetric and wrong)
    seq = (
        events.filter(
            F.col(ts_col).isNotNull()
            & F.col(user_col).isNotNull()
            & F.col(type_col).isNotNull()
        )
        .groupBy(F.col(user_col).alias("__u"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(event_id_col).alias("i"),
                        F.col(type_col).alias("y"),
                    )
                )
            ).alias("__s")
        )
    )
    n = F.size("__s")
    pairs = seq.select(
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice("__s", 1, n - 1),
                    F.expr("slice(__s, 2, size(__s) - 1)"),
                    lambda a, b: F.struct(a["y"].alias("a"), b["y"].alias("b")),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("__p")
    ).select(F.col("__p.a").alias("from_type"), F.col("__p.b").alias("to_type"))
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions")
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("__nf")
    )
    return counts.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr("(n_transitions * 1000) div __nf").cast("long").alias("p_milli"),
    )


def ewma_smooth(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    alpha_shift: int = 3,
    scale: int = 1000,
) -> DataFrame:
    """Per-key exponentially-weighted moving average in exact integer
    space: values quantize to round(v·scale), the fold is
    ``s ← s + floor((q − s) / 2^alpha_shift)`` seeded with the first
    quantized value in deterministic (ts, order) order — one sorted fold
    per key (the funnel/transition-matrix discipline), engine-exact
    because quantization, the power-of-two division, and floor are all
    reproducible (α = 1/2^shift keeps the decay a dyadic operation).

    Output: (key, n_events, ewma_milli) — the final smoothed level per
    key, the classic anomaly/trend baseline.

    At 100 TB: one partial-aggregated groupBy; per-key state is the
    value sequence (bounded by events-per-key, the same contract as the
    funnel fold), and the fold itself is a codegen'd JVM ``aggregate``
    lambda — no Python, no window over raw events, no extra shuffle.
    """
    denom = float(1 << alpha_shift)
    q = F.round(F.col(value_col) * scale).cast("long")
    seq = events.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(ts_col), F.col(order_col), q.alias("q")))
        ).alias("__seq")
    )
    fold = F.expr(
        "aggregate(slice(__seq, 2, size(__seq) - 1), "
        "CAST(element_at(__seq, 1).q AS BIGINT), "
        f"(acc, x) -> acc + CAST(floor((x.q - acc) / {denom}) AS BIGINT))"
    )
    return seq.select(
        key_col,
        F.size("__seq").cast("long").alias("n_events"),
        fold.alias("ewma_milli"),
    )
