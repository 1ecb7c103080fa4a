"""Single-pass table profiler: per-column statistics with sketches.

The operational face of the sketch theme: the statistics a 100 TB
ingest needs before anything else runs (row counts, null shares, typed
bounds, distinct-count estimates) computed in ONE wide aggregate pass —
never a scan per column — then unpivoted to one row per column.

Distinct counts use the native HLL aggregate (Tier A), so every
column's estimator state lives in the same partial-aggregated pass as
the min/max/null counters; the registry query checks each estimate
against the exact count with the §5.2 verdict pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame, cols: list[str] | None = None, rsd: float = 0.01
) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct_est,
    min_value, max_value) — min/max computed on the TYPED column, then
    cast to string for the uniform schema (so numeric bounds are
    numeric, not lexicographic). One aggregate over one scan for the
    whole profile."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{i}"),
            F.approx_count_distinct(c, rsd).alias(f"__nd_{i}"),
            F.min(c).cast("string").alias(f"__mn_{i}"),
            F.max(c).cast("string").alias(f"__mx_{i}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}" for i, c in enumerate(cols)
    )
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column, n_non_null, n_distinct_est, min_value, max_value)"
        ),
    ).select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_rows") - F.col("n_non_null")).cast("long").alias("n_null"),
        F.col("n_distinct_est").cast("long").alias("n_distinct_est"),
        "min_value",
        "max_value",
    )


def ranked_distinct(
    df: DataFrame,
    value_col: str,
    num_shards: int = 32,
) -> DataFrame:
    """Distributed global rank of every DISTINCT value: ``(__v, __k,
    __lo, __n)`` where ``__k`` is the value's row count, ``__lo`` the
    exact count of rows strictly below it, and ``__n`` the total — the
    shared backbone of :func:`equi_depth_histogram` and
    :func:`exact_quantiles`.

    Plan (distributed prefix sum — the ``pack_documents`` splice,
    operators/chunking.py): rows never sort globally and NO
    single-partition window appears anywhere, so it survives columns
    where distinct ≈ rows:

    1. partial-aggregated ``(value, count)`` relation (map-side combine);
    2. value-RANGE shards from in-plan ``approx_percentile`` boundaries
       over the distinct values (broadcast 1-row relation — shard id is
       a monotone function of value, so ``(shard asc, value asc)`` IS
       global value order; no driver collect);
    3. per-shard cumulative sum (partitioned window, each shard local);
    4. per-shard totals prefix-summed via a triangular broadcast join
       over ≤ ``num_shards`` tiny rows, broadcast back as base offsets;
    5. global ``__lo(v) = base(shard) + local_cum - k`` — exact
       integers, bit-identical to the serial cumsum regardless of where
       the (approximate) shard boundaries fall.

    NULLs are excluded (no order position).
    """
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    from pyspark.sql import Window

    v = F.col(value_col)
    vc = (
        df.filter(v.isNotNull())
        .groupBy(v.alias("__v"))
        .agg(F.count(F.lit(1)).cast("long").alias("__k"))
    )
    # Range-shard boundaries over the DISTINCT values (unweighted: the
    # relation being prefix-summed is the distinct relation). Boundary
    # quality only affects balance, never the result.
    pcts = ", ".join(f"{i}D / {num_shards}D" for i in range(1, num_shards))
    bnds = vc.agg(
        F.expr(f"approx_percentile(__v, array({pcts}))").alias("__bnds")
    )
    sharded = (
        vc.join(F.broadcast(bnds))
        .withColumn(
            "__shard",
            F.expr("size(filter(__bnds, b -> b < __v))").cast("int"),
        )
        .drop("__bnds")
    )
    wloc = (
        Window.partitionBy("__shard")
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sharded.withColumn("__cum", F.sum("__k").over(wloc))
    shard_tot = sharded.groupBy("__shard").agg(F.sum("__k").alias("__tot"))
    earlier = shard_tot.select(
        F.col("__shard").alias("__s2"), F.col("__tot").alias("__tot2")
    )
    # Triangular broadcast join instead of a no-partition window: base
    # offset of shard s = sum of totals of shards < s.
    shard_base = (
        shard_tot.join(F.broadcast(earlier), F.col("__s2") < F.col("__shard"), "left")
        .groupBy("__shard")
        .agg(F.coalesce(F.sum("__tot2"), F.lit(0)).cast("long").alias("__base"))
    )
    total = shard_tot.agg(F.sum("__tot").cast("long").alias("__n"))
    return (
        local.join(F.broadcast(shard_base), "__shard")
        .join(F.broadcast(total))
        .select(
            "__v",
            "__k",
            (F.col("__base") + F.col("__cum") - F.col("__k")).alias("__lo"),
            "__n",
        )
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    ps: list[float],
    num_shards: int = 32,
) -> DataFrame:
    """EXACT interpolated quantiles (type 7, the shared Spark
    ``percentile`` / DuckDB ``quantile_cont`` definition) without the
    built-in's scale trap: Spark's exact ``percentile`` merges a
    counts-map of EVERY distinct value on one node — a single-node sort
    in disguise when distinct ≈ rows.  Here the rank of each distinct
    value comes from :func:`ranked_distinct` (distributed prefix sum),
    and each requested p picks its two bracketing values by rank
    containment against the tiny broadcast p-relation:
    pos = (n−1)·p, j = floor(pos), result = v_j + (pos−j)·(v_{j+1}−v_j).

    Returns one row per p: ``(p, quantile)``, in double precision —
    identical bits to the built-ins (same formula, same doubles).
    """
    if not ps:
        raise ValueError("ps must be non-empty")
    if any(p < 0.0 or p > 1.0 for p in ps):
        raise ValueError("quantile fractions must be in [0, 1]")
    spark = df.sparkSession
    cum = ranked_distinct(df, value_col, num_shards)
    pdf = spark.createDataFrame([(float(p),) for p in ps], "p double")
    pos = (F.col("__n") - 1).cast("double") * F.col("p")
    j = F.floor(pos).cast("long")
    hit = cum.join(F.broadcast(pdf)).filter(
        (j >= F.col("__lo")) & (j < F.col("__lo") + F.col("__k"))
        | ((j + 1 >= F.col("__lo")) & (j + 1 < F.col("__lo") + F.col("__k")))
    )
    v = F.col("__v").cast("double")
    agg = hit.groupBy("p").agg(
        F.max(
            F.when((j >= F.col("__lo")) & (j < F.col("__lo") + F.col("__k")), v)
        ).alias("__v1"),
        F.max(
            F.when(
                (j + 1 >= F.col("__lo")) & (j + 1 < F.col("__lo") + F.col("__k")), v
            )
        ).alias("__v2"),
        F.max(pos - j.cast("double")).alias("__frac"),
    )
    # at p = 1.0 (or a one-value column) j+1 has no bracket: v2 := v1
    return agg.select(
        "p",
        (
            F.col("__v1")
            + F.col("__frac")
            * (F.coalesce(F.col("__v2"), F.col("__v1")) - F.col("__v1"))
        ).alias("quantile"),
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 8,
    num_shards: int = 32,
) -> DataFrame:
    """Equi-depth histogram of an integral column — the optimizer
    statistic that joins ``profile_table`` (nulls/min-max/distinct),
    ``skew_report`` (hot keys), and ``cms_join_size_estimate``
    (join cardinality): bins with ~equal ROW counts, so selectivity
    estimates stay accurate under skew where equi-width bins collapse.

    Bin assignment is integer-exact: with n total rows and cum_lo(v) =
    rows strictly below v, every row of value v lands in bin
    ``(cum_lo(v) · bins) div n + 1`` — a value never splits across
    bins (heavy values occupy their own bin rather than lying about
    depth), and both engines reproduce the boundaries bit-for-bit.

    The global rank of each distinct value comes from
    :func:`ranked_distinct` (distributed prefix-sum splice — no global
    sort, no single-partition window, survives distinct ≈ rows columns
    like o_totalprice in cents).

    NULLs are excluded (no order position). Output: (bin, lo_value,
    hi_value, n_rows, n_distinct), bins ascending; at most ``bins``
    rows.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    cum = ranked_distinct(df, value_col, num_shards)
    binned = cum.select(
        (F.expr(f"(__lo * {bins}) div __n") + F.lit(1)).cast("int").alias("bin"),
        "__v",
        "__k",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.min("__v").alias("lo_value"),
            F.max("__v").alias("hi_value"),
            F.sum("__k").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
        )
        .orderBy("bin")
    )


def ks_drift(
    df: DataFrame,
    part_col: str,
    value_col: str,
    denom: int = 1_000_000,
) -> DataFrame:
    """Per-group Kolmogorov–Smirnov drift against the pooled
    distribution: for each ``part_col`` group, the KS statistic between
    the group's empirical CDF of ``value_col`` and the WHOLE table's —
    the "did this source's length/score distribution shift" alarm a
    per-source ingest monitor raises before mixture weights go stale.

    Exact integer formulation (the engine-portability discipline): the
    KS sup is attained at an observed value, so it is evaluated at
    every distinct value v as
    ``|cum_grp(v) * n_all − cum_all(v) * n_grp|`` and reported as
    ``floor(denom * max_diff / (n_grp * n_all))`` — cross-multiplied
    integers, no float ECDFs, so the result hash-matches any engine
    with exact 64-bit arithmetic.  ``ks_at_value`` is the smallest v
    attaining the sup.

    Scale shape: two hash aggregations (per-(group, v) and per-v
    counts), one cross join of |groups| × |distinct v| (both SMALL —
    this operator targets bounded-domain profile columns: lengths,
    scores, bucketed metrics; the distinct-value relation is
    distinct-count-sized, the audited exemption class), one window
    partitioned BY GROUP for the running sums, and one per-group
    arg-max.  The only unpartitioned window runs over the distinct-
    value relation alone (|v| rows), the same shape the skew report
    uses.  Nothing scans the base table twice.
    """
    vals = df.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    per_v = vals.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c_all"))
    per_gv = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(part_col).alias("g"), F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_grp"))
    )
    groups = per_gv.groupBy("g").agg(F.sum("c_grp").alias("n_grp"))
    n_all = per_v.agg(F.sum("c_all").alias("n_all"))

    from pyspark.sql import Window

    w_all = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum_all = per_v.select(
        "v", F.sum("c_all").over(w_all).cast("long").alias("cum_all")
    )
    grid = groups.crossJoin(cum_all)  # |groups| x |distinct v|, both small
    grid = grid.join(
        per_gv, (grid["g"] == per_gv["g"]) & (grid["v"] == per_gv["v"]), "left"
    ).select(grid["g"], grid["n_grp"], grid["v"], "cum_all",
             F.coalesce("c_grp", F.lit(0)).alias("c_grp"))
    w_grp = (
        Window.partitionBy("g").orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf = grid.select(
        "g", "n_grp", "v", "cum_all",
        F.sum("c_grp").over(w_grp).cast("long").alias("cum_grp"),
    ).crossJoin(F.broadcast(n_all))
    diff = ecdf.select(
        "g", "n_grp", "v", "n_all",
        F.abs(
            F.col("cum_grp") * F.col("n_all") - F.col("cum_all") * F.col("n_grp")
        ).alias("d"),
    )
    w_pick = Window.partitionBy("g").orderBy(F.col("d").desc(), F.col("v").asc())
    return (
        diff.withColumn("rn", F.row_number().over(w_pick))
        .where(F.col("rn") == 1)
        .select(
            F.col("g").alias(part_col),
            F.col("n_grp").cast("long").alias("n_grp"),
            # integer division, not floor(float): exact at every boundary.
            # The cross products (cum*n) fit int64 up to ~3e9 rows per
            # side (1e9-doc corpora clear this); the ×denom step would
            # overflow long at ~1e13, so it widens to DECIMAL(38,0)
            # (HUGEINT in the oracle) — same integer quotient, no bound.
            F.expr(
                f"CAST((CAST(d AS DECIMAL(38,0)) * {denom})"
                f" DIV (CAST(n_grp AS DECIMAL(38,0)) * n_all) AS LONG)"
            ).alias("ks_ppm"),
            F.col("v").alias("ks_at_value"),
        )
    )
