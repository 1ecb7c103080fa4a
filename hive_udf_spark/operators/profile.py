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


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 8,
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

    Plan (the percentile_band_filter discipline): rows never sort — a
    partial-aggregated (value, count) relation is cumsum'd over
    DISTINCT values (a tiny window: distinct values << rows), and bins
    re-aggregate from that reduced relation. For near-continuous
    columns where distinct ≈ rows, pre-quantize (e.g. round to a unit)
    so the distinct relation stays window-sized — the statistic loses
    nothing below bin granularity. NULLs are excluded (no order
    position). Output: (bin, lo_value, hi_value, n_rows, n_distinct),
    bins ascending; at most ``bins`` rows.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    from pyspark.sql import Window

    v = F.col(value_col)
    vc = (
        df.filter(v.isNotNull())
        .groupBy(v.alias("__v"))
        .agg(F.count(F.lit(1)).cast("long").alias("__k"))
    )
    w = Window.orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vc.select(
        "__v",
        "__k",
        (F.sum("__k").over(w) - F.col("__k")).alias("__lo"),
        F.sum("__k").over(Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("__n"),
    )
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
