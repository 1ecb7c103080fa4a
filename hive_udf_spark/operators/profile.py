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
