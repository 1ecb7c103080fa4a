"""Small shared DataFrame utilities for the operator modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def null_safe_cond(left: DataFrame, right: DataFrame, cols: list[str]) -> Column:
    """Null-SAFE multi-column equi-join condition: a NULL key value is a
    real group (groupBy/window partitions keep it) and a plain name join
    would silently drop it — the leakage_safe_split / skew_report class
    of bug. Shared by every operator that joins per-group summaries back
    onto their rows (qsketch bounded mode, mad_anomalies,
    percentile_band_filter)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    cond = None
    for g in cols:
        c = left[g].eqNullSafe(right[g])
        cond = c if cond is None else cond & c
    return cond
