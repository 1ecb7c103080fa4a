"""Slowly-changing-dimension maintenance (SCD type 2).

The classic warehouse history pattern the host engine of the reference
(Hive) is routinely used for: a dimension table keeps EVERY historical
version of a key's attributes as a separate row with a validity
interval — (key..., attrs..., valid_from, valid_to), ``valid_to`` NULL
marking the current row. Applying a change batch closes the current row
of every key whose attributes actually changed and opens a new current
row; unchanged keys are untouched; unseen keys insert directly.

Everything is keyed joins and null-safe column comparison (the
snapshot_diff discipline), so the resulting table is engine-exact and
the registry oracle rebuilds it from scratch in SQL. At deployment
scale this is a transactional-format MERGE; composing with
``sources.sinks.atomic_swap_parquet`` gives the same update contract
dependency-free (the expire_rows/forget_rows pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply", "point_in_time_join"]


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str = "effective_ts",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Apply one change batch to an SCD2 dimension; returns the new
    dimension (same schema as ``dim``).

    Semantics per change row (one row per key — duplicates within a
    batch are the caller's bug, like snapshot_diff's duplicate-key
    contract):

    * key exists, attributes differ (null-safely) → the current row
      closes at the change's effective timestamp and a new current row
      opens there;
    * key exists, attributes equal → no-op (no empty-interval rows);
    * key absent → new current row opens at the effective timestamp.

    History rows (``valid_to`` NOT NULL) pass through untouched — the
    batch only ever touches current rows, so the operator's cost is
    O(|current| + |batch|) regardless of history depth; partition the
    stored table on ``valid_to IS NULL`` and the rewrite prunes to the
    current partition.
    """
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    dim_cols = [*key_cols, *attr_cols, valid_from_col, valid_to_col]
    history = dim.filter(F.col(valid_to_col).isNotNull()).select(*dim_cols)
    current = dim.filter(F.col(valid_to_col).isNull()).select(*dim_cols)
    ch = changes.select(
        *key_cols,
        *[F.col(c).alias(f"__c_{c}") for c in attr_cols],
        F.col(effective_col).alias("__eff"),
    )
    j = current.join(ch, key_cols, "full_outer")

    def _same() -> Column:
        same = F.lit(True)
        for c in attr_cols:
            same = same & F.col(c).eqNullSafe(F.col(f"__c_{c}"))
        return same

    in_dim = F.col(valid_from_col).isNotNull()
    in_batch = F.col("__eff").isNotNull()
    # current rows: untouched (no change row, or attrs equal) keep their
    # open interval; changed ones close at the effective timestamp
    kept = j.filter(in_dim & (~in_batch | _same())).select(*dim_cols)
    closed = (
        j.filter(in_dim & in_batch & ~_same())
        .select(
            *key_cols,
            *attr_cols,
            F.col(valid_from_col),
            F.col("__eff").alias(valid_to_col),
        )
    )
    opened = (
        j.filter(in_batch & (~in_dim | ~_same()))
        .select(
            *key_cols,
            *[F.col(f"__c_{c}").alias(c) for c in attr_cols],
            F.col("__eff").alias(valid_from_col),
            F.lit(None).cast(dim.schema[valid_to_col].dataType).alias(valid_to_col),
        )
    )
    return history.unionByName(kept).unionByName(closed).unionByName(opened)


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """AS-OF lookup against an SCD2 dimension: each fact row joins the
    dimension version valid at its own timestamp —
    ``valid_from ≤ ts < valid_to`` (open current rows match everything
    from their valid_from on). The consumer side of :func:`scd2_apply`:
    facts replayed against history resolve to the attributes that were
    true WHEN THE FACT HAPPENED, not today's.

    SCD2 intervals for one key never overlap (the scd2_apply
    invariant), so each fact matches at most one version and the join
    cannot fan out. Plan shape: one equi-join on the key columns with
    the interval predicate as a join condition — Spark's range-join
    shape; the key equality keeps the shuffle keyed and AQE-skew-
    splittable (the interval_join discipline; band by time at 100 TB
    if a single key's fact volume dominates).

    Output: every fact column + the dimension's attribute columns
    (key/validity columns not duplicated). ``how='left'`` keeps facts
    predating any version (NULL attributes); 'inner' drops them.
    """
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    attr_cols = [
        c
        for c in dim.columns
        if c not in set(key_cols) | {valid_from_col, valid_to_col}
    ]
    d = dim.select(
        *[F.col(c).alias(f"__k_{c}") for c in key_cols],
        *attr_cols,
        F.col(valid_from_col).alias("__vf"),
        F.col(valid_to_col).alias("__vt"),
    )
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__k_{c}"))
    cond = (
        cond
        & (F.col(ts_col) >= F.col("__vf"))
        & (F.col("__vt").isNull() | (F.col(ts_col) < F.col("__vt")))
    )
    joined = facts.join(d, cond, how)
    return joined.select(*facts.columns, *attr_cols)
