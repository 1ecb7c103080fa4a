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

    The dimension must carry EXACTLY key + attr + validity columns
    (extra columns raise rather than silently vanish from the rebuilt
    table); change rows with a NULL effective timestamp raise too — an
    unplaceable change must not be silently dropped.
    """
    if not key_cols or not attr_cols:
        raise ValueError("key_cols and attr_cols must be non-empty")
    dim_cols = [*key_cols, *attr_cols, valid_from_col, valid_to_col]
    extra = [c for c in dim.columns if c not in set(dim_cols)]
    if extra:
        raise ValueError(
            f"dim carries columns {extra} outside key/attr/validity — "
            "they would be silently dropped; project them away or add "
            "them to attr_cols"
        )
    history = dim.filter(F.col(valid_to_col).isNotNull()).select(*dim_cols)
    current = dim.filter(F.col(valid_to_col).isNull()).select(
        *dim_cols
    ).withColumn("__in_dim", F.lit(1))
    ch = changes.select(
        *key_cols,
        *[F.col(c).alias(f"__c_{c}") for c in attr_cols],
        F.col(effective_col).alias("__eff"),
    ).withColumn("__in_batch", F.lit(1))
    j = current.join(ch, key_cols, "full_outer")

    def _same() -> Column:
        same = F.lit(True)
        for c in attr_cols:
            same = same & F.col(c).eqNullSafe(F.col(f"__c_{c}"))
        return same

    # presence via dedicated markers, NOT data-column nullability — the
    # snapshot_diff lesson: a NULL valid_from or effective_ts must not
    # make a row vanish from every branch
    in_dim = F.col("__in_dim").isNotNull()
    in_batch = F.col("__in_batch").isNotNull()
    # current rows: untouched (no change row, or attrs equal) keep their
    # open interval; changed ones close at the effective timestamp
    kept = j.filter(in_dim & (~in_batch | _same())).select(*dim_cols)
    closed = (
        j.filter(in_dim & in_batch & ~_same())
        .select(
            *key_cols,
            *attr_cols,
            F.col(valid_from_col),
            # an out-of-order change (effective before the current row
            # opened) would close the row with valid_to < valid_from AND
            # open a new current row overlapping older history — breaking
            # point_in_time_join's at-most-one-match invariant. Fail
            # loudly instead (mirroring the NULL-effective-ts raise).
            F.when(
                F.col(valid_from_col).isNull()
                | (F.col("__eff") >= F.col(valid_from_col)),
                F.col("__eff"),
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "scd2_apply: effective timestamp precedes the "
                        "current row's valid_from (out-of-order change "
                        "batch) — apply batches in effective-time order"
                    )
                )
            ).alias(valid_to_col),
        )
    )
    opened = (
        j.filter(in_batch & (~in_dim | ~_same()))
        .select(
            *key_cols,
            *[F.col(f"__c_{c}").alias(c) for c in attr_cols],
            # NULL effective timestamps fail loudly instead of opening
            # an unanchored interval (assert_true evaluates per row)
            F.when(
                F.col("__eff").isNotNull(), F.col("__eff")
            ).otherwise(
                F.raise_error(F.lit("scd2_apply: NULL effective timestamp"))
            ).alias(valid_from_col),
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
    (key/validity columns not duplicated). A dim attribute sharing a
    name with a fact column comes back with an ``_r`` suffix (the
    asof_join rename discipline) instead of raising an
    ambiguous-reference error. ``how='left'`` keeps facts predating any
    version (NULL attributes); 'inner' drops them.
    """
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    attr_cols = [
        c
        for c in dim.columns
        if c not in set(key_cols) | {valid_from_col, valid_to_col}
    ]
    # avoid collisions: dim attributes that clash with a fact column get
    # an _r suffix (temporal.asof_join:68's rename pattern)
    rename = {c: (c + "_r" if c in facts.columns else c) for c in attr_cols}
    attr_cols = [rename[c] for c in attr_cols]
    d = dim.select(
        *[F.col(c).alias(f"__k_{c}") for c in key_cols],
        *[F.col(c).alias(out) for c, out in rename.items()],
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
