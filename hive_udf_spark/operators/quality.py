"""Relational data-quality checks (the dbt-tests / Deequ shape).

Constraint violations as QUERIES, each one aggregate over the checked
relation — the audit layer a 100 TB ingest runs before promoting a
snapshot: uniqueness of claimed keys, referential integrity of foreign
keys, functional dependencies between columns. Composable: every check
returns a uniform (check, n_violations, n_checked) row so a suite can
union them into one report relation (and a scheduler can alert on
n_violations > 0).

Plan shapes: uniqueness = one partial-aggregated count per key;
referential = one anti-join probing the parent's key set (broadcast
when small, AQE decides); functional dependency = one two-level
aggregate over the determinant (distinct dependent counts). Nothing
row-at-a-time, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "uniqueness_violations",
    "referential_violations",
    "fd_violations",
    "quality_report",
]


def uniqueness_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key values appearing more than once: key_cols + (n_rows).
    NULL keys group together (a NULL-keyed duplicate is still a
    duplicate claim on a unique key)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, fk_map: dict[str, str]
) -> DataFrame:
    """Child rows whose foreign key has no parent: the child's fk
    columns + (n_rows), one row per orphaned key value. NULL foreign
    keys are exempt (SQL FK semantics: NULL means 'no reference')."""
    if not fk_map:
        raise ValueError("fk_map must be non-empty")
    fk_cols = list(fk_map)
    c = child.select(*fk_cols)
    for col in fk_cols:
        c = c.filter(F.col(col).isNotNull())
    p = parent.select(
        *[F.col(pcol).alias(ccol) for ccol, pcol in fk_map.items()]
    ).distinct()
    return (
        c.join(p, fk_cols, "left_anti")
        .groupBy(*fk_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


def fd_violations(
    df: DataFrame, determinant_cols: list[str], dependent_cols: list[str]
) -> DataFrame:
    """Functional-dependency check (determinant → dependent): the
    determinant values mapping to MORE THAN ONE distinct dependent
    tuple — determinant_cols + (n_variants). The schema-discovery /
    denormalization-integrity test ("order key determines order date",
    "zip determines state")."""
    if not determinant_cols or not dependent_cols:
        raise ValueError("determinant and dependent cols must be non-empty")
    dep = F.struct(*[F.col(c) for c in dependent_cols])
    return (
        df.groupBy(*determinant_cols)
        .agg(F.count_distinct(dep).cast("long").alias("n_variants"))
        .filter(F.col("n_variants") > 1)
    )


def quality_report(checks: dict[str, tuple[DataFrame, DataFrame]]) -> DataFrame:
    """Union per-check summaries into one report: (check, n_violations,
    n_checked). ``checks`` maps a check name to (violations_df,
    checked_df) — violations are counted as rows of the first frame,
    the denominator as rows of the second."""
    if not checks:
        raise ValueError("checks must be non-empty")
    parts = []
    for name, (viol, checked) in checks.items():
        parts.append(
            viol.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .crossJoin(
                checked.agg(F.count(F.lit(1)).cast("long").alias("n_checked"))
            )
            .select(F.lit(name).alias("check"), "n_violations", "n_checked")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
