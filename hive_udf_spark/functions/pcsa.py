"""PCSA (Flajolet–Martin 1985) — the fifth mergeable estimator family.

Probabilistic Counting with Stochastic Averaging is the ORIGINAL
cardinality sketch — the direct ancestor of the reference's two
algorithms (HyperLogLog cites it as its basis; stream-lib, the library
the reference shades, ships it alongside LC/HLL — the reference's enum
just never exposed it, UDAFCardinalityEstimator.java:71-86). State is m
bitmaps; value x sets bit rho(x) (count of trailing zeros of the
bucket-reduced hash) in bitmap hash(x) mod m. Merge = bitwise OR —
a lossless semilattice like KMV/quantile, so per-day sketches roll up
to identical bits as a direct build.

Relational Tier-B build (the lc_table / kmv_table discipline):

    bucket + rank computed at scan → groupBy(groups, bucket) with
    bit_or — Catalyst's partial aggregate ORs map-side, so the shuffle
    carries ≤ m word rows per (group, map partition), each 8 bytes.

Estimate: R_i = index of each bitmap's lowest UNSET bit,
E = (m/φ)·2^(S/m) with S = ΣR_i and φ = 0.77351. Everything up to S is
integer-exact; the irrational 2^(S/m) is made ENGINE-PORTABLE by
splitting S/m = q + r/m and looking r up in a table of m literal
doubles baked into both the Spark expression and the SQL oracle — the
remaining two multiplications and the floor are IEEE-exact, so the
full estimate hash-matches DuckDB bit-for-bit (the KMV discipline
extended to a transcendental estimator). Standard error ≈ 0.78/√m.
No small-cardinality correction is applied: the classic estimator is
biased HIGH when n ≲ m (empty-ish bitmaps still give E ≈ m/φ — measured
est 83 for n=1 at m=64); use LC in that regime — the same two-algorithm
split the reference encodes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_udf_spark.functions.hashing import (
    PORTABLE_HASH_BITS,
    portable_hash60,
    portable_hash60_sql,
)

__all__ = [
    "pcsa_table",
    "pcsa_merge_table",
    "pcsa_estimate",
    "pcsa_estimate_sql",
    "PCSA_PHI",
]

PCSA_PHI = 0.77351
PCSA_DEFAULT_M = 64


def _rank_bits(m: int) -> int:
    """Rank bits available after bucket reduction of a 60-bit hash —
    the saturation rank for the reduced==0 case (depends on m)."""
    return PORTABLE_HASH_BITS - (m.bit_length() - 1)


def _frac_pow2_literals(m: int) -> list[float]:
    """[2^(r/m) for r in 0..m-1] — identical literal doubles in both
    engines make the transcendental part of the estimate portable."""
    return [float(2.0 ** (r / m)) for r in range(m)]


def _bucket_rank(col: Column, m: int, seed: int) -> tuple[Column, Column]:
    # m is a power of two, so bucket/reduce are exact bit ops (a double
    # division would lose low bits of the 60-bit hash)
    h = portable_hash60(col, seed)
    k = m.bit_length() - 1
    bucket = h.bitwiseAND(F.lit(m - 1))
    reduced = F.shiftright(h, k)
    # rho = trailing zeros of reduced, capped at _rank_bits(m) (the
    # all-zero case); lowest set bit as power of two = reduced & -reduced
    low = reduced.bitwiseAND(-reduced)
    rank = F.when(reduced == 0, F.lit(_rank_bits(m))).otherwise(
        F.bit_count(low - F.lit(1))
    )
    return bucket, rank


def pcsa_table(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    m: int = PCSA_DEFAULT_M,
    seed: int = 7,
) -> DataFrame:
    """Per-group PCSA sketches: group_cols + (bucket, bits) rows — the
    sketch AS a relation (one row per non-empty bitmap), plus the
    estimate via :func:`pcsa_estimate` downstream. NULL inputs are
    skipped (reference :238-240); all-NULL groups produce no rows."""
    if m < 2 or m & (m - 1):
        raise ValueError("m must be a power of two >= 2")
    c = F.col(col)
    bucket, rank = _bucket_rank(c, m, seed)
    base = df.filter(c.isNotNull()).select(
        *group_cols,
        bucket.alias("bucket"),
        rank.cast("int").alias("__rank"),
    ).select(
        *group_cols,
        "bucket",
        # F.shiftleft only takes a literal shift; the SQL form takes exprs
        F.expr("shiftleft(CAST(1 AS BIGINT), __rank)").alias("__bit"),
    )
    return base.groupBy(*group_cols, "bucket").agg(F.bit_or("__bit").alias("bits"))


def pcsa_merge_table(
    df: DataFrame, group_cols: list[str], m: int = PCSA_DEFAULT_M
) -> DataFrame:
    """Re-aggregate sketch relations to coarser groups: bit_or per
    (group, bucket) — the lossless OR-semilattice merge (identical bits
    to a direct build; the :259-265 rollup path). Only sketches built
    with the SAME m may merge (mismatched m buckets values differently;
    the relation carries no m header, so this cannot be detected here —
    the caller's m is validated to keep the contract visible)."""
    if m < 2 or m & (m - 1):
        raise ValueError("m must be a power of two >= 2")
    return df.groupBy(*group_cols, "bucket").agg(F.bit_or("bits").alias("bits"))


def _lowest_unset(bits: Column) -> Column:
    """Index of the lowest 0 bit of a non-negative word (rank capped at
    _rank_bits(m) < 60 by construction, so the +1 never overflows)."""
    t = F.bitwise_not(bits).bitwiseAND(bits + F.lit(1))
    return F.bit_count(t - F.lit(1))


def pcsa_estimate(
    sketch: DataFrame,
    group_cols: list[str],
    m: int = PCSA_DEFAULT_M,
) -> DataFrame:
    """group_cols + (s_sum, est_pcsa) from a sketch relation.

    Empty bitmaps (absent rows) contribute R_i = 0, so S is simply the
    sum over present rows — no densification join needed."""
    tbl = _frac_pow2_literals(m)
    per_group = sketch.groupBy(*group_cols).agg(
        F.sum(_lowest_unset(F.col("bits"))).cast("bigint").alias("s_sum")
    )
    r = F.pmod(F.col("s_sum"), F.lit(m)).cast("int")
    frac = F.element_at(F.array(*[F.lit(v) for v in tbl]), r + 1)
    pow_q = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(s_sum div {m} AS INT))")
    est = F.floor(
        F.lit(float(m) / PCSA_PHI) * pow_q.cast("double") * frac
    ).cast("long")
    return per_group.select(*group_cols, "s_sum", est.alias("est_pcsa"))


def pcsa_estimate_sql(
    table: str, group_expr: str, value_expr: str, m: int, seed: int,
    group_alias: str = "g",
) -> str:
    """DuckDB SQL reproducing pcsa_table + pcsa_estimate bit-for-bit."""
    tbl = ", ".join(repr(v) for v in _frac_pow2_literals(m))
    h = portable_hash60_sql(value_expr, seed)
    return f"""
    WITH pr AS (
      SELECT {group_expr} AS {group_alias},
             ({h}) % {m} AS bucket,
             ({h}) // {m} AS reduced
      FROM {table} WHERE {value_expr} IS NOT NULL
    ),
    bm AS (
      SELECT {group_alias}, bucket,
             bit_or(CASE WHEN reduced = 0 THEN (1::BIGINT << {_rank_bits(m)})
                    ELSE (1::BIGINT << bit_count((reduced & -reduced) - 1)) END) AS bits
      FROM pr GROUP BY 1, 2
    ),
    s AS (
      SELECT {group_alias},
             CAST(sum(bit_count((~bits & (bits + 1)) - 1)) AS BIGINT) AS s_sum
      FROM bm GROUP BY 1
    )
    SELECT {group_alias}, s_sum,
           CAST(floor({float(m) / PCSA_PHI!r}
                * ((1::BIGINT << CAST(s_sum // {m} AS INT))::DOUBLE)
                * ([{tbl}])[CAST(s_sum % {m} AS INT) + 1]) AS BIGINT) AS est_pcsa
    FROM s
    """
