"""Skew-handling join utilities.

AQE's skew-join splitting (on in our session) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the static
complement for the pathological case AQE can't fix: a SINGLE join key so
hot that one task would still process it alone (LSH band keys over
boilerplate corpora, null-heavy foreign keys, celebrity users).

``salted_join``: the large (skewed) side gets a deterministic salt in
[0, salt_factor) derived from a unique column; the small side is
replicated salt_factor times with every salt value. The join key becomes
(key, salt), spreading each hot key over salt_factor tasks. Replication
multiplies the small side's shuffle volume by salt_factor — use for
many-to-one joins where the right side is modest (dimensions, lookup
tables) but too big or too hot to broadcast outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "skew_report"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    big_unique_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salt-spread keys.

    ``big_unique_col``: a column of ``big`` whose values distribute
    uniformly (an id); the salt is pmod(xxhash64(id), salt_factor) —
    deterministic, so retries/speculative tasks stay consistent (never
    use rand() for salt). Defaults to the join key itself ONLY when no id
    exists; that spreads *distinct* keys but not a single hot key, so pass
    a real unique column for hot-key skew.

    Result equals ``big.join(small, on, how)`` exactly (verified in
    tests/test_skew.py); only the physical key distribution changes.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_src = F.col(big_unique_col) if big_unique_col else F.col(on)
    b = big.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_factor)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 10,
    max_salt: int = 64,
) -> DataFrame:
    """Join/aggregation-key skew diagnostics: the numbers that decide
    whether a key needs ``salted_join`` before the job runs at 100 TB.

    One partial-aggregated pass builds the per-key count relation (#keys
    rows — far smaller than the data); everything after runs on it: the
    top-k heaviest keys (count desc, key asc — deterministic), exact
    count quantiles at the fixed index floor(q·(n_keys−1)) of the
    ascending count order, and a recommended salt factor =
    ceil(max_count / floor-average), capped at ``max_salt`` — "how many
    times hotter than average is the hottest key", the fan-out
    ``salted_join``'s salt parameter should absorb. All integer math,
    so the whole report is oracle-exact.

    Output: one row per top key (rank, key, cnt) with the summary
    columns (n_rows, n_keys, p50_count, p99_count, max_count,
    recommended_salt) repeated on each row.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    from pyspark.sql import Window

    # Group on the RAW columns, not a rendered string: concat_ws folds
    # NULL into '' — merging ('a', NULL) with ('a', '') and hiding the
    # null-heavy key that is the classic skew culprit this report exists
    # to expose. groupBy treats NULL as its own key natively; the display
    # string is rendered only afterwards (NULL shown as ∅).
    raw = [f"__k{i}" for i in range(len(key_cols))]
    key = F.concat_ws(
        "|", *[F.coalesce(F.col(r).cast("string"), F.lit("∅")) for r in raw]
    )
    counts = (
        df.select(*[F.col(c).alias(r) for c, r in zip(key_cols, raw)])
        .groupBy(*raw)
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(key.alias("key"), "cnt")
    )
    summary = counts.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_count"),
    )
    # Exact deterministic quantile WITHOUT a global row_number over the
    # key relation (a single-partition window; keys can be billions):
    # the selected value is the smallest count c whose cumulative key
    # count reaches 1-based index floor(q*(n_keys-1)) + 1 — and ties in
    # the ascending (cnt, key) order all carry the same cnt, so the
    # key tiebreak cannot change the selected VALUE. The cumsum runs
    # over DISTINCT count values (a tiny relation: distinct counts <<
    # keys), which a window can hold.
    cc = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("__k"))
    w_cc = Window.orderBy(F.col("cnt").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cc.withColumn("__cum", F.sum("__k").over(w_cc))

    def _q_at(q: float):
        # explicit floor: Spark's double->bigint cast truncates but
        # DuckDB's CAST rounds, so the raw cast diverges at *.5
        idx = F.floor(F.lit(q) * (F.col("n_keys") - 1)).cast("bigint") + 1
        return F.min(F.when(F.col("__cum") >= idx, F.col("cnt"))).cast("bigint")

    quant = (
        cum.withColumn("__j", F.lit(1))
        .join(F.broadcast(summary.withColumn("__j", F.lit(1))), "__j")
        .agg(_q_at(0.5).alias("p50_count"), _q_at(0.99).alias("p99_count"))
    )
    # top-k via TakeOrdered (per-partition partial top-k), then rank the
    # <= top_k survivors on one tiny partition
    order = [F.col("cnt").desc(), F.col("key").asc()]
    top = (
        counts.orderBy(*order)
        .limit(top_k)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    )
    # integer div (not double-divide-then-truncate): exact at any scale
    salt = F.least(
        F.lit(max_salt).cast("bigint"),
        F.expr(f"(max_count + greatest(n_rows div n_keys, 1) - 1) div greatest(n_rows div n_keys, 1)"),
    )
    return (
        top.withColumn("__j", F.lit(1))
        .join(F.broadcast(summary.withColumn("__j", F.lit(1))), "__j")
        .join(F.broadcast(quant.withColumn("__j", F.lit(1))), "__j")
        .select(
            "rank",
            "key",
            "cnt",
            "n_rows",
            "n_keys",
            "p50_count",
            "p99_count",
            "max_count",
            salt.alias("recommended_salt"),
        )
    )
