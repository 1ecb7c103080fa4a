"""Frequency sketches: heavy hitters and Count-Min — the frequency side
of the reference's sketching theme.

The reference's stub scalar UDF names "potential set intersection and
other utils" as intended follow-ups (UDFCardinalityEstimator.java:30);
alongside cardinality (HLL/LC) and quantiles (percentile_approx), the
remaining classic mergeable-summary family is frequency estimation:

* ``approx_top_k_agg`` — Tier A: Spark's native ``approx_top_k``
  aggregate (a TypedImperativeAggregate like ``hll_sketch_agg``):
  Catalyst plans partial→shuffle→final automatically, per-group state is
  bounded by ``max_items_tracked``, and when ``max_items_tracked`` ≥ the
  true distinct count the result is EXACT (that regime is what the
  DuckDB oracle hash-checks; the approximate regime is pytest-bounded).
* ``cms_table`` / ``cms_lookup`` — Tier B: a Count-Min sketch (Cormode &
  Muthukrishnan 2005) built entirely from DataFrame ops. The "sketch" is
  literally a relation: ``depth × width`` counter cells produced by one
  partially-aggregated group-by, so it shuffles at most depth·width rows
  regardless of input size, merges by unioning tables and summing cells
  (the same re-aggregation algebra as the cardinality sketches), and its
  estimates — min over rows of the hashed cell, the standard CMS upper
  bound — are reproducible bit-for-bit by any engine when built with the
  portable hash family (functions.hashing.portable_hash60).

100 TB posture: both paths are one scan + one bounded-size shuffle; no
Python anywhere. CMS lookups are a broadcast-friendly join of the probe
list against the (tiny) counter table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_udf_spark.functions.hashing import fast_hash64, portable_hash60


def approx_top_k_agg(col: Column | str, k: int = 10, max_items_tracked: int = 10000) -> Column:
    """Aggregate: top-k items with approximate counts as
    ``array<struct<item, count>>`` (exact when ``max_items_tracked`` ≥
    distinct count). Native JVM aggregate — use inside ``agg``/window."""
    c = F.col(col) if isinstance(col, str) else col
    return F.call_function("approx_top_k", c, F.lit(int(k)), F.lit(int(max_items_tracked)))


def top_k_exploded(
    df: DataFrame, col: str, k: int, max_items_tracked: int = 10000
) -> DataFrame:
    """(item, cnt, rank) rows for the top-k of ``col`` by count with a
    DETERMINISTIC (count desc, item asc) tie-break: the sketch fetches
    ``max_items_tracked``-bounded candidates, then the single result ARRAY
    is re-sorted with an explicit comparator and posexploded — rank = array
    position. No WindowExec anywhere (the previous formulation ranked via a
    no-partition window: bounded rows, but still a single-partition sort
    stage); everything after the partially-aggregated sketch is expression
    work on one row. For an exact hash-checkable result keep
    ``max_items_tracked`` ≥ distinct count (the registry query does)."""

    def by_cnt_desc_item_asc(l: Column, r: Column) -> Column:  # noqa: E741
        return (
            F.when(l["count"] > r["count"], F.lit(-1))
            .when(l["count"] < r["count"], F.lit(1))
            .when(l["item"] < r["item"], F.lit(-1))
            .when(l["item"] > r["item"], F.lit(1))
            .otherwise(F.lit(0))
        )

    fetched = df.agg(
        approx_top_k_agg(col, k=max_items_tracked, max_items_tracked=max_items_tracked).alias(
            "__tk"
        )
    )
    ranked = fetched.select(
        F.posexplode(F.array_sort("__tk", by_cnt_desc_item_asc)).alias("__pos", "__e")
    ).filter(F.col("__pos") < k)
    return ranked.select(
        F.col("__e.item").alias("item"),
        F.col("__e.count").alias("cnt"),
        (F.col("__pos") + 1).cast("int").alias("rank"),
    )


def cms_table(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """Build a Count-Min sketch as a relation: (d, idx, cnt) with
    ``depth`` hash rows and ``width`` counters per row.

    One pass over the input; the group-by partially aggregates map-side,
    so at most depth·width counter rows cross the shuffle regardless of
    input size. Merge sketches by unioning tables and summing cnt per
    (d, idx); serialize by writing the table. portable=True hashes with
    the md5-derived family so a SQL oracle reproduces every cell.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    c = F.col(col)
    # NULL inputs are skipped (the reference UDAF's iterate null contract,
    # UDAFCardinalityEstimator.java:238-240 — matching hllp_table/kmv_table)
    exploded = df.filter(c.isNotNull()).select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"), c.alias("__x")
    )
    idx = _cms_idx(F.col("__x"), F.col("d"), width, portable)
    return exploded.select("d", idx.alias("idx")).groupBy("d", "idx").agg(
        F.count("*").alias("cnt")
    )


# pairwise-independent row family: (h0 + d·h1) mod width, with both hashes
# first reduced mod 2^31 so d·h1 cannot overflow a signed 64-bit under
# ANSI arithmetic (full-range xxhash64 · depth would)
_CMS_HASH_MOD = 1 << 31


def _cms_idx(x: Column, d: Column, width: int, portable: bool) -> Column:
    h = portable_hash60 if portable else fast_hash64
    h0 = F.pmod(h(x, 0), F.lit(_CMS_HASH_MOD))
    h1 = F.pmod(h(x, 1), F.lit(_CMS_HASH_MOD))
    return F.pmod(h0 + d * h1, F.lit(width))


def cms_lookup(
    cms: DataFrame,
    probes: DataFrame,
    probe_col: str,
    depth: int = 4,
    width: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """Estimate each probe item's frequency from a ``cms_table`` result:
    est = min over d of the item's counter (0 if the cell is empty) —
    the classic CMS point query; an upper bound on the true count, exact
    when no hash collisions land in the item's cells.

    The probe side explodes to depth rows and LEFT-joins the counter
    table (tiny — broadcast by AQE); output is (item, est).
    """
    p = probes.select(F.col(probe_col).alias("item")).distinct()
    pd_ = p.select(
        "item", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    )
    idx = _cms_idx(F.col("item"), F.col("d"), width, portable)
    pd_ = pd_.select("item", "d", idx.alias("idx"))
    joined = pd_.join(cms, ["d", "idx"], "left")
    return joined.groupBy("item").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def cms_join_size_estimate(a: DataFrame, b: DataFrame) -> DataFrame:
    """Equi-join output-size estimate from two Count-Min sketches of the
    join keys — the classic AMS/CMS inner-product estimator
    (Alon-Matias-Szegedy 1996; Cormode-Muthukrishnan 2005 §4.2):

        |A ⋈ B| = Σ_k a_k·b_k  ≈  min_d Σ_idx cntA[d,idx]·cntB[d,idx]

    Each row's inner product equals the true join size plus
    non-negative collision cross-terms, so the estimate is an UPPER
    BOUND that the min over depth rows tightens — the safe direction
    for the decisions it feeds (broadcast-vs-shuffle choice, skew
    pre-flight next to skew_report, join reordering). Exact integer
    arithmetic over the two ≤ depth·width cell relations: with
    portable sketches the estimate reproduces bit-for-bit in a SQL
    oracle. Sketch the keys once (cms_table, one pass, map-side
    partial agg), estimate ANY pairwise join size from the stored
    cells without touching the tables again. Output: one row
    (est_join_rows). Both sketches must share (depth, width,
    portable); cells carry no header, so that contract is the
    caller's (the pcsa_merge_table caveat)."""
    ja = a.select("d", "idx", F.col("cnt").alias("__ca"))
    jb = b.select("d", "idx", F.col("cnt").alias("__cb"))
    per_d = (
        ja.join(jb, ["d", "idx"])
        .groupBy("d")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    # a depth row whose cell sets don't overlap has inner product 0 and
    # proves the join is empty — it must participate in the min, not
    # vanish from the inner join (the zero-overlap row is the TIGHTEST
    # bound); rebuild the depth axis from sketch A and coalesce
    axis = ja.select("d").distinct()
    full = axis.join(per_d, "d", "left").select(
        F.coalesce("__ip", F.lit(0)).alias("__ip")
    )
    # empty sketch A ⇒ empty axis ⇒ min over nothing: the join is
    # provably empty, report 0 (symmetric with an empty B, whose
    # missing cells already coalesce to 0)
    return full.agg(
        F.coalesce(F.min("__ip"), F.lit(0)).cast("long").alias("est_join_rows")
    )
