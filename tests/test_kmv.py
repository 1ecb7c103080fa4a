"""KMV (bottom-k) sketch: estimator accuracy, lossless merge, set ops.

The KMV properties under test mirror the reference UDAF's contract
(UDAFCardinalityEstimator.java): null-skip (:238-240), partial→final
merge equivalence (:276-317), sketch-as-data re-aggregation (:259-265) —
plus the KMV-specific guarantees: exactness below saturation and
partitioning-independence of the bottom-k merge.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hive_udf_spark.functions.kmv import (
    KMV_DEFAULT_K,
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_jaccard,
    kmv_merge_table,
    kmv_table,
    kmv_union,
)


def test_exact_below_saturation(spark):
    # 40 distinct values, k=64: the sketch holds every hash → exact.
    df = spark.range(40).select((F.col("id") % 40).alias("v"))
    row = kmv_table(df, [], "v", k=64).collect()[0]
    assert row["est_kmv"] == 40
    assert len(row["kmv"]) == 40


def test_error_bound_when_saturated(spark):
    # 5000 distinct, k=256 → RSE ≈ 1/√254 ≈ 6.3%; assert 4·RSE.
    n, k = 5000, 256
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    est = kmv_table(df, [], "v", k=k).collect()[0]["est_kmv"]
    assert abs(est - n) / n < 4 / math.sqrt(k - 2)


def test_grouped_and_null_skip(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("b", None), ("c", 3)], "g string, v int"
    )
    rows = {r["g"]: r for r in kmv_table(df, ["g"], "v", k=8).collect()}
    assert rows["a"]["est_kmv"] == 2
    assert rows["c"]["est_kmv"] == 1
    # group with only nulls contributes no sketch row (reference: an
    # aggregation that saw no rows yields NULL, not a zero sketch)
    assert "b" not in rows


def test_merge_equals_direct_and_partition_independence(spark):
    # bottom-k is a semilattice: merging per-day sketches must produce
    # the ARRAY-identical sketch of a direct pass, regardless of how the
    # input was partitioned.
    df = spark.range(2000).select(
        (F.col("id") % 7).alias("day"), (F.col("id") % 613).alias("v")
    )
    daily = kmv_table(df.repartition(13), ["day"], "v", k=32)
    rolled = kmv_merge_table(daily, [], "kmv", 32).collect()[0]
    direct = kmv_table(df.coalesce(1), [], "v", k=32).collect()[0]
    assert rolled["kmv"] == direct["kmv"]
    assert rolled["est_kmv"] == direct["est_kmv"]


def test_union_scalar_matches_merge(spark):
    df = spark.range(500).select((F.col("id") < 250).cast("int").alias("g"), F.col("id").alias("v"))
    sk = kmv_table(df, ["g"], "v", k=16)
    pair = sk.agg(
        F.max(F.when(F.col("g") == 0, F.col("kmv"))).alias("a"),
        F.max(F.when(F.col("g") == 1, F.col("kmv"))).alias("b"),
    )
    merged = pair.select(
        kmv_estimate(kmv_union("a", "b", 16), 16).alias("u_est")
    ).collect()[0]["u_est"]
    direct = kmv_table(df, [], "v", k=16).collect()[0]["est_kmv"]
    assert merged == direct


def test_jaccard_and_intersect(spark):
    # A = [0, 3000), B = [1500, 4500): true J = 1500/4500 = 1/3.
    base = spark.range(4500).select(F.col("id").alias("v"))
    a = kmv_table(base.filter("v < 3000"), [], "v", k=512).select(F.col("kmv").alias("a"))
    b = kmv_table(base.filter("v >= 1500"), [], "v", k=512).select(F.col("kmv").alias("b"))
    row = (
        a.crossJoin(b)
        .select(
            kmv_jaccard("a", "b", 512).alias("j"),
            kmv_intersect_estimate("a", "b", 512).alias("i"),
        )
        .collect()[0]
    )
    assert abs(row["j"] - 1 / 3) < 0.15 * (1 / 3)
    assert abs(row["i"] - 1500) / 1500 < 0.2


def test_k_validation(spark):
    df = spark.range(3).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_table(df, [], "v", k=1)


def test_default_k():
    assert KMV_DEFAULT_K == 64


def test_difference_estimate(spark):
    """A = [0, 3000), B = [1500, 4500): |A\\B| = |B\\A| = 1500; below
    saturation the estimate is exact, saturated it lands within RSE."""
    from hive_udf_spark.functions.kmv import kmv_difference_estimate

    base = spark.range(4500).select(F.col("id").alias("v"))
    a = kmv_table(base.filter("v < 3000"), [], "v", k=512).select(F.col("kmv").alias("a"))
    b = kmv_table(base.filter("v >= 1500"), [], "v", k=512).select(F.col("kmv").alias("b"))
    row = (
        a.crossJoin(b)
        .select(
            kmv_difference_estimate("a", "b", 512).alias("ab"),
            kmv_difference_estimate("b", "a", 512).alias("ba"),
        )
        .collect()[0]
    )
    assert abs(row["ab"] - 1500) / 1500 < 0.2
    assert abs(row["ba"] - 1500) / 1500 < 0.2
    # unsaturated regime: sketches ARE the sets, estimate is exact
    sa = kmv_table(base.filter("v < 30"), [], "v", k=64).select(F.col("kmv").alias("a"))
    sb = kmv_table(base.filter("v >= 15 and v < 45"), [], "v", k=64).select(
        F.col("kmv").alias("b")
    )
    srow = (
        sa.crossJoin(sb)
        .select(kmv_difference_estimate("a", "b", 64).alias("ab"))
        .collect()[0]
    )
    assert srow["ab"] == 15


def test_difference_random_sets_match_reference(spark):
    """Randomized overlapping sets: a-not-b estimates equal a Python
    bottom-k algebra mirror on every seed (exact hash reproduction)."""
    import hashlib
    import random

    from hive_udf_spark.functions.kmv import kmv_difference_estimate

    def ph(v, seed=7):
        return int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:15], 16)

    k = 32
    for seed in (0, 1, 2):
        rng = random.Random(seed)
        universe = list(range(300))
        sa = set(rng.sample(universe, rng.choice([10, 60, 150])))
        sb = set(rng.sample(universe, rng.choice([10, 60, 150])))
        da = spark.createDataFrame([(v,) for v in sa], "v long")
        db = spark.createDataFrame([(v,) for v in sb], "v long")
        a = kmv_table(da, [], "v", k=k).select(F.col("kmv").alias("a"))
        b = kmv_table(db, [], "v", k=k).select(F.col("kmv").alias("b"))
        got = (
            a.crossJoin(b)
            .select(kmv_difference_estimate("a", "b", k).alias("d"))
            .collect()[0]["d"]
        )
        ha = sorted(ph(v) for v in sa)[:k]
        hb = sorted(ph(v) for v in sb)[:k]
        x = sorted(set(ha) | set(hb))[:k]
        in_diff = len([h for h in x if h in set(ha) and h not in set(hb)])
        est_u = len(x) if len(x) < k else int((k - 1) * 2**60 / x[k - 1])
        want = int(in_diff / len(x) * est_u)
        assert got == want, seed


def test_difference_empty_sketches_zero(spark):
    """Review-caught: both sketches empty -> 0, not NULL (0/0 guard)."""
    from hive_udf_spark.functions.kmv import kmv_difference_estimate

    e = kmv_table(spark.createDataFrame([], "v long"), [], "v", k=8).select(
        F.col("kmv").alias("a"), F.col("kmv").alias("b")
    )
    assert e.select(kmv_difference_estimate("a", "b", 8).alias("d")).collect()[0].d == 0


def test_jaccard_intersect_empty_sketches_zero(spark):
    """Advisor-caught (r5): kmv_jaccard and kmv_intersect_estimate on two
    empty sketches return 0, not NULL — the same 0/0 guard
    kmv_difference_estimate already had (uniform empty-sketch contract)."""
    e = kmv_table(spark.createDataFrame([], "v long"), [], "v", k=8).select(
        F.col("kmv").alias("a"), F.col("kmv").alias("b")
    )
    row = e.select(
        kmv_jaccard("a", "b", 8).alias("j"),
        kmv_intersect_estimate("a", "b", 8).alias("i"),
    ).collect()[0]
    assert row.j == 0.0
    assert row.i == 0
