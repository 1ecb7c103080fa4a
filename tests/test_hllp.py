"""Portable-HLL tests (functions/hllp.py) — the reference's primary
algorithm with bit-exact cross-engine estimates."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from hive_udf_spark.functions.hllp import (
    HLLP_DEFAULT_M,
    hllp_alpha,
    hllp_estimate,
    hllp_merge_table,
    hllp_table,
)


def _py_hllp(values, m, seed):
    """Pure-Python mirror: registers, estimate, reference policy."""
    b = m.bit_length() - 1
    k = 60 - b + 1
    regs = {}
    for v in values:
        h = int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:15], 16)
        bucket = h & (m - 1)
        reduced = h >> b
        if reduced == 0:
            rank = k
        else:
            rank = (reduced & -reduced).bit_length()  # trailing zeros + 1
        regs[bucket] = max(regs.get(bucket, 0), rank)
    s = sum(1 << (k - r) for r in regs.values()) + (m - len(regs)) * (1 << k)
    v0 = m - len(regs)
    raw = hllp_alpha(m) * m * m * (2.0**k) / float(s)
    if raw <= 2.5 * m and v0 > 0:
        return v0, math.floor(m * math.log(m / v0))
    return v0, math.floor(raw)


def test_matches_python_reference(spark):
    m, seed = 64, 7
    vals = [f"v{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    got = hllp_estimate(hllp_table(df, [], "x", m=m, seed=seed), [], m=m).collect()[0]
    nz, est = _py_hllp(vals, m, seed)
    assert (got.n_zero, got.est_hllp) == (nz, est)


def test_small_range_correction_branch(spark):
    """Tiny cardinality → the linear-counting branch (reference policy:
    small-range ON, long-range OFF), near-exact."""
    m = 256
    df = spark.range(40).select(F.col("id").cast("string").alias("x"))
    got = hllp_estimate(hllp_table(df, [], "x", m=m), [], m=m).collect()[0]
    nz, est = _py_hllp([str(i) for i in range(40)], m, 7)
    assert (got.n_zero, got.est_hllp) == (nz, est)
    assert abs(got.est_hllp - 40) <= 3  # LC regime is near-exact


def test_accuracy_within_rse(spark):
    """|est − n| within 4·RSE = 4·1.04/√m for a 20k-distinct build."""
    m, n = 256, 20000
    df = spark.range(n).select(F.col("id").cast("string").alias("x"))
    est = hllp_estimate(hllp_table(df, [], "x", m=m), [], m=m).collect()[0].est_hllp
    assert abs(est - n) / n < 4 * 1.04 / math.sqrt(m)


def test_merge_lossless_and_partition_independent(spark):
    """max-merge of split builds ≡ direct build, row-for-row; the
    relation is independent of input partitioning."""
    df = spark.range(5000).select(
        (F.col("id") % 7).alias("g"), F.col("id").cast("string").alias("x")
    )
    direct = hllp_table(df, ["g"], "x", m=64)
    a = hllp_table(df.filter("id % 2 = 0"), ["g"], "x", m=64)
    b = hllp_table(df.filter("id % 2 = 1"), ["g"], "x", m=64)
    merged = hllp_merge_table(a.unionByName(b), ["g"])
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, merged.collect()))
    rep = hllp_table(df.repartition(13), ["g"], "x", m=64)
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, rep.collect()))
    # idempotent semilattice: re-merging the same sketch is a no-op
    again = hllp_merge_table(direct.unionByName(direct), ["g"])
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, again.collect()))


def test_null_skip_and_validation(spark):
    df = spark.createDataFrame([("a",), (None,)], "x string")
    rows = hllp_table(df, [], "x", m=16).collect()
    assert len(rows) == 1  # null skipped (reference :238-240)
    with pytest.raises(ValueError, match="power of two"):
        hllp_table(df, [], "x", m=100)
    with pytest.raises(ValueError, match="power of two"):
        hllp_table(df, [], "x", m=8)  # below the alpha table
    assert HLLP_DEFAULT_M == 256


def test_plan_shape_partial_max(spark, sf_dir):
    """The register build partial-aggregates map-side (max before the
    exchange) and stays pure JVM."""
    from hive_udf_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        hllp_table(li, ["l_returnflag"], "l_orderkey", m=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_max" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_random_sets_match_reference_across_m_and_seed(spark):
    """Randomized value sets × m ∈ {16, 64, 256} × hash seeds: register
    relation AND estimate equal the Python mirror everywhere (both
    correction branches exercised by the size spread)."""
    import random

    for case_seed in (0, 1):
        rng = random.Random(case_seed)
        for m in (16, 64, 256):
            for hseed in (7, 11):
                n = rng.choice([3, 50, 800])
                vals = [f"s{case_seed}v{rng.randrange(10 * n)}" for _ in range(n)]
                df = spark.createDataFrame([(v,) for v in vals], "x string")
                got = hllp_estimate(
                    hllp_table(df, [], "x", m=m, seed=hseed), [], m=m
                ).collect()[0]
                nz, est = _py_hllp(vals, m, hseed)
                assert (got.n_zero, got.est_hllp) == (nz, est), (case_seed, m, hseed)


def test_intersect_estimate_overlapping_sets(spark):
    """A = [0, 3000), B = [1500, 4500): |A∩B| = 1500 within combined
    RSE; disjoint sets clamp at >= 0."""
    from hive_udf_spark.functions.hllp import hllp_intersect_estimate

    base = spark.range(4500).select(F.col("id").cast("string").alias("v"))
    a = hllp_table(base.filter("id < 3000"), [], "v", m=256)
    b = hllp_table(base.filter("id >= 1500"), [], "v", m=256)
    row = hllp_intersect_estimate(a, b, m=256).collect()[0]
    assert abs(row.est_a - 3000) / 3000 < 0.3
    assert abs(row.est_union - 4500) / 4500 < 0.3
    assert abs(row.est_intersect - 1500) / 1500 < 0.5  # I-E compounds error
    d1 = hllp_table(base.filter("id < 1000"), [], "v", m=256)
    d2 = hllp_table(base.filter("id >= 3500"), [], "v", m=256)
    drow = hllp_intersect_estimate(d1, d2, m=256).collect()[0]
    assert drow.est_intersect >= 0  # clamped
    assert drow.est_intersect < 200


def test_empty_sketch_estimates_zero(spark):
    """Review-caught: a global estimate over an EMPTY sketch relation is
    0 (all registers empty -> LC branch), not NULL; an empty segment in
    the intersect yields integer rows."""
    from hive_udf_spark.functions.hllp import hllp_intersect_estimate

    empty = hllp_table(
        spark.createDataFrame([], "x string"), [], "x", m=64
    )
    row = hllp_estimate(empty, [], m=64).collect()[0]
    assert (row.n_zero, row.est_hllp) == (64, 0)
    some = hllp_table(spark.range(50).selectExpr("CAST(id AS STRING) x"), [], "x", m=64)
    irow = hllp_intersect_estimate(empty, some, m=64).collect()[0]
    assert irow.est_a == 0 and irow.est_intersect == 0
    assert irow.est_b == irow.est_union and irow.est_b > 0
