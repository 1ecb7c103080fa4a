"""PCSA (Flajolet-Martin 1985) sketch family (functions/pcsa.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_udf_spark.functions.pcsa import (
    PCSA_PHI,
    pcsa_estimate,
    pcsa_merge_table,
    pcsa_table,
)


@pytest.fixture(scope="module")
def vals(spark):
    return spark.range(60000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("x")
    )


def test_accuracy_within_fm_bound(vals, spark):
    """Relative error within 4 * 0.78/sqrt(m) of the true 20k per group."""
    for m in (64, 256):
        est = pcsa_estimate(pcsa_table(vals, ["g"], "x", m=m), ["g"], m=m)
        for r in est.collect():
            rel = abs(r.est_pcsa - 20000) / 20000
            assert rel < 4 * 0.78 / m**0.5, (m, r.g, r.est_pcsa)


def test_merge_lossless_and_partition_independent(vals):
    direct = {(r.g, r.bucket): r.bits for r in pcsa_table(vals, ["g"], "x").collect()}
    a = pcsa_table(vals.filter("x % 2 = 0"), ["g"], "x")
    b = pcsa_table(vals.filter("x % 2 = 1"), ["g"], "x")
    merged = {(r.g, r.bucket): r.bits
              for r in pcsa_merge_table(a.unionByName(b), ["g"]).collect()}
    assert merged == direct
    repart = {(r.g, r.bucket): r.bits
              for r in pcsa_table(vals.repartition(13), ["g"], "x").collect()}
    assert repart == direct


def test_null_skipping_and_empty_groups(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", None)], "g string, x bigint"
    )
    sk = pcsa_table(df, ["g"], "x")
    assert {r.g for r in sk.collect()} == {"a"}  # all-NULL group: no rows


def test_duplicates_do_not_move_estimate(spark):
    one = spark.range(5000).select(F.lit("g").alias("g"), F.col("id").alias("x"))
    dup = one.unionByName(one).unionByName(one)
    e1 = pcsa_estimate(pcsa_table(one, ["g"], "x"), ["g"]).collect()[0].est_pcsa
    e3 = pcsa_estimate(pcsa_table(dup, ["g"], "x"), ["g"]).collect()[0].est_pcsa
    assert e1 == e3


def test_partial_bit_or_before_exchange(vals):
    plan = pcsa_table(vals, ["g"], "x")._jdf.queryExecution().executedPlan().toString()
    assert "partial_bit_or" in plan or "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_m_validation(vals):
    with pytest.raises(ValueError):
        pcsa_table(vals, ["g"], "x", m=48)  # not a power of two


def test_small_range_correction_accuracy(spark):
    """r5 verdict item 4: the Scheuermann–Mauve correction term fixes
    the classic estimator's small-n bias — the uncorrected formula
    floors at m/phi (~83 for m=64) no matter how few values it saw."""
    from pyspark.sql import functions as F

    from hive_udf_spark.functions.pcsa import pcsa_estimate, pcsa_table

    m = 64
    for n, lo, hi in [(1, 0, 6), (3, 1, 10), (10, 3, 25), (30, 9, 60), (60, 20, 110)]:
        df = (
            spark.range(max(n, 1))
            .select(F.col("id").cast("string").alias("v"))
            .limit(n)
        )
        est = pcsa_estimate(pcsa_table(df, [], "v", m=m), [], m=m).collect()[0]
        assert lo <= est.est_pcsa <= hi, (n, est.est_pcsa)
    # n = 0 (global agg over empty input): exactly 0, never m/phi
    empty = spark.createDataFrame([], "v string")
    row = pcsa_estimate(pcsa_table(empty, [], "v", m=m), [], m=m).collect()[0]
    assert row.s_sum == 0 and row.est_pcsa == 0
