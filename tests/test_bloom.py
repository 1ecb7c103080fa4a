"""Bloom membership sketch: no-false-negative guarantee, FPR regime,
join equivalence, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_udf_spark.functions.bloom import (
    BLOOM_MAP_COL,
    bloom_build,
    bloom_might_contain,
    bloom_prefilter_join,
)


def _probe(spark, keys_df, bf, m_bits, k, portable=False):
    return keys_df.crossJoin(F.broadcast(bf)).filter(
        bloom_might_contain(F.col("id"), m_bits, k, portable)
    )


def test_no_false_negatives(spark):
    members = spark.range(0, 2000, 3)  # ids 0,3,6,...
    bf = bloom_build(members, "id", m_bits=1 << 12, k=5)
    hits = _probe(spark, members, bf, 1 << 12, 5).count()
    assert hits == members.count()  # every member must pass


def test_fpr_in_expected_regime(spark):
    n, m, k = 500, 1 << 13, 5
    members = spark.range(n)
    others = spark.range(1_000_000, 1_100_000)  # disjoint
    bf = bloom_build(members, "id", m_bits=m, k=k)
    fp = _probe(spark, others, bf, m, k).count()
    # theoretical FPR ~0.13%; allow generous slack (hash family variance)
    assert fp / 100_000 < 0.01


def test_join_equivalence_and_outer_how(spark):
    big = spark.range(20_000).selectExpr("id", "id % 5 AS v")
    small = spark.range(100).selectExpr("id * 37 AS sid", "'t' AS tag")
    out = bloom_prefilter_join(big, small, "id", "sid")
    plain = big.join(small, big.id == small.sid)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))
    # semi keeps only big-side columns, same matched row set
    semi = bloom_prefilter_join(big, small, "id", "sid", how="semi")
    assert sorted(r.id for r in semi.collect()) == sorted(r.id for r in plain.collect())
    # outer joins would silently drop prefiltered unmatched rows — rejected
    for bad in ("left", "full", "right", "left_outer"):
        with pytest.raises(ValueError):
            bloom_prefilter_join(big, small, "id", "sid", how=bad)


def test_param_validation(spark):
    df = spark.range(10)
    with pytest.raises(ValueError):
        bloom_build(df, "id", m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_build(df, "id", k=0)


def test_portable_matches_fast_semantics(spark):
    members = spark.range(300)
    for portable in (False, True):
        bf = bloom_build(members, "id", m_bits=1 << 12, k=4, portable=portable)
        assert _probe(spark, members, bf, 1 << 12, 4, portable).count() == 300


def test_build_plan_partial_aggregates_words(spark):
    """The build shuffles bit-WORDS (bit_or partials), never raw keys:
    two HashAggregates around one exchange, no Python."""
    bf = bloom_build(spark.range(10_000), "id")
    plan = bf._sc._jvm.PythonSQLUtils.explainString(
        bf._jdf.queryExecution(), "formatted"
    )
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sparse_map_smaller_than_dense(spark):
    """Over-provisioned m costs only set words: 10 keys in a 2^20-bit
    bloom stay a ≤50-entry map."""
    bf = bloom_build(spark.range(10), "id", m_bits=1 << 20, k=5)
    size = bf.select(F.size(BLOOM_MAP_COL).alias("s")).first().s
    assert size <= 50
