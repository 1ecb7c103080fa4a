"""Frequency-sketch property tests (heavy hitters + Count-Min)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_udf_spark.functions.freq import cms_lookup, cms_table, top_k_exploded
from hive_udf_spark.functions.text import tokenize
from hive_udf_spark.sources import load_table


def _token_frame(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(tokenize("text")).alias("token"))


def _exact_counts(toks) -> dict[str, int]:
    return {
        r.token: r.c
        for r in toks.groupBy("token").agg(F.count("*").alias("c")).collect()
    }


def test_cms_estimates_upper_bound_true_counts(spark, sf_dir):
    """CMS point queries never underestimate (min over hashed cells each
    of which counts a superset of the item's occurrences)."""
    toks = _token_frame(spark, sf_dir)
    exact = _exact_counts(toks)
    cms = cms_table(toks, "token", depth=4, width=64)
    est = {
        r.item: r.est
        for r in cms_lookup(cms, toks, "token", depth=4, width=64).collect()
    }
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)


def test_cms_exact_when_width_large(spark, sf_dir):
    """With width >> distinct count, collisions vanish and every estimate
    equals the true count."""
    toks = _token_frame(spark, sf_dir)
    exact = _exact_counts(toks)
    cms = cms_table(toks, "token", depth=4, width=1 << 15)
    est = {
        r.item: r.est
        for r in cms_lookup(cms, toks, "token", depth=4, width=1 << 15).collect()
    }
    assert est == exact


def test_cms_merge_by_cell_sum(spark, sf_dir):
    """Sketches merge like the cardinality sketches: union the counter
    tables and sum per cell ≡ one sketch over the concatenated input."""
    docs = load_table(spark, sf_dir, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    t_a = half_a.select(F.explode(tokenize("text")).alias("token"))
    t_b = half_b.select(F.explode(tokenize("text")).alias("token"))
    cms_a = cms_table(t_a, "token", depth=4, width=64)
    cms_b = cms_table(t_b, "token", depth=4, width=64)
    merged = (
        cms_a.unionByName(cms_b)
        .groupBy("d", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_table(_token_frame(spark, sf_dir), "token", depth=4, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_top_k_exact_regime_matches_exact_counts(spark, sf_dir):
    """max_items_tracked ≥ vocabulary ⇒ sketch counts are exact and the
    deterministic re-rank reproduces the exact top-k."""
    toks = _token_frame(spark, sf_dir)
    exact = _exact_counts(toks)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r.item, r.cnt)
        for r in top_k_exploded(toks, "token", k=10, max_items_tracked=10000)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_top_k_heavy_hitter_survives_small_budget(spark):
    """The heavy-hitter guarantee needs a skewed stream (the corpus's
    token counts are near-uniform, where no bounded-memory summary can
    promise anything): on zipf-like data the dominant items survive a
    sketch budget far below the distinct count."""
    rows = []
    for rank in range(1, 101):  # item_1 appears 1000x ... item_100 10x
        rows.extend((f"item_{rank}",) for _ in range(10_000 // rank // 10 + 10))
    df = spark.createDataFrame(rows, "token string")
    # track=50 < 100 distinct: genuinely approximate regime (note Spark's
    # approx_top_k returns EMPTY when the budget saturates far below the
    # distinct count, e.g. track=10 here — it refuses rather than guesses)
    got = [
        r.item
        for r in top_k_exploded(df, "token", k=3, max_items_tracked=50)
        .orderBy("rank")
        .collect()
    ]
    assert got[:3] == ["item_1", "item_2", "item_3"]


def test_cms_join_size_upper_bound_and_exact_regime(spark):
    """Inner-product estimate >= true join size always; with a
    collision-free width it is EXACT. Randomized multiplicities over
    three seeds."""
    import random

    from hive_udf_spark.functions.freq import cms_join_size_estimate, cms_table

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        a_rows = [(k,) for k in range(30) for _ in range(rng.randrange(1, 6))]
        b_rows = [(k,) for k in range(15, 45) for _ in range(rng.randrange(1, 4))]
        da = spark.createDataFrame(a_rows, "k long")
        db = spark.createDataFrame(b_rows, "k long")
        exact = (
            da.join(db, "k").count()
        )
        # tight regime: wide sketch, no collisions expected -> exact
        wide_a = cms_table(da, "k", depth=4, width=4096, portable=True)
        wide_b = cms_table(db, "k", depth=4, width=4096, portable=True)
        est_w = cms_join_size_estimate(wide_a, wide_b).collect()[0].est_join_rows
        assert est_w == exact, seed
        # collision regime: tiny width -> still an upper bound
        tiny_a = cms_table(da, "k", depth=4, width=8, portable=True)
        tiny_b = cms_table(db, "k", depth=4, width=8, portable=True)
        est_t = cms_join_size_estimate(tiny_a, tiny_b).collect()[0].est_join_rows
        assert est_t >= exact, seed


def test_cms_join_size_disjoint_keys_small(spark):
    """Disjoint key ranges: the true join is empty; a wide sketch
    estimates 0 (no shared cells)."""
    from hive_udf_spark.functions.freq import cms_join_size_estimate, cms_table

    da = spark.range(100).select(F.col("id").alias("k"))
    db = spark.range(1000, 1100).select(F.col("id").alias("k"))
    ca = cms_table(da, "k", depth=4, width=4096, portable=True)
    cb = cms_table(db, "k", depth=4, width=4096, portable=True)
    est = cms_join_size_estimate(ca, cb).collect()[0].est_join_rows
    # any depth row with zero cell overlap proves the join empty and
    # must win the min (it may not vanish from the inner join)
    assert est == 0


def test_cms_join_size_empty_sketch_symmetric_zero(spark):
    """Review-caught: an empty sketch on EITHER side estimates 0, not
    NULL (empty A previously produced an empty axis -> NULL min)."""
    from hive_udf_spark.functions.freq import cms_join_size_estimate, cms_table

    empty = cms_table(spark.createDataFrame([], "k long"), "k", depth=4, width=64)
    some = cms_table(spark.range(100).select(F.col("id").alias("k")), "k", depth=4, width=64)
    assert cms_join_size_estimate(empty, some).collect()[0].est_join_rows == 0
    assert cms_join_size_estimate(some, empty).collect()[0].est_join_rows == 0


def test_cms_table_skips_nulls(spark):
    """Advisor-caught (r5): NULL inputs are skipped (the reference
    UDAF's iterate null contract, UDAFCardinalityEstimator.java:238-240)
    — no (d, NULL-idx) counter rows, and cell totals per hash row equal
    the non-null input count exactly."""
    from pyspark.sql import functions as F

    from hive_udf_spark.functions.freq import cms_table

    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,), ("a",)], "v string"
    )
    cms = cms_table(df, "v", depth=3, width=16)
    assert cms.filter(F.col("idx").isNull()).count() == 0
    totals = cms.groupBy("d").agg(F.sum("cnt").alias("t")).collect()
    assert len(totals) == 3 and all(r.t == 3 for r in totals)
