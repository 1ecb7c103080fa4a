"""Sketch-operator queries with bounded-error verdict oracles (SURVEY.md §5.2).

An HLL/LC estimate never hash-matches an exact oracle, so each query emits
the *verdict*: the exact value (computable by both engines) plus a boolean
``within_bounds`` derived from our deterministic estimate. Our hashes are
fixed-seed, so the booleans are reproducible run-to-run; the DuckDB oracle
asserts them as literals.

Bounds: HLL b=16 → RSE = 1.04/√2^16 ≈ 0.41%; we assert 3·RSE ≈ 1.3%,
rounded up to 2%. LC with m ≫ n is near-exact; we assert 2%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_udf_spark.functions import approx_distinct, sketch_intersect_estimate, sketch_merge_agg
from hive_udf_spark.functions.lc import lc_cardinality
from hive_udf_spark.plans.registry import register
from hive_udf_spark.sources import load_table

_HLL_REL_BOUND = 0.02
_LC_REL_BOUND = 0.02


def _within(est: F.Column, exact: F.Column, bound: float) -> F.Column:
    return (F.abs(est.cast("double") - exact.cast("double")) <= F.lit(bound) * exact.cast("double")).alias(
        "within_bounds"
    )


@register(
    "approx_distinct_hll_global",
    oracle="SELECT count(DISTINCT l_orderkey) AS n_exact, true AS within_bounds FROM lineitem",
)
def approx_distinct_hll_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global approximate COUNT(DISTINCT) — reference usage example
    `SELECT approx_distinct(values) FROM src` (UDAFCardinalityEstimator.java:66)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count_distinct("l_orderkey").alias("n_exact"),
        approx_distinct("l_orderkey").alias("s"),
    ).select("n_exact", _within(F.col("s.cardinality"), F.col("n_exact"), _HLL_REL_BOUND))


@register(
    "approx_distinct_hll_grouped",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS within_bounds
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_hll_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sketch aggregation — the host GROUP BY drives the UDAF's
    PARTIAL1→FINAL protocol (UDAFCardinalityEstimator.java:276-317);
    Catalyst's partial/final HashAggregate is the native analogue."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_exact"), approx_distinct("user_id").alias("s"))
        .select("event_type", "n_exact", _within(F.col("s.cardinality"), F.col("n_exact"), _HLL_REL_BOUND))
    )


@register(
    "approx_distinct_lc_grouped",
    oracle="""
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact, true AS within_bounds
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_distinct_lc_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear Counting mode (`approx_distinct(x,'lc',b)`, reference LC branch
    :358-359) via the pure-JVM plan-level path (functions/lc.py)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").alias("n_exact"),
            lc_cardinality("o_custkey", size_bytes=1_000_000).alias("lc"),
        )
        .select("o_orderpriority", "n_exact", _within(F.col("lc"), F.col("n_exact"), _LC_REL_BOUND))
    )


@register(
    "sketch_rollup_daily_to_month",
    oracle="""
    SELECT date_trunc('month', ts) AS month,
           count(DISTINCT user_id) AS n_exact,
           true AS within_bounds,
           true AS rollup_consistent
    FROM events GROUP BY date_trunc('month', ts)
    """,
)
def sketch_rollup_daily_to_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregation path (UDAFCardinalityEstimator.java:259-265): build
    per-day sketches once, union them to monthly cardinalities without
    rescanning raw rows. rollup_consistent additionally checks the merged
    estimate against the direct single-pass estimate (merge-of-partials
    invariant, :276-317)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("month", "ts").alias("month"), F.date_trunc("day", "ts").alias("day")
    ).agg(approx_distinct("user_id").alias("s"))
    rolled = daily.groupBy("month").agg(sketch_merge_agg("s").alias("m"))
    direct = ev.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.count_distinct("user_id").alias("n_exact"), approx_distinct("user_id").alias("d")
    )
    return rolled.join(direct, "month").select(
        "month",
        "n_exact",
        _within(F.col("m.cardinality"), F.col("n_exact"), _HLL_REL_BOUND),
        (
            F.abs(F.col("m.cardinality") - F.col("d.cardinality"))
            <= F.lit(0.01) * F.col("d.cardinality")
        ).alias("rollup_consistent"),
    )


@register(
    "sketch_intersect_disjoint_segments",
    oracle="""
    SELECT count(DISTINCT c_custkey) AS n_exact_union,
           true AS union_within_bounds,
           true AS intersect_near_zero
    FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)
def sketch_intersect_disjoint_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar sketch utilities (the stub UDF's intended surface,
    UDFCardinalityEstimator.java:30): union + inclusion–exclusion
    intersection over sketches of two disjoint customer partitions."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    )
    per_seg = cust.groupBy("c_mktsegment").agg(approx_distinct("c_custkey").alias("s"))
    pair = (
        per_seg.agg(
            F.max(F.when(F.col("c_mktsegment") == "BUILDING", F.col("s.binary"))).alias("a"),
            F.max(F.when(F.col("c_mktsegment") == "AUTOMOBILE", F.col("s.binary"))).alias("b"),
        )
    )
    exact = cust.agg(F.count_distinct("c_custkey").alias("n_exact_union"))
    from hive_udf_spark.functions import sketch_estimate, sketch_union

    return pair.crossJoin(exact).select(
        "n_exact_union",
        (
            F.abs(
                sketch_estimate(sketch_union("a", "b")).cast("double")
                - F.col("n_exact_union").cast("double")
            )
            <= F.lit(0.02) * F.col("n_exact_union")
        ).alias("union_within_bounds"),
        (
            F.abs(sketch_intersect_estimate("a", "b"))
            <= F.greatest(F.lit(2.0), F.lit(0.02) * F.col("n_exact_union"))
        ).alias("intersect_near_zero"),
    )


@register(
    "approx_percentile_verdict",
    oracle="""
    SELECT event_type, true AS median_within_bounds, true AS p90_within_bounds
    FROM events GROUP BY event_type
    """,
)
def approx_percentile_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald–Khanna summaries — the other
    mergeable-sketch family Spark ships) with the §5.2 bounded-error
    verdict: the approx percentile must land inside the exact
    [p−ε, p+ε] rank window (ε = 1/accuracy, here 0.01). The algorithm
    guarantees the bound, so the verdict column is deterministically true
    and hash-matches a literal oracle."""
    ev = load_table(spark, sf_dir, "events")
    acc = 100  # ε = 1/100 rank error
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, acc).alias("med_a"),
        F.percentile_approx("value", 0.9, acc).alias("p90_a"),
        F.percentile("value", 0.49).alias("med_lo"),
        F.percentile("value", 0.51).alias("med_hi"),
        F.percentile("value", 0.89).alias("p90_lo"),
        F.percentile("value", 0.91).alias("p90_hi"),
    )
    return agg.select(
        "event_type",
        ((F.col("med_a") >= F.col("med_lo")) & (F.col("med_a") <= F.col("med_hi"))).alias(
            "median_within_bounds"
        ),
        ((F.col("p90_a") >= F.col("p90_lo")) & (F.col("p90_a") <= F.col("p90_hi"))).alias(
            "p90_within_bounds"
        ),
    )


@register(
    "approx_distinct_lc_two_phase",
    oracle="""
    SELECT event_type, true AS within_bounds FROM events GROUP BY event_type
    """,
)
def approx_distinct_lc_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier C' two-phase custom aggregation (SURVEY.md §4.3): mapInPandas
    per-partition LC partials → sketch-merge final. Verdict: estimate
    within 5% of the exact per-group distinct count."""
    from hive_udf_spark.functions.lc import lc_two_phase

    ev = load_table(spark, sf_dir, "events")
    est = lc_two_phase(ev, ["event_type"], "user_id", 1_000_000)
    exact = ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_exact"))
    return est.join(exact, "event_type").select(
        "event_type",
        (
            F.abs(F.col("lc_estimate").cast("double") - F.col("n_exact").cast("double"))
            <= F.lit(0.05) * F.col("n_exact")
        ).alias("within_bounds"),
    )


@register(
    "sketch_bloom_prefilter_join",
    oracle="""
    SELECT p.p_brand,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 5
    GROUP BY p.p_brand
    """,
)
def sketch_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership sketch as a join prefilter: small-part revenue by
    brand, with lineitem rows dropped by a Bloom over the qualifying part
    keys BEFORE the join. False positives are removed by the join itself,
    so the result is EXACTLY the plain join's — which is the oracle. This
    is the 100 TB semi-join reduction pattern (completes the sketch
    family: membership alongside cardinality/frequency/quantile —
    reference theme, UDAFCardinalityEstimator.java:50-55)."""
    from hive_udf_spark.functions.bloom import bloom_prefilter_join

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    joined = bloom_prefilter_join(
        li, part, "l_partkey", "p_partkey", m_bits=1 << 16, k=5
    )
    return joined.groupBy("p_brand").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast(
                "long"
            )
        ).alias("revenue_cents"),
        F.count("*").alias("n_items"),
    )


@register(
    "approx_distinct_tuple_grouped",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           count(DISTINCT (user_id, event_type)) AS n_exact,
           true AS within_bounds
    FROM events GROUP BY 1
    """,
)
def approx_distinct_tuple_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key distinct: (user_id, event_type) pairs per day via
    position-salted tuple hashing into the Tier-A sketch, verdict-checked
    against the exact tuple distinct (SURVEY.md §5.2 pattern)."""
    from hive_udf_spark.functions import approx_distinct_tuple

    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        approx_distinct_tuple("user_id", "event_type").alias("s"),
        F.count_distinct("user_id", "event_type").alias("n_exact"),
    )
    return out.select(
        "day",
        "n_exact",
        (
            F.abs(F.col("s.cardinality").cast("double") - F.col("n_exact").cast("double"))
            <= F.lit(0.05) * F.col("n_exact").cast("double")
        ).alias("within_bounds"),
    )
