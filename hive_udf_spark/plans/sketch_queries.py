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
    "approx_distinct_sql_lc_one_name",
    oracle="""
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact,
           true AS within_bounds, true AS binary_is_null
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_distinct_sql_lc_one_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's LC parameter surface through the one-name SQL
    macro — ``SELECT approx_distinct(x, 'lc', size) FROM src``
    (UDAFCardinalityEstimator.java:112-124, LC branch :358-359; r4
    verdict missing-item 1). Expands to the registered
    lc_estimate/lc_bucket composition: the executed plan is the same
    pure-JVM two-phase distinct as lc_cardinality. Estimate-only struct:
    ``binary`` is NULL by contract (a scalar macro cannot assemble the
    dense bitmap; lc_table / approx_distinct(kind='lc') persist real
    ones), and the verdict asserts that contract."""
    import hive_udf_spark as hus

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lc_sql_v")
    got = hus.sql(
        spark,
        """
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_exact,
               approx_distinct(o_custkey, 'lc', 1000000) AS s
        FROM orders_lc_sql_v GROUP BY o_orderpriority
        """,
    )
    return got.select(
        "o_orderpriority",
        "n_exact",
        _within(F.col("s.cardinality"), F.col("n_exact"), _LC_REL_BOUND),
        F.col("s.binary").isNull().alias("binary_is_null"),
    )


@register(
    "approx_distinct_sql_one_name",
    oracle="""
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact, true AS within_bounds
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_distinct_sql_one_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact SQL UX — ``SELECT approx_distinct(values)
    FROM src`` (UDAFCardinalityEstimator.java:66-68) — through the
    one-name macro surface (hive_udf_spark.sql): the call expands to the
    composed native aggregate before parsing, so the executed plan is
    Tier A (partial+final ObjectHashAggregate, zero Python)."""
    import hive_udf_spark as hus

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    got = hus.sql(
        spark,
        """
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_exact,
               approx_distinct(o_custkey) AS s
        FROM orders_v GROUP BY o_orderpriority
        """,
    )
    return got.select(
        "o_orderpriority", "n_exact", _within(F.col("s.cardinality"), F.col("n_exact"), _HLL_REL_BOUND)
    )


@register(
    "approx_distinct_sql_merge_one_name",
    oracle="""
    SELECT date_trunc('month', ts) AS month,
           count(DISTINCT user_id) AS n_exact,
           true AS within_bounds
    FROM events GROUP BY date_trunc('month', ts)
    """,
)
def approx_distinct_sql_merge_one_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's THIRD entry point through the one-name SQL
    surface — ``SELECT approx_distinct(sketch) FROM daily_sketches``
    (struct-input re-aggregation, UDAFCardinalityEstimator.java:259-265):
    the macro's type dispatch notices the argument is a sketch struct and
    expands to the union aggregate. Daily sketches built once, rolled up
    to months without rescanning raw events."""
    import hive_udf_spark as hus

    ev = load_table(spark, sf_dir, "events")
    ev.groupBy(
        F.date_trunc("month", "ts").alias("month"), F.date_trunc("day", "ts").alias("day")
    ).agg(approx_distinct("user_id").alias("s")).createOrReplaceTempView("daily_sketches_v")
    rolled = hus.sql(
        spark,
        "SELECT month, approx_distinct(s) AS m FROM daily_sketches_v GROUP BY month",
    )
    exact = ev.groupBy(F.date_trunc("month", "ts").alias("month")).agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return rolled.join(exact, "month").select(
        "month", "n_exact", _within(F.col("m.cardinality"), F.col("n_exact"), _HLL_REL_BOUND)
    )


@register(
    "approx_distinct_lc_struct_grouped",
    oracle="""
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact,
           true AS within_bounds,
           65545 AS binary_len,
           true AS magic_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_distinct_lc_struct_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LC struct facade via the relational PARTIAL→FINAL ``lc_table``
    (r4): packed words cross the shuffle (bit_or before the exchange —
    1 bit per bucket, not collect_set's 8 bytes), and the serialized
    bitmap {magic,version,size,bits} is assembled from JVM expressions —
    no Python worker in the plan (asserted in tests/test_plans.py).
    Reached through ``approx_distinct_table``'s size-aware auto-routing
    (r6: grouped LC builds ≥ 64 KiB dispatch to the sparse packed-word
    path; the route choice is plan-asserted in tests/test_plans.py).
    Verdict: estimate within bounds + serialized header well-formed."""
    from hive_udf_spark.functions.sketch import approx_distinct_table

    orders = load_table(spark, sf_dir, "orders")
    sketches = approx_distinct_table(
        orders, ["o_orderpriority"], "o_custkey", kind="lc", b=65536
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_exact")
    )
    s = F.col("approx_distinct")
    return sketches.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "n_exact",
        _within(s.getField("cardinality"), F.col("n_exact"), _LC_REL_BOUND),
        F.length(s.getField("binary")).alias("binary_len"),
        (F.hex(F.substring(s.getField("binary"), 1, 5)) == F.lit("53474C4301")).alias(
            "magic_ok"
        ),
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
    [p−ε′, p+ε′] window, ε′ = ε + 0.01 where ε = 1/accuracy = 0.01.
    GK guarantees a RANK error of ε·n, but the window edges here are
    linearly INTERPOLATED percentiles, which can sit strictly inside
    the data value at the guaranteed rank — at small groups (sf0.001:
    ~200 rows/type) that one-rank gap broke the naive ±ε window, so the
    bound carries one extra percent (≥ 1 rank of slack for groups of
    ≥ 100 rows).  The algorithm guarantees the widened bound, so the
    verdict column is deterministically true and hash-matches a literal
    oracle."""
    ev = load_table(spark, sf_dir, "events")
    acc = 100  # ε = 1/100 rank error; +0.01 interpolation slack below
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, acc).alias("med_a"),
        F.percentile_approx("value", 0.9, acc).alias("p90_a"),
        F.percentile("value", 0.48).alias("med_lo"),
        F.percentile("value", 0.52).alias("med_hi"),
        F.percentile("value", 0.88).alias("p90_lo"),
        F.percentile("value", 0.92).alias("p90_hi"),
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


# --- KMV (bottom-k) family: estimates hash-matched EXACTLY (functions/kmv.py) ---

_KMV_K = 64
_KMV_SEED = 7


def _kmv_grouped_oracle() -> str:
    from hive_udf_spark.functions.kmv import kmv_estimate_sql, kmv_sketch_sql

    sketch = kmv_sketch_sql("events", "event_type", "user_id", _KMV_K, _KMV_SEED)
    return f"""
    WITH sk AS ({sketch}),
    ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
           FROM events WHERE user_id IS NOT NULL GROUP BY event_type)
    SELECT ex.event_type, ex.n_exact,
           {kmv_estimate_sql('sk.kmv', _KMV_K)} AS est_kmv
    FROM ex JOIN sk USING (event_type)
    """


@register("approx_distinct_kmv_grouped", oracle=_kmv_grouped_oracle())
def approx_distinct_kmv_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k estimator, grouped. Unlike the HLL/LC rows (bounds
    verdicts), the ESTIMATE ITSELF hash-matches: both engines take the
    k smallest distinct portable hashes and apply (k-1)·2^60/kth — the
    whole sketch pipeline is pinned bit-for-bit, the strongest §5.2
    oracle form. Third algorithm behind the reference's approx_distinct
    surface (enum of estimators, UDAFCardinalityEstimator.java:71-86)."""
    from hive_udf_spark.functions.kmv import kmv_table

    ev = load_table(spark, sf_dir, "events")
    sk = kmv_table(ev, ["event_type"], "user_id", k=_KMV_K, seed=_KMV_SEED)
    exact = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_exact"))
    )
    return exact.join(sk, "event_type").select("event_type", "n_exact", "est_kmv")


def _kmv_rollup_oracle() -> str:
    from hive_udf_spark.functions.kmv import kmv_estimate_sql, kmv_sketch_sql

    sketch = kmv_sketch_sql(
        "events", "date_trunc('month', ts)", "user_id", _KMV_K, _KMV_SEED, group_alias="month"
    )
    return f"""
    WITH sk AS ({sketch})
    SELECT month,
           {kmv_estimate_sql('kmv', _KMV_K)} AS est_kmv,
           true AS merge_equals_direct
    FROM sk
    """


@register("sketch_kmv_rollup_exact_merge", oracle=_kmv_rollup_oracle())
def sketch_kmv_rollup_exact_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV re-aggregation (the sketch-as-data path,
    UDAFCardinalityEstimator.java:259-265): per-day sketches merged to
    months. Bottom-k merge is LOSSLESS — the merged sketch is
    array-identical to a direct single-pass month sketch, asserted as a
    column and implied by the hash-matched estimate."""
    from hive_udf_spark.functions.kmv import kmv_merge_table, kmv_table

    ev = load_table(spark, sf_dir, "events")
    daily = kmv_table(
        ev.withColumn("month", F.date_trunc("month", "ts")).withColumn(
            "day", F.date_trunc("day", "ts")
        ),
        ["month", "day"],
        "user_id",
        k=_KMV_K,
        seed=_KMV_SEED,
    )
    rolled = kmv_merge_table(daily, ["month"], "kmv", _KMV_K)
    direct = kmv_table(
        ev.withColumn("month", F.date_trunc("month", "ts")),
        ["month"],
        "user_id",
        k=_KMV_K,
        seed=_KMV_SEED,
    ).select(F.col("month"), F.col("kmv").alias("__direct"))
    return (
        rolled.join(direct, "month")
        .select(
            "month",
            "est_kmv",
            (F.col("kmv") == F.col("__direct")).alias("merge_equals_direct"),
        )
    )


def _kmv_jaccard_oracle() -> str:
    from hive_udf_spark.functions.hashing import portable_hash60_sql

    hv = portable_hash60_sql("o_custkey", _KMV_SEED)
    k = _KMV_K
    return f"""
    WITH seg AS (
      SELECT o_custkey,
             max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS in_b
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_custkey IS NOT NULL
      GROUP BY o_custkey
    ),
    ha AS (SELECT {hv} AS hv FROM seg WHERE in_a = 1),
    hb AS (SELECT {hv} AS hv FROM seg WHERE in_b = 1),
    ska AS (SELECT list(hv ORDER BY hv) AS a FROM (SELECT DISTINCT hv FROM ha ORDER BY hv LIMIT {k})),
    skb AS (SELECT list(hv ORDER BY hv) AS b FROM (SELECT DISTINCT hv FROM hb ORDER BY hv LIMIT {k})),
    x AS (SELECT a, b, list_sort(list_distinct(a || b))[1:{k}] AS u FROM ska, skb),
    est AS (
      SELECT len(list_intersect(u, list_intersect(a, b)))::DOUBLE / len(u) AS jaccard_kmv
      FROM x
    ),
    exact AS (
      SELECT CAST(floor(1000000.0 * sum(in_a * in_b) / count(*)) AS BIGINT) AS exact_jaccard_ppm
      FROM seg
    )
    SELECT est.jaccard_kmv, exact.exact_jaccard_ppm FROM est, exact
    """


@register("sketch_kmv_jaccard_segments", oracle=_kmv_jaccard_oracle())
def sketch_kmv_jaccard_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set similarity over KMV sketches (Beyer et al. 2007): Jaccard of
    URGENT-vs-HIGH-priority customer sets, estimate hash-matched exactly
    against DuckDB running the identical bottom-k algebra, alongside the
    exact Jaccard (ppm). Completes the stub UDF's 'set intersection and
    other utils' intent (UDFCardinalityEstimator.java:30) with a sketch
    whose set ops are engine-portable."""
    from hive_udf_spark.functions.kmv import kmv_jaccard, kmv_table

    ords = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") & F.col("o_custkey").isNotNull()
    )
    seg = ords.groupBy("o_custkey").agg(
        F.max((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias("in_a"),
        F.max((F.col("o_orderpriority") == "2-HIGH").cast("int")).alias("in_b"),
    )
    a = kmv_table(seg.filter("in_a = 1"), [], "o_custkey", k=_KMV_K, seed=_KMV_SEED).select(
        F.col("kmv").alias("a")
    )
    b = kmv_table(seg.filter("in_b = 1"), [], "o_custkey", k=_KMV_K, seed=_KMV_SEED).select(
        F.col("kmv").alias("b")
    )
    exact = seg.agg(
        F.floor(
            F.lit(1000000.0)
            * F.sum(F.col("in_a") * F.col("in_b"))
            / F.count("*")
        )
        .cast("bigint")
        .alias("exact_jaccard_ppm")
    )
    return (
        a.crossJoin(b)
        .crossJoin(exact)
        .select(
            kmv_jaccard("a", "b", _KMV_K).alias("jaccard_kmv"),
            "exact_jaccard_ppm",
        )
    )


def _kmv_difference_oracle() -> str:
    from hive_udf_spark.functions.hashing import portable_hash60_sql
    from hive_udf_spark.functions.kmv import kmv_estimate_sql

    hv = portable_hash60_sql("o_custkey", _KMV_SEED)
    k = _KMV_K
    est_u = kmv_estimate_sql("u", k)
    return f"""
    WITH seg AS (
      SELECT o_custkey,
             max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS in_b
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_custkey IS NOT NULL
      GROUP BY o_custkey
    ),
    ha AS (SELECT {hv} AS hv FROM seg WHERE in_a = 1),
    hb AS (SELECT {hv} AS hv FROM seg WHERE in_b = 1),
    ska AS (SELECT list(hv ORDER BY hv) AS a FROM (SELECT DISTINCT hv FROM ha ORDER BY hv LIMIT {k})),
    skb AS (SELECT list(hv ORDER BY hv) AS b FROM (SELECT DISTINCT hv FROM hb ORDER BY hv LIMIT {k})),
    x AS (SELECT a, b, list_sort(list_distinct(a || b))[1:{k}] AS u FROM ska, skb),
    est AS (
      SELECT
        CAST(floor(len(list_intersect(u, list_filter(a, v -> NOT list_contains(b, v))))::DOUBLE
                   / len(u) * ({est_u})) AS BIGINT) AS est_a_not_b,
        CAST(floor(len(list_intersect(u, list_filter(b, v -> NOT list_contains(a, v))))::DOUBLE
                   / len(u) * ({est_u})) AS BIGINT) AS est_b_not_a
      FROM x
    ),
    exact AS (
      SELECT CAST(sum(in_a * (1 - in_b)) AS BIGINT) AS exact_a_not_b,
             CAST(sum(in_b * (1 - in_a)) AS BIGINT) AS exact_b_not_a
      FROM seg
    )
    SELECT est.est_a_not_b, est.est_b_not_a, exact.exact_a_not_b, exact.exact_b_not_a
    FROM est, exact
    """


@register("sketch_kmv_difference_segments", oracle=_kmv_difference_oracle())
def sketch_kmv_difference_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set DIFFERENCE over KMV sketches — the a-not-b operation
    (theta-sketch AnotB analogue; Beyer et al. 2007 multiset algebra):
    customers with URGENT but never HIGH orders and vice versa, each
    estimated from the two bottom-k sketches alone and hash-matched
    against DuckDB running the identical algebra, next to the exact
    counts. With union/intersect/jaccard this completes the stub UDF's
    intended sketch set-utility surface
    (UDFCardinalityEstimator.java:30)."""
    from hive_udf_spark.functions.kmv import kmv_difference_estimate, kmv_table

    ords = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH") & F.col("o_custkey").isNotNull()
    )
    seg = ords.groupBy("o_custkey").agg(
        F.max((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias("in_a"),
        F.max((F.col("o_orderpriority") == "2-HIGH").cast("int")).alias("in_b"),
    )
    a = kmv_table(seg.filter("in_a = 1"), [], "o_custkey", k=_KMV_K, seed=_KMV_SEED).select(
        F.col("kmv").alias("a")
    )
    b = kmv_table(seg.filter("in_b = 1"), [], "o_custkey", k=_KMV_K, seed=_KMV_SEED).select(
        F.col("kmv").alias("b")
    )
    exact = seg.agg(
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).cast("bigint").alias("exact_a_not_b"),
        F.sum(F.col("in_b") * (1 - F.col("in_a"))).cast("bigint").alias("exact_b_not_a"),
    )
    return (
        a.crossJoin(b)
        .crossJoin(exact)
        .select(
            kmv_difference_estimate("a", "b", _KMV_K).alias("est_a_not_b"),
            kmv_difference_estimate("b", "a", _KMV_K).alias("est_b_not_a"),
            "exact_a_not_b",
            "exact_b_not_a",
        )
    )


_QS_K = 256
_QS_SRC = """
    qsrc AS (
      SELECT o_orderpriority AS g,
             CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             ('0x' || substr(md5('5:' || o_orderkey), 1, 15))::BIGINT AS h
      FROM orders
    )
"""


def _qs_pick(vs: str, q: str) -> str:
    return f"{vs}[CAST(floor({q} * (len({vs}) - 1)) AS INT) + 1]"


@register(
    "approx_quantile_sketch_grouped",
    oracle=f"""
    WITH {_QS_SRC},
    rk AS (
      SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY h, v) AS rn
      FROM qsrc
    ),
    samp AS (
      SELECT g, list(v ORDER BY v) AS vs FROM rk WHERE rn <= {_QS_K} GROUP BY g
    ),
    n AS (SELECT g, count(*) AS n_rows FROM qsrc GROUP BY g)
    SELECT samp.g AS o_orderpriority,
           CAST(n.n_rows AS BIGINT) AS n_rows,
           {_qs_pick('vs', '0.25')} AS q25_cents,
           {_qs_pick('vs', '0.5')} AS q50_cents,
           {_qs_pick('vs', '0.9')} AS q90_cents
    FROM samp JOIN n ON samp.g = n.g
    """,
)
def approx_quantile_sketch_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile-sample sketch (functions/qsketch.py, r4): the
    fourth sketch family — re-aggregable QUANTILE state, filling the gap
    that percentile_approx's internal summary is not exportable data.
    Coordinated bottom-k row sample by portable hash ⇒ the DuckDB oracle
    reproduces sketch and quantiles bit-for-bit (strongest §5.2 form)."""
    from hive_udf_spark.functions.qsketch import qsketch_quantile, quantile_sketch_table

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("bigint")
    )
    sk = quantile_sketch_table(
        orders, ["o_orderpriority"], "cents", "o_orderkey", k=_QS_K, portable=True
    )
    return sk.select(
        "o_orderpriority",
        "n_rows",
        qsketch_quantile("qs", 0.25).alias("q25_cents"),
        qsketch_quantile("qs", 0.5).alias("q50_cents"),
        qsketch_quantile("qs", 0.9).alias("q90_cents"),
    )


@register(
    "sketch_quantile_rollup_exact_merge",
    oracle=f"""
    WITH {_QS_SRC},
    rk AS (SELECT v, row_number() OVER (ORDER BY h, v) AS rn FROM qsrc),
    samp AS (SELECT list(v ORDER BY v) AS vs FROM rk WHERE rn <= {_QS_K})
    SELECT CAST((SELECT count(*) FROM qsrc) AS BIGINT) AS n_rows,
           {_qs_pick('vs', '0.5')} AS q50_merged_cents,
           true AS merge_exact
    FROM samp
    """,
)
def sketch_quantile_rollup_exact_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-state rollup without raw rescans: per-priority sketches
    merge to the global sketch, and the merge is LOSSLESS (bottom-k
    semilattice) — merge_exact compares the rolled-up sample to a direct
    global build, element by element. The oracle computes the direct
    global sketch; equality makes both paths emit identical rows."""
    from hive_udf_spark.functions.qsketch import (
        qsketch_quantile,
        qsketch_merge_table,
        quantile_sketch_table,
    )

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("bigint")
    )
    per_group = quantile_sketch_table(
        orders, ["o_orderpriority"], "cents", "o_orderkey", k=_QS_K, portable=True
    )
    rolled = qsketch_merge_table(per_group, [], "qs", "n_rows", _QS_K)
    direct = quantile_sketch_table(
        orders, [], "cents", "o_orderkey", k=_QS_K, portable=True
    ).select(F.col("qs").alias("__dqs"))
    return rolled.crossJoin(direct).select(
        "n_rows",
        qsketch_quantile("qs", 0.5).alias("q50_merged_cents"),
        (F.col("qs") == F.col("__dqs")).alias("merge_exact"),
    )


def _kmv_sliding_oracle() -> str:
    from hive_udf_spark.functions.hashing import portable_hash60_sql
    from hive_udf_spark.functions.kmv import kmv_estimate_sql

    hv = portable_hash60_sql("user_id", _KMV_SEED)
    return f"""
    WITH days AS (
      SELECT DISTINCT date_trunc('day', ts) AS day FROM events
    ),
    h AS (
      SELECT date_trunc('day', ts) AS sday, {hv} AS hv
      FROM events WHERE user_id IS NOT NULL
    ),
    sk AS (
      SELECT d.day,
             (list_sort(list_distinct(list(hv))))[1:{_KMV_K}] AS kmv
      FROM days d JOIN h
        ON h.sday BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT day, {kmv_estimate_sql('kmv', _KMV_K)} AS est_users_7d
    FROM sk
    """


@register("sketch_kmv_sliding_distinct", oracle=_kmv_sliding_oracle())
def sketch_kmv_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct count from STORED sketches — the
    sketch-as-data theme (UDAFCardinalityEstimator.java:259-265) as a
    trailing 7-day rollup: one KMV sketch per day, then each day's
    window estimate from a range self-join over the ~|days|-row SKETCH
    TABLE and a lossless bottom-k merge. Raw events are scanned once
    ever; every extra window shape (7-day, 30-day, month-to-date) costs
    only sketch-table joins — the reason sketch tables exist. Lossless
    merge ⇒ the estimate is bit-equal to a direct per-window build,
    which is what the oracle computes."""
    from hive_udf_spark.functions.kmv import kmv_merge_table, kmv_table

    ev = load_table(spark, sf_dir, "events")
    daily = kmv_table(
        ev.withColumn("day", F.date_trunc("day", "ts")),
        ["day"],
        "user_id",
        k=_KMV_K,
        seed=_KMV_SEED,
    )
    src = daily.select(F.col("day").alias("src_day"), "kmv")
    days = daily.select("day")
    joined = days.join(
        src,
        (F.col("src_day") <= F.col("day"))
        & (F.col("src_day") >= F.col("day") - F.expr("INTERVAL 6 DAYS")),
    )
    rolled = kmv_merge_table(joined, ["day"], "kmv", _KMV_K)
    return rolled.select("day", F.col("est_kmv").alias("est_users_7d"))


@register(
    "table_profile_orders",
    oracle="""
    WITH ex AS (
      SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
             count(*) - count(o_orderkey) AS n_null,
             count(DISTINCT o_orderkey) AS n_exact,
             CAST(min(o_orderkey) AS VARCHAR) AS min_value,
             CAST(max(o_orderkey) AS VARCHAR) AS max_value
      FROM orders
      UNION ALL
      SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
             count(DISTINCT o_custkey),
             CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
             count(DISTINCT o_orderpriority),
             min(o_orderpriority), max(o_orderpriority)
      FROM orders
      UNION ALL
      SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
             count(DISTINCT o_orderdate),
             CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
      FROM orders
    )
    SELECT "column", CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_null AS BIGINT) AS n_null,
           min_value, max_value, true AS within_bounds
    FROM ex
    """,
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile (operators/profile.py): nulls, typed
    min/max, and per-column HLL distinct estimates for four orders
    columns in ONE wide aggregate — the pre-flight statistics pass of a
    100 TB ingest. Exact fields hash-match; the distinct estimate is
    verdict-checked within 5% of exact (§5.2)."""
    from hive_udf_spark.operators.profile import profile_table

    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate"]
    prof = profile_table(orders, cols)
    exact = None
    for c in cols:
        e = orders.agg(F.count_distinct(c).alias("n_exact")).select(
            F.lit(c).alias("column"), "n_exact"
        )
        exact = e if exact is None else exact.unionByName(e)
    return prof.join(exact, "column").select(
        "column",
        "n_rows",
        "n_null",
        "min_value",
        "max_value",
        (
            F.abs(F.col("n_distinct_est").cast("double") - F.col("n_exact").cast("double"))
            <= F.lit(0.05) * F.col("n_exact").cast("double")
        ).alias("within_bounds"),
    )



_PCSA_M = 64
_PCSA_SEED = 7


def _pcsa_oracle() -> str:
    from hive_udf_spark.functions.pcsa import pcsa_estimate_sql

    return pcsa_estimate_sql(
        "orders", "o_orderpriority", "o_custkey", _PCSA_M, _PCSA_SEED,
        group_alias="o_orderpriority",
    )


@register("approx_distinct_pcsa_grouped", oracle=_pcsa_oracle())
def approx_distinct_pcsa_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCSA (Flajolet-Martin 1985) grouped cardinality — the FIFTH
    estimator family, the ancestor of both of the reference's
    algorithms and part of stream-lib's own palette
    (UDAFCardinalityEstimator.java:71-86 exposes only HLL/LC). The
    Tier-B relational build bit_or-packs bitmap words map-side; the
    transcendental 2^(S/m) estimate is made engine-portable with an
    m-entry literal table, so S AND the final estimate hash-match the
    DuckDB oracle bit-for-bit (the KMV discipline extended to a
    transcendental estimator)."""
    from hive_udf_spark.functions.pcsa import pcsa_estimate, pcsa_table

    orders = load_table(spark, sf_dir, "orders")
    sk = pcsa_table(orders, ["o_orderpriority"], "o_custkey", m=_PCSA_M, seed=_PCSA_SEED)
    return pcsa_estimate(sk, ["o_orderpriority"], m=_PCSA_M)


def _pcsa_rollup_oracle() -> str:
    from hive_udf_spark.functions.pcsa import pcsa_estimate_sql

    inner = pcsa_estimate_sql(
        "events", "date_trunc('month', ts)", "user_id", _PCSA_M, _PCSA_SEED,
        group_alias="month",
    )
    return f"SELECT month, s_sum, est_pcsa AS est_users FROM ({inner})"


@register("sketch_pcsa_rollup_exact_merge", oracle=_pcsa_rollup_oracle())
def sketch_pcsa_rollup_exact_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCSA re-aggregation (the :259-265 sketch-as-data path): per-day
    bitmap relations OR-merged to months. The OR merge is LOSSLESS, so
    the merged estimate is bit-equal to a direct month build — which is
    what the oracle computes."""
    from hive_udf_spark.functions.pcsa import (
        pcsa_estimate,
        pcsa_merge_table,
        pcsa_table,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = pcsa_table(
        ev.withColumn("month", F.date_trunc("month", "ts")).withColumn(
            "day", F.date_trunc("day", "ts")
        ),
        ["month", "day"],
        "user_id",
        m=_PCSA_M,
        seed=_PCSA_SEED,
    )
    rolled = pcsa_merge_table(daily, ["month"], m=_PCSA_M)
    return pcsa_estimate(rolled, ["month"], m=_PCSA_M).select(
        "month", "s_sum", F.col("est_pcsa").alias("est_users")
    )


def _qs_sliding_oracle() -> str:
    return f"""
    WITH days AS (
      -- only days with >=1 non-NULL value have a daily sketch row, so
      -- only those days appear in the engine's window axis
      SELECT DISTINCT date_trunc('day', ts) AS day
      FROM events WHERE value IS NOT NULL
    ),
    src AS (
      SELECT date_trunc('day', ts) AS sday,
             CAST(round(value * 100) AS BIGINT) AS v,
             ('0x' || substr(md5('5:' || event_id), 1, 15))::BIGINT AS h
      FROM events WHERE value IS NOT NULL
    ),
    win AS (
      SELECT d.day, s.v, s.h FROM days d JOIN src s
        ON s.sday BETWEEN d.day - INTERVAL 6 DAY AND d.day
    ),
    rk AS (
      SELECT day, v, row_number() OVER (PARTITION BY day ORDER BY h, v) AS rn
      FROM win
    ),
    samp AS (
      SELECT day, list(v ORDER BY v) AS vs FROM rk WHERE rn <= {_QS_K} GROUP BY day
    ),
    n AS (SELECT day, CAST(count(*) AS BIGINT) AS n_rows_7d FROM win GROUP BY day)
    SELECT samp.day, n.n_rows_7d,
           {_qs_pick('vs', '0.5')} AS p50_cents,
           {_qs_pick('vs', '0.95')} AS p95_cents
    FROM samp JOIN n ON samp.day = n.day
    """


@register("sketch_quantile_sliding_window", oracle=_qs_sliding_oracle())
def sketch_quantile_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day value quantiles from STORED quantile sketches —
    the sliding-window rollup (sketch_kmv_sliding_distinct) on the
    quantile-sample family: one bottom-k sketch per day, each day's
    window state from a range self-join over the ~|days|-row sketch
    table + the lossless bottom-k merge. Raw events are scanned once
    ever; any window shape afterwards costs only sketch-table joins.
    Lossless merge ⇒ every window's sample (hence p50/p95) is bit-equal
    to a direct build over the window's rows, which the oracle computes."""
    from hive_udf_spark.functions.qsketch import (
        qsketch_merge_table,
        qsketch_quantile,
        quantile_sketch_table,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("day", F.date_trunc("day", "ts"))
        .withColumn("cents", F.round(F.col("value") * 100).cast("bigint"))
    )
    daily = quantile_sketch_table(
        ev, ["day"], "cents", "event_id", k=_QS_K, portable=True
    )
    src = daily.select(F.col("day").alias("src_day"), "qs", "n_rows")
    days = daily.select("day")
    joined = days.join(
        src,
        (F.col("src_day") <= F.col("day"))
        & (F.col("src_day") >= F.col("day") - F.expr("INTERVAL 6 DAYS")),
    )
    rolled = qsketch_merge_table(joined, ["day"], "qs", "n_rows", _QS_K)
    return rolled.select(
        "day",
        F.col("n_rows").alias("n_rows_7d"),
        qsketch_quantile("qs", 0.5).alias("p50_cents"),
        qsketch_quantile("qs", 0.95).alias("p95_cents"),
    )


_HLLP_M = 256
_HLLP_SEED = 7


def _hllp_oracle() -> str:
    from hive_udf_spark.functions.hllp import hllp_estimate_sql

    inner = hllp_estimate_sql(
        "lineitem", "l_returnflag", "l_orderkey", _HLLP_M, _HLLP_SEED,
        group_alias="l_returnflag",
    )
    return f"""
    WITH est AS ({inner}),
    exact AS (
      SELECT l_returnflag, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders
      FROM lineitem GROUP BY 1
    )
    SELECT e.l_returnflag, e.n_zero, e.est_hllp, x.exact_orders
    FROM est e JOIN exact x ON x.l_returnflag = e.l_returnflag
    """


@register("approx_distinct_hllp_grouped", oracle=_hllp_oracle())
def approx_distinct_hllp_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE HyperLogLog grouped cardinality — the reference's
    PRIMARY algorithm (UDAFCardinalityEstimator.java:50) at the
    strongest check tier: the Tier-B relational build max-aggregates
    (bucket, rank) registers map-side, and the estimate applies the
    REFERENCE'S exact policy — small-range linear-counting correction,
    long-range correction disabled (stream-lib cardinality(false),
    :335-337). The harmonic sum is computed as an exact dyadic BIGINT,
    so the raw estimate is one literal x one int64->double conversion x
    one division — the estimate hash-matches DuckDB BIT-FOR-BIT, the
    check form the DataSketches facade can only bound (BASELINE.md r4).
    Shown next to the exact count (measured |err| within ~1.04/sqrt(m))."""
    from hive_udf_spark.functions.hllp import hllp_estimate, hllp_table

    li = load_table(spark, sf_dir, "lineitem")
    sk = hllp_table(li, ["l_returnflag"], "l_orderkey", m=_HLLP_M, seed=_HLLP_SEED)
    est = hllp_estimate(sk, ["l_returnflag"], m=_HLLP_M)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("long").alias("exact_orders")
    )
    return est.join(exact, "l_returnflag")


def _hllp_rollup_oracle() -> str:
    from hive_udf_spark.functions.hllp import hllp_estimate_sql

    inner = hllp_estimate_sql(
        "events", "date_trunc('month', ts)", "user_id", _HLLP_M, _HLLP_SEED,
        group_alias="month",
    )
    return f"SELECT month, n_zero, est_hllp AS est_users FROM ({inner})"


@register("sketch_hllp_rollup_exact_merge", oracle=_hllp_rollup_oracle())
def sketch_hllp_rollup_exact_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-HLL re-aggregation (the :259-265 sketch-as-data path):
    per-day register relations max-merged to months. The max merge is a
    LOSSLESS idempotent semilattice, so the merged estimate is bit-equal
    to a direct month build — which is what the oracle computes."""
    from hive_udf_spark.functions.hllp import (
        hllp_estimate,
        hllp_merge_table,
        hllp_table,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = hllp_table(
        ev.withColumn("month", F.date_trunc("month", "ts")).withColumn(
            "day", F.date_trunc("day", "ts")
        ),
        ["month", "day"],
        "user_id",
        m=_HLLP_M,
        seed=_HLLP_SEED,
    )
    rolled = hllp_merge_table(daily, ["month"])
    return hllp_estimate(rolled, ["month"], m=_HLLP_M).select(
        "month", "n_zero", F.col("est_hllp").alias("est_users")
    )


_HIST_BINS = 8


@register(
    "profile_histogram_totalprice",
    oracle=f"""
    WITH vc AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS k
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
    ),
    cum AS (
      SELECT v, k,
             sum(k) OVER (ORDER BY v ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - k AS lo,
             sum(k) OVER () AS n
      FROM vc
    ),
    binned AS (
      SELECT CAST((lo * {_HIST_BINS}) // n + 1 AS INT) AS bin, v, k FROM cum
    )
    SELECT bin,
           CAST(min(v) AS BIGINT) AS lo_value,
           CAST(max(v) AS BIGINT) AS hi_value,
           CAST(sum(k) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_distinct
    FROM binned GROUP BY bin
    """,
)
def profile_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram (operators/profile.py equi_depth_histogram):
    8 ~equal-row bins of o_totalprice in integer cents — the
    selectivity statistic that stays accurate under skew, computed
    without ever sorting rows (partial-aggregated value counts cumsum'd
    over DISTINCT values). Integer bin assignment reproduces
    bit-for-bit in the oracle: boundaries, depths, and per-bin distinct
    counts all hash-match."""
    from hive_udf_spark.operators.profile import equi_depth_histogram

    orders = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return equi_depth_histogram(orders, "cents", bins=_HIST_BINS)


def _hllp_intersect_oracle() -> str:
    from hive_udf_spark.functions.hllp import hllp_estimate_sql

    def est(where: str, alias: str) -> str:
        inner = hllp_estimate_sql(
            f"(SELECT o_custkey FROM orders WHERE {where})",
            "'g'", "o_custkey", _HLLP_M, _HLLP_SEED,
        )
        return f"{alias} AS (SELECT est_hllp AS e FROM ({inner}))"

    a = est("o_orderpriority = '1-URGENT'", "ea")
    b = est("o_orderpriority = '2-HIGH'", "eb")
    u = est("o_orderpriority IN ('1-URGENT', '2-HIGH')", "eu")
    return f"""
    WITH {a}, {b}, {u}
    SELECT ea.e AS est_a, eb.e AS est_b, eu.e AS est_union,
           CAST(greatest(ea.e + eb.e - eu.e, 0) AS BIGINT) AS est_intersect
    FROM ea, eb, eu
    """


@register("sketch_hllp_intersect_segments", oracle=_hllp_intersect_oracle())
def sketch_hllp_intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-HLL set intersection via inclusion–exclusion
    (functions/hllp.py hllp_intersect_estimate): URGENT ∩ HIGH customer
    overlap from the two register relations plus their lossless
    max-merge union — every term bit-exact in the oracle (the union
    sketch over concatenated rows ≡ the merge, the :259-265 property).
    Completes the portable family's set algebra next to KMV's
    sample-based union/intersect/jaccard/difference."""
    from hive_udf_spark.functions.hllp import hllp_intersect_estimate, hllp_table

    orders = load_table(spark, sf_dir, "orders")
    a = hllp_table(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        [], "o_custkey", m=_HLLP_M, seed=_HLLP_SEED,
    )
    b = hllp_table(
        orders.filter(F.col("o_orderpriority") == "2-HIGH"),
        [], "o_custkey", m=_HLLP_M, seed=_HLLP_SEED,
    )
    return hllp_intersect_estimate(a, b, m=_HLLP_M)


@register(
    "profile_ks_drift_by_source",
    oracle="""
    WITH pv AS (
      SELECT n_chars AS v, count(*) AS c_all FROM documents
      WHERE n_chars IS NOT NULL GROUP BY 1
    ),
    pgv AS (
      SELECT source AS g, n_chars AS v, count(*) AS c_grp FROM documents
      WHERE n_chars IS NOT NULL GROUP BY 1, 2
    ),
    gs AS (SELECT g, sum(c_grp) AS n_grp FROM pgv GROUP BY 1),
    na AS (SELECT sum(c_all) AS n_all FROM pv),
    ca AS (
      SELECT v, sum(c_all) OVER (
        ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS cum_all FROM pv
    ),
    grid AS (
      SELECT gs.g, gs.n_grp, ca.v, ca.cum_all, coalesce(pgv.c_grp, 0) AS c_grp
      FROM gs CROSS JOIN ca LEFT JOIN pgv ON pgv.g = gs.g AND pgv.v = ca.v
    ),
    e AS (
      SELECT g, n_grp, v, cum_all,
             sum(c_grp) OVER (
               PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_grp
      FROM grid
    ),
    d AS (
      SELECT g, n_grp, v,
             abs(cum_grp * na.n_all - cum_all * n_grp) AS d, na.n_all
      FROM e CROSS JOIN na
    ),
    rk AS (
      SELECT *, row_number() OVER (PARTITION BY g ORDER BY d DESC, v ASC) AS rn
      FROM d
    )
    SELECT g AS source, CAST(n_grp AS BIGINT) AS n_grp,
           CAST((d::HUGEINT * 1000000) // (n_grp::HUGEINT * n_all) AS BIGINT) AS ks_ppm,
           CAST(v AS BIGINT) AS ks_at_value
    FROM rk WHERE rn = 1
    """,
)
def profile_ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution-drift alarm (r8, operators/profile.py
    ks_drift): the exact Kolmogorov–Smirnov statistic between each
    source's document-length distribution and the pooled corpus, in
    cross-multiplied integer arithmetic (no float ECDFs) so both
    engines agree bit-for-bit — the ingest-monitoring check that flags
    a source whose scraper started truncating pages before the
    mixture weights drift.  Both running sums are windows over the
    bounded distinct-value relation; the base table is scanned once
    per count aggregation, never per value."""
    from hive_udf_spark.operators.profile import ks_drift

    docs = load_table(spark, sf_dir, "documents")
    return ks_drift(docs.select("source", "n_chars"), "source", "n_chars")


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1 :]
]


def _corr_oracle() -> str:
    parts = [
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"round(corr({a}, {b}), 6) AS corr6, "
        f"CAST(count(*) AS BIGINT) AS n_rows FROM lineitem"
        for a, b in _CORR_PAIRS
    ]
    return " UNION ALL ".join(parts)


@register("profile_correlation_matrix", oracle=_corr_oracle())
def profile_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation over the lineitem measures in ONE
    aggregate pass (all 6 pairs of 4 columns as co-moment aggregates in
    a single wide agg, then an unpivot): the feature-correlation
    pre-flight of a training-data ingest.  Co-moments are partial-
    aggregable, so the plan is map-side partials -> one final reduce —
    no extra shuffle, no second scan, and the unpivot runs on a 1-row
    relation.  Rounded to 6 decimals in both engines (corr is
    scale-free, |r| <= 1, so fixed-point rounding is robust to
    summation-order noise)."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [
        F.round(F.corr(a, b), 6).alias(f"c_{i}")
        for i, (a, b) in enumerate(_CORR_PAIRS)
    ]
    one = li.agg(*aggs, F.count("*").alias("n"))
    stack_args = ", ".join(
        f"'{a}', '{b}', c_{i}" for i, (a, b) in enumerate(_CORR_PAIRS)
    )
    return one.selectExpr(
        f"stack({len(_CORR_PAIRS)}, {stack_args}) AS (col_a, col_b, corr6)",
        "n AS n_rows",
    ).select("col_a", "col_b", "corr6", F.col("n_rows").cast("long").alias("n_rows"))


@register(
    "profile_winsorize_totalprice",
    oracle="""
    WITH b AS (
      SELECT round(quantile_cont(o_totalprice, 0.01), 4) AS p01,
             round(quantile_cont(o_totalprice, 0.99), 4) AS p99
      FROM orders
    )
    SELECT o_orderkey,
           round(least(greatest(o_totalprice, p01), p99), 2) AS winsorized,
           (o_totalprice < p01) AS clipped_low,
           (o_totalprice > p99) AS clipped_high
    FROM orders, b
    """,
)
def profile_winsorize_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the outlier-clamp preprocessing step of a feature
    pipeline: exact p01/p99 (interpolated, the shared type-7 definition
    in both engines, rounded to 4dp so the clamp boundary is identical
    bits cross-engine) broadcast to the fact scan, every value clamped
    into [p01, p99].  The quantiles come from operators/profile.py's
    ``exact_quantiles`` — Spark's built-in exact ``percentile`` merges a
    counts-map of every distinct value on ONE node (a single-node sort
    in disguise when distinct ≈ rows, as o_totalprice is), while this
    path ranks distinct values with the distributed prefix-sum splice
    and picks each p's two bracketing values by rank containment.  The
    clamp itself is a map-side projection — no window, no sort of the
    fact table."""
    from hive_udf_spark.operators.profile import exact_quantiles

    orders = load_table(spark, sf_dir, "orders")
    q = exact_quantiles(orders, "o_totalprice", [0.01, 0.99])
    b = q.agg(
        F.round(F.max(F.when(F.col("p") == 0.01, F.col("quantile"))), 4).alias("p01"),
        F.round(F.max(F.when(F.col("p") == 0.99, F.col("quantile"))), 4).alias("p99"),
    )
    return orders.crossJoin(F.broadcast(b)).select(
        "o_orderkey",
        F.round(
            F.least(F.greatest(F.col("o_totalprice"), F.col("p01")), F.col("p99")),
            2,
        ).alias("winsorized"),
        (F.col("o_totalprice") < F.col("p01")).alias("clipped_low"),
        (F.col("o_totalprice") > F.col("p99")).alias("clipped_high"),
    )


@register(
    "profile_percent_rank_totalprice",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER (ORDER BY o_totalprice), 6) AS pct_rank,
           CAST(rank() OVER (ORDER BY o_totalprice) - 1 AS BIGINT) AS n_below
    FROM orders
    """,
)
def profile_percent_rank_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global percent_rank for EVERY row without a global sort:
    the rank of each distinct value comes from ranked_distinct (the
    distributed prefix-sum splice), and rows pick their rank up by a
    hash equi-join on the value — so the fact table never sorts and no
    unpartitioned window exists, where the naive
    percent_rank() OVER (ORDER BY x) is a one-node sort of the corpus.
    percent_rank = n_strictly_below / (n − 1), ties sharing their first
    position (the SQL definition the oracle pins)."""
    from hive_udf_spark.operators.profile import ranked_distinct

    orders = load_table(spark, sf_dir, "orders")
    rd = ranked_distinct(orders, "o_totalprice").select(
        F.col("__v").alias("__jv"), "__lo", "__n"
    )
    return orders.join(rd, orders["o_totalprice"] == rd["__jv"]).select(
        "o_orderkey",
        F.round(
            F.col("__lo").cast("double")
            / (F.col("__n") - 1).cast("double"),
            6,
        ).alias("pct_rank"),
        F.col("__lo").cast("long").alias("n_below"),
    )
