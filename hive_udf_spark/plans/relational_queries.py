"""Host-engine relational operators with exact DuckDB oracles.

The reference delegates scan/filter/group-by/join to its host
(`SELECT approx_distinct(values) FROM src`, UDAFCardinalityEstimator.java:
66-68 — SURVEY.md §2.2). Here the host is Catalyst; these queries make the
host surface judgeable: scans with pushdown, hash aggregation, broadcast +
shuffle joins, windows, rollup, set ops, pivot, sessionization, JSON.

Determinism for the value-hash gate: float aggregates are rounded (sums to
2 decimals, avgs to 4) in BOTH engines, and every rank/top-k orders by the
ROUNDED measure with an id tiebreak, so summation-order noise (~1e-10)
cannot flip a comparison.

Scale notes (100 TB): filters are pushed to the parquet scan (verified via
.explain in tests/test_plans.py); nation/region joins are broadcast; the
orders↔lineitem join shuffles on the join key and benefits from AQE; no
Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_udf_spark.plans.registry import register
from hive_udf_spark.sources import load_table


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan + filter (pushed down) + hash aggregate with 8 measures."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3_top_revenue_orders",
    oracle="""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + aggregate + global top-k (rounded tiebreak)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_regional_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def tpch_q5_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join; nation/region/supplier are broadcast
    (small dims), the orders↔lineitem fact join shuffles on key."""
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "window_topk_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, part_revenue, rnk FROM (
      SELECT p_brand, p_partkey, part_revenue,
             row_number() OVER (ORDER BY part_revenue DESC, p_partkey) AS g_rnk,
             row_number() OVER (PARTITION BY p_brand ORDER BY part_revenue DESC, p_partkey) AS rnk
      FROM (
        SELECT p_brand, p_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey))
    WHERE rnk <= 3
    """,
)
def window_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window row_number — ordered by the ROUNDED
    measure with partkey tiebreak so ranks are engine-stable. The unused
    global rank (g_rnk in the oracle) documents that window + aggregate
    compose; only per-brand ranks are emitted."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_part = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("part_revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("part_revenue"), F.asc("p_partkey"))
    return (
        per_part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "part_revenue", "rnk")
    )


@register(
    "rollup_returnflag_linestatus",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate (ROLLUP grouping sets) — subtotals + grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(value), 4) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON path extraction inside an aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@register(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap window pattern (30-min inactivity boundary).
    Deterministic ordering via (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    flagged = ev.withColumn(
        "new_session", F.when(gap_s.isNull() | (gap_s > 30 * 60), F.lit(1)).otherwise(F.lit(0))
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events")
    )


@register(
    "pivot_event_values",
    oracle="""
    SELECT user_id,
           round(coalesce(sum(value) FILTER (event_type = 'click'), 0), 2)    AS click,
           round(coalesce(sum(value) FILTER (event_type = 'view'), 0), 2)     AS view,
           round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 2) AS purchase
    FROM events GROUP BY user_id
    """,
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) with an explicit value list — the scalable
    form: no second pass to discover pivot columns."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.sum("value"))
    )
    return out.select(
        "user_id",
        *[F.round(F.coalesce(F.col(c), F.lit(0.0)), 2).alias(c) for c in ("click", "view", "purchase")],
    )


@register(
    "setops_building_but_no_urgent_order",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT c_custkey FROM customer JOIN orders ON c_custkey = o_custkey
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def setops_building_but_no_urgent_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference expressed as an anti-join (the scalable plan: a
    broadcast/shuffled anti-join instead of a full EXCEPT sort)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select("c_custkey").distinct()


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+global agg. All four predicates push to
    the parquet scan (PushedFilters), only 4 columns read — the query is
    IO-bound and embarrassingly parallel at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: 3-way join + top-20 by revenue. nation is broadcast; the
    l_returnflag filter pushes below the joins; rounded-measure ordering
    with custkey tiebreak keeps ranks deterministic."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%%'
                              THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation over a dimension join. part is
    small relative to lineitem → broadcast; the one-month shipdate filter
    pushes to the scan so the join sees ~1/84th of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q16ish_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_size >= 20
    GROUP BY p.p_brand, p.p_type
    """,
)
def tpch_q16ish_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-style: exact COUNT(DISTINCT) per group through a join — the
    exact counterpart to approx_distinct (Catalyst expands it to a
    two-phase distinct aggregate; at 100 TB the sketch version trades a
    second shuffle for bounded memory)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2)  AS o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING subquery as a semi-join. The `big` aggregate is
    tiny (high-selectivity HAVING) → broadcast semi-join prunes orders
    before the expensive customer join."""
    li = load_table(spark, sf_dir, "lineitem")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("tq")).filter(F.col("tq") > 150)
    orders = load_table(spark, sf_dir, "orders").join(
        F.broadcast(big.select("l_orderkey")),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    )
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name", "o_orderkey", "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "total_qty",
        )
    )


@register(
    "tpch_q7ish_nation_trade_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS volume_cents
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name
    """,
)
def tpch_q7ish_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-style: cross-nation trade volume through a 5-way star join. Both
    nation legs and supplier broadcast; lineitem⋈orders is the only big
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        # integer-cents sum: order-independent and engine-exact (float sums
        # of ~1e6 over 60k rows differ in the 2nd decimal between engines)
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast("long")).alias("volume_cents")
        )
    )


@register(
    "tpch_q19ish_disjunctive_predicates",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 10)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 20)
       OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity >= 30)
    """,
)
def tpch_q19ish_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-style: OR-of-ANDs across both join sides. Catalyst pushes the
    common sub-predicates (brand IN (...), quantity >= 10) below the join
    via constraint propagation; part broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 30))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@register(
    "cube_event_activity",
    oracle="""
    SELECT coalesce(event_type, '__all__') AS event_type,
           coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), '__all__') AS day,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events
    GROUP BY CUBE (event_type, date_trunc('day', ts))
    """,
)
def cube_event_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all four grouping-set combinations in
    one pass (Catalyst expands to a single Expand+aggregate — one shuffle,
    not four scans)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.cube("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("__all__")).alias("event_type"),
            F.coalesce(F.date_format("day", "yyyy-MM-dd"), F.lit("__all__")).alias("day"),
            "n",
            "sum_value_cents",
        )
    )


@register(
    "window_running_customer_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def window_running_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer revenue: frame-bounded window aggregate +
    row_number with a deterministic (date, key) ordering."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "salted_join_event_enrichment",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment,
           round(c.c_acctbal, 2) AS c_acctbal
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def salted_join_event_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join through salted_join (operators/skew.py): events carry
    few, very hot user_ids (150 distinct across the corpus); the salt
    spreads each hot key over 8 tasks. Result is exactly the plain join —
    the oracle proves it."""
    from hive_udf_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_acctbal")
    )
    return salted_join(ev, cust, on="user_id", salt_factor=8, big_unique_col="event_id").select(
        "event_id", "user_id", "c_mktsegment", F.round("c_acctbal", 2).alias("c_acctbal")
    )


# ---------------------------------------------------------------------------
# Subquery shapes: EXISTS / NOT EXISTS / correlated scalar — the remaining
# host-engine join semantics a reference user would expect (semi/anti joins
# and decorrelated scalar subqueries in Spark; literal subqueries in the
# DuckDB oracle, so BOTH decorrelation strategies are pinned to agree).
# ---------------------------------------------------------------------------


@register(
    "tpch_q4ish_exists_late_ship",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4ish_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → LEFT SEMI join (orders with any line item
    shipped after the order date), counted per priority. Catalyst plans a
    semi join — no row duplication, no distinct needed — while the oracle
    runs the literal EXISTS subquery."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        lineitem,
        (orders.o_orderkey == lineitem.l_orderkey)
        & (lineitem.l_shipdate > orders.o_orderdate),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "tpch_q13ish_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def tpch_q13ish_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customers-per-order-count histogram INCLUDING the
    zero bucket — the left outer join + count(non-null) idiom that inner
    joins silently get wrong."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q17ish_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    WHERE l.l_quantity * 2 * (
      SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    ) < (
      SELECT sum(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    """,
)
def tpch_q17ish_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from line items whose quantity is below
    half the part's average — a correlated scalar subquery, decorrelated
    in Spark as a per-part aggregate + join. The threshold comparison is
    cross-multiplied (qty·2·count < sum) so both engines compare the
    same exact integral doubles instead of a division result."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = lineitem.groupBy("l_partkey").agg(
        F.count("*").alias("__cnt"), F.sum("l_quantity").alias("__qty_sum")
    )
    joined = lineitem.join(per_part, "l_partkey")
    small = joined.filter(
        F.col("l_quantity") * 2 * F.col("__cnt") < F.col("__qty_sum")
    )
    return small.agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))


@register(
    "tpch_q22ish_idle_rich_customers",
    oracle="""
    WITH thresh AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c, thresh t
    WHERE c.c_acctbal > t.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def tpch_q22ish_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no URGENT
    order — scalar subquery threshold (broadcast single-row cross join)
    + NOT EXISTS with a correlated filter (LEFT ANTI join over the
    filtered build side), grouped per market segment."""
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    thresh = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__a")
    )
    rich = customer.crossJoin(F.broadcast(thresh)).filter(
        F.col("c_acctbal") > F.col("__a")
    )
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "leftanti")
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


# ---------------------------------------------------------------------------
# Round-2 widening: the remaining classic TPC-H plan shapes, adapted to the
# fixture schema (no partsupp/shipmode/receiptdate columns — FIXTURES.md).
# ---------------------------------------------------------------------------

_CENTS = "CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)"


def _rev_cents(li_prefix: str = "") -> "F.Column":
    ep = F.col(f"{li_prefix}l_extendedprice")
    disc = F.col(f"{li_prefix}l_discount")
    return F.round(ep * (1 - disc) * 100, 0).cast("long")


@register(
    "tpch_q2ish_min_cost_supplier",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS u
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p.p_partkey, s.s_name, round(u.u, 6) AS unit_price
    FROM unit u
      JOIN part p ON p.p_partkey = u.l_partkey
      JOIN supplier s ON s.s_suppkey = u.l_suppkey
    WHERE p.p_size < 20 AND p.p_type = 'STANDARD'
      AND u.u = (SELECT min(u2.u) FROM unit u2 WHERE u2.l_partkey = u.l_partkey)
    """,
)
def tpch_q2ish_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) offering
    the minimum unit price — a correlated scalar-min subquery, decorrelated
    as a per-part min aggregate joined back on equality. Unit price is a
    single IEEE division both engines compute identically, so the equality
    join is exact. part and supplier are broadcast dims."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") < 20) & (F.col("p_type") == "STANDARD")
    )
    supp = load_table(spark, sf_dir, "supplier")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("__u")
    )
    per_part_min = unit.groupBy("l_partkey").agg(F.min("__u").alias("__umin"))
    return (
        unit.join(per_part_min, "l_partkey")
        .filter(F.col("__u") == F.col("__umin"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "s_name", F.round("__u", 6).alias("unit_price"))
    )


@register(
    "tpch_q8ish_market_share",
    oracle=f"""
    WITH rev AS (
      SELECT year(o.o_orderdate) AS o_year,
             n2.n_name AS supp_nation,
             {_CENTS} AS cents
      FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST((sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) * 1000000)
             // sum(cents) AS BIGINT) AS share_ppm
    FROM rev GROUP BY o_year
    """,
)
def tpch_q8ish_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's yearly
    order revenue — 7-table star join, conditional aggregation, and an
    integer-ppm share ((nation·1e6) div total) so the ratio is exact in
    both engines. All dims broadcast; lineitem⋈orders is the only big
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            "supp_nation",
            _rev_cents().alias("__cents"),
        )
    )
    is_cn = F.when(F.col("supp_nation") == "NATION_3", F.col("__cents")).otherwise(F.lit(0))
    return rev.groupBy("o_year").agg(
        F.sum(is_cn).alias("nation_cents"),
        F.sum("__cents").alias("total_cents"),
        F.expr(
            "(sum(CASE WHEN supp_nation = 'NATION_3' THEN __cents ELSE 0 END) * 1000000)"
            " div sum(__cents)"
        ).alias("share_ppm"),
    )


@register(
    "tpch_q9ish_nation_profit",
    oracle="""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                                - 0.1 * p.p_retailprice * l.l_quantity) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS profit_cents
    FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9ish_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    part-name LIKE filter. partsupp's supplycost doesn't exist in the
    fixture schema, so cost is modeled as 10% of retail price × quantity
    (stated, deterministic). Per-row cents rounding keeps the sum exact.
    The LIKE filter prunes part before the broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        F.round(
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
            )
            * 100,
            0,
        )
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).alias("profit_cents"))
    )


@register(
    "tpch_q12ish_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def tpch_q12ish_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → linestatus, the fixture's analogue):
    conditional counts of high/low-priority orders per line status over a
    one-year shipdate window. The filter pushes to the lineitem scan;
    counts are exact integers."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q15ish_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, CAST(sum({_CENTS}) AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
    """,
)
def tpch_q15ish_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a quarter —
    an aggregated view consumed twice (per-supplier revenue + its global
    max as a scalar subquery). Integer-cents revenue makes the max-equality
    exact; the single-row max side is a broadcast cross join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_cents()).alias("total_cents"))
    mx = rev.agg(F.max("total_cents").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_cents")
    )


@register(
    "tpch_q20ish_bulk_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 120.0
    )
    """,
)
def tpch_q20ish_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved bulk volume of some part — an
    IN-subquery over a grouped HAVING, planned as a semi-join against the
    aggregated build side. Quantities are integral doubles, so the HAVING
    sum is exact. supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    bulk = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 120.0)
        .select("l_suppkey")
    )
    return (
        supp.join(bulk, supp.s_suppkey == bulk.l_suppkey, "leftsemi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


@register(
    "tpch_q21ish_sole_returned_supplier",
    oracle="""
    WITH returned AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    members AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT s.s_name, count(*) AS numwait
    FROM returned r
      JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM members m
                  WHERE m.l_orderkey = r.l_orderkey AND m.l_suppkey <> r.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM returned r2
                      WHERE r2.l_orderkey = r.l_orderkey
                        AND r2.l_suppkey <> r.l_suppkey)
    GROUP BY s.s_name
    """,
)
def tpch_q21ish_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per supplier, orders where it was the ONLY supplier
    with a returned item although other suppliers participated — the
    classic doubly-correlated EXISTS + NOT EXISTS, planned as a semi-join
    then an anti-join with non-equi correlation conditions."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    members = li.select("l_orderkey", "l_suppkey").distinct()
    r = returned.alias("r")
    exists_other = r.join(
        members.alias("m"),
        (F.col("r.l_orderkey") == F.col("m.l_orderkey"))
        & (F.col("r.l_suppkey") != F.col("m.l_suppkey")),
        "leftsemi",
    )
    sole = exists_other.alias("r").join(
        returned.alias("r2"),
        (F.col("r.l_orderkey") == F.col("r2.l_orderkey"))
        & (F.col("r.l_suppkey") != F.col("r2.l_suppkey")),
        "leftanti",
    )
    return (
        sole.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "tpch_q11ish_important_part_values",
    oracle=f"""
    WITH per_part AS (
      SELECT l.l_partkey, CAST(sum({_CENTS}) AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_1'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, value_cents
    FROM per_part
    WHERE value_cents * 1000 > (SELECT CAST(sum(value_cents) AS BIGINT) FROM per_part)
    """,
)
def tpch_q11ish_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (the last classic TPC-H query form in the suite):
    per-part value held by one nation's suppliers, HAVING value greater
    than a fixed fraction (0.1%) of the nation's TOTAL value — a grouped
    aggregate filtered against a global scalar aggregate of itself.

    Scale: nation+supplier are broadcast (dimension tables); lineitem
    aggregates once into per_part, which is reused for both the HAVING
    input and the scalar total — the total is a one-row broadcast cross
    join, not a recomputation. The fraction test is pure integer math
    (value·1000 > total), exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat_supp = supp.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    per_part = (
        li.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev_cents()).alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("__tot"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("__tot"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH base AS (
      SELECT DISTINCT user_id FROM events
      WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL
    ),
    s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT base.user_id,
           s1.t1 AS step_1_ts, s2.t2 AS step_2_ts, s3.t3 AS step_3_ts,
           coalesce(s3.t3 IS NOT NULL
                    AND CAST(floor(epoch(s3.t3)) AS BIGINT) - CAST(floor(epoch(s1.t1)) AS BIGINT) <= 72 * 3600,
                    false) AS completed
    FROM base
      LEFT JOIN s1 USING (user_id)
      LEFT JOIN s2 USING (user_id)
      LEFT JOIN s3 USING (user_id)
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase within 72 h
    (operators/temporal.py funnel_steps): ONE sorted fold per user —
    single shuffle, no joins — whose earliest-chain semantics provably
    equal the oracle's nested strictly-after mins (three agg-join
    rounds). Timestamps and the completion flag must match exactly."""
    from hive_udf_spark.operators.temporal import funnel_steps

    events = load_table(spark, sf_dir, "events")
    return funnel_steps(
        events, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], within_hours=72,
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH w AS (
      SELECT user_id, date_trunc('week', ts) AS b FROM events
      WHERE ts IS NOT NULL
    ),
    fu AS (SELECT user_id, min(b) AS first FROM w GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, b FROM w)
    SELECT fu.first AS cohort,
           CAST(date_diff('day', fu.first::DATE, act.b::DATE) // 7 AS BIGINT) AS "offset",
           count(*) AS n_users
    FROM act JOIN fu USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (operators/temporal.py
    cohort_retention): per user one (first-week, distinct-weeks) row —
    single shuffle with map-side partial aggregation over the bounded
    week domain — exploded to (cohort, offset) counts. offset 0 is the
    cohort size; exact integer counts, exact hash match."""
    from hive_udf_spark.operators.temporal import cohort_retention

    events = load_table(spark, sf_dir, "events")
    return cohort_retention(events, "user_id", "ts", bucket="week")


@register(
    "skew_report_lineitem",
    oracle="""
    WITH counts AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS key, count(*) AS cnt
      FROM lineitem GROUP BY 1
    ),
    summary AS (
      SELECT sum(cnt) AS n_rows, count(*) AS n_keys, max(cnt) AS max_count
      FROM counts
    ),
    asc_r AS (
      SELECT key, cnt, row_number() OVER (ORDER BY cnt ASC, key ASC) AS rn
      FROM counts
    ),
    quant AS (
      SELECT
        max(CASE WHEN rn = CAST(floor(0.5 * (s.n_keys - 1)) AS BIGINT) + 1 THEN cnt END) AS p50_count,
        max(CASE WHEN rn = CAST(floor(0.99 * (s.n_keys - 1)) AS BIGINT) + 1 THEN cnt END) AS p99_count
      FROM asc_r, summary s
    ),
    top AS (
      SELECT key, cnt, row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank
      FROM counts
    )
    SELECT CAST(rank AS INT) AS rank, key, CAST(cnt AS BIGINT) AS cnt,
           CAST(s.n_rows AS BIGINT) AS n_rows, CAST(s.n_keys AS BIGINT) AS n_keys,
           CAST(q.p50_count AS BIGINT) AS p50_count,
           CAST(q.p99_count AS BIGINT) AS p99_count,
           CAST(s.max_count AS BIGINT) AS max_count,
           CAST(least(64, (s.max_count + greatest(s.n_rows // s.n_keys, 1) - 1)
                 // greatest(s.n_rows // s.n_keys, 1)) AS BIGINT) AS recommended_salt
    FROM top, summary s, quant q
    WHERE rank <= 10
    """,
)
def skew_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics (operators/skew.py skew_report): the
    pre-flight report that decides whether l_suppkey needs salted_join —
    top-10 heaviest keys, exact deterministic count quantiles, and a
    recommended salt factor, all from one partial-aggregated pass over
    the key-count relation. Integer math end to end: hash-exact."""
    from hive_udf_spark.operators.skew import skew_report

    lineitem = load_table(spark, sf_dir, "lineitem")
    return skew_report(lineitem, ["l_suppkey"], top_k=10)


@register(
    "maintenance_snapshot_diff",
    oracle="""
    WITH v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0
                  THEN round(o_totalprice + 1, 2) ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % 97 != 0
      UNION ALL
      SELECT o_orderkey + 1000000000, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 41 = 0
    ),
    v1 AS (SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders),
    j AS (
      SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
             v1.o_orderkey IS NULL AS added,
             v2.o_orderkey IS NULL AS removed,
             (v1.o_totalprice IS DISTINCT FROM v2.o_totalprice)
             OR (v1.o_orderpriority IS DISTINCT FROM v2.o_orderpriority) AS changed
      FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
    )
    SELECT o_orderkey,
           CASE WHEN added THEN 'added'
                WHEN removed THEN 'removed'
                WHEN changed THEN 'changed' END AS change_type
    FROM j
    WHERE added OR removed OR changed
    """,
)
def maintenance_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot change detection (sources/sinks.py snapshot_diff): v2
    simulates an ingest cycle — every 97th order deleted, every 13th
    repriced, every 41st re-ingested under a new key — and the diff
    emits exactly the added/removed/changed keys (unchanged rows
    excluded), null-safe per column. One full-outer key join; the audit
    primitive for incremental pipelines."""
    from hive_udf_spark.sources.sinks import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v2 = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.round(F.col("o_totalprice") + 1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderpriority",
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 41 == 0).select(
            (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
            "o_totalprice",
            "o_orderpriority",
        )
    )
    return snapshot_diff(orders, v2, ["o_orderkey"])


@register(
    "maintenance_scd2_apply",
    oracle="""
    WITH fl AS (
      SELECT o_custkey,
             arg_min(o_orderpriority, o_orderkey) AS first_p,
             arg_max(o_orderpriority, o_orderkey) AS last_p
      FROM orders WHERE o_custkey IS NOT NULL
      GROUP BY o_custkey
    )
    SELECT o_custkey, first_p AS o_orderpriority,
           TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to
    FROM fl WHERE first_p = last_p
    UNION ALL
    SELECT o_custkey, first_p,
           TIMESTAMP '2026-01-01 00:00:00',
           TIMESTAMP '2026-02-01 00:00:00'
    FROM fl WHERE first_p != last_p
    UNION ALL
    SELECT o_custkey, last_p,
           TIMESTAMP '2026-02-01 00:00:00',
           CAST(NULL AS TIMESTAMP)
    FROM fl WHERE first_p != last_p
    """,
)
def maintenance_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension maintenance (operators/scd.py scd2_apply):
    a customer-priority dimension seeded from each customer's earliest
    order receives a change batch carrying the latest order's priority
    — keys whose attribute changed get their current row closed at the
    batch's effective timestamp and a new current row opened; unchanged
    keys stay untouched. The oracle derives the expected post-apply
    table from scratch (first/last attributes via arg_min/arg_max over
    the same deterministic order), so intervals, attributes, and row
    multiplicity all hash-match."""
    from hive_udf_spark.operators.scd import scd2_apply

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
    )
    t1 = F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    t2 = F.to_timestamp(F.lit("2026-02-01 00:00:00"))
    dim = orders.groupBy("o_custkey").agg(
        F.min_by("o_orderpriority", "o_orderkey").alias("o_orderpriority")
    ).select(
        "o_custkey",
        "o_orderpriority",
        t1.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    changes = orders.groupBy("o_custkey").agg(
        F.max_by("o_orderpriority", "o_orderkey").alias("o_orderpriority")
    ).select("o_custkey", "o_orderpriority", t2.alias("effective_ts"))
    return scd2_apply(dim, changes, ["o_custkey"], ["o_orderpriority"])


@register(
    "maintenance_scd2_point_in_time",
    oracle="""
    WITH fl AS (
      SELECT o_custkey,
             arg_min(o_orderpriority, o_orderkey) AS first_p,
             arg_max(o_orderpriority, o_orderkey) AS last_p
      FROM orders WHERE o_custkey IS NOT NULL
      GROUP BY o_custkey
    ),
    dim AS (
      SELECT o_custkey, first_p AS tracked_priority,
             TIMESTAMP '1995-01-01 00:00:00' AS vf,
             CASE WHEN first_p != last_p
                  THEN TIMESTAMP '1998-01-01 00:00:00' END AS vt
      FROM fl
      UNION ALL
      SELECT o_custkey, last_p,
             TIMESTAMP '1998-01-01 00:00:00', CAST(NULL AS TIMESTAMP)
      FROM fl WHERE first_p != last_p
    )
    SELECT f.o_orderkey, f.o_custkey, f.o_orderdate,
           d.tracked_priority
    FROM (SELECT o_orderkey, o_custkey, o_orderdate FROM orders
          WHERE o_orderkey % 7 = 0 AND o_custkey IS NOT NULL) f
    LEFT JOIN dim d
      ON d.o_custkey = f.o_custkey
     AND f.o_orderdate >= d.vf
     AND (d.vt IS NULL OR f.o_orderdate < d.vt)
    """,
)
def maintenance_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD2 dimension
    (operators/scd.py point_in_time_join): each sampled order resolves
    the priority version valid AT ITS OWN o_orderdate — facts replayed
    against history see what was true when they happened (orders before
    the 1998 change date get the first version, later ones the
    current). Non-overlapping intervals mean no fan-out; one custkey-
    keyed equi-join with the interval predicate. The oracle rebuilds
    dim + lookup from scratch."""
    from hive_udf_spark.operators.scd import point_in_time_join, scd2_apply

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
    )
    t1 = F.to_timestamp(F.lit("1995-01-01 00:00:00"))
    t2 = F.to_timestamp(F.lit("1998-01-01 00:00:00"))
    dim0 = orders.groupBy("o_custkey").agg(
        F.min_by("o_orderpriority", "o_orderkey").alias("tracked_priority")
    ).select(
        "o_custkey",
        "tracked_priority",
        t1.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    changes = orders.groupBy("o_custkey").agg(
        F.max_by("o_orderpriority", "o_orderkey").alias("tracked_priority")
    ).select("o_custkey", "tracked_priority", t2.alias("effective_ts"))
    dim = scd2_apply(dim0, changes, ["o_custkey"], ["tracked_priority"])
    facts = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return point_in_time_join(facts, dim, ["o_custkey"], "o_orderdate")


@register(
    "quality_checks_tpch",
    oracle="""
    WITH dup_src AS (
      SELECT o_orderkey FROM orders
      UNION ALL
      SELECT o_orderkey FROM orders WHERE o_orderkey % 101 = 0
    ),
    u AS (
      SELECT CAST(count(*) AS BIGINT) AS v FROM (
        SELECT o_orderkey FROM dup_src GROUP BY 1 HAVING count(*) > 1
      )
    ),
    r AS (
      SELECT CAST(count(*) AS BIGINT) AS v FROM (
        SELECT l_orderkey FROM lineitem
        WHERE l_orderkey IS NOT NULL
          AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderkey % 97 != 0)
        GROUP BY 1
      )
    ),
    f1 AS (
      SELECT CAST(count(*) AS BIGINT) AS v FROM (
        SELECT l_orderkey FROM lineitem GROUP BY 1
        HAVING count(DISTINCT l_returnflag) > 1
      )
    ),
    f2 AS (
      SELECT CAST(count(*) AS BIGINT) AS v FROM (
        SELECT o_orderkey FROM orders GROUP BY 1
        HAVING count(DISTINCT o_orderdate) > 1
      )
    ),
    n_dup AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dup_src),
    n_li AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
    n_ord AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
    SELECT 'unique_orderkey' AS check, u.v AS n_violations, n_dup.n AS n_checked
    FROM u, n_dup
    UNION ALL
    SELECT 'fk_lineitem_orders', r.v, n_li.n FROM r, n_li
    UNION ALL
    SELECT 'fd_orderkey_returnflag', f1.v, n_li.n FROM f1, n_li
    UNION ALL
    SELECT 'fd_orderkey_orderdate', f2.v, n_ord.n FROM f2, n_ord
    """,
)
def quality_checks_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality suite (operators/quality.py): four checks with both
    outcomes planted — uniqueness over orders with a duplicated %101
    slice (FAILS with exactly those keys), lineitem→orders referential
    integrity against a parent table missing %97 keys (FAILS with the
    orphaned orders), the false dependency orderkey→returnflag (FAILS
    naturally: multi-line orders mix flags), and the true dependency
    orderkey→orderdate (PASSES: one date per order). One uniform
    report row per check; every count exact in the oracle."""
    from hive_udf_spark.operators.quality import (
        fd_violations,
        quality_report,
        referential_violations,
        uniqueness_violations,
    )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dup_src = orders.select("o_orderkey").unionByName(
        orders.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey")
    )
    parent = orders.filter(F.col("o_orderkey") % 97 != 0)
    return quality_report(
        {
            "unique_orderkey": (
                uniqueness_violations(dup_src, ["o_orderkey"]),
                dup_src,
            ),
            "fk_lineitem_orders": (
                referential_violations(li, parent, {"l_orderkey": "o_orderkey"}),
                li,
            ),
            "fd_orderkey_returnflag": (
                fd_violations(li, ["l_orderkey"], ["l_returnflag"]),
                li,
            ),
            "fd_orderkey_orderdate": (
                fd_violations(orders, ["o_orderkey"], ["o_orderdate"]),
                orders,
            ),
        }
    )
