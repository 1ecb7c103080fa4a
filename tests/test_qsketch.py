"""Mergeable quantile-sample sketch tests (functions/qsketch.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_udf_spark.functions.qsketch import (
    qsketch_merge_table,
    qsketch_quantile,
    quantile_sketch_table,
)
from hive_udf_spark.sources import load_table


def _orders_cents(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100).cast("bigint")
    )


def test_quantile_rank_error_within_binomial_bound(spark, sf_dir):
    """The guarantee is on RANK, not value: the sketch's q-quantile must
    sit at an empirical rank within ~4·√(q(1−q)/k) of q (±1/n slack)."""
    import math

    orders = _orders_cents(spark, sf_dir)
    k = 256
    sk = quantile_sketch_table(orders, [], "cents", "o_orderkey", k=k)
    for q in (0.25, 0.5, 0.9):
        est = sk.select(qsketch_quantile("qs", q).alias("v")).collect()[0].v
        n, le = orders.agg(
            F.count("*").alias("n"), F.sum((F.col("cents") <= est).cast("int")).alias("le")
        ).collect()[0]
        bound = 4 * math.sqrt(q * (1 - q) / k) + 1.0 / n
        assert abs(le / n - q) <= bound, f"q={q}: empirical rank {le / n:.4f}"


def test_merge_is_lossless_bottom_k(spark, sf_dir):
    """Rolled-up per-group sketches are BIT-IDENTICAL to a direct global
    build (bottom-k semilattice) — the store-and-reaggregate lifecycle
    with zero merge error."""
    orders = _orders_cents(spark, sf_dir)
    per_group = quantile_sketch_table(
        orders, ["o_orderpriority"], "cents", "o_orderkey", k=128, portable=True
    )
    rolled = qsketch_merge_table(per_group, [], "qs", "n_rows", 128).collect()[0]
    direct = quantile_sketch_table(
        orders, [], "cents", "o_orderkey", k=128, portable=True
    ).collect()[0]
    assert rolled.qs == direct.qs
    assert rolled.n_rows == direct.n_rows


def test_partition_independence(spark, sf_dir):
    """The sketch is a pure function of the data, not the partitioning
    (the partial phase keys on spark_partition_id but never emits it)."""
    orders = _orders_cents(spark, sf_dir)
    a = quantile_sketch_table(orders.repartition(3), [], "cents", "o_orderkey", k=64,
                              portable=True).collect()[0]
    b = quantile_sketch_table(orders.repartition(17), [], "cents", "o_orderkey", k=64,
                              portable=True).collect()[0]
    assert a.qs == b.qs and a.n_rows == b.n_rows


def test_null_skip_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "k long, v long"
    )
    row = quantile_sketch_table(df, [], "v", "k", k=8).collect()[0]
    assert row.n_rows == 2 and len(row.qs) == 2
    with pytest.raises(ValueError, match="k must be"):
        quantile_sketch_table(df, [], "v", "k", k=0)
    with pytest.raises(ValueError, match="q must be"):
        qsketch_quantile("qs", 1.5)
    # all-null input, global form: one empty-sketch row (global-agg
    # semantics) whose quantile is NULL
    empty = spark.createDataFrame([(None,)], "v long")
    row2 = (
        quantile_sketch_table(empty, [], "v", "v", k=8)
        .select("n_rows", qsketch_quantile("qs", 0.5).alias("q"))
        .collect()[0]
    )
    assert row2.n_rows == 0 and row2.q is None


def test_qsketch_plan_partial_before_exchange_no_python(spark, sf_dir):
    """kmv_table discipline: the partial bottom-k aggregates on (group,
    partition id) BEFORE the exchange — raw rows never shuffle — and the
    whole plan is JVM-side."""
    orders = _orders_cents(spark, sf_dir)
    df = quantile_sketch_table(orders, ["o_orderpriority"], "cents", "o_orderkey", k=64)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_collect_list" in plan  # map-side combine of the pair stream


def test_qsketch_sql_scalars_parity(spark, sf_dir):
    """SQL surface ≡ DataFrame API: qsketch_quantile and qsketch_union
    registered as CREATE TEMPORARY FUNCTIONs give the same values as the
    Python helpers (and union matches the lossless merge)."""
    from hive_udf_spark.functions import register_sql

    register_sql(spark)
    orders = _orders_cents(spark, sf_dir)
    per_group = quantile_sketch_table(
        orders, ["o_orderpriority"], "cents", "o_orderkey", k=64, portable=True
    )
    per_group.createOrReplaceTempView("qs_groups")
    sql_rows = {
        r.g: r.q50
        for r in spark.sql(
            "SELECT o_orderpriority AS g, qsketch_quantile(qs, 0.5) AS q50 FROM qs_groups"
        ).collect()
    }
    api_rows = {
        r.o_orderpriority: r.q50
        for r in per_group.select(
            "o_orderpriority", qsketch_quantile("qs", 0.5).alias("q50")
        ).collect()
    }
    assert sql_rows == api_rows and len(sql_rows) == 5
    # pairwise union through SQL equals the relational merge of two groups
    two = spark.sql(
        """
        SELECT qsketch_union(a.qs, b.qs, 64) AS u
        FROM qs_groups a JOIN qs_groups b
          ON a.o_orderpriority = '1-URGENT' AND b.o_orderpriority = '5-LOW'
        """
    ).collect()[0].u
    direct = qsketch_merge_table(
        per_group.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")),
        [], "qs", "n_rows", 64,
    ).collect()[0].qs
    assert [ (p.h, p.v) for p in two ] == [ (p.h, p.v) for p in direct ]


def test_bounded_buffer_mode_identical_and_windowgrouplimit(spark, sf_dir):
    """bounded_buffer=True (r4 verdict finding 3) must produce the
    bit-identical sketch via a map-side Partial WindowGroupLimit plan —
    strict O(k) per-cell state instead of the default's O(partition-rows)
    collect_list buffer — including over an artificially fat single
    partition and on empty global input."""
    orders = _orders_cents(spark, sf_dir)
    a = quantile_sketch_table(orders, ["o_orderpriority"], "cents", "o_orderkey", k=64)
    b = quantile_sketch_table(
        orders, ["o_orderpriority"], "cents", "o_orderkey", k=64, bounded_buffer=True
    )
    key = lambda df: {
        r.o_orderpriority: ([(p.h, p.v) for p in r.qs], r.n_rows) for r in df.collect()
    }
    assert key(a) == key(b)
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan

    fat = orders.repartition(1)
    fa = quantile_sketch_table(fat, [], "cents", "o_orderkey", k=32).collect()[0]
    fb = quantile_sketch_table(
        fat, [], "cents", "o_orderkey", k=32, bounded_buffer=True
    ).collect()[0]
    assert [(p.h, p.v) for p in fa.qs] == [(p.h, p.v) for p in fb.qs]
    assert fa.n_rows == fb.n_rows > 0

    empty = orders.filter(F.lit(False))
    row = quantile_sketch_table(
        empty, [], "cents", "o_orderkey", k=8, bounded_buffer=True
    ).collect()
    assert len(row) == 1 and list(row[0].qs) == [] and row[0].n_rows == 0


def test_bounded_buffer_keeps_null_group(spark):
    """A NULL group-key value is a real group in BOTH modes (the
    bounded mode's sample-counts join must be null-safe)."""
    from pyspark.sql import functions as F

    from hive_udf_spark.functions.qsketch import quantile_sketch_table

    df = spark.createDataFrame(
        [(None, 1, 10), (None, 2, 20), ("a", 3, 30), ("a", 4, 40)],
        "g string, id bigint, v bigint",
    )
    out_default = quantile_sketch_table(df, ["g"], "v", "id", k=8)
    out_bounded = quantile_sketch_table(df, ["g"], "v", "id", k=8, bounded_buffer=True)
    d = {r.g: (tuple((p.h, p.v) for p in r.qs), r.n_rows) for r in out_default.collect()}
    b = {r.g: (tuple((p.h, p.v) for p in r.qs), r.n_rows) for r in out_bounded.collect()}
    assert set(d) == set(b) == {None, "a"}
    assert d == b
