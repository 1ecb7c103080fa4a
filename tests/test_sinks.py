"""Sink layout guarantees: partition pruning, shuffle-free bucketed joins,
sketch-table round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_udf_spark.functions import approx_distinct, sketch_estimate, sketch_merge_agg
from hive_udf_spark.sources import load_table
from hive_udf_spark.sources.sinks import (
    read_sketch_table,
    write_bucketed,
    write_partitioned,
    write_sketch_table,
)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, "lang")
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    one = back.filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # pruning: the scan reads only the lang=en directory
    assert "PartitionFilters" in plan and "lang" in plan
    assert one.count() == docs.filter(F.col("lang") == "en").count()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # warehouse dir is static config; managed test tables are dropped below
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "t_orders_b", "o_orderkey", num_buckets=4, sort_by="o_orderkey")
    write_bucketed(lineitem, "t_lineitem_b", "l_orderkey", num_buckets=4, sort_by="l_orderkey")
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        # disable broadcast so the test exercises the shuffle decision
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a.o_orderkey == b.l_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == lineitem.join(orders, orders.o_orderkey == lineitem.l_orderkey).count()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_sketch_table_roundtrip_reaggregates(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        approx_distinct("user_id").alias("s")
    )
    path = str(tmp_path / "daily_sketches")
    write_sketch_table(daily, path)
    back = read_sketch_table(spark, path)
    merged = back.agg(sketch_merge_agg("s").alias("m")).select(
        F.col("m.cardinality").alias("est")
    )
    est = merged.collect()[0]["est"]
    exact = events.select("user_id").distinct().count()
    assert est == pytest.approx(exact, rel=0.05)
