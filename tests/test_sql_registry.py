"""SQL-surface parity: the reference's CREATE TEMPORARY FUNCTION UX
(UDAFCardinalityEstimator.java:66-68) recreated with Spark SQL UDFs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_udf_spark.functions import approx_distinct, register_sql
from hive_udf_spark.functions.lc import lc_cardinality
from hive_udf_spark.sources import load_table, register_views


@pytest.fixture(scope="module", autouse=True)
def _registered(spark, sf_dir):
    register_sql(spark)
    register_views(spark, sf_dir)


def test_sql_sketch_struct_matches_dataframe_api(spark, sf_dir):
    sql = spark.sql(
        """
        SELECT o_orderpriority,
               sketch_struct(hll_sketch_agg(o_custkey)) AS s
        FROM orders GROUP BY o_orderpriority
        """
    ).select("o_orderpriority", F.col("s.type").alias("t"), F.col("s.cardinality").alias("c"))
    api = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(approx_distinct("o_custkey").alias("s"))
        .select("o_orderpriority", F.col("s.type").alias("t"), F.col("s.cardinality").alias("c"))
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, api.collect()))


def test_sql_sketch_union_and_estimate(spark):
    row = spark.sql(
        """
        WITH s AS (
          SELECT o_orderstatus, hll_sketch_agg(o_custkey) AS sk
          FROM orders GROUP BY o_orderstatus
        )
        SELECT sketch_estimate(sketch_union(a.sk, b.sk)) AS u,
               sketch_estimate(a.sk) AS ea, sketch_estimate(b.sk) AS eb
        FROM s a JOIN s b ON a.o_orderstatus = 'O' AND b.o_orderstatus = 'F'
        """
    ).collect()[0]
    assert row["u"] >= max(row["ea"], row["eb"])


def test_sql_intersect_estimate_disjoint_near_zero(spark):
    # customers partitioned by segment are disjoint sets -> intersection ~ 0
    est = spark.sql(
        """
        WITH s AS (
          SELECT c_mktsegment, hll_sketch_agg(c_custkey) AS sk
          FROM customer GROUP BY c_mktsegment
        )
        SELECT sketch_intersect_estimate(a.sk, b.sk) AS i
        FROM s a JOIN s b
          ON a.c_mktsegment = 'BUILDING' AND b.c_mktsegment = 'MACHINERY'
        """
    ).collect()[0]["i"]
    assert est <= 3


def test_sql_lc_matches_dataframe_lc(spark, sf_dir):
    sql = spark.sql(
        """
        SELECT o_orderpriority,
               lc_estimate(count(DISTINCT lc_bucket(o_custkey, 1000000)), 1000000) AS lc
        FROM orders GROUP BY o_orderpriority
        """
    )
    api = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(lc_cardinality("o_custkey", 1_000_000).alias("lc"))
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, api.collect()))


def test_sql_null_semantics(spark):
    # empty input -> hll_sketch_agg returns NULL -> struct is NULL
    # (reference: empty aggregation returns null, :329-331)
    row = spark.sql(
        "SELECT sketch_struct(hll_sketch_agg(o_custkey)) AS s FROM orders WHERE o_orderkey < 0"
    ).collect()[0]
    assert row["s"] is None


def test_sql_jaccard_matches_python_api(spark, sf_dir):
    from hive_udf_spark.functions import approx_distinct, sketch_jaccard_estimate

    orders = load_table(spark, sf_dir, "orders")
    lo = orders.filter(F.col("o_orderkey") % 2 == 0)
    hi = orders.filter(F.col("o_orderkey") % 3 == 0)
    a = lo.agg(approx_distinct("o_orderkey").alias("s")).collect()[0].s.binary
    b = hi.agg(approx_distinct("o_orderkey").alias("s")).collect()[0].s.binary
    df = spark.createDataFrame([(a, b)], "a binary, b binary")
    df.createOrReplaceTempView("jacc_pair")
    got_sql = spark.sql(
        "SELECT sketch_jaccard_estimate(a, b) AS j FROM jacc_pair"
    ).collect()[0].j
    got_api = df.select(sketch_jaccard_estimate("a", "b").alias("j")).collect()[0].j
    assert got_sql == got_api
    assert 0.0 <= got_api <= 1.0


def test_sql_text_functions_match_dataframe_api(spark, sf_dir):
    from hive_udf_spark.functions.text import (
        bpeish_token_count,
        doc_fingerprint,
        token_count,
    )

    sql = spark.sql(
        """
        SELECT doc_id, token_count(text) AS tc, bpeish_token_count(text) AS bc,
               doc_fingerprint(text) AS fp
        FROM documents
        """
    )
    api = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        token_count("text").alias("tc"),
        bpeish_token_count("text").alias("bc"),
        doc_fingerprint("text").alias("fp"),
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, api.collect()))


def test_sql_uniq_ratio_and_jaccard(spark):
    row = spark.sql(
        """
        SELECT uniq_token_ratio('a b a c') AS r,
               uniq_token_ratio('   ') AS r_empty,
               jaccard_tokens('a b c', 'b c d') AS j,
               jaccard_tokens('', '') AS j_empty
        """
    ).collect()[0]
    assert row["r"] == 0.75
    assert row["r_empty"] is None
    assert abs(row["j"] - 0.5) < 1e-12
    assert row["j_empty"] is None


def test_sql_sample_bucket_matches_python(spark):
    from hive_udf_spark.functions.hashing import fast_hash64

    sql = spark.sql("SELECT id, sample_bucket_ppm(id, 7) AS b FROM range(100)")
    api = spark.range(100).select(
        "id", F.pmod(fast_hash64(F.col("id"), 7), F.lit(1_000_000)).alias("b")
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, api.collect()))


def test_kmv_sql_surface_matches_python(spark):
    """SQL kmv_hash60/kmv_estimate/kmv_union/kmv_jaccard reproduce the
    functions.kmv results over the same built sketches."""
    from hive_udf_spark.functions.kmv import kmv_estimate, kmv_jaccard, kmv_table

    register_sql(spark)
    df = spark.range(3000).selectExpr("CAST(id AS STRING) AS v", "id % 2 AS g")
    sk = kmv_table(df, ["g"], "v", k=128, seed=7)
    sk.createOrReplaceTempView("kmv_sketches")

    # hash parity: SQL kmv_hash60 == portable_hash60
    from hive_udf_spark.functions.hashing import portable_hash60

    hp = df.limit(100).select(
        portable_hash60(F.col("v"), 7).alias("py"),
        F.expr("kmv_hash60(v, 7)").alias("sql"),
    )
    assert hp.filter("py != sql").count() == 0

    rows = spark.sql(
        """
        SELECT g, kmv, kmv_estimate(kmv, 128) AS est_sql FROM kmv_sketches
        """
    ).collect()
    py = {r["g"]: r["est_kmv"] for r in sk.collect()}
    for r in rows:
        assert r["est_sql"] == py[r["g"]]

    pair = spark.sql(
        """
        SELECT kmv_estimate(kmv_union(a.kmv, b.kmv, 128), 128) AS u_est,
               kmv_jaccard(a.kmv, b.kmv, 128) AS j
        FROM (SELECT kmv FROM kmv_sketches WHERE g = 0) a,
             (SELECT kmv FROM kmv_sketches WHERE g = 1) b
        """
    ).collect()[0]
    both = kmv_table(df, [], "v", k=128, seed=7).collect()[0]["est_kmv"]
    assert pair["u_est"] == both
    # disjoint halves: jaccard estimate must be (near) zero
    assert pair["j"] <= 0.05
