"""Markdown -> text chain: construct-by-construct semantics + dual-dialect
equality + an independent hand-written expectation."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from hive_udf_spark.functions.markdown import (
    markdown_chain_sql,
    markdown_to_text,
)

_CASES = [
    ("# Head\ntext", "Head text"),
    ("## Two ## hash", "Two ## hash"),           # inline ## untouched
    ("> quote\n>> deep", "quote > deep"),        # one marker per pass
    ("**bold** and *ital*", "bold and ital"),
    ("__strong__ x", "strong x"),
    ("[text](http://u/v?a=1)", "text"),
    ("![alt words](i.png)", "alt words"),
    ("`code span` y", "code span y"),
    ("```\nfence body\n```\nafter", "after"),
    ("- a\n- b\n1. c", "a b c"),
    ("a | b\n--- | :---\nc | d", "a b c d"),
    ("---\nx", "x"),
    ("<https://auto.link/z> t", "t"),
    ("", ""),
]


def _spark_one(spark, md: str) -> str:
    df = spark.createDataFrame([(md,)], "md string")
    return df.select(markdown_to_text(F.col("md")).alias("t")).collect()[0].t


def test_constructs(spark):
    for md, want in _CASES:
        assert _spark_one(spark, md) == want, md


def test_dual_dialect(spark):
    con = duckdb.connect()
    for md, _ in _CASES:
        got_d = con.execute(
            f"SELECT {markdown_chain_sql('md', 'duckdb')} FROM (SELECT ? AS md)",
            [md],
        ).fetchone()[0]
        assert got_d == _spark_one(spark, md), md


def test_spark_sql_dialect_matches_column_api(spark):
    md = "# H\n**b** [t](u) `c`\n- li"
    df = spark.createDataFrame([(md,)], "md string")
    via_sql = df.selectExpr(
        f"{markdown_chain_sql('md', 'spark')} AS t"
    ).collect()[0].t
    assert via_sql == _spark_one(spark, md)
