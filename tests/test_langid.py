"""Language ID with the shipped stopword lists (functions/langid.py, r9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_udf_spark.functions.langid import (
    STOPWORD_MARKERS,
    lang_id,
    synth_multilingual_sql,
)
from hive_udf_spark.functions.text import tokenize


def test_planted_language_accuracy_is_total(spark):
    """On the planted multilingual fixture every document's language is
    recovered by the REAL stopword lists — 100% by construction (three
    distinct planted markers always outscore any cross-language shared
    marker like fr/es 'la')."""
    lang_expr, text_expr = synth_multilingual_sql("spark")
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id").select(
        "doc_id",
        F.expr(lang_expr).alias("planted"),
        F.expr(text_expr).alias("text"),
    )
    got = df.select(
        "planted", lang_id(tokenize("text")).alias("pred")
    ).collect()
    assert len(got) == 500
    assert all(r.planted == r.pred for r in got)
    # all five languages appear
    assert {r.planted for r in got} == set(STOPWORD_MARKERS)


def test_shared_marker_does_not_flip_prediction(spark):
    """'la' lives in BOTH fr and es lists; a doc of three distinct
    French stopwords including 'la' must still resolve to fr."""
    df = spark.createDataFrame([("le la et",), ("el la los",)], "text string")
    got = [r.p for r in df.select(lang_id(tokenize("text")).alias("p")).collect()]
    assert got == ["fr", "es"]


def test_no_markers_is_unknown(spark):
    df = spark.createDataFrame([("zzz qqq 123",), ("",)], "text string")
    got = [r.p for r in df.select(lang_id(tokenize("text")).alias("p")).collect()]
    assert got == ["unknown", "unknown"]
