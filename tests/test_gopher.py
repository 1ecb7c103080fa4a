"""Gopher-style quality filter: metric semantics and rule wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_udf_spark.functions.text import gopher_filter, gopher_quality


def _one(spark, text: str) -> dict:
    df = spark.createDataFrame([(text,)], "text string")
    g = gopher_filter(F.col("text"))
    return df.select(*[v.alias(k) for k, v in g.items()]).collect()[0].asDict()


def test_repetitive_doc_flagged(spark):
    # 30 words, one bigram ("spam ham") repeated 15 times: 29 bigrams, the
    # bigram "ham spam" appears 14x and "spam ham" 15x -> top = 15/29.
    text = " ".join(["spam", "ham"] * 15)
    r = _one(spark, text)
    assert r["n_words"] == 30
    assert r["top_bigram_ppm"] == int(1e6 * 15 / 29)
    # trigrams: 28 total, only 2 distinct -> dup share 26/28
    assert r["dup_trigram_ppm"] == int(1e6 * 26 / 28)
    assert not r["keep"]
    assert "top_bigram" in r["reasons"] and "dup_trigram" in r["reasons"]
    assert "few_stopwords" in r["reasons"]


def test_clean_doc_kept(spark):
    text = (
        "the quick brown fox jumps over a lazy dog and runs to the barn "
        "with seven geese that honk in unison while farmers watch from afar"
    )
    r = _one(spark, text)
    assert r["keep"]
    assert r["reasons"] == ""


def test_short_doc_reason(spark):
    r = _one(spark, "the cat sat on a mat")
    assert not r["keep"]
    assert "too_short" in r["reasons"]


def test_symbol_rule(spark):
    words = ["the", "a", "word"] * 10
    text = " ".join(words) + " " + "# # # # # # # #"
    r = _one(spark, text)
    assert r["symbol_ppm"] > 100_000
    assert "symbols" in r["reasons"]


def test_metrics_only_surface(spark):
    df = spark.createDataFrame([("the a b",)], "text string")
    g = gopher_quality(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in g.items()]).collect()[0]
    assert row["n_words"] == 3
    assert row["stopword_count"] == 2
    # mean word length = (3+1+1)/3 = 1.66 -> x100 floor = 166
    assert row["mean_word_len_x100"] == 166
