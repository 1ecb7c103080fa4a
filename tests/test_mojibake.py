"""Mojibake repair + unicode cleanup (functions/mojibake.py, r7)."""

from __future__ import annotations

import duckdb

from hive_udf_spark.functions.mojibake import (
    MOJIBAKE_INVENTORY,
    MOJIBAKE_PAIRS,
    cleanup_sql,
    corrupt_sql,
    repair_sql,
    score_sql,
)


def test_forward_map_is_the_cp1252_model():
    for ch, exp in MOJIBAKE_PAIRS:
        assert exp == ch.encode("utf-8").decode("cp1252")
        assert len(ch) == 1 and len(exp) in (2, 3)


def test_cascade_order_handles_nested_inventory_chars():
    """Corrupting must never double-encode: when char Y appears inside
    the expansion of char X (e.g. '©' inside 'Ã©', '€' inside 'â€¢'),
    Y's replace must run BEFORE X's in the forward cascade."""
    order = {ch: i for i, (ch, _) in enumerate(MOJIBAKE_PAIRS)}
    for ch, exp in MOJIBAKE_PAIRS:
        for y in exp:
            if y in order and y != ch:
                assert order[y] < order[ch], (ch, exp, y)


def test_roundtrip_via_duckdb_on_every_inventory_char():
    con = duckdb.connect()
    text = "plain " + " ".join(MOJIBAKE_INVENTORY) + " …€é mix’d"
    (corrupted,) = con.execute(
        f"SELECT {corrupt_sql('t')} FROM (SELECT ? AS t)", [text]
    ).fetchone()
    assert corrupted != text
    # python-side ground truth for the corruption model itself
    assert corrupted == text.encode("utf-8").decode("cp1252")
    (repaired, score_c, score_r) = con.execute(
        f"SELECT {repair_sql('c')}, {score_sql('c', 'duckdb')}, "
        f"{score_sql(repair_sql('c'), 'duckdb')} FROM (SELECT ? AS c)",
        [corrupted],
    ).fetchone()
    assert repaired == text
    assert score_c >= len(MOJIBAKE_INVENTORY) and score_r == 0


def test_spark_duckdb_chains_agree(spark):
    text = "he said “no” — it’s café naïve … €9 ½° ©x"
    df = spark.createDataFrame([(text,)], "t string")
    from pyspark.sql import functions as F

    r = df.select(
        F.expr(corrupt_sql("t")).alias("c"),
    ).select(
        "c",
        F.expr(repair_sql("c")).alias("r"),
        F.expr(score_sql("c", "spark")).alias("s"),
    ).first()
    con = duckdb.connect()
    want = con.execute(
        f"SELECT {corrupt_sql('t')}, {repair_sql(corrupt_sql('t'))}, "
        f"{score_sql(corrupt_sql('t'), 'duckdb')} FROM (SELECT ? AS t)",
        [text],
    ).fetchone()
    assert (r.c, r.r, r.s) == want
    assert r.r == text and r.s > 0


def test_registry_verdicts_are_actually_true(spark, sf_dir):
    """The oracle proves Spark==DuckDB; this proves the REPAIR WORKED —
    every corrupted doc round-trips and every cleanup restores text."""
    from hive_udf_spark.plans.text_queries import (
        text_mojibake_repair,
        text_unicode_cleanup,
    )

    m = text_mojibake_repair(spark, sf_dir)
    from pyspark.sql import functions as F

    agg = m.agg(
        F.sum(F.when(~F.col("repaired_ok"), 1).otherwise(0)).alias("bad"),
        F.sum(F.when(F.col("was_corrupted") & (F.col("score_before") == 0), 1).otherwise(0)).alias("undetected"),
        F.sum(F.when(F.col("score_after") != 0, 1).otherwise(0)).alias("residual"),
        F.count("*").alias("n"),
    ).first()
    assert agg.n > 0 and agg.bad == 0 and agg.undetected == 0 and agg.residual == 0

    c = text_unicode_cleanup(spark, sf_dir)
    bad = c.filter(~F.col("cleaned_ok")).count()
    assert bad == 0


def test_cleanup_handles_each_class(spark):
    from pyspark.sql import functions as F

    # BEL + NBSP + zero-width space + thin space + unit separator,
    # built from escapes so no invisible char hides in the source
    dirty = "a\x07b" + chr(0xA0) + "c" + chr(0x200B) + "d" + chr(0x2009) + "e\x1ff"
    df = spark.createDataFrame([(dirty,)], "t string")
    (got,) = df.select(F.expr(cleanup_sql("t", "spark"))).first()
    assert got == "ab cd ef"
