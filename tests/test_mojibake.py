"""Mojibake repair + unicode cleanup (functions/mojibake.py, r7/r8).

r8 extends the model to the three corruptions real corpora contain:
UTF-8-as-windows-1252 (WHATWG tables, C1 fallback), UTF-8-as-latin-1,
and DOUBLE-encoded UTF-8 — with the repair cascade applied twice over
the closure inventory.  Ground truth for every property below is the
independent byte-level transform, not the chain itself."""

from __future__ import annotations

import random

import duckdb

from hive_udf_spark.functions.mojibake import (
    LATIN1_PAIRS,
    MOJIBAKE_INVENTORY,
    MOJIBAKE_PAIRS,
    _SEED,
    _decode_w1252,
    cleanup_sql,
    corrupt_deep_sql,
    corrupt_latin1_sql,
    corrupt_sql,
    repair_sql,
    score_sql,
)


def _true_w1252(s: str) -> str:
    return _decode_w1252(s.encode("utf-8"))


def _true_latin1(s: str) -> str:
    return s.encode("utf-8").decode("latin-1")


def test_forward_map_is_the_whatwg_model():
    for ch, exp in MOJIBAKE_PAIRS:
        assert exp == _true_w1252(ch)
        assert len(ch) == 1 and len(exp) in (2, 3)
    for ch, exp in LATIN1_PAIRS:
        assert exp == _true_latin1(ch) and exp != _true_w1252(ch)


def test_inventory_is_closed_under_forward():
    """Closure property: every non-ASCII char in any expansion is itself
    in the inventory — this is what makes the 2-pass repair invert
    DOUBLE encodings."""
    inv = set(MOJIBAKE_INVENTORY)
    for ch in MOJIBAKE_INVENTORY:
        for exp in (_true_w1252(ch), _true_latin1(ch)):
            for c in exp:
                assert ord(c) <= 0x7F or c in inv, (ch, exp, c)


def test_corrupt_chains_equal_byte_transforms_and_repair_inverts():
    """Property sweep in DuckDB: for random seed-alphabet strings, the
    SQL corrupt chains equal the true byte-level transforms (single,
    double, latin-1), and the ONE repair chain inverts all three while
    leaving clean text alone."""
    con = duckdb.connect()
    rng = random.Random(1234)
    pool = _SEED + "abc XYZ 0_9.!\"'"
    texts = ["".join(rng.choice(pool) for _ in range(rng.randint(1, 40))) for _ in range(60)]
    texts += ["", "plain ascii", " ".join(_SEED)]
    d = "duckdb"
    sql = f"""
    SELECT {corrupt_sql('t', d)}, {corrupt_deep_sql('t', d)}, {corrupt_latin1_sql('t', d)},
           {repair_sql(corrupt_sql('t', d), d)}, {repair_sql(corrupt_deep_sql('t', d), d)},
           {repair_sql(corrupt_latin1_sql('t', d), d)}, {repair_sql('t', d)}
    FROM (SELECT ? AS t)
    """
    for t in texts:
        c1, c2, cl, r1, r2, rl, rc = con.execute(sql, [t]).fetchone()
        assert c1 == _true_w1252(t), t
        assert c2 == _true_w1252(_true_w1252(t)), t
        assert cl == _true_latin1(t), t
        assert r1 == t and r2 == t and rl == t, t
        assert rc == t, ("clean text must be stable", t)


def test_detection_scores_all_three_modes():
    con = duckdb.connect()
    t = "it’s a “café” — €5 …„Šœž”"
    for corrupt in (corrupt_sql, corrupt_deep_sql, corrupt_latin1_sql):
        (s_before, s_after) = con.execute(
            f"SELECT {score_sql(corrupt('t', 'duckdb'), 'duckdb')}, "
            f"{score_sql(repair_sql(corrupt('t', 'duckdb'), 'duckdb'), 'duckdb')} "
            "FROM (SELECT ? AS t)",
            [t],
        ).fetchone()
        assert s_before > 0 and s_after == 0, corrupt.__name__


def test_spark_duckdb_chains_agree(spark):
    text = "he said “no” — it’s café naïve … €9 ½° ©x „deep‰ Šœž"
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, text) for i in range(3)], "i int, t string"
    ).withColumn(
        "c",
        F.expr(
            f"CASE WHEN i = 0 THEN {corrupt_sql('t', 'spark')} "
            f"WHEN i = 1 THEN {corrupt_deep_sql('t', 'spark')} "
            f"ELSE {corrupt_latin1_sql('t', 'spark')} END"
        ),
    )
    rows = df.select(
        "i",
        "c",
        F.expr(repair_sql("c", "spark")).alias("r"),
        F.expr(score_sql("c", "spark")).alias("s"),
    ).orderBy("i").collect()
    con = duckdb.connect()
    for r in rows:
        want_c, want_r, want_s = con.execute(
            f"SELECT c, {repair_sql('c', 'duckdb')}, {score_sql('c', 'duckdb')} "
            "FROM (SELECT ? AS c)",
            [r.c],
        ).fetchone()
        assert (r.c, r.r, r.s) == (want_c, want_r, want_s)
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
