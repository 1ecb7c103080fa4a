"""PII redaction: pattern semantics, ordering, and JVM-only plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_udf_spark.functions.text import pii_counts, redact_pii


def _one(spark, s, **kw):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(redact_pii("t", **kw).alias("r")).first().r


def test_each_kind_redacts(spark):
    assert _one(spark, "mail me at a.b+c@ex-ample.co today") == "mail me at <email> today"
    assert _one(spark, "call +1 (555) 010-1234 now") == "call <phone> now"
    assert _one(spark, "host 192.168.0.1 up") == "host <ipv4> up"
    assert _one(spark, "ssn 123-45-6789 leaked", kinds=("ssn_like",)) == "ssn <ssn_like> leaked"


def test_order_email_before_phone(spark):
    # digits inside an address must not be half-eaten by the phone pass
    assert _one(spark, "x 12345678901@example.com y") == "x <email> y"


def test_clean_text_unchanged_and_counts(spark):
    s = "just ordinary words with one number 42"
    assert _one(spark, s) == s
    df = spark.createDataFrame(
        [("a@b.co and c@d.org at 10.0.0.1",)], "t string"
    )
    counts = pii_counts("t")
    row = df.select(
        counts["email"].alias("e"), counts["ipv4"].alias("i")
    ).first()
    assert (row.e, row.i) == (2, 1)


def test_unknown_kind_raises(spark):
    with pytest.raises(ValueError):
        _one(spark, "x", kinds=("credit_card",))


def test_plan_jvm_only(spark):
    df = spark.range(10).selectExpr("CAST(id AS STRING) AS t")
    out = df.select(redact_pii("t").alias("r"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# PAN candidates + Luhn (r8)
# ---------------------------------------------------------------------------

import duckdb
from pyspark.sql import functions as F

from hive_udf_spark.functions.text import cc_candidates_sql, luhn_valid_sql

_PAN_CASES = [
    ("pay 4539578763621486 now", ["4539578763621486"], [True]),
    ("pay 4539 5787 6362 1486 now", ["4539578763621486"], [True]),
    ("pay 4539-5787-6362-1486 now", ["4539578763621486"], [True]),
    ("pay 4539578763621487 now", ["4539578763621487"], [False]),  # bumped
    ("amex 371449635398431 ok", ["371449635398431"], [True]),
    ("call 555-867-5309 now", [], []),          # 10 digits: under range
    ("id 12345678901234567890123 x", [], []),   # 23 digits: over range
    ("no digits here", [], []),
]


def _luhn_rows(spark, text: str):
    df = spark.createDataFrame([(text,)], "t string")
    out = df.select(
        F.explode(F.expr(cc_candidates_sql("t", "spark"))).alias("pan")
    ).select("pan", F.expr(luhn_valid_sql("pan", "spark")).alias("ok"))
    return [(r.pan, r.ok) for r in out.collect()]


def test_luhn_candidates_and_checksum(spark):
    for text, pans, oks in _PAN_CASES:
        assert _luhn_rows(spark, text) == list(zip(pans, oks)), text


def test_luhn_dual_dialect(spark):
    con = duckdb.connect()
    for text, _, _ in _PAN_CASES:
        got_d = con.execute(
            f"SELECT pan, {luhn_valid_sql('pan', 'duckdb')} FROM (SELECT "
            f"unnest({cc_candidates_sql('t', 'duckdb')}) AS pan FROM "
            f"(SELECT ? AS t))",
            [text],
        ).fetchall()
        assert [(p, bool(o)) for p, o in got_d] == _luhn_rows(spark, text), text


def test_luhn_known_vectors(spark):
    # Standard test PANs (Visa/MC/Amex/Discover) all Luhn-valid.
    valid = ["4539578763621486", "5500005555555559", "371449635398431",
             "6011000990139424"]
    df = spark.createDataFrame([(v,) for v in valid], "pan string")
    rows = df.select(F.expr(luhn_valid_sql("pan", "spark")).alias("ok")).collect()
    assert all(r.ok for r in rows)
