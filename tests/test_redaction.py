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
