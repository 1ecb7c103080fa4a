"""Data-quality check tests (operators/quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from hive_udf_spark.operators.quality import (
    fd_violations,
    quality_report,
    referential_violations,
    uniqueness_violations,
)


def test_uniqueness_and_null_keys(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (None,), (None,), (None,)], "k long"
    )
    got = {r.k: r.n_rows for r in uniqueness_violations(df, ["k"]).collect()}
    assert got == {2: 2, None: 3}
    with pytest.raises(ValueError, match="key_cols"):
        uniqueness_violations(df, [])


def test_referential_null_fk_exempt(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None), (5, 99)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    got = {
        r.fk: r.n_rows
        for r in referential_violations(child, parent, {"fk": "pk"}).collect()
    }
    assert got == {99: 2}  # NULL fk exempt; orphans grouped per key value


def test_fd_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 2), (2, "b", 1), (2, "c", 1), (3, None, 1), (3, None, 2)],
        "k long, d string, x int",
    )
    got = {r.k: r.n_variants for r in fd_violations(df, ["k"], ["d"]).collect()}
    assert got == {2: 2}  # k=1 single value, k=3 NULL==NULL counts once
    with pytest.raises(ValueError, match="non-empty"):
        fd_violations(df, ["k"], [])


def test_quality_report_shape(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    rep = quality_report(
        {"uniq": (uniqueness_violations(df, ["k"]), df)}
    ).collect()
    assert [(r.check, r.n_violations, r.n_checked) for r in rep] == [("uniq", 1, 3)]
    with pytest.raises(ValueError, match="checks"):
        quality_report({})
