"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``hive_udf_spark`` package; queries are
declared in ``hive_udf_spark/plans/`` (one registry entry per
SURVEY.md §2 operator).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _prepare(spark: SparkSession) -> None:
    """Session prerequisites when the driver supplies its own session:
    nanos-timestamp parquet compat + package shipping for pandas UDFs."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from hive_udf_spark.session import _ship_package

    try:
        _ship_package(spark)
    except Exception:
        pass  # already added, or static context — UDF paths will surface it


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Distinct customers per order priority via the re-aggregable HLL sketch
    struct — scan → group-by → sketch agg → struct unpack, the reference's
    whole capability in one query (UDAFCardinalityEstimator.java:66-68).
    """
    _prepare(spark)
    from hive_udf_spark.functions import approx_distinct
    from hive_udf_spark.sources import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(approx_distinct("o_custkey").alias("s"))
        .select(
            "o_orderpriority",
            F.col("s.type").alias("sketch_type"),
            F.col("s.cardinality").alias("approx_customers"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hive_udf_spark.plans import queries_map

    raw = queries_map()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in raw.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    from hive_udf_spark.plans import oracle_sql_map

    return oracle_sql_map()
