"""Parquet table loaders for the driver-generated test corpus.

The reference delegates all scans to its host engine (``FROM src`` in the
usage examples at UDAFCardinalityEstimator.java:66-68); here the host is
Spark's vectorized Parquet reader — columnar, with predicate pushdown and
column pruning handled by Catalyst.

At 100 TB the same call pattern holds: ``spark.read.parquet`` over a
partitioned table root; Catalyst prunes partitions/row-groups from query
filters, so these loaders deliberately do nothing eager.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Corpus columns written as parquet TIMESTAMP(NANOS). With
# spark.sql.legacy.parquet.nanosAsLong=true they surface as long nanos;
# we convert via integer division (ns div 1000 → micros, truncating —
# matching DuckDB, whose TIMESTAMP is micro-precision). Plain double
# division would lose precision: 2024 epoch-nanos ≈ 1.7e18 > 2^53.
_NANO_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazily load one corpus table. No action is triggered."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANO_TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Corpus generations that write TIMESTAMP(MICROS, isAdjustedToUTC=false)
    # surface as TIMESTAMP_NTZ when the reading session didn't disable NTZ
    # inference. Normalize to session-tz TIMESTAMP (session tz is UTC →
    # identical wall-clock to DuckDB's naive timestamps) so every operator
    # sees one timestamp type regardless of who built the session.
    for c, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
