"""Sinks: partitioned / bucketed / sketch-table writers.

The reference has no sinks (SURVEY.md §2.2 — Hive owns storage); here the
engine's sink surface is Spark's writers, wrapped with the layout choices
that matter at 100 TB:

- **Partitioned parquet** gives partition pruning on read: a filter on the
  partition column skips whole directories before any IO.
- **Bucketed tables** pre-shuffle data by join/agg key at write time: a
  join of two tables bucketed on the same key by the same bucket count
  runs with NO exchange at read time — pay the shuffle once, reuse it in
  every downstream query.
- **Sketch tables** persist the re-aggregable `{type, cardinality,
  binary}` structs (SURVEY.md §1.1: "the sketch is data") so rollups union
  pre-computed sketches instead of rescanning raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_partitioned", "write_bucketed", "write_sketch_table", "read_sketch_table"]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | str,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write parquet partitioned by the given columns.

    Choose low-cardinality columns (date, source, lang); a high-cardinality
    partition column creates millions of tiny files — the classic 100 TB
    anti-pattern. ``max_records_per_file`` caps file size for downstream
    split planning."""
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    w = df.write.mode(mode).partitionBy(*cols)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str] | str,
    num_buckets: int = 32,
    sort_by: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) managed table.

    Reading two tables bucketed on the same key with the same bucket count
    lets Catalyst plan a shuffle-free sort-merge join (verified in
    tests/test_sinks.py by asserting no Exchange in the join plan). Size
    num_buckets so one bucket of the LARGER table fits an executor's
    memory at target scale."""
    bcols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).bucketBy(num_buckets, *bcols)
    if sort_by is not None:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*scols)
    w.format("parquet").saveAsTable(table)


def write_sketch_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist a DataFrame holding sketch structs ({type, cardinality,
    binary}) as parquet. BinaryType round-trips losslessly, so stored
    sketches re-aggregate later via sketch_merge_agg without rescanning
    the raw data (the reference's entry point 3 —
    UDAFCardinalityEstimator.java:259-265)."""
    df.write.mode(mode).parquet(path)


def read_sketch_table(spark: SparkSession, path: str) -> DataFrame:
    """Load a persisted sketch table for re-aggregation."""
    return spark.read.parquet(path)
