"""Incremental sketch-table maintenance: the streaming sink for
"the sketch is data" (SURVEY.md §1.1).

The reference's rollup story (store per-day sketches, union them later —
UDAFCardinalityEstimator.java:259-265) extends naturally to streams: each
micro-batch's raw rows reduce to per-key sketches INSIDE the batch, and
the cumulative table is maintained by merging batch sketches into the
stored ones — raw events are never kept, and the table stays one row per
key regardless of stream length. This is the classic streaming
"merge-on-write summary table":

* per batch: ``groupBy(key).agg(approx_distinct(value))`` — bounded
  output (keys × sketch size), partial aggregation inside the batch;
* merge: stored ∪ batch via ``sketch_merge_agg`` (associative +
  commutative, so batch boundaries don't affect the result);
* swap: the merged table is written to a scratch dir and atomically
  renamed over the old one — readers see old or new, never a torn mix.
  At deployment scale the same merge runs against a transactional table
  format (MERGE INTO); the parquet+rename here keeps the engine
  dependency-free while preserving the update contract.

Exactly-once: foreachBatch may retry a batch after failure. Re-merging
the SAME events is harmless for distinct-count sketches (union is
idempotent per element), so the estimates stay correct under at-least-
once delivery — the property that makes sketches the right streaming
state in the first place.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_udf_spark.functions import approx_distinct, sketch_merge_agg


def merge_sketch_table(
    spark: SparkSession,
    batch_sketches: DataFrame,
    table_path: str,
    key_cols: list[str],
    sketch_col: str = "s",
) -> None:
    """Merge per-key sketch rows into the stored sketch table at
    ``table_path`` (created on first call). Batch and stored rows union,
    re-aggregate per key, and replace the table via write-then-rename."""
    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path).select(*key_cols, sketch_col)
        all_rows = existing.unionByName(batch_sketches.select(*key_cols, sketch_col))
    else:
        all_rows = batch_sketches.select(*key_cols, sketch_col)
    merged = all_rows.groupBy(*key_cols).agg(
        sketch_merge_agg(sketch_col).alias(sketch_col)
    )
    tmp = f"{table_path}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{table_path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(table_path):
        os.rename(table_path, old)
    os.rename(tmp, table_path)
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)


def daily_user_sketch_sink(
    events: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    b: int = 16,
):
    """Streaming query maintaining a per-day distinct-user sketch table.

    ``events`` is a streaming DataFrame with (ts, user_id). Each batch
    reduces to per-day sketches before touching storage; the cumulative
    table holds exactly one row per day. Returns the started
    StreamingQuery (caller awaits/stops)."""

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        sketches = (
            batch_df.groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(approx_distinct("user_id", b=b).alias("s"))
            .filter(F.col("s").isNotNull())
        )
        merge_sketch_table(batch_df.sparkSession, sketches, table_path, ["day"], "s")

    return (
        events.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
