"""Streaming SCD2 dimension maintenance.

Change batches arrive as a stream; each micro-batch merges into the
stored type-2 dimension via ``operators/scd.scd2_apply`` and commits
with the one-swap state contract shared with the dedup sink (dimension
parquet + high-water-mark meta swapped atomically — readers see a
complete dimension at every instant; a foreachBatch retry re-applies
the same batch, which scd2_apply makes a no-op, but the mark still
skips it to avoid the rewrite; a strictly-lower batch id raises the
lineage-mismatch error — replaying OLD batches over evolved state is
NOT idempotent, unlike same-batch retries).

Within a batch, the latest change per key wins (deterministic
``max(struct(effective, attrs...))``), honoring scd2_apply's
one-change-per-key contract however the source micro-batches chop the
change stream.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_udf_spark.operators.scd import scd2_apply
from hive_udf_spark.sources.sinks import swap_dir
from hive_udf_spark.streaming.dedup_sink import _hwm_skip, _resolve


def _read_dim(
    spark: SparkSession, state_path: str
) -> tuple[DataFrame | None, int]:
    cur = _resolve(state_path)
    if cur is None:
        return None, -1
    hwm = -1
    meta = os.path.join(cur, "meta.json")
    if os.path.exists(meta):
        hwm = json.load(open(meta)).get("last_batch", -1)
    return spark.read.parquet(os.path.join(cur, "dim")), hwm


def _commit_dim(state_path: str, dim: DataFrame, batch_id: int) -> None:
    new_dir = f"{state_path}.v-{uuid.uuid4().hex[:8]}"
    dim.write.parquet(os.path.join(new_dir, "dim"))
    with open(os.path.join(new_dir, "meta.json"), "w") as f:
        json.dump({"last_batch": int(batch_id)}, f)
    swap_dir(state_path, new_dir)


def scd2_dimension_sink(
    changes: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str = "effective_ts",
):
    """Streaming query maintaining an SCD2 dimension from a change
    stream. Returns the started StreamingQuery (caller awaits/stops).
    Reading ``<state_path>/dim`` at any moment yields a complete,
    point-in-time-queryable dimension."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        dim, hwm = _read_dim(spark, state_path)
        if _hwm_skip(hwm, batch_id, state_path):
            return
        # latest change per key within the batch (deterministic)
        picked = (
            batch_df.groupBy(*key_cols)
            .agg(
                F.max(
                    F.struct(
                        F.col(effective_col).alias("__e"),
                        *[F.col(c).alias(c) for c in attr_cols],
                    )
                ).alias("__m")
            )
            .select(
                *key_cols,
                *[F.col(f"__m.{c}").alias(c) for c in attr_cols],
                F.col("__m.__e").alias(effective_col),
            )
        )
        if dim is None:
            dim = batch_df.select(
                *key_cols,
                *attr_cols,
                F.col(effective_col).alias("valid_from"),
                F.col(effective_col).alias("valid_to"),
            ).limit(0)
        new_dim = scd2_apply(dim, picked, key_cols, attr_cols, effective_col)
        # materialize before the swap: the plan reads the CURRENT state
        # dir, which the swap is about to replace
        new_dim = new_dim.localCheckpoint(eager=True)
        _commit_dim(state_path, new_dim, batch_id)

    return (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
