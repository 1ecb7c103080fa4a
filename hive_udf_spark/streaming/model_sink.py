"""Incremental MODEL-state maintenance: the streaming sink for
classifier sufficient statistics.

The sketch-table sinks (streaming/sketch_sink.py) maintain summaries
whose merge is a union or a sum; a closed-form classifier's training
state is the same kind of object. For multinomial Naive Bayes the
sufficient statistics are exact additive counters — (label, bucket)
hashed-token counts and per-label document counts
(operators/importance.py nb_count_cells) — so the stored model state
merges cell-additively across micro-batches exactly like the Count-Min
table, under the same retry-skipping high-water mark (sums are NOT
idempotent). Smoothing and micro-nat quantization happen at READ time
(nb_tables_from_counts, the index_from_postings discipline), so the
streamed model is bit-identical to a one-shot batch fit over the same
documents — "train the quality classifier as the corpus arrives"
without ever re-reading raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_udf_spark.streaming.sketch_sink import _merge_with_hwm


def merge_nb_counts(
    spark: SparkSession,
    batch_cells: DataFrame,
    table_path: str,
    batch_id: int | None = None,
) -> None:
    """Merge a micro-batch's NB count cells (label, bucket, cnt —
    bucket = -1 rows carry per-label doc counts) into the stored model
    state: union + sum per (label, bucket), guarded by the
    ``__last_batch`` high-water mark so a foreachBatch retry cannot
    double-count."""
    from pyspark.sql import functions as F

    def merge(all_cells: DataFrame) -> DataFrame:
        return all_cells.groupBy("label", "bucket").agg(
            F.sum("cnt").cast("bigint").alias("cnt")
        )

    _merge_with_hwm(
        spark, batch_cells, table_path, ["label", "bucket", "cnt"], merge, batch_id
    )


def nb_model_sink(
    labeled_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    label_col: str = "lang",
    text_col: str = "text",
    buckets: int = 4096,
    portable: bool = False,
    seed: int = 19,
):
    """Streaming query maintaining the Naive Bayes training state over
    a labeled document stream. Each micro-batch reduces to ≤ C·B count
    cells BEFORE touching storage (nb_count_cells partially aggregates
    map-side); the additive merge keeps the stored state equal to a
    batch fit over every document seen, so
    ``nb_tables_from_counts(spark.read.parquet(table_path), buckets)``
    yields the up-to-date classifier at any moment. Returns the started
    StreamingQuery (caller awaits/stops)."""
    from hive_udf_spark.operators.importance import nb_count_cells

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        cells = nb_count_cells(
            batch_df, label_col, text_col, buckets, portable, seed
        )
        merge_nb_counts(batch_df.sparkSession, cells, table_path, batch_id)

    return (
        labeled_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
