"""Streaming incremental retrieval index: maintain the inverted-file
postings table as merge-on-write state, search it at any point.

The postings relation (operators/retrieval.py doc_postings) is
append-only per document — a new batch's rows are disjoint from every
earlier batch's (ids are unique across the stream), so the per-batch
merge is a plain union under the shared retry-skipping high-water mark
(streaming/sketch_sink.py _merge_with_hwm: lineage-guarded, atomic
symlink swap). The derived statistics (df, idf weights, corpus stats)
are NOT stored: they are recomputed from the postings table at search
time by index_from_postings — one aggregate over the already-reduced
relation, so a search after any batch sees exactly the index a batch
build over the documents ingested so far would produce (pytest + the
registry oracle pin stream ≡ batch bit-for-bit).

At deployment scale the swap-the-whole-table write becomes a
partition-append (postings partitioned by term prefix or ingest date);
the union-merge contract is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from hive_udf_spark.operators.retrieval import doc_postings
from hive_udf_spark.streaming.sketch_sink import _merge_with_hwm

POSTING_COLS = ["term", "doc_id", "tf", "dl"]


def merge_postings_table(
    spark, batch_postings: DataFrame, table_path: str, batch_id: int | None = None
) -> None:
    """Merge one batch's postings into the stored table (union — batch
    doc ids are disjoint from stored ones by the stream contract)."""
    _merge_with_hwm(
        spark,
        batch_postings,
        table_path,
        POSTING_COLS,
        lambda df: df,
        batch_id,
    )


def incremental_postings_sink(
    docs: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming query maintaining the postings table; returns the
    started StreamingQuery. Search the current state with
    ``index_from_postings(spark.read.parquet(table_path))``."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_postings_table(
            batch_df.sparkSession,
            doc_postings(batch_df, id_col, text_col),
            table_path,
            batch_id,
        )

    return (
        docs.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
