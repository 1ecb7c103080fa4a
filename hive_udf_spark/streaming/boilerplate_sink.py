"""Streaming corpus-frequency boilerplate detection: the incremental
face of ``text_boilerplate_line_removal`` (CCNet §3.1).

Batch mode counts per-line DOCUMENT frequency over the whole corpus.
A stream accumulates the same statistic additively: each micro-batch
contributes its per-line distinct-document counts (a document arrives
in exactly one batch, so batch-local distinct counts sum to the global
document frequency), merged into the state table by a full-outer
union-aggregate.  The final (line, df, n_docs) table therefore equals
the batch computation regardless of batching — what the registry
oracle pins.

State and exactly-once: one parquet sub-table (``linedf/``) plus the
total document count and batch high-water mark in ``meta.json``,
committed through the whole-directory symlink swap (dedup-sink
pattern).  The hwm guard is load-bearing: counts are ADDITIVE, so a
replayed foreachBatch would double-count.

Scale: per batch, one explode + one (line) hash-aggregation with
map-side partials; the state table is distinct-line-sized and the
merge is a union + re-aggregation on the line key — no per-doc state,
no driver-side structures.  At query time the boilerplate set (df >
frac·n_docs) is tiny by definition and broadcasts to the removal join,
exactly as in batch mode.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_udf_spark.functions.lines import split_lines_sql
from hive_udf_spark.sources.sinks import swap_dir
from hive_udf_spark.streaming.dedup_sink import _hwm_skip, _resolve

LINEDF_SCHEMA = "line string, df long"


def incremental_line_df_sink(
    pages: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    page_col: str = "page",
):
    """Maintain the per-line document-frequency table over a stream of
    (doc_id, page) rows.  Returns the started StreamingQuery; read the
    state with ``spark.read.parquet(f"{state_path}/linedf")`` and the
    document total from ``meta.json``."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = _resolve(state_path)
        state = None
        hwm, n_docs = -1, 0
        if cur is not None:
            meta = os.path.join(cur, "meta.json")
            if os.path.exists(meta):
                m = json.load(open(meta))
                hwm = m.get("last_batch", -1)
                n_docs = m.get("n_docs", 0)
            d = os.path.join(cur, "linedf")
            if os.path.exists(d):
                state = spark.read.parquet(d)
        if _hwm_skip(hwm, batch_id, state_path):
            return
        batch_docs = batch_df.select(id_col).distinct().count()
        lines = batch_df.select(
            F.col(id_col).alias("__doc"),
            F.explode(F.expr(split_lines_sql(page_col, "spark"))).alias("line"),
        )
        delta = lines.groupBy("line").agg(
            F.countDistinct("__doc").cast("long").alias("df")
        )
        merged = (
            state.unionByName(delta) if state is not None else delta
        ).groupBy("line").agg(F.sum("df").cast("long").alias("df"))
        new_dir = f"{state_path}.v-{uuid.uuid4().hex[:8]}"
        merged.write.parquet(os.path.join(new_dir, "linedf"))
        with open(os.path.join(new_dir, "meta.json"), "w") as f:
            json.dump(
                {"last_batch": int(batch_id), "n_docs": int(n_docs + batch_docs)},
                f,
            )
        swap_dir(state_path, new_dir)

    return (
        pages.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
