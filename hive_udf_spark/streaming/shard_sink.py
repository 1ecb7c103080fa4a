"""Streaming compressed-shard ingestion: ``.jsonl.{zst,xz,gz}`` corpus
shards arrive as a stream; each micro-batch is decoded map-side (zstd
through the vendored RFC 8878 codec, xz/gzip through stdlib), split
into lines, parsed with an EXPLICIT schema, appended to the documents
table, and folded into per-(codec, lang) ingest statistics — the
delivery format actually used by public corpus drops, as streaming
state.

Same one-commit contract as the WARC ingest sink (warc_sink.py): the
state directory holds ``docs/`` (append-only parsed documents) and
``stats/`` (merge-on-write additive aggregates) plus the batch
high-water mark, swapped atomically as a whole — a foreachBatch retry
skips the committed batch, keeping the additive stats exactly-once.
Decoding is per-shard and stats are additive/commutative, so the final
state equals the batch computation regardless of batching — which the
registry oracle computes in SQL from the documents table alone.

At 100 TB: shards are non-splittable, so the streaming source's unit of
parallelism is the FILE, matching the batch scan's story; a micro-batch
of N shards decodes as N map tasks and only parsed rows ever shuffle.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_udf_spark.sources.sinks import swap_dir

SHARD_DOCS_SCHEMA = (
    "doc_id bigint, codec string, lang string, n_chars bigint, parsed_chars bigint"
)
SHARD_STATS_SCHEMA = "codec string, lang string, n_docs bigint, total_chars bigint"


def decode_shard_lines(shards: DataFrame) -> DataFrame:
    """(shard, codec, blob) → (codec, line): map-side shard decode +
    line split, shared by the batch scan query and this sink."""
    import pandas as pd

    def run(batches):
        import gzip as _gzip
        import lzma as _lzma

        from hive_udf_spark.operators.zstdcodec import zstd_decompress

        for pdf in batches:
            rows = []
            for codec, blob in zip(pdf["codec"], pdf["blob"]):
                b = bytes(blob)
                if codec == "zstd":
                    payload = zstd_decompress(b, max_output=1 << 28)
                elif codec == "xz":
                    payload = _lzma.decompress(b)
                else:
                    payload = _gzip.decompress(b)
                for ln in payload.decode("utf-8").split("\n"):
                    rows.append((codec, ln))
            yield pd.DataFrame(rows, columns=["codec", "line"])

    return shards.mapInPandas(run, "codec string, line string")


def _resolve(state_path: str) -> str | None:
    if os.path.islink(state_path):
        return os.path.join(
            os.path.dirname(os.path.abspath(state_path)), os.readlink(state_path)
        )
    if os.path.isdir(state_path):
        return state_path
    return None


def _read_state(
    spark: SparkSession, state_path: str
) -> tuple[DataFrame | None, DataFrame | None, int]:
    cur = _resolve(state_path)
    if cur is None:
        return None, None, -1
    hwm = -1
    meta = os.path.join(cur, "meta.json")
    if os.path.exists(meta):
        hwm = json.load(open(meta)).get("last_batch", -1)
    docs = spark.read.parquet(os.path.join(cur, "docs"))
    stats = spark.read.parquet(os.path.join(cur, "stats"))
    return docs, stats, hwm


def incremental_shard_ingest_sink(
    shards: DataFrame,
    state_path: str,
    checkpoint_dir: str,
):
    """Streaming query maintaining (parsed docs, per-codec/lang stats)
    under the one-commit contract.  ``shards`` is a streaming DataFrame
    of (shard int, codec string, blob binary).  Read results with
    ``spark.read.parquet(f"{state_path}/docs")`` / ``.../stats``."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs, stats, hwm = _read_state(spark, state_path)
        if hwm == batch_id:
            return  # retry of the committed batch: additive state, skip
        if hwm > batch_id:
            raise ValueError(
                f"state at {state_path} has last_batch={hwm} but the stream "
                f"delivered batch_id={batch_id}: checkpoint lineage mismatch."
            )
        lines = decode_shard_lines(batch_df.localCheckpoint(eager=True))
        parsed = lines.select(
            "codec",
            F.from_json(
                "line", "doc_id bigint, text string, lang string, n_chars bigint"
            ).alias("r"),
        )
        batch_docs = parsed.select(
            F.col("r.doc_id").alias("doc_id"),
            "codec",
            F.col("r.lang").alias("lang"),
            F.col("r.n_chars").alias("n_chars"),
            F.length("r.text").cast("long").alias("parsed_chars"),
        )
        new_docs = docs.unionByName(batch_docs) if docs is not None else batch_docs
        batch_stats = batch_docs.groupBy("codec", "lang").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("parsed_chars").cast("long").alias("total_chars"),
        )
        if stats is not None:  # merge-on-write: additive fold
            new_stats = (
                stats.unionByName(batch_stats)
                .groupBy("codec", "lang")
                .agg(
                    F.sum("n_docs").cast("long").alias("n_docs"),
                    F.sum("total_chars").cast("long").alias("total_chars"),
                )
            )
        else:
            new_stats = batch_stats
        new_docs = new_docs.localCheckpoint(eager=True)
        new_stats = new_stats.localCheckpoint(eager=True)
        new_dir = f"{state_path}.v-{uuid.uuid4().hex[:8]}"
        new_docs.write.parquet(os.path.join(new_dir, "docs"))
        new_stats.write.parquet(os.path.join(new_dir, "stats"))
        with open(os.path.join(new_dir, "meta.json"), "w") as f:
            json.dump({"last_batch": int(batch_id)}, f)
        swap_dir(state_path, new_dir)

    return (
        shards.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
