"""Streaming UPSERT/DELETE ingestion into a Hudi MERGE_ON_READ table
(r13): the sink trio's Iceberg/Delta/Hudi members are append-only —
but Hudi's reason to exist is the upsert workload, and a real training
corpus mutates (document revisions, dedup verdicts, takedown/GDPR
deletes — the batch `forget_rows` op's streaming sibling).  This sink
writes genuine MOR deltacommits: per micro-batch, each file group gets
ONE new log file holding an Avro upsert block for the batch's live
rows and a HoodieDeleteBlock v3 for its tombstones, which the vendored
reader (sources/hudi.py) merges newest-wins — the exact layering
``source_hudi_mor_deletes`` oracle-proves.

Routing is Hudi's BUCKET index: ``file group = xxhash64(record key) %
n_buckets``.  No global key index is consulted — a key's location is a
pure hash, so per-batch work is O(batch) regardless of table size, the
property that keeps an upsert sink alive at 100 TB (a lookup index
would grow with the corpus; the hash never does).  Batch 0 lays down
one base file per bucket; every later batch appends log files ONLY to
the touched buckets.

Exactly-once, the Hudi way: the deltacommit JSON is the atomic publish
(temp + rename).  A retried batch finds its instant completed and
no-ops; a crash after log files land but before the commit leaves them
both INVISIBLE (unlisted in any writeStats, their instant not
completed) and reclaimable (``clean_hudi_table`` sees them as
orphans).  Log-file versions are the batch id, so a retry overwrites
its own partial files deterministically.

Scale shape: log files are written FROM EXECUTORS (one applyInPandas
group per touched bucket, temp + rename per file) — bytes never funnel
through the driver; only the KB-scale commit metadata is driver-side,
the same division as every vendored sink.  Compaction is the
existing ``cluster_hudi_table`` — logs bake into new base files when
read amplification warrants.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated streaming/sink extension surface.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hudi_upsert_sink", "upsert_batch_to_hudi"]

DELETED_COL = "_deleted"


def _avro_schema_of(df: DataFrame, table_name: str) -> dict:
    from hive_udf_spark.sources.hudi import _avro_field

    return {
        "type": "record",
        "name": table_name.replace("-", "_"),
        "fields": [
            _avro_field(f.name, f.dataType.simpleString())
            for f in df.schema.fields if f.name != DELETED_COL
        ],
    }


def upsert_batch_to_hudi(
    batch_df: DataFrame, batch_id: int, table_path: str,
    record_key: str = "doc_id", n_buckets: int = 4,
    table_name: str = "hudi-upsert",
) -> bool:
    """Apply one micro-batch of upserts (rows) and deletes (rows whose
    boolean ``_deleted`` column is true — only the key matters on
    those) as the MOR deltacommit at instant ``20400101000000 +
    batch_id``.  Returns False (no-op) when that instant is already
    committed."""
    from hive_udf_spark.sources.hudi import encode_hudi_log

    hoodie = os.path.join(table_path, ".hoodie")
    instant = f"{20400101000000 + batch_id}"
    commit_path = os.path.join(hoodie, f"{instant}.deltacommit")
    if os.path.exists(commit_path):
        return False  # retried batch: the publish already happened
    if record_key not in batch_df.columns:
        raise ValueError(f"hudi upsert: batch has no {record_key!r} column")
    os.makedirs(hoodie, exist_ok=True)
    props = os.path.join(hoodie, "hoodie.properties")
    if not os.path.exists(props):
        with open(props, "w") as fh:
            fh.write(
                "hoodie.table.name=%s\n"
                "hoodie.table.type=MERGE_ON_READ\n"
                "hoodie.table.recordkey.fields=%s\n"
                "hoodie.table.version=6\n"
                "hoodie.timeline.layout.version=1\n"
                % (table_name, record_key)
            )
    avro_schema = _avro_schema_of(batch_df, table_name)
    data_cols = [f.name for f in batch_df.schema.fields
                 if f.name != DELETED_COL]
    has_del = DELETED_COL in batch_df.columns
    bucket = F.pmod(F.xxhash64(F.col(record_key)), F.lit(n_buckets)) \
        .cast("int").alias("__bucket")
    base_files = sorted(glob.glob(os.path.join(table_path,
                                               "bucket-*_*.parquet")))
    stats: list[dict] = []
    if not base_files:
        # first batch: one base file per bucket (empty buckets included
        # — later log files need a slice to attach to)
        if has_del and batch_df.filter(F.col(DELETED_COL)).limit(1).count():
            raise ValueError(
                "hudi upsert: deletes against an empty table (no base "
                "files yet) — nothing to delete"
            )
        staged = batch_df.select(*data_cols, bucket)
        scratch = os.path.join(table_path, f"_upsert-{batch_id}")
        for i in range(n_buckets):
            part_dir = os.path.join(scratch, str(i))
            staged.filter(F.col("__bucket") == i).drop("__bucket") \
                .coalesce(1).write.mode("overwrite").parquet(part_dir)
            part = next(p for p in os.listdir(part_dir)
                        if p.endswith(".parquet"))
            rel = f"bucket-{i:05d}_0-0-0_{instant}.parquet"
            os.replace(os.path.join(part_dir, part),
                       os.path.join(table_path, rel))
            stats.append({
                "fileId": f"bucket-{i:05d}", "path": rel,
                "prevCommit": "null", "numWrites": 0,
                "fileSizeInBytes": os.path.getsize(
                    os.path.join(table_path, rel)),
            })
        shutil.rmtree(scratch)
    else:
        # later batches: ONE log file per TOUCHED bucket, written from
        # the executors (applyInPandas group per bucket, temp+rename)
        base_instant_of: dict[int, str] = {}
        for p in base_files:
            name = os.path.basename(p)
            fid, _, inst = name[: -len(".parquet")].split("_")
            base_instant_of[int(fid.split("-")[1])] = inst
        if len(base_instant_of) != n_buckets:
            raise ValueError(
                f"hudi upsert: table has {len(base_instant_of)} buckets, "
                f"sink configured for {n_buckets}"
            )
        table_abs = os.path.abspath(table_path)
        key = record_key
        dcols = list(data_cols)

        def write_group(pdf):
            import pandas as _pd

            b = int(pdf["__bucket"].iloc[0])
            base_instant = base_instant_of[b]
            blocks = []
            if has_del:
                dead = pdf[pdf[DELETED_COL].fillna(False)]
                live = pdf[~pdf[DELETED_COL].fillna(False)]
            else:
                dead, live = pdf.iloc[0:0], pdf
            if len(live):
                blocks.append({
                    "instant": instant,
                    "schema": avro_schema,
                    "records": [
                        {c: (None if _pd.isna(r[c])
                             else r[c].item() if hasattr(r[c], "item")
                             else r[c])
                         for c in dcols}
                        for _, r in live.iterrows()
                    ],
                })
            if len(dead):
                blocks.append({
                    "instant": instant,
                    "deletes": [str(k) for k in dead[key]],
                })
            rel = (f".bucket-{b:05d}_{base_instant}"
                   f".log.{batch_id}_0-0-0")
            full = os.path.join(table_abs, rel)
            blob = encode_hudi_log(blocks)
            with open(full + ".tmp", "wb") as fh:
                fh.write(blob)
            os.replace(full + ".tmp", full)  # task-retry safe
            return _pd.DataFrame({
                "bucket": [b], "path": [rel], "nbytes": [len(blob)],
            })

        touched = (
            batch_df.select("*", bucket)
            .groupBy("__bucket")
            .applyInPandas(write_group,
                           "bucket int, path string, nbytes bigint")
            .collect()  # bounded: one KB-scale stat row per bucket
        )
        for r in sorted(touched, key=lambda r: r.bucket):
            stats.append({
                "fileId": f"bucket-{r.bucket:05d}", "path": r.path,
                "prevCommit": base_instant_of[r.bucket], "numWrites": 0,
                "fileSizeInBytes": int(r.nbytes),
            })
    meta = {
        "partitionToWriteStats": {"": stats},
        "compacted": False,
        "extraMetadata": {"schema": json.dumps(avro_schema)},
        "operationType": "UPSERT",
    }
    with open(commit_path + ".tmp", "w") as fh:
        json.dump(meta, fh)
    os.rename(commit_path + ".tmp", commit_path)  # THE atomic publish
    return True


def hudi_upsert_sink(
    stream_df: DataFrame, table_path: str, checkpoint_dir: str,
    record_key: str = "doc_id", n_buckets: int = 4,
    table_name: str = "hudi-upsert",
):
    """writeStream → one MOR upsert/delete deltacommit per micro-batch
    (see module docstring).  Returns the started StreamingQuery."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch_to_hudi(batch_df, int(batch_id), table_path,
                             record_key, n_buckets, table_name)

    return (
        stream_df.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
