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

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hudi_upsert_sink", "upsert_batch_to_hudi"]

DELETED_COL = "_deleted"


# the avro schema gate (_avro_field) admits exactly these spark types,
# so this arrow map mirrors that set and nothing else
_PA_TYPES = {
    "bigint": "int64", "int": "int32", "string": "string",
    "double": "float64", "float": "float32", "boolean": "bool",
    "binary": "binary",
}


def _pa_schema_of(df: DataFrame, data_cols: list[str]):
    """pyarrow schema matching the batch's Spark types — executors
    write base parquet straight from Arrow, no Spark writer job per
    bucket."""
    import pyarrow as pa

    fields = []
    for f in df.schema.fields:
        if f.name not in data_cols:
            continue
        t = _PA_TYPES.get(f.dataType.simpleString())
        if t is None:
            raise ValueError(
                f"hudi upsert: column {f.name!r} type "
                f"{f.dataType.simpleString()!r} not vendored"
            )
        fields.append(pa.field(f.name, getattr(pa, t)()
                               if t != "binary" else pa.binary()))
    return pa.schema(fields)


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
    from hive_udf_spark.sources.hudi import (
        _file_slices,
        encode_hudi_log,
        hudi_timeline,
    )

    hoodie = os.path.join(table_path, ".hoodie")
    instant = f"{20400101000000 + batch_id}"
    commit_path = os.path.join(hoodie, f"{instant}.deltacommit")
    if os.path.exists(commit_path):
        # retried batch — but ONLY if that instant really is this
        # stream's own commit: a fresh checkpoint against an existing
        # table resets batch ids, and silently no-opping would DROP the
        # new batch (the same refusal the Iceberg sinks carry)
        try:
            with open(commit_path) as fh:
                em = (json.load(fh).get("extraMetadata") or {})
        except (OSError, json.JSONDecodeError):
            em = {}
        if em.get("app-id") == table_name \
                and em.get("batch-id") == str(batch_id):
            return False
        raise ValueError(
            f"hudi upsert: instant {instant} exists but was not "
            f"committed by app {table_name!r} batch {batch_id} — "
            "restarting with a fresh checkpoint against an existing "
            "table would drop or duplicate batches"
        )
    # COMPOSITE record keys (r14): ``record_key`` may be a
    # comma-separated field list, matching Hudi's
    # hoodie.table.recordkey.fields.  Bucket routing hashes the
    # canonical key, and delete blocks carry the ComplexKeyGenerator's
    # "f1:v1,f2:v2" HoodieKey encoding the MOR reader parses back.
    key_fields = [f.strip() for f in record_key.split(",") if f.strip()]
    if not key_fields:
        raise ValueError("hudi upsert: empty record_key")
    for kf in key_fields:
        if kf not in batch_df.columns:
            raise ValueError(f"hudi upsert: batch has no {kf!r} column")
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
    # single-field keys hash the raw column (unchanged layout for
    # existing tables); composite keys hash every field together, so
    # a key's upserts AND deletes always route to one bucket
    bucket_src = (F.xxhash64(F.col(key_fields[0]))
                  if len(key_fields) == 1
                  else F.xxhash64(*[F.col(kf) for kf in key_fields]))
    bucket = F.pmod(bucket_src, F.lit(n_buckets)) \
        .cast("int").alias("__bucket")
    table_abs = os.path.abspath(table_path)
    # first-batch detection from the TIMELINE, never from files on disk:
    # a crashed batch 0 leaves base files WITHOUT a completed instant,
    # and a glob would mistake its retry for a later batch (r13 review).
    # ONLY the empty-timeline error means "first batch" — a malformed
    # commit or the runaway-timeline cap must propagate, or a corrupt
    # table would be silently re-bootstrapped over (r13 review #2)
    try:
        timeline = hudi_timeline(table_path)
    except ValueError as exc:
        if "no completed commits" not in str(exc):
            raise
        timeline = []
    stats: list[dict] = []
    if not timeline:
        pa_schema = _pa_schema_of(batch_df, data_cols)
        # first batch: one base file per bucket (empty buckets included
        # — later log files need a slice to attach to), written from
        # the executors in ONE pass; a batch-0 retry overwrites the
        # same deterministic names
        if has_del and batch_df.filter(F.col(DELETED_COL)).limit(1).count():
            raise ValueError(
                "hudi upsert: deletes against an empty table (no base "
                "files yet) — nothing to delete"
            )

        def write_base(pdf):
            import pandas as _pd
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            b = int(pdf["__bucket"].iloc[0])
            rel = f"bucket-{b:05d}_0-0-0_{instant}.parquet"
            full = os.path.join(table_abs, rel)
            t = _pa.Table.from_pandas(
                pdf[data_cols], schema=pa_schema, preserve_index=False
            )
            _pq.write_table(t, full + ".tmp")
            os.replace(full + ".tmp", full)  # task-retry safe
            return _pd.DataFrame({"bucket": [b], "path": [rel]})

        touched = {
            r.bucket: r.path
            for r in batch_df.select(*data_cols, bucket)
            .groupBy("__bucket")
            .applyInPandas(write_base, "bucket int, path string")
            .collect()  # bounded: one stat row per bucket
        }
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        for i in range(n_buckets):
            rel = touched.get(i)
            if rel is None:  # empty bucket: an empty base file
                rel = f"bucket-{i:05d}_0-0-0_{instant}.parquet"
                _pq.write_table(pa_schema.empty_table(),
                                os.path.join(table_abs, rel))
            stats.append({
                "fileId": f"bucket-{i:05d}", "path": rel,
                "prevCommit": "null", "numWrites": 0,
                "fileSizeInBytes": os.path.getsize(
                    os.path.join(table_abs, rel)),
            })
    else:
        # later batches: ONE log file per TOUCHED bucket, written from
        # the executors (applyInPandas group per bucket, temp+rename).
        # The live file groups must BE this sink's buckets — after a
        # clustering/compaction replaced them, blind log appends would
        # route keys into retired groups (r13 review): refuse loudly.
        slices, _, _ = _file_slices(table_path)
        expected = {f"bucket-{i:05d}" for i in range(n_buckets)}
        actual = {fid for _, fid in slices}
        if actual != expected:
            raise ValueError(
                "hudi upsert: live file groups "
                f"{sorted(actual)} are not this sink's {n_buckets} "
                "buckets — the table was clustered/compacted or written "
                "by another sink; bootstrap a new table for the stream"
            )
        base_instant_of = {
            int(fid.split("-")[1]): sl.base_instant
            for (_, fid), sl in slices.items()
        }
        kfs = list(key_fields)
        dcols = list(data_cols)

        def hoodie_key(row) -> str:
            if len(kfs) == 1:
                return str(row[kfs[0]])
            return ",".join(f"{kf}:{row[kf]}" for kf in kfs)

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
                    "deletes": [hoodie_key(r)
                                for _, r in dead.iterrows()],
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
        "extraMetadata": {"schema": json.dumps(avro_schema),
                          "app-id": table_name,
                          "batch-id": str(batch_id)},
        "operationType": "UPSERT",
    }
    from hive_udf_spark.sources.txn import publish_if_absent

    with open(commit_path + ".tmp", "w") as fh:
        json.dump(meta, fh)
    publish_if_absent(commit_path + ".tmp", commit_path)  # THE atomic publish
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
