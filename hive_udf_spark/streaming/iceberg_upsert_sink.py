"""Streaming UPSERT/DELETE ingestion into an Iceberg v2 table (r13):
the equality-delete pattern Flink's Iceberg connector made standard —
each micro-batch publishes one snapshot carrying (a) data files with
the batch's live rows at sequence number N and (b) equality-delete
files (written executor-parallel, one per non-empty shuffle part)
naming every key the batch touched.  The spec's sequence gating
does the merging: an equality delete at sequence N removes matching
rows with sequence < N ONLY, so the batch's own rows survive while
every older version of an upserted key vanishes — no read-modify-write
of existing data files, which is what keeps per-batch cost O(batch) on
a 100 TB table (a rewrite-based MERGE would touch every file holding
an upserted key).

Rows whose boolean ``_deleted`` column is true contribute their key to
the delete file and no data row — a takedown tombstone.

The vendored reader (sources/iceberg.py) already applies exactly these
semantics (sequence-gated anti-joins, size-gated broadcasts), and
``compact_iceberg_table`` later folds the accumulated delete files
into plain data files when read amplification warrants — the same
write-fast / compact-later lifecycle as the Hudi MOR upsert sink.

Exactly-once and crash behavior are inherited from the append sink:
the metadata.json rename is the atomic publish, retried batches no-op
on their version, foreign versions refuse, orphans stay invisible.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated streaming/sink extension surface.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["iceberg_upsert_sink", "upsert_batch_to_iceberg"]

DELETED_COL = "_deleted"


def upsert_batch_to_iceberg(
    batch_df: DataFrame, batch_id: int, table_path: str,
    key: str = "doc_id", app_id: str = "iceberg-upsert",
) -> bool:
    """Apply one micro-batch of upserts/deletes as Iceberg snapshot
    version ``batch_id + 1``: live rows become data files at the new
    sequence number, and every touched key lands in the batch's
    equality-delete files, which erase OLDER rows only (spec sequence
    gating).  Returns
    False (no-op) on the already-committed retry; refuses foreign
    metadata versions like the append sink."""
    import pyarrow.parquet as _pq

    from hive_udf_spark.operators.avrocodec import decode_ocf, encode_ocf
    from hive_udf_spark.sources.iceberg import (
        _MANIFEST_ENTRY_SCHEMA,
        _MANIFEST_FILE_SCHEMA,
        _load_metadata,
    )
    from hive_udf_spark.streaming.iceberg_sink import _iceberg_fields

    if key not in batch_df.columns:
        raise ValueError(f"iceberg upsert: batch has no {key!r} column")
    version = batch_id + 1
    mdir = os.path.join(table_path, "metadata")
    meta_path = os.path.join(mdir, f"v{version}.metadata.json")
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as fh:
                existing = json.load(fh)
            summaries = [s.get("summary") or {}
                         for s in existing.get("snapshots") or []]
        except (OSError, json.JSONDecodeError):
            summaries = []
        if any(s.get("app-id") == app_id
               and s.get("batch-id") == str(batch_id) for s in summaries):
            return False
        raise ValueError(
            f"iceberg upsert: metadata version v{version} exists but was "
            f"not committed by app {app_id!r} batch {batch_id} — point "
            "the sink at a new table or reuse the original checkpoint"
        )
    os.makedirs(mdir, exist_ok=True)
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    has_del = DELETED_COL in batch_df.columns
    data_df = batch_df.drop(DELETED_COL) if has_del else batch_df
    if has_del:
        # keep rows whose _deleted is null or false
        live = batch_df.filter(
            F.col(DELETED_COL).isNull() | ~F.col(DELETED_COL)
        ).drop(DELETED_COL)
    else:
        live = batch_df
    keys_df = batch_df.select(key)
    fields = _iceberg_fields(data_df)
    key_id = next(f["id"] for f in fields if f["name"] == key)
    scratch = os.path.join(table_path, f"_upsert-{batch_id}")
    live.write.mode("overwrite").parquet(scratch)
    rels: list[tuple[str, int]] = []  # (rel path, rows)
    for i, part in enumerate(sorted(
        p for p in os.listdir(scratch) if p.endswith(".parquet")
    )):
        n = _pq.ParquetFile(os.path.join(scratch, part)).metadata.num_rows
        if n == 0:
            continue
        rel = f"data/upsert-{batch_id:010d}-{i:05d}.parquet"
        os.replace(os.path.join(scratch, part),
                   os.path.join(table_path, rel))
        rels.append((rel, n))
    shutil.rmtree(scratch)
    sid = 7000 + batch_id
    seq = version
    del_rels: list[tuple[str, int]] = []  # (rel path, rows)
    if version > 1:
        # older rows of every touched key must die; version 1 has no
        # older rows, so no delete file is written.  The key set is
        # written with the batch's natural parallelism (r13 ADVICE: a
        # coalesce(1) funneled every touched key through one task,
        # contradicting the O(batch) executor-parallel claim) and each
        # non-empty part registers as its own equality-delete file —
        # the spec allows any number per snapshot.
        del_scratch = os.path.join(table_path, f"_upsertdel-{batch_id}")
        keys_df.write.mode("overwrite").parquet(del_scratch)
        for i, part in enumerate(sorted(
            p for p in os.listdir(del_scratch) if p.endswith(".parquet")
        )):
            n = _pq.ParquetFile(
                os.path.join(del_scratch, part)).metadata.num_rows
            if n == 0:
                continue
            rel = f"data/upsert-eqdel-{batch_id:010d}-{i:05d}.parquet"
            os.replace(os.path.join(del_scratch, part),
                       os.path.join(table_path, rel))
            del_rels.append((rel, n))
        shutil.rmtree(del_scratch)
    prev = _load_metadata(table_path) if version > 1 else None
    if prev is None:
        snapshots: list[dict] = []
        prev_manifests: list[dict] = []
    else:
        snapshots = list(prev.get("snapshots") or [])
        if any(s.get("snapshot-id") == sid for s in snapshots):
            raise ValueError(
                f"iceberg upsert: snapshot id {sid} already exists"
            )
        cur = next(
            (s for s in snapshots
             if s.get("snapshot-id") == prev.get("current-snapshot-id")),
            None,
        )
        prev_manifests = []
        if cur is not None:
            with open(cur["manifest-list"] if
                      os.path.isabs(cur["manifest-list"])
                      else os.path.join(table_path, cur["manifest-list"]),
                      "rb") as fh:
                _, prev_manifests = decode_ocf(fh.read())
    entries = [{
        "status": 1, "snapshot_id": sid, "sequence_number": seq,
        "data_file": {
            "content": 0, "file_path": rel, "file_format": "PARQUET",
            "record_count": n,
            "file_size_in_bytes": os.path.getsize(
                os.path.join(table_path, rel)),
            "column_sizes": None, "equality_ids": None, "partition": None,
        },
    } for rel, n in rels]
    mlist_rows = [dict(m) for m in prev_manifests]
    if entries:
        mpath = os.path.join(mdir, f"upsert-manifest-{sid}.avro")
        with open(mpath, "wb") as fh:
            fh.write(encode_ocf(_MANIFEST_ENTRY_SCHEMA, entries))
        mlist_rows.append({
            "manifest_path": mpath,
            "manifest_length": os.path.getsize(mpath),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": seq,
            "added_snapshot_id": sid,
        })
    if del_rels:
        dentry = [{
            "status": 1, "snapshot_id": sid, "sequence_number": seq,
            "data_file": {
                "content": 2, "file_path": rel,
                "file_format": "PARQUET",
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(table_path, rel)),
                "column_sizes": None,
                "equality_ids": [key_id],
                "partition": None,
            },
        } for rel, n in del_rels]
        dmpath = os.path.join(mdir, f"upsert-delete-manifest-{sid}.avro")
        with open(dmpath, "wb") as fh:
            fh.write(encode_ocf(_MANIFEST_ENTRY_SCHEMA, dentry))
        mlist_rows.append({
            "manifest_path": dmpath,
            "manifest_length": os.path.getsize(dmpath),
            "partition_spec_id": 0,
            "content": 1,
            "sequence_number": seq,
            "added_snapshot_id": sid,
        })
    lpath = os.path.join(mdir, f"snap-{sid}-manifest-list.avro")
    with open(lpath, "wb") as fh:
        fh.write(encode_ocf(_MANIFEST_FILE_SCHEMA, mlist_rows))
    snapshots.append({
        "snapshot-id": sid,
        "sequence-number": seq,
        "timestamp-ms": batch_id,
        "manifest-list": lpath,
        "summary": {"operation": "overwrite", "app-id": app_id,
                    "batch-id": str(batch_id)},
    })
    if prev is None:
        meta = {
            "format-version": 2,
            "table-uuid": "00000000-0000-0000-0000-00000000f00d",
            "location": table_path,
            "last-sequence-number": seq,
            "last-updated-ms": batch_id,
            "last-column-id": len(fields),
            "current-schema-id": 0,
            "schemas": [{"type": "struct", "schema-id": 0,
                         "fields": fields}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "current-snapshot-id": sid,
            "snapshots": snapshots,
        }
    else:
        meta = dict(prev)
        meta["last-sequence-number"] = seq
        meta["last-updated-ms"] = batch_id
        meta["current-snapshot-id"] = sid
        meta["snapshots"] = snapshots
    from hive_udf_spark.sources.txn import publish_if_absent

    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(json.dumps(meta))
    publish_if_absent(tmp, meta_path)  # THE atomic publish
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write(str(version))
    return True


def iceberg_upsert_sink(
    stream_df: DataFrame, table_path: str, checkpoint_dir: str,
    key: str = "doc_id", app_id: str = "iceberg-upsert",
):
    """writeStream → one equality-delete upsert snapshot per
    micro-batch (see module docstring).  Returns the started
    StreamingQuery."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch_to_iceberg(batch_df, int(batch_id), table_path,
                                key, app_id)

    return (
        stream_df.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
