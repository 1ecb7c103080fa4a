"""Streaming ingestion into an Apache Hudi COW table (r12): the third
transactional streaming sink, completing the lakehouse trio next to
``streaming/delta_sink.py`` and ``streaming/iceberg_sink.py``.

Exactly-once, the Hudi way: each micro-batch becomes one COMPLETED
COMMIT on the ``.hoodie`` timeline — the commit metadata JSON is the
atomic publish (write-temp + put-if-absent ``os.link``,
``sources/txn.py`` — a same-instant race conflicts loudly for the
loser instead of clobbering; the vendored reader, like
real Hudi readers, resolves the live file set from COMPLETED timeline
instants only, so base files on disk without their commit are
invisible).  A retried batch finds its commit file present and
returns; a crash between the data-file write and the commit leaves
only invisible orphans the deterministic retry overwrites in place.

Instant times derive from the batch id (monotone by construction —
Spark assigns contiguous ids under a checkpoint), and each batch's
rows land as NEW file groups (the INSERT path; upserts need a record
index, a different operator).  Commit cost is O(batch): the timeline
append is one KB-scale JSON, the same division as the reader.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated streaming/sink extension surface.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame

__all__ = ["hudi_commit_sink", "commit_batch_to_hudi"]


def commit_batch_to_hudi(
    batch_df: DataFrame, batch_id: int, table_path: str,
    table_name: str = "hudi-ingest", record_key: str = "",
) -> bool:
    """Append one micro-batch as the completed commit at instant
    ``20300101000000 + batch_id``.  Returns False (no-op) when that
    instant is already committed — the foreachBatch-retry idempotency
    check."""
    from hive_udf_spark.sources.hudi import _avro_field

    hoodie = os.path.join(table_path, ".hoodie")
    instant = f"{20300101000000 + batch_id}"
    commit_path = os.path.join(hoodie, f"{instant}.commit")
    if os.path.exists(commit_path):
        # retried batch — but ONLY if the instant is this stream's own
        # commit; a fresh checkpoint resets batch ids and silently
        # no-opping would DROP the new batch (r13, matching the
        # Iceberg sinks' refusal)
        try:
            with open(commit_path) as fh:
                em = (json.load(fh).get("extraMetadata") or {})
        except (OSError, json.JSONDecodeError):
            em = {}
        if em.get("app-id") == table_name \
                and em.get("batch-id") == str(batch_id):
            return False
        raise ValueError(
            f"hudi sink: instant {instant} exists but was not committed "
            f"by app {table_name!r} batch {batch_id} — restarting with a "
            "fresh checkpoint against an existing table would drop or "
            "duplicate batches"
        )
    os.makedirs(hoodie, exist_ok=True)
    props = os.path.join(hoodie, "hoodie.properties")
    if not os.path.exists(props):
        with open(props, "w") as fh:
            fh.write(
                "hoodie.table.name=%s\n"
                "hoodie.table.type=COPY_ON_WRITE\n"
                "hoodie.table.recordkey.fields=%s\n"
                "hoodie.table.version=6\n"
                "hoodie.timeline.layout.version=1\n"
                % (table_name, record_key)
            )
    avro_schema = json.dumps({
        "type": "record",
        "name": table_name.replace("-", "_"),
        "fields": [
            _avro_field(f.name, f.dataType.simpleString())
            for f in batch_df.schema.fields
        ],
    })
    # distributed data write; deterministic base-file names so a retry
    # overwrites its own invisible orphans instead of stacking new ones
    scratch = os.path.join(table_path, f"_scratch-{batch_id}")
    batch_df.write.mode("overwrite").parquet(scratch)
    import pyarrow.parquet as _pq

    stats = []
    for i, part in enumerate(sorted(
        p for p in os.listdir(scratch) if p.endswith(".parquet")
    )):
        if _pq.ParquetFile(
            os.path.join(scratch, part)
        ).metadata.num_rows == 0:
            continue  # empty shuffle parts don't belong in the table
        fid = f"ing-{batch_id:010d}-{i:05d}"
        rel = f"{fid}_0-0-0_{instant}.parquet"
        os.replace(os.path.join(scratch, part),
                   os.path.join(table_path, rel))
        stats.append({
            "fileId": fid,
            "path": rel,
            "prevCommit": "null",
            "numWrites": 0,
            "fileSizeInBytes": os.path.getsize(
                os.path.join(table_path, rel)),
        })
    shutil.rmtree(scratch)
    meta = {
        "partitionToWriteStats": {"": stats},
        "compacted": False,
        "extraMetadata": {"schema": avro_schema,
                          "app-id": table_name,
                          "batch-id": str(batch_id)},
        "operationType": "INSERT",
    }
    from hive_udf_spark.sources.txn import publish_if_absent

    tmp = commit_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    publish_if_absent(tmp, commit_path)  # THE atomic publish
    return True


def hudi_commit_sink(
    stream_df: DataFrame, table_path: str, checkpoint_dir: str,
    table_name: str = "hudi-ingest",
):
    """writeStream → one completed Hudi commit per micro-batch (see
    module docstring for the exactly-once argument).  Returns the
    started StreamingQuery."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        commit_batch_to_hudi(batch_df, int(batch_id), table_path, table_name)

    return (
        stream_df.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
