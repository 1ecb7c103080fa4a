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
    maintain_every: int = 0, maintain_target_files: int = 8,
) -> bool:
    """Append one micro-batch as one completed commit.  Returns False
    (no-op) when this batch is already committed — the
    foreachBatch-retry idempotency check.  Default mode pins the
    instant ``20300101000000 + batch_id``.

    AUTO-MAINTENANCE (r14 — the r13 verdict's task 8, opt-in via
    ``maintain_every`` > 0): every that-many batches the sink runs
    clustering to ``maintain_target_files`` file groups plus the
    cleaner (reclaiming the replaced layouts), so a long-lived stream
    keeps an O(target_files) layout without an external scheduler.
    Because clustering publishes its own replacecommit instants, this
    mode DECOUPLES instants from batch ids: the commit's
    extraMetadata app-id/batch-id is the idempotency key (scanned
    newest-first, bounded by the cleaner keeping the timeline short),
    instants continue numerically past whatever the timeline holds,
    and batch ids must stay contiguous per app."""
    from hive_udf_spark.sources.hudi import _avro_field

    hoodie = os.path.join(table_path, ".hoodie")
    if maintain_every:
        done = sorted(
            n for n in (os.listdir(hoodie) if os.path.isdir(hoodie)
                        else [])
            if n.split(".")[0].isdigit()
        )
        instants = sorted({n.split(".")[0] for n in done})
        if not instants:
            if batch_id != 0:
                raise ValueError(
                    f"hudi sink: batch {batch_id} against an empty "
                    "table — the stream checkpoint is ahead of the "
                    "table; point the sink at the original table or "
                    "restart the checkpoint"
                )
            instant = f"{20300101000000}"
        else:
            last = None
            for n in reversed(done):
                if not (n.endswith(".commit")
                        or n.endswith(".replacecommit")):
                    continue
                try:
                    with open(os.path.join(hoodie, n)) as fh:
                        em = (json.load(fh).get("extraMetadata") or {})
                except (OSError, json.JSONDecodeError):
                    continue
                if em.get("app-id") == table_name \
                        and str(em.get("batch-id") or "").isdigit():
                    last = int(em["batch-id"])
                    break  # newest-first: the first hit is the latest
            if last is not None and last >= batch_id:
                return False  # retried batch
            if last != batch_id - 1:
                raise ValueError(
                    f"hudi sink: batch {batch_id} but app "
                    f"{table_name!r} last committed batch {last} — a "
                    "fresh checkpoint against an existing table would "
                    "drop or duplicate batches"
                )
            instant = f"{max(int(i) for i in instants) + 1}"
        return _publish_commit(batch_df, batch_id, table_path,
                               table_name, record_key, instant,
                               maintain_every, maintain_target_files)
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
    return _publish_commit(batch_df, batch_id, table_path, table_name,
                           record_key, instant, 0, 0)


def _publish_commit(
    batch_df: DataFrame, batch_id: int, table_path: str,
    table_name: str, record_key: str, instant: str,
    maintain_every: int, maintain_target_files: int,
) -> bool:
    from hive_udf_spark.sources.hudi import _avro_field

    hoodie = os.path.join(table_path, ".hoodie")
    commit_path = os.path.join(hoodie, f"{instant}.commit")
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
    if maintain_every and (batch_id + 1) % maintain_every == 0:
        from hive_udf_spark.sources.maintenance import (
            clean_hudi_table,
            cluster_hudi_table,
        )

        cluster_hudi_table(batch_df.sparkSession, table_path,
                           target_files=maintain_target_files)
        clean_hudi_table(table_path)
    return True


def hudi_commit_sink(
    stream_df: DataFrame, table_path: str, checkpoint_dir: str,
    table_name: str = "hudi-ingest", maintain_every: int = 0,
    maintain_target_files: int = 8,
):
    """writeStream → one completed Hudi commit per micro-batch (see
    module docstring for the exactly-once argument).  Returns the
    started StreamingQuery."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        commit_batch_to_hudi(batch_df, int(batch_id), table_path,
                             table_name, "",
                             maintain_every, maintain_target_files)

    return (
        stream_df.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
