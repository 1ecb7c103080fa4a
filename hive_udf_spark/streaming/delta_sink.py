"""Streaming ingestion into a Delta-format table (r11): the
transactional upgrade of the parquet+atomic-swap sinks.

``streaming/sketch_sink.py`` notes that "at deployment scale the same
merge runs against a transactional table format" — with the vendored
Delta writer (sources/delta.py) the engine now HAS one, so streams can
land in a table any Delta reader (including ``read_delta``) consumes
with snapshot isolation, instead of a bare parquet directory swap.

Exactly-once, the Delta way: each micro-batch becomes ONE commit whose
version IS the foreachBatch ``batch_id`` (Spark assigns contiguous ids
from 0 under a checkpoint).  A retried batch finds its commit file
already present and returns — and because the COMMIT JSON is the atomic
publish (Delta readers only see files the log references), a crash
between the data-file write and the commit leaves only unreferenced
orphans, never a torn table.  The commit also carries the protocol's
``txn`` action (appId + version), the idempotent-writer marker real
streaming writers use.  The commit file lands via write-to-temp +
put-if-absent ``os.link`` (r14 — ``sources/txn.py``): atomic on
POSIX, and a SAME-VERSION concurrent commit CONFLICTS loudly for the
loser instead of silently clobbering the winner — the Delta protocol
contract.

Scale shape: the data write is an ordinary distributed
``batch_df.write.parquet``; only the KB-scale log append is
driver-side, the same division as all the lakehouse sources.  Single
writer per table (the streaming query); multi-writer Delta needs
optimistic-concurrency retry, out of scope for an ingest sink.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated streaming/sink extension surface.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame

__all__ = ["delta_commit_sink", "commit_batch_to_delta"]

_PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


def commit_batch_to_delta(
    batch_df: DataFrame, batch_id: int, table_path: str,
    app_id: str = "delta-ingest", checkpoint_every: int = 10,
    maintain_every: int = 0, maintain_target_files: int = 8,
    retention_seconds: float = 24 * 3600.0,
) -> bool:
    """Append one micro-batch to the table as a Delta commit.  Returns
    False (no-op) when this batch is already committed — the
    foreachBatch-retry idempotency check.

    Every ``checkpoint_every`` commits (r13 — the protocol's reader
    fast-path, what real Delta writers do every 10) the sink also
    writes the classic checkpoint parquet + ``_last_checkpoint`` AFTER
    the commit publishes: a reader of a year-old stream replays
    O(checkpoint_every) JSON commits instead of O(stream lifetime) —
    the difference between constant and unbounded snapshot
    reconstruction at fleet age.  The checkpoint is an optimization,
    never the source of truth: it writes via temp+rename (a torn file
    can't surface), and a crash before it simply leaves readers
    replaying a few more JSON commits.  Pass 0 to disable.

    AUTO-MAINTENANCE (r14 — the r13 verdict's task 8, opt-in via
    ``maintain_every`` > 0): every that-many batches the sink runs
    OPTIMIZE compaction to ``maintain_target_files`` files plus VACUUM
    at ``retention_seconds``, so a long-lived stream keeps an
    O(target_files) layout without an external scheduler.  Because
    maintenance inserts its own commits, this mode DECOUPLES commit
    version from batch id (the real Delta streaming-writer design:
    the ``txn`` appId/version action is the idempotency key, the
    version is whatever the log is at) — batch ids must stay
    contiguous per app, and a fresh-checkpoint restart against an
    existing table refuses, same as the default mode."""
    log_dir = os.path.join(table_path, "_delta_log")
    if maintain_every:
        version = _resolve_decoupled_version(
            log_dir, table_path, app_id, batch_id
        )
        if version is None:
            return False  # retried batch
        return _write_commit(
            batch_df, batch_id, table_path, app_id, checkpoint_every,
            version, maintain_every, maintain_target_files,
            retention_seconds,
        )
    version = batch_id
    commit_path = os.path.join(log_dir, f"{batch_id:020d}.json")
    if os.path.exists(commit_path):
        # retried batch — but ONLY if the commit's txn action carries
        # this stream's identity: a fresh checkpoint resets batch ids
        # and silently no-opping would DROP the new batch (r13,
        # matching the other sinks' refusal)
        try:
            with open(commit_path) as fh:
                for line in fh:
                    txn = json.loads(line).get("txn")
                    if txn:
                        if txn.get("appId") == app_id \
                                and txn.get("version") == batch_id:
                            return False
                        break
        except (OSError, json.JSONDecodeError):
            pass
        raise ValueError(
            f"delta sink: version {batch_id} exists but was not "
            f"committed by app {app_id!r} — restarting with a fresh "
            "checkpoint against an existing table would drop or "
            "duplicate batches"
        )
    if os.path.isdir(log_dir):
        # a commit file may be ABSENT because truncate_delta_log
        # reclaimed it: re-publishing that version would be invisible
        # to every reader (snapshots replay from the newer checkpoint)
        # while the sink reports success.  Checkpoints carry the txn
        # (appId/version) state (r14 — PROTOCOL.md idempotent writers),
        # so OUR OWN truncated commit is recognizable and no-ops like
        # any other retry; anything else refuses loudly (r13 review).
        from hive_udf_spark.sources.delta import (
            _latest_checkpoint_version,
            delta_snapshot,
        )

        cp = _latest_checkpoint_version(log_dir, 1 << 62)
        if cp is not None and batch_id <= cp:
            try:
                committed = delta_snapshot(table_path).txns.get(
                    app_id, -1)
            except ValueError:
                committed = -1
            if committed >= batch_id:
                return False  # retried batch whose commit was truncated
            raise ValueError(
                f"delta sink: version {batch_id} is at or below the "
                f"table's checkpoint {cp} (its commit was truncated) "
                f"and the checkpoint's txn state does not show app "
                f"{app_id!r} past it — publishing would be invisible "
                "to readers; point the stream at its original "
                "checkpoint or a new table"
            )
    return _write_commit(batch_df, batch_id, table_path, app_id,
                         checkpoint_every, version, 0, 0, 0.0)


def _resolve_decoupled_version(
    log_dir: str, table_path: str, app_id: str, batch_id: int
) -> int | None:
    """Version for the auto-maintenance mode: the log's next version,
    with idempotency from the snapshot's ``txn`` state (checkpoints
    carry it, so log truncation doesn't lose it).  None = retried
    batch (no-op); ValueError = fresh-checkpoint / foreign-table
    refusal, matching the default mode's contract."""
    import re

    from hive_udf_spark.sources.delta import delta_snapshot

    has_log = os.path.isdir(log_dir) and any(
        re.match(r"^\d{20}\.(json|checkpoint\b)", n) or
        n == "_last_checkpoint"
        for n in os.listdir(log_dir)
    )
    if not has_log:
        if batch_id != 0:
            raise ValueError(
                f"delta sink: batch {batch_id} against an empty table — "
                "the stream checkpoint is ahead of the table; point the "
                "sink at the original table or restart the checkpoint"
            )
        return 0
    snap = delta_snapshot(table_path)
    committed = snap.txns.get(app_id)
    if committed is not None and committed >= batch_id:
        return None
    if committed != batch_id - 1:
        raise ValueError(
            f"delta sink: batch {batch_id} but app {app_id!r} last "
            f"committed batch {committed} — a fresh checkpoint against "
            "an existing table would drop or duplicate batches"
        )
    return snap.version + 1


def _write_commit(
    batch_df: DataFrame, batch_id: int, table_path: str, app_id: str,
    checkpoint_every: int, version: int, maintain_every: int,
    maintain_target_files: int, retention_seconds: float,
) -> bool:
    log_dir = os.path.join(table_path, "_delta_log")
    commit_path = os.path.join(log_dir, f"{version:020d}.json")
    os.makedirs(log_dir, exist_ok=True)
    scratch = os.path.join(table_path, f"_scratch-{batch_id}")
    batch_df.write.mode("overwrite").parquet(scratch)
    adds = []
    for i, part in enumerate(sorted(
        p for p in os.listdir(scratch) if p.endswith(".parquet")
    )):
        name = f"part-{batch_id:010d}-{i:05d}.parquet"
        os.replace(os.path.join(scratch, part), os.path.join(table_path, name))
        adds.append(name)
    shutil.rmtree(scratch)
    lines = []
    if version == 0:
        lines.append(json.dumps({"protocol": _PROTOCOL}))
        lines.append(json.dumps({"metaData": {
            "id": f"stream-{app_id}",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(batch_df.schema.jsonValue()),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 0,
        }}))
    # the txn action's version is the BATCH id — the idempotency key
    # (PROTOCOL.md Transaction Identifiers), deliberately not the
    # commit version so the two can diverge under auto-maintenance
    lines.append(json.dumps(
        {"txn": {"appId": app_id, "version": batch_id}}
    ))
    lines.append(json.dumps(
        {"commitInfo": {"operation": "STREAMING UPDATE",
                        "queryId": app_id, "epochId": batch_id}}
    ))
    for name in adds:
        lines.append(json.dumps({"add": {
            "path": name,
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(table_path, name)),
            "modificationTime": 0,
            "dataChange": True,
        }}))
    from hive_udf_spark.sources.txn import publish_if_absent

    tmp = commit_path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    publish_if_absent(tmp, commit_path)  # THE atomic publish
    if checkpoint_every and (batch_id + 1) % checkpoint_every == 0:
        from hive_udf_spark.sources.delta import checkpoint_delta

        checkpoint_delta(table_path, version)
    if maintain_every and (batch_id + 1) % maintain_every == 0:
        from hive_udf_spark.sources.maintenance import (
            compact_delta_table,
            vacuum_delta_table,
        )

        compact_delta_table(batch_df.sparkSession, table_path,
                            target_files=maintain_target_files)
        vacuum_delta_table(table_path,
                           min_age_seconds=retention_seconds)
    return True


def delta_commit_sink(
    stream_df: DataFrame, table_path: str, checkpoint_dir: str,
    app_id: str = "delta-ingest", checkpoint_every: int = 10,
    maintain_every: int = 0, maintain_target_files: int = 8,
    retention_seconds: float = 24 * 3600.0,
):
    """writeStream → one Delta commit per micro-batch (see module
    docstring for the exactly-once argument).  Returns the started
    StreamingQuery."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        commit_batch_to_delta(batch_df, int(batch_id), table_path, app_id,
                              checkpoint_every, maintain_every,
                              maintain_target_files, retention_seconds)

    return (
        stream_df.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
