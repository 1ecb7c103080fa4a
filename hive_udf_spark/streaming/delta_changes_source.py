"""Structured-Streaming SOURCE over the Delta change feed (r14): the
idiomatic ``spark.readStream.format("delta_changes")`` surface for
incremental pipelines, built on Spark 4's Python Data Source API
(``pyspark.sql.datasource``) — the first-class way to hand Spark a
custom streaming source without JVM code.

Each micro-batch is one COMMIT-VERSION RANGE: offsets are
``{"version": N}`` (N = next unread commit), ``latestOffset`` follows
the transaction log, and ``partitions`` resolves the range's change
set through the same driver-side walk as ``read_delta_changes``
(``sources/changes.py``) — one partition per changed file, so the read
fans out across executors and a micro-batch costs O(changed data).
Rows carry ``_change_type`` / ``_commit_version``; deletion-vector
swaps yield exactly the freshly-dead rows (roaring membership applied
per file inside the partition read); OPTIMIZE commits produce no rows.
Reads yield Arrow RecordBatches (the API's vectorized path), never
Python row tuples.

This is the bronze→silver link of a medallion pipeline: a downstream
job subscribes to a table's changes with checkpointed exactly-once
offsets instead of rescanning the table — Spark's own retry/offset
machinery does the bookkeeping, the format's log does the change
tracking.

Scale note: offset resolution and the change walk are KB-scale driver
work per batch; file reads run on executors via pyarrow over the
shared filesystem (the same contract every vendored scan relies on).

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated streaming/source extension surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructField, StructType

__all__ = ["DeltaChangesDataSource", "register_delta_changes_source"]


class _ChangePartition(InputPartition):
    def __init__(self, path: str, change: str, version: int,
                 mode: str | None, blob: bytes | None,
                 schema_json: str):
        self.path = path
        self.change = change
        self.version = version
        self.mode = mode
        self.blob = blob
        self.schema_json = schema_json


class _DeltaChangesStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, starting_version: int):
        self._table = table_path
        self._start = starting_version

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        from hive_udf_spark.sources.delta import _commit_versions, _log_dir

        versions = _commit_versions(_log_dir(self._table))
        return {"version": max(versions, default=-1) + 1}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"]) - 1
        if lo > hi:
            return []
        from hive_udf_spark.sources.changes import _delta_change_files

        schema_json, _, pieces = _delta_change_files(self._table, lo, hi)
        return [
            _ChangePartition(pc["path"], pc["change"], pc["version"],
                             pc["mode"], pc["blob"], schema_json)
            for pc in pieces
        ]

    def read(self, partition: _ChangePartition):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = StructType.fromJson(json.loads(partition.schema_json))
        names = [f.name for f in schema.fields]
        pos = None
        if partition.blob is not None:
            from hive_udf_spark.operators.roaring import decode_rbm64

            pos = decode_rbm64(partition.blob)
        row0 = 0
        for batch in pq.ParquetFile(partition.path).iter_batches():
            t = pa.Table.from_batches([batch]).select(names)
            if pos is not None:
                idx = np.arange(row0, row0 + len(t))
                member = np.isin(idx, pos)
                keep = member if partition.mode == "member" else ~member
                t = t.filter(pa.array(keep))
            row0 += len(batch)
            if len(t) == 0:
                continue
            t = t.append_column(
                "_change_type",
                pa.array([partition.change] * len(t), pa.string()),
            ).append_column(
                "_commit_version",
                pa.array([partition.version] * len(t), pa.int64()),
            )
            yield from t.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream's own checkpoint


class DeltaChangesDataSource(DataSource):
    """``spark.readStream.format("delta_changes").option("path", p)``
    — options: ``path`` (table root, required), ``startingVersion``
    (first commit to emit, default 0)."""

    @classmethod
    def name(cls) -> str:
        return "delta_changes"

    def schema(self):
        table = self.options.get("path")
        if not table:
            raise ValueError("delta_changes: option 'path' is required")
        from hive_udf_spark.sources.delta import delta_snapshot

        snap = delta_snapshot(table)
        base = StructType.fromJson(
            json.loads(snap.metadata["schemaString"])
        )
        return StructType(
            list(base.fields)
            + [StructField("_change_type", __import__(
                "pyspark.sql.types", fromlist=["StringType"]
               ).StringType(), True),
               StructField("_commit_version", __import__(
                "pyspark.sql.types", fromlist=["LongType"]
               ).LongType(), True)]
        )

    def streamReader(self, schema) -> _DeltaChangesStreamReader:
        table = self.options.get("path")
        if not table:
            raise ValueError("delta_changes: option 'path' is required")
        return _DeltaChangesStreamReader(
            os.path.abspath(table),
            int(self.options.get("startingVersion", 0)),
        )


def register_delta_changes_source(spark) -> None:
    """Idempotently register the format with a session."""
    try:
        spark.dataSource.register(DeltaChangesDataSource)
    except Exception as exc:  # already registered
        if "already" not in str(exc).lower():
            raise
