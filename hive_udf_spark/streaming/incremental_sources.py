"""Structured-Streaming SOURCES over Iceberg snapshots and the Hudi
timeline (r14) — completing the change-feed trio next to
``streaming/delta_changes_source.py``, on Spark 4's Python Data
Source API:

* ``spark.readStream.format("iceberg_incremental")`` — offsets are
  snapshot ids; each micro-batch is the spec's incremental append
  scan over the newly-arrived snapshots (non-append snapshots in a
  batch refuse, the same contract as the batch reader).  Rows carry
  ``_snapshot_id``.
* ``spark.readStream.format("hudi_incremental")`` — offsets are
  instants; each micro-batch is Hudi's incremental query over the
  newly-completed commits (replacecommits skipped; MOR logs and
  meta-less rewrites refuse; ``_hoodie_commit_time`` attributes rows
  through file-group rewrites when present).  Rows carry
  ``_commit_time``.

Both resolve offsets and change sets through the SAME driver-side
walks as the batch readers (``sources/changes.py``) — KB-scale
metadata work per batch — and read one partition per changed file on
the executors via pyarrow, yielding Arrow record batches.  Spark's
checkpoint machinery gives exactly-once offset bookkeeping; a
downstream job subscribes to a table instead of rescanning it.

Options: ``path`` (required); ``startingSnapshotId`` (Iceberg,
default: from the beginning) / ``startingInstant`` (Hudi, exclusive,
default: from the beginning).

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

__all__ = [
    "IcebergIncrementalDataSource",
    "HudiIncrementalDataSource",
    "register_incremental_sources",
]


# ---------------------------------------------------------------------------
# Iceberg
# ---------------------------------------------------------------------------


class _IcebergPartition(InputPartition):
    def __init__(self, path: str, sid: int, schema_json: str):
        self.path = path
        self.sid = sid
        self.schema_json = schema_json


class _IcebergIncrementalReader(DataSourceStreamReader):
    def __init__(self, table_path: str, starting: int | None):
        self._table = table_path
        self._start = starting  # None = from the beginning

    def initialOffset(self) -> dict:
        return {"snapshot_id": -1 if self._start is None else self._start}

    def latestOffset(self) -> dict:
        from hive_udf_spark.sources.iceberg import _load_metadata

        meta = _load_metadata(self._table)
        cur = meta.get("current-snapshot-id")
        return {"snapshot_id": -1 if cur is None else int(cur)}

    def partitions(self, start: dict, end: dict):
        lo = int(start["snapshot_id"])
        hi = int(end["snapshot_id"])
        if hi == -1 or lo == hi:
            return []
        from hive_udf_spark.sources.changes import _iceberg_added_files

        _, names, ranges = _iceberg_added_files(
            self._table, None if lo == -1 else lo, hi
        )
        sj = json.dumps(names)
        return [
            _IcebergPartition(p, sid, sj)
            for sid, paths in ranges for p in paths
        ]

    def read(self, partition: _IcebergPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        names = json.loads(partition.schema_json)
        for batch in pq.ParquetFile(partition.path).iter_batches():
            t = pa.Table.from_batches([batch]).select(names)
            t = t.append_column(
                "_snapshot_id",
                pa.array([partition.sid] * len(t), pa.int64()),
            )
            yield from t.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream's own checkpoint


class IcebergIncrementalDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_incremental"

    def _table(self) -> str:
        table = self.options.get("path")
        if not table:
            raise ValueError(
                "iceberg_incremental: option 'path' is required"
            )
        return os.path.abspath(table)

    def schema(self) -> str:
        # DDL string, context-free: this runs in a planner worker with
        # no active SparkSession
        from hive_udf_spark.sources.changes import _iceberg_ddl
        from hive_udf_spark.sources.iceberg import _load_metadata

        ddl, _ = _iceberg_ddl(_load_metadata(self._table()))
        return f"{ddl}, _snapshot_id long"

    def streamReader(self, schema) -> _IcebergIncrementalReader:
        raw = self.options.get("startingSnapshotId")
        return _IcebergIncrementalReader(
            self._table(), None if raw is None else int(raw)
        )


# ---------------------------------------------------------------------------
# Hudi
# ---------------------------------------------------------------------------


class _HudiPartition(InputPartition):
    def __init__(self, path: str, instant: str, has_meta: bool,
                 ddl: str, names: list[str]):
        self.path = path
        self.instant = instant
        self.has_meta = has_meta
        self.ddl = ddl
        self.names = names


class _HudiIncrementalReader(DataSourceStreamReader):
    def __init__(self, table_path: str, starting: str | None):
        self._table = table_path
        self._start = starting  # None = from the beginning

    def initialOffset(self) -> dict:
        return {"instant": "" if self._start is None else self._start}

    def latestOffset(self) -> dict:
        from hive_udf_spark.sources.hudi import hudi_timeline

        try:
            timeline = hudi_timeline(self._table)
        except ValueError as exc:
            if "no completed commits" in str(exc):
                return {"instant": ""}
            raise
        return {"instant": timeline[-1][0]}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["instant"], end["instant"]
        if not hi or lo == hi:
            return []
        from hive_udf_spark.sources.changes import _hudi_incremental_files

        (ddl, names), ranges = _hudi_incremental_files(
            self._table, lo or None, hi
        )
        return [
            _HudiPartition(p, instant, has_meta, ddl, names)
            for instant, paths, has_meta in ranges for p in paths
        ]

    def read(self, partition: _HudiPartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for batch in pq.ParquetFile(partition.path).iter_batches():
            t = pa.Table.from_batches([batch])
            if partition.has_meta:
                t = t.filter(pc.equal(t["_hoodie_commit_time"],
                                      partition.instant))
            t = t.select(partition.names)
            if len(t) == 0:
                continue
            t = t.append_column(
                "_commit_time",
                pa.array([partition.instant] * len(t), pa.string()),
            )
            yield from t.to_batches()

    def commit(self, end: dict) -> None:
        pass


class HudiIncrementalDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hudi_incremental"

    def _table(self) -> str:
        table = self.options.get("path")
        if not table:
            raise ValueError("hudi_incremental: option 'path' is required")
        return os.path.abspath(table)

    def schema(self) -> str:
        # DDL string, context-free (planner worker, no SparkSession)
        from hive_udf_spark.sources.hudi import (
            _file_slices,
            _schema_from_commit,
        )

        _, last_meta, _ = _file_slices(self._table())
        pinned = _schema_from_commit(last_meta or {})
        if pinned is None:
            raise ValueError("hudi_incremental: table has no stamped schema")
        return f"{pinned[0]}, _commit_time string"

    def streamReader(self, schema) -> _HudiIncrementalReader:
        return _HudiIncrementalReader(
            self._table(), self.options.get("startingInstant")
        )


def register_incremental_sources(spark) -> None:
    """Idempotently register both formats with a session."""
    for src in (IcebergIncrementalDataSource, HudiIncrementalDataSource):
        try:
            spark.dataSource.register(src)
        except Exception as exc:  # already registered
            if "already" not in str(exc).lower():
                raise
