"""Vendored Apache Iceberg table source — reads an Iceberg v1/v2
table's live file set straight from its metadata tree, no
iceberg-spark runtime needed (r11, the second lakehouse format after
Delta: large corpora ship as transaction-logged tables, and this
container has no Iceberg jars).

Implemented from the PUBLIC Iceberg table spec
(iceberg.apache.org/spec):

* ``metadata/vN.metadata.json`` (``version-hint.text`` honored, glob
  fallback) — table schema, snapshot log, current snapshot;
* the snapshot's MANIFEST LIST — an Avro OCF the vendored
  ``operators/avrocodec.py`` decodes (one record per manifest file);
* each MANIFEST — Avro OCF of entries ``{status, data_file{...}}``;
  nested records, bounds MAPS and ``fixed`` values decode through the
  same vendored codec (extended for exactly this in r11);
* snapshot reconstruction — entries with status 0 (EXISTING) or 1
  (ADDED) are live, status 2 (DELETED) drops the file; v2 manifests
  carrying DELETE files (``content`` ≠ 0 — position/equality deletes)
  raise a clear ValueError instead of silently over-reading;
* time travel — ``snapshot_id=`` selects any snapshot in the log;
* schema pin — the metadata's schema (Iceberg's own JSON type system)
  converts to a Spark ``StructType`` for the scan, so file-schema
  drift can't leak through.

Spark/scale shape: like the Delta reader, the metadata walk is
driver-side (KB–MB even for PB tables — the same division the real
Iceberg readers use; manifest AVRO decode is the vendored codec over
small files), while the DATA scan is an ordinary distributed
``spark.read.parquet`` over the live files — Iceberg parquet files
physically contain all columns (no hive-style partition-column
reconstruction needed).

The writer twin (``write_iceberg_table``) emits a spec-shaped
metadata.json + Avro manifest list + manifests so the reader is
exercised against adds, whole-file deletes, multiple snapshots and
time travel.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated source/ingest extension surface.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["read_iceberg", "iceberg_live_files", "write_iceberg_table"]

_PRIMITIVES = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamp",
    "timestamptz": "timestamp",
    "uuid": "string",
}


def _spark_type(t) -> str:
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        if t.startswith("decimal("):
            return t
        raise ValueError(f"iceberg: type {t!r} not vendored")
    raise ValueError("iceberg: nested column types not vendored")


def _schema_from_metadata(meta: dict) -> StructType:
    schemas = meta.get("schemas")
    if schemas:
        sid = meta.get("current-schema-id", 0)
        schema = next((s for s in schemas if s.get("schema-id") == sid),
                      schemas[-1])
    else:
        schema = meta.get("schema")
    if not schema or "fields" not in schema:
        raise ValueError("iceberg: metadata carries no schema")
    from pyspark.sql.types import _parse_datatype_string

    cols = ", ".join(
        f"{f['name']} {_spark_type(f['type'])}" for f in schema["fields"]
    )
    return _parse_datatype_string(cols)


def _load_metadata(table_path: str) -> dict:
    mdir = os.path.join(table_path, "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    path = None
    if os.path.exists(hint):
        v = open(hint).read().strip()
        cand = os.path.join(mdir, f"v{v}.metadata.json")
        if os.path.exists(cand):
            path = cand
    if path is None:
        versions = []
        for p in glob.glob(os.path.join(mdir, "v*.metadata.json")):
            stem = os.path.basename(p)[1:].split(".")[0]
            if stem.isdigit():
                versions.append((int(stem), p))
        if not versions:
            raise ValueError(f"iceberg: no metadata json under {mdir!r}")
        path = max(versions)[1]
    try:
        with open(path, "rb") as fh:
            return json.loads(fh.read())
    except (OSError, json.JSONDecodeError) as exc:
        raise ValueError(f"iceberg: metadata unreadable: {exc}") from exc


def _local_path(uri: str, table_path: str) -> str:
    if uri.startswith("file://"):
        return uri[7:]
    if os.path.isabs(uri):
        return uri
    return os.path.join(table_path, uri)


def iceberg_live_files(
    table_path: str, snapshot_id: int | None = None
) -> tuple[dict, list[str]]:
    """(metadata dict, live parquet file paths) at ``snapshot_id``
    (default: the current snapshot)."""
    from hive_udf_spark.operators.avrocodec import decode_ocf

    meta = _load_metadata(table_path)
    snapshots = meta.get("snapshots") or []
    if not snapshots:
        return meta, []
    target = (meta.get("current-snapshot-id")
              if snapshot_id is None else snapshot_id)
    snap = next((s for s in snapshots if s.get("snapshot-id") == target), None)
    if snap is None:
        raise ValueError(f"iceberg: snapshot {target} not in the log")
    mlist = snap.get("manifest-list")
    if not mlist:
        raise ValueError("iceberg: snapshot has no manifest-list")
    with open(_local_path(mlist, table_path), "rb") as fh:
        _, manifests = decode_ocf(fh.read())
    live: list[str] = []
    for m in manifests:
        mpath = m.get("manifest_path")
        if not mpath:
            raise ValueError("iceberg: manifest-list entry without a path")
        if (m.get("content") or 0) != 0:
            raise ValueError(
                "iceberg: DELETE manifests (v2 row-level deletes) not "
                "vendored — reading data manifests alone would over-read"
            )
        with open(_local_path(mpath, table_path), "rb") as fh:
            _, entries = decode_ocf(fh.read())
        for e in entries:
            status = e.get("status")
            if status not in (0, 1, 2):
                raise ValueError(f"iceberg: manifest entry status {status!r}")
            if status == 2:  # DELETED: the file left the table
                continue
            df = e.get("data_file") or {}
            if (df.get("content") or 0) != 0:
                raise ValueError(
                    "iceberg: v2 delete files not vendored"
                )
            fmt = str(df.get("file_format", "")).upper()
            if fmt != "PARQUET":
                raise ValueError(f"iceberg: file format {fmt!r} not vendored")
            fp = df.get("file_path")
            if not fp:
                raise ValueError("iceberg: data_file without a path")
            live.append(_local_path(fp, table_path))
    return meta, sorted(set(live))


def read_iceberg(
    spark: SparkSession, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Iceberg table → DataFrame of its live rows at ``snapshot_id``
    (default: current).  The scan schema is pinned from the table
    metadata, never inferred from the files."""
    meta, files = iceberg_live_files(table_path, snapshot_id)
    schema = _schema_from_metadata(meta)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


# ---------------------------------------------------------------------------
# Writer twin (fixtures, tests, the oracle roundtrip)
# ---------------------------------------------------------------------------

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record",
            "name": "data_file",
            "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
                # real manifests carry per-column bounds maps; the twin
                # includes one so the vendored MAP decode is exercised
                {"name": "column_sizes",
                 "type": ["null", {"type": "map", "values": "long"}]},
            ],
        }},
    ],
}


def write_iceberg_table(
    table_path: str,
    snapshots: list[dict],
    schema_fields: list[dict],
) -> None:
    """Emit a spec-shaped Iceberg table.  ``snapshots[i]`` is
    ``{"added": [paths], "deleted": [paths]}`` relative to the table
    root; each snapshot's manifest list carries one manifest per prior
    state delta, so later snapshots SEE earlier files as EXISTING
    entries and deleted files as DELETED entries — the real layering a
    reader must reconcile.  ``schema_fields`` is the Iceberg-JSON
    field list (id/name/required/type)."""
    from hive_udf_spark.operators.avrocodec import encode_ocf

    mdir = os.path.join(table_path, "metadata")
    os.makedirs(mdir, exist_ok=True)
    snap_meta = []
    live: dict[str, int] = {}  # path -> snapshot added
    for i, s in enumerate(snapshots):
        sid = 1000 + i
        entries = []
        for p in s.get("added", []):
            live[p] = sid
        for p in s.get("deleted", []):
            fp = os.path.join(table_path, p)
            entries.append({
                "status": 2, "snapshot_id": sid,
                "data_file": {
                    "content": 0, "file_path": p, "file_format": "PARQUET",
                    "record_count": 0,
                    "file_size_in_bytes": os.path.getsize(fp)
                    if os.path.exists(fp) else 0,
                    "column_sizes": None,
                },
            })
            live.pop(p, None)
        for p, added_sid in sorted(live.items()):
            fp = os.path.join(table_path, p)
            entries.append({
                "status": 1 if added_sid == sid else 0,
                "snapshot_id": added_sid,
                "data_file": {
                    "content": 0, "file_path": p, "file_format": "PARQUET",
                    "record_count": 0,
                    "file_size_in_bytes": os.path.getsize(fp),
                    "column_sizes": {"1": os.path.getsize(fp)},
                },
            })
        mpath = os.path.join(mdir, f"manifest-{sid}.avro")
        with open(mpath, "wb") as fh:
            fh.write(encode_ocf(_MANIFEST_ENTRY_SCHEMA, entries))
        lpath = os.path.join(mdir, f"snap-{sid}-manifest-list.avro")
        with open(lpath, "wb") as fh:
            fh.write(encode_ocf(_MANIFEST_FILE_SCHEMA, [{
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": 0,
                "added_snapshot_id": sid,
            }]))
        snap_meta.append({
            "snapshot-id": sid,
            "sequence-number": i + 1,
            "timestamp-ms": i,
            "manifest-list": lpath,
            "summary": {"operation": "append" if not s.get("deleted")
                        else "overwrite"},
        })
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": table_path,
        "last-sequence-number": len(snapshots),
        "last-updated-ms": 0,
        "last-column-id": len(schema_fields),
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0,
                     "fields": schema_fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "current-snapshot-id": snap_meta[-1]["snapshot-id"],
        "snapshots": snap_meta,
    }
    version = len(snapshots)
    with open(os.path.join(mdir, f"v{version}.metadata.json"), "w") as fh:
        fh.write(json.dumps(meta))
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write(str(version))
