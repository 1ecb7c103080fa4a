"""Incremental and change queries over the vendored lakehouse formats
(r14, beyond the verdict brief): the read side of a 100 TB INCREMENTAL
pipeline.  A downstream job that reprocesses the whole table per run
costs O(table) forever; these readers cost O(changed data) by
resolving the change set from the formats' own transaction metadata —
KB-scale driver work — and scanning only the files (or the row
positions) the range touched:

* ``read_delta_changes`` — Delta CDF-lite from the commit log:
  ``add`` actions with ``dataChange=true`` in the version range are
  inserts, ``remove``+``dataChange=true`` are whole-file deletes (the
  removed file is re-read while it survives vacuum), and a
  deletion-vector swap on a kept file yields EXACTLY the newly-deleted
  rows (new DV minus old DV, membership-filtered inside the scan).
  OPTIMIZE commits (``dataChange=false``) are invisible, the flag's
  whole point.  Output = table columns + ``_change_type`` +
  ``_commit_version``.
* ``read_iceberg_incremental`` — the spec's incremental append scan:
  data files ADDED (manifest status 1) by snapshots in
  ``(from_snapshot_id, to_snapshot_id]``; any non-append operation in
  the range refuses (same contract as Spark's incremental read).
  Output = table columns + ``_snapshot_id``.
* ``read_hudi_incremental`` — Hudi's incremental query: base files
  written by commits in ``(begin_instant, end_instant]``; when the
  files carry the ``_hoodie_commit_time`` meta column the rows are
  filtered by it (exact row-level increments even through file-group
  rewrites — real Hudi's mechanism); meta-less files are accepted
  as whole-file inserts (this repo's sink shape) but refuse when the
  commit REPLACED file groups (the rewrite would replay old rows).
  Replacecommits (clustering) add no data and are skipped.  Output =
  table columns + ``_commit_time``.

Plus the write-side partner ``delete_from_delta``: DELETE WITHOUT
REWRITE via deletion vectors — matching row positions become roaring
bitmaps written FROM THE EXECUTORS (one DV file per touched data
file), unioned with any existing DV, and published as one
remove+re-add commit per the protocol; a file whose every row dies
becomes a plain remove.  At 100 TB a GDPR-delete of a million rows
touches KB of DV bytes instead of rewriting TB of parquet — and
``read_delta_changes`` surfaces exactly those rows as deletes.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated source/ingest extension surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "delete_from_delta",
    "read_delta_changes",
    "read_iceberg_incremental",
    "read_hudi_incremental",
]


# ---------------------------------------------------------------------------
# Delta: DV-backed delete
# ---------------------------------------------------------------------------


def delete_from_delta(
    spark: SparkSession, table_path: str, predicate: str,
    max_deleted_rows: int = 5_000_000,
) -> int:
    """Delete the rows matching ``predicate`` (a SQL boolean over the
    table's columns) WITHOUT rewriting data files: per touched file a
    deletion-vector roaring bitmap is written from the executors and
    one commit re-adds the file with its new DV (unioned with any
    existing DV — the protocol replaces the descriptor wholesale).
    Returns the number of rows deleted (0 = no-op, nothing published).

    Refuses column-mapped and partitioned tables (predicate/physical
    name interplay not vendored) and deletes past ``max_deleted_rows``
    — a delete that dense should be a rewrite (compaction), not a DV;
    the cap keeps the per-file bitmaps KB-scale, which is the entire
    point of the format."""
    from hive_udf_spark.sources.delta import (
        _dv_blob,
        _log_dir,
        delta_snapshot,
    )
    from hive_udf_spark.sources.txn import publish_if_absent

    snap = delta_snapshot(table_path)
    schema = StructType.fromJson(json.loads(snap.metadata["schemaString"]))
    conf = (snap.metadata or {}).get("configuration") or {}
    if (conf.get("delta.columnMapping.mode") or "none") != "none":
        raise ValueError(
            "delta delete: column-mapped tables not vendored (the "
            "predicate would need physical-name translation)"
        )
    if snap.metadata.get("partitionColumns"):
        raise ValueError(
            "delta delete: partitioned tables not vendored"
        )
    if not snap.files:
        return 0
    abs_of = {}
    for rel, add in snap.files.items():
        p = rel if os.path.isabs(rel) else os.path.join(table_path, rel)
        abs_of[os.path.abspath(p)] = rel
    files = sorted(abs_of)
    scan = spark.read.schema(schema).parquet(*files).withColumn(
        "__fp",
        F.regexp_replace(F.col("_metadata.file_path"), "^file:(//)?", ""),
    ).withColumn("__ri", F.col("_metadata.row_index"))
    matched = scan.filter(F.expr(predicate)).select("__fp", "__ri")
    n = matched.count()
    if n == 0:
        return 0
    if n > max_deleted_rows:
        raise ValueError(
            f"delta delete: {n} rows match, past the {max_deleted_rows} "
            "cap — a delete that dense should rewrite (compact) instead "
            "of carrying a dense deletion vector"
        )
    # existing DVs (already-deleted positions) must be UNIONED in: the
    # new descriptor replaces the old one wholesale (protocol)
    old_blobs: dict[str, bytes] = {}
    for rel, add in snap.files.items():
        dv = add.get("deletionVector")
        if dv:
            p = rel if os.path.isabs(rel) else os.path.join(table_path, rel)
            old_blobs[os.path.abspath(p)] = _dv_blob(table_path, dv)[0]
    bc_old = spark.sparkContext.broadcast(old_blobs)
    table_abs = os.path.abspath(table_path)

    def write_dv(pdf):
        """One touched file's positions → one DV file written from the
        executor (shared-FS contract, the upsert sinks' pattern);
        only the KB-scale descriptor stats return to the driver."""
        import uuid as _uuid
        import zlib

        import pandas as _pd

        from hive_udf_spark.operators.roaring import (
            decode_rbm64,
            encode_rbm64,
            z85_encode,
        )
        from urllib.parse import unquote

        fp = unquote(str(pdf["__fp"].iloc[0]))
        positions = set(int(x) for x in pdf["__ri"])
        old = bc_old.value.get(os.path.abspath(fp))
        n_new = len(positions)
        if old is not None:
            prior = set(int(x) for x in decode_rbm64(old))
            n_new = len(positions - prior)
            positions |= prior
        data = encode_rbm64(sorted(positions))
        u = _uuid.uuid4()
        blob = b"\x01" + len(data).to_bytes(4, "big") + data \
            + zlib.crc32(data).to_bytes(4, "big")
        name = f"deletion_vector_{u}.bin"
        with open(os.path.join(table_abs, name + ".tmp"), "wb") as fh:
            fh.write(blob)
        os.replace(os.path.join(table_abs, name + ".tmp"),
                   os.path.join(table_abs, name))  # task-retry safe
        return _pd.DataFrame({
            "fp": [os.path.abspath(fp)],
            "dv_uuid": [z85_encode(u.bytes)],
            "size": [len(data)],
            "cardinality": [len(positions)],
            "newly_deleted": [n_new],
        })

    stats = matched.groupBy("__fp").applyInPandas(
        write_dv,
        "fp string, dv_uuid string, size long, cardinality long, "
        "newly_deleted long",
    ).collect()
    # row counts per file (parquet footers, driver, O(touched files)):
    # a DV covering every row retires the file outright
    import pyarrow.parquet as pq

    # a predicate whose every match is ALREADY DV-dead is a no-op: do
    # not publish a content-free commit (r14 self-review) — reclaim
    # the just-written (redundant) DV files instead
    if sum(int(r.newly_deleted) for r in stats) == 0:
        from hive_udf_spark.operators.roaring import z85_decode

        import uuid as _uuid

        for r in stats:
            u = _uuid.UUID(bytes=z85_decode(r.dv_uuid))
            try:
                os.remove(os.path.join(table_path,
                                       f"deletion_vector_{u}.bin"))
            except FileNotFoundError:
                pass
        return 0
    lines = [json.dumps({"commitInfo": {"operation": "DELETE",
                                        "predicate": predicate}})]
    deleted = 0
    for r in stats:
        deleted += int(r.newly_deleted)
        rel = abs_of[r.fp]
        add = dict(snap.files[rel])
        total = pq.ParquetFile(r.fp).metadata.num_rows
        lines.append(json.dumps({"remove": {
            "path": add["path"], "deletionTimestamp": 0,
            "dataChange": True,
        }}))
        if int(r.cardinality) >= total:
            continue  # every row dead: plain remove, no re-add
        add["dataChange"] = True
        add["deletionVector"] = {
            "storageType": "u",
            "pathOrInlineDv": r.dv_uuid,
            "offset": 1,
            "sizeInBytes": int(r.size),
            "cardinality": int(r.cardinality),
        }
        lines.append(json.dumps({"add": add}))
    version = snap.version + 1
    commit = os.path.join(_log_dir(table_path), f"{version:020d}.json")
    with open(commit + ".tmp", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    publish_if_absent(commit + ".tmp", commit)  # THE atomic publish
    return deleted


# ---------------------------------------------------------------------------
# Delta: change query (CDF-lite)
# ---------------------------------------------------------------------------


def _dv_positions_set(table_path: str, add: dict) -> set[int]:
    from hive_udf_spark.operators.roaring import decode_rbm64
    from hive_udf_spark.sources.delta import _dv_blob

    dv = add.get("deletionVector")
    if not dv:
        return set()
    return set(int(x) for x in decode_rbm64(_dv_blob(table_path, dv)[0]))


def _delta_change_files(
    table_path: str, start_version: int, end_version: int | None = None,
) -> tuple[str, int, list[dict]]:
    """Driver-side change-set resolution shared by the batch reader and
    the streaming source: (schema JSON, resolved end version, pieces),
    each piece ``{"path", "change", "version", "mode", "blob"}`` with
    mode None (whole file), ``"member"`` (rows AT the blob's roaring
    positions — a DV swap's freshly-dead rows), or ``"keep"`` (rows NOT
    at them — a whole-file delete minus its prior DV).  KB-scale log
    work; no Spark session involved."""
    from hive_udf_spark.operators.roaring import encode_rbm64
    from hive_udf_spark.sources.delta import (
        _commit_versions,
        _log_dir,
        delta_snapshot,
    )

    log_dir = _log_dir(table_path)
    versions = _commit_versions(log_dir)
    if end_version is None:
        end_version = max(versions, default=-1)
    if start_version > end_version:
        raise ValueError("delta changes: start_version > end_version")
    wanted = list(range(start_version, end_version + 1))
    missing = [v for v in wanted if v not in set(versions)]
    if missing:
        raise ValueError(
            f"delta changes: commit versions {missing} are not in the "
            "log (truncated?) — the change set is not reconstructible"
        )
    snap_end = delta_snapshot(table_path, end_version)
    if (((snap_end.metadata or {}).get("configuration") or {})
            .get("delta.columnMapping.mode") or "none") != "none":
        raise ValueError("delta changes: column-mapped tables not vendored")
    abs_of = lambda p: os.path.abspath(
        p if os.path.isabs(p) else os.path.join(table_path, p)
    )
    prior: dict[str, dict] = {}
    if start_version > 0:
        prior = dict(delta_snapshot(table_path, start_version - 1).files)
    # keyed by ABSOLUTE path — the replay below resolves action paths
    # absolutely, and a relative key here would silently miss (rows
    # already DV-dead before the range would re-report as deletes)
    dv_state: dict[str, set[int]] = {
        abs_of(p): _dv_positions_set(table_path, a)
        for p, a in prior.items() if a.get("deletionVector")
    }
    pieces: list[dict] = []

    def emit(path: str, change: str, version: int,
             mode: str | None = None, positions: set[int] | None = None):
        if not os.path.exists(path):
            raise ValueError(
                f"delta changes: file {path!r} of version {version} is "
                "gone (vacuumed) — the change set is not "
                "reconstructible; lower the range or raise retention"
            )
        pieces.append({
            "path": path, "change": change, "version": version,
            "mode": mode,
            "blob": (bytes(encode_rbm64(sorted(positions)))
                     if positions else None),
        })

    for v in wanted:
        with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
            actions = [json.loads(line) for line in fh if line.strip()]
        adds, removes, dv_deletes = [], [], {}
        for a in actions:
            add = a.get("add")
            rem = a.get("remove")
            if add and add.get("dataChange"):
                path = abs_of(add["path"])
                new_dv = _dv_positions_set(table_path, add)
                old_dv = dv_state.get(path, set())
                if add.get("deletionVector") and (new_dv - old_dv):
                    # DV swap: the freshly-dead positions are deletes
                    dv_deletes[path] = new_dv - old_dv
                elif not add.get("deletionVector"):
                    adds.append(path)
                dv_state[path] = new_dv
            elif rem and rem.get("dataChange"):
                removes.append(abs_of(rem["path"]))
        # a remove paired with a DV re-add of the SAME file is the DV
        # protocol shape, not a whole-file delete
        removes = [p for p in removes if p not in dv_deletes
                   and p not in adds]
        for p in sorted(adds):
            emit(p, "insert", v)
        for p in sorted(removes):
            # whole-file delete: rows still under a PRIOR DV were
            # already dead and must not re-report
            dead = dv_state.pop(p, set())
            emit(p, "delete", v, mode="keep" if dead else None,
                 positions=dead or None)
        for p in sorted(dv_deletes):
            emit(p, "delete", v, mode="member",
                 positions=dv_deletes[p])
    return snap_end.metadata["schemaString"], end_version, pieces


def _position_filter_udf(spark: SparkSession, blob: bytes, mode: str):
    """Vectorized row-position filter for a SINGLE file's piece:
    ``member`` keeps rows AT the roaring positions, ``keep`` keeps rows
    NOT at them.  The piece scans exactly one file, so the row index
    alone identifies the row."""
    bc = spark.sparkContext.broadcast(bytes(blob))
    keep_members = mode == "member"

    @F.pandas_udf("boolean")
    def sel(ri):
        import numpy as np
        import pandas as _pd

        from hive_udf_spark.operators.roaring import decode_rbm64

        pos = decode_rbm64(bc.value)
        member = np.isin(ri.to_numpy(), pos)
        return _pd.Series(member if keep_members else ~member)

    return sel


def read_delta_changes(
    spark: SparkSession, table_path: str, start_version: int,
    end_version: int | None = None,
) -> DataFrame:
    """Rows changed in commit versions ``[start_version, end_version]``
    (end defaults to latest), CDF-lite from the log itself — see the
    module docstring for the action→change mapping.  A commit JSON
    missing from the range (truncated log) or a removed file already
    vacuumed refuses loudly: the change set is not reconstructible."""
    schema_json, _, pieces = _delta_change_files(
        table_path, start_version, end_version
    )
    schema = StructType.fromJson(json.loads(schema_json))
    names = [f.name for f in schema.fields]
    out_pieces: list[DataFrame] = []

    # whole-file pieces of one (change, version) batch into one scan;
    # blob-filtered pieces scan per file with a membership UDF
    plain: dict[tuple[str, int], list[str]] = {}
    for pc in pieces:
        if pc["mode"] is None:
            plain.setdefault((pc["change"], pc["version"]),
                             []).append(pc["path"])

    def stamped(d: DataFrame, change: str, version: int) -> DataFrame:
        return d.select(*names).withColumn(
            "_change_type", F.lit(change)
        ).withColumn("_commit_version", F.lit(version).cast("long"))

    for (change, version), paths in sorted(plain.items()):
        out_pieces.append(stamped(
            spark.read.schema(schema).parquet(*sorted(paths)),
            change, version,
        ))
    # one filter PER PIECE: a single path-keyed broadcast would let two
    # DV swaps on the SAME file inside the range collide (the later
    # blob would filter both versions' pieces — r14 self-review pass 2)
    for pc in (pc for pc in pieces if pc["mode"] is not None):
        sel = _position_filter_udf(spark, pc["blob"], pc["mode"])
        d = spark.read.schema(schema).parquet(pc["path"]).filter(
            sel(F.col("_metadata.row_index"))
        )
        out_pieces.append(stamped(d, pc["change"], pc["version"]))
    if not out_pieces:
        return spark.createDataFrame([], schema).withColumn(
            "_change_type", F.lit(None).cast("string")
        ).withColumn("_commit_version", F.lit(None).cast("long"))
    out = out_pieces[0]
    for d in out_pieces[1:]:
        out = out.unionByName(d)
    return out


# ---------------------------------------------------------------------------
# Iceberg: incremental append scan
# ---------------------------------------------------------------------------


def _iceberg_type_ddl(t, depth: int = 0) -> str:
    """Iceberg JSON type → Spark DDL string, CONTEXT-FREE (the Python
    data-source workers have no active SparkSession, so
    ``_parse_datatype_string``-based conversion is unusable there)."""
    from hive_udf_spark.sources.iceberg import _PRIMITIVES

    if depth > 32:
        raise ValueError("iceberg: type nesting past the cap")
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        if t.startswith("decimal("):
            return t
        raise ValueError(f"iceberg: type {t!r} not vendored")
    kind = t.get("type") if isinstance(t, dict) else None
    if kind == "struct":
        inner = ",".join(
            f"{f['name']}:{_iceberg_type_ddl(f['type'], depth + 1)}"
            for f in t.get("fields", [])
        )
        return f"struct<{inner}>"
    if kind == "list":
        return f"array<{_iceberg_type_ddl(t['element'], depth + 1)}>"
    if kind == "map":
        return (f"map<{_iceberg_type_ddl(t['key'], depth + 1)},"
                f"{_iceberg_type_ddl(t['value'], depth + 1)}>")
    raise ValueError(f"iceberg: type {t!r} not vendored")


def _iceberg_ddl(meta: dict) -> tuple[str, list[str]]:
    """(DDL string, column names) for the current schema —
    context-free twin of ``_schema_from_metadata``."""
    schemas = meta.get("schemas")
    if schemas:
        sid = meta.get("current-schema-id", 0)
        schema = next((s for s in schemas if s.get("schema-id") == sid),
                      schemas[-1])
    else:
        schema = meta.get("schema")
    if not schema or "fields" not in schema:
        raise ValueError("iceberg: metadata carries no schema")
    fields = schema["fields"]
    ddl = ", ".join(
        f"{f['name']} {_iceberg_type_ddl(f['type'])}" for f in fields
    )
    return ddl, [f["name"] for f in fields]


def _iceberg_added_files(
    table_path: str, from_snapshot_id: int | None,
    to_snapshot_id: int | None = None,
) -> tuple[str, list[str], list[tuple[int, list[str]]]]:
    """Driver-side incremental walk shared by the batch reader and the
    streaming source: (schema DDL, column names, [(snapshot_id,
    [added parquet paths])]) for snapshots in ``(from, to]`` —
    ``from=None`` means from the beginning of the log.  Non-append
    snapshots in the range refuse.  Context-free (runs in data-source
    planner workers)."""
    from hive_udf_spark.operators.avrocodec import decode_ocf
    from hive_udf_spark.sources.iceberg import (
        _load_metadata,
        _local_path,
    )

    meta = _load_metadata(table_path)
    snapshots = meta.get("snapshots") or []
    ids = [s.get("snapshot-id") for s in snapshots]
    if from_snapshot_id is None:
        lo = -1
    else:
        if from_snapshot_id not in ids:
            raise ValueError(
                f"iceberg incremental: snapshot {from_snapshot_id} not "
                "in the log (expired?) — the change set is not "
                "reconstructible"
            )
        lo = ids.index(from_snapshot_id)
    if to_snapshot_id is None:
        to_snapshot_id = meta.get("current-snapshot-id")
    if to_snapshot_id not in ids:
        raise ValueError(
            f"iceberg incremental: snapshot {to_snapshot_id} not in the log"
        )
    hi = ids.index(to_snapshot_id)
    if lo > hi:
        raise ValueError(
            "iceberg incremental: from_snapshot_id is newer than "
            "to_snapshot_id"
        )
    out: list[tuple[int, list[str]]] = []
    for s in snapshots[lo + 1 : hi + 1]:
        op = (s.get("summary") or {}).get("operation") or "append"
        if op != "append":
            raise ValueError(
                f"iceberg incremental: snapshot {s.get('snapshot-id')} "
                f"is a {op!r}, not an append — the appended-file set is "
                "not the change set; read the full snapshots instead"
            )
        sid = s.get("snapshot-id")
        with open(_local_path(s["manifest-list"], table_path), "rb") as fh:
            _, manifests = decode_ocf(fh.read())
        added = []
        for m in manifests:
            if (m.get("content") or 0) != 0:
                continue  # delete manifests carry no appended data
            with open(_local_path(m["manifest_path"], table_path),
                      "rb") as fh:
                _, entries = decode_ocf(fh.read())
            for e in entries:
                df = e.get("data_file") or {}
                if e.get("status") == 1 and e.get("snapshot_id") == sid \
                        and (df.get("content") or 0) == 0:
                    added.append(_local_path(df["file_path"], table_path))
        if added:
            out.append((int(sid), sorted(set(added))))
    ddl, names = _iceberg_ddl(meta)
    return ddl, names, out


def read_iceberg_incremental(
    spark: SparkSession, table_path: str, from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Data files ADDED by snapshots in ``(from_snapshot_id,
    to_snapshot_id]`` (to defaults to current) — the spec's incremental
    append scan.  Any snapshot in the range whose summary operation is
    not ``append`` refuses (a replace/overwrite/delete in the range
    means appended-files is not the change set — the same contract
    Spark's incremental read enforces)."""
    ddl, names, ranges = _iceberg_added_files(
        table_path, from_snapshot_id, to_snapshot_id
    )
    pieces = [
        spark.read.schema(ddl).parquet(*paths).select(*names)
        .withColumn("_snapshot_id", F.lit(sid).cast("long"))
        for sid, paths in ranges
    ]
    if not pieces:
        return spark.createDataFrame([], ddl).withColumn(
            "_snapshot_id", F.lit(None).cast("long")
        )
    out = pieces[0]
    for d in pieces[1:]:
        out = out.unionByName(d)
    return out


# ---------------------------------------------------------------------------
# Hudi: incremental query
# ---------------------------------------------------------------------------


def _hudi_incremental_files(
    table_path: str, begin_instant: str | None,
    end_instant: str | None = None,
) -> tuple[tuple, list[tuple[str, list[str], bool]]]:
    """Driver-side incremental walk shared by the batch reader and the
    streaming source: ((ddl, names), [(instant, [abs base-file paths],
    has_meta)]) for commits in ``(begin, end]`` — ``begin=None`` means
    from the start of the timeline.  MOR logs and meta-less rewrites
    in range refuse."""
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.hudi import (
        _instant_key,
        _schema_from_commit,
        hudi_timeline,
    )

    timeline = hudi_timeline(table_path)
    keys = [_instant_key(t) for t, _, _ in timeline]
    if begin_instant is not None and _instant_key(begin_instant) not in keys:
        raise ValueError(
            f"hudi incremental: instant {begin_instant!r} not on the "
            "timeline (archived?) — the change set is not reconstructible"
        )
    if end_instant is None:
        end_instant = timeline[-1][0]
    lo = _instant_key(begin_instant) if begin_instant is not None else ""
    hi = _instant_key(end_instant)
    pinned = None
    out: list[tuple[str, list[str], bool]] = []

    def fid_of(st: dict) -> str:
        fid = st.get("fileId")
        if fid:
            return str(fid)
        return os.path.basename(st.get("path") or "").split("_")[0]

    seen_fids: set[str] = set()  # file groups written BEFORE a commit
    for instant, action, meta in timeline:
        if meta and _schema_from_commit(meta):
            pinned = _schema_from_commit(meta)
        k = _instant_key(instant)
        stats = [
            st
            for part in (meta.get("partitionToWriteStats") or {}).values()
            for st in part
        ]
        # a commit touching a file group seen earlier is a REWRITE of
        # that group (upsert semantics) — prevCommit when recorded,
        # fileId recurrence as the structural fallback
        rewrote = any(
            st.get("prevCommit") not in (None, "null")
            or fid_of(st) in seen_fids
            for st in stats
        )
        if action != "replacecommit":
            seen_fids.update(fid_of(st) for st in stats)
        if not (lo < k <= hi):
            continue
        if action == "replacecommit":
            continue  # clustering: a layout swap adds no data
        paths = []
        for st in stats:
            p = st.get("path") or ""
            if ".log." in os.path.basename(p):
                raise ValueError(
                    "hudi incremental: MOR log files in the range not "
                    "vendored — compact (cluster) first, or pull after "
                    "compaction instants"
                )
            if p:
                paths.append(os.path.join(table_path, p))
        if not paths:
            continue
        has_meta = all(
            "_hoodie_commit_time" in pq.read_schema(p).names
            for p in paths
        )
        if not has_meta and rewrote:
            raise ValueError(
                "hudi incremental: commit rewrote existing file "
                "groups and its files carry no _hoodie_commit_time "
                "meta column — rows cannot be attributed to the "
                "commit; write meta columns or use full snapshots"
            )
        out.append((instant, sorted(paths), has_meta))
    if pinned is None:
        raise ValueError("hudi incremental: no stamped schema")
    return pinned, out


def read_hudi_incremental(
    spark: SparkSession, table_path: str, begin_instant: str,
    end_instant: str | None = None,
) -> DataFrame:
    """Rows written by commits in ``(begin_instant, end_instant]``
    (end defaults to latest) — Hudi's incremental query (begin is
    EXCLUSIVE, Hudi's own convention).  See the module docstring for
    the meta-column / insert-only contract."""
    from hive_udf_spark.sources.hudi import META_COLUMNS

    pinned, ranges = _hudi_incremental_files(
        table_path, begin_instant, end_instant
    )
    ddl, names = pinned
    pieces = []
    for instant, paths, has_meta in ranges:
        if has_meta:
            meta_ddl = ", ".join(f"{c} string" for c in META_COLUMNS)
            d = (
                spark.read.schema(f"{meta_ddl}, {ddl}")
                .parquet(*paths)
                .filter(F.col("_hoodie_commit_time") == instant)
                .select(*names)
            )
        else:
            d = spark.read.schema(ddl).parquet(*paths).select(*names)
        pieces.append(d.withColumn("_commit_time", F.lit(instant)))
    if not pieces:
        return spark.createDataFrame([], ddl).withColumn(
            "_commit_time", F.lit(None).cast("string")
        )
    out = pieces[0]
    for d in pieces[1:]:
        out = out.unionByName(d)
    return out
