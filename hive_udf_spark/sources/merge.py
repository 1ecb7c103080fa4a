"""MERGE INTO for the vendored Delta writer (r14): the classic
upsert DML — ``WHEN MATCHED THEN UPDATE SET *`` / ``WHEN NOT MATCHED
THEN INSERT *`` — as a copy-on-write commit, completing the Delta
write surface next to the append sink (``streaming/delta_sink.py``)
and the DV delete (``sources/changes.py``).

Shape, and why it scales: a merge touches three row populations —
1. rows in files that contain NO matched key: their files are NOT
   read, NOT rewritten, and NOT mentioned in the commit (at 100 TB
   the overwhelming majority; touched-file detection is a semi-join
   of the scan's ``_metadata.file_path`` against the broadcast source
   keys, so it costs one column-pruned pass over the key column);
2. rows in TOUCHED files: rewritten once — matched rows take the
   source's values, unmatched neighbors are carried unchanged (the
   copy-on-write cost is proportional to touched files, which is why
   real engines pair merge with clustering on the merge key);
3. source rows matching nothing: appended as new files.

The commit removes the touched files and adds their replacements plus
the insert files, all ``dataChange=true``, published via put-if-absent
(a racing same-version writer conflicts loudly).  Deletion vectors on
touched files are APPLIED during the rewrite (their dead rows do not
resurrect) and the rewritten files carry none; untouched files keep
their DVs verbatim.  ``read_delta_changes`` then surfaces the merge as
whole-file delete+insert pairs — the honest CDF of a copy-on-write
engine.

Refuses column-mapped and partitioned tables (physical-name predicate
interplay not vendored) and duplicate keys on either side (a merge
with ambiguous matches is an error in Delta itself).

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated sink/ingest extension surface.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["merge_into_delta", "merge_into_iceberg", "merge_into_hudi"]


def merge_into_delta(
    spark: SparkSession, table_path: str, source: DataFrame,
    on: list[str] | str,
) -> dict:
    """Upsert ``source`` into the Delta table at ``table_path`` by the
    ``on`` key column(s): matched rows take the source's values
    (UPDATE SET *), unmatched source rows append (INSERT *).  Returns
    ``{"updated": n, "inserted": n, "files_rewritten": n}``.  The
    source must carry exactly the table's columns and unique keys;
    matched keys must be unique in the table too."""
    from hive_udf_spark.sources.delta import (
        _dv_blob,
        _dv_keep_udf,
        _log_dir,
        delta_snapshot,
    )
    from hive_udf_spark.sources.txn import publish_if_absent

    keys = [on] if isinstance(on, str) else list(on)
    snap = delta_snapshot(table_path)
    schema = StructType.fromJson(json.loads(snap.metadata["schemaString"]))
    names = [f.name for f in schema.fields]
    conf = (snap.metadata or {}).get("configuration") or {}
    if (conf.get("delta.columnMapping.mode") or "none") != "none":
        raise ValueError("delta merge: column-mapped tables not vendored")
    if snap.metadata.get("partitionColumns"):
        raise ValueError("delta merge: partitioned tables not vendored")
    for k in keys:
        if k not in names:
            raise ValueError(f"delta merge: key {k!r} is not a table column")
    if sorted(source.columns) != sorted(names):
        raise ValueError(
            f"delta merge: source columns {sorted(source.columns)} != "
            f"table columns {sorted(names)} (UPDATE SET * needs all)"
        )
    if source.groupBy(*keys).count().filter("count > 1").limit(1).count():
        raise ValueError(
            "delta merge: duplicate keys in the source — the match is "
            "ambiguous (Delta raises here too)"
        )
    src = source.localCheckpoint(eager=True)
    if not snap.files:
        raise ValueError(
            "delta merge: empty table (append through the sink first)"
        )
    abs_of = {}
    for rel, add in snap.files.items():
        p = rel if os.path.isabs(rel) else os.path.join(table_path, rel)
        abs_of[os.path.abspath(p)] = rel
    files = sorted(abs_of)
    dv_blobs = {}
    for rel, add in snap.files.items():
        dv = add.get("deletionVector")
        if dv:
            p = rel if os.path.isabs(rel) else os.path.join(table_path, rel)
            dv_blobs[os.path.abspath(p)] = _dv_blob(table_path, dv)
    keep = _dv_keep_udf(spark, dv_blobs) if dv_blobs else None

    def scan(paths):
        d = spark.read.schema(schema).parquet(*paths).withColumn(
            "__fp",
            F.regexp_replace(F.col("_metadata.file_path"),
                             "^file:(//)?", ""),
        )
        if keep is not None:
            d = d.withColumn("__ri", F.col("_metadata.row_index"))
            d = d.filter(keep(F.col("_metadata.file_path"),
                              F.col("__ri"))).drop("__ri")
        return d

    # 1. touched-file detection: a column-pruned key scan semi-joined
    #    against the broadcast source keys — files with no match are
    #    never read again
    from urllib.parse import unquote

    src_keys = src.select(*keys).distinct()
    touched = sorted(
        r["__fp"] for r in scan(files)
        .join(F.broadcast(src_keys), on=keys, how="left_semi")
        .select("__fp").distinct().collect()
    )
    # _metadata.file_path is a percent-encoded URI (r11 ADVICE lesson)
    touched = [os.path.abspath(unquote(p)) for p in touched]
    # duplicate-key guard on the TABLE side, over touched files only
    if touched:
        dups = (
            scan(touched).join(F.broadcast(src_keys), on=keys,
                               how="left_semi")
            .groupBy(*keys).count().filter("count > 1").limit(1).count()
        )
        if dups:
            raise ValueError(
                "delta merge: a source key matches multiple table rows "
                "— the update is ambiguous"
            )
    version = snap.version + 1
    scratch = os.path.join(table_path, f"_merge-{version}")
    written: list[str] = []
    n_updated = n_inserted = 0

    def land(df: DataFrame, tag: str) -> None:
        out = os.path.join(scratch, tag)
        df.write.mode("overwrite").parquet(out)
        import pyarrow.parquet as _pq

        for i, part in enumerate(sorted(
            p for p in os.listdir(out) if p.endswith(".parquet")
        )):
            if _pq.ParquetFile(
                os.path.join(out, part)
            ).metadata.num_rows == 0:
                continue
            name = f"merge-{version:010d}-{tag}-{i:05d}.parquet"
            os.replace(os.path.join(out, part),
                       os.path.join(table_path, name))
            written.append(name)

    try:
        if touched:
            # 2. rewrite touched files: matched rows take source values,
            #    unmatched neighbors carry unchanged
            base = scan(touched)
            matched = base.join(F.broadcast(src_keys), on=keys,
                                how="left_semi")
            n_updated = matched.count()
            carried = base.join(F.broadcast(src_keys), on=keys,
                                how="left_anti").select(*names)
            updates = src.join(
                F.broadcast(matched.select(*keys).distinct()),
                on=keys, how="left_semi",
            ).select(*names)
            land(carried.unionByName(updates), "upd")
        # 3. brand-new keys append: every table row matching a source
        # key lives in a touched file (that IS the touched definition),
        # so anti-joining the touched files' keys finds exactly the
        # table-wide non-matches
        if touched:
            inserts = src.join(
                F.broadcast(scan(touched).select(*keys).distinct()),
                on=keys, how="left_anti",
            ).select(*names)
        else:
            inserts = src.select(*names)
        n_inserted = inserts.count()
        if n_inserted:
            land(inserts, "ins")
    finally:
        if os.path.isdir(scratch):
            shutil.rmtree(scratch)
    lines = [json.dumps({"commitInfo": {"operation": "MERGE",
                                        "mergeKeys": keys}})]
    for p in touched:
        lines.append(json.dumps({"remove": {
            "path": snap.files[abs_of[p]]["path"],
            "deletionTimestamp": 0, "dataChange": True,
        }}))
    for name in written:
        lines.append(json.dumps({"add": {
            "path": name, "partitionValues": {},
            "size": os.path.getsize(os.path.join(table_path, name)),
            "modificationTime": 0, "dataChange": True,
        }}))
    commit = os.path.join(_log_dir(table_path), f"{version:020d}.json")
    with open(commit + ".tmp", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    publish_if_absent(commit + ".tmp", commit)  # THE atomic publish
    return {"updated": int(n_updated), "inserted": int(n_inserted),
            "files_rewritten": len(touched)}


def merge_into_iceberg(
    spark: SparkSession, table_path: str, source: DataFrame,
    on: list[str] | str,
) -> dict:
    """MERGE INTO for the vendored Iceberg writer — the MERGE-ON-READ
    contrast to ``merge_into_delta``'s copy-on-write: NOTHING is
    rewritten.  One new snapshot adds (a) the source rows as data
    files at sequence N and (b) the source keys as EQUALITY-DELETE
    files whose spec gating (deletes at N erase seq < N only) kills
    exactly the older versions of matched keys — the Flink upsert
    pattern, per-merge cost O(source), independent of table size.
    The read path's sequence-gated anti-join applies the layering;
    ``compact_iceberg_table`` later folds the accumulated deletes into
    plain files.  Returns ``{"updated": n, "inserted": n}``.

    Refuses partitioned specs and field-id-stamped tables (the new
    files would not carry ids, producing a mixed table the reader
    refuses), plus duplicate source keys — same ambiguity rule as the
    Delta merge."""
    import pyarrow.parquet as _pq

    from hive_udf_spark.operators.avrocodec import decode_ocf, encode_ocf
    from hive_udf_spark.sources.iceberg import (
        _MANIFEST_ENTRY_SCHEMA,
        _MANIFEST_FILE_SCHEMA,
        _field_ids_by_name,
        _load_metadata,
        _parquet_has_field_ids,
        _snapshot_state,
        read_iceberg,
    )
    from hive_udf_spark.sources.txn import publish_if_absent

    keys = [on] if isinstance(on, str) else list(on)
    meta = _load_metadata(table_path)
    for s in meta.get("partition-specs") or []:
        if s.get("spec-id") == meta.get("default-spec-id", 0) \
                and s.get("fields"):
            raise ValueError(
                "iceberg merge: partitioned specs not vendored"
            )
    ids_by_name = _field_ids_by_name(meta)
    names = list(ids_by_name)
    for k in keys:
        if k not in ids_by_name:
            raise ValueError(
                f"iceberg merge: key {k!r} is not a table column"
            )
    if sorted(source.columns) != sorted(names):
        raise ValueError(
            f"iceberg merge: source columns {sorted(source.columns)} != "
            f"table columns {sorted(names)}"
        )
    if source.groupBy(*keys).count().filter("count > 1").limit(1).count():
        raise ValueError(
            "iceberg merge: duplicate keys in the source — the match "
            "is ambiguous"
        )
    _, data, _, _ = _snapshot_state(table_path)
    if data and _parquet_has_field_ids(data[0][0]):
        raise ValueError(
            "iceberg merge: field-id-stamped tables not vendored (the "
            "merged files would not carry ids — a mixed table the "
            "reader refuses); compact after an id-less migration "
            "instead"
        )
    src = source.localCheckpoint(eager=True)
    n_matched = int(
        read_iceberg(spark, table_path)
        .join(F.broadcast(src.select(*keys).distinct()), on=keys,
              how="left_semi").count()
    )
    n_src = src.count()
    mdir = os.path.join(table_path, "metadata")
    versions = [
        int(n[1:].split(".")[0]) for n in os.listdir(mdir)
        if n.startswith("v") and n.endswith(".metadata.json")
        and n[1:].split(".")[0].isdigit()
    ]
    version = max(versions, default=0) + 1
    snapshots = list(meta.get("snapshots") or [])
    sid = max([8999] + [int(s.get("snapshot-id") or 0)
                        for s in snapshots]) + 1
    seq = int(meta.get("last-sequence-number") or 0) + 1
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)

    def land(df, prefix):
        scratch = os.path.join(table_path, f"_{prefix}-{sid}")
        df.write.mode("overwrite").parquet(scratch)
        rels = []
        for i, part in enumerate(sorted(
            p for p in os.listdir(scratch) if p.endswith(".parquet")
        )):
            n = _pq.ParquetFile(
                os.path.join(scratch, part)).metadata.num_rows
            if n == 0:
                continue
            rel = f"data/{prefix}-{sid}-{i:05d}.parquet"
            os.replace(os.path.join(scratch, part),
                       os.path.join(table_path, rel))
            rels.append((rel, n))
        shutil.rmtree(scratch)
        return rels

    rels = land(src.select(*names), "merge")
    del_rels = land(src.select(*keys), "merge-eqdel") if n_matched else []
    cur = next((s for s in snapshots
                if s.get("snapshot-id") == meta.get("current-snapshot-id")),
               None)
    prev_manifests = []
    if cur is not None:
        mlist = cur.get("manifest-list")
        with open(mlist if os.path.isabs(mlist)
                  else os.path.join(table_path, mlist), "rb") as fh:
            _, prev_manifests = decode_ocf(fh.read())
    mlist_rows = [dict(m) for m in prev_manifests]

    def manifest(entries, path, content):
        with open(path, "wb") as fh:
            fh.write(encode_ocf(_MANIFEST_ENTRY_SCHEMA, entries))
        mlist_rows.append({
            "manifest_path": path,
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": meta.get("default-spec-id", 0),
            "content": content,
            "sequence_number": seq,
            "added_snapshot_id": sid,
        })

    if rels:
        manifest([{
            "status": 1, "snapshot_id": sid, "sequence_number": seq,
            "data_file": {
                "content": 0, "file_path": rel, "file_format": "PARQUET",
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(table_path, rel)),
                "column_sizes": None, "equality_ids": None,
                "partition": None,
            },
        } for rel, n in rels],
            os.path.join(mdir, f"merge-manifest-{sid}.avro"), 0)
    if del_rels:
        manifest([{
            "status": 1, "snapshot_id": sid, "sequence_number": seq,
            "data_file": {
                "content": 2, "file_path": rel, "file_format": "PARQUET",
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(table_path, rel)),
                "column_sizes": None,
                "equality_ids": [int(ids_by_name[k]) for k in keys],
                "partition": None,
            },
        } for rel, n in del_rels],
            os.path.join(mdir, f"merge-delete-manifest-{sid}.avro"), 1)
    lpath = os.path.join(mdir, f"snap-{sid}-manifest-list.avro")
    with open(lpath, "wb") as fh:
        fh.write(encode_ocf(_MANIFEST_FILE_SCHEMA, mlist_rows))
    snapshots.append({
        "snapshot-id": sid,
        "sequence-number": seq,
        "timestamp-ms": int(meta.get("last-updated-ms") or 0) + 1,
        "manifest-list": lpath,
        "summary": {"operation": "overwrite", "merge-keys": ",".join(keys)},
    })
    new_meta = dict(meta)
    new_meta["snapshots"] = snapshots
    new_meta["current-snapshot-id"] = sid
    new_meta["last-sequence-number"] = seq
    meta_path = os.path.join(mdir, f"v{version}.metadata.json")
    with open(meta_path + ".tmp", "w") as fh:
        fh.write(json.dumps(new_meta))
    publish_if_absent(meta_path + ".tmp", meta_path)  # THE atomic publish
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write(str(version))
    return {"updated": n_matched, "inserted": int(n_src - n_matched)}


def merge_into_hudi(
    spark: SparkSession, table_path: str, source: DataFrame,
) -> dict:
    """MERGE INTO for the vendored Hudi writer — the MOR LOG variant,
    completing the trio's write-amplification spectrum: Delta rewrites
    touched files (copy-on-write), Iceberg adds delete files
    (merge-on-read by anti-join), Hudi appends UPSERT LOG BLOCKS to
    each touched file group (merge-on-read by newest-wins).  The merge
    key is the table's OWN record key (``hoodie.table.recordkey.fields``
    — Hudi's invariant: upserts key on it, composite keys included);
    matched rows route to their group by a distributed base-file scan
    joined against the broadcast source keys, each touched group's log
    file is written FROM THE EXECUTORS (one applyInPandas task per
    group, the upsert sink's pattern), unmatched source rows land as
    one new base-file group, and ONE deltacommit publishes it all.
    Per-merge cost: one key-pruned scan + O(source) writes — no base
    file rewrites; ``cluster_hudi_table`` later compacts the logs.
    Returns ``{"updated": n, "inserted": n}``.

    Refuses partitioned layouts and tables without a stamped schema;
    duplicate source keys refuse (ambiguity, as in the other two)."""
    import pyarrow.parquet as _pq

    from hive_udf_spark.sources.hudi import (
        _file_slices,
        _hoodie_dir,
        _schema_from_commit,
        encode_hudi_log,
    )
    from hive_udf_spark.sources.txn import publish_if_absent
    from hive_udf_spark.streaming.hudi_upsert_sink import _avro_schema_of

    slices, last_meta, props = _file_slices(table_path)
    if any(part for part, _ in slices):
        raise ValueError("hudi merge: partitioned tables not vendored")
    pinned = _schema_from_commit(last_meta or {})
    if pinned is None:
        raise ValueError("hudi merge: table has no stamped schema")
    ddl, names = pinned
    raw_key = (props.get("hoodie.table.recordkey.fields") or "").strip()
    keys = [f.strip() for f in raw_key.split(",") if f.strip()]
    if not keys:
        raise ValueError(
            "hudi merge: the table declares no record key — upserts "
            "key on hoodie.table.recordkey.fields"
        )
    if sorted(source.columns) != sorted(names):
        raise ValueError(
            f"hudi merge: source columns {sorted(source.columns)} != "
            f"table columns {sorted(names)}"
        )
    if source.groupBy(*keys).count().filter("count > 1").limit(1).count():
        raise ValueError(
            "hudi merge: duplicate keys in the source — the match is "
            "ambiguous"
        )
    src = source.localCheckpoint(eager=True)
    src_keys = src.select(*keys).distinct()
    # matched keys → their file group, from a key-pruned base scan
    # (log-layered rows still belong to their group, so base files
    # are the complete key→group map)
    base_paths = sorted(
        os.path.join(table_path, sl.base_path) for sl in slices.values()
    )
    fid_of_base = {
        os.path.abspath(os.path.join(table_path, sl.base_path)): fid
        for (_, fid), sl in slices.items()
    }
    base_instant_of = {
        fid: sl.base_instant for (_, fid), sl in slices.items()
    }
    scan = spark.read.schema(ddl).parquet(*base_paths).select(
        *keys,
        F.regexp_replace(F.col("_metadata.file_path"),
                         "^file:(//)?", "").alias("__fp"),
    )
    if any(sl.logs for sl in slices.values()):
        # the base scan is the key→group map ONLY if every log record's
        # key also exists in a base file.  The streaming upsert sink
        # INSERTS new keys through log blocks, and merging such a table
        # by base-routing would duplicate those keys (a new base group
        # next to the live log record) — decode the log keys (one
        # distributed delta-sized pass) and refuse when any key is
        # log-only (r14 self-review pass 2).
        from hive_udf_spark.sources.hudi import (
            _log_records_df,
            hudi_timeline,
        )

        completed = frozenset(
            t for t, _, _ in hudi_timeline(table_path)
        )
        log_paths = sorted(
            os.path.join(table_path, rel)
            for sl in slices.values() for _, rel in sl.logs
        )
        log_keys = (
            _log_records_df(spark, log_paths, ddl, names, completed,
                            keys)
            .filter(~F.col("__deleted")).select(*keys).distinct()
        )
        if log_keys.join(scan.select(*keys).distinct(), on=keys,
                         how="left_anti").limit(1).count():
            raise ValueError(
                "hudi merge: the table carries LOG-ONLY keys (inserted "
                "through MOR log blocks) that base-file routing cannot "
                "see — cluster (compact) the table first so the base "
                "files are the complete key map"
            )
    matched = scan.join(F.broadcast(src_keys), on=keys, how="left_semi")
    # (source row, fid) for every matched key
    routed = src.join(matched, on=keys, how="inner")
    timeline_dir = _hoodie_dir(table_path)
    existing = [
        n.split(".")[0].split("_")[0]
        for n in os.listdir(timeline_dir)
        if n.split(".")[0].split("_")[0].isdigit()
    ]
    instant = f"{max(int(i) for i in existing) + 1}"
    avro_schema = _avro_schema_of(src, "hudi_merge")
    table_abs = os.path.abspath(table_path)
    dcols = list(names)
    # per-group log VERSION: the next number after the slice's existing
    # logs — a fixed version would make a second merge's log file
    # CLOBBER the first one's for the same group (r14 self-review)
    fid_json = json.dumps({
        fid: [sl.base_instant or "", len(sl.logs) + 1]
        for (_, fid), sl in slices.items()
    })

    def write_group(pdf):
        import pandas as _pd
        from urllib.parse import unquote

        from hive_udf_spark.sources.hudi import encode_hudi_log as _enc

        fp = os.path.abspath(unquote(str(pdf["__fp"].iloc[0])))
        fid = os.path.basename(fp).split("_")[0]
        base_instant, log_v = json.loads(fid_json).get(fid, ["", 1])
        blob = _enc([{
            "instant": instant,
            "schema": avro_schema,
            "records": [
                {c: (None if _pd.isna(r[c])
                     else r[c].item() if hasattr(r[c], "item")
                     else r[c])
                 for c in dcols}
                for _, r in pdf.iterrows()
            ],
        }])
        rel = f".{fid}_{base_instant}.log.{log_v}_0-0-0"
        full = os.path.join(table_abs, rel)
        with open(full + ".tmp", "wb") as fh:
            fh.write(blob)
        os.replace(full + ".tmp", full)  # task-retry safe
        return _pd.DataFrame({
            "fid": [fid], "path": [rel], "nbytes": [len(blob)],
        })

    touched = (
        routed.groupBy("__fp")
        .applyInPandas(write_group, "fid string, path string, nbytes long")
        .collect()  # bounded: one KB-scale stat row per touched group
    )
    n_updated = int(routed.count())
    stats = [{
        "fileId": r.fid, "path": r.path,
        "prevCommit": base_instant_of.get(r.fid, "null") or "null",
        "numWrites": 0, "fileSizeInBytes": int(r.nbytes),
    } for r in sorted(touched, key=lambda r: r.fid)]
    # unmatched source rows: one new base-file group
    inserts = src.join(F.broadcast(
        matched.select(*keys).distinct()
    ), on=keys, how="left_anti").select(*names)
    n_inserted = int(inserts.count())
    if n_inserted:
        scratch = os.path.join(table_path, f"_merge-{instant}")
        inserts.write.mode("overwrite").parquet(scratch)
        i = 0
        for part in sorted(p for p in os.listdir(scratch)
                           if p.endswith(".parquet")):
            if _pq.ParquetFile(
                os.path.join(scratch, part)
            ).metadata.num_rows == 0:
                continue
            fid = f"merge-{instant}-{i:05d}"
            rel = f"{fid}_0-0-0_{instant}.parquet"
            os.replace(os.path.join(scratch, part),
                       os.path.join(table_path, rel))
            stats.append({
                "fileId": fid, "path": rel, "prevCommit": "null",
                "numWrites": _pq.ParquetFile(
                    os.path.join(table_path, rel)).metadata.num_rows,
                "fileSizeInBytes": os.path.getsize(
                    os.path.join(table_path, rel)),
            })
            i += 1
        shutil.rmtree(scratch)
    meta = {
        "partitionToWriteStats": {"": stats},
        "compacted": False,
        "extraMetadata": {"schema": json.dumps(avro_schema),
                          "merge-keys": ",".join(keys)},
        "operationType": "UPSERT",
    }
    commit_path = os.path.join(timeline_dir, f"{instant}.deltacommit")
    with open(commit_path + ".tmp", "w") as fh:
        json.dump(meta, fh)
    publish_if_absent(commit_path + ".tmp", commit_path)
    return {"updated": n_updated, "inserted": n_inserted}
