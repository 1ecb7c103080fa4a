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

__all__ = ["merge_into_delta"]


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
