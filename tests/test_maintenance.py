"""Lakehouse maintenance ops (sources/maintenance.py, r13): Delta
OPTIMIZE-style compaction, Iceberg rewrite (deletes made permanent),
Hudi clustering replacecommits, and the Delta sink's periodic
checkpointing — row preservation, atomic swap semantics, time travel
through the swap, and the documented refusals."""

from __future__ import annotations

import glob
import json
import os

import pytest

from hive_udf_spark.sources.maintenance import (
    clean_hudi_table,
    cluster_hudi_table,
    compact_delta_table,
    compact_iceberg_table,
    expire_iceberg_snapshots,
    vacuum_delta_table,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------------------
# Delta
# ---------------------------------------------------------------------------


def _delta_ingest(spark, table: str, n_batches: int, checkpoint_every=0):
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta

    for b in range(n_batches):
        df = spark.createDataFrame(
            [(b * 10 + i, f"l{b}", i) for i in range(3)],
            "doc_id long, lang string, n long",
        )
        assert commit_batch_to_delta(df, b, table,
                                     checkpoint_every=checkpoint_every)


def test_delta_compaction_preserves_rows_and_travels(spark, tmp_path):
    from hive_udf_spark.sources.delta import delta_snapshot, read_delta

    table = str(tmp_path / "t")
    _delta_ingest(spark, table, 4)
    before = _rows(read_delta(spark, table))
    n_files_before = len(delta_snapshot(table).files)
    assert n_files_before > 1
    assert compact_delta_table(spark, table, target_files=1)
    snap = delta_snapshot(table)
    assert len(snap.files) == 1
    assert _rows(read_delta(spark, table)) == before
    # time travel to the pre-compaction version sees the OLD layout
    old = delta_snapshot(table, snap.version - 1)
    assert len(old.files) == n_files_before
    assert _rows(read_delta(spark, table, version=snap.version - 1)) \
        == before
    # already compact: no-op
    assert not compact_delta_table(spark, table, target_files=1)


def test_delta_compaction_sort_by_clusters_file_ranges(spark, tmp_path):
    """sort_by range-partitions the rewrite: the compacted files carry
    DISJOINT doc_id min/max ranges, so parquet footer pruning can skip
    whole files — compaction is the moment to cluster."""
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.delta import delta_snapshot, read_delta

    table = str(tmp_path / "t")
    # interleave doc_ids across batches so unsorted compaction would
    # leave overlapping ranges
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta

    for b in range(4):
        df = spark.createDataFrame(
            [(i, f"l{i}", i) for i in range(b, 40, 4)],
            "doc_id long, lang string, n long",
        )
        assert commit_batch_to_delta(df, b, table, checkpoint_every=0)
    before = _rows(read_delta(spark, table))
    assert compact_delta_table(spark, table, target_files=2,
                               sort_by=["doc_id"])
    snap = delta_snapshot(table)
    assert len(snap.files) == 2
    ranges = []
    for p in snap.files:
        md = pq.ParquetFile(os.path.join(table, p)).metadata
        idx = next(i for i in range(md.num_columns)
                   if md.row_group(0).column(i).path_in_schema == "doc_id")
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert ranges[0][1] < ranges[1][0]  # disjoint file ranges
    assert _rows(read_delta(spark, table)) == before


def test_delta_compaction_purges_deletion_vectors(spark, tmp_path):
    """DV'd rows drop physically during the rewrite and the descriptors
    retire with their removes — compaction makes soft deletes real."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.delta import (
        delta_snapshot,
        read_delta,
        write_delta_commits,
        write_deletion_vector,
    )

    table = str(tmp_path / "t")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "lang": pa.array(["en", "de", "fr", "es"], pa.string()),
    }), os.path.join(table, "a.parquet"))
    schema_json = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "doc_id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "lang", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    dv = write_deletion_vector(table, [1, 3])  # drops doc_id 2 and 4
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet", "deletionVector": dv}}],
    ], schema_json)
    before = _rows(read_delta(spark, table))
    assert before == [(1, "en"), (3, "fr")]
    # single file BUT DV'd: compaction still rewrites (purges the DV)
    assert compact_delta_table(spark, table, target_files=1)
    snap = delta_snapshot(table)
    assert len(snap.files) == 1
    assert not any(a.get("deletionVector") for a in snap.files.values())
    assert _rows(read_delta(spark, table)) == before
    assert not compact_delta_table(spark, table, target_files=1)


def test_delta_compaction_partitioned_per_group(spark, tmp_path):
    """Partitioned compaction rewrites ONLY the fragmented partition:
    the cold partition's file is untouched on disk, partitionValues
    survive the swap, and rows are identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.delta import (
        delta_snapshot,
        read_delta,
        write_delta_commits,
    )

    table = str(tmp_path / "t")
    os.makedirs(table, exist_ok=True)

    def wf(name, rows):
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
        }), os.path.join(table, name))

    wf("en-1.parquet", [(1, 10)])
    wf("en-2.parquet", [(2, 20)])
    wf("de-1.parquet", [(3, 30)])
    schema_json = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "doc_id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "n", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "lang", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    write_delta_commits(table, [[
        {"add": {"path": "en-1.parquet",
                 "partitionValues": {"lang": "en"}}},
        {"add": {"path": "en-2.parquet",
                 "partitionValues": {"lang": "en"}}},
        {"add": {"path": "de-1.parquet",
                 "partitionValues": {"lang": "de"}}},
    ]], schema_json, part_cols=["lang"])
    before = _rows(read_delta(spark, table))
    cold_mtime = os.path.getmtime(os.path.join(table, "de-1.parquet"))
    assert compact_delta_table(spark, table, target_files=1)
    snap = delta_snapshot(table)
    assert len(snap.files) == 2  # one compacted 'en' file + cold 'de'
    pvs = sorted(
        tuple(sorted((a.get("partitionValues") or {}).items()))
        for a in snap.files.values()
    )
    assert pvs == [(("lang", "de"),), (("lang", "en"),)]
    assert "de-1.parquet" in snap.files  # cold partition untouched
    assert os.path.getmtime(
        os.path.join(table, "de-1.parquet")) == cold_mtime
    assert _rows(read_delta(spark, table)) == before
    assert not compact_delta_table(spark, table, target_files=1)


def test_delta_compaction_refusals(spark, tmp_path):
    from hive_udf_spark.sources.delta import write_delta_commits

    schema_json = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "doc_id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "lang", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    mapped = str(tmp_path / "m")
    write_delta_commits(
        mapped, [[]], schema_json,
        configuration={"delta.columnMapping.mode": "name"},
    )
    with pytest.raises(ValueError, match="column-mapped"):
        compact_delta_table(spark, mapped)


def test_delta_sink_periodic_checkpoint(spark, tmp_path):
    """checkpoint_every=5 -> classic checkpoints at versions 4 and 9;
    the reader reconstructs from the checkpoint ALONE (pre-checkpoint
    JSON commits deleted) — O(checkpoint_every) startup at fleet age."""
    from hive_udf_spark.sources.delta import read_delta

    table = str(tmp_path / "t")
    _delta_ingest(spark, table, 10, checkpoint_every=5)
    log = os.path.join(table, "_delta_log")
    cps = sorted(glob.glob(os.path.join(log, "*.checkpoint.parquet")))
    assert [os.path.basename(p) for p in cps] == [
        f"{4:020d}.checkpoint.parquet", f"{9:020d}.checkpoint.parquet",
    ]
    hint = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert hint["version"] == 9
    before = _rows(read_delta(spark, table))
    assert len(before) == 30
    for v in range(10):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    assert _rows(read_delta(spark, table)) == before


def test_delta_vacuum_reclaims_orphans_and_old_layouts(spark, tmp_path):
    """VACUUM deletes crash orphans and the pre-compaction layout, keeps
    everything the current snapshot references (incl. live DV files),
    and never touches the log."""
    from hive_udf_spark.sources.delta import read_delta

    table = str(tmp_path / "t")
    _delta_ingest(spark, table, 3)
    # a crash orphan: data file shaped like batch 3's, no commit
    orphan = os.path.join(table, "part-0000000003-00000.parquet")
    import shutil

    shutil.copy(glob.glob(os.path.join(table, "part-*.parquet"))[0], orphan)
    before = _rows(read_delta(spark, table))
    assert compact_delta_table(spark, table, target_files=1)
    deleted = vacuum_delta_table(table, min_age_seconds=0)
    assert "part-0000000003-00000.parquet" in deleted
    assert len(deleted) > 1  # the pre-compaction parts went too
    assert _rows(read_delta(spark, table)) == before
    # idempotent: nothing left to reclaim
    assert vacuum_delta_table(table, min_age_seconds=0) == []
    # the log is intact (time travel to version 0 still RESOLVES; its
    # data files are gone, the documented VACUUM trade-off)
    from hive_udf_spark.sources.delta import delta_snapshot

    assert delta_snapshot(table, 0).version == 0


def test_delta_vacuum_keeps_live_dv_files(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.delta import (
        read_delta,
        write_delta_commits,
        write_deletion_vector,
    )

    table = str(tmp_path / "t")
    os.makedirs(table, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
    }), os.path.join(table, "a.parquet"))
    schema_json = json.dumps({
        "type": "struct",
        "fields": [{"name": "doc_id", "type": "long", "nullable": True,
                    "metadata": {}}],
    })
    dv = write_deletion_vector(table, [0])
    stray = write_deletion_vector(table, [1])  # never referenced
    assert stray  # a second .bin on disk
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet", "deletionVector": dv}}],
    ], schema_json)
    deleted = vacuum_delta_table(table, min_age_seconds=0)
    assert len(deleted) == 1 and deleted[0].endswith(".bin")
    assert _rows(read_delta(spark, table)) == [(2,)]


def test_delta_vacuum_retention_window_keeps_young_files(spark, tmp_path):
    """r13 review: an unreferenced-but-YOUNG file is indistinguishable
    from a concurrent writer's in-flight data — the default retention
    window keeps it; min_age_seconds=0 reclaims it."""
    import shutil

    from hive_udf_spark.sources.delta import read_delta

    table = str(tmp_path / "t")
    _delta_ingest(spark, table, 2)
    orphan = os.path.join(table, "part-0000000009-00000.parquet")
    shutil.copy(glob.glob(os.path.join(table, "part-*.parquet"))[0], orphan)
    # default window: the just-created orphan survives
    assert vacuum_delta_table(table) == []
    assert os.path.exists(orphan)
    # explicit zero window: reclaimed
    assert vacuum_delta_table(table, min_age_seconds=0) == [
        "part-0000000009-00000.parquet"
    ]
    assert read_delta(spark, table).count() == 6


def test_delta_sink_refuses_fresh_checkpoint_and_truncated_versions(
    spark, tmp_path
):
    """r13 review: the Delta sink verifies its txn identity on retries
    (foreign commits refuse) and refuses to publish a version at or
    below the table's checkpoint (its commit was truncated — readers
    would never see the rows)."""
    from hive_udf_spark.sources.maintenance import truncate_delta_log
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta

    table = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "en", 10)],
                               "doc_id long, lang string, n long")
    assert commit_batch_to_delta(df, 0, table, app_id="stream-A")
    assert not commit_batch_to_delta(df, 0, table, app_id="stream-A")
    with pytest.raises(ValueError, match="fresh checkpoint"):
        commit_batch_to_delta(df, 0, table, app_id="stream-B")

    t2 = str(tmp_path / "t2")
    _delta_ingest(spark, t2, 10, checkpoint_every=5)
    truncate_delta_log(t2)
    # r14: the checkpoint carries txn state, so the SAME app retrying a
    # truncated version is a recognizable no-op retry...
    assert commit_batch_to_delta(df, 3, t2) is False
    # ...while a foreign app at a truncated version still refuses
    with pytest.raises(ValueError, match="truncated"):
        commit_batch_to_delta(df, 3, t2, app_id="stream-other")


def test_hudi_cleaner_reclaims_superseded_logs_of_live_groups(
    spark, tmp_path
):
    """r13 review: a base REWRITE starts a new slice — the old slice's
    logs are dead and must reclaim, while logs targeting the CURRENT
    slice's base instant stay (possible mid-commit appenders)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.hudi import read_hudi, write_hudi_table

    table = str(tmp_path / "t")

    def src(name, rows):
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        }), p)
        return p

    write_hudi_table(table, [
        {"writes": {"fg-a": src("a", [(1, "en", 10)])}},
        {"log_writes": {"fg-a": [{"doc_id": 1, "lang": "en", "n": 11}]}},
        # base REWRITE: starts a new slice, the log above is superseded
        {"writes": {"fg-a": src("a2", [(1, "en", 12)])},
         "action": "commit"},
    ], [("doc_id", "bigint"), ("lang", "string"), ("n", "bigint")],
        record_key="doc_id")
    before = _rows(read_hudi(spark, table))
    assert before == [(1, "en", 12)]
    deleted = clean_hudi_table(table)
    assert any(".log." in p for p in deleted)  # superseded log reclaimed
    # a log named for the CURRENT base instant survives (pending appender)
    import glob as _glob
    import shutil

    base = _glob.glob(os.path.join(table, "fg-a_*_20240101000002.parquet"))
    assert base
    fake_pending = os.path.join(
        table, ".fg-a_20240101000002.log.1_0-0-0")
    with open(fake_pending, "wb") as fh:
        fh.write(b"")
    got = clean_hudi_table(table)
    assert got == [] and os.path.exists(fake_pending)
    os.remove(fake_pending)
    assert _rows(read_hudi(spark, table)) == before


def test_delta_log_truncation_reclaims_v2_sidecars(spark, tmp_path):
    """r13 review: deleting a superseded V2 checkpoint top file must
    also reclaim the sidecar parquet no remaining checkpoint
    references."""
    from hive_udf_spark.sources.delta import checkpoint_v2_delta, read_delta
    from hive_udf_spark.sources.maintenance import truncate_delta_log

    table = str(tmp_path / "t")
    _delta_ingest(spark, table, 4)
    checkpoint_v2_delta(table, 1)
    checkpoint_v2_delta(table, 3)
    sdir = os.path.join(table, "_delta_log", "_sidecars")
    n_before = len(os.listdir(sdir))
    assert n_before >= 2
    before = _rows(read_delta(spark, table))
    # r14 ADVICE: under the default retention window a fresh
    # unreferenced sidecar is indistinguishable from a concurrent
    # checkpoint writer's in-flight one — it must survive
    kept = truncate_delta_log(table)
    assert not any(p.startswith("_sidecars") for p in kept)
    assert len(os.listdir(sdir)) == n_before
    deleted = truncate_delta_log(table, sidecar_min_age_seconds=0)
    assert any(p.startswith("_sidecars") for p in deleted)
    assert _rows(read_delta(spark, table)) == before
    # the remaining checkpoint's sidecars survive
    assert len(os.listdir(sdir)) >= 1


def test_delta_log_truncation_anchors_on_complete_checkpoint(
    spark, tmp_path
):
    """truncate_delta_log drops commits <= the newest COMPLETE
    checkpoint and older checkpoints; reads and later commits keep
    working; a log without any checkpoint is left alone."""
    from hive_udf_spark.sources.delta import read_delta
    from hive_udf_spark.sources.maintenance import truncate_delta_log
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta

    table = str(tmp_path / "t")
    _delta_ingest(spark, table, 10, checkpoint_every=5)  # cps at 4 and 9
    before = _rows(read_delta(spark, table))
    deleted = truncate_delta_log(table)
    assert f"{0:020d}.json" in deleted and f"{9:020d}.json" in deleted
    assert f"{4:020d}.checkpoint.parquet" in deleted  # superseded cp
    assert f"{9:020d}.checkpoint.parquet" not in deleted  # the anchor
    assert _rows(read_delta(spark, table)) == before
    # the stream continues after truncation...
    df = spark.createDataFrame([(999, "zz", 1)],
                               "doc_id long, lang string, n long")
    assert commit_batch_to_delta(df, 10, table, checkpoint_every=0)
    assert len(_rows(read_delta(spark, table))) == 31
    # ...and a second truncation is a no-op (commit 10 > the anchor)
    assert truncate_delta_log(table) == []
    # checkpoint-less tables are left alone
    t2 = str(tmp_path / "plain")
    _delta_ingest(spark, t2, 2)
    assert truncate_delta_log(t2) == []


# ---------------------------------------------------------------------------
# Iceberg
# ---------------------------------------------------------------------------


def test_iceberg_compaction_applies_deletes_permanently(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.iceberg import (
        iceberg_live_files,
        read_iceberg,
        write_iceberg_table,
    )

    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)

    def wf(name, rows):
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
        }), os.path.join(table, name))

    wf("data/a.parquet", [(1, "en"), (2, "de"), (3, "fr")])
    wf("data/b.parquet", [(4, "es"), (5, "de")])
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "lang", "required": False, "type": "string"},
    ]
    write_iceberg_table(table, [
        {"added": ["data/a.parquet", "data/b.parquet"]},
        {"pos_deletes": {"data/a.parquet": [0]},      # drops doc_id 1
         "eq_deletes": {"ids": [2], "rows": [{"lang": "de"}]}},
    ], fields)
    before = _rows(read_iceberg(spark, table))
    assert before == [(3, "fr"), (4, "es")]
    assert compact_iceberg_table(spark, table, target_files=1)
    assert _rows(read_iceberg(spark, table)) == before
    # deletes are PERMANENT: the live file list is now clean (no
    # row-level deletes left to force the read path)
    meta, files = iceberg_live_files(table)
    assert len(files) == 1 and "compact-" in files[0]
    # time travel to the pre-compaction snapshot still applies deletes
    old_sid = 1001
    assert _rows(read_iceberg(spark, table, snapshot_id=old_sid)) == before
    # already compact: no-op
    assert not compact_iceberg_table(spark, table, target_files=1)


def test_iceberg_compaction_preserves_field_ids(spark, tmp_path):
    """An id-carrying table stays id-carrying through compaction: a
    column RENAME after the rewrite still resolves (by id), which
    by-name files could not deliver."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.iceberg import (
        _parquet_has_field_ids,
        iceberg_live_files,
        read_iceberg,
        write_iceberg_table,
    )

    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    for name, ids_rows in (("a", [1]), ("b", [2])):
        t = pa.table({
            "doc_id": pa.array(ids_rows, pa.int64()),
            "lang": pa.array(["en"] * len(ids_rows), pa.string()),
        })
        t = t.cast(pa.schema([
            pa.field("doc_id", pa.int64(),
                     metadata={b"PARQUET:field_id": b"1"}),
            pa.field("lang", pa.string(),
                     metadata={b"PARQUET:field_id": b"2"}),
        ]))
        pq.write_table(t, os.path.join(table, f"data/{name}.parquet"))
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "lang", "required": False, "type": "string"},
    ]
    write_iceberg_table(table, [
        {"added": ["data/a.parquet", "data/b.parquet"]},
    ], fields)
    assert compact_iceberg_table(spark, table, target_files=1)
    _, files = iceberg_live_files(table)
    assert len(files) == 1 and _parquet_has_field_ids(files[0])
    # rename the column in the schema: the compacted file still resolves
    import json as _json

    mdir = os.path.join(table, "metadata")
    hint = open(os.path.join(mdir, "version-hint.text")).read().strip()
    mpath = os.path.join(mdir, f"v{hint}.metadata.json")
    meta = _json.load(open(mpath))
    meta["schemas"][0]["fields"][1]["name"] = "language"
    _json.dump(meta, open(mpath, "w"))
    df = read_iceberg(spark, table)
    assert df.columns == ["doc_id", "language"]
    assert _rows(df) == [(1, "en"), (2, "en")]


def test_iceberg_compaction_refuses_partitioned_specs(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.iceberg import write_iceberg_table

    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    pq.write_table(pa.table({"doc_id": pa.array([1], pa.int64())}),
                   os.path.join(table, "data/a.parquet"))
    write_iceberg_table(table, [{"added": ["data/a.parquet"]}], [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
    ], partition_spec=[{"name": "day", "transform": "identity",
                        "source-id": 1, "field-id": 1000}])
    with pytest.raises(ValueError, match="partitioned"):
        compact_iceberg_table(spark, table)


def test_iceberg_expire_snapshots_trims_and_reclaims(spark, tmp_path):
    """expire_snapshots publishes a trimmed snapshot log FIRST, then
    deletes manifests/files referenced only by expired snapshots;
    retained reads are unchanged, expired ids stop resolving."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.iceberg import (
        read_iceberg,
        write_iceberg_table,
    )

    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)

    def wf(name, ids):
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
        }), os.path.join(table, name))

    wf("data/a.parquet", [1, 2])
    wf("data/b.parquet", [3])
    wf("data/c.parquet", [4])
    fields = [{"id": 1, "name": "doc_id", "required": False,
               "type": "long"}]
    write_iceberg_table(table, [
        {"added": ["data/a.parquet"]},
        # a.parquet leaves the table here: only snapshot 1000 refs it
        {"deleted": ["data/a.parquet"], "added": ["data/b.parquet"]},
        {"added": ["data/c.parquet"]},
    ], fields)
    before = _rows(read_iceberg(spark, table))
    assert before == [(3,), (4,)]
    deleted = expire_iceberg_snapshots(table, keep_last=2)
    # the retired data file and snapshot-1000 metadata went away
    assert any(p.endswith("a.parquet") for p in deleted)
    assert _rows(read_iceberg(spark, table)) == before
    # expired snapshot ids stop resolving; retained ones still work
    with pytest.raises(ValueError, match="not in the log"):
        read_iceberg(spark, table, snapshot_id=1000)
    assert _rows(read_iceberg(spark, table, snapshot_id=1001)) == [(3,)]
    # live data files referenced by BOTH expired and retained survive
    assert os.path.exists(os.path.join(table, "data/b.parquet"))
    assert expire_iceberg_snapshots(table, keep_last=2) == []


# ---------------------------------------------------------------------------
# Hudi
# ---------------------------------------------------------------------------


def test_hudi_clustering_compacts_mor_logs(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.hudi import (
        hudi_live_files,
        read_hudi,
        write_hudi_table,
    )

    table = str(tmp_path / "t")
    src = str(tmp_path / "src.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "lang": pa.array(["en", "de", "fr"], pa.string()),
        "n": pa.array([10, 20, 30], pa.int64()),
    }), src)
    write_hudi_table(table, [
        {"writes": {"fg-a": src}},
        {"log_writes": {"fg-a": [{"doc_id": 2, "lang": "de", "n": 21}]}},
        {"log_deletes": {"fg-a": ["3"]}},
    ], [("doc_id", "bigint"), ("lang", "string"), ("n", "bigint")],
        record_key="doc_id")
    before = _rows(read_hudi(spark, table))
    assert before == [(1, "en", 10), (2, "de", 21)]
    # live-file listing refuses while unmerged logs exist
    with pytest.raises(ValueError, match="unmerged"):
        hudi_live_files(table)
    assert cluster_hudi_table(spark, table, target_files=1)
    assert _rows(read_hudi(spark, table)) == before
    # after clustering the table is base-only: the listing works
    files, _ = hudi_live_files(table)
    assert len(files) == 1 and "cluster-" in files[0]
    # time travel to the pre-cluster instant still merges the logs
    assert _rows(read_hudi(spark, table, as_of="20240101000002")) == before
    # already clustered: no-op
    assert not cluster_hudi_table(spark, table, target_files=1)

    # the cleaner reclaims the replaced group's base + log files but
    # keeps a pending writer's uncommitted base file
    hoodie = os.path.join(table, ".hoodie")
    pend = "20990101000000"
    open(os.path.join(hoodie, f"{pend}.commit.requested"), "w").close()
    open(os.path.join(hoodie, f"{pend}.inflight"), "w").close()
    pending_base = os.path.join(table, f"fg-x_0-0-0_{pend}.parquet")
    import shutil

    shutil.copy(files[0], pending_base)
    deleted = clean_hudi_table(table)
    assert any(p.endswith(".parquet") and p.startswith("fg-a")
               for p in deleted)          # old base file gone
    assert any(".log." in p for p in deleted)  # old log files gone
    assert os.path.exists(pending_base)   # pending writer untouched
    assert _rows(read_hudi(spark, table)) == before
    assert clean_hudi_table(table) == []


# ---------------------------------------------------------------------------
# r14 ADVICE regressions
# ---------------------------------------------------------------------------


def test_delta_checkpoint_carries_txn_state(spark, tmp_path):
    """r14 ADVICE: checkpoints carry SetTransaction (txn) actions, so
    after truncate_delta_log removes the JSON commits the idempotent
    writer's appId/version state survives — both classic and V2
    checkpoint layouts."""
    from hive_udf_spark.sources.delta import (
        checkpoint_v2_delta,
        delta_snapshot,
    )
    from hive_udf_spark.sources.maintenance import truncate_delta_log

    table = str(tmp_path / "t")
    _delta_ingest(spark, table, 6, checkpoint_every=3)  # cps at 2 and 5
    assert delta_snapshot(table).txns == {"delta-ingest": 5}
    truncate_delta_log(table)  # every JSON commit is redundant -> gone
    assert not glob.glob(os.path.join(table, "_delta_log", "*.json"))
    # the checkpoint alone still reconstructs the txn state
    assert delta_snapshot(table).txns == {"delta-ingest": 5}

    t2 = str(tmp_path / "t2")
    _delta_ingest(spark, t2, 4)
    checkpoint_v2_delta(t2, 3)
    truncate_delta_log(t2)
    assert delta_snapshot(t2).txns == {"delta-ingest": 3}


def test_iceberg_compaction_tombstones_keep_original_sequence(
    spark, tmp_path
):
    """r14 ADVICE: a status-2 (DELETED) manifest entry keeps the
    retired file's ORIGINAL data sequence number (Iceberg spec), not
    the compacting snapshot's — an external engine reading the
    manifests would otherwise mis-order the tombstones against
    equality deletes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.operators.avrocodec import decode_ocf
    from hive_udf_spark.sources.iceberg import (
        _load_metadata,
        _local_path,
        read_iceberg,
        write_iceberg_table,
    )

    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)

    def wf(name, rows):
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
        }), os.path.join(table, name))

    wf("data/a.parquet", [(1, "en"), (2, "de")])
    wf("data/b.parquet", [(3, "fr")])
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "lang", "required": False, "type": "string"},
    ]
    # two commits -> the two data files live at DIFFERENT sequences
    write_iceberg_table(table, [
        {"added": ["data/a.parquet"]},
        {"added": ["data/b.parquet"]},
    ], fields)
    before = _rows(read_iceberg(spark, table))
    assert compact_iceberg_table(spark, table, target_files=1)
    assert _rows(read_iceberg(spark, table)) == before
    meta = _load_metadata(table)
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    new_seq = cur["sequence-number"]
    with open(_local_path(cur["manifest-list"], table), "rb") as fh:
        _, manifests = decode_ocf(fh.read())
    tomb_seqs = {}
    for m in manifests:
        with open(_local_path(m["manifest_path"], table), "rb") as fh:
            _, entries = decode_ocf(fh.read())
        for e in entries:
            if e.get("status") == 2:
                fp = e["data_file"]["file_path"]
                tomb_seqs[os.path.basename(fp)] = e["sequence_number"]
    assert tomb_seqs == {"a.parquet": 1, "b.parquet": 2}
    assert all(s < new_seq for s in tomb_seqs.values())


def test_iceberg_upsert_delete_files_executor_parallel(spark, tmp_path):
    """r14 ADVICE: the upsert sink's equality-delete key set is written
    with the batch's natural parallelism — multiple delete files
    register in the delete manifest and the reader applies them all."""
    from hive_udf_spark.operators.avrocodec import decode_ocf
    from hive_udf_spark.sources.iceberg import _load_metadata, read_iceberg
    from hive_udf_spark.streaming.iceberg_upsert_sink import (
        upsert_batch_to_iceberg,
    )

    table = str(tmp_path / "t")
    b0 = spark.createDataFrame(
        [(i, f"v0-{i}") for i in range(40)], "doc_id long, val string")
    assert upsert_batch_to_iceberg(b0, 0, table)
    # batch 1 arrives over several partitions; every part with keys
    # becomes its own equality-delete file
    b1 = spark.createDataFrame(
        [(i, f"v1-{i}") for i in range(0, 40, 2)],
        "doc_id long, val string").repartition(4)
    assert upsert_batch_to_iceberg(b1, 1, table)
    meta = _load_metadata(table)
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    mlist = cur["manifest-list"]
    with open(mlist if os.path.isabs(mlist)
              else os.path.join(table, mlist), "rb") as fh:
        _, manifests = decode_ocf(fh.read())
    del_entries = []
    for m in manifests:
        if (m.get("content") or 0) != 1:
            continue
        mp = m["manifest_path"]
        with open(mp if os.path.isabs(mp)
                  else os.path.join(table, mp), "rb") as fh:
            _, entries = decode_ocf(fh.read())
        del_entries += [e for e in entries
                        if e["data_file"]["content"] == 2]
    assert len(del_entries) > 1  # parallel parts, not one coalesced file
    assert sum(e["data_file"]["record_count"] for e in del_entries) == 20
    got = {(r.doc_id, r.val) for r in read_iceberg(spark, table).collect()}
    want = {(i, f"v1-{i}") if i % 2 == 0 else (i, f"v0-{i}")
            for i in range(40)}
    assert got == want


# ---------------------------------------------------------------------------
# r14 verdict task 1: partitioned compaction / clustering
# ---------------------------------------------------------------------------


def test_iceberg_partitioned_compaction_rewrites_hot_groups_only(
    spark, tmp_path
):
    """Partitioned Iceberg compaction mirrors the Delta per-group
    design: the hot partition (too many files / delete-reachable)
    rewrites, the cold partition carries forward as EXISTING entries
    with its original sequence number and partition record — and
    driver-side pruning keeps working on the swapped layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.iceberg import (
        read_iceberg,
        write_iceberg_table,
    )

    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)

    def wf(name, rows):
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
        }), os.path.join(table, name))

    wf("data/a1.parquet", [(1, "en"), (2, "de")])
    wf("data/a2.parquet", [(3, "fr")])
    wf("data/b.parquet", [(4, "es")])
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "lang", "required": False, "type": "string"},
    ]
    spec = [{"name": "day", "transform": "identity", "source-id": 1,
             "field-id": 1000}]
    write_iceberg_table(table, [
        {"added": [("data/a1.parquet", {"day": 7}),
                   ("data/a2.parquet", {"day": 7}),
                   ("data/b.parquet", {"day": 8})]},
    ], fields, partition_spec=spec)
    before = _rows(read_iceberg(spark, table))
    assert compact_iceberg_table(spark, table, target_files=1)
    assert _rows(read_iceberg(spark, table)) == before
    # hot partition day=7: one compact file; cold day=8: ORIGINAL file
    hot = read_iceberg(spark, table, partition_filter={"day": 7})
    assert len(hot.inputFiles()) == 1 and "compact-" in hot.inputFiles()[0]
    assert sorted(r.doc_id for r in hot.collect()) == [1, 2, 3]
    cold = read_iceberg(spark, table, partition_filter={"day": 8})
    assert len(cold.inputFiles()) == 1
    assert "b.parquet" in cold.inputFiles()[0]
    assert [r.doc_id for r in cold.collect()] == [4]
    # nothing left to do
    assert not compact_iceberg_table(spark, table, target_files=1)


def test_iceberg_partitioned_compaction_delete_gating(spark, tmp_path):
    """A partition is delete-reachable only under the spec's sequence
    gating: files newer than every delete stay untouched even while
    the delete-carrying partition rewrites (and the dropped delete
    manifests stay sound)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.iceberg import (
        read_iceberg,
        write_iceberg_table,
    )

    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)

    def wf(name, rows):
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
        }), os.path.join(table, name))

    wf("data/a.parquet", [(1, "en"), (2, "de")])
    wf("data/late.parquet", [(9, "pt")])
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "lang", "required": False, "type": "string"},
    ]
    spec = [{"name": "day", "transform": "identity", "source-id": 1,
             "field-id": 1000}]
    write_iceberg_table(table, [
        # seq 1: partition day=7
        {"added": [("data/a.parquet", {"day": 7})]},
        # seq 2: equality delete (reaches seq < 2 only)
        {"eq_deletes": {"ids": [2], "rows": [{"lang": "de"}]}},
        # seq 3: partition day=9, added AFTER the delete — unreachable
        {"added": [("data/late.parquet", {"day": 9})]},
    ], fields, partition_spec=spec)
    before = _rows(read_iceberg(spark, table))
    assert (1, "en") in before and (2, "de") not in before
    assert compact_iceberg_table(spark, table, target_files=1)
    assert _rows(read_iceberg(spark, table)) == before
    # the delete-reachable partition rewrote; the newer one did not
    hot = read_iceberg(spark, table, partition_filter={"day": 7})
    assert "compact-" in hot.inputFiles()[0]
    assert sorted(r.doc_id for r in hot.collect()) == [1]
    cold = read_iceberg(spark, table, partition_filter={"day": 9})
    assert "late.parquet" in cold.inputFiles()[0]


def test_hudi_partitioned_clustering_rewrites_hot_partitions_only(
    spark, tmp_path
):
    """Partitioned Hudi clustering: the partition with too many file
    groups (or MOR logs) rewrites into new groups under its own path;
    cold partitions stay out of the replacecommit; pruning keeps
    working; the cleaner then reclaims the replaced layout."""
    from hive_udf_spark.sources.hudi import read_hudi, write_hudi_table

    table = str(tmp_path / "t")

    def src(name, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        }), p)
        return p

    write_hudi_table(table, [
        {"partition_writes": {
            "day=7": {"fg-a": src("a", [(1, "en", 10)]),
                      "fg-b": src("b", [(2, "de", 20)])},
            "day=8": {"fg-c": src("c", [(3, "fr", 30)])},
        }},
    ], [("doc_id", "bigint"), ("lang", "string"), ("n", "bigint")])
    before = _rows(read_hudi(spark, table))
    assert before == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]
    assert cluster_hudi_table(spark, table, target_files=1)
    assert _rows(read_hudi(spark, table)) == before
    hot = read_hudi(spark, table, partitions=["day=7"])
    assert len(hot.inputFiles()) == 1 and "cluster-" in hot.inputFiles()[0]
    assert "day=7" in hot.inputFiles()[0]
    cold = read_hudi(spark, table, partitions=["day=8"])
    assert len(cold.inputFiles()) == 1 and "fg-c" in cold.inputFiles()[0]
    # idempotent: nothing hot remains
    assert not cluster_hudi_table(spark, table, target_files=1)
    # the replaced day=7 groups reclaim; day=8 untouched
    deleted = clean_hudi_table(table)
    assert any(p.startswith("day=7") for p in deleted)
    assert not any(p.startswith("day=8") for p in deleted)
    assert _rows(read_hudi(spark, table)) == before


def test_hudi_partitioned_clustering_compacts_root_mor_logs(
    spark, tmp_path
):
    """A root-partition MOR file group with logs is hot (clustering is
    log compaction); a cold partitioned group is untouched."""
    from hive_udf_spark.sources.hudi import read_hudi, write_hudi_table

    table = str(tmp_path / "t")

    def src(name, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        }), p)
        return p

    write_hudi_table(table, [
        {"writes": {"fg-a": src("a", [(1, "en", 10)])},
         "partition_writes": {
             "day=8": {"fg-c": src("c", [(3, "fr", 30)])}}},
        {"log_writes": {"fg-a": [
            {"doc_id": 1, "lang": "en", "n": 11}]}},
    ], [("doc_id", "bigint"), ("lang", "string"), ("n", "bigint")],
        record_key="doc_id")
    before = _rows(read_hudi(spark, table))
    assert before == [(1, "en", 11), (3, "fr", 30)]
    assert cluster_hudi_table(spark, table, target_files=1)
    assert _rows(read_hudi(spark, table)) == before
    cold = read_hudi(spark, table, partitions=["day=8"])
    assert "fg-c" in cold.inputFiles()[0]
    root = read_hudi(spark, table, partitions=[""])
    assert "cluster-" in root.inputFiles()[0]


# ---------------------------------------------------------------------------
# r14 verdict task 8: streaming auto-maintenance cadence
# ---------------------------------------------------------------------------


def _batches(spark, n):
    for b in range(n):
        yield b, spark.createDataFrame(
            [(b * 10 + i, i) for i in range(3)], "doc_id long, n long"
        )


def test_delta_sink_auto_maintenance_lifecycle(spark, tmp_path):
    """50-batch stream with maintain_every=10: the table ends with a
    BOUNDED file count (compaction keeps the layout at
    O(target_files + batches-since-maintenance), vacuum reclaims the
    swapped-out layouts), every row stays readable, and the idempotency
    contract survives the version/batch decoupling."""
    import glob

    from hive_udf_spark.sources.delta import read_delta
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta

    table = str(tmp_path / "t")
    for b, df in _batches(spark, 50):
        assert commit_batch_to_delta(
            df, b, table, app_id="app", checkpoint_every=10,
            maintain_every=10, maintain_target_files=2,
            retention_seconds=0.0,
        )
    got = read_delta(spark, table)
    assert got.count() == 150
    n_files = len(glob.glob(os.path.join(table, "*.parquet")))
    # 2 compacted + at most 10 batches of parts since the last cadence
    assert n_files <= 2 + 10 * 4, n_files
    # the plan reads the bounded layout, not the 50-batch history
    assert len(got.inputFiles()) == n_files
    # retry no-ops; the next batch continues
    retry = spark.createDataFrame([(999, 0)], "doc_id long, n long")
    assert commit_batch_to_delta(retry, 49, table, app_id="app",
                                 maintain_every=10) is False
    assert commit_batch_to_delta(retry, 50, table, app_id="app",
                                 maintain_every=10)
    assert read_delta(spark, table).count() == 151
    # a skipped batch id refuses (contiguity per app)
    with pytest.raises(ValueError, match="last committed batch"):
        commit_batch_to_delta(retry, 60, table, app_id="app",
                              maintain_every=10)


def test_iceberg_sink_auto_maintenance_lifecycle(spark, tmp_path):
    """Same lifecycle for the Iceberg sink: snapshots/versions continue
    past the maintenance commits, expire reclaims each era one cadence
    later (the latest stream snapshot pins its own era until the next
    round — documented lag), and the layout stays bounded."""
    import glob

    from hive_udf_spark.sources.iceberg import read_iceberg
    from hive_udf_spark.streaming.iceberg_sink import (
        commit_batch_to_iceberg,
    )

    table = str(tmp_path / "t")
    for b, df in _batches(spark, 50):
        assert commit_batch_to_iceberg(
            df, b, table, app_id="app", maintain_every=10,
            maintain_target_files=2, retention_keep_last=2,
        )
    got = read_iceberg(spark, table)
    assert got.count() == 150
    n_files = len(glob.glob(os.path.join(table, "data", "*.parquet")))
    # <= two eras of batches (the one-cadence reclaim lag) + compacted
    assert n_files <= 4 + 20 * 4, n_files
    assert len(got.inputFiles()) <= n_files
    retry = spark.createDataFrame([(999, 0)], "doc_id long, n long")
    assert commit_batch_to_iceberg(retry, 49, table, app_id="app",
                                   maintain_every=10) is False
    assert commit_batch_to_iceberg(retry, 50, table, app_id="app",
                                   maintain_every=10)
    assert read_iceberg(spark, table).count() == 151
    with pytest.raises(ValueError, match="last committed batch"):
        commit_batch_to_iceberg(retry, 60, table, app_id="app",
                                maintain_every=10)


def test_hudi_sink_auto_maintenance_lifecycle(spark, tmp_path):
    """Same lifecycle for the Hudi sink: instants continue past the
    clustering replacecommits, the cleaner reclaims replaced groups
    immediately, and the layout stays bounded."""
    import glob

    from hive_udf_spark.sources.hudi import read_hudi
    from hive_udf_spark.streaming.hudi_sink import commit_batch_to_hudi

    table = str(tmp_path / "t")
    for b, df in _batches(spark, 50):
        assert commit_batch_to_hudi(
            df, b, table, table_name="app", maintain_every=10,
            maintain_target_files=2,
        )
    got = read_hudi(spark, table)
    assert got.count() == 150
    n_files = len(glob.glob(os.path.join(table, "*.parquet")))
    assert n_files <= 2 + 10 * 4, n_files
    assert len(got.inputFiles()) == n_files
    retry = spark.createDataFrame([(999, 0)], "doc_id long, n long")
    assert commit_batch_to_hudi(retry, 49, table, table_name="app",
                                maintain_every=10) is False
    assert commit_batch_to_hudi(retry, 50, table, table_name="app",
                                maintain_every=10)
    assert read_hudi(spark, table).count() == 151
    with pytest.raises(ValueError, match="last committed batch"):
        commit_batch_to_hudi(retry, 60, table, table_name="app",
                             maintain_every=10)


def test_auto_maintenance_against_empty_table_refuses_nonzero_batch(
    spark, tmp_path
):
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta
    from hive_udf_spark.streaming.hudi_sink import commit_batch_to_hudi
    from hive_udf_spark.streaming.iceberg_sink import (
        commit_batch_to_iceberg,
    )

    df = spark.createDataFrame([(1, 0)], "doc_id long, n long")
    with pytest.raises(ValueError, match="empty table"):
        commit_batch_to_delta(df, 3, str(tmp_path / "d"), app_id="a",
                              maintain_every=5)
    with pytest.raises(ValueError, match="empty table"):
        commit_batch_to_iceberg(df, 3, str(tmp_path / "i"), app_id="a",
                                maintain_every=5)
    with pytest.raises(ValueError, match="empty table"):
        commit_batch_to_hudi(df, 3, str(tmp_path / "h"), table_name="a",
                             maintain_every=5)
