"""Incremental/change queries + DV-backed delete (sources/changes.py,
r14): DV union on repeated deletes, whole-file retirement, vacuumed /
truncated-range refusals, non-append refusals, Hudi meta-column row
attribution, and empty-range shapes."""

from __future__ import annotations

import os

import pytest

from hive_udf_spark.sources.changes import (
    delete_from_delta,
    read_delta_changes,
    read_hudi_incremental,
    read_iceberg_incremental,
)


def _ingest_delta(spark, table, n_batches, rows_per=5):
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta

    for b in range(n_batches):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(rows_per)],
            "doc_id long, n long",
        )
        assert commit_batch_to_delta(df.coalesce(1), b, table,
                                     app_id="t", checkpoint_every=0)


def test_delete_from_delta_unions_with_existing_dv(spark, tmp_path):
    from hive_udf_spark.sources.delta import read_delta

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 2)
    assert delete_from_delta(spark, table, "doc_id = 1") == 1
    # second delete on the same file must keep the first one dead
    assert delete_from_delta(spark, table, "doc_id = 2") == 1
    got = sorted(r.doc_id for r in read_delta(spark, table).collect())
    assert got == [0, 3, 4, 10, 11, 12, 13, 14]
    # repeating a delete is a no-op (already dead rows don't re-count)
    assert delete_from_delta(spark, table, "doc_id = 2") == 0


def test_delete_from_delta_retires_fully_dead_files(spark, tmp_path):
    from hive_udf_spark.sources.delta import delta_snapshot, read_delta

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 2)
    assert delete_from_delta(spark, table, "doc_id < 10") == 5
    snap = delta_snapshot(table)
    # the whole first file died: plain remove, no DV-carrying re-add
    assert len(snap.files) == 1
    assert read_delta(spark, table).count() == 5


def test_delete_from_delta_density_cap(spark, tmp_path):
    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 1)
    with pytest.raises(ValueError, match="cap"):
        delete_from_delta(spark, table, "doc_id >= 0",
                          max_deleted_rows=2)


def test_delta_changes_whole_file_delete_excludes_dv_dead_rows(
    spark, tmp_path
):
    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 1)
    delete_from_delta(spark, table, "doc_id = 1")       # v1: DV
    delete_from_delta(spark, table, "doc_id < 10")      # v2: file dies
    ch = read_delta_changes(spark, table, 2, 2)
    got = sorted((r.doc_id, r._change_type) for r in ch.collect())
    # row 1 was already dead at v1 — only the freshly-dead rows report
    assert got == [(0, "delete"), (2, "delete"), (3, "delete"),
                   (4, "delete")]
    ch1 = read_delta_changes(spark, table, 1, 1)
    assert sorted((r.doc_id, r._change_type) for r in ch1.collect()) \
        == [(1, "delete")]


def test_delta_changes_refuses_vacuumed_file(spark, tmp_path):
    from hive_udf_spark.sources.delta import delta_snapshot

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 2)
    # version 2: remove batch 0's file, then physically delete it
    victim = list(delta_snapshot(table, 0).files)[0]
    import json as _json

    with open(os.path.join(table, "_delta_log",
                           f"{2:020d}.json"), "w") as fh:
        fh.write(_json.dumps({"remove": {
            "path": victim, "deletionTimestamp": 0, "dataChange": True,
        }}) + "\n")
    os.remove(os.path.join(table, victim))
    with pytest.raises(ValueError, match="vacuumed"):
        read_delta_changes(spark, table, 2, 2).collect()


def test_delta_changes_refuses_truncated_range(spark, tmp_path):
    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 3)
    os.remove(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(ValueError, match="not in the log"):
        read_delta_changes(spark, table, 0, 2)


def test_delta_changes_optimize_is_invisible(spark, tmp_path):
    from hive_udf_spark.sources.maintenance import compact_delta_table

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 3)
    assert compact_delta_table(spark, table, target_files=1)
    # the OPTIMIZE commit (v3) carries dataChange=false everywhere
    ch = read_delta_changes(spark, table, 3, 3)
    assert ch.count() == 0


def test_iceberg_incremental_refuses_non_append(spark, tmp_path):
    from hive_udf_spark.sources.maintenance import compact_iceberg_table
    from hive_udf_spark.streaming.iceberg_sink import (
        commit_batch_to_iceberg,
    )

    table = str(tmp_path / "t")
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(3)], "doc_id long, n long"
        )
        assert commit_batch_to_iceberg(df, b, table, app_id="t")
    assert compact_iceberg_table(spark, table, target_files=1)
    with pytest.raises(ValueError, match="not an append"):
        read_iceberg_incremental(spark, table, 5000).collect()
    # a range ending BEFORE the replace still works
    inc = read_iceberg_incremental(spark, table, 5000, 5002)
    assert sorted(r.doc_id for r in inc.collect()) == [10, 11, 12,
                                                       20, 21, 22]


def test_iceberg_incremental_empty_range(spark, tmp_path):
    from hive_udf_spark.streaming.iceberg_sink import (
        commit_batch_to_iceberg,
    )

    table = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 0)], "doc_id long, n long")
    assert commit_batch_to_iceberg(df, 0, table, app_id="t")
    inc = read_iceberg_incremental(spark, table, 5000, 5000)
    assert inc.count() == 0
    assert "_snapshot_id" in inc.columns


def test_hudi_incremental_skips_replacecommits_and_refuses_logs(
    spark, tmp_path
):
    from hive_udf_spark.sources.maintenance import cluster_hudi_table
    from hive_udf_spark.streaming.hudi_sink import commit_batch_to_hudi

    table = str(tmp_path / "t")
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(3)], "doc_id long, n long"
        )
        assert commit_batch_to_hudi(df, b, table, table_name="t")
    assert cluster_hudi_table(spark, table, target_files=1)
    # clustering's replacecommit is inside the range but adds no data
    inc = read_hudi_incremental(spark, table, f"{20300101000000}")
    got = sorted(r.doc_id for r in inc.collect())
    assert got == [10, 11, 12, 20, 21, 22]


def test_hudi_incremental_meta_columns_attribute_rows(spark, tmp_path):
    """File groups REWRITTEN across commits (upserts) attribute rows by
    the _hoodie_commit_time meta column — only the rewritten commit's
    rows report, real Hudi's mechanism."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.hudi import META_COLUMNS, write_hudi_table

    table = str(tmp_path / "t")

    def src(name, rows, instant):
        p = str(tmp_path / f"{name}.parquet")
        cts = [r[2] if len(r) > 2 else instant for r in rows]
        cols = {"_hoodie_commit_time": pa.array(cts, pa.string())}
        for c in META_COLUMNS[1:]:
            cols[c] = pa.array([""] * len(rows), pa.string())
        cols["doc_id"] = pa.array([r[0] for r in rows], pa.int64())
        cols["n"] = pa.array([r[1] for r in rows], pa.int64())
        pq.write_table(pa.table(cols), p)
        return p

    # the fixture writer assigns instants 20240101000000 + i; the
    # rewritten file carries doc 1 under its ORIGINAL commit time and
    # doc 2 under the rewriting commit's — exactly what a real Hudi
    # upsert stamps
    i0, i1 = "20240101000000", "20240101000001"
    write_hudi_table(table, [
        {"writes": {"fg-0": src("a", [(1, 10), (2, 20)], i0)}},
        {"writes": {"fg-0": src(
            "b", [(1, 10, i0), (2, 21, i1)], None)}},
    ], [("doc_id", "bigint"), ("n", "bigint")])
    inc = read_hudi_incremental(spark, table, i0)
    got = sorted((r.doc_id, r.n) for r in inc.collect())
    # only the upserted row attributes to the second commit
    assert got == [(2, 21)]


def test_hudi_incremental_meta_less_rewrite_refuses(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.hudi import write_hudi_table

    table = str(tmp_path / "t")

    def src(name, rows):
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
        }), p)
        return p

    write_hudi_table(table, [
        {"writes": {"fg-0": src("a", [(1, 10)])}},
        {"writes": {"fg-0": src("b", [(1, 11)])}},  # meta-less rewrite
    ], [("doc_id", "bigint"), ("n", "bigint")])
    from hive_udf_spark.sources.hudi import hudi_timeline

    first = hudi_timeline(table)[0][0]
    with pytest.raises(ValueError, match="_hoodie_commit_time"):
        read_hudi_incremental(spark, table, first).collect()


def test_hudi_incremental_unknown_begin_refuses(spark, tmp_path):
    from hive_udf_spark.streaming.hudi_sink import commit_batch_to_hudi

    table = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 0)], "doc_id long, n long")
    assert commit_batch_to_hudi(df, 0, table, table_name="t")
    with pytest.raises(ValueError, match="not on the timeline"):
        read_hudi_incremental(spark, table, "19990101000000")


# ---------------------------------------------------------------------------
# r14: streaming CDF source (Python Data Source API)
# ---------------------------------------------------------------------------


def test_delta_cdf_stream_source_lifecycle(spark, tmp_path):
    """The readStream format consumes the feed through checkpointed
    offsets: a first run drains versions 0..N, a RESTART after a new
    commit emits ONLY the new version (exactly-once via the stream's
    own checkpoint), and DV deletes surface as delete rows."""
    from hive_udf_spark.streaming.delta_changes_source import (
        register_delta_changes_source,
    )
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 3, rows_per=4)
    delete_from_delta(spark, table, "doc_id % 10 = 1")
    register_delta_changes_source(spark)
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    stream = (spark.readStream.format("delta_changes")
              .option("path", table).load())

    def drain():
        q = (stream.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    drain()
    got = sorted((r.doc_id, r._change_type, r._commit_version)
                 for r in spark.read.parquet(out_dir).collect())
    ins = [g for g in got if g[1] == "insert"]
    dels = [g for g in got if g[1] == "delete"]
    assert len(ins) == 12
    assert sorted(d for d, _, _ in dels) == [1, 11, 21]
    assert all(v == 3 for _, _, v in dels)
    # restart after one more commit: only the new version arrives
    # the DV delete took version 3, so the stream's next batch is 4
    df = spark.createDataFrame([(90, 0)], "doc_id long, n long")
    assert commit_batch_to_delta(df.coalesce(1), 4, table, app_id="t",
                                 checkpoint_every=0)
    drain()
    got2 = sorted((r.doc_id, r._change_type, r._commit_version)
                  for r in spark.read.parquet(out_dir).collect())
    assert len(got2) == len(got) + 1
    assert (90, "insert", 4) in got2


def test_delta_cdf_stream_source_schema(spark, tmp_path):
    from hive_udf_spark.streaming.delta_changes_source import (
        register_delta_changes_source,
    )

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 1)
    register_delta_changes_source(spark)
    stream = (spark.readStream.format("delta_changes")
              .option("path", table).load())
    assert stream.columns == ["doc_id", "n", "_change_type",
                              "_commit_version"]
    assert dict(stream.dtypes)["_commit_version"] == "bigint"


def test_iceberg_incremental_stream_source_lifecycle(spark, tmp_path):
    """Snapshot-id offsets drain the feed; a restart after a new
    snapshot emits only the new one; startingSnapshotId skips the
    prefix."""
    from hive_udf_spark.streaming.iceberg_sink import (
        commit_batch_to_iceberg,
    )
    from hive_udf_spark.streaming.incremental_sources import (
        register_incremental_sources,
    )

    table = str(tmp_path / "t")
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(3)], "doc_id long, n long"
        )
        assert commit_batch_to_iceberg(df, b, table, app_id="t")
    register_incremental_sources(spark)
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    stream = (spark.readStream.format("iceberg_incremental")
              .option("path", table).load())

    def drain():
        q = (stream.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    drain()
    got = sorted((r.doc_id, r._snapshot_id)
                 for r in spark.read.parquet(out_dir).collect())
    assert len(got) == 9 and got[-1] == (22, 5002)
    df = spark.createDataFrame([(99, 0)], "doc_id long, n long")
    assert commit_batch_to_iceberg(df, 3, table, app_id="t")
    drain()
    got2 = sorted((r.doc_id, r._snapshot_id)
                  for r in spark.read.parquet(out_dir).collect())
    assert len(got2) == 10 and (99, 5003) in got2
    # startingSnapshotId skips the prefix (exclusive)
    out2 = str(tmp_path / "out2")
    st2 = (spark.readStream.format("iceberg_incremental")
           .option("path", table)
           .option("startingSnapshotId", "5001").load())
    q = (st2.writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out2))
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert sorted(r.doc_id for r in spark.read.parquet(out2).collect()) \
        == [20, 21, 22, 99]


def test_hudi_incremental_stream_source_lifecycle(spark, tmp_path):
    from hive_udf_spark.streaming.hudi_sink import commit_batch_to_hudi
    from hive_udf_spark.streaming.incremental_sources import (
        register_incremental_sources,
    )

    table = str(tmp_path / "t")
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(3)], "doc_id long, n long"
        )
        assert commit_batch_to_hudi(df, b, table, table_name="t")
    register_incremental_sources(spark)
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    stream = (spark.readStream.format("hudi_incremental")
              .option("path", table).load())

    def drain():
        q = (stream.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    drain()
    assert spark.read.parquet(out_dir).count() == 9
    df = spark.createDataFrame([(99, 0)], "doc_id long, n long")
    assert commit_batch_to_hudi(df, 3, table, table_name="t")
    drain()
    got = sorted((r.doc_id, r._commit_time)
                 for r in spark.read.parquet(out_dir).collect())
    assert len(got) == 10 and (99, "20300101000003") in got
    # exclusive startingInstant
    out2 = str(tmp_path / "out2")
    st2 = (spark.readStream.format("hudi_incremental")
           .option("path", table)
           .option("startingInstant", "20300101000001").load())
    q = (st2.writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out2))
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert sorted(r.doc_id for r in spark.read.parquet(out2).collect()) \
        == [20, 21, 22, 99]


# ---------------------------------------------------------------------------
# r14: MERGE INTO (sources/merge.py)
# ---------------------------------------------------------------------------


def test_merge_into_delta_update_insert_and_untouched_files(
    spark, tmp_path
):
    from hive_udf_spark.sources.delta import read_delta
    from hive_udf_spark.sources.merge import merge_into_delta

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 3)  # keys 0-4, 10-14, 20-24
    before_files = set(read_delta(spark, table).inputFiles())
    src = spark.createDataFrame(
        [(11, 111), (13, 113), (99, 999)], "doc_id long, n long"
    )
    stats = merge_into_delta(spark, table, src, on="doc_id")
    assert stats == {"updated": 2, "inserted": 1, "files_rewritten": 1}
    got = dict((r.doc_id, r.n) for r in read_delta(spark, table).collect())
    assert got[11] == 111 and got[13] == 113 and got[99] == 999
    assert got[10] == 0 and got[12] == 2  # carried neighbors
    assert len(got) == 16
    after_files = set(read_delta(spark, table).inputFiles())
    # the two files with no matched key were NOT rewritten
    assert len(before_files & after_files) == 2


def test_merge_into_delta_respects_deletion_vectors(spark, tmp_path):
    """A DV-dead row in a touched file must NOT resurrect through the
    merge rewrite (the rewrite applies the DV, the replacement file
    carries none)."""
    from hive_udf_spark.sources.delta import delta_snapshot, read_delta
    from hive_udf_spark.sources.merge import merge_into_delta

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 1)  # keys 0-4
    assert delete_from_delta(spark, table, "doc_id = 2") == 1
    src = spark.createDataFrame([(4, 44)], "doc_id long, n long")
    stats = merge_into_delta(spark, table, src, on="doc_id")
    assert stats["updated"] == 1 and stats["files_rewritten"] == 1
    got = sorted((r.doc_id, r.n) for r in read_delta(spark, table).collect())
    assert got == [(0, 0), (1, 1), (3, 3), (4, 44)]  # 2 stays dead
    # the rewritten file carries no DV
    snap = delta_snapshot(table)
    assert not any(a.get("deletionVector") for a in snap.files.values())


def test_merge_into_delta_insert_only(spark, tmp_path):
    from hive_udf_spark.sources.delta import read_delta
    from hive_udf_spark.sources.merge import merge_into_delta

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 1)
    src = spark.createDataFrame([(100, 1), (101, 2)], "doc_id long, n long")
    stats = merge_into_delta(spark, table, src, on="doc_id")
    assert stats == {"updated": 0, "inserted": 2, "files_rewritten": 0}
    assert read_delta(spark, table).count() == 7


def test_merge_into_delta_refusals(spark, tmp_path):
    from hive_udf_spark.sources.merge import merge_into_delta

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 1)
    dup = spark.createDataFrame([(1, 9), (1, 8)], "doc_id long, n long")
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into_delta(spark, table, dup, on="doc_id")
    wrong = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="source columns"):
        merge_into_delta(spark, table, wrong, on="doc_id")
    with pytest.raises(ValueError, match="not a table column"):
        merge_into_delta(
            spark, table,
            spark.createDataFrame([(1, 2)], "doc_id long, n long"),
            on="missing",
        )


def test_merge_then_changes_reports_file_level_cdf(spark, tmp_path):
    """read_delta_changes surfaces a merge as whole-file delete+insert
    of the touched file — the honest CDF of copy-on-write."""
    from hive_udf_spark.sources.merge import merge_into_delta

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 2)
    src = spark.createDataFrame([(1, 111)], "doc_id long, n long")
    merge_into_delta(spark, table, src, on="doc_id")
    ch = read_delta_changes(spark, table, 2, 2)
    got = sorted((r.doc_id, r.n, r._change_type) for r in ch.collect())
    # file 0 (keys 0-4) deleted wholesale and re-inserted with 1 -> 111
    assert (1, 1, "delete") in got and (1, 111, "insert") in got
    assert (0, 0, "delete") in got and (0, 0, "insert") in got
    assert not any(d >= 10 for d, _, _ in got)  # file 1 untouched


def test_iceberg_type_ddl_context_free():
    """The data-source planner workers have no SparkSession; the DDL
    builder must cover the vendored type surface without one."""
    from hive_udf_spark.sources.changes import _iceberg_type_ddl

    assert _iceberg_type_ddl("long") == "long"
    assert _iceberg_type_ddl("decimal(10, 2)") == "decimal(10, 2)"
    assert _iceberg_type_ddl({
        "type": "struct",
        "fields": [{"name": "a", "type": "int"},
                   {"name": "b", "type": {"type": "list",
                                          "element": "string"}}],
    }) == "struct<a:int,b:array<string>>"
    assert _iceberg_type_ddl({
        "type": "map", "key": "string", "value": "double",
    }) == "map<string,double>"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not vendored"):
        _iceberg_type_ddl("variant")


def test_delete_from_delta_already_dead_matches_publish_nothing(
    spark, tmp_path
):
    """A predicate whose matches are all already DV-dead must not
    publish a commit (no content changed) nor leave orphan DV files
    behind."""
    import glob

    from hive_udf_spark.sources.delta import _commit_versions, _log_dir

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 1)
    assert delete_from_delta(spark, table, "doc_id = 2") == 1
    versions = _commit_versions(_log_dir(table))
    dvs = set(glob.glob(os.path.join(table, "deletion_vector_*.bin")))
    assert delete_from_delta(spark, table, "doc_id = 2") == 0
    assert _commit_versions(_log_dir(table)) == versions  # no new commit
    assert set(glob.glob(
        os.path.join(table, "deletion_vector_*.bin")
    )) == dvs  # no orphan DV files


def test_crashed_delete_and_merge_orphans_are_vacuumable(
    spark, tmp_path, monkeypatch
):
    """A crash between the executor-side file writes and the commit
    publish leaves only unreferenced orphans, and vacuum reclaims
    them — for BOTH the DV delete and the merge."""
    import glob

    import hive_udf_spark.sources.txn as txn
    from hive_udf_spark.sources.delta import read_delta
    from hive_udf_spark.sources.maintenance import vacuum_delta_table
    from hive_udf_spark.sources.merge import merge_into_delta

    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 1)
    before = sorted(tuple(r) for r in read_delta(spark, table).collect())
    real_link = os.link

    def crash_link(src, dst, *a, **kw):
        raise OSError("injected crash before the atomic publish")

    monkeypatch.setattr(txn.os, "link", crash_link)
    with pytest.raises(OSError, match="injected"):
        delete_from_delta(spark, table, "doc_id = 1")
    src = spark.createDataFrame([(3, 33)], "doc_id long, n long")
    with pytest.raises(OSError, match="injected"):
        merge_into_delta(spark, table, src, on="doc_id")
    monkeypatch.setattr(txn.os, "link", real_link)
    # the table is untouched; orphans exist; vacuum reclaims them
    assert sorted(
        tuple(r) for r in read_delta(spark, table).collect()
    ) == before
    assert glob.glob(os.path.join(table, "deletion_vector_*.bin"))
    assert glob.glob(os.path.join(table, "merge-*.parquet"))
    deleted = vacuum_delta_table(table, min_age_seconds=0)
    assert any("deletion_vector" in p for p in deleted)
    assert any(p.startswith("merge-") for p in deleted)
    assert sorted(
        tuple(r) for r in read_delta(spark, table).collect()
    ) == before


def test_merge_into_iceberg_layering_and_zero_rewrite(spark, tmp_path):
    from hive_udf_spark.sources.iceberg import read_iceberg
    from hive_udf_spark.sources.merge import merge_into_iceberg
    from hive_udf_spark.streaming.iceberg_sink import (
        commit_batch_to_iceberg,
    )

    table = str(tmp_path / "t")
    for b in range(2):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(4)], "doc_id long, n long"
        )
        assert commit_batch_to_iceberg(df, b, table, app_id="a")
    before = set(read_iceberg(spark, table).inputFiles())
    src = spark.createDataFrame(
        [(1, 111), (11, 1111), (99, 999)], "doc_id long, n long"
    )
    assert merge_into_iceberg(spark, table, src, on="doc_id") \
        == {"updated": 2, "inserted": 1}
    got = dict((r.doc_id, r.n)
               for r in read_iceberg(spark, table).collect())
    assert got[1] == 111 and got[11] == 1111 and got[99] == 999
    assert got[0] == 0 and len(got) == 9
    assert before <= set(read_iceberg(spark, table).inputFiles())
    # a second merge layers over the first (sequence gating)
    src2 = spark.createDataFrame([(99, 9999)], "doc_id long, n long")
    assert merge_into_iceberg(spark, table, src2, on="doc_id") \
        == {"updated": 1, "inserted": 0}
    got = dict((r.doc_id, r.n)
               for r in read_iceberg(spark, table).collect())
    assert got[99] == 9999 and len(got) == 9
    # compaction folds the delete files away, result unchanged
    from hive_udf_spark.sources.maintenance import compact_iceberg_table

    assert compact_iceberg_table(spark, table, target_files=1)
    assert dict((r.doc_id, r.n)
                for r in read_iceberg(spark, table).collect()) == got


def test_merge_into_iceberg_refusals(spark, tmp_path):
    from hive_udf_spark.sources.merge import merge_into_iceberg
    from hive_udf_spark.streaming.iceberg_sink import (
        commit_batch_to_iceberg,
    )

    table = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 0)], "doc_id long, n long")
    assert commit_batch_to_iceberg(df, 0, table, app_id="a")
    dup = spark.createDataFrame([(1, 9), (1, 8)], "doc_id long, n long")
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into_iceberg(spark, table, dup, on="doc_id")
    with pytest.raises(ValueError, match="not a table column"):
        merge_into_iceberg(spark, table, df, on="missing")


def test_merge_into_hudi_log_blocks_and_layering(spark, tmp_path):
    from hive_udf_spark.sources.hudi import read_hudi
    from hive_udf_spark.sources.merge import merge_into_hudi
    from hive_udf_spark.streaming.hudi_sink import commit_batch_to_hudi

    table = str(tmp_path / "t")
    for b in range(2):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(4)], "doc_id long, n long"
        )
        assert commit_batch_to_hudi(df, b, table, table_name="a",
                                    record_key="doc_id")
    src = spark.createDataFrame(
        [(1, 111), (11, 1111), (99, 999)], "doc_id long, n long"
    )
    assert merge_into_hudi(spark, table, src) \
        == {"updated": 2, "inserted": 1}
    got = dict((r.doc_id, r.n) for r in read_hudi(spark, table).collect())
    assert got[1] == 111 and got[11] == 1111 and got[99] == 999
    assert got[0] == 0 and len(got) == 9
    # SAME-GROUP sequential merges must not clobber each other's logs
    # (the r14 self-review bug: a fixed .log.1 name overwrote)
    assert merge_into_hudi(spark, table, spark.createDataFrame(
        [(0, 100)], "doc_id long, n long")) == {"updated": 1,
                                                "inserted": 0}
    assert merge_into_hudi(spark, table, spark.createDataFrame(
        [(2, 200)], "doc_id long, n long")) == {"updated": 1,
                                                "inserted": 0}
    got = dict((r.doc_id, r.n) for r in read_hudi(spark, table).collect())
    assert got[0] == 100 and got[2] == 200 and got[1] == 111
    # clustering compacts the logs away, result unchanged
    from hive_udf_spark.sources.maintenance import cluster_hudi_table

    assert cluster_hudi_table(spark, table, target_files=1)
    assert dict((r.doc_id, r.n)
                for r in read_hudi(spark, table).collect()) == got


def test_merge_into_hudi_refusals(spark, tmp_path):
    from hive_udf_spark.sources.merge import merge_into_hudi
    from hive_udf_spark.streaming.hudi_sink import commit_batch_to_hudi

    table = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 0)], "doc_id long, n long")
    assert commit_batch_to_hudi(df, 0, table, table_name="a",
                                record_key="doc_id")
    dup = spark.createDataFrame([(1, 9), (1, 8)], "doc_id long, n long")
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into_hudi(spark, table, dup)
    wrong = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="source columns"):
        merge_into_hudi(spark, table, wrong)


def test_merge_into_hudi_refuses_log_only_keys(spark, tmp_path):
    """A key INSERTED through MOR log blocks (the streaming upsert
    sink's insert path) is invisible to base-file routing — merging
    such a table must refuse, or the key would duplicate (r14
    self-review pass 2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_udf_spark.sources.hudi import write_hudi_table
    from hive_udf_spark.sources.merge import merge_into_hudi

    table = str(tmp_path / "t")
    base = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "n": pa.array([10], pa.int64()),
    }), base)
    write_hudi_table(table, [
        {"writes": {"fg-0": base}},
        # key 2 exists ONLY in the log (an insert-through-log)
        {"log_writes": {"fg-0": [{"doc_id": 2, "n": 20}]}},
    ], [("doc_id", "bigint"), ("n", "bigint")], record_key="doc_id")
    src = spark.createDataFrame([(2, 99)], "doc_id long, n long")
    with pytest.raises(ValueError, match="LOG-ONLY keys"):
        merge_into_hudi(spark, table, src)
    # after clustering the merge works
    from hive_udf_spark.sources.hudi import read_hudi
    from hive_udf_spark.sources.maintenance import cluster_hudi_table

    assert cluster_hudi_table(spark, table, target_files=1)
    assert merge_into_hudi(spark, table, src) == {"updated": 1,
                                                  "inserted": 0}
    got = sorted((r.doc_id, r.n) for r in read_hudi(spark, table).collect())
    assert got == [(1, 10), (2, 99)]


def test_delta_changes_two_dv_swaps_same_file_in_one_range(
    spark, tmp_path
):
    """Two DV deletes touching the SAME file inside one change range
    must each report exactly their own freshly-dead rows — a shared
    path-keyed filter would let the later bitmap leak into the earlier
    version's piece (r14 self-review pass 2)."""
    table = str(tmp_path / "t")
    _ingest_delta(spark, table, 1)  # keys 0-4, one file
    assert delete_from_delta(spark, table, "doc_id = 1") == 1  # v1
    assert delete_from_delta(spark, table, "doc_id = 3") == 1  # v2
    ch = read_delta_changes(spark, table, 1, 2)
    got = sorted((r.doc_id, r._change_type, r._commit_version)
                 for r in ch.collect())
    assert got == [(1, "delete", 1), (3, "delete", 2)], got
