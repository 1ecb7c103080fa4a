"""Put-if-absent commit publish (sources/txn.py, r14 — the r13
verdict's task 2): every transactional publish in the lakehouse sinks
and maintenance ops goes through ``publish_if_absent``, so a
same-version concurrent commit CONFLICTS for exactly one writer
instead of silently clobbering the other.  The racing-writers tests
inject the competitor INSIDE the check→publish window (monkeypatched
``os.link``) and assert the protocol contract: exactly one commit
wins, the loser raises, the table stays readable, and the loser's
documented recovery (re-check the log) works."""

from __future__ import annotations

import json
import os

import pytest

from hive_udf_spark.sources.txn import CommitConflictError, publish_if_absent


# ---------------------------------------------------------------------------
# helper semantics
# ---------------------------------------------------------------------------


def test_publish_if_absent_wins_and_cleans_tmp(tmp_path):
    tmp = str(tmp_path / "c.tmp")
    dst = str(tmp_path / "c.json")
    with open(tmp, "w") as fh:
        fh.write("winner")
    publish_if_absent(tmp, dst)
    assert open(dst).read() == "winner"
    assert not os.path.exists(tmp)


def test_publish_if_absent_loser_raises_winner_intact(tmp_path):
    dst = str(tmp_path / "c.json")
    with open(dst, "w") as fh:
        fh.write("winner")
    tmp = str(tmp_path / "c.tmp")
    with open(tmp, "w") as fh:
        fh.write("loser")
    with pytest.raises(CommitConflictError):
        publish_if_absent(tmp, dst)
    # the winner's content survives and the loser's temp is reclaimed
    assert open(dst).read() == "winner"
    assert not os.path.exists(tmp)


def test_commit_conflict_is_a_file_exists_error(tmp_path):
    # callers that catch FileExistsError keep working
    assert issubclass(CommitConflictError, FileExistsError)


# ---------------------------------------------------------------------------
# racing writers, per protocol
# ---------------------------------------------------------------------------


def _inject_race(monkeypatch, commit_path: str):
    """Make the NEXT publish of ``commit_path`` lose a race: the
    competitor's (byte-identical, independently captured) commit lands
    between the caller's conflict check and its ``os.link``."""
    import hive_udf_spark.sources.txn as txn

    with open(commit_path) as fh:
        competitor = fh.read()
    os.remove(commit_path)
    real_link = os.link

    def racing_link(src, dst, *a, **kw):
        if os.path.abspath(dst) == os.path.abspath(commit_path) \
                and not os.path.exists(dst):
            with open(dst + ".competitor", "w") as fh:
                fh.write(competitor)
            real_link(dst + ".competitor", dst)
            os.unlink(dst + ".competitor")
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(txn.os, "link", racing_link)
    return competitor


def test_delta_sink_same_version_race_conflicts(spark, tmp_path, monkeypatch):
    from hive_udf_spark.sources.delta import read_delta
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta

    table = str(tmp_path / "t")
    for b in range(2):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(3)], "doc_id long, n long"
        )
        assert commit_batch_to_delta(df, b, table, app_id="app")
    before = sorted(tuple(r) for r in read_delta(spark, table).collect())
    commit = os.path.join(table, "_delta_log", f"{1:020d}.json")
    competitor = _inject_race(monkeypatch, commit)
    df1 = spark.createDataFrame(
        [(10 + i, i) for i in range(3)], "doc_id long, n long"
    )
    with pytest.raises(CommitConflictError):
        commit_batch_to_delta(df1, 1, table, app_id="app")
    # exactly one commit won, byte-for-byte the competitor's
    assert open(commit).read() == competitor
    assert sorted(
        tuple(r) for r in read_delta(spark, table).collect()
    ) == before
    # documented recovery: re-check the log — the winner carries this
    # app's txn marker, so the retry recognizes it and no-ops
    assert commit_batch_to_delta(df1, 1, table, app_id="app") is False
    # and the stream moves on
    df2 = spark.createDataFrame([(99, 9)], "doc_id long, n long")
    assert commit_batch_to_delta(df2, 2, table, app_id="app")
    assert (99, 9) in {
        tuple(r) for r in read_delta(spark, table).collect()
    }


def test_iceberg_sink_same_version_race_conflicts(
    spark, tmp_path, monkeypatch
):
    from hive_udf_spark.sources.iceberg import read_iceberg
    from hive_udf_spark.streaming.iceberg_sink import commit_batch_to_iceberg

    table = str(tmp_path / "t")
    for b in range(2):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(3)], "doc_id long, n long"
        )
        assert commit_batch_to_iceberg(df, b, table, app_id="app")
    before = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    meta = os.path.join(table, "metadata", "v2.metadata.json")
    competitor = _inject_race(monkeypatch, meta)
    df1 = spark.createDataFrame(
        [(10 + i, i) for i in range(3)], "doc_id long, n long"
    )
    with pytest.raises(CommitConflictError):
        commit_batch_to_iceberg(df1, 1, table, app_id="app")
    assert open(meta).read() == competitor
    assert sorted(
        tuple(r) for r in read_iceberg(spark, table).collect()
    ) == before
    assert commit_batch_to_iceberg(df1, 1, table, app_id="app") is False


def test_hudi_sink_same_instant_race_conflicts(spark, tmp_path, monkeypatch):
    from hive_udf_spark.sources.hudi import read_hudi
    from hive_udf_spark.streaming.hudi_sink import commit_batch_to_hudi

    table = str(tmp_path / "t")
    for b in range(2):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(3)], "doc_id long, n long"
        )
        assert commit_batch_to_hudi(df, b, table, table_name="app")
    before = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    commits = [
        n for n in os.listdir(os.path.join(table, ".hoodie"))
        if n.endswith(".commit")
    ]
    commit = os.path.join(table, ".hoodie", sorted(commits)[-1])
    competitor = _inject_race(monkeypatch, commit)
    df1 = spark.createDataFrame(
        [(10 + i, i) for i in range(3)], "doc_id long, n long"
    )
    with pytest.raises(CommitConflictError):
        commit_batch_to_hudi(df1, 1, table, table_name="app")
    assert open(commit).read() == competitor
    assert sorted(
        tuple(r) for r in read_hudi(spark, table).collect()
    ) == before
    assert commit_batch_to_hudi(df1, 1, table, table_name="app") is False


def test_delta_compaction_same_version_race_conflicts(
    spark, tmp_path, monkeypatch
):
    """Maintenance publishes race too: two OPTIMIZE runs targeting one
    version — the loser raises, the winner's commit stands, and its
    referenced files are all on disk (the table stays readable)."""
    from hive_udf_spark.sources.delta import read_delta
    from hive_udf_spark.sources.maintenance import compact_delta_table
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta

    table = str(tmp_path / "t")
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(3)], "doc_id long, n long"
        )
        assert commit_batch_to_delta(df, b, table, app_id="app")
    before = sorted(tuple(r) for r in read_delta(spark, table).collect())
    assert compact_delta_table(spark, table, target_files=1)
    commit = os.path.join(table, "_delta_log", f"{3:020d}.json")
    competitor = _inject_race(monkeypatch, commit)
    with pytest.raises(CommitConflictError):
        compact_delta_table(spark, table, target_files=1)
    assert open(commit).read() == competitor
    after = read_delta(spark, table)
    assert sorted(tuple(r) for r in after.collect()) == before
    for f in after.inputFiles():
        assert os.path.exists(f.replace("file:", ""))


def test_iceberg_expire_same_version_race_conflicts(
    spark, tmp_path, monkeypatch
):
    from hive_udf_spark.sources.iceberg import read_iceberg
    from hive_udf_spark.sources.maintenance import expire_iceberg_snapshots
    from hive_udf_spark.streaming.iceberg_sink import commit_batch_to_iceberg

    table = str(tmp_path / "t")
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, i) for i in range(3)], "doc_id long, n long"
        )
        assert commit_batch_to_iceberg(df, b, table, app_id="app")
    before = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    # the competitor is a concurrent expire landing the same trimmed
    # metadata version inside the window (expire publishes metadata
    # BEFORE deleting any file, so the loser raises with nothing
    # deleted and the winner's snapshot is fully on disk)
    meta = os.path.join(table, "metadata", "v4.metadata.json")
    import hive_udf_spark.sources.txn as txn

    real_link = os.link

    def racing_link(src, dst, *a, **kw):
        if os.path.abspath(dst) == os.path.abspath(meta) \
                and not os.path.exists(dst):
            with open(src) as fh:
                body = fh.read()
            with open(dst + ".competitor", "w") as fh:
                fh.write(body)
            real_link(dst + ".competitor", dst)
            os.unlink(dst + ".competitor")
        return real_link(src, dst, *a, **kw)

    monkeypatch.setattr(txn.os, "link", racing_link)
    with pytest.raises(CommitConflictError):
        expire_iceberg_snapshots(table, keep_last=1)
    # the winner's trimmed metadata stands; the loser deleted NOTHING
    # (publish precedes deletes), so the table reads cleanly
    assert os.path.exists(meta)
    assert sorted(
        tuple(r) for r in read_iceberg(spark, table).collect()
    ) == before
    # recovery: the next expire run anchors on the winner's metadata
    monkeypatch.setattr(txn.os, "link", real_link)
    expire_iceberg_snapshots(table, keep_last=1)
    assert sorted(
        tuple(r) for r in read_iceberg(spark, table).collect()
    ) == before


def test_publish_if_absent_thread_race_exactly_one_winner(tmp_path):
    """64 threads racing one destination: exactly one wins, everyone
    else gets CommitConflictError, the winner's content is intact —
    the filesystem adjudicates, no check-then-act window."""
    import threading

    dst = str(tmp_path / "c.json")
    results = []

    def attempt(i):
        tmp = str(tmp_path / f"c.tmp.{i}")
        with open(tmp, "w") as fh:
            fh.write(f"writer-{i}")
        try:
            publish_if_absent(tmp, dst)
            results.append(("win", i))
        except CommitConflictError:
            results.append(("lose", i))

    threads = [threading.Thread(target=attempt, args=(i,))
               for i in range(64)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wins = [i for r, i in results if r == "win"]
    assert len(wins) == 1 and len(results) == 64
    assert open(dst).read() == f"writer-{wins[0]}"
    # every loser's temp was reclaimed
    import glob

    assert glob.glob(str(tmp_path / "c.tmp.*")) == []
