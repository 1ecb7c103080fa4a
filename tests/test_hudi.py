"""Vendored Apache Hudi COW source (sources/hudi.py, r11): file-slice
resolution (rewrites supersede), replacecommit retirement, in-flight
invisibility, time travel, meta-column stripping, MOR refusal, schema
pinning, corrupt-timeline errors."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hive_udf_spark.sources.hudi import (
    META_COLUMNS,
    hudi_live_files,
    hudi_timeline,
    read_hudi,
    write_hudi_table,
)

FIELDS = [("doc_id", "bigint"), ("lang", "string"), ("n", "bigint")]


def _src(tmp, name: str, rows: list[tuple], meta: bool = True) -> str:
    cols = {
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "n": pa.array([r[2] for r in rows], pa.int64()),
    }
    if meta:
        cols = {
            "_hoodie_commit_time": pa.array(["t"] * len(rows)),
            "_hoodie_commit_seqno": pa.array(["s"] * len(rows)),
            "_hoodie_record_key": pa.array([str(r[0]) for r in rows]),
            "_hoodie_partition_path": pa.array([""] * len(rows)),
            "_hoodie_file_name": pa.array([name] * len(rows)),
            **cols,
        }
    path = str(tmp / f"src_{name}.parquet")
    pq.write_table(pa.table(cols), path)
    return path


def _basic(tmp, table: str) -> None:
    """instant 1: file groups a + b; instant 2: rewrite b (same fileId)."""
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp, "a", [(1, "en", 10), (2, "de", 20)]),
                    "fg-b": _src(tmp, "b", [(3, "fr", 30)])}},
        {"writes": {"fg-b": _src(tmp, "b2", [(3, "fr", 31), (4, "es", 40)])}},
    ], FIELDS)


def test_file_slice_rewrite_supersedes(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 31), (4, "es", 40)]


def test_meta_columns_stripped_by_scan_schema(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    df = read_hudi(spark, table)
    assert df.columns == ["doc_id", "lang", "n"]
    # the pin is also the projection: the scan's ReadSchema must not
    # carry the meta columns at all
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_hoodie_commit_time" not in plan
    withmeta = read_hudi(spark, table, include_meta=True)
    assert withmeta.columns[:5] == list(META_COLUMNS)
    assert withmeta.filter("_hoodie_record_key = '3'").count() == 1


def test_time_travel_and_unknown_instant(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    instants = [t for t, _, _ in hudi_timeline(table)]
    at_first = read_hudi(spark, table, as_of=instants[0])
    got = sorted(tuple(r) for r in at_first.collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]
    with pytest.raises(ValueError, match="not in the timeline"):
        read_hudi(spark, table, as_of="19990101000000")


def test_inflight_instants_invisible(spark, tmp_path):
    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)])}},
        {"writes": {"fg-x": _src(tmp_path, "x", [(9, "xx", 99)])},
         "inflight": True},
    ], FIELDS)
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10)]
    # the in-flight base file IS on disk, proving invisibility is
    # timeline-driven, not listing-driven
    assert any("fg-x" in f for f in os.listdir(table))


def test_replacecommit_retires_file_groups(spark, tmp_path):
    table = str(tmp_path / "t")
    write_hudi_table(table, [
        {"writes": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)]),
                    "fg-b": _src(tmp_path, "b", [(2, "de", 20)])}},
        {"action": "replacecommit", "replaces": ["fg-a", "fg-b"],
         "writes": {"fg-c": _src(tmp_path, "c", [(1, "en", 10), (2, "de", 20)])}},
    ], FIELDS)
    files, _ = hudi_live_files(table)
    assert len(files) == 1 and "fg-c" in files[0]
    assert read_hudi(spark, table).count() == 2


def test_merge_on_read_refuses(tmp_path):
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    props = os.path.join(table, ".hoodie", "hoodie.properties")
    body = open(props).read().replace("COPY_ON_WRITE", "MERGE_ON_READ")
    open(props, "w").write(body)
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        hudi_live_files(table)


def test_corrupt_timeline_errors(tmp_path):
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    hoodie = os.path.join(table, ".hoodie")
    commits = sorted(p for p in os.listdir(hoodie) if p.endswith(".commit"))
    with open(os.path.join(hoodie, commits[0]), "w") as fh:
        fh.write("{not json")
    with pytest.raises(ValueError, match="malformed commit metadata"):
        hudi_timeline(table)
    os.remove(os.path.join(hoodie, commits[0]))
    os.remove(os.path.join(hoodie, commits[1]))
    with pytest.raises(ValueError, match="no completed commits"):
        hudi_timeline(table)


def test_missing_properties_and_missing_base_file(tmp_path):
    with pytest.raises(ValueError, match="hoodie.properties"):
        hudi_live_files(str(tmp_path / "nope"))
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    files, _ = hudi_live_files(table)
    os.remove(files[0])
    with pytest.raises(ValueError, match="missing on disk"):
        hudi_live_files(table)


def test_schema_pinned_from_avro_extra_metadata(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    df = read_hudi(spark, table)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "bigint"
    ]
    # a commit whose schema the reader cannot map must refuse loudly
    hoodie = os.path.join(table, ".hoodie")
    commits = sorted(p for p in os.listdir(hoodie) if p.endswith(".commit"))
    meta = json.load(open(os.path.join(hoodie, commits[-1])))
    meta["extraMetadata"]["schema"] = json.dumps(
        {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": {"type": "array", "items": "long"}}]}
    )
    json.dump(meta, open(os.path.join(hoodie, commits[-1]), "w"))
    with pytest.raises(ValueError, match="not vendored"):
        read_hudi(spark, table)


def test_hudi_1x_timeline_filenames(spark, tmp_path):
    """Hudi 1.x names completed instants <begin>_<completion>.<action>;
    the begin instant orders the timeline."""
    import shutil

    table = str(tmp_path / "t")
    _basic(tmp_path, table)
    hoodie = os.path.join(table, ".hoodie")
    tl = os.path.join(hoodie, "timeline")
    os.makedirs(tl)
    for f in sorted(os.listdir(hoodie)):
        if f.endswith(".commit"):
            begin = f.split(".")[0]
            shutil.move(os.path.join(hoodie, f),
                        os.path.join(tl, f"{begin}_{begin}9.commit"))
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 31), (4, "es", 40)]


def test_partitioned_table_and_pruning(spark, tmp_path):
    """File groups live inside partitions: the slice key is
    (partition, fileId) — the same fileId in two partitions must not
    collide — and `partitions=` prunes the file set driver-side."""
    write_hudi_table(str(tmp_path / "t"), [
        {"partition_writes": {
            "day=7": {"fg-a": _src(tmp_path, "a", [(1, "en", 10)])},
            "day=8": {"fg-a": _src(tmp_path, "b", [(2, "de", 20)])},
        }},
        {"partition_writes": {
            "day=8": {"fg-a": _src(tmp_path, "b2", [(2, "de", 22)])},
        }},
    ], FIELDS)
    table = str(tmp_path / "t")
    got = sorted(tuple(r) for r in read_hudi(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 22)]  # day=8 rewrite applied
    pruned = read_hudi(spark, table, partitions=["day=7"])
    assert len(pruned.inputFiles()) == 1 and "day=7" in pruned.inputFiles()[0]
    assert [tuple(r) for r in pruned.collect()] == [(1, "en", 10)]
