"""Vendored Iceberg source (sources/iceberg.py, r11): metadata walk,
Avro manifest decode (vendored codec incl. maps), snapshot layering,
whole-file deletes, time travel, v2 delete refusal."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hive_udf_spark.sources.iceberg import (
    iceberg_live_files,
    read_iceberg,
    write_iceberg_table,
)

FIELDS = [
    {"id": 1, "name": "doc_id", "required": False, "type": "long"},
    {"id": 2, "name": "lang", "required": False, "type": "string"},
    {"id": 3, "name": "n", "required": False, "type": "long"},
]


def _write_file(table: str, name: str, rows: list[tuple]) -> None:
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "n": pa.array([r[2] for r in rows], pa.int64()),
    })
    pq.write_table(t, os.path.join(table, name))


def _basic_table(table: str) -> None:
    _write_file(table, "data/a.parquet", [(1, "en", 10), (2, "de", 20)])
    _write_file(table, "data/b.parquet", [(3, "fr", 30)])
    _write_file(table, "data/c.parquet", [(3, "fr", 33), (4, "es", 40)])
    write_iceberg_table(table, [
        {"added": ["data/a.parquet", "data/b.parquet"]},
        {"deleted": ["data/b.parquet"], "added": ["data/c.parquet"]},
    ], FIELDS)


def test_live_set_after_delete(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic_table(table)
    got = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 33), (4, "es", 40)]


def test_time_travel_by_snapshot(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic_table(table)
    v0 = sorted(tuple(r) for r in
                read_iceberg(spark, table, snapshot_id=1000).collect())
    assert v0 == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]
    with pytest.raises(ValueError, match="not in the log"):
        read_iceberg(spark, table, snapshot_id=9999)


def test_schema_pinned_from_metadata(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic_table(table)
    df = read_iceberg(spark, table)
    assert df.columns == ["doc_id", "lang", "n"]
    assert dict(df.dtypes) == {"doc_id": "bigint", "lang": "string",
                               "n": "bigint"}


def test_data_files_inside_delete_manifest_refused(tmp_path):
    table = str(tmp_path / "t")
    _basic_table(table)
    # flip the manifest-list entry's content to 1 (DELETE manifest):
    # its entries are data files (content 0), an inconsistent table
    from hive_udf_spark.operators.avrocodec import decode_ocf, encode_ocf
    from hive_udf_spark.sources.iceberg import _MANIFEST_FILE_SCHEMA

    lpath = os.path.join(table, "metadata", "snap-1001-manifest-list.avro")
    _, rows = decode_ocf(open(lpath, "rb").read())
    rows[0]["content"] = 1
    open(lpath, "wb").write(encode_ocf(_MANIFEST_FILE_SCHEMA, rows))
    with pytest.raises(ValueError, match="data file in a delete manifest"):
        iceberg_live_files(table)


def test_missing_or_corrupt_metadata_errors(tmp_path):
    with pytest.raises(ValueError, match="no metadata json"):
        iceberg_live_files(str(tmp_path / "missing"))
    table = str(tmp_path / "t")
    _basic_table(table)
    hint = os.path.join(table, "metadata", "version-hint.text")
    v = open(hint).read().strip()
    mpath = os.path.join(table, "metadata", f"v{v}.metadata.json")
    open(mpath, "w").write("{not json")
    with pytest.raises(ValueError, match="unreadable"):
        iceberg_live_files(table)


def test_manifest_maps_decode_through_vendored_codec(tmp_path):
    """The manifests the twin writes carry a real Avro MAP (r11 codec
    extension) — prove it survives the round trip."""
    table = str(tmp_path / "t")
    _basic_table(table)
    from hive_udf_spark.operators.avrocodec import decode_ocf

    mpath = os.path.join(table, "metadata", "manifest-1000.avro")
    _, entries = decode_ocf(open(mpath, "rb").read())
    sizes = entries[0]["data_file"]["column_sizes"]
    assert isinstance(sizes, dict) and "1" in sizes and sizes["1"] > 0


def test_position_deletes_apply_by_row_index(spark, tmp_path):
    """v2 position deletes (r11): parquet of (file_path, pos) anti-joins
    against the scan's _metadata row positions — rows 0 and 2 of a
    3-row file disappear, row 1 survives."""
    table = str(tmp_path / "t")
    _write_file(table, "data/a.parquet",
                [(1, "en", 10), (2, "de", 20), (3, "fr", 30)])
    write_iceberg_table(table, [
        {"added": ["data/a.parquet"]},
        {"pos_deletes": {"data/a.parquet": [0, 2]}},
    ], FIELDS)
    got = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    assert got == [(2, "de", 20)]
    # the raw file listing refuses: files alone would over-read
    with pytest.raises(ValueError, match="row-level deletes"):
        iceberg_live_files(table)
    # time travel to before the delete still sees all rows
    assert read_iceberg(spark, table, snapshot_id=1000).count() == 3


def test_position_deletes_dead_paths_are_noops(spark, tmp_path):
    """A position delete aimed at a file that later left the table must
    not touch the replacement file's rows (paths are the join key)."""
    table = str(tmp_path / "t")
    _write_file(table, "data/a.parquet", [(1, "en", 10), (2, "de", 20)])
    _write_file(table, "data/a2.parquet", [(1, "en", 11), (2, "de", 22)])
    write_iceberg_table(table, [
        {"added": ["data/a.parquet"]},
        {"pos_deletes": {"data/a.parquet": [0]}},
        {"deleted": ["data/a.parquet"], "added": ["data/a2.parquet"]},
    ], FIELDS)
    got = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    assert got == [(1, "en", 11), (2, "de", 22)]


def test_equality_deletes_gated_on_sequence_number(spark, tmp_path):
    """v2 equality deletes (r11): a delete row kills MATCHING rows from
    data files with a STRICTLY LOWER sequence number — the same key
    re-inserted in a later snapshot survives (the upsert pattern)."""
    table = str(tmp_path / "t")
    _write_file(table, "data/a.parquet", [(1, "en", 10), (2, "de", 20)])
    _write_file(table, "data/b.parquet", [(1, "en", 99)])  # re-insert
    write_iceberg_table(table, [
        {"added": ["data/a.parquet"]},
        {"eq_deletes": {"ids": [1], "rows": [{"doc_id": 1}]},
         "added": ["data/b.parquet"]},
    ], FIELDS)
    got = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    # old (1, en, 10) deleted; same-snapshot re-insert (1, en, 99) lives
    assert got == [(1, "en", 99), (2, "de", 20)]


def test_equality_delete_unknown_field_refuses(spark, tmp_path):
    table = str(tmp_path / "t")
    _write_file(table, "data/a.parquet", [(1, "en", 10)])
    write_iceberg_table(table, [
        {"added": ["data/a.parquet"],
         "eq_deletes": {"ids": [1], "rows": [{"doc_id": 7}]}},
    ], FIELDS)
    # point the equality ids at a nonexistent field id
    from hive_udf_spark.operators.avrocodec import decode_ocf, encode_ocf
    from hive_udf_spark.sources.iceberg import _MANIFEST_ENTRY_SCHEMA

    dm = os.path.join(table, "metadata", "delete-manifest-1000.avro")
    _, entries = decode_ocf(open(dm, "rb").read())
    entries[0]["data_file"]["equality_ids"] = [99]
    open(dm, "wb").write(encode_ocf(_MANIFEST_ENTRY_SCHEMA, entries))
    with pytest.raises(ValueError, match="unknown field"):
        read_iceberg(spark, table).collect()


def test_delete_plan_is_broadcast_anti_join(spark, tmp_path):
    """Scale shape: applying deletes must not shuffle the data scan —
    both anti-joins broadcast the (small) delete side."""
    table = str(tmp_path / "t")
    _write_file(table, "data/a.parquet", [(1, "en", 10), (2, "de", 20)])
    write_iceberg_table(table, [
        {"added": ["data/a.parquet"],
         "pos_deletes": {"data/a.parquet": [0]},
         "eq_deletes": {"ids": [2], "rows": [{"lang": "xx"}]}},
    ], FIELDS)
    df = read_iceberg(spark, table)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan
    assert "hashpartitioning" not in plan
    assert sorted(tuple(r) for r in df.collect()) == [(2, "de", 20)]


def test_existing_entry_without_seq_refuses_under_eq_deletes(spark, tmp_path):
    """Sequence inheritance is for ADDED entries only: an EXISTING
    entry with a null sequence number inheriting the CURRENT manifest's
    would dodge older equality deletes (over-retention) — the reader
    must refuse instead."""
    table = str(tmp_path / "t")
    _write_file(table, "data/a.parquet", [(1, "en", 10)])
    write_iceberg_table(table, [
        {"added": ["data/a.parquet"]},
        {"eq_deletes": {"ids": [1], "rows": [{"doc_id": 1}]}},
    ], FIELDS)
    # null out the EXISTING entry's sequence number in snapshot 2's manifest
    from hive_udf_spark.operators.avrocodec import decode_ocf, encode_ocf
    from hive_udf_spark.sources.iceberg import _MANIFEST_ENTRY_SCHEMA

    m = os.path.join(table, "metadata", "manifest-1001.avro")
    _, entries = decode_ocf(open(m, "rb").read())
    assert entries[0]["status"] == 0  # EXISTING
    entries[0]["sequence_number"] = None
    open(m, "wb").write(encode_ocf(_MANIFEST_ENTRY_SCHEMA, entries))
    with pytest.raises(ValueError, match="sequence numbers"):
        read_iceberg(spark, table).collect()


def test_timestamp_time_travel(spark, tmp_path):
    """as-of-timestamp resolution from the snapshot log (the twin
    stamps timestamp-ms = snapshot index)."""
    table = str(tmp_path / "t")
    _basic_table(table)
    assert read_iceberg(spark, table, timestamp_ms=0).count() == 3
    assert read_iceberg(spark, table, timestamp_ms=99).count() == 4
    with pytest.raises(ValueError, match="no snapshot at or before"):
        read_iceberg(spark, table, timestamp_ms=-1)
    with pytest.raises(ValueError, match="not both"):
        read_iceberg(spark, table, snapshot_id=1000, timestamp_ms=0)


def test_partition_pruning_from_manifest_records(spark, tmp_path):
    """Identity-partition pruning on the manifests' typed partition
    records: the file set (inputFiles) shrinks driver-side, and files
    without partition records refuse under a filter."""
    table = str(tmp_path / "t")
    _write_file(table, "data/d7.parquet", [(1, "en", 10)])
    _write_file(table, "data/d8.parquet", [(2, "de", 20)])
    write_iceberg_table(table, [
        {"added": [("data/d7.parquet", {"day": 7}),
                   ("data/d8.parquet", {"day": 8})]},
    ], FIELDS)
    df = read_iceberg(spark, table, partition_filter={"day": 7})
    assert len(df.inputFiles()) == 1 and "d7.parquet" in df.inputFiles()[0]
    assert [tuple(r) for r in df.collect()] == [(1, "en", 10)]
    # unpartitioned files under a filter: refuse, never guess
    table2 = str(tmp_path / "u")
    _write_file(table2, "data/a.parquet", [(1, "en", 10)])
    write_iceberg_table(table2, [{"added": ["data/a.parquet"]}], FIELDS)
    with pytest.raises(ValueError, match="partition records"):
        read_iceberg(spark, table2, partition_filter={"day": 7})


def test_stale_position_deletes_gated_on_sequence_number(spark, tmp_path):
    """ADVICE r11: a data file whose PATH was deleted and later
    re-ADDED must not see the old path's position deletes — the spec
    gates pos deletes on data seq <= delete seq."""
    table = str(tmp_path / "t")
    _write_file(table, "data/a.parquet", [(1, "en", 10), (2, "de", 20)])
    write_iceberg_table(table, [
        {"added": ["data/a.parquet"]},          # seq 1
        {"pos_deletes": {"data/a.parquet": [0]}},  # seq 2
        {"deleted": ["data/a.parquet"]},        # seq 3: path leaves
        {"added": ["data/a.parquet"]},          # seq 4: path returns
    ], FIELDS)
    # the re-added file's rows (seq 4) outrank the seq-2 delete
    got = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20)]
    # at the delete's own snapshot the row IS gone
    assert read_iceberg(spark, table, snapshot_id=1001).count() == 1


def test_position_deletes_percent_encoded_table_path(spark, tmp_path):
    """ADVICE r11: _metadata.file_path percent-encodes the URI; a
    table path with spaces must still match the delete file's paths
    instead of silently resurfacing deleted rows."""
    table = str(tmp_path / "t with space")
    _write_file(table, "data/a.parquet",
                [(1, "en", 10), (2, "de", 20), (3, "fr", 30)])
    write_iceberg_table(table, [
        {"added": ["data/a.parquet"]},
        {"pos_deletes": {"data/a.parquet": [1]}},
    ], FIELDS)
    got = sorted(r.doc_id for r in read_iceberg(spark, table).collect())
    assert got == [1, 3]


def test_delete_broadcast_is_size_gated(spark, tmp_path, monkeypatch):
    """r11 verdict watch item: delete relations larger than the gate
    must take a plain anti-join (AQE's call), not a forced broadcast
    that can blow executor memory at real scale."""
    import hive_udf_spark.sources.iceberg as ice

    table = str(tmp_path / "t")
    _write_file(table, "data/a.parquet",
                [(1, "en", 10), (2, "de", 20), (3, "fr", 30)])
    write_iceberg_table(table, [
        {"added": ["data/a.parquet"],
         "pos_deletes": {"data/a.parquet": [0]},
         "eq_deletes": {"ids": [2], "rows": [{"lang": "xx"}]}},
    ], FIELDS)
    def delete_hints(df):
        """Broadcast hints on the two DELETE anti-joins (the data-file
        sequence-number relation is always hinted — it is bounded by
        the driver-held file list, so it doesn't count)."""
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return [ln for ln in plan.splitlines()
                if "LeftAnti" in ln and "strategy=broadcast" in ln]

    assert len(delete_hints(read_iceberg(spark, table))) == 2
    monkeypatch.setattr(ice, "_BROADCAST_DELETE_MAX_BYTES", 0)
    df = read_iceberg(spark, table)
    assert delete_hints(df) == []  # past the gate: AQE's call, no hint
    assert sorted(r.doc_id for r in df.collect()) == [2, 3]


def test_nested_column_types_roundtrip(spark, tmp_path):
    """r12 (r11 verdict task 2): struct / list / map columns convert
    recursively from Iceberg's JSON type system and scan pinned."""
    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "meta": pa.array(
            [{"src": "web", "score": 7}, {"src": "book", "score": None}],
            pa.struct([("src", pa.string()), ("score", pa.int64())]),
        ),
        "tags": pa.array([["a", "b"], ["c"]], pa.list_(pa.string())),
        "props": pa.array([[("k", 1)], []], pa.map_(pa.string(), pa.int64())),
    })
    pq.write_table(t, os.path.join(table, "data/a.parquet"))
    nested_fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "meta", "required": False, "type": {
            "type": "struct", "fields": [
                {"id": 3, "name": "src", "required": False, "type": "string"},
                {"id": 4, "name": "score", "required": False, "type": "long"},
            ]}},
        {"id": 5, "name": "tags", "required": False, "type": {
            "type": "list", "element-id": 6, "element": "string",
            "element-required": False}},
        {"id": 7, "name": "props", "required": False, "type": {
            "type": "map", "key-id": 8, "key": "string",
            "value-id": 9, "value": "long", "value-required": False}},
    ]
    write_iceberg_table(table, [{"added": ["data/a.parquet"]}], nested_fields)
    df = read_iceberg(spark, table)
    assert dict(df.dtypes) == {
        "doc_id": "bigint",
        "meta": "struct<src:string,score:bigint>",
        "tags": "array<string>",
        "props": "map<string,bigint>",
    }
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[1].meta.src == "web" and rows[1].meta.score == 7
    assert rows[2].meta.score is None
    assert rows[1].tags == ["a", "b"] and rows[2].tags == ["c"]
    assert rows[1].props == {"k": 1} and rows[2].props == {}
    # unknown exotic types still refuse loudly
    import hive_udf_spark.sources.iceberg as ice

    with pytest.raises(ValueError, match="not vendored"):
        ice._spark_type("variant")
    with pytest.raises(ValueError, match="not vendored"):
        ice._spark_type({"type": "unknown-shape"})


def test_murmur3_spec_vectors():
    """The bucket-transform hash is pinned to the Iceberg spec's own
    Appendix-B vectors — a transcription slip cannot survive."""
    from hive_udf_spark.sources.iceberg import _murmur3_x86_32

    assert _murmur3_x86_32((34).to_bytes(8, "little")) == 2017239379
    assert _murmur3_x86_32(b"iceberg") == 1210000089


def test_partition_transforms_spec_examples():
    """apply_transform matches the spec's documented examples."""
    import datetime as dt

    from hive_udf_spark.sources.iceberg import apply_transform

    assert apply_transform("bucket[16]", 34) == 3       # spec example
    assert apply_transform("truncate[10]", 19) == 10
    assert apply_transform("truncate[10]", -5) == -10   # floor, not trunc
    assert apply_transform("truncate[3]", "iceberg") == "ice"
    d = dt.date(2017, 11, 16)
    t = dt.datetime(2017, 11, 16, 22, 31, tzinfo=dt.timezone.utc)
    assert apply_transform("day", d) == 17486           # spec example
    assert apply_transform("month", d) == 574
    assert apply_transform("year", d) == 47
    assert apply_transform("hour", t) == 17486 * 24 + 22  # = day·24 + 22h
    assert apply_transform("identity", "x") == "x"
    assert apply_transform("void", 9) is None
    with pytest.raises(ValueError, match="not vendored"):
        apply_transform("zorder", 1)
    with pytest.raises(ValueError, match="needs int/str"):
        apply_transform("bucket[4]", None)


def test_partition_pruning_through_transforms(spark, tmp_path):
    """r12: partition_filter keys may name a SOURCE column; the reader
    applies the spec's transform (bucket here) to the filter value and
    prunes file groups driver-side."""
    from hive_udf_spark.sources.iceberg import apply_transform

    table = str(tmp_path / "t")
    # two files, partitioned by bucket[4](doc_id): ids 34 and 35 land
    # in different buckets (spec vector: bucket[4](34) = hash % 4)
    b34 = apply_transform("bucket[4]", 34)
    b35 = apply_transform("bucket[4]", 35)
    assert b34 != b35, "fixture needs distinct buckets"
    _write_file(table, "data/a.parquet", [(34, "en", 10)])
    _write_file(table, "data/b.parquet", [(35, "de", 20)])
    write_iceberg_table(table, [
        {"added": [("data/a.parquet", {"day": b34}),
                   ("data/b.parquet", {"day": b35})]},
    ], FIELDS, partition_spec=[
        {"name": "day", "transform": "bucket[4]", "source-id": 1,
         "field-id": 1000},
    ])
    df = read_iceberg(spark, table, partition_filter={"doc_id": 34})
    assert len(df.inputFiles()) == 1
    assert [r.doc_id for r in df.collect()] == [34]
    # spec-field name keys still compare as stored (identity path)
    df2 = read_iceberg(spark, table, partition_filter={"day": b35})
    assert [r.doc_id for r in df2.collect()] == [35]
    # an unknown key refuses instead of silently scanning everything
    with pytest.raises(ValueError, match="neither"):
        read_iceberg(spark, table, partition_filter={"nope": 1})


def test_streaming_sink_snapshots_and_idempotence(spark, tmp_path):
    """r12 iceberg_sink: batches become append snapshots with manifest
    reuse; a retried batch no-ops; time travel sees each prefix."""
    from hive_udf_spark.sources.iceberg import read_iceberg
    from hive_udf_spark.streaming.iceberg_sink import commit_batch_to_iceberg

    table = str(tmp_path / "t")
    b0 = spark.createDataFrame([(1, "en", 10), (2, "de", 20)],
                               "doc_id long, lang string, n long")
    b1 = spark.createDataFrame([(3, "fr", 30)],
                               "doc_id long, lang string, n long")
    assert commit_batch_to_iceberg(b0, 0, table)
    assert commit_batch_to_iceberg(b1, 1, table)
    # retry of batch 1: no-op, nothing duplicated
    assert not commit_batch_to_iceberg(b1, 1, table)
    got = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]
    # time travel to the first snapshot
    assert read_iceberg(spark, table, snapshot_id=5000).count() == 2
    # manifest REUSE: snapshot 2's manifest list carries snapshot 1's
    # manifest untouched plus one new manifest
    import glob as _glob

    from hive_udf_spark.operators.avrocodec import decode_ocf

    lists = sorted(_glob.glob(os.path.join(table, "metadata",
                                           "snap-*-manifest-list.avro")))
    _, rows = decode_ocf(open(lists[-1], "rb").read())
    assert len(rows) == 2
    assert {r["added_snapshot_id"] for r in rows} == {5000, 5001}


def _write_file_with_ids(
    table: str, name: str, cols: dict, ids: dict[str, int]
) -> None:
    """Parquet file stamped with PARQUET:field_id metadata — what real
    Iceberg writers emit."""
    os.makedirs(os.path.dirname(os.path.join(table, name)), exist_ok=True)
    t = pa.table(cols)
    t = t.cast(pa.schema([
        pa.field(f.name, f.type,
                 metadata={b"PARQUET:field_id": str(ids[f.name]).encode()})
        for f in t.schema
    ]))
    pq.write_table(t, os.path.join(table, name))


def test_field_id_resolution_renamed_column(spark, tmp_path):
    """r13 (r12 verdict task 2): a column renamed between snapshots
    must resolve by FIELD ID — by-name resolution silently reads nulls
    from pre-rename files."""
    table = str(tmp_path / "t")
    # file written BEFORE the rename: physical column name 'old_name'
    _write_file_with_ids(table, "data/a.parquet", {
        "doc_id": pa.array([1, 2], pa.int64()),
        "old_name": pa.array(["x", "y"], pa.string()),
    }, {"doc_id": 1, "old_name": 2})
    # file written AFTER the rename: physical name matches
    _write_file_with_ids(table, "data/b.parquet", {
        "doc_id": pa.array([3], pa.int64()),
        "new_name": pa.array(["z"], pa.string()),
    }, {"doc_id": 1, "new_name": 2})
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "new_name", "required": False, "type": "string"},
    ]
    write_iceberg_table(table, [
        {"added": ["data/a.parquet", "data/b.parquet"]},
    ], fields)
    got = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    assert got == [(1, "x"), (2, "y"), (3, "z")]  # pre-rename values SURVIVE


def test_field_id_drop_readd_does_not_resurrect(spark, tmp_path):
    """A dropped-then-re-added column gets a NEW field id; old files'
    values for the retired id must read as NULL, never resurrect."""
    table = str(tmp_path / "t")
    _write_file_with_ids(table, "data/a.parquet", {
        "doc_id": pa.array([1], pa.int64()),
        "tag": pa.array(["stale"], pa.string()),  # written under id 2
    }, {"doc_id": 1, "tag": 2})
    _write_file_with_ids(table, "data/b.parquet", {
        "doc_id": pa.array([2], pa.int64()),
        "tag": pa.array(["fresh"], pa.string()),  # re-added as id 4
    }, {"doc_id": 1, "tag": 4})
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 4, "name": "tag", "required": False, "type": "string"},
    ]
    write_iceberg_table(table, [
        {"added": ["data/a.parquet", "data/b.parquet"]},
    ], fields)
    got = sorted((tuple(r) for r in read_iceberg(spark, table).collect()),
                 key=lambda t: t[0])
    assert got == [(1, None), (2, "fresh")]


def test_field_id_add_column_and_int_promotion(spark, tmp_path):
    """Schema evolution over old files: an added column reads NULL and
    an int column promoted to long widens — both under field-id
    resolution (r12 verdict task 7)."""
    table = str(tmp_path / "t")
    _write_file_with_ids(table, "data/a.parquet", {
        "doc_id": pa.array([7], pa.int32()),  # written as int, now long
    }, {"doc_id": 1})
    _write_file_with_ids(table, "data/b.parquet", {
        "doc_id": pa.array([8], pa.int32()),
        "extra": pa.array([80], pa.int64()),
    }, {"doc_id": 1, "extra": 3})
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 3, "name": "extra", "required": False, "type": "long"},
    ]
    write_iceberg_table(table, [
        {"added": ["data/a.parquet", "data/b.parquet"]},
    ], fields)
    df = read_iceberg(spark, table)
    assert [f.dataType.simpleString() for f in df.schema.fields] \
        == ["bigint", "bigint"]
    got = sorted((tuple(r) for r in df.collect()), key=lambda t: t[0])
    assert got == [(7, None), (8, 80)]


def test_field_id_mixed_table_refuses_idless_files(spark, tmp_path):
    """An id-less file inside an id-carrying table REFUSES at scan time
    (Spark's fieldId contract) — never silently name-matched."""
    table = str(tmp_path / "t")
    _write_file_with_ids(table, "data/a.parquet", {
        "doc_id": pa.array([1], pa.int64()),
        "lang": pa.array(["en"], pa.string()),
    }, {"doc_id": 1, "lang": 2})
    _write_file(table, "data/z.parquet", [(9, "zz", 99)])  # no field ids
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "lang", "required": False, "type": "string"},
    ]
    write_iceberg_table(table, [
        {"added": ["data/a.parquet", "data/z.parquet"]},
    ], fields)
    with pytest.raises(Exception, match="[Ff]ield [Ii]d"):
        read_iceberg(spark, table).collect()


def test_name_mapping_resolves_idless_files(spark, tmp_path):
    """r13: schema.name-mapping.default — id-less files (migrated
    Hive/parquet data) resolve through the recorded historical names;
    fields absent from the mapping read NULL, never a wrong match."""
    table = str(tmp_path / "t")
    # id-less file written under the OLD column name 'langcode'
    _write_file(table, "data/a.parquet", [(1, "en", 10), (2, "de", 20)])
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "langcode": pa.array(["en", "de"], pa.string()),
    })
    pq.write_table(t, os.path.join(table, "data/a.parquet"))
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "lang", "required": False, "type": "string"},
        {"id": 3, "name": "score", "required": False, "type": "long"},
    ]
    mapping = json.dumps([
        {"field-id": 1, "names": ["doc_id"]},
        {"field-id": 2, "names": ["langcode"]},
        # field 3 ('score', added later) has NO mapping -> NULL
    ])
    write_iceberg_table(table, [{"added": ["data/a.parquet"]}], fields,
                        properties={"schema.name-mapping.default": mapping})
    df = read_iceberg(spark, table)
    assert df.columns == ["doc_id", "lang", "score"]
    got = sorted((tuple(r) for r in df.collect()), key=lambda r: r[0])
    assert got == [(1, "en", None), (2, "de", None)]

    # multi-name mappings resolve per file (r14 — previously refused):
    # the alias this file actually carries ('doc_id') wins
    multi = json.dumps([
        {"field-id": 1, "names": ["id", "doc_id"]},
        {"field-id": 2, "names": ["langcode"]},
    ])
    write_iceberg_table(table, [{"added": ["data/a.parquet"]}], fields,
                        properties={"schema.name-mapping.default": multi})
    got = sorted((tuple(r) for r in read_iceberg(spark, table).collect()),
                 key=lambda r: r[0])
    assert got == [(1, "en", None), (2, "de", None)]


def test_idless_tables_keep_name_resolution(spark, tmp_path):
    """Tables whose files carry no ids (older writers) keep the by-name
    path and the caller's session conf stays untouched."""
    table = str(tmp_path / "t")
    _basic_table(table)
    assert read_iceberg(spark, table).count() == 4
    assert spark.conf.get(
        "spark.sql.parquet.fieldId.read.enabled", None
    ) in (None, "false")


def test_sink_manifest_record_counts_are_real(spark, tmp_path):
    """r13 (r12 verdict task 4): manifest record_count is a required
    spec field external engines use for metadata-only count(*) — it
    must equal each data file's true parquet row count, in BOTH the
    streaming sink and the fixture writer."""
    from hive_udf_spark.operators.avrocodec import decode_ocf
    from hive_udf_spark.streaming.iceberg_sink import commit_batch_to_iceberg

    table = str(tmp_path / "t")
    b0 = spark.createDataFrame(
        [(i, "en", i * 10) for i in range(7)],
        "doc_id long, lang string, n long",
    )
    assert commit_batch_to_iceberg(b0, 0, table)
    import glob as _glob

    total = 0
    for mpath in _glob.glob(os.path.join(table, "metadata",
                                         "stream-manifest-*.avro")):
        _, entries = decode_ocf(open(mpath, "rb").read())
        for e in entries:
            df = e["data_file"]
            actual = pq.ParquetFile(
                os.path.join(table, df["file_path"])).metadata.num_rows
            assert df["record_count"] == actual > 0
            total += df["record_count"]
    assert total == 7

    # the fixture writer stamps true counts too
    table2 = str(tmp_path / "t2")
    _basic_table(table2)
    for mpath in _glob.glob(os.path.join(table2, "metadata",
                                         "manifest-*.avro")):
        _, entries = decode_ocf(open(mpath, "rb").read())
        for e in entries:
            df = e["data_file"]
            fp = os.path.join(table2, df["file_path"])
            if e["status"] != 2 and os.path.exists(fp):
                assert df["record_count"] == pq.ParquetFile(
                    fp).metadata.num_rows > 0


def test_sink_refuses_fresh_checkpoint_against_existing_table(
    spark, tmp_path
):
    """r12 ADVICE: restarting a DIFFERENT stream (fresh checkpoint →
    batch ids reset) against an existing table must refuse loudly —
    no-opping would drop data and re-publishing would duplicate
    snapshot ids."""
    from hive_udf_spark.streaming.iceberg_sink import commit_batch_to_iceberg

    table = str(tmp_path / "t")
    b0 = spark.createDataFrame([(1, "en", 10)],
                               "doc_id long, lang string, n long")
    assert commit_batch_to_iceberg(b0, 0, table, app_id="stream-A")
    with pytest.raises(ValueError, match="fresh checkpoint"):
        commit_batch_to_iceberg(b0, 0, table, app_id="stream-B")
    # the SAME app retrying the same batch stays a no-op
    assert not commit_batch_to_iceberg(b0, 0, table, app_id="stream-A")


def test_stale_version_hint_never_hides_a_published_snapshot(
    spark, tmp_path
):
    """r13 review: a writer that crashed between the metadata rename
    (the publish) and the hint refresh leaves a stale hint — readers
    and the NEXT writer must take the newest glob version, or the
    published batch silently vanishes from the snapshot list."""
    from hive_udf_spark.streaming.iceberg_sink import commit_batch_to_iceberg

    table = str(tmp_path / "t")
    ddl = "doc_id long, lang string, n long"
    b0 = spark.createDataFrame([(1, "en", 10)], ddl)
    b1 = spark.createDataFrame([(2, "de", 20)], ddl)
    b2 = spark.createDataFrame([(3, "fr", 30)], ddl)
    assert commit_batch_to_iceberg(b0, 0, table)
    assert commit_batch_to_iceberg(b1, 1, table)
    # simulate the crash-after-publish: roll the hint back to v1
    with open(os.path.join(table, "metadata", "version-hint.text"),
              "w") as fh:
        fh.write("1")
    # the reader sees batch 1 anyway...
    assert read_iceberg(spark, table).count() == 2
    # ...and the next writer's snapshot list keeps it
    assert commit_batch_to_iceberg(b2, 2, table)
    got = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]


def test_name_mapping_refuses_mixed_id_files(spark, tmp_path):
    """r13 review: per-file resolution (ids where present, mapping
    otherwise) is not expressible in one pinned scan — a table mixing
    id-less and id-carrying files under a name mapping must refuse, not
    silently NULL one family."""
    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    t = pa.table({"doc_id": pa.array([1], pa.int64())})
    pq.write_table(t, os.path.join(table, "data/a.parquet"))  # id-less
    t2 = t.cast(pa.schema([
        pa.field("doc_id", pa.int64(),
                 metadata={b"PARQUET:field_id": b"1"}),
    ]))
    pq.write_table(t2, os.path.join(table, "data/z.parquet"))  # with ids
    fields = [{"id": 1, "name": "doc_id", "required": False,
               "type": "long"}]
    mapping = json.dumps([{"field-id": 1, "names": ["doc_id"]}])
    write_iceberg_table(table, [
        {"added": ["data/a.parquet", "data/z.parquet"]},
    ], fields, properties={"schema.name-mapping.default": mapping})
    with pytest.raises(ValueError, match="mixes id-less"):
        read_iceberg(spark, table)


def test_upsert_sink_equality_delete_lifecycle(spark, tmp_path):
    """r13 iceberg_upsert_sink: insert -> upsert -> delete -> reinsert
    via equality-delete snapshots (the Flink pattern); sequence gating
    merges; retry no-ops; compaction folds the delete files away."""
    from hive_udf_spark.sources.maintenance import compact_iceberg_table
    from hive_udf_spark.streaming.iceberg_upsert_sink import (
        upsert_batch_to_iceberg,
    )

    table = str(tmp_path / "t")
    ddl = "doc_id long, lang string, n long"
    b0 = spark.createDataFrame(
        [(i, "en", i * 10) for i in range(1, 9)], ddl)
    assert upsert_batch_to_iceberg(b0, 0, table)
    got = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    assert got == [(i, "en", i * 10) for i in range(1, 9)]

    # upsert rows 2 and 5
    b1 = spark.createDataFrame([(2, "de", 999), (5, "fr", 555)], ddl)
    assert upsert_batch_to_iceberg(b1, 1, table)
    assert not upsert_batch_to_iceberg(b1, 1, table)  # retry no-op
    got = {r.doc_id: (r.lang, r.n)
           for r in read_iceberg(spark, table).collect()}
    assert got[2] == ("de", 999) and got[5] == ("fr", 555)
    assert got[1] == ("en", 10) and len(got) == 8

    # mixed batch: delete 2 and 7, upsert 8
    b2 = spark.createDataFrame(
        [(2, None, None, True), (7, None, None, True),
         (8, "es", 888, False)],
        ddl + ", _deleted boolean",
    )
    assert upsert_batch_to_iceberg(b2, 2, table)
    got = {r.doc_id: (r.lang, r.n)
           for r in read_iceberg(spark, table).collect()}
    assert 2 not in got and 7 not in got
    assert got[8] == ("es", 888) and len(got) == 6

    # reinsert 7
    b3 = spark.createDataFrame([(7, "pt", 777)], ddl)
    assert upsert_batch_to_iceberg(b3, 3, table)
    before = sorted(tuple(r)
                    for r in read_iceberg(spark, table).collect())
    assert (7, "pt", 777) in before and len(before) == 7

    # compaction applies the accumulated delete files permanently
    assert compact_iceberg_table(spark, table, target_files=1)
    assert sorted(tuple(r)
                  for r in read_iceberg(spark, table).collect()) == before
    _, files = iceberg_live_files(table)  # delete-free post-compaction
    assert len(files) == 1


def test_sink_crash_between_data_and_metadata_recovers(
    spark, tmp_path, monkeypatch
):
    """r13 (r12 verdict task 8): kill the sink between the data-file
    move and the metadata publish — orphan data files exist, the table
    is unchanged for readers, and the retry converges to exactly-once
    contents."""
    from hive_udf_spark.streaming.iceberg_sink import commit_batch_to_iceberg

    table = str(tmp_path / "t")
    b0 = spark.createDataFrame([(1, "en", 10), (2, "de", 20)],
                               "doc_id long, lang string, n long")
    b1 = spark.createDataFrame([(3, "fr", 30)],
                               "doc_id long, lang string, n long")
    assert commit_batch_to_iceberg(b0, 0, table)

    # the publish is now put-if-absent os.link (sources/txn.py, r14)
    import hive_udf_spark.sources.txn as txn

    real_link = os.link

    def crash_link(src, dst, *a, **kw):
        raise OSError("injected crash before the atomic publish")

    monkeypatch.setattr(txn.os, "link", crash_link)
    with pytest.raises(OSError, match="injected crash"):
        commit_batch_to_iceberg(b1, 1, table)
    monkeypatch.setattr(txn.os, "link", real_link)

    # orphan data files are on disk, but readers see only batch 0
    import glob as _glob

    orphans = _glob.glob(os.path.join(table, "data", "batch-0000000001-*"))
    assert orphans
    assert read_iceberg(spark, table).count() == 2
    # the retry converges: no duplicates, all three rows, one v2 file
    assert commit_batch_to_iceberg(b1, 1, table)
    got = sorted(tuple(r) for r in read_iceberg(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]


def test_multi_name_mapping_resolves_per_file(spark, tmp_path):
    """r14 (r13 verdict task 6): one field whose historical name
    differs across writer eras — file A carries 'chars', file B
    carries 'nchars', the mapping lists both — resolves PER FILE: the
    driver groups files by footer profile and unions one scan per
    era.  A third era that carries neither alias reads NULL for that
    field only."""
    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "chars": pa.array([10], pa.int64()),
    }), os.path.join(table, "data/a.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([2], pa.int64()),
        "nchars": pa.array([20], pa.int64()),
    }), os.path.join(table, "data/b.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([3], pa.int64()),
    }), os.path.join(table, "data/c.parquet"))
    fields = [
        {"id": 1, "name": "doc_id", "required": False, "type": "long"},
        {"id": 2, "name": "n_chars", "required": False, "type": "long"},
    ]
    mapping = json.dumps([
        {"field-id": 1, "names": ["doc_id"]},
        {"field-id": 2, "names": ["chars", "nchars"]},
    ])
    write_iceberg_table(table, [
        {"added": ["data/a.parquet", "data/b.parquet", "data/c.parquet"]},
    ], fields, properties={"schema.name-mapping.default": mapping})
    df = read_iceberg(spark, table)
    assert df.columns == ["doc_id", "n_chars"]
    got = sorted((tuple(r) for r in df.collect()), key=lambda r: r[0])
    assert got == [(1, 10), (2, 20), (3, None)]


def test_multi_name_mapping_ambiguous_file_refuses(spark, tmp_path):
    """A file carrying BOTH aliases of one field is ambiguous — refuse
    loudly, never guess which column is the data."""
    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    pq.write_table(pa.table({
        "chars": pa.array([10], pa.int64()),
        "nchars": pa.array([99], pa.int64()),
    }), os.path.join(table, "data/a.parquet"))
    fields = [
        {"id": 2, "name": "n_chars", "required": False, "type": "long"},
    ]
    mapping = json.dumps([
        {"field-id": 2, "names": ["chars", "nchars"]},
    ])
    write_iceberg_table(table, [{"added": ["data/a.parquet"]}], fields,
                        properties={"schema.name-mapping.default": mapping})
    with pytest.raises(ValueError, match="multiple aliases"):
        read_iceberg(spark, table).collect()


def test_multi_name_mapping_refuses_id_carrying_files(spark, tmp_path):
    """Under a multi-name mapping every footer is read anyway, so a
    mixed id/mapping table is detected EXACTLY (not sampled) and
    refuses."""
    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    pq.write_table(pa.table({
        "chars": pa.array([10], pa.int64()),
    }), os.path.join(table, "data/a.parquet"))
    _write_file_with_ids(table, "data/b.parquet", {
        "n_chars": pa.array([20], pa.int64()),
    }, {"n_chars": 2})
    fields = [
        {"id": 2, "name": "n_chars", "required": False, "type": "long"},
    ]
    mapping = json.dumps([
        {"field-id": 2, "names": ["chars", "nchars"]},
    ])
    write_iceberg_table(table, [
        {"added": ["data/b.parquet", "data/a.parquet"]},
    ], fields, properties={"schema.name-mapping.default": mapping})
    with pytest.raises(ValueError, match="mixes id-less"):
        read_iceberg(spark, table).collect()
