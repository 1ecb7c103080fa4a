"""Vendored Delta Lake source (sources/delta.py, r11): log replay,
removes, time travel, checkpoints (single + multi-part), partitioned
tables, protocol gates, corrupt-log errors."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hive_udf_spark.sources.delta import (
    checkpoint_delta,
    delta_snapshot,
    read_delta,
    write_delta_commits,
)

SCHEMA_JSON = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "lang", "type": "string", "nullable": True, "metadata": {}},
        {"name": "n", "type": "long", "nullable": True, "metadata": {}},
    ],
})


def _write_file(table: str, name: str, rows: list[tuple]) -> None:
    os.makedirs(table, exist_ok=True)
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "n": pa.array([r[2] for r in rows], pa.int64()),
    })
    pq.write_table(t, os.path.join(table, name))


def _basic_table(table: str) -> None:
    """v0: add a.parquet + b.parquet; v1: remove b, add c (rewrite)."""
    _write_file(table, "a.parquet", [(1, "en", 10), (2, "de", 20)])
    _write_file(table, "b.parquet", [(3, "fr", 30)])
    _write_file(table, "c.parquet", [(3, "fr", 31), (4, "es", 40)])
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet"}}, {"add": {"path": "b.parquet"}}],
        [{"remove": {"path": "b.parquet"}}, {"add": {"path": "c.parquet"}}],
    ], SCHEMA_JSON)


def test_live_set_after_remove(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic_table(table)
    got = sorted(tuple(r) for r in read_delta(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 31), (4, "es", 40)]


def test_time_travel_versions(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic_table(table)
    v0 = sorted(tuple(r) for r in read_delta(spark, table, version=0).collect())
    assert v0 == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]
    with pytest.raises(ValueError, match="out of range"):
        read_delta(spark, table, version=2)


def test_checkpoint_replay(spark, tmp_path):
    """A checkpoint at v1 + commits after it: the reader starts from
    the checkpoint and replays only the tail (the v0/v1 JSON files are
    DELETED to prove the checkpoint is actually used)."""
    table = str(tmp_path / "t")
    _basic_table(table)
    checkpoint_delta(table, 1)
    _write_file(table, "d.parquet", [(5, "it", 50)])
    write_delta_commits_append(table, 2, [{"add": {"path": "d.parquet"}}])
    os.remove(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    got = sorted(tuple(r) for r in read_delta(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 31),
                   (4, "es", 40), (5, "it", 50)]


def test_torn_multipart_checkpoint_is_skipped(spark, tmp_path):
    """r13 review: a crash mid multi-part checkpoint leaves a strict
    subset of parts — the reader must NOT replay it (silent row loss);
    it falls back to the JSON commits and reads everything."""
    from hive_udf_spark.sources.delta import checkpoint_delta

    table = str(tmp_path / "t")
    _write_file(table, "a.parquet", [(1, "en", 10)])
    _write_file(table, "b.parquet", [(2, "de", 20)])
    _write_file(table, "c.parquet", [(3, "fr", 30)])
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet"}}],
        [{"add": {"path": "b.parquet"}}],
        [{"add": {"path": "c.parquet"}}],
    ], SCHEMA_JSON)
    checkpoint_delta(table, 2, parts=3)
    import glob as _glob

    parts = sorted(_glob.glob(os.path.join(
        table, "_delta_log", "*.checkpoint.*.parquet")))
    assert len(parts) == 3
    os.remove(parts[1])  # tear the set
    got = sorted(r.doc_id for r in read_delta(spark, table).collect())
    assert got == [1, 2, 3]  # commits replayed instead of the torn base


def test_multipart_checkpoint(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic_table(table)
    checkpoint_delta(table, 1, parts=3)
    os.remove(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    got = sorted(tuple(r) for r in read_delta(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 31), (4, "es", 40)]


def write_delta_commits_append(table: str, version: int, actions) -> None:
    """Append one commit without rewriting earlier ones."""
    from hive_udf_spark.sources.delta import _log_dir, _meta_action  # noqa

    lines = [json.dumps({"commitInfo": {"timestamp": version}})]
    for a in actions:
        if "add" in a:
            add = dict(a["add"])
            add.setdefault("partitionValues", {})
            add.setdefault("size", os.path.getsize(os.path.join(table, add["path"])))
            add.setdefault("modificationTime", 0)
            add.setdefault("dataChange", True)
            lines.append(json.dumps({"add": add}))
        else:
            lines.append(json.dumps(a))
    with open(os.path.join(table, "_delta_log", f"{version:020d}.json"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_partitioned_table(spark, tmp_path):
    """Partition values come from partitionValues (typed literals),
    including a null partition; data files lack the partition column."""
    table = str(tmp_path / "p")
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "lang", "type": "string", "nullable": True, "metadata": {}},
            {"name": "n", "type": "long", "nullable": True, "metadata": {}},
            {"name": "day", "type": "integer", "nullable": True, "metadata": {}},
        ],
    })
    _basic_table(table)  # reuse the data files; rewrite the log below
    import shutil

    shutil.rmtree(os.path.join(table, "_delta_log"))
    write_delta_commits(table, [
        [
            {"add": {"path": "a.parquet", "partitionValues": {"day": "7"}}},
            {"add": {"path": "b.parquet", "partitionValues": {"day": "8"}}},
            {"add": {"path": "c.parquet", "partitionValues": {}}},
        ],
    ], schema, part_cols=["day"])
    df = read_delta(spark, table)
    assert df.columns == ["doc_id", "lang", "n", "day"]
    assert dict(df.dtypes)["day"] == "int"
    got = sorted(((r.doc_id, r.day) for r in df.collect()),
                 key=lambda t: (t[0], t[1] if t[1] is not None else -1))
    assert got == [(1, 7), (2, 7), (3, None), (3, 8), (4, None)]


def test_protocol_and_feature_gates(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic_table(table)
    log = os.path.join(table, "_delta_log", f"{0:020d}.json")
    lines = open(log).read().splitlines()

    # column mapping in id mode → refuse (name mode is vendored, r11)
    meta = json.loads(lines[1])
    meta["metaData"]["configuration"] = {"delta.columnMapping.mode": "id"}
    open(log, "w").write("\n".join([lines[0], json.dumps(meta)] + lines[2:]))
    with pytest.raises(ValueError, match="columnMapping"):
        read_delta(spark, table)

    # name mode WITHOUT physicalName annotations → refuse, not misread
    meta["metaData"]["configuration"] = {"delta.columnMapping.mode": "name"}
    open(log, "w").write("\n".join([lines[0], json.dumps(meta)] + lines[2:]))
    with pytest.raises(ValueError, match="physicalName"):
        read_delta(spark, table)

    # reader v3 with an unsupported feature → refuse (v2Checkpoint is
    # vendored since r12; typeWidening is not)
    meta["metaData"]["configuration"] = {}
    proto = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["typeWidening"]}}
    open(log, "w").write("\n".join([json.dumps(proto), json.dumps(meta)] + lines[2:]))
    with pytest.raises(ValueError, match="not vendored"):
        read_delta(spark, table)


def test_corrupt_log_errors(spark, tmp_path):
    table = str(tmp_path / "t")
    _basic_table(table)
    # commit gap
    os.rename(os.path.join(table, "_delta_log", f"{1:020d}.json"),
              os.path.join(table, "_delta_log", f"{2:020d}.json"))
    with pytest.raises(ValueError, match="commit gap"):
        delta_snapshot(table)
    os.rename(os.path.join(table, "_delta_log", f"{2:020d}.json"),
              os.path.join(table, "_delta_log", f"{1:020d}.json"))
    # malformed action line
    with open(os.path.join(table, "_delta_log", f"{1:020d}.json"), "a") as fh:
        fh.write("{not json\n")
    with pytest.raises(ValueError, match="malformed action"):
        delta_snapshot(table)
    # no log at all
    with pytest.raises(ValueError, match="_delta_log"):
        delta_snapshot(str(tmp_path / "missing"))


def test_schema_is_pinned_not_inferred(spark, tmp_path):
    """The scan uses metaData.schemaString, so a data file with extra
    columns still reads back the table schema only."""
    table = str(tmp_path / "t")
    os.makedirs(table)
    t = pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "lang": pa.array(["xx"], pa.string()),
        "n": pa.array([99], pa.int64()),
        "extra": pa.array([1], pa.int64()),
    })
    pq.write_table(t, os.path.join(table, "a.parquet"))
    write_delta_commits(table, [[{"add": {"path": "a.parquet"}}]], SCHEMA_JSON)
    df = read_delta(spark, table)
    assert df.columns == ["doc_id", "lang", "n"]
    assert [tuple(r) for r in df.collect()] == [(9, "xx", 99)]


MAPPED_SCHEMA_JSON = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "doc_id", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-aaa"}},
        {"name": "lang", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-bbb"}},
        {"name": "n", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName": "col-ccc"}},
    ],
})


def _write_physical_file(table: str, name: str, rows: list[tuple]) -> None:
    """Parquet with the PHYSICAL column names a column-mapped writer
    uses on disk."""
    os.makedirs(table, exist_ok=True)
    t = pa.table({
        "col-aaa": pa.array([r[0] for r in rows], pa.int64()),
        "col-bbb": pa.array([r[1] for r in rows], pa.string()),
        "col-ccc": pa.array([r[2] for r in rows], pa.int64()),
    })
    pq.write_table(t, os.path.join(table, name))


def test_column_mapping_name_mode(spark, tmp_path):
    """r11: mode=name tables scan by physicalName and rename to logical
    — the protocol's rename-without-rewrite contract."""
    table = str(tmp_path / "t")
    _write_physical_file(table, "a.parquet", [(1, "en", 10), (2, "de", 20)])
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet"}}],
    ], MAPPED_SCHEMA_JSON)
    # flip the config on commit 0's metaData
    log = os.path.join(table, "_delta_log", f"{0:020d}.json")
    lines = open(log).read().splitlines()
    meta = json.loads(lines[1])
    meta["metaData"]["configuration"] = {"delta.columnMapping.mode": "name"}
    open(log, "w").write("\n".join([lines[0], json.dumps(meta)] + lines[2:]))
    df = read_delta(spark, table)
    assert df.columns == ["doc_id", "lang", "n"]
    got = sorted(tuple(r) for r in df.collect())
    assert got == [(1, "en", 10), (2, "de", 20)]


def test_deletion_vectors_on_disk_and_inline(spark, tmp_path):
    """r11: deletion vectors decode through the vendored RoaringBitmap
    codec and drop exactly the named row positions."""
    from hive_udf_spark.sources.delta import write_deletion_vector

    table = str(tmp_path / "t")
    _write_file(table, "a.parquet",
                [(1, "en", 10), (2, "de", 20), (3, "fr", 30), (4, "es", 40)])
    dv = write_deletion_vector(table, [0, 2])  # kill rows 0 and 2
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet", "deletionVector": dv}}],
    ], SCHEMA_JSON)
    got = sorted(tuple(r) for r in read_delta(spark, table).collect())
    assert got == [(2, "de", 20), (4, "es", 40)]
    # r12: the vector applies as an Arrow filter INSIDE the scan — no
    # join, no exchange, nothing shuffles or broadcasts row positions
    plan = read_delta(spark, table)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan and "Exchange" not in plan
    assert "hashpartitioning" not in plan


def test_deletion_vector_update_rewrites_descriptor(spark, tmp_path):
    """A later commit replacing the add's vector (remove + add, as real
    writers do) must win: the row set tightens from {0,2} to {0}."""
    from hive_udf_spark.sources.delta import write_deletion_vector

    table = str(tmp_path / "t")
    _write_file(table, "a.parquet", [(1, "en", 10), (2, "de", 20), (3, "fr", 30)])
    dv1 = write_deletion_vector(table, [0, 2])
    dv2 = write_deletion_vector(table, [0])
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet", "deletionVector": dv1}}],
        [{"remove": {"path": "a.parquet"}},
         {"add": {"path": "a.parquet", "deletionVector": dv2}}],
    ], SCHEMA_JSON)
    assert read_delta(spark, table).count() == 2
    assert read_delta(spark, table, version=0).count() == 1


def test_deletion_vector_corruption_refuses(spark, tmp_path):
    from hive_udf_spark.sources.delta import _dv_positions, write_deletion_vector

    table = str(tmp_path / "t")
    os.makedirs(table, exist_ok=True)
    dv = write_deletion_vector(table, [1, 5, 9])
    # flip a data byte: CRC-32 must catch it
    import glob as _glob

    path = _glob.glob(os.path.join(table, "deletion_vector_*.bin"))[0]
    blob = bytearray(open(path, "rb").read())
    blob[7] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        _dv_positions(table, dv)
    # a lying cardinality refuses too
    blob[7] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="cardinality"):
        _dv_positions(table, {**dv, "cardinality": 99})
    with pytest.raises(ValueError, match="storageType"):
        _dv_positions(table, {**dv, "storageType": "x"})


def test_streaming_delta_commit_idempotent(spark, tmp_path):
    """commit_batch_to_delta: version = batch id; a retry of the same
    batch is a no-op (the commit file is the idempotency check), and
    the table reads back exactly once through the vendored log replay."""
    from hive_udf_spark.streaming.delta_sink import commit_batch_to_delta

    table = str(tmp_path / "t")
    b0 = spark.createDataFrame([(1, "en", 10), (2, "de", 20)],
                               "doc_id long, lang string, n long")
    b1 = spark.createDataFrame([(3, "fr", 30)],
                               "doc_id long, lang string, n long")
    assert commit_batch_to_delta(b0, 0, table) is True
    assert commit_batch_to_delta(b0, 0, table) is False  # retried batch
    assert commit_batch_to_delta(b1, 1, table) is True
    got = sorted(tuple(r) for r in read_delta(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 30)]
    # the txn idempotent-writer marker is in the log
    log0 = open(os.path.join(table, "_delta_log", f"{0:020d}.json")).read()
    assert '"txn"' in log0 and '"appId"' in log0
    # version time travel sees only batch 0
    assert read_delta(spark, table, version=0).count() == 2


def test_column_mapping_partitioned_physical_partition_values(spark, tmp_path):
    """Under column mapping, add.partitionValues keys are PHYSICAL
    names — looking partition values up by logical name would silently
    null every partition column."""
    table = str(tmp_path / "t")
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "doc_id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "col-aaa"}},
            {"name": "lang", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "col-bbb"}},
            {"name": "n", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "col-ccc"}},
            {"name": "day", "type": "integer", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "col-ddd"}},
        ],
    })
    _write_physical_file(table, "a.parquet", [(1, "en", 10)])
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet",
                  "partitionValues": {"col-ddd": "7"}}}],
    ], schema, part_cols=["day"],
        configuration={"delta.columnMapping.mode": "name"})
    rows = read_delta(spark, table).collect()
    assert [(r.doc_id, r.day) for r in rows] == [(1, 7)]


def test_timestamp_time_travel(spark, tmp_path):
    """timestampAsOf semantics: the newest commit at or before the
    given time wins; times before the first commit refuse."""
    table = str(tmp_path / "t")
    _basic_table(table)  # commitInfo timestamps 0 and 1
    assert read_delta(spark, table, timestamp_ms=0).count() == 3
    got = sorted(tuple(r) for r in
                 read_delta(spark, table, timestamp_ms=99).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 31), (4, "es", 40)]
    with pytest.raises(ValueError, match="no commit at or before"):
        read_delta(spark, table, timestamp_ms=-1)
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, table, version=0, timestamp_ms=0)


def test_partition_filter_prunes_files_driver_side(spark, tmp_path):
    """partition_filter must shrink the SCANNED FILE SET (inputFiles),
    not just filter rows — the PB-scale pruning real readers do."""
    table = str(tmp_path / "p")
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "lang", "type": "string", "nullable": True, "metadata": {}},
            {"name": "n", "type": "long", "nullable": True, "metadata": {}},
            {"name": "day", "type": "integer", "nullable": True, "metadata": {}},
        ],
    })
    _write_file(table, "a.parquet", [(1, "en", 10)])
    _write_file(table, "b.parquet", [(2, "de", 20)])
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet", "partitionValues": {"day": "7"}}},
         {"add": {"path": "b.parquet", "partitionValues": {"day": "8"}}}],
    ], schema, part_cols=["day"])
    df = read_delta(spark, table, partition_filter={"day": "7"})
    assert len(df.inputFiles()) == 1 and "a.parquet" in df.inputFiles()[0]
    assert [(r.doc_id, r.day) for r in df.collect()] == [(1, 7)]
    with pytest.raises(ValueError, match="not partition columns"):
        read_delta(spark, table, partition_filter={"lang": "en"})
    # filter that matches nothing: empty frame with the full schema
    assert read_delta(spark, table, partition_filter={"day": "9"}).count() == 0


def test_deletion_vector_million_position_stress(spark, tmp_path):
    """r11 verdict task 1: a DV with ≥10⁶ positions must apply without
    the driver ever expanding it row-per-row (only the roaring bytes
    broadcast; decode happens in the scan filter, executor-side)."""
    from hive_udf_spark.sources.delta import write_deletion_vector

    table = str(tmp_path / "t")
    os.makedirs(table, exist_ok=True)
    n = 2_000_000
    ids = pa.array(range(n), pa.int64())
    pq.write_table(pa.table({
        "doc_id": ids,
        "lang": pa.array(["xx"] * n, pa.string()),
        "n": ids,
    }), os.path.join(table, "big.parquet"))
    dv = write_deletion_vector(table, range(0, n, 2))  # 1e6 even rows
    write_delta_commits(table, [
        [{"add": {"path": "big.parquet", "deletionVector": dv}}],
    ], SCHEMA_JSON)
    df = read_delta(spark, table)
    agg = df.agg({"doc_id": "count", "n": "sum"}).collect()[0]
    assert agg["count(doc_id)"] == n // 2
    # surviving rows are exactly the odd positions
    assert agg["sum(n)"] == sum(range(1, n, 2))


def test_deletion_vector_never_decodes_on_driver(spark, tmp_path):
    """r11 verdict task 1's 'no driver materialization' assert: poison
    the DRIVER's bitmap decoder — the read must still succeed, because
    positions only ever decode inside executor python workers."""
    import hive_udf_spark.operators.roaring as roaring
    from hive_udf_spark.sources.delta import write_deletion_vector

    table = str(tmp_path / "t")
    _write_file(table, "a.parquet",
                [(1, "en", 10), (2, "de", 20), (3, "fr", 30), (4, "es", 40)])
    dv = write_deletion_vector(table, [1, 3])
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet", "deletionVector": dv}}],
    ], SCHEMA_JSON)

    orig = roaring.decode_rbm64

    def poisoned(_b):
        raise AssertionError(
            "deletion-vector positions decoded on the DRIVER"
        )

    roaring.decode_rbm64 = poisoned
    try:
        got = sorted(r.doc_id for r in read_delta(spark, table).collect())
    finally:
        roaring.decode_rbm64 = orig
    assert got == [1, 3]


def test_deletion_vector_percent_encoded_table_path(spark, tmp_path):
    """ADVICE r11: _metadata.file_path is a percent-encoded URI; a
    table path with spaces must not silently miss the DV lookup and
    resurface deleted rows."""
    from hive_udf_spark.sources.delta import write_deletion_vector

    table = str(tmp_path / "t with space")
    _write_file(table, "a.parquet",
                [(1, "en", 10), (2, "de", 20), (3, "fr", 30)])
    dv = write_deletion_vector(table, [1])
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet", "deletionVector": dv}}],
    ], SCHEMA_JSON)
    got = sorted(r.doc_id for r in read_delta(spark, table).collect())
    assert got == [1, 3]


def test_deletion_vector_empty_bitmap_is_harmless(spark, tmp_path):
    """r12 ADVICE: a zero-cardinality DV must delete nothing — the
    searchsorted membership test previously indexed pos[-1] of an empty
    array and crashed the scan."""
    from hive_udf_spark.sources.delta import write_deletion_vector

    table = str(tmp_path / "t")
    _write_file(table, "a.parquet", [(1, "en", 10), (2, "de", 20)])
    dv = write_deletion_vector(table, [])
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet", "deletionVector": dv}}],
    ], SCHEMA_JSON)
    got = sorted(r.doc_id for r in read_delta(spark, table).collect())
    assert got == [1, 2]


def test_column_mapping_id_mode(spark, tmp_path):
    """r12 (r11 verdict task 6): columnMapping.mode=id resolves columns
    by the PARQUET FIELD IDS the writer stamped — physical names are
    opaque and ignored; a deletion vector still applies on top."""
    from hive_udf_spark.sources.delta import write_deletion_vector

    table = str(tmp_path / "t")
    os.makedirs(table, exist_ok=True)
    # on-disk: opaque physical names + field ids (what id-mode writers emit)
    t = pa.table({
        "col-aaaa": pa.array([1, 2, 3], pa.int64()),
        "col-bbbb": pa.array(["en", "de", "fr"], pa.string()),
        "col-cccc": pa.array([10, 20, 30], pa.int64()),
    })
    t = t.cast(pa.schema([
        pa.field("col-aaaa", pa.int64(),
                 metadata={b"PARQUET:field_id": b"1"}),
        pa.field("col-bbbb", pa.string(),
                 metadata={b"PARQUET:field_id": b"2"}),
        pa.field("col-cccc", pa.int64(),
                 metadata={b"PARQUET:field_id": b"3"}),
    ]))
    pq.write_table(t, os.path.join(table, "a.parquet"))
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "doc_id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaaa"}},
            {"name": "lang", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bbbb"}},
            {"name": "n", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "col-cccc"}},
        ],
    })
    dv = write_deletion_vector(table, [1])
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet", "deletionVector": dv}}],
    ], schema, configuration={"delta.columnMapping.mode": "id"})
    df = read_delta(spark, table)
    assert df.columns == ["doc_id", "lang", "n"]
    got = sorted(tuple(r) for r in df.collect())
    assert got == [(1, "en", 10), (3, "fr", 30)]

    # r12 ADVICE: the field-id flag must NOT leak into the caller's
    # session — it rides a cloned session, so later unrelated parquet
    # reads keep resolving columns by name
    assert spark.conf.get(
        "spark.sql.parquet.fieldId.read.enabled", None
    ) in (None, "false")

    # a field missing its columnMapping.id refuses, never misreads
    bad = json.loads(schema)
    del bad["fields"][0]["metadata"]["delta.columnMapping.id"]
    import shutil

    shutil.rmtree(os.path.join(table, "_delta_log"))
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet"}}],
    ], json.dumps(bad), configuration={"delta.columnMapping.mode": "id"})
    with pytest.raises(ValueError, match="columnMapping.id"):
        read_delta(spark, table)


def test_v2_checkpoint_with_sidecars(spark, tmp_path):
    """r12: V2 checkpoints (the v2Checkpoint reader feature) — a JSON
    top file with checkpointMetadata + sidecar actions, file actions in
    parquet sidecars under _delta_log/_sidecars/ — replay exactly; the
    pre-checkpoint commits are DELETED to prove the checkpoint is the
    base."""
    from hive_udf_spark.sources.delta import checkpoint_v2_delta

    table = str(tmp_path / "t")
    _basic_table(table)
    checkpoint_v2_delta(table, 1, sidecars=2)
    _write_file(table, "d.parquet", [(5, "it", 50)])
    write_delta_commits_append(table, 2, [{"add": {"path": "d.parquet"}}])
    os.remove(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    got = sorted(tuple(r) for r in read_delta(spark, table).collect())
    assert got == [(1, "en", 10), (2, "de", 20), (3, "fr", 31),
                   (4, "es", 40), (5, "it", 50)]
    import glob as _glob

    assert _glob.glob(os.path.join(table, "_delta_log", "_sidecars",
                                   "*.parquet"))
    # v2Checkpoint as a declared reader feature is accepted
    log0 = os.path.join(table, "_delta_log", f"{2:020d}.json")
    lines = open(log0).read().splitlines()
    proto = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["v2Checkpoint"]}}
    open(log0, "w").write("\n".join([json.dumps(proto)] + lines) + "\n")
    assert read_delta(spark, table).count() == 5


def test_v2_checkpoint_missing_sidecar_refuses(spark, tmp_path):
    from hive_udf_spark.sources.delta import checkpoint_v2_delta, delta_snapshot

    table = str(tmp_path / "t")
    _basic_table(table)
    checkpoint_v2_delta(table, 1, sidecars=1)
    import glob as _glob

    sc = _glob.glob(os.path.join(table, "_delta_log", "_sidecars",
                                 "*.parquet"))[0]
    os.remove(sc)
    os.remove(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(ValueError, match="sidecar missing"):
        delta_snapshot(table)


def test_v2_checkpoint_carries_deletion_vectors(spark, tmp_path):
    """A DV descriptor must survive the checkpoint -> sidecar -> replay
    trip: deleted rows stay deleted when the log is truncated."""
    from hive_udf_spark.sources.delta import (
        checkpoint_v2_delta,
        write_deletion_vector,
    )

    table = str(tmp_path / "t")
    _write_file(table, "a.parquet",
                [(1, "en", 10), (2, "de", 20), (3, "fr", 30)])
    dv = write_deletion_vector(table, [1])
    write_delta_commits(table, [
        [{"add": {"path": "a.parquet", "deletionVector": dv}}],
    ], SCHEMA_JSON)
    checkpoint_v2_delta(table, 0)
    os.remove(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    got = sorted(r.doc_id for r in read_delta(spark, table).collect())
    assert got == [1, 3]


def test_classic_checkpoint_partition_values_roundtrip(spark, tmp_path):
    """Latent-bug guard: parquet MAP columns decode as pair lists; a
    partitioned table restored FROM a checkpoint must still resolve its
    partitionValues."""
    import shutil

    table = str(tmp_path / "p")
    schema = json.loads(SCHEMA_JSON)
    schema["fields"].append({"name": "day", "type": "integer",
                             "nullable": True, "metadata": {}})
    _basic_table(table)
    shutil.rmtree(os.path.join(table, "_delta_log"))
    write_delta_commits(table, [
        [
            {"add": {"path": "a.parquet", "partitionValues": {"day": "7"}}},
            {"add": {"path": "c.parquet", "partitionValues": {"day": "9"}}},
        ],
    ], json.dumps(schema), part_cols=["day"])
    checkpoint_delta(table, 0)
    os.remove(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    got = sorted((r.doc_id, r.day) for r in read_delta(spark, table).collect())
    assert got == [(1, 7), (2, 7), (3, 9), (4, 9)]
