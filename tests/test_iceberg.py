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


def test_v2_delete_manifests_refused(tmp_path):
    table = str(tmp_path / "t")
    _basic_table(table)
    # flip the manifest-list entry's content to 1 (DELETE manifest)
    from hive_udf_spark.operators.avrocodec import decode_ocf, encode_ocf
    from hive_udf_spark.sources.iceberg import _MANIFEST_FILE_SCHEMA

    lpath = os.path.join(table, "metadata", "snap-1001-manifest-list.avro")
    _, rows = decode_ocf(open(lpath, "rb").read())
    rows[0]["content"] = 1
    open(lpath, "wb").write(encode_ocf(_MANIFEST_FILE_SCHEMA, rows))
    with pytest.raises(ValueError, match="DELETE manifests"):
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
