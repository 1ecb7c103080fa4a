"""Vendored Avro OCF codec (operators/avrocodec.py, r10)."""

from __future__ import annotations

import numpy as np
import pytest

from hive_udf_spark.operators.avrocodec import (
    FIXTURE_SCHEMA,
    avro_records_table,
    decode_ocf,
    encode_ocf,
)


def _recs(n: int) -> list[dict]:
    return [
        {
            "doc_id": i,
            "lang": None if i % 7 == 0 else f"l{i % 5}",
            "n_chars": 10 * i,
            "quality": i / 4.0,
            "flagged": i % 3 == 0,
        }
        for i in range(n)
    ]


def test_roundtrip_null_and_deflate_multiblock():
    recs = _recs(100)
    for codec in ("null", "deflate"):
        blob = encode_ocf(FIXTURE_SCHEMA, recs, codec=codec, block_records=16)
        schema, got = decode_ocf(blob)
        assert schema == FIXTURE_SCHEMA
        assert got == recs
        # multi-block: 100 records at 16/block = 7 blocks
        assert blob.count(b"\xa5" * 16) == 8  # header sync + 7 block syncs


def test_primitives_and_arrays():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "i", "type": "int"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "bytes"},
            {"name": "e", "type": {"type": "enum", "name": "c",
                                   "symbols": ["x", "y", "z"]}},
            {"name": "a", "type": {"type": "array", "items": "long"}},
        ],
    }
    recs = [
        {"i": -7, "f": 0.5, "d": -2.25, "b": b"\x00\xff", "e": "y",
         "a": [1, -2, 3000000000]},
        {"i": 0, "f": 2.0, "d": 0.0, "b": b"", "e": "z", "a": []},
    ]
    _, got = decode_ocf(encode_ocf(schema, recs))
    assert got == recs


def test_negative_longs_zigzag_edges():
    schema = {"type": "record", "name": "t",
              "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, -2, 63, -64, 64, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    recs = [{"v": v} for v in vals]
    _, got = decode_ocf(encode_ocf(schema, recs))
    assert [r["v"] for r in got] == vals


def test_corrupt_and_torn_blocks_raise():
    blob = bytearray(encode_ocf(FIXTURE_SCHEMA, _recs(40), codec="deflate"))
    with pytest.raises(ValueError, match="magic"):
        decode_ocf(b"NOPE" + bytes(blob[4:]))
    # flip a byte inside the LAST sync marker → torn block
    torn = bytearray(blob)
    torn[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        decode_ocf(bytes(torn))
    # truncated file
    with pytest.raises(ValueError):
        decode_ocf(bytes(blob[: len(blob) // 2]))


def test_byte_flip_fuzz_never_crashes():
    base = encode_ocf(FIXTURE_SCHEMA, _recs(30), codec="deflate")
    rng = np.random.RandomState(11)
    for _ in range(120):
        blob = bytearray(base)
        i = int(rng.randint(0, len(blob)))
        blob[i] ^= 1 << int(rng.randint(0, 8))
        try:
            _, recs = decode_ocf(bytes(blob))
            assert isinstance(recs, list)
        except ValueError:
            pass


def test_map_and_fixed_roundtrip():
    """Maps (array-style block runs with string keys) and ``fixed``
    joined the vendored type family in r11 (Iceberg manifests are full
    of both); nested-record recursion is exercised alongside."""
    schema = {"type": "record", "name": "t", "fields": [
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "f", "type": {"type": "fixed", "name": "sync16", "size": 4}},
        {"name": "inner", "type": {"type": "record", "name": "i", "fields": [
            {"name": "x", "type": ["null", "string"]},
        ]}},
    ]}
    recs = [
        {"m": {"a": 1, "b": 2}, "f": b"\x01\x02\x03\x04",
         "inner": {"x": "hi"}},
        {"m": {}, "f": b"\xff" * 4, "inner": {"x": None}},
    ]
    _, got = decode_ocf(encode_ocf(schema, recs))
    assert got == recs


def test_unsupported_schema_quarantines():
    schema = {"type": "record", "name": "t",
              "fields": [{"name": "r", "type": "SomeNamedRef"}]}
    import json

    blob = bytearray(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    from hive_udf_spark.operators.avrocodec import _zigzag

    blob += _zigzag(len(meta))
    for k, v in sorted(meta.items()):
        ke = k.encode()
        blob += _zigzag(len(ke)) + ke + _zigzag(len(v)) + v
    blob += _zigzag(0) + b"\xa5" * 16
    with pytest.raises(ValueError, match="not vendored"):
        decode_ocf(bytes(blob))


def test_jvm_avro_cross_validation(spark):
    """Decode the fixture twin's output with the JVM Avro
    DataFileReader already on Spark's classpath — an independent
    implementation agreeing field-for-field."""
    jvm = spark.sparkContext._jvm
    try:
        jvm.java.lang.Class.forName("org.apache.avro.file.DataFileReader")
    except Exception:
        pytest.skip("JVM avro classes not reachable")
    import tempfile

    recs = _recs(25)
    blob = encode_ocf(FIXTURE_SCHEMA, recs, codec="deflate", block_records=8)
    with tempfile.NamedTemporaryFile(suffix=".avro", delete=False) as f:
        f.write(blob)
        path = f.name
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        got.append(
            {
                "doc_id": rec.get("doc_id"),
                "lang": None if rec.get("lang") is None else str(rec.get("lang")),
                "n_chars": rec.get("n_chars"),
                "quality": rec.get("quality"),
                "flagged": rec.get("flagged"),
            }
        )
    reader.close()
    assert got == recs


def test_records_table_quarantine(spark):
    import pandas as pd

    good = encode_ocf(FIXTURE_SCHEMA, _recs(5), codec="null")
    bad = good[: len(good) // 2]
    df = spark.createDataFrame(
        pd.DataFrame({"shard": [0, 1], "blob": [good, bad]})
    )
    rows = avro_records_table(df, on_error="quarantine").collect()
    ok = [r for r in rows if r.decode_error is None]
    quar = [r for r in rows if r.decode_error is not None]
    assert len(ok) == 5 and len(quar) == 1
    assert quar[0].shard == 1 and quar[0].doc_id is None


def test_foreign_schema_type_mismatch_quarantines(spark):
    """A spec-valid OCF whose schema types doc_id as string quarantines
    whole-blob instead of crashing the Arrow conversion."""
    import pandas as pd

    schema = {
        "type": "record", "name": "doc",
        "fields": [{"name": "doc_id", "type": "string"},
                   {"name": "lang", "type": "string"},
                   {"name": "n_chars", "type": "long"}],
    }
    bad = encode_ocf(schema, [{"doc_id": "x", "lang": "en", "n_chars": 5}])
    df = spark.createDataFrame(pd.DataFrame({"shard": [0], "blob": [bad]}))
    rows = avro_records_table(df, on_error="quarantine").collect()
    assert len(rows) == 1 and "not an integer" in rows[0].decode_error


def test_record_count_amplification_capped():
    """A zero-byte-per-record schema (all-null fields) with max-count/
    zero-size blocks must hit the CUMULATIVE record cap, not amplify a
    tiny blob into billions of appends (r10 review item)."""
    import json

    from hive_udf_spark.operators.avrocodec import _zigzag

    schema = {"type": "record", "name": "t",
              "fields": [{"name": "x", "type": "null"}]}
    blob = bytearray(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    blob += _zigzag(len(meta))
    for k, v in sorted(meta.items()):
        ke = k.encode()
        blob += _zigzag(len(ke)) + ke + _zigzag(len(v)) + v
    sync = b"\xa5" * 16
    blob += _zigzag(0) + sync
    for _ in range(4):  # 4 blocks x 16M "records" of zero bytes each
        blob += _zigzag(1 << 24) + _zigzag(0) + sync
    # either bound may trip first: the cumulative record cap or the
    # (r11, tighter) input-proportional element budget
    with pytest.raises(ValueError, match="record count past|element count past"):
        decode_ocf(bytes(blob))


def test_nested_null_array_element_bomb_capped():
    """r10 advice (high): items of type "null" encode to ZERO bytes, so
    nested array blocks amplify the per-array cap multiplicatively —
    a ~400-byte blob could pin an executor for minutes.  The Reader's
    input-proportional element budget must quarantine it instantly."""
    import json
    import time

    from hive_udf_spark.operators.avrocodec import _zigzag

    schema = {"type": "array", "items": {"type": "array", "items": "null"}}
    blob = bytearray(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    blob += _zigzag(len(meta))
    for k, v in sorted(meta.items()):
        ke = k.encode()
        blob += _zigzag(len(ke)) + ke + _zigzag(len(v)) + v
    sync = b"\xa5" * 16
    blob += _zigzag(0) + sync
    inner = _zigzag(16_000_000) + _zigzag(0)  # 16M zero-byte elements in 5B
    payload = _zigzag(50) + inner * 50 + _zigzag(0)
    blob += _zigzag(1) + _zigzag(len(payload)) + payload + sync
    assert len(blob) < 600
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="element count past"):
        decode_ocf(bytes(blob))
    assert time.monotonic() - t0 < 2.0


def test_element_budget_admits_legit_null_heavy_records():
    """The budget is proportional, not absolute: a legitimate file of
    union-null-heavy records (1 byte per null via the union index)
    must still decode in full."""
    schema = {
        "type": "record",
        "name": "t",
        "fields": [{"name": f"f{i}", "type": ["null", "long"]}
                   for i in range(8)],
    }
    recs = [{f"f{i}": None for i in range(8)} for _ in range(500)]
    _, got = decode_ocf(encode_ocf(schema, recs))
    assert got == recs


def test_deep_schema_nesting_quarantines():
    import json

    from hive_udf_spark.operators.avrocodec import _zigzag

    node = "long"
    for _ in range(200):
        node = {"type": "array", "items": node}
    schema = {"type": "record", "name": "t",
              "fields": [{"name": "a", "type": node}]}
    blob = bytearray(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    blob += _zigzag(len(meta))
    for k, v in sorted(meta.items()):
        ke = k.encode()
        blob += _zigzag(len(ke)) + ke + _zigzag(len(v)) + v
    blob += _zigzag(0) + b"\xa5" * 16
    with pytest.raises(ValueError, match="depth cap"):
        decode_ocf(bytes(blob))


def test_null_blob_cell_quarantines(spark):
    import pandas as pd

    good = encode_ocf(FIXTURE_SCHEMA, _recs(3), codec="null")
    df = spark.createDataFrame(
        pd.DataFrame({"shard": [0, 1], "blob": [good, None]})
    )
    rows = avro_records_table(df, on_error="quarantine").collect()
    assert len([r for r in rows if r.decode_error is None]) == 3
    assert len([r for r in rows if r.decode_error is not None]) == 1
