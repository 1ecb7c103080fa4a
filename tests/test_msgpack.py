"""Vendored MessagePack codec (operators/msgpackcodec.py, r10)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_udf_spark.operators.msgpackcodec import (
    decode_msgpack_stream,
    encode_msgpack,
    msgpack_records_table,
    msgpack_shard_encoder,
)


def test_width_boundaries_roundtrip():
    vals = [
        0, 1, 127, 128, 255, 256, 65535, 65536, 2**32 - 1, 2**32, 2**63 - 1,
        -1, -32, -33, -128, -129, -32768, -32769, -(2**31), -(2**31) - 1,
        -(2**63),
    ]
    blob = b"".join(encode_msgpack(v) for v in vals)
    assert decode_msgpack_stream(blob) == vals


def test_strings_bytes_collections_ext_nil():
    vals = [
        "", "x", "a" * 31, "b" * 32, "c" * 300, "データ",
        b"", b"\x00\xff" * 50,
        [], [1, "two", None, [3.5]], list(range(40)),
        {}, {"k": [True, False]}, {1: "int-key", None: "nil-key"},
        (5, b"\x01"), (7, b"12345678"), (-2, b"long ext payload"),
        None, True, False, 1.25, -0.0,
    ]
    blob = b"".join(encode_msgpack(v) for v in vals)
    got = decode_msgpack_stream(blob)
    assert got == vals


def test_float32_decodes():
    import struct

    blob = b"\xca" + struct.pack(">f", 1.5)
    assert decode_msgpack_stream(blob) == [1.5]


@settings(max_examples=80, deadline=None)
@given(
    st.recursive(
        st.one_of(
            st.integers(min_value=-(2**63), max_value=2**64 - 1),
            st.text(max_size=40),
            st.binary(max_size=40),
            st.booleans(),
            st.none(),
            st.floats(allow_nan=False, allow_infinity=True),
        ),
        lambda inner: st.one_of(
            st.lists(inner, max_size=6),
            st.dictionaries(st.text(max_size=8), inner, max_size=6),
        ),
        max_leaves=25,
    )
)
def test_roundtrip_property(v):
    got = decode_msgpack_stream(encode_msgpack(v))
    assert len(got) == 1
    out = got[0]
    if isinstance(v, float) and math.isnan(v):  # excluded anyway
        return
    assert out == v


def test_bomb_and_malformed_inputs():
    with pytest.raises(ValueError, match="truncated"):
        decode_msgpack_stream(b"\xdb\xff\xff\xff\xff" + b"x" * 8)
    with pytest.raises(ValueError, match="exceeds remaining"):
        decode_msgpack_stream(b"\xdd\x7f\xff\xff\xff")
    with pytest.raises(ValueError, match="exceeds remaining"):
        decode_msgpack_stream(b"\xdf\x7f\xff\xff\xff")
    with pytest.raises(ValueError, match="depth"):
        decode_msgpack_stream(b"\x91" * 64 + b"\x01")
    with pytest.raises(ValueError, match="reserved"):
        decode_msgpack_stream(b"\xc1")
    with pytest.raises(ValueError, match="UTF-8"):
        decode_msgpack_stream(b"\xa2\xff\xfe")


def test_byte_flip_fuzz_never_crashes():
    recs = [
        {"doc_id": i, "lang": f"l{i}", "n_chars": i * 31, "tags": list(range(i % 4))}
        for i in range(30)
    ]
    base = b"".join(encode_msgpack(r) for r in recs)
    rng = np.random.RandomState(17)
    for _ in range(150):
        blob = bytearray(base)
        i = int(rng.randint(0, len(blob)))
        blob[i] ^= 1 << int(rng.randint(0, 8))
        try:
            out = decode_msgpack_stream(bytes(blob))
            assert isinstance(out, list)
        except ValueError:
            pass


def test_records_table_quarantine(spark):
    pdf = pd.DataFrame(
        {
            "shard": [0] * 4,
            "doc_id": np.arange(4, dtype="int64"),
            "lang": ["en"] * 4,
            "n_chars": np.arange(4, dtype="int64") * 10,
        }
    )
    good = msgpack_shard_encoder()(pdf)["blob"].iloc[0]
    df = spark.createDataFrame(
        pd.DataFrame({"shard": [0, 1], "blob": [good, good[:-3]]})
    )
    rows = msgpack_records_table(df, on_error="quarantine").collect()
    ok = [r for r in rows if r.decode_error is None]
    quar = [r for r in rows if r.decode_error is not None]
    assert len(ok) == 4 and len(quar) == 1 and quar[0].shard == 1
    assert [r.n_tags for r in sorted(ok, key=lambda r: r.doc_id)] == [0, 1, 2, 3]


def test_schemaless_type_mismatch_quarantines(spark):
    """A structurally-valid shard whose fields don't fit the declared
    Spark schema (string doc_id, uint64 past int64) must become a
    quarantine row, never an Arrow conversion crash."""
    bad1 = encode_msgpack({"doc_id": "x", "lang": "en", "n_chars": 1})
    bad2 = encode_msgpack({"doc_id": 2**64 - 1, "lang": "en", "n_chars": 1})
    bad3 = encode_msgpack({"doc_id": 1, "lang": [1, 2], "n_chars": 1})
    good = encode_msgpack({"doc_id": 7, "lang": "en", "n_chars": 3, "tags": []})
    df = spark.createDataFrame(
        pd.DataFrame({"shard": [0, 1, 2, 3], "blob": [good, bad1, bad2, bad3]})
    )
    rows = msgpack_records_table(df, on_error="quarantine").collect()
    ok = [r for r in rows if r.decode_error is None]
    quar = [r for r in rows if r.decode_error is not None]
    assert len(ok) == 1 and ok[0].doc_id == 7
    assert sorted(r.shard for r in quar) == [1, 2, 3]


def test_float_and_ext_map_keys_decode():
    blob = encode_msgpack({1.5: "f", (3, b"x"): "e", None: "n"})
    got = decode_msgpack_stream(blob)
    assert got == [{1.5: "f", (3, b"x"): "e", None: "n"}]
