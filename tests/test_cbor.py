"""Vendored CBOR codec (operators/cborcodec.py, r10)."""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_udf_spark.operators.cborcodec import (
    cbor_records_table,
    cbor_shard_encoder,
    decode_cbor_stream,
    encode_cbor,
)


def test_integers_and_widths():
    vals = [0, 23, 24, 255, 256, 65535, 65536, 2**32 - 1, 2**32, 2**64 - 1,
            -1, -24, -25, -256, -257, -(2**32), -(2**64)]
    blob = b"".join(encode_cbor(v) for v in vals)
    assert decode_cbor_stream(blob) == vals


def test_floats_preferred_width():
    # 1.5 fits half; 1/3-ish float32-only; pi needs double — and decode
    # must return the same value through each width
    f32 = struct.unpack(">f", struct.pack(">f", 0.1))[0]
    vals = [0.0, 1.5, -2.25, 65504.0, f32, math.pi, float("inf")]
    blob = b"".join(encode_cbor(v) for v in vals)
    got = decode_cbor_stream(blob)
    assert got == vals
    assert encode_cbor(1.5)[0] == 0xF9  # half
    assert encode_cbor(f32)[0] == 0xFA  # single
    assert encode_cbor(math.pi)[0] == 0xFB  # double


def test_strings_collections_tags_simples():
    vals = [
        "", "héllo", "x" * 300, b"", b"\x00\xff" * 30,
        [1, [2, "three"], None], {"k": True, 5: b"v", None: 0},
        ("tag", 0, "2026-08-15T00:00:00Z"), ("tag", 1, 1786900000),
        ("tag", 42, [1, 2]), ("simple", 23), ("simple", 99),
        None, True, False,
    ]
    blob = b"".join(encode_cbor(v) for v in vals)
    assert decode_cbor_stream(blob) == vals


def test_indefinite_forms_roundtrip():
    vals = [
        "a fairly long chunked string", b"chunked bytes here!",
        [1, "two", [3]], {"a": 1, "b": [None]},
    ]
    for v in vals:
        got = decode_cbor_stream(encode_cbor(v, indefinite=True))
        assert got == [v], v
    # hand-built: empty indefinite array/map, nested indefinite
    assert decode_cbor_stream(b"\x9f\xff") == [[]]
    assert decode_cbor_stream(b"\xbf\xff") == [{}]
    assert decode_cbor_stream(b"\x9f\x9f\x01\xff\xff") == [[[1]]]


@settings(max_examples=80, deadline=None)
@given(
    v=st.recursive(
        st.one_of(
            st.integers(min_value=-(2**64), max_value=2**64 - 1),
            st.text(max_size=30),
            st.binary(max_size=30),
            st.booleans(),
            st.none(),
            st.floats(allow_nan=False),
        ),
        lambda inner: st.one_of(
            st.lists(inner, max_size=5),
            st.dictionaries(st.text(max_size=6), inner, max_size=5),
        ),
        max_leaves=20,
    ),
    indefinite=st.booleans(),
)
def test_roundtrip_property(v, indefinite):
    got = decode_cbor_stream(encode_cbor(v, indefinite=indefinite))
    assert got == [v]


def test_malformed_and_bombs():
    with pytest.raises(ValueError, match="exceeds remaining|truncated"):
        decode_cbor_stream(b"\x5b\xff\xff\xff\xff\xff\xff\xff\xff")
    with pytest.raises(ValueError, match="exceeds remaining"):
        decode_cbor_stream(b"\x9a\x7f\xff\xff\xff")
    with pytest.raises(ValueError, match="break outside"):
        decode_cbor_stream(b"\xff")
    with pytest.raises(ValueError, match="depth"):
        decode_cbor_stream(b"\x9f" * 64 + b"\xff" * 64)
    with pytest.raises(ValueError, match="missing break"):
        decode_cbor_stream(b"\x7f\x61a")
    with pytest.raises(ValueError, match="wrong type"):
        decode_cbor_stream(b"\x7f\x41a\xff")  # bytes chunk in text string
    with pytest.raises(ValueError, match="UTF-8"):
        decode_cbor_stream(b"\x62\xff\xfe")
    with pytest.raises(ValueError, match="short form"):
        decode_cbor_stream(b"\xf8\x10")  # simple < 32 in long form


def test_byte_flip_fuzz_never_crashes():
    pdf = pd.DataFrame(
        {
            "shard": [1] * 20,
            "doc_id": np.arange(20, dtype="int64"),
            "lang": [f"l{i}" for i in range(20)],
            "n_chars": np.arange(20, dtype="int64") * 9,
        }
    )
    base = cbor_shard_encoder()(pdf)["blob"].iloc[0]
    rng = np.random.RandomState(23)
    for _ in range(150):
        blob = bytearray(base)
        i = int(rng.randint(0, len(blob)))
        blob[i] ^= 1 << int(rng.randint(0, 8))
        try:
            out = decode_cbor_stream(bytes(blob))
            assert isinstance(out, list)
        except ValueError:
            pass


def test_records_table_quarantine_and_gate(spark):
    pdf = pd.DataFrame(
        {
            "shard": [0] * 3,
            "doc_id": np.arange(3, dtype="int64"),
            "lang": ["en"] * 3,
            "n_chars": np.arange(3, dtype="int64") * 5,
        }
    )
    good = cbor_shard_encoder()(pdf)["blob"].iloc[0]
    bad_type = encode_cbor({"doc_id": "x", "lang": "en", "n_chars": 1})
    df = spark.createDataFrame(
        pd.DataFrame({"shard": [0, 1, 2],
                      "blob": [good, good[:-2], bad_type]})
    )
    rows = cbor_records_table(df, on_error="quarantine").collect()
    ok = [r for r in rows if r.decode_error is None]
    quar = [r for r in rows if r.decode_error is not None]
    assert len(ok) == 3 and sorted(r.shard for r in quar) == [1, 2]
    assert [r.n_tags for r in sorted(ok, key=lambda r: r.doc_id)] == [0, 1, 2]
