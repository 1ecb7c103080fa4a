"""Vendored RoaringBitmap codecs (operators/roaring.py, r11): 32-bit
portable serialization (all three container kinds, both cookies),
Delta's 64-bit RoaringBitmapArray layout, Z85, bomb guards, fuzz."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_udf_spark.operators.roaring import (
    decode_rbm64,
    decode_roaring32,
    encode_rbm64,
    encode_roaring32,
    z85_decode,
    z85_encode,
)


def test_container_kinds_roundtrip():
    cases = {
        "empty": np.array([], np.uint32),
        "array": np.array([1, 5, 9, 70000], np.uint32),
        "run": np.arange(10000, dtype=np.uint32),
        "bitmap": np.unique(
            np.random.RandomState(0).randint(0, 1 << 16, 30000)
        ).astype(np.uint32),
        "mixed": np.unique(np.concatenate([
            np.arange(5000, dtype=np.uint32),                 # run
            np.array([1 << 17, (1 << 17) + 2], np.uint32),    # array
            np.random.RandomState(1).randint(
                1 << 18, (1 << 18) + (1 << 16), 20000
            ).astype(np.uint32),                              # bitmap
        ])),
    }
    for name, vals in cases.items():
        out, consumed = decode_roaring32(encode_roaring32(vals))
        assert consumed == len(encode_roaring32(vals)), name
        assert np.array_equal(np.sort(out), np.sort(vals)), name


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 40) - 1),
                max_size=300))
def test_rbm64_roundtrip_property(xs):
    vals = np.unique(np.array(xs, dtype=np.int64)) if xs else np.empty(0, np.int64)
    assert np.array_equal(decode_rbm64(encode_rbm64(vals)), vals)


def test_z85_rfc_vector():
    helloworld = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(helloworld) == "HelloWorld"
    assert z85_decode("HelloWorld") == helloworld
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abc")
    with pytest.raises(ValueError, match="invalid character"):
        z85_decode('ab"de')


def test_bomb_guards_and_malformed():
    with pytest.raises(ValueError, match="magic"):
        decode_rbm64(b"\x00" * 16)
    # declared bitmap count past the cap must refuse BEFORE allocating
    bomb = struct.pack("<iq", 1681511377, 1 << 40)
    with pytest.raises(ValueError, match="count out of range"):
        decode_rbm64(bomb)
    with pytest.raises(ValueError, match="cookie"):
        decode_roaring32(struct.pack("<I", 99999))
    # lying bitmap-container cardinality
    vals = np.unique(np.random.RandomState(2).randint(0, 1 << 16, 20000))
    blob = bytearray(encode_roaring32(vals.astype(np.uint32)))
    # descriptive header: cookie(4) + size(4) + key(2) + card-1(2);
    # flip a low cardinality bit (the high byte keeps it a bitmap kind)
    blob[10] ^= 0x40
    with pytest.raises(ValueError, match="cardinality"):
        decode_roaring32(bytes(blob))
    with pytest.raises(ValueError, match="trailing"):
        decode_rbm64(encode_rbm64(np.array([1, 2], np.int64)) + b"\x00")


def test_byte_flip_fuzz_never_crashes():
    base = bytearray(encode_rbm64(np.unique(
        np.random.RandomState(3).randint(0, 1 << 20, 5000)
    ).astype(np.int64)))
    rng = np.random.RandomState(4)
    for _ in range(300):
        i = int(rng.randint(0, len(base)))
        orig = base[i]
        base[i] ^= 1 << int(rng.randint(0, 8))
        try:
            out = decode_rbm64(bytes(base))
            assert out.dtype == np.int64
        except ValueError:
            pass
        base[i] = orig


def test_declared_cardinality_bomb_refuses_before_allocating():
    """A crafted bitmap declaring 2^16 run containers x 2^16 values
    (~4G positions from ~600 KB of input) must refuse on the DECLARED
    headers, before any container allocates — the run-container
    amplification is ~10,000x per 6 input bytes."""
    import time

    size = 1 << 16
    blob = bytearray()
    blob += struct.pack("<I", 12346 | ((size - 1) << 16))  # run cookie
    blob += b"\xff" * ((size + 7) // 8)  # all containers are runs
    for k in range(size):
        blob += struct.pack("<HH", k, 0xFFFF)  # card-1 = 65535
    # the offsets header that follows at this size is absent here —
    # irrelevant: the declared-cardinality check fires before it's read
    t0 = time.time()
    with pytest.raises(ValueError, match="declared cardinality"):
        decode_roaring32(bytes(blob))
    assert time.time() - t0 < 2.0  # refused without decoding anything


def test_run_container_lying_header_refuses():
    vals = np.arange(100, dtype=np.uint32)  # encodes as one run
    blob = bytearray(encode_roaring32(vals))
    # descriptive header: cookie(4) + flags(1) + key(2) + card-1(2)
    blob[7] ^= 0x01  # card now lies
    with pytest.raises(ValueError, match="cardinality"):
        decode_roaring32(bytes(blob))
