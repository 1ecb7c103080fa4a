"""TFRecord codec (operators/tfrecordcodec.py, r14 — the r13
verdict's task 5): framing round-trips under all three shard
compressions, both CRCs actually verify (a flipped bit anywhere
raises), length bombs refuse before allocation, the tf.train.Example
proto path covers packed/unpacked lists and unknown-field skipping,
and the Spark surface quarantines corrupt shards whole-blob."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_udf_spark.operators.tfrecordcodec import (
    crc32c,
    decode_tf_example,
    decode_tfrecord_stream,
    encode_tf_example,
    encode_tfrecord,
    masked_crc32c,
)


def test_crc32c_public_vectors():
    # the check value every CRC-32C implementation must produce
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # 32 zero bytes: the iSCSI RFC 3720 test vector
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


@pytest.mark.parametrize("comp", [None, "gzip", "zstd"])
def test_framing_roundtrip(comp):
    recs = [b"hello", b"", b"x" * 5000, bytes(range(256))]
    blob = encode_tfrecord(recs, comp)
    assert decode_tfrecord_stream(blob) == recs


def test_empty_shard():
    assert decode_tfrecord_stream(b"") == []


def test_every_flipped_bit_in_a_record_is_caught():
    blob = bytearray(encode_tfrecord([b"payload-bytes"]))
    for i in range(len(blob)):
        bad = bytearray(blob)
        bad[i] ^= 0x40
        with pytest.raises(ValueError):
            decode_tfrecord_stream(bytes(bad))


def test_truncation_raises():
    blob = encode_tfrecord([b"hello", b"world"])
    for cut in (len(blob) - 1, len(blob) - 5, 3, 13):
        with pytest.raises(ValueError, match="truncat"):
            decode_tfrecord_stream(blob[:cut])


def test_length_bomb_refuses_before_allocation():
    hdr = struct.pack("<Q", 1 << 40)
    bomb = hdr + struct.pack("<I", masked_crc32c(hdr)) + b"\x00" * 64
    with pytest.raises(ValueError, match="cap"):
        decode_tfrecord_stream(bomb)


def test_trailing_garbage_raises():
    blob = encode_tfrecord([b"ok"]) + b"\x01\x02\x03"
    with pytest.raises(ValueError):
        decode_tfrecord_stream(blob)


def test_example_roundtrip_kinds():
    feats = decode_tf_example(encode_tf_example({
        "doc_id": [7, -3, 1 << 40],
        "lang": ["en", "de"],
        "embed": [0.5, -1.25],
        "blob": [b"\x00\xff"],
        "empty_floats": [],
    }))
    assert feats["doc_id"] == ("int64", [7, -3, 1 << 40])
    assert feats["lang"] == ("bytes", [b"en", b"de"])
    assert feats["embed"] == ("float", [0.5, -1.25])
    assert feats["blob"] == ("bytes", [b"\x00\xff"])
    assert feats["empty_floats"] == ("float", [])


def test_example_unpacked_lists_decode():
    """Real writers may emit repeated scalars UNPACKED; the decoder
    must accept both encodings (proto wire rule)."""
    # Int64List { value: 5  value: 9 } unpacked: field 1 wire 0 twice
    il = b"\x08\x05\x08\x09"
    # FloatList { value: 1.0 } unpacked: field 1 wire 5
    fl = b"\x0d" + struct.pack("<f", 1.0)

    def feature(field, body):
        return bytes([field << 3 | 2, len(body)]) + body

    def example(name, feat):
        entry = (b"\x0a" + bytes([len(name)]) + name
                 + b"\x12" + bytes([len(feat)]) + feat)
        features = b"\x0a" + bytes([len(entry)]) + entry
        return b"\x0a" + bytes([len(features)]) + features

    feats = decode_tf_example(example(b"ids", feature(3, il)))
    assert feats["ids"] == ("int64", [5, 9])
    feats = decode_tf_example(example(b"f", feature(2, fl)))
    assert feats["f"] == ("float", [1.0])


def test_example_unknown_fields_skip():
    """An Example with extra unknown fields (newer proto) must still
    decode the known features — the compatibility rule."""
    base = encode_tf_example({"doc_id": [1]})
    # append an unknown field 9 (varint) and field 8 (delimited)
    extended = base + b"\x48\x2a" + b"\x42\x03abc"
    assert decode_tf_example(extended)["doc_id"] == ("int64", [1])


def test_bad_gzip_and_bad_proto_raise():
    with pytest.raises(ValueError, match="gzip"):
        decode_tfrecord_stream(b"\x1f\x8b" + b"\x00" * 30)
    with pytest.raises(ValueError):
        decode_tf_example(b"\x0a\xff\xff\xff\xff\x7f")  # 34 GiB features


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_fuzz_arbitrary_bytes_raise_value_error_only(b):
    for fn in (decode_tfrecord_stream, decode_tf_example):
        try:
            fn(b)
        except ValueError:
            pass


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(max_size=64), max_size=8),
       st.sampled_from([None, "gzip", "zstd"]))
def test_fuzz_roundtrip_property(recs, comp):
    assert decode_tfrecord_stream(encode_tfrecord(recs, comp)) == recs


def test_spark_quarantine_mode(spark):
    """A corrupt shard lands as ONE quarantine row carrying the decode
    error; healthy shards still parse (the JSONL/CSV twin rule)."""
    from hive_udf_spark.operators.tfrecordcodec import (
        encode_tf_example,
        encode_tfrecord,
        tfrecord_records_table,
    )

    good = encode_tfrecord([encode_tf_example(
        {"doc_id": [1], "lang": ["en"], "n_chars": [10],
         "embed": [0.5]})], "gzip")
    bad = bytearray(encode_tfrecord([encode_tf_example(
        {"doc_id": [2], "lang": ["de"], "n_chars": [20]})]))
    bad[14] ^= 1
    blobs = spark.createDataFrame(
        [(0, bytes(good)), (1, bytes(bad))], "shard int, blob binary"
    )
    rows = tfrecord_records_table(blobs, on_error="quarantine").collect()
    by_shard = {r.shard: r for r in rows}
    assert by_shard[0].doc_id == 1 and by_shard[0].n_floats == 1
    assert by_shard[0].decode_error is None
    assert by_shard[1].doc_id is None
    assert "CRC" in by_shard[1].decode_error
    # raise mode propagates
    with pytest.raises(Exception, match="CRC"):
        tfrecord_records_table(blobs, on_error="raise").collect()
