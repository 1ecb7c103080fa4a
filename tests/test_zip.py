"""ZIP archive codec (operators/zipcodec.py, r6)."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from hive_udf_spark.operators.zipcodec import encode_zip, split_zip_entries

ENTRIES = [("a/doc1.txt", b"hello world " * 100), ("doc2.bin", bytes(range(256)) * 7), ("empty.txt", b"")]


def test_roundtrip_both_methods_and_stdlib_cross_check():
    for m in (0, 8):
        z = encode_zip(ENTRIES, method=m)
        assert split_zip_entries(z) == ENTRIES
        with zipfile.ZipFile(io.BytesIO(z)) as zf:  # stdlib reads ours
            assert [(i.filename, zf.read(i)) for i in zf.infolist()] == ENTRIES
    buf = io.BytesIO()  # we read stdlib's
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for n, d in ENTRIES:
            zf.writestr(n, d)
    assert split_zip_entries(buf.getvalue()) == ENTRIES


def test_mixed_methods_one_archive():
    z = encode_zip([("a.txt", b"x" * 500, 8), ("b.txt", b"stored", 0)])
    assert split_zip_entries(z) == [("a.txt", b"x" * 500), ("b.txt", b"stored")]


def test_archive_comment_and_prefix_garbage():
    z = encode_zip(ENTRIES)
    eocd = z.rfind(b"PK\x05\x06")
    commented = z[: eocd + 20] + struct.pack("<H", 9) + b"a comment"
    assert split_zip_entries(commented) == ENTRIES
    # self-extractor-style prefix: central-directory offsets break, and
    # the walk must say so rather than return wrong payloads
    with pytest.raises(ValueError, match="local header|central directory"):
        split_zip_entries(b"#!/bin/sh\n" + z)


def test_malformed_archives_raise():
    z = encode_zip(ENTRIES)
    with pytest.raises(ValueError, match="end-of-central-directory"):
        split_zip_entries(b"PK\x03\x04 not a real zip")
    # corrupt one payload byte -> CRC mismatch (or inflate failure)
    bad = bytearray(z)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-32|inflate"):
        split_zip_entries(bytes(bad))
    # truncated payload
    hacked = bytearray(z)
    # patch EOCD cd_off to point past the end
    eocd = z.rfind(b"PK\x05\x06")
    struct.pack_into("<I", hacked, eocd + 16, len(z))
    with pytest.raises(ValueError, match="central directory"):
        split_zip_entries(bytes(hacked))
    with pytest.raises(ValueError, match="method"):
        encode_zip([("x", b"y", 12)])


def test_zip_inflate_is_bounded_by_declared_size():
    """r6 advisor: inflate was uncapped before the size check.  Declared
    sizes over the decode cap are rejected pre-allocation, and a deflate
    stream inflating past its own declared usize raises at usize+1 bytes
    instead of ballooning."""
    from hive_udf_spark.operators import zipcodec as zc

    big = b"\x00" * (1 << 20)  # inflates 1 MiB from ~1 KiB compressed
    z = encode_zip([("bomb.bin", big, 8)])
    old = zc._MAX_ENTRY_BYTES
    zc._MAX_ENTRY_BYTES = 1 << 16  # 64 KiB cap for the test
    try:
        with pytest.raises(ValueError, match="decode cap"):
            split_zip_entries(z)
    finally:
        zc._MAX_ENTRY_BYTES = old
    # understate usize in BOTH central-dir and the check: inflate stops at
    # usize+1 and reports the mismatch rather than producing the full blob
    lied = bytearray(z)
    cd = z.find(b"PK\x01\x02")
    struct.pack_into("<I", lied, cd + 24, 64)  # central-dir usize -> 64
    with pytest.raises(ValueError, match="inflated to 65 of 64"):
        split_zip_entries(bytes(lied))


def test_zip_entries_table_through_spark(spark):
    from hive_udf_spark.operators.zipcodec import zip_entries_table

    z = encode_zip([("doc.txt", b"abcd", 8), ("m.txt", b"id=9", 0)])
    blobs = spark.createDataFrame([(9, bytearray(z))], "doc_id bigint, blob binary")
    rows = {r.entry_idx: r for r in zip_entries_table(blobs).collect()}
    assert rows[0].name == "doc.txt" and rows[0].n_bytes == 4
    assert rows[0].byte_sum == sum(b"abcd")
    assert rows[1].name == "m.txt" and rows[1].byte_sum == sum(b"id=9")


def test_zip_entries_table_quarantine(spark):
    from hive_udf_spark.operators.zipcodec import zip_entries_table

    good = encode_zip([("doc.txt", b"abcd", 8)])
    bad = bytearray(good)
    bad[40] ^= 0xFF  # CRC mismatch
    rows = [(1, bytearray(good)), (2, bad), (3, bytearray(b"PKjunk"))]
    blobs = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    out = {
        (r.doc_id, r.entry_idx): r
        for r in zip_entries_table(blobs, on_error="quarantine").collect()
    }
    assert out[(1, 0)].name == "doc.txt" and out[(1, 0)].decode_error is None
    for b in (2, 3):
        r = out[(b, -1)]
        assert r.name is None and r.decode_error


def _raw_zip_single(name: bytes, comp: bytes, usize: int, crc: int) -> bytes:
    """Hand-assembled single-entry DEFLATE zip so csize can cover a
    truncated or garbage-padded compressed stream (stdlib zipfile won't
    write one)."""
    lh = (
        struct.pack(
            "<4sHHHHHIIIHH",
            b"PK\x03\x04", 20, 0, 8, 0, 0, crc, len(comp), usize, len(name), 0,
        )
        + name
    )
    cd = (
        struct.pack(
            "<4sHHHHHHIIIHHHHHII",
            b"PK\x01\x02", 20, 20, 0, 8, 0, 0,
            crc, len(comp), usize, len(name), 0, 0, 0, 0, 0, 0,
        )
        + name
    )
    cd_off = len(lh) + len(comp)
    eocd = struct.pack(
        "<4sHHHHIIH", b"PK\x05\x06", 0, 0, 1, 1, len(cd), cd_off, 0
    )
    return lh + comp + cd + eocd


def test_zip_deflate_stream_completeness():
    """r7 advisor: a truncated deflate stream that still emits exactly
    usize bytes passed the size check AND the CRC (the bytes are all
    there — only the stream terminator is missing), and trailing garbage
    inside csize was silently ignored.  Both are malformed now."""
    import zlib

    data = b"A" * 100
    c = zlib.compressobj(wbits=-15)
    comp = c.compress(data) + c.flush()
    crc = zlib.crc32(data) & 0xFFFFFFFF

    # sanity: the truncation really does emit all 100 bytes without eof
    d = zlib.decompressobj(wbits=-15)
    assert d.decompress(comp[:-1], 101) == data and not d.eof

    with pytest.raises(ValueError, match="stream truncated"):
        split_zip_entries(_raw_zip_single(b"t.bin", comp[:-1], 100, crc))
    with pytest.raises(ValueError, match="trailing bytes"):
        split_zip_entries(_raw_zip_single(b"g.bin", comp + b"\x00junk", 100, crc))
    # the untampered stream still decodes
    assert split_zip_entries(_raw_zip_single(b"ok.bin", comp, 100, crc)) == [
        ("ok.bin", data)
    ]
