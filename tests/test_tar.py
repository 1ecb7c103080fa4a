"""Tar / WebDataset tests — encode↔decode round-trips for all three
container formats (± gzip), CROSS-VALIDATION against CPython's stdlib
``tarfile`` in BOTH directions (our archives read by tarfile; tarfile's
ustar/GNU/PAX output read by our walker — a true reference oracle),
checksum/PAX/structure quarantine, the WebDataset contiguity grouping,
and the Spark table operators.

No reference analogue (the reference is MLnick/hive-udf, a
cardinality-UDAF package) — mandated multimodal extension surface.
"""

from __future__ import annotations

import io
import tarfile

import pytest

from hive_udf_spark.operators.tarcodec import (
    encode_tar,
    split_tar_entries,
    tar_entries_table,
    webdataset_samples_table,
)

ENTRIES = [
    ("doc.txt", b"hello world"),
    ("meta.txt", b"id=42"),
    ("sub/dir/file.bin", bytes(range(256))),
    ("empty", b""),
]
LONG = "a" * 150 + "/deeply/nested/" + "b" * 60 + ".txt"


@pytest.mark.parametrize("fmt", ["ustar", "gnu", "pax"])
@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_and_stdlib_reads_ours(fmt, gz):
    es = ENTRIES + ([(LONG, b"LN")] if fmt != "ustar" else [])
    blob = encode_tar(es, fmt=fmt, gzip_wrap=gz)
    assert split_tar_entries(blob) == es
    tf = tarfile.open(fileobj=io.BytesIO(blob), mode="r:gz" if gz else "r:")
    ref = [
        (m.name, tf.extractfile(m).read())
        for m in tf.getmembers()
        if m.isfile() and m.name != "././@LongLink"
    ]
    assert ref == es


@pytest.mark.parametrize(
    "tf_fmt", [tarfile.USTAR_FORMAT, tarfile.GNU_FORMAT, tarfile.PAX_FORMAT]
)
def test_we_read_stdlib_output(tf_fmt):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tf_fmt) as tf:
        for n, d in ENTRIES:
            ti = tarfile.TarInfo(n)
            ti.size = len(d)
            tf.addfile(ti, io.BytesIO(d))
        if tf_fmt != tarfile.USTAR_FORMAT:
            ti = tarfile.TarInfo(LONG)
            ti.size = 2
            tf.addfile(ti, io.BytesIO(b"LN"))
        ti = tarfile.TarInfo("adir")
        ti.type = tarfile.DIRTYPE
        tf.addfile(ti)
    want = ENTRIES + ([(LONG, b"LN")] if tf_fmt != tarfile.USTAR_FORMAT else [])
    assert split_tar_entries(buf.getvalue()) == want


def test_ustar_prefix_field():
    """A >100-byte path split across prefix/name (stdlib emits this
    shape for long ustar paths) reassembles."""
    name = "p" * 90 + "/" + "q" * 60 + ".txt"
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        ti = tarfile.TarInfo(name)
        ti.size = 3
        tf.addfile(ti, io.BytesIO(b"xyz"))
    assert split_tar_entries(buf.getvalue()) == [(name, b"xyz")]


def test_base256_size_field():
    """GNU base-256 size encoding (high bit set) decodes."""
    blob = bytearray(encode_tar([("big", b"ABCDE")]))
    blob[124:136] = b"\x80" + b"\x00" * 10 + bytes([5])
    # re-checksum
    h = blob[0:512]
    chk = sum(h[:148]) + 8 * 0x20 + sum(h[156:512])
    blob[148:156] = f"{chk:06o}".encode() + b"\x00 "
    assert split_tar_entries(bytes(blob)) == [("big", b"ABCDE")]


def test_quarantine_paths():
    good = encode_tar(ENTRIES)
    bad = bytearray(good)
    bad[0] ^= 0xFF  # breaks the header checksum
    with pytest.raises(ValueError, match="checksum"):
        split_tar_entries(bytes(bad))
    with pytest.raises(ValueError, match="overruns"):
        split_tar_entries(good[: 512 + 8])  # data truncated mid-entry
    with pytest.raises(ValueError, match="trailing partial block"):
        # strip both end-of-archive zero blocks, leave a dangling fragment
        split_tar_entries(good[:-1024] + b"\x00" * 10)
    # truncating INTO the end-of-archive marker still parses: the walk
    # returns at the first complete zero block
    assert split_tar_entries(good[:-2]) == ENTRIES
    # corrupt gzip wrapper
    gz = bytearray(encode_tar(ENTRIES, gzip_wrap=True))
    gz[len(gz) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        split_tar_entries(bytes(gz))
    # malformed PAX record
    rec = b"7 x=y\n"  # wrong length
    blob = encode_tar([("a.txt", b"d")], fmt="pax").replace(b"path=a.txt", b"paXX=a.txt")
    # still parses (unknown keys skipped) — name falls back to header name
    assert split_tar_entries(blob) == [("a.txt", b"d")]


def test_tar_zst_transparent(tmp_path):
    """r9: a .tar.zst archive (vendored RFC 8878 wrap) splits
    transparently, cross-checked against the system zstd CLI when
    present; corrupt zstd wrapper → ValueError."""
    import shutil
    import subprocess

    blob = encode_tar(ENTRIES, fmt="pax", gzip_wrap="zstd")
    assert blob[:4] == b"\x28\xb5\x2f\xfd"
    assert split_tar_entries(blob) == ENTRIES
    cli = shutil.which("zstd") or "/root/miniconda/bin/zstd"
    import os

    if os.path.exists(cli):
        # a REAL zstd-compressed tar must also split transparently
        raw = encode_tar(ENTRIES, fmt="gnu")
        real = subprocess.run([cli, "-19", "-c"], input=raw,
                              capture_output=True, check=True).stdout
        assert split_tar_entries(real) == ENTRIES
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        split_tar_entries(bytes(bad))


def test_pax_record_validation():
    from hive_udf_spark.operators.tarcodec import _parse_pax

    assert _parse_pax(b"11 path=ab\n") == {"path": "ab"}
    with pytest.raises(ValueError, match="length"):
        _parse_pax(b"99 path=ab\n")
    with pytest.raises(ValueError, match="newline"):
        _parse_pax(b"10 path=ab")
    with pytest.raises(ValueError, match="'='"):
        _parse_pax(b"7 path\n")


def test_fuzz_byte_flips_never_escape():
    import numpy as np

    rng = np.random.default_rng(4)
    for base in [
        bytearray(encode_tar(ENTRIES, fmt="pax")),
        bytearray(encode_tar(ENTRIES, fmt="gnu", gzip_wrap=True)),
    ]:
        for _ in range(200):
            b = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
            try:
                out = split_tar_entries(bytes(b))
                assert isinstance(out, list)
            except ValueError:
                pass


# ---------------------------------------------------------------------------
# WebDataset grouping
# ---------------------------------------------------------------------------


def _wds_shard(samples: list[tuple[str, list[tuple[str, bytes]]]]) -> bytes:
    entries = []
    for key, members in samples:
        for ext, data in members:
            entries.append((f"{key}.{ext}" if ext else key, data))
    return encode_tar(entries)


def test_wds_grouping_contiguous(spark):
    shard = _wds_shard(
        [
            ("s01", [("txt", b"hello"), ("cls", b"3"), ("seg.json", b"{}")]),
            ("s02", [("txt", b"world!"), ("cls", b"7")]),
        ]
    )
    blobs = spark.createDataFrame([(1, bytearray(shard))], "doc_id long, blob binary")
    rows = {r.key: r for r in webdataset_samples_table(blobs).collect()}
    assert set(rows) == {"s01", "s02"}
    a = rows["s01"]
    assert a.n_members == 3
    assert a.exts == "cls,seg.json,txt"  # multi-dot ext splits at FIRST dot
    assert a.total_bytes == 5 + 1 + 2
    assert a.byte_sum == sum(b"hello") + ord("3") + sum(b"{}")
    b = rows["s02"]
    assert b.sample_idx == 1 and b.n_members == 2


def test_wds_non_contiguous_sample_raises(spark):
    shard = encode_tar(
        [("s1.txt", b"a"), ("s2.txt", b"b"), ("s1.cls", b"0")]  # s1 resumes
    )
    blobs = spark.createDataFrame([(1, bytearray(shard))], "doc_id long, blob binary")
    with pytest.raises(Exception, match="not contiguous"):
        webdataset_samples_table(blobs).collect()


def test_tar_entries_table_and_quarantine(spark):
    from hive_udf_spark.operators.tarcodec import tar_doc_encoder_udf

    docs = spark.createDataFrame(
        [(i, f"text body {i}") for i in range(8)], "doc_id long, text string"
    )
    enc = tar_doc_encoder_udf()
    blobs = docs.select("doc_id", enc("doc_id", "text").alias("blob"))
    out = tar_entries_table(blobs).collect()
    assert len(out) == 16
    for r in out:
        if r.entry_idx == 0:
            assert r.name == "doc.txt"
            assert r.byte_sum == sum(f"text body {r.doc_id}".encode())
    # quarantine mode: one bad blob → one -1 row, good rows unaffected
    bad = spark.createDataFrame(
        [(99, bytearray(b"notatarfile" + b"\x00" * 600))], "doc_id long, blob binary"
    )
    rows = tar_entries_table(bad, on_error="quarantine").collect()
    assert len(rows) == 1 and rows[0].entry_idx == -1
    assert rows[0].decode_error
