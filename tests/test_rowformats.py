"""Arrow IPC + SQLite shard sources (operators/rowformats.py, r10)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_udf_spark.operators.rowformats import (
    _decode_arrow,
    _decode_sqlite,
    arrow_ipc_records_table,
    arrow_ipc_shard_encoder,
    sqlite_records_table,
    sqlite_shard_encoder,
)


def _pdf(shard: int, n: int = 9) -> pd.DataFrame:
    rng = np.random.RandomState(shard)
    ids = rng.permutation(n) * 6 + shard
    return pd.DataFrame(
        {
            "shard": [shard] * n,
            "doc_id": ids.astype("int64"),
            "lang": [f"l{i % 3}" for i in ids],
            "n_chars": (ids * 7).astype("int64"),
        }
    )


@pytest.mark.parametrize(
    "enc,dec",
    [
        (arrow_ipc_shard_encoder, _decode_arrow),
        (sqlite_shard_encoder, _decode_sqlite),
    ],
    ids=["arrow", "sqlite"],
)
def test_shard_roundtrip_sorted(enc, dec):
    for shard in (0, 1, 2):  # arrow: shard%2 toggles zstd buffers
        pdf = _pdf(shard)
        blob = enc()(pdf)["blob"].iloc[0]
        got = dec(blob)
        want = sorted(
            zip(pdf["doc_id"], pdf["lang"], pdf["n_chars"]),
            key=lambda t: t[0],
        )
        assert got == [(int(d), lang, int(n)) for d, lang, n in want]


def test_sqlite_byte_flip_fuzz_never_crashes():
    base = sqlite_shard_encoder()(_pdf(1, 20))["blob"].iloc[0]
    rng = np.random.RandomState(4)
    for _ in range(80):
        blob = bytearray(base)
        i = int(rng.randint(0, len(blob)))
        blob[i] ^= 1 << int(rng.randint(0, 8))
        try:
            out = _decode_sqlite(bytes(blob))
            assert isinstance(out, list)
        except ValueError:
            pass


def test_arrow_byte_flip_fuzz_subprocess_isolated(tmp_path):
    """pyarrow's C++ IPC layer aborts the process on adversarial
    metadata and on corrupt decompressed offset buffers (measured at
    ~5% of random byte flips before r11).  The r11 containment —
    arrowverify.verify_ipc_file metadata pre-validation, vendored-zstd
    buffer-frame validation, and table.validate(full=True) before any
    value materialization — must hold the quarantine contract: every
    flip decodes cleanly or raises ValueError, NEVER aborts.  The fuzz
    still runs per-flip subprocesses so that a regression shows up as
    a counted abort, not a dead pytest."""
    import subprocess
    import sys

    base = arrow_ipc_shard_encoder()(_pdf(1, 20))["blob"].iloc[0]
    path = tmp_path / "base.arrow"
    path.write_bytes(base)
    rng = np.random.RandomState(4)
    outcomes = {"ok": 0, "abort": 0}
    for _ in range(24):
        i = int(rng.randint(0, len(base)))
        bit = int(rng.randint(0, 8))
        code = (
            "import sys; sys.path.insert(0, '/root/repo')\n"
            f"blob = bytearray(open({str(path)!r}, 'rb').read())\n"
            f"blob[{i}] ^= 1 << {bit}\n"
            "from hive_udf_spark.operators.rowformats import _decode_arrow\n"
            "try:\n"
            "    out = _decode_arrow(bytes(blob))\n"
            "    assert isinstance(out, list)\n"
            "except ValueError:\n"
            "    pass\n"
        )
        r = subprocess.run([sys.executable, "-c", code], capture_output=True)
        if r.returncode == 0:
            outcomes["ok"] += 1
        else:
            outcomes["abort"] += 1
    assert outcomes == {"ok": 24, "abort": 0}


def test_arrow_verifier_rejects_crafted_metadata():
    """Targeted rejections for the abort classes the fuzz measured:
    out-of-bounds footer, bogus buffer extents, corrupt compressed
    frames, corrupt string-offset buffers — each must be a ValueError
    from _decode_arrow, in-process (no subprocess shielding here:
    an abort would kill pytest, which is the assertion)."""
    import struct

    base = bytearray(arrow_ipc_shard_encoder()(_pdf(1, 20))["blob"].iloc[0])

    # footer length past the file
    bad = bytearray(base)
    bad[-10:-6] = struct.pack("<i", len(base) * 2)
    with pytest.raises(ValueError):
        _decode_arrow(bytes(bad))

    # truncated mid-footer
    with pytest.raises(ValueError):
        _decode_arrow(bytes(base[: len(base) // 2]))

    # corrupt zstd frame inside a compressed buffer body: flip a byte
    # known (from the r10 abort corpus) to land in batch-2's buffers
    bad = bytearray(base)
    bad[1102] ^= 2
    with pytest.raises(ValueError):
        _decode_arrow(bytes(bad))

    # LZ4-compressed bodies have no vendored validator → quarantine
    import pyarrow as pa

    t = pa.table({"doc_id": [1], "lang": ["a"], "n_chars": [2]})
    sink = pa.BufferOutputStream()
    opts = pa.ipc.IpcWriteOptions(compression="lz4")
    with pa.ipc.new_file(sink, t.schema, options=opts) as w:
        w.write_table(t)
    with pytest.raises(ValueError, match="vendored validator"):
        _decode_arrow(sink.getvalue().to_pybytes())


def test_records_table_quarantine(spark):
    good = arrow_ipc_shard_encoder()(_pdf(0, 5))["blob"].iloc[0]
    df = spark.createDataFrame(
        pd.DataFrame({"shard": [0, 1], "blob": [good, good[:30]]})
    )
    rows = arrow_ipc_records_table(df, on_error="quarantine").collect()
    assert len([r for r in rows if r.decode_error is None]) == 5
    quar = [r for r in rows if r.decode_error is not None]
    assert len(quar) == 1 and quar[0].shard == 1

    good2 = sqlite_shard_encoder()(_pdf(0, 5))["blob"].iloc[0]
    df2 = spark.createDataFrame(
        pd.DataFrame({"shard": [0, 1], "blob": [good2, b"\x00" * 64]})
    )
    rows2 = sqlite_records_table(df2, on_error="quarantine").collect()
    assert len([r for r in rows2 if r.decode_error is None]) == 5
    assert len([r for r in rows2 if r.decode_error is not None]) == 1


def test_sqlite_image_is_readonly_queried():
    """A database image whose docs table is missing quarantines with a
    clear message (schema contract, not a guess)."""
    import sqlite3

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE other (x INTEGER)")
    con.commit()
    blob = bytes(con.serialize())
    con.close()
    with pytest.raises(ValueError, match="docs table"):
        _decode_sqlite(blob)


def test_foreign_schema_type_mismatch_quarantines(spark):
    """Crafted blobs with off-contract field TYPES (string doc_id in
    sqlite, string doc_id column in arrow) quarantine whole-blob
    instead of crashing the Arrow conversion (r10 review gate)."""
    import sqlite3

    import pyarrow as pa

    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE docs (doc_id TEXT, lang TEXT, n_chars INTEGER)")
    con.execute("INSERT INTO docs VALUES ('not-an-int', 'en', 5)")
    con.commit()
    sq_bad = bytes(con.serialize())
    con.close()

    table = pa.table({"doc_id": pa.array(["x"]), "lang": pa.array(["en"]),
                      "n_chars": pa.array([5])})
    sink = pa.BufferOutputStream()
    with pa.ipc.new_file(sink, table.schema) as w:
        w.write_table(table)
    ar_bad = sink.getvalue().to_pybytes()

    df = spark.createDataFrame(pd.DataFrame({"shard": [0], "blob": [sq_bad]}))
    rows = sqlite_records_table(df, on_error="quarantine").collect()
    assert len(rows) == 1 and "not an integer" in rows[0].decode_error

    df2 = spark.createDataFrame(pd.DataFrame({"shard": [0], "blob": [ar_bad]}))
    rows2 = arrow_ipc_records_table(df2, on_error="quarantine").collect()
    assert len(rows2) == 1 and "not an integer" in rows2[0].decode_error
