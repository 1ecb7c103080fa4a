"""Row-format shard sources: Arrow IPC files and SQLite databases —
two more delivery formats real corpus drops arrive in (r10 breadth on
the source tier; the compressed-shard / Avro-OCF model applied to the
formats whose canonical readers ALREADY live in this stack).

* **Arrow IPC (Feather v2)**: decoded with ``pyarrow`` — the reference
  implementation of the format and a first-class dependency of PySpark
  itself (every ``mapInPandas`` batch already crosses Arrow), so this
  is not a new dependency, just the public API of one the engine is
  built on.  The IPC *file* format is the random-access variant
  corpus tooling writes (``.arrow`` / ``.feather``).
* **SQLite**: annotation sets, crawl indexes and metadata sidecars
  commonly ship as ``.sqlite`` files; stdlib ``sqlite3`` +
  ``Connection.deserialize`` reads the database straight from blob
  bytes — no temp files, read-only query access.

Spark shape: both decode inside ``mapInPandas`` (Arrow-batched blobs →
one row per record), the compressed-shard story — shards are the unit
of parallelism, decode never crosses a shuffle, and a malformed blob
routes to a whole-blob quarantine row under ``on_error="quarantine"``.

Untrusted-input notes: SQLite blobs are opened with ``query_only`` and
a statement over an expected table — a missing/malformed schema
raises, never guesses; fuzz shows the stdlib reader survives arbitrary
byte flips.  The Arrow path layers three defenses (r11, closing the
r10 abort surface — previously ~5% of random byte flips killed the
process inside the C++ layer, uncatchable):

1. ``arrowverify.verify_ipc_file`` — a vendored pure-Python bounds
   verifier for the ENTIRE IPC metadata tree (footer, schema + Type
   unions, blocks, message headers, node/buffer extents) built from
   the public format spec, so every offset pyarrow will dereference is
   proven in-bounds first;
2. compressed buffer frames are validated with the bounded
   vendored/native zstd decoder and must inflate to exactly their
   declared prefix (LZ4 bodies, which lack a vendored validator,
   quarantine);
3. ``Table.validate(full=True)`` runs before any value
   materialization — corrupt decompressed offset buffers otherwise
   abort inside ``to_pylist`` (``std::length_error``).

The byte-flip fuzz (see tests) now asserts ZERO aborts — every flip
decodes cleanly or raises ValueError → quarantine row.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated source/ingest extension surface.
"""

from __future__ import annotations

import pandas as pd

__all__ = [
    "arrow_ipc_records_table",
    "arrow_ipc_shard_encoder",
    "sqlite_records_table",
    "sqlite_shard_encoder",
]

ROWS_SCHEMA = "shard int, doc_id bigint, lang string, n_chars bigint"
ROWS_QUARANTINE_SCHEMA = ROWS_SCHEMA + ", decode_error string"
_MAX_BLOB = 1 << 28


_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def _checked_row(did, lang, n) -> tuple:
    """Type/range gate before the Arrow boundary (the msgpack lesson,
    r10 review): int64-ranged ints or NULL for doc_id/n_chars, str or
    NULL for lang — anything else raises → whole-blob quarantine."""
    for name, v in (("doc_id", did), ("n_chars", n)):
        if v is None:
            continue
        if isinstance(v, bool) or not isinstance(v, int):
            raise ValueError(f"row-format field {name} is not an integer")
        if not _I64_MIN <= v <= _I64_MAX:
            raise ValueError(f"row-format field {name} outside int64 range")
    if lang is not None and not isinstance(lang, str):
        raise ValueError("row-format field lang is not a string")
    return did, lang, n


def _records_table(blobs, decode_one, on_error: str):
    if on_error not in ("raise", "quarantine"):
        raise ValueError("on_error must be 'raise' or 'quarantine'")
    quarantine = on_error == "quarantine"
    cols = ["shard", "doc_id", "lang", "n_chars"] + (
        ["decode_error"] if quarantine else []
    )

    def extract(batches):
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in cols}

            def emit(**kv) -> None:
                for k in cols:
                    rows[k].append(kv.get(k))

            for shard, blob in zip(pdf["shard"], pdf["blob"]):
                try:
                    if len(blob) > _MAX_BLOB:
                        raise ValueError("row-format shard past the size cap")
                    # TypeError joins ValueError: these formats carry
                    # dynamic/foreign types (sqlite columns hold
                    # whatever was inserted, an arrow file may declare
                    # any schema), and a crafted blob must become a
                    # quarantine row, not an Arrow-boundary task death
                    recs = [
                        _checked_row(did, lang, n)
                        for did, lang, n in decode_one(bytes(blob))
                    ]
                except (ValueError, TypeError) as exc:
                    if not quarantine:
                        raise
                    emit(shard=int(shard), decode_error=str(exc))
                    continue
                for did, lang, n in recs:
                    emit(shard=int(shard), doc_id=did, lang=lang, n_chars=n)
            yield pd.DataFrame(rows)

    schema = ROWS_QUARANTINE_SCHEMA if quarantine else ROWS_SCHEMA
    return blobs.mapInPandas(extract, schema=schema)


# ---------------------------------------------------------------------------
# Arrow IPC
# ---------------------------------------------------------------------------


def _decode_arrow(blob: bytes) -> list[tuple]:
    import pyarrow as pa

    from hive_udf_spark.operators.arrowverify import verify_ipc_file

    # Pure-Python bounds verification of the ENTIRE metadata tree BEFORE
    # pyarrow parses it: crafted IPC metadata can abort the C++ layer
    # in-process (not catchable), so every offset/length/string pyarrow
    # will dereference is proven in-bounds first (r10 advice; fuzz shows
    # the previously-aborting byte-flip corpus now quarantines cleanly)
    verify_ipc_file(blob)
    try:
        reader = pa.ipc.open_file(pa.BufferReader(blob))
        table = reader.read_all()
        # full validation BEFORE any value materialization: corrupt
        # (decompressed) offset buffers otherwise abort the process
        # inside to_pylist (std::length_error on a bogus string extent)
        table.validate(full=True)
    except (pa.lib.ArrowException, OSError) as exc:
        # ArrowException is the base of Invalid/IOError/NotImplemented/
        # Capacity…: a flipped byte can surface as ANY of them (e.g. a
        # corrupted schema width raises NotImplemented) — all quarantine
        raise ValueError(f"arrow ipc: malformed file: {exc}") from exc
    for col in ("doc_id", "lang", "n_chars"):
        if col not in table.column_names:
            raise ValueError(f"arrow ipc: expected column {col!r} missing")
    # raw python values — the shared _checked_row gate validates types,
    # so a foreign schema (string doc_id etc.) quarantines cleanly
    return list(
        zip(
            table["doc_id"].to_pylist(),
            table["lang"].to_pylist(),
            table["n_chars"].to_pylist(),
        )
    )


def arrow_ipc_records_table(blobs, on_error: str = "raise"):
    """(shard, blob) → one row per Arrow-IPC record via mapInPandas."""
    return _records_table(blobs, _decode_arrow, on_error)


def arrow_ipc_shard_encoder():
    """applyInPandas callable: a shard of documents → ONE Arrow IPC
    file blob (doc_id-sorted, two record batches so the batch walk is
    real, zstd-compressed IPC buffers on odd shards — the format's own
    compression layer, decoded transparently by the reader)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        shard = int(pdf["shard"].iloc[0])
        s = pdf.sort_values("doc_id")
        table = pa.table(
            {
                "doc_id": pa.array(s["doc_id"].astype("int64")),
                "lang": pa.array(s["lang"].astype(str)),
                "n_chars": pa.array(s["n_chars"].astype("int64")),
            }
        )
        sink = pa.BufferOutputStream()
        opts = pa.ipc.IpcWriteOptions(
            compression="zstd" if shard % 2 else None
        )
        with pa.ipc.new_file(sink, table.schema, options=opts) as writer:
            half = max(1, len(s) // 2)
            writer.write_table(table.slice(0, half))
            writer.write_table(table.slice(half))
        return pd.DataFrame(
            {"shard": [shard], "blob": [sink.getvalue().to_pybytes()]}
        )

    return build


# ---------------------------------------------------------------------------
# SQLite
# ---------------------------------------------------------------------------


def _decode_sqlite(blob: bytes) -> list[tuple]:
    import sqlite3

    con = sqlite3.connect(":memory:")
    try:
        try:
            con.deserialize(blob)
        except sqlite3.Error as exc:
            raise ValueError(f"sqlite: malformed database image: {exc}") from exc
        con.execute("PRAGMA query_only = 1")
        try:
            cur = con.execute(
                "SELECT doc_id, lang, n_chars FROM docs ORDER BY doc_id"
            )
            # raw dynamic-typed values; _checked_row gates them
            return [(d, lang, n) for d, lang, n in cur.fetchall()]
        except sqlite3.Error as exc:
            raise ValueError(f"sqlite: expected docs table unreadable: {exc}") from exc
    finally:
        con.close()


def sqlite_records_table(blobs, on_error: str = "raise"):
    """(shard, blob) → one row per SQLite ``docs`` record via
    mapInPandas; the database image is deserialized straight from blob
    bytes (no temp files) and opened query-only."""
    return _records_table(blobs, _decode_sqlite, on_error)


def sqlite_shard_encoder():
    """applyInPandas callable: a shard of documents → ONE SQLite
    database blob with a ``docs`` table (and an index, so the image has
    non-trivial btree structure to walk)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import sqlite3

        shard = int(pdf["shard"].iloc[0])
        con = sqlite3.connect(":memory:")
        try:
            con.execute(
                "CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, "
                "lang TEXT, n_chars INTEGER)"
            )
            con.execute("CREATE INDEX docs_lang ON docs(lang)")
            s = pdf.sort_values("doc_id")
            con.executemany(
                "INSERT INTO docs VALUES (?, ?, ?)",
                [
                    (int(r["doc_id"]), str(r["lang"]), int(r["n_chars"]))
                    for _, r in s.iterrows()
                ],
            )
            con.commit()
            blob = bytes(con.serialize())
        finally:
            con.close()
        return pd.DataFrame({"shard": [shard], "blob": [blob]})

    return build
