"""Vendored ZIP archive reader (PKZIP APPNOTE format).

Document bundles, model artifacts, and scraped-site dumps routinely
arrive zipped; this is the dependency-free archive walk: End-Of-Central-
Directory discovery (scanned backward from the tail through a possible
archive comment), central-directory entry parse, local-header
cross-check, STORED (method 0) and DEFLATE (method 8, raw zlib
``wbits=-15``) extraction, and CRC-32 validation of every extracted
payload — a lying archive is an error, not a silent short read.
Zip64, encryption, and other compression methods raise explicitly.

The central directory — not a sequential local-header walk — is
authoritative, exactly like real unzip tools: appended garbage or
self-extractor prefixes don't break parsing, and entry count comes from
the directory.

``encode_zip`` is the fixture twin (correct CRCs, central directory,
both methods). No reference analogue (the reference is a
cardinality-UDAF package, MLnick/hive-udf UDAFCardinalityEstimator.java)
— this supports the mandated multimodal/text extension surface.
"""

from __future__ import annotations

import struct
import zlib

import pandas as pd

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = ["split_zip_entries", "encode_zip", "zip_entries_table", "zip_doc_encoder_udf"]

_EOCD_MAGIC = b"PK\x05\x06"
# Per-entry inflate cap: untrusted central-directory sizes beyond this are
# rejected before any allocation (an executor task holds the whole entry).
_MAX_ENTRY_BYTES = 1 << 30
_CDIR_MAGIC = b"PK\x01\x02"
_LOCAL_MAGIC = b"PK\x03\x04"


@untrusted_decoder
def split_zip_entries(b: bytes) -> list[tuple[str, bytes]]:
    """Parse a ZIP archive into ordered (name, data) entries via the
    central directory, CRC-validating every payload."""
    # EOCD: fixed 22 bytes + variable comment; scan back for the magic
    scan_from = max(0, len(b) - 22 - 0xFFFF)
    eocd = b.rfind(_EOCD_MAGIC, scan_from)
    if eocd < 0:
        raise ValueError("ZIP: no end-of-central-directory record")
    if eocd + 22 > len(b):
        raise ValueError("ZIP: EOCD truncated")
    (n_disk, n_total, _cd_size, cd_off, _clen) = struct.unpack_from(
        "<HHIIH", b, eocd + 8
    )
    if n_disk != n_total:
        raise ValueError("multi-disk ZIP not vendored")
    entries: list[tuple[str, bytes]] = []
    pos = cd_off
    for _ in range(n_total):
        if b[pos : pos + 4] != _CDIR_MAGIC:
            raise ValueError(f"ZIP: central directory corrupt at byte {pos}")
        (
            _ver_made, _ver_need, flags, method, _mt, _md,
            crc, csize, usize, nlen, elen, clen2, _disk, _iattr, _eattr, lho,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", b, pos + 4)
        if flags & 0x01:
            raise ValueError("encrypted ZIP entry not vendored")
        if csize == 0xFFFFFFFF or usize == 0xFFFFFFFF or lho == 0xFFFFFFFF:
            raise ValueError("Zip64 not vendored")
        name = b[pos + 46 : pos + 46 + nlen].decode("utf-8", "replace")
        pos += 46 + nlen + elen + clen2
        # local header cross-check, then the payload
        if b[lho : lho + 4] != _LOCAL_MAGIC:
            raise ValueError(f"ZIP entry {name!r}: bad local header offset")
        lnlen, lelen = struct.unpack_from("<HH", b, lho + 26)
        data_off = lho + 30 + lnlen + lelen
        if data_off + csize > len(b):
            raise ValueError(f"ZIP entry {name!r}: payload truncated")
        raw = b[data_off : data_off + csize]
        if method == 0:  # stored
            if csize != usize:
                raise ValueError(f"ZIP entry {name!r}: stored sizes disagree")
            data = raw
        elif method == 8:  # deflate
            if usize > _MAX_ENTRY_BYTES:
                raise ValueError(
                    f"ZIP entry {name!r}: declared size {usize} over the "
                    f"{_MAX_ENTRY_BYTES}-byte decode cap"
                )
            try:
                # Bounded inflate: never produce more than the declared
                # size + 1, so a crafted deflate stream can't balloon past
                # its own metadata before the size check below fires.
                d = zlib.decompressobj(wbits=-15)
                data = d.decompress(raw, usize + 1)
            except zlib.error as exc:
                raise ValueError(f"ZIP entry {name!r}: inflate failed: {exc}") from exc
            if len(data) != usize:
                raise ValueError(
                    f"ZIP entry {name!r}: inflated to {len(data)} of {usize} bytes"
                )
            # Stream-completeness guarantee independent of the CRC below: a
            # truncated deflate stream that happens to emit exactly usize
            # bytes, or trailing garbage inside the declared csize, is
            # malformed even when the bytes it did emit checksum clean.
            if not d.eof:
                raise ValueError(f"ZIP entry {name!r}: deflate stream truncated")
            if d.unused_data:
                raise ValueError(
                    f"ZIP entry {name!r}: {len(d.unused_data)} trailing bytes "
                    "after deflate stream end"
                )
        else:
            raise ValueError(f"ZIP compression method {method} not vendored (0/8)")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"ZIP entry {name!r}: CRC-32 mismatch")
        entries.append((name, data))
    return entries


ZIP_ENTRIES_SCHEMA = (
    "doc_id bigint, entry_idx int, name string, n_bytes bigint, byte_sum bigint"
)
ZIP_ENTRIES_QUARANTINE_SCHEMA = ZIP_ENTRIES_SCHEMA + ", decode_error string"


def zip_entries_table(blobs, on_error: str = "raise"):
    """(doc_id, blob) → one row per archive entry via mapInPandas:
    (doc_id, entry_idx, name, n_bytes, byte_sum) — integer-exact stats
    over the CRC-validated extracted bytes. Map-side only: archives
    never cross a shuffle.

    ``on_error="quarantine"``: a malformed archive becomes ONE row with
    entry_idx = -1 and the message in ``decode_error`` (whole-archive
    quarantine — a corrupt central directory invalidates every entry
    offset); good archives carry decode_error = NULL."""
    from collections.abc import Iterator

    import numpy as np

    if on_error not in ("raise", "quarantine"):
        raise ValueError("on_error must be 'raise' or 'quarantine'")
    quarantine = on_error == "quarantine"
    cols = ["doc_id", "entry_idx", "name", "n_bytes", "byte_sum"] + (
        ["decode_error"] if quarantine else []
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in cols}

            def emit(**kv) -> None:
                for k in cols:
                    rows[k].append(kv.get(k))

            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                try:
                    entries = split_zip_entries(bytes(blob))
                except ValueError as exc:
                    if not quarantine:
                        raise
                    emit(doc_id=int(doc_id), entry_idx=-1, decode_error=str(exc))
                    continue
                for i, (name, data) in enumerate(entries):
                    arr = np.frombuffer(data, dtype=np.uint8)
                    emit(
                        doc_id=int(doc_id),
                        entry_idx=i,
                        name=name,
                        n_bytes=len(data),
                        byte_sum=int(arr.sum(dtype=np.int64)),
                    )
            yield pd.DataFrame(rows)

    schema = ZIP_ENTRIES_QUARANTINE_SCHEMA if quarantine else ZIP_ENTRIES_SCHEMA
    return blobs.mapInPandas(extract, schema=schema)


def zip_doc_encoder_udf():
    """Arrow-batched ZIP fixture encoder: (doc_id, text) → a two-entry
    archive — ``doc.txt`` (the text, DEFLATE) and ``meta.txt``
    (``id=<doc_id>``, STORED) — exercising both extraction methods plus
    the CRC and central-directory paths on every row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def enc(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        def one(did: int, t: str) -> bytes:
            return encode_zip(
                [
                    ("doc.txt", t.encode("utf-8"), 8),
                    ("meta.txt", f"id={did}".encode("ascii"), 0),
                ]
            )

        return pd.Series([one(int(d), t) for d, t in zip(doc_id, text)])

    return enc


def encode_zip(entries: list, method: int = 8) -> bytes:
    """Assemble entries into a ZIP archive with correct CRCs, sizes, and
    central directory. Each entry is ``(name, data)`` (compressed with
    ``method``) or ``(name, data, entry_method)`` — 8 = deflate,
    0 = stored; mixing methods in one archive is allowed, as in real
    tools."""
    out = bytearray()
    cdir = bytearray()
    n = 0
    for entry in entries:
        name, data = entry[0], entry[1]
        m = entry[2] if len(entry) > 2 else method
        if m not in (0, 8):
            raise ValueError("method must be 0 (stored) or 8 (deflate)")
        nb = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if m == 8:
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(data) + co.flush()
        else:
            payload = data
        lho = len(out)
        out += _LOCAL_MAGIC + struct.pack(
            "<HHHHHIIIHH", 20, 0, m, 0, 0, crc, len(payload), len(data),
            len(nb), 0,
        ) + nb + payload
        cdir += _CDIR_MAGIC + struct.pack(
            "<HHHHHHIIIHHHHHII", 20, 20, 0, m, 0, 0, crc, len(payload),
            len(data), len(nb), 0, 0, 0, 0, 0, lho,
        ) + nb
        n += 1
    cd_off = len(out)
    out += cdir
    out += _EOCD_MAGIC + struct.pack("<HHHHIIH", 0, 0, n, n, len(cdir), cd_off, 0)
    return bytes(out)
