"""Vendored MessagePack codec — the compact row-log serialization a
large share of data tooling emits (`.msgpack` shard files are the
binary sibling of `.jsonl`: concatenated top-level values, one record
each).  Implemented dependency-free from the public MessagePack
specification (r10 source-tier breadth).

Decoder coverage (the full format-family surface):

* all fix types (positive/negative fixint, fixstr, fixarray, fixmap),
  nil/booleans, uint8/16/32/64, int8/16/32/64 (big-endian),
  float32/float64, str8/16/32 (UTF-8 validated), bin8/16/32,
  array16/32, map16/32, and ext/fixext (returned as (type, bytes)
  tuples — never silently dropped);
* stream form: concatenated top-level values decode to a record list,
  trailing garbage raises;
* bomb discipline: declared string/bin/collection sizes are checked
  against the remaining INPUT before allocation (a 4 GiB str32 header
  on a 100-byte shard fails immediately), nesting depth is capped, and
  total decoded elements are capped — a crafted shard errors, never
  balloons an executor.

Encoder twin ``encode_msgpack`` picks the canonical smallest encoding
for every value (the compatibility profile real writers use), so the
round trip exercises each width boundary the decoder dispatches on.

Spark shape: ``msgpack_records_table`` parses inside ``mapInPandas``
(blob shards → rows), the compressed-shard/Avro model — shards are the
unit of parallelism, malformed blobs quarantine whole-blob.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated source/ingest extension surface.
"""

from __future__ import annotations

import struct

import pandas as pd

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = [
    "decode_msgpack_stream",
    "encode_msgpack",
    "msgpack_records_table",
    "msgpack_shard_encoder",
]

_MAX_DEPTH = 32
_MAX_ELEMENTS = 1 << 22


class _Reader:
    __slots__ = ("b", "i", "elements")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0
        self.elements = 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise ValueError("msgpack: value truncated")
        out = self.b[self.i : self.i + n]
        self.i += n
        return out

    def u(self, n: int) -> int:
        return int.from_bytes(self.take(n), "big")

    def bump(self, n: int = 1) -> None:
        self.elements += n
        if self.elements > _MAX_ELEMENTS:
            raise ValueError("msgpack: element count past the decode cap")


def _decode_str(r: _Reader, n: int) -> str:
    try:
        return r.take(n).decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError(f"msgpack: invalid UTF-8 in str: {exc}") from exc


def _decode_value(r: _Reader, depth: int):
    if depth > _MAX_DEPTH:
        raise ValueError("msgpack: nesting past the depth cap")
    r.bump()
    t = r.take(1)[0]
    if t <= 0x7F:  # positive fixint
        return t
    if t >= 0xE0:  # negative fixint
        return t - 256
    if 0xA0 <= t <= 0xBF:  # fixstr
        return _decode_str(r, t & 0x1F)
    if 0x90 <= t <= 0x9F:  # fixarray
        return [_decode_value(r, depth + 1) for _ in range(t & 0x0F)]
    if 0x80 <= t <= 0x8F:  # fixmap
        return {
            _map_key(_decode_value(r, depth + 1)): _decode_value(r, depth + 1)
            for _ in range(t & 0x0F)
        }
    if t == 0xC0:
        return None
    if t == 0xC2:
        return False
    if t == 0xC3:
        return True
    if t in (0xC4, 0xC5, 0xC6):  # bin8/16/32
        n = r.u(1 << (t - 0xC4))
        return r.take(n)
    if t in (0xD9, 0xDA, 0xDB):  # str8/16/32
        n = r.u(1 << (t - 0xD9))
        return _decode_str(r, n)
    if t == 0xCA:
        return struct.unpack(">f", r.take(4))[0]
    if t == 0xCB:
        return struct.unpack(">d", r.take(8))[0]
    if t in (0xCC, 0xCD, 0xCE, 0xCF):  # uint8/16/32/64
        return r.u(1 << (t - 0xCC))
    if t in (0xD0, 0xD1, 0xD2, 0xD3):  # int8/16/32/64
        n = 1 << (t - 0xD0)
        v = r.u(n)
        return v - (1 << (8 * n)) if v >= 1 << (8 * n - 1) else v
    if t in (0xDC, 0xDD):  # array16/32
        n = r.u(2 if t == 0xDC else 4)
        if n > len(r.b) - r.i:  # each element is ≥ 1 byte
            raise ValueError("msgpack: array length exceeds remaining input")
        return [_decode_value(r, depth + 1) for _ in range(n)]
    if t in (0xDE, 0xDF):  # map16/32
        n = r.u(2 if t == 0xDE else 4)
        if 2 * n > len(r.b) - r.i:
            raise ValueError("msgpack: map length exceeds remaining input")
        return {
            _map_key(_decode_value(r, depth + 1)): _decode_value(r, depth + 1)
            for _ in range(n)
        }
    if 0xD4 <= t <= 0xD8:  # fixext 1/2/4/8/16
        ext_type = struct.unpack(">b", r.take(1))[0]
        return (ext_type, r.take(1 << (t - 0xD4)))
    if t in (0xC7, 0xC8, 0xC9):  # ext8/16/32
        n = r.u(1 << (t - 0xC7))
        ext_type = struct.unpack(">b", r.take(1))[0]
        return (ext_type, r.take(n))
    raise ValueError(f"msgpack: reserved/unknown type byte 0x{t:02x}")


def _map_key(k):
    # every non-collection msgpack value is a spec-valid map key and
    # hashable in Python (str/int/bool/bytes/float/nil/ext tuples);
    # lists/dicts are neither
    if isinstance(k, (str, int, bool, bytes, float, tuple)) or k is None:
        return k
    raise ValueError(f"msgpack: unsupported map key type {type(k).__name__}")


@untrusted_decoder
def decode_msgpack_stream(b: bytes) -> list:
    """Concatenated top-level MessagePack values → list (the
    ``.msgpack`` row-log convention); zero-length input is an empty
    shard; a partial trailing value raises."""
    r = _Reader(b)
    out = []
    while r.i < len(b):
        out.append(_decode_value(r, 0))
    return out


def encode_msgpack(v) -> bytes:
    """One value → its canonical smallest MessagePack encoding."""
    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if v >= 0:
            for code, n in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if v < 1 << (8 * n):
                    return bytes([code]) + v.to_bytes(n, "big")
            raise ValueError("msgpack: integer too large")
        for code, n in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if -(1 << (8 * n - 1)) <= v:
                return bytes([code]) + (v & ((1 << 8 * n) - 1)).to_bytes(n, "big")
        raise ValueError("msgpack: integer too small")
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        enc = v.encode("utf-8")
        n = len(enc)
        if n <= 31:
            return bytes([0xA0 | n]) + enc
        for code, w in ((0xD9, 1), (0xDA, 2), (0xDB, 4)):
            if n < 1 << (8 * w):
                return bytes([code]) + n.to_bytes(w, "big") + enc
        raise ValueError("msgpack: string too long")
    if isinstance(v, (bytes, bytearray)):
        n = len(v)
        for code, w in ((0xC4, 1), (0xC5, 2), (0xC6, 4)):
            if n < 1 << (8 * w):
                return bytes([code]) + n.to_bytes(w, "big") + bytes(v)
        raise ValueError("msgpack: bytes too long")
    if (
        isinstance(v, tuple)
        and len(v) == 2
        and isinstance(v[0], int)
        and isinstance(v[1], bytes)
    ):  # (ext_type, payload)
        ext_type, payload = v
        n = len(payload)
        fix = {1: 0xD4, 2: 0xD5, 4: 0xD6, 8: 0xD7, 16: 0xD8}.get(n)
        tb = struct.pack(">b", ext_type)
        if fix is not None:
            return bytes([fix]) + tb + payload
        for code, w in ((0xC7, 1), (0xC8, 2), (0xC9, 4)):
            if n < 1 << (8 * w):
                return bytes([code]) + n.to_bytes(w, "big") + tb + payload
        raise ValueError("msgpack: ext too long")
    if isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 15:
            head = bytes([0x90 | n])
        elif n < 1 << 16:
            head = b"\xdc" + n.to_bytes(2, "big")
        else:
            head = b"\xdd" + n.to_bytes(4, "big")
        return head + b"".join(encode_msgpack(x) for x in v)
    if isinstance(v, dict):
        n = len(v)
        if n <= 15:
            head = bytes([0x80 | n])
        elif n < 1 << 16:
            head = b"\xde" + n.to_bytes(2, "big")
        else:
            head = b"\xdf" + n.to_bytes(4, "big")
        return head + b"".join(
            encode_msgpack(k) + encode_msgpack(x) for k, x in v.items()
        )
    raise ValueError(f"msgpack: unsupported type {type(v).__name__}")


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

ROWS_SCHEMA = "shard int, doc_id bigint, lang string, n_chars bigint, n_tags int"
ROWS_QUARANTINE_SCHEMA = ROWS_SCHEMA + ", decode_error string"


_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def _validate_record(rec) -> str | None:
    """Schema gate over a schemaless decode: the record must be a map
    whose surfaced fields fit the declared Spark types (int64-ranged
    ints or NULL for doc_id/n_chars, str or NULL for lang).  Returns an
    error string (→ quarantine row) or None."""
    if not isinstance(rec, dict):
        return "msgpack: record is not a map"
    for field in ("doc_id", "n_chars"):
        v = rec.get(field)
        if v is None:
            continue
        if isinstance(v, bool) or not isinstance(v, int):
            return f"msgpack: field {field} is not an integer"
        if not _I64_MIN <= v <= _I64_MAX:
            return f"msgpack: field {field} outside int64 range"
    lang = rec.get("lang")
    if lang is not None and not isinstance(lang, str):
        return "msgpack: field lang is not a string"
    return None


def msgpack_records_table(blobs, on_error: str = "raise"):
    """(shard, blob) → one row per record; records are maps with
    doc_id/lang/n_chars plus a nested ``tags`` array whose LENGTH is
    surfaced (nested collections must really decode)."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError("on_error must be 'raise' or 'quarantine'")
    quarantine = on_error == "quarantine"
    cols = ["shard", "doc_id", "lang", "n_chars", "n_tags"] + (
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
                    recs = decode_msgpack_stream(bytes(blob))
                except ValueError as exc:
                    if not quarantine:
                        raise
                    emit(shard=int(shard), decode_error=str(exc))
                    continue
                for rec in recs:
                    # msgpack is SCHEMALESS: every field must be type-
                    # and range-validated here, or a crafted shard with
                    # e.g. doc_id="x" / doc_id=2**64-1 would crash the
                    # Arrow conversion and kill the task — the exact
                    # case quarantine mode exists for (r10 review item)
                    err = _validate_record(rec)
                    if err is not None:
                        if not quarantine:
                            raise ValueError(err)
                        emit(shard=int(shard), decode_error=err)
                        continue
                    tags = rec.get("tags")
                    emit(
                        shard=int(shard),
                        doc_id=rec.get("doc_id"),
                        lang=rec.get("lang"),
                        n_chars=rec.get("n_chars"),
                        n_tags=len(tags) if isinstance(tags, list) else None,
                    )
            yield pd.DataFrame(rows)

    schema = ROWS_QUARANTINE_SCHEMA if quarantine else ROWS_SCHEMA
    return blobs.mapInPandas(extract, schema=schema)


def msgpack_shard_encoder():
    """applyInPandas callable: a shard of documents → ONE ``.msgpack``
    stream blob of concatenated record maps.  Values are chosen to
    cross the width boundaries the decoder dispatches on: doc_id lands
    in fixint/uint8/uint16/uint32 as it grows, lang rotates fixstr,
    n_chars may need uint16, and each record carries a nested ``tags``
    fixarray of (doc_id % 4) fixints plus a nil field."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        out = bytearray()
        for _, row in pdf.sort_values("doc_id").iterrows():
            did = int(row["doc_id"])
            rec = {
                "doc_id": did,
                "lang": str(row["lang"]),
                "n_chars": int(row["n_chars"]),
                "tags": list(range(did % 4)),
                "note": None,
            }
            out += encode_msgpack(rec)
        return pd.DataFrame({"shard": [shard], "blob": [bytes(out)]})

    return build
