"""Vendored CBOR codec (RFC 8949) — the IETF binary row/object format
(COSE, WebAuthn, sensor/event logs); ``.cbor`` sequence files are the
standards-track sibling of ``.msgpack`` shards.  Implemented
dependency-free from the public RFC (r10 source-tier breadth).

Decoder coverage:

* all major types: unsigned/negative integers (widths 0-23/u8/u16/
  u32/u64), byte strings, UTF-8 text strings (validated), arrays,
  maps, tags (surfaced as ``("tag", n, value)`` triples — never
  silently dropped), simple values (false/true/null/undefined +
  numbered simples), half/single/double floats (the half-float path
  real CBOR uses for small reals);
* INDEFINITE-length byte/text strings (definite chunks until the
  0xFF break; chunk major type enforced), arrays and maps — the
  streaming-writer forms MessagePack doesn't have;
* sequence form (RFC 8742): concatenated top-level values decode to a
  record list; a partial trailing value raises;
* bomb discipline: declared lengths check against remaining INPUT
  before allocation, nesting depth and total element counts are
  capped, breaks outside indefinite context raise.

Encoder twin ``encode_cbor`` writes canonical smallest-width definite
encodings by default and — with ``indefinite=True`` — the indefinite
container/chunked-string forms, so both writer families reach the
decoder from one fixture.

Spark shape: ``cbor_records_table`` parses inside ``mapInPandas``, the
shard-source model — map-side decode, whole-blob quarantine, the
shared type/range gate before the Arrow boundary.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated source/ingest extension surface.
"""

from __future__ import annotations

import struct

import pandas as pd

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = [
    "decode_cbor_stream",
    "encode_cbor",
    "cbor_records_table",
    "cbor_shard_encoder",
]

_MAX_DEPTH = 32
_MAX_ELEMENTS = 1 << 22
_BREAK = object()


class _Reader:
    __slots__ = ("b", "i", "elements")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0
        self.elements = 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise ValueError("cbor: value truncated")
        out = self.b[self.i : self.i + n]
        self.i += n
        return out

    def bump(self) -> None:
        self.elements += 1
        if self.elements > _MAX_ELEMENTS:
            raise ValueError("cbor: element count past the decode cap")


def _arg(r: _Reader, add: int, what: str) -> int:
    if add < 24:
        return add
    if add == 24:
        return r.take(1)[0]
    if add == 25:
        return int.from_bytes(r.take(2), "big")
    if add == 26:
        return int.from_bytes(r.take(4), "big")
    if add == 27:
        return int.from_bytes(r.take(8), "big")
    raise ValueError(f"cbor: additional info {add} invalid for {what}")


def _chunked_string(r: _Reader, major: int, depth: int) -> bytes:
    """Indefinite-length string: definite chunks of the SAME major
    type until the break byte."""
    parts = []
    total = 0
    while True:
        if r.i >= len(r.b):
            raise ValueError("cbor: indefinite string missing break")
        ib = r.b[r.i]
        if ib == 0xFF:
            r.i += 1
            return b"".join(parts)
        r.i += 1
        if ib >> 5 != major or (ib & 0x1F) == 31:
            raise ValueError("cbor: indefinite string chunk of wrong type")
        n = _arg(r, ib & 0x1F, "string chunk")
        if n > len(r.b) - r.i:
            raise ValueError("cbor: string chunk length exceeds remaining input")
        total += n
        parts.append(r.take(n))


def _map_key(k):
    if isinstance(k, (str, int, bool, bytes, float, tuple)) or k is None:
        try:
            hash(k)  # a tag/simple tuple may WRAP an unhashable list
            return k
        except TypeError:
            pass
    raise ValueError(f"cbor: unsupported map key type {type(k).__name__}")


def _decode_value(r: _Reader, depth: int, allow_break: bool = False):
    if depth > _MAX_DEPTH:
        raise ValueError("cbor: nesting past the depth cap")
    r.bump()
    ib = r.take(1)[0]
    major, add = ib >> 5, ib & 0x1F
    if major == 0:
        return _arg(r, add, "uint")
    if major == 1:
        return -1 - _arg(r, add, "negint")
    if major in (2, 3):
        if add == 31:
            raw = _chunked_string(r, major, depth)
        else:
            n = _arg(r, add, "string")
            if n > len(r.b) - r.i:
                raise ValueError("cbor: string length exceeds remaining input")
            raw = r.take(n)
        if major == 2:
            return raw
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError as exc:
            raise ValueError(f"cbor: invalid UTF-8 in text: {exc}") from exc
    if major == 4:
        if add == 31:
            out = []
            while True:
                v = _decode_value(r, depth + 1, allow_break=True)
                if v is _BREAK:
                    return out
                out.append(v)
        n = _arg(r, add, "array")
        if n > len(r.b) - r.i:
            raise ValueError("cbor: array length exceeds remaining input")
        return [_decode_value(r, depth + 1) for _ in range(n)]
    if major == 5:
        if add == 31:
            out = {}
            while True:
                k = _decode_value(r, depth + 1, allow_break=True)
                if k is _BREAK:
                    return out
                out[_map_key(k)] = _decode_value(r, depth + 1)
            return out
        n = _arg(r, add, "map")
        if 2 * n > len(r.b) - r.i:
            raise ValueError("cbor: map length exceeds remaining input")
        out = {}
        for _ in range(n):
            k = _map_key(_decode_value(r, depth + 1))
            out[k] = _decode_value(r, depth + 1)
        return out
    if major == 6:
        tag = _arg(r, add, "tag")
        return ("tag", tag, _decode_value(r, depth + 1))
    # major 7: simple / float / break
    if add == 20:
        return False
    if add == 21:
        return True
    if add == 22:
        return None
    if add == 23:
        return ("simple", 23)  # undefined, surfaced explicitly
    if add == 24:
        sv = r.take(1)[0]
        if sv < 32:
            raise ValueError("cbor: simple value < 32 must use the short form")
        return ("simple", sv)
    if add == 25:
        return struct.unpack(">e", r.take(2))[0]
    if add == 26:
        return struct.unpack(">f", r.take(4))[0]
    if add == 27:
        return struct.unpack(">d", r.take(8))[0]
    if add == 31:
        if allow_break:
            return _BREAK
        raise ValueError("cbor: break outside an indefinite container")
    if add < 20:
        return ("simple", add)
    raise ValueError(f"cbor: additional info {add} invalid for major 7")


@untrusted_decoder
def decode_cbor_stream(b: bytes) -> list:
    """CBOR sequence (RFC 8742: concatenated top-level values) →
    list; a partial trailing value raises."""
    r = _Reader(b)
    out = []
    while r.i < len(b):
        out.append(_decode_value(r, 0))
    return out


def _head(major: int, n: int) -> bytes:
    if n < 24:
        return bytes([major << 5 | n])
    for add, w in ((24, 1), (25, 2), (26, 4), (27, 8)):
        if n < 1 << (8 * w):
            return bytes([major << 5 | add]) + n.to_bytes(w, "big")
    raise ValueError("cbor: length too large")


def encode_cbor(v, indefinite: bool = False) -> bytes:
    """One value → CBOR: canonical smallest-width definite encodings,
    or — ``indefinite=True`` — indefinite-length containers and
    two-chunk strings (strings longer than 8 bytes), recursively."""
    if v is None:
        return b"\xf6"
    if v is True:
        return b"\xf5"
    if v is False:
        return b"\xf4"
    if isinstance(v, int):
        if v >= 0:
            return _head(0, v)
        return _head(1, -1 - v)
    if isinstance(v, float):
        # RFC 8949 preferred serialization: the smallest float width
        # that preserves the value (half → single → double) — also
        # what routes real-world small reals through the half decoder
        try:
            h = struct.pack(">e", v)
            if struct.unpack(">e", h)[0] == v:
                return b"\xf9" + h
        except (OverflowError, struct.error):
            pass
        try:
            f = struct.pack(">f", v)
            if struct.unpack(">f", f)[0] == v:
                return b"\xfa" + f
        except (OverflowError, struct.error):
            pass
        return b"\xfb" + struct.pack(">d", v)
    if isinstance(v, str):
        enc = v.encode("utf-8")
        if indefinite and len(enc) > 8:
            mid = len(enc) // 2
            return (
                b"\x7f" + _head(3, mid) + enc[:mid]
                + _head(3, len(enc) - mid) + enc[mid:] + b"\xff"
            )
        return _head(3, len(enc)) + enc
    if isinstance(v, (bytes, bytearray)):
        bv = bytes(v)
        if indefinite and len(bv) > 8:
            mid = len(bv) // 2
            return (
                b"\x5f" + _head(2, mid) + bv[:mid]
                + _head(2, len(bv) - mid) + bv[mid:] + b"\xff"
            )
        return _head(2, len(bv)) + bv
    if isinstance(v, tuple) and len(v) == 3 and v[0] == "tag":
        return _head(6, v[1]) + encode_cbor(v[2], indefinite)
    if isinstance(v, tuple) and len(v) == 2 and v[0] == "simple":
        sv = v[1]
        if sv < 20:
            return bytes([0xE0 | sv])
        if sv == 23:
            return b"\xf7"
        if 32 <= sv <= 255:
            return b"\xf8" + bytes([sv])
        raise ValueError(f"cbor: simple value {sv} not encodable")
    if isinstance(v, (list, tuple)):
        body = b"".join(encode_cbor(x, indefinite) for x in v)
        if indefinite:
            return b"\x9f" + body + b"\xff"
        return _head(4, len(v)) + body
    if isinstance(v, dict):
        body = b"".join(
            encode_cbor(k, indefinite) + encode_cbor(x, indefinite)
            for k, x in v.items()
        )
        if indefinite:
            return b"\xbf" + body + b"\xff"
        return _head(5, len(v)) + body
    raise ValueError(f"cbor: unsupported type {type(v).__name__}")


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

ROWS_SCHEMA = "shard int, doc_id bigint, lang string, n_chars bigint, n_tags int"
ROWS_QUARANTINE_SCHEMA = ROWS_SCHEMA + ", decode_error string"

_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def _validate_record(rec) -> str | None:
    if not isinstance(rec, dict):
        return "cbor: record is not a map"
    for field in ("doc_id", "n_chars"):
        v = rec.get(field)
        if v is None:
            continue
        if isinstance(v, bool) or not isinstance(v, int):
            return f"cbor: field {field} is not an integer"
        if not _I64_MIN <= v <= _I64_MAX:
            return f"cbor: field {field} outside int64 range"
    lang = rec.get("lang")
    if lang is not None and not isinstance(lang, str):
        return "cbor: field lang is not a string"
    return None


def cbor_records_table(blobs, on_error: str = "raise"):
    """(shard, blob) → one row per CBOR record via mapInPandas, the
    msgpack/avro shape: schemaless fields pass the type/range gate
    before the Arrow boundary, malformed blobs quarantine whole-blob."""
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
                    recs = decode_cbor_stream(bytes(blob))
                except (ValueError, TypeError) as exc:
                    if not quarantine:
                        raise
                    emit(shard=int(shard), decode_error=str(exc))
                    continue
                for rec in recs:
                    err = _validate_record(rec)
                    if err is not None:
                        if not quarantine:
                            raise ValueError(err)
                        emit(shard=int(shard), decode_error=err)
                        continue
                    tags = rec.get("tags")
                    if isinstance(tags, tuple) and len(tags) == 3:
                        tags = tags[2]  # unwrap a tagged array
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


def cbor_shard_encoder():
    """applyInPandas callable: a shard of documents → ONE ``.cbor``
    sequence blob.  EVEN shards write canonical definite encodings;
    ODD shards write indefinite-length maps/arrays and chunked strings
    — both writer families from one fixture.  Each record's ``tags``
    array is wrapped in CBOR tag 42 so the tag path is exercised, and
    a half-float field rides along."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        indefinite = bool(shard % 2)
        out = bytearray()
        for _, row in pdf.sort_values("doc_id").iterrows():
            did = int(row["doc_id"])
            rec = {
                "doc_id": did,
                "lang": str(row["lang"]),
                "n_chars": int(row["n_chars"]),
                "tags": ("tag", 42, list(range(did % 4))),
                "half": float(did % 7),  # integral → exact in half float
                "note": None,
            }
            out += encode_cbor(rec, indefinite=indefinite)
        return pd.DataFrame({"shard": [shard], "blob": [bytes(out)]})

    return build
