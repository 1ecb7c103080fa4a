"""Vendored TFRecord codec (r14 — the r13 verdict's task 5): the
length-prefixed, masked-CRC32C record framing TensorFlow's data
tooling writes, the one mainstream training-shard format the source
matrix was missing.  Implemented dependency-free from the public
format description (TensorFlow's ``tf.data`` docs and the riegeli/
tfrecord framing spec):

    uint64le  length
    uint32le  masked_crc32c(length bytes)
    byte[length] payload
    uint32le  masked_crc32c(payload)

with ``masked_crc = rotr15(crc32c(x)) + 0xa282ead8 (mod 2^32)`` and
CRC-32C the Castagnoli polynomial (reflected 0x82F63B78), table-driven
here.  Both CRCs verify on decode — a flipped bit in length or payload
quarantines the shard, it never yields a silently-wrong record.

Bomb discipline matches the other vendored codecs: a declared record
length is checked against the REMAINING INPUT before any allocation
(a crafted 4 GiB header on a 100-byte shard fails immediately), a
truncated trailing record raises, and trailing garbage raises.

Payloads are normally serialized ``tf.train.Example`` protos;
``decode_tf_example`` parses that shape from the public protobuf wire
format (Example → Features(field 1) → map<string, Feature> →
exactly-one-of BytesList(1)/FloatList(2)/Int64List(3), each a
``repeated value = 1`` that may arrive packed or unpacked) with the
same pre-allocation size checks.  Unknown fields are SKIPPED by wire
type, the proto compatibility rule.  ``encode_tf_example`` is the
encoder twin.

Shard compression (the ``.tfrecord.gz`` / ``.tfrecord.zst`` tooling
convention) is sniffed from magic bytes and routed to stdlib zlib or
the vendored RFC 8878 decoder (``operators/zstdcodec.py``).

Spark shape: ``tfrecord_records_table`` parses inside ``mapInPandas``
(blob shards → rows), the compressed-shard/Avro/MessagePack model —
shards are the unit of parallelism, malformed blobs quarantine
whole-blob with the decode error preserved.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
mandated source/ingest extension surface.
"""

from __future__ import annotations

import struct
import zlib

import pandas as pd

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = [
    "crc32c",
    "masked_crc32c",
    "decode_tfrecord_stream",
    "encode_tfrecord",
    "decode_tf_example",
    "encode_tf_example",
    "tfrecord_records_table",
    "tfrecord_shard_encoder",
]

# ---------------------------------------------------------------------------
# CRC-32C (Castagnoli), table-driven, reflected polynomial 0x82F63B78
# ---------------------------------------------------------------------------


def _build_table() -> list[int]:
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _build_table()


def crc32c(data: bytes) -> int:
    """CRC-32C over ``data`` (the Castagnoli polynomial TFRecord,
    iSCSI, and ext4 use — NOT zlib's CRC-32)."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


_MASK_DELTA = 0xA282EAD8


def masked_crc32c(data: bytes) -> int:
    """TFRecord's masked CRC: rotate right 15 then add the mask
    constant — masking exists because CRCs of CRC-bearing data are
    pathological (the framing stores CRCs adjacent to payloads)."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# record framing
# ---------------------------------------------------------------------------

_MAX_RECORD = 1 << 28  # 256 MiB per-record guard


def _sniff_decompress(b: bytes) -> bytes:
    """Shard-level compression sniff: gzip (1f 8b) via stdlib, zstd
    (28 b5 2f fd) via the vendored RFC 8878 decoder, else raw."""
    if b[:2] == b"\x1f\x8b":
        try:
            return zlib.decompress(b, wbits=31)
        except zlib.error as exc:
            raise ValueError(f"tfrecord: bad gzip shard: {exc}") from exc
    if b[:4] == b"\x28\xb5\x2f\xfd":
        from hive_udf_spark.operators.zstdcodec import zstd_decompress

        return zstd_decompress(b)
    return b


@untrusted_decoder
def decode_tfrecord_stream(b: bytes, decompress: bool = True) -> list[bytes]:
    """One TFRecord shard (optionally gzip/zstd-compressed) → list of
    record payloads.  Both CRCs verify per record; truncation, a
    length past the remaining input, and CRC mismatches all raise."""
    if decompress and b:
        b = _sniff_decompress(b)
    out: list[bytes] = []
    i, n = 0, len(b)
    while i < n:
        if i + 12 > n:
            raise ValueError("tfrecord: truncated record header")
        (length,) = struct.unpack_from("<Q", b, i)
        (len_crc,) = struct.unpack_from("<I", b, i + 8)
        if masked_crc32c(b[i:i + 8]) != len_crc:
            raise ValueError("tfrecord: length CRC mismatch")
        if length > _MAX_RECORD:
            raise ValueError(
                f"tfrecord: record length {length} past the "
                f"{_MAX_RECORD}-byte cap"
            )
        if i + 12 + length + 4 > n:
            # the length CRC already verified, so this is real
            # truncation, not a corrupt header
            raise ValueError("tfrecord: truncated record payload")
        payload = b[i + 12:i + 12 + length]
        (data_crc,) = struct.unpack_from("<I", b, i + 12 + length)
        if masked_crc32c(payload) != data_crc:
            raise ValueError("tfrecord: payload CRC mismatch")
        out.append(payload)
        i += 12 + length + 4
    return out


def encode_tfrecord(records: list[bytes], compression: str | None = None
                    ) -> bytes:
    """Encoder twin: payloads → one framed shard, optionally
    gzip/zstd-compressed (the ``.tfrecord.gz``/``.zst`` convention)."""
    out = bytearray()
    for payload in records:
        header = struct.pack("<Q", len(payload))
        out += header
        out += struct.pack("<I", masked_crc32c(header))
        out += payload
        out += struct.pack("<I", masked_crc32c(payload))
    raw = bytes(out)
    if compression is None:
        return raw
    if compression == "gzip":
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(raw) + co.flush()
    if compression == "zstd":
        from hive_udf_spark.operators.zstdcodec import zstd_compress

        return zstd_compress(raw)
    raise ValueError(f"tfrecord: unknown compression {compression!r}")


# ---------------------------------------------------------------------------
# tf.train.Example (protobuf wire format, vendored subset)
# ---------------------------------------------------------------------------

_MAX_PROTO_ELEMENTS = 1 << 22


class _Proto:
    __slots__ = ("b", "i", "end", "elements")

    def __init__(self, b: bytes, start: int = 0, end: int | None = None,
                 elements: int = 0):
        self.b = b
        self.i = start
        self.end = len(b) if end is None else end
        self.elements = elements

    def varint(self) -> int:
        shift, out = 0, 0
        while True:
            if self.i >= self.end:
                raise ValueError("tfrecord: truncated varint")
            byte = self.b[self.i]
            self.i += 1
            out |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return out
            shift += 7
            if shift > 63:
                raise ValueError("tfrecord: varint past 64 bits")

    def delimited(self) -> tuple[int, int]:
        n = self.varint()
        if self.i + n > self.end:
            raise ValueError(
                "tfrecord: length-delimited field past the buffer"
            )
        span = (self.i, self.i + n)
        self.i += n
        return span

    def skip(self, wire: int) -> None:
        # proto compatibility rule: unknown fields skip by wire type
        if wire == 0:
            self.varint()
        elif wire == 1:
            self.i += 8
        elif wire == 2:
            self.delimited()
        elif wire == 5:
            self.i += 4
        else:
            raise ValueError(f"tfrecord: unsupported wire type {wire}")
        if self.i > self.end:
            raise ValueError("tfrecord: skipped field past the buffer")

    def bump(self, n: int = 1) -> None:
        self.elements += n
        if self.elements > _MAX_PROTO_ELEMENTS:
            raise ValueError("tfrecord: element count past the decode cap")


def _zigzag_free_i64(v: int) -> int:
    # Int64List values are plain (non-zigzag) varints; wrap to signed
    return v - (1 << 64) if v >= 1 << 63 else v


def _decode_feature(b: bytes, start: int, end: int):
    """Feature → ('bytes'|'float'|'int64', list).  Each list field is
    ``repeated value = 1`` and may arrive packed (one delimited blob)
    or unpacked (repeated scalar fields) — both are legal encodings."""
    p = _Proto(b, start, end)
    kind, values = None, []

    def set_kind(k: str):
        nonlocal kind
        if kind is not None and kind != k:
            raise ValueError("tfrecord: Feature with two oneof kinds")
        kind = k

    while p.i < p.end:
        tag = p.varint()
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # BytesList
            s, e = p.delimited()
            q = _Proto(b, s, e, p.elements)
            while q.i < q.end:
                t2 = q.varint()
                if t2 >> 3 == 1 and t2 & 7 == 2:
                    s2, e2 = q.delimited()
                    q.bump()
                    set_kind("bytes")
                    values.append(b[s2:e2])
                else:
                    q.skip(t2 & 7)
            p.elements = q.elements
        elif field == 2 and wire == 2:  # FloatList
            s, e = p.delimited()
            q = _Proto(b, s, e, p.elements)
            while q.i < q.end:
                t2 = q.varint()
                if t2 >> 3 == 1 and t2 & 7 == 2:  # packed floats
                    s2, e2 = q.delimited()
                    if (e2 - s2) % 4:
                        raise ValueError(
                            "tfrecord: packed float blob not 4-aligned"
                        )
                    q.bump((e2 - s2) // 4)
                    set_kind("float")
                    values.extend(
                        struct.unpack_from(f"<{(e2 - s2) // 4}f", b, s2)
                    )
                elif t2 >> 3 == 1 and t2 & 7 == 5:  # unpacked float
                    if q.i + 4 > q.end:
                        raise ValueError("tfrecord: truncated float")
                    q.bump()
                    set_kind("float")
                    values.append(struct.unpack_from("<f", b, q.i)[0])
                    q.i += 4
                else:
                    q.skip(t2 & 7)
            p.elements = q.elements
        elif field == 3 and wire == 2:  # Int64List
            s, e = p.delimited()
            q = _Proto(b, s, e, p.elements)
            while q.i < q.end:
                t2 = q.varint()
                if t2 >> 3 == 1 and t2 & 7 == 2:  # packed varints
                    s2, e2 = q.delimited()
                    r = _Proto(b, s2, e2, q.elements)
                    while r.i < r.end:
                        r.bump()
                        set_kind("int64")
                        values.append(_zigzag_free_i64(r.varint()))
                    q.elements = r.elements
                elif t2 >> 3 == 1 and t2 & 7 == 0:  # unpacked varint
                    q.bump()
                    set_kind("int64")
                    values.append(_zigzag_free_i64(q.varint()))
                else:
                    q.skip(t2 & 7)
            p.elements = q.elements
        else:
            p.skip(wire)
    return kind or "bytes", values


@untrusted_decoder
def decode_tf_example(payload: bytes) -> dict[str, tuple[str, list]]:
    """Serialized ``tf.train.Example`` → ``{name: (kind, values)}``
    with kind one of ``bytes``/``float``/``int64``."""
    out: dict[str, tuple[str, list]] = {}
    p = _Proto(payload)
    while p.i < p.end:
        tag = p.varint()
        if tag >> 3 == 1 and tag & 7 == 2:  # Example.features
            fs, fe = p.delimited()
            q = _Proto(payload, fs, fe, p.elements)
            while q.i < q.end:
                t2 = q.varint()
                if t2 >> 3 == 1 and t2 & 7 == 2:  # map entry
                    es, ee = q.delimited()
                    r = _Proto(payload, es, ee, q.elements)
                    name, span = None, None
                    while r.i < r.end:
                        t3 = r.varint()
                        if t3 >> 3 == 1 and t3 & 7 == 2:  # key
                            ks, ke = r.delimited()
                            name = payload[ks:ke].decode("utf-8")
                        elif t3 >> 3 == 2 and t3 & 7 == 2:  # value
                            span = r.delimited()
                        else:
                            r.skip(t3 & 7)
                    if name is None or span is None:
                        raise ValueError(
                            "tfrecord: features map entry missing "
                            "key or value"
                        )
                    r.bump()
                    out[name] = _decode_feature(payload, *span)
                    q.elements = r.elements
                else:
                    q.skip(t2 & 7)
            p.elements = q.elements
        else:
            p.skip(tag & 7)
    return out


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        if v < 0x80:
            out.append(v)
            return bytes(out)
        out.append((v & 0x7F) | 0x80)
        v >>= 7


def _delim(field: int, body: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(body)) + body


def encode_tf_example(features: dict) -> bytes:
    """Encoder twin: ``{name: value-list}`` → serialized Example.
    Value kind is inferred — bytes/str → BytesList, float → packed
    FloatList, int → packed Int64List."""
    entries = b""
    for name in features:
        values = features[name]
        if not isinstance(values, (list, tuple)):
            values = [values]
        if all(isinstance(v, (bytes, str)) for v in values) and values:
            body = b"".join(
                _delim(1, v.encode("utf-8") if isinstance(v, str) else v)
                for v in values
            )
            feat = _delim(1, body)
        elif all(isinstance(v, float) for v in values):
            packed = struct.pack(f"<{len(values)}f", *values)
            feat = _delim(2, _delim(1, packed))
        elif all(isinstance(v, int) and not isinstance(v, bool)
                 for v in values):
            packed = b"".join(_varint(v & ((1 << 64) - 1)) for v in values)
            feat = _delim(3, _delim(1, packed))
        else:
            raise ValueError(
                f"tfrecord: feature {name!r} mixes value kinds"
            )
        entries += _delim(1, _delim(1, name.encode("utf-8")) + _delim(2, feat))
    return _delim(1, entries)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

ROWS_SCHEMA = (
    "shard int, doc_id bigint, lang string, n_chars bigint, n_floats int"
)
ROWS_QUARANTINE_SCHEMA = ROWS_SCHEMA + ", decode_error string"


def _first(feats: dict, name: str, kind: str):
    got = feats.get(name)
    if got is None:
        return None
    k, values = got
    if k != kind:
        raise ValueError(
            f"tfrecord: feature {name!r} is {k}, expected {kind}"
        )
    return values[0] if values else None


def tfrecord_records_table(blobs, on_error: str = "raise"):
    """(shard, blob) → one row per ``tf.train.Example`` record.  Shard
    compression (raw/gzip/zstd) is sniffed per blob; a framing error,
    CRC mismatch, or malformed proto quarantines the WHOLE shard (the
    framing gives no resync point past a bad length)."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError("on_error must be 'raise' or 'quarantine'")
    quarantine = on_error == "quarantine"
    cols = ["shard", "doc_id", "lang", "n_chars", "n_floats"] + (
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
                    payloads = decode_tfrecord_stream(bytes(blob))
                    recs = []
                    for payload in payloads:
                        feats = decode_tf_example(payload)
                        lang = _first(feats, "lang", "bytes")
                        floats = feats.get("embed", ("float", []))[1]
                        recs.append({
                            "doc_id": _first(feats, "doc_id", "int64"),
                            "lang": (lang.decode("utf-8")
                                     if lang is not None else None),
                            "n_chars": _first(feats, "n_chars", "int64"),
                            "n_floats": len(floats),
                        })
                except ValueError as exc:
                    if not quarantine:
                        raise
                    emit(shard=int(shard), decode_error=str(exc))
                    continue
                for rec in recs:
                    emit(shard=int(shard), **rec)
            yield pd.DataFrame(rows)

    schema = ROWS_QUARANTINE_SCHEMA if quarantine else ROWS_SCHEMA
    return blobs.mapInPandas(extract, schema=schema)


def tfrecord_shard_encoder(compression_of=None):
    """applyInPandas callable: a shard of documents → ONE ``.tfrecord``
    shard blob of framed Examples.  ``compression_of(shard) ->
    None|'gzip'|'zstd'`` picks per-shard compression (defaults to
    rotating raw/gzip/zstd so one fixture exercises all three decode
    routes)."""
    if compression_of is None:
        compression_of = lambda s: (None, "gzip", "zstd")[s % 3]

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        payloads = []
        for _, row in pdf.sort_values("doc_id").iterrows():
            did = int(row["doc_id"])
            payloads.append(encode_tf_example({
                "doc_id": [did],
                "lang": [str(row["lang"])],
                "n_chars": [int(row["n_chars"])],
                "embed": [float(i) / 2 for i in range(did % 4)],
            }))
        blob = encode_tfrecord(payloads, compression_of(shard))
        return pd.DataFrame({"shard": [shard], "blob": [blob]})

    return build
