"""Vendored RoaringBitmap codecs: the standard 32-bit portable
serialization (RoaringFormatSpec) and the 64-bit "portable"
RoaringBitmapArray layout Delta Lake deletion vectors use
(delta-io/delta PROTOCOL.md — int32 LE magic 1681511377, int64 LE
bitmap count, then per bitmap an int32 LE high-key + a standard
32-bit roaring bitmap), plus the Z85 text encoding (ZeroMQ RFC 32)
Delta uses for UUID paths and inline vectors.

All three container kinds decode and encode: ARRAY (≤4096 sorted
uint16s), BITMAP (1024 × uint64 LE bitset), RUN (n × (start, len-1)),
with both serial cookies (12347 no-run + explicit offset headers;
12346 with-run + run flag bitset, offsets present only at ≥4
containers per spec).  The encoder picks the smallest legal container
(run < array < bitmap by serialized size), so round trips cross every
branch of the decoder.

Untrusted-input posture: container counts, cardinalities and declared
extents are validated BEFORE allocation (the repo-wide
size-before-allocation bomb rule); anything malformed raises
ValueError → quarantine.

No reference analogue (the reference is a cardinality-UDAF package,
MLnick/hive-udf UDAFCardinalityEstimator.java) — this supports the
lakehouse source extension surface (sources/delta.py deletion
vectors).
"""

from __future__ import annotations

import struct

import numpy as np

from hive_udf_spark.operators._codec_util import untrusted_decoder

__all__ = [
    "decode_roaring32",
    "encode_roaring32",
    "decode_rbm64",
    "encode_rbm64",
    "z85_decode",
    "z85_encode",
]

_SERIAL_COOKIE_NO_RUN = 12347
_SERIAL_COOKIE = 12346
_NO_OFFSET_THRESHOLD = 4
_RBM64_MAGIC = 1681511377
_MAX_CONTAINERS = 1 << 16  # one per possible high key
# Bomb guard: run containers amplify ~10,000x (6 bytes -> 65,536
# values), so the cardinality budget must be enforced on the DECLARED
# headers BEFORE any container allocates (the avro element-budget
# lesson).  2^26 positions = 512 MiB of int64 — far above any sane
# per-file deletion vector, far below an executor OOM.
_MAX_CARDINALITY = 1 << 26


def _read_container(b: bytes, pos: int, card: int, is_run: bool) -> tuple[np.ndarray, int]:
    if is_run:
        if pos + 2 > len(b):
            raise ValueError("roaring: run header truncated")
        (n_runs,) = struct.unpack_from("<H", b, pos)
        pos += 2
        if pos + 4 * n_runs > len(b):
            raise ValueError("roaring: run list truncated")
        out = []
        total = 0
        for _ in range(n_runs):
            start, length = struct.unpack_from("<HH", b, pos)
            pos += 4
            total += length + 1
            if total > 1 << 16:
                raise ValueError("roaring: run container exceeds 2^16 values")
            out.append(np.arange(start, start + length + 1, dtype=np.uint32))
        vals = (np.concatenate(out) if out
                else np.empty(0, dtype=np.uint32)).astype(np.uint16)
        if vals.size != card:
            raise ValueError(
                "roaring: run container cardinality differs from its header"
            )
        return vals, pos
    if card <= 4096:
        if pos + 2 * card > len(b):
            raise ValueError("roaring: array container truncated")
        vals = np.frombuffer(b, np.dtype("<u2"), card, pos).copy()
        return vals, pos + 2 * card
    if pos + 8192 > len(b):
        raise ValueError("roaring: bitmap container truncated")
    bits = np.frombuffer(b, np.uint8, 8192, pos)
    vals = np.flatnonzero(np.unpackbits(bits, bitorder="little")).astype(np.uint16)
    if vals.size != card:
        raise ValueError(
            f"roaring: bitmap container cardinality {vals.size} != declared {card}"
        )
    return vals, pos + 8192


@untrusted_decoder
def decode_roaring32(b: bytes, pos: int = 0) -> tuple[np.ndarray, int]:
    """One standard 32-bit roaring bitmap at ``pos`` → (sorted uint32
    values, next position)."""
    if pos + 4 > len(b):
        raise ValueError("roaring: cookie truncated")
    (cookie,) = struct.unpack_from("<I", b, pos)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        pos += 4
        n_flag_bytes = (size + 7) // 8
        if pos + n_flag_bytes > len(b):
            raise ValueError("roaring: run flag bitset truncated")
        flags = np.unpackbits(
            np.frombuffer(b, np.uint8, n_flag_bytes, pos), bitorder="little"
        )[:size].astype(bool)
        pos += n_flag_bytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        if pos + 8 > len(b):
            raise ValueError("roaring: container count truncated")
        (size,) = struct.unpack_from("<I", b, pos + 4)
        pos += 8
        flags = np.zeros(size, dtype=bool)
        has_offsets = True
    else:
        raise ValueError(f"roaring: unknown serial cookie {cookie}")
    if size > _MAX_CONTAINERS:
        raise ValueError("roaring: container count out of range")
    if pos + 4 * size > len(b):
        raise ValueError("roaring: descriptive headers truncated")
    keys, cards = [], []
    for i in range(size):
        k, c = struct.unpack_from("<HH", b, pos + 4 * i)
        keys.append(k)
        cards.append(c + 1)
    pos += 4 * size
    if sum(cards) > _MAX_CARDINALITY:
        # the budget binds on DECLARED headers, before any container
        # allocates (run containers amplify ~10,000x per 6 input bytes)
        raise ValueError("roaring: declared cardinality past the cap")
    if has_offsets:
        pos += 4 * size  # containers follow in order; offsets redundant here
    parts = []
    for i in range(size):
        vals, pos = _read_container(b, pos, cards[i], bool(flags[i]))
        if not bool(flags[i]) and cards[i] != vals.size:
            raise ValueError("roaring: container cardinality mismatch")
        parts.append(vals.astype(np.uint32) | (np.uint32(keys[i]) << np.uint32(16)))
    values = (np.concatenate(parts) if parts else np.empty(0, np.uint32))
    return values, pos


def _encode_container(vals: np.ndarray) -> tuple[bytes, bool]:
    """uint16 values (sorted unique) → (payload, is_run) — smallest of
    run/array/bitmap, the real encoders' rule."""
    card = vals.size
    # runs
    if card:
        breaks = np.flatnonzero(np.diff(vals.astype(np.int64)) != 1)
        starts = np.concatenate(([0], breaks + 1))
        ends = np.concatenate((breaks, [card - 1]))
        n_runs = starts.size
    else:
        n_runs = 0
        starts = ends = np.empty(0, np.int64)
    run_size = 2 + 4 * n_runs
    arr_size = 2 * card
    bmp_size = 8192
    if run_size < min(arr_size, bmp_size):
        out = struct.pack("<H", n_runs)
        for s, e in zip(starts, ends):
            out += struct.pack("<HH", int(vals[s]), int(vals[e] - vals[s]))
        return out, True
    if card <= 4096:
        return vals.astype("<u2").tobytes(), False
    bits = np.zeros(8192 * 8, dtype=np.uint8)
    bits[vals] = 1
    return np.packbits(bits, bitorder="little").tobytes(), False


def encode_roaring32(values: np.ndarray) -> bytes:
    """Sorted-unique uint32 values → standard portable serialization."""
    values = np.asarray(values, dtype=np.uint32)
    hi = (values >> np.uint32(16)).astype(np.uint16)
    keys = np.unique(hi)
    containers = []
    any_run = False
    for k in keys:
        vals = (values[hi == k] & np.uint32(0xFFFF)).astype(np.uint16)
        payload, is_run = _encode_container(vals)
        any_run = any_run or is_run
        containers.append((int(k), vals.size, payload, is_run))
    size = len(containers)
    out = bytearray()
    if any_run:
        out += struct.pack("<I", _SERIAL_COOKIE | ((size - 1) << 16))
        flags = np.zeros(size, dtype=np.uint8)
        for i, (_, _, _, is_run) in enumerate(containers):
            if is_run:
                flags[i] = 1
        out += np.packbits(flags, bitorder="little")[: (size + 7) // 8].tobytes()
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    else:
        out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, size)
        has_offsets = True
    for k, card, _, _ in containers:
        out += struct.pack("<HH", k, card - 1)
    if has_offsets:
        off = len(out) + 4 * size
        for _, _, payload, _ in containers:
            out += struct.pack("<I", off)
            off += len(payload)
    for _, _, payload, _ in containers:
        out += payload
    return bytes(out)


@untrusted_decoder
def decode_rbm64(b: bytes) -> np.ndarray:
    """Delta's 64-bit RoaringBitmapArray portable format → sorted
    int64 positions."""
    if len(b) < 12:
        raise ValueError("roaring64: header truncated")
    magic, n = struct.unpack_from("<iq", b, 0)
    if magic != _RBM64_MAGIC:
        raise ValueError(f"roaring64: bad magic {magic}")
    if n < 0 or n > _MAX_CONTAINERS:
        raise ValueError("roaring64: bitmap count out of range")
    pos = 12
    parts = []
    total = 0
    for _ in range(n):
        if pos + 4 > len(b):
            raise ValueError("roaring64: bitmap key truncated")
        (key,) = struct.unpack_from("<I", b, pos)
        pos += 4
        vals, pos = decode_roaring32(b, pos)
        total += vals.size
        if total > _MAX_CARDINALITY:
            raise ValueError("roaring64: cardinality past the cap")
        parts.append(vals.astype(np.int64) | (np.int64(key) << np.int64(32)))
    if pos != len(b):
        raise ValueError("roaring64: trailing bytes after the last bitmap")
    return np.concatenate(parts) if parts else np.empty(0, np.int64)


def encode_rbm64(positions) -> bytes:
    """Sorted-unique non-negative int64 positions → Delta's 64-bit
    RoaringBitmapArray portable format."""
    positions = np.asarray(positions, dtype=np.int64)
    if positions.size and int(positions.min()) < 0:
        raise ValueError("roaring64: negative positions")
    hi = (positions >> np.int64(32)).astype(np.uint32)
    keys = np.unique(hi)
    out = bytearray(struct.pack("<iq", _RBM64_MAGIC, len(keys)))
    for k in keys:
        vals = (positions[hi == k] & np.int64(0xFFFFFFFF)).astype(np.uint32)
        out += struct.pack("<I", int(k))
        out += encode_roaring32(vals)
    return bytes(out)


# ---------------------------------------------------------------------------
# Z85 (ZeroMQ RFC 32) — Delta encodes DV UUID paths and inline vectors
# with it (5 text chars per 4 bytes, alphabet below)
# ---------------------------------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85: input length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[r])
        out += reversed(chunk)
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85: input length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            if c not in _Z85_INDEX:
                raise ValueError(f"z85: invalid character {c!r}")
            v = v * 85 + _Z85_INDEX[c]
        if v > 0xFFFFFFFF:
            raise ValueError("z85: chunk overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)
