"""Vendored zstd codec (operators/zstdcodec.py) — RFC 8878 conformance.

Three layers of evidence:

1. Self-roundtrip across every encoder shape (the registry fixture
   discipline: the twin's frames must decode to the input bit-exactly).
2. Cross-validation against the system ``zstd`` CLI in BOTH directions
   (gated on CLI presence): real zstd at levels 1..22 — which emits
   FSE-compressed Huffman weights, custom sequence tables, treeless
   blocks, repeat offsets, 4-stream literals — must decode through our
   decoder; and our twin's frames must decode through real zstd.
3. Malformed-input contract: truncations, bit flips, bad magic, bad
   checksum, dictionary frames, reserved blocks → ValueError, never a
   mechanical exception (the quarantine boundary).
"""

from __future__ import annotations

import os
import random
import shutil
import struct
import subprocess

import pytest

from hive_udf_spark.operators.zstdcodec import (
    xxh64,
    zstd_compress,
    zstd_decompress,
)

ZSTD_CLI = shutil.which("zstd") or (
    "/root/miniconda/bin/zstd" if os.path.exists("/root/miniconda/bin/zstd") else None
)

SHAPES = ["raw", "rle", "huf", "huf4", "seq", "full", "full4", "auto"]


def _samples() -> list[bytes]:
    rng = random.Random(42)
    return [
        b"",
        b"a",
        b"abcd",
        b"hello world, hello world, hello world! " * 25,
        bytes(rng.randrange(256) for _ in range(700)),
        b"abcdefgh" * 800,
        b"z" * 4000,
        b"run" + b"~" * 100 + b"tail" + bytes(rng.randrange(128) for _ in range(300)),
        bytes(rng.randrange(4) for _ in range(50_000)),
    ]


# ---------------------------------------------------------------------------
# xxh64 — public test vectors
# ---------------------------------------------------------------------------


def test_xxh64_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"", seed=1) == 0xD5AFBA1336A3BE4B
    # one-shot vs known prefix property: hashing is deterministic
    assert xxh64(b"abc") == xxh64(b"abc")
    assert xxh64(b"abc") != xxh64(b"abd")
    # cross-checked once against the reference implementation
    assert xxh64(b"Hello, world!") == 0xF58336A78B6F9476


# ---------------------------------------------------------------------------
# self-roundtrip across encoder shapes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", SHAPES)
def test_self_roundtrip(shape):
    for data in _samples():
        try:
            frame = zstd_compress(data, shape=shape)
        except ValueError:
            assert shape not in ("raw", "rle", "auto"), (
                "raw/rle/auto must encode anything")
            continue
        assert zstd_decompress(frame) == data


def test_checksum_stamp_and_verify():
    data = b"checksummed content " * 10
    frame = zstd_compress(data, shape="full", checksum=True)
    assert zstd_decompress(frame) == data
    bad = bytearray(frame)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(bad))
    nock = zstd_compress(data, shape="full", checksum=False)
    assert zstd_decompress(nock) == data
    assert len(nock) == len(frame) - 4


def test_multi_frame_and_skippable():
    a = zstd_compress(b"frame one ", shape="auto")
    b = zstd_compress(b"and frame two", shape="raw")
    skip = struct.pack("<II", 0x184D2A53, 7) + b"ignored"
    assert zstd_decompress(a + skip + b) == b"frame one and frame two"


def test_rle_shape_emits_rle_blocks():
    data = b"x" * 500
    frame = zstd_compress(data, shape="rle", checksum=False)
    # magic(4) + fhd(1) + fcs(2) + header(3) + 1 content byte
    assert len(frame) < 20
    assert zstd_decompress(frame) == data


def test_large_multiblock_input():
    rng = random.Random(9)
    data = bytes(rng.randrange(64) for _ in range(300_000))
    for shape in ("raw", "auto"):
        frame = zstd_compress(data, shape=shape)
        assert zstd_decompress(frame, max_output=1 << 20) == data


def test_max_output_cap_enforced():
    data = b"y" * 100_000
    frame = zstd_compress(data, shape="rle")
    with pytest.raises(ValueError, match="exceeds"):
        zstd_decompress(frame, max_output=1000)


def test_treeless_literals_reuse_previous_table():
    """Hand-built two-block frame: block 2's literals are Treeless
    (type 3), reusing block 1's Huffman table — a path real streams hit
    that the twin never emits."""
    from hive_udf_spark.operators import zstdcodec as z

    chunk_a = b"the quick brown fox jumps over the lazy dog " * 4
    chunk_b = b"dog fox quick the"  # subset alphabet of chunk_a
    codes, tree = z._huffman_code(chunk_a)
    stream_a = z._huffman_encode_stream(chunk_a, codes)
    pay_a = tree + stream_a
    h_a = 2 | (0 << 2) | (len(chunk_a) << 4) | (len(pay_a) << 14)
    block_a = h_a.to_bytes(3, "little") + pay_a + b"\x00"
    stream_b = z._huffman_encode_stream(chunk_b, codes)
    h_b = 3 | (0 << 2) | (len(chunk_b) << 4) | (len(stream_b) << 14)
    block_b = h_b.to_bytes(3, "little") + stream_b + b"\x00"
    n = len(chunk_a) + len(chunk_b)
    frame = (
        struct.pack("<I", 0xFD2FB528)
        + bytes([1 << 5])  # single-segment, fcs_flag=0 → 1-byte size
        + bytes([n])
        + ((len(block_a) << 3) | (2 << 1) | 0).to_bytes(3, "little")
        + block_a
        + ((len(block_b) << 3) | (2 << 1) | 1).to_bytes(3, "little")
        + block_b
    )
    assert zstd_decompress(frame) == chunk_a + chunk_b


def test_treeless_without_table_rejected():
    chunk = b"q" * 20
    h = 3 | (0 << 2) | (len(chunk) << 4) | (4 << 14)
    block = h.to_bytes(3, "little") + b"\x01\x01\x01\x01" + b"\x00"
    frame = (
        struct.pack("<I", 0xFD2FB528)
        + bytes([1 << 5])
        + bytes([20])
        + ((len(block) << 3) | (2 << 1) | 1).to_bytes(3, "little")
        + block
    )
    with pytest.raises(ValueError, match="Treeless"):
        zstd_decompress(frame)


# ---------------------------------------------------------------------------
# malformed-input contract
# ---------------------------------------------------------------------------


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x00\x00\x00rest")


def test_dictionary_frame_quarantines():
    # frame declaring a 1-byte dict id of 7
    frame = struct.pack("<I", 0xFD2FB528) + bytes([(1 << 5) | 1, 7, 0])
    with pytest.raises(ValueError, match="dictionary"):
        zstd_decompress(frame + b"\x01\x00\x00")


def test_reserved_block_type():
    frame = (
        struct.pack("<I", 0xFD2FB528)
        + bytes([1 << 5, 0])
        + ((0 << 3) | (3 << 1) | 1).to_bytes(3, "little")
    )
    with pytest.raises(ValueError, match="reserved block"):
        zstd_decompress(frame)


def test_truncations_always_valueerror():
    frame = zstd_compress(b"truncate me please, repeatedly " * 8, shape="full")
    for cut in range(len(frame)):
        try:
            out = zstd_decompress(frame[:cut])
        except ValueError:
            continue
        # a prefix that still parses must not silently drop content
        assert out == b"", f"cut={cut} produced partial output"


def test_bitflips_never_leak_mechanical_exceptions():
    rng = random.Random(5)
    base = zstd_compress(
        b"flip bits in me " * 20 + bytes(range(90)), shape="full4")
    payload = zstd_decompress(base)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            out = zstd_decompress(bytes(b))
            # a surviving flip must still satisfy framing invariants;
            # content may legitimately differ only if it missed both the
            # checksum and every structural field — accept either
            assert isinstance(out, bytes)
        except ValueError:
            pass
    assert payload.startswith(b"flip bits in me ")


# ---------------------------------------------------------------------------
# CLI cross-validation (both directions)
# ---------------------------------------------------------------------------


needs_cli = pytest.mark.skipif(ZSTD_CLI is None, reason="no zstd CLI present")


@needs_cli
@pytest.mark.parametrize("level", [1, 3, 6, 12, 19, 22])
def test_decode_real_zstd_streams(level):
    for data in _samples():
        cmd = [ZSTD_CLI, f"-{level}", "-c"]
        if level > 19:
            cmd.insert(1, "--ultra")
        comp = subprocess.run(cmd, input=data, capture_output=True, check=True).stdout
        assert zstd_decompress(comp) == data


@needs_cli
def test_decode_real_zstd_long_mode_and_checksum():
    rng = random.Random(1)
    data = bytes(rng.randrange(32) for _ in range(200_000))
    for extra in (["--long=24"], ["--check"], ["--no-check"], ["-T4"]):
        comp = subprocess.run(
            [ZSTD_CLI, "-8", *extra, "-c"], input=data, capture_output=True,
            check=True).stdout
        assert zstd_decompress(comp, max_output=1 << 20) == data


@needs_cli
@pytest.mark.parametrize("shape", SHAPES)
def test_real_zstd_decodes_our_frames(shape):
    for data in _samples():
        try:
            frame = zstd_compress(data, shape=shape)
        except ValueError:
            continue
        p = subprocess.run([ZSTD_CLI, "-d", "-c"], input=frame,
                           capture_output=True)
        assert p.returncode == 0, p.stderr.decode()[:200]
        assert p.stdout == data
