"""Baseline TIFF codec (operators/tiffcodec.py, r6)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hive_udf_spark.operators.tiffcodec import (
    _packbits_decode,
    _packbits_encode,
    decode_tiff_gray,
    encode_tiff,
)


def _luma(rgb):
    r, g, b = (rgb[..., i].astype(np.int64) for i in range(3))
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def test_roundtrip_both_orders_compressions_strips():
    rng = np.random.default_rng(1)
    for be in (False, True):
        for pb in (False, True):
            for rps in (None, 3):
                g = rng.integers(0, 256, (13, 17), dtype=np.uint8)
                assert np.array_equal(
                    decode_tiff_gray(encode_tiff(g, be, pb, rps)), g
                ), (be, pb, rps)
                rgb = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
                assert np.array_equal(
                    decode_tiff_gray(encode_tiff(rgb, be, pb, rps)), _luma(rgb)
                ), (be, pb, rps)


def test_packbits_unit_and_adversarial():
    rng = np.random.default_rng(2)
    for data in (b"", b"\x00" * 500, bytes(rng.integers(0, 256, 300, dtype=np.uint8)),
                 b"ab" * 200, b"x" * 128 + b"y"):
        assert _packbits_decode(_packbits_encode(data), len(data)) == data
    with pytest.raises(ValueError, match="truncated|ended"):
        _packbits_decode(b"\x05ab", 6)  # literal run cut short
    with pytest.raises(ValueError, match="ended"):
        _packbits_decode(b"", 3)


def _bilevel_fixture(photometric: int) -> tuple[bytes, np.ndarray]:
    w, h = 10, 2
    bits = np.array(
        [[1, 0, 1, 0, 1, 0, 1, 0, 1, 1], [0, 0, 0, 0, 1, 1, 1, 1, 0, 0]],
        dtype=np.uint8,
    )
    packed = np.packbits(bits, axis=1).tobytes()
    e = "<"
    ifd_off = 8 + len(packed)

    def ent(tag, ttype, count, val):
        return struct.pack(e + "HHI", tag, ttype, count) + struct.pack(e + "I", val)

    entries = [
        ent(256, 3, 1, w), ent(257, 3, 1, h), ent(258, 3, 1, 1),
        ent(259, 3, 1, 1), ent(262, 3, 1, photometric), ent(273, 4, 1, 8),
        ent(277, 3, 1, 1), ent(278, 3, 1, h), ent(279, 4, 1, len(packed)),
    ]
    blob = (
        b"II*\x00" + struct.pack(e + "I", ifd_off) + packed
        + struct.pack(e + "H", len(entries)) + b"".join(entries)
        + struct.pack(e + "I", 0)
    )
    return blob, bits


def test_bilevel_both_photometrics():
    blob0, bits = _bilevel_fixture(0)  # WhiteIsZero: 1 = black
    assert np.array_equal(decode_tiff_gray(blob0), np.where(bits == 1, 0, 255))
    blob1, bits = _bilevel_fixture(1)  # BlackIsZero: 1 = white
    assert np.array_equal(decode_tiff_gray(blob1), np.where(bits == 1, 255, 0))


def test_malformed_and_unsupported_raise():
    g = np.zeros((4, 4), dtype=np.uint8)
    good = encode_tiff(g)
    with pytest.raises(ValueError, match="byte-order|magic"):
        decode_tiff_gray(b"XX*\x00" + good[4:])
    with pytest.raises(ValueError, match="IFD"):
        decode_tiff_gray(good[:10])
    # unsupported compression id
    bad = bytearray(encode_tiff(g))
    i = bytes(bad).index(struct.pack("<HHI", 259, 3, 1))
    struct.pack_into("<H", bad, i + 8, 5)  # LZW
    with pytest.raises(ValueError, match="compression 5"):
        decode_tiff_gray(bytes(bad))
    # strip past EOF
    bad2 = bytearray(encode_tiff(g))
    j = bytes(bad2).index(struct.pack("<HHI", 273, 4, 1))
    struct.pack_into("<I", bad2, j + 8, len(bad2) - 2)
    with pytest.raises(ValueError, match="past end|shorter"):
        decode_tiff_gray(bytes(bad2))


def test_rows_per_strip_zero_raises_valueerror():
    """r6 advisor: RowsPerStrip=0 raised ZeroDivisionError, escaping the
    valid-output-or-ValueError contract (quarantine only catches
    ValueError — one corrupt blob would fail the whole job)."""
    g = np.zeros((4, 4), dtype=np.uint8)
    bad = bytearray(encode_tiff(g))
    i = bytes(bad).index(struct.pack("<HHI", 278, 3, 1))
    struct.pack_into("<H", bad, i + 8, 0)
    with pytest.raises(ValueError, match="RowsPerStrip"):
        decode_tiff_gray(bytes(bad))


def test_tiff_cross_check_with_pil():
    try:
        import PIL.Image as Image
    except ImportError:
        pytest.skip("pillow not installed in this container")
    import io

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    for be in (False, True):
        with Image.open(io.BytesIO(encode_tiff(g, big_endian=be, packbits=True, rows_per_strip=5))) as im:
            assert np.array_equal(np.asarray(im.convert("L")), g)
    buf = io.BytesIO()
    Image.fromarray(g, mode="L").save(buf, format="TIFF")
    assert np.array_equal(decode_tiff_gray(buf.getvalue()), g)


def test_tiff_through_spark_and_ahash(spark):
    from hive_udf_spark.operators.imagecodec import encode_pgm
    from hive_udf_spark.operators.multimodal import (
        decode_image_features,
        image_ahash_table,
    )

    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, (8, 8), dtype=np.uint8) for _ in range(3)]
    rows = [
        (2 * i + k, bytearray(enc(im)))
        for i, im in enumerate(imgs)
        for k, enc in (
            (0, encode_pgm),
            (1, lambda a: encode_tiff(a, big_endian=True, packbits=True, rows_per_strip=2)),
        )
    ]
    blobs = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    feats = {r.doc_id: r for r in decode_image_features(blobs, fake=False).collect()}
    for i, im in enumerate(imgs):
        for k in (0, 1):
            assert feats[2 * i + k].mean_byte == int(im.sum(dtype=np.int64)) / 64
    sigs = {r.doc_id: r.ahash for r in image_ahash_table(blobs).collect()}
    for i in range(len(imgs)):
        assert sigs[2 * i] == sigs[2 * i + 1]
