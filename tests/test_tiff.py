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
    # unsupported compression id (7 = JPEG-in-TIFF)
    bad = bytearray(encode_tiff(g))
    i = bytes(bad).index(struct.pack("<HHI", 259, 3, 1))
    struct.pack_into("<H", bad, i + 8, 7)
    with pytest.raises(ValueError, match="compression 7"):
        decode_tiff_gray(bytes(bad))
    # compression says LZW but the strip is raw pixels: no Clear code
    bad15 = bytearray(encode_tiff(np.full((4, 4), 10, dtype=np.uint8)))
    i = bytes(bad15).index(struct.pack("<HHI", 259, 3, 1))
    struct.pack_into("<H", bad15, i + 8, 5)
    with pytest.raises(ValueError, match="LZW|Clear|truncated"):
        decode_tiff_gray(bytes(bad15))
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


# ---------------------------------------------------------------------------
# LZW (compression 5) + horizontal predictor — r8
# ---------------------------------------------------------------------------


def test_lzw_raw_roundtrip_across_width_boundaries():
    """The raw codec: incompressible data crosses every code-width
    boundary (9→10→11→12) and forces table-full Clear restarts; runs
    exercise multi-byte table entries and the KwKwK case."""
    from hive_udf_spark.operators.tiffcodec import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(0)
    for n in (0, 1, 5, 300, 511, 1200, 2500, 4096, 20000, 40000):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _lzw_decode(_lzw_encode(data), n) == data, n
    runs = b"".join(bytes([i % 7]) * (i % 40 + 1) for i in range(800))
    assert _lzw_decode(_lzw_encode(runs), len(runs)) == runs


def test_lzw_early_change_is_one_entry_before_encoder():
    """Pin the TIFF 6.0 early-change schedule: the encoder bumps the
    code width after creating entry 511 (width 10 from the 254th data
    code on), the decoder after creating entry 510 — exactly one table
    add earlier, compensating its one-add lag.  A decoder bumping at
    511 desynchronizes on any stream crossing the boundary."""
    from hive_udf_spark.operators.tiffcodec import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(1)
    # incompressible stream slightly past the first boundary
    data = bytes(rng.integers(0, 256, 300, dtype=np.uint8))
    enc = _lzw_encode(data)
    assert _lzw_decode(enc, len(data)) == data
    # bit-level check: 253 data codes at 9 bits + 1 clear, then 10-bit
    n_bits_9 = 9 * (1 + 253)  # Clear + first 253 data codes
    # the 254th data code starts at bit offset n_bits_9 and is 10 bits
    take = 0
    for bitpos in range(n_bits_9, n_bits_9 + 10):
        take = (take << 1) | ((enc[bitpos // 8] >> (7 - bitpos % 8)) & 1)
    assert take < 512 + 258  # a valid 10-bit code, not noise


def test_lzw_tiff_roundtrip_all_combos():
    rng = np.random.default_rng(2)
    for be in (False, True):
        for rps in (None, 5):
            for pred in (1, 2):
                g = rng.integers(0, 256, (23, 17), dtype=np.uint8)
                t = encode_tiff(
                    g, big_endian=be, lzw=True, predictor=pred, rows_per_strip=rps
                )
                assert np.array_equal(decode_tiff_gray(t), g), (be, rps, pred)
    # RGB via LZW+predictor reduces to the same BT.601 luma as plain
    rgb = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    plain = decode_tiff_gray(encode_tiff(rgb))
    lzw = decode_tiff_gray(encode_tiff(rgb, lzw=True, predictor=2))
    assert np.array_equal(plain, lzw)


def test_lzw_predictor_helps_and_is_undone():
    """predictor=2 (horizontal differencing) must shrink smooth images
    and decode back exactly; the predictor tag without 8-bit samples is
    refused."""
    x = np.linspace(0, 255, 64)
    smooth = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    t_pred = encode_tiff(smooth, lzw=True, predictor=2)
    t_none = encode_tiff(smooth, lzw=True, predictor=1)
    assert np.array_equal(decode_tiff_gray(t_pred), smooth)
    assert len(t_pred) < len(t_none)


def test_lzw_malformed_streams_raise():
    from hive_udf_spark.operators.tiffcodec import _lzw_decode, _lzw_encode

    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode(b"\x80", 10)  # Clear then nothing
    with pytest.raises(ValueError, match="Clear"):
        _lzw_decode(b"\x00\x00\x00", 10)  # data before Clear
    # output bounded by the declared strip size
    big = _lzw_encode(b"\x00" * 1000)
    with pytest.raises(ValueError, match="inflates past"):
        _lzw_decode(big, 10)


def test_lzw_cross_check_with_pil():
    """Wherever pillow exists: PIL (libtiff heritage) decodes our LZW
    TIFFs and we decode PIL's tiff_lzw output — the early-change
    schedule is externally pinned, not just self-consistent."""
    try:
        import PIL.Image as Image
    except ImportError:
        pytest.skip("pillow not installed in this container")
    import io

    rng = np.random.default_rng(4)
    # large enough to cross the 9->10 bit boundary inside one strip
    g = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    for pred in (1, 2):
        blob = encode_tiff(g, lzw=True, predictor=pred)
        with Image.open(io.BytesIO(blob)) as im:
            assert np.array_equal(np.asarray(im.convert("L")), g), pred
    buf = io.BytesIO()
    Image.fromarray(g, mode="L").save(buf, format="TIFF", compression="tiff_lzw")
    assert np.array_equal(decode_tiff_gray(buf.getvalue()), g)


def test_tiled_roundtrip_matrix():
    """Tiled layout (tags 322-325): every compression, both byte
    orders, edge-tile cropping, multi-of-16 grids, per-tile predictor."""
    from hive_udf_spark.operators.tiffcodec import decode_tiff_gray, encode_tiff

    rng = np.random.default_rng(5)
    for h, w in [(20, 20), (16, 16), (33, 47), (16, 48)]:
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        for be in (False, True):
            for kw in (
                dict(tiles=(16, 16)),
                dict(tiles=(16, 16), packbits=True),
                dict(tiles=(16, 16), lzw=True),
                dict(tiles=(16, 16), lzw=True, predictor=2),
                dict(tiles=(32, 16), lzw=True),
            ):
                out = decode_tiff_gray(encode_tiff(g, big_endian=be, **kw))
                assert (out == g).all(), (h, w, be, kw)


def test_tiled_rgb_and_16bit():
    from hive_udf_spark.operators.tiffcodec import decode_tiff_gray, encode_tiff

    rng = np.random.default_rng(6)
    h, w = 20, 36
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    a = rgb.astype(np.int64)
    luma = ((299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000).astype(
        np.uint8
    )
    assert (decode_tiff_gray(encode_tiff(rgb, tiles=(16, 16), lzw=True)) == luma).all()
    g16 = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    hi = (g16 >> 8).astype(np.uint8)
    for be in (False, True):
        assert (
            decode_tiff_gray(encode_tiff(g16, big_endian=be, rows_per_strip=5)) == hi
        ).all()
        assert (
            decode_tiff_gray(
                encode_tiff(g16, big_endian=be, tiles=(16, 16), packbits=True)
            )
            == hi
        ).all()


def test_tile_dims_must_be_multiples_of_16():
    from hive_udf_spark.operators.tiffcodec import encode_tiff

    with pytest.raises(ValueError):
        encode_tiff(np.zeros((20, 20), np.uint8), tiles=(8, 16))
    with pytest.raises(ValueError):
        encode_tiff(np.zeros((20, 20), np.uint8), tiles=(16, 20))


def test_lzw_eoi_width_boundary_regression():
    """Regression: streams whose final table size lands exactly on a
    width-bump boundary at EOI (the decoder adds an entry after the
    flushed code; an encoder deriving width from its OWN table — which
    gets no add for the flush — emits a narrower EOI and the decoder
    reads past the end).  The decoder-twin width schedule makes every
    such stream round-trip; sweep sizes around the 253-entry mark to
    pin the exact boundary."""
    from hive_udf_spark.operators.tiffcodec import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(42)
    for n in range(240, 280):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _lzw_decode(_lzw_encode(data), n) == data, n
