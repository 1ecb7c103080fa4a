"""Vendored GIF codec (operators/gifcodec.py, r6)."""

from __future__ import annotations

import numpy as np
import pytest

from hive_udf_spark.operators.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif_gray,
    encode_gif,
    split_gif_frames,
)


def test_lzw_roundtrip_including_dictionary_reset():
    rng = np.random.default_rng(1)
    for n, mcs in ((10, 8), (500, 8), (20000, 8), (5000, 2)):
        hi = (1 << mcs) if mcs < 8 else 256
        idx = rng.integers(0, hi, n, dtype=np.uint8)
        assert np.array_equal(_lzw_decode(_lzw_encode(idx, mcs), mcs, n), idx)
    # highly repetitive input drives deep dictionary chains + KwKwK codes
    rep = np.tile(np.arange(4, dtype=np.uint8), 3000)
    assert np.array_equal(_lzw_decode(_lzw_encode(rep, 2), 2, rep.size), rep)


def test_lzw_malformed_raises():
    idx = np.arange(16, dtype=np.uint8)
    good = _lzw_encode(idx, 8)
    with pytest.raises(ValueError, match="EOI"):
        _lzw_decode(good[:2], 8, 16)
    with pytest.raises(ValueError, match="pixels"):
        _lzw_decode(good, 8, 5)  # claims fewer pixels than encoded


def test_gray_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(2)
    for il in (False, True):
        for shape in [(1, 1), (13, 17), (8, 8), (32, 5)]:
            g = rng.integers(0, 256, shape, dtype=np.uint8)
            assert np.array_equal(decode_gif_gray(encode_gif(g, interlace=il)), g)


def test_animated_frames_composite_and_split():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (8, 8), dtype=np.uint8) for _ in range(3)]
    from hive_udf_spark.operators.imagecodec import decode_to_gray

    blobs = split_gif_frames(encode_gif(frames))
    assert len(blobs) == 3
    for f, b in zip(frames, blobs):
        assert b[:2] == b"P5"  # canonical PGM re-encode
        assert np.array_equal(decode_to_gray(b), f)


def test_transparency_and_offsets_composite_onto_canvas():
    """Hand-built GIF89a: frame 2 is a 2x2 patch at offset (1,1) with a
    transparent index — transparent pixels must show frame 1's pixels."""
    import struct

    base = np.arange(16, dtype=np.uint8).reshape(4, 4) * 10
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 0x07, 0, 0)
    out += bytes(v for i in range(256) for v in (i, i, i))
    # frame 1: full-size
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0)
    data = _lzw_encode(base, 8)
    out += bytes([8, len(data)]) + data + b"\x00"
    # graphic control: transparency on, index 7
    out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 7, 0])
    # frame 2: 2x2 at (1,1): [[7 (transparent), 200], [201, 7]]
    patch = np.array([[7, 200], [201, 7]], dtype=np.uint8)
    out += struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)
    data = _lzw_encode(patch, 8)
    out += bytes([8, len(data)]) + data + b"\x00"
    out += b"\x3b"
    frames = split_gif_frames(bytes(out))
    from hive_udf_spark.operators.imagecodec import decode_to_gray

    f1, f2 = (decode_to_gray(b) for b in frames)
    assert np.array_equal(f1, base)
    want = base.copy()
    want[1, 2] = 200
    want[2, 1] = 201  # transparent cells (1,1) and (2,2) keep base pixels
    assert np.array_equal(f2, want)


def test_local_color_table_overrides_global():
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 1, 0x80 | 0x00, 0, 0)  # 2-entry GCT
    out += bytes([0, 0, 0, 255, 255, 255])
    # frame with a 2-entry LOCAL table reversing the colors
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0x80 | 0x00)
    out += bytes([255, 255, 255, 0, 0, 0])
    data = _lzw_encode(np.array([[0, 1]], dtype=np.uint8), 2)
    out += bytes([2, len(data)]) + data + b"\x00" + b"\x3b"
    assert decode_gif_gray(bytes(out)).tolist() == [[255, 0]]


def test_rejects_malformed():
    g = np.zeros((4, 4), dtype=np.uint8)
    good = encode_gif(g)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif_gray(b"JIF89a" + good[6:])
    with pytest.raises(ValueError, match="trailer|truncated"):
        decode_gif_gray(good[:-1])
    with pytest.raises(ValueError, match="no image frames"):
        decode_gif_gray(good[: 13 + 768] + b"\x3b")  # header + GCT + trailer only
    with pytest.raises(ValueError, match="color table truncated"):
        decode_gif_gray(good[:13] + b"\x3b")  # GCT promised but absent
    bad = bytearray(good)
    bad[-3] ^= 0x55  # corrupt last LZW data byte
    with pytest.raises(ValueError, match="LZW|EOI|pixels|truncated"):
        decode_gif_gray(bytes(bad))
    with pytest.raises(ValueError, match="beyond the logical screen"):
        import struct

        out = bytearray(b"GIF89a") + struct.pack("<HHBBB", 2, 2, 0, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)
        decode_gif_gray(bytes(out + b"\x3b"))


def test_gif_cross_check_with_pil():
    try:
        import PIL.Image as Image
    except ImportError:
        pytest.skip("pillow not installed in this container")
    import io

    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    with Image.open(io.BytesIO(encode_gif(g, interlace=True))) as im:
        assert np.array_equal(np.asarray(im.convert("L")), g)
    buf = io.BytesIO()
    Image.fromarray(g, mode="L").save(buf, format="GIF")
    assert np.array_equal(decode_gif_gray(buf.getvalue()), g)


def test_gif_through_spark_and_ahash(spark):
    """Production mapInPandas paths over GIF blobs; aHash equals the PGM
    twin's (pixel property, not container property)."""
    from hive_udf_spark.operators.imagecodec import encode_pgm
    from hive_udf_spark.operators.multimodal import (
        decode_image_features,
        image_ahash_table,
    )

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (8, 8), dtype=np.uint8) for _ in range(3)]
    rows = [
        (2 * i + k, bytearray(enc(im)))
        for i, im in enumerate(imgs)
        for k, enc in ((0, encode_pgm), (1, lambda a: encode_gif(a, interlace=True)))
    ]
    blobs = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    feats = {r.doc_id: r for r in decode_image_features(blobs, fake=False).collect()}
    for i, im in enumerate(imgs):
        for k in (0, 1):
            f = feats[2 * i + k]
            assert f.n_bytes == 64
            assert f.mean_byte == int(im.sum(dtype=np.int64)) / 64
    sigs = {r.doc_id: r.ahash for r in image_ahash_table(blobs).collect()}
    for i in range(len(imgs)):
        assert sigs[2 * i] == sigs[2 * i + 1]
