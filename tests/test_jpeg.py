"""Vendored baseline JPEG codec (operators/jpegcodec.py, r6)."""

from __future__ import annotations

import numpy as np
import pytest

from hive_udf_spark.operators.jpegcodec import (
    _AC_BITS,
    _AC_VALS,
    _DC_BITS,
    _DC_VALS,
    ZIGZAG,
    _build_decode_table,
    decode_jpeg_gray,
    encode_jpeg,
)


def test_zigzag_is_the_standard_order():
    # first and last diagonals of the T.81 zigzag, raster indices
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-8:].tolist() == [53, 60, 61, 54, 47, 55, 62, 63]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_huffman_tables_are_valid_and_invertible():
    for bits, vals in ((_DC_BITS, _DC_VALS), (_AC_BITS, _AC_VALS)):
        table = _build_decode_table(bits, vals)
        assert len(table) == len(vals)  # no collisions
        # prefix-free: no code is a prefix of another
        codes = sorted((l, c) for (l, c) in table)
        for i, (l1, c1) in enumerate(codes):
            for l2, c2 in codes[i + 1 :]:
                if l2 > l1:
                    assert (c2 >> (l2 - l1)) != c1, "prefix collision"
    with pytest.raises(ValueError, match="oversubscribed"):
        _build_decode_table([3] + [0] * 15, list(range(3)))  # 3 codes len 1


def test_constant_block_roundtrip_is_exact():
    """The oracle-exactness regime: flat 8x8 blocks at quality=100."""
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 256, 64, dtype=np.uint8)
    img = np.repeat(np.repeat(vals.reshape(8, 8), 8, axis=0), 8, axis=1)
    dec = decode_jpeg_gray(encode_jpeg(img, quality=100))
    assert np.array_equal(dec, img)


def test_random_gray_roundtrip_q100_tight():
    """All-ones quantization leaves only FDCT/IDCT float rounding: each
    decoded pixel within 1 of the source."""
    rng = np.random.default_rng(2)
    for shape in [(8, 8), (24, 40), (13, 13), (1, 1), (9, 17)]:
        g = rng.integers(0, 256, shape, dtype=np.uint8)
        d = decode_jpeg_gray(encode_jpeg(g, quality=100))
        assert d.shape == shape
        assert int(np.abs(d.astype(int) - g.astype(int)).max()) <= 1


def test_lower_quality_is_lossy_but_close_on_smooth_images():
    x = np.linspace(0, 255, 64)
    smooth = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    d = decode_jpeg_gray(encode_jpeg(smooth, quality=75))
    assert int(np.abs(d.astype(int) - smooth.astype(int)).max()) <= 16
    assert float(np.abs(d.astype(int) - smooth.astype(int)).mean()) <= 4.0


def test_color_444_luma_matches_bt601():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (17, 9, 3), dtype=np.uint8)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    d = decode_jpeg_gray(encode_jpeg(rgb, quality=100))
    assert float(np.abs(d.astype(np.float64) - y).max()) <= 2.0


def test_restart_interval_roundtrip_and_dc_reset():
    """DRI/RSTn: byte-aligned restart markers every N MCUs with DC
    predictor reset — the decoder must resync and still be exact on
    constant blocks."""
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 256, 64, dtype=np.uint8)
    img = np.repeat(np.repeat(vals.reshape(8, 8), 8, axis=0), 8, axis=1)
    for ri in (1, 3, 7):
        b = encode_jpeg(img, quality=100, restart_interval=ri)
        assert b"\xff\xdd" in b  # DRI segment present
        assert any(bytes([0xFF, 0xD0 + k]) in b for k in range(8))
        assert np.array_equal(decode_jpeg_gray(b), img)
    # random image too (non-exact regime, bounded error)
    g = rng.integers(0, 256, (32, 24), dtype=np.uint8)
    d = decode_jpeg_gray(encode_jpeg(g, quality=100, restart_interval=2))
    assert int(np.abs(d.astype(int) - g.astype(int)).max()) <= 1


def test_byte_stuffing_survives():
    """Images that force 0xFF bytes into the entropy stream must decode:
    encode many random images and require at least one stuffed 0xFF00."""
    rng = np.random.default_rng(5)
    saw_stuffing = False
    for _ in range(20):
        g = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        b = encode_jpeg(g, quality=90)
        sos = b.index(b"\xff\xda")
        saw_stuffing = saw_stuffing or b"\xff\x00" in b[sos:]
        d = decode_jpeg_gray(b)
        assert d.shape == (16, 16)
    assert saw_stuffing


def test_rejects_unsupported_and_malformed():
    import struct

    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"notajpeg")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_gray(good[:20])
    # a baseline stream with its SOF marker flipped to SOF2 is a
    # MALFORMED progressive stream (its single scan says Ss=0, Se=63 —
    # a progressive DC scan may not carry a spectral band)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg_gray(prog)
    # arithmetic-coded SOF refused explicitly
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="not vendored|arithmetic"):
        decode_jpeg_gray(arith)
    # 12-bit precision refused: rebuild SOF with precision byte 12
    i = good.index(b"\xff\xc0")
    (seglen,) = struct.unpack_from(">H", good, i + 2)
    bad = bytearray(good)
    bad[i + 4] = 12
    with pytest.raises(ValueError, match="12-bit"):
        decode_jpeg_gray(bytes(bad))
    # truncated entropy stream
    with pytest.raises(ValueError, match="truncated|Huffman"):
        decode_jpeg_gray(good[:-4])


def test_quality_param_validation():
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(np.zeros((8, 8), dtype=np.uint8), quality=0)
    with pytest.raises(ValueError, match="gray or"):
        encode_jpeg(np.zeros((8, 8, 4), dtype=np.uint8))


def test_jpeg_cross_check_with_pil():
    """Wherever pillow exists: PIL decodes our streams to the same pixels
    (±1 for its integer IDCT), and our decoder handles PIL's encoder
    output (Annex-K huffman tables, optimized or not)."""
    try:
        import PIL.Image as Image
    except ImportError:
        pytest.skip("pillow not installed in this container")
    import io

    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    with Image.open(io.BytesIO(encode_jpeg(g, quality=100))) as im:
        pil = np.asarray(im.convert("L"), dtype=np.int64)
    assert int(np.abs(pil - g.astype(np.int64)).max()) <= 2
    buf = io.BytesIO()
    Image.fromarray(g, mode="L").save(buf, format="JPEG", quality=100)
    ours = decode_jpeg_gray(buf.getvalue())
    assert int(np.abs(ours.astype(np.int64) - g.astype(np.int64)).max()) <= 2


def test_jpeg_through_spark_decode_and_ahash(spark):
    """End-to-end through the production mapInPandas paths: JPEG blobs
    feed decode_image_features and image_ahash_table via the magic
    dispatch; constant-block JPEGs must produce the same aHash as the
    same pixels as PGM (signatures are pixel properties)."""
    from hive_udf_spark.operators.imagecodec import encode_pgm
    from hive_udf_spark.operators.multimodal import (
        decode_image_features,
        image_ahash_table,
    )

    rng = np.random.default_rng(7)
    imgs = []
    for _ in range(3):
        vals = rng.integers(0, 256, 64, dtype=np.uint8)
        imgs.append(np.repeat(np.repeat(vals.reshape(8, 8), 8, axis=0), 8, axis=1))
    rows = [
        (2 * i + k, bytearray(enc(im)))
        for i, im in enumerate(imgs)
        for k, enc in ((0, encode_pgm), (1, lambda a: encode_jpeg(a, quality=100)))
    ]
    blobs = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    feats = {r.doc_id: r for r in decode_image_features(blobs, fake=False).collect()}
    for i, im in enumerate(imgs):
        for k in (0, 1):
            f = feats[2 * i + k]
            assert f.n_bytes == 4096
            assert f.mean_byte == int(im.sum(dtype=np.int64)) / 4096
            assert f.max_byte == int(im.max())
    sigs = {r.doc_id: r.ahash for r in image_ahash_table(blobs).collect()}
    for i in range(len(imgs)):
        assert sigs[2 * i] == sigs[2 * i + 1]


def test_mjpeg_avi_container_roundtrip(spark):
    """TRUE MJPEG: JPEG frames inside RIFF-AVI. The container walk and
    the per-frame magic dispatch compose with zero glue code."""
    from hive_udf_spark.operators.imagecodec import encode_avi, split_avi_frames
    from hive_udf_spark.operators.multimodal import sample_container_frames

    rng = np.random.default_rng(8)
    frames = []
    imgs = []
    for _ in range(4):
        vals = rng.integers(0, 256, 64, dtype=np.uint8)
        img = np.repeat(np.repeat(vals.reshape(8, 8), 8, axis=0), 8, axis=1)
        imgs.append(img)
        frames.append(encode_jpeg(img, quality=100))
    avi = encode_avi(frames, fps=10)
    assert split_avi_frames(avi) == frames
    blobs = spark.createDataFrame([(1, bytearray(avi))], "doc_id bigint, blob binary")
    out = {
        r.frame_idx: r
        for r in sample_container_frames(blobs, every_nth=2, fake=False).collect()
    }
    assert sorted(out) == [0, 2]
    for i in (0, 2):
        assert out[i].n_frames == 4
        assert out[i].n_pixels == 4096
        assert out[i].mean_px == int(imgs[i].sum(dtype=np.int64)) / 4096
        assert out[i].max_px == int(imgs[i].max())


# ---------------------------------------------------------------------------
# Progressive (SOF2) — r8
# ---------------------------------------------------------------------------


def test_progressive_decode_equals_baseline_decode():
    """The pinned self-consistency property: full refinement to Al=0
    transmits exactly the baseline-quantized coefficients, so
    decode(progressive(img)) == decode(baseline(img)) BIT-FOR-BIT —
    across shapes (odd dims exercise partial blocks), gray/color,
    qualities (low quality exercises ZRL and long zero runs), and
    restart intervals (in-scan RST state resets)."""
    from hive_udf_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(42)
    cases = [
        ((16, 24), False), ((17, 23), False), ((32, 32), True),
        ((9, 9), True), ((8, 8), False),
    ]
    for shape, color in cases:
        for q in (100, 75, 25, 1):
            for ri in (0, 3):
                img = rng.integers(
                    0, 256, shape + ((3,) if color else ()), dtype=np.uint8
                )
                base = decode_jpeg_gray(encode_jpeg(img, quality=q, restart_interval=ri))
                prog = decode_jpeg_gray(
                    encode_jpeg_progressive(img, quality=q, restart_interval=ri)
                )
                assert np.array_equal(base, prog), (shape, color, q, ri)


def test_progressive_flat_blocks_roundtrip_exact():
    """quality=100 + constant 8x8 blocks: the oracle-exactness regime
    must hold for the multi-scan format too."""
    from hive_udf_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    img = np.repeat(np.repeat(rng.integers(0, 256, (5, 7), dtype=np.uint8), 8, 0), 8, 1)
    assert np.array_equal(decode_jpeg_gray(encode_jpeg_progressive(img, quality=100)), img)
    assert np.array_equal(
        decode_jpeg_gray(encode_jpeg_progressive(img, quality=100, restart_interval=2)),
        img,
    )


def test_progressive_smooth_image_exercises_eob_runs():
    """A smooth gradient yields long EOB runs in AC scans and dense
    correction bits in refine scans; progressive must still match
    baseline exactly."""
    from hive_udf_spark.operators.jpegcodec import encode_jpeg_progressive

    x = np.linspace(0, 255, 48)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    for q in (90, 30):
        base = decode_jpeg_gray(encode_jpeg(img, quality=q))
        prog = decode_jpeg_gray(encode_jpeg_progressive(img, quality=q))
        assert np.array_equal(base, prog), q


def test_progressive_malformed_streams_raise():
    from hive_udf_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    good = encode_jpeg_progressive(img, quality=90)
    # truncation anywhere inside the scan chain
    with pytest.raises(ValueError, match="truncated|marker|Huffman"):
        decode_jpeg_gray(good[: len(good) // 2])
    # an AC scan cannot precede the component's DC scan: strip scan 1
    # (the DC-first SOS) by splicing from SOI straight to the first AC SOS
    first_sos = good.index(b"\xff\xda")
    second_sos = good.index(b"\xff\xda", first_sos + 2)
    hacked = good[:first_sos] + good[second_sos:]
    with pytest.raises(ValueError, match="AC scan before"):
        decode_jpeg_gray(hacked)
    # a second SOF BETWEEN scans is malformed
    import struct

    sof = good.index(b"\xff\xc2")
    (seglen,) = struct.unpack_from(">H", good, sof + 2)
    seg = good[sof : sof + 2 + seglen]
    hacked2 = good[:second_sos] + seg + good[second_sos:]
    with pytest.raises(ValueError, match="second SOF|marker"):
        decode_jpeg_gray(hacked2)


def test_progressive_cross_check_with_pil():
    """Wherever pillow exists: PIL decodes our progressive streams and we
    decode PIL's progressive encoder output."""
    try:
        import PIL.Image as Image
    except ImportError:
        pytest.skip("pillow not installed in this container")
    import io

    from hive_udf_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (24, 16), dtype=np.uint8)
    with Image.open(io.BytesIO(encode_jpeg_progressive(g, quality=100))) as im:
        pil = np.asarray(im.convert("L"), dtype=np.int64)
    assert int(np.abs(pil - g.astype(np.int64)).max()) <= 2
    buf = io.BytesIO()
    Image.fromarray(g, mode="L").save(buf, format="JPEG", quality=95, progressive=True)
    ours = decode_jpeg_gray(buf.getvalue()).astype(np.int64)
    assert int(np.abs(ours - g.astype(np.int64)).max()) <= 3


def test_420_subsampling_baseline_and_progressive():
    """r8: 4:2:0 — 16x16 MCUs of four luma blocks + Cb + Cr, box-filtered
    chroma.  Luma must stay tight at q=100 (subsampling never touches Y),
    and progressive==baseline must hold bit-for-bit INCLUDING odd dims,
    where the non-interleaved chroma block grid is smaller than the
    MCU-padded coefficient grid (T.81 A.2.2) — the path 4:4:4 fixtures
    can never reach."""
    from hive_udf_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(33)
    for shape in [(16, 16), (17, 23), (9, 9), (25, 41)]:
        rgb = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
        d = decode_jpeg_gray(encode_jpeg(rgb, quality=100, subsampling="420"))
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        assert d.shape == shape
        assert float(np.abs(d.astype(np.float64) - y).max()) <= 2.0, shape
        for q in (100, 25):
            for ri in (0, 3):
                base = decode_jpeg_gray(
                    encode_jpeg(rgb, quality=q, restart_interval=ri, subsampling="420")
                )
                prog = decode_jpeg_gray(
                    encode_jpeg_progressive(
                        rgb, quality=q, restart_interval=ri, subsampling="420"
                    )
                )
                assert np.array_equal(base, prog), (shape, q, ri)
    # the SOF actually declares 2x2 luma sampling
    blob = encode_jpeg(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), subsampling="420")
    sof = blob.index(b"\xff\xc0")
    assert blob[sof + 11] == 0x22  # first component hv byte
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8), subsampling="422")
