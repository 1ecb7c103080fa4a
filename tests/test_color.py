"""Color decode tier (r11, verdict item 3): decode_to_rgb across
formats, JPEG chroma materialization, color stats/aHash operators."""

from __future__ import annotations

import numpy as np
import pytest

from hive_udf_spark.operators.gifcodec import decode_gif_rgb, encode_gif
from hive_udf_spark.operators.imagecodec import (
    _gray_601,
    decode_to_gray,
    decode_to_rgb,
    encode_bmp24,
    encode_pgm,
    encode_png,
    encode_ppm,
)
from hive_udf_spark.operators.jpegcodec import (
    decode_jpeg_gray,
    decode_jpeg_rgb,
    encode_jpeg,
    encode_jpeg_progressive,
)
from hive_udf_spark.operators.multimodal import color_stats, image_ahash
from hive_udf_spark.operators.tiffcodec import decode_tiff_rgb, encode_tiff

RNG = np.random.RandomState(7)
RGB = RNG.randint(0, 256, (16, 24, 3), dtype=np.uint8)
GRAY = RNG.randint(0, 256, (16, 24), dtype=np.uint8)


@pytest.mark.parametrize("enc", [encode_ppm, encode_bmp24, encode_png, encode_tiff],
                         ids=["ppm", "bmp24", "png", "tiff"])
def test_lossless_rgb_roundtrip(enc):
    assert np.array_equal(decode_to_rgb(enc(RGB)), RGB)


def test_png_rgb_all_filters_and_adam7():
    for ft in range(5):
        assert np.array_equal(decode_to_rgb(encode_png(RGB, filter_type=ft)), RGB)
    assert np.array_equal(decode_to_rgb(encode_png(RGB, interlace=True)), RGB)


def test_gray_sources_replicate():
    rep = np.repeat(GRAY[:, :, None], 3, axis=2)
    assert np.array_equal(decode_to_rgb(encode_pgm(GRAY)), rep)
    assert np.array_equal(decode_gif_rgb(encode_gif([GRAY])), rep)
    assert np.array_equal(decode_to_rgb(encode_png(GRAY)), rep)
    assert np.array_equal(decode_to_rgb(encode_tiff(GRAY)), rep)


def test_gray_path_unchanged_by_rgb_refactor():
    """The gray tier must still produce the exact pre-refactor luma
    (601 of the RGB) — the existing oracle hashes depend on it."""
    for enc in (encode_ppm, encode_bmp24, encode_png, encode_tiff):
        assert np.array_equal(decode_to_gray(enc(RGB)), _gray_601(RGB))


def _flat_blocks(shape_blocks, seed):
    rng = np.random.RandomState(seed)
    ch = [np.kron(rng.randint(0, 256, shape_blocks, dtype=np.uint8),
                  np.ones((8, 8), np.uint8)) for _ in range(3)]
    return np.stack(ch, axis=2)


def test_jpeg_color_444_exact_on_flat_blocks():
    img = _flat_blocks((2, 3), 1)
    assert np.array_equal(decode_jpeg_rgb(encode_jpeg(img, quality=100)), img)


def test_jpeg_color_420_exact_on_flat_macroblocks():
    """4:2:0: chroma is stored at half resolution, so 16x16-aligned
    flat macroblocks survive subsample + nearest upsample exactly."""
    rng = np.random.RandomState(3)
    ch = [np.kron(rng.randint(0, 256, (2, 2), dtype=np.uint8),
                  np.ones((16, 16), np.uint8)) for _ in range(3)]
    img = np.stack(ch, axis=2)
    blob = encode_jpeg(img, quality=100, subsampling="420")
    assert np.array_equal(decode_jpeg_rgb(blob), img)


def test_jpeg_gray_blob_replicates():
    img = np.kron(np.arange(6, dtype=np.uint8).reshape(2, 3) * 40,
                  np.ones((8, 8), np.uint8))
    blob = encode_jpeg(img, quality=100)
    assert np.array_equal(
        decode_jpeg_rgb(blob),
        np.repeat(decode_jpeg_gray(blob)[:, :, None], 3, axis=2),
    )


def test_progressive_color_quarantines():
    img = _flat_blocks((2, 2), 5)
    blob = encode_jpeg_progressive(img, quality=100)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg_rgb(blob)
    decode_jpeg_gray(blob)  # gray tier still decodes it


def test_webp_lossless_rgb():
    """VP8L stores ARGB directly: gray fixtures replicate; the color
    encoder mode (if any) would round-trip — pinned via the gray-path
    601 identity."""
    from hive_udf_spark.operators.webpcodec import encode_webp_lossless

    rep = np.repeat(GRAY[:, :, None], 3, axis=2)
    assert np.array_equal(decode_to_rgb(encode_webp_lossless(GRAY)), rep)


def test_color_stats_closed_form():
    n, sr, sg, sb, mr, mg, mb, rg, yb = color_stats(RGB)
    wide = RGB.astype(np.int64)
    assert (n, sr, sg, sb) == (
        RGB.shape[0] * RGB.shape[1],
        int(wide[..., 0].sum()), int(wide[..., 1].sum()), int(wide[..., 2].sum()),
    )
    assert (mr, mg, mb) == tuple(int(wide[..., c].max()) for c in range(3))
    assert rg == int(np.abs(wide[..., 0] - wide[..., 1]).sum())
    assert yb == int(np.abs((wide[..., 0] + wide[..., 1]) // 2 - wide[..., 2]).sum())
    # gray image: zero on both colorfulness axes
    rep = np.repeat(GRAY[:, :, None], 3, axis=2)
    assert color_stats(rep)[7:] == (0, 0)


def test_color_ahash_separates_channel_swaps():
    """A red patch and the same patch in blue share the GRAY-ish
    structure but must differ on channel hashes."""
    base = np.zeros((8, 8, 3), np.uint8)
    base[:4, :, 0] = 200  # red top half
    swapped = base[..., [2, 1, 0]]  # blue top half
    hr_a = image_ahash(np.ascontiguousarray(base[..., 0]))
    hr_b = image_ahash(np.ascontiguousarray(swapped[..., 0]))
    assert hr_a != hr_b


def test_byte_flip_fuzz_rgb_never_crashes():
    base = bytearray(encode_png(RGB))
    rng = np.random.RandomState(11)
    for _ in range(120):
        i = int(rng.randint(0, len(base)))
        orig = base[i]
        base[i] ^= 1 << int(rng.randint(0, 8))
        try:
            out = decode_to_rgb(bytes(base))
            assert out.dtype == np.uint8 and out.ndim == 3
        except ValueError:
            pass
        base[i] = orig
